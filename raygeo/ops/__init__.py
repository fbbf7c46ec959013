"""Ray Data operator library for raygeo.

Every operator is expressed Dataset-first: ``map_batches`` over zero-copy
Arrow for narrow work, actor pools for stateful stages, ``groupby`` /
``sort`` / ``limit`` for the wide steps. No module here owns a Ray session.
"""
