"""raygeo — a from-scratch, Ray-Data-native geocube + training-data engine.

Re-expresses the query/data-processing capabilities of
``relativityhd/smart-geocubes`` (reference at /root/reference, studied for
*semantics only*) as idiomatic Ray Data pipelines over Arrow batches:

- ``grid``     : GeoBox / chunk-grid affine math (tile assignment kernel),
                 re-derivation of the reference's GeoboxTiles semantics
                 (reference: accessors/gee.py:58-60, core/backend.py:241-261).
- ``cells``    : hierarchical Z-order spatial cell ids (H3/S2 role).
- ``geom``     : winding-number point-in-polygon, bbox ops, antimeridian
                 normalization (reference: accessors/gee.py:211-215).
- ``codec``    : deterministic image codecs (raw / zlib-lossless / DCT-lossy
                 with PSNR >= 40 dB) — the sandbox has no PIL/cv2.
- ``cube``     : CubeSpec manifest create/load (reference:
                 core/accessor.py:58-64, 206-296).
- ``lineage``  : per-partition commit records — the resumable stand-in for
                 the reference's ``loaded_patches`` ledger + icechunk commits
                 (reference: backends/threaded.py:119-138).
- ``fixtures`` : deterministic synthetic image+caption Lance-style table
                 (schema per BASELINE.json input_hint).
- ``ops``      : the Ray Data operator library (ingest/mosaic, spatial join,
                 kNN, zonal, dedup, text, ANN, multimodal, relational).

No module in this package calls ``ray.init`` / ``ray.shutdown``; sessions are
owned by the driver, bench.py, or the test fixture.
"""

__version__ = "0.1.0"
