"""Pin the query-registry counts (VERDICT r4 #6: README/NOTES/SURVEY
drifted from the registry). Update REGISTRY_N when adding queries — the
docs quote it."""

REGISTRY_N = 288


def test_queries_and_oracles_cover_each_other():
    import __ray_entry__ as m

    q, o = m.queries(), m.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert len(q) == REGISTRY_N


def test_readme_count_matches_registry():
    import os

    readme = open(os.path.join(os.path.dirname(__file__), "..",
                               "README.md")).read()
    assert f"{REGISTRY_N} driver queries, ALL {REGISTRY_N} " \
        "DuckDB-value-checked" in readme
