"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at a given sf_dir, runs the matching oracle_sql()
through DuckDB (testdata tables pre-registered as views), and compares
row-count + schema + order-insensitive values. Usage:

    python scripts/validate.py [sf_dir] [query ...]

Scale convention: golden/plane-backed oracles (mosaic_*, zonal crosstab,
hillshade/equalize/histogram, costdist/streamlinks/upslope goldens) are
PINNED to the sf0.01 fixture cache (the driver runs oracle SQL at
sf=0.01), so running this script at sf0.001/sf0.1 reports mismatches for
exactly those queries BY DESIGN — the gate scale is sf0.01.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"rowcount {len(got)} != {len(exp)}")
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        problems.append(f"columns {list(g.columns)} != {list(e.columns)}")
        return problems
    if len(g) == len(e):
        for c in g.columns:
            gv, ev = g[c].to_numpy(), e[c].to_numpy()
            if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                ok = np.array_equal(gv.astype(np.float64), ev.astype(np.float64))
                if not ok:
                    close = np.allclose(gv.astype(np.float64), ev.astype(np.float64),
                                        rtol=0, atol=0, equal_nan=True)
                    problems.append(f"col {c}: float mismatch (allclose={close})")
            elif not np.array_equal(gv, ev):
                bad = int((gv != ev).sum())
                problems.append(f"col {c}: {bad} mismatching values")
            if gv.dtype != ev.dtype:
                problems.append(f"col {c}: dtype {gv.dtype} vs {ev.dtype} (warn)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc}")
            failures += 1
            continue
        problems = compare(name, got, exp)
        hard = [p for p in problems if "warn" not in p]
        if hard:
            print(f"FAIL {name} ({dt:.1f}s): {problems}")
            failures += 1
        else:
            note = f" [{problems}]" if problems else ""
            print(f"PASS {name}: {len(got)} rows ({dt:.1f}s){note}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
