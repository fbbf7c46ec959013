"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

Headline = the flagship ingest pipeline (decode -> tile explode -> salted
mosaic shuffle) over the deterministic synthetic image table at the matching
scale; throughput is reported as (tiles + join rows)/sec per BASELINE.json.

``--scaling`` runs the same bench in two fresh processes at num_cpus=8 and
num_cpus=32 on the same (pre-generated, page-cache-warmed) input and reports
both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray
    from ray.data import DataContext

    from raygeo.fixtures import ensure_fixtures_for_dir, sf_of_dir

    # fixture generation + page-cache warm-up happen BEFORE ray/timing
    fix_dir = ensure_fixtures_for_dir(SF_DIR)
    img_dir = os.path.join(fix_dir, "images.parquet")
    for part in sorted(os.listdir(img_dir)):
        with open(os.path.join(img_dir, part), "rb") as f:
            while f.read(1 << 24):
                pass

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name: str, fn):
        import pandas as pd
        import pyarrow as pa

        t0 = time.monotonic()
        out = fn(SF_DIR)
        # force execution
        if isinstance(out, (pd.DataFrame, pa.Table)):
            n = len(out)
        else:
            n = out.count()  # ray Dataset: consumes the stream
        timings[name] = round(time.monotonic() - t0, 3)
        counts[name] = int(n)
        return n

    # headline: full ingest of the image table at this scale
    headline_names = ["ingest_mosaic", "tile_assign"]
    bench_queries = [
        "ingest_mosaic",
        "tile_assign",
        "roi_image_join",
        "zonal_stats",
        "knn_images",
        "dedup_phash",
        "decode_stats",
        "emb_knn",
        "q1_pricing",
        "docs_token_stats",
    ]
    for name in bench_queries:
        timed(name, qs[name])

    headline_sec = sum(timings[n] for n in headline_names)
    headline_rows = sum(counts[n] for n in headline_names)
    result = {
        "metric": "geocube ingest+tile-join wall time (tiles+join-rows/sec in extras)",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "rows": counts,
        "tiles_join_rows_per_sec": round(headline_rows / headline_sec, 1)
        if headline_sec
        else None,
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    # pre-generate fixtures once so neither child pays generation cost
    from raygeo.fixtures import ensure_fixtures_for_dir

    ensure_fixtures_for_dir(SF_DIR)

    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = child(lo)
    r_hi = child(hi)
    tput_lo = r_lo["tiles_join_rows_per_sec"]
    tput_hi = r_hi["tiles_join_rows_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (num_cpus 8 -> 32, same input)",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "tput_8": tput_lo,
                "tput_32": tput_hi,
                "scaling_efficiency": round(eff, 3),
                "sf": r_lo["sf"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
