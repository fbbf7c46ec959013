"""Cluster job entry point: ``ray job submit -- python scripts/run_job.py ...``.

The north-star deployment shape: the engine runs as a submitted job on a
fixed-size Ray cluster, checkpoint-resumable (per-tile lineage commits mean
a resubmitted job skips completed partitions), and emits per-partition
throughput/skew metrics at the end.

Examples (single node / local mode works the same):

    python scripts/run_job.py ingest --images /data/images.parquet \
        --cube /tmp/cube --grid fixture
    python scripts/run_job.py load --cube /tmp/cube \
        --roi -0.4 -0.3 0.1 0.25 --images /data/images.parquet
    python scripts/run_job.py report --cube /tmp/cube
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _grid(name: str):
    from raygeo import fixtures

    return {
        "fixture": fixtures.FIXTURE_GRID,
        "global": fixtures.GLOBAL_GRID,
        "temporal": fixtures.TEMPORAL_GRID,
        "polar": fixtures.POLAR_GRID,
    }[name]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="ingest images into a cube")
    p_ing.add_argument("--images", required=True)
    p_ing.add_argument("--cube", required=True)
    p_ing.add_argument("--grid", default="fixture",
                       choices=["fixture", "global", "temporal", "polar"])
    p_ing.add_argument("--mode", default="lww", choices=["lww", "max"])
    p_ing.add_argument("--channels", default="rgb", choices=["rgb", "dem"])

    p_load = sub.add_parser("load", help="load an ROI window (ingest missing)")
    p_load.add_argument("--cube", required=True)
    p_load.add_argument("--roi", nargs=4, type=float, required=True,
                        metavar=("LON_MIN", "LAT_MIN", "LON_MAX", "LAT_MAX"))
    p_load.add_argument("--images", default=None)

    p_rep = sub.add_parser("report", help="partition metrics + Gantt")
    p_rep.add_argument("--cube", required=True)

    p_exp = sub.add_parser("export", help="resumable sharded parquet export")
    p_exp.add_argument("--input", required=True, help="input parquet path")
    p_exp.add_argument("--out", required=True, help="output shard directory")
    p_exp.add_argument("--shard-col", required=True)
    p_exp.add_argument("--num-shards", type=int, default=64)

    args = ap.parse_args()

    import ray

    # guarded init: under `ray job submit` the job driver attaches to the
    # cluster via RAY_ADDRESS; standalone runs start local mode
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    try:
        return _run(args)
    finally:
        ray.shutdown()


def _run(args) -> int:
    from raygeo.channels import DEM_CHANNELS, RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.ops.ingest import ingest
    from raygeo.util import read_parquet_clean

    if args.cmd == "ingest":
        g = _grid(args.grid)
        channels = DEM_CHANNELS if args.channels == "dem" else RGB_CHANNELS
        create(CubeSpec(title=os.path.basename(args.cube), grid=g,
                        channels=channels), args.cube, exists_ok=True)
        t0 = time.monotonic()
        images = read_parquet_clean(args.images,
                                 columns=["image_id", "bytes", "w", "h"])
        tiles = ingest(images, g, cube_path=args.cube, mode=args.mode,
                       channels=channels)
        n = tiles.count()  # consume: commits per-tile data + lineage
        from raygeo import lineage

        n_compacted = lineage.compact(args.cube)  # bound ledger file count
        wall = time.monotonic() - t0
        print(json.dumps({"op": "ingest", "tiles_committed": n,
                          "ledger_compacted": n_compacted,
                          "wall_sec": round(wall, 3)}))
        return 0

    if args.cmd == "export":
        from raygeo.ops.export import export_sharded

        t0 = time.monotonic()
        rep = export_sharded(read_parquet_clean(args.input), args.out,
                             args.shard_col, num_shards=args.num_shards)
        rep = rep.to_pandas()
        print(json.dumps({"op": "export", "shards_written": len(rep),
                          "rows_written": int(rep.n_rows.sum()) if len(rep) else 0,
                          "wall_sec": round(time.monotonic() - t0, 3)}))
        return 0

    if args.cmd == "load":
        from raygeo.engine import load

        images = (
            read_parquet_clean(args.images,
                            columns=["image_id", "bytes", "w", "h"])
            if args.images else None
        )
        lon_min, lat_min, lon_max, lat_max = args.roi
        win = load(args.cube,
                   {"roi_id": "job", "lon_min": lon_min, "lat_min": lat_min,
                    "lon_max": lon_max, "lat_max": lat_max},
                   images_ds=images)
        if isinstance(win, dict):  # temporal cube: one window per step
            print(json.dumps({"op": "load", "steps": {
                t: w.stats() for t, w in win.items()}}))
        else:
            print(json.dumps({"op": "load", **win.stats()}))
        return 0

    if args.cmd == "report":
        from raygeo.ops.metrics import gantt_ascii, partition_report

        rep = partition_report(args.cube)
        print(json.dumps({"op": "report", "partitions": len(rep),
                          **rep.attrs.get("skew", {})}, default=float))
        print(gantt_ascii(args.cube))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
