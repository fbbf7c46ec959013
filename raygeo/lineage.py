"""Per-partition lineage records — the resumable ingest ledger.

Stands in for the reference's ``loaded_patches`` zarr attr + per-patch
icechunk commits (``backends/threaded.py:119-138``, ``core/backend.py:229-239``):
each completed output partition (tile) gets one JSON record written with an
atomic tmp+rename. Re-running a pipeline first loads the ledger once on the
driver, broadcasts the completed set, and anti-joins pending work against it
(reference ``accessor.py:434-436``) — so a killed run resumes at partition
granularity and a finished run is a no-op.

Records carry the per-partition metrics the north star asks for
(row_count / bytes / wall_ms / skew inputs).
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _lineage_dir(cube_path: str) -> str:
    from .cube import LINEAGE_DIR

    return os.path.join(cube_path, LINEAGE_DIR)


def record_partition(
    cube_path: str,
    partition_id: str,
    patch_ids: list[str],
    row_count: int,
    n_bytes: int,
    wall_ms: float,
) -> None:
    """Atomically commit one partition's lineage record (idempotent)."""
    import socket

    d = _lineage_dir(cube_path)
    os.makedirs(d, exist_ok=True)
    rec = {
        "partition_id": partition_id,
        "patch_ids": sorted(patch_ids),
        "row_count": row_count,
        "bytes": n_bytes,
        "wall_ms": round(wall_ms, 3),
        "commit_ts": time.time(),
        # who produced the partition — the worker axis of the event
        # timeline (reference thread/Gantt dimension, core/backend.py:59-93)
        "worker": f"{socket.gethostname()}:{os.getpid()}",
    }
    final = os.path.join(d, f"part-{partition_id}.json")
    tmp = os.path.join(d, f".tmp-{partition_id}-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, final)


def read_records(cube_path: str) -> list[dict]:
    """All ledger records: compacted parquet segments + loose JSON commits,
    deduped by partition_id (latest commit_ts wins — compaction may crash
    between writing a segment and deleting the loose files it covers)."""
    d = _lineage_dir(cube_path)
    if not os.path.isdir(d):
        return []
    out = _read_segments(d)
    for name in sorted(os.listdir(d)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
        except FileNotFoundError:
            # raced a concurrent compact() that deleted the loose file
            # after covering it with a segment — the segment read above
            # (or the next read) already has the record
            continue
    best: dict[str, dict] = {}
    for r in out:
        prev = best.get(r["partition_id"])
        if prev is None or r["commit_ts"] >= prev["commit_ts"]:
            best[r["partition_id"]] = r
    return [best[k] for k in sorted(best)]


def loaded_partitions(cube_path: str) -> set[str]:
    """Completed tile/partition ids (ledger read, accessor.py:155-166 analog)."""
    return {r["partition_id"] for r in read_records(cube_path)}


def partition_metrics(cube_path: str) -> list[dict]:
    """Per-partition throughput/skew metrics (rows, bytes, wall_ms)."""
    return [
        {
            "partition_id": r["partition_id"],
            "rows": r["row_count"],
            "bytes": r["bytes"],
            "wall_ms": r["wall_ms"],
        }
        for r in read_records(cube_path)
    ]


# ---------------------------------------------------------------- compaction
# At 100 TB a cube has millions of tiles; one loose JSON per tile is fine as
# the COMMIT granularity (atomic tmp+rename) but poison as the steady state.
# LSM answer: roll loose records into parquet ledger segments after a
# successful run. Crash anywhere mid-compaction leaves records present in
# both a segment and loose files — the read path dedups by partition_id
# (latest commit_ts wins), so compaction is safe to re-run at any time.

_SEGMENT_PREFIX = "ledger-"


def compact(cube_path: str) -> int:
    """Roll loose per-tile JSON records into one parquet segment.

    Returns the number of records compacted. Order: write + rename the
    segment FIRST, then delete the loose files it covers — a crash between
    the two leaves duplicates, never loss.
    """
    d = _lineage_dir(cube_path)
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.endswith(".parquet.tmp"):
                # a crashed previous compaction's half-written segment: its
                # loose records were never deleted, so drop it. The age
                # check protects a CONCURRENT compaction's in-flight tmp
                # (segment names are uuid-unique, so only a dead writer's
                # file can be stale).
                p = os.path.join(d, name)
                try:
                    if time.time() - os.path.getmtime(p) > 600:
                        os.remove(p)
                except FileNotFoundError:
                    pass
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = _lineage_dir(cube_path)
    if not os.path.isdir(d):
        return 0
    loose = [n for n in sorted(os.listdir(d))
             if n.startswith("part-") and n.endswith(".json")]
    if not loose:
        return 0
    recs = []
    for name in loose:
        with open(os.path.join(d, name)) as f:
            recs.append(json.load(f))
    table = pa.table({
        "partition_id": [r["partition_id"] for r in recs],
        "patch_ids": [r["patch_ids"] for r in recs],
        "row_count": [r["row_count"] for r in recs],
        "bytes": [r["bytes"] for r in recs],
        "wall_ms": [r["wall_ms"] for r in recs],
        "commit_ts": [r["commit_ts"] for r in recs],
        "worker": [r.get("worker", "") for r in recs],
    })
    seg = os.path.join(d, f"{_SEGMENT_PREFIX}{_uuid.uuid4().hex}.parquet")
    pq.write_table(table, seg + ".tmp", compression="zstd")
    os.replace(seg + ".tmp", seg)
    for name in loose:
        try:
            os.remove(os.path.join(d, name))
        except FileNotFoundError:
            pass
    return len(recs)


def _read_segments(d: str) -> list[dict]:
    import pyarrow.parquet as pq

    out: list[dict] = []
    for name in sorted(os.listdir(d)):
        if name.startswith(_SEGMENT_PREFIX) and name.endswith(".parquet"):
            out.extend(pq.read_table(os.path.join(d, name)).to_pylist())
    return out


def fsck(cube_path: str):
    """Cube consistency audit: cross-check tile data files vs lineage
    records. The data-then-record commit order means a crash can leave
    data-without-record (safe: the tile recomputes idempotently) but
    NEVER record-without-data — a record pointing at missing data is
    corruption (manual deletion, partial restore) and is flagged.

    Returns a pandas DataFrame (tile_id, has_data, has_record, status)
    with status in {'ok', 'recompute' (data only), 'missing_data'
    (record only — corrupt)}.
    """
    import os

    import pandas as pd

    from .cube import TILES_DIR

    tdir = os.path.join(cube_path, TILES_DIR)
    data = set()
    if os.path.isdir(tdir):
        for f in os.listdir(tdir):
            if f.startswith("part-") and f.endswith(".parquet"):
                data.add(f[len("part-"):-len(".parquet")])
    records = loaded_partitions(cube_path)
    rows = []
    for tid in sorted(data | records):
        has_d, has_r = tid in data, tid in records
        status = ("ok" if has_d and has_r
                  else "recompute" if has_d else "missing_data")
        rows.append((tid, has_d, has_r, status))
    return pd.DataFrame(rows, columns=["tile_id", "has_data",
                                       "has_record", "status"])
