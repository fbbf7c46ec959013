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
    d = _lineage_dir(cube_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(d, name)) as f:
            out.append(json.load(f))
    return out


def loaded_partitions(cube_path: str) -> set[str]:
    """Completed tile/partition ids (ledger read, accessor.py:155-166 analog)."""
    return {r["partition_id"] for r in read_records(cube_path)}


def loaded_patches(cube_path: str) -> set[str]:
    """Union of patch ids across committed partitions — the dedup index.

    NOTE: a patch spanning multiple tiles appears in several records; it only
    counts as loaded for anti-join purposes once ALL its tiles committed, so
    callers that filter at patch granularity should use
    :func:`fully_loaded_patches` with the expected tile count.
    """
    out: set[str] = set()
    for r in read_records(cube_path):
        out.update(r["patch_ids"])
    return out


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
