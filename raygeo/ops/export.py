"""Resumable sharded parquet export: one directory, one file per key shard.

The generic write-side counterpart of the cube's per-tile lineage commits
(ops.ingest): output is partitioned by a deterministic shard of a key
column, each shard commits atomically (tmp file -> rename -> done marker,
data before marker), and a re-run anti-joins completed shards out BEFORE
the shuffle — a crashed export resumes by recomputing only missing shards.
Never one giant file: shard count bounds both the largest output object
and the blast radius of a retry.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import zlib


def _shard_of(col, num_shards: int) -> np.ndarray:
    """Deterministic shard id per value: ``value % num_shards`` for integer
    keys (SQL-trivial, balanced for id-like keys), crc32 for strings."""
    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.integer):
        # numpy % is floored (non-negative result) even for negative keys;
        # note SQL's % keeps the sign — the docs_export_shards oracle only
        # matches because its keys are non-negative ids
        return (vals % num_shards).astype(np.int64)
    return np.array(
        [zlib.crc32(str(v).encode()) % num_shards for v in vals],
        dtype=np.int64,
    )


def completed_shards(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    return {
        int(f[len("shard-"):-len(".done")])
        for f in os.listdir(out_dir)
        if f.startswith("shard-") and f.endswith(".done")
    }


def export_sharded(ds, out_dir: str, shard_col: str, num_shards: int = 16):
    """Export ``ds`` to ``out_dir`` as one parquet file per shard.

    Size ``num_shards`` to the data, not the cluster: shards are the unit
    of retry and of output-file size (aim for ~0.5-2 GB per shard file at
    scale — 100 TB wants tens of thousands of shards, not 16).

    Returns a Dataset of (shard, n_rows) for the shards written THIS run;
    already-committed shards are skipped before any shuffle work. The data
    file is renamed into place before its ``.done`` marker is written, so a
    crash leaves either nothing or data-without-marker — both re-run
    cleanly (marker-less data is overwritten by the recompute).
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)

    def add_shard(t: pa.Table) -> pa.Table:
        shard = _shard_of(t.column(shard_col), num_shards)
        t = t.append_column("__shard", pa.array(shard, pa.int64()))
        if done:
            keep = ~np.isin(shard, list(done))
            t = t.filter(pa.array(keep))
        return t

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        body = g.drop(columns="__shard").sort_values(shard_col)
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), tmp,
                       compression="zstd")
        os.replace(tmp, path)  # data first ...
        marker = os.path.join(out_dir, f"shard-{shard:05d}.done")
        with open(marker + ".tmp", "w") as f:
            f.write(f"{len(body)}\n")
        os.replace(marker + ".tmp", marker)  # ... marker second
        return pd.DataFrame({"shard": [shard], "n_rows": [len(body)]})

    return ds.map_batches(add_shard, batch_format="pyarrow",
                          batch_size=8192).groupby("__shard").map_groups(
        write_shard, batch_format="pandas")


def export_hive_partitioned(ds, out_dir: str, partition_col: str,
                            count_col: str):
    """Hive-style partitioned export through Ray Data's NATIVE parquet
    sink (``write_parquet(partition_cols=[...])`` — one directory per
    partition value), then a partition-PRUNED read-back that touches only
    one partition's files per value.

    Returns the per-partition row counts computed FROM THE READ-BACK (so
    the round-trip — sink layout, hive path encoding, pruned scan — is
    what the oracle checks, not the in-memory input). Output:
    (partition value, n_rows).
    """
    import os
    import urllib.parse

    import ray.data as rd

    ds.write_parquet(out_dir, partition_cols=[partition_col])
    # read back per partition value with DIRECTORY-level pruning: the
    # hive layout puts each value under '<col>=<value>/', so reading that
    # path touches only the one partition's files (pyarrow's hive filter
    # can't bind partition columns through Ray's reader — path pruning is
    # the portable form). Partition values come from the directory NAMES
    # (O(partitions)), never from scanning exported rows.
    prefix = f"{partition_col}="
    values = sorted(
        urllib.parse.unquote(d[len(prefix):])
        for d in os.listdir(out_dir)
        if d.startswith(prefix) and os.path.isdir(os.path.join(out_dir, d)))
    rows = []
    for v in values:
        part = rd.read_parquet(
            os.path.join(out_dir, f"{partition_col}={v}"),
            columns=[count_col])
        rows.append((v, part.count()))
    return pa.table({
        partition_col: pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
    })


def export_webdataset(images_ds, out_dir: str, n_shards: int = 8,
                      id_col: str = "image_id", bytes_col: str = "bytes",
                      caption_col: str = "caption"):
    """WebDataset-style sharded tar export of (image, caption) samples —
    the training-loader sink format for multimodal data (one tar per
    shard; each sample = two members ``<id>.img`` and ``<id>.txt``,
    members sorted by id for deterministic bytes).

    shard = md5(id) % n_shards — deterministic and SQL-replayable, so
    resharding the INPUT never moves a sample and the manifest is
    value-checkable. Same atomic data-then-marker commit and resume
    contract as ``export_sharded`` (completed shards skip before any
    shuffle). Returns the manifest Dataset (shard, n_samples,
    caption_chars, tar_bytes) for shards written this run.
    """
    import hashlib
    import io
    import tarfile

    os.makedirs(out_dir, exist_ok=True)
    done = completed_shards(out_dir)

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        shard = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4],
                            "big") % n_shards for i in ids),
            dtype=np.int64, count=len(ids))
        t = t.append_column("__shard", pa.array(shard, pa.int64()))
        if done:
            t = t.filter(pa.array(~np.isin(shard, list(done))))
        return t

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        g = g.sort_values(id_col)
        buf = io.BytesIO()
        cap_chars = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, r in g.iterrows():
                for suffix, payload in (
                    (".img", bytes(r[bytes_col])),
                    (".txt", str(r[caption_col]).encode()),
                ):
                    info = tarfile.TarInfo(name=f"{r[id_col]}{suffix}")
                    info.size = len(payload)
                    info.mtime = 0  # deterministic archive bytes
                    tar.addfile(info, io.BytesIO(payload))
                cap_chars += len(str(r[caption_col]))
        body = buf.getvalue()
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(body)
        os.replace(tmp, path)  # data first ...
        marker = os.path.join(out_dir, f"shard-{shard:05d}.done")
        with open(marker + ".tmp", "w") as f:
            f.write(f"{len(g)}\n")
        os.replace(marker + ".tmp", marker)  # ... marker second
        return pd.DataFrame({"shard": [shard],
                             "n_samples": [len(g)],
                             "caption_chars": [cap_chars],
                             "tar_bytes": [len(body)]})

    cols = [id_col, bytes_col, caption_col]
    return (images_ds.select_columns(cols)
            .map_batches(add_shard, batch_format="pyarrow", batch_size=2048)
            .groupby("__shard").map_groups(write_shard,
                                           batch_format="pandas"))
