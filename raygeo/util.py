"""Small runtime utilities: cluster-aware stage sizing.

Ray Data's actor-pool autoscaler starts at the pool minimum and upscales on
backlog; with min=1 a short job finishes before the pool ever grows, so
decode-heavy stages were bottlenecked at a fraction of the cluster. Stages
therefore size their pools from the *live* cluster at plan-build time:
min = half the CPUs (instant ramp), max = all CPUs (never oversubscribes —
Ray only places actors that fit).
"""

from __future__ import annotations

import os


def cluster_cpus() -> int:
    import ray

    if ray.is_initialized():
        return max(1, int(ray.cluster_resources().get("CPU", 0)))
    return os.cpu_count() or 8


def auto_concurrency(cap: int | None = None) -> tuple[int, int]:
    """Actor-pool (min, max) sized to the cluster at plan time."""
    n = cluster_cpus()
    if cap is not None:
        n = min(n, cap)
    return (max(2, n // 2), max(2, n))


def shuffle_partitions(requested: int, pools: int = 1) -> int:
    """Cap a hash-join partition count so the plan's concurrently-live
    aggregator pools cannot deadlock the cluster.

    Ray 2.49's hash-shuffle join spawns one ``HashShuffleAggregator``
    actor per partition, each reserving 0.125 CPU (+ ~0.9 GiB memory),
    and a plan keeps ALL its joins' pools alive for the whole execution.
    Observed live: 3 joins x 16 partitions inside one plan on a 4-CPU
    session = 6 CPUs of aggregator reservations with 4 CPUs total ->
    permanent "pending actor" deadlock (the executor never degrades).

    ``pools`` = the number of joins that are simultaneously live in the
    plan the caller is building. The cap spends at most HALF the cluster
    CPUs on aggregator reservations (pools * parts * 0.125 <= cpus / 2),
    leaving the rest for the map/reduce tasks themselves.
    """
    cpus = cluster_cpus()
    cap = max(2, int(cpus * 4 // max(1, pools)))
    return max(2, min(int(requested), cap))


def auto_join_partitions(*sized, pools: int = 1, lo: int = 8,
                         target_bytes: int = 64 << 20) -> int:
    """Data-aware hash-join partition count (VERDICT r3 #4: a static
    ``num_partitions=8`` join is the bottleneck stage at 100 TB, while a
    32-partition aggregator ramp is pure overhead for a 5 MB join).

    ``sized`` items contribute known input bytes: ints are byte counts,
    strings are parquet file/dir paths, anything else is tried for a
    ``size_bytes()`` (free and exact on a ``MaterializedDataset`` — the
    call sites all materialize at least one join side already; a LAZY
    dataset would trigger execution, so only pass materialized ones).
    One partition per ~64 MB of known input, clamped to [lo, the
    aggregator-pool budget of :func:`shuffle_partitions`]. When NOTHING
    is known (total 0), fall back to one partition per two cluster CPUs —
    scale with the cluster rather than a constant.
    """
    import glob as _glob

    total = 0
    for s in sized:
        if s is None:
            continue
        if isinstance(s, int):
            total += s
        elif isinstance(s, str):
            if os.path.isdir(s):
                for f in _glob.glob(os.path.join(s, "*.parquet")):
                    total += os.path.getsize(f)
            elif os.path.exists(s):
                total += os.path.getsize(s)
        else:
            try:
                total += int(s.size_bytes() or 0)
            except Exception:
                pass
    if total <= 0:
        want = max(lo, cluster_cpus() // 2)
    else:
        want = max(lo, total // target_bytes + 1)
    return shuffle_partitions(int(want), pools=pools)


def table_from_pandas(df) -> "pa.Table":  # noqa: F821
    """``pa.Table.from_pandas`` minus the pandas schema metadata.

    pyarrow 16.1's schema hash chokes on the attached pandas metadata
    ("unhashable type: 'dict'"), which makes Ray Data's schema-dedup warn on
    every block of every shuffle (and skip its early-exit). Stripping the
    metadata is loss-free for this engine — all schemas are explicit.
    """
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def binary_views(col) -> list:
    """Zero-copy per-element memoryviews of a (large_)binary Arrow column.

    ``col.to_pylist()`` / ``scalar.as_py()`` copy every payload into a fresh
    ``bytes`` — measurable on decode-heavy stages (NOTES r1: ~4% of the
    ingest decode stage). These views alias the Arrow data buffer directly;
    valid only while the source column is alive, so callers consume them
    within the batch function. Columns must be null-free (all engine binary
    columns are).
    """
    import numpy as np
    import pyarrow as pa

    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: list = []
    for arr in chunks:
        n = len(arr)
        if n == 0:
            continue
        large = pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
        dt = np.int64 if large else np.int32
        offs = np.frombuffer(
            arr.buffers()[1], dtype=dt, count=n + 1,
            offset=arr.offset * np.dtype(dt).itemsize,
        )
        data = memoryview(arr.buffers()[2])
        out.extend(data[offs[i] : offs[i + 1]] for i in range(n))
    return out


def read_parquet_clean(path, columns=None, **kw):
    """``ray.data.read_parquet`` with file-level schema metadata dropped.

    The provided testdata parquet carries pandas metadata whose
    ``pa.Schema`` is unhashable; that defeats Ray Data's block-schema
    dedup (``unify_schemas`` set() fast path) and logs a warning per map
    task. Passing an explicit metadata-free schema keeps every downstream
    block schema hashable with no extra pipeline stage.
    """
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    p = path
    if isinstance(path, (list, tuple)):  # explicit file list (point reads)
        p = path[0] if path else None
    elif os.path.isdir(path):
        parts = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if parts:
            p = parts[0]
    try:
        sch = pq.read_schema(p).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
    except Exception:
        sch = None  # fall back to Ray's own schema inference
    return rd.read_parquet(path, columns=columns, schema=sch, **kw)


def join_partitions(*paths, target_bytes: int = 64 << 20, lo: int = 8,
                    hi: int | None = None) -> int:
    """Data-aware hash-join partition count.

    The hash-shuffle actor pool costs ~linear ramp-up in partition count,
    so partitions should track the JOIN INPUT VOLUME, not just CPUs: one
    partition per ~64 MB of input (the pre-aggregated probe side is
    bounded by the key cardinality of these files), clamped to
    [lo, max(64, 2x cluster CPUs)]. Small joins stop paying for a
    32-actor ramp; big inputs still fan out with the cluster.
    """
    import glob as _glob

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for f in _glob.glob(os.path.join(p, "*.parquet")):
                total += os.path.getsize(f)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    if hi is None:
        hi = max(64, 2 * cluster_cpus())
    return int(min(hi, max(lo, total // target_bytes + 1)))


def bucketed_fold(ds, key_cols, fold, num_buckets: int | None = None,
                  bucket_col: str = "_cb", clean_schema=None):
    """Global per-key fold paying O(num_buckets), not O(num_keys), Python
    overhead.

    Ray's sort-based ``groupby`` costs a per-key Python dispatch
    (measured ~0.1 ms/key — a 90k-key distinct is ~9 s of pure key
    overhead regardless of data volume), so high-cardinality folds hash
    the key tuple into ``num_buckets`` coarse buckets, shuffle ONCE on
    the bucket id, and run ``fold`` (vectorized pandas) once per bucket
    over ALL rows of its keys — same-key rows always share a bucket, so
    ``fold`` sees every row for each of its keys and its output is
    globally correct per key. Same pattern as the graph min-fold
    (``ops/graph.py``), generalized.

    ``fold`` gets the bucket's rows with ``bucket_col`` already stripped
    and returns a DataFrame (any schema — it need not echo the keys).

    ``clean_schema``: the bucket groupby's sort partitioner can emit
    schema-less 0-row blocks on small inputs; those poison a downstream
    ``Dataset.join``. Passing the output pa.Schema materializes the fold
    and strips them (``drop_empty_blocks``) — set it whenever the result
    feeds a join.
    """
    import pandas as pd

    nb = num_buckets or max(8, 2 * cluster_cpus())
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def tag(df: "pd.DataFrame") -> "pd.DataFrame":
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy(deep=False)
        df[bucket_col] = (h % nb).astype("int64")
        return df

    def run(g: "pd.DataFrame"):
        # emit Arrow so downstream fused Project/rename operators never
        # see pandas blocks (Ray 2.49's Project calls rename_columns on
        # the block object — pandas blocks crash it)
        return table_from_pandas(fold(g.drop(columns=[bucket_col])))

    out = (ds.map_batches(tag, batch_format="pandas")
           .groupby(bucket_col).map_groups(run, batch_format="pandas"))
    if clean_schema is not None:
        out = drop_empty_blocks(out.materialize(), clean_schema)
    return out


def bucketed_sum(ds, key_cols, value_cols, num_buckets: int | None = None,
                 clean_schema=None):
    """Global keyed int64 SUM via :func:`bucketed_fold` — the common
    post-map-side-partial reduce (one row per key, values summed)."""
    import numpy as np

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    vals = [value_cols] if isinstance(value_cols, str) else list(value_cols)

    def fold(g):
        agg = g.groupby(keys, sort=False)[vals].sum().reset_index()
        for c in vals:
            agg[c] = agg[c].astype(np.int64)
        return agg

    return bucketed_fold(ds, keys, fold, num_buckets=num_buckets,
                         clean_schema=clean_schema)


def bucketed_distinct(ds, key_cols, num_buckets: int | None = None,
                      clean_schema=None):
    """Global distinct key tuples via :func:`bucketed_fold` (map-side
    per-batch dedup still belongs in the caller's partial)."""

    def fold(g):
        return g.drop_duplicates()

    return bucketed_fold(ds, key_cols, fold, num_buckets=num_buckets,
                         clean_schema=clean_schema)


def drop_empty_blocks(materialized_ds, schema: "pa.Schema"):  # noqa: F821
    """Rebuild a MATERIALIZED dataset from its non-empty block refs.

    ``repartition(n)`` on a dataset with fewer rows than ``n`` emits 0-row
    blocks that carry NO schema; those blocks survive groupbys and even
    further repartitions untouched (``map_batches`` never calls the fn on
    them) and poison ``Dataset.join``'s Arrow hash join with
    "No match for FieldRef" errors. Dropping them is zero-copy — the
    object refs are reused, nothing is read or rewritten. Falls back to a
    single empty block with the EXPLICIT schema when everything is empty.
    """
    import pyarrow as pa  # noqa: F811
    import ray.data as rd

    refs = []
    for bundle in materialized_ds.iter_internal_ref_bundles():
        for bref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(bref)
    if not refs:
        empty = pa.table({f.name: pa.array([], f.type) for f in schema})
        return rd.from_arrow(empty)
    return rd.from_arrow_refs(refs)
