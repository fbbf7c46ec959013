"""Source protocol + stateful fetch actor pool (reference accessor hooks).

Re-expresses the reference's pluggable accessor surface — ``adjacent_patches``
/ ``download_patch`` (``core/accessor.py:445-498``) and the threaded
download-and-cache machinery (``backends/threaded.py:35-46``, retry budget
``core/backend.py:274-293``) — Ray-idiomatically:

- a :class:`Source` lists patch metadata for an ROI/TOI (driver-side, small)
  and fetches payload batches (worker-side, heavy);
- fetching runs as a ``map_batches`` ACTOR pool: each actor opens its
  session/client once in ``__init__`` (the per-thread client state of the
  reference), keeps a bounded per-actor payload cache (the
  ThreadingHandler/RayHandler download-and-cache semantics), and applies an
  app-level retry budget per batch on transient source errors — on top of
  Ray's own task-retry.

In this sandbox the only concrete source is the deterministic Parquet image
table (no network); a real STAC/GEE source implements the same two methods.
"""

from __future__ import annotations

import collections
import time
import zlib
from typing import Protocol

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FETCH_RETRIES = 5  # reference download retry budget, core/backend.py:278


class Source(Protocol):
    """Pluggable source: the engine's ``adjacent_patches``/``download_patch``."""

    def list_patches(self, roi: dict | None = None, toi=None) -> pa.Table:
        """Small driver-side metadata table: (patch_id, lon/lat box, ...)."""
        ...

    def fetch(self, patch_ids: list[str]) -> pa.Table:
        """Payload rows for the given patch ids (worker-side, heavy)."""
        ...


class TransientFetchError(RuntimeError):
    """A retryable source error (HTTP 5xx / rate limit analog)."""


class ParquetImageSource:
    """The sandbox-concrete Source over the fixture image table.

    ``list_patches`` derives footprints (pure function of image_id) and
    bbox-prefilters against the ROI on the driver; ``fetch`` reads payload
    rows by id. ``flaky_every`` deterministically raises a transient error on
    first attempt for every k-th patch — exercising the retry budget exactly
    like a rate-limited remote source would.
    """

    def __init__(self, images_path: str, grid, flaky_every: int = 0):
        self.images_path = images_path
        self.grid = grid
        self.flaky_every = flaky_every

    # -- driver side ------------------------------------------------------
    def list_patches(self, roi: dict | None = None, toi=None) -> pa.Table:
        from .fixtures import footprint_of

        t = pq.read_table(self.images_path, columns=["image_id", "w", "h"])
        ids = t.column("image_id").to_pylist()
        ws = t.column("w").to_numpy()
        hs = t.column("h").to_numpy()
        boxes = np.array(
            [footprint_of(i, int(w), int(h), self.grid)
             for i, w, h in zip(ids, ws, hs)]
        ).reshape(-1, 4)
        keep = np.ones(len(ids), dtype=bool)
        if roi is not None:
            keep = (
                (boxes[:, 0] < roi["lon_max"]) & (boxes[:, 2] > roi["lon_min"])
                & (boxes[:, 1] < roi["lat_max"]) & (boxes[:, 3] > roi["lat_min"])
            )
        sel = np.nonzero(keep)[0]
        return pa.table(
            {
                "patch_id": pa.array([ids[i] for i in sel], pa.string()),
                "lon_min": pa.array(boxes[sel, 0], pa.float64()),
                "lat_min": pa.array(boxes[sel, 1], pa.float64()),
                "lon_max": pa.array(boxes[sel, 2], pa.float64()),
                "lat_max": pa.array(boxes[sel, 3], pa.float64()),
            }
        )

    # -- worker side (called inside the fetch actor) ----------------------
    def open_session(self):
        """Per-actor client/session (pystac client / ee.Initialize analog)."""
        return _ParquetSession(self.images_path)

    def fetch_with_session(self, session, patch_ids: list[str],
                           attempt: int) -> pa.Table:
        if self.flaky_every:
            for pid in patch_ids:
                if attempt == 0 and zlib.crc32(pid.encode()) % self.flaky_every == 0:
                    raise TransientFetchError(f"simulated transient error on {pid}")
        return session.read_rows(patch_ids)


class _ParquetSession:
    """Open dataset handle reused across an actor's batches."""

    def __init__(self, images_path: str):
        import pyarrow.dataset as pads

        self.dset = pads.dataset(images_path, format="parquet")

    def read_rows(self, patch_ids: list[str]) -> pa.Table:
        import pyarrow.dataset as pads

        return self.dset.to_table(
            columns=["image_id", "bytes", "w", "h"],
            filter=pads.field("image_id").isin(patch_ids),
        )


class FetchPatches:
    """Actor-pool fetch stage (T1/T3: session + bounded cache per actor).

    ``__init__`` runs once per actor: builds the source session and an LRU
    payload cache. ``__call__`` fetches one metadata batch's payloads with
    the reference's retry budget (5 attempts, re-raise non-transient,
    ``core/backend.py:274-293``).
    """

    def __init__(self, source: ParquetImageSource, cache_items: int = 4096):
        self.source = source
        self.session = source.open_session()
        self.cache: collections.OrderedDict[str, dict] = collections.OrderedDict()
        self.cache_items = cache_items
        self.stats = {"fetched": 0, "cache_hits": 0, "retries": 0}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("patch_id").to_pylist()
        hits = [i for i in ids if i in self.cache]
        missing = [i for i in ids if i not in self.cache]
        self.stats["cache_hits"] += len(hits)
        rows: list[dict] = [self.cache[i] for i in hits]
        if missing:
            last_err: Exception | None = None
            for attempt in range(FETCH_RETRIES):
                try:
                    t = self.source.fetch_with_session(self.session, missing, attempt)
                    break
                except TransientFetchError as exc:
                    last_err = exc
                    self.stats["retries"] += 1
                    time.sleep(0)  # backoff point (no-op in sandbox)
            else:
                raise RuntimeError(
                    f"fetch failed after {FETCH_RETRIES} attempts"
                ) from last_err
            fetched = t.to_pylist()
            self.stats["fetched"] += len(fetched)
            for r in fetched:
                self.cache[r["image_id"]] = r
                if len(self.cache) > self.cache_items:
                    self.cache.popitem(last=False)
            rows.extend(fetched)
        out = pa.table(
            {
                "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
                "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
                "w": pa.array([r["w"] for r in rows], pa.int32()),
                "h": pa.array([r["h"] for r in rows], pa.int32()),
            }
        )
        return out


def fetch_dataset(source: ParquetImageSource, roi: dict | None = None,
                  concurrency=None, batch_size: int = 256):
    """metadata list -> Dataset of fetched payload rows (actor-pool stage).

    The Ray expression of ``procedural_download``'s download half
    (``accessor.py:400-443``): patches stream through a stateful actor pool
    with backpressure instead of a 4-thread pool + bounded queue. Pool size
    defaults to the live cluster (min = half the CPUs for instant ramp).
    """
    import ray.data as rd

    from .util import auto_concurrency

    if concurrency is None:
        concurrency = auto_concurrency(cap=16)
    patches = source.list_patches(roi)
    ds = rd.from_arrow(patches).repartition(
        max(8, len(patches) // max(batch_size, 1) or 1)
    )
    return ds.map_batches(
        FetchPatches,
        fn_constructor_kwargs={"source": source},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# ----------------------------------------------------------- extent index (S4)
def ensure_extent_index(cache_dir: str, fetch, parts=("s", "m", "l")) -> list[str]:
    """One-time idempotent fetch of extent-index GeoParquet files (S4: the
    reference's ``_download_arcticdem_extent``, ``datasets/arcticdem.py:63-122``
    — download+unzip N index files once at setup, skip when cached).

    ``fetch(part) -> bytes`` is the transport hook: HTTP in production, any
    callable in tests (no network in this sandbox). Files are written
    atomically (tmp + rename) so concurrent/re-entrant setup is safe, and
    each part is skipped independently when already present. Returns the
    cached file paths; the caller reads them once on the driver and
    ``ray.put``s the result as the broadcast small side of the spatial join
    (S5 — ops.spatial_join.RoiImageJoin / ops.zonal).
    """
    import os

    os.makedirs(cache_dir, exist_ok=True)
    paths = []
    for part in parts:
        path = os.path.join(cache_dir, f"extent_{part}.parquet")
        if not os.path.exists(path):
            buf = fetch(part)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, path)
        paths.append(path)
    return paths


def extent_index_post_create(cache_subdir: str, fetch,
                             parts=("s", "m", "l")):
    """``CubeSpec.post_create`` hook factory: warm the extent index once
    at cube creation — the reference rides ``post_create`` for exactly
    this (``datasets/arcticdem.py:187-189`` downloads the ArcticDEM
    extent files from the hook). The cache lives under the cube
    directory so it shares the cube's lifetime; ``fetch`` is the
    transport hook (:func:`ensure_extent_index`)."""
    import os

    def hook(path: str, _spec) -> list[str]:
        return ensure_extent_index(os.path.join(path, cache_subdir),
                                   fetch, parts)

    return hook


def load_extent_index(paths: list[str]):
    """Read cached extent-index parts into one Arrow table (bbox columns),
    ready for a single ``ray.put``. Small side by construction — the index
    holds one row per source tile/footprint, not per pixel."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    return pa.concat_tables([pq.read_table(p) for p in paths])


IMAGE_TABLE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption",
                       "phash"]


def read_image_table(path: str, columns: list[str] | None = None):
    """Read the image+caption input table (the north-star input shape:
    ``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64)``) as a ``ray.data.Dataset``.

    Production format is LANCE (``ray.data.read_lance`` — column
    projection + fragment-parallel scans over the columnar Lance v2
    layout); this sandbox ships no ``lance`` package, so the adapter is
    a declared environment boundary (the codec-stub discipline,
    ``ops/multimodal.py``): when ``import lance`` fails the same-schema
    parquet mirror loads through ``read_parquet_clean`` instead. Both
    paths honor ``columns`` pruning so only requested columns leave
    storage.
    """
    from .util import read_parquet_clean

    try:
        import lance  # noqa: F401  (absent in this sandbox)
        import ray.data as rd

        return rd.read_lance(path, columns=columns)
    except ImportError:
        if not (path.endswith(".parquet") or path.endswith("/")):
            # a real .lance URI with no lance package is a hard error —
            # do NOT silently misread it
            if path.endswith(".lance"):
                raise NotImplementedError(
                    "lance package unavailable in this environment; "
                    "provide the parquet mirror of the image table")
        return read_parquet_clean(path, columns=columns)
