"""Deterministic synthetic image+caption Lance-style table (FIXTURES.md §1).

Schema = BASELINE.json ``input_hint`` (image_id, bytes, w, h, fmt, caption,
phash) plus *golden* derived columns computed at generation time
(footprint box, pix_sum, thumb_sum). Every row is a pure function of its
index, so any row can be regenerated independently and the DuckDB oracle can
check the Ray pipelines against the stored goldens while the Ray side
re-derives everything from ``bytes``/``image_id`` (stronger than comparing
stored to stored).

Footprints are distributed over the grid extent with a deliberate hot spot
(10% of rows land in one tile) to exercise salting/skew handling, and box
edges always fall exactly on pixel boundaries of a power-of-two-resolution
grid so that the floor/ceil tile arithmetic is bit-identical between numpy
and SQL.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .cells import cell_of
from .codec import decode, encode
from .grid import GridSpec

# power-of-two resolution => all footprint/tile arithmetic exact in float64
FIXTURE_GRID = GridSpec(
    name="unit_deg",
    crs="EPSG:4326",
    x0=-1.0,
    y1=1.0,
    res=2.0**-10,
    width=2048,
    height=2048,
    chunk=128,
)

# coarse global grid for antimeridian scenarios (res = 1/8 deg, exact binary)
GLOBAL_GRID = GridSpec(
    name="global_deg",
    crs="EPSG:4326",
    x0=-180.0,
    y1=90.0,
    res=0.125,
    width=2880,
    height=1440,
    chunk=120,
)

# polar stereographic grid (the ArcticDEM frame shape: EPSG:3413, meters,
# antimeridian-free — datasets/arcticdem.py:333 / :216-231). Extent is a
# pole-centered square; rho(lat=0) = 2R ~ 12.76e6 m, so the 12.8e6 m
# half-extent covers the whole northern hemisphere. All params exact decimal.
POLAR_GRID = GridSpec(
    name="polar_n",
    crs="EPSG:3413",
    x0=-12800000.0,
    y1=12800000.0,
    res=50000.0,
    width=512,
    height=512,
    chunk=64,
)

# FIXTURE_GRID plus a 4-step daily time axis (reference temporal cubes,
# e.g. AlphaEarth's fixed yearly axis, datasets/alphaearth.py:36)
TEMPORAL_GRID = GridSpec(
    name="unit_deg_t",
    crs="EPSG:4326",
    x0=-1.0,
    y1=1.0,
    res=2.0**-10,
    width=2048,
    height=2048,
    chunk=128,
    times=(
        "2024-01-01T00:00:00",
        "2024-01-02T00:00:00",
        "2024-01-03T00:00:00",
        "2024-01-04T00:00:00",
    ),
)

# warp target frame for the resample op: 3x coarser, half-pixel-shifted
# origin. All params exact binary (2^-11 shift, 3*2^-10 res), so the
# nearest-neighbor center mapping floor((x'-x0)/res) is exact float math in
# numpy AND replayable by the golden painter without rounding divergence.
WARP_GRID = GridSpec(
    name="unit_warp",
    crs="EPSG:4326",
    x0=-1.0 + 2.0**-11,
    y1=1.0 - 2.0**-11,
    res=3.0 * 2.0**-10,
    width=682,
    height=682,
    chunk=128,
)

HOT_TILE = (5, 5)  # 10% of rows land here (i % 10 == 0)
FMT_CYCLE = ("raw", "pngz", "dctq")
W_CYCLE = (32, 64, 128)
H_CYCLE = (32, 48, 128)
DUP_EVERY = 97  # i % 97 == 0 (i>0) copies row i-1's pixels -> phash dup

FIXTURE_ROOT = "/tmp/raygeo_fixtures"

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("lon_min", pa.float64()),
        ("lat_min", pa.float64()),
        ("lon_max", pa.float64()),
        ("lat_max", pa.float64()),
        ("pix_sum", pa.int64()),
        ("thumb_sum", pa.int64()),
        # golden band normalization (NormalizeBands oracle): per-band min/max
        # of the decoded pixels + sum of the full-range uint8 rescale
        ("min_r", pa.int32()),
        ("min_g", pa.int32()),
        ("min_b", pa.int32()),
        ("max_r", pa.int32()),
        ("max_g", pa.int32()),
        ("max_b", pa.int32()),
        ("norm_sum", pa.int64()),
        # golden visual features (ops.multimodal.ImageFeatures oracle):
        # fixed-point 1e-6 channel means + edge energy of the decoded pixels
        ("feat_mr", pa.int64()),
        ("feat_mg", pa.int64()),
        ("feat_mb", pa.int64()),
        ("feat_edge", pa.int64()),
    ]
)


def _id_of(i: int) -> str:
    return f"img-{i:08d}"


def _h32(image_id: str) -> int:
    return zlib.crc32(image_id.encode())


def footprint_of(image_id: str, w: int, h: int, grid: GridSpec = FIXTURE_GRID):
    """Pure-function footprint box of an image (FIXTURES.md 'derived').

    Box is ``w x h`` pixels at grid resolution, centered on a pixel column/row
    chosen from crc32(image_id); rows with index % 10 == 0 are pinned inside
    HOT_TILE. Edges land exactly on pixel boundaries (w, h are even).
    """
    i = int(image_id.rsplit("-", 1)[1])
    hv = _h32(image_id)
    half_w, half_h = w // 2, h // 2
    if i % 10 == 0:
        c = grid.chunk
        lo_x, hi_x = HOT_TILE[0] * c, (HOT_TILE[0] + 1) * c
        lo_y, hi_y = HOT_TILE[1] * c, (HOT_TILE[1] + 1) * c
        col_c = lo_x + (hv % (hi_x - lo_x))
        row_c = lo_y + ((hv // 7919) % (hi_y - lo_y))
        col_c = min(max(col_c, half_w), grid.width - half_w)
        row_c = min(max(row_c, half_h), grid.height - half_h)
    else:
        col_c = half_w + (hv % (grid.width - 2 * half_w))
        row_c = half_h + ((hv // 7919) % (grid.height - 2 * half_h))
    lon_min = grid.x0 + (col_c - half_w) * grid.res
    lon_max = grid.x0 + (col_c + half_w) * grid.res
    lat_max = grid.y1 - (row_c - half_h) * grid.res
    lat_min = grid.y1 - (row_c + half_h) * grid.res
    return lon_min, lat_min, lon_max, lat_max


def timestamp_of(image_id: str) -> np.datetime64:
    """Derived acquisition instant: pure function of ``image_id`` (same
    pattern as :func:`footprint_of`), uniform at second granularity over
    [2024-01-01, 2024-01-05) — i.e. around TEMPORAL_GRID's axis so the
    ingest-side nearest-snap (``core/backend.py:256-257``) is exercised."""
    hv = _h32(image_id + ":t")
    return np.datetime64("2024-01-01", "s") + np.timedelta64(
        hv % (4 * 24 * 3600), "s"
    )


def pixels_of(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 gradient + seeded-noise pattern."""
    hv = _h32(image_id)
    rng = np.random.Generator(np.random.PCG64(hv))
    gx = (np.arange(w, dtype=np.uint16) * 255 // max(w - 1, 1)).astype(np.uint8)
    gy = (np.arange(h, dtype=np.uint16) * 255 // max(h - 1, 1)).astype(np.uint8)
    base = ((gx[None, :].astype(np.uint16) + gy[:, None]) // 2).astype(np.uint8)
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.uint8)
    return base[:, :, None] + noise  # uint8 wraparound is deterministic


def thumbnail(pix: np.ndarray, size: int = 16) -> np.ndarray:
    """Area-average downsample to ``size x size`` (h, w multiples of 16)."""
    h, w, c = pix.shape
    bh, bw = h // size, w // size
    blocks = pix[: bh * size, : bw * size].reshape(size, bh, size, bw, c)
    return (blocks.astype(np.int64).sum(axis=(1, 3)) // (bh * bw)).astype(np.uint8)


def phash_of(decoded: np.ndarray) -> int:
    d = hashlib.sha1(decoded.tobytes()).digest()
    return int.from_bytes(d[:8], "big") & ((1 << 63) - 1)


def _raw_pixels(i: int) -> tuple[str, np.ndarray, str, int, int]:
    """Row i's (image_id, raw pixels, fmt, w, h) — pure function of i."""
    image_id = _id_of(i)
    if i > 0 and i % DUP_EVERY == 0:
        # duplicate pixels AND fmt of previous row (FIXTURES.md phash-dup rule;
        # fmt must match too so the decoded pixels — hence phash — are equal
        # even for the lossy codec)
        src = _id_of(i - 1)
        w, h = W_CYCLE[(i - 1) % 3], H_CYCLE[i % 3]  # (i-1)+1 == i
        pix = pixels_of(src, w, h)
        fmt = FMT_CYCLE[(i - 1) % 3]
    else:
        w, h = W_CYCLE[i % 3], H_CYCLE[(i + 1) % 3]
        pix = pixels_of(image_id, w, h)
        fmt = FMT_CYCLE[i % 3]
    return image_id, pix, fmt, w, h


def _make_row(i: int, grid: GridSpec) -> dict:
    image_id, pix, fmt, w, h = _raw_pixels(i)
    buf = encode(pix, fmt)
    decoded = decode(buf) if fmt == "dctq" else pix
    lon_min, lat_min, lon_max, lat_max = footprint_of(image_id, w, h, grid)
    lon_c, lat_c = (lon_min + lon_max) / 2.0, (lat_min + lat_max) / 2.0
    cell = int(
        cell_of(
            np.array([lon_c]), np.array([lat_c]), 8, grid.x0, grid.y0, grid.x1, grid.y1
        )[0]
    )
    thumb = thumbnail(decoded)
    return {
        "image_id": image_id,
        "bytes": buf,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"synthetic scene {i} at cell {cell:x}",
        "phash": phash_of(decoded),
        "lon_min": lon_min,
        "lat_min": lat_min,
        "lon_max": lon_max,
        "lat_max": lat_max,
        "pix_sum": int(decoded.astype(np.int64).sum()),
        "thumb_sum": int(thumb.astype(np.int64).sum()),
        **_norm_golden(decoded),
        **feature_golden(decoded),
    }


def _norm_golden(decoded: np.ndarray) -> dict:
    """Golden per-band min/max + normalized sum (ops.multimodal.NormalizeBands
    semantics: round-half-up integer rescale to the full uint8 range)."""
    pix = decoded.astype(np.int32)
    mn = pix.min(axis=(0, 1))
    mx = pix.max(axis=(0, 1))
    rng = np.maximum(mx - mn, 1)
    norm = ((pix - mn) * 255 + rng // 2) // rng
    return {
        "min_r": int(mn[0]), "min_g": int(mn[1]), "min_b": int(mn[2]),
        "max_r": int(mx[0]), "max_g": int(mx[1]), "max_b": int(mx[2]),
        "norm_sum": int(norm.astype(np.int64).sum()),
    }


def feature_golden(decoded: np.ndarray) -> dict:
    """Golden visual features (ops.multimodal.ImageFeatures semantics):
    per-channel float64 means + mean |gradient| edge energy, stored as
    fixed-point 1e-6 int64 so the oracle compare is exact."""
    pix = decoded.astype(np.float64)
    gy = np.abs(np.diff(pix.mean(axis=2), axis=0)).mean()
    gx = np.abs(np.diff(pix.mean(axis=2), axis=1)).mean()
    return {
        "feat_mr": int(round(float(pix[:, :, 0].mean()) * 1e6)),
        "feat_mg": int(round(float(pix[:, :, 1].mean()) * 1e6)),
        "feat_mb": int(round(float(pix[:, :, 2].mean()) * 1e6)),
        "feat_edge": int(round(float(gx + gy) * 1e6)),
    }


def _make_chunk_ipc(args: tuple[int, int, GridSpec]) -> bytes:
    """Build rows [lo, hi) as Arrow IPC bytes (process-pool worker)."""
    lo, hi, grid = args
    rows = [_make_row(i, grid) for i in range(lo, hi)]
    cols = {k: [r[k] for r in rows] for k in IMAGES_SCHEMA.names}
    table = pa.table(cols, schema=IMAGES_SCHEMA)
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def generate_images(
    n: int, out_path: str, grid: GridSpec = FIXTURE_GRID,
    rows_per_group: int | None = None,
) -> None:
    """Write the images table as a DIRECTORY of part files (atomic: tmp dir
    + rename). A single big parquet file is read by ONE Ray task — a serial
    bottleneck; a multi-file layout is both the realistic Lance-fragment
    shape and what lets the read scale with the cluster.

    Row i is a pure function of i, so chunks are generated in parallel on a
    process pool; part file k holds rows [k*rows_per_group, ...) — output is
    fully deterministic.
    """
    import shutil
    from concurrent.futures import ProcessPoolExecutor

    if rows_per_group is None:
        rows_per_group = max(500, n // 48)  # ~48 part files at bench scale
    chunks = [(lo, min(lo + rows_per_group, n), grid) for lo in range(0, n, rows_per_group)]
    tmp = out_path + ".tmpdir"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def write_part(k: int, ipc: bytes) -> None:
        table = pa.ipc.open_stream(pa.py_buffer(ipc)).read_all()
        # bytes payloads are already compressed (pngz/dctq) or incompressible
        # noise (raw) — re-compressing them burns CPU on every read; store
        # them raw, compress only the metadata columns
        pq.write_table(table, os.path.join(tmp, f"part-{k:05d}.parquet"),
                       compression={"bytes": "NONE"})

    if len(chunks) <= 1:
        for k, ch in enumerate(chunks):
            write_part(k, _make_chunk_ipc(ch))
    else:
        workers = min(16, os.cpu_count() or 4, len(chunks))
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for k, ipc in enumerate(ex.map(_make_chunk_ipc, chunks)):
                write_part(k, ipc)
    if os.path.isdir(out_path):
        shutil.rmtree(out_path)
    os.replace(tmp, out_path)


ROIS_SCHEMA = pa.schema(
    [
        ("roi_id", pa.string()),
        ("kind", pa.string()),
        ("lon_min", pa.float64()),
        ("lat_min", pa.float64()),
        ("lon_max", pa.float64()),
        ("lat_max", pa.float64()),
        ("ring", pa.list_(pa.list_(pa.float64()))),
    ]
)


def _box_ring(lon_min, lat_min, lon_max, lat_max):
    return [
        [lon_min, lat_min],
        [lon_max, lat_min],
        [lon_max, lat_max],
        [lon_min, lat_max],
        [lon_min, lat_min],
    ]


def generate_rois(out_path: str, grid: GridSpec = FIXTURE_GRID) -> None:
    """Query-geometry table mirroring the reference's test ROIs (FIXTURES.md §3)."""
    res, c = grid.res, grid.chunk
    rows = []

    def add_box(roi_id, kind, lon_min, lat_min, lon_max, lat_max):
        rows.append(
            dict(
                roi_id=roi_id,
                kind=kind,
                lon_min=lon_min,
                lat_min=lat_min,
                lon_max=lon_max,
                lat_max=lat_max,
                ring=_box_ring(lon_min, lat_min, lon_max, lat_max),
            )
        )

    # fully-inside boxes of varying size (incl. one covering the hot tile)
    add_box("roi-0", "inside", grid.x0 + 100 * res, grid.y0 + 100 * res,
            grid.x0 + 500 * res, grid.y0 + 500 * res)
    add_box("roi-1", "inside", grid.x0 + 1000 * res, grid.y0 + 1200 * res,
            grid.x0 + 1400 * res, grid.y0 + 1600 * res)
    hot_lon = grid.x0 + HOT_TILE[0] * c * res
    hot_lat = grid.y1 - (HOT_TILE[1] + 1) * c * res
    add_box("roi-hot", "inside", hot_lon, hot_lat, hot_lon + c * res, hot_lat + c * res)
    # 3 overlapping shifted boxes (tests/test_arcticdem.py:85-89 analog)
    for k in range(3):
        off = k * 64 * res
        add_box(f"roi-ov{k}", "overlapping", grid.x0 + 700 * res + off,
                grid.y0 + 700 * res + off, grid.x0 + 1100 * res + off,
                grid.y0 + 1100 * res + off)
    # out-of-bounds (expects empty result; accessor.py:430-432 analog)
    add_box("roi-oob", "out_of_bounds", grid.x1 + 1.0, grid.y1 + 1.0,
            grid.x1 + 2.0, grid.y1 + 2.0)
    # concave polygon (L-shape) for the winding-number PIP path
    x, y = grid.x0 + 200 * res, grid.y0 + 200 * res
    s = 600 * res
    rows.append(
        dict(
            roi_id="roi-concave",
            kind="concave",
            lon_min=x,
            lat_min=y,
            lon_max=x + s,
            lat_max=y + s,
            ring=[
                [x, y], [x + s, y], [x + s, y + s / 3], [x + s / 3, y + s / 3],
                [x + s / 3, y + s], [x, y + s], [x, y],
            ],
        )
    )
    pq.write_table(
        pa.table({k: [r[k] for r in rows] for k in ROIS_SCHEMA.names}, schema=ROIS_SCHEMA),
        out_path,
    )


def generate_rois_global(out_path: str, grid: GridSpec = GLOBAL_GRID) -> None:
    """Antimeridian ROIs (tests/test_antimeridian.py:9-44 analog).

    Wrapping boxes are stored with lon_min > lon_max; the engine splits them
    via geom.split_antimeridian_box.
    """
    rows = []
    rows.append(dict(roi_id="am-west", kind="antimeridian_west",
                     lon_min=-180.0, lat_min=50.0, lon_max=-179.5, lat_max=51.0,
                     ring=_box_ring(-180.0, 50.0, -179.5, 51.0)))
    rows.append(dict(roi_id="am-east", kind="antimeridian_east",
                     lon_min=179.5, lat_min=50.0, lon_max=180.0, lat_max=51.0,
                     ring=_box_ring(179.5, 50.0, 180.0, 51.0)))
    # wrapping box crossing the seam
    rows.append(dict(roi_id="am-cross", kind="antimeridian_cross",
                     lon_min=179.0, lat_min=-10.0, lon_max=-179.0, lat_max=10.0,
                     ring=_box_ring(179.0, -10.0, -179.0, 10.0)))
    rows.append(dict(roi_id="g-inside", kind="inside",
                     lon_min=-30.0, lat_min=-20.0, lon_max=10.0, lat_max=20.0,
                     ring=_box_ring(-30.0, -20.0, 10.0, 20.0)))
    pq.write_table(
        pa.table({k: [r[k] for r in rows] for k in ROIS_SCHEMA.names}, schema=ROIS_SCHEMA),
        out_path,
    )


ZONES_SCHEMA = pa.schema(
    [
        ("zone_id", pa.string()),
        ("lon_min", pa.float64()),
        ("lat_min", pa.float64()),
        ("lon_max", pa.float64()),
        ("lat_max", pa.float64()),
    ]
)


def generate_zones(out_path: str, grid: GridSpec = FIXTURE_GRID, n: int = 50) -> None:
    """Vector side of the zonal join: ~50 boxes, one hot zone ~30% of extent."""
    rng = np.random.Generator(np.random.PCG64(20260817))
    rows = []
    # hot zone covering ~30% of the extent (salting path)
    span_x = grid.width * grid.res
    span_y = grid.height * grid.res
    rows.append(dict(zone_id="zone-hot", lon_min=grid.x0, lat_min=grid.y0,
                     lon_max=grid.x0 + 0.55 * span_x, lat_max=grid.y0 + 0.55 * span_y))
    for k in range(1, n):
        cx = grid.x0 + float(rng.uniform(0.05, 0.95)) * span_x
        cy = grid.y0 + float(rng.uniform(0.05, 0.95)) * span_y
        hw = float(rng.uniform(0.01, 0.06)) * span_x
        hh = float(rng.uniform(0.01, 0.06)) * span_y
        rows.append(dict(zone_id=f"zone-{k:03d}", lon_min=cx - hw, lat_min=cy - hh,
                         lon_max=cx + hw, lat_max=cy + hh))
    pq.write_table(
        pa.table({k: [r[k] for r in rows] for k in ZONES_SCHEMA.names}, schema=ZONES_SCHEMA),
        out_path,
    )


# ---- golden tile mosaics (the ingest oracle) -------------------------------
# Reference mosaics computed at generation time by a straight "paint
# fragments in ascending patch-no order" numpy pass — independent of
# raygeo.ops.ingest's distributed fold/merge machinery (same role as the
# per-image golden columns above, and as the brute-force oracle in
# tests/test_ingest.py). One pass over the images feeds all four stored
# variants: sorted-LWW, per-pixel max, temporal (nearest-snapped slices),
# and the DEM channel pack (derived per-pixel from the LWW winner RGB).
# Parallelism: disjoint ascending patch-no slabs painted in a process pool,
# merged in slab order on the driver (later slab wins where painted).

GOLDEN_TILES_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("n_frags", pa.int64()),
        ("n_valid_px", pa.int64()),
        ("pix_sum", pa.int64()),
    ]
)


def _golden_slab(args: tuple) -> dict:
    lo, hi = args[0], args[1]
    want_med = bool(args[2]) if len(args) > 2 else False
    only_t = bool(args[3]) if len(args) > 3 else False  # temporal store only
    g = FIXTURE_GRID
    n_steps = len(TEMPORAL_GRID.times)
    lww: dict = {}
    mx: dict = {}
    tmp: dict = {}
    med: dict = {}
    for i in range(lo, hi):
        image_id, pix, fmt, w, h = _raw_pixels(i)
        decoded = decode(encode(pix, fmt)) if fmt == "dctq" else pix
        box = footprint_of(image_id, w, h, g)
        cl, ch_, rl, rh = (int(v[0]) for v in g.pixel_window(
            np.array([box[0]]), np.array([box[1]]),
            np.array([box[2]]), np.array([box[3]])))
        # nearest snap (ties -> later) onto TEMPORAL_GRID's uniform daily
        # axis, inlined so the golden stays independent of raygeo.toi
        secs = _h32(image_id + ":t") % (n_steps * 86400)
        ti = min(n_steps - 1, (secs + 43200) // 86400)
        for tx in range(cl // g.chunk, (ch_ - 1) // g.chunk + 1):
            for ty in range(rl // g.chunk, (rh - 1) // g.chunk + 1):
                tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
                c0, c1 = max(cl, tc0), min(ch_, tc1)
                r0, r1 = max(rl, tr0), min(rh, tr1)
                if c1 <= c0 or r1 <= r0:
                    continue
                sl_t = np.s_[r0 - tr0:r1 - tr0, c0 - tc0:c1 - tc0]
                frag = decoded[r0 - rl:r1 - rl, c0 - cl:c1 - cl]
                if want_med:
                    med.setdefault((tx, ty), []).append(
                        (r0 - tr0, c0 - tc0, frag.copy()))
                targets = (((int(ti), tx, ty), tmp, False),) if only_t else (
                    ((tx, ty), lww, False),
                    ((tx, ty), mx, True),
                    ((int(ti), tx, ty), tmp, False),
                )
                for key, store, is_max in targets:
                    st = store.get(key)
                    if st is None:
                        st = store[key] = [
                            np.zeros((g.chunk, g.chunk, 3), np.uint8),
                            np.zeros((g.chunk, g.chunk), bool), 0]
                    canvas, mask, _ = st
                    if is_max:
                        wr = mask[sl_t]
                        region = canvas[sl_t]
                        np.maximum(region, frag, out=region,
                                   where=wr[:, :, None])
                        region[~wr] = frag[~wr]
                    else:
                        canvas[sl_t] = frag
                    mask[sl_t] = True
                    st[2] += 1
    return {"lww": lww, "max": mx, "t": tmp, "med": med}


def _merge_slab_into(dst: dict, src: dict, is_max: bool) -> None:
    """Merge a later (higher patch-no) slab's tiles into the accumulator."""
    for key, (c2, m2, n2) in src.items():
        st = dst.get(key)
        if st is None:
            dst[key] = [c2, m2, n2]
            continue
        c1, m1, _ = st
        if is_max:
            both = m1 & m2
            np.maximum(c1, c2, out=c1, where=both[:, :, None])
            only2 = m2 & ~m1
            c1[only2] = c2[only2]
        else:
            c1[m2] = c2[m2]
        m1 |= m2
        st[2] += n2


def _golden_table(store: dict, temporal: bool, dem: bool = False) -> pa.Table:
    out: dict[str, list] = {k: [] for k in GOLDEN_TILES_SCHEMA.names}
    for key in sorted(store):
        canvas, mask, nf = store[key]
        if temporal:
            ti, tx, ty = key
            tid = f"{ti}-{tx}-{ty}"
        else:
            tx, ty = key
            tid = f"{tx}-{ty}"
        if dem:
            # DEM channel pack derived from the LWW winner RGB (raygeo
            # .channels formulas inlined): float32 elevation summed in
            # float64 at 1e-3 fixed point + bool datamask count
            demv = (canvas[..., 0].astype(np.float32) * 256.0
                    + canvas[..., 1]) / 16.0
            dmask = canvas[..., 2] >= 128
            ps = int(round(float(demv[mask].astype(np.float64).sum()) * 1000))
            ps += int(dmask[mask].sum())
        else:
            ps = int(np.where(mask[:, :, None], canvas, 0)
                     .astype(np.int64).sum())
        out["tile_id"].append(tid)
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_frags"].append(nf)
        out["n_valid_px"].append(int(mask.sum()))
        out["pix_sum"].append(ps)
    return pa.table(out, schema=GOLDEN_TILES_SCHEMA)


# ---- multimodal fixtures: video containers + PCM audio ---------------------
# Video: a deterministic container format ("RGV1": magic + uint16 frame
# count + per-frame uint32 length prefix + raygeo-codec frame payload).
# Parsing the container and decoding frames is REAL work the engine does;
# only the stand-in for a production codec (h264 etc.) is synthetic — the
# sandbox has no av/ffmpeg (see ops.multimodal.decode_external_image).
# Audio: int16 little-endian PCM — fully real decode via np.frombuffer.

VIDEOS_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("n_frames", pa.int32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fps", pa.int32()),
    ]
)

VIDEO_FRAMES_GOLDEN_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_no", pa.int32()),
        ("pix_sum", pa.int64()),
    ]
)

AUDIO_SCHEMA = pa.schema(
    [
        ("audio_id", pa.string()),
        ("bytes", pa.binary()),  # int16 LE PCM mono
        ("sr", pa.int32()),
        # goldens (ops.multimodal.AudioFeatures oracle)
        ("n_samples", pa.int64()),
        ("peak", pa.int64()),
        ("zero_crossings", pa.int64()),
        ("rms_fp", pa.int64()),  # round(rms(float64) * 1e6)
    ]
)

VIDEO_MAGIC = b"RGV1"


def pack_video(frames_encoded: list[bytes]) -> bytes:
    import struct

    parts = [VIDEO_MAGIC, struct.pack("<H", len(frames_encoded))]
    for f in frames_encoded:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def _make_video_row(i: int) -> tuple[dict, list[dict]]:
    video_id = f"vid-{i:06d}"
    n_frames = 2 + i % 7
    w = h = 32
    frames, goldens = [], []
    for k in range(n_frames):
        pix = pixels_of(f"{video_id}/f{k}", w, h)
        fmt = FMT_CYCLE[(i + k) % 3]
        buf = encode(pix, fmt)
        decoded = decode(buf) if fmt == "dctq" else pix
        frames.append(buf)
        goldens.append({
            "video_id": video_id,
            "frame_no": k,
            "pix_sum": int(decoded.astype(np.int64).sum()),
        })
    row = {"video_id": video_id, "bytes": pack_video(frames),
           "n_frames": n_frames, "w": w, "h": h, "fps": 30}
    return row, goldens


def _write_parts(tables: list[pa.Table], out_dir: str) -> None:
    """Atomic dir-of-parts parquet write (parallel Ray reads need multiple
    files — a single file is one read task, a serial bottleneck)."""
    import shutil

    tmp = out_dir + ".tmpdir"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    for k, t in enumerate(tables):
        comp = {"bytes": "NONE"} if "bytes" in t.column_names else "zstd"
        pq.write_table(t, os.path.join(tmp, f"part-{k:05d}.parquet"),
                       compression=comp)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    elif os.path.exists(out_dir):
        os.remove(out_dir)  # supersedes an old single-file layout
    os.replace(tmp, out_dir)


def generate_videos(n_videos: int, out_path: str, golden_path: str,
                    n_parts: int = 16) -> None:
    rows, gold = [], []
    for i in range(n_videos):
        r, g = _make_video_row(i)
        rows.append(r)
        gold.extend(g)

    def tbl(rs):
        return pa.table({k: [r[k] for r in rs] for k in VIDEOS_SCHEMA.names},
                        schema=VIDEOS_SCHEMA)

    per = max(1, (n_videos + n_parts - 1) // n_parts)
    _write_parts([tbl(rows[lo:lo + per]) for lo in range(0, n_videos, per)],
                 out_path)
    gt = pa.table({k: [g[k] for g in gold]
                   for k in VIDEO_FRAMES_GOLDEN_SCHEMA.names},
                  schema=VIDEO_FRAMES_GOLDEN_SCHEMA)
    pq.write_table(gt, golden_path + ".tmp", compression="zstd")
    os.replace(golden_path + ".tmp", golden_path)


def _make_audio_row(i: int) -> dict:
    audio_id = f"aud-{i:06d}"
    hv = _h32(audio_id)
    rng = np.random.Generator(np.random.PCG64(hv))
    sr = 16000
    n = 8000 + hv % 8000
    ts = np.arange(n, dtype=np.float64) / sr
    f1 = 100.0 + hv % 400
    f2 = 500.0 + (hv // 7) % 2000
    x = (0.5 * np.sin(2 * np.pi * f1 * ts)
         + 0.3 * np.sin(2 * np.pi * f2 * ts)
         + 0.1 * rng.standard_normal(n))
    pcm = np.clip(np.rint(x * 20000), -32768, 32767).astype("<i2")
    f64 = pcm.astype(np.float64)
    return {
        "audio_id": audio_id,
        "bytes": pcm.tobytes(),
        "sr": sr,
        "n_samples": n,
        "peak": int(np.abs(pcm.astype(np.int32)).max()),
        "zero_crossings": int(np.sum((pcm[:-1] < 0) != (pcm[1:] < 0))),
        "rms_fp": int(round(float(np.sqrt(np.mean(f64 * f64))) * 1e6)),
    }


def generate_audio(n_rows: int, out_path: str, n_parts: int = 16) -> None:
    rows = [_make_audio_row(i) for i in range(n_rows)]

    def tbl(rs):
        return pa.table({k: [r[k] for r in rs] for k in AUDIO_SCHEMA.names},
                        schema=AUDIO_SCHEMA)

    per = max(1, (n_rows + n_parts - 1) // n_parts)
    _write_parts([tbl(rows[lo:lo + per]) for lo in range(0, n_rows, per)],
                 out_path)


# load(roi) window queries (K5): fixed boxes, exact binary coordinates so
# the pixel-window floor/ceil math is bit-identical everywhere
LOAD_WINDOW_ROIS = (
    ("r0", -0.4, -0.3, 0.1, 0.25),
    ("r1", 0.2, 0.2, 0.7, 0.8),
    ("r2", -0.05, -0.05, 0.05, 0.05),
)

WINDOWS_GOLDEN_SCHEMA = pa.schema(
    [
        ("roi_id", pa.string()),
        ("n_valid_px", pa.int64()),
        ("pix_sum", pa.int64()),
        ("pix_min", pa.int64()),
        ("pix_max", pa.int64()),
    ]
)


def _golden_windows(lww: dict) -> pa.Table:
    """Window stats for LOAD_WINDOW_ROIS cropped out of the golden LWW
    mosaic — the engine.load(roi).stats() oracle."""
    g = FIXTURE_GRID
    out: dict[str, list] = {k: [] for k in WINDOWS_GOLDEN_SCHEMA.names}
    for roi_id, lon_min, lat_min, lon_max, lat_max in LOAD_WINDOW_ROIS:
        cl, ch_, rl, rh = (int(v[0]) for v in g.pixel_window(
            np.array([lon_min]), np.array([lat_min]),
            np.array([lon_max]), np.array([lat_max])))
        h, w = rh - rl, ch_ - cl
        win = np.zeros((h, w, 3), np.uint8)
        msk = np.zeros((h, w), bool)
        for tx in range(cl // g.chunk, (ch_ - 1) // g.chunk + 1):
            for ty in range(rl // g.chunk, (rh - 1) // g.chunk + 1):
                st = lww.get((tx, ty))
                if st is None:
                    continue
                canvas, mask, _ = st
                tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
                c0, c1 = max(cl, tc0), min(ch_, tc1)
                r0, r1 = max(rl, tr0), min(rh, tr1)
                if c1 <= c0 or r1 <= r0:
                    continue
                dst = np.s_[r0 - rl:r1 - rl, c0 - cl:c1 - cl]
                src = np.s_[r0 - tr0:r1 - tr0, c0 - tc0:c1 - tc0]
                win[dst] = canvas[src]
                msk[dst] = mask[src]
        n_valid = int(msk.sum())
        vals = win[msk]
        out["roi_id"].append(roi_id)
        out["n_valid_px"].append(n_valid)
        out["pix_sum"].append(int(vals.astype(np.int64).sum()))
        out["pix_min"].append(int(vals.min()) if n_valid else None)
        out["pix_max"].append(int(vals.max()) if n_valid else None)
    return pa.table(out, schema=WINDOWS_GOLDEN_SCHEMA)


# Median goldens keep per-tile fragment lists in memory while painting
# (~3 B x total coverage), so they are only generated for fixture sizes the
# correctness gate actually uses (sf <= 0.01); the engine's median op has no
# such bound — only its oracle does.
MEDIAN_GOLDEN_MAX = 12000


def _golden_median(med: dict) -> pa.Table:
    """Exact per-pixel lower-median composite, painted independently of the
    engine's fold: per tile, fragments stack into a NaN-padded float cube,
    one sort along depth (NaN sorts last), and the (count-1)//2 order
    statistic is gathered per pixel."""
    g = FIXTURE_GRID
    out: dict[str, list] = {k: [] for k in GOLDEN_TILES_SCHEMA.names}
    for (tx, ty) in sorted(med):
        frags = med[(tx, ty)]
        stack = np.full((len(frags), g.chunk, g.chunk, 3), np.nan, np.float32)
        for layer, (y0, x0, fr) in enumerate(frags):
            stack[layer, y0:y0 + fr.shape[0], x0:x0 + fr.shape[1]] = fr
        count = np.isfinite(stack[..., 0]).sum(axis=0)
        stack.sort(axis=0)
        idx = (np.maximum(count - 1, 0) // 2)[None, :, :, None]
        medv = np.take_along_axis(stack, idx, axis=0)[0]
        valid = count > 0
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_frags"].append(len(frags))
        out["n_valid_px"].append(int(valid.sum()))
        out["pix_sum"].append(int(medv[valid].astype(np.int64).sum()))
    return pa.table(out, schema=GOLDEN_TILES_SCHEMA)


def _golden_diff(lww: dict, mx: dict) -> pa.Table:
    """Per-tile change stats between the LWW and max golden mosaics."""
    out = {"tile_id": [], "tx": [], "ty": [], "n_valid_px": [],
           "n_diff_px": [], "abs_diff_sum": []}
    for (tx, ty) in sorted(lww):
        ca, ma, _ = lww[(tx, ty)]
        cb, mb, _ = mx[(tx, ty)]
        bothv = ma & mb
        ne = (ca != cb).any(axis=2)
        d = np.abs(ca.astype(np.int64) - cb.astype(np.int64)).sum(axis=2)
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_valid_px"].append(int((ma | mb).sum()))
        out["n_diff_px"].append(int(((ne & bothv) | (ma != mb)).sum()))
        out["abs_diff_sum"].append(int(d[bothv].sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int32()),
        "ty": pa.array(out["ty"], pa.int32()),
        "n_valid_px": pa.array(out["n_valid_px"], pa.int64()),
        "n_diff_px": pa.array(out["n_diff_px"], pa.int64()),
        "abs_diff_sum": pa.array(out["abs_diff_sum"], pa.int64()),
    })


# Foreground threshold for the connected-components golden: valid pixels
# whose R+G+B sum clears this. 600 sits ~1.7 sigma above the noise-like
# pixel sum's mean, giving a sub-percolation foreground (many small
# components) at every fixture scale.
COMPONENTS_THRESHOLD = 600


def _golden_components(lww: dict) -> pa.Table:
    """Global 4-connected components of the thresholded LWW mosaic, labeled
    by a serial ROW-RUN UNION-FIND — deliberately a different algorithm from
    the engine's per-tile min-propagation + border merge (shares only the
    pure per-pixel foreground definition). Component id = min linear pixel
    index (y * width + x) over the component: stable and derivable by both
    sides."""
    g = FIXTURE_GRID
    W, H = g.width, g.height
    fg = np.zeros((H, W), bool)
    for (tx, ty), (canvas, mask, _) in lww.items():
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        s = canvas.astype(np.int64).sum(axis=2)
        fg[tr0:tr1, tc0:tc1] = mask & (s >= COMPONENTS_THRESHOLD)

    parent: list[int] = []

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # run id -> (row, col_start, col_end); per-row list for adjacency scan
    run_meta: list[tuple[int, int, int]] = []
    prev_runs: list[tuple[int, int, int]] = []  # (start, end, run_id)
    for y in range(H):
        row = fg[y]
        d = np.diff(row.astype(np.int8))
        starts = np.flatnonzero(d == 1) + 1
        ends = np.flatnonzero(d == -1) + 1
        if row[0]:
            starts = np.concatenate([[0], starts])
        if row[-1]:
            ends = np.concatenate([ends, [W]])
        cur_runs = []
        pi = 0
        for s0, e0 in zip(starts, ends):
            rid = len(run_meta)
            run_meta.append((y, int(s0), int(e0)))
            parent.append(rid)
            cur_runs.append((int(s0), int(e0), rid))
            # union with overlapping runs in the previous row (4-conn)
            while pi > 0 and prev_runs[pi - 1][1] > s0:
                pi -= 1
            while pi < len(prev_runs) and prev_runs[pi][0] < e0:
                if prev_runs[pi][1] > s0:
                    union(rid, prev_runs[pi][2])
                if prev_runs[pi][1] <= e0:
                    pi += 1
                else:
                    break
        prev_runs = cur_runs

    comp: dict[int, list] = {}  # root -> [min_lin, area, y0, x0, y1, x1]
    for rid, (y, s0, e0) in enumerate(run_meta):
        root = find(rid)
        lin = y * W + s0
        st = comp.get(root)
        if st is None:
            comp[root] = [lin, e0 - s0, y, s0, y, e0 - 1]
        else:
            st[0] = min(st[0], lin)
            st[1] += e0 - s0
            st[2] = min(st[2], y)
            st[3] = min(st[3], s0)
            st[4] = max(st[4], y)
            st[5] = max(st[5], e0 - 1)
    rows = sorted(comp.values())
    return pa.table({
        "comp_id": pa.array([r[0] for r in rows], pa.int64()),
        "area": pa.array([r[1] for r in rows], pa.int64()),
        "y0": pa.array([r[2] for r in rows], pa.int64()),
        "x0": pa.array([r[3] for r in rows], pa.int64()),
        "y1": pa.array([r[4] for r in rows], pa.int64()),
        "x1": pa.array([r[5] for r in rows], pa.int64()),
    })


def _golden_trend(tmp: dict) -> pa.Table:
    """Per-pixel OLS slope over the temporal mosaic steps, aggregated per
    spatial tile. v = R+G+B (int); slope over steps where the pixel is
    valid (needs >= 2); slope_fp = round(slope * 1e6) — integer-input
    float64 division is correctly rounded, so cross-engine bit-exact."""
    g = FIXTURE_GRID
    spatial: dict[tuple[int, int], list] = {}
    for (ti, tx, ty), (canvas, mask, _) in tmp.items():
        spatial.setdefault((tx, ty), []).append((ti, canvas, mask))
    out = {"tile_id": [], "tx": [], "ty": [], "n_px_trend": [],
           "n_px_pos": [], "slope_fp_sum": []}
    for (tx, ty) in sorted(spatial):
        steps = spatial[(tx, ty)]
        k = g.chunk
        n = np.zeros((k, k), np.int64)
        st = np.zeros((k, k), np.int64)
        stt = np.zeros((k, k), np.int64)
        sv = np.zeros((k, k), np.int64)
        stv = np.zeros((k, k), np.int64)
        for ti, canvas, mask in steps:
            v = canvas.astype(np.int64).sum(axis=2)
            m = mask
            n += m
            st += np.where(m, ti, 0)
            stt += np.where(m, ti * ti, 0)
            sv += np.where(m, v, 0)
            stv += np.where(m, ti * v, 0)
        den = n * stt - st * st
        ok = (n >= 2) & (den > 0)
        slope = np.zeros((k, k), np.float64)
        slope[ok] = (n[ok] * stv[ok] - st[ok] * sv[ok]) / den[ok]
        slope_fp = np.round(slope * 1e6).astype(np.int64)
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_px_trend"].append(int(ok.sum()))
        out["n_px_pos"].append(int((slope_fp[ok] > 0).sum()))
        out["slope_fp_sum"].append(int(slope_fp[ok].sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int32()),
        "ty": pa.array(out["ty"], pa.int32()),
        "n_px_trend": pa.array(out["n_px_trend"], pa.int64()),
        "n_px_pos": pa.array(out["n_px_pos"], pa.int64()),
        "slope_fp_sum": pa.array(out["slope_fp_sum"], pa.int64()),
    })


def _full_plane(lww: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assemble the global RGB plane + validity + v=R+G+B from lww tiles."""
    g = FIXTURE_GRID
    rgb = np.zeros((g.height, g.width, 3), np.uint8)
    valid = np.zeros((g.height, g.width), bool)
    for (tx, ty), (canvas, mask, _) in lww.items():
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        rgb[tr0:tr1, tc0:tc1] = canvas
        valid[tr0:tr1, tc0:tc1] = mask
    v = rgb.astype(np.int64).sum(axis=2)
    return rgb, valid, v


def _golden_gradient(lww: dict) -> pa.Table:
    """Per-tile 4-neighbor absolute-gradient stats from the GLOBAL plane —
    a deliberately different decomposition from the engine's halo
    exchange (shares only the per-pixel v = R+G+B definition). A pair is
    counted when both pixels are valid and belongs to its left/top
    pixel's tile."""
    g = FIXTURE_GRID
    _, valid, v = _full_plane(lww)
    dh = np.abs(np.diff(v, axis=1))
    bh = valid[:, :-1] & valid[:, 1:]
    dv = np.abs(np.diff(v, axis=0))
    bv = valid[:-1, :] & valid[1:, :]
    out = {"tile_id": [], "tx": [], "ty": [], "n_pairs": [],
           "abs_grad_sum": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        h_b = bh[tr0:tr1, tc0:min(tc1, g.width - 1)]
        h_d = dh[tr0:tr1, tc0:min(tc1, g.width - 1)]
        v_b = bv[tr0:min(tr1, g.height - 1), tc0:tc1]
        v_d = dv[tr0:min(tr1, g.height - 1), tc0:tc1]
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_pairs"].append(int(h_b.sum()) + int(v_b.sum()))
        out["abs_grad_sum"].append(int(h_d[h_b].sum()) + int(v_d[v_b].sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_pairs": pa.array(out["n_pairs"], pa.int64()),
        "abs_grad_sum": pa.array(out["abs_grad_sum"], pa.int64()),
    })


def _golden_dilate(lww: dict, minimize: bool = False) -> pa.Table:
    """Per-tile 3x3 focal-max (dilate) stats from the GLOBAL plane — a
    deliberately different decomposition from the engine's 8-neighbor
    ring/halo exchange (shares only v = R+G+B). A pixel counts when its
    3x3 window holds >=1 valid pixel; its dilated value is the window's
    valid max."""
    g = FIXTURE_GRID
    _, valid, v = _full_plane(lww)
    H, W = v.shape
    sent = (1 << 62) if minimize else -(1 << 62)
    op = np.minimum if minimize else np.maximum
    P = np.full((H + 2, W + 2), sent, np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = np.where(valid, v, sent)
    M[1:-1, 1:-1] = valid
    mx = np.full((H, W), sent, np.int64)
    anyv = np.zeros((H, W), bool)
    for dr in range(3):
        for dc in range(3):
            mx = op(mx, P[dr:dr + H, dc:dc + W])
            anyv |= M[dr:dr + H, dc:dc + W]
    out = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "dilate_sum": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        sel = anyv[tr0:tr1, tc0:tc1]
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_px"].append(int(sel.sum()))
        out["dilate_sum"].append(int(mx[tr0:tr1, tc0:tc1][sel].sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "dilate_sum": pa.array(out["dilate_sum"], pa.int64()),
    })


def _golden_plane_pixels(lww: dict) -> pa.Table:
    """VALID-pixel dump of the serial LWW plane: (y, x, v) rows, v = the
    shared R+G+B channel sum. This is the oracle SUBSTRATE for the
    spatial-statistics family (morans/contours/otsu/idw): DuckDB
    recomputes each statistic FROM SCRATCH over these rows, so the
    driver's check is a real independent SQL replay, not a golden
    compare."""
    _, valid, v = _full_plane(lww)
    ys, xs = np.nonzero(valid)
    return pa.table({
        "y": pa.array(ys.astype(np.int64), pa.int64()),
        "x": pa.array(xs.astype(np.int64), pa.int64()),
        "v": pa.array(v[ys, xs], pa.int64()),
    })


def _golden_flowlen(lww: dict) -> pa.Table:
    """Per-tile D8 flow-path-length stats from the GLOBAL plane — serial
    full-plane pointer doubling, independent of the engine's two-level
    (in-tile chase + border-node graph) decomposition in
    ops.spatialstats.flowlen_stats. Shares only the per-pixel D8 rule
    (same as _golden_flowdir) and the definition: path length = hops to
    the terminal pit, pit itself = 0."""
    g = FIXTURE_GRID
    _, valid, v = _full_plane(lww)
    H, W = v.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    offs = ((0, 0, 1, 100000), (1, 1, 1, 70711), (2, 1, 0, 100000),
            (3, 1, -1, 70711), (4, 0, -1, 100000), (5, -1, -1, 70711),
            (6, -1, 0, 100000), (7, -1, 1, 70711))
    best = np.zeros((H, W), np.int64)
    code = np.full((H, W), 8, np.int64)
    tr = np.zeros((H, W), np.int64)
    tc = np.zeros((H, W), np.int64)
    vc = P[1:-1, 1:-1]
    for k, dr, dc, wt in offs:
        vn = P[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        mn = M[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        drop = (vc - vn) * np.int64(wt)
        ok = mn & (vc > vn) & (drop > best)
        best = np.where(ok, drop, best)
        code = np.where(ok, np.int64(k), code)
        tr = np.where(ok, np.int64(dr), tr)
        tc = np.where(ok, np.int64(dc), tc)
    rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    flat_t = ((rr + tr) * W + (cc + tc)).ravel()
    ptr = np.full(H * W, -9, np.int64)
    d = np.zeros(H * W, np.int64)
    vf, cf = valid.ravel(), code.ravel()
    ptr[vf & (cf == 8)] = -1
    mov = vf & (cf < 8)
    ptr[mov] = flat_t[mov]
    d[mov] = 1
    while True:
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        d[act] += d[j]
        ptr[act] = ptr[j]
    dlen = d.reshape(H, W)
    out = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "len_sum": [],
           "max_len": [], "n_pits": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        m = valid[tr0:tr1, tc0:tc1]
        if not m.any():
            continue
        dw = dlen[tr0:tr1, tc0:tc1][m]
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_px"].append(int(m.sum()))
        out["len_sum"].append(int(dw.sum()))
        out["max_len"].append(int(dw.max()))
        out["n_pits"].append(int((code[tr0:tr1, tc0:tc1][m] == 8).sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "len_sum": pa.array(out["len_sum"], pa.int64()),
        "max_len": pa.array(out["max_len"], pa.int64()),
        "n_pits": pa.array(out["n_pits"], pa.int64()),
    })


def _golden_flowdir(lww: dict) -> pa.Table:
    """Per-tile D8 flow-direction histogram from the GLOBAL plane — an
    independent serial decomposition of ops.stencil.flowdir_stats (shares
    only the per-pixel rule: code = argmax weighted drop over the 8
    neighbors, weights 100000 cardinal / 70711 diagonal, ties to the
    smaller code, 8 = valid pit, invalid centers excluded)."""
    g = FIXTURE_GRID
    _, valid, v = _full_plane(lww)
    H, W = v.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    offs = ((0, 0, 1, 100000), (1, 1, 1, 70711), (2, 1, 0, 100000),
            (3, 1, -1, 70711), (4, 0, -1, 100000), (5, -1, -1, 70711),
            (6, -1, 0, 100000), (7, -1, 1, 70711))
    best = np.zeros((H, W), np.int64)
    code = np.full((H, W), 8, np.int64)
    vc = P[1:-1, 1:-1]
    for k, dr, dc, wt in offs:
        vn = P[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        mn = M[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        drop = (vc - vn) * np.int64(wt)
        ok = mn & (vc > vn) & (drop > best)
        best = np.where(ok, drop, best)
        code = np.where(ok, np.int64(k), code)
    code = np.where(valid, code, np.int64(-1))
    out = {"tile_id": [], "tx": [], "ty": [], "dir_code": [], "n_px": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        win = code[tr0:tr1, tc0:tc1]
        hist = np.bincount(win[win >= 0], minlength=9).astype(np.int64)
        out["tile_id"].extend([f"{tx}-{ty}"] * 9)
        out["tx"].extend([tx] * 9)
        out["ty"].extend([ty] * 9)
        out["dir_code"].extend(range(9))
        out["n_px"].extend(hist.tolist())
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "dir_code": pa.array(out["dir_code"], pa.int64()),
        "n_px": pa.array(out["n_px"], pa.int64()),
    })


DIST_CAP = 64  # engine default cap = chunk // 2


def _golden_distance(lww: dict) -> pa.Table:
    """Per-tile capped-L1 distance-transform stats from the GLOBAL plane —
    a serial two-pass (vertical then horizontal min-plus sweep) over the
    whole 2048^2 plane, independent of the engine's per-tile DT + halo
    re-sweep decomposition."""
    g = FIXTURE_GRID
    _, valid, _v = _full_plane(lww)
    H, W = valid.shape
    cap = DIST_CAP
    f = np.where(valid, np.int64(0), np.int64(cap))
    ridx = np.arange(H, dtype=np.int64)[:, None]
    cidx = np.arange(W, dtype=np.int64)[None, :]
    down = np.minimum.accumulate(f - ridx, axis=0) + ridx
    up = np.minimum.accumulate((f + ridx)[::-1], axis=0)[::-1] - ridx
    d = np.minimum(down, up)
    right = np.minimum.accumulate(d - cidx, axis=1) + cidx
    left = np.minimum.accumulate((d + cidx)[:, ::-1], axis=1)[:, ::-1] - cidx
    d = np.minimum(np.minimum(right, left), np.int64(cap))
    out = {"tile_id": [], "tx": [], "ty": [], "n_reached": [], "dist_sum": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        win = d[tr0:tr1, tc0:tc1]
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_reached"].append(int((win < cap).sum()))
        out["dist_sum"].append(int(win.sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_reached": pa.array(out["n_reached"], pa.int64()),
        "dist_sum": pa.array(out["dist_sum"], pa.int64()),
    })


def _golden_overview_mean(lww: dict) -> pa.Table:
    """Level-1 average-resample overview from the GLOBAL plane: parent
    pixel = floor(sum of valid child pixels / count) per RGB component —
    serial full-plane decomposition, independent of the engine's
    quadrant (sum, count) shuffle."""
    g = FIXTURE_GRID
    rgb, valid, _v = _full_plane(lww)
    H, W = valid.shape
    h2, w2 = H // 2, W // 2
    cnt = valid.reshape(h2, 2, w2, 2).sum(axis=(1, 3)).astype(np.int64)
    sums = np.where(valid[:, :, None], rgb.astype(np.int64), 0) \
        .reshape(h2, 2, w2, 2, 3).sum(axis=(1, 3))
    pvalid = cnt > 0
    means = np.floor_divide(sums, np.where(pvalid, cnt, 1)[:, :, None])
    half = g.chunk // 2
    # children present per parent from the lww tile set
    kids: dict[tuple[int, int], int] = {}
    for (tx, ty) in lww:
        key = (tx // 2, ty // 2)
        kids[key] = kids.get(key, 0) + 1
    out = {"tile_id": [], "tx": [], "ty": [], "n_children": [],
           "n_valid_px": [], "mean_sum": []}
    del half
    for (ptx, pty) in sorted(kids):
        # parent (ptx, pty) = chunk x chunk window of the (H/2, W/2)
        # pooled plane at (pty*chunk, ptx*chunk)
        pr0, pc0 = pty * g.chunk, ptx * g.chunk
        win_v = pvalid[pr0:pr0 + g.chunk, pc0:pc0 + g.chunk]
        win_m = means[pr0:pr0 + g.chunk, pc0:pc0 + g.chunk]
        out["tile_id"].append(f"ovm-{ptx}-{pty}")
        out["tx"].append(ptx)
        out["ty"].append(pty)
        out["n_children"].append(kids[(ptx, pty)])
        out["n_valid_px"].append(int(win_v.sum()))
        out["mean_sum"].append(int(win_m[win_v].sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_children": pa.array(out["n_children"], pa.int64()),
        "n_valid_px": pa.array(out["n_valid_px"], pa.int64()),
        "mean_sum": pa.array(out["mean_sum"], pa.int64()),
    })


def _golden_point_sample(lww: dict, zones_path: str) -> pa.Table:
    """Per-zone-center mosaic sample from the GLOBAL plane."""
    g = FIXTURE_GRID
    _rgb, valid, v = _full_plane(lww)
    zt = pq.read_table(zones_path)
    x = (zt.column("lon_min").to_numpy() + zt.column("lon_max").to_numpy()) / 2.0
    y = (zt.column("lat_min").to_numpy() + zt.column("lat_max").to_numpy()) / 2.0
    col = np.floor((x - g.x0) / g.res).astype(np.int64)
    row = np.floor((g.y1 - y) / g.res).astype(np.int64)
    ok = (col >= 0) & (col < g.width) & (row >= 0) & (row < g.height)
    zids = zt.column("zone_id").to_pylist()
    out_ok = np.zeros(len(zids), np.int64)
    out_v = np.zeros(len(zids), np.int64)
    idx = np.nonzero(ok)[0]
    m = valid[row[idx], col[idx]]
    out_ok[idx] = m.astype(np.int64)
    out_v[idx] = np.where(m, v[row[idx], col[idx]], 0)
    return pa.table({
        "zone_id": pa.array(zids, pa.string()),
        "valid": pa.array(out_ok, pa.int64()),
        "v": pa.array(out_v, pa.int64()),
    })


def _golden_band_ratio(lww: dict) -> pa.Table:
    """Per-tile 1e-3 fixed-point (R-G)/(R+G) stats from the GLOBAL plane."""
    g = FIXTURE_GRID
    rgb, valid, _v = _full_plane(lww)
    a = rgb[:, :, 0].astype(np.int64)
    b = rgb[:, :, 1].astype(np.int64)
    sel = valid & (a + b > 0)
    q = np.where(sel, np.floor_divide(1000 * (a - b),
                                      np.where(sel, a + b, 1)), 0)
    out = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "ratio_sum": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        s = sel[tr0:tr1, tc0:tc1]
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["n_px"].append(int(s.sum()))
        out["ratio_sum"].append(int(q[tr0:tr1, tc0:tc1][s].sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "ratio_sum": pa.array(out["ratio_sum"], pa.int64()),
    })


def _golden_aspect(lww: dict) -> pa.Table:
    """Per-tile aspect-class histogram from the GLOBAL plane — identical
    integer sector rule to ops.stencil._aspect_classes, serial
    decomposition."""
    g = FIXTURE_GRID
    _, valid, v = _full_plane(lww)
    H, W = v.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    mc = M[1:-1, 1:-1]
    e, wst = P[1:-1, 2:], P[1:-1, :-2]
    s, n = P[2:, 1:-1], P[:-2, 1:-1]
    ok = (mc & M[1:-1, 2:] & M[1:-1, :-2] & M[2:, 1:-1] & M[:-2, 1:-1])
    dx = e - wst
    dy = s - n
    q = np.where((dx > 0) & (dy >= 0), 0,
                 np.where((dx <= 0) & (dy > 0), 1,
                          np.where((dx < 0) & (dy <= 0), 2, 3)))
    cls = 2 * q + (np.abs(dy) > np.abs(dx)).astype(np.int64)
    cls = np.where((dx == 0) & (dy == 0), np.int64(8), cls)
    cls = np.where(ok, cls, np.int64(-1))
    out = {"tile_id": [], "tx": [], "ty": [], "aspect_class": [], "n_px": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        win = cls[tr0:tr1, tc0:tc1]
        hist = np.bincount(win[win >= 0], minlength=9).astype(np.int64)
        out["tile_id"].extend([f"{tx}-{ty}"] * 9)
        out["tx"].extend([tx] * 9)
        out["ty"].extend([ty] * 9)
        out["aspect_class"].extend(range(9))
        out["n_px"].extend(hist.tolist())
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "aspect_class": pa.array(out["aspect_class"], pa.int64()),
        "n_px": pa.array(out["n_px"], pa.int64()),
    })


def _golden_zonal_majority(lww: dict, zones_path: str) -> pa.Table:
    """Per-zone modal v value from the GLOBAL plane (ties to smallest v;
    empty zones -> (-1, 0))."""
    from .ops.rasterize import _center_window

    g = FIXTURE_GRID
    _, valid, v = _full_plane(lww)
    zt = pq.read_table(zones_path)
    cl, ch, rl, rh = _center_window(
        g, zt.column("lon_min").to_numpy(), zt.column("lat_min").to_numpy(),
        zt.column("lon_max").to_numpy(), zt.column("lat_max").to_numpy())
    out = {"zone_id": [], "top_v": [], "cnt": []}
    for i, zid in enumerate(zt.column("zone_id").to_pylist()):
        c0, c1 = max(0, cl[i]), min(g.width, ch[i])
        r0, r1 = max(0, rl[i]), min(g.height, rh[i])
        out["zone_id"].append(zid)
        if c1 <= c0 or r1 <= r0:
            out["top_v"].append(-1)
            out["cnt"].append(0)
            continue
        m = valid[r0:r1, c0:c1]
        if not m.any():
            out["top_v"].append(-1)
            out["cnt"].append(0)
            continue
        vals, cnts = np.unique(v[r0:r1, c0:c1][m], return_counts=True)
        best = np.lexsort((vals, -cnts))[0]
        out["top_v"].append(int(vals[best]))
        out["cnt"].append(int(cnts[best]))
    return pa.table({
        "zone_id": pa.array(out["zone_id"], pa.string()),
        "top_v": pa.array(out["top_v"], pa.int64()),
        "cnt": pa.array(out["cnt"], pa.int64()),
    })


def _golden_resample(lww: dict) -> pa.Table:
    """NN warp of the global plane onto WARP_GRID; per-target-tile stats.
    Sampling uses the same center-mapping float formula as the engine
    (exact binary grids => bit-identical), but gathers from the global
    plane rather than per-source-tile fragments."""
    src, dst = FIXTURE_GRID, WARP_GRID
    rgb, valid, _ = _full_plane(lww)
    cprime = np.arange(dst.width, dtype=np.float64)
    rprime = np.arange(dst.height, dtype=np.float64)
    scol = np.floor((dst.x0 + (cprime + 0.5) * dst.res - src.x0)
                    / src.res).astype(np.int64)
    srow = np.floor((src.y1 - (dst.y1 - (rprime + 0.5) * dst.res))
                    / src.res).astype(np.int64)
    ok_c = (scol >= 0) & (scol < src.width)
    ok_r = (srow >= 0) & (srow < src.height)
    warped = np.zeros((dst.height, dst.width, 3), np.uint8)
    wvalid = np.zeros((dst.height, dst.width), bool)
    ix = np.ix_(srow[ok_r], scol[ok_c])
    warped[np.ix_(ok_r, ok_c)] = rgb[ix]
    wvalid[np.ix_(ok_r, ok_c)] = valid[ix]
    out = {"tile_id": [], "tx": [], "ty": [], "n_valid_px": [], "pix_sum": []}
    for ty in range(dst.n_ty):
        for tx in range(dst.n_tx):
            tc0, tc1, tr0, tr1 = dst.tile_pixel_window(tx, ty)
            m = wvalid[tr0:tr1, tc0:tc1]
            nv = int(m.sum())
            if nv == 0:
                continue
            ps = int(np.where(m[:, :, None], warped[tr0:tr1, tc0:tc1], 0)
                     .astype(np.int64).sum())
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["n_valid_px"].append(nv)
            out["pix_sum"].append(ps)
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "tx": pa.array(out["tx"], pa.int64()),
        "ty": pa.array(out["ty"], pa.int64()),
        "n_valid_px": pa.array(out["n_valid_px"], pa.int64()),
        "pix_sum": pa.array(out["pix_sum"], pa.int64()),
    })


def generate_tile_goldens(out_dir: str, n: int) -> None:
    """Write tiles_golden_{lww,max,t,dem[,med]}.parquet +
    windows_golden.parquet + mosaic_diff_golden.parquet +
    components_golden.parquet + trend_golden.parquet for an n-image
    fixture."""
    from concurrent.futures import ProcessPoolExecutor

    want_med = n <= MEDIAN_GOLDEN_MAX
    slab = max(500, n // 16)
    slabs = [(lo, min(lo + slab, n), want_med) for lo in range(0, n, slab)]
    agg = {"lww": {}, "max": {}, "t": {}}
    med: dict = {}

    def fold_result(res):
        for k in agg:
            _merge_slab_into(agg[k], res[k], k == "max")
        for key, lst in res.get("med", {}).items():
            med.setdefault(key, []).extend(lst)

    if len(slabs) <= 1:
        for res in map(_golden_slab, slabs):
            fold_result(res)
    else:
        workers = min(16, os.cpu_count() or 4, len(slabs))
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for res in ex.map(_golden_slab, slabs):  # ordered: ascending pno
                fold_result(res)
    if want_med:
        path = os.path.join(out_dir, "tiles_golden_med.parquet")
        pq.write_table(_golden_median(med), path + ".tmp", compression="zstd")
        os.replace(path + ".tmp", path)
        med.clear()
    dpath = os.path.join(out_dir, "mosaic_diff_golden.parquet")
    pq.write_table(_golden_diff(agg["lww"], agg["max"]), dpath + ".tmp",
                   compression="zstd")
    os.replace(dpath + ".tmp", dpath)
    cpath = os.path.join(out_dir, "components_golden.parquet")
    pq.write_table(_golden_components(agg["lww"]), cpath + ".tmp",
                   compression="zstd")
    os.replace(cpath + ".tmp", cpath)
    tpath = os.path.join(out_dir, "trend_golden.parquet")
    pq.write_table(_golden_trend(agg["t"]), tpath + ".tmp",
                   compression="zstd")
    os.replace(tpath + ".tmp", tpath)
    gpath = os.path.join(out_dir, "gradient_golden.parquet")
    pq.write_table(_golden_gradient(agg["lww"]), gpath + ".tmp",
                   compression="zstd")
    os.replace(gpath + ".tmp", gpath)
    dlpath = os.path.join(out_dir, "dilate_golden.parquet")
    pq.write_table(_golden_dilate(agg["lww"]), dlpath + ".tmp",
                   compression="zstd")
    os.replace(dlpath + ".tmp", dlpath)
    erpath = os.path.join(out_dir, "erode_golden.parquet")
    pq.write_table(_golden_dilate(agg["lww"], minimize=True),
                   erpath + ".tmp", compression="zstd")
    os.replace(erpath + ".tmp", erpath)
    rpath = os.path.join(out_dir, "resample_golden.parquet")
    pq.write_table(_golden_resample(agg["lww"]), rpath + ".tmp",
                   compression="zstd")
    os.replace(rpath + ".tmp", rpath)
    appath = os.path.join(out_dir, "aspect_golden.parquet")
    pq.write_table(_golden_aspect(agg["lww"]), appath + ".tmp",
                   compression="zstd")
    os.replace(appath + ".tmp", appath)
    zmpath = os.path.join(out_dir, "zonal_majority_golden.parquet")
    pq.write_table(
        _golden_zonal_majority(agg["lww"],
                               os.path.join(out_dir, "zones.parquet")),
        zmpath + ".tmp", compression="zstd")
    os.replace(zmpath + ".tmp", zmpath)
    ompath = os.path.join(out_dir, "overview_mean_golden.parquet")
    pq.write_table(_golden_overview_mean(agg["lww"]), ompath + ".tmp",
                   compression="zstd")
    os.replace(ompath + ".tmp", ompath)
    pspath = os.path.join(out_dir, "point_sample_golden.parquet")
    pq.write_table(
        _golden_point_sample(agg["lww"],
                             os.path.join(out_dir, "zones.parquet")),
        pspath + ".tmp", compression="zstd")
    os.replace(pspath + ".tmp", pspath)
    brpath = os.path.join(out_dir, "band_ratio_golden.parquet")
    pq.write_table(_golden_band_ratio(agg["lww"]), brpath + ".tmp",
                   compression="zstd")
    os.replace(brpath + ".tmp", brpath)
    fdpath = os.path.join(out_dir, "flowdir_golden.parquet")
    pq.write_table(_golden_flowdir(agg["lww"]), fdpath + ".tmp",
                   compression="zstd")
    os.replace(fdpath + ".tmp", fdpath)
    flpath = os.path.join(out_dir, "flowlen_golden.parquet")
    pq.write_table(_golden_flowlen(agg["lww"]), flpath + ".tmp",
                   compression="zstd")
    os.replace(flpath + ".tmp", flpath)
    pxpath = os.path.join(out_dir, "plane_pixels.parquet")
    pq.write_table(_golden_plane_pixels(agg["lww"]), pxpath + ".tmp",
                   compression="zstd")
    os.replace(pxpath + ".tmp", pxpath)
    dtpath = os.path.join(out_dir, "distance_golden.parquet")
    pq.write_table(_golden_distance(agg["lww"]), dtpath + ".tmp",
                   compression="zstd")
    os.replace(dtpath + ".tmp", dtpath)
    for name, (store, temporal, dem) in {
        "lww": (agg["lww"], False, False),
        "max": (agg["max"], False, False),
        "t": (agg["t"], True, False),
        "dem": (agg["lww"], False, True),
    }.items():
        path = os.path.join(out_dir, f"tiles_golden_{name}.parquet")
        pq.write_table(_golden_table(store, temporal, dem), path + ".tmp",
                       compression="zstd")
        os.replace(path + ".tmp", path)
    wpath = os.path.join(out_dir, "windows_golden.parquet")
    pq.write_table(_golden_windows(agg["lww"]), wpath + ".tmp",
                   compression="zstd")
    os.replace(wpath + ".tmp", wpath)
    opath = os.path.join(out_dir, "overview_golden.parquet")
    pq.write_table(_golden_overview(agg["lww"]), opath + ".tmp",
                   compression="zstd")
    os.replace(opath + ".tmp", opath)
    o2path = os.path.join(out_dir, "overview2_golden.parquet")
    pq.write_table(_golden_overview(agg["lww"], level=2), o2path + ".tmp",
                   compression="zstd")
    os.replace(o2path + ".tmp", o2path)
    zpath = os.path.join(out_dir, "mosaic_zonal_golden.parquet")
    pq.write_table(
        _golden_mosaic_zonal(agg["lww"],
                             os.path.join(out_dir, "zones.parquet")),
        zpath + ".tmp", compression="zstd")
    os.replace(zpath + ".tmp", zpath)


def _pool_tiles_once(tiles: dict) -> dict:
    """One pyramid level: children 2x2-max-pooled into parent quadrants.
    Input/output: (tx, ty) -> [canvas uint8 HxWx3, mask bool, n_children].
    Serial numpy, independent of the engine's distributed pool/assemble
    plan (shares only the per-pixel pooling definition: pooled value =
    max over the block's VALID pixels, pooled validity = any valid)."""
    g = FIXTURE_GRID
    half = g.chunk // 2
    parents: dict[tuple[int, int], list] = {}
    for (tx, ty), st_in in tiles.items():
        canvas, mask = st_in[0], st_in[1]
        masked = np.where(mask[:, :, None], canvas, 0)
        pooled = masked.reshape(half, 2, half, 2, 3).max(axis=(1, 3))
        pmask = mask.reshape(half, 2, half, 2).any(axis=(1, 3))
        key = (tx // 2, ty // 2)
        st = parents.get(key)
        if st is None:
            st = parents[key] = [
                np.zeros((g.chunk, g.chunk, 3), np.uint8),
                np.zeros((g.chunk, g.chunk), bool), 0]
        pc, pm, _n = st
        r0, c0 = (ty % 2) * half, (tx % 2) * half
        pc[r0:r0 + half, c0:c0 + half] = pooled
        pm[r0:r0 + half, c0:c0 + half] = pmask
        st[2] += 1
    return parents


def _golden_overview(lww: dict, level: int = 1) -> pa.Table:
    """Level-``level`` overview pyramid of the golden LWW mosaic via
    ``level``-fold self-composition of the one-level pool."""
    tiles = lww
    for _ in range(level):
        tiles = _pool_tiles_once(tiles)
    out: dict[str, list] = {"tile_id": [], "ptx": [], "pty": [],
                            "n_children": [], "n_valid_px": [], "pix_sum": []}
    for (ptx, pty), (pc, pm, nch) in sorted(tiles.items()):
        out["tile_id"].append(f"ov{level}-{ptx}-{pty}")
        out["ptx"].append(ptx)
        out["pty"].append(pty)
        out["n_children"].append(nch)
        out["n_valid_px"].append(int(pm.sum()))
        out["pix_sum"].append(int(pc[pm].astype(np.int64).sum()))
    return pa.table({
        "tile_id": pa.array(out["tile_id"], pa.string()),
        "ptx": pa.array(out["ptx"], pa.int64()),
        "pty": pa.array(out["pty"], pa.int64()),
        "n_children": pa.array(out["n_children"], pa.int64()),
        "n_valid_px": pa.array(out["n_valid_px"], pa.int64()),
        "pix_sum": pa.array(out["pix_sum"], pa.int64()),
    })


def _golden_mosaic_zonal(lww: dict, zones_path: str) -> pa.Table:
    """Per-zone statistics over the golden LWW MOSAIC plane (not source
    images): pixel-center membership (the rasterize window semantics), a
    pixel counts toward EVERY zone containing its center (zones may
    overlap; no winner), v = R+G+B of valid mosaic pixels."""
    zt = pq.read_table(zones_path)
    _, valid, v = _full_plane(lww)
    g = FIXTURE_GRID
    zl = np.ceil((zt.column("lon_min").to_numpy() - g.x0) / g.res - 0.5)
    zh = np.ceil((zt.column("lon_max").to_numpy() - g.x0) / g.res - 0.5)
    rl = np.ceil((g.y1 - zt.column("lat_max").to_numpy()) / g.res - 0.5)
    rh = np.ceil((g.y1 - zt.column("lat_min").to_numpy()) / g.res - 0.5)
    cl = np.clip(zl.astype(np.int64), 0, g.width)
    ch = np.clip(zh.astype(np.int64), 0, g.width)
    rlo = np.clip(rl.astype(np.int64), 0, g.height)
    rhi = np.clip(rh.astype(np.int64), 0, g.height)
    ids = zt.column("zone_id").to_pylist()
    out = {"zone_id": [], "n_px": [], "v_sum": []}
    for i, zid in enumerate(ids):
        m = valid[rlo[i]:rhi[i], cl[i]:ch[i]]
        out["zone_id"].append(zid)
        out["n_px"].append(int(m.sum()))
        out["v_sum"].append(int(v[rlo[i]:rhi[i], cl[i]:ch[i]][m].sum()))
    return pa.table({
        "zone_id": pa.array(out["zone_id"], pa.string()),
        "n_px": pa.array(out["n_px"], pa.int64()),
        "v_sum": pa.array(out["v_sum"], pa.int64()),
    })


def images_count_for_sf(sf: float) -> int:
    return max(200, int(round(sf * 1_000_000)))


def sf_of_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' -> 0.01 (defaults to 0.01 when unparseable)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.01


def fixture_dir(sf: float) -> str:
    return os.path.join(FIXTURE_ROOT, f"sf{sf:g}")


FIXTURE_LAYOUT_VERSION = "v19-flowlen-plane"


def ensure_fixtures(sf: float) -> str:
    """Idempotently generate all fixture tables for a scale factor.

    Returns the fixture directory. Atomic per-file writes + a versioned
    _SUCCESS marker make concurrent/re-entrant calls safe; a layout-version
    bump regenerates from scratch.
    """
    import shutil

    d = fixture_dir(sf)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == FIXTURE_LAYOUT_VERSION:
                return d
        shutil.rmtree(d)
    os.makedirs(d, exist_ok=True)
    n = images_count_for_sf(sf)
    if not os.path.exists(os.path.join(d, "images.parquet")):
        generate_images(n, os.path.join(d, "images.parquet"), FIXTURE_GRID)
    if not os.path.exists(os.path.join(d, "images_global.parquet")):
        generate_images(max(200, n // 10), os.path.join(d, "images_global.parquet"),
                        GLOBAL_GRID)
    generate_rois(os.path.join(d, "rois.parquet"), FIXTURE_GRID)
    generate_rois_global(os.path.join(d, "rois_global.parquet"), GLOBAL_GRID)
    generate_zones(os.path.join(d, "zones.parquet"), FIXTURE_GRID)
    if not (os.path.exists(os.path.join(d, "tiles_golden_lww.parquet"))
            and os.path.exists(os.path.join(d, "windows_golden.parquet"))
            and os.path.exists(os.path.join(d, "overview_golden.parquet"))
            and os.path.exists(os.path.join(d, "mosaic_diff_golden.parquet"))
            and os.path.exists(os.path.join(d, "components_golden.parquet"))
            and os.path.exists(os.path.join(d, "trend_golden.parquet"))
            and os.path.exists(os.path.join(d, "gradient_golden.parquet"))
            and os.path.exists(os.path.join(d, "dilate_golden.parquet"))
            and os.path.exists(os.path.join(d, "erode_golden.parquet"))
            and os.path.exists(os.path.join(d, "resample_golden.parquet"))
            and os.path.exists(os.path.join(d, "flowdir_golden.parquet"))
            and os.path.exists(os.path.join(d, "flowlen_golden.parquet"))
            and os.path.exists(os.path.join(d, "plane_pixels.parquet"))
            and os.path.exists(os.path.join(d, "distance_golden.parquet"))
            and os.path.exists(os.path.join(d, "overview_mean_golden.parquet"))
            and os.path.exists(os.path.join(d, "point_sample_golden.parquet"))
            and os.path.exists(os.path.join(d, "band_ratio_golden.parquet"))
            and os.path.exists(os.path.join(d, "aspect_golden.parquet"))
            and os.path.exists(
                os.path.join(d, "zonal_majority_golden.parquet"))
            and os.path.exists(os.path.join(d, "overview2_golden.parquet"))
            and os.path.exists(os.path.join(d, "mosaic_zonal_golden.parquet"))
            and (n > MEDIAN_GOLDEN_MAX or os.path.exists(
                os.path.join(d, "tiles_golden_med.parquet")))):
        generate_tile_goldens(d, n)
    if not (os.path.exists(os.path.join(d, "videos.parquet"))
            and os.path.exists(
                os.path.join(d, "video_frames_golden.parquet"))):
        # the golden is written AFTER the table: a crash between the two
        # must re-run generation (it is idempotent), not skip it forever
        generate_videos(max(50, n // 20), os.path.join(d, "videos.parquet"),
                        os.path.join(d, "video_frames_golden.parquet"))
    if not os.path.exists(os.path.join(d, "audio.parquet")):
        generate_audio(max(100, n // 10), os.path.join(d, "audio.parquet"))
    with open(marker + ".tmp", "w") as f:
        f.write(FIXTURE_LAYOUT_VERSION + "\n")
    os.replace(marker + ".tmp", marker)
    return d


def ensure_fixtures_for_dir(sf_dir: str) -> str:
    return ensure_fixtures(sf_of_dir(sf_dir))


def _ensure_catalog_sidecar(fix_dir: str, name: str, ext: str,
                            write_part) -> str:
    """Shared scaffold for lazily-derived catalog sidecars (JSONL/CSV):
    marker = directory presence; one part per image-parquet part keeps the
    read parallel; atomic tmp-dir rename tolerates concurrent builders.
    ``write_part(f, ids, w, s, e, n)`` does the per-part serialization."""
    import glob as _glob
    import shutil

    out = os.path.join(fix_dir, name)
    if os.path.isdir(out):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    parts = sorted(_glob.glob(os.path.join(fix_dir, "images.parquet",
                                           "*.parquet")))
    for k, part in enumerate(parts):
        t = pq.read_table(part, columns=["image_id", "lon_min", "lat_min",
                                         "lon_max", "lat_max"])
        with open(os.path.join(tmp, f"part-{k:05d}.{ext}"), "w") as f:
            write_part(f, t.column("image_id").to_pylist(),
                       t.column("lon_min").to_pylist(),
                       t.column("lat_min").to_pylist(),
                       t.column("lon_max").to_pylist(),
                       t.column("lat_max").to_pylist())
    try:
        os.replace(tmp, out)
    except OSError:
        if not os.path.isdir(out):  # lost a benign race only
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def ensure_catalog_jsonl(fix_dir: str) -> str:
    """Idempotently derive a STAC-item-style JSONL catalog from the image
    table: one line per image — {"id", "bbox": [w, s, e, n], "datetime"}.
    A *different serialization of the same metadata* so the engine's JSONL
    source path (``ray.data.read_json``) is exercised with full SQL parity
    (json floats are shortest-roundtrip, exact both ways)."""
    import json

    def write_part(f, ids, w, s, e, n):
        for j in range(len(ids)):
            dt = str(timestamp_of(ids[j])) + "Z"
            f.write(json.dumps({"id": ids[j],
                                "bbox": [w[j], s[j], e[j], n[j]],
                                "datetime": dt}) + "\n")

    return _ensure_catalog_sidecar(fix_dir, "catalog.jsonl", "jsonl",
                                   write_part)


def ensure_catalog_csv(fix_dir: str) -> str:
    """Idempotently derive a CSV sidecar catalog from the image table:
    ``id,lon_min,lat_min,lon_max,lat_max`` — the third serialization of
    the same metadata, exercising the engine's CSV source path with full
    SQL parity (floats written with ``repr`` = shortest round-trip)."""

    def write_part(f, ids, w, s, e, n):
        f.write("image_id,lon_min,lat_min,lon_max,lat_max\n")
        for j in range(len(ids)):
            f.write(f"{ids[j]},{w[j]!r},{s[j]!r},{e[j]!r},{n[j]!r}\n")

    return _ensure_catalog_sidecar(fix_dir, "catalog.csv", "csv", write_part)


_LWW_PLANE_CACHE: dict = {}


def _paint_lww_plane(fix_dir: str):
    """Serial LWW full-plane paint for lazy goldens: slab fold (ascending
    pno, the generation-time order) -> (rgb, valid, v) via `_full_plane`.
    Process-cached so back-to-back lazy ensures (histogram + hillshade on
    first oracle run) paint once."""
    from concurrent.futures import ProcessPoolExecutor

    key = os.path.abspath(fix_dir)
    if key in _LWW_PLANE_CACHE:
        return _LWW_PLANE_CACHE[key]
    n = images_count_for_sf(sf_of_dir(fix_dir))
    slab = max(500, n // 16)
    slabs = [(lo, min(lo + slab, n), False) for lo in range(0, n, slab)]
    lww: dict = {}
    if len(slabs) <= 1:
        for res in map(_golden_slab, slabs):
            _merge_slab_into(lww, res["lww"], False)
    else:
        workers = min(16, os.cpu_count() or 4, len(slabs))
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for res in ex.map(_golden_slab, slabs):  # ordered: ascending pno
                _merge_slab_into(lww, res["lww"], False)
    plane = (_full_plane(lww), lww)
    _LWW_PLANE_CACHE[key] = plane
    return plane


def ensure_histogram_golden(fix_dir: str) -> str:
    """Idempotently derive histogram_golden.parquet: the global value
    histogram (v = R+G+B per valid pixel) of the serial LWW mosaic paint.
    Shares only the pure paint path (`_paint_lww_plane`); separate marker,
    no layout-version regen."""
    out = os.path.join(fix_dir, "histogram_golden.parquet")
    if os.path.exists(out):
        return out
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    counts = np.bincount(v[valid], minlength=766)
    occ = np.nonzero(counts)[0]
    t = pa.table({
        "v_bin": pa.array(occ.astype(np.int64), pa.int64()),
        "n_px": pa.array(counts[occ].astype(np.int64), pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_hillshade_golden(fix_dir: str) -> str:
    """Idempotently derive hillshade_golden.parquet: per-tile quantized
    hillshade sums from the serial full-plane LWW paint.

    Shares ONLY the pure per-pixel derivations with the engine (the
    decode/paint path of `_golden_slab` and the `shade_q` per-pixel
    formula) — the halo-exchange decomposition is not touched. A pixel
    counts when it, its east and its south neighbor are all valid on the
    GLOBAL plane (so tile borders exercise the engine's strip exchange).
    Separate marker file; no layout-version regen."""
    from .ops.stencil import shade_q

    out = os.path.join(fix_dir, "hillshade_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), lww = _paint_lww_plane(fix_dir)
    ok = valid[:-1, :-1] & valid[:-1, 1:] & valid[1:, :-1]
    dx = v[:-1, 1:] - v[:-1, :-1]
    dy = v[1:, :-1] - v[:-1, :-1]
    sq = np.zeros_like(dx)
    sq[ok] = shade_q(dx[ok], dy[ok])
    rows = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "shade_sum": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        # owner pixels of the tile, clipped to the (H-1, W-1) diff plane
        m = ok[tr0:min(tr1, g.height - 1), tc0:min(tc1, g.width - 1)]
        sval = sq[tr0:tr0 + m.shape[0], tc0:tc0 + m.shape[1]]
        rows["tile_id"].append(f"{tx}-{ty}")
        rows["tx"].append(tx)
        rows["ty"].append(ty)
        rows["n_px"].append(int(m.sum()))
        rows["shade_sum"].append(int(sval[m].sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "shade_sum": pa.array(rows["shade_sum"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_equalize_golden(fix_dir: str, levels: int = 256) -> str:
    """Idempotently derive equalize_golden.parquet: per-tile equalized
    value sums from the serial full-plane paint + the identical integer
    CDF LUT (floor(cum * (levels-1) / total)). Shares only the paint and
    the pure LUT arithmetic; the distributed histogram/remap plan is not
    touched. Separate marker; no layout regen."""
    out = os.path.join(fix_dir, "equalize_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), lww = _paint_lww_plane(fix_dir)
    # RGB v-plane is non-negative; engine-side the LUT indexes from the
    # min bin (negative-capable float packs), which for RGB is the same
    counts = np.bincount(v[valid], minlength=766)
    total = int(counts.sum())
    lut = (np.cumsum(counts) * (levels - 1) // max(total, 1)).astype(np.int64)
    rows = {"tile_id": [], "tx": [], "ty": [], "n_valid_px": [],
            "eq_sum": []}
    for (tx, ty) in sorted(lww):
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        m = valid[tr0:tr1, tc0:tc1]
        vals = v[tr0:tr1, tc0:tc1][m]
        rows["tile_id"].append(f"{tx}-{ty}")
        rows["tx"].append(tx)
        rows["ty"].append(ty)
        rows["n_valid_px"].append(int(m.sum()))
        rows["eq_sum"].append(int(lut[vals].sum()) if len(vals) else 0)
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_valid_px": pa.array(rows["n_valid_px"], pa.int64()),
        "eq_sum": pa.array(rows["eq_sum"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_coverage_golden(fix_dir: str) -> str:
    """Idempotently derive coverage_golden.parquet: per spatial tile, the
    histogram of per-pixel valid-observation counts across the temporal
    axis — from the serial slab paint's TEMPORAL store (independent of
    the engine's keyed-groupby plan). Separate marker; no layout regen."""
    from concurrent.futures import ProcessPoolExecutor

    out = os.path.join(fix_dir, "coverage_golden.parquet")
    if os.path.exists(out):
        return out
    n = images_count_for_sf(sf_of_dir(fix_dir))
    slab = max(500, n // 16)
    # only_t: skip painting the lww/max canvas stores this golden discards
    slabs = [(lo, min(lo + slab, n), False, True) for lo in range(0, n, slab)]
    tmp: dict = {}
    if len(slabs) <= 1:
        for res in map(_golden_slab, slabs):
            _merge_slab_into(tmp, res["t"], False)
    else:
        workers = min(16, os.cpu_count() or 4, len(slabs))
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for res in ex.map(_golden_slab, slabs):  # ordered: ascending pno
                _merge_slab_into(tmp, res["t"], False)
    n_steps = len(TEMPORAL_GRID.times)
    c = TEMPORAL_GRID.chunk
    cov: dict[tuple[int, int], np.ndarray] = {}
    for (ti, tx, ty), (_, mask, _n) in tmp.items():
        a = cov.setdefault((tx, ty), np.zeros((c, c), np.int64))
        a += mask.astype(np.int64)
    rows = {"tile_id": [], "coverage": [], "n_px": []}
    for (tx, ty) in sorted(cov):
        counts = np.bincount(cov[(tx, ty)].reshape(-1),
                             minlength=n_steps + 1)
        for lvl in np.nonzero(counts)[0]:
            rows["tile_id"].append(f"{tx}-{ty}")
            rows["coverage"].append(int(lvl))
            rows["n_px"].append(int(counts[lvl]))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "coverage": pa.array(rows["coverage"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_audio_frames_golden(fix_dir: str, frame: int = 1024) -> str:
    """Idempotently derive audio_frames_golden.parquet: per-clip frame-RMS
    stats replayed from the deterministic PCM generator (`_make_audio_row`
    is a pure function of the clip index — the golden never touches the
    engine's byte-decode path). Separate marker; no layout regen."""
    out = os.path.join(fix_dir, "audio_frames_golden.parquet")
    if os.path.exists(out):
        return out
    n_imgs = images_count_for_sf(sf_of_dir(fix_dir))
    n_rows = max(100, n_imgs // 10)
    rows = {"audio_id": [], "n_frames": [], "min_frame_rms_fp": [],
            "max_frame_rms_fp": []}
    for i in range(n_rows):
        r = _make_audio_row(i)
        pcm = np.frombuffer(r["bytes"], dtype="<i2")
        nf = len(pcm) // frame
        rows["audio_id"].append(r["audio_id"])
        if nf == 0:
            rows["n_frames"].append(0)
            rows["min_frame_rms_fp"].append(0)
            rows["max_frame_rms_fp"].append(0)
            continue
        f64 = pcm[:nf * frame].astype(np.float64).reshape(nf, frame)
        rms = np.round(np.sqrt((f64 * f64).mean(axis=1)) * 1e6
                       ).astype(np.int64)
        rows["n_frames"].append(nf)
        rows["min_frame_rms_fp"].append(int(rms.min()))
        rows["max_frame_rms_fp"].append(int(rms.max()))
    t = pa.table({
        "audio_id": pa.array(rows["audio_id"], pa.string()),
        "n_frames": pa.array(rows["n_frames"], pa.int64()),
        "min_frame_rms_fp": pa.array(rows["min_frame_rms_fp"], pa.int64()),
        "max_frame_rms_fp": pa.array(rows["max_frame_rms_fp"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_flowaccum_golden(fix_dir: str, channel_t: int = 5) -> str:
    """Idempotently derive flowaccum_golden.parquet: per-tile D8
    flow-accumulation stats from a serial FULL-PLANE walk — every valid
    cell's steepest-descent path adds one visit at each cell it crosses
    (start and pit inclusive); acc(p) = total visits at p.

    Shares ONLY the pure per-pixel D8 rule (`_flowdir_codes`, the same
    anchor flowdir/flowlen goldens use) with the engine — the engine's
    tile decomposition, cross-border walker rounds and visit-plane merge
    (`ops.spatialstats.flowaccum_stats`) are not touched. Separate
    marker; no layout-version regen."""
    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "flowaccum_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(P, M).ravel()
    rr, cc = np.divmod(np.arange(H * W), W)
    nxt = np.full(H * W, -1, np.int64)
    for k, (dr, dc) in _D8_OFF.items():
        sel = codes == k
        nxt[sel] = (rr[sel] + dr) * W + (cc[sel] + dc)
    acc = np.zeros(H * W, np.int64)
    cur = np.nonzero(codes >= 0)[0]
    cnt = np.ones(len(cur), np.int64)
    for _ in range(100000):
        if len(cur) == 0:
            break
        u, inv = np.unique(cur, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        cur, cnt = u, s
        acc[cur] += cnt
        nx = nxt[cur]
        cont = nx >= 0
        cur, cnt = nx[cont], cnt[cont]
    else:  # pragma: no cover - defensive
        raise RuntimeError("flowaccum golden: walk did not converge")
    acc = acc.reshape(H, W)
    rows = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "acc_sum": [],
            "acc_max": [], "n_channel": []}
    for ty in range(g.n_ty):
        for tx in range(g.n_tx):
            tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
            a = acc[tr0:tr1, tc0:tc1]
            pos = a > 0
            if not pos.any():
                continue
            rows["tile_id"].append(f"{tx}-{ty}")
            rows["tx"].append(tx)
            rows["ty"].append(ty)
            rows["n_px"].append(int(pos.sum()))
            rows["acc_sum"].append(int(a.sum()))
            rows["acc_max"].append(int(a.max()))
            rows["n_channel"].append(int((a >= channel_t).sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "acc_sum": pa.array(rows["acc_sum"], pa.int64()),
        "acc_max": pa.array(rows["acc_max"], pa.int64()),
        "n_channel": pa.array(rows["n_channel"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


# destination frame for the cross-CRS raster warp query: a polar-stereo
# grid covering the fixture extent's projected bbox (x/y spans ~630 km)
REPROJECT_DST_GRID = GridSpec(
    name="fixture_polar", crs="POLAR_N",
    x0=8_700_000.0, y1=-8_700_000.0, res=1250.0,
    width=512, height=512, chunk=64)


def ensure_reproject_golden(fix_dir: str) -> str:
    """Idempotently derive reproject_golden.parquet: per-dst-tile NN-warp
    stats from a serial FULL-PLANE replay — every dst pixel center
    inverse-projects out of the dst CRS, forward-projects into the source
    CRS, floor-indexes and samples the serial LWW plane.

    Shares ONLY the pure projection kernels (geom.forward_xy/inverse_xy)
    and the grid floor arithmetic with the engine — the target-driven
    gather decomposition (`ops.stencil.reproject_nn`) is not touched.
    Separate marker; no layout-version regen."""
    from .geom import forward_xy, inverse_xy

    out = os.path.join(fix_dir, "reproject_golden.parquet")
    if os.path.exists(out):
        return out
    src = FIXTURE_GRID
    dst = REPROJECT_DST_GRID
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    rows = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "v_sum": []}
    for dty in range(dst.n_ty):
        for dtx in range(dst.n_tx):
            tc0, tc1, tr0, tr1 = dst.tile_pixel_window(dtx, dty)
            cols = np.arange(tc0, tc1, dtype=np.float64)
            rws = np.arange(tr0, tr1, dtype=np.float64)
            X, Y = np.meshgrid(dst.x0 + (cols + 0.5) * dst.res,
                               dst.y1 - (rws + 0.5) * dst.res)
            lon, lat = inverse_xy(dst.crs, X.ravel(), Y.ravel())
            sx, sy = forward_xy(src.crs, lon, lat)
            cs = np.floor((sx - src.x0) / src.res).astype(np.int64)
            rs = np.floor((src.y1 - sy) / src.res).astype(np.int64)
            inside = ((rs >= 0) & (rs < src.height)
                      & (cs >= 0) & (cs < src.width))
            ok = np.zeros(len(rs), bool)
            ok[inside] = valid[rs[inside], cs[inside]]
            if not ok.any():
                continue
            vs = v[rs[ok], cs[ok]]
            rows["tile_id"].append(f"{dtx}-{dty}")
            rows["tx"].append(dtx)
            rows["ty"].append(dty)
            rows["n_px"].append(int(ok.sum()))
            rows["v_sum"].append(int(vs.sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "v_sum": pa.array(rows["v_sum"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_watershed_golden(fix_dir: str) -> str:
    """Idempotently derive watershed_golden.parquet: per-tile basin stats
    from a serial FULL-PLANE pointer doubling labeling every valid cell
    with its terminal pit. Shares ONLY the pure D8 rule
    (`_flowdir_codes`) with the engine — the tile decomposition,
    border-node doubling and exit-group join
    (`ops.spatialstats.watershed_stats`) are not touched. Separate
    marker; no layout-version regen."""
    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "watershed_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(P, M).ravel()
    rr, cc = np.divmod(np.arange(H * W), W)
    ptr = np.full(H * W, -9, np.int64)
    term = np.full(H * W, -1, np.int64)
    pits = codes == 8
    ptr[pits] = -1
    term[pits] = np.nonzero(pits)[0]
    for k, (dr, dc) in _D8_OFF.items():
        sel = codes == k
        ptr[sel] = (rr[sel] + dr) * W + (cc[sel] + dc)
    for _ in range(64):
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        res = ptr[j] < 0
        term[act[res]] = term[j[res]]
        ptr[act] = ptr[j]
    else:  # pragma: no cover - defensive
        raise RuntimeError("watershed golden: doubling did not converge")
    term = term.reshape(H, W)
    rows = {"tile_id": [], "tx": [], "ty": [], "n_px": [], "n_basins": [],
            "basin_sum": [], "max_basin_px": []}
    for ty in range(g.n_ty):
        for tx in range(g.n_tx):
            tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
            tt = term[tr0:tr1, tc0:tc1]
            ok = tt >= 0
            if not ok.any():
                continue
            vals, counts = np.unique(tt[ok], return_counts=True)
            rows["tile_id"].append(f"{tx}-{ty}")
            rows["tx"].append(tx)
            rows["ty"].append(ty)
            rows["n_px"].append(int(ok.sum()))
            rows["n_basins"].append(len(vals))
            rows["basin_sum"].append(int(tt[ok].sum()))
            rows["max_basin_px"].append(int(counts.max()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "n_basins": pa.array(rows["n_basins"], pa.int64()),
        "basin_sum": pa.array(rows["basin_sum"], pa.int64()),
        "max_basin_px": pa.array(rows["max_basin_px"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_basin_golden(fix_dir: str) -> str:
    """Idempotently derive basin_golden.parquet: per-basin saddle spill
    and depression depth from a serial FULL-PLANE replay (labels by
    pointer doubling, 8-neighbor saddle candidates, drains at nodata and
    grid edges, min-fold per basin). Shares only the pure D8 rule with
    the engine (`ops.spatialstats.basin_saddles` decomposition not
    touched). Separate marker; no layout-version regen."""
    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "basin_golden.parquet")
    if os.path.exists(out):
        return out
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(P, M).ravel()
    rr, cc = np.divmod(np.arange(H * W), W)
    ptr = np.full(H * W, -9, np.int64)
    term = np.full(H * W, -1, np.int64)
    pits = codes == 8
    ptr[pits] = -1
    term[pits] = np.nonzero(pits)[0]
    for k, (dr, dc) in _D8_OFF.items():
        sel = codes == k
        ptr[sel] = (rr[sel] + dr) * W + (cc[sel] + dc)
    for _ in range(64):
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        res = ptr[j] < 0
        term[act[res]] = term[j[res]]
        ptr[act] = ptr[j]
    else:  # pragma: no cover - defensive
        raise RuntimeError("basin golden: doubling did not converge")
    term = term.reshape(H, W)
    Lp = np.full((H + 2, W + 2), -1, np.int64)
    Lp[1:-1, 1:-1] = term
    SENT = np.int64(1 << 62)
    spill_arr = {}
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            nv = P[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            nm = M[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            nl = Lp[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            both = valid & nm & (term != nl)
            if both.any():
                lb = term[both]
                sv = np.maximum(v[both], nv[both])
                for a, b in zip(lb, sv):
                    cur = spill_arr.get(a)
                    if cur is None or b < cur:
                        spill_arr[a] = int(b)
            drain = valid & ~nm
            if drain.any():
                for a, b in zip(term[drain], v[drain]):
                    cur = spill_arr.get(a)
                    if cur is None or b < cur:
                        spill_arr[a] = int(b)
    vals, counts = np.unique(term[valid], return_counts=True)
    flat_v = v.ravel()
    spill = np.asarray([spill_arr[p] for p in vals], np.int64)
    t = pa.table({
        "pit": pa.array(vals.astype(np.int64), pa.int64()),
        "basin_px": pa.array(counts.astype(np.int64), pa.int64()),
        "pit_v": pa.array(flat_v[vals], pa.int64()),
        "spill_v": pa.array(spill, pa.int64()),
        "depth": pa.array(spill - flat_v[vals], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_seasonal_golden(fix_dir: str, season_len: int = 2) -> str:
    """Idempotently derive seasonal_golden.parquet: per (season, tile)
    valid-masked per-pixel MAX of the channel-sum v across the temporal
    store's steps (season = t // season_len) — from the serial slab
    paint, independent of the engine's keyed re-key + merge plan
    (`ops.overview.seasonal_composite`). Separate marker; no layout
    regen."""
    from concurrent.futures import ProcessPoolExecutor

    out = os.path.join(fix_dir, "seasonal_golden.parquet")
    if os.path.exists(out):
        return out
    n = images_count_for_sf(sf_of_dir(fix_dir))
    slab = max(500, n // 16)
    slabs = [(lo, min(lo + slab, n), False, True)
             for lo in range(0, n, slab)]
    tmp: dict = {}
    if len(slabs) <= 1:
        for res in map(_golden_slab, slabs):
            _merge_slab_into(tmp, res["t"], False)
    else:
        workers = min(16, os.cpu_count() or 4, len(slabs))
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for res in ex.map(_golden_slab, slabs):
                _merge_slab_into(tmp, res["t"], False)
    acc: dict[tuple, list] = {}
    for (ti, tx, ty), (canvas, mask, _n) in tmp.items():
        v = canvas.astype(np.int64).sum(axis=2)
        key = (int(ti) // season_len, tx, ty)
        st = acc.get(key)
        if st is None:
            vmax = np.full(v.shape, -1, np.int64)
            anyv = np.zeros(v.shape, bool)
            st = acc[key] = [vmax, anyv]
        vmax, anyv = st
        upd = mask & (v > vmax)
        vmax[upd] = v[upd]
        anyv |= mask
    rows = {"season": [], "tile_id": [], "tx": [], "ty": [],
            "n_valid_px": [], "vmax_sum": []}
    for (s, tx, ty) in sorted(acc):
        vmax, anyv = acc[(s, tx, ty)]
        if not anyv.any():
            continue
        rows["season"].append(s)
        rows["tile_id"].append(f"{tx}-{ty}")
        rows["tx"].append(tx)
        rows["ty"].append(ty)
        rows["n_valid_px"].append(int(anyv.sum()))
        rows["vmax_sum"].append(int(vmax[anyv].sum()))
    t = pa.table({
        "season": pa.array(rows["season"], pa.int64()),
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_valid_px": pa.array(rows["n_valid_px"], pa.int64()),
        "vmax_sum": pa.array(rows["vmax_sum"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_fill_golden(fix_dir: str) -> str:
    """Idempotently derive fill_golden.parquet: per-basin fill level from
    a serial PRIORITY-FLOOD over the full plane (heap over cells, the
    classic Barnes/Planchon-Darboux algorithm) — a genuinely INDEPENDENT
    algorithm from the engine's basin-graph minimax
    (`ops.spatialstats.basin_fill`); they agree by the saddle-
    decomposition theorem. Shares only the D8 pit labeling used to key
    the output rows. Separate marker; no layout regen."""
    import heapq

    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "fill_golden.parquet")
    if os.path.exists(out):
        return out
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    # priority-flood
    fill = np.full(H * W, 1 << 62, np.int64)
    done = np.zeros(H * W, bool)
    vf = v.ravel().astype(np.int64)
    P = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = valid
    # seed cells: valid with >=1 invalid/beyond-grid 8-neighbor
    anyinv = np.zeros((H, W), bool)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            anyinv |= ~P[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
    seeds = np.nonzero((valid & anyinv).ravel())[0]
    heap = [(int(vf[i]), int(i)) for i in seeds]
    heapq.heapify(heap)
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1)]
    validf = valid.ravel()
    while heap:
        cost, i = heapq.heappop(heap)
        if done[i]:
            continue
        done[i] = True
        fill[i] = cost
        r, col = divmod(i, W)
        for dr, dc in offs:
            nr, nc = r + dr, col + dc
            if 0 <= nr < H and 0 <= nc < W:
                j = nr * W + nc
                if validf[j] and not done[j]:
                    heapq.heappush(heap, (max(cost, int(vf[j])), j))
    # pit labels (same D8 rule as the other terrain goldens)
    Pv = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    Pv[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(Pv, M).ravel()
    pits = np.nonzero(codes == 8)[0]
    t = pa.table({
        "pit": pa.array(pits.astype(np.int64), pa.int64()),
        "pit_v": pa.array(vf[pits], pa.int64()),
        "fill_v": pa.array(fill[pits], pa.int64()),
        "filled_depth": pa.array(fill[pits] - vf[pits], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_timefill_golden(fix_dir: str) -> str:
    """Idempotently derive timefill_golden.parquet: per (t, spatial tile)
    count and value-sum of temporal-gap linear interpolation — a pixel
    invalid at step t, valid at nearest earlier t0 and later t1, fills
    with ``floor((v0·(t1−t) + v1·(t−t0)) / (t1−t0))``; leading/trailing
    gaps never extrapolate. Serial full-stack replay from the slab paint,
    independent of the engine's re-key + grouped vectorized scan
    (`ops.overview.timefill_stats`). Separate marker; no layout regen."""
    from concurrent.futures import ProcessPoolExecutor

    out = os.path.join(fix_dir, "timefill_golden.parquet")
    if os.path.exists(out):
        return out
    n = images_count_for_sf(sf_of_dir(fix_dir))
    slab = max(500, n // 16)
    slabs = [(lo, min(lo + slab, n), False, True)
             for lo in range(0, n, slab)]
    tmp: dict = {}
    if len(slabs) <= 1:
        for res in map(_golden_slab, slabs):
            _merge_slab_into(tmp, res["t"], False)
    else:
        workers = min(16, os.cpu_count() or 4, len(slabs))
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for res in ex.map(_golden_slab, slabs):
                _merge_slab_into(tmp, res["t"], False)
    spatial: dict[tuple, list] = {}
    for (ti, tx, ty), (canvas, mask, _n) in tmp.items():
        spatial.setdefault((tx, ty), []).append((int(ti), canvas, mask))
    rows = {"t_idx": [], "tile_id": [], "n_filled": [], "fill_sum": []}
    for (tx, ty) in sorted(spatial):
        steps = spatial[(tx, ty)]
        T = max(ti for ti, _c, _m in steps) + 1
        k = FIXTURE_GRID.chunk
        V = np.zeros((T, k, k), np.int64)
        M = np.zeros((T, k, k), bool)
        for ti, canvas, mask in steps:
            V[ti] = np.where(mask, canvas.astype(np.int64).sum(axis=2),
                             V[ti])
            M[ti] |= mask
        # strictly-earlier / strictly-later valid step per pixel via two
        # explicit carry scans (not the engine's incl-self accumulate)
        pidx = np.full((T, k, k), -1, np.int64)
        pval = np.zeros((T, k, k), np.int64)
        nidx = np.full((T, k, k), -1, np.int64)
        nval = np.zeros((T, k, k), np.int64)
        li = np.full((k, k), -1, np.int64)
        lv = np.zeros((k, k), np.int64)
        for t in range(T):
            pidx[t], pval[t] = li, lv
            li = np.where(M[t], t, li)
            lv = np.where(M[t], V[t], lv)
        li = np.full((k, k), -1, np.int64)
        lv = np.zeros((k, k), np.int64)
        for t in range(T - 1, -1, -1):
            nidx[t], nval[t] = li, lv
            li = np.where(M[t], t, li)
            lv = np.where(M[t], V[t], lv)
        for t in range(T):
            f = (~M[t]) & (pidx[t] >= 0) & (nidx[t] >= 0)
            nf = int(f.sum())
            if not nf:
                continue
            t0, t1 = pidx[t][f], nidx[t][f]
            val = (pval[t][f] * (t1 - t) + nval[t][f] * (t - t0)) \
                // (t1 - t0)
            rows["t_idx"].append(t)
            rows["tile_id"].append(f"{tx}-{ty}")
            rows["n_filled"].append(nf)
            rows["fill_sum"].append(int(val.sum()))
    t = pa.table({
        "t_idx": pa.array(rows["t_idx"], pa.int64()),
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "n_filled": pa.array(rows["n_filled"], pa.int64()),
        "fill_sum": pa.array(rows["fill_sum"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_strahler_golden(fix_dir: str) -> str:
    """Idempotently derive strahler_golden.parquet: per-tile Strahler
    stream-order histograms from a serial FULL-PLANE topological wave —
    order(source) = 1; order(cell) = max donor order, +1 when two or
    more donors attain that max (Strahler 1957 over the D8 flow forest).

    Shares ONLY the pure per-pixel D8 rule (`_flowdir_codes`) with the
    engine — the engine's tile decomposition, donor-count exchange and
    cross-border message rounds (`ops.spatialstats.strahler_stats`) are
    not touched. Separate marker; no layout-version regen."""
    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "strahler_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(P, M).ravel()
    rr, cc = np.divmod(np.arange(H * W), W)
    nxt = np.full(H * W, -1, np.int64)
    for k, (dr, dc) in _D8_OFF.items():
        sel = codes == k
        nxt[sel] = (rr[sel] + dr) * W + (cc[sel] + dc)
    vmask = codes >= 0
    donors = np.bincount(nxt[nxt >= 0], minlength=H * W)
    order = np.zeros(H * W, np.int64)
    m = np.zeros(H * W, np.int64)
    cmax = np.zeros(H * W, np.int64)
    ready = np.nonzero(vmask & (donors == 0))[0]
    order[ready] = 1
    for _ in range(100000):
        if len(ready) == 0:
            break
        t = nxt[ready]
        keep = t >= 0
        t, o = t[keep], order[ready][keep]
        if len(t) == 0:
            break
        idx = np.lexsort((-o, t))
        t_s, o_s = t[idx], o[idx]
        starts = np.r_[0, np.nonzero(np.diff(t_s))[0] + 1]
        u = t_s[starts]
        omax = o_s[starts]
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(t_s)]))
        kmax = np.add.reduceat((o_s == omax[seg]).astype(np.int64), starts)
        cnt = np.add.reduceat(np.ones(len(t_s), np.int64), starts)
        gt = omax > m[u]
        eq = omax == m[u]
        cmax[u] = np.where(gt, kmax, np.where(eq, cmax[u] + kmax, cmax[u]))
        m[u] = np.maximum(m[u], omax)
        donors[u] -= cnt
        newly = u[donors[u] == 0]
        order[newly] = np.maximum(m[newly] + (cmax[newly] >= 2), 1)
        ready = newly
    else:  # pragma: no cover - defensive
        raise RuntimeError("strahler golden: wave did not converge")
    if (vmask & (order == 0)).any():  # pragma: no cover - defensive
        raise RuntimeError("strahler golden: unresolved cells (cycle?)")
    order = order.reshape(H, W)
    rows = {"tile_id": [], "tx": [], "ty": [], "strahler": [],
            "n_cells": []}
    for ty in range(g.n_ty):
        for tx in range(g.n_tx):
            tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
            o = order[tr0:tr1, tc0:tc1].ravel()
            o = o[o > 0]
            if not len(o):
                continue
            bc = np.bincount(o)
            for s in np.nonzero(bc)[0]:
                rows["tile_id"].append(f"{tx}-{ty}")
                rows["tx"].append(tx)
                rows["ty"].append(ty)
                rows["strahler"].append(int(s))
                rows["n_cells"].append(int(bc[s]))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "strahler": pa.array(rows["strahler"], pa.int64()),
        "n_cells": pa.array(rows["n_cells"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_costdist_golden(fix_dir: str) -> str:
    """Idempotently derive costdist_golden.parquet: per-tile least-cost
    distance stats from a serial FULL-PLANE relaxation fixpoint — seeds
    are the zone-box centers (the point_sample pixel derivation), edge
    cost a->b = (v(a)+v(b))*w with w = 2 axis / 3 diagonal, invalid
    cells impassable. The shortest-path fixpoint is unique, so this
    independently-coded whole-plane solver (shifted-plane synchronous
    relaxation + per-row/column directional scans; no tiles, no strips)
    pins `ops.spatialstats.costdist_stats`'s distributed strip-exchange
    plan exactly. Separate marker; no layout-version regen."""
    out = os.path.join(fix_dir, "costdist_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    zones = pq.read_table(os.path.join(fix_dir, "zones.parquet"))
    x = (zones.column("lon_min").to_numpy()
         + zones.column("lon_max").to_numpy()) / 2.0
    y = (zones.column("lat_min").to_numpy()
         + zones.column("lat_max").to_numpy()) / 2.0
    pc_ = np.floor((x - g.x0) / g.res).astype(np.int64)
    pr = np.floor((g.y1 - y) / g.res).astype(np.int64)
    ok = (pc_ >= 0) & (pc_ < g.width) & (pr >= 0) & (pr < g.height)
    pr, pc_ = pr[ok], pc_[ok]
    H, W = valid.shape
    INF = np.int64(1) << 62
    D = np.full((H, W), INF, np.int64)
    seed_ok = valid[pr, pc_]
    D[pr[seed_ok], pc_[seed_ok]] = 0
    V = v
    for _ in range(4 * (H + W)):
        before_sum = int(D[D < INF].sum()) if (D < INF).any() else -1
        before_n = int((D < INF).sum())
        # synchronous 8-neighbor relaxation (shifted planes)
        for dr, dc, w in ((-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
                          (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3)):
            src_r = slice(max(0, -dr), H - max(0, dr))
            src_c = slice(max(0, -dc), W - max(0, dc))
            dst_r = slice(max(0, dr), H + min(0, dr))
            dst_c = slice(max(0, dc), W + min(0, dc))
            cand = (D[src_r, src_c]
                    + (V[src_r, src_c] + V[dst_r, dst_c]) * w)
            np.minimum(cand, INF, out=cand)
            np.minimum(D[dst_r, dst_c], cand, out=D[dst_r, dst_c],
                       where=valid[dst_r, dst_c])
        # directional scans (row-ordered Gauss-Seidel, vector per row)
        for r in range(1, H):
            cand = D[r - 1] + (V[r - 1] + V[r]) * 2
            cand[1:] = np.minimum(cand[1:],
                                  D[r - 1, :-1] + (V[r - 1, :-1]
                                                   + V[r, 1:]) * 3)
            cand[:-1] = np.minimum(cand[:-1],
                                   D[r - 1, 1:] + (V[r - 1, 1:]
                                                   + V[r, :-1]) * 3)
            np.minimum(cand, INF, out=cand)
            np.minimum(D[r], cand, out=D[r], where=valid[r])
        for r in range(H - 2, -1, -1):
            cand = D[r + 1] + (V[r + 1] + V[r]) * 2
            cand[1:] = np.minimum(cand[1:],
                                  D[r + 1, :-1] + (V[r + 1, :-1]
                                                   + V[r, 1:]) * 3)
            cand[:-1] = np.minimum(cand[:-1],
                                   D[r + 1, 1:] + (V[r + 1, 1:]
                                                   + V[r, :-1]) * 3)
            np.minimum(cand, INF, out=cand)
            np.minimum(D[r], cand, out=D[r], where=valid[r])
        for i in range(1, W):
            cand = D[:, i - 1] + (V[:, i - 1] + V[:, i]) * 2
            np.minimum(cand, INF, out=cand)
            np.minimum(D[:, i], cand, out=D[:, i], where=valid[:, i])
        for i in range(W - 2, -1, -1):
            cand = D[:, i + 1] + (V[:, i + 1] + V[:, i]) * 2
            np.minimum(cand, INF, out=cand)
            np.minimum(D[:, i], cand, out=D[:, i], where=valid[:, i])
        D[~valid] = INF
        after_sum = int(D[D < INF].sum()) if (D < INF).any() else -1
        after_n = int((D < INF).sum())
        if after_sum == before_sum and after_n == before_n:
            break
    else:  # pragma: no cover - defensive
        raise RuntimeError("costdist golden: fixpoint did not converge")
    rows = {"tile_id": [], "tx": [], "ty": [], "n_reach": [],
            "dist_sum": [], "dist_max": []}
    for ty in range(g.n_ty):
        for tx in range(g.n_tx):
            tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
            d = D[tr0:tr1, tc0:tc1]
            reach = d < INF
            if not reach.any():
                continue
            rows["tile_id"].append(f"{tx}-{ty}")
            rows["tx"].append(tx)
            rows["ty"].append(ty)
            rows["n_reach"].append(int(reach.sum()))
            rows["dist_sum"].append(int(d[reach].sum()))
            rows["dist_max"].append(int(d[reach].max()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_reach": pa.array(rows["n_reach"], pa.int64()),
        "dist_sum": pa.array(rows["dist_sum"], pa.int64()),
        "dist_max": pa.array(rows["dist_max"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_streamlinks_golden(fix_dir: str, channel_t: int = 5) -> str:
    """Idempotently derive streamlinks_golden.parquet: stream-link
    segmentation from a serial FULL-PLANE replay — acc walk over the D8
    forest, channel mask (acc >= channel_t), link edges where the target
    has exactly ONE channel donor, union-find components (min-gid id).
    Shares only the pure `_flowdir_codes` rule with the engine; the
    engine's tile decomposition / donor-pair exchange / Dataset CC are
    not touched. Separate marker; no layout-version regen."""
    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "streamlinks_golden.parquet")
    if os.path.exists(out):
        return out
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(P, M).ravel()
    rr, cc = np.divmod(np.arange(H * W), W)
    nxt = np.full(H * W, -1, np.int64)
    for k, (dr, dc) in _D8_OFF.items():
        sel = codes == k
        nxt[sel] = (rr[sel] + dr) * W + (cc[sel] + dc)
    acc = np.zeros(H * W, np.int64)
    cur = np.nonzero(codes >= 0)[0]
    cnt = np.ones(len(cur), np.int64)
    for _ in range(10_000_000):
        if not len(cur):
            break
        u, inv = np.unique(cur, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        cur, cnt = u, s
        acc[cur] += cnt
        nx = nxt[cur]
        keep = nx >= 0
        cur, cnt = nx[keep], cnt[keep]
    else:  # pragma: no cover - defensive
        raise RuntimeError("streamlinks golden: walk did not converge")
    chan = (acc >= channel_t) & (codes >= 0)
    cdon = np.zeros(H * W, np.int64)
    src = np.nonzero(chan & (nxt >= 0))[0]
    np.add.at(cdon, nxt[src], 1)
    parent = {int(i): int(i) for i in np.nonzero(chan)[0]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u2 in src:
        tg = int(nxt[u2])
        if chan[tg] and cdon[tg] == 1:
            a, b = sorted((find(int(u2)), find(tg)))
            parent[b] = a
    links: dict = {}
    for g in np.nonzero(chan)[0]:
        r = find(int(g))
        n, a = links.get(r, (0, 0))
        links[r] = (n + 1, max(a, int(acc[g])))
    items = sorted(links.items())
    t = pa.table({
        "link_id": pa.array([k for k, _ in items], pa.int64()),
        "n_cells": pa.array([n for _, (n, _a) in items], pa.int64()),
        "acc_max": pa.array([a for _, (_n, a) in items], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out


def ensure_upslope_golden(fix_dir: str, channel_t: int = 100000) -> str:
    """Idempotently derive upslope_golden.parquet: VALUE-weighted flow
    accumulation (acc_v(p) = sum of v over p's upstream cells incl. p —
    the sediment/load-transport shape) from the serial full-plane walk,
    weights = cell values instead of 1. Shares only `_flowdir_codes`."""
    from .ops.spatialstats import _D8_OFF
    from .ops.stencil import _flowdir_codes

    out = os.path.join(fix_dir, "upslope_golden.parquet")
    if os.path.exists(out):
        return out
    g = FIXTURE_GRID
    (_, valid, v), _lww = _paint_lww_plane(fix_dir)
    H, W = valid.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    codes = _flowdir_codes(P, M).ravel()
    rr, cc = np.divmod(np.arange(H * W), W)
    nxt = np.full(H * W, -1, np.int64)
    for k, (dr, dc) in _D8_OFF.items():
        sel = codes == k
        nxt[sel] = (rr[sel] + dr) * W + (cc[sel] + dc)
    acc = np.zeros(H * W, np.int64)
    cur = np.nonzero(codes >= 0)[0]
    cnt = v.ravel()[cur].astype(np.int64)
    for _ in range(10_000_000):
        if not len(cur):
            break
        u, inv = np.unique(cur, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        cur, cnt = u, s
        acc[cur] += cnt
        nx = nxt[cur]
        keep = nx >= 0
        cur, cnt = nx[keep], cnt[keep]
    else:  # pragma: no cover - defensive
        raise RuntimeError("upslope golden: walk did not converge")
    acc2 = acc.reshape(H, W)
    rows = {"tile_id": [], "tx": [], "ty": [], "n_px": [],
            "acc_sum": [], "acc_max": [], "n_channel": []}
    for ty in range(g.n_ty):
        for tx in range(g.n_tx):
            tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
            a = acc2[tr0:tr1, tc0:tc1]
            pos = a > 0
            if not pos.any():
                continue
            rows["tile_id"].append(f"{tx}-{ty}")
            rows["tx"].append(tx)
            rows["ty"].append(ty)
            rows["n_px"].append(int(pos.sum()))
            rows["acc_sum"].append(int(a[pos].sum()))
            rows["acc_max"].append(int(a[pos].max()))
            rows["n_channel"].append(int((a >= channel_t).sum()))
    t = pa.table({
        "tile_id": pa.array(rows["tile_id"], pa.string()),
        "tx": pa.array(rows["tx"], pa.int64()),
        "ty": pa.array(rows["ty"], pa.int64()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "acc_sum": pa.array(rows["acc_sum"], pa.int64()),
        "acc_max": pa.array(rows["acc_max"], pa.int64()),
        "n_channel": pa.array(rows["n_channel"], pa.int64()),
    })
    pq.write_table(t, out + ".tmp", compression="zstd")
    os.replace(out + ".tmp", out)
    return out
