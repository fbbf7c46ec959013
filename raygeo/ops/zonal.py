"""Zonal raster<->vector join: per-zone statistics over image pixels.

North-star operator (SURVEY §2.4 last row; reference analog = AOI crop +
mean/min/max, ``tests/test_arcticdem.py:26-29``). Pattern: broadcast the
(small) zone table, decode + aggregate **partially inside map_batches** —
each batch emits at most one row per zone — then a tiny ``groupby(zone_id)``
final reduce. The partial combine is what keeps a hot zone (one zone covering
30% of all rows) from becoming a shuffle hot key: skew is absorbed map-side,
which is strictly stronger than salting the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codec import decode
from .stencil import _vsum
from ..util import binary_views
from ..fixtures import footprint_of
from ..grid import GridSpec


class ZonalPartial:
    """Decode images, test zone membership, emit per-zone partial sums."""

    def __init__(self, zones_ref, grid: GridSpec, decode_pixels: bool = True):
        import ray

        zones = ray.get(zones_ref) if not isinstance(zones_ref, pa.Table) else zones_ref
        self.zone_ids = zones.column("zone_id").to_pylist()
        self.z_lon_min = zones.column("lon_min").to_numpy()
        self.z_lat_min = zones.column("lat_min").to_numpy()
        self.z_lon_max = zones.column("lon_max").to_numpy()
        self.z_lat_max = zones.column("lat_max").to_numpy()
        self.grid = grid
        self.decode_pixels = decode_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        boxes = np.array(
            [footprint_of(i, int(w), int(h), self.grid) for i, w, h in zip(ids, ws, hs)]
        ).reshape(-1, 4)
        if self.decode_pixels:
            bufs = binary_views(batch.column("bytes"))
            pix_sums = np.array(
                [decode(b).astype(np.int64).sum() for b in bufs], dtype=np.int64
            )
        else:
            pix_sums = batch.column("pix_sum").to_numpy()
        bx_min, by_min, bx_max, by_max = boxes.T
        out_zone, out_n, out_sum = [], [], []
        for z in range(len(self.zone_ids)):
            hit = (
                (bx_min < self.z_lon_max[z])
                & (bx_max > self.z_lon_min[z])
                & (by_min < self.z_lat_max[z])
                & (by_max > self.z_lat_min[z])
            )
            n = int(hit.sum())
            if n:
                out_zone.append(self.zone_ids[z])
                out_n.append(n)
                out_sum.append(int(pix_sums[hit].sum()))
        return pa.table(
            {
                "zone_id": pa.array(out_zone, pa.string()),
                "n_images": pa.array(out_n, pa.int64()),
                "pix_sum_total": pa.array(out_sum, pa.int64()),
            }
        )


def zonal_stats(
    images_ds,
    zones: pa.Table,
    grid: GridSpec,
    decode_pixels: bool = True,
    concurrency=None,
    batch_size: int = 256,
):
    """images x zones -> (zone_id, n_images, pix_sum_total) Dataset."""
    from ray.data.aggregate import Sum

    cols = ["image_id", "w", "h"] + (["bytes"] if decode_pixels else ["pix_sum"])
    partials = images_ds.select_columns(cols).map_batches(
        ZonalPartial(zones, grid, decode_pixels),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
    )
    return partials.groupby("zone_id").aggregate(
        Sum("n_images", alias_name="n_images"),
        Sum("pix_sum_total", alias_name="pix_sum_total"),
    )


def nearest_zone(images_ds, zones: pa.Table, keep_cols: tuple = ()):
    """Spatial kNN JOIN (k=1): assign every image to its nearest zone by
    center-to-center squared distance — the broadcast-side nearest-
    neighbor assignment (each image vs the small zone table; the zone side
    is embedded once, never shuffled).

    Centers are ``(min + max) / 2`` and the distance ``dx*dx + dy*dy`` —
    each step one correctly-rounded IEEE double op in a fixed order, so
    the argmin is bit-deterministic and replayable in SQL. Ties break
    toward the lexicographically smaller zone_id (zones pre-sorted, argmin
    returns the first minimum).

    Output: (image_id, zone_id) — one row per image.
    """
    import pandas as pd

    order = np.argsort(np.asarray(zones.column("zone_id").to_pylist(),
                                  dtype=object), kind="stable")
    zid = np.asarray(zones.column("zone_id").to_pylist(), object)[order]
    zx = ((zones.column("lon_min").to_numpy()
           + zones.column("lon_max").to_numpy()) / 2.0)[order]
    zy = ((zones.column("lat_min").to_numpy()
           + zones.column("lat_max").to_numpy()) / 2.0)[order]

    def per_batch(t: pa.Table) -> pa.Table:
        ix = (t.column("lon_min").to_numpy()
              + t.column("lon_max").to_numpy()) / 2.0
        iy = (t.column("lat_min").to_numpy()
              + t.column("lat_max").to_numpy()) / 2.0
        dx = ix[:, None] - zx[None, :]
        dy = iy[:, None] - zy[None, :]
        d = dx * dx + dy * dy
        best = d.argmin(axis=1)
        out = {"image_id": t.column("image_id"),
               "zone_id": pa.array(zid[best], pa.string())}
        for c in keep_cols:  # pass-through payload (e.g. pix_sum)
            out[c] = t.column(c)
        return pa.table(out)

    cols = ["image_id", "lon_min", "lat_min", "lon_max", "lat_max",
            *keep_cols]
    return images_ds.select_columns(cols).map_batches(
        per_batch, batch_format="pyarrow", batch_size=8192)


def mosaic_zonal(tiles_ds, zones: pa.Table, grid: GridSpec,
                 pack=None):
    """Raster<->vector zonal join over MOSAIC TILES (the composite, not
    the source images — the post-ingest analytics pass every cube stack
    runs): per zone, valid-pixel count and v = channel-sum total.

    Pixel-center membership (identical window arithmetic to the
    rasterize burn, ``ops/rasterize._center_window``), overlapping zones
    each count the pixel (no winner). The zone table is dimension-sized
    and broadcasts in the task closure; each tile batch emits one
    (zone, n_px, v_sum) partial per intersecting zone, folded by a tiny
    keyed groupby — tile canvases never shuffle.
    """
    import zlib

    from ray.data.aggregate import Sum

    from ..channels import RGB_CHANNELS, ChannelPack
    from .rasterize import _center_window

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    cl, ch, rl, rh = _center_window(
        grid,
        zones.column("lon_min").to_numpy(), zones.column("lat_min").to_numpy(),
        zones.column("lon_max").to_numpy(), zones.column("lat_max").to_numpy())
    zids = np.asarray(zones.column("zone_id").to_pylist(), dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        out_z, out_n, out_v = [], [], []
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tc1 = tx * chunk, min((tx + 1) * chunk, grid.width)
            tr0, tr1 = ty * chunk, min((ty + 1) * chunk, grid.height)
            hit = np.nonzero((cl < tc1) & (ch > tc0)
                             & (rl < tr1) & (rh > tr0))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)  # shared 1e-3 fixed-point quantization
            for i in hit:
                c0, c1 = max(cl[i], tc0) - tc0, min(ch[i], tc1) - tc0
                r0, r1 = max(rl[i], tr0) - tr0, min(rh[i], tr1) - tr0
                m = mask[r0:r1, c0:c1]
                n = int(m.sum())
                if n == 0:
                    # still emit: zones with zero valid pixels must appear
                    out_z.append(zids[i])
                    out_n.append(0)
                    out_v.append(0)
                    continue
                out_z.append(zids[i])
                out_n.append(n)
                out_v.append(int(v[r0:r1, c0:c1][m].sum()))
        return pa.table({
            "zone_id": pa.array(out_z, pa.string()),
            "n_px": pa.array(out_n, pa.int64()),
            "v_sum": pa.array(out_v, pa.int64()),
        })

    import ray.data as rd

    # seed one zero partial per zone: a zone lying entirely over ABSENT
    # tiles emits no per-tile partial, but must still appear with
    # (0, 0) — exactly like the golden's full-plane paint
    zeros = rd.from_arrow(pa.table({
        "zone_id": pa.array(list(zids), pa.string()),
        "n_px": pa.array([0] * len(zids), pa.int64()),
        "v_sum": pa.array([0] * len(zids), pa.int64()),
    }))
    partials = tiles_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=64)
    return (partials.union(zeros)
            .groupby("zone_id")
            .aggregate(Sum("n_px", alias_name="n_px"),
                       Sum("v_sum", alias_name="v_sum")))


def zonal_crosstab(tiles_ds, zones: pa.Table, grid: GridSpec,
                   pack=None, class_width: int = 100):
    """Zone x value-class CROSS TABULATION (the GIS tabulate-area op):
    per (zone, v // class_width) the valid-pixel count — the composition
    profile of each zone over the mosaic's value classes. Pixel-center
    membership and overlapping-zones-both-count semantics are identical
    to :func:`mosaic_zonal`; only occupied (zone, class) cells appear.

    The zone table is dimension-sized and broadcasts in the task
    closure; each tile emits at most |intersecting zones| x |classes|
    partial rows (classes bounded by the value domain // class_width,
    never the raster), folded by one tiny keyed groupby — canvases
    never shuffle. Oracle: the zone-box pixel-window range join over
    the plane dump in SQL.
    """
    import zlib

    from ray.data.aggregate import Sum

    from ..channels import RGB_CHANNELS, ChannelPack
    from .rasterize import _center_window

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    cl, ch, rl, rh = _center_window(
        grid,
        zones.column("lon_min").to_numpy(), zones.column("lat_min").to_numpy(),
        zones.column("lon_max").to_numpy(), zones.column("lat_max").to_numpy())
    zids = np.asarray(zones.column("zone_id").to_pylist(), dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        out_z, out_c, out_n = [], [], []
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tc1 = tx * chunk, min((tx + 1) * chunk, grid.width)
            tr0, tr1 = ty * chunk, min((ty + 1) * chunk, grid.height)
            hit = np.nonzero((cl < tc1) & (ch > tc0)
                             & (rl < tr1) & (rh > tr0))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            cls = _vsum(canvas, pack) // class_width
            for i in hit:
                c0, c1 = max(cl[i], tc0) - tc0, min(ch[i], tc1) - tc0
                r0, r1 = max(rl[i], tr0) - tr0, min(rh[i], tr1) - tr0
                m = mask[r0:r1, c0:c1]
                if not m.any():
                    continue
                sub = cls[r0:r1, c0:c1][m]
                cnt = np.bincount(sub - int(sub.min()))
                occ = np.nonzero(cnt)[0]
                base = int(sub.min())
                for k in occ:
                    out_z.append(zids[i])
                    out_c.append(base + int(k))
                    out_n.append(int(cnt[k]))
        return pa.table({
            "zone_id": pa.array(out_z, pa.string()),
            "v_class": pa.array(out_c, pa.int64()),
            "n_px": pa.array(out_n, pa.int64()),
        })

    return (tiles_ds.map_batches(partial, batch_format="pyarrow",
                                 batch_size=64)
            .groupby(["zone_id", "v_class"])
            .aggregate(Sum("n_px", alias_name="n_px")))


def mosaic_histogram(tiles_ds, grid: GridSpec, pack=None):
    """Global value histogram of the MOSAIC (the band-statistics pass a
    raster engine runs before choosing stretch/normalization bounds):
    per valid pixel v = channel sum (floats quantized x1000, like
    ``mosaic_zonal``), one row per occupied bin.

    Per-tile partial ``np.bincount`` map-side; the shuffle carries at most
    |bins| rows per batch (bounded by the value domain, NOT the raster
    size), folded by one tiny keyed groupby. Canvases never shuffle.
    """
    import zlib

    from ray.data.aggregate import Sum

    from ..channels import RGB_CHANNELS, ChannelPack

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def partial(t: pa.Table) -> pa.Table:
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        vs = []
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)  # shared 1e-3 fixed-point quantization
            vals = v[mask]
            if len(vals):
                vs.append(vals.ravel())
        if not vs:
            return pa.table({"v_bin": pa.array([], pa.int64()),
                             "n_px": pa.array([], pa.int64())})
        # bincount over the OFFSET domain (values may be negative for float
        # packs): O(n + domain) vs unique's O(n log n); domain is bounded by
        # the quantized channel-sum range, never the raster size
        allv = np.concatenate(vs)
        mn = int(allv.min())
        counts = np.bincount(allv - mn)
        occ = np.nonzero(counts)[0]
        return pa.table({
            "v_bin": pa.array(occ + mn, pa.int64()),
            "n_px": pa.array(counts[occ].astype(np.int64), pa.int64()),
        })

    return (tiles_ds.select_columns(["px_z", "mask_z"])
            .map_batches(partial, batch_format="pyarrow", batch_size=16,
                         num_cpus=1)
            .groupby("v_bin")
            .aggregate(Sum("n_px", alias_name="n_px")))


def tile_impurity(tiles_ds, grid: GridSpec, pack=None):
    """Per-tile value-histogram Gini impurity, q6 fixed-point — the
    texture/diversity stratification signal next to LBP and entropy:
    ``impurity_q6 = (n² − Σ_v c_v²)·10⁶ // n²`` over the tile's valid
    channel-sum values (0 = constant tile, → 10⁶ as values spread).
    Exact integer arithmetic (no log, unlike Shannon entropy), so DuckDB
    replays it bit-for-bit from the plane dump.

    A pure per-tile map — the value histogram never leaves the task and
    NOTHING shuffles (each tile row already holds its canvas). Output
    (tile_id, tx, ty, n_px, impurity_q6) for tiles with >= 1 valid px.
    """
    import zlib

    from ..channels import RGB_CHANNELS, ChannelPack

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    OUT = pa.schema([("tile_id", pa.string()), ("tx", pa.int64()),
                     ("ty", pa.int64()), ("n_px", pa.int64()),
                     ("impurity_q6", pa.int64())])

    def per_tile(t: pa.Table) -> pa.Table:
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        out: dict[str, list] = {k: [] for k in OUT.names}
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            vals = _vsum(canvas, pack)[mask]
            n = len(vals)
            if not n:
                continue
            counts = np.bincount(vals - int(vals.min()))
            ssq = int((counts.astype(np.int64) ** 2).sum())
            out["tile_id"].append(f"{txs[j]}-{tys[j]}")
            out["tx"].append(int(txs[j]))
            out["ty"].append(int(tys[j]))
            out["n_px"].append(n)
            out["impurity_q6"].append((n * n - ssq) * 10**6 // (n * n))
        return pa.table(out, schema=OUT)

    return (tiles_ds.select_columns(["tx", "ty", "px_z", "mask_z"])
            .map_batches(per_tile, batch_format="pyarrow", batch_size=16,
                         num_cpus=1))


def mosaic_equalize(tiles_ds, grid: GridSpec, pack=None,
                    levels: int = 256):
    """Histogram equalization of the mosaic (the contrast-stretch classic)
    — a CHAINED plan: the global value histogram folds distributed
    (``mosaic_histogram``), the driver turns the 766-bin CDF into an
    integer LUT (``floor(cum * (levels-1) / total)`` — exact), broadcasts
    it, and a second pass remaps every tile. Output per tile:
    (tile_id, tx, ty, n_valid_px, eq_sum) with eq_sum = Σ lut[v] over
    valid pixels — all-integer, golden-checkable.

    The tiles dataset is consumed twice (histogram + remap): callers pass
    a materialized mosaic (it is the op's own product, O(cube) not
    O(source images)) or accept one upstream recompute.
    """
    import zlib

    from ..channels import RGB_CHANNELS, ChannelPack

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    hist = mosaic_histogram(tiles_ds, grid, pack).to_pandas()
    hist = hist.sort_values("v_bin")
    # mosaic_histogram supports NEGATIVE bins (float packs quantize x1000
    # around zero) — index the LUT from vmin, never raw values, or
    # negative bins wrap-index and silently corrupt the CDF
    vmin = int(hist["v_bin"].min()) if len(hist) else 0
    vmax = int(hist["v_bin"].max()) if len(hist) else 0
    counts = np.zeros(vmax - vmin + 1, np.int64)
    counts[hist["v_bin"].to_numpy() - vmin] = hist["n_px"].to_numpy()
    total = int(counts.sum())
    cum = np.cumsum(counts)
    lut = (cum * (levels - 1) // max(total, 1)).astype(np.int64)

    import ray

    lut_ref = ray.put((lut, vmin))

    def remap(t: pa.Table) -> pa.Table:
        lt, v0 = ray.get(lut_ref)
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        out_sum = np.zeros(len(t), np.int64)
        out_n = np.zeros(len(t), np.int64)
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            vals = v[mask]
            out_n[j] = len(vals)
            out_sum[j] = int(lt[vals - v0].sum()) if len(vals) else 0
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx").cast(pa.int64()),
            "ty": t.column("ty").cast(pa.int64()),
            "n_valid_px": pa.array(out_n, pa.int64()),
            "eq_sum": pa.array(out_sum, pa.int64()),
        })

    return tiles_ds.map_batches(remap, batch_format="pyarrow",
                                batch_size=64, num_cpus=1)


def point_sample(tiles_ds, points: pa.Table, grid: GridSpec, pack=None):
    """Raster value extraction at vector points — the GIS point-query op
    (label a point set from a mosaic; the read every training pipeline
    runs to attach raster covariates to samples).

    The point table is dimension-sized and broadcasts in the task
    closure; a point's pixel lies in EXACTLY ONE tile, so each tile batch
    gathers only its own points and the tiny keyed Sum over the zero
    seed union reconstructs every point — ZERO shuffle of raster bytes.
    Points outside the grid, over absent tiles, or on nodata pixels
    report (valid=0, v=0). v = the shared 1e-3 fixed-point channel sum
    (``stencil._vsum``). Returns (zone_id, valid, v).
    """
    import zlib

    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..channels import RGB_CHANNELS, ChannelPack

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    x = (points.column("lon_min").to_numpy()
         + points.column("lon_max").to_numpy()) / 2.0
    y = (points.column("lat_min").to_numpy()
         + points.column("lat_max").to_numpy()) / 2.0
    col = np.floor((x - grid.x0) / grid.res).astype(np.int64)
    row = np.floor((grid.y1 - y) / grid.res).astype(np.int64)
    ok = (col >= 0) & (col < grid.width) & (row >= 0) & (row < grid.height)
    pids = np.asarray(points.column("zone_id").to_pylist(), dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        out_i, out_ok, out_v = [], [], []
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tr0 = tx * chunk, ty * chunk
            hit = np.nonzero(ok & (col >= tc0) & (col < tc0 + chunk)
                             & (row >= tr0) & (row < tr0 + chunk))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            r, c = row[hit] - tr0, col[hit] - tc0
            m = mask[r, c]
            out_i.extend(pids[hit].tolist())
            out_ok.extend(m.astype(np.int64).tolist())
            out_v.extend(np.where(m, v[r, c], 0).tolist())
        return pa.table({
            "zone_id": pa.array(out_i, pa.string()),
            "valid": pa.array(out_ok, pa.int64()),
            "v": pa.array(out_v, pa.int64()),
        })

    zeros = rd.from_arrow(pa.table({
        "zone_id": pa.array(list(pids), pa.string()),
        "valid": pa.array([0] * len(pids), pa.int64()),
        "v": pa.array([0] * len(pids), pa.int64()),
    }))
    partials = tiles_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=64)
    return (partials.union(zeros)
            .groupby("zone_id")
            .aggregate(Sum("valid", alias_name="valid"),
                       Sum("v", alias_name="v")))


def band_ratio_stats(tiles_ds, grid: GridSpec, pack=None,
                     num_comp: int = 0, den_comp: int = 1):
    """Raster band algebra: per-tile stats of the normalized band
    difference (A - B) / (A + B) — the NDVI/NDWI shape — in EXACT 1e-3
    fixed point: q = floor(1000 * (A - B) / (A + B)) over valid pixels
    with A + B > 0 (floor division, negatives floor toward -inf; the
    golden uses the identical numpy floor_divide).

    Pure per-tile map: raster algebra touches each tile once and
    shuffles nothing but the one stats row per tile. Returns
    (tile_id, tx, ty, n_px, ratio_sum).
    """
    import zlib

    from ..channels import RGB_CHANNELS, ChannelPack

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def stats(t: pa.Table) -> pa.Table:
        out = {"tile_id": [], "tx": [], "ty": [], "n_px": [],
               "ratio_sum": []}
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            rgb = canvas[0]  # components of the first channel (e.g. R, G)
            a = rgb[:, :, num_comp].astype(np.int64)
            b = rgb[:, :, den_comp].astype(np.int64)
            sel = mask & (a + b > 0)
            q = np.floor_divide(1000 * (a[sel] - b[sel]), (a + b)[sel])
            out["tile_id"].append(f"{int(txs[j])}-{int(tys[j])}")
            out["tx"].append(int(txs[j]))
            out["ty"].append(int(tys[j]))
            out["n_px"].append(int(sel.sum()))
            out["ratio_sum"].append(int(q.sum()))
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "tx": pa.array(out["tx"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            "n_px": pa.array(out["n_px"], pa.int64()),
            "ratio_sum": pa.array(out["ratio_sum"], pa.int64()),
        })

    return tiles_ds.map_batches(stats, batch_format="pyarrow",
                                batch_size=64)


def zonal_majority(tiles_ds, zones: pa.Table, grid: GridSpec, pack=None):
    """Zonal MODE (majority vote): per zone, the most frequent v value
    among valid mosaic pixels (ties to the smallest v) — the categorical
    analog of mosaic_zonal's sum, the landcover-class-per-polygon shape.

    Per-tile partials emit (zone, v, cnt) rows — bounded by zones x the
    tile's distinct v values, never pixels — then one keyed groupby per
    zone argmaxes. A zero seed keeps empty zones present with
    (v=-1, cnt=0). Returns (zone_id, top_v, cnt).
    """
    import zlib

    import ray.data as rd

    from ..channels import RGB_CHANNELS, ChannelPack
    from .rasterize import _center_window

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    cl, ch, rl, rh = _center_window(
        grid,
        zones.column("lon_min").to_numpy(), zones.column("lat_min").to_numpy(),
        zones.column("lon_max").to_numpy(), zones.column("lat_max").to_numpy())
    zids = np.asarray(zones.column("zone_id").to_pylist(), dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        out_z, out_v, out_c = [], [], []
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tc1 = tx * chunk, min((tx + 1) * chunk, grid.width)
            tr0, tr1 = ty * chunk, min((ty + 1) * chunk, grid.height)
            hit = np.nonzero((cl < tc1) & (ch > tc0)
                             & (rl < tr1) & (rh > tr0))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            for i in hit:
                c0, c1 = max(cl[i], tc0) - tc0, min(ch[i], tc1) - tc0
                r0, r1 = max(rl[i], tr0) - tr0, min(rh[i], tr1) - tr0
                m = mask[r0:r1, c0:c1]
                if not m.any():
                    continue
                vals, cnts = np.unique(v[r0:r1, c0:c1][m],
                                       return_counts=True)
                out_z.extend([zids[i]] * len(vals))
                out_v.extend(vals.tolist())
                out_c.extend(cnts.astype(np.int64).tolist())
        return pa.table({
            "zone_id": pa.array(out_z, pa.string()),
            "v": pa.array(out_v, pa.int64()),
            "cnt": pa.array(out_c, pa.int64()),
        })

    zeros = rd.from_arrow(pa.table({
        "zone_id": pa.array(list(zids), pa.string()),
        "v": pa.array([-1] * len(zids), pa.int64()),
        "cnt": pa.array([0] * len(zids), pa.int64()),
    }))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("v", sort=False)["cnt"].sum().reset_index()
             .sort_values(["cnt", "v"], ascending=[False, True]))
        s = s[s["cnt"] > 0]
        if len(s) == 0:
            return pd.DataFrame({"zone_id": [g["zone_id"].iloc[0]],
                                 "top_v": np.array([-1], np.int64),
                                 "cnt": np.array([0], np.int64)})
        top = s.iloc[0]
        return pd.DataFrame({"zone_id": [g["zone_id"].iloc[0]],
                             "top_v": np.array([top["v"]], np.int64),
                             "cnt": np.array([top["cnt"]], np.int64)})

    import pandas as pd  # noqa: F811

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=64)
    return (partials.union(zeros)
            .groupby("zone_id").map_groups(pick, batch_format="pandas"))


def zonal_median(tiles_ds, zones: pa.Table, grid, pack=None):
    """Zonal EXACT MEDIAN: per zone bbox, the lower median (rank
    ceil(n/2) — DuckDB ``quantile_disc(v, 0.5)`` semantics) of the v
    values over valid mosaic pixels, plus the pixel count.

    Per-tile partials emit (zone, v, cnt) histogram rows — bounded by
    zones x distinct v values, never pixels (the value domain is 766 for
    RGB) — then one keyed per-zone fold reads the median off the sorted
    cumulative histogram. Zones with no valid pixel are omitted (both
    sides of the oracle agree). Returns (zone_id, n_px, med_v)."""
    import zlib

    import pandas as pd

    from ..channels import RGB_CHANNELS, ChannelPack
    from .stencil import _vsum

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    res = grid.res
    # inclusive pixel windows, the box-sums probe convention; a zone
    # entirely outside the grid keeps an EMPTY (inverted) window — the
    # oracle's one-sided clips would never match it either
    cl = np.floor((zones.column("lon_min").to_numpy() - grid.x0)
                  / res).astype(np.int64)
    ch = np.floor((zones.column("lon_max").to_numpy() - grid.x0)
                  / res).astype(np.int64)
    rl = np.floor((grid.y1 - zones.column("lat_max").to_numpy())
                  / res).astype(np.int64)
    rh = np.floor((grid.y1 - zones.column("lat_min").to_numpy())
                  / res).astype(np.int64)
    cl = np.maximum(cl, 0)
    rl = np.maximum(rl, 0)
    ch = np.minimum(ch, grid.width - 1)
    rh = np.minimum(rh, grid.height - 1)
    zids = np.asarray(zones.column("zone_id").to_pylist(), dtype=object)

    def partial(t: pa.Table) -> pa.Table:
        out_z, out_v, out_c = [], [], []
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tc1 = tx * chunk, min((tx + 1) * chunk, grid.width)
            tr0, tr1 = ty * chunk, min((ty + 1) * chunk, grid.height)
            hit = np.nonzero((cl < tc1) & (ch >= tc0)
                             & (rl < tr1) & (rh >= tr0))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]),
                                     chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk,
                                                   chunk).astype(bool)
            v = _vsum(canvas, pack)
            for i in hit:
                c0 = max(int(cl[i]), tc0) - tc0
                c1 = min(int(ch[i]) + 1, tc1) - tc0
                r0 = max(int(rl[i]), tr0) - tr0
                r1 = min(int(rh[i]) + 1, tr1) - tr0
                if c1 <= c0 or r1 <= r0:
                    continue
                m = mask[r0:r1, c0:c1]
                if not m.any():
                    continue
                vals, cnts = np.unique(v[r0:r1, c0:c1][m],
                                       return_counts=True)
                out_z.extend([zids[i]] * len(vals))
                out_v.extend(vals.tolist())
                out_c.extend(cnts.astype(np.int64).tolist())
        return pa.table({
            "zone_id": pa.array(out_z, pa.string()),
            "v": pa.array(out_v, pa.int64()),
            "cnt": pa.array(out_c, pa.int64()),
        })

    def med(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("v", sort=False)["cnt"].sum().reset_index()
             .sort_values("v"))
        n = int(s["cnt"].sum())
        rank = (n + 1) // 2  # lower median, quantile_disc(0.5)
        cum = s["cnt"].cumsum()
        m = int(s.loc[cum >= rank, "v"].iloc[0])
        return pd.DataFrame({"zone_id": [g["zone_id"].iloc[0]],
                             "n_px": np.array([n], np.int64),
                             "med_v": np.array([m], np.int64)})

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=64)
    return partials.groupby("zone_id").map_groups(med,
                                                  batch_format="pandas")


def zonal_extremes(tiles_ds, zones: pa.Table, grid, pack=None):
    """Zonal EXTREMES with argmin/argmax locations: per zone bbox, the
    minimum and maximum valid-pixel v with the GLOBAL pixel coordinates
    of each extremum (ties → smallest (y, x) row-major) — the
    where-is-the-peak / where-is-the-sink query zonal_stats' sums can't
    answer. Returns (zone_id, n_px, v_min, min_y, min_x, v_max, max_y,
    max_x); zones with no valid pixel are omitted.

    Same shape as :func:`zonal_median`: broadcast zone windows (inclusive
    box-sums convention), per-(tile, zone) scalar partial rows, one tiny
    keyed fold — canvases never shuffle, partials are O(zones·tiles-hit).
    """
    import zlib

    import pandas as pd

    from ..channels import RGB_CHANNELS, ChannelPack
    from .stencil import _vsum

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    res = grid.res
    cl = np.floor((zones.column("lon_min").to_numpy() - grid.x0)
                  / res).astype(np.int64)
    ch = np.floor((zones.column("lon_max").to_numpy() - grid.x0)
                  / res).astype(np.int64)
    rl = np.floor((grid.y1 - zones.column("lat_max").to_numpy())
                  / res).astype(np.int64)
    rh = np.floor((grid.y1 - zones.column("lat_min").to_numpy())
                  / res).astype(np.int64)
    cl = np.maximum(cl, 0)
    rl = np.maximum(rl, 0)
    ch = np.minimum(ch, grid.width - 1)
    rh = np.minimum(rh, grid.height - 1)
    zids = np.asarray(zones.column("zone_id").to_pylist(), dtype=object)
    BIG = np.int64(1) << 62

    def partial(t: pa.Table) -> pa.Table:
        out = {"zone_id": [], "n_px": [], "v_min": [], "min_y": [],
               "min_x": [], "v_max": [], "max_y": [], "max_x": []}
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tc1 = tx * chunk, min((tx + 1) * chunk, grid.width)
            tr0, tr1 = ty * chunk, min((ty + 1) * chunk, grid.height)
            hit = np.nonzero((cl < tc1) & (ch >= tc0)
                             & (rl < tr1) & (rh >= tr0))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]),
                                     chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk,
                                                   chunk).astype(bool)
            v = _vsum(canvas, pack)
            for i in hit:
                c0 = max(int(cl[i]), tc0) - tc0
                c1 = min(int(ch[i]) + 1, tc1) - tc0
                r0 = max(int(rl[i]), tr0) - tr0
                r1 = min(int(rh[i]) + 1, tr1) - tr0
                if c1 <= c0 or r1 <= r0:
                    continue
                m = mask[r0:r1, c0:c1]
                if not m.any():
                    continue
                w = v[r0:r1, c0:c1]
                lo = np.where(m, w, BIG)
                hi = np.where(m, w, -BIG)
                # row-major argmin/argmax = first hit = smallest (y, x)
                fi = int(np.argmin(lo))
                fa = int(np.argmax(hi))
                h = c1 - c0
                out["zone_id"].append(zids[i])
                out["n_px"].append(int(m.sum()))
                out["v_min"].append(int(lo.ravel()[fi]))
                out["min_y"].append(tr0 + r0 + fi // h)
                out["min_x"].append(tc0 + c0 + fi % h)
                out["v_max"].append(int(hi.ravel()[fa]))
                out["max_y"].append(tr0 + r0 + fa // h)
                out["max_x"].append(tc0 + c0 + fa % h)
        return pa.table({
            "zone_id": pa.array(out["zone_id"], pa.string()),
            "n_px": pa.array(out["n_px"], pa.int64()),
            "v_min": pa.array(out["v_min"], pa.int64()),
            "min_y": pa.array(out["min_y"], pa.int64()),
            "min_x": pa.array(out["min_x"], pa.int64()),
            "v_max": pa.array(out["v_max"], pa.int64()),
            "max_y": pa.array(out["max_y"], pa.int64()),
            "max_x": pa.array(out["max_x"], pa.int64()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["min_x"].to_numpy(), g["min_y"].to_numpy(),
                        g["v_min"].to_numpy()))[0]
        a = np.lexsort((g["max_x"].to_numpy(), g["max_y"].to_numpy(),
                        -g["v_max"].to_numpy()))[0]
        return pd.DataFrame({
            "zone_id": [g["zone_id"].iloc[0]],
            "n_px": np.array([g["n_px"].sum()], np.int64),
            "v_min": np.array([g["v_min"].iloc[o]], np.int64),
            "min_y": np.array([g["min_y"].iloc[o]], np.int64),
            "min_x": np.array([g["min_x"].iloc[o]], np.int64),
            "v_max": np.array([g["v_max"].iloc[a]], np.int64),
            "max_y": np.array([g["max_y"].iloc[a]], np.int64),
            "max_x": np.array([g["max_x"].iloc[a]], np.int64),
        })

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=64)
    return partials.groupby("zone_id").map_groups(fold,
                                                  batch_format="pandas")
