"""Overview-pyramid generation: level-L tiles from 2x2 blocks of level-(L-1)
mosaic tiles.

The raster-engine "build overviews" step (GDAL/COG-style pyramids; the
reference's chunk-grid cubes would grow the same levels for zoomed-out
reads). Ray-Data-first plan, applied once per level:

    tiles -> map_batches(pool)        # per child tile: decompress, 2x2
                                      #   max-pool canvas+mask (vectorized
                                      #   block reshape), emit ONE quadrant
                                      #   row - pooled payload is 1/4 the
                                      #   child's bytes, so the shuffle
                                      #   carries a quarter of the mosaic
    -> groupby(parent).map_groups     # paste <=4 quadrants, emit parent
                                      #   tile row (stats + px_z/mask_z in
                                      #   the level-0 layout, so levels
                                      #   CHAIN: level L input = level L-1
                                      #   output)

Pooling semantics (shared with the fixtures golden as a per-pixel
definition only): pooled value = max over the 2x2 block's VALID pixels,
pooled validity = any valid. Invalid pixels are filled with the dtype's
minimum (-inf for floats) before the max so they can never beat a valid
value of any sign, and all-invalid blocks are normalized to zero after
pooling. The operator is associative, which is exactly why higher levels
are its self-composition.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..channels import RGB_CHANNELS, ChannelPack
from ..util import binary_views

OVERVIEW_SCHEMA = pa.schema(
    [
        ("parent_id", pa.string()),
        ("ptx", pa.int64()),
        ("pty", pa.int64()),
        ("q_row", pa.int64()),
        ("q_col", pa.int64()),
        ("pooled_z", pa.binary()),  # zlib pack-layout (half, half) canvas
        ("pmask_z", pa.binary()),  # zlib uint8 (half, half) validity
    ]
)

LEVEL_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("tx", pa.int64()),
        ("ty", pa.int64()),
        ("n_children", pa.int64()),
        ("n_valid_px", pa.int64()),
        ("pix_sum", pa.int64()),
        ("px_z", pa.binary()),
        ("mask_z", pa.binary()),
    ]
)


def _block_pool(a: np.ndarray, half: int) -> np.ndarray:
    """2x2 max-pool of (2*half, 2*half[, nc]) -> (half, half[, nc])."""
    if a.ndim == 3:
        return a.reshape(half, 2, half, 2, a.shape[2]).max(axis=(1, 3))
    return a.reshape(half, 2, half, 2).max(axis=(1, 3))


def _dtype_min(dt: np.dtype):
    if dt.kind == "f":
        return np.array(-np.inf, dtype=dt)
    if dt.kind == "b":
        return np.array(False)
    return np.array(np.iinfo(dt).min, dtype=dt)


def _masked_pool(a: np.ndarray, mask: np.ndarray, half: int) -> np.ndarray:
    """Valid-masked 2x2 max-pool: invalid filled with dtype-min so they
    never beat a valid value of any sign; all-invalid blocks -> 0."""
    m = mask[:, :, None] if a.ndim == 3 else mask
    pooled = _block_pool(np.where(m, a, _dtype_min(a.dtype)), half)
    pmask = mask.reshape(half, 2, half, 2).any(axis=(1, 3))
    pm = pmask[:, :, None] if pooled.ndim == 3 else pmask
    zero = np.zeros((), dtype=a.dtype)
    return np.where(pm, pooled, zero).astype(a.dtype, copy=False)


def _one_level(tiles_ds, chunk: int, pack: ChannelPack, level: int):
    half = chunk // 2

    def pool(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in OVERVIEW_SCHEMA.names}
        px_z = binary_views(t.column("px_z"))
        mask_z = binary_views(t.column("mask_z"))
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            pooled = [_masked_pool(a, mask, half) for a in canvas]
            pmask = mask.reshape(half, 2, half, 2).any(axis=(1, 3))
            tx, ty = int(txs[j]), int(tys[j])
            out["parent_id"].append(f"ov{level}-{tx // 2}-{ty // 2}")
            out["ptx"].append(tx // 2)
            out["pty"].append(ty // 2)
            out["q_row"].append(ty % 2)
            out["q_col"].append(tx % 2)
            out["pooled_z"].append(zlib.compress(pack.to_bytes(pooled), 1))
            out["pmask_z"].append(
                zlib.compress(pmask.astype(np.uint8).tobytes(), 1))
        return pa.table(out, schema=OVERVIEW_SCHEMA)

    def assemble(g: pa.Table) -> pa.Table:
        canvas = pack.alloc(chunk, chunk)
        mask = np.zeros((chunk, chunk), bool)
        for j in range(g.num_rows):
            quad = pack.from_bytes(
                zlib.decompress(g.column("pooled_z")[j].as_py()), half, half)
            qmask = np.frombuffer(
                zlib.decompress(g.column("pmask_z")[j].as_py()),
                np.uint8).reshape(half, half).astype(bool)
            r0 = int(g.column("q_row")[j].as_py()) * half
            c0 = int(g.column("q_col")[j].as_py()) * half
            for dst, src in zip(canvas, quad):
                dst[r0:r0 + half, c0:c0 + half] = src
            mask[r0:r0 + half, c0:c0 + half] = qmask
        return pa.table(
            {
                "tile_id": [g.column("parent_id")[0].as_py()],
                "tx": [g.column("ptx")[0].as_py()],
                "ty": [g.column("pty")[0].as_py()],
                "n_children": [g.num_rows],
                "n_valid_px": [int(mask.sum())],
                "pix_sum": [pack.pix_sum(canvas, mask)],
                "px_z": [zlib.compress(pack.to_bytes(canvas), 1)],
                "mask_z": [zlib.compress(mask.astype(np.uint8).tobytes(), 1)],
            },
            schema=LEVEL_SCHEMA,
        )

    quads = tiles_ds.map_batches(pool, batch_format="pyarrow", batch_size=64)
    return quads.groupby("parent_id").map_groups(assemble,
                                                 batch_format="pyarrow")


def overview_level(tiles_ds, chunk: int, pack: ChannelPack | None = None,
                   level: int = 1):
    """Level-``level`` overview tiles from level-0 mosaic tiles.

    Output rows carry the SAME physical layout as level-0 tiles
    (tx/ty/px_z/mask_z + stats), so the operator chains: level L is the
    L-fold self-composition of the one-level pool+assemble — each step
    quarters both the tile count and the shuffle payload, so the whole
    pyramid costs < 2x one level.
    """
    if level < 1:
        raise ValueError("level must be >= 1")
    pack = pack or ChannelPack(RGB_CHANNELS)
    out = tiles_ds
    for lv in range(1, level + 1):
        out = _one_level(out, chunk, pack, lv)
    return out


MEAN_LEVEL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("n_children", pa.int64()),
    ("n_valid_px", pa.int64()),
    ("mean_sum", pa.int64()),
])

_MEAN_QUAD_SCHEMA = pa.schema([
    ("parent_id", pa.string()),
    ("ptx", pa.int64()),
    ("pty", pa.int64()),
    ("q_row", pa.int64()),
    ("q_col", pa.int64()),
    ("sums_z", pa.binary()),   # zlib nc x (half, half) int64 valid sums
    ("cnt_z", pa.binary()),    # zlib (half, half) uint8 valid counts
])


def overview_level_mean(tiles_ds, chunk: int, pack: ChannelPack | None = None):
    """Average-resample overview (GDAL 'average'): one pyramid level where
    the parent pixel is floor(sum of VALID child pixels / count) per
    channel, validity = any-valid.

    Unlike max, mean does NOT self-compose (a mean of means is not the
    mean), so the mergeable carrier is the (sum, count) pair: each child
    tile ships int64 sum planes + a uint8 count plane per quadrant —
    still 1/4-canvas payload — and the floor division happens ONCE at
    assembly. Chaining further levels would keep carrying (sum, count);
    this operator implements the single level every COG 'average'
    overview needs and documents the composition rule. Float channels
    enter at the shared 1e-3 fixed point. Returns one stats row per
    parent: (tile_id, tx, ty, n_children, n_valid_px, mean_sum), where
    mean_sum totals the per-channel floored means over valid parent
    pixels.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    half = chunk // 2

    def q1000(a: np.ndarray) -> np.ndarray:
        if a.dtype.kind == "f":
            return np.floor(a.astype(np.float64) * 1000 + 0.5).astype(np.int64)
        return a.astype(np.int64)

    def comp_planes(canvas) -> list:
        planes = []
        for a in canvas:
            if a.ndim == 3:
                planes.extend(a[:, :, k] for k in range(a.shape[2]))
            else:
                planes.append(a)
        return planes

    def pool(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in _MEAN_QUAD_SCHEMA.names}
        px_z = binary_views(t.column("px_z"))
        mask_z = binary_views(t.column("mask_z"))
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            cnt = mask.reshape(half, 2, half, 2).sum(axis=(1, 3),
                                                     dtype=np.uint8)
            sums = np.stack([
                np.where(mask, q1000(a), 0)
                .reshape(half, 2, half, 2).sum(axis=(1, 3))
                for a in comp_planes(canvas)
            ])  # (n_components, half, half) int64
            tx, ty = int(txs[j]), int(tys[j])
            out["parent_id"].append(f"ovm-{tx // 2}-{ty // 2}")
            out["ptx"].append(tx // 2)
            out["pty"].append(ty // 2)
            out["q_row"].append(ty % 2)
            out["q_col"].append(tx % 2)
            out["sums_z"].append(zlib.compress(sums.tobytes(), 1))
            out["cnt_z"].append(zlib.compress(cnt.tobytes(), 1))
        return pa.table(out, schema=_MEAN_QUAD_SCHEMA)

    nc = int(sum(pack.ncomps))

    def assemble(g: pa.Table) -> pa.Table:
        sums = np.zeros((nc, chunk, chunk), np.int64)
        cnt = np.zeros((chunk, chunk), np.int64)
        for j in range(g.num_rows):
            qs = np.frombuffer(zlib.decompress(g.column("sums_z")[j].as_py()),
                               np.int64).reshape(nc, half, half)
            qc = np.frombuffer(zlib.decompress(g.column("cnt_z")[j].as_py()),
                               np.uint8).reshape(half, half)
            r0 = int(g.column("q_row")[j].as_py()) * half
            c0 = int(g.column("q_col")[j].as_py()) * half
            sums[:, r0:r0 + half, c0:c0 + half] = qs
            cnt[r0:r0 + half, c0:c0 + half] = qc
        valid = cnt > 0
        means = np.floor_divide(sums, np.where(valid, cnt, 1)[None, :, :])
        mean_sum = int(means[:, valid].sum())
        ptx = int(g.column("ptx")[0].as_py())
        pty = int(g.column("pty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"ovm-{ptx}-{pty}"], pa.string()),
            "tx": pa.array([ptx], pa.int64()),
            "ty": pa.array([pty], pa.int64()),
            "n_children": pa.array([g.num_rows], pa.int64()),
            "n_valid_px": pa.array([int(valid.sum())], pa.int64()),
            "mean_sum": pa.array([mean_sum], pa.int64()),
        }, schema=MEAN_LEVEL_SCHEMA)

    quads = tiles_ds.map_batches(pool, batch_format="pyarrow", batch_size=64)
    return quads.groupby("parent_id").map_groups(assemble,
                                                 batch_format="pyarrow")


def seasonal_composite(tiles_ds, grid, season_len: int = 2,
                       pack: ChannelPack | None = None):
    """Temporal GROUPED composite: collapse the temporal cube's time
    steps into seasons (``season = t // season_len``) and reduce each
    (season, spatial tile) group to the per-pixel MAX of the channel-sum
    value v across its valid time steps — the seasonal/quarterly
    best-pixel composite (cloud-free seasonal mosaics).

    One keyed exchange: each per-(t, tile) canvas row re-keys to
    ``(season, tx, ty)`` (the canvas bytes pass through compressed,
    never re-encoded) and the per-group merge is a valid-masked
    ``np.maximum`` fold over <= season_len planes. Output:
    (season, tile_id, tx, ty, n_valid_px, vmax_sum)."""
    from ..ops.stencil import _vsum

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def rekey(t: pa.Table) -> pa.Table:
        tids = t.column("tile_id").to_pylist()
        parts = [s.split("-") for s in tids]
        season = [int(p[0]) // season_len for p in parts]
        return pa.table({
            "skey": pa.array([f"{s}-{p[1]}-{p[2]}"
                              for s, p in zip(season, parts)],
                             pa.string()),
            "season": pa.array(season, pa.int64()),
            "tx": pa.array([int(p[1]) for p in parts], pa.int64()),
            "ty": pa.array([int(p[2]) for p in parts], pa.int64()),
            "px_z": t.column("px_z"),
            "mask_z": t.column("mask_z"),
        })

    OUT = pa.schema([
        ("season", pa.int64()), ("tile_id", pa.string()),
        ("tx", pa.int64()), ("ty", pa.int64()),
        ("n_valid_px", pa.int64()), ("vmax_sum", pa.int64()),
    ])

    def merge(g: pa.Table) -> pa.Table:
        vmax = np.full((chunk, chunk), -1, np.int64)
        anyv = np.zeros((chunk, chunk), bool)
        for j in range(len(g)):
            canvas = pack.from_bytes(
                zlib.decompress(g.column("px_z")[j].as_py()),
                chunk, chunk)
            mask = np.frombuffer(
                zlib.decompress(g.column("mask_z")[j].as_py()),
                np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            upd = mask & (v > vmax)
            vmax[upd] = v[upd]
            anyv |= mask
        if not anyv.any():
            return pa.table({f.name: pa.array([], f.type) for f in OUT})
        season = int(g.column("season")[0].as_py())
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "season": pa.array([season], pa.int64()),
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "n_valid_px": pa.array([int(anyv.sum())], pa.int64()),
            "vmax_sum": pa.array([int(vmax[anyv].sum())], pa.int64()),
        }, schema=OUT)

    return (tiles_ds.select_columns(["tile_id", "px_z", "mask_z"])
            .map_batches(rekey, batch_format="pyarrow", batch_size=64)
            .groupby("skey").map_groups(merge, batch_format="pyarrow")
            .select_columns(["season", "tile_id", "tx", "ty",
                             "n_valid_px", "vmax_sum"]))


def timefill_stats(tiles_ds, grid, pack: ChannelPack | None = None):
    """Per-pixel temporal gap interpolation over the temporal cube — the
    time-series cloud-gap filler: a pixel invalid at step t but valid at
    some earlier step t0 and later step t1 (its nearest valid neighbors in
    time) fills with the exact linear interpolation
    ``floor((v0·(t1−t) + v1·(t−t0)) / (t1−t0))`` of the channel-sum v.
    Leading/trailing gaps never extrapolate. Output: one row per
    (t, spatial tile) with ``n_filled`` and ``fill_sum`` (only steps that
    filled ≥1 pixel), checked against an independent serial full-stack
    golden.

    ONE keyed exchange (the ``seasonal_composite`` discipline): per-(t,
    tile) canvas rows re-key to their SPATIAL tile — compressed bytes
    pass through untouched — and the per-group merge assembles the ≤T
    step stack and interpolates fully vectorized (prefix/suffix
    valid-index scans via ``np.maximum/minimum.accumulate``, one
    take_along_axis gather per side). Per-group memory is T·chunk²·8 B
    (the multichannel envelope's T-fold — 3600²·8 steps ≈ 830 MB int64,
    inside the per-task cap with 64-px or 1800-px chunks at scale; the
    fill range needs no global T, a group's own max step bounds it)."""
    from ..ops.stencil import _vsum

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def rekey(t: pa.Table) -> pa.Table:
        tids = t.column("tile_id").to_pylist()
        parts = [s.split("-") for s in tids]
        return pa.table({
            "skey": pa.array([f"{p[1]}-{p[2]}" for p in parts],
                             pa.string()),
            "t_idx": pa.array([int(p[0]) for p in parts], pa.int64()),
            "tx": pa.array([int(p[1]) for p in parts], pa.int64()),
            "ty": pa.array([int(p[2]) for p in parts], pa.int64()),
            "px_z": t.column("px_z"),
            "mask_z": t.column("mask_z"),
        })

    OUT = pa.schema([
        ("t_idx", pa.int64()), ("tile_id", pa.string()),
        ("n_filled", pa.int64()), ("fill_sum", pa.int64()),
    ])

    def merge(g: pa.Table) -> pa.Table:
        steps = g.column("t_idx").to_numpy().astype(np.int64)
        T = int(steps.max()) + 1
        c = chunk
        V = np.zeros((T, c, c), np.int64)
        M = np.zeros((T, c, c), bool)
        for j in range(len(g)):
            ti = int(steps[j])
            canvas = pack.from_bytes(
                zlib.decompress(g.column("px_z")[j].as_py()), c, c)
            mask = np.frombuffer(
                zlib.decompress(g.column("mask_z")[j].as_py()),
                np.uint8).reshape(c, c).astype(bool)
            V[ti] = np.where(mask, _vsum(canvas, pack), V[ti])
            M[ti] |= mask
        tt = np.arange(T, dtype=np.int64)[:, None, None]
        fwd = np.maximum.accumulate(np.where(M, tt, -1), axis=0)
        bwd = np.minimum.accumulate(np.where(M, tt, T)[::-1], axis=0)[::-1]
        fill = (~M) & (fwd >= 0) & (bwd <= T - 1)
        if not fill.any():
            return pa.table({f.name: pa.array([], f.type) for f in OUT})
        v0 = np.take_along_axis(V, np.clip(fwd, 0, None), axis=0)
        v1 = np.take_along_axis(V, np.clip(bwd, None, T - 1), axis=0)
        num = v0 * (bwd - tt) + v1 * (tt - fwd)
        den = np.where(fill, bwd - fwd, 1)
        vals = num // den
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        ts, ns, ss = [], [], []
        for ti in range(T):
            n = int(fill[ti].sum())
            if n == 0:
                continue
            ts.append(ti)
            ns.append(n)
            ss.append(int(vals[ti][fill[ti]].sum()))
        return pa.table({
            "t_idx": pa.array(ts, pa.int64()),
            "tile_id": pa.array([f"{tx}-{ty}"] * len(ts), pa.string()),
            "n_filled": pa.array(ns, pa.int64()),
            "fill_sum": pa.array(ss, pa.int64()),
        }, schema=OUT)

    return (tiles_ds.select_columns(["tile_id", "px_z", "mask_z"])
            .map_batches(rekey, batch_format="pyarrow", batch_size=64)
            .groupby("skey").map_groups(merge, batch_format="pyarrow")
            .select_columns(["t_idx", "tile_id", "n_filled", "fill_sum"]))
