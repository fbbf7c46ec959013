"""Neighborhood raster ops over mosaic tiles: the halo-exchange stencil
(gradient statistics) and the nearest-neighbor grid warp (resample onto a
different GridSpec).

Both consume the ingest pipeline's tile rows (tile_id/tx/ty + compressed
px_z/mask_z canvases — ``ops/ingest.py`` layout) and are checked against
generation-time goldens painted by an independent serial full-plane pass
(``fixtures._golden_gradient`` / ``_golden_resample``).

Gradient (the stencil/halo pattern every focal raster op needs — hillshade,
slope, convolution all share it; reference analog: any `rio`-style focal
statistic over the cube window):

- the kernel is the 4-neighbor first difference of v = sum of channel
  values per pixel; a PAIR (p, right/down neighbor) is counted when BOTH
  pixels are valid, and belongs to p's tile;
- per-tile interior pairs are computed MAP-SIDE (no data movement at all);
  only the O(perimeter) halo strips cross tiles: each tile sends its FIRST
  column/row west/north and keys its own LAST column/row to itself, so the
  one keyed shuffle carries 2 strips in + 2 strips kept per tile — never a
  canvas;
- a tile absent from the mosaic contributes nothing (its mask is empty),
  matching the golden's treatment of unpainted pixels as invalid.

Resample / warp (gather form): each SOURCE tile computes — analytically,
from the two GridSpecs — exactly which target pixels nearest-neighbor
sample from it (the center-mapping ``floor((x'-x0)/res)`` is monotonic, so
the inverse image is a contiguous pixel range), crops that fragment, and
keys it to the covering TARGET tiles; a keyed ``map_groups`` assembles each
target tile. The shuffle carries each mosaic byte at most once (tiles
shrink when downsampling), and no global plane is ever materialized.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..channels import RGB_CHANNELS, ChannelPack
from ..grid import GridSpec

GRAD_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'self' | 'edge_e' | 'edge_s' | 'halo_w' | 'halo_n'
    ("n_pairs", pa.int64()),
    ("abs_grad_sum", pa.int64()),
    ("v", pa.binary()),      # int64 strip values (edges/halos only)
    ("m", pa.binary()),      # uint8 strip validity
])


def _vsum(canvas: list[np.ndarray], pack: ChannelPack) -> np.ndarray:
    """Per-pixel scalar value v: channel sum as exact int64 (RGB -> R+G+B).

    Float channels enter at 1e-3 fixed point (``round(x * 1000)`` — the
    same quantization ``ChannelPack.pix_sum`` uses), so gradients stay
    integer-exact for every pack, not just uint8 RGB."""
    v = np.zeros(canvas[0].shape[:2], np.int64)
    for a in canvas:
        q = (np.round(a.astype(np.float64) * 1000).astype(np.int64)
             if a.dtype.kind == "f" else a.astype(np.int64))
        v += q.sum(axis=2) if a.ndim == 3 else q
    return v


def _exchange_emit(grid: GridSpec, pack: ChannelPack, self_stat):
    """Shared strip-exchange emitter for focal ops (gradient, hillshade —
    any op whose border pixels need neighbor strips): computes the
    map-side per-tile statistic ``(n, s) = self_stat(v, mask)`` and emits
    the exchange protocol — own last column/row strips stay keyed to the
    tile ('edge_e'/'edge_s'), first column/row travel to the west/north
    neighbor ('halo_w'/'halo_n'). ONE copy of the protocol: a strip-schema
    change cannot silently diverge between ops."""
    chunk = grid.chunk

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in GRAD_PARTIAL_SCHEMA.names}

        def row(tile, kind, n=0, stat=0, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["n_pairs"].append(n)
            out["abs_grad_sum"].append(stat)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            n, stat = self_stat(v, mask)
            row((tx, ty), "self", n, stat)
            row((tx, ty), "edge_e", v=v[:, -1].tobytes(),
                m=mask[:, -1].astype(np.uint8).tobytes())
            row((tx, ty), "edge_s", v=v[-1, :].tobytes(),
                m=mask[-1, :].astype(np.uint8).tobytes())
            if tx > 0:
                row((tx - 1, ty), "halo_w", v=v[:, 0].tobytes(),
                    m=mask[:, 0].astype(np.uint8).tobytes())
            if ty > 0:
                row((tx, ty - 1), "halo_n", v=v[0, :].tobytes(),
                    m=mask[0, :].astype(np.uint8).tobytes())
        return pa.table(out, schema=GRAD_PARTIAL_SCHEMA)

    return emit


def gradient_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile 4-neighbor absolute-gradient statistics with halo exchange.

    Output: (tile_id, tx, ty, n_pairs, abs_grad_sum) — pairs whose LEFT/TOP
    pixel lies in the tile, including the pairs that straddle the tile's
    east/south border (via the exchanged strips).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)

    def self_stat(v: np.ndarray, mask: np.ndarray):
        # interior pairs, entirely map-side
        bh = mask[:, :-1] & mask[:, 1:]
        bv = mask[:-1, :] & mask[1:, :]
        stat = int(np.abs(np.diff(v, axis=1))[bh].sum()
                   + np.abs(np.diff(v, axis=0))[bv].sum())
        return int(bh.sum()) + int(bv.sum()), stat

    emit = _exchange_emit(grid, pack, self_stat)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        if "self" not in kinds:
            return pa.table({"tile_id": pa.array([], pa.string()),
                             "tx": pa.array([], pa.int64()),
                             "ty": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64()),
                             "abs_grad_sum": pa.array([], pa.int64())})
        strips: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        n_pairs = 0
        s = 0
        for j, kind in enumerate(kinds):
            if kind == "self":
                n_pairs += int(g.column("n_pairs")[j].as_py())
                s += int(g.column("abs_grad_sum")[j].as_py())
            else:
                strips[kind] = (
                    np.frombuffer(g.column("v")[j].as_py(), np.int64),
                    np.frombuffer(g.column("m")[j].as_py(),
                                  np.uint8).astype(bool))
        for edge, halo in (("edge_e", "halo_w"), ("edge_s", "halo_n")):
            if edge in strips and halo in strips:
                ev, em = strips[edge]
                hv, hm = strips[halo]
                both = em & hm
                n_pairs += int(both.sum())
                s += int(np.abs(ev - hv)[both].sum())
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({"tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
                         "tx": pa.array([tx], pa.int64()),
                         "ty": pa.array([ty], pa.int64()),
                         "n_pairs": pa.array([n_pairs], pa.int64()),
                         "abs_grad_sum": pa.array([s], pa.int64())})

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


# ---- nearest-neighbor grid warp --------------------------------------------

RESAMPLE_FRAG_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("r0", pa.int64()),  # fragment origin within the target tile
    ("c0", pa.int64()),
    ("h", pa.int64()),
    ("w", pa.int64()),
    ("px_z", pa.binary()),
    ("mask_z", pa.binary()),
])


def _center_sources(dst: GridSpec, src: GridSpec):
    """Source pixel index sampled by each target pixel center (sc, sr)."""
    cprime = np.arange(dst.width, dtype=np.float64)
    rprime = np.arange(dst.height, dtype=np.float64)
    x = dst.x0 + (cprime + 0.5) * dst.res
    y = dst.y1 - (rprime + 0.5) * dst.res
    sc = np.floor((x - src.x0) / src.res).astype(np.int64)
    sr = np.floor((src.y1 - y) / src.res).astype(np.int64)
    return sc, sr


def resample_nn(tiles_ds, src_grid: GridSpec, dst_grid: GridSpec,
                pack: ChannelPack | None = None):
    """Warp mosaic tiles from ``src_grid`` onto ``dst_grid`` by
    nearest-neighbor center sampling; per-target-tile stats.

    Target pixels whose source sample is outside the source grid (or in a
    tile absent from the mosaic) stay invalid. Output: (tile_id, tx, ty,
    n_valid_px, pix_sum) per target tile with >= 1 valid pixel.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    s_chunk, d_chunk = src_grid.chunk, dst_grid.chunk
    sc, sr = _center_sources(dst_grid, src_grid)

    def fragments(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in RESAMPLE_FRAG_SCHEMA.names}
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            stx, sty = int(txs[j]), int(tys[j])
            tc0, tc1 = stx * s_chunk, min((stx + 1) * s_chunk, src_grid.width)
            tr0, tr1 = sty * s_chunk, min((sty + 1) * s_chunk, src_grid.height)
            # target pixels sampling inside this source tile (sc/sr monotonic)
            c_lo = int(np.searchsorted(sc, tc0, side="left"))
            c_hi = int(np.searchsorted(sc, tc1 - 1, side="right"))
            r_lo = int(np.searchsorted(sr, tr0, side="left"))
            r_hi = int(np.searchsorted(sr, tr1 - 1, side="right"))
            if c_hi <= c_lo or r_hi <= r_lo:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]),
                                     s_chunk, s_chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(s_chunk, s_chunk
                                                   ).astype(bool)
            rows = sr[r_lo:r_hi] - tr0
            cols = sc[c_lo:c_hi] - tc0
            samp = [a[np.ix_(rows, cols)] for a in canvas]
            smask = mask[np.ix_(rows, cols)]
            # split the target-pixel block by target tile boundaries
            for dty in range(r_lo // d_chunk, (r_hi - 1) // d_chunk + 1):
                fr0 = max(r_lo, dty * d_chunk)
                fr1 = min(r_hi, (dty + 1) * d_chunk)
                for dtx in range(c_lo // d_chunk, (c_hi - 1) // d_chunk + 1):
                    fc0 = max(c_lo, dtx * d_chunk)
                    fc1 = min(c_hi, (dtx + 1) * d_chunk)
                    sl = np.s_[fr0 - r_lo:fr1 - r_lo, fc0 - c_lo:fc1 - c_lo]
                    sub = [a[sl] for a in samp]
                    subm = smask[sl]
                    if not subm.any():
                        continue
                    out["tile_id"].append(f"{dtx}-{dty}")
                    out["tx"].append(dtx)
                    out["ty"].append(dty)
                    out["r0"].append(fr0 - dty * d_chunk)
                    out["c0"].append(fc0 - dtx * d_chunk)
                    out["h"].append(fr1 - fr0)
                    out["w"].append(fc1 - fc0)
                    out["px_z"].append(
                        zlib.compress(pack.to_bytes(sub), 1))
                    out["mask_z"].append(zlib.compress(
                        subm.astype(np.uint8).tobytes(), 1))
        return pa.table(out, schema=RESAMPLE_FRAG_SCHEMA)

    frags = tiles_ds.map_batches(fragments, batch_format="pyarrow",
                                 batch_size=64)

    def assemble(g: pa.Table) -> pa.Table:
        dtx = int(g.column("tx")[0].as_py())
        dty = int(g.column("ty")[0].as_py())
        th = min(d_chunk, dst_grid.height - dty * d_chunk)
        tw = min(d_chunk, dst_grid.width - dtx * d_chunk)
        canvas = pack.alloc(th, tw)
        mask = np.zeros((th, tw), bool)
        for j in range(g.num_rows):
            h = int(g.column("h")[j].as_py())
            w = int(g.column("w")[j].as_py())
            r0 = int(g.column("r0")[j].as_py())
            c0 = int(g.column("c0")[j].as_py())
            sub = pack.from_bytes(
                zlib.decompress(g.column("px_z")[j].as_py()), h, w)
            subm = np.frombuffer(
                zlib.decompress(g.column("mask_z")[j].as_py()),
                np.uint8).reshape(h, w).astype(bool)
            for dst_a, src_a in zip(canvas, sub):
                dst_a[r0:r0 + h, c0:c0 + w] = src_a
            mask[r0:r0 + h, c0:c0 + w] = subm
        return pa.table({
            "tile_id": pa.array([f"{dtx}-{dty}"], pa.string()),
            "tx": pa.array([dtx], pa.int64()),
            "ty": pa.array([dty], pa.int64()),
            "n_valid_px": pa.array([int(mask.sum())], pa.int64()),
            "pix_sum": pa.array([pack.pix_sum(canvas, mask)], pa.int64()),
        })

    return frags.groupby("tile_id").map_groups(assemble,
                                               batch_format="pyarrow")


def shade_q(dx: np.ndarray, dy: np.ndarray,
            azimuth_deg: float = 315.0, altitude_deg: float = 45.0,
            z_factor: float = 0.01) -> np.ndarray:
    """Quantized hillshade of forward differences (PURE per-pixel formula —
    shared with the lazy golden painter, which is allowed to reuse exactly
    these per-pixel derivations and nothing of the distributed plan).

    Standard illumination model: shade = sin(alt)·cos(slope) +
    cos(alt)·sin(slope)·cos(az − aspect), negatives clipped to 0, then
    floor(shade · 1e6) as int64 so per-tile sums are order-independent."""
    slope = np.arctan(z_factor * np.hypot(dx, dy))
    aspect = np.arctan2(dy.astype(np.float64), dx.astype(np.float64))
    az = np.deg2rad(azimuth_deg)
    alt = np.deg2rad(altitude_deg)
    shade = (np.sin(alt) * np.cos(slope)
             + np.cos(alt) * np.sin(slope) * np.cos(az - aspect))
    return np.floor(np.maximum(shade, 0.0) * 1e6).astype(np.int64)


def hillshade_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile hillshade statistics with halo exchange — the second focal
    op on the gradient's exchange pattern, needing BOTH forward
    differences per pixel: shade(p) = f(v[r,c+1]−v[r,c], v[r+1,c]−v[r,c]),
    defined where p, its east and its south neighbor are all valid.

    Interior pixels (r<last, c<last) compute entirely MAP-SIDE. A tile's
    own last column/row strips stay keyed to itself; its FIRST column/row
    travel west/north (identical strip shapes to ``gradient_stats``), and
    the merge reconstructs the three border cases (last column, last row,
    corner) from (edge, halo) strip pairs. Absent neighbors contribute no
    halo, matching the golden's invalid-pixel treatment.

    Output: (tile_id, tx, ty, n_px, shade_sum).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)

    def self_stat(v: np.ndarray, mask: np.ndarray):
        # interior pixels (r<last, c<last) with east+south neighbors valid
        ok = mask[:-1, :-1] & mask[:-1, 1:] & mask[1:, :-1]
        dx = (v[:-1, 1:] - v[:-1, :-1])[ok]
        dy = (v[1:, :-1] - v[:-1, :-1])[ok]
        return int(ok.sum()), int(shade_q(dx, dy).sum())

    emit = _exchange_emit(grid, pack, self_stat)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        if "self" not in kinds:
            return pa.table({"tile_id": pa.array([], pa.string()),
                             "tx": pa.array([], pa.int64()),
                             "ty": pa.array([], pa.int64()),
                             "n_px": pa.array([], pa.int64()),
                             "shade_sum": pa.array([], pa.int64())})
        strips: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        n = 0
        s = 0
        for j, kind in enumerate(kinds):
            if kind == "self":
                n += int(g.column("n_pairs")[j].as_py())
                s += int(g.column("abs_grad_sum")[j].as_py())
            else:
                strips[kind] = (
                    np.frombuffer(g.column("v")[j].as_py(), np.int64),
                    np.frombuffer(g.column("m")[j].as_py(),
                                  np.uint8).astype(bool))
        ee = strips.get("edge_e")
        es = strips.get("edge_s")
        hw = strips.get("halo_w")
        hn = strips.get("halo_n")
        if ee is not None and hw is not None:
            # last column, rows 0..last-1: east diff from the halo, south
            # diff within the own edge strip
            ev, em = ee
            hv, hm = hw
            ok = em[:-1] & em[1:] & hm[:-1]
            dx = (hv[:-1] - ev[:-1])[ok]
            dy = (ev[1:] - ev[:-1])[ok]
            n += int(ok.sum())
            s += int(shade_q(dx, dy).sum())
        if es is not None and hn is not None:
            # last row, cols 0..last-1
            ev, em = es
            hv, hm = hn
            ok = em[:-1] & em[1:] & hm[:-1]
            dx = (ev[1:] - ev[:-1])[ok]
            dy = (hv[:-1] - ev[:-1])[ok]
            n += int(ok.sum())
            s += int(shade_q(dx, dy).sum())
        if ee is not None and hw is not None and hn is not None:
            # corner (last, last): needs both halos' last elements
            ev, em = ee
            hwv, hwm = hw
            hnv, hnm = hn
            if em[-1] and hwm[-1] and hnm[-1]:
                dx = np.array([hwv[-1] - ev[-1]], np.int64)
                dy = np.array([hnv[-1] - ev[-1]], np.int64)
                n += 1
                s += int(shade_q(dx, dy).sum())
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({"tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
                         "tx": pa.array([tx], pa.int64()),
                         "ty": pa.array([ty], pa.int64()),
                         "n_px": pa.array([n], pa.int64()),
                         "shade_sum": pa.array([s], pa.int64())})

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


# ---- 3x3 focal max (morphological dilate) ----------------------------------

DILATE_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    # 'self' | own ring strips 'ring_{n,s,w,e}' | neighbor strips
    # 'nbr_{n,s,w,e}' | corner pixels 'nbr_{nw,ne,sw,se}_c'
    ("kind", pa.string()),
    ("n_px", pa.int64()),
    ("dilate_sum", pa.int64()),
    ("v", pa.binary()),   # int64 strip values
    ("m", pa.binary()),   # uint8 strip validity
])

_NEG = -(1 << 62)  # invalid-pixel sentinel for the max fold
_POS = 1 << 62   # invalid-pixel sentinel for the min (erode) fold


def _focal_reduce(V: np.ndarray, M: np.ndarray, minimize: bool = False):
    """(3x3 valid-extremum, any-valid flag) per interior position of a
    padded (h+2, w+2) frame; returns the (h, w) planes. ``minimize``
    selects the erosion (focal min) fold, else dilation (focal max)."""
    sent = _POS if minimize else _NEG
    op = np.minimum if minimize else np.maximum
    Vs = np.where(M, V, sent)
    h, w = V.shape[0] - 2, V.shape[1] - 2
    mx = np.full((h, w), sent, np.int64)
    any_v = np.zeros((h, w), bool)
    for dr in range(3):
        for dc in range(3):
            mx = op(mx, Vs[dr:dr + h, dc:dc + w])
            any_v |= M[dr:dr + h, dc:dc + w]
    return mx, any_v




def dilate_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                 minimize: bool = False):
    """Per-tile 3x3 focal-max (morphological dilate) statistics with a FULL
    8-neighborhood halo exchange — the focal op whose corner pixels need
    diagonal neighbors, unlike the 4-neighbor gradient/hillshade exchange.

    Semantics: for every pixel whose 3x3 window contains >=1 valid mosaic
    pixel, the dilated value is the max channel-sum v over the window's
    valid pixels; output (tile_id, tx, ty, n_px, dilate_sum) where n_px
    counts such pixels and dilate_sum their dilated values.

    Plan: interior pixels (windows fully inside the tile) fold MAP-SIDE;
    each tile keeps its outer-2 ring strips keyed to itself and sends one
    1-px-wide strip to each of its 4 edge neighbors plus one corner pixel
    to each of its 4 diagonal neighbors — the keyed shuffle carries
    O(perimeter) per tile, never a canvas. The merge rebuilds only the
    (chunk+2)-padded ring frame and computes the border pixels.
    Value-checked against a golden painted from the GLOBAL plane
    (fixtures._golden_dilate) and a serial oracle in tests.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in DILATE_PARTIAL_SCHEMA.names}

        def row(tile, kind, n=0, stat=0, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["n_px"].append(n)
            out["dilate_sum"].append(stat)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            # interior: windows fully inside the tile -> no padding needed
            # (_focal_reduce on the unpadded (chunk, chunk) tile yields
            # the (chunk-2, chunk-2) interior positions exactly)
            imx, iany = _focal_reduce(v, mask, minimize)
            row((tx, ty), "self", int(iany.sum()), int(imx[iany].sum()))

            def strip(vs, ms):
                return vs.astype(np.int64).tobytes(), \
                    ms.astype(np.uint8).tobytes()

            for kind, vs, ms in (
                ("ring_n", v[0:2, :], mask[0:2, :]),
                ("ring_s", v[-2:, :], mask[-2:, :]),
                ("ring_w", v[:, 0:2], mask[:, 0:2]),
                ("ring_e", v[:, -2:], mask[:, -2:]),
            ):
                b, m = strip(vs, ms)
                row((tx, ty), kind, v=b, m=m)
            sends = [((tx - 1, ty), "nbr_e", v[:, 0], mask[:, 0]),
                     ((tx + 1, ty), "nbr_w", v[:, -1], mask[:, -1]),
                     ((tx, ty - 1), "nbr_s", v[0, :], mask[0, :]),
                     ((tx, ty + 1), "nbr_n", v[-1, :], mask[-1, :]),
                     ((tx - 1, ty - 1), "nbr_se_c", v[0:1, 0], mask[0:1, 0]),
                     ((tx + 1, ty - 1), "nbr_sw_c", v[0:1, -1],
                      mask[0:1, -1]),
                     ((tx - 1, ty + 1), "nbr_ne_c", v[-1:, 0], mask[-1:, 0]),
                     ((tx + 1, ty + 1), "nbr_nw_c", v[-1:, -1],
                      mask[-1:, -1])]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b, m = strip(np.ascontiguousarray(vs),
                                 np.ascontiguousarray(ms))
                    row((ntx, nty), kind, v=b, m=m)
        return pa.table(out, schema=DILATE_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    # receiver-side placement of each strip kind into the padded ring frame
    # (padded coords: tile pixel (r, c) -> (r + 1, c + 1))
    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "ring_n":
            P[1:3, 1:c + 1] = vs.reshape(2, c)
            M[1:3, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_s":
            P[c - 1:c + 1, 1:c + 1] = vs.reshape(2, c)
            M[c - 1:c + 1, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_w":
            P[1:c + 1, 1:3] = vs.reshape(c, 2)
            M[1:c + 1, 1:3] = ms.reshape(c, 2)
        elif kind == "ring_e":
            P[1:c + 1, c - 1:c + 1] = vs.reshape(c, 2)
            M[1:c + 1, c - 1:c + 1] = ms.reshape(c, 2)
        elif kind == "nbr_n":
            P[0, 1:c + 1] = vs
            M[0, 1:c + 1] = ms
        elif kind == "nbr_s":
            P[c + 1, 1:c + 1] = vs
            M[c + 1, 1:c + 1] = ms
        elif kind == "nbr_w":
            P[1:c + 1, 0] = vs
            M[1:c + 1, 0] = ms
        elif kind == "nbr_e":
            P[1:c + 1, c + 1] = vs
            M[1:c + 1, c + 1] = ms
        elif kind == "nbr_nw_c":
            P[0, 0], M[0, 0] = vs[0], ms[0]
        elif kind == "nbr_ne_c":
            P[0, c + 1], M[0, c + 1] = vs[0], ms[0]
        elif kind == "nbr_sw_c":
            P[c + 1, 0], M[c + 1, 0] = vs[0], ms[0]
        elif kind == "nbr_se_c":
            P[c + 1, c + 1], M[c + 1, c + 1] = vs[0], ms[0]

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        if "self" not in kinds:
            # halo strips sent to an absent tile: nothing to dilate
            return pa.table({"tile_id": pa.array([], pa.string()),
                             "tx": pa.array([], pa.int64()),
                             "ty": pa.array([], pa.int64()),
                             "n_px": pa.array([], pa.int64()),
                             "dilate_sum": pa.array([], pa.int64())})
        c = chunk
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        n_px = 0
        s = 0
        for j, kind in enumerate(kinds):
            if kind == "self":
                n_px += int(g.column("n_px")[j].as_py())
                s += int(g.column("dilate_sum")[j].as_py())
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        mx, any_v = _focal_reduce(P, M, minimize)
        border = np.zeros((c, c), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        sel = border & any_v
        n_px += int(sel.sum())
        s += int(mx[sel].sum())
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({"tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
                         "tx": pa.array([tx], pa.int64()),
                         "ty": pa.array([ty], pa.int64()),
                         "n_px": pa.array([n_px], pa.int64()),
                         "dilate_sum": pa.array([s], pa.int64())})

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


def erode_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """3x3 focal-min (morphological erode): the min-fold sibling of
    :func:`dilate_stats` on the identical 8-neighbor ring/halo exchange —
    output columns (tile_id, tx, ty, n_px, dilate_sum) where the stat is
    the window's valid MIN. One exchange implementation serves both
    morphology ops; only the reduction differs."""
    return dilate_stats(tiles_ds, grid, pack, minimize=True)


def gradient_stats_incremental(cube_path: str, grid: GridSpec, touched: set,
                               prior, pack: ChannelPack | None = None):
    """Incremental view maintenance for the gradient stencil: after an
    incremental cube update (``ops.ingest.ingest_update``) recompute the
    per-tile gradient statistics ONLY where they could have changed, and
    splice them into the prior result.

    Dependency analysis (from the exchange protocol): gradient(T) reads
    T plus T's east and south neighbors. So a changed-tile set U affects
    outputs A = U ∪ west(U) ∪ north(U), and recomputing A needs inputs
    I = A ∪ east(A) ∪ south(A). The refresh reads ONLY the |I| named
    per-tile parquet files (the cube layout is one file per tile — true
    point reads, refresh I/O is O(update), never O(cube)), recomputes A,
    and keeps every other prior row untouched. Result == full recompute,
    bit for bit (pinned by test).

    ``prior`` is the previous full stats table and MUST be materialized
    (pa.Table, or a Dataset the caller already executed) BEFORE the cube
    update is applied — a lazy Dataset passed here would re-read the
    post-update tile bytes and make the splice vacuous. Returns a
    pa.Table (row-bounded by the tile count — never pixel data).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)

    n_tx, n_ty = grid.n_tx, grid.n_ty

    def _parse(tid: str) -> tuple:
        tx, ty = tid.split("-", 1)
        return int(tx), int(ty)

    def _grow(base: set, deltas) -> set:
        out = set(base)
        for tx, ty in base:
            for dx, dy in deltas:
                nx, ny = tx + dx, ty + dy
                if 0 <= nx < n_tx and 0 <= ny < n_ty:
                    out.add((nx, ny))
        return out

    touched_t = {_parse(t) for t in touched}
    affected_t = _grow(touched_t, [(-1, 0), (0, -1)])  # west, north
    inputs_t = _grow(affected_t, [(1, 0), (0, 1)])     # east, south
    affected = {f"{tx}-{ty}" for tx, ty in affected_t}
    inputs = {f"{tx}-{ty}" for tx, ty in inputs_t}

    import os

    import ray

    prior_t = prior if isinstance(prior, pa.Table) else pa.concat_tables(
        [ray.get(r) for r in prior.to_arrow_refs()])
    if not touched:  # no-op update -> no-op refresh
        return prior_t

    from ..cube import TILES_DIR
    from ..util import read_parquet_clean

    paths = [p for p in
             (os.path.join(cube_path, TILES_DIR, f"part-{tid}.parquet")
              for tid in sorted(inputs))
             if os.path.exists(p)]
    if not paths:
        return prior_t
    sub = read_parquet_clean(paths)
    fresh = gradient_stats(sub, grid, pack).to_arrow_refs()
    fresh_t = pa.concat_tables([ray.get(r) for r in fresh])
    # tiles in I \ A were scanned only as neighbor inputs; their own rows
    # are incomplete (their east/south inputs were not loaded) — drop them
    keep_a = pa.array([i in affected
                       for i in fresh_t.column("tile_id").to_pylist()])
    fresh_t = fresh_t.filter(keep_a)

    drop = pa.array([i not in affected
                     for i in prior_t.column("tile_id").to_pylist()])
    kept = prior_t.filter(drop).select(fresh_t.column_names)
    return pa.concat_tables([kept.cast(fresh_t.schema), fresh_t])


# ------------------------------------------------------------- D8 flow dir
# direction codes 0..7 (E, SE, S, SW, W, NW, N, NE) + 8 = pit (no valid
# strictly-lower neighbor); weighted drop = (v_center - v_nbr) * weight,
# weight 100000 for cardinal and 70711 (~1e5/sqrt(2)) for diagonal steps —
# exact integer arithmetic, ties break toward the smaller code.
_D8 = (
    (0, 0, 1, 100000), (1, 1, 1, 70711), (2, 1, 0, 100000),
    (3, 1, -1, 70711), (4, 0, -1, 100000), (5, -1, -1, 70711),
    (6, -1, 0, 100000), (7, -1, 1, 70711),
)

FLOW_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),
    ("hist", pa.binary()),   # 9 x int64 direction histogram (self rows)
    ("v", pa.binary()),      # int64 strip values (edges/halos)
    ("m", pa.binary()),      # uint8 strip validity
])


def _flowdir_codes(V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Per interior position of a padded (h+2, w+2) frame: D8 direction
    code 0..7 (max weighted drop to a valid strictly-lower neighbor,
    smallest code on ties), 8 for valid pits, -1 where the center is
    invalid. Pure vectorized comparisons over the 8 shifted planes."""
    h, w = V.shape[0] - 2, V.shape[1] - 2
    vc = V[1:1 + h, 1:1 + w]
    mc = M[1:1 + h, 1:1 + w]
    best = np.full((h, w), 0, np.int64)
    code = np.full((h, w), 8, np.int64)
    for k, dr, dc, wt in _D8:
        vn = V[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
        mn = M[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
        drop = (vc - vn) * np.int64(wt)
        ok = mn & (vc > vn) & (drop > best)
        best = np.where(ok, drop, best)
        code = np.where(ok, np.int64(k), code)
    return np.where(mc, code, np.int64(-1))


def _hist9(codes: np.ndarray) -> np.ndarray:
    sel = codes[codes >= 0]
    return np.bincount(sel, minlength=9).astype(np.int64)


def flowdir_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile D8 flow-direction histogram over the mosaic — the
    hydrology/terrain-routing focal op (every pixel drains to its
    steepest-descent neighbor; reference analog: any DEM derivative over
    the cube window, like the hillshade at `accessors`-level).

    Same single 8-neighbor halo exchange as dilate/erode: interior pixels
    (3x3 window fully in-tile) fold MAP-SIDE into a 9-bin histogram; each
    tile keeps its outer-2 ring keyed to itself and ships 1-px edge strips
    + corner pixels to the 8 neighbors — the keyed shuffle carries
    O(perimeter) per tile, never a canvas. Output: one row per (tile,
    dir_code 0..8), n_px = valid pixels draining that way (8 = pit).
    Value-checked against a golden painted from the GLOBAL plane
    (fixtures._golden_flowdir).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in FLOW_PARTIAL_SCHEMA.names}

        def row(tile, kind, hist=b"", v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["hist"].append(hist)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            interior = _flowdir_codes(v, mask)
            row((tx, ty), "self", hist=_hist9(interior).tobytes())

            def strip(vs, ms):
                return vs.astype(np.int64).tobytes(), \
                    ms.astype(np.uint8).tobytes()

            for kind, vs, ms in (
                ("ring_n", v[0:2, :], mask[0:2, :]),
                ("ring_s", v[-2:, :], mask[-2:, :]),
                ("ring_w", v[:, 0:2], mask[:, 0:2]),
                ("ring_e", v[:, -2:], mask[:, -2:]),
            ):
                b, m = strip(vs, ms)
                row((tx, ty), kind, v=b, m=m)
            sends = [((tx - 1, ty), "nbr_e", v[:, 0], mask[:, 0]),
                     ((tx + 1, ty), "nbr_w", v[:, -1], mask[:, -1]),
                     ((tx, ty - 1), "nbr_s", v[0, :], mask[0, :]),
                     ((tx, ty + 1), "nbr_n", v[-1, :], mask[-1, :]),
                     ((tx - 1, ty - 1), "nbr_se_c", v[0:1, 0], mask[0:1, 0]),
                     ((tx + 1, ty - 1), "nbr_sw_c", v[0:1, -1],
                      mask[0:1, -1]),
                     ((tx - 1, ty + 1), "nbr_ne_c", v[-1:, 0], mask[-1:, 0]),
                     ((tx + 1, ty + 1), "nbr_nw_c", v[-1:, -1],
                      mask[-1:, -1])]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b, m = strip(np.ascontiguousarray(vs),
                                 np.ascontiguousarray(ms))
                    row((ntx, nty), kind, v=b, m=m)
        return pa.table(out, schema=FLOW_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "ring_n":
            P[1:3, 1:c + 1] = vs.reshape(2, c)
            M[1:3, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_s":
            P[c - 1:c + 1, 1:c + 1] = vs.reshape(2, c)
            M[c - 1:c + 1, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_w":
            P[1:c + 1, 1:3] = vs.reshape(c, 2)
            M[1:c + 1, 1:3] = ms.reshape(c, 2)
        elif kind == "ring_e":
            P[1:c + 1, c - 1:c + 1] = vs.reshape(c, 2)
            M[1:c + 1, c - 1:c + 1] = ms.reshape(c, 2)
        elif kind == "nbr_n":
            P[0, 1:c + 1], M[0, 1:c + 1] = vs, ms
        elif kind == "nbr_s":
            P[c + 1, 1:c + 1], M[c + 1, 1:c + 1] = vs, ms
        elif kind == "nbr_w":
            P[1:c + 1, 0], M[1:c + 1, 0] = vs, ms
        elif kind == "nbr_e":
            P[1:c + 1, c + 1], M[1:c + 1, c + 1] = vs, ms
        elif kind == "nbr_nw_c":
            P[0, 0], M[0, 0] = vs[0], ms[0]
        elif kind == "nbr_ne_c":
            P[0, c + 1], M[0, c + 1] = vs[0], ms[0]
        elif kind == "nbr_sw_c":
            P[c + 1, 0], M[c + 1, 0] = vs[0], ms[0]
        elif kind == "nbr_se_c":
            P[c + 1, c + 1], M[c + 1, c + 1] = vs[0], ms[0]

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        empty = pa.table({"tile_id": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "dir_code": pa.array([], pa.int64()),
                          "n_px": pa.array([], pa.int64())})
        if "self" not in kinds:
            return empty
        c = chunk
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        hist = np.zeros(9, np.int64)
        for j, kind in enumerate(kinds):
            if kind == "self":
                hist += np.frombuffer(g.column("hist")[j].as_py(), np.int64)
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        codes = _flowdir_codes(P, M)
        border = np.zeros((c, c), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        hist += _hist9(np.where(border, codes, np.int64(-1)))
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"] * 9, pa.string()),
            "tx": pa.array([tx] * 9, pa.int64()),
            "ty": pa.array([ty] * 9, pa.int64()),
            "dir_code": pa.array(np.arange(9, dtype=np.int64), pa.int64()),
            "n_px": pa.array(hist, pa.int64()),
        })

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


# ------------------------------------------------- L1 distance transform
def _sep_dt(f: np.ndarray, cap: int) -> np.ndarray:
    """Exact L1 distance transform OF A FUNCTION: D(p) = min_q f(q) +
    |p-q|_1, via two separable 1-D passes (vertical then horizontal),
    each a forward/backward min-accumulate — fully vectorized, values
    clamped to ``cap``."""
    ridx = np.arange(f.shape[0], dtype=np.int64)[:, None]
    cidx = np.arange(f.shape[1], dtype=np.int64)[None, :]
    down = np.minimum.accumulate(f - ridx, axis=0) + ridx
    up = np.minimum.accumulate((f + ridx)[::-1], axis=0)[::-1] - ridx
    d = np.minimum(down, up)
    right = np.minimum.accumulate(d - cidx, axis=1) + cidx
    left = np.minimum.accumulate((d + cidx)[:, ::-1], axis=1)[:, ::-1] - cidx
    return np.minimum(np.minimum(right, left), np.int64(cap))


DIST_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),
    ("d_z", pa.binary()),    # self rows: zlib int64 capped DT plane
    ("v", pa.binary()),      # edge/halo strips: int64 DT values
])


def distance_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                   cap: int | None = None):
    """Per-tile L1 distance-to-nearest-valid-pixel statistics (capped
    chamfer distance transform) — the gap-analysis / coverage-proximity
    op (how far is every nodata pixel from observed data).

    ONE halo exchange is EXACT, not iterative, because (a) the L1
    transform is separable (``_sep_dt``: two 1-D min-plus passes compute
    min_q f(q)+|p-q|_1 for arbitrary seed functions), and (b) with
    ``cap <= chunk`` every relevant source lies in the 3x3 tile ring, and
    any L1 staircase from a source q to a pixel p crosses this tile's
    1-px halo ring at a cell r with |p-q| = |p-r| + |r-q| whose halo
    value is the NEIGHBOR's own-tile-exact DT — including the single
    corner cell for diagonal neighbors (the crossing rectangle always
    contains it). So: per-tile local DT map-side, ship 1-px edge strips +
    corner pixels + the tile's own capped plane through one keyed
    shuffle, re-sweep the padded frame, done. Absent tiles hold no valid
    pixels and contribute nothing, matching the golden.

    Output (tile_id, tx, ty, n_reached, dist_sum): pixels with dist <
    cap, and the sum of capped distances over all chunk^2 pixels.
    Value-checked against a full-plane golden (fixtures._golden_distance).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    cap = chunk // 2 if cap is None else cap
    if cap > chunk:
        raise ValueError(f"cap={cap} > chunk={chunk}: sources beyond the "
                         "3x3 tile ring would be missed; raise chunk or "
                         "lower cap")
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in DIST_PARTIAL_SCHEMA.names}

        def row(tile, kind, d_z=b"", v=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["d_z"].append(d_z)
            out["v"].append(v)

        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            tx, ty = int(txs[j]), int(tys[j])
            seed = np.where(mask, np.int64(0), np.int64(cap))
            d = _sep_dt(seed, cap)
            row((tx, ty), "self",
                d_z=zlib.compress(d.tobytes(), 1))
            sends = [((tx - 1, ty), "nbr_e", d[:, 0]),
                     ((tx + 1, ty), "nbr_w", d[:, -1]),
                     ((tx, ty - 1), "nbr_s", d[0, :]),
                     ((tx, ty + 1), "nbr_n", d[-1, :]),
                     ((tx - 1, ty - 1), "nbr_se_c", d[0:1, 0]),
                     ((tx + 1, ty - 1), "nbr_sw_c", d[0:1, -1]),
                     ((tx - 1, ty + 1), "nbr_ne_c", d[-1:, 0]),
                     ((tx + 1, ty + 1), "nbr_nw_c", d[-1:, -1])]
            for (ntx, nty), kind, vs in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    row((ntx, nty), kind,
                        v=np.ascontiguousarray(vs).astype(np.int64).tobytes())
        return pa.table(out, schema=DIST_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        empty = pa.table({"tile_id": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "n_reached": pa.array([], pa.int64()),
                          "dist_sum": pa.array([], pa.int64())})
        if "self" not in kinds:
            return empty
        c = chunk
        P = np.full((c + 2, c + 2), np.int64(cap))
        for j, kind in enumerate(kinds):
            if kind == "self":
                own = np.frombuffer(
                    zlib.decompress(g.column("d_z")[j].as_py()),
                    np.int64).reshape(c, c)
                P[1:c + 1, 1:c + 1] = own
                continue
            vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
            if kind == "nbr_n":
                P[0, 1:c + 1] = vs
            elif kind == "nbr_s":
                P[c + 1, 1:c + 1] = vs
            elif kind == "nbr_w":
                P[1:c + 1, 0] = vs
            elif kind == "nbr_e":
                P[1:c + 1, c + 1] = vs
            elif kind == "nbr_nw_c":
                P[0, 0] = vs[0]
            elif kind == "nbr_ne_c":
                P[0, c + 1] = vs[0]
            elif kind == "nbr_sw_c":
                P[c + 1, 0] = vs[0]
            elif kind == "nbr_se_c":
                P[c + 1, c + 1] = vs[0]
        d = _sep_dt(P, cap)[1:c + 1, 1:c + 1]
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "n_reached": pa.array([int((d < cap).sum())], pa.int64()),
            "dist_sum": pa.array([int(d.sum())], pa.int64()),
        })

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


def _aspect_classes(V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Per interior position of a padded (h+2, w+2) frame: aspect class
    0..7 from central differences (dx = east - west, dy = south - north),
    8 = flat, -1 = excluded (center or any cardinal neighbor invalid).
    Classes are quadrant-halved: class = 2*q + (|dy| > |dx|) with
    quadrants q: 0 (dx>0, dy>=0), 1 (dx<=0, dy>0), 2 (dx<0, dy<=0),
    3 (dx>=0, dy<0) — every boundary assigned by integer comparisons."""
    h, w = V.shape[0] - 2, V.shape[1] - 2
    mc = M[1:1 + h, 1:1 + w]
    e, wst = V[1:1 + h, 2:2 + w], V[1:1 + h, 0:w]
    s, n = V[2:2 + h, 1:1 + w], V[0:h, 1:1 + w]
    ok = (mc & M[1:1 + h, 2:2 + w] & M[1:1 + h, 0:w]
          & M[2:2 + h, 1:1 + w] & M[0:h, 1:1 + w])
    dx = e - wst
    dy = s - n
    q = np.where((dx > 0) & (dy >= 0), 0,
                 np.where((dx <= 0) & (dy > 0), 1,
                          np.where((dx < 0) & (dy <= 0), 2, 3)))
    cls = 2 * q + (np.abs(dy) > np.abs(dx)).astype(np.int64)
    cls = np.where((dx == 0) & (dy == 0), np.int64(8), cls)
    return np.where(ok, cls, np.int64(-1))


def aspect_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile aspect-class histogram (terrain orientation): central-
    difference gradient sectors over the mosaic, integer-exact (sector
    boundaries are sign/|dx| vs |dy| comparisons, never atan2 floats).

    Cardinal-only 1-px halo exchange (central differences need no
    corners): interior pixels fold map-side into a 9-bin histogram, each
    tile ships 4 edge strips and keys its outer ring to itself. Output
    one row per (tile, class 0..8); golden painted from the GLOBAL plane
    (fixtures._golden_aspect).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in FLOW_PARTIAL_SCHEMA.names}

        def row(tile, kind, hist=b"", v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["hist"].append(hist)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            interior = _aspect_classes(v, mask)
            row((tx, ty), "self", hist=_hist9(interior).tobytes())

            def strip(vs, ms):
                return vs.astype(np.int64).tobytes(), \
                    ms.astype(np.uint8).tobytes()

            for kind, vs, ms in (
                ("ring_n", v[0:2, :], mask[0:2, :]),
                ("ring_s", v[-2:, :], mask[-2:, :]),
                ("ring_w", v[:, 0:2], mask[:, 0:2]),
                ("ring_e", v[:, -2:], mask[:, -2:]),
            ):
                b, m = strip(vs, ms)
                row((tx, ty), kind, v=b, m=m)
            sends = [((tx - 1, ty), "nbr_e", v[:, 0], mask[:, 0]),
                     ((tx + 1, ty), "nbr_w", v[:, -1], mask[:, -1]),
                     ((tx, ty - 1), "nbr_s", v[0, :], mask[0, :]),
                     ((tx, ty + 1), "nbr_n", v[-1, :], mask[-1, :])]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b, m = strip(np.ascontiguousarray(vs),
                                 np.ascontiguousarray(ms))
                    row((ntx, nty), kind, v=b, m=m)
        return pa.table(out, schema=FLOW_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "ring_n":
            P[1:3, 1:c + 1] = vs.reshape(2, c)
            M[1:3, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_s":
            P[c - 1:c + 1, 1:c + 1] = vs.reshape(2, c)
            M[c - 1:c + 1, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_w":
            P[1:c + 1, 1:3] = vs.reshape(c, 2)
            M[1:c + 1, 1:3] = ms.reshape(c, 2)
        elif kind == "ring_e":
            P[1:c + 1, c - 1:c + 1] = vs.reshape(c, 2)
            M[1:c + 1, c - 1:c + 1] = ms.reshape(c, 2)
        elif kind == "nbr_n":
            P[0, 1:c + 1], M[0, 1:c + 1] = vs, ms
        elif kind == "nbr_s":
            P[c + 1, 1:c + 1], M[c + 1, 1:c + 1] = vs, ms
        elif kind == "nbr_w":
            P[1:c + 1, 0], M[1:c + 1, 0] = vs, ms
        elif kind == "nbr_e":
            P[1:c + 1, c + 1], M[1:c + 1, c + 1] = vs, ms

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        empty = pa.table({"tile_id": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "aspect_class": pa.array([], pa.int64()),
                          "n_px": pa.array([], pa.int64())})
        if "self" not in kinds:
            return empty
        c = chunk
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        hist = np.zeros(9, np.int64)
        for j, kind in enumerate(kinds):
            if kind == "self":
                hist += np.frombuffer(g.column("hist")[j].as_py(), np.int64)
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        codes = _aspect_classes(P, M)
        border = np.zeros((c, c), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        hist += _hist9(np.where(border, codes, np.int64(-1)))
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"] * 9, pa.string()),
            "tx": pa.array([tx] * 9, pa.int64()),
            "ty": pa.array([ty] * 9, pa.int64()),
            "aspect_class": pa.array(np.arange(9, dtype=np.int64),
                                     pa.int64()),
            "n_px": pa.array(hist, pa.int64()),
        })

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


# ----------------------------------------------------------------- 5x5 blur

BLUR_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    # 'self' | own outer-4 rings 'ring_{n,s,w,e}' | neighbor 2-px strips
    # 'nbr_{n,s,w,e}' | 2x2 corner blocks 'nbr_{nw,ne,sw,se}_c'
    ("kind", pa.string()),
    ("n_px", pa.int64()),
    ("blur_q_sum", pa.int64()),
    ("v", pa.binary()),
    ("m", pa.binary()),
])

_B5 = np.array([1, 4, 6, 4, 1], np.int64)


def _blur_numden(v: np.ndarray, m: np.ndarray):
    """Separable 5x5 binomial weighted sums over valid pixels: returns
    (num, den) of shape (H-4, W-4) — centers whose window lies inside."""
    vm = v * m
    # rows pass
    num_r = sum(int(_B5[k]) * vm[:, k:vm.shape[1] - 4 + k]
                for k in range(5))
    den_r = sum(int(_B5[k]) * m[:, k:m.shape[1] - 4 + k]
                for k in range(5))
    num = sum(int(_B5[k]) * num_r[k:num_r.shape[0] - 4 + k, :]
              for k in range(5))
    den = sum(int(_B5[k]) * den_r[k:den_r.shape[0] - 4 + k, :]
              for k in range(5))
    return num, den


def blur_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile 5x5 binomial-blur statistics — the WIDE-halo focal op
    (radius 2): every existing stencil exchanges 1-px halos; a 5x5 kernel
    needs 2-px edge strips and 2x2 corner blocks, and an ABSENT tile
    bordering a valid one still owns blur centers (its ring pixels see
    the neighbor through the halo), so the merge also runs on groups
    with no 'self' row.

    Semantics: for every grid pixel whose 5x5 window holds >=1 valid
    mosaic pixel, blur_q = (Σ w·v) // (Σ w) over the window's valid
    pixels with binomial weights w = [1,4,6,4,1]⊗[1,4,6,4,1]. Output
    (tile_id, tx, ty, n_px, blur_q_sum) per tile owning >=1 such center.

    Plan: interior centers (windows inside the tile) fold MAP-SIDE; the
    keyed exchange carries own outer-4 ring strips + 2-px halo strips +
    2x2 corner blocks — O(perimeter), never a canvas. Oracle: DuckDB
    re-derives every center from the plane dump (weights by |d| CASE).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in BLUR_PARTIAL_SCHEMA.names}

        def row(tile, kind, n=0, stat=0, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["n_px"].append(n)
            out["blur_q_sum"].append(stat)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk)
            v = _vsum(canvas, pack)
            mi = mask.astype(np.int64)
            tx, ty = int(txs[j]), int(tys[j])
            num, den = _blur_numden(v, mi)
            ok = den > 0
            row((tx, ty), "self", int(ok.sum()),
                int((num[ok] // den[ok]).sum()))

            def strip(vs, ms):
                return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                        np.ascontiguousarray(ms).astype(np.uint8).tobytes())

            for kind, vs, ms in (
                ("ring_n", v[0:4, :], mask[0:4, :]),
                ("ring_s", v[-4:, :], mask[-4:, :]),
                ("ring_w", v[:, 0:4], mask[:, 0:4]),
                ("ring_e", v[:, -4:], mask[:, -4:]),
            ):
                b, m = strip(vs, ms)
                row((tx, ty), kind, v=b, m=m)
            sends = [
                ((tx - 1, ty), "nbr_e", v[:, 0:2], mask[:, 0:2]),
                ((tx + 1, ty), "nbr_w", v[:, -2:], mask[:, -2:]),
                ((tx, ty - 1), "nbr_s", v[0:2, :], mask[0:2, :]),
                ((tx, ty + 1), "nbr_n", v[-2:, :], mask[-2:, :]),
                ((tx - 1, ty - 1), "nbr_se_c", v[0:2, 0:2],
                 mask[0:2, 0:2]),
                ((tx + 1, ty - 1), "nbr_sw_c", v[0:2, -2:],
                 mask[0:2, -2:]),
                ((tx - 1, ty + 1), "nbr_ne_c", v[-2:, 0:2],
                 mask[-2:, 0:2]),
                ((tx + 1, ty + 1), "nbr_nw_c", v[-2:, -2:],
                 mask[-2:, -2:]),
            ]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b, m = strip(vs, ms)
                    row((ntx, nty), kind, v=b, m=m)
        return pa.table(out, schema=BLUR_PARTIAL_SCHEMA)

    partials = tiles_ds.select_columns(
        ["tile_id", "tx", "ty", "px_z", "mask_z"]
    ).map_batches(emit, batch_format="pyarrow", batch_size=64)

    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "ring_n":
            P[2:6, 2:c + 2] = vs.reshape(4, c)
            M[2:6, 2:c + 2] = ms.reshape(4, c)
        elif kind == "ring_s":
            P[c - 2:c + 2, 2:c + 2] = vs.reshape(4, c)
            M[c - 2:c + 2, 2:c + 2] = ms.reshape(4, c)
        elif kind == "ring_w":
            P[2:c + 2, 2:6] = vs.reshape(c, 4)
            M[2:c + 2, 2:6] = ms.reshape(c, 4)
        elif kind == "ring_e":
            P[2:c + 2, c - 2:c + 2] = vs.reshape(c, 4)
            M[2:c + 2, c - 2:c + 2] = ms.reshape(c, 4)
        elif kind == "nbr_n":
            P[0:2, 2:c + 2] = vs.reshape(2, c)
            M[0:2, 2:c + 2] = ms.reshape(2, c)
        elif kind == "nbr_s":
            P[c + 2:c + 4, 2:c + 2] = vs.reshape(2, c)
            M[c + 2:c + 4, 2:c + 2] = ms.reshape(2, c)
        elif kind == "nbr_w":
            P[2:c + 2, 0:2] = vs.reshape(c, 2)
            M[2:c + 2, 0:2] = ms.reshape(c, 2)
        elif kind == "nbr_e":
            P[2:c + 2, c + 2:c + 4] = vs.reshape(c, 2)
            M[2:c + 2, c + 2:c + 4] = ms.reshape(c, 2)
        elif kind == "nbr_nw_c":
            P[0:2, 0:2] = vs.reshape(2, 2)
            M[0:2, 0:2] = ms.reshape(2, 2)
        elif kind == "nbr_ne_c":
            P[0:2, c + 2:c + 4] = vs.reshape(2, 2)
            M[0:2, c + 2:c + 4] = ms.reshape(2, 2)
        elif kind == "nbr_sw_c":
            P[c + 2:c + 4, 0:2] = vs.reshape(2, 2)
            M[c + 2:c + 4, 0:2] = ms.reshape(2, 2)
        elif kind == "nbr_se_c":
            P[c + 2:c + 4, c + 2:c + 4] = vs.reshape(2, 2)
            M[c + 2:c + 4, c + 2:c + 4] = ms.reshape(2, 2)

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        c = chunk
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        P = np.zeros((c + 4, c + 4), np.int64)
        M = np.zeros((c + 4, c + 4), np.int64)
        n_self = 0
        s_self = 0
        for j, kind in enumerate(kinds):
            if kind == "self":
                n_self = int(g.column("n_px")[j].as_py())
                s_self = int(g.column("blur_q_sum")[j].as_py())
                continue
            vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
            ms = np.frombuffer(g.column("m")[j].as_py(), np.uint8) \
                .astype(np.int64)
            _place(P, M, kind, vs, ms)
        # padded frame covers tile pixels at offset +2; compute every
        # center, then keep only the outer-2 border ring (interior came
        # from the map side — and is WRONG here: the frame holds rings
        # only)
        num, den = _blur_numden(P, M)  # (c, c): centers = tile pixels
        border = np.zeros((c, c), bool)
        border[0:2, :] = True
        border[-2:, :] = True
        border[:, 0:2] = True
        border[:, -2:] = True
        ok = border & (den > 0)
        n = n_self + int(ok.sum())
        s = s_self + int((num[ok] // den[ok]).sum())
        if n == 0:
            return pa.table({k: pa.array([], BLUR_OUT_SCHEMA.field(k).type)
                             for k in BLUR_OUT_SCHEMA.names})
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "n_px": pa.array([n], pa.int64()),
            "blur_q_sum": pa.array([s], pa.int64()),
        })

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


BLUR_OUT_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("n_px", pa.int64()),
    ("blur_q_sum", pa.int64()),
])


# ---- generic 3x3 ring-exchange focal engine ---------------------------------
#
# dilate/erode predate this engine and keep their own (oracle-green, stable)
# emit/merge; new 3x3 focal ops plug a single vectorized ``reduce_fn`` into
# the shared ring protocol below instead of re-implementing the exchange.

RING_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    # 'self' | own ring strips 'ring_{n,s,w,e}' | neighbor strips
    # 'nbr_{n,s,w,e}' | corner pixels 'nbr_{nw,ne,sw,se}_c'
    ("kind", pa.string()),
    ("n", pa.int64()),
    ("s1", pa.int64()),
    ("s2", pa.int64()),
    ("v", pa.binary()),   # int64 strip values
    ("m", pa.binary()),   # uint8 strip validity
])


def ring_focal_stats(tiles_ds, grid: GridSpec, reduce_fn,
                     pack: ChannelPack | None = None,
                     names=("n_px", "s1_sum", "s2_sum")):
    """Generic per-tile 3x3 focal statistic with the FULL 8-neighborhood
    ring/halo exchange (the ``dilate_stats`` plan, reduction-agnostic).

    ``reduce_fn(P, M) -> (sel, s1, s2)`` is a pure vectorized kernel over a
    PADDED ``(h+2, w+2)`` int64 value frame ``P`` and bool validity ``M``:
    it returns, for the ``(h, w)`` center positions, a bool selection plane
    and one or two int64 stat planes (``s2`` may be ``None``). The engine
    computes interior positions MAP-SIDE (windows fully inside the tile —
    zero data movement) and border positions in the keyed merge from the
    O(perimeter) exchanged ring frame; output is one row per tile:
    ``(tile_id, tx, ty, n, s1_sum[, s2_sum])`` where ``n = sel.sum()`` and
    each stat plane sums over ``sel``.

    Reference analog: the focal/windowed raster statistics the reference
    computes over loaded cube windows (smart-geocubes core/accessor.py
    load-window path); here the window never materializes — only strips
    move. Scale: identical envelope to dilate_stats (O(perimeter) shuffle
    per tile, never a canvas).
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    two = names[2] is not None and len(names) > 2

    def _stats(sel, s1, s2, region):
        ok = sel & region
        return (int(ok.sum()), int(s1[ok].sum()),
                int(s2[ok].sum()) if s2 is not None else 0)

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in RING_PARTIAL_SCHEMA.names}

        def row(tile, kind, n=0, a=0, b=0, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["n"].append(n)
            out["s1"].append(a)
            out["s2"].append(b)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        c = chunk
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            # interior map-side: pad with invalid; border ring positions
            # (whose windows cross the tile) are excluded here and computed
            # by the merge from the exchanged frame.
            P = np.zeros((c + 2, c + 2), np.int64)
            M = np.zeros((c + 2, c + 2), bool)
            P[1:c + 1, 1:c + 1] = v
            M[1:c + 1, 1:c + 1] = mask
            sel, s1, s2 = reduce_fn(P, M)
            inner = np.zeros((c, c), bool)
            inner[1:-1, 1:-1] = True
            row((tx, ty), "self", *_stats(sel, s1, s2, inner))

            def strip(vs, ms):
                return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                        np.ascontiguousarray(ms).astype(np.uint8).tobytes())

            for kind, vs, ms in (
                ("ring_n", v[0:2, :], mask[0:2, :]),
                ("ring_s", v[-2:, :], mask[-2:, :]),
                ("ring_w", v[:, 0:2], mask[:, 0:2]),
                ("ring_e", v[:, -2:], mask[:, -2:]),
            ):
                b_, m_ = strip(vs, ms)
                row((tx, ty), kind, v=b_, m=m_)
            sends = [((tx - 1, ty), "nbr_e", v[:, 0], mask[:, 0]),
                     ((tx + 1, ty), "nbr_w", v[:, -1], mask[:, -1]),
                     ((tx, ty - 1), "nbr_s", v[0, :], mask[0, :]),
                     ((tx, ty + 1), "nbr_n", v[-1, :], mask[-1, :]),
                     ((tx - 1, ty - 1), "nbr_se_c", v[0:1, 0], mask[0:1, 0]),
                     ((tx + 1, ty - 1), "nbr_sw_c", v[0:1, -1],
                      mask[0:1, -1]),
                     ((tx - 1, ty + 1), "nbr_ne_c", v[-1:, 0], mask[-1:, 0]),
                     ((tx + 1, ty + 1), "nbr_nw_c", v[-1:, -1],
                      mask[-1:, -1])]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b_, m_ = strip(vs, ms)
                    row((ntx, nty), kind, v=b_, m=m_)
        return pa.table(out, schema=RING_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "ring_n":
            P[1:3, 1:c + 1] = vs.reshape(2, c)
            M[1:3, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_s":
            P[c - 1:c + 1, 1:c + 1] = vs.reshape(2, c)
            M[c - 1:c + 1, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_w":
            P[1:c + 1, 1:3] = vs.reshape(c, 2)
            M[1:c + 1, 1:3] = ms.reshape(c, 2)
        elif kind == "ring_e":
            P[1:c + 1, c - 1:c + 1] = vs.reshape(c, 2)
            M[1:c + 1, c - 1:c + 1] = ms.reshape(c, 2)
        elif kind == "nbr_n":
            P[0, 1:c + 1], M[0, 1:c + 1] = vs, ms
        elif kind == "nbr_s":
            P[c + 1, 1:c + 1], M[c + 1, 1:c + 1] = vs, ms
        elif kind == "nbr_w":
            P[1:c + 1, 0], M[1:c + 1, 0] = vs, ms
        elif kind == "nbr_e":
            P[1:c + 1, c + 1], M[1:c + 1, c + 1] = vs, ms
        elif kind == "nbr_nw_c":
            P[0, 0], M[0, 0] = vs[0], ms[0]
        elif kind == "nbr_ne_c":
            P[0, c + 1], M[0, c + 1] = vs[0], ms[0]
        elif kind == "nbr_sw_c":
            P[c + 1, 0], M[c + 1, 0] = vs[0], ms[0]
        elif kind == "nbr_se_c":
            P[c + 1, c + 1], M[c + 1, c + 1] = vs[0], ms[0]

    out_fields = [("tile_id", pa.string()), ("tx", pa.int64()),
                  ("ty", pa.int64()), (names[0], pa.int64()),
                  (names[1], pa.int64())]
    if two:
        out_fields.append((names[2], pa.int64()))
    out_schema = pa.schema(out_fields)

    def merge(g: pa.Table) -> pa.Table:
        # NOTE: no early return on a missing 'self' row — an ABSENT tile
        # bordering valid ones can still own centers whose windows draw
        # entirely from the received halo strips (the blur/plane-oracle
        # convention); a truly empty frame falls out via n == 0 below.
        kinds = g.column("kind").to_pylist()
        c = chunk
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        n = a = b = 0
        for j, kind in enumerate(kinds):
            if kind == "self":
                n += int(g.column("n")[j].as_py())
                a += int(g.column("s1")[j].as_py())
                b += int(g.column("s2")[j].as_py())
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        sel, s1, s2 = reduce_fn(P, M)
        border = np.zeros((c, c), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        dn, da, db = _stats(sel, s1, s2, border)
        n, a, b = n + dn, a + da, b + db
        if n == 0:
            return pa.table({f.name: pa.array([], f.type)
                             for f in out_schema})
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        cols = {"tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
                "tx": pa.array([tx], pa.int64()),
                "ty": pa.array([ty], pa.int64()),
                names[0]: pa.array([n], pa.int64()),
                names[1]: pa.array([a], pa.int64())}
        if two:
            cols[names[2]] = pa.array([b], pa.int64())
        return pa.table(cols, schema=out_schema)

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


def _shift_stack(P: np.ndarray, M: np.ndarray):
    """(9, h, w) stacks of the 3x3 window values/validity per center."""
    h, w = P.shape[0] - 2, P.shape[1] - 2
    S = np.empty((9, h, w), np.int64)
    C = np.empty((9, h, w), bool)
    i = 0
    for dr in range(3):
        for dc in range(3):
            S[i] = P[dr:dr + h, dc:dc + w]
            C[i] = M[dr:dr + h, dc:dc + w]
            i += 1
    return S, C


def focal_median_stats(tiles_ds, grid: GridSpec,
                       pack: ChannelPack | None = None):
    """3x3 focal LOWER median (rank ceil(k/2) of the window's k valid
    values — DuckDB ``quantile_disc(v, 0.5)`` semantics, so the oracle is
    an exact SQL replay over the plane dump). Output per tile:
    (tile_id, tx, ty, n_px, med_sum) over pixels whose window has >=1
    valid value. The despeckle/denoise focal op of the family."""

    def reduce_fn(P, M):
        S, C = _shift_stack(P, M)
        Sv = np.where(C, S, _POS)
        Sv.sort(axis=0)
        k = C.sum(axis=0)
        sel = k > 0
        idx = np.maximum((k + 1) // 2 - 1, 0)
        med = np.take_along_axis(Sv, idx[None], axis=0)[0]
        med[~sel] = 0
        return sel, med, None

    return ring_focal_stats(tiles_ds, grid, reduce_fn, pack,
                            names=("n_px", "med_sum", None))


def curvature_stats(tiles_ds, grid: GridSpec,
                    pack: ChannelPack | None = None):
    """Discrete Laplacian + terrain-ruggedness (TRI) statistics per tile.

    For every pixel p with a valid center value and >=1 valid 8-neighbor:
    ``lap = sum(v_n - v_p)`` over the VALID 4-neighbors (0 if none) and
    ``tri = sum(|v_n - v_p|)`` over the valid 8-neighbors. Output
    (tile_id, tx, ty, n_px, lap_sum, tri_sum) — the curvature/roughness
    terrain pair on the shared ring exchange."""

    def reduce_fn(P, M):
        S, C = _shift_stack(P, M)
        center_v, center_m = S[4], C[4]
        nbr = [i for i in range(9) if i != 4]
        four = [1, 3, 5, 7]  # N, W, E, S offsets in row-major 3x3 order
        diff = S - center_v[None]
        validn = C & center_m[None]
        anyn = np.zeros_like(center_m)
        lap = np.zeros(center_v.shape, np.int64)
        tri = np.zeros(center_v.shape, np.int64)
        for i in nbr:
            anyn |= validn[i]
            tri += np.where(validn[i], np.abs(diff[i]), 0)
            if i in four:
                lap += np.where(validn[i], diff[i], 0)
        sel = center_m & anyn
        return sel, lap, tri

    return ring_focal_stats(tiles_ds, grid, reduce_fn, pack,
                            names=("n_px", "lap_sum", "tri_sum"))


def hotspot_stats(tiles_ds, grid: GridSpec, v_global: int, n_global: int,
                  pack: ChannelPack | None = None):
    """Getis-Ord-Gi*-shaped hot-spot analysis, integer-exact.

    For every valid pixel, the 3x3 window's valid (sum ws, count wc) is
    compared against the GLOBAL mean by cross-multiplication:
    hot iff ``ws * n_global > wc * v_global`` (window mean strictly above
    the global mean — the Gi* numerator's sign, with no sqrt/float).
    ``v_global``/``n_global`` come free from the tile table's pix_sum /
    n_valid_px metadata columns — no extra raster pass. Output per tile:
    (tile_id, tx, ty, n_px, n_hot, hot_excess_sum) where hot_excess_sum
    sums ``ws * n_global - wc * v_global`` over hot pixels."""
    V, N = int(v_global), int(n_global)

    def reduce_fn(P, M):
        S, C = _shift_stack(P, M)
        ws = np.where(C, S, 0).sum(axis=0)
        wc = C.sum(axis=0).astype(np.int64)
        sel = C[4]
        excess = ws * N - wc * V
        hot = (excess > 0) & sel
        return sel, hot.astype(np.int64), np.where(hot, excess, 0)

    return ring_focal_stats(tiles_ds, grid, reduce_fn, pack,
                            names=("n_px", "n_hot", "hot_excess_sum"))


# ---- empirical semivariogram (axis-aligned pixel lags) ----------------------

VARIO_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("kind", pa.string()),   # 'stat' | 'edge_e' | 'edge_s' | 'halo_e' | 'halo_s'
    ("axis", pa.string()),   # stat rows only: 'x' | 'y'
    ("lag", pa.int64()),
    ("n_pairs", pa.int64()),
    ("gamma2", pa.int64()),  # sum of squared differences (2N * gamma(h))
    ("v", pa.binary()),      # int64 strip values (edge/halo rows)
    ("m", pa.binary()),      # uint8 strip validity
])


def variogram_stats(tiles_ds, grid: GridSpec, lags=(1, 2, 4),
                    pack: ChannelPack | None = None):
    """Empirical semivariogram moments at axis-aligned pixel lags — the
    geostatistics op (kriging's first step): for each lag h and axis,
    ``gamma2(h) = sum((v(p) - v(p+h))^2)`` and ``n_pairs(h)`` over all
    pairs of VALID pixels h apart along +x / +y. Output: one row per
    (axis, lag) — ``(axis, lag, n_pairs, gamma2)`` — integer-exact, so the
    DuckDB oracle replays it with a plane self-join.

    Plan: pairs fully inside a tile fold MAP-SIDE; a pair straddling an
    east/south tile border needs only the neighbor's first ``max(lag)``
    columns/rows, so each tile keeps its own last-``max(lag)`` strips keyed
    to itself and sends its first strips west/north — the one keyed
    exchange carries O(max_lag * perimeter) per tile, never a canvas. The
    final fold is a 2*len(lags)-key groupby of scalar partials.

    Overflow: |v| <= 765 (RGB) so d^2 <= 585k; 2^63/585k ~ 1.6e13 pairs —
    safe far beyond any per-plane scale here (per-lag pair count <= pixel
    count)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    H = max(lags)
    assert H <= chunk, "strip exchange covers lags up to one chunk"

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in VARIO_PARTIAL_SCHEMA.names}

        def row(tile_id, kind, axis="", lag=0, n=0, g2=0, v=b"", m=b""):
            out["tile_id"].append(tile_id)
            out["kind"].append(kind)
            out["axis"].append(axis)
            out["lag"].append(lag)
            out["n_pairs"].append(n)
            out["gamma2"].append(g2)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        c = chunk
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            me = f"{tx}-{ty}"
            # interior pairs, entirely map-side
            for h in lags:
                bx = mask[:, :-h] & mask[:, h:]
                dx = v[:, h:] - v[:, :-h]
                by = mask[:-h, :] & mask[h:, :]
                dy = v[h:, :] - v[:-h, :]
                row(me, "stat", "x", h, int(bx.sum()),
                    int((dx[bx].astype(np.int64) ** 2).sum()))
                row(me, "stat", "y", h, int(by.sum()),
                    int((dy[by].astype(np.int64) ** 2).sum()))

            def strip(vs, ms):
                return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                        np.ascontiguousarray(ms).astype(np.uint8).tobytes())

            b_, m_ = strip(v[:, -H:], mask[:, -H:])
            row(me, "edge_e", v=b_, m=m_)
            b_, m_ = strip(v[-H:, :], mask[-H:, :])
            row(me, "edge_s", v=b_, m=m_)
            if tx > 0:
                b_, m_ = strip(v[:, :H], mask[:, :H])
                row(f"{tx - 1}-{ty}", "halo_e", v=b_, m=m_)
            if ty > 0:
                b_, m_ = strip(v[:H, :], mask[:H, :])
                row(f"{tx}-{ty - 1}", "halo_s", v=b_, m=m_)
        return pa.table(out, schema=VARIO_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        agg: dict[tuple, list] = {}
        strips: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        c = chunk
        for j, kind in enumerate(kinds):
            if kind == "stat":
                key = (g.column("axis")[j].as_py(),
                       int(g.column("lag")[j].as_py()))
                cur = agg.setdefault(key, [0, 0])
                cur[0] += int(g.column("n_pairs")[j].as_py())
                cur[1] += int(g.column("gamma2")[j].as_py())
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                shape = (c, H) if kind in ("edge_e", "halo_e") else (H, c)
                strips[kind] = (vs.reshape(shape), ms.reshape(shape))
        # straddling pairs: own last-H strip x neighbor first-H strip.
        # pair (col c-H+i) + h lands at halo col i + h - H when i + h >= H.
        for edge, halo, ax in (("edge_e", "halo_e", "x"),
                               ("edge_s", "halo_s", "y")):
            if edge not in strips or halo not in strips:
                continue
            ev, em = strips[edge]
            hv, hm = strips[halo]
            if ax == "y":
                ev, em, hv, hm = ev.T, em.T, hv.T, hm.T
            for h in lags:
                for i in range(H - h, H):
                    pcol = i + h - H
                    both = em[:, i] & hm[:, pcol]
                    d = hv[:, pcol] - ev[:, i]
                    cur = agg.setdefault((ax, h), [0, 0])
                    cur[0] += int(both.sum())
                    cur[1] += int((d[both].astype(np.int64) ** 2).sum())
        if not agg:
            return pa.table({"axis": pa.array([], pa.string()),
                             "lag": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64()),
                             "gamma2": pa.array([], pa.int64())})
        keys = sorted(agg)
        return pa.table({
            "axis": pa.array([k[0] for k in keys], pa.string()),
            "lag": pa.array([k[1] for k in keys], pa.int64()),
            "n_pairs": pa.array([agg[k][0] for k in keys], pa.int64()),
            "gamma2": pa.array([agg[k][1] for k in keys], pa.int64()),
        })

    per_tile = partials.groupby("tile_id").map_groups(
        merge, batch_format="pyarrow")
    return (per_tile.groupby(["axis", "lag"])
            .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                       Sum("gamma2", alias_name="gamma2")))


# ---- cross-CRS nearest-neighbor reprojection (raster warp) -------------------

REPROJ_MID_SCHEMA = pa.schema([
    ("key", pa.string()),     # grouping key: src tile id, then dst tile id
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),    # 'self' | 'req' | 'frag'
    ("rs0", pa.int64()),      # requested/shipped src-pixel window
    ("cs0", pa.int64()),
    ("h", pa.int64()),
    ("w", pa.int64()),
    ("v", pa.binary()),       # frag: int64 v-plane window bytes
    ("m", pa.binary()),       # frag: uint8 validity window bytes
])


def _dst_to_src_px(dst: GridSpec, src: GridSpec, dtx: int, dty: int):
    """EXACT per-pixel source indices sampled by dst tile (dtx, dty):
    dst pixel centers -> dst CRS -> lon/lat -> src CRS -> floor to src
    pixel. Returns (rs, cs) int64 planes of the dst tile's shape."""
    from ..geom import forward_xy, inverse_xy

    tc0, tc1, tr0, tr1 = dst.tile_pixel_window(dtx, dty)
    cols = np.arange(tc0, tc1, dtype=np.float64)
    rows = np.arange(tr0, tr1, dtype=np.float64)
    xc = dst.x0 + (cols + 0.5) * dst.res
    yc = dst.y1 - (rows + 0.5) * dst.res
    X, Y = np.meshgrid(xc, yc)
    lon, lat = inverse_xy(dst.crs, X.ravel(), Y.ravel())
    xs, ys = forward_xy(src.crs, lon, lat)
    cs = np.floor((xs - src.x0) / src.res).astype(np.int64)
    rs = np.floor((src.y1 - ys) / src.res).astype(np.int64)
    return (rs.reshape(Y.shape), cs.reshape(X.shape))


def reproject_nn(tiles_ds, src_grid: GridSpec, dst_grid: GridSpec):
    """Cross-CRS nearest-neighbor raster REPROJECTION — the reference's
    M1 CRS transform applied to the raster itself (its accessor only
    reprojects the query geometry; a geocube engine also needs the warp):
    each destination pixel center inverse-projects to lon/lat, forwards
    into the source CRS, and NN-samples the source mosaic.

    Plan (exact target-driven gather, no global plane):
    1. The destination TILE LIST is metadata (driver-enumerated ids); a
       map stage computes each dst tile's EXACT per-pixel source-index
       planes (chunk² projections, vectorized) and emits per-source-tile
       window REQUESTS — O(covering src tiles) rows per dst tile.
    2. One keyed merge per SOURCE tile crops its v/mask planes to each
       requested window and ships O(window) fragments keyed by dst tile
       — a source byte travels only where some dst pixel samples it.
    3. One keyed merge per DST tile recomputes the same per-pixel map
       (deterministic, cheaper than shipping it) and samples the
       assembled fragments. Output: (tile_id, tx, ty, n_px, v_sum) per
       dst tile with >=1 valid sample.

    Checked against a serial full-plane warp golden
    (``fixtures.ensure_reproject_golden``) sharing only the projection
    kernels + grid arithmetic, plus random-mosaic tests.
    """
    import ray.data as rd

    pack = ChannelPack(RGB_CHANNELS)
    sc = src_grid.chunk
    dc = dst_grid.chunk

    def requests(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in REPROJ_MID_SCHEMA.names}
        dtxs = t.column("dtx").to_numpy()
        dtys = t.column("dty").to_numpy()
        for j in range(len(t)):
            dtx, dty = int(dtxs[j]), int(dtys[j])
            rs, cs = _dst_to_src_px(dst_grid, src_grid, dtx, dty)
            inside = ((rs >= 0) & (rs < src_grid.height)
                      & (cs >= 0) & (cs < src_grid.width))
            if not inside.any():
                continue
            stx = cs[inside] // sc
            sty = rs[inside] // sc
            packed = sty * np.int64(src_grid.n_tx) + stx
            for p in np.unique(packed):
                m = packed == p
                stx_, sty_ = int(p % src_grid.n_tx), int(p // src_grid.n_tx)
                rs0 = int(rs[inside][m].min())
                rs1 = int(rs[inside][m].max()) + 1
                cs0 = int(cs[inside][m].min())
                cs1 = int(cs[inside][m].max()) + 1
                out["key"].append(f"{stx_}-{sty_}")
                out["tx"].append(dtx)
                out["ty"].append(dty)
                out["kind"].append("req")
                out["rs0"].append(rs0)
                out["cs0"].append(cs0)
                out["h"].append(rs1 - rs0)
                out["w"].append(cs1 - cs0)
                out["v"].append(b"")
                out["m"].append(b"")
        return pa.table(out, schema=REPROJ_MID_SCHEMA)

    def src_rows(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in REPROJ_MID_SCHEMA.names}
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            out["key"].append(f"{int(txs[j])}-{int(tys[j])}")
            out["tx"].append(int(txs[j]))
            out["ty"].append(int(tys[j]))
            out["kind"].append("self")
            out["rs0"].append(0)
            out["cs0"].append(0)
            out["h"].append(0)
            out["w"].append(0)
            out["v"].append(px_z[j])
            out["m"].append(mask_z[j])
        return pa.table(out, schema=REPROJ_MID_SCHEMA)

    def serve(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        out: dict[str, list] = {k: [] for k in REPROJ_MID_SCHEMA.names}
        if "self" not in kinds or "req" not in kinds:
            return pa.table(out, schema=REPROJ_MID_SCHEMA)
        j_self = kinds.index("self")
        stx = int(g.column("tx")[j_self].as_py())
        sty = int(g.column("ty")[j_self].as_py())
        canvas = pack.from_bytes(
            zlib.decompress(g.column("v")[j_self].as_py()), sc, sc)
        mask = np.frombuffer(
            zlib.decompress(g.column("m")[j_self].as_py()),
            np.uint8).reshape(sc, sc).astype(bool)
        v = _vsum(canvas, pack)
        tc0, _, tr0, _ = src_grid.tile_pixel_window(stx, sty)
        for j, kind in enumerate(kinds):
            if kind != "req":
                continue
            rs0 = int(g.column("rs0")[j].as_py())
            cs0 = int(g.column("cs0")[j].as_py())
            h = int(g.column("h")[j].as_py())
            w = int(g.column("w")[j].as_py())
            # clip the request to this tile's window
            r0 = max(rs0, tr0)
            c0 = max(cs0, tc0)
            r1 = min(rs0 + h, tr0 + sc)
            c1 = min(cs0 + w, tc0 + sc)
            if r1 <= r0 or c1 <= c0:
                continue
            vw = np.ascontiguousarray(v[r0 - tr0:r1 - tr0,
                                        c0 - tc0:c1 - tc0])
            mw = np.ascontiguousarray(mask[r0 - tr0:r1 - tr0,
                                           c0 - tc0:c1 - tc0])
            dtx = int(g.column("tx")[j].as_py())
            dty = int(g.column("ty")[j].as_py())
            out["key"].append(f"{dtx}-{dty}")
            out["tx"].append(dtx)
            out["ty"].append(dty)
            out["kind"].append("frag")
            out["rs0"].append(r0)
            out["cs0"].append(c0)
            out["h"].append(r1 - r0)
            out["w"].append(c1 - c0)
            out["v"].append(zlib.compress(vw.tobytes(), 1))
            out["m"].append(zlib.compress(
                mw.astype(np.uint8).tobytes(), 1))
        return pa.table(out, schema=REPROJ_MID_SCHEMA)

    OUT_SCHEMA = pa.schema([
        ("tile_id", pa.string()), ("tx", pa.int64()), ("ty", pa.int64()),
        ("n_px", pa.int64()), ("v_sum", pa.int64()),
    ])

    def assemble(g: pa.Table) -> pa.Table:
        dtx = int(g.column("tx")[0].as_py())
        dty = int(g.column("ty")[0].as_py())
        rs, cs = _dst_to_src_px(dst_grid, src_grid, dtx, dty)
        val = np.zeros(rs.shape, np.int64)
        ok = np.zeros(rs.shape, bool)
        for j in range(len(g)):
            rs0 = int(g.column("rs0")[j].as_py())
            cs0 = int(g.column("cs0")[j].as_py())
            h = int(g.column("h")[j].as_py())
            w = int(g.column("w")[j].as_py())
            vw = np.frombuffer(zlib.decompress(g.column("v")[j].as_py()),
                               np.int64).reshape(h, w)
            mw = np.frombuffer(zlib.decompress(g.column("m")[j].as_py()),
                               np.uint8).reshape(h, w).astype(bool)
            sel = ((rs >= rs0) & (rs < rs0 + h)
                   & (cs >= cs0) & (cs < cs0 + w))
            if not sel.any():
                continue
            rr = rs[sel] - rs0
            cc2 = cs[sel] - cs0
            val[sel] = np.where(mw[rr, cc2], vw[rr, cc2], val[sel])
            ok[sel] |= mw[rr, cc2]
        if not ok.any():
            return pa.table({f.name: pa.array([], f.type)
                             for f in OUT_SCHEMA})
        return pa.table({
            "tile_id": pa.array([f"{dtx}-{dty}"], pa.string()),
            "tx": pa.array([dtx], pa.int64()),
            "ty": pa.array([dty], pa.int64()),
            "n_px": pa.array([int(ok.sum())], pa.int64()),
            "v_sum": pa.array([int(val[ok].sum())], pa.int64()),
        }, schema=OUT_SCHEMA)

    dst_tiles = rd.from_items([
        {"dtx": tx, "dty": ty}
        for ty in range(dst_grid.n_ty) for tx in range(dst_grid.n_tx)
    ])
    req = dst_tiles.map_batches(requests, batch_format="pyarrow",
                                batch_size=16)
    src = tiles_ds.select_columns(["tx", "ty", "px_z", "mask_z"]) \
        .map_batches(src_rows, batch_format="pyarrow", batch_size=64)
    frags = (req.union(src).groupby("key")
             .map_groups(serve, batch_format="pyarrow"))
    return frags.groupby("key").map_groups(assemble,
                                           batch_format="pyarrow")


# ---- GLCM texture moments (horizontal co-occurrence histogram) --------------

GLCM_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("kind", pa.string()),   # 'hist' | 'edge_e' | 'halo_e'
    ("key", pa.int64()),     # hist: (va << 16) | vb packed pair value
    ("cnt", pa.int64()),
    ("v", pa.binary()),      # strips: int64 column values
    ("m", pa.binary()),      # strips: uint8 column validity
])


def glcm_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
               num_buckets: int | None = None):
    """Gray-level co-occurrence matrix moments at offset (+1, 0) — the
    Haralick texture summary (contrast / energy / homogeneity) over the
    mosaic: each ORDERED horizontal pair of valid pixels (left v_a, right
    v_b) is one co-occurrence; the GLCM is the global (v_a, v_b) count
    histogram and the output is its scalar moments. Unlike the
    semivariogram (which folds (v_a − v_b)² map-side), ENERGY = Σ cnt² is
    quadratic in the GLOBAL cell counts, so the histogram itself must
    fold before any squaring — the distributed shape is a bounded-domain
    pair-histogram fold (the ``mosaic_histogram`` discipline squared):
    per-tile packed-key partials, one coarse-bucket fold bounded by the
    value domain (≤ 766² cells for RGB sums), then a pure map computes
    per-cell contributions and ONE Sum aggregate finishes. Homogeneity is
    the exact integer Σ floor(cnt·10⁶ / (1 + (v_a − v_b)²)).

    Cross-tile pairs ride the variogram's 1-px strip exchange: each tile
    keys its LAST column to itself and ships its FIRST column west;
    straddle pairs fold into the same histogram. Output: ONE row
    ``(n_pairs, contrast, energy, homog_q6)``.
    """
    from ray.data.aggregate import Sum

    from ..util import bucketed_fold

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def emit(t: pa.Table) -> pa.Table:
        # hist rows build as whole arrays (a tile can own thousands of
        # cells — per-entry Python appends were the stage's hot loop)
        tid_h: list = []
        key_h: list = []
        cnt_h: list = []
        tid_s, kind_s, v_s, m_s = [], [], [], []

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        c = chunk
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            me = f"{tx}-{ty}"
            both = mask[:, :-1] & mask[:, 1:]
            va = v[:, :-1][both].astype(np.int64)
            vb = v[:, 1:][both].astype(np.int64)
            keys, cnts = np.unique((va << 16) | vb, return_counts=True)
            tid_h.append(np.full(len(keys), me, dtype=object))
            key_h.append(keys)
            cnt_h.append(cnts.astype(np.int64))
            tid_s.append(me)
            kind_s.append("edge_e")
            v_s.append(np.ascontiguousarray(v[:, -1])
                       .astype(np.int64).tobytes())
            m_s.append(np.ascontiguousarray(mask[:, -1])
                       .astype(np.uint8).tobytes())
            if tx > 0:
                tid_s.append(f"{tx - 1}-{ty}")
                kind_s.append("halo_e")
                v_s.append(np.ascontiguousarray(v[:, 0])
                           .astype(np.int64).tobytes())
                m_s.append(np.ascontiguousarray(mask[:, 0])
                           .astype(np.uint8).tobytes())
        kh = (np.concatenate(key_h) if key_h
              else np.array([], np.int64))
        n_h = len(kh)
        return pa.table({
            "tile_id": pa.array(
                (np.concatenate(tid_h).tolist() if tid_h else [])
                + tid_s, pa.string()),
            "kind": pa.array(["hist"] * n_h + kind_s, pa.string()),
            "key": pa.array(np.concatenate(
                [kh, np.zeros(len(tid_s), np.int64)]), pa.int64()),
            "cnt": pa.array(np.concatenate(
                [(np.concatenate(cnt_h) if cnt_h
                  else np.array([], np.int64)),
                 np.zeros(len(tid_s), np.int64)]), pa.int64()),
            "v": pa.array([b""] * n_h + v_s, pa.binary()),
            "m": pa.array([b""] * n_h + m_s, pa.binary()),
        }, schema=GLCM_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64).materialize()
    # hist rows (the volume) go STRAIGHT to the bucket fold; only the
    # O(perimeter) strips take the per-tile keyed exchange
    hists = partials.filter(expr="kind == 'hist'") \
        .select_columns(["key", "cnt"])
    strips_ds = partials.filter(expr="kind != 'hist'")

    def merge(g: pa.Table) -> pa.Table:
        kinds = np.asarray(g.column("kind").to_pylist())
        strips: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for j in range(len(kinds)):
            vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
            ms = np.frombuffer(g.column("m")[j].as_py(),
                               np.uint8).astype(bool)
            strips[str(kinds[j])] = (vs, ms)
        if "edge_e" not in strips or "halo_e" not in strips:
            return pa.table({"key": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        ev, em = strips["edge_e"]
        hv, hm = strips["halo_e"]
        both = em & hm
        keys, cnts = np.unique((ev[both] << 16) | hv[both],
                               return_counts=True)
        return pa.table({"key": pa.array(keys.astype(np.int64),
                                         pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64),
                                         pa.int64())})

    straddle = strips_ds.groupby("tile_id").map_groups(
        merge, batch_format="pyarrow")
    per_tile = hists.union(straddle)

    # global (va, vb) cell counts: coarse-bucket fold bounded by the
    # value domain, never a per-key sort-groupby
    def cell_fold(g):
        import pandas as pd
        return (g.groupby("key", sort=False)["cnt"].sum().reset_index()
                .astype(np.int64))

    cells = bucketed_fold(per_tile, "key", cell_fold,
                          num_buckets=num_buckets)

    def moments(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy().astype(np.int64)
        cnt = t.column("cnt").to_numpy().astype(np.int64)
        va = key >> 16
        vb = key & 0xFFFF
        d2 = (va - vb) ** 2
        return pa.table({
            "n_pairs": pa.array([int(cnt.sum())], pa.int64()),
            "contrast": pa.array([int((d2 * cnt).sum())], pa.int64()),
            "energy": pa.array([int((cnt * cnt).sum())], pa.int64()),
            "homog_q6": pa.array([int((cnt * 1_000_000 // (1 + d2)).sum())],
                                 pa.int64()),
        })

    agg = (cells.map_batches(moments, batch_format="pyarrow")
           .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                      Sum("contrast", alias_name="contrast"),
                      Sum("energy", alias_name="energy"),
                      Sum("homog_q6", alias_name="homog_q6")))
    # Dataset.aggregate returns a DICT — single-row results re-wrap
    return pa.table({k: pa.array([int(agg[k] or 0)], pa.int64())
                     for k in ("n_pairs", "contrast", "energy",
                               "homog_q6")})


def tpi_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
              threshold: int = 10):
    """Topographic Position Index class counts per tile (Weiss 2001):
    for every valid pixel with >=1 valid 8-neighbor, compare its value
    to its neighborhood mean by exact integer cross-multiplication —
    ridge iff ``v·nn − Σnbrs > threshold·nn``, valley iff
    ``< −threshold·nn`` (nn = valid-neighbor count; no division, no
    float). Output (tile_id, tx, ty, n_px, n_ridge, n_valley); flats =
    n_px − n_ridge − n_valley. Same ring exchange as curvature/TRI."""

    def reduce_fn(P, M):
        S, C = _shift_stack(P, M)
        center_v, center_m = S[4], C[4]
        nn = np.zeros(center_v.shape, np.int64)
        ns = np.zeros(center_v.shape, np.int64)
        for i in range(9):
            if i == 4:
                continue
            vn = C[i] & center_m
            nn += vn
            ns += np.where(vn, S[i], 0)
        sel = center_m & (nn > 0)
        t = center_v * nn - ns
        ridge = (sel & (t > threshold * nn)).astype(np.int64)
        valley = (sel & (t < -threshold * nn)).astype(np.int64)
        return sel, ridge, valley

    return ring_focal_stats(tiles_ds, grid, reduce_fn, pack,
                            names=("n_px", "n_ridge", "n_valley"))


def tri_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
              threshold: int = 15):
    """Terrain Ruggedness Index per tile (Riley et al. 1999, integer
    form): every valid pixel with >=1 valid 8-neighbor contributes
    ``tri_c = Σ |v - v_n|`` over its valid neighbors; the tile reports
    ``tri_sum = Σ tri_c`` and the rugged-cell count where the per-cell
    mean absolute difference exceeds ``threshold`` by exact integer
    cross-multiplication (``tri_c > threshold·nn`` — no division, no
    float; the TPI discipline). Output (tile_id, tx, ty, n_px, tri_sum,
    n_rugged). Same O(perimeter) ring exchange as curvature/TPI
    (``ring_focal_stats``); oracle = the plane-dump shift-equi-join in
    SQL."""

    def reduce_fn(P, M):
        S, C = _shift_stack(P, M)
        cv, cm = S[4], C[4]
        nn = np.zeros(cv.shape, np.int64)
        tri = np.zeros(cv.shape, np.int64)
        for i in range(9):
            if i == 4:
                continue
            vn = C[i] & cm
            nn += vn
            tri += np.where(vn, np.abs(S[i] - cv), 0)
        sel = cm & (nn > 0)
        rug = (sel & (tri > threshold * nn)).astype(np.int64)
        return sel, np.where(sel, tri, 0), rug

    return ring_focal_stats(tiles_ds, grid, reduce_fn, pack,
                            names=("n_px", "tri_sum", "n_rugged"))


def _lbp_codes(V: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Per interior position of a padded (h+2, w+2) frame: the 8-bit
    Local Binary Pattern code (bit i set iff neighbor_i >= center, bits
    in row-major neighbor order), -1 where the center or ANY of its 8
    neighbors is invalid (classic LBP needs the full ring)."""
    h, w = V.shape[0] - 2, V.shape[1] - 2
    vc = V[1:1 + h, 1:1 + w]
    mc = M[1:1 + h, 1:1 + w]
    code = np.zeros((h, w), np.int64)
    allv = mc.copy()
    bit = 0
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            vn = V[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
            mn = M[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
            allv &= mn
            code += (np.int64(1) << bit) * (vn >= vc)
            bit += 1
    return np.where(allv, code, np.int64(-1))


def lbp_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile Local Binary Pattern texture histogram (Ojala et al.
    2002) — the texture fingerprint used to stratify/filter imagery in
    training-data curation (flat vs edge vs speckle regions). A pixel
    participates iff its FULL 8-neighborhood is valid; its 8-bit code
    sets bit i when neighbor_i >= center (row-major neighbor order).

    Exactly the ``flowdir_stats`` exchange with a different pure kernel:
    interior codes fold map-side into a 256-bin histogram; the tile's
    outer-2 ring stays keyed to itself, 1-px strips + corner pixels ship
    to the 8 neighbors, and the keyed merge re-derives only the border
    ring — O(perimeter) shuffle, never a canvas. Output: one row per
    (tile, lbp code) with n_px > 0. Oracle: the plane-dump
    shift-then-equi-join with CASE bit weights.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def _hist256(codes: np.ndarray) -> np.ndarray:
        sel = codes[codes >= 0]
        return np.bincount(sel, minlength=256).astype(np.int64)

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in FLOW_PARTIAL_SCHEMA.names}

        def row(tile, kind, hist=b"", v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["hist"].append(hist)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]),
                                     chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk,
                                                   chunk).astype(bool)
            v = _vsum(canvas, pack)
            tx, ty = int(txs[j]), int(tys[j])
            interior = _lbp_codes(v, mask)
            row((tx, ty), "self", hist=_hist256(interior).tobytes())

            def strip(vs, ms):
                return vs.astype(np.int64).tobytes(), \
                    ms.astype(np.uint8).tobytes()

            for kind, vs, ms in (
                ("ring_n", v[0:2, :], mask[0:2, :]),
                ("ring_s", v[-2:, :], mask[-2:, :]),
                ("ring_w", v[:, 0:2], mask[:, 0:2]),
                ("ring_e", v[:, -2:], mask[:, -2:]),
            ):
                b, m = strip(vs, ms)
                row((tx, ty), kind, v=b, m=m)
            sends = [((tx - 1, ty), "nbr_e", v[:, 0], mask[:, 0]),
                     ((tx + 1, ty), "nbr_w", v[:, -1], mask[:, -1]),
                     ((tx, ty - 1), "nbr_s", v[0, :], mask[0, :]),
                     ((tx, ty + 1), "nbr_n", v[-1, :], mask[-1, :]),
                     ((tx - 1, ty - 1), "nbr_se_c", v[0:1, 0],
                      mask[0:1, 0]),
                     ((tx + 1, ty - 1), "nbr_sw_c", v[0:1, -1],
                      mask[0:1, -1]),
                     ((tx - 1, ty + 1), "nbr_ne_c", v[-1:, 0],
                      mask[-1:, 0]),
                     ((tx + 1, ty + 1), "nbr_nw_c", v[-1:, -1],
                      mask[-1:, -1])]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b, m = strip(np.ascontiguousarray(vs),
                                 np.ascontiguousarray(ms))
                    row((ntx, nty), kind, v=b, m=m)
        return pa.table(out, schema=FLOW_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "ring_n":
            P[1:3, 1:c + 1] = vs.reshape(2, c)
            M[1:3, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_s":
            P[c - 1:c + 1, 1:c + 1] = vs.reshape(2, c)
            M[c - 1:c + 1, 1:c + 1] = ms.reshape(2, c)
        elif kind == "ring_w":
            P[1:c + 1, 1:3] = vs.reshape(c, 2)
            M[1:c + 1, 1:3] = ms.reshape(c, 2)
        elif kind == "ring_e":
            P[1:c + 1, c - 1:c + 1] = vs.reshape(c, 2)
            M[1:c + 1, c - 1:c + 1] = ms.reshape(c, 2)
        elif kind == "nbr_n":
            P[0, 1:c + 1], M[0, 1:c + 1] = vs, ms
        elif kind == "nbr_s":
            P[c + 1, 1:c + 1], M[c + 1, 1:c + 1] = vs, ms
        elif kind == "nbr_w":
            P[1:c + 1, 0], M[1:c + 1, 0] = vs, ms
        elif kind == "nbr_e":
            P[1:c + 1, c + 1], M[1:c + 1, c + 1] = vs, ms
        elif kind == "nbr_nw_c":
            P[0, 0], M[0, 0] = vs[0], ms[0]
        elif kind == "nbr_ne_c":
            P[0, c + 1], M[0, c + 1] = vs[0], ms[0]
        elif kind == "nbr_sw_c":
            P[c + 1, 0], M[c + 1, 0] = vs[0], ms[0]
        elif kind == "nbr_se_c":
            P[c + 1, c + 1], M[c + 1, c + 1] = vs[0], ms[0]

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        empty = pa.table({"tile_id": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "lbp": pa.array([], pa.int64()),
                          "n_px": pa.array([], pa.int64())})
        if "self" not in kinds:
            return empty
        c = chunk
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        hist = np.zeros(256, np.int64)
        for j, kind in enumerate(kinds):
            if kind == "self":
                hist += np.frombuffer(g.column("hist")[j].as_py(),
                                      np.int64)
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        codes = _lbp_codes(P, M)
        border = np.zeros((c, c), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        hist += _hist256(np.where(border, codes, np.int64(-1)))
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        nz = np.nonzero(hist)[0]
        if not len(nz):
            return empty
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"] * len(nz), pa.string()),
            "tx": pa.array([tx] * len(nz), pa.int64()),
            "ty": pa.array([ty] * len(nz), pa.int64()),
            "lbp": pa.array(nz.astype(np.int64), pa.int64()),
            "n_px": pa.array(hist[nz], pa.int64()),
        })

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")
