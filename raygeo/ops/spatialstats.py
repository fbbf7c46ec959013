"""Spatial-statistics raster ops over mosaic tiles: Moran's-I moments,
marching-squares contour cases, Otsu threshold table, IDW interpolation,
and D8 flow-path length (the iterative pointer-doubling op).

All five consume the ingest pipeline's tile rows (tile_id/tx/ty +
compressed px_z/mask_z canvases — ``ops/ingest.py`` layout) on the shared
per-pixel scalar v = channel sum (``stencil._vsum``; reference analog:
band statistics over the loaded cube window, ``core/accessor.py`` load →
xarray reductions).

Verification strategy: morans/contours/otsu/idw have REAL DuckDB oracles
over the generation-time ``plane_pixels.parquet`` dump (the independent
serial LWW paint), so the driver recomputes the statistic from scratch in
SQL; flowlen's all-pairs path chase is not ANSI-SQL-expressible at raster
scale and checks against ``fixtures._golden_flowlen`` (the serial
pointer-doubling paint), like flowdir/distance.

Scale notes (the 100 TB bar):

- morans / contours: the gradient/dilate halo discipline — interior
  folds MAP-SIDE, only O(perimeter) strips cross tiles, never a canvas.
- otsu: rides ``zonal.mosaic_histogram`` (shuffle bounded by the value
  domain, not the raster); the 765-row criterion table is driver-side
  integer math on a dimension-sized input.
- idw: the probe table is dimension-sized and broadcasts; each tile
  contributes (Σw, Σwv) partials for the probes whose radius box
  intersects it — zero raster bytes shuffle.
- flowlen: ONE keyed exchange carries each compressed canvas exactly
  once (+ O(perimeter) halos) — path routing needs the full tile code
  plane, unlike purely focal ops; the cross-tile phase then runs on the
  O(perimeter) border-node graph via pointer doubling in O(log path)
  bucketed self-join rounds. Path length is bounded by the value domain
  (v strictly decreases every hop), so rounds ≤ ceil(log2(765)) = 10.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..channels import RGB_CHANNELS, ChannelPack
from ..grid import GridSpec
from .stencil import _D8, _flowdir_codes, _vsum

# ---------------------------------------------------------------- Moran's I

MORANS_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'self' | 'edge_e' | 'edge_s' | 'halo_e' | 'halo_s'
    ("stats", pa.binary()),  # 6 x int64: n_px v_sum v2_sum w_pairs vv vpv
    ("v", pa.binary()),
    ("m", pa.binary()),
])


def morans_moments(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-tile integer moments of global Moran's-I spatial
    autocorrelation under rook (4-neighbor) contiguity.

    Global Moran's I assembles exactly from per-tile integer moments::

        I = (n / W) * Σ_pairs (v_i - μ)(v_j - μ) / Σ_i (v_i - μ)²

    expands over (n_px, v_sum, v2_sum, w_pairs, vv_sum, vpv_sum) — so the
    Dataset returns those six moments per tile (a pair belongs to its
    left/top pixel's tile, both pixels valid) and the scalar assembles
    from 6 tiny sums. All moments are int64-safe: v ≤ 765 (or the 1e-3
    fixed-point float quantization), pairs per tile ≤ 2·chunk².

    Same exchange as ``stencil.gradient_stats``: interior pairs and the
    self moments fold MAP-SIDE; only the first/last row/column strips
    cross tiles. Output: (tile_id, tx, ty, n_px, v_sum, v2_sum, w_pairs,
    vv_sum, vpv_sum), one row per tile with ≥1 valid pixel.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in MORANS_PARTIAL_SCHEMA.names}

        def row(tile, kind, stats=b"", v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["stats"].append(stats)
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
            sel = v[mask]
            if len(sel) == 0:
                continue
            bh = mask[:, :-1] & mask[:, 1:]
            bv = mask[:-1, :] & mask[1:, :]
            a_h, b_h = v[:, :-1][bh], v[:, 1:][bh]
            a_v, b_v = v[:-1, :][bv], v[1:, :][bv]
            stats = np.array([
                len(sel), int(sel.sum()), int((sel * sel).sum()),
                int(bh.sum()) + int(bv.sum()),
                int((a_h * b_h).sum()) + int((a_v * b_v).sum()),
                int((a_h + b_h).sum()) + int((a_v + b_v).sum()),
            ], np.int64)
            row((tx, ty), "self", stats=stats.tobytes())
            row((tx, ty), "edge_e", v=v[:, -1].tobytes(),
                m=mask[:, -1].astype(np.uint8).tobytes())
            row((tx, ty), "edge_s", v=v[-1, :].tobytes(),
                m=mask[-1, :].astype(np.uint8).tobytes())
            if tx > 0:
                row((tx - 1, ty), "halo_e", v=v[:, 0].tobytes(),
                    m=mask[:, 0].astype(np.uint8).tobytes())
            if ty > 0:
                row((tx, ty - 1), "halo_s", v=v[0, :].tobytes(),
                    m=mask[0, :].astype(np.uint8).tobytes())
        return pa.table(out, schema=MORANS_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)
    names = ["n_px", "v_sum", "v2_sum", "w_pairs", "vv_sum", "vpv_sum"]

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        empty = pa.table({"tile_id": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          **{k: pa.array([], pa.int64()) for k in names}})
        if "self" not in kinds:
            return empty
        acc = np.zeros(6, np.int64)
        strips: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for j, kind in enumerate(kinds):
            if kind == "self":
                acc += np.frombuffer(g.column("stats")[j].as_py(), np.int64)
            else:
                strips[kind] = (
                    np.frombuffer(g.column("v")[j].as_py(), np.int64),
                    np.frombuffer(g.column("m")[j].as_py(),
                                  np.uint8).astype(bool))
        for edge, halo in (("edge_e", "halo_e"), ("edge_s", "halo_s")):
            if edge in strips and halo in strips:
                ev, em = strips[edge]
                hv, hm = strips[halo]
                both = em & hm
                a, b = ev[both], hv[both]
                acc[3] += int(both.sum())
                acc[4] += int((a * b).sum())
                acc[5] += int((a + b).sum())
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        cols = {"tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
                "tx": pa.array([tx], pa.int64()),
                "ty": pa.array([ty], pa.int64())}
        for k, val in zip(names, acc):
            cols[k] = pa.array([int(val)], pa.int64())
        return pa.table(cols)

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


# -------------------------------------------- marching-squares contour cases

CONTOUR_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    # 'self' | 'edge_e' | 'edge_s' | 'halo_e' | 'halo_s' | 'halo_se'
    ("kind", pa.string()),
    ("hist", pa.binary()),   # 16 x int64 case histogram (self rows)
    ("v", pa.binary()),
    ("m", pa.binary()),
])


def _case_codes(a, b, c, d, iso: int) -> np.ndarray:
    """Marching-squares 4-bit case per 2x2 block: bit0=TL(a), bit1=TR(b),
    bit2=BR(c), bit3=BL(d); a corner sets its bit when v >= iso."""
    return ((a >= iso).astype(np.int64)
            + 2 * (b >= iso).astype(np.int64)
            + 4 * (c >= iso).astype(np.int64)
            + 8 * (d >= iso).astype(np.int64))


def contour_cases(tiles_ds, grid: GridSpec, iso: int,
                  pack: ChannelPack | None = None):
    """Marching-squares case-code histogram per tile at iso-level ``iso``
    — the vectorizing step of raster contouring (each 2x2 pixel block
    classifies into one of 16 crossing topologies; the contour polylines
    are a pure function of the case plane).

    A block counts when ALL FOUR pixels are valid and belongs to its
    top-left pixel's tile. Interior blocks fold MAP-SIDE; the blocks on a
    tile's east/south border need the neighbor's first column/row plus
    the SE-diagonal corner pixel — O(perimeter) strips, never a canvas.
    Output: (tile_id, tx, ty, case_code, n_blocks), nonzero cases only.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in CONTOUR_PARTIAL_SCHEMA.names}

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
            ok = (mask[:-1, :-1] & mask[:-1, 1:]
                  & mask[1:, 1:] & mask[1:, :-1])
            codes = _case_codes(v[:-1, :-1], v[:-1, 1:], v[1:, 1:],
                                v[1:, :-1], iso)
            hist = np.bincount(codes[ok], minlength=16).astype(np.int64)
            row((tx, ty), "self", hist=hist.tobytes())
            row((tx, ty), "edge_e", v=v[:, -1].tobytes(),
                m=mask[:, -1].astype(np.uint8).tobytes())
            row((tx, ty), "edge_s", v=v[-1, :].tobytes(),
                m=mask[-1, :].astype(np.uint8).tobytes())
            if tx > 0:
                row((tx - 1, ty), "halo_e", v=v[:, 0].tobytes(),
                    m=mask[:, 0].astype(np.uint8).tobytes())
            if ty > 0:
                row((tx, ty - 1), "halo_s", v=v[0, :].tobytes(),
                    m=mask[0, :].astype(np.uint8).tobytes())
            if tx > 0 and ty > 0:
                row((tx - 1, ty - 1), "halo_se", v=v[0:1, 0].tobytes(),
                    m=mask[0:1, 0].astype(np.uint8).tobytes())
        return pa.table(out, schema=CONTOUR_PARTIAL_SCHEMA)

    partials = tiles_ds.map_batches(emit, batch_format="pyarrow",
                                    batch_size=64)

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        empty = pa.table({"tile_id": pa.array([], pa.string()),
                          "tx": pa.array([], pa.int64()),
                          "ty": pa.array([], pa.int64()),
                          "case_code": pa.array([], pa.int64()),
                          "n_blocks": pa.array([], pa.int64())})
        if "self" not in kinds:
            return empty
        hist = np.zeros(16, np.int64)
        strips: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for j, kind in enumerate(kinds):
            if kind == "self":
                hist += np.frombuffer(g.column("hist")[j].as_py(), np.int64)
            else:
                strips[kind] = (
                    np.frombuffer(g.column("v")[j].as_py(), np.int64),
                    np.frombuffer(g.column("m")[j].as_py(),
                                  np.uint8).astype(bool))
        c = chunk

        def fold(a, am, b, bm, cc, cm, d, dm):
            ok = am & bm & cm & dm
            if ok.any():
                codes = _case_codes(a[ok], b[ok], cc[ok], d[ok], iso)
                np.add.at(hist, codes, 1)

        if "edge_e" in strips and "halo_e" in strips:
            ev, em = strips["edge_e"]
            hv, hm = strips["halo_e"]
            # blocks (r, c-1), r in 0..c-2: TL=own[r] TR=halo[r]
            # BR=halo[r+1] BL=own[r+1]
            fold(ev[:-1], em[:-1], hv[:-1], hm[:-1],
                 hv[1:], hm[1:], ev[1:], em[1:])
        if "edge_s" in strips and "halo_s" in strips:
            sv, sm = strips["edge_s"]
            hv, hm = strips["halo_s"]
            # blocks (c-1, x), x in 0..c-2: TL=own[x] TR=own[x+1]
            # BR=halo[x+1] BL=halo[x]
            fold(sv[:-1], sm[:-1], sv[1:], sm[1:],
                 hv[1:], hm[1:], hv[:-1], hm[:-1])
        if ("edge_e" in strips and "halo_e" in strips
                and "halo_s" in strips and "halo_se" in strips):
            ev, em = strips["edge_e"]
            hev, hem = strips["halo_e"]
            hsv, hsm = strips["halo_s"]
            cv, cm2 = strips["halo_se"]
            # corner block (c-1, c-1): TL=own(c-1,c-1) TR=E-col0[c-1]
            # BR=SE(0,0) BL=S-row0[c-1]
            fold(ev[c - 1:c], em[c - 1:c], hev[c - 1:c], hem[c - 1:c],
                 cv[0:1], cm2[0:1], hsv[c - 1:c], hsm[c - 1:c])
        occ = np.nonzero(hist)[0]
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"] * len(occ), pa.string()),
            "tx": pa.array([tx] * len(occ), pa.int64()),
            "ty": pa.array([ty] * len(occ), pa.int64()),
            "case_code": pa.array(occ.astype(np.int64), pa.int64()),
            "n_blocks": pa.array(hist[occ], pa.int64()),
        })

    return partials.groupby("tile_id").map_groups(merge,
                                                  batch_format="pyarrow")


# ----------------------------------------------------------- Otsu threshold

def otsu_table(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
               domain: tuple[int, int] = (0, 765)) -> pa.Table:
    """Exact integer Otsu criterion table over the mosaic value histogram
    — the automatic global-threshold op (binarize a band before
    morphology / components).

    For every candidate threshold t (class 0 = v ≤ t, class 1 = v > t)
    the between-class variance rewrites rationally::

        σ²_B(t) = (sum0·cnt1 - sum1·cnt0)² / (cnt0·cnt1 · n²)

    Dropping the constant n², the table reports the exact integer floor
    ``crit_q = (sum0·cnt1 - cnt0·sum1)² // (cnt0·cnt1)`` (Python big ints
    — the square overflows int64; the floor fits: ≤ (n/2)²·vmax² <
    2^63). ``is_otsu`` marks the argmax row, smaller t on ties — integer
    comparisons only, so DuckDB replays the whole table bit-for-bit.

    Plan: the distributed part IS ``zonal.mosaic_histogram`` (map-side
    bincount partials, shuffle bounded by the value domain); the
    criterion sweep is driver-side integer math over the ≤766-row
    histogram. Returns an Arrow table (t, cnt0, sum0, crit_q, is_otsu)
    for t in [domain[0], domain[1]).
    """
    from .zonal import mosaic_histogram

    hist = mosaic_histogram(tiles_ds, grid, pack).to_pandas()
    lo, hi = domain
    counts = np.zeros(hi - lo + 1, np.int64)
    if len(hist):
        vb = hist["v_bin"].to_numpy()
        if vb.min() < lo or vb.max() > hi:
            raise ValueError(f"histogram bins outside domain [{lo},{hi}]")
        counts[vb - lo] = hist["n_px"].to_numpy()
    n = int(counts.sum())
    s = int((counts * (np.arange(hi - lo + 1) + lo)).sum())
    ts, cnt0s, sum0s, crits = [], [], [], []
    c0, s0 = 0, 0
    for t in range(lo, hi):
        c0 += int(counts[t - lo])
        s0 += int(counts[t - lo]) * t
        c1 = n - c0
        if c0 > 0 and c1 > 0:
            num = s0 * c1 - (s - s0) * c0
            crit = (num * num) // (c0 * c1)
        else:
            crit = 0
        ts.append(t)
        cnt0s.append(c0)
        sum0s.append(s0)
        crits.append(crit)
    best = max(range(len(ts)), key=lambda i: (crits[i], -ts[i])) \
        if ts else -1
    return pa.table({
        "t": pa.array(ts, pa.int64()),
        "cnt0": pa.array(cnt0s, pa.int64()),
        "sum0": pa.array(sum0s, pa.int64()),
        "crit_q": pa.array(crits, pa.int64()),
        "is_otsu": pa.array([1 if i == best else 0
                             for i in range(len(ts))], pa.int64()),
    })


# ------------------------------------------------------- IDW interpolation

def idw_sample(tiles_ds, points: pa.Table, grid: GridSpec,
               pack: ChannelPack | None = None, radius: int = 12,
               q: int = 10**6):
    """Inverse-distance-weighted interpolation of the mosaic at vector
    points — the spatial-interpolation read (fill a sample's covariate
    from the surrounding raster, not just the one pixel under it).

    Exact integer weights over the (2·radius+1)² pixel box around the
    point's pixel: ``w = q // (1 + d²)`` with d² = Δrow² + Δcol² (floor
    division), estimate ``idw_q = Σ(w·v) // Σw``. Every step is integer,
    so a DuckDB range join over the plane dump replays it bit-for-bit.

    The point table is dimension-sized and broadcasts in the task
    closure; each tile computes (Σw, Σwv) partials for the points whose
    box intersects its window — ZERO raster bytes shuffle, one tiny
    keyed Sum reassembles each point. Points with no valid pixel in the
    box (or off-grid) are dropped, matching the SQL's WHERE w_sum > 0.
    Returns (zone_id, w_sum, wv_sum, idw_q).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

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
        out_i, out_w, out_wv = [], [], []
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            tc0, tr0 = tx * chunk, ty * chunk
            hit = np.nonzero(ok
                             & (col + radius >= tc0)
                             & (col - radius < tc0 + chunk)
                             & (row + radius >= tr0)
                             & (row - radius < tr0 + chunk))[0]
            if len(hit) == 0:
                continue
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            for i in hit:
                pr, pc = int(row[i]) - tr0, int(col[i]) - tc0
                r0, r1 = max(pr - radius, 0), min(pr + radius + 1, chunk)
                c0, c1 = max(pc - radius, 0), min(pc + radius + 1, chunk)
                sub_m = mask[r0:r1, c0:c1]
                if not sub_m.any():
                    continue
                dr = np.arange(r0, r1) - pr
                dc = np.arange(c0, c1) - pc
                d2 = dr[:, None] * dr[:, None] + dc[None, :] * dc[None, :]
                w = np.where(sub_m, q // (1 + d2), 0).astype(np.int64)
                out_i.append(pids[i])
                out_w.append(int(w.sum()))
                out_wv.append(int((w * v[r0:r1, c0:c1]).sum()))
        return pa.table({
            "zone_id": pa.array(out_i, pa.string()),
            "w_sum": pa.array(out_w, pa.int64()),
            "wv_sum": pa.array(out_wv, pa.int64()),
        })

    def finish(t: pa.Table) -> pa.Table:
        w = t.column("w_sum").to_numpy()
        wv = t.column("wv_sum").to_numpy()
        keep = w > 0
        return pa.table({
            "zone_id": t.column("zone_id").filter(pa.array(keep)),
            "w_sum": pa.array(w[keep], pa.int64()),
            "wv_sum": pa.array(wv[keep], pa.int64()),
            "idw_q": pa.array(wv[keep] // w[keep], pa.int64()),
        })

    partials = tiles_ds.map_batches(partial, batch_format="pyarrow",
                                    batch_size=64)
    return (partials.groupby("zone_id")
            .aggregate(Sum("w_sum", alias_name="w_sum"),
                       Sum("wv_sum", alias_name="wv_sum"))
            .map_batches(finish, batch_format="pyarrow"))


# ---------------------------------------------------- D8 flow-path length

FLOWLEN_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    # 'self' (canvas passthrough) | 'nbr_*' halo strips
    ("kind", pa.string()),
    ("v", pa.binary()),
    ("m", pa.binary()),
])

FLOWLEN_MID_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'stat' | 'node' | 'exit'
    ("node", pa.int64()),   # node/exit-target global id (row*width+col)
    ("nxt", pa.int64()),    # node continuation target; -1 = pit-resolved
    ("d", pa.int64()),      # node: steps to nxt | stat: n_pits
    ("n", pa.int64()),      # stat: n_px | exit: pixel count
    ("s", pa.int64()),      # stat: pit len_sum | exit: Σ steps-to-entry
    ("mx", pa.int64()),     # stat: pit max len | exit: max steps-to-entry
])

_D8_OFF = {k: (dr, dc) for k, dr, dc, _w in _D8}


def _chase(codes: np.ndarray, chunk: int, gy0: int, gx0: int, width: int):
    """In-tile pointer doubling over a tile's D8 code plane.

    Returns (ptr, d, tgt): per flattened tile cell, ptr = -1 (pit-resolved,
    d = full in-tile path length), -2 (exits the tile, d = steps up to and
    including the hop out, tgt = entered cell's global id), or -9 invalid.
    Rounds are log2 of the max path length, which the strictly-decreasing
    v bounds by the value domain."""
    c = chunk
    rr, cc = np.divmod(np.arange(c * c), c)
    code_f = codes.ravel()
    ptr = np.full(c * c, -9, np.int64)
    d = np.zeros(c * c, np.int64)
    tgt = np.full(c * c, -1, np.int64)
    ptr[code_f == 8] = -1
    for k, (dr, dc_) in _D8_OFF.items():
        sel = code_f == k
        if not sel.any():
            continue
        tr, tc = rr[sel] + dr, cc[sel] + dc_
        inside = (tr >= 0) & (tr < c) & (tc >= 0) & (tc < c)
        idx = np.nonzero(sel)[0]
        ptr[idx[inside]] = tr[inside] * c + tc[inside]
        d[idx] = 1
        out = idx[~inside]
        ptr[out] = -2
        tgt[out] = ((gy0 + tr[~inside]) * width + (gx0 + tc[~inside]))
    for _ in range(32):
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        d[act] += d[j]
        tgt[act] = np.where(ptr[j] == -2, tgt[j], tgt[act])
        ptr[act] = ptr[j]
    return ptr, d, tgt


def flowlen_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                  max_rounds: int = 16):
    """Per-tile D8 flow-path-length statistics — the ITERATIVE terrain op
    (how many steepest-descent hops until each pixel's flow reaches a
    pit), the routing sibling of ``stencil.flowdir_stats``.

    Exactness argument: v strictly decreases on every hop (the flowdir
    rule requires a strictly lower neighbor), so path length ≤ the value
    domain (765 for RGB) and the pointer-doubling recursion converges in
    ≤ ceil(log2(domain)) rounds at BOTH levels.

    Plan (two-level pointer doubling):

    1. ONE keyed exchange: each tile keys its own compressed canvas to
       itself (bytes pass through UNRECOMPRESSED) plus 1-px halo strips
       to its 8 neighbors. Per tile, the merge computes the D8 code
       plane (halo-exact borders) and chases every valid pixel IN-TILE
       via vectorized pointer doubling, emitting: per-tile 'stat' rows
       (pixels resolved to an in-tile pit), 'node' rows (the O(perimeter)
       border-ring cells' continuations), and 'exit' groups (interior
       pixels leaving toward a neighbor cell, grouped by entry cell).
    2. The cross-tile phase doubles over the border-node graph ONLY —
       O(perimeter/area) of the raster — via bucketed self-joins with a
       one-scalar-per-round convergence check (the CC/pagerank
       discipline: no driver-side graph).
    3. Exit groups join the resolved nodes (bucketed hash join) and a
       final keyed sum folds per-tile totals.

    Output: (tile_id, tx, ty, n_px, len_sum, max_len, n_pits) per tile
    with ≥1 valid pixel. Checked against ``fixtures._golden_flowlen`` —
    a serial full-plane pointer-doubling paint.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..util import auto_join_partitions

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    width = grid.width

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in FLOWLEN_PARTIAL_SCHEMA.names}

        def row(tile, kind, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            # canvas passthrough: already compressed, no re-encode
            row((tx, ty), "self", v=px_z[j], m=mask_z[j])
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)

            def strip(vs, ms):
                return vs.astype(np.int64).tobytes(), \
                    ms.astype(np.uint8).tobytes()

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
        return pa.table(out, schema=FLOWLEN_PARTIAL_SCHEMA)

    def _place(P, M, kind, vs, ms):
        c = chunk
        if kind == "nbr_n":
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

    def resolve_tile(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        out: dict[str, list] = {k: [] for k in FLOWLEN_MID_SCHEMA.names}
        if "self" not in kinds:
            return pa.table(out, schema=FLOWLEN_MID_SCHEMA)
        c = chunk
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        for j, kind in enumerate(kinds):
            if kind == "self":
                canvas = pack.from_bytes(
                    zlib.decompress(g.column("v")[j].as_py()), c, c)
                mask = np.frombuffer(
                    zlib.decompress(g.column("m")[j].as_py()),
                    np.uint8).reshape(c, c).astype(bool)
                P[1:c + 1, 1:c + 1] = _vsum(canvas, pack)
                M[1:c + 1, 1:c + 1] = mask
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        codes = _flowdir_codes(P, M)
        gy0, gx0 = ty * c, tx * c
        ptr, d, tgt = _chase(codes, c, gy0, gx0, width)
        valid = codes.ravel() >= 0
        if not valid.any():
            return pa.table(out, schema=FLOWLEN_MID_SCHEMA)

        def row(kind, node=-1, nxt=-1, dd=0, n=0, s=0, mx=0):
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["node"].append(int(node))
            out["nxt"].append(int(nxt))
            out["d"].append(int(dd))
            out["n"].append(int(n))
            out["s"].append(int(s))
            out["mx"].append(int(mx))

        pit_res = valid & (ptr == -1)
        n_pits = int((codes.ravel() == 8).sum())
        row("stat", dd=n_pits, n=int(valid.sum()),
            s=int(d[pit_res].sum()),
            mx=int(d[pit_res].max()) if pit_res.any() else 0)
        # exit groups: interior pixels leaving, keyed by entry cell
        ex = np.nonzero(valid & (ptr == -2))[0]
        if len(ex):
            et, ed = tgt[ex], d[ex]
            order = np.argsort(et, kind="stable")
            et, ed = et[order], ed[order]
            cut = np.ones(len(et), bool)
            cut[1:] = et[1:] != et[:-1]
            starts = np.nonzero(cut)[0]
            ends = np.append(starts[1:], len(et))
            for a, b in zip(starts, ends):
                row("exit", node=et[a], n=b - a,
                    s=int(ed[a:b].sum()), mx=int(ed[a:b].max()))
        # border-ring node continuations
        rr, cc2 = np.divmod(np.arange(c * c), c)
        ring = valid & ((rr == 0) | (rr == c - 1) | (cc2 == 0)
                        | (cc2 == c - 1))
        for i in np.nonzero(ring)[0]:
            nid = (gy0 + rr[i]) * width + (gx0 + cc2[i])
            row("node", node=nid,
                nxt=-1 if ptr[i] == -1 else tgt[i], dd=d[i])
        return pa.table(out, schema=FLOWLEN_MID_SCHEMA)

    mid = (tiles_ds.select_columns(["tile_id", "tx", "ty", "px_z", "mask_z"])
           .map_batches(emit, batch_format="pyarrow", batch_size=64)
           .groupby("tile_id").map_groups(resolve_tile,
                                          batch_format="pyarrow")
           # three consumers below (stat / node / exit splits) — one
           # materialization of the O(tiles + perimeter) mid table
           .materialize())

    stats = mid.filter(expr="kind == 'stat'")
    exits = (mid.filter(expr="kind == 'exit'")
             .select_columns(["tile_id", "tx", "ty", "node", "n", "s", "mx"])
             .materialize())
    nodes = (mid.filter(expr="kind == 'node'")
             .select_columns(["node", "nxt", "d"]).materialize())

    def stat_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx").cast(pa.int64()),
            "ty": t.column("ty").cast(pa.int64()),
            "n_px": t.column("n").cast(pa.int64()),
            "len_sum": t.column("s").cast(pa.int64()),
            "max_len": t.column("mx").cast(pa.int64()),
            "n_pits": t.column("d").cast(pa.int64()),
        })

    if nodes.count() == 0:
        # empty mosaic / no valid ring cells => no exits either
        return stats.map_batches(stat_rows, batch_format="pyarrow")
    nparts = auto_join_partitions(nodes, pools=1)

    # cross-tile pointer doubling over the border-node graph, bucketed
    # SPATIALLY: flow paths are local, so keying an unresolved node to
    # the bucket of its TARGET super-block lets the in-bucket fold chase
    # the whole chain while it stays inside the block (one searchsorted
    # per local hop) — most chains resolve in 1-2 global rounds instead
    # of the ceil(log2(765)) worst case, and each round is ONE execution
    # (map -> bucket exchange -> fold -> materialize) instead of the
    # previous four (filter-count + two keyed passes + union). Measured
    # 6.8 s -> see NOTES (sf0.1, 256 tiles).
    import math

    from ..util import cluster_cpus

    G = max(1, int(math.sqrt((n_tx * n_ty)
                             / max(1, 2 * cluster_cpus()))))
    nbx = (n_tx + G - 1) // G
    blk = chunk * G

    def sblock(node_arr: np.ndarray) -> np.ndarray:
        gy = node_arr // width
        gx = node_arr % width
        return ((gy // blk) * nbx + (gx // blk)).astype(np.int64)

    for _ in range(max_rounds):
        def key_both(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy()
            nxt = t.column("nxt").to_numpy()
            dd = t.column("d").to_numpy()
            un = nxt >= 0
            return pa.table({
                # side 1: EVERY node, keyed by its own super-block (the
                # bucket lut); side 0: unresolved nodes, keyed by the
                # TARGET super-block so the chase finds its lut entry
                "pk": pa.array(np.concatenate(
                    [sblock(node), sblock(nxt[un])]), pa.int64()),
                "side": pa.array(np.concatenate(
                    [np.ones(len(node), np.int8),
                     np.zeros(int(un.sum()), np.int8)]), pa.int8()),
                "node": pa.array(np.concatenate([node, node[un]]),
                                 pa.int64()),
                "nxt": pa.array(np.concatenate([nxt, nxt[un]]),
                                pa.int64()),
                "d": pa.array(np.concatenate([dd, dd[un]]), pa.int64()),
            })

        def chase(g: pa.Table) -> pa.Table:
            side = g.column("side").to_numpy()
            nd = g.column("node").to_numpy()
            nx = g.column("nxt").to_numpy()
            dd = g.column("d").to_numpy()
            b = side == 1
            lut_n, lut_x, lut_d = nd[b], nx[b], dd[b]
            order = np.argsort(lut_n, kind="stable")
            lut_n, lut_x, lut_d = lut_n[order], lut_x[order], lut_d[order]
            pk = int(g.column("pk")[0].as_py())
            a = np.nonzero(side == 0)[0]
            # resolved lut rows pass through (each node emits exactly one
            # side-1 row, so output = resolved side-1 + chased side-0
            # covers every node exactly once)
            done_b = b & (nx < 0)
            cur_n, cur_x, cur_d = nd[a], nx[a], dd[a]
            live = np.ones(len(a), bool)
            # chain hops strictly decrease v (<=765 per block) — bound
            # the local chase defensively
            for _hop in range(1024):
                if not live.any():
                    break
                li = np.nonzero(live)[0]
                pos = np.searchsorted(lut_n, cur_x[li])
                # the target super-block owns every node it contains, so
                # an in-bucket target is always in the lut
                if (pos >= len(lut_n)).any() or \
                        not (lut_n[pos] == cur_x[li]).all():
                    raise RuntimeError(
                        "flowlen: dangling border-node target")
                cur_d[li] = cur_d[li] + lut_d[pos]
                cur_x[li] = lut_x[pos]
                nxv = cur_x[li]
                still = (nxv >= 0) & (sblock(np.maximum(nxv, 0)) == pk)
                live[li] = still
            else:
                raise RuntimeError("flowlen: local chase did not converge")
            return pa.table({
                "node": pa.array(np.concatenate([nd[done_b], cur_n]),
                                 pa.int64()),
                "nxt": pa.array(np.concatenate([nx[done_b], cur_x]),
                                pa.int64()),
                "d": pa.array(np.concatenate([dd[done_b], cur_d]),
                              pa.int64()),
            })

        nodes = (nodes.map_batches(key_both, batch_format="pyarrow")
                 .groupby("pk").map_groups(chase, batch_format="pyarrow")
                 .materialize())
        if int(nodes.filter(expr="nxt >= 0").count()) == 0:
            break
    else:
        raise RuntimeError("flowlen: pointer doubling did not converge")

    # join exit groups to resolved node lengths (bucketed hash join)
    def key_exit(t: pa.Table) -> pa.Table:
        return pa.table({
            "pk": pa.array((t.column("node").to_numpy() % nparts)
                           .astype(np.int32), pa.int32()),
            "side": pa.array(np.zeros(len(t), np.int8), pa.int8()),
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx").cast(pa.int64()),
            "ty": t.column("ty").cast(pa.int64()),
            "node": t.column("node"),
            "n": t.column("n"),
            "s": t.column("s"),
            "mx": t.column("mx"),
        })

    def key_len(t: pa.Table) -> pa.Table:
        z = pa.array([""] * len(t), pa.string())
        zero = pa.array(np.zeros(len(t), np.int64), pa.int64())
        return pa.table({
            "pk": pa.array((t.column("node").to_numpy() % nparts)
                           .astype(np.int32), pa.int32()),
            "side": pa.array(np.ones(len(t), np.int8), pa.int8()),
            "tile_id": z, "tx": zero, "ty": zero,
            "node": t.column("node"),
            "n": zero, "s": t.column("d"), "mx": zero,
        })

    def attach(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        node = g.column("node").to_numpy()
        b = side == 1
        lut_n = node[b]
        lut_l = g.column("s").to_numpy()[b]
        order = np.argsort(lut_n, kind="stable")
        lut_n, lut_l = lut_n[order], lut_l[order]
        a = np.nonzero(side == 0)[0]
        cols = {"tile_id": [], "tx": [], "ty": [], "n_px": [],
                "len_sum": [], "max_len": [], "n_pits": []}
        if len(a) == 0:
            return pa.table({k: pa.array(v, pa.string() if k == "tile_id"
                                         else pa.int64())
                             for k, v in cols.items()})
        pos = np.searchsorted(lut_n, node[a])
        if not (lut_n[pos] == node[a]).all():
            raise RuntimeError("flowlen: exit target missing a length")
        ll = lut_l[pos]
        n = g.column("n").to_numpy()[a]
        s = g.column("s").to_numpy()[a]
        mx = g.column("mx").to_numpy()[a]
        tids = g.column("tile_id").to_pylist()
        return pa.table({
            "tile_id": pa.array([tids[i] for i in a], pa.string()),
            "tx": pa.array(g.column("tx").to_numpy()[a], pa.int64()),
            "ty": pa.array(g.column("ty").to_numpy()[a], pa.int64()),
            "n_px": pa.array(np.zeros(len(a), np.int64), pa.int64()),
            "len_sum": pa.array(s + n * ll, pa.int64()),
            "max_len": pa.array(mx + ll, pa.int64()),
            "n_pits": pa.array(np.zeros(len(a), np.int64), pa.int64()),
        })

    exit_contrib = (exits.map_batches(key_exit, batch_format="pyarrow")
                    .union(nodes.map_batches(key_len,
                                             batch_format="pyarrow"))
                    .groupby("pk").map_groups(attach,
                                              batch_format="pyarrow"))

    return (stats.map_batches(stat_rows, batch_format="pyarrow")
            .union(exit_contrib)
            .groupby("tile_id")
            .aggregate(Max("tx", alias_name="tx"),
                       Max("ty", alias_name="ty"),
                       Sum("n_px", alias_name="n_px"),
                       Sum("len_sum", alias_name="len_sum"),
                       Max("max_len", alias_name="max_len"),
                       Sum("n_pits", alias_name="n_pits")))


# ---- D8 flow accumulation (upstream contributing cells) ---------------------

FLOWACC_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'self' | 'nbr_*' halo strips
    ("v", pa.binary()),
    ("m", pa.binary()),
])

FLOWACC_MID_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'vis' (int64 plane) | 'codes' (int8 plane)
    ("z", pa.binary()),     # compressed plane bytes
    ("node", pa.int64()),   # 'walk' rows: entered global cell id
    ("n", pa.int64()),      # 'walk' rows: path count entering there
])


def _acc_nxt_ext(codes: np.ndarray, chunk: int, gy0: int, gx0: int,
                 width: int):
    """Per flattened tile cell: in-tile next index (or -1) and exit-target
    global id (or -1) from the D8 code plane."""
    c = chunk
    rr, cc2 = np.divmod(np.arange(c * c), c)
    code_f = codes.ravel()
    nxt = np.full(c * c, -1, np.int64)
    ext = np.full(c * c, -1, np.int64)
    for k, (dr, dc_) in _D8_OFF.items():
        sel = code_f == k
        if not sel.any():
            continue
        tr, tc = rr[sel] + dr, cc2[sel] + dc_
        inside = (tr >= 0) & (tr < c) & (tc >= 0) & (tc < c)
        idx = np.nonzero(sel)[0]
        nxt[idx[inside]] = tr[inside] * c + tc[inside]
        ext[idx[~inside]] = ((gy0 + tr[~inside]) * width
                             + (gx0 + tc[~inside]))
    return nxt, ext


def _acc_walk(nxt: np.ndarray, ext: np.ndarray, starts: np.ndarray,
              counts: np.ndarray, vis: np.ndarray):
    """Vectorized in-tile walk: every (start, count) walker adds ``count``
    visits at each cell along its D8 path (start and pit inclusive);
    walkers stepping out return as (entered global id, count) groups.
    Converging paths merge each step (np.unique), so the work per step is
    bounded by live DISTINCT positions."""
    cur, cnt = starts, counts
    out_t: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    for _ in range(4096):
        if len(cur) == 0:
            break
        u, inv = np.unique(cur, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        cur, cnt = u, s
        vis[cur] += cnt
        ex = ext[cur]
        exiting = ex >= 0
        if exiting.any():
            out_t.append(ex[exiting])
            out_n.append(cnt[exiting])
        nx = nxt[cur]
        cont = nx >= 0
        cur, cnt = nx[cont], cnt[cont]
    else:  # pragma: no cover - defensive
        raise RuntimeError("flowaccum: in-tile walk did not converge")
    if out_t:
        return np.concatenate(out_t), np.concatenate(out_n)
    return np.empty(0, np.int64), np.empty(0, np.int64)


def flowaccum_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                    channel_t: int = 5, max_rounds: int = 64,
                    planes: bool = False, value_weighted: bool = False):
    """D8 flow-ACCUMULATION statistics — the third leg of the terrain
    routing trio (flowdir -> flowlen -> flowaccum): for every valid pixel,
    ``acc(p)`` = number of valid cells (including p itself) whose
    steepest-descent path passes through p; cells with ``acc >= channel_t``
    are channel (stream-network) cells.

    Plan: ONE canvas+halo exchange computes each tile's halo-exact D8 code
    plane; round 0 walks EVERY valid cell in-tile (vectorized wave with
    converging-path merge — work per step is bounded by live distinct
    positions), accumulating a per-tile visits plane and emitting
    O(perimeter) cross-border walker groups ``(entered cell, path count)``.
    Each later round re-keys the walkers by their target tile and walks
    them against the MATERIALIZED compressed code planes (no canvas ever
    moves again); rounds end when no walker crosses a border — v strictly
    decreases every hop, so crossings are finite and few. The final keyed
    merge sums each tile's visit-plane partials.

    Output: (tile_id, tx, ty, n_px, acc_sum, acc_max, n_channel) per tile
    with >=1 valid pixel. Checked against ``fixtures.ensure_flowaccum_golden``
    — a serial full-plane walk sharing only the pure ``_flowdir_codes``
    rule — plus random-mosaic oracles in tests.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    width = grid.width
    c = chunk

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in FLOWACC_PARTIAL_SCHEMA.names}

        def row(tile, kind, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            row((tx, ty), "self", v=px_z[j], m=mask_z[j])
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            v = _vsum(canvas, pack)

            def strip(vs, ms):
                return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                        np.ascontiguousarray(ms).astype(np.uint8).tobytes())

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
        return pa.table(out, schema=FLOWACC_PARTIAL_SCHEMA)

    def _place(P, M, kind, vs, ms):
        if kind == "nbr_n":
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

    def _mid_row(out, tx, ty, kind, z=b"", node=-1, n=0):
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["kind"].append(kind)
        out["z"].append(z)
        out["node"].append(int(node))
        out["n"].append(int(n))

    def round0(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        out: dict[str, list] = {k: [] for k in FLOWACC_MID_SCHEMA.names}
        if "self" not in kinds:
            return pa.table(out, schema=FLOWACC_MID_SCHEMA)
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        for j, kind in enumerate(kinds):
            if kind == "self":
                canvas = pack.from_bytes(
                    zlib.decompress(g.column("v")[j].as_py()), c, c)
                mask = np.frombuffer(
                    zlib.decompress(g.column("m")[j].as_py()),
                    np.uint8).reshape(c, c).astype(bool)
                P[1:c + 1, 1:c + 1] = _vsum(canvas, pack)
                M[1:c + 1, 1:c + 1] = mask
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        codes = _flowdir_codes(P, M)
        valid = codes.ravel() >= 0
        if not valid.any():
            return pa.table(out, schema=FLOWACC_MID_SCHEMA)
        gy0, gx0 = ty * c, tx * c
        nxt, ext = _acc_nxt_ext(codes, c, gy0, gx0, width)
        vis = np.zeros(c * c, np.int64)
        starts = np.nonzero(valid)[0]
        w0 = (P[1:c + 1, 1:c + 1].ravel()[starts]
              if value_weighted else np.ones(len(starts), np.int64))
        wt, wn = _acc_walk(nxt, ext, starts, w0, vis)
        _mid_row(out, tx, ty, "codes",
                 z=zlib.compress(codes.astype(np.int8).tobytes(), 1))
        _mid_row(out, tx, ty, "vis",
                 z=zlib.compress(vis.tobytes(), 1))
        for t_, n_ in zip(wt, wn):
            _mid_row(out, tx, ty, "walk", node=t_, n=n_)
        return pa.table(out, schema=FLOWACC_MID_SCHEMA)

    mid = (tiles_ds.select_columns(["tile_id", "tx", "ty", "px_z", "mask_z"])
           .map_batches(emit, batch_format="pyarrow", batch_size=64)
           .groupby("tile_id").map_groups(round0, batch_format="pyarrow")
           .materialize())

    codes_tbl = mid.filter(expr="kind == 'codes'").materialize()
    vis0 = mid.filter(expr="kind == 'vis'") \
              .select_columns(["tile_id", "tx", "ty", "z"]).materialize()
    walkers = mid.filter(expr="kind == 'walk'") \
                 .select_columns(["node", "n"]).materialize()

    # cross-tile rounds are bucketed SPATIALLY (the flowlen discipline):
    # flow chains are local, so grouping walkers by the target tile's
    # G x G SUPER-BLOCK lets one task hop tile-to-tile inside the block
    # until the chain leaves it — chains zig-zagging along a tile border
    # no longer pay one Ray round per crossing; most resolve in 1-2
    # global rounds.
    import math

    from ..util import cluster_cpus

    G = max(1, int(math.sqrt((n_tx * n_ty) / max(1, 2 * cluster_cpus()))))
    nbx = (n_tx + G - 1) // G

    def add_sb(t: pa.Table) -> pa.Table:
        tx = t.column("tx").to_numpy()
        ty = t.column("ty").to_numpy()
        sb = (ty // G) * nbx + tx // G
        return t.append_column("sb", pa.array(sb, pa.int64()))

    codes_sb = codes_tbl.map_batches(add_sb,
                                     batch_format="pyarrow").materialize()

    # ---- cross-tile rounds as raw Ray tasks over per-super-block state
    # refs (the costdist discipline): each Dataset round paid ~0.3-1 s
    # of driver plan overhead across its three materializations even
    # with a handful of walkers pending. Codes and the initial walkers
    # co-locate per block with ONE shuffle each; walker bundles live in
    # the object store and the driver routes only (bundle ref -> dst
    # block) metadata; per-block visit planes accumulate in task-held
    # state refs across rounds. Strahler keeps the Dataset loop (its
    # rounds carry per-tile packed state the same way but converge in
    # fewer, larger steps).
    import ray

    def key_walkers(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        tx = (node % width) // c
        ty = (node // width) // c
        sb = (ty // G) * nbx + tx // G
        return pa.table({
            "node": t.column("node"),
            "n": t.column("n"),
            "sb": pa.array(sb, pa.int64()),
        })

    codes_grp = (codes_sb.groupby("sb")
                 .map_groups(lambda g: g, batch_format="pyarrow")
                 .materialize())
    init_w = (walkers.map_batches(key_walkers, batch_format="pyarrow")
              .groupby("sb")
              .map_groups(lambda g: g, batch_format="pyarrow")
              .materialize())

    @ray.remote
    def probe_sbs(tbl):
        if tbl.num_rows == 0 or "sb" not in tbl.column_names:
            return []
        return sorted(set(tbl.column("sb").to_pylist()))

    def _by_sb(ds):
        refs = ds.to_arrow_refs()
        out: dict[int, list] = {}
        for sbs, r in zip(ray.get([probe_sbs.remote(r) for r in refs]),
                          refs):
            for sb in sbs:
                out.setdefault(sb, []).append(r)
        return out

    codes_src = _by_sb(codes_grp)
    init_src = _by_sb(init_w)

    @ray.remote(num_returns=3)
    def solve_sb(codes_blks, state, sb, bundle_refs):
        if state is None:
            codes_of: dict[tuple, np.ndarray] = {}
            for tbl in ray.get(list(codes_blks)):
                txs = tbl.column("tx").to_numpy()
                tys = tbl.column("ty").to_numpy()
                sbs_ = tbl.column("sb").to_numpy()
                for j in range(len(tbl)):
                    if int(sbs_[j]) != sb:
                        continue
                    codes_of[(int(txs[j]), int(tys[j]))] = np.frombuffer(
                        zlib.decompress(tbl.column("z")[j].as_py()),
                        np.int8).reshape(c, c)
            vis_of: dict[tuple, np.ndarray] = {}
        else:
            codes_of, vis_prev = state
            # plasma arrays are read-only; visits mutate
            vis_of = {k: v.copy() for k, v in vis_prev.items()}

        pending: dict[tuple, list] = {}

        def add_msgs(nodes_arr, ns_arr):
            txa = (nodes_arr % width) // c
            tya = (nodes_arr // width) // c
            packed = tya * np.int64(n_tx) + txa
            for p in np.unique(packed):
                m = packed == p
                key2 = (int(p % n_tx), int(p // n_tx))
                q = pending.setdefault(key2, [[], []])
                q[0].extend(nodes_arr[m].tolist())
                q[1].extend(ns_arr[m].tolist())

        for bundle in ray.get(list(bundle_refs)):
            if isinstance(bundle, list):  # round bundle: (dst, node, n)
                rows = [(n_, c_) for s_, n_, c_ in bundle if s_ == sb]
                if rows:
                    arr = np.asarray(rows, np.int64)
                    add_msgs(arr[:, 0], arr[:, 1])
            else:  # init walker block (arrow, sb-tagged)
                m = bundle.column("sb").to_numpy() == sb
                if m.any():
                    add_msgs(bundle.column("node").to_numpy()[m],
                             bundle.column("n").to_numpy()[m])

        cache: dict[tuple, tuple] = {}
        out: list[tuple] = []
        for _pop in range(1_000_000):  # defensive bound; v decreases/hop
            if not pending:
                break
            (ttx, tty), (nodes, ns) = pending.popitem()
            if (ttx, tty) not in codes_of:  # pragma: no cover - defensive
                raise RuntimeError(
                    "flowaccum: walker entered codeless tile")
            if (ttx, tty) not in cache:
                cache[(ttx, tty)] = _acc_nxt_ext(
                    codes_of[(ttx, tty)].astype(np.int64), c,
                    tty * c, ttx * c, width)
            nxt, ext = cache[(ttx, tty)]
            node_a = np.asarray(nodes, np.int64)
            starts = ((node_a // width - tty * c) * c
                      + (node_a % width - ttx * c))
            vis = vis_of.setdefault((ttx, tty), np.zeros(c * c, np.int64))
            wt, wn = _acc_walk(nxt, ext, starts,
                               np.asarray(ns, np.int64), vis)
            if not len(wt):
                continue
            etx = (wt % width) // c
            ety = (wt // width) // c
            esb = (ety // G) * nbx + etx // G
            stay = esb == sb
            for t_, n_, s_ in zip(wt[~stay], wn[~stay], esb[~stay]):
                out.append((int(s_), int(t_), int(n_)))
            if stay.any():
                add_msgs(wt[stay], wn[stay])
        else:  # pragma: no cover - defensive
            raise RuntimeError("flowaccum: in-block chase did not converge")
        return (codes_of, vis_of), out, sorted({o[0] for o in out})

    state_refs: dict[int, object] = {}
    pending_refs: dict[int, list] = {}
    for sb, refs in init_src.items():
        if sb in codes_src:
            pending_refs[sb] = list(refs)
    for _r in range(max_rounds):
        if not pending_refs:
            break
        futs = {}
        for sb, brefs in pending_refs.items():
            st = state_refs.get(sb)
            cb = codes_src[sb] if st is None else None
            sref, oref, dref = solve_sb.remote(cb, st, sb, brefs)
            state_refs[sb] = sref
            futs[sb] = (oref, dref)
        pending_refs = {}
        for (oref, _), dsts in zip(
                futs.values(), ray.get([d for _, d in futs.values()])):
            for dst in dsts:
                if dst in codes_src:  # walkers to absent blocks drop
                    pending_refs.setdefault(dst, []).append(oref)
    else:  # pragma: no cover - defensive
        raise RuntimeError("flowaccum: cross-tile rounds did not converge")

    VIS_SCHEMA = pa.schema([("tile_id", pa.string()), ("tx", pa.int64()),
                            ("ty", pa.int64()), ("z", pa.binary())])

    @ray.remote
    def emit_vis(state):
        _codes, vis_of = state
        out: dict[str, list] = {k: [] for k in VIS_SCHEMA.names}
        for (ttx, tty), vis in sorted(vis_of.items()):
            out["tile_id"].append(f"{ttx}-{tty}")
            out["tx"].append(ttx)
            out["ty"].append(tty)
            out["z"].append(zlib.compress(vis.tobytes(), 1))
        return pa.table(out, schema=VIS_SCHEMA)

    allvis = vis0
    if state_refs:
        import ray.data as _rd
        allvis = allvis.union(_rd.from_arrow_refs(
            [emit_vis.remote(s) for s in state_refs.values()]))

    if planes:
        # expose per-tile compressed acc + codes planes (the stream-links
        # consumer): same keyed merge, planes instead of stats
        PLANES_SCHEMA = pa.schema([
            ("tile_id", pa.string()), ("tx", pa.int64()),
            ("ty", pa.int64()), ("acc_z", pa.binary()),
            ("codes_z", pa.binary()),
        ])

        def finish_planes(g: pa.Table) -> pa.Table:
            acc = np.zeros(c * c, np.int64)
            codes_z = b""
            for j in range(len(g)):
                kind = g.column("kind")[j].as_py()
                z = g.column("z")[j].as_py()
                if kind == "codes":
                    codes_z = z
                else:
                    acc += np.frombuffer(zlib.decompress(z), np.int64)
            tx = int(g.column("tx")[0].as_py())
            ty = int(g.column("ty")[0].as_py())
            return pa.table({
                "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
                "tx": pa.array([tx], pa.int64()),
                "ty": pa.array([ty], pa.int64()),
                "acc_z": pa.array([zlib.compress(acc.tobytes(), 1)],
                                  pa.binary()),
                "codes_z": pa.array([codes_z], pa.binary()),
            }, schema=PLANES_SCHEMA)

        def _tag(kind):
            def f(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "kind", pa.array([kind] * len(t), pa.string()))
            return f

        vis_tagged = allvis.map_batches(_tag("vis"),
                                        batch_format="pyarrow")
        codes_tagged = (codes_tbl.select_columns(["tile_id", "tx", "ty",
                                                  "z"])
                        .map_batches(_tag("codes"),
                                     batch_format="pyarrow"))
        return (vis_tagged.union(codes_tagged)
                .groupby("tile_id")
                .map_groups(finish_planes, batch_format="pyarrow"))

    OUT_SCHEMA = pa.schema([
        ("tile_id", pa.string()), ("tx", pa.int64()), ("ty", pa.int64()),
        ("n_px", pa.int64()), ("acc_sum", pa.int64()),
        ("acc_max", pa.int64()), ("n_channel", pa.int64()),
    ])

    def finish(g: pa.Table) -> pa.Table:
        acc = np.zeros(c * c, np.int64)
        for z in g.column("z").to_pylist():
            acc += np.frombuffer(zlib.decompress(z), np.int64)
        pos = acc > 0
        if not pos.any():
            return pa.table({f.name: pa.array([], f.type)
                             for f in OUT_SCHEMA})
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "n_px": pa.array([int(pos.sum())], pa.int64()),
            "acc_sum": pa.array([int(acc.sum())], pa.int64()),
            "acc_max": pa.array([int(acc.max())], pa.int64()),
            "n_channel": pa.array([int((acc >= channel_t).sum())],
                                  pa.int64()),
        }, schema=OUT_SCHEMA)

    return allvis.groupby("tile_id").map_groups(finish,
                                                batch_format="pyarrow")


# ---- D8 watershed basins (terminal-pit labeling) -----------------------------

WSHED_MID_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'term' plane | 'exit' group | 'node' ring row
    ("z", pa.binary()),     # term: int64 plane | exit: packed start gids
    ("node", pa.int64()),   # exit: entry gid | node: ring-cell gid
    ("nxt", pa.int64()),    # node: next entry gid, -1 = resolved
    ("term", pa.int64()),   # node: terminal pit gid when resolved
])


def _chase_term(codes: np.ndarray, chunk: int, gy0: int, gx0: int,
                width: int):
    """In-tile pointer doubling carrying the TERMINAL identity: per
    flattened cell, (status, value) where status -1 = resolved to an
    in-tile pit (value = pit's global id), -2 = exits the tile (value =
    entered cell's global id), -9 = invalid."""
    c = chunk
    rr, cc2 = np.divmod(np.arange(c * c), c)
    code_f = codes.ravel()
    ptr = np.full(c * c, -9, np.int64)
    val = np.full(c * c, -1, np.int64)
    pits = code_f == 8
    ptr[pits] = -1
    val[pits] = (gy0 + rr[pits]) * width + (gx0 + cc2[pits])
    for k, (dr, dc_) in _D8_OFF.items():
        sel = code_f == k
        if not sel.any():
            continue
        tr, tc = rr[sel] + dr, cc2[sel] + dc_
        inside = (tr >= 0) & (tr < c) & (tc >= 0) & (tc < c)
        idx = np.nonzero(sel)[0]
        ptr[idx[inside]] = tr[inside] * c + tc[inside]
        out = idx[~inside]
        ptr[out] = -2
        val[out] = ((gy0 + tr[~inside]) * width + (gx0 + tc[~inside]))
    for _ in range(32):
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        resolved = ptr[j] < 0
        val[act[resolved]] = val[j[resolved]]
        ptr[act] = np.where(resolved, ptr[j], ptr[j])
        # unresolved targets keep chasing (ptr[j] >= 0 -> doubled hop)
    return ptr, val


def watershed_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                    max_rounds: int = 64, planes: bool = False):
    """D8 WATERSHED basin labeling — every valid pixel labeled by its
    terminal pit (the cell its steepest-descent path ends at); output the
    per-tile basin structure: (tile_id, tx, ty, n_px, n_basins,
    basin_sum, max_basin_px) where n_basins counts distinct terminal
    pits among the tile's cells, basin_sum is the Σ of terminal gids
    (a value checksum) and max_basin_px the largest within-tile basin.

    Plan: the flowlen two-level decomposition carrying TERMINAL IDs
    instead of path lengths — one canvas+halo exchange computes per-tile
    halo-exact code planes and pointer-doubles in-tile (term plane +
    O(perimeter) ring-node continuations + per-entry exit groups whose
    start lists ride as packed bytes); the cross-tile phase doubles over
    the border-node graph only, spatially bucketed; a final bucketed
    join hands each exit group its entry's terminal and one keyed merge
    paints the per-cell terminal plane per tile. Checked against
    ``fixtures.ensure_watershed_golden`` (serial full-plane doubling)
    plus random-mosaic tests."""
    import math

    import ray.data as rd

    from ..ops.stencil import _flowdir_codes, _vsum
    from ..util import auto_join_partitions, cluster_cpus

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    width = grid.width
    c = chunk

    # ---- stage 1: exchange + in-tile resolution (flowaccum's emit) ----
    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in FLOWACC_PARTIAL_SCHEMA.names}

        def row(tile, kind, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            row((tx, ty), "self", v=px_z[j], m=mask_z[j])
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            v = _vsum(canvas, pack)

            def strip(vs, ms):
                return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                        np.ascontiguousarray(ms).astype(np.uint8).tobytes())

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
        return pa.table(out, schema=FLOWACC_PARTIAL_SCHEMA)

    def _place(P, M, kind, vs, ms):
        if kind == "nbr_n":
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

    def _mid(out, tx, ty, kind, z=b"", node=-1, nxt=-1, term=-1):
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["kind"].append(kind)
        out["z"].append(z)
        out["node"].append(int(node))
        out["nxt"].append(int(nxt))
        out["term"].append(int(term))

    def resolve_tile(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        out: dict[str, list] = {k: [] for k in WSHED_MID_SCHEMA.names}
        if "self" not in kinds:
            return pa.table(out, schema=WSHED_MID_SCHEMA)
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        P = np.zeros((c + 2, c + 2), np.int64)
        M = np.zeros((c + 2, c + 2), bool)
        for j, kind in enumerate(kinds):
            if kind == "self":
                canvas = pack.from_bytes(
                    zlib.decompress(g.column("v")[j].as_py()), c, c)
                mask = np.frombuffer(
                    zlib.decompress(g.column("m")[j].as_py()),
                    np.uint8).reshape(c, c).astype(bool)
                P[1:c + 1, 1:c + 1] = _vsum(canvas, pack)
                M[1:c + 1, 1:c + 1] = mask
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place(P, M, kind, vs, ms)
        codes = _flowdir_codes(P, M)
        valid = codes.ravel() >= 0
        if not valid.any():
            return pa.table(out, schema=WSHED_MID_SCHEMA)
        gy0, gx0 = ty * c, tx * c
        ptr, val = _chase_term(codes, c, gy0, gx0, width)
        term_plane = np.where(ptr == -1, val, np.int64(-1))
        _mid(out, tx, ty, "term",
             z=zlib.compress(term_plane.tobytes(), 1))
        # exit groups: start gids packed per entry cell
        ex = np.nonzero(valid & (ptr == -2))[0]
        if len(ex):
            rr, cc2 = np.divmod(ex, c)
            starts = (gy0 + rr) * width + (gx0 + cc2)
            entry = val[ex]
            order = np.argsort(entry, kind="stable")
            entry, starts = entry[order], starts[order]
            cut = np.ones(len(entry), bool)
            cut[1:] = entry[1:] != entry[:-1]
            sidx = np.nonzero(cut)[0]
            eidx = np.append(sidx[1:], len(entry))
            for a, b in zip(sidx, eidx):
                _mid(out, tx, ty, "exit", node=entry[a],
                     z=starts[a:b].tobytes())
        # border-ring node continuations
        rr, cc2 = np.divmod(np.arange(c * c), c)
        ring = valid & ((rr == 0) | (rr == c - 1) | (cc2 == 0)
                        | (cc2 == c - 1))
        for i in np.nonzero(ring)[0]:
            nid = (gy0 + rr[i]) * width + (gx0 + cc2[i])
            if ptr[i] == -1:
                _mid(out, tx, ty, "node", node=nid, nxt=-1, term=val[i])
            else:
                _mid(out, tx, ty, "node", node=nid, nxt=val[i])
        return pa.table(out, schema=WSHED_MID_SCHEMA)

    mid = (tiles_ds.select_columns(["tile_id", "tx", "ty", "px_z",
                                    "mask_z"])
           .map_batches(emit, batch_format="pyarrow", batch_size=64)
           .groupby("tile_id").map_groups(resolve_tile,
                                          batch_format="pyarrow")
           .materialize())

    terms = mid.filter(expr="kind == 'term'") \
        .select_columns(["tile_id", "tx", "ty", "z"]).materialize()
    exits = mid.filter(expr="kind == 'exit'") \
        .select_columns(["tile_id", "tx", "ty", "node", "z"]).materialize()
    nodes = mid.filter(expr="kind == 'node'") \
        .select_columns(["node", "nxt", "term"]).materialize()

    # ---- stage 2: cross-tile doubling over border nodes (flowlen's
    # spatially-bucketed chase, carrying terminal ids instead of d) ----
    G = max(1, int(math.sqrt((n_tx * n_ty) / max(1, 2 * cluster_cpus()))))
    nbx = (n_tx + G - 1) // G
    blk = chunk * G

    def sblock(node_arr: np.ndarray) -> np.ndarray:
        gy = node_arr // width
        gx = node_arr % width
        return ((gy // blk) * nbx + (gx // blk)).astype(np.int64)

    if int(nodes.count()) > 0:
        for _ in range(max_rounds):
            def key_both(t: pa.Table) -> pa.Table:
                node = t.column("node").to_numpy()
                nxt = t.column("nxt").to_numpy()
                tm = t.column("term").to_numpy()
                un = nxt >= 0
                return pa.table({
                    "pk": pa.array(np.concatenate(
                        [sblock(node), sblock(nxt[un])]), pa.int64()),
                    "side": pa.array(np.concatenate(
                        [np.ones(len(node), np.int8),
                         np.zeros(int(un.sum()), np.int8)]), pa.int8()),
                    "node": pa.array(np.concatenate([node, node[un]]),
                                     pa.int64()),
                    "nxt": pa.array(np.concatenate([nxt, nxt[un]]),
                                    pa.int64()),
                    "term": pa.array(np.concatenate([tm, tm[un]]),
                                     pa.int64()),
                })

            def chase(g: pa.Table) -> pa.Table:
                side = g.column("side").to_numpy()
                nd = g.column("node").to_numpy()
                nx = g.column("nxt").to_numpy()
                tm = g.column("term").to_numpy()
                b = side == 1
                lut_n, lut_x, lut_t = nd[b], nx[b], tm[b]
                order = np.argsort(lut_n, kind="stable")
                lut_n, lut_x, lut_t = (lut_n[order], lut_x[order],
                                       lut_t[order])
                pk = int(g.column("pk")[0].as_py())
                a = np.nonzero(side == 0)[0]
                done_b = b & (nx < 0)
                cur_n, cur_x, cur_t = nd[a], nx[a], tm[a]
                live = np.ones(len(a), bool)
                for _hop in range(1024):
                    if not live.any():
                        break
                    li = np.nonzero(live)[0]
                    pos = np.searchsorted(lut_n, cur_x[li])
                    if (pos >= len(lut_n)).any() or \
                            not (lut_n[pos] == cur_x[li]).all():
                        raise RuntimeError(
                            "watershed: dangling border-node target")
                    cur_t[li] = lut_t[pos]
                    cur_x[li] = lut_x[pos]
                    nxv = cur_x[li]
                    still = (nxv >= 0) & (sblock(np.maximum(nxv, 0)) == pk)
                    live[li] = still
                else:  # pragma: no cover - defensive
                    raise RuntimeError("watershed: local chase stuck")
                return pa.table({
                    "node": pa.array(np.concatenate([nd[done_b], cur_n]),
                                     pa.int64()),
                    "nxt": pa.array(np.concatenate([nx[done_b], cur_x]),
                                    pa.int64()),
                    "term": pa.array(np.concatenate([tm[done_b], cur_t]),
                                     pa.int64()),
                })

            nodes = (nodes.map_batches(key_both, batch_format="pyarrow")
                     .groupby("pk").map_groups(chase,
                                               batch_format="pyarrow")
                     .materialize())
            if int(nodes.filter(expr="nxt >= 0").count()) == 0:
                break
        else:  # pragma: no cover - defensive
            raise RuntimeError("watershed: doubling did not converge")

    # ---- stage 3: hand each exit group its entry's terminal ----
    nparts = max(1, auto_join_partitions(nodes, pools=1))

    def key_exit(t: pa.Table) -> pa.Table:
        return pa.table({
            "pk": pa.array((t.column("node").to_numpy() % nparts)
                           .astype(np.int32), pa.int32()),
            "side": pa.array(np.zeros(len(t), np.int8), pa.int8()),
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx").cast(pa.int64()),
            "ty": t.column("ty").cast(pa.int64()),
            "node": t.column("node"),
            "z": t.column("z"),
            "term": pa.array(np.zeros(len(t), np.int64), pa.int64()),
        })

    def key_term(t: pa.Table) -> pa.Table:
        empt = pa.array([""] * len(t), pa.string())
        zero = pa.array(np.zeros(len(t), np.int64), pa.int64())
        return pa.table({
            "pk": pa.array((t.column("node").to_numpy() % nparts)
                           .astype(np.int32), pa.int32()),
            "side": pa.array(np.ones(len(t), np.int8), pa.int8()),
            "tile_id": empt, "tx": zero, "ty": zero,
            "node": t.column("node"),
            "z": pa.array([b""] * len(t), pa.binary()),
            "term": t.column("term").cast(pa.int64()),
        })

    def attach(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy()
        node = g.column("node").to_numpy()
        b = side == 1
        lut_n = node[b]
        lut_t = g.column("term").to_numpy()[b]
        order = np.argsort(lut_n, kind="stable")
        lut_n, lut_t = lut_n[order], lut_t[order]
        out = {"tile_id": [], "tx": [], "ty": [], "starts": [],
               "term": []}
        for i in np.nonzero(side == 0)[0]:
            e = node[i]
            pos = int(np.searchsorted(lut_n, e))
            if pos >= len(lut_n) or lut_n[pos] != e:
                raise RuntimeError("watershed: exit entry unresolved")
            out["tile_id"].append(g.column("tile_id")[i].as_py())
            out["tx"].append(int(g.column("tx")[i].as_py()))
            out["ty"].append(int(g.column("ty")[i].as_py()))
            out["starts"].append(g.column("z")[i].as_py())
            out["term"].append(int(lut_t[pos]))
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "tx": pa.array(out["tx"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            "starts": pa.array(out["starts"], pa.binary()),
            "term": pa.array(out["term"], pa.int64()),
        })

    resolved = (exits.map_batches(key_exit, batch_format="pyarrow")
                .union(nodes.map_batches(key_term,
                                         batch_format="pyarrow"))
                .groupby("pk").map_groups(attach, batch_format="pyarrow"))

    # ---- stage 4: paint each tile's terminal plane and fold stats ----
    OUT_SCHEMA = pa.schema([
        ("tile_id", pa.string()), ("tx", pa.int64()), ("ty", pa.int64()),
        ("n_px", pa.int64()), ("n_basins", pa.int64()),
        ("basin_sum", pa.int64()), ("max_basin_px", pa.int64()),
    ])

    PLANE_SCHEMA = pa.schema([
        ("tile_id", pa.string()), ("tx", pa.int64()), ("ty", pa.int64()),
        ("term_z", pa.binary()),
    ])

    def _painted(g: pa.Table):
        term = None
        extra_pos: list[np.ndarray] = []
        extra_t: list[np.ndarray] = []
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        gy0, gx0 = ty * c, tx * c
        for j in range(len(g)):
            if g.column("kind")[j].as_py() == "term":
                term = np.frombuffer(
                    zlib.decompress(g.column("z")[j].as_py()),
                    np.int64).copy()
            else:
                starts = np.frombuffer(g.column("z")[j].as_py(), np.int64)
                pos = ((starts // width - gy0) * c
                       + (starts % width - gx0))
                extra_pos.append(pos)
                extra_t.append(np.full(len(pos),
                                       int(g.column("term")[j].as_py()),
                                       np.int64))
        if term is None:  # pragma: no cover - defensive
            raise RuntimeError("watershed: tile missing its term plane")
        if extra_pos:
            p = np.concatenate(extra_pos)
            t_ = np.concatenate(extra_t)
            term[p] = t_
        return tx, ty, term

    def paint(g: pa.Table) -> pa.Table:
        tx, ty, term = _painted(g)
        ok = term >= 0
        if not ok.any():
            return pa.table({f.name: pa.array([], f.type)
                             for f in OUT_SCHEMA})
        vals, counts = np.unique(term[ok], return_counts=True)
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "n_px": pa.array([int(ok.sum())], pa.int64()),
            "n_basins": pa.array([len(vals)], pa.int64()),
            "basin_sum": pa.array([int(term[ok].sum())], pa.int64()),
            "max_basin_px": pa.array([int(counts.max())], pa.int64()),
        }, schema=OUT_SCHEMA)

    def paint_plane(g: pa.Table) -> pa.Table:
        tx, ty, term = _painted(g)
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "term_z": pa.array([zlib.compress(term.tobytes(), 1)],
                               pa.binary()),
        }, schema=PLANE_SCHEMA)

    def tag_kind_term(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx"),
            "ty": t.column("ty"),
            "kind": pa.array(["term"] * len(t), pa.string()),
            "z": t.column("z"),
            "term": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
        })

    def tag_kind_exit(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx"),
            "ty": t.column("ty"),
            "kind": pa.array(["exitres"] * len(t), pa.string()),
            "z": t.column("starts"),
            "term": t.column("term"),
        })

    return (terms.map_batches(tag_kind_term, batch_format="pyarrow")
            .union(resolved.map_batches(tag_kind_exit,
                                        batch_format="pyarrow"))
            .groupby("tile_id")
            .map_groups(paint_plane if planes else paint,
                        batch_format="pyarrow"))


# ---- basin saddles / depression depth ----------------------------------------

BASIN_XCH_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),   # 'self' | label-plane 'labels' | strips
    ("v", pa.binary()),      # self: px_z | labels: term_z | strips: int64 v
    ("m", pa.binary()),      # self: mask_z | strips: uint8 valid
    ("l", pa.binary()),      # strips: int64 labels
])



def _basin_place(V, M, L, kind, vs, ms, ls, c):
    """Receiver-side placement of a (v, valid, label) strip into the
    padded (c+2)^2 frame — ONE copy of the basin exchange protocol."""
    if kind == "nbr_n":
        V[0, 1:c + 1], M[0, 1:c + 1], L[0, 1:c + 1] = vs, ms, ls
    elif kind == "nbr_s":
        V[c + 1, 1:c + 1], M[c + 1, 1:c + 1], L[c + 1, 1:c + 1] = \
            vs, ms, ls
    elif kind == "nbr_w":
        V[1:c + 1, 0], M[1:c + 1, 0], L[1:c + 1, 0] = vs, ms, ls
    elif kind == "nbr_e":
        V[1:c + 1, c + 1], M[1:c + 1, c + 1], L[1:c + 1, c + 1] = \
            vs, ms, ls
    elif kind == "nbr_nw_c":
        V[0, 0], M[0, 0], L[0, 0] = vs[0], ms[0], ls[0]
    elif kind == "nbr_ne_c":
        V[0, c + 1], M[0, c + 1], L[0, c + 1] = vs[0], ms[0], ls[0]
    elif kind == "nbr_sw_c":
        V[c + 1, 0], M[c + 1, 0], L[c + 1, 0] = vs[0], ms[0], ls[0]
    elif kind == "nbr_se_c":
        V[c + 1, c + 1], M[c + 1, c + 1], L[c + 1, c + 1] = \
            vs[0], ms[0], ls[0]


def _basin_frame_of(g: pa.Table, c: int):
    """Assemble a tile's padded (v, valid, label) frame from its 'frame'
    row + received strips; returns (tx, ty, V, M, L) or None when the
    tile is absent."""
    kinds = g.column("kind").to_pylist()
    if "frame" not in kinds:
        return None
    tx = int(g.column("tx")[0].as_py())
    ty = int(g.column("ty")[0].as_py())
    V = np.zeros((c + 2, c + 2), np.int64)
    M = np.zeros((c + 2, c + 2), bool)
    L = np.full((c + 2, c + 2), -1, np.int64)
    for j, kind in enumerate(kinds):
        if kind == "frame":
            V[1:c + 1, 1:c + 1] = np.frombuffer(
                zlib.decompress(g.column("v")[j].as_py()),
                np.int64).reshape(c, c)
            M[1:c + 1, 1:c + 1] = np.frombuffer(
                zlib.decompress(g.column("m")[j].as_py()),
                np.uint8).reshape(c, c).astype(bool)
            L[1:c + 1, 1:c + 1] = np.frombuffer(
                zlib.decompress(g.column("l")[j].as_py()),
                np.int64).reshape(c, c)
        else:
            vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
            ms = np.frombuffer(g.column("m")[j].as_py(),
                               np.uint8).astype(bool)
            ls = np.frombuffer(g.column("l")[j].as_py(), np.int64)
            _basin_place(V, M, L, kind, vs, ms, ls, c)
    return tx, ty, V, M, L


def _basin_frames(tiles_ds, grid: GridSpec, pack: ChannelPack):
    """The shared basin exchange: pair watershed label planes with the
    mosaic canvases per tile and emit the 8-neighbor (label, v, valid)
    strip exchange; returns the keyed strip dataset whose
    groupby("tile_id") groups reassemble via _basin_frame_of."""
    from ..ops.stencil import _vsum

    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    c = chunk

    labels = watershed_stats(tiles_ds, grid, pack, planes=True)

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx"),
            "ty": t.column("ty"),
            "kind": pa.array(["labels"] * len(t), pa.string()),
            "v": t.column("term_z"),
            "m": pa.array([b""] * len(t), pa.binary()),
            "l": pa.array([b""] * len(t), pa.binary()),
        }, schema=BASIN_XCH_SCHEMA)

    def tag_tiles(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx").cast(pa.int64()),
            "ty": t.column("ty").cast(pa.int64()),
            "kind": pa.array(["self"] * len(t), pa.string()),
            "v": t.column("px_z"),
            "m": t.column("mask_z"),
            "l": pa.array([b""] * len(t), pa.binary()),
        }, schema=BASIN_XCH_SCHEMA)

    def combine_emit(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        out: dict[str, list] = {k: [] for k in BASIN_XCH_SCHEMA.names}
        if "self" not in kinds or "labels" not in kinds:
            return pa.table(out, schema=BASIN_XCH_SCHEMA)
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        j_self = kinds.index("self")
        j_lab = kinds.index("labels")
        canvas = pack.from_bytes(
            zlib.decompress(g.column("v")[j_self].as_py()), c, c)
        mask = np.frombuffer(
            zlib.decompress(g.column("m")[j_self].as_py()),
            np.uint8).reshape(c, c).astype(bool)
        v = _vsum(canvas, pack)
        lab = np.frombuffer(
            zlib.decompress(g.column("v")[j_lab].as_py()),
            np.int64).reshape(c, c)

        def row(tile, kind, vv=b"", mm=b"", ll=b""):
            ttx, tty = tile
            out["tile_id"].append(f"{ttx}-{tty}")
            out["tx"].append(ttx)
            out["ty"].append(tty)
            out["kind"].append(kind)
            out["v"].append(vv)
            out["m"].append(mm)
            out["l"].append(ll)

        row((tx, ty), "frame",
            vv=zlib.compress(v.tobytes(), 1),
            mm=zlib.compress(mask.astype(np.uint8).tobytes(), 1),
            ll=zlib.compress(lab.tobytes(), 1))

        def strip(vs, ms, ls):
            return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                    np.ascontiguousarray(ms).astype(np.uint8).tobytes(),
                    np.ascontiguousarray(ls).astype(np.int64).tobytes())

        sends = [((tx - 1, ty), "nbr_e", v[:, 0], mask[:, 0], lab[:, 0]),
                 ((tx + 1, ty), "nbr_w", v[:, -1], mask[:, -1],
                  lab[:, -1]),
                 ((tx, ty - 1), "nbr_s", v[0, :], mask[0, :], lab[0, :]),
                 ((tx, ty + 1), "nbr_n", v[-1, :], mask[-1, :],
                  lab[-1, :]),
                 ((tx - 1, ty - 1), "nbr_se_c", v[0:1, 0], mask[0:1, 0],
                  lab[0:1, 0]),
                 ((tx + 1, ty - 1), "nbr_sw_c", v[0:1, -1],
                  mask[0:1, -1], lab[0:1, -1]),
                 ((tx - 1, ty + 1), "nbr_ne_c", v[-1:, 0], mask[-1:, 0],
                  lab[-1:, 0]),
                 ((tx + 1, ty + 1), "nbr_nw_c", v[-1:, -1],
                  mask[-1:, -1], lab[-1:, -1])]
        for (ntx, nty), kind, vs, ms, ls in sends:
            if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                b_, m_, l_ = strip(vs, ms, ls)
                row((ntx, nty), kind, vv=b_, mm=m_, ll=l_)
        return pa.table(out, schema=BASIN_XCH_SCHEMA)

    return (labels.map_batches(tag_labels, batch_format="pyarrow")
            .union(tiles_ds.select_columns(["tile_id", "tx", "ty",
                                            "px_z", "mask_z"])
                   .map_batches(tag_tiles, batch_format="pyarrow"))
            .groupby("tile_id")
            .map_groups(combine_emit, batch_format="pyarrow"))


def basin_saddles(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None):
    """Per-basin SADDLE SPILL and depression depth — the one-level
    depression analysis on top of :func:`watershed_stats` labels: for
    every basin (keyed by its terminal pit), the spill elevation is the
    MIN over its boundary of the saddle height ``max(v_a, v_b)`` across
    adjacent cells of different basins, or the cell's own ``v`` where
    the basin touches nodata / the grid edge (water drains out there);
    ``depth = spill - pit_v`` (paths strictly descend, so depth >= 0).

    Plan: the label planes ride out of the watershed machinery
    (``planes=True``); ONE keyed union per tile pairs them with the
    mosaic canvases, ONE dilate-style 8-neighbor strip exchange carries
    (label, v, valid) borders, every tile emits saddle/drain/pit/count
    partials for all pairs IT SEES (cross-tile duplicates are harmless
    under the min fold), and one bucketed fold per basin closes
    (pit, basin_px, pit_v, spill_v, depth). Output rows are bounded by
    the number of pits. Checked against
    ``fixtures.ensure_basin_golden`` (serial full-plane replay) and
    random-mosaic tests."""
    import pandas as pd

    from ..ops.stencil import _vsum
    from ..util import bucketed_fold

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    width, height = grid.width, grid.height
    c = chunk

    PART_SCHEMA = pa.schema([
        ("pit", pa.int64()),
        ("k", pa.int8()),    # 0 saddle/drain candidate | 1 count | 2 pit_v
        ("val", pa.int64()),
    ])

    def candidates(g: pa.Table) -> pa.Table:
        fr = _basin_frame_of(g, c)
        if fr is None:
            return pa.table({f.name: pa.array([], f.type)
                             for f in PART_SCHEMA})
        tx, ty, V, M, L = fr
        gy0, gx0 = ty * c, tx * c
        # mark beyond-grid frame positions invalid explicitly (M already
        # False there; grid-edge cells drain)
        cm = M[1:c + 1, 1:c + 1]
        cv = V[1:c + 1, 1:c + 1]
        clab = L[1:c + 1, 1:c + 1]
        pits: list[np.ndarray] = []
        ks: list[np.ndarray] = []
        vals: list[np.ndarray] = []
        for dr in (-1, 0, 1):
            for dc_ in (-1, 0, 1):
                if dr == 0 and dc_ == 0:
                    continue
                nv = V[1 + dr:1 + dr + c, 1 + dc_:1 + dc_ + c]
                nm = M[1 + dr:1 + dr + c, 1 + dc_:1 + dc_ + c]
                nl = L[1 + dr:1 + dr + c, 1 + dc_:1 + dc_ + c]
                both = cm & nm
                saddle = both & (clab != nl)
                if saddle.any():
                    pits.append(clab[saddle])
                    ks.append(np.zeros(int(saddle.sum()), np.int8))
                    vals.append(np.maximum(cv[saddle], nv[saddle]))
                drain = cm & ~nm
                if drain.any():
                    pits.append(clab[drain])
                    ks.append(np.zeros(int(drain.sum()), np.int8))
                    vals.append(cv[drain])
        # counts + pit elevation
        if cm.any():
            pits.append(clab[cm])
            ks.append(np.ones(int(cm.sum()), np.int8))
            vals.append(np.ones(int(cm.sum()), np.int64))
            rr, cc2 = np.nonzero(cm)
            gid = (gy0 + rr) * width + (gx0 + cc2)
            is_pit = clab[cm] == gid
            if is_pit.any():
                pits.append(gid[is_pit])
                ks.append(np.full(int(is_pit.sum()), 2, np.int8))
                vals.append(cv[cm][is_pit])
        if not pits:
            return pa.table({f.name: pa.array([], f.type)
                             for f in PART_SCHEMA})
        return pa.table({
            "pit": pa.array(np.concatenate(pits), pa.int64()),
            "k": pa.array(np.concatenate(ks), pa.int8()),
            "val": pa.array(np.concatenate(vals), pa.int64()),
        }, schema=PART_SCHEMA)

    parts = (_basin_frames(tiles_ds, grid, pack)
             .groupby("tile_id")
             .map_groups(candidates, batch_format="pyarrow"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pit", sort=False)
        spill = df[df["k"] == 0].groupby("pit", sort=False)["val"].min()
        n = df[df["k"] == 1].groupby("pit", sort=False)["val"].sum()
        pv = df[df["k"] == 2].groupby("pit", sort=False)["val"].first()
        del g
        o = pd.DataFrame({"basin_px": n, "pit_v": pv,
                          "spill_v": spill}).reset_index()
        o = o.rename(columns={"index": "pit"})
        if "pit" not in o.columns:  # pandas keeps the index name
            o = o.reset_index()
        o["depth"] = o["spill_v"] - o["pit_v"]
        for c2 in ("pit", "basin_px", "pit_v", "spill_v", "depth"):
            o[c2] = o[c2].astype(np.int64)
        return o[["pit", "basin_px", "pit_v", "spill_v", "depth"]]

    return bucketed_fold(parts, "pit", fold)


# ---- depression filling (Priority-Flood equivalent) --------------------------

FILL_PART_SCHEMA = pa.schema([
    ("a", pa.int64()),      # basin (pit gid); edges: lo endpoint
    ("b", pa.int64()),      # edges: hi endpoint; else -1
    ("k", pa.int8()),       # 0 edge-saddle | 1 drain | 2 pit_v
    ("val", pa.int64()),
])


def basin_fill(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
               max_rounds: int = 64):
    """Depression FILLING — the Priority-Flood equivalent, distributed:
    per basin, ``fill_v`` = the minimax path height from its pit to any
    drain (nodata / grid edge), i.e. the water level after all nested
    depressions fill and spill transitively (one-level
    :func:`basin_saddles` only sees the first saddle; this solves the
    whole hierarchy).

    Correctness: inside a basin the pit reaches each boundary saddle at
    cost = the saddle height (the reversed steepest-descent path ascends
    monotonically), and any cell path crossing basins pays at least the
    pair's min saddle — so the cell-level minimax equals the minimax
    over the BASIN GRAPH (nodes = basins, edge = min saddle per adjacent
    pair, seeds = drain spills). That graph is what this op solves.

    Plan: the shared basin exchange emits per-pair saddle / drain /
    pit-v partials (bucketed min folds close the edge table E, drains D
    and pit heights P); basins assign to the SUPER-BLOCK of their pit
    (spatially local), edges replicate to both endpoint blocks and each
    round replicates the current fill of frontier basins to neighbor
    blocks, where an in-block minimax Dijkstra (frozen externals —
    block Gauss-Seidel) re-solves its own basins; values only decrease
    over a finite height set, so rounds converge in ~block-graph
    diameter, checked by a one-scalar-per-round changed count. Output:
    (pit, pit_v, fill_v, filled_depth). Checked against
    ``fixtures.ensure_fill_golden`` — an INDEPENDENT serial
    priority-flood (heap over cells, no basin graph at all) — plus
    random-mosaic tests."""
    import heapq
    import math

    import pandas as pd
    import ray.data as rd

    from ..util import bucketed_fold, cluster_cpus

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    width = grid.width
    c = chunk
    INF = np.int64(1 << 62)

    frames = _basin_frames(tiles_ds, grid, pack)

    def emit_parts(g: pa.Table) -> pa.Table:
        fr = _basin_frame_of(g, c)
        if fr is None:
            return pa.table({f.name: pa.array([], f.type)
                             for f in FILL_PART_SCHEMA})
        tx, ty, V, M, L = fr
        gy0, gx0 = ty * c, tx * c
        cm = M[1:c + 1, 1:c + 1]
        cv = V[1:c + 1, 1:c + 1]
        clab = L[1:c + 1, 1:c + 1]
        aa: list[np.ndarray] = []
        bb: list[np.ndarray] = []
        kk: list[np.ndarray] = []
        vv: list[np.ndarray] = []
        for dr in (-1, 0, 1):
            for dc_ in (-1, 0, 1):
                if dr == 0 and dc_ == 0:
                    continue
                nv = V[1 + dr:1 + dr + c, 1 + dc_:1 + dc_ + c]
                nm = M[1 + dr:1 + dr + c, 1 + dc_:1 + dc_ + c]
                nl = L[1 + dr:1 + dr + c, 1 + dc_:1 + dc_ + c]
                both = cm & nm & (clab != nl)
                if both.any():
                    la, lb = clab[both], nl[both]
                    lo = np.minimum(la, lb)
                    hi = np.maximum(la, lb)
                    aa.append(lo)
                    bb.append(hi)
                    kk.append(np.zeros(len(lo), np.int8))
                    vv.append(np.maximum(cv[both], nv[both]))
                drain = cm & ~nm
                if drain.any():
                    la = clab[drain]
                    aa.append(la)
                    bb.append(np.full(len(la), -1, np.int64))
                    kk.append(np.ones(len(la), np.int8))
                    vv.append(cv[drain])
        if cm.any():
            rr, cc2 = np.nonzero(cm)
            gid = (gy0 + rr) * width + (gx0 + cc2)
            is_pit = clab[cm] == gid
            if is_pit.any():
                aa.append(gid[is_pit])
                bb.append(np.full(int(is_pit.sum()), -1, np.int64))
                kk.append(np.full(int(is_pit.sum()), 2, np.int8))
                vv.append(cv[cm][is_pit])
        if not aa:
            return pa.table({f.name: pa.array([], f.type)
                             for f in FILL_PART_SCHEMA})
        # pre-fold duplicate edge candidates within the tile
        df = pd.DataFrame({"a": np.concatenate(aa),
                           "b": np.concatenate(bb),
                           "k": np.concatenate(kk),
                           "val": np.concatenate(vv)})
        df = (df.groupby(["a", "b", "k"], sort=False)["val"].min()
              .reset_index())
        return pa.table({
            "a": pa.array(df["a"].to_numpy(np.int64), pa.int64()),
            "b": pa.array(df["b"].to_numpy(np.int64), pa.int64()),
            "k": pa.array(df["k"].to_numpy(np.int8), pa.int8()),
            "val": pa.array(df["val"].to_numpy(np.int64), pa.int64()),
        }, schema=FILL_PART_SCHEMA)

    def fold_parts(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["a", "b", "k"], sort=False)["val"]
             .agg(["min", "first"]).reset_index())
        g["val"] = np.where(g["k"].to_numpy() == 2,
                            g["first"].to_numpy(np.int64),
                            g["min"].to_numpy(np.int64))
        return g[["a", "b", "k", "val"]].astype(
            {"a": np.int64, "b": np.int64, "k": np.int8,
             "val": np.int64})

    parts = bucketed_fold(
        frames.groupby("tile_id").map_groups(emit_parts,
                                             batch_format="pyarrow"),
        ["a", "b", "k"], fold_parts).materialize()

    # driver-bounded pulls: edges/drains/pits are basin-graph sized
    # (nodes = pits, edges ~ adjacencies), METADATA next to the raster —
    # the same contract as the flowlen border-node graph. A d>>RAM graph
    # would swap this for the keyed per-block exchange below staying on
    # Datasets; the block solver is already formulated that way.
    pdf = parts.to_pandas()
    E = pdf[pdf["k"] == 0]
    D = pdf[pdf["k"] == 1].groupby("a")["val"].min()
    P = pdf[pdf["k"] == 2].set_index("a")["val"]

    G = max(1, int(math.sqrt((n_tx * n_ty) / max(1, cluster_cpus()))))
    nbx = (n_tx + G - 1) // G
    blk = chunk * G

    def sblock(gid: np.ndarray) -> np.ndarray:
        gy = gid // width
        gx = gid % width
        return ((gy // blk) * nbx + (gx // blk)).astype(np.int64)

    ea = E["a"].to_numpy(np.int64)
    eb = E["b"].to_numpy(np.int64)
    es = E["val"].to_numpy(np.int64)

    basins = np.unique(np.concatenate(
        [ea, eb, D.index.to_numpy(np.int64), P.index.to_numpy(np.int64)]))
    nb_ = len(basins)
    # positional encoding: everything below runs on int arrays, never a
    # pandas scalar lookup (the first version spent ~80 s in .loc)
    ea_i = np.searchsorted(basins, ea)
    eb_i = np.searchsorted(basins, eb)
    bsb = sblock(basins)
    fill = np.full(nb_, INF, np.int64)
    d_i = np.searchsorted(basins, D.index.to_numpy(np.int64))
    fill[d_i] = np.minimum(fill[d_i], D.to_numpy(np.int64))

    blocks = np.unique(bsb)
    sa, sb2 = bsb[ea_i], bsb[eb_i]
    # precompute ONCE per block: CSR internal adjacency, external edge
    # views, and the block-neighbor sets driving the dirty propagation
    intern_of: dict[int, tuple] = {}
    extern_of: dict[int, tuple] = {}
    own_of: dict[int, np.ndarray] = {}
    nbr_blocks: dict[int, set] = {int(s): set() for s in blocks}
    for s in blocks:
        s = int(s)
        own_of[s] = np.nonzero(bsb == s)[0]
        both = (sa == s) & (sb2 == s)
        isrc = np.concatenate([ea_i[both], eb_i[both]])
        idst = np.concatenate([eb_i[both], ea_i[both]])
        iw = np.concatenate([es[both], es[both]])
        order = np.argsort(isrc, kind="stable")
        isrc, idst, iw = isrc[order], idst[order], iw[order]
        # CSR bounds per source basin (built once, reused every round)
        bnd: dict[int, tuple] = {}
        if len(isrc):
            cuts = np.nonzero(np.diff(isrc))[0] + 1
            starts = np.concatenate([[0], cuts])
            ends = np.concatenate([cuts, [len(isrc)]])
            for st, en in zip(starts.tolist(), ends.tolist()):
                bnd[int(isrc[st])] = (st, en)
        intern_of[s] = (idst, iw, bnd)
        xa = (sa == s) & (sb2 != s)
        xb = (sb2 == s) & (sa != s)
        extern_of[s] = (
            np.concatenate([ea_i[xa], eb_i[xb]]),   # own endpoint
            np.concatenate([eb_i[xa], ea_i[xb]]),   # frozen endpoint
            np.concatenate([es[xa], es[xb]]))
        for t_ in np.unique(np.concatenate([sb2[xa], sa[xb]])).tolist():
            nbr_blocks[s].add(int(t_))

    import ray

    @ray.remote(num_cpus=1)
    def solve_block_task(blk_ref, fill_cur):
        own, idst, iw, bnd, xo, xf, xw = blk_ref
        idst_l = idst.tolist()
        iw_l = iw.tolist()
        best = dict(zip(own.tolist(), fill_cur[own].tolist()))
        heap: list = []
        ext = fill_cur[xf]
        lim = np.minimum(np.maximum(xw, ext), INF)
        ok = ext < INF
        for cand, o in zip(lim[ok].tolist(), xo[ok].tolist()):
            heapq.heappush(heap, (cand, o))
        for b, v0 in best.items():
            if v0 < INF:
                heapq.heappush(heap, (v0, b))
        while heap:
            cost, b = heapq.heappop(heap)
            if cost > best[b]:
                continue
            # commit the pop itself: a seed (drain / frozen-external
            # candidate) improves THIS basin, not only its neighbors —
            # without this a basin fed solely by external seeds keeps
            # its prior value and small blocks stall at INF
            if cost < best[b]:
                best[b] = cost
            lohi = bnd.get(b)
            if lohi is None:
                continue
            for i in range(lohi[0], lohi[1]):
                nbr = idst_l[i]
                cand = iw_l[i]
                if cand < cost:
                    cand = cost
                if cand < best[nbr]:
                    best[nbr] = cand
                    heapq.heappush(heap, (cand, nbr))
        new_vals = np.fromiter((best[b] for b in own.tolist()),
                               np.int64, len(own))
        changed = int((new_vals < fill_cur[own]).sum())
        return own, new_vals, changed

    # block structures ship ONCE; each round re-broadcasts only the fill
    # vector (8 bytes/basin). Blocks solve in PARALLEL Ray tasks (block
    # Jacobi — frozen externals per round), and the DIRTY set re-solves
    # only blocks whose frozen inputs could have changed.
    blk_refs = {int(s): ray.put((own_of[int(s)], *intern_of[int(s)],
                                 *extern_of[int(s)]))
                for s in blocks}
    dirty = {int(s) for s in blocks}
    for _ in range(max_rounds):
        if not dirty:
            break
        fill_ref = ray.put(fill)
        futs = {s: solve_block_task.remote(blk_refs[s], fill_ref)
                for s in sorted(dirty)}
        next_dirty: set = set()
        for s, fut in futs.items():
            own, new_vals, changed = ray.get(fut)
            if changed > 0:
                fill[own] = np.minimum(fill[own], new_vals)
                next_dirty |= nbr_blocks[s]
        dirty = next_dirty
    else:  # pragma: no cover - defensive
        raise RuntimeError("basin_fill: block rounds did not converge")

    if (fill >= INF).any():  # pragma: no cover - defensive
        raise RuntimeError("basin_fill: unreachable basin (no drain)")
    pit_v = P.reindex(basins).to_numpy(np.int64)
    fv = fill
    return pa.table({
        "pit": pa.array(basins, pa.int64()),
        "pit_v": pa.array(pit_v, pa.int64()),
        "fill_v": pa.array(fv, pa.int64()),
        "filled_depth": pa.array(fv - pit_v, pa.int64()),
    })


# ---- Strahler stream order (topological wave over the D8 forest) ------------

STRAHLER_MID_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'state' tile blob | 'msg' resolved donor fire
    ("z", pa.binary()),     # state: zlib(codes i8 | order,m,cmax,rem i32)
    ("node", pa.int64()),   # msg: target global cell id
    ("n", pa.int64()),      # msg: donor's resolved Strahler order
    ("sb", pa.int64()),     # spatial super-block (roundk group key)
])

STRAHLER_PARTIAL_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'self' | blur-protocol 2-px strips / corners
    ("v", pa.binary()),
    ("m", pa.binary()),
])

STRAHLER_OUT_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("strahler", pa.int64()),
    ("n_cells", pa.int64()),
])


def _strahler_wave(nxt, ext, order, m, cmax, rem, ready):
    """In-tile topological wave: ``ready`` cells just resolved their
    Strahler order; fire them downstream until the tile quiesces.
    Per hop, donors fold per target as (max order, count attaining max)
    — commutative/associative, so arrival order never matters — and a
    target resolves when its remaining-donor counter hits zero:
    order = m + (cmax >= 2)  (Strahler 1957).  Returns the cross-border
    fires as (global target id, donor order) arrays."""
    out_t: list[np.ndarray] = []
    out_o: list[np.ndarray] = []
    frontier = np.asarray(ready, np.int64)
    for _ in range(len(nxt) + 8):
        if len(frontier) == 0:
            break
        o = order[frontier]
        ex = ext[frontier]
        has_ex = ex >= 0
        if has_ex.any():
            out_t.append(ex[has_ex])
            out_o.append(o[has_ex])
        ni = nxt[frontier]
        sel = ni >= 0
        t, ov = ni[sel], o[sel]
        if len(t) == 0:
            break
        idx = np.lexsort((-ov, t))
        t_s, o_s = t[idx], ov[idx]
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
        rem[u] -= cnt
        newly = u[rem[u] == 0]
        order[newly] = np.maximum(m[newly] + (cmax[newly] >= 2), 1)
        frontier = newly
    else:  # pragma: no cover - defensive
        raise RuntimeError("strahler: in-tile wave did not converge")
    if out_t:
        return np.concatenate(out_t), np.concatenate(out_o)
    return np.empty(0, np.int64), np.empty(0, np.int64)


def _strahler_pack(codes, order, m, cmax, rem):
    return zlib.compress(codes.astype(np.int8).tobytes()
                         + order.astype(np.int32).tobytes()
                         + m.astype(np.int32).tobytes()
                         + cmax.astype(np.int32).tobytes()
                         + rem.astype(np.int32).tobytes(), 1)


def _strahler_unpack(z, c):
    raw = zlib.decompress(z)
    n = c * c
    codes = np.frombuffer(raw[:n], np.int8).astype(np.int64)
    f = [np.frombuffer(raw[n + 4 * n * i:n + 4 * n * (i + 1)],
                       np.int32).astype(np.int64).copy() for i in range(4)]
    return codes, f[0], f[1], f[2], f[3]


def strahler_stats(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                   max_rounds: int = 64):
    """Strahler stream-order histogram per tile — the stream-network
    classification on the D8 flow forest (order(source) = 1; a cell's
    order is the max donor order, +1 when >=2 donors attain that max;
    Strahler 1957). The reference computes DEM derivatives over loaded
    cube windows (`core/accessor.py` load tail); this is the
    whole-mosaic distributed analog of the hardest one: a TOPOLOGICAL
    wave whose per-cell result depends on the full upstream tree.

    Plan: ONE blur-protocol exchange (2-px edge strips + 2x2 corners)
    gives every tile a (c+4)^2 frame, so it derives halo-exact D8 codes
    for itself AND its 1-px ring — external-donor counts are local
    (ring cells that flow inward), no donor-count exchange round.
    Round 0 seeds sources (remaining-donor counter == 0) and runs the
    vectorized in-tile wave; resolved cells crossing a border emit
    O(perimeter) messages (target cell, donor order). Later rounds
    group messages + carried per-tile state blobs by spatial
    SUPER-BLOCK (the flowlen discipline) and chase chains tile-to-tile
    inside the block; the (max, count-of-max, remaining) donor fold is
    commutative, so message arrival order is irrelevant and the result
    is deterministic. State blobs are compressed int8/int32 planes —
    the per-round shuffle is O(tiles), never canvases.

    Output: (tile_id, tx, ty, strahler, n_cells) per order present in
    the tile. Checked against ``fixtures.ensure_strahler_golden`` — a
    serial full-plane wave sharing only the pure ``_flowdir_codes``
    rule — plus random-mosaic oracles in tests.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    c = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty
    width = grid.width

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in STRAHLER_PARTIAL_SCHEMA.names}

        def row(tile, kind, v=b"", m=b""):
            tx, ty = tile
            out["tile_id"].append(f"{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["kind"].append(kind)
            out["v"].append(v)
            out["m"].append(m)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            row((tx, ty), "self", v=px_z[j], m=mask_z[j])
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            v = _vsum(canvas, pack)

            def strip(vs, ms):
                return (np.ascontiguousarray(vs).astype(np.int64).tobytes(),
                        np.ascontiguousarray(ms).astype(np.uint8).tobytes())

            sends = [((tx - 1, ty), "nbr_e", v[:, 0:2], mask[:, 0:2]),
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
                      mask[-2:, -2:])]
            for (ntx, nty), kind, vs, ms in sends:
                if 0 <= ntx < n_tx and 0 <= nty < n_ty:
                    b_, m_ = strip(vs, ms)
                    row((ntx, nty), kind, v=b_, m=m_)
        return pa.table(out, schema=STRAHLER_PARTIAL_SCHEMA)

    def _place4(P, M, kind, vs, ms):
        if kind == "nbr_n":
            P[0:2, 2:c + 2], M[0:2, 2:c + 2] = (vs.reshape(2, c),
                                                ms.reshape(2, c))
        elif kind == "nbr_s":
            P[c + 2:c + 4, 2:c + 2], M[c + 2:c + 4, 2:c + 2] = \
                vs.reshape(2, c), ms.reshape(2, c)
        elif kind == "nbr_w":
            P[2:c + 2, 0:2], M[2:c + 2, 0:2] = (vs.reshape(c, 2),
                                                ms.reshape(c, 2))
        elif kind == "nbr_e":
            P[2:c + 2, c + 2:c + 4], M[2:c + 2, c + 2:c + 4] = \
                vs.reshape(c, 2), ms.reshape(c, 2)
        elif kind == "nbr_nw_c":
            P[0:2, 0:2], M[0:2, 0:2] = vs.reshape(2, 2), ms.reshape(2, 2)
        elif kind == "nbr_ne_c":
            P[0:2, c + 2:c + 4], M[0:2, c + 2:c + 4] = \
                vs.reshape(2, 2), ms.reshape(2, 2)
        elif kind == "nbr_sw_c":
            P[c + 2:c + 4, 0:2], M[c + 2:c + 4, 0:2] = \
                vs.reshape(2, 2), ms.reshape(2, 2)
        elif kind == "nbr_se_c":
            P[c + 2:c + 4, c + 2:c + 4], M[c + 2:c + 4, c + 2:c + 4] = \
                vs.reshape(2, 2), ms.reshape(2, 2)

    import math

    from ..util import cluster_cpus

    G = max(1, int(math.sqrt((n_tx * n_ty) / max(1, 2 * cluster_cpus()))))
    nbx = (n_tx + G - 1) // G

    def _mid_row(out, tx, ty, kind, z=b"", node=-1, n=0):
        out["tile_id"].append(f"{tx}-{ty}")
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["kind"].append(kind)
        out["z"].append(z)
        out["node"].append(int(node))
        out["n"].append(int(n))
        out["sb"].append((ty // G) * nbx + tx // G)

    def round0(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        out: dict[str, list] = {k: [] for k in STRAHLER_MID_SCHEMA.names}
        if "self" not in kinds:
            return pa.table(out, schema=STRAHLER_MID_SCHEMA)
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        P = np.zeros((c + 4, c + 4), np.int64)
        M = np.zeros((c + 4, c + 4), bool)
        for j, kind in enumerate(kinds):
            if kind == "self":
                canvas = pack.from_bytes(
                    zlib.decompress(g.column("v")[j].as_py()), c, c)
                mask = np.frombuffer(
                    zlib.decompress(g.column("m")[j].as_py()),
                    np.uint8).reshape(c, c).astype(bool)
                P[2:c + 2, 2:c + 2] = _vsum(canvas, pack)
                M[2:c + 2, 2:c + 2] = mask
            else:
                vs = np.frombuffer(g.column("v")[j].as_py(), np.int64)
                ms = np.frombuffer(g.column("m")[j].as_py(),
                                   np.uint8).astype(bool)
                _place4(P, M, kind, vs, ms)
        # codes for self + 1-px ring: every (c+2)^2 interior cell's 3x3
        # is exact inside the (c+4)^2 frame
        codes_ring = _flowdir_codes(P, M)          # (c+2, c+2)
        codes = codes_ring[1:-1, 1:-1]             # (c, c) self
        valid = codes.ravel() >= 0
        if not valid.any():
            return pa.table(out, schema=STRAHLER_MID_SCHEMA)
        gy0, gx0 = ty * c, tx * c
        nxt, ext = _acc_nxt_ext(codes, c, gy0, gx0, width)
        rem = np.bincount(nxt[nxt >= 0], minlength=c * c).astype(np.int64)
        # external donors: ring cells whose D8 code points INTO the tile;
        # their resolved orders arrive later as messages
        ring = np.ones((c + 2, c + 2), bool)
        ring[1:-1, 1:-1] = False
        rpos = np.nonzero(ring.ravel())[0]
        rcode = codes_ring.ravel()[rpos]
        sel = rcode >= 0
        rr0, cc0 = np.divmod(rpos[sel], c + 2)
        for k, (dr, dc_) in _D8_OFF.items():
            ks = rcode[sel] == k
            if not ks.any():
                continue
            tr, tc = rr0[ks] + dr, cc0[ks] + dc_
            into = (tr >= 1) & (tr <= c) & (tc >= 1) & (tc <= c)
            if into.any():
                tgt = (tr[into] - 1) * c + (tc[into] - 1)
                np.add.at(rem, tgt, 1)
        order = np.zeros(c * c, np.int64)
        m = np.zeros(c * c, np.int64)
        cmax = np.zeros(c * c, np.int64)
        ready = np.nonzero(valid & (rem == 0))[0]
        order[ready] = 1
        wt, wo = _strahler_wave(nxt, ext, order, m, cmax, rem, ready)
        _mid_row(out, tx, ty, "state",
                 z=_strahler_pack(codes.ravel(), order, m, cmax, rem))
        for t_, o_ in zip(wt, wo):
            _mid_row(out, tx, ty, "msg", node=t_, n=o_)
        return pa.table(out, schema=STRAHLER_MID_SCHEMA)

    mid = (tiles_ds.select_columns(["tile_id", "tx", "ty", "px_z", "mask_z"])
           .map_batches(emit, batch_format="pyarrow", batch_size=64)
           .groupby("tile_id").map_groups(round0, batch_format="pyarrow")
           .materialize())

    states = mid.filter(expr="kind == 'state'").materialize()
    msgs = mid.filter(expr="kind == 'msg'") \
              .select_columns(["node", "n"]).materialize()

    # ---- cross-tile rounds as raw Ray tasks over per-super-block state
    # refs (the costdist/flowaccum discipline): per-round Dataset plan
    # overhead dominated late rounds with a handful of pending donor
    # messages. States and initial messages co-locate per block with one
    # shuffle each; message bundles live in the object store with the
    # driver routing only (bundle ref -> dst block) metadata.
    import ray

    def add_sb_msgs(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy()
        tx = (node % width) // c
        ty = (node // width) // c
        sb = (ty // G) * nbx + tx // G
        return pa.table({"node": t.column("node"), "n": t.column("n"),
                         "sb": pa.array(sb, pa.int64())})

    states_grp = (states.groupby("sb")
                  .map_groups(lambda g: g, batch_format="pyarrow")
                  .materialize())
    init_m = (msgs.map_batches(add_sb_msgs, batch_format="pyarrow")
              .groupby("sb")
              .map_groups(lambda g: g, batch_format="pyarrow")
              .materialize())

    @ray.remote
    def probe_sbs(tbl):
        if tbl.num_rows == 0 or "sb" not in tbl.column_names:
            return []
        return sorted(set(tbl.column("sb").to_pylist()))

    def _by_sb(ds):
        refs = ds.to_arrow_refs()
        out: dict[int, list] = {}
        for sbs, r in zip(ray.get([probe_sbs.remote(r) for r in refs]),
                          refs):
            for sb in sbs:
                out.setdefault(sb, []).append(r)
        return out

    state_src = _by_sb(states_grp)
    init_src = _by_sb(init_m)

    @ray.remote(num_returns=3)
    def solve_sb(state_blks, state, sb, bundle_refs):
        if state is None:
            st: dict[tuple, list] = {}
            for tbl in ray.get(list(state_blks)):
                txs = tbl.column("tx").to_numpy()
                tys = tbl.column("ty").to_numpy()
                sbs_ = tbl.column("sb").to_numpy()
                for j in range(len(tbl)):
                    if int(sbs_[j]) != sb:
                        continue
                    st[(int(txs[j]), int(tys[j]))] = list(
                        _strahler_unpack(tbl.column("z")[j].as_py(), c))
        else:
            # plasma arrays are read-only; order/m/cmax/rem mutate
            st = {k: [v[0], v[1].copy(), v[2].copy(), v[3].copy(),
                      v[4].copy()] for k, v in state.items()}

        pending: dict[tuple, list] = {}

        def add_msgs(nodes_arr, ns_arr):
            txa = (nodes_arr % width) // c
            tya = (nodes_arr // width) // c
            packed = tya * np.int64(n_tx) + txa
            for p in np.unique(packed):
                mm = packed == p
                key2 = (int(p % n_tx), int(p // n_tx))
                q = pending.setdefault(key2, [[], []])
                q[0].extend(nodes_arr[mm].tolist())
                q[1].extend(ns_arr[mm].tolist())

        for bundle in ray.get(list(bundle_refs)):
            if isinstance(bundle, list):  # round bundle: (dst, node, n)
                rows = [(n_, o_) for s_, n_, o_ in bundle if s_ == sb]
                if rows:
                    arr = np.asarray(rows, np.int64)
                    add_msgs(arr[:, 0], arr[:, 1])
            else:  # init message block (arrow, sb-tagged)
                mm = bundle.column("sb").to_numpy() == sb
                if mm.any():
                    add_msgs(bundle.column("node").to_numpy()[mm],
                             bundle.column("n").to_numpy()[mm])

        cache: dict[tuple, tuple] = {}
        out: list[tuple] = []
        for _pop in range(1_000_000):  # defensive; v decreases per hop
            if not pending:
                break
            (ttx, tty), (nodes, ns) = pending.popitem()
            if (ttx, tty) not in st:  # pragma: no cover - defensive
                raise RuntimeError(
                    "strahler: message entered stateless tile")
            codes, order, m, cmax, rem = st[(ttx, tty)]
            if (ttx, tty) not in cache:
                cache[(ttx, tty)] = _acc_nxt_ext(
                    codes.reshape(c, c), c, tty * c, ttx * c, width)
            nxt, ext = cache[(ttx, tty)]
            node_a = np.asarray(nodes, np.int64)
            tgt = ((node_a // width - tty * c) * c
                   + (node_a % width - ttx * c))
            ov = np.asarray(ns, np.int64)
            # fold the arrived donors per target, then resolve
            idx = np.lexsort((-ov, tgt))
            t_s, o_s = tgt[idx], ov[idx]
            starts = np.r_[0, np.nonzero(np.diff(t_s))[0] + 1]
            u = t_s[starts]
            omax = o_s[starts]
            seg = np.repeat(np.arange(len(starts)),
                            np.diff(np.r_[starts, len(t_s)]))
            kmax = np.add.reduceat((o_s == omax[seg]).astype(np.int64),
                                   starts)
            cnt = np.add.reduceat(np.ones(len(t_s), np.int64), starts)
            gt = omax > m[u]
            eq = omax == m[u]
            cmax[u] = np.where(gt, kmax,
                               np.where(eq, cmax[u] + kmax, cmax[u]))
            m[u] = np.maximum(m[u], omax)
            rem[u] -= cnt
            newly = u[rem[u] == 0]
            order[newly] = np.maximum(m[newly] + (cmax[newly] >= 2), 1)
            wt, wo = _strahler_wave(nxt, ext, order, m, cmax, rem, newly)
            if not len(wt):
                continue
            etx = (wt % width) // c
            ety = (wt // width) // c
            esb = (ety // G) * nbx + etx // G
            stay = esb == sb
            for t_, o_, s_ in zip(wt[~stay], wo[~stay], esb[~stay]):
                out.append((int(s_), int(t_), int(o_)))
            if stay.any():
                add_msgs(wt[stay], wo[stay])
        else:  # pragma: no cover - defensive
            raise RuntimeError("strahler: in-block chase did not converge")
        return st, out, sorted({o[0] for o in out})

    state_refs: dict[int, object] = {}
    pending_refs: dict[int, list] = {}
    for sb, refs in init_src.items():
        if sb in state_src:
            pending_refs[sb] = list(refs)
    for _r in range(max_rounds):
        if not pending_refs:
            break
        futs = {}
        for sb, brefs in pending_refs.items():
            stt = state_refs.get(sb)
            blks = state_src[sb] if stt is None else None
            sref, oref, dref = solve_sb.remote(blks, stt, sb, brefs)
            state_refs[sb] = sref
            futs[sb] = (oref, dref)
        pending_refs = {}
        for (oref, _), dsts in zip(
                futs.values(), ray.get([d for _, d in futs.values()])):
            for dst in dsts:
                if dst in state_src:  # msgs to absent blocks drop
                    pending_refs.setdefault(dst, []).append(oref)
    else:  # pragma: no cover - defensive
        raise RuntimeError("strahler: cross-tile rounds did not converge")

    @ray.remote
    def finish_sb(state_blks, state, sb):
        if state is None:
            st = {}
            for tbl in ray.get(list(state_blks)):
                txs = tbl.column("tx").to_numpy()
                tys = tbl.column("ty").to_numpy()
                sbs_ = tbl.column("sb").to_numpy()
                for j in range(len(tbl)):
                    if int(sbs_[j]) != sb:
                        continue
                    st[(int(txs[j]), int(tys[j]))] = _strahler_unpack(
                        tbl.column("z")[j].as_py(), c)
        else:
            st = state
        out: dict[str, list] = {k: [] for k in STRAHLER_OUT_SCHEMA.names}
        for (ttx, tty) in sorted(st):
            codes, order, _m, _cm, _rem = st[(ttx, tty)]
            valid = codes >= 0
            if (valid & (order == 0)).any():  # pragma: no cover
                raise RuntimeError("strahler: unresolved cells (cycle?)")
            o = order[valid]
            if not len(o):
                continue
            bc = np.bincount(o)
            for s in np.nonzero(bc)[0]:
                out["tile_id"].append(f"{ttx}-{tty}")
                out["tx"].append(ttx)
                out["ty"].append(tty)
                out["strahler"].append(int(s))
                out["n_cells"].append(int(bc[s]))
        return pa.table(out, schema=STRAHLER_OUT_SCHEMA)

    import ray.data as _rd

    tabs = [finish_sb.remote(None if sb in state_refs else state_src[sb],
                             state_refs.get(sb), sb)
            for sb in sorted(state_src)]
    if not tabs:
        return _rd.from_arrow(pa.table(
            {k: [] for k in STRAHLER_OUT_SCHEMA.names},
            schema=STRAHLER_OUT_SCHEMA))
    return _rd.from_arrow_refs(tabs)


# ---- Least-cost distance surface (friction-weighted Dijkstra) ----------------

COST_INF = np.int64(1) << 62

COSTDIST_MID_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("kind", pa.string()),  # 'state' | strip 'msg_{n,s,w,e,nw,ne,sw,se}'
    ("z", pa.binary()),     # state: zlib(v i64 | mask u8 | dist i64)
                            # msg: packed (dist i64 strip | v i64 strip)
    ("sb", pa.int64()),
])

COSTDIST_OUT_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("n_reach", pa.int64()),
    ("dist_sum", pa.int64()),
    ("dist_max", pa.int64()),
])


def _minplus_scan(d: np.ndarray, v: np.ndarray, m: np.ndarray,
                  cap: np.int64) -> None:
    """In-place forward min-plus scan along one row:
    d[i] <- min(d[i], min over run-connected j < i of d[j] + step(j..i))
    with step(a, a+1) = (v[a] + v[a+1]) * 2. Invalid cells break runs.
    Vectorized via the segment-offset cummin trick: X = min(d, cap) - S
    (S = prefix step sum), Y = X - seg*K with K > range(X), so a value
    from an earlier run can never win the running min. ``cap`` must
    exceed every true distance (it stands in for unreached INF inside
    the scan; candidates >= cap are discarded, so reachability is
    exact)."""
    w = len(d)
    step = np.empty(w, np.int64)
    step[0] = 0
    step[1:] = (v[:-1] + v[1:]) * 2
    S = np.cumsum(step)
    X = np.where(m, np.minimum(d, cap) - S, cap)
    rs = m.copy()
    rs[1:] = m[1:] & ~m[:-1]
    seg = np.cumsum(rs)
    K = cap + (S[-1] if w else 0) + 1
    R = np.minimum.accumulate(X - seg * K) + seg * K
    cand = S + R
    np.minimum(d, cand, out=d, where=m & (cand < cap))


def _cost_solve(D: np.ndarray, V: np.ndarray, M: np.ndarray) -> bool:
    """Fast-Sweeping least-cost fixpoint on one frame: relax
    dist(b) <- min(dist(b), dist(a) + (v(a)+v(b))*w) over the 8
    neighbors (w = 2 axis, 3 diagonal; all int64-exact). Each iteration
    runs two Gauss-Seidel sweeps — top->bottom and bottom->top — where
    every row first relaxes from the adjacent already-swept row
    (vertical + both diagonals, vectorized) and then runs BOTH in-row
    segmented min-plus scans, so each sweep resolves whole monotone
    path quadrants at once (random cost fields converge in a handful of
    iterations instead of one per direction change). The shortest-path
    fixpoint is unique, so sweep order never affects the result.
    Invalid cells stay at COST_INF and never relay. Mutates D in place;
    returns True if anything changed."""
    h, w = D.shape
    D[~M] = COST_INF
    if not M.any():
        return False
    vmax = max(int(V[M].max()), 1)
    # Cap must exceed every true finite distance that can appear while
    # solving THIS plane.  In cross-tile rounds the border cells carry
    # globally accumulated distances (seeded tiles far away), which can
    # meet or exceed the pure local bound h*w*6*vmax — a cap based only
    # on the local plane would treat those incoming distances as
    # unreached inside _minplus_scan and silently drop them.  Any
    # distance resolvable in this solve is <= (max finite D already in
    # the plane) + (worst-case in-plane path cost), so base the cap on
    # the current state.
    finite = M & (D < COST_INF)
    base = np.int64(D[finite].max()) if finite.any() else np.int64(0)
    cap = base + np.int64(h) * np.int64(w) * 6 * vmax + 1
    changed_any = False
    for _ in range(h + w + 8):
        before = D.copy()
        for r in range(h):
            if r > 0:
                up, vv = D[r - 1], V[r - 1]
                cand = up + (vv + V[r]) * 2
                if w > 1:
                    cand[1:] = np.minimum(cand[1:],
                                          up[:-1] + (vv[:-1] + V[r, 1:]) * 3)
                    cand[:-1] = np.minimum(cand[:-1],
                                           up[1:] + (vv[1:] + V[r, :-1]) * 3)
                np.minimum(D[r], cand, out=D[r], where=M[r])
            _minplus_scan(D[r], V[r], M[r], cap)
            _minplus_scan(D[r][::-1], V[r][::-1], M[r][::-1], cap)
        for r in range(h - 2, -1, -1):
            dn, vv = D[r + 1], V[r + 1]
            cand = dn + (vv + V[r]) * 2
            if w > 1:
                cand[1:] = np.minimum(cand[1:],
                                      dn[:-1] + (vv[:-1] + V[r, 1:]) * 3)
                cand[:-1] = np.minimum(cand[:-1],
                                       dn[1:] + (vv[1:] + V[r, :-1]) * 3)
            np.minimum(D[r], cand, out=D[r], where=M[r])
            _minplus_scan(D[r], V[r], M[r], cap)
            _minplus_scan(D[r][::-1], V[r][::-1], M[r][::-1], cap)
        if np.array_equal(D, before):
            break
        changed_any = True
    else:  # pragma: no cover - defensive
        raise RuntimeError("costdist: sweep fixpoint did not converge")
    return changed_any


def _cost_seed_pixels(points: pa.Table, grid: GridSpec):
    """Seed pixel (row, col) per point (box centers, the point_sample
    derivation); out-of-grid points drop."""
    x = (points.column("lon_min").to_numpy()
         + points.column("lon_max").to_numpy()) / 2.0
    y = (points.column("lat_min").to_numpy()
         + points.column("lat_max").to_numpy()) / 2.0
    col = np.floor((x - grid.x0) / grid.res).astype(np.int64)
    row = np.floor((grid.y1 - y) / grid.res).astype(np.int64)
    ok = ((col >= 0) & (col < grid.width)
          & (row >= 0) & (row < grid.height))
    return row[ok], col[ok]


def costdist_stats(tiles_ds, grid: GridSpec, points: pa.Table,
                   pack: ChannelPack | None = None, max_rounds: int = 256):
    """Least-cost (friction-weighted) distance surface from a seed point
    set — the cost-distance / accumulated-friction GIS op (reachability,
    catchment carving, travel-time surrogates). Cost of stepping a -> b
    is (v(a) + v(b)) * w with w = 2 axis / 3 diagonal (the exact-integer
    1 : 1.5 metric); seeds (zone centers, the point_sample derivation)
    start at 0; invalid cells are impassable. dist = min over paths —
    a shortest-path fixpoint, so the result is unique and deterministic
    regardless of relaxation order.

    Plan: decode + ONE shuffle assembles each spatial SUPER-BLOCK's
    (value, mask) plane exactly once; the iterative fixpoint then runs
    as raw Ray tasks over per-block plane refs held in the object store
    (VERDICT r4 #3 — the Dataset-per-round formulation paid ~1.3 s of
    driver plan/materialize overhead per round even with ONE pending
    strip; 12 rounds = 16 s of pure bookkeeping at sf0.1). Each round
    re-solves ONLY the dirty blocks (those with pending strips — exact
    dirty tracking falls out of the message routing), a block solve is
    one Gauss-Seidel sweep fixpoint over the assembled plane, and
    blocks exchange 1-px border strips (dist + v) with their 8 tile
    neighbors across block edges. dist is integer and monotone
    non-increasing, so rounds terminate; strips to absent tiles relax
    nothing and strips to absent blocks drop. Only O(perimeter) strip
    bytes flow per round (routed via the driver — bounded by the active
    wavefront, not the raster); the static (value, mask) plane ref is
    stored once and every round passes refs, so canvases never move
    after assembly. This is the documented drop-to-raw-Ray case: a
    sparse iterative stencil whose per-round activity set the Dataset
    API cannot express without paying a full plan execution per round.

    Output: (tile_id, tx, ty, n_reach, dist_sum, dist_max) per tile with
    >= 1 reached cell. Checked against ``fixtures.ensure_costdist_golden``
    (an independently-coded full-plane sweep fixpoint) and a true heapq
    Dijkstra oracle on random mosaics in tests.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    c = grid.chunk
    n_tx, n_ty = grid.n_tx, grid.n_ty

    srow, scol = _cost_seed_pixels(points, grid)

    import math

    from ..util import cluster_cpus

    G = max(1, int(math.sqrt((n_tx * n_ty) / max(1, 2 * cluster_cpus()))))
    nbx = (n_tx + G - 1) // G

    def _sb(tx, ty):
        return (ty // G) * nbx + tx // G

    # strips: (dist row/col, v row/col) along each side; corners 1 px
    _SIDES = {"n": (0, slice(None)), "s": (c - 1, slice(None)),
              "w": (slice(None), 0), "e": (slice(None), c - 1)}
    _CORN = {"nw": (0, 0), "ne": (0, c - 1),
             "sw": (c - 1, 0), "se": (c - 1, c - 1)}
    # side -> (neighbor delta, the kind the RECEIVER sees)
    _SENDS = [("n", (0, -1), "msg_s"), ("s", (0, 1), "msg_n"),
              ("w", (-1, 0), "msg_e"), ("e", (1, 0), "msg_w"),
              ("nw", (-1, -1), "msg_se"), ("ne", (1, -1), "msg_sw"),
              ("sw", (-1, 1), "msg_ne"), ("se", (1, 1), "msg_nw")]

    def _strips(V, D):
        got = {}
        for s, ix in _SIDES.items():
            got[s] = (np.ascontiguousarray(D[ix]).tobytes()
                      + np.ascontiguousarray(V[ix]).tobytes())
        for s, ix in _CORN.items():
            got[s] = (D[ix].tobytes() + V[ix].tobytes())
        return got

    def _apply_strip(D, V, M, kind, z):
        """Relax the receiving tile's border cells from a neighbor strip;
        returns True if any cell improved."""
        side = kind[4:]
        if side in ("n", "s", "w", "e"):
            nd = np.frombuffer(z[:8 * c], np.int64)
            nv = np.frombuffer(z[8 * c:], np.int64)
            if side == "n":       # strip = neighbor's SOUTH row; my row 0
                r = 0
                dd, vv, mm = D[r], V[r], M[r]
            elif side == "s":
                r = c - 1
                dd, vv, mm = D[r], V[r], M[r]
            elif side == "w":
                dd, vv, mm = D[:, 0], V[:, 0], M[:, 0]
            else:
                dd, vv, mm = D[:, c - 1], V[:, c - 1], M[:, c - 1]
            cand = nd + (nv + vv) * 2                     # aligned axis step
            cand = np.minimum(cand, COST_INF)
            shl = np.empty_like(cand)                     # diagonal steps
            shl[0] = COST_INF
            shl[1:] = np.minimum(nd[:-1] + (nv[:-1] + vv[1:]) * 3,
                                 COST_INF)
            shr = np.empty_like(cand)
            shr[-1] = COST_INF
            shr[:-1] = np.minimum(nd[1:] + (nv[1:] + vv[:-1]) * 3,
                                  COST_INF)
            cand = np.minimum(cand, np.minimum(shl, shr))
            imp = mm & (cand < dd)
            if imp.any():
                np.minimum(dd, cand, out=dd, where=mm)
                return True
            return False
        # corner: single diagonal step
        nd = np.frombuffer(z[:8], np.int64)[0]
        nv = np.frombuffer(z[8:], np.int64)[0]
        tgt = {"nw": (0, 0), "ne": (0, c - 1),
               "sw": (c - 1, 0), "se": (c - 1, c - 1)}[side]
        if not M[tgt]:
            return False
        cand = min(nd + (nv + int(V[tgt])) * 3, int(COST_INF))
        if cand < D[tgt]:
            D[tgt] = cand
            return True
        return False

    # ---- per-tile decode -> (tx, ty, sb, z = zlib(V | M)) --------------
    TILE_SCHEMA = pa.schema([("tx", pa.int64()), ("ty", pa.int64()),
                             ("sb", pa.int64()), ("z", pa.binary())])

    def decode(t: pa.Table) -> pa.Table:
        out = {"tx": [], "ty": [], "sb": [], "z": []}
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), c, c)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(c, c).astype(bool)
            if not mask.any():
                continue  # impassable everywhere: nothing ever relaxes
            V = _vsum(canvas, pack)
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["sb"].append(_sb(tx, ty))
            out["z"].append(zlib.compress(
                V.astype(np.int64).tobytes()
                + mask.astype(np.uint8).tobytes(), 1))
        return pa.table(out, schema=TILE_SCHEMA)

    def _sb_window(sb):
        bx, by = sb % nbx, sb // nbx
        tx0, ty0 = bx * G, by * G
        return tx0, ty0, min(G, n_tx - tx0), min(G, n_ty - ty0)

    def pack_plane(g: pa.Table) -> pa.Table:
        """One row per super-block: the assembled (V, M) plane."""
        sb = int(g.column("sb")[0].as_py())
        tx0, ty0, gw, gh = _sb_window(sb)
        PV = np.zeros((gh * c, gw * c), np.int64)
        PM = np.zeros((gh * c, gw * c), np.uint8)
        txs = g.column("tx").to_numpy()
        tys = g.column("ty").to_numpy()
        n = c * c
        for j in range(len(g)):
            raw = zlib.decompress(g.column("z")[j].as_py())
            oy, ox = (int(tys[j]) - ty0) * c, (int(txs[j]) - tx0) * c
            PV[oy:oy + c, ox:ox + c] = \
                np.frombuffer(raw[:8 * n], np.int64).reshape(c, c)
            PM[oy:oy + c, ox:ox + c] = \
                np.frombuffer(raw[8 * n:], np.uint8).reshape(c, c)
        return pa.table({
            "sb": pa.array([sb], pa.int64()),
            "z": pa.array([zlib.compress(PV.tobytes() + PM.tobytes(), 1)],
                          pa.binary())})

    def _unpack_plane(tbl: pa.Table, sb: int):
        j = tbl.column("sb").to_pylist().index(sb)
        tx0, ty0, gw, gh = _sb_window(sb)
        n = gh * c * gw * c
        raw = zlib.decompress(tbl.column("z")[j].as_py())
        PV = np.frombuffer(raw[:8 * n], np.int64).reshape(gh * c, gw * c)
        PM = np.frombuffer(raw[8 * n:], np.uint8) \
            .reshape(gh * c, gw * c).astype(bool)
        return PV, PM

    def _out_strips(sb, PV, PD, PDb):
        """Changed (vs PDb; finite-bearing on the PDb=None first round)
        outgoing strips from this block's border tiles to out-of-block
        tile neighbors: list of (dst_sb, ntx, nty, kind, bytes)."""
        tx0, ty0, gw, gh = _sb_window(sb)
        out = []
        for tty in range(ty0, ty0 + gh):
            for ttx in range(tx0, tx0 + gw):
                if not (ttx in (tx0, tx0 + gw - 1)
                        or tty in (ty0, ty0 + gh - 1)):
                    continue  # interior tile: every neighbor in-block
                oy, ox = (tty - ty0) * c, (ttx - tx0) * c
                st = stb = None
                for side, (dx, dy), rkind in _SENDS:
                    ntx, nty = ttx + dx, tty + dy
                    if not (0 <= ntx < n_tx and 0 <= nty < n_ty):
                        continue
                    if _sb(ntx, nty) == sb:
                        continue
                    if st is None:
                        st = _strips(PV[oy:oy + c, ox:ox + c],
                                     PD[oy:oy + c, ox:ox + c])
                    if PDb is None:
                        nd_len = 8 * c if side in _SIDES else 8
                        nd = np.frombuffer(st[side][:nd_len], np.int64)
                        if (nd < COST_INF).any():
                            out.append((_sb(ntx, nty), ntx, nty, rkind,
                                        st[side]))
                    else:
                        if stb is None:
                            stb = _strips(PV[oy:oy + c, ox:ox + c],
                                          PDb[oy:oy + c, ox:ox + c])
                        if st[side] != stb[side]:
                            out.append((_sb(ntx, nty), ntx, nty, rkind,
                                        st[side]))
        return out

    import ray

    # Strip bundles live in the OBJECT STORE: each solve returns its
    # outgoing strips as one plasma object plus a tiny destination list;
    # the driver routes only (src ref -> dst block) metadata and the
    # receiving task filters the bundle for its own block. Strip BYTES
    # never touch the driver — the wavefront can be arbitrarily wide
    # without a driver bottleneck (read amplification is <= 8 neighbor
    # blocks per bundle, all worker-side zero-copy reads).

    @ray.remote(num_returns=4)
    def solve_first(tbl, sb):
        PV, PM = _unpack_plane(tbl, sb)
        tx0, ty0, gw, gh = _sb_window(sb)
        PD = np.full(PV.shape, COST_INF, np.int64)
        r0, c0 = ty0 * c, tx0 * c
        inb = ((srow >= r0) & (srow < r0 + gh * c)
               & (scol >= c0) & (scol < c0 + gw * c))
        if inb.any():
            lr, lc = srow[inb] - r0, scol[inb] - c0
            ok = PM[lr, lc]
            PD[lr[ok], lc[ok]] = 0
        _cost_solve(PD, PV, PM)
        out = _out_strips(sb, PV, PD, None)
        return (PV, PM), PD, out, sorted({m[0] for m in out})

    @ray.remote(num_returns=3)
    def solve_round(vm, PD0, sb, msg_refs):
        PV, PM = vm
        PD = PD0.copy()  # plasma arrays are read-only
        tx0, ty0, _gw, _gh = _sb_window(sb)
        touched = False
        for bundle in ray.get(list(msg_refs)):
            for (dst, ntx, nty, kind, z) in bundle:
                if dst != sb:
                    continue  # bundle shared with other destinations
                oy, ox = (nty - ty0) * c, (ntx - tx0) * c
                touched |= _apply_strip(PD[oy:oy + c, ox:ox + c],
                                        PV[oy:oy + c, ox:ox + c],
                                        PM[oy:oy + c, ox:ox + c], kind, z)
        if not touched:
            return PD0, [], []
        _cost_solve(PD, PV, PM)
        out = _out_strips(sb, PV, PD, PD0)
        return PD, out, sorted({m[0] for m in out})

    @ray.remote
    def finish_sb(vm, PD, sb):
        _PV, _PM = vm
        out: dict[str, list] = {k: [] for k in COSTDIST_OUT_SCHEMA.names}
        tx0, ty0, gw, gh = _sb_window(sb)
        for tty in range(ty0, ty0 + gh):
            for ttx in range(tx0, tx0 + gw):
                oy, ox = (tty - ty0) * c, (ttx - tx0) * c
                Dt = PD[oy:oy + c, ox:ox + c]
                reach = Dt < COST_INF
                if not reach.any():
                    continue
                d = Dt[reach]
                out["tile_id"].append(f"{ttx}-{tty}")
                out["tx"].append(ttx)
                out["ty"].append(tty)
                out["n_reach"].append(int(reach.sum()))
                out["dist_sum"].append(int(d.sum()))
                out["dist_max"].append(int(d.max()))
        return pa.table(out, schema=COSTDIST_OUT_SCHEMA)

    import ray.data as rd

    planes = (tiles_ds
              .select_columns(["tile_id", "tx", "ty", "px_z", "mask_z"])
              .map_batches(decode, batch_format="pyarrow", batch_size=16)
              .groupby("sb")
              .map_groups(pack_plane, batch_format="pyarrow")
              .materialize())

    if int(planes.count()) == 0:
        return rd.from_arrow(pa.table(
            {k: [] for k in COSTDIST_OUT_SCHEMA.names},
            schema=COSTDIST_OUT_SCHEMA))

    @ray.remote
    def probe(tbl):
        return tbl.column("sb").to_pylist()

    refs = planes.to_arrow_refs()
    sb_src: dict[int, object] = {}
    for sbs, r in zip(ray.get([probe.remote(r) for r in refs]), refs):
        for sb in sbs:
            sb_src[sb] = r

    import os as _os
    import sys as _sys
    import time as _t
    _dbg = _os.environ.get("RAYGEO_COSTDIST_DEBUG")

    vm_refs: dict[int, object] = {}
    d_refs: dict[int, object] = {}
    routes = {}
    for sb, bref in sb_src.items():
        vmr, dr, mr, rr = solve_first.remote(bref, sb)
        vm_refs[sb] = vmr
        d_refs[sb] = dr
        routes[sb] = (mr, rr)

    def _route(route_futs):
        """dst block -> bundle refs targeting it; only the tiny dst
        lists are fetched — strip bytes stay in the object store."""
        pend: dict[int, list] = {}
        dsts = ray.get([r for _, r in route_futs.values()])
        for (mr, _), dst_list in zip(route_futs.values(), dsts):
            for dst in dst_list:
                if dst in vm_refs:  # strips to absent blocks drop
                    pend.setdefault(dst, []).append(mr)
        return pend

    pending = _route(routes)
    for _r in range(max_rounds):
        if _dbg:
            print(f"[costdist] round {_r}: {len(pending)} dirty blocks "
                  f"{_t.strftime('%H:%M:%S')}", file=_sys.stderr, flush=True)
        if not pending:
            break
        futs = {}
        for sb, msg_refs in pending.items():
            dr, mr, rr = solve_round.remote(vm_refs[sb], d_refs[sb], sb,
                                            msg_refs)
            d_refs[sb] = dr
            futs[sb] = (mr, rr)
        pending = _route(futs)
    else:  # pragma: no cover - defensive
        raise RuntimeError("costdist: cross-tile rounds did not converge")

    tabs = [finish_sb.remote(vm_refs[sb], d_refs[sb], sb)
            for sb in sorted(vm_refs)]
    return rd.from_arrow_refs(tabs)


# ---- Stream-link extraction (hydrology network segmentation) -----------------

STREAMLINK_OUT_SCHEMA = pa.schema([
    ("link_id", pa.int64()),
    ("n_cells", pa.int64()),
    ("acc_max", pa.int64()),
])


def stream_links(tiles_ds, grid: GridSpec, pack: ChannelPack | None = None,
                 channel_t: int = 5):
    """Stream-LINK extraction — the network segmentation that completes
    the hydrology chain (flowdir → flowlen → flowaccum → watershed →
    saddles → fill → Strahler → links): channel cells
    (``acc >= channel_t``) partition into maximal chains broken at
    confluences; an edge u→v joins one link iff BOTH are channel cells
    and v has exactly ONE channel donor (>=2 channel donors = a
    junction, which starts a new link). Link identity = the component's
    minimum global cell id (deterministic).

    Plan: acc + code planes ride out of ``flowaccum_stats(planes=True)``
    (no second canvas exchange); each tile emits donor PAIRS
    (target gid, donor gid) for its channel cells — in-tile and
    cross-border alike, keyed by the TARGET's tile — so one keyed group
    per tile counts channel donors and emits the link edges
    (O(channel cells) rows, never a plane); edges resolve to components
    with the Dataset-resident min-label machinery
    (``graph.connected_components_pairs``); isolated channel cells
    become their own links via a left-attach of reps onto the channel
    cell table (coarse-bucket, no per-key groupby).

    Output: (link_id, n_cells, acc_max) per link. Checked against a
    serial full-plane walk + union-find golden
    (``fixtures.ensure_streamlinks_golden``) and random-mosaic oracles.
    """
    import pandas as pd
    import ray.data as rd

    from ..util import bucketed_fold
    from .graph import connected_components_pairs

    pack = pack or ChannelPack(RGB_CHANNELS)
    c = grid.chunk
    width = grid.width

    planes = flowaccum_stats(tiles_ds, grid, pack,
                             planes=True).materialize()

    MID = pa.schema([
        ("tile_id", pa.string()),  # target tile (donor rows) / own tile
        ("kind", pa.string()),     # 'cell' | 'donor'
        ("gid", pa.int64()),       # cell: gid | donor: TARGET gid
        ("v", pa.int64()),         # cell: acc | donor: DONOR gid
        ("x", pa.int64()),         # cell: 1 iff the cell EXITS its tile
    ])

    def emit(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in MID.names}
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            acc = np.frombuffer(
                zlib.decompress(t.column("acc_z")[j].as_py()), np.int64)
            codes = np.frombuffer(
                zlib.decompress(t.column("codes_z")[j].as_py()),
                np.int8).astype(np.int64).reshape(c, c)
            chan = (acc >= channel_t) & (codes.ravel() >= 0)
            if not chan.any():
                continue
            gy0, gx0 = ty * c, tx * c
            nxt, ext = _acc_nxt_ext(codes, c, gy0, gx0, width)
            lidx = np.nonzero(chan)[0]
            gids = (gy0 + lidx // c) * width + (gx0 + lidx % c)
            ni = nxt[lidx]
            ei = ext[lidx]
            exits = (ei >= 0).astype(np.int64)
            for g_, a_, x_ in zip(gids, acc[lidx], exits):
                out["tile_id"].append(f"{tx}-{ty}")
                out["kind"].append("cell")
                out["gid"].append(int(g_))
                out["v"].append(int(a_))
                out["x"].append(int(x_))
            # donor pairs from channel cells (target may be off-tile)
            for k in range(len(lidx)):
                if ni[k] >= 0:
                    tg = (gy0 + ni[k] // c) * width + (gx0 + ni[k] % c)
                elif ei[k] >= 0:
                    tg = int(ei[k])
                else:
                    continue
                ttx, tty = (tg % width) // c, (tg // width) // c
                out["tile_id"].append(f"{ttx}-{tty}")
                out["kind"].append("donor")
                out["gid"].append(int(tg))
                out["v"].append(int(gids[k]))
                out["x"].append(0)
        return pa.table(out, schema=MID)

    mid = planes.map_batches(emit, batch_format="pyarrow",
                             batch_size=16).materialize()

    # per-tile chain COMPACTION (the perimeter-compression discipline):
    # local link edges fold into a min-gid union-find inside the tile
    # group; only cross-tile edges + boundary star edges (exit cell ->
    # its local root) reach the iterative CC — O(perimeter) per tile,
    # so the global rounds never iterate over whole chains. The global
    # rep of a component = min over its local roots = min over ALL its
    # cells (each local root is its local component's min gid).
    MID2 = pa.schema([
        ("kind", pa.string()),  # 'edge' | 'cellr'
        ("a", pa.int64()),      # edge: id_a | cellr: gid
        ("b", pa.int64()),      # edge: id_b | cellr: acc
        ("r", pa.int64()),      # cellr: local root
    ])

    def compact(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        gid = g.column("gid").to_numpy()
        v = g.column("v").to_numpy()
        xf = g.column("x").to_numpy()
        csel = np.asarray([k == "cell" for k in kinds])
        cells = gid[csel]
        accs = v[csel]
        exits = xf[csel].astype(bool)
        out: dict[str, list] = {k: [] for k in MID2.names}
        if not len(cells):
            return pa.table(out, schema=MID2)
        order_c = np.argsort(cells, kind="stable")
        cs, accs_s, exits_s = cells[order_c], accs[order_c],             exits[order_c]
        n = len(cs)
        dsel = ~csel
        tgt, don = gid[dsel], v[dsel]
        # link edges: target has exactly ONE channel donor (donors from
        # ANY tile count; the target is ours by keying)
        u = np.empty(0, np.int64)
        vv = np.empty(0, np.int64)
        if len(tgt):
            pos = np.searchsorted(cs, tgt)
            pos[pos >= n] = n - 1
            ok = cs[pos] == tgt
            tgt, don = tgt[ok], don[ok]
            if len(tgt):
                o2 = np.argsort(tgt, kind="stable")
                tgt, don = tgt[o2], don[o2]
                starts = np.r_[0, np.nonzero(np.diff(tgt))[0] + 1]
                cnt = np.diff(np.r_[starts, len(tgt)])
                single = starts[cnt == 1]
                u, vv = don[single], tgt[single]
        # local chain compaction: link edges form PATHS (each cell has
        # <=1 donor edge in and <=1 out), so the per-chain min gid falls
        # out of log-depth pointer doubling carrying a running min in
        # BOTH directions — no Python union-find loop.
        up = np.arange(n, dtype=np.int64)    # local idx of my donor
        down = np.arange(n, dtype=np.int64)  # local idx of my target
        cross_mask = np.zeros(len(u), bool)
        if len(u):
            upos = np.searchsorted(cs, u)
            upos[upos >= n] = n - 1
            local = cs[upos] == u
            cross_mask = ~local
            vpos = np.searchsorted(cs, vv[local])
            up[vpos] = upos[local]
            down[upos[local]] = vpos
        m = cs.copy()
        pu, pdn = up, down
        for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
            m = np.minimum(m, np.minimum(m[pu], m[pdn]))
            pu = pu[pu]
            pdn = pdn[pdn]
        roots_s = m  # per sorted-cell local-chain min gid
        # cross edges: foreign donor u -> root of v
        for uu, tv in zip(u[cross_mask], vv[cross_mask]):
            out["kind"].append("edge")
            out["a"].append(int(uu))
            out["b"].append(int(roots_s[np.searchsorted(cs, tv)]))
            out["r"].append(0)
        # boundary stars: exit cell -> its local root (when distinct)
        star = exits_s & (roots_s != cs)
        for x, r in zip(cs[star], roots_s[star]):
            out["kind"].append("edge")
            out["a"].append(int(x))
            out["b"].append(int(r))
            out["r"].append(0)
        return pa.table({
            "kind": pa.array(out["kind"] + ["cellr"] * n, pa.string()),
            "a": pa.array(np.concatenate(
                [np.asarray(out["a"], np.int64), cs]), pa.int64()),
            "b": pa.array(np.concatenate(
                [np.asarray(out["b"], np.int64), accs_s]), pa.int64()),
            "r": pa.array(np.concatenate(
                [np.asarray(out["r"], np.int64), roots_s]), pa.int64()),
        }, schema=MID2)

    mid2 = (mid.groupby("tile_id")
            .map_groups(compact, batch_format="pyarrow").materialize())

    edges = mid2.filter(expr="kind == 'edge'")         .select_columns(["a", "b"]).materialize()
    cells = mid2.filter(expr="kind == 'cellr'")         .select_columns(["a", "b", "r"]).materialize()

    if int(edges.count()) == 0:
        reps = rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rep": pa.array([], pa.int64())}))
    else:
        reps = connected_components_pairs(edges, "a", "b")

    def attach_fold(g: pd.DataFrame) -> pd.DataFrame:
        cc = g[g["_k"] == 0]
        rr = g[g["_k"] == 1]
        rep_of = dict(zip(rr["key"].to_numpy(), rr["val"].to_numpy()))
        roots = cc["key"].to_numpy()
        link = np.asarray([rep_of.get(x, x) for x in roots], np.int64)
        return pd.DataFrame({"link_id": link,
                             "n_cells": np.ones(len(roots), np.int64),
                             "acc_max": cc["val"].to_numpy()})

    reps_rows = reps.map_batches(
        lambda t: pa.table({"key": t.column("node"),
                            "val": t.column("rep"),
                            "_k": pa.array([1] * len(t), pa.int64())}),
        batch_format="pyarrow")
    cell_rows = cells.map_batches(
        lambda t: pa.table({"key": t.column("r"),
                            "val": t.column("b"),
                            "_k": pa.array([0] * len(t), pa.int64())}),
        batch_format="pyarrow")
    linked = bucketed_fold(cell_rows.union(reps_rows), "key", attach_fold)

    def link_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("link_id", sort=False).agg(
            n_cells=("n_cells", "sum"), acc_max=("acc_max", "max"))
        return agg.reset_index()

    return bucketed_fold(linked, "link_id", link_fold).sort("link_id")
