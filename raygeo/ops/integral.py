"""Distributed summed-area table (integral image) with box-sum probes.

The vision-pipeline primitive (Haar features, fast box filters, region
proposals): SAT(Y, X) = Σ v over all pixels above-left of (Y, X), and any
axis-aligned box sum is ±4 SAT corner reads. Computing a GLOBAL SAT over
a tiled mosaic is a 2D prefix *scan* — a shape none of the other ops
exercise (reference analog: whole-cube reductions over the loaded window,
``core/accessor.py`` load → xarray ``cumsum``-style reductions).

Scale plan — no canvas ever crosses a tile boundary; only O(pixels/chunk)
strip vectors and O(n_tiles) scalars move:

1. ONE decode pass per tile emits (a) per-column totals ``colsum`` and
   per-row totals ``rowsum`` (chunk-length int64 vectors), (b) the tile's
   scalar totals, and (c) — against the BROADCAST probe-corner table —
   the in-tile local prefix value for every SAT corner the tile owns.
2. ``colsum`` strips group by TILE COLUMN and scan down ty; the running
   x-cumsum at ty-1 is each corner's "full tiles above, columns ≤ x"
   contribution, evaluated inside the scan (corners are broadcast — the
   accumulated strips themselves, O(width) per column group, never
   shuffle again). ``rowsum`` strips do the mirror scan per TILE ROW.
3. Tile totals are O(n_tiles) bounded metadata (the extent-index
   discipline): a driver-side 2D prefix gives the "full tiles strictly
   above-left" term per corner.
4. All corner partials union and fold by probe id (probe table is
   dimension-sized), yielding exact int64 box sums + valid-pixel counts.

Oracle: DuckDB sums ``plane_pixels.parquet`` (the generation-time serial
paint) over each probe's pixel box — bit-equal by integer arithmetic.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..channels import RGB_CHANNELS, ChannelPack
from ..grid import GridSpec
from .stencil import _vsum

STRIP_SCHEMA = pa.schema([
    ("gk", pa.int64()),      # tile column (cs) or tile row (rs)
    ("ok", pa.int64()),      # the other tile coordinate (scan order)
    ("vec_v", pa.binary()),  # chunk x int64 per-col/per-row v totals
    ("vec_c", pa.binary()),  # chunk x int64 valid-pixel counts
])

PARTIAL_SCHEMA = pa.schema([
    ("probe_id", pa.int64()),
    ("v_part", pa.int64()),
    ("c_part", pa.int64()),
])


def _corner_rows(boxes: pa.Table, width: int, height: int):
    """Probe boxes -> signed SAT corner probes, grid-clipped.

    Returns (probe_id, R, C, sign) arrays; corners falling above/left of
    the grid contribute 0 and are dropped here.
    """
    pid = boxes.column("probe_id").to_numpy().astype(np.int64)
    r0 = np.clip(boxes.column("r0").to_numpy().astype(np.int64), 0, height)
    r1 = np.clip(boxes.column("r1").to_numpy().astype(np.int64), -1,
                 height - 1)
    c0 = np.clip(boxes.column("c0").to_numpy().astype(np.int64), 0, width)
    c1 = np.clip(boxes.column("c1").to_numpy().astype(np.int64), -1,
                 width - 1)
    ids, rr, cc, sg = [], [], [], []
    for dr, dc, s in ((r1, c1, 1), (r0 - 1, c1, -1), (r1, c0 - 1, -1),
                      (r0 - 1, c0 - 1, 1)):
        keep = (dr >= 0) & (dc >= 0) & (r1 >= r0) & (c1 >= c0)
        ids.append(pid[keep])
        rr.append(dr[keep])
        cc.append(dc[keep])
        sg.append(np.full(int(keep.sum()), s, np.int64))
    return (np.concatenate(ids), np.concatenate(rr), np.concatenate(cc),
            np.concatenate(sg))


def integral_box_stats(tiles_ds, grid: GridSpec, boxes: pa.Table,
                       pack: ChannelPack | None = None):
    """Exact (v_sum, n_valid) per probe box over the mosaic's v plane.

    ``boxes``: (probe_id int64, r0, r1, c0, c1) inclusive pixel ranges.
    Returns a Dataset (probe_id, n_valid, v_sum) for probes with a
    non-empty grid intersection.
    """
    import ray
    import ray.data as rd

    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    width, height = grid.width, grid.height
    n_tx = grid.n_tx

    pid, rr, cc, sg = _corner_rows(boxes, width, height)
    corners_ref = ray.put((pid, rr, cc, sg))

    def stage_a(t: pa.Table) -> pa.Table:
        """Decode once; emit strips + totals + local-prefix partials
        as one kind-tagged mixed table."""
        cp, cr, ccc, cs = ray.get(corners_ref)
        ctx = (cr // chunk) * np.int64(1 << 32) + (ccc // chunk)
        order = np.argsort(ctx, kind="stable")
        ctx_s = ctx[order]
        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        strips = {k: [] for k in STRIP_SCHEMA.names}
        strips["axis"] = []
        totals = {"tx": [], "ty": [], "tv": [], "tc": []}
        parts = {k: [] for k in PARTIAL_SCHEMA.names}
        for j in range(len(t)):
            tx, ty = int(txs[j]), int(tys[j])
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk)
            v = np.where(mask.astype(bool), _vsum(canvas, pack), 0) \
                .astype(np.int64)
            c = mask.astype(np.int64)
            for axis, gk, ok in (("cs", tx, ty), ("rs", ty, tx)):
                ax = 0 if axis == "cs" else 1
                strips["axis"].append(axis)
                strips["gk"].append(gk)
                strips["ok"].append(ok)
                strips["vec_v"].append(v.sum(axis=ax).tobytes())
                strips["vec_c"].append(c.sum(axis=ax).tobytes())
            totals["tx"].append(tx)
            totals["ty"].append(ty)
            totals["tv"].append(int(v.sum()))
            totals["tc"].append(int(c.sum()))
            # corners owned by this tile: local 2D prefix reads
            key = ty * np.int64(1 << 32) + tx
            lo = np.searchsorted(ctx_s, key, side="left")
            hi = np.searchsorted(ctx_s, key, side="right")
            if hi > lo:
                sat_v = v.cumsum(axis=0).cumsum(axis=1)
                sat_c = c.cumsum(axis=0).cumsum(axis=1)
                o = order[lo:hi]
                yl = (cr[o] % chunk).astype(np.int64)
                xl = (ccc[o] % chunk).astype(np.int64)
                parts["probe_id"].extend(cp[o].tolist())
                parts["v_part"].extend(
                    (cs[o] * sat_v[yl, xl]).tolist())
                parts["c_part"].extend(
                    (cs[o] * sat_c[yl, xl]).tolist())
        n_s = len(strips["gk"])
        n_t = len(totals["tx"])
        n_p = len(parts["probe_id"])
        return pa.table({
            "kind": pa.array(["s"] * n_s + ["t"] * n_t + ["p"] * n_p,
                             pa.string()),
            "axis": pa.array(strips["axis"] + [""] * (n_t + n_p),
                             pa.string()),
            "a": pa.array(strips["gk"] + totals["tx"]
                          + parts["probe_id"], pa.int64()),
            "b": pa.array(strips["ok"] + totals["ty"] + parts["v_part"],
                          pa.int64()),
            "c": pa.array([0] * n_s + totals["tv"] + parts["c_part"],
                          pa.int64()),
            "d": pa.array([0] * n_s + totals["tc"] + [0] * n_p,
                          pa.int64()),
            "vec_v": pa.array(strips["vec_v"] + [b""] * (n_t + n_p),
                              pa.binary()),
            "vec_c": pa.array(strips["vec_c"] + [b""] * (n_t + n_p),
                              pa.binary()),
        })

    mixed = (tiles_ds.select_columns(["tile_id", "tx", "ty", "px_z",
                                      "mask_z"])
             .map_batches(stage_a, batch_format="pyarrow",
                          batch_size=64)
             .materialize())

    # ---- tile totals: O(n_tiles) metadata -> driver 2D prefix ----
    tot = mixed.filter(expr="kind == 't'").to_pandas()
    T_v = np.zeros((grid.n_ty + 1, n_tx + 1), np.int64)
    T_c = np.zeros((grid.n_ty + 1, n_tx + 1), np.int64)
    if len(tot):
        T_v[tot["b"].to_numpy() + 1, tot["a"].to_numpy() + 1] = \
            tot["c"].to_numpy()
        T_c[tot["b"].to_numpy() + 1, tot["a"].to_numpy() + 1] = \
            tot["d"].to_numpy()
    T_v = T_v.cumsum(axis=0).cumsum(axis=1)
    T_c = T_c.cumsum(axis=0).cumsum(axis=1)
    # full tiles strictly above-left of each corner's tile
    ctx, cty = (cc // chunk).astype(np.int64), (rr // chunk).astype(np.int64)
    t_parts = pa.table({
        "probe_id": pa.array(pid, pa.int64()),
        "v_part": pa.array(sg * T_v[cty, ctx], pa.int64()),
        "c_part": pa.array(sg * T_c[cty, ctx], pa.int64()),
    })

    # ---- strip scans: per tile column (cs) / tile row (rs) ----
    def make_scan(axis: str):
        """Group = one tile column (axis='cs') or row ('rs'); scan in
        ok order and evaluate every corner whose 'above'/'left' strips
        live in this group."""

        def scan(g: pa.Table) -> pa.Table:
            cp, cr, ccc, cs_sign = ray.get(corners_ref)
            gk = int(g.column("a")[0].as_py())
            oks = g.column("b").to_numpy()
            order = np.argsort(oks, kind="stable")
            vv = [np.frombuffer(x, np.int64)
                  for x in g.column("vec_v").to_pylist()]
            vc = [np.frombuffer(x, np.int64)
                  for x in g.column("vec_c").to_pylist()]
            if axis == "cs":
                mine = (ccc // chunk) == gk
                need = (cr[mine] // chunk) - 1  # strips with ok <= ty-1
                off = ccc[mine] % chunk
            else:
                mine = (cr // chunk) == gk
                need = (ccc[mine] // chunk) - 1
                off = cr[mine] % chunk
            out_p, out_v, out_c = [], [], []
            if mine.any():
                mp = cp[mine]
                ms = cs_sign[mine]
                acc_v = np.zeros(chunk, np.int64)
                acc_c = np.zeros(chunk, np.int64)
                # corners sorted by how many strips they need
                no = np.argsort(need, kind="stable")
                k = 0
                # corners needing <0 strips contribute 0 — skip
                while k < len(no) and need[no[k]] < 0:
                    k += 1
                for j in order.tolist() + [None]:
                    cur_ok = oks[j] if j is not None else None
                    # emit corners satisfied strictly before this strip
                    while k < len(no) and (
                            cur_ok is None or need[no[k]] < cur_ok):
                        # gap tiles (no valid px) are simply absent —
                        # the running accumulators already cover them
                        i = no[k]
                        csum_v = acc_v.cumsum()
                        csum_c = acc_c.cumsum()
                        out_p.append(int(mp[i]))
                        out_v.append(int(ms[i]) * int(csum_v[off[i]]))
                        out_c.append(int(ms[i]) * int(csum_c[off[i]]))
                        k += 1
                    if j is None:
                        break
                    acc_v += vv[j]
                    acc_c += vc[j]
            return pa.table({
                "probe_id": pa.array(out_p, pa.int64()),
                "v_part": pa.array(out_v, pa.int64()),
                "c_part": pa.array(out_c, pa.int64()),
            })

        return scan

    cs_parts = (mixed.filter(expr="kind == 's' and axis == 'cs'")
                .groupby("a").map_groups(make_scan("cs"),
                                         batch_format="pyarrow"))
    rs_parts = (mixed.filter(expr="kind == 's' and axis == 'rs'")
                .groupby("a").map_groups(make_scan("rs"),
                                         batch_format="pyarrow"))

    def local_parts(t: pa.Table) -> pa.Table:
        d = t.filter(pa.compute.equal(t.column("kind"), "p"))
        return pa.table({
            "probe_id": d.column("a").cast(pa.int64()),
            "v_part": d.column("b").cast(pa.int64()),
            "c_part": d.column("c").cast(pa.int64()),
        })

    from ..util import bucketed_sum

    all_parts = (mixed.map_batches(local_parts, batch_format="pyarrow")
                 .union(cs_parts, rs_parts, rd.from_arrow(t_parts)))
    out = bucketed_sum(all_parts, "probe_id", ["v_part", "c_part"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "probe_id": t.column("probe_id").cast(pa.int64()),
            "n_valid": t.column("c_part").cast(pa.int64()),
            "v_sum": t.column("v_part").cast(pa.int64()),
        })

    return out.map_batches(finish, batch_format="pyarrow")


# ---- west-horizon visibility (1D masked prefix-max scan) --------------------

VSHED_SCHEMA = pa.schema([
    ("key", pa.string()),    # phase-1: ty; phase-3: tile_id
    ("kind", pa.string()),   # 'rowmax' | 'pfx' | 'tile'
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("v", pa.binary()),      # int64 chunk-length vector (rowmax / pfx)
    ("px_z", pa.binary()),
    ("mask_z", pa.binary()),
])


def viewshed_stats(tiles_ds, grid: GridSpec,
                   pack: ChannelPack | None = None):
    """West-horizon visibility: a valid pixel is VISIBLE when its value v
    strictly exceeds every valid pixel west of it in its global row
    (parallel-ray line-of-sight from the west horizon — the ridge-line /
    first-return scan). Output: per tile ``(tile_id, tx, ty, n_visible,
    n_valid)``; tiles with no valid pixel emit nothing.

    A global masked PREFIX-MAX per row — the 1D scan sibling of the SAT
    (above): per-tile chunk-length row-max vectors (invalid rows → −1)
    group by TILE ROW and scan west→east (exclusive running elementwise
    max), handing each tile its incoming-horizon vector; absent tiles
    contribute nothing and the horizon passes through them unchanged.
    The per-pixel pass re-joins horizon to canvas by a KEYED UNION +
    ``map_groups`` (never a broadcast: the horizon table is
    O(n_tiles·chunk) — 2 GB at TCTrend scale) and finishes with an
    in-tile ``np.maximum.accumulate`` shifted one column east. Only
    O(pixels/chunk) vectors ever shuffle; canvases move once into their
    own merge group.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk

    def phase1(t: pa.Table) -> pa.Table:
        out = {k: [] for k in VSHED_SCHEMA.names}

        def row(key, kind, tx, ty, v=b"", px=b"", mz=b""):
            out["key"].append(key)
            out["kind"].append(kind)
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["v"].append(v)
            out["px_z"].append(px)
            out["mask_z"].append(mz)

        px_z = t.column("px_z").to_pylist()
        mask_z = t.column("mask_z").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(len(t)):
            canvas = pack.from_bytes(zlib.decompress(px_z[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mask_z[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            v = _vsum(canvas, pack)
            mv = np.where(mask, v, -1)
            tx, ty = int(txs[j]), int(tys[j])
            row(str(ty), "rowmax", tx, ty,
                v=mv.max(axis=1).astype(np.int64).tobytes())
            # canvas re-keys ONCE to its own merge group
            row(f"{tx}-{ty}", "tile", tx, ty, px=px_z[j], mz=mask_z[j])
        return pa.table(out, schema=VSHED_SCHEMA)

    staged = tiles_ds.select_columns(["tx", "ty", "px_z", "mask_z"]) \
        .map_batches(phase1, batch_format="pyarrow", batch_size=64)

    rowmax = staged.filter(expr="kind == 'rowmax'")
    tiles = staged.filter(expr="kind == 'tile'")

    def scan_ty(g: pa.Table) -> pa.Table:
        txs = g.column("tx").to_numpy().astype(np.int64)
        order = np.argsort(txs)
        out = {k: [] for k in VSHED_SCHEMA.names}
        run = np.full(chunk, -1, np.int64)
        ty = int(g.column("ty")[0].as_py())
        for j in order:
            tx = int(txs[j])
            out["key"].append(f"{tx}-{ty}")
            out["kind"].append("pfx")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["v"].append(run.tobytes())
            out["px_z"].append(b"")
            out["mask_z"].append(b"")
            rm = np.frombuffer(g.column("v")[j].as_py(), np.int64)
            run = np.maximum(run, rm)
        return pa.table(out, schema=VSHED_SCHEMA)

    pfx = rowmax.groupby("key").map_groups(scan_ty, batch_format="pyarrow")

    OUT = pa.schema([
        ("tile_id", pa.string()), ("tx", pa.int64()), ("ty", pa.int64()),
        ("n_visible", pa.int64()), ("n_valid", pa.int64()),
    ])

    def merge(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        incoming = None
        canvas = mask = None
        for j, kind in enumerate(kinds):
            if kind == "pfx":
                incoming = np.frombuffer(g.column("v")[j].as_py(), np.int64)
            else:
                canvas = pack.from_bytes(
                    zlib.decompress(g.column("px_z")[j].as_py()),
                    chunk, chunk)
                mask = np.frombuffer(
                    zlib.decompress(g.column("mask_z")[j].as_py()),
                    np.uint8).reshape(chunk, chunk).astype(bool)
        if canvas is None or not mask.any():
            return pa.table({f.name: pa.array([], f.type) for f in OUT})
        v = _vsum(canvas, pack)
        mv = np.where(mask, v, -1)
        acc = np.maximum.accumulate(mv, axis=1)
        left = np.concatenate(
            [np.full((chunk, 1), -1, np.int64), acc[:, :-1]], axis=1)
        if incoming is None:  # westmost present tile of its row group
            incoming = np.full(chunk, -1, np.int64)
        thresh = np.maximum(left, incoming[:, None])
        vis = mask & (v > thresh)
        tx = int(g.column("tx")[0].as_py())
        ty = int(g.column("ty")[0].as_py())
        return pa.table({
            "tile_id": pa.array([f"{tx}-{ty}"], pa.string()),
            "tx": pa.array([tx], pa.int64()),
            "ty": pa.array([ty], pa.int64()),
            "n_visible": pa.array([int(vis.sum())], pa.int64()),
            "n_valid": pa.array([int(mask.sum())], pa.int64()),
        }, schema=OUT)

    return (tiles.union(pfx).groupby("key")
            .map_groups(merge, batch_format="pyarrow")
            .select_columns(["tile_id", "tx", "ty",
                             "n_visible", "n_valid"]))
