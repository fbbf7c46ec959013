"""Vector -> raster burn: paint a zone-id plane onto the cube grid.

The inverse of the zonal join (``ops/zonal.py``): instead of aggregating
raster pixels into vector zones, the zones themselves are rasterized onto
the chunk grid — the "burn" step every geocube stack needs for masks and
label planes (rasterio's ``features.rasterize`` re-expressed as a Ray Data
pipeline; the reference's chunk-alignment math ``core/backend.py:241-261``
provides the pixel frame).

Pixel-center semantics (GDAL default): a pixel belongs to a zone iff its
CENTER lies inside the half-open zone box ``[lon_min, lon_max) x
(lat_min, lat_max]``. With center ``x = x0 + (c + 0.5) * res`` the covered
column range is ``[ceil((lon_min-x0)/res - 0.5), ceil((lon_max-x0)/res -
0.5))`` — pure floor/ceil arithmetic, so the whole operator is replayable
in ANSI SQL (the DuckDB oracle burns every pixel row-by-row and must agree
exactly).

Overlap rule: the lexicographically greatest zone_id wins (deterministic,
order-independent — matches SQL ``max(zone_id)`` per pixel).

Scale plan (features x pixels, neither broadcast):
- ``flat_map`` zones -> one row per (covering tile, zone) with the zone's
  pixel window CLIPPED to that tile — O(features x tiles-per-feature)
  rows, each a few ints; the feature table never broadcasts and the
  shuffle never carries pixels;
- ``groupby(tile)`` paints each tile's plane independently: fragments
  sorted by zone_id ascending, later paints overwrite earlier ones
  (= max-id wins), one vectorized slice-assign per fragment;
- output is per-(tile, zone) pixel counts via one ``bincount`` per tile —
  bounded by zones-touching-tile, not pixels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..grid import GridSpec


def _center_window(grid: GridSpec, lon_min, lat_min, lon_max, lat_max):
    """Half-open pixel-center windows (col_lo, col_hi, row_lo, row_hi)."""
    cl = np.ceil((np.asarray(lon_min) - grid.x0) / grid.res - 0.5).astype(np.int64)
    ch = np.ceil((np.asarray(lon_max) - grid.x0) / grid.res - 0.5).astype(np.int64)
    rl = np.ceil((grid.y1 - np.asarray(lat_max)) / grid.res - 0.5).astype(np.int64)
    rh = np.ceil((grid.y1 - np.asarray(lat_min)) / grid.res - 0.5).astype(np.int64)
    cl = np.clip(cl, 0, grid.width)
    ch = np.clip(ch, 0, grid.width)
    rl = np.clip(rl, 0, grid.height)
    rh = np.clip(rh, 0, grid.height)
    return cl, ch, rl, rh


def rasterize_zones(zones_ds, grid: GridSpec):
    """Burn zone boxes onto the grid; return (tile_id, zone_id, n_px).

    ``zones_ds`` columns: zone_id (string), lon_min/lat_min/lon_max/lat_max.
    Only burned pixels are reported (tiles or zones with zero coverage are
    absent), and each pixel counts toward exactly one zone (the winner).
    """

    c = grid.chunk

    def fragments(t: pa.Table) -> pa.Table:
        zid = np.asarray(t.column("zone_id").to_pylist(), dtype=object)
        cl, ch, rl, rh = _center_window(
            grid,
            t.column("lon_min").to_numpy(), t.column("lat_min").to_numpy(),
            t.column("lon_max").to_numpy(), t.column("lat_max").to_numpy())
        valid = (ch > cl) & (rh > rl)
        idx = np.nonzero(valid)[0]
        out_z, out_tx, out_ty = [], [], []
        out_cl, out_ch, out_rl, out_rh = [], [], [], []
        for i in idx:
            tx_lo, tx_hi = cl[i] // c, (ch[i] - 1) // c
            ty_lo, ty_hi = rl[i] // c, (rh[i] - 1) // c
            for tx in range(tx_lo, tx_hi + 1):
                for ty in range(ty_lo, ty_hi + 1):
                    out_z.append(zid[i])
                    out_tx.append(tx)
                    out_ty.append(ty)
                    out_cl.append(max(cl[i], tx * c))
                    out_ch.append(min(ch[i], (tx + 1) * c))
                    out_rl.append(max(rl[i], ty * c))
                    out_rh.append(min(rh[i], (ty + 1) * c))
        return pa.table({
            "zone_id": pa.array(out_z, pa.string()),
            "tx": pa.array(out_tx, pa.int64()),
            "ty": pa.array(out_ty, pa.int64()),
            "cl": pa.array(out_cl, pa.int64()),
            "ch": pa.array(out_ch, pa.int64()),
            "rl": pa.array(out_rl, pa.int64()),
            "rh": pa.array(out_rh, pa.int64()),
        })

    frags = zones_ds.select_columns(
        ["zone_id", "lon_min", "lat_min", "lon_max", "lat_max"]
    ).map_batches(fragments, batch_format="pyarrow", batch_size=8192)

    def paint(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("zone_id", kind="mergesort")  # max id paints last
        tx, ty = int(g.tx.iloc[0]), int(g.ty.iloc[0])
        ids = g.zone_id.to_numpy()
        plane = np.full((c, c), -1, dtype=np.int32)
        c0, r0 = tx * c, ty * c
        for i in range(len(g)):
            plane[g.rl.iat[i] - r0:g.rh.iat[i] - r0,
                  g.cl.iat[i] - c0:g.ch.iat[i] - c0] = i
        counts = np.bincount(plane[plane >= 0].ravel(), minlength=len(g))
        keep = counts > 0
        out = pd.DataFrame({
            "tile_id": f"{tx}-{ty}",
            "zone_id": ids[keep],
            "n_px": counts[keep].astype(np.int64),
        })
        # collapse duplicate zone rows (same id burned from several input rows)
        return (out.groupby(["tile_id", "zone_id"], as_index=False, sort=False)
                .agg(n_px=("n_px", "sum")))

    return frags.groupby(["tx", "ty"]).map_groups(paint, batch_format="pandas")


def coverage_depth(images_ds, grid: GridSpec):
    """Per-pixel footprint coverage-depth histogram — the mosaicking QA
    table (depth:int64 -> n_pixels:int64, depth >= 1, sorted): how many
    grid pixels are covered by exactly d image footprints, over the
    half-open ``pixel_window`` frame (floor/ceil edges, ``stac.py:19-46``
    semantics — identical to the tile-cover arithmetic, so the SQL
    oracle's per-row interval sweep replays it exactly).

    Scale plan — the 2D difference-array trick keeps the shuffle at FOUR
    integer points per (image x covered tile), never pixels: each
    clipped rect contributes +1/-1 corner deltas in tile-local coords;
    one coarse-bucket fold per tile materializes the (chunk+1)^2 delta
    canvas, double prefix-sums it into the depth plane, and bincounts —
    per-task memory is one small canvas, the histogram rows it emits are
    bounded by the max overlap depth, and hot tiles cost one canvas each
    regardless of how many footprints stack on them (skew absorbed by
    construction, the zonal partial discipline).
    """
    from ..util import bucketed_fold, bucketed_sum, drop_empty_blocks

    T = grid.chunk

    def corners(t: pa.Table) -> pa.Table:
        cl, ch, rl, rh = grid.pixel_window(
            t.column("lon_min").to_numpy(), t.column("lat_min").to_numpy(),
            t.column("lon_max").to_numpy(), t.column("lat_max").to_numpy())
        ok = (ch > cl) & (rh > rl)
        cl, ch, rl, rh = cl[ok], ch[ok], rl[ok], rh[ok]
        tx0, tx1 = cl // T, (ch - 1) // T
        ty0, ty1 = rl // T, (rh - 1) // T
        ntx = tx1 - tx0 + 1
        nty = ty1 - ty0 + 1
        cnt = ntx * nty
        idx = np.repeat(np.arange(len(cl)), cnt)
        k = np.arange(int(cnt.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        tx = tx0[idx] + k % ntx[idx]
        ty = ty0[idx] + k // ntx[idx]
        x0 = np.maximum(cl[idx], tx * T) - tx * T
        x1 = np.minimum(ch[idx], (tx + 1) * T) - tx * T
        y0 = np.maximum(rl[idx], ty * T) - ty * T
        y1 = np.minimum(rh[idx], (ty + 1) * T) - ty * T
        m = len(tx)
        return pa.table({
            "tx": pa.array(np.tile(tx, 4), pa.int64()),
            "ty": pa.array(np.tile(ty, 4), pa.int64()),
            "y": pa.array(np.concatenate([y0, y0, y1, y1]), pa.int64()),
            "x": pa.array(np.concatenate([x0, x1, x0, x1]), pa.int64()),
            "d": pa.array(np.concatenate([
                np.ones(m, np.int64), -np.ones(m, np.int64),
                -np.ones(m, np.int64), np.ones(m, np.int64)]), pa.int64()),
        })

    pts = images_ds.select_columns(
        ["lon_min", "lat_min", "lon_max", "lat_max"]).map_batches(
        corners, batch_format="pyarrow", batch_size=65536)

    def tile_hist(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (_, _), sub in g.groupby(["tx", "ty"], sort=False):
            canvas = np.zeros((T + 1, T + 1), np.int64)
            np.add.at(canvas, (sub["y"].to_numpy(), sub["x"].to_numpy()),
                      sub["d"].to_numpy())
            depth = canvas.cumsum(axis=0).cumsum(axis=1)[:T, :T]
            pos = depth[depth > 0]
            if pos.size:
                bc = np.bincount(pos)
                nz = np.nonzero(bc)[0]
                outs.append(pd.DataFrame({"depth": nz.astype(np.int64),
                                          "n_pixels": bc[nz].astype(
                                              np.int64)}))
        if not outs:
            return pd.DataFrame({"depth": np.array([], np.int64),
                                 "n_pixels": np.array([], np.int64)})
        return pd.concat(outs, ignore_index=True)

    partials = bucketed_fold(
        pts, ["tx", "ty"], tile_hist,
        clean_schema=pa.schema([("depth", pa.int64()),
                                ("n_pixels", pa.int64())]))
    out_schema = pa.schema([("depth", pa.int64()), ("n_pixels", pa.int64())])
    return drop_empty_blocks(
        bucketed_sum(partials, "depth", "n_pixels").materialize(),
        out_schema).sort("depth")


def zonal_perimeter(zones_ds, grid: GridSpec):
    """Per-zone boundary length (zone geometry QA, the partner of the
    area counts in :func:`rasterize_zones`): perimeter of zone z =
    number of directed pixel edges from a z-pixel to a non-z neighbor
    (other zone, unburned, or outside the grid) = ``4·n_px − 2·(number
    of same-zone 4-adjacent pairs)`` — the identity both the engine and
    the SQL oracle compute, so grid borders and nodata need no special
    cases anywhere. Returns (zone_id:string, perimeter:int64) sorted.

    Plan: the rasterize fragment/paint machinery burns each tile's zone
    plane independently (max zone_id wins); in-tile same-pairs are two
    vectorized shifted compares, and cross-tile pairs ride a 1-px strip
    exchange — each painted tile emits its 4 border strips keyed by the
    shared edge id, a keyed fold counts (edge, offset, zone) groups of
    size 2. Shuffle volume is O(pixels/chunk) strip rows + per-(tile,
    zone) scalars; pixels never leave their paint task.
    """
    from ..util import bucketed_fold, bucketed_sum, drop_empty_blocks

    c = grid.chunk

    def fragments(t: pa.Table) -> pa.Table:
        zid = np.asarray(t.column("zone_id").to_pylist(), dtype=object)
        cl, ch, rl, rh = _center_window(
            grid,
            t.column("lon_min").to_numpy(), t.column("lat_min").to_numpy(),
            t.column("lon_max").to_numpy(), t.column("lat_max").to_numpy())
        valid = (ch > cl) & (rh > rl)
        idx = np.nonzero(valid)[0]
        out = {k: [] for k in ("zone_id", "tx", "ty", "cl", "ch",
                               "rl", "rh")}
        for i in idx:
            for tx in range(cl[i] // c, (ch[i] - 1) // c + 1):
                for ty in range(rl[i] // c, (rh[i] - 1) // c + 1):
                    out["zone_id"].append(zid[i])
                    out["tx"].append(tx)
                    out["ty"].append(ty)
                    out["cl"].append(max(cl[i], tx * c))
                    out["ch"].append(min(ch[i], (tx + 1) * c))
                    out["rl"].append(max(rl[i], ty * c))
                    out["rh"].append(min(rh[i], (ty + 1) * c))
        return pa.table({
            "zone_id": pa.array(out["zone_id"], pa.string()),
            **{k: pa.array(out[k], pa.int64())
               for k in ("tx", "ty", "cl", "ch", "rl", "rh")},
        })

    frags = zones_ds.select_columns(
        ["zone_id", "lon_min", "lat_min", "lon_max", "lat_max"]
    ).map_batches(fragments, batch_format="pyarrow", batch_size=8192)

    n_ty = grid.n_ty

    def paint_and_strips(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("zone_id", kind="mergesort")
        tx, ty = int(g.tx.iloc[0]), int(g.ty.iloc[0])
        ids = g.zone_id.to_numpy()
        codes, uniq = pd.factorize(ids)  # same zone -> same code
        plane = np.full((c, c), -1, dtype=np.int32)
        c0, r0 = tx * c, ty * c
        for i in range(len(g)):
            plane[g.rl.iat[i] - r0:g.rh.iat[i] - r0,
                  g.cl.iat[i] - c0:g.ch.iat[i] - c0] = codes[i]
        burned = plane >= 0
        npx = np.bincount(plane[burned].ravel(), minlength=len(uniq))
        same = np.zeros(len(uniq), np.int64)
        for a, b in ((plane[:, :-1], plane[:, 1:]),
                     (plane[:-1, :], plane[1:, :])):
            hit = (a == b) & (a >= 0)
            same += np.bincount(a[hit].ravel(), minlength=len(uniq))
        scal = pd.DataFrame({
            "zone_id": np.asarray(uniq, object),
            "p": 4 * npx.astype(np.int64) - 2 * same,
            "ekey": np.int64(-1), "off": np.int64(-1),
        })
        scal = scal[scal.p != 0]
        # border strips: edge ids shared with the neighbor tile
        strips = []
        for ekey, vec in (
            ((0 * (grid.n_tx + 1) + tx) * n_ty + ty, plane[:, 0]),
            ((0 * (grid.n_tx + 1) + tx + 1) * n_ty + ty, plane[:, -1]),
            (((grid.n_tx + 1) * (n_ty + 1)
              + tx * (n_ty + 1) + ty), plane[0, :]),
            (((grid.n_tx + 1) * (n_ty + 1)
              + tx * (n_ty + 1) + ty + 1), plane[-1, :]),
        ):
            on = np.nonzero(vec >= 0)[0]
            if on.size:
                strips.append(pd.DataFrame({
                    "zone_id": np.asarray(uniq, object)[vec[on]],
                    "p": np.int64(0),
                    "ekey": np.int64(ekey),
                    "off": on.astype(np.int64),
                }))
        df = pd.concat([scal] + strips, ignore_index=True) if strips \
            else scal
        # Arrow out: these blocks feed drop_empty_blocks/from_arrow_refs
        from ..util import table_from_pandas
        return table_from_pandas(df)

    rows = frags.groupby(["tx", "ty"]).map_groups(
        paint_and_strips, batch_format="pandas")
    rows_schema = pa.schema([("zone_id", pa.string()), ("p", pa.int64()),
                             ("ekey", pa.int64()), ("off", pa.int64())])
    rows = drop_empty_blocks(rows.materialize(), rows_schema)

    def strip_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sz = (g.groupby(["ekey", "off", "zone_id"], sort=False)
              .size().reset_index(name="cnt"))
        hit = sz[sz.cnt == 2]
        out = (hit.groupby("zone_id", sort=False).size()
               .reset_index(name="pairs"))
        out["p"] = -2 * out["pairs"].astype(np.int64)
        return out[["zone_id", "p"]]

    def split_scalars(t: pa.Table) -> pa.Table:
        ek = t.column("ekey").to_numpy()
        return t.filter(pa.array(ek == -1)).select(["zone_id", "p"])

    def split_strips(t: pa.Table) -> pa.Table:
        ek = t.column("ekey").to_numpy()
        return t.filter(pa.array(ek >= 0))

    scalars = rows.map_batches(split_scalars, batch_format="pyarrow")
    strip_p = bucketed_fold(
        rows.map_batches(split_strips, batch_format="pyarrow"),
        "ekey", strip_pairs,
        clean_schema=pa.schema([("zone_id", pa.string()),
                                ("p", pa.int64())]))
    out_schema = pa.schema([("zone_id", pa.string()),
                            ("perimeter", pa.int64())])
    total = bucketed_sum(scalars.union(strip_p), "zone_id", "p")
    total = total.map_batches(
        lambda t: pa.table({"zone_id": t.column("zone_id"),
                            "perimeter": t.column("p")}),
        batch_format="pyarrow")
    return drop_empty_blocks(total.materialize(), out_schema) \
        .sort("zone_id")


def zones_dissolve(zones_ds, grid: GridSpec):
    """Vector DISSOLVE (st_union by connectivity): zones whose
    pixel-center windows overlap merge into connected components; each
    component reports its member count and its exact raster union area
    — the vector-side dedup/merge op every geocube ingest needs before
    burning masks (GDAL ogr2ogr -dialect 'dissolve' / PostGIS ST_Union
    re-expressed as a Ray Data pipeline).

    Connectivity uses the SAME half-open pixel-center windows as
    ``rasterize_zones`` (pure floor/ceil arithmetic → ANSI-SQL
    replayable); zones whose windows clip to nothing drop entirely.

    Plan (features × pixels, neither broadcast in the wide stages):
    - windows explode per covering tile (O(features × tiles-per-feature)
      int rows); per-tile groups emit candidate overlap pairs by a
      vectorized window-intersection test, deduped with one
      coarse-bucket distinct — the pair discovery never leaves the tile
      partitioning (PBSM discipline);
    - the zone table is DIMENSION-bounded by contract (like
      nation/region), so components resolve by driver union-find over
      the deduped pair rows and the zone→component map broadcasts once
      (a feature table past the dimension cap would feed the pairs to
      ``graph.connected_components_pairs`` instead — same rows);
    - union area: fragments re-key by component, each tile paints its
      component plane once (components are pixel-disjoint BY
      CONSTRUCTION — a shared pixel implies window overlap implies same
      component), one bincount per tile, one coarse-bucket sum.

    Output: (comp_id = lexicographically smallest member zone_id,
    n_zones, union_px), one row per component.
    """
    import ray

    from ..util import bucketed_distinct, bucketed_sum

    c = grid.chunk

    def windows(t: pa.Table) -> pa.Table:
        zid = np.asarray(t.column("zone_id").to_pylist(), dtype=object)
        cl, ch, rl, rh = _center_window(
            grid,
            t.column("lon_min").to_numpy(), t.column("lat_min").to_numpy(),
            t.column("lon_max").to_numpy(), t.column("lat_max").to_numpy())
        keep = (ch > cl) & (rh > rl)
        return pa.table({
            "zone_id": pa.array(zid[keep], pa.string()),
            "cl": pa.array(cl[keep], pa.int64()),
            "ch": pa.array(ch[keep], pa.int64()),
            "rl": pa.array(rl[keep], pa.int64()),
            "rh": pa.array(rh[keep], pa.int64()),
        })

    wins = zones_ds.select_columns(
        ["zone_id", "lon_min", "lat_min", "lon_max", "lat_max"]
    ).map_batches(windows, batch_format="pyarrow",
                  batch_size=8192).materialize()

    def tile_explode(t: pa.Table) -> pa.Table:
        out = {k: [] for k in ("tx", "ty", "zone_id", "cl", "ch",
                               "rl", "rh")}
        zid = t.column("zone_id").to_pylist()
        cl = t.column("cl").to_numpy()
        ch = t.column("ch").to_numpy()
        rl = t.column("rl").to_numpy()
        rh = t.column("rh").to_numpy()
        for i in range(len(t)):
            for tx in range(cl[i] // c, (ch[i] - 1) // c + 1):
                for ty in range(rl[i] // c, (rh[i] - 1) // c + 1):
                    out["tx"].append(tx)
                    out["ty"].append(ty)
                    out["zone_id"].append(zid[i])
                    out["cl"].append(max(cl[i], tx * c))
                    out["ch"].append(min(ch[i], (tx + 1) * c))
                    out["rl"].append(max(rl[i], ty * c))
                    out["rh"].append(min(rh[i], (ty + 1) * c))
        return pa.table({
            "tx": pa.array(out["tx"], pa.int64()),
            "ty": pa.array(out["ty"], pa.int64()),
            "zone_id": pa.array(out["zone_id"], pa.string()),
            "cl": pa.array(out["cl"], pa.int64()),
            "ch": pa.array(out["ch"], pa.int64()),
            "rl": pa.array(out["rl"], pa.int64()),
            "rh": pa.array(out["rh"], pa.int64()),
        })

    frags = wins.map_batches(tile_explode, batch_format="pyarrow",
                             batch_size=8192).materialize()

    def tile_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["zone_id"].to_numpy()
        cl = g["cl"].to_numpy()
        ch = g["ch"].to_numpy()
        rl = g["rl"].to_numpy()
        rh = g["rh"].to_numpy()
        hit = ((np.maximum(cl[:, None], cl[None, :])
                < np.minimum(ch[:, None], ch[None, :]))
               & (np.maximum(rl[:, None], rl[None, :])
                  < np.minimum(rh[:, None], rh[None, :]))
               & (ids[:, None] < ids[None, :]))
        a, b = np.nonzero(hit)
        return pd.DataFrame({"za": ids[a], "zb": ids[b]})

    pairs = bucketed_distinct(
        frags.groupby(["tx", "ty"]).map_groups(tile_pairs,
                                               batch_format="pandas"),
        ["za", "zb"])

    # dimension-bounded finish: union-find over pair rows on the driver
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    all_ids = [r["zone_id"] for r in
               wins.select_columns(["zone_id"]).take_all()]
    for z in all_ids:
        parent[z] = z
    for r in pairs.take_all():
        ra, rb = find(r["za"]), find(r["zb"])
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    comp_of = {z: find(z) for z in all_ids}
    n_zones: dict = {}
    for z, cp in comp_of.items():
        n_zones[cp] = n_zones.get(cp, 0) + 1
    comp_ref = ray.put(comp_of)

    def paint_union(g: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(comp_ref)
        tx, ty = int(g.tx.iloc[0]), int(g.ty.iloc[0])
        comps = np.asarray([cm[z] for z in g["zone_id"]], dtype=object)
        u, inv = np.unique(comps, return_inverse=True)
        plane = np.full((c, c), -1, np.int32)
        c0, r0 = tx * c, ty * c
        for i in range(len(g)):
            plane[g.rl.iat[i] - r0:g.rh.iat[i] - r0,
                  g.cl.iat[i] - c0:g.ch.iat[i] - c0] = inv[i]
        counts = np.bincount(plane[plane >= 0].ravel(), minlength=len(u))
        keep = counts > 0
        return pd.DataFrame({"comp_id": u[keep],
                             "union_px": counts[keep].astype(np.int64)})

    upx = bucketed_sum(
        frags.groupby(["tx", "ty"]).map_groups(paint_union,
                                               batch_format="pandas"),
        "comp_id", "union_px")

    OUT = pa.schema([("comp_id", pa.string()), ("n_zones", pa.int64()),
                     ("union_px", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        comp = t.column("comp_id").to_pylist()
        return pa.table({
            "comp_id": pa.array(comp, pa.string()),
            "n_zones": pa.array([int(n_zones[z]) for z in comp],
                                pa.int64()),
            "union_px": t.column("union_px"),
        }, schema=OUT)

    return upx.map_batches(finish, batch_format="pyarrow").sort("comp_id")
