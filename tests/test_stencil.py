"""Halo-exchange gradient and NN-warp resample vs serial full-plane oracles
on random mosaics with absent tiles, random validity masks, and border-
straddling pairs — independent of the fixture goldens."""

import zlib

import numpy as np
import pandas as pd
import pytest

from raygeo.channels import RGB_CHANNELS, ChannelPack
from raygeo.grid import GridSpec
from raygeo.ops.stencil import gradient_stats, resample_nn

SRC = GridSpec(name="s", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
               width=96, height=96, chunk=16)
DST = GridSpec(name="d", crs="EPSG:4326", x0=0.0 + 2.0**-8, y1=1.0 - 2.0**-8,
               res=3.0 * 2.0**-7, width=31, height=31, chunk=8)


def _random_mosaic(seed, p_absent=0.3):
    rng = np.random.Generator(np.random.PCG64(seed))
    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    plane = np.zeros((SRC.height, SRC.width, 3), np.uint8)
    valid = np.zeros((SRC.height, SRC.width), bool)
    for ty in range(SRC.n_ty):
        for tx in range(SRC.n_tx):
            if rng.random() < p_absent:
                continue
            canvas = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            mask = rng.random((16, 16)) < 0.8
            canvas[~mask] = 0
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            plane[tr0:tr1, tc0:tc1] = canvas
            valid[tr0:tr1, tc0:tc1] = mask
            rows.append({
                "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
                "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                "mask_z": zlib.compress(mask.astype(np.uint8).tobytes(), 1),
            })
    return rows, plane, valid


def test_gradient_matches_full_plane(ray_session):
    import ray.data as rd

    rows, plane, valid = _random_mosaic(seed=4)
    out = gradient_stats(rd.from_items(rows).repartition(5),
                         SRC).to_pandas()
    v = plane.astype(np.int64).sum(axis=2)
    dh, bh = np.abs(np.diff(v, axis=1)), valid[:, :-1] & valid[:, 1:]
    dv, bv = np.abs(np.diff(v, axis=0)), valid[:-1, :] & valid[1:, :]
    present = {(r["tx"], r["ty"]) for r in rows}
    exp_rows = []
    for (tx, ty) in sorted(present):
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        hb = bh[tr0:tr1, tc0:min(tc1, SRC.width - 1)]
        hd = dh[tr0:tr1, tc0:min(tc1, SRC.width - 1)]
        vb = bv[tr0:min(tr1, SRC.height - 1), tc0:tc1]
        vd = dv[tr0:min(tr1, SRC.height - 1), tc0:tc1]
        exp_rows.append((f"{tx}-{ty}", tx, ty,
                         int(hb.sum()) + int(vb.sum()),
                         int(hd[hb].sum()) + int(vd[vb].sum())))
    exp = pd.DataFrame(exp_rows, columns=["tile_id", "tx", "ty", "n_pairs",
                                          "abs_grad_sum"])
    got = out.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # sanity: cross-border pairs exist (halo actually exercised)
    assert got.n_pairs.sum() > sum(
        # interior-only count
        (bh[tr0:tr1, tc0:tc1 - 1].sum() + bv[tr0:tr1 - 1, tc0:tc1].sum())
        for (tx, ty) in present
        for tc0, tc1, tr0, tr1 in [SRC.tile_pixel_window(tx, ty)])


def test_resample_matches_full_plane(ray_session):
    import ray.data as rd

    rows, plane, valid = _random_mosaic(seed=9, p_absent=0.25)
    out = resample_nn(rd.from_items(rows).repartition(4),
                      SRC, DST).to_pandas()

    c = np.arange(DST.width, dtype=np.float64)
    r = np.arange(DST.height, dtype=np.float64)
    scol = np.floor((DST.x0 + (c + 0.5) * DST.res - SRC.x0)
                    / SRC.res).astype(np.int64)
    srow = np.floor((SRC.y1 - (DST.y1 - (r + 0.5) * DST.res))
                    / SRC.res).astype(np.int64)
    okc = (scol >= 0) & (scol < SRC.width)
    okr = (srow >= 0) & (srow < SRC.height)
    warped = np.zeros((DST.height, DST.width, 3), np.uint8)
    wvalid = np.zeros((DST.height, DST.width), bool)
    warped[np.ix_(okr, okc)] = plane[np.ix_(srow[okr], scol[okc])]
    wvalid[np.ix_(okr, okc)] = valid[np.ix_(srow[okr], scol[okc])]
    exp_rows = []
    for ty in range(DST.n_ty):
        for tx in range(DST.n_tx):
            tc0, tc1, tr0, tr1 = DST.tile_pixel_window(tx, ty)
            m = wvalid[tr0:tr1, tc0:tc1]
            if not m.any():
                continue
            ps = int(np.where(m[:, :, None], warped[tr0:tr1, tc0:tc1], 0)
                     .astype(np.int64).sum())
            exp_rows.append((f"{tx}-{ty}", tx, ty, int(m.sum()), ps))
    exp = pd.DataFrame(exp_rows, columns=["tile_id", "tx", "ty",
                                          "n_valid_px", "pix_sum"])
    got = out.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_gradient_multichannel_float_pack(ray_session):
    """Gradient over a DEM-shaped float32+bool pack: v enters at the same
    1e-3 fixed point as ChannelPack.pix_sum, so stats stay integer-exact."""
    import ray.data as rd

    from raygeo.channels import DEM_CHANNELS

    rng = np.random.Generator(np.random.PCG64(15))
    pack = ChannelPack(DEM_CHANNELS)
    grid = GridSpec(name="g", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-6,
                    width=32, height=32, chunk=16)
    rows = []
    dem = np.zeros((32, 32), np.float64)
    dmask = np.zeros((32, 32), bool)
    valid = np.zeros((32, 32), bool)
    for ty in range(2):
        for tx in range(2):
            d = np.round(rng.uniform(0, 4000, (16, 16)), 3).astype(np.float32)
            b = rng.random((16, 16)) < 0.5
            m = rng.random((16, 16)) < 0.85
            d[~m] = 0
            tc0, tc1, tr0, tr1 = grid.tile_pixel_window(tx, ty)
            dem[tr0:tr1, tc0:tc1] = d.astype(np.float64)
            dmask[tr0:tr1, tc0:tc1] = b
            valid[tr0:tr1, tc0:tc1] = m
            rows.append({
                "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
                "px_z": zlib.compress(pack.to_bytes(
                    [d, b.astype(bool)]), 1),
                "mask_z": zlib.compress(m.astype(np.uint8).tobytes(), 1),
            })
    out = gradient_stats(rd.from_items(rows), grid, pack=pack).to_pandas()

    v = (np.round(dem * 1000).astype(np.int64)
         + np.round(dmask.astype(np.float64) * 0).astype(np.int64)
         + dmask.astype(np.int64))
    dh, bh = np.abs(np.diff(v, axis=1)), valid[:, :-1] & valid[:, 1:]
    dv, bv = np.abs(np.diff(v, axis=0)), valid[:-1, :] & valid[1:, :]
    total_pairs = int(bh.sum()) + int(bv.sum())
    total_sum = int(dh[bh].sum()) + int(dv[bv].sum())
    assert out.n_pairs.sum() == total_pairs
    assert out.abs_grad_sum.sum() == total_sum


def test_mosaic_zonal_matches_full_plane(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raygeo.ops.rasterize import _center_window
    from raygeo.ops.zonal import mosaic_zonal

    rows, plane, valid = _random_mosaic(seed=23, p_absent=0.2)
    rng = np.random.Generator(np.random.PCG64(24))
    nz = 15
    zx = rng.uniform(0.05, 0.8, nz)
    zy = rng.uniform(0.05, 0.8, nz)
    zones = pa.table({
        "zone_id": [f"z-{i:02d}" for i in range(nz)],
        "lon_min": zx, "lat_min": zy,
        "lon_max": zx + 0.15, "lat_max": zy + 0.15,
    })
    out = mosaic_zonal(rd.from_items(rows).repartition(5), zones,
                       SRC).to_pandas().sort_values("zone_id")

    v = plane.astype(np.int64).sum(axis=2)
    cl, ch, rl, rh = _center_window(
        SRC, zones.column("lon_min").to_numpy(),
        zones.column("lat_min").to_numpy(),
        zones.column("lon_max").to_numpy(),
        zones.column("lat_max").to_numpy())
    got = {r.zone_id: (r.n_px, r.v_sum) for r in out.itertuples()}
    for i in range(nz):
        m = valid[rl[i]:rh[i], cl[i]:ch[i]]
        exp = (int(m.sum()), int(v[rl[i]:rh[i], cl[i]:ch[i]][m].sum()))
        # zones touching only absent tiles may be omitted entirely — that
        # is only legal when their expected count is zero
        assert got.get(f"z-{i:02d}", (0, 0)) == exp


def test_hillshade_matches_full_plane_golden(ray_session, fixtures_sf0001):
    """Halo-exchange hillshade == shade_q over the serial full-plane paint
    (border pixels cross tile strips; identical row set and sums)."""
    import pyarrow.parquet as pq

    from raygeo.fixtures import FIXTURE_GRID, ensure_hillshade_golden
    from raygeo.ops.ingest import ingest
    from raygeo.ops.stencil import hillshade_stats
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    tiles = ingest(read_parquet_clean(
        f"{d}/images.parquet", columns=["image_id", "bytes", "w", "h"]),
        FIXTURE_GRID)
    got = (hillshade_stats(tiles, FIXTURE_GRID)
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    exp = (pq.read_table(ensure_hillshade_golden(d))
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    assert got["tile_id"].tolist() == exp["tile_id"].tolist()
    assert got["n_px"].tolist() == exp["n_px"].tolist()
    assert got["shade_sum"].tolist() == exp["shade_sum"].tolist()
    assert got["shade_sum"].abs().sum() > 0


@pytest.mark.parametrize("seed,minimize", [(2, False), (9, False),
                                           (2, True), (11, True)])
def test_dilate_matches_full_plane(ray_session, seed, minimize):
    import ray.data as rd

    from raygeo.ops.stencil import dilate_stats, erode_stats

    op_fn = erode_stats if minimize else dilate_stats
    rows, plane, valid = _random_mosaic(seed=seed)
    out = (op_fn(rd.from_items(rows).repartition(5), SRC)
           .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True))

    v = plane.astype(np.int64).sum(axis=2)
    H, W = v.shape
    NEG = (1 << 62) if minimize else -(1 << 62)
    red = np.minimum if minimize else np.maximum
    P = np.full((H + 2, W + 2), NEG, np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = np.where(valid, v, NEG)
    M[1:-1, 1:-1] = valid
    mx = np.full((H, W), NEG, np.int64)
    anyv = np.zeros((H, W), bool)
    for dr in range(3):
        for dc in range(3):
            mx = red(mx, P[dr:dr + H, dc:dc + W])
            anyv |= M[dr:dr + H, dc:dc + W]
    present = sorted({(r["tx"], r["ty"]) for r in rows})
    exp = []
    for (tx, ty) in present:
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        sel = anyv[tr0:tr1, tc0:tc1]
        exp.append((tx, ty, int(sel.sum()),
                    int(mx[tr0:tr1, tc0:tc1][sel].sum())))
    exp_df = (pd.DataFrame(exp, columns=["tx", "ty", "n_px", "dilate_sum"])
              .sort_values(["tx", "ty"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out[["tx", "ty", "n_px", "dilate_sum"]], exp_df, check_dtype=False)


def test_gradient_incremental_equals_full(ray_session, tmp_path):
    """After an incremental cube update, the spliced refresh must equal a
    full recompute bit for bit — incl. west/north neighbors of touched
    tiles whose border pairs changed."""
    import ray.data as rd

    from raygeo.cube import Channel, CubeSpec, create
    from raygeo.fixtures import ensure_fixtures
    from raygeo.ops.ingest import ingest, ingest_update
    from raygeo.ops.stencil import gradient_stats, gradient_stats_incremental
    from raygeo.util import read_parquet_clean

    d = ensure_fixtures(0.001)
    FG = __import__("raygeo.fixtures", fromlist=["FIXTURE_GRID"]).FIXTURE_GRID
    images = read_parquet_clean(f"{d}/images.parquet",
                                columns=["image_id", "bytes", "w", "h"]
                                ).limit(400)

    def part(lo, hi):
        def f(t):
            import pyarrow as pa

            keep = [lo <= int(i.rsplit("-", 1)[1]) < hi
                    for i in t.column("image_id").to_pylist()]
            return t.filter(pa.array(keep))
        return f

    cube = str(tmp_path / "cube")
    create(CubeSpec("g", FG, (Channel("rgb", "uint8", 0),)), cube)
    ingest(images.map_batches(part(0, 300), batch_format="pyarrow"),
           FG, cube_path=cube).materialize()
    tiles0 = read_parquet_clean(f"{cube}/tiles")
    # materialize the prior BEFORE the update: a lazy Dataset would
    # re-read post-update bytes and make the splice check vacuous
    import pyarrow as pa_
    import ray as ray_

    prior = pa_.concat_tables(
        [ray_.get(r) for r in gradient_stats(tiles0, FG).to_arrow_refs()])

    upd = ingest_update(images.map_batches(part(300, 400),
                                           batch_format="pyarrow"),
                        FG, cube).to_pandas()
    touched = set(upd["tile_id"])
    assert touched

    got = (gradient_stats_incremental(cube, FG, touched, prior)
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    # no-op refresh is a no-op
    same = gradient_stats_incremental(cube, FG, set(), prior)
    assert same.equals(prior)
    full = (gradient_stats(read_parquet_clean(f"{cube}/tiles"), FG)
            .to_pandas().sort_values("tile_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["tile_id", "tx", "ty", "n_pairs", "abs_grad_sum"]],
        full[["tile_id", "tx", "ty", "n_pairs", "abs_grad_sum"]],
        check_dtype=False)


def test_flowdir_matches_full_plane(ray_session):
    """D8 flow-direction histograms vs a serial padded-global-plane
    oracle on a random mosaic with absent tiles and random validity."""
    import ray.data as rd

    from raygeo.ops.stencil import flowdir_stats

    rows, plane, valid = _random_mosaic(seed=13)
    out = flowdir_stats(rd.from_items(rows).repartition(5),
                        SRC).to_pandas()
    v = plane.astype(np.int64).sum(axis=2)
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
    for k, dr, dc, wt in offs:
        vn = P[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        mn = M[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        drop = (v - vn) * np.int64(wt)
        ok = mn & (v > vn) & (drop > best)
        best = np.where(ok, drop, best)
        code = np.where(ok, np.int64(k), code)
    code = np.where(valid, code, np.int64(-1))
    present = {(r["tx"], r["ty"]) for r in rows}
    exp_rows = []
    for (tx, ty) in sorted(present):
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        win = code[tr0:tr1, tc0:tc1]
        hist = np.bincount(win[win >= 0], minlength=9)
        for k in range(9):
            exp_rows.append((f"{tx}-{ty}", tx, ty, k, int(hist[k])))
    exp = pd.DataFrame(exp_rows, columns=["tile_id", "tx", "ty",
                                          "dir_code", "n_px"])
    got = out.sort_values(["tx", "ty", "dir_code"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty", "dir_code"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_distance_matches_full_plane(ray_session):
    """Capped-L1 distance transform vs a serial full-plane separable DT
    oracle — absent tiles + random masks exercise the halo ring AND the
    diagonal corner-cell path (cap spans whole tiles at chunk 16)."""
    import ray.data as rd

    from raygeo.ops.stencil import distance_stats

    rows, plane, valid = _random_mosaic(seed=21, p_absent=0.4)
    cap = 16  # == chunk: the maximum the single exchange supports
    out = distance_stats(rd.from_items(rows).repartition(4),
                         SRC, cap=cap).to_pandas()
    H, W = valid.shape
    f = np.where(valid, np.int64(0), np.int64(cap))
    ridx = np.arange(H, dtype=np.int64)[:, None]
    cidx = np.arange(W, dtype=np.int64)[None, :]
    down = np.minimum.accumulate(f - ridx, axis=0) + ridx
    up = np.minimum.accumulate((f + ridx)[::-1], axis=0)[::-1] - ridx
    d = np.minimum(down, up)
    right = np.minimum.accumulate(d - cidx, axis=1) + cidx
    left = np.minimum.accumulate((d + cidx)[:, ::-1], axis=1)[:, ::-1] - cidx
    d = np.minimum(np.minimum(right, left), np.int64(cap))
    present = {(r["tx"], r["ty"]) for r in rows}
    exp_rows = []
    for (tx, ty) in sorted(present):
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        win = d[tr0:tr1, tc0:tc1]
        exp_rows.append((f"{tx}-{ty}", tx, ty,
                         int((win < cap).sum()), int(win.sum())))
    exp = pd.DataFrame(exp_rows, columns=["tile_id", "tx", "ty",
                                          "n_reached", "dist_sum"])
    got = out.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_overview_mean_matches_full_plane(ray_session):
    """Average-resample overview vs a serial pooled-plane oracle."""
    import ray.data as rd

    from raygeo.ops.overview import overview_level_mean

    rows, plane, valid = _random_mosaic(seed=31)
    out = overview_level_mean(rd.from_items(rows).repartition(4),
                              SRC.chunk).to_pandas()
    H, W = valid.shape
    cnt = valid.reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3)).astype(np.int64)
    sums = np.where(valid[:, :, None], plane.astype(np.int64), 0) \
        .reshape(H // 2, 2, W // 2, 2, 3).sum(axis=(1, 3))
    pvalid = cnt > 0
    means = np.floor_divide(sums, np.where(pvalid, cnt, 1)[:, :, None])
    kids = {}
    for r in rows:
        key = (r["tx"] // 2, r["ty"] // 2)
        kids[key] = kids.get(key, 0) + 1
    exp = []
    c = SRC.chunk
    for (ptx, pty) in sorted(kids):
        pv = pvalid[pty * c:(pty + 1) * c, ptx * c:(ptx + 1) * c]
        pm = means[pty * c:(pty + 1) * c, ptx * c:(ptx + 1) * c]
        exp.append((f"ovm-{ptx}-{pty}", ptx, pty, kids[(ptx, pty)],
                    int(pv.sum()), int(pm[pv].sum())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_children",
                                     "n_valid_px", "mean_sum"])
    got = out.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_point_sample_and_band_ratio(ray_session):
    """Point sampling (incl. out-of-grid and nodata points) and band-ratio
    stats vs direct gathers from the assembled plane."""
    import pyarrow as pa
    import ray.data as rd

    from raygeo.ops.zonal import band_ratio_stats, point_sample

    rows, plane, valid = _random_mosaic(seed=44, p_absent=0.35)
    ds = rd.from_items(rows).repartition(3)
    # points: a grid of centers incl. some guaranteed out-of-grid
    xs = np.linspace(-0.2, 1.4, 9)  # grid spans x0=0 .. x0+96*2^-7=0.75
    ys = np.linspace(0.1, 1.2, 9)
    pts = pa.table({
        "zone_id": pa.array([f"p-{i}" for i in range(9)], pa.string()),
        "lon_min": pa.array(xs[:9]), "lon_max": pa.array(xs[:9]),
        "lat_min": pa.array(ys[:9]), "lat_max": pa.array(ys[:9]),
    })
    got = (point_sample(ds, pts, SRC).to_pandas()
           .sort_values("zone_id").reset_index(drop=True))
    v = plane.astype(np.int64).sum(axis=2)
    exp_rows = []
    for i in range(9):
        col = int(np.floor((xs[i] - SRC.x0) / SRC.res))
        row = int(np.floor((SRC.y1 - ys[i]) / SRC.res))
        if 0 <= col < SRC.width and 0 <= row < SRC.height and valid[row, col]:
            exp_rows.append((f"p-{i}", 1, int(v[row, col])))
        else:
            exp_rows.append((f"p-{i}", 0, 0))
    exp = (pd.DataFrame(exp_rows, columns=["zone_id", "valid", "v"])
           .sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    out = band_ratio_stats(ds, SRC).to_pandas()
    a = plane[:, :, 0].astype(np.int64)
    b = plane[:, :, 1].astype(np.int64)
    sel = valid & (a + b > 0)
    q = np.where(sel, np.floor_divide(1000 * (a - b),
                                      np.where(sel, a + b, 1)), 0)
    present = {(r["tx"], r["ty"]) for r in rows}
    exp2 = []
    for (tx, ty) in sorted(present):
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        s = sel[tr0:tr1, tc0:tc1]
        exp2.append((f"{tx}-{ty}", tx, ty, int(s.sum()),
                     int(q[tr0:tr1, tc0:tc1][s].sum())))
    exp2 = pd.DataFrame(exp2, columns=["tile_id", "tx", "ty", "n_px",
                                       "ratio_sum"])
    got2 = out.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got2, exp2.sort_values(["tx", "ty"]).reset_index(drop=True),
        check_dtype=False)


def test_aspect_matches_full_plane(ray_session):
    """Aspect-class histograms vs the serial global-plane sector rule on
    a random mosaic with absent tiles."""
    import ray.data as rd

    from raygeo.ops.stencil import aspect_stats

    rows, plane, valid = _random_mosaic(seed=55)
    out = aspect_stats(rd.from_items(rows).repartition(4), SRC).to_pandas()
    v = plane.astype(np.int64).sum(axis=2)
    H, W = v.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    e, wst = P[1:-1, 2:], P[1:-1, :-2]
    s, n = P[2:, 1:-1], P[:-2, 1:-1]
    ok = (valid & M[1:-1, 2:] & M[1:-1, :-2] & M[2:, 1:-1] & M[:-2, 1:-1])
    dx, dy = e - wst, s - n
    q = np.where((dx > 0) & (dy >= 0), 0,
                 np.where((dx <= 0) & (dy > 0), 1,
                          np.where((dx < 0) & (dy <= 0), 2, 3)))
    cls = 2 * q + (np.abs(dy) > np.abs(dx)).astype(np.int64)
    cls = np.where((dx == 0) & (dy == 0), np.int64(8), cls)
    cls = np.where(ok, cls, np.int64(-1))
    present = {(r["tx"], r["ty"]) for r in rows}
    exp_rows = []
    for (tx, ty) in sorted(present):
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        win = cls[tr0:tr1, tc0:tc1]
        hist = np.bincount(win[win >= 0], minlength=9)
        for k in range(9):
            exp_rows.append((f"{tx}-{ty}", tx, ty, k, int(hist[k])))
    exp = pd.DataFrame(exp_rows, columns=["tile_id", "tx", "ty",
                                          "aspect_class", "n_px"])
    got = out.sort_values(["tx", "ty", "aspect_class"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty", "aspect_class"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
