"""Generic ring-exchange focal ops (focal median, curvature/TRI, Gi*-style
hot spots) vs serial full-plane oracles on random mosaics with absent tiles
and random validity — exercises interior map-side folds AND the exchanged
border ring, independent of the fixture goldens."""

import zlib

import numpy as np
import pandas as pd
import pytest

from raygeo.channels import RGB_CHANNELS, ChannelPack
from raygeo.grid import GridSpec
from raygeo.ops.stencil import (curvature_stats, focal_median_stats,
                                hotspot_stats)

SRC = GridSpec(name="s", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
               width=96, height=96, chunk=16)

_POS = 1 << 62


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


def _window_stacks(plane, valid):
    """(9, H, W) padded window stacks of the full plane."""
    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    S = np.empty((9, H, W), np.int64)
    C = np.empty((9, H, W), bool)
    i = 0
    for dr in range(3):
        for dc in range(3):
            S[i] = P[dr:dr + H, dc:dc + W]
            C[i] = M[dr:dr + H, dc:dc + W]
            i += 1
    return S, C


def _per_tile(rows, sel, *planes):
    # every grid tile with >=1 selected center appears — including ABSENT
    # tiles whose border centers draw from neighbor halos (median).
    exp = []
    del rows
    for tx in range(SRC.n_tx):
      for ty in range(SRC.n_ty):
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
        s = sel[tr0:tr1, tc0:tc1]
        if not s.any():
            continue
        vals = [int(p[tr0:tr1, tc0:tc1][s].sum()) for p in planes]
        exp.append((f"{tx}-{ty}", tx, ty, int(s.sum()), *vals))
    return exp


def _check(got, exp, cols):
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty"] + cols)
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("seed", [3, 17])
def test_focal_median_matches_full_plane(ray_session, seed):
    import ray.data as rd

    rows, plane, valid = _random_mosaic(seed=seed)
    got = focal_median_stats(rd.from_items(rows).repartition(5),
                             SRC).to_pandas()
    S, C = _window_stacks(plane, valid)
    Sv = np.where(C, S, _POS)
    Sv.sort(axis=0)
    k = C.sum(axis=0)
    sel = k > 0
    idx = np.maximum((k + 1) // 2 - 1, 0)
    med = np.take_along_axis(Sv, idx[None], axis=0)[0]
    med[~sel] = 0
    _check(got, _per_tile(rows, sel, med), ["n_px", "med_sum"])


def test_curvature_matches_full_plane(ray_session):
    import ray.data as rd

    rows, plane, valid = _random_mosaic(seed=29, p_absent=0.4)
    got = curvature_stats(rd.from_items(rows).repartition(4),
                          SRC).to_pandas()
    S, C = _window_stacks(plane, valid)
    center_v, center_m = S[4], C[4]
    lap = np.zeros(center_v.shape, np.int64)
    tri = np.zeros(center_v.shape, np.int64)
    anyn = np.zeros_like(center_m)
    for i in range(9):
        if i == 4:
            continue
        vn = C[i] & center_m
        anyn |= vn
        tri += np.where(vn, np.abs(S[i] - center_v), 0)
        if i in (1, 3, 5, 7):
            lap += np.where(vn, S[i] - center_v, 0)
    sel = center_m & anyn
    _check(got, _per_tile(rows, sel, lap, tri),
           ["n_px", "lap_sum", "tri_sum"])


def test_hotspot_matches_full_plane(ray_session):
    import ray.data as rd

    rows, plane, valid = _random_mosaic(seed=41)
    v = plane.astype(np.int64).sum(axis=2)
    V, N = int(v[valid].sum()), int(valid.sum())
    got = hotspot_stats(rd.from_items(rows).repartition(5),
                        SRC, V, N).to_pandas()
    S, C = _window_stacks(plane, valid)
    ws = np.where(C, S, 0).sum(axis=0)
    wc = C.sum(axis=0).astype(np.int64)
    sel = C[4]
    excess = ws * N - wc * V
    hot = (excess > 0) & sel
    _check(got, _per_tile(rows, sel, hot.astype(np.int64),
                          np.where(hot, excess, 0)),
           ["n_px", "n_hot", "hot_excess_sum"])
    # the hot selection is non-trivial on random data
    assert 0 < got.n_hot.sum() < got.n_px.sum()


@pytest.mark.parametrize("seed,p_absent", [(7, 0.3), (51, 0.45)])
def test_variogram_matches_full_plane(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.stencil import variogram_stats

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = (variogram_stats(rd.from_items(rows).repartition(5), SRC)
           .to_pandas().sort_values(["axis", "lag"]).reset_index(drop=True))
    v = plane.astype(np.int64).sum(axis=2)
    exp = []
    for ax in ("x", "y"):
        for h in (1, 2, 4):
            if ax == "x":
                b = valid[:, :-h] & valid[:, h:]
                d = v[:, h:] - v[:, :-h]
            else:
                b = valid[:-h, :] & valid[h:, :]
                d = v[h:, :] - v[:-h, :]
            exp.append((ax, h, int(b.sum()), int((d[b] ** 2).sum())))
    exp = pd.DataFrame(exp, columns=["axis", "lag", "n_pairs", "gamma2"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # straddling pairs actually crossed tiles: interior-only count is lower
    interior = 0
    for r in rows:
        tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(r["tx"], r["ty"])
        m = valid[tr0:tr1, tc0:tc1]
        for h in (1, 2, 4):
            interior += int((m[:, :-h] & m[:, h:]).sum())
            interior += int((m[:-h, :] & m[h:, :]).sum())
    assert got.n_pairs.sum() > interior


@pytest.mark.parametrize("seed,p_absent", [(11, 0.3), (77, 0.5)])
def test_flowaccum_matches_full_plane(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.spatialstats import _D8_OFF, flowaccum_stats
    from raygeo.ops.stencil import _flowdir_codes

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = flowaccum_stats(rd.from_items(rows).repartition(5), SRC,
                          channel_t=3).to_pandas()
    # serial full-plane walk (independent decomposition: no tiles at all)
    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
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
    for _ in range(10000):
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
    acc = acc.reshape(H, W)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            a = acc[tr0:tr1, tc0:tc1]
            pos = a > 0
            if not pos.any():
                continue
            exp.append((f"{tx}-{ty}", tx, ty, int(pos.sum()),
                        int(a.sum()), int(a.max()),
                        int((a >= 3).sum())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_px",
                                     "acc_sum", "acc_max", "n_channel"])
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # cross-tile flow actually happened: some tile's acc exceeds its own
    # cell count contribution only if paths enter from neighbors
    assert got.acc_max.max() > 1


def _serial_strahler(plane, valid):
    """Independent full-plane topological wave (no tiles): shares only
    the pure `_flowdir_codes` rule with the engine."""
    from raygeo.ops.spatialstats import _D8_OFF
    from raygeo.ops.stencil import _flowdir_codes

    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
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
    assert not (vmask & (order == 0)).any()
    return order.reshape(H, W)


@pytest.mark.parametrize("seed,p_absent", [(11, 0.3), (77, 0.5)])
def test_strahler_matches_full_plane(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.spatialstats import strahler_stats

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = strahler_stats(rd.from_items(rows).repartition(5),
                         SRC).to_pandas()
    order = _serial_strahler(plane, valid)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            o = order[tr0:tr1, tc0:tc1].ravel()
            o = o[o > 0]
            if not len(o):
                continue
            bc = np.bincount(o)
            for s in np.nonzero(bc)[0]:
                exp.append((f"{tx}-{ty}", tx, ty, int(s), int(bc[s])))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "strahler",
                                     "n_cells"])
    got = got.sort_values(["tx", "ty", "strahler"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty", "strahler"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # order >= 2 exists: confluences actually merged (the wave did work)
    assert got.strahler.max() >= 2


def _dijkstra_plane(plane, valid, seeds):
    """True heapq Dijkstra over the full plane — genuinely independent of
    the engine's sweep-relaxation decomposition."""
    import heapq

    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
    INF = 1 << 62
    D = np.full(H * W, INF, np.int64)
    h = []
    for (r, c) in seeds:
        if valid[r, c] and D[r * W + c] > 0:
            D[r * W + c] = 0
            heapq.heappush(h, (0, r * W + c))
    offs = [(-1, 0, 2), (1, 0, 2), (0, -1, 2), (0, 1, 2),
            (-1, -1, 3), (-1, 1, 3), (1, -1, 3), (1, 1, 3)]
    while h:
        d, i = heapq.heappop(h)
        if d > D[i]:
            continue
        r, c = divmod(i, W)
        for dr, dc, w in offs:
            nr, nc = r + dr, c + dc
            if 0 <= nr < H and 0 <= nc < W and valid[nr, nc]:
                nd = d + (v[r, c] + v[nr, nc]) * w
                if nd < D[nr * W + nc]:
                    D[nr * W + nc] = nd
                    heapq.heappush(h, (nd, nr * W + nc))
    return D.reshape(H, W)


def _cost_pts_table(seeds):
    import pyarrow as pa

    rows = {"zone_id": [], "lon_min": [], "lat_min": [],
            "lon_max": [], "lat_max": []}
    for k, (r, c) in enumerate(seeds):
        x = SRC.x0 + (c + 0.5) * SRC.res
        y = SRC.y1 - (r + 0.5) * SRC.res
        rows["zone_id"].append(f"p{k}")
        rows["lon_min"].append(x)
        rows["lon_max"].append(x)
        rows["lat_min"].append(y)
        rows["lat_max"].append(y)
    return pa.table(rows)


@pytest.mark.parametrize("seed,p_absent", [(11, 0.3), (77, 0.5)])
def test_costdist_matches_dijkstra(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.spatialstats import costdist_stats

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    seeds = [(int(rng.integers(0, 96)), int(rng.integers(0, 96)))
             for _ in range(6)]
    got = costdist_stats(rd.from_items(rows).repartition(5), SRC,
                         _cost_pts_table(seeds)).to_pandas()
    D = _dijkstra_plane(plane, valid, seeds)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            d = D[tr0:tr1, tc0:tc1]
            reach = d < (1 << 62)
            if not reach.any():
                continue
            exp.append((f"{tx}-{ty}", tx, ty, int(reach.sum()),
                        int(d[reach].sum()), int(d[reach].max())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_reach",
                                     "dist_sum", "dist_max"])
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # reach crossed at least one tile border (cross-tile strips did work)
    assert len(got) > 6


def test_costdist_partitioning_invariance(ray_session):
    import ray.data as rd

    from raygeo.ops.spatialstats import costdist_stats

    rows, _plane, _valid = _random_mosaic(seed=5, p_absent=0.2)
    pts = _cost_pts_table([(10, 10), (80, 70)])
    a = costdist_stats(rd.from_items(rows).repartition(2), SRC, pts) \
        .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True)
    b = costdist_stats(rd.from_items(rows).repartition(11), SRC, pts) \
        .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_strahler_partitioning_invariance(ray_session):
    import ray.data as rd

    from raygeo.ops.spatialstats import strahler_stats

    rows, _plane, _valid = _random_mosaic(seed=5, p_absent=0.2)
    a = strahler_stats(rd.from_items(rows).repartition(2), SRC) \
        .to_pandas().sort_values(["tx", "ty", "strahler"]) \
        .reset_index(drop=True)
    b = strahler_stats(rd.from_items(rows).repartition(11), SRC) \
        .to_pandas().sort_values(["tx", "ty", "strahler"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("seed,p_absent", [(13, 0.3), (99, 0.5)])
def test_reproject_nn_matches_full_plane(ray_session, seed, p_absent):
    """Cross-CRS NN warp vs a serial full-plane replay: every dst pixel
    center inverse-projected, forward-projected, floor-indexed, sampled
    from the global plane. Shares only the projection kernels + grid
    floor arithmetic — the gather decomposition is not reused."""
    import ray.data as rd

    from raygeo.geom import forward_xy, inverse_xy
    from raygeo.ops.stencil import reproject_nn

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    # dst: polar-stereo grid covering SRC's lon/lat extent
    xs, ys = forward_xy("POLAR_N", np.array([0.0, 0.75, 0.0, 0.75]),
                        np.array([0.25, 0.25, 1.0, 1.0]))
    pad = 30000.0
    x0 = float(xs.min()) - pad
    y1 = float(ys.max()) + pad
    span = max(float(xs.max() - xs.min()),
               float(ys.max() - ys.min())) + 2 * pad
    res = span / 80
    dst = GridSpec(name="d", crs="POLAR_N", x0=x0, y1=y1, res=res,
                   width=80, height=80, chunk=16)
    got = reproject_nn(rd.from_items(rows).repartition(5), SRC,
                       dst).to_pandas()
    v = plane.astype(np.int64).sum(axis=2)
    exp_rows = []
    for dty in range(dst.n_ty):
        for dtx in range(dst.n_tx):
            tc0, tc1, tr0, tr1 = dst.tile_pixel_window(dtx, dty)
            cols = np.arange(tc0, tc1, dtype=np.float64)
            rws = np.arange(tr0, tr1, dtype=np.float64)
            X, Y = np.meshgrid(dst.x0 + (cols + 0.5) * dst.res,
                               dst.y1 - (rws + 0.5) * dst.res)
            lon, lat = inverse_xy(dst.crs, X.ravel(), Y.ravel())
            sx, sy = forward_xy(SRC.crs, lon, lat)
            cs = np.floor((sx - SRC.x0) / SRC.res).astype(np.int64)
            rs = np.floor((SRC.y1 - sy) / SRC.res).astype(np.int64)
            inside = ((rs >= 0) & (rs < SRC.height)
                      & (cs >= 0) & (cs < SRC.width))
            ok = np.zeros(len(rs), bool)
            ok[inside] = valid[rs[inside], cs[inside]]
            if not ok.any():
                continue
            vs = v[rs[ok], cs[ok]]
            exp_rows.append((f"{dtx}-{dty}", dtx, dty, int(ok.sum()),
                             int(vs.sum())))
    exp = pd.DataFrame(exp_rows, columns=["tile_id", "tx", "ty", "n_px",
                                          "v_sum"])
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(exp) > 4  # the warp actually produced a multi-tile output


@pytest.mark.parametrize("seed,p_absent", [(23, 0.3), (88, 0.5)])
def test_watershed_matches_full_plane(ray_session, seed, p_absent):
    """Terminal-pit basin labeling vs a serial full-plane pointer
    doubling — independent decomposition (no tiles), shared D8 rule."""
    import ray.data as rd

    from raygeo.ops.spatialstats import _D8_OFF, watershed_stats
    from raygeo.ops.stencil import _flowdir_codes

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = watershed_stats(rd.from_items(rows).repartition(5),
                          SRC).to_pandas()
    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
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
    for _ in range(40):
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        res = ptr[j] < 0
        term[act[res]] = term[j[res]]
        ptr[act] = ptr[j]
    term = term.reshape(H, W)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            tt = term[tr0:tr1, tc0:tc1]
            ok = tt >= 0
            if not ok.any():
                continue
            vals, counts = np.unique(tt[ok], return_counts=True)
            exp.append((f"{tx}-{ty}", tx, ty, int(ok.sum()), len(vals),
                        int(tt[ok].sum()), int(counts.max())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_px",
                                     "n_basins", "basin_sum",
                                     "max_basin_px"])
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # basins do cross tile borders on random data
    assert got.n_basins.sum() > 0


def test_zonal_median_matches_brute(ray_session):
    """Exact zonal lower median vs a brute per-zone replay on a random
    mosaic — includes an out-of-grid zone (must be absent) and a
    zone over fully-absent tiles."""
    import pyarrow as pa
    import ray.data as rd

    from raygeo.ops.zonal import zonal_median

    rows, plane, valid = _random_mosaic(seed=61, p_absent=0.35)
    res = SRC.res
    zones = pa.table({
        "zone_id": pa.array([f"z{i}" for i in range(8)], pa.string()),
        "lon_min": pa.array([0.0, 0.1, 0.3, 0.55, 0.0, 5.0, 0.2, 0.66],
                            pa.float64()),
        "lat_min": pa.array([0.8, 0.3, 0.5, 0.26, 0.26, 5.0, 0.7, 0.9],
                            pa.float64()),
        "lon_max": pa.array([0.2, 0.2, 0.7, 0.74, 0.74, 6.0, 0.23, 0.70],
                            pa.float64()),
        "lat_max": pa.array([1.0, 0.5, 0.6, 0.5, 1.0, 6.0, 0.75, 0.95],
                            pa.float64()),
    })
    got = (zonal_median(rd.from_items(rows).repartition(5), zones, SRC)
           .to_pandas().sort_values("zone_id").reset_index(drop=True))
    v = plane.astype(np.int64).sum(axis=2)
    exp = []
    for i in range(8):
        c0 = max(int(np.floor((zones["lon_min"][i].as_py() - SRC.x0)
                              / res)), 0)
        c1 = min(int(np.floor((zones["lon_max"][i].as_py() - SRC.x0)
                              / res)), SRC.width - 1)
        r0 = max(int(np.floor((SRC.y1 - zones["lat_max"][i].as_py())
                              / res)), 0)
        r1 = min(int(np.floor((SRC.y1 - zones["lat_min"][i].as_py())
                              / res)), SRC.height - 1)
        if c1 < c0 or r1 < r0:
            continue
        m = valid[r0:r1 + 1, c0:c1 + 1]
        if not m.any():
            continue
        vals = np.sort(v[r0:r1 + 1, c0:c1 + 1][m])
        n = len(vals)
        exp.append((f"z{i}", n, int(vals[(n + 1) // 2 - 1])))
    exp = (pd.DataFrame(exp, columns=["zone_id", "n_px", "med_v"])
           .sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _serial_watershed_labels(plane, valid):
    from raygeo.ops.spatialstats import _D8_OFF
    from raygeo.ops.stencil import _flowdir_codes

    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
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
    for _ in range(40):
        act = np.nonzero(ptr >= 0)[0]
        if len(act) == 0:
            break
        j = ptr[act]
        res = ptr[j] < 0
        term[act[res]] = term[j[res]]
        ptr[act] = ptr[j]
    return v, term.reshape(H, W)


@pytest.mark.parametrize("seed,p_absent", [(19, 0.3), (71, 0.5)])
def test_basin_saddles_matches_full_plane(ray_session, seed, p_absent):
    """Spill elevation + depression depth per basin vs a serial
    full-plane replay (labels, 8-neighbor saddles, drains at nodata and
    grid edges)."""
    import ray.data as rd

    from raygeo.ops.spatialstats import basin_saddles

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = (basin_saddles(rd.from_items(rows).repartition(5), SRC)
           .to_pandas().sort_values("pit").reset_index(drop=True))
    v, term = _serial_watershed_labels(plane, valid)
    H, W = valid.shape
    Vp = np.zeros((H + 2, W + 2), np.int64)
    Mp = np.zeros((H + 2, W + 2), bool)
    Lp = np.full((H + 2, W + 2), -1, np.int64)
    Vp[1:-1, 1:-1] = v
    Mp[1:-1, 1:-1] = valid
    Lp[1:-1, 1:-1] = term
    spill: dict = {}
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            nv = Vp[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            nm = Mp[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            nl = Lp[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
            both = valid & nm & (term != nl)
            for lb, s in zip(term[both],
                             np.maximum(v[both], nv[both])):
                spill[lb] = min(spill.get(lb, 1 << 62), int(s))
            drain = valid & ~nm
            for lb, s in zip(term[drain], v[drain]):
                spill[lb] = min(spill.get(lb, 1 << 62), int(s))
    vals, counts = np.unique(term[valid], return_counts=True)
    flat_v = v.ravel()
    exp = pd.DataFrame({
        "pit": vals.astype(np.int64),
        "basin_px": counts.astype(np.int64),
        "pit_v": flat_v[vals],
        "spill_v": [spill[p] for p in vals],
    })
    exp["depth"] = exp["spill_v"] - exp["pit_v"]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got.depth >= 0).all() and got.depth.max() > 0


def test_session10_ops_partitioning_invariance(ray_session):
    """The new focal/routing/warp ops must be bit-identical under any
    input partitioning (the cross-plan discipline): run each at 2 and 11
    partitions and compare frames exactly."""
    import ray.data as rd

    from raygeo.ops.spatialstats import (basin_saddles, flowaccum_stats,
                                         watershed_stats)
    from raygeo.ops.stencil import (curvature_stats, focal_median_stats,
                                    variogram_stats)

    rows, _plane, _valid = _random_mosaic(seed=101, p_absent=0.35)
    for op in (focal_median_stats, curvature_stats, variogram_stats,
               flowaccum_stats, watershed_stats, basin_saddles):
        a = op(rd.from_items(rows).repartition(2), SRC).to_pandas()
        b = op(rd.from_items(rows).repartition(11), SRC).to_pandas()
        key = [c for c in a.columns if c in
               ("tile_id", "pit", "axis", "lag")]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_seasonal_composite_matches_serial(ray_session):
    """Seasonal grouped composite vs a serial per-(season, tile) max
    replay on synthetic temporal tile rows (uneven seasons, absent steps,
    disjoint validity across steps)."""
    import ray.data as rd

    from raygeo.ops.overview import seasonal_composite

    rng = np.random.Generator(np.random.PCG64(7))
    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    serial: dict = {}
    for t in range(5):  # 5 steps, season_len=2 -> seasons 0,0,1,1,2
        for ty in range(3):
            for tx in range(3):
                if rng.random() < 0.4:
                    continue
                canvas = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                mask = rng.random((16, 16)) < 0.7
                canvas[~mask] = 0
                rows.append({
                    "tile_id": f"{t}-{tx}-{ty}",
                    "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                    "mask_z": zlib.compress(
                        mask.astype(np.uint8).tobytes(), 1),
                })
                v = canvas.astype(np.int64).sum(axis=2)
                key = (t // 2, tx, ty)
                st = serial.setdefault(
                    key, [np.full((16, 16), -1, np.int64),
                          np.zeros((16, 16), bool)])
                upd = mask & (v > st[0])
                st[0][upd] = v[upd]
                st[1] |= mask
    g = GridSpec(name="t", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
                 width=48, height=48, chunk=16)
    got = (seasonal_composite(rd.from_items(rows).repartition(4), g)
           .to_pandas().sort_values(["season", "tile_id"])
           .reset_index(drop=True))
    exp = []
    for (s, tx, ty) in sorted(serial):
        vmax, anyv = serial[(s, tx, ty)]
        if not anyv.any():
            continue
        exp.append((s, f"{tx}-{ty}", tx, ty, int(anyv.sum()),
                    int(vmax[anyv].sum())))
    exp = pd.DataFrame(exp, columns=["season", "tile_id", "tx", "ty",
                                     "n_valid_px", "vmax_sum"])
    exp = exp.sort_values(["season", "tile_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.season.nunique() == 3


@pytest.mark.parametrize("seed,p_absent", [(33, 0.3), (92, 0.5)])
def test_basin_fill_matches_priority_flood(ray_session, seed, p_absent):
    """Distributed depression filling vs an INDEPENDENT serial
    priority-flood (heap over cells — no basin graph at all): the fill
    level at each pit must match the classic algorithm exactly."""
    import heapq

    import ray.data as rd

    from raygeo.ops.spatialstats import basin_fill

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = (basin_fill(rd.from_items(rows).repartition(5), SRC)
           .to_pandas().sort_values("pit").reset_index(drop=True))
    # serial priority-flood
    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
    fill = np.full((H, W), 1 << 62, np.int64)
    done = np.zeros((H, W), bool)
    heap = []
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1)]
    for r in range(H):
        for col in range(W):
            if not valid[r, col]:
                continue
            edge = (r in (0, H - 1)) or (col in (0, W - 1))
            if not edge:
                for dr, dc in offs:
                    if not valid[r + dr, col + dc]:
                        edge = True
                        break
            if edge:
                heapq.heappush(heap, (int(v[r, col]), r, col))
    while heap:
        cost, r, col = heapq.heappop(heap)
        if done[r, col]:
            continue
        done[r, col] = True
        fill[r, col] = cost
        for dr, dc in offs:
            nr, nc = r + dr, col + dc
            if 0 <= nr < H and 0 <= nc < W and valid[nr, nc] \
                    and not done[nr, nc]:
                heapq.heappush(heap, (max(cost, int(v[nr, nc])), nr, nc))
    # fill at each pit from the engine's output
    pits = got.pit.to_numpy()
    pr, pc = pits // W, pits % W
    exp_fill = fill[pr, pc]
    assert (got.fill_v.to_numpy() == exp_fill).all(), \
        f"{(got.fill_v.to_numpy() != exp_fill).sum()} pits mismatch"
    assert (got.filled_depth >= 0).all() and got.filled_depth.max() > 0
    assert (got.pit_v.to_numpy() == v[pr, pc]).all()


def test_basin_fill_tiny_blocks_regression(ray_session, monkeypatch):
    """Force 1-tile super-blocks (the seed-commit regression: a basin fed
    ONLY by frozen-external seeds must still commit its improvement —
    large blocks masked the bug)."""
    import ray.data as rd

    import raygeo.ops.spatialstats as ss

    monkeypatch.setattr("raygeo.util.cluster_cpus", lambda: 10**9)
    rows, plane, valid = _random_mosaic(seed=33, p_absent=0.3)
    got_small = (ss.basin_fill(rd.from_items(rows).repartition(5), SRC)
                 .to_pandas().sort_values("pit").reset_index(drop=True))
    monkeypatch.setattr("raygeo.util.cluster_cpus", lambda: 1)
    got_big = (ss.basin_fill(rd.from_items(rows).repartition(5), SRC)
               .to_pandas().sort_values("pit").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_small, got_big)


@pytest.mark.parametrize("seed,p_absent", [(31, 0.3), (32, 0.0)])
def test_glcm_matches_full_plane(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.stencil import glcm_stats

    rows, plane, valid = _random_mosaic(seed, p_absent)
    got = glcm_stats(rd.from_items(rows).repartition(5), SRC).to_pandas()

    v = plane.astype(np.int64).sum(axis=2)
    both = valid[:, :-1] & valid[:, 1:]
    va = v[:, :-1][both]
    vb = v[:, 1:][both]
    keys, cnt = np.unique((va << 16) | vb, return_counts=True)
    d2 = ((keys >> 16) - (keys & 0xFFFF)) ** 2
    assert got["n_pairs"].tolist() == [int(cnt.sum())]
    assert got["contrast"].tolist() == [int((d2 * cnt).sum())]
    assert got["energy"].tolist() == [int((cnt * cnt).sum())]
    assert got["homog_q6"].tolist() == [int((cnt * 1_000_000
                                             // (1 + d2)).sum())]


def test_glcm_partitioning_invariance(ray_session):
    import ray.data as rd

    from raygeo.ops.stencil import glcm_stats

    rows, _p, _v = _random_mosaic(seed=33, p_absent=0.35)
    a = glcm_stats(rd.from_items(rows).repartition(2), SRC).to_pandas()
    b = glcm_stats(rd.from_items(rows).repartition(11), SRC).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_timefill_matches_serial(ray_session):
    """Temporal gap interpolation vs a per-pixel brute-force serial
    replay (absent steps, random validity, leading/trailing gaps)."""
    import ray.data as rd

    from raygeo.ops.overview import timefill_stats

    rng = np.random.Generator(np.random.PCG64(41))
    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    stacks: dict = {}
    T = 6
    for t in range(T):
        for ty in range(2):
            for tx in range(2):
                if rng.random() < 0.35:
                    continue
                canvas = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                mask = rng.random((16, 16)) < 0.6
                canvas[~mask] = 0
                rows.append({
                    "tile_id": f"{t}-{tx}-{ty}",
                    "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                    "mask_z": zlib.compress(
                        mask.astype(np.uint8).tobytes(), 1),
                })
                st = stacks.setdefault(
                    (tx, ty), [np.zeros((T, 16, 16), np.int64),
                               np.zeros((T, 16, 16), bool)])
                st[0][t] = canvas.astype(np.int64).sum(axis=2)
                st[1][t] = mask
    g = GridSpec(name="t", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
                 width=32, height=32, chunk=16)
    got = (timefill_stats(rd.from_items(rows).repartition(4), g)
           .to_pandas().sort_values(["t_idx", "tile_id"])
           .reset_index(drop=True))
    exp = []
    for (tx, ty) in sorted(stacks):
        V, M = stacks[(tx, ty)]
        tmax = max(t for t in range(T) if M[t].any() or V[t].any()
                   or any(r["tile_id"] == f"{t}-{tx}-{ty}" for r in rows))
        for t in range(tmax + 1):
            nf = fs = 0
            for r in range(16):
                for c in range(16):
                    if M[t, r, c]:
                        continue
                    t0 = next((u for u in range(t - 1, -1, -1)
                               if M[u, r, c]), -1)
                    t1 = next((u for u in range(t + 1, T)
                               if M[u, r, c]), -1)
                    if t0 < 0 or t1 < 0:
                        continue
                    nf += 1
                    fs += int((V[t0, r, c] * (t1 - t)
                               + V[t1, r, c] * (t - t0)) // (t1 - t0))
            if nf:
                exp.append((t, f"{tx}-{ty}", nf, fs))
    exp = pd.DataFrame(exp, columns=["t_idx", "tile_id", "n_filled",
                                     "fill_sum"])
    exp = exp.sort_values(["t_idx", "tile_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) > 0


def test_timefill_partitioning_invariance(ray_session):
    import ray.data as rd

    from raygeo.ops.overview import timefill_stats

    rng = np.random.Generator(np.random.PCG64(43))
    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    for t in range(5):
        for ty in range(2):
            for tx in range(2):
                if rng.random() < 0.3:
                    continue
                canvas = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
                mask = rng.random((16, 16)) < 0.5
                canvas[~mask] = 0
                rows.append({
                    "tile_id": f"{t}-{tx}-{ty}",
                    "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                    "mask_z": zlib.compress(
                        mask.astype(np.uint8).tobytes(), 1),
                })
    g = GridSpec(name="t", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
                 width=32, height=32, chunk=16)
    a = (timefill_stats(rd.from_items(rows).repartition(2), g)
         .to_pandas().sort_values(["t_idx", "tile_id"])
         .reset_index(drop=True))
    b = (timefill_stats(rd.from_items(rows).repartition(9), g)
         .to_pandas().sort_values(["t_idx", "tile_id"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("seed,p_absent", [(51, 0.3), (52, 0.0)])
def test_viewshed_matches_full_plane(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.integral import viewshed_stats

    rows, plane, valid = _random_mosaic(seed, p_absent)
    got = (viewshed_stats(rd.from_items(rows).repartition(5), SRC)
           .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True))

    v = plane.astype(np.int64).sum(axis=2)
    mv = np.where(valid, v, -1)
    acc = np.maximum.accumulate(mv, axis=1)
    left = np.concatenate(
        [np.full((SRC.height, 1), -1, np.int64), acc[:, :-1]], axis=1)
    vis = valid & (v > left)
    exp = []
    for ty in range(SRC.n_ty):
        for tx in range(SRC.n_tx):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            m = valid[tr0:tr1, tc0:tc1]
            if not m.any():
                continue
            exp.append((f"{tx}-{ty}", tx, ty,
                        int(vis[tr0:tr1, tc0:tc1].sum()), int(m.sum())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty",
                                     "n_visible", "n_valid"])
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_viewshed_partitioning_invariance(ray_session):
    import ray.data as rd

    from raygeo.ops.integral import viewshed_stats

    rows, _p, _v = _random_mosaic(seed=53, p_absent=0.4)
    a = (viewshed_stats(rd.from_items(rows).repartition(2), SRC)
         .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True))
    b = (viewshed_stats(rd.from_items(rows).repartition(11), SRC)
         .to_pandas().sort_values(["tx", "ty"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_zonal_extremes_matches_brute(ray_session):
    """Zonal min/max + argmin/argmax locations vs brute replay (ties to
    smallest (y, x) exercised by the coarse value grid)."""
    import pyarrow as pa
    import ray.data as rd

    from raygeo.ops.zonal import zonal_extremes

    rows, plane, valid = _random_mosaic(seed=71, p_absent=0.3)
    res = SRC.res
    zones = pa.table({
        "zone_id": pa.array([f"z{i}" for i in range(5)], pa.string()),
        "lon_min": pa.array([0.0, 0.1, 0.3, 0.55, 5.0], pa.float64()),
        "lat_min": pa.array([0.8, 0.3, 0.5, 0.26, 5.0], pa.float64()),
        "lon_max": pa.array([0.2, 0.2, 0.7, 0.74, 6.0], pa.float64()),
        "lat_max": pa.array([1.0, 0.5, 0.6, 0.5, 6.0], pa.float64()),
    })
    got = (zonal_extremes(rd.from_items(rows).repartition(5), zones, SRC)
           .to_pandas().sort_values("zone_id").reset_index(drop=True))
    v = plane.astype(np.int64).sum(axis=2)
    exp = []
    for i in range(5):
        c0 = max(int(np.floor((zones["lon_min"][i].as_py() - SRC.x0)
                              / res)), 0)
        c1 = min(int(np.floor((zones["lon_max"][i].as_py() - SRC.x0)
                              / res)), SRC.width - 1)
        r0 = max(int(np.floor((SRC.y1 - zones["lat_max"][i].as_py())
                              / res)), 0)
        r1 = min(int(np.floor((SRC.y1 - zones["lat_min"][i].as_py())
                              / res)), SRC.height - 1)
        if c1 < c0 or r1 < r0:
            continue
        cand = [(int(v[y, x]), y, x)
                for y in range(r0, r1 + 1) for x in range(c0, c1 + 1)
                if valid[y, x]]
        if not cand:
            continue
        mn = min(cand)
        mx = min((-d, y, x) for d, y, x in cand)
        exp.append((f"z{i}", len(cand), mn[0], mn[1], mn[2],
                    -mx[0], mx[1], mx[2]))
    exp = (pd.DataFrame(exp, columns=["zone_id", "n_px", "v_min", "min_y",
                                      "min_x", "v_max", "max_y", "max_x"])
           .sort_values("zone_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(exp) >= 3


def test_tpi_matches_full_plane(ray_session):
    import ray.data as rd

    from raygeo.ops.stencil import tpi_stats

    rows, plane, valid = _random_mosaic(seed=41, p_absent=0.35)
    got = tpi_stats(rd.from_items(rows).repartition(4), SRC,
                    threshold=10).to_pandas()
    S, C = _window_stacks(plane, valid)
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
    ridge = (sel & (t > 10 * nn)).astype(np.int64)
    valley = (sel & (t < -10 * nn)).astype(np.int64)
    _check(got, _per_tile(rows, sel, ridge, valley),
           ["n_px", "n_ridge", "n_valley"])


def _serial_stream_links(plane, valid, channel_t):
    """Serial full-plane replay: acc walk -> channel mask -> link edges
    (target has exactly one channel donor) -> union-find."""
    from raygeo.ops.spatialstats import _D8_OFF
    from raygeo.ops.stencil import _flowdir_codes

    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
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
    while len(cur):
        u, inv = np.unique(cur, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        cur, cnt = u, s
        acc[cur] += cnt
        nx = nxt[cur]
        keep = nx >= 0
        cur, cnt = nx[keep], cnt[keep]
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

    for u in src:
        t = int(nxt[u])
        if chan[t] and cdon[t] == 1:
            a, b = sorted((find(int(u)), find(t)))
            parent[b] = a
    links: dict = {}
    for g in np.nonzero(chan)[0]:
        r = find(int(g))
        n, a = links.get(r, (0, 0))
        links[r] = (n + 1, max(a, int(acc[g])))
    return links


@pytest.mark.parametrize("seed,p_absent", [(11, 0.3), (77, 0.5)])
def test_stream_links_match_serial(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.spatialstats import stream_links

    rows, plane, valid = _random_mosaic(seed=seed, p_absent=p_absent)
    got = (stream_links(rd.from_items(rows).repartition(5), SRC,
                        channel_t=3)
           .to_pandas().reset_index(drop=True))
    links = _serial_stream_links(plane, valid, 3)
    exp = pd.DataFrame(
        [(k, *v) for k, v in sorted(links.items())],
        columns=["link_id", "n_cells", "acc_max"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_cells"].max() >= 2  # chains actually formed


def test_lbp_matches_full_plane(ray_session):
    import ray.data as rd

    from raygeo.ops.stencil import lbp_stats

    rows, plane, valid = _random_mosaic(seed=19, p_absent=0.35)
    got = (lbp_stats(rd.from_items(rows).repartition(4), SRC)
           .to_pandas().sort_values(["tx", "ty", "lbp"])
           .reset_index(drop=True))
    S, C = _window_stacks(plane, valid)
    center_v = S[4]
    allv = np.ones(center_v.shape, bool)
    code = np.zeros(center_v.shape, np.int64)
    bit = 0
    for i in range(9):
        if i == 4:
            continue
        allv &= C[i]
        code += (1 << bit) * (S[i] >= center_v)
        bit += 1
    sel = C[4] & allv
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            s = sel[tr0:tr1, tc0:tc1]
            cd = code[tr0:tr1, tc0:tc1][s]
            if not len(cd):
                continue
            bc = np.bincount(cd, minlength=256)
            for b in np.nonzero(bc)[0]:
                exp.append((f"{tx}-{ty}", tx, ty, int(b), int(bc[b])))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "lbp",
                                     "n_px"]).sort_values(
        ["tx", "ty", "lbp"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_upslope_value_weighted_matches_full_plane(ray_session):
    """Value-weighted flowaccum vs the serial walk with v weights."""
    import ray.data as rd

    from raygeo.ops.spatialstats import _D8_OFF, flowaccum_stats
    from raygeo.ops.stencil import _flowdir_codes

    rows, plane, valid = _random_mosaic(seed=11, p_absent=0.3)
    got = flowaccum_stats(rd.from_items(rows).repartition(5), SRC,
                          channel_t=5000,
                          value_weighted=True).to_pandas()
    H, W = valid.shape
    v = plane.astype(np.int64).sum(axis=2)
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
    cnt = v.ravel()[cur].copy()
    while len(cur):
        u, inv = np.unique(cur, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cnt)
        cur, cnt = u, s
        acc[cur] += cnt
        nx = nxt[cur]
        keep = nx >= 0
        cur, cnt = nx[keep], cnt[keep]
    acc = acc.reshape(H, W)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            a = acc[tr0:tr1, tc0:tc1]
            pos = a > 0
            if not pos.any():
                continue
            exp.append((f"{tx}-{ty}", tx, ty, int(pos.sum()),
                        int(a[pos].sum()), int(a[pos].max()),
                        int((a >= 5000).sum())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_px",
                                     "acc_sum", "acc_max", "n_channel"])
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cost_solve_incoming_distance_beyond_local_cap():
    """ADVICE r4 (high): border cells entering a cross-tile round carry
    globally accumulated distances that can exceed the pure local plane
    bound h*w*6*vmax; a cap based only on the local plane treated them
    as unreached and they propagated to ZERO cells."""
    from raygeo.ops.spatialstats import COST_INF, _cost_solve

    h, w = 1, 8
    V = np.ones((h, w), np.int64)           # local-only cap would be 49
    M = np.ones((h, w), bool)
    D = np.full((h, w), COST_INF, np.int64)
    D[0, 0] = 10_000                        # incoming distance >> 49
    _cost_solve(D, V, M)
    exp = 10_000 + 4 * np.arange(w)         # each axis step (1+1)*2 = 4
    assert (D[0] == exp).all()


def test_costdist_heterogeneous_cost_magnitudes(ray_session):
    """End-to-end ADVICE r4 repro: low-cost tiles (tiny local caps)
    downstream of high-cost terrain, seed far away — incoming strip
    distances exceed every low-cost block's local plane bound."""
    import ray.data as rd

    from raygeo.ops.spatialstats import costdist_stats

    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    plane = np.zeros((SRC.height, SRC.width, 3), np.uint8)
    valid = np.zeros((SRC.height, SRC.width), bool)
    for ty in range(SRC.n_ty):
        for tx in range(SRC.n_tx):
            fill = 255 if tx == 0 else 1    # high-cost wall, cheap plains
            canvas = np.full((16, 16, 3), fill, np.uint8)
            mask = np.ones((16, 16), bool)
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            plane[tr0:tr1, tc0:tc1] = canvas
            valid[tr0:tr1, tc0:tc1] = mask
            rows.append({
                "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
                "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                "mask_z": zlib.compress(mask.astype(np.uint8).tobytes(), 1),
            })
    seeds = [(0, 0)]
    got = costdist_stats(rd.from_items(rows).repartition(5), SRC,
                         _cost_pts_table(seeds)).to_pandas()
    D = _dijkstra_plane(plane, valid, seeds)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            d = D[tr0:tr1, tc0:tc1]
            reach = d < (1 << 62)
            if not reach.any():
                continue
            exp.append((f"{tx}-{ty}", tx, ty, int(reach.sum()),
                        int(d[reach].sum()), int(d[reach].max())))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_reach",
                                     "dist_sum", "dist_max"])
    got = got.sort_values(["tx", "ty"]).reset_index(drop=True)
    exp = exp.sort_values(["tx", "ty"]).reset_index(drop=True)
    assert len(got) == SRC.n_tx * SRC.n_ty  # every tile reached
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tri_matches_full_plane(ray_session):
    import ray.data as rd

    from raygeo.ops.stencil import tri_stats

    rows, plane, valid = _random_mosaic(seed=47, p_absent=0.35)
    got = tri_stats(rd.from_items(rows).repartition(4), SRC,
                    threshold=15).to_pandas()
    S, C = _window_stacks(plane, valid)
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
    rug = (sel & (tri > 15 * nn)).astype(np.int64)
    _check(got, _per_tile(rows, sel, np.where(sel, tri, 0), rug),
           ["n_px", "tri_sum", "n_rugged"])


def test_tile_impurity_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.zonal import tile_impurity

    rows, plane, valid = _random_mosaic(seed=53, p_absent=0.3)
    got = tile_impurity(rd.from_items(rows).repartition(4), SRC) \
        .to_pandas().sort_values("tile_id").reset_index(drop=True)
    v = plane.astype(np.int64).sum(axis=2)
    exp = []
    for tx in range(SRC.n_tx):
        for ty in range(SRC.n_ty):
            tc0, tc1, tr0, tr1 = SRC.tile_pixel_window(tx, ty)
            vals = v[tr0:tr1, tc0:tc1][valid[tr0:tr1, tc0:tc1]]
            n = len(vals)
            if not n:
                continue
            cnt = np.bincount(vals)
            ssq = int((cnt.astype(np.int64) ** 2).sum())
            exp.append((f"{tx}-{ty}", tx, ty, n,
                        (n * n - ssq) * 10**6 // (n * n)))
    exp = pd.DataFrame(exp, columns=["tile_id", "tx", "ty", "n_px",
                                     "impurity_q6"]) \
        .sort_values("tile_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_zonal_crosstab_matches_brute(ray_session):
    """Zone x value-class crosstab vs a brute per-zone replay — includes
    overlapping zones (both count) and an out-of-grid zone (absent)."""
    import pyarrow as pa
    import ray.data as rd

    from raygeo.ops.rasterize import _center_window
    from raygeo.ops.zonal import zonal_crosstab

    rows, plane, valid = _random_mosaic(seed=67, p_absent=0.35)
    zones = pa.table({
        "zone_id": pa.array([f"z{i}" for i in range(5)], pa.string()),
        "lon_min": pa.array([0.0, 0.1, 0.3, 5.0, 0.05], pa.float64()),
        "lat_min": pa.array([0.8, 0.3, 0.5, 5.0, 0.25], pa.float64()),
        "lon_max": pa.array([0.2, 0.2, 0.7, 6.0, 0.6], pa.float64()),
        "lat_max": pa.array([1.0, 0.5, 0.6, 6.0, 0.95], pa.float64()),
    })
    got = (zonal_crosstab(rd.from_items(rows).repartition(5), zones, SRC)
           .to_pandas().sort_values(["zone_id", "v_class"])
           .reset_index(drop=True))
    v = plane.astype(np.int64).sum(axis=2)
    cl, ch, rl, rh = _center_window(
        SRC, zones.column("lon_min").to_numpy(),
        zones.column("lat_min").to_numpy(),
        zones.column("lon_max").to_numpy(),
        zones.column("lat_max").to_numpy())
    exp = []
    for i in range(5):
        if ch[i] <= cl[i] or rh[i] <= rl[i]:
            continue
        m = valid[rl[i]:rh[i], cl[i]:ch[i]]
        vals = (v[rl[i]:rh[i], cl[i]:ch[i]][m]) // 100
        if not len(vals):
            continue
        bc = np.bincount(vals)
        for k in np.nonzero(bc)[0]:
            exp.append((f"z{i}", int(k), int(bc[k])))
    exp = pd.DataFrame(exp, columns=["zone_id", "v_class", "n_px"]) \
        .sort_values(["zone_id", "v_class"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
