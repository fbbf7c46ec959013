"""Spatial-statistics ops (Moran's moments, marching-squares contours,
Otsu table, IDW, D8 flow-path length) vs serial full-plane oracles on
random mosaics with absent tiles and random validity masks — independent
of both the fixture goldens and the DuckDB plane-dump oracles."""

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raygeo.channels import RGB_CHANNELS, ChannelPack
from raygeo.grid import GridSpec
from raygeo.ops.spatialstats import (contour_cases, flowlen_stats,
                                     idw_sample, morans_moments, otsu_table)

G = GridSpec(name="s", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
             width=96, height=96, chunk=16)


def _random_mosaic(seed, p_absent=0.3):
    rng = np.random.Generator(np.random.PCG64(seed))
    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    plane = np.zeros((G.height, G.width, 3), np.uint8)
    valid = np.zeros((G.height, G.width), bool)
    for ty in range(G.n_ty):
        for tx in range(G.n_tx):
            if rng.random() < p_absent:
                continue
            canvas = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            mask = rng.random((16, 16)) < 0.8
            canvas[~mask] = 0
            tc0, tc1, tr0, tr1 = G.tile_pixel_window(tx, ty)
            plane[tr0:tr1, tc0:tc1] = canvas
            valid[tr0:tr1, tc0:tc1] = mask
            rows.append({
                "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
                "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                "mask_z": zlib.compress(mask.astype(np.uint8).tobytes(), 1),
            })
    return rows, plane.astype(np.int64).sum(axis=2), valid


def _canon(df):
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


@pytest.mark.parametrize("seed", [1, 7])
def test_morans_matches_full_plane(ray_session, seed):
    import ray.data as rd

    rows, v, valid = _random_mosaic(seed)
    got = morans_moments(rd.from_items(rows).repartition(5), G).to_pandas()
    exp = []
    bh = valid[:, :-1] & valid[:, 1:]
    bv = valid[:-1, :] & valid[1:, :]
    for r in rows:
        tx, ty = r["tx"], r["ty"]
        tc0, tc1, tr0, tr1 = G.tile_pixel_window(tx, ty)
        m = valid[tr0:tr1, tc0:tc1]
        if not m.any():
            continue
        sel = v[tr0:tr1, tc0:tc1][m]
        # pairs owned by the left/top pixel's tile (may straddle east/south)
        hb = bh[tr0:tr1, tc0:min(tc1, G.width - 1)]
        a_h = v[tr0:tr1, tc0:min(tc1, G.width - 1)][hb]
        b_h = v[tr0:tr1, tc0 + 1:min(tc1 + 1, G.width)][hb]
        vb2 = bv[tr0:min(tr1, G.height - 1), tc0:tc1]
        a_v = v[tr0:min(tr1, G.height - 1), tc0:tc1][vb2]
        b_v = v[tr0 + 1:min(tr1 + 1, G.height), tc0:tc1][vb2]
        exp.append({
            "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
            "n_px": int(m.sum()), "v_sum": int(sel.sum()),
            "v2_sum": int((sel * sel).sum()),
            "w_pairs": int(hb.sum()) + int(vb2.sum()),
            "vv_sum": int((a_h * b_h).sum()) + int((a_v * b_v).sum()),
            "vpv_sum": int((a_h + b_h).sum()) + int((a_v + b_v).sum()),
        })
    e = pd.DataFrame(exp)
    pd.testing.assert_frame_equal(_canon(got[e.columns]), _canon(e))


@pytest.mark.parametrize("seed", [2, 9])
def test_contours_matches_full_plane(ray_session, seed):
    import ray.data as rd

    rows, v, valid = _random_mosaic(seed)
    iso = 384
    got = contour_cases(rd.from_items(rows).repartition(4), G,
                        iso=iso).to_pandas()
    ok = valid[:-1, :-1] & valid[:-1, 1:] & valid[1:, 1:] & valid[1:, :-1]
    codes = ((v[:-1, :-1] >= iso).astype(int)
             + 2 * (v[:-1, 1:] >= iso).astype(int)
             + 4 * (v[1:, 1:] >= iso).astype(int)
             + 8 * (v[1:, :-1] >= iso).astype(int))
    exp = []
    for r in rows:
        tx, ty = r["tx"], r["ty"]
        tc0, tc1, tr0, tr1 = G.tile_pixel_window(tx, ty)
        sub_ok = ok[tr0:min(tr1, G.height - 1), tc0:min(tc1, G.width - 1)]
        sub_c = codes[tr0:min(tr1, G.height - 1),
                      tc0:min(tc1, G.width - 1)]
        hist = np.bincount(sub_c[sub_ok], minlength=16)
        for cc in np.nonzero(hist)[0]:
            exp.append({"tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
                        "case_code": int(cc), "n_blocks": int(hist[cc])})
    e = pd.DataFrame(exp)
    pd.testing.assert_frame_equal(
        _canon(got[e.columns]).astype({"case_code": np.int64}),
        _canon(e).astype({"case_code": np.int64}))


def test_otsu_matches_serial(ray_session):
    import ray.data as rd

    rows, v, valid = _random_mosaic(seed=3)
    got = otsu_table(rd.from_items(rows).repartition(4), G).to_pandas()
    vals = v[valid]
    n, s = int(len(vals)), int(vals.sum())
    counts = np.bincount(vals, minlength=766)
    recs, c0, s0 = [], 0, 0
    for t in range(765):
        c0 += int(counts[t])
        s0 += int(counts[t]) * t
        c1 = n - c0
        crit = ((s0 * c1 - (s - s0) * c0) ** 2) // (c0 * c1) \
            if c0 > 0 and c1 > 0 else 0
        recs.append((t, c0, s0, crit))
    best = max(range(765), key=lambda i: (recs[i][3], -recs[i][0]))
    e = pd.DataFrame(recs, columns=["t", "cnt0", "sum0", "crit_q"])
    e["is_otsu"] = (e.index == best).astype(np.int64)
    pd.testing.assert_frame_equal(got.astype(np.int64), e.astype(np.int64))
    assert got["is_otsu"].sum() == 1


def test_idw_matches_serial(ray_session):
    import ray.data as rd

    rows, v, valid = _random_mosaic(seed=5)
    rng = np.random.Generator(np.random.PCG64(11))
    # points in grid coords; a couple off-grid to exercise the drop path
    lon = rng.uniform(-0.1, G.x1 + 0.1, 12)
    lat = rng.uniform(G.y0 - 0.1, 1.1, 12)
    pts = pa.table({"zone_id": [f"p{i}" for i in range(12)],
                    "lon_min": lon, "lon_max": lon,
                    "lat_min": lat, "lat_max": lat})
    R, Q = 12, 10**6
    got = idw_sample(rd.from_items(rows).repartition(4), pts, G,
                     radius=R, q=Q).to_pandas()
    exp = []
    for i in range(12):
        col = int(np.floor((lon[i] - G.x0) / G.res))
        row = int(np.floor((G.y1 - lat[i]) / G.res))
        if not (0 <= col < G.width and 0 <= row < G.height):
            continue
        r0, r1 = max(row - R, 0), min(row + R + 1, G.height)
        c0, c1 = max(col - R, 0), min(col + R + 1, G.width)
        m = valid[r0:r1, c0:c1]
        dr = np.arange(r0, r1) - row
        dc = np.arange(c0, c1) - col
        d2 = dr[:, None] ** 2 + dc[None, :] ** 2
        w = np.where(m, Q // (1 + d2), 0).astype(np.int64)
        if w.sum() == 0:
            continue
        exp.append({"zone_id": f"p{i}", "w_sum": int(w.sum()),
                    "wv_sum": int((w * v[r0:r1, c0:c1]).sum())})
    e = pd.DataFrame(exp)
    e["idw_q"] = e["wv_sum"] // e["w_sum"]
    pd.testing.assert_frame_equal(_canon(got[e.columns]), _canon(e))


@pytest.mark.parametrize("seed,p_absent", [(6, 0.3), (13, 0.0)])
def test_flowlen_matches_full_plane(ray_session, seed, p_absent):
    import ray.data as rd

    from raygeo.ops.stencil import _D8

    rows, v, valid = _random_mosaic(seed, p_absent=p_absent)
    got = flowlen_stats(rd.from_items(rows).repartition(5), G).to_pandas()
    H, W = v.shape
    P = np.zeros((H + 2, W + 2), np.int64)
    M = np.zeros((H + 2, W + 2), bool)
    P[1:-1, 1:-1] = v
    M[1:-1, 1:-1] = valid
    best = np.zeros((H, W), np.int64)
    code = np.full((H, W), 8, np.int64)
    tr = np.zeros((H, W), np.int64)
    tc = np.zeros((H, W), np.int64)
    vc = P[1:-1, 1:-1]
    for k, dr, dc, wt in _D8:
        vn = P[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        mn = M[1 + dr:1 + dr + H, 1 + dc:1 + dc + W]
        drop = (vc - vn) * np.int64(wt)
        okm = mn & (vc > vn) & (drop > best)
        best = np.where(okm, drop, best)
        code = np.where(okm, np.int64(k), code)
        tr = np.where(okm, np.int64(dr), tr)
        tc = np.where(okm, np.int64(dc), tc)
    rr, cc = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    flat_t = ((rr + tr) * W + (cc + tc)).ravel()
    ptr = np.full(H * W, -9, np.int64)
    d = np.zeros(H * W, np.int64)
    vf, cf = valid.ravel(), code.ravel()
    ptr[vf & (cf == 8)] = -1
    mov = vf & (cf < 8)
    ptr[mov] = flat_t[mov]
    d[mov] = 1
    while (ptr >= 0).any():
        act = np.nonzero(ptr >= 0)[0]
        j = ptr[act]
        d[act] += d[j]
        ptr[act] = ptr[j]
    dlen = d.reshape(H, W)
    exp = []
    for r in rows:
        tx, ty = r["tx"], r["ty"]
        tc0, tc1, tr0, tr1 = G.tile_pixel_window(tx, ty)
        m = valid[tr0:tr1, tc0:tc1]
        if not m.any():
            continue
        dw = dlen[tr0:tr1, tc0:tc1][m]
        exp.append({
            "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
            "n_px": int(m.sum()), "len_sum": int(dw.sum()),
            "max_len": int(dw.max()),
            "n_pits": int((code[tr0:tr1, tc0:tc1][m] == 8).sum()),
        })
    e = pd.DataFrame(exp)
    pd.testing.assert_frame_equal(_canon(got[e.columns]), _canon(e))


@pytest.mark.parametrize("seed", [3, 11])
def test_blur_matches_full_plane(ray_session, seed):
    """5x5 binomial blur vs a serial full-plane paint, including centers
    in ABSENT tiles that see valid neighbors through the 2-px halo."""
    import ray.data as rd

    from raygeo.ops.stencil import blur_stats

    rows, v, valid = _random_mosaic(seed, p_absent=0.4)
    got = (blur_stats(rd.from_items(rows).repartition(5), G)
           .to_pandas().set_index("tile_id"))
    b5 = np.array([1, 4, 6, 4, 1], np.int64)
    K = np.outer(b5, b5)
    H, W = v.shape
    exp: dict[str, list[int]] = {}
    for cy in range(H):
        for cx in range(W):
            y0, y1 = max(cy - 2, 0), min(cy + 3, H)
            x0, x1 = max(cx - 2, 0), min(cx + 3, W)
            ky0, kx0 = y0 - (cy - 2), x0 - (cx - 2)
            m = valid[y0:y1, x0:x1]
            w = K[ky0:ky0 + (y1 - y0), kx0:kx0 + (x1 - x0)]
            den = int(w[m].sum())
            if den == 0:
                continue
            num = int((w[m] * v[y0:y1, x0:x1][m]).sum())
            tid = f"{cx // G.chunk}-{cy // G.chunk}"
            ns = exp.setdefault(tid, [0, 0])
            ns[0] += 1
            ns[1] += num // den
    assert set(got.index) == set(exp)
    for tid, (n, s) in exp.items():
        assert int(got.loc[tid, "n_px"]) == n, tid
        assert int(got.loc[tid, "blur_q_sum"]) == s, tid
