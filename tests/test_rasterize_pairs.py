"""rasterize_zones (vector->raster burn) and footprint_overlap_degree (PBSM
self-join) vs serial numpy oracles on random boxes — including boxes that
cross tile borders and pairs sharing several cells (the duplicate-avoidance
case)."""

import numpy as np
import pandas as pd
import pytest

from raygeo.grid import GridSpec
from raygeo.ops.rasterize import _center_window, rasterize_zones
from raygeo.ops.spatial_join import footprint_overlap_degree

GRID = GridSpec(name="t", crs="EPSG:4326", x0=-1.0, y1=1.0, res=2.0**-6,
                width=128, height=128, chunk=16)


def _boxes(n, seed, max_w=0.4):
    rng = np.random.Generator(np.random.PCG64(seed))
    x0 = rng.uniform(-1.1, 0.9, n)
    y0 = rng.uniform(-1.1, 0.9, n)
    w = rng.uniform(0.02, max_w, n)
    h = rng.uniform(0.02, max_w, n)
    return x0, y0, x0 + w, y0 + h


def test_rasterize_matches_serial_burn(ray_session):
    import ray.data as rd

    n = 40
    x0, y0, x1, y1 = _boxes(n, seed=2)
    ids = np.array([f"z-{i:03d}" for i in range(n)], dtype=object)
    zones = pd.DataFrame({"zone_id": ids, "lon_min": x0, "lat_min": y0,
                          "lon_max": x1, "lat_max": y1})
    out = rasterize_zones(rd.from_pandas(zones).repartition(5), GRID).to_pandas()

    # serial oracle: paint the whole plane, max-rank (== max-id, ids sorted)
    plane = np.full((GRID.height, GRID.width), -1, dtype=np.int64)
    order = np.argsort(ids)
    cl, ch, rl, rh = _center_window(GRID, x0, y0, x1, y1)
    for k in order:  # ascending id -> later overwrite == max id wins
        plane[rl[k]:rh[k], cl[k]:ch[k]] = k
    rows = []
    for ty in range(GRID.height // GRID.chunk):
        for tx in range(GRID.width // GRID.chunk):
            sub = plane[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            vals, counts = np.unique(sub[sub >= 0], return_counts=True)
            for v, c in zip(vals, counts):
                rows.append((f"{tx}-{ty}", ids[v], int(c)))
    exp = pd.DataFrame(rows, columns=["tile_id", "zone_id", "n_px"])

    key = ["tile_id", "zone_id"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # conservation: every burned pixel counted exactly once
    assert got.n_px.sum() == int((plane >= 0).sum())


def test_footprint_overlap_degree_no_double_count(ray_session):
    import ray.data as rd

    n = 300
    x0, y0, x1, y1 = _boxes(n, seed=7, max_w=0.5)  # wide: spans many cells
    ids = [f"im-{i:04d}" for i in range(n)]
    df = pd.DataFrame({"image_id": ids, "lon_min": x0, "lat_min": y0,
                       "lon_max": x1, "lat_max": y1})
    bound = (-1.0, -1.0, 1.0, 1.0)
    out = footprint_overlap_degree(
        rd.from_pandas(df).repartition(7), GRID, bound).to_pandas()

    keep = (x0 >= -1.0) & (x1 <= 1.0) & (y0 >= -1.0) & (y1 <= 1.0)
    idx = np.nonzero(keep)[0]
    deg = {}
    for a in range(len(idx)):
        for b in range(a + 1, len(idx)):
            i, j = idx[a], idx[b]
            if (x0[i] < x1[j] and x0[j] < x1[i]
                    and y0[i] < y1[j] and y0[j] < y1[i]):
                deg[ids[i]] = deg.get(ids[i], 0) + 1
                deg[ids[j]] = deg.get(ids[j], 0) + 1
    exp = (pd.DataFrame(sorted(deg.items()), columns=["image_id", "n_overlaps"])
           .astype({"n_overlaps": np.int64}))
    got = out.sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_coverage_depth_matches_dense_paint(ray_session):
    """Difference-array fold == literal dense accumulation over the whole
    grid, including tile-border-straddling and out-of-bounds footprints."""
    import pandas as pd
    import ray.data as rd

    from raygeo.grid import GridSpec
    from raygeo.ops.rasterize import coverage_depth

    grid = GridSpec(name="t", crs="EPSG:4326", x0=-1.0, y1=1.0,
                    res=2.0 ** -5, width=64, height=64, chunk=16)
    rng = np.random.default_rng(21)
    n = 60
    x0 = rng.uniform(-1.2, 0.9, n)
    y0 = rng.uniform(-1.2, 0.9, n)
    w = rng.uniform(0.01, 0.8, n)
    df = pd.DataFrame({"lon_min": x0, "lon_max": x0 + w,
                       "lat_min": y0, "lat_max": y0 + w})
    got = coverage_depth(rd.from_pandas(df).repartition(5), grid).to_pandas()

    dense = np.zeros((64, 64), np.int64)
    cl, ch, rl, rh = grid.pixel_window(
        df.lon_min.to_numpy(), df.lat_min.to_numpy(),
        df.lon_max.to_numpy(), df.lat_max.to_numpy())
    for a, b, c, d in zip(cl, ch, rl, rh):
        dense[c:d, a:b] += 1
    pos = dense[dense > 0]
    bc = np.bincount(pos)
    nz = np.nonzero(bc)[0]
    want = pd.DataFrame({"depth": nz.astype(np.int64),
                         "n_pixels": bc[nz].astype(np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_zonal_perimeter_matches_dense_count(ray_session):
    """Strip-exchange perimeter == dense whole-grid directed-edge count,
    with overlapping zones (max id wins), tile-straddlers and borders."""
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.rasterize import _center_window, zonal_perimeter

    grid = GridSpec(name="t", crs="EPSG:4326", x0=-1.0, y1=1.0,
                    res=2.0 ** -5, width=64, height=64, chunk=16)
    rng = np.random.default_rng(31)
    n = 25
    x0 = rng.uniform(-1.1, 0.8, n)
    y0 = rng.uniform(-1.1, 0.8, n)
    w = rng.uniform(0.05, 0.7, n)
    zid = [f"z{i % 9:02d}" for i in range(n)]  # duplicates merge zones
    df = pd.DataFrame({"zone_id": zid,
                       "lon_min": x0, "lon_max": x0 + w,
                       "lat_min": y0, "lat_max": y0 + w})
    got = zonal_perimeter(rd.from_pandas(df).repartition(4), grid) \
        .to_pandas()

    # dense reference
    plane = np.full((64, 64), "", dtype=object)
    cl, ch, rl, rh = _center_window(
        grid, df.lon_min.to_numpy(), df.lat_min.to_numpy(),
        df.lon_max.to_numpy(), df.lat_max.to_numpy())
    for i in np.argsort(np.asarray(zid, object), kind="stable"):
        if ch[i] > cl[i] and rh[i] > rl[i]:
            plane[rl[i]:rh[i], cl[i]:ch[i]] = zid[i]
    per = {}
    for r in range(64):
        for c in range(64):
            z = plane[r, c]
            if not z:
                continue
            for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                rr, cc = r + dr, c + dc
                if not (0 <= rr < 64 and 0 <= cc < 64) \
                        or plane[rr, cc] != z:
                    per[z] = per.get(z, 0) + 1
    want = pd.DataFrame(sorted(per.items()),
                        columns=["zone_id", "perimeter"])
    want["perimeter"] = want["perimeter"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_zones_dissolve_matches_serial(ray_session):
    """Dissolve vs a serial union-find + full-plane burn on random boxes
    (overlap chains, containment, isolated zones)."""
    import ray.data as rd

    from raygeo.ops.rasterize import zones_dissolve

    g = GridSpec(name="s", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
                 width=96, height=96, chunk=16)
    rng = np.random.Generator(np.random.PCG64(23))
    rows = []
    for i in range(30):
        cx, cy = rng.uniform(0.05, 0.7, 2)
        w, h = rng.uniform(0.01, 0.12, 2)
        rows.append((f"z{i:02d}", cx, cy * 1.0, cx + w, cy + h))
    zones = pd.DataFrame(rows, columns=["zone_id", "lon_min", "lat_min",
                                        "lon_max", "lat_max"])
    got = (zones_dissolve(rd.from_pandas(zones).repartition(4), g)
           .to_pandas().reset_index(drop=True))

    cl, ch, rl, rh = _center_window(
        g, zones.lon_min.to_numpy(), zones.lat_min.to_numpy(),
        zones.lon_max.to_numpy(), zones.lat_max.to_numpy())
    keep = (ch > cl) & (rh > rl)
    ids = zones.zone_id.to_numpy()[keep]
    cl, ch, rl, rh = cl[keep], ch[keep], rl[keep], rh[keep]
    parent = {z: z for z in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if (max(cl[i], cl[j]) < min(ch[i], ch[j])
                    and max(rl[i], rl[j]) < min(rh[i], rh[j])):
                a, b = sorted((find(ids[i]), find(ids[j])))
                parent[b] = a
    comp = {z: find(z) for z in ids}
    plane = np.full((g.height, g.width), "", dtype=object)
    for i in range(n):
        plane[rl[i]:rh[i], cl[i]:ch[i]] = comp[ids[i]]
    exp = {}
    for cp in set(comp.values()):
        exp[cp] = (sum(1 for z in ids if comp[z] == cp),
                   int((plane == cp).sum()))
    exp = pd.DataFrame(
        [(k, *v) for k, v in sorted(exp.items())],
        columns=["comp_id", "n_zones", "union_px"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got["n_zones"].max() >= 2  # chains actually merged
