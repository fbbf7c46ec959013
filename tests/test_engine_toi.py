"""Query-path (engine.load, K5 read-window analog) and TOI-snap (J6) tests.

The load() test mirrors the reference's golden-stats pattern
(``tests/test_arcticdem.py:26-29``): window statistics of a loaded ROI must
equal a brute-force numpy mosaic of the same ROI. TOI snapping is checked
against pandas ``DatetimeIndex.get_indexer`` — the exact function the
reference calls (``core/backend.py:256-257``, ``core/toi.py:26-42``).
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from raygeo import toi as toi_mod
from raygeo.codec import decode
from raygeo.channels import RGB_CHANNELS
from raygeo.cube import CubeSpec, create
from raygeo.engine import load
from raygeo.fixtures import FIXTURE_GRID, footprint_of


AXIS = pd.DatetimeIndex(
    [f"2024-01-0{d} 00:00:00" for d in range(1, 9)]
)


def test_snap_nearest_matches_pandas():
    rng = np.random.Generator(np.random.PCG64(7))
    ts = pd.to_datetime("2023-12-30") + pd.to_timedelta(
        rng.integers(0, 12 * 24 * 3600, size=500), unit="s"
    )
    got = toi_mod.snap_nearest(AXIS.values, ts.values)
    exp = AXIS.get_indexer(ts, method="nearest")
    assert np.array_equal(got, exp)


def test_snap_nearest_midpoint_tie_prefers_later():
    # exactly halfway between axis[0] and axis[1]
    mid = np.array(["2024-01-01 12:00:00"], dtype="datetime64[us]")
    got = toi_mod.snap_nearest(AXIS.values, mid)
    exp = AXIS.get_indexer(pd.DatetimeIndex(mid), method="nearest")
    assert got[0] == exp[0]


def test_snap_pad_bfill_match_pandas():
    ts = pd.DatetimeIndex(
        ["2023-12-31", "2024-01-01", "2024-01-03 12:00", "2024-01-08", "2024-02-01"]
    )
    assert np.array_equal(
        toi_mod.snap_pad(AXIS.values, ts.values),
        AXIS.get_indexer(ts, method="pad"),
    )
    got_b = toi_mod.snap_bfill(AXIS.values, ts.values)
    exp_b = AXIS.get_indexer(ts, method="bfill")
    # pandas uses -1 for "no element >= ts"; ours uses len(axis)
    got_b = np.where(got_b == len(AXIS), -1, got_b)
    assert np.array_equal(got_b, exp_b)


def test_toi_to_index_slice_and_scalar():
    idx = toi_mod.toi_to_index(AXIS.values, (np.datetime64("2024-01-02"),
                                             np.datetime64("2024-01-05")))
    assert idx.tolist() == [1, 2, 3, 4]
    idx = toi_mod.toi_to_index(AXIS.values, np.datetime64("2024-01-03 11:00"))
    assert idx.tolist() == [2]
    assert toi_mod.toi_to_index(AXIS.values, None).tolist() == list(range(8))


def test_toi_to_index_pad_bfill_methods():
    """Reference toi.py:26-42 indexer methods on scalar/list TOIs."""
    t = np.datetime64("2024-01-03 11:00")
    assert toi_mod.toi_to_index(AXIS.values, t, method="pad").tolist() == [2]
    assert toi_mod.toi_to_index(AXIS.values, t, method="bfill").tolist() == [3]
    assert toi_mod.toi_to_index(AXIS.values, t, method="nearest").tolist() == [2]
    # out-of-range lookups drop (get_indexer -1 analog)
    before = np.datetime64("2023-06-01")
    after = np.datetime64("2025-06-01")
    assert toi_mod.toi_to_index(AXIS.values, before, method="pad").tolist() == []
    assert toi_mod.toi_to_index(AXIS.values, after, method="bfill").tolist() == []
    # mixed list: the before-axis lookup drops, the after-axis one pads to
    # the last step
    assert toi_mod.toi_to_index(
        AXIS.values, [before, t, after], method="pad"
    ).tolist() == [2, len(AXIS) - 1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        toi_mod.toi_to_index(AXIS.values, t, method="wat")


def _window_oracle(images_path, grid, cl, ch, rl, rh):
    """Brute-force sorted-LWW mosaic of just the query window."""
    t = pq.read_table(images_path)
    rows = sorted(t.to_pylist(), key=lambda r: int(r["image_id"].rsplit("-", 1)[1]))
    rgb = np.zeros((rh - rl, ch - cl, 3), np.uint8)
    mask = np.zeros((rh - rl, ch - cl), bool)
    for r in rows:
        box = footprint_of(r["image_id"], r["w"], r["h"], grid)
        c0, c1, r0, r1 = (int(v[0]) for v in grid.pixel_window(
            np.array([box[0]]), np.array([box[1]]),
            np.array([box[2]]), np.array([box[3]])))
        c0w, c1w = max(c0, cl), min(c1, ch)
        r0w, r1w = max(r0, rl), min(r1, rh)
        if c1w <= c0w or r1w <= r0w:
            continue
        pix = decode(r["bytes"])
        rgb[r0w - rl : r1w - rl, c0w - cl : c1w - cl] = pix[
            r0w - r0 : r1w - r0, c0w - c0 : c1w - c0
        ]
        mask[r0w - rl : r1w - rl, c0w - cl : c1w - cl] = True
    v = rgb[mask]
    return {
        "n_valid_px": int(mask.sum()),
        "pix_sum": int(v.astype(np.int64).sum()) if len(v) else 0,
        "pix_min": int(v.min()) if len(v) else None,
        "pix_max": int(v.max()) if len(v) else None,
    }


def _mk_cube(path, g):
    spec = CubeSpec(title="t", grid=g, channels=RGB_CHANNELS)
    return create(spec, str(path))


def test_load_roi_window_matches_oracle(ray_session, fixtures_sf0001, tmp_path):
    import ray.data as rd

    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube", g)
    images_path = f"{fixtures_sf0001}/images.parquet"
    images = rd.read_parquet(images_path,
                             columns=["image_id", "bytes", "w", "h"])
    roi = {"roi_id": "r0", "lon_min": -0.4, "lat_min": -0.3,
           "lon_max": 0.1, "lat_max": 0.25}
    win = load(cube, roi, images_ds=images)
    exp = _window_oracle(images_path, g, win.col_lo, win.col_hi,
                         win.row_lo, win.row_hi)
    assert win.stats() == exp

    # second load of an overlapping ROI: tiles now cached, no images needed
    roi2 = {"roi_id": "r1", "lon_min": -0.3, "lat_min": -0.2,
            "lon_max": 0.0, "lat_max": 0.2}
    win2 = load(cube, roi2, images_ds=None)
    exp2 = _window_oracle(images_path, g, win2.col_lo, win2.col_hi,
                          win2.row_lo, win2.row_hi)
    assert win2.stats() == exp2


def test_load_out_of_bounds_roi_raises(ray_session, fixtures_sf0001, tmp_path):
    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube", g)
    roi = {"roi_id": "oob", "lon_min": 5.0, "lat_min": 5.0,
           "lon_max": 6.0, "lat_max": 6.0}
    with pytest.raises(ValueError, match="no adjacent tiles"):
        load(cube, roi)


def test_load_toi_on_nontemporal_raises(ray_session, tmp_path):
    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube", g)
    with pytest.raises(ValueError, match="non-temporal"):
        load(cube, {"roi_id": "x", "lon_min": 0, "lat_min": 0,
                    "lon_max": 0.1, "lat_max": 0.1},
             toi=np.datetime64("2024-01-01"))


def _brute_force_temporal(images_path, grid):
    """Sorted-LWW mosaic per (t, tx, ty) with nearest-snapped times."""
    from raygeo.fixtures import timestamp_of
    from raygeo.toi import snap_nearest

    t = pq.read_table(images_path)
    rows = sorted(t.to_pylist(), key=lambda r: int(r["image_id"].rsplit("-", 1)[1]))
    axis = grid.time_axis()
    tiles = {}
    for r in rows:
        ti = int(snap_nearest(axis, np.array([timestamp_of(r["image_id"])]))[0])
        box = footprint_of(r["image_id"], r["w"], r["h"], grid)
        c0, c1, r0, r1 = (int(v[0]) for v in grid.pixel_window(
            np.array([box[0]]), np.array([box[1]]),
            np.array([box[2]]), np.array([box[3]])))
        if c1 <= c0 or r1 <= r0:
            continue
        pix = decode(r["bytes"])
        for tx in range(c0 // grid.chunk, (c1 - 1) // grid.chunk + 1):
            for ty in range(r0 // grid.chunk, (r1 - 1) // grid.chunk + 1):
                tc0, tc1, tr0, tr1 = grid.tile_pixel_window(tx, ty)
                cc0, cc1 = max(c0, tc0), min(c1, tc1)
                rr0, rr1 = max(r0, tr0), min(r1, tr1)
                if cc1 <= cc0 or rr1 <= rr0:
                    continue
                key = f"{ti}-{tx}-{ty}"
                if key not in tiles:
                    tiles[key] = (
                        np.zeros((grid.chunk, grid.chunk, 3), np.uint8),
                        np.zeros((grid.chunk, grid.chunk), bool),
                    )
                canvas, mask = tiles[key]
                canvas[rr0 - tr0 : rr1 - tr0, cc0 - tc0 : cc1 - tc0] = pix[
                    rr0 - r0 : rr1 - r0, cc0 - c0 : cc1 - c0
                ]
                mask[rr0 - tr0 : rr1 - tr0, cc0 - tc0 : cc1 - tc0] = True
    return {
        k: {
            "n_valid_px": int(m.sum()),
            "pix_sum": int(np.where(m[:, :, None], c, 0).astype(np.int64).sum()),
        }
        for k, (c, m) in tiles.items()
    }


def test_temporal_ingest_matches_bruteforce(ray_session, fixtures_sf0001):
    import ray.data as rd

    from raygeo.fixtures import TEMPORAL_GRID
    from raygeo.ops.ingest import ingest

    images_path = f"{fixtures_sf0001}/images.parquet"
    images = rd.read_parquet(images_path, columns=["image_id", "bytes", "w", "h"])
    got = {
        r["tile_id"]: {"n_valid_px": r["n_valid_px"], "pix_sum": r["pix_sum"]}
        for r in ingest(images, TEMPORAL_GRID).to_pandas().to_dict("records")
    }
    exp = _brute_force_temporal(images_path, TEMPORAL_GRID)
    assert got == exp
    # every tile id carries a time index in [0, 4)
    assert all(0 <= int(k.split("-")[0]) < 4 for k in got)


def test_temporal_load_toi_slice(ray_session, fixtures_sf0001, tmp_path):
    import ray.data as rd

    from raygeo.fixtures import TEMPORAL_GRID

    cube = _mk_cube(tmp_path / "cube_t", TEMPORAL_GRID)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    roi = {"roi_id": "rt", "lon_min": -0.2, "lat_min": -0.2,
           "lon_max": 0.2, "lat_max": 0.2}
    wins = load(cube, roi, images_ds=images,
                toi=(np.datetime64("2024-01-02"), np.datetime64("2024-01-03")))
    assert sorted(wins) == ["2024-01-02T00:00:00", "2024-01-03T00:00:00"]
    # scalar toi snaps nearest and hits the cache (no images needed)
    win1 = load(cube, roi, toi=np.datetime64("2024-01-02T03:00"))
    (k, w1), = win1.items()
    assert k == "2024-01-02T00:00:00"
    assert w1.stats() == wins["2024-01-02T00:00:00"].stats()
    assert w1.stats()["n_valid_px"] > 0


def test_load_like_reproduces_window(ray_session, fixtures_sf0001, tmp_path):
    """load_like(ref) (accessor.py:302-329): the same pixel window reloads
    positionally identical — from cache, and into a second fresh cube where
    it triggers ingest of exactly the reference window's tiles."""
    import ray.data as rd

    from raygeo.engine import load_like

    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube_ll", g)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    roi = {"roi_id": "r", "lon_min": -0.3, "lat_min": -0.2,
           "lon_max": 0.25, "lat_max": 0.3}
    win = load(cube, roi, images_ds=images)
    # cached reload
    again = load_like(cube, win)
    assert (again.col_lo, again.col_hi, again.row_lo, again.row_hi) == (
        win.col_lo, win.col_hi, win.row_lo, win.row_hi)
    assert np.array_equal(again.mask, win.mask)
    assert np.array_equal(again.rgb, win.rgb)
    # fresh cube: load_like must ingest the same window on demand
    cube2 = _mk_cube(tmp_path / "cube_ll2", g)
    fresh = load_like(cube2, win, images_ds=images)
    assert np.array_equal(fresh.mask, win.mask)
    assert np.array_equal(fresh.rgb, win.rgb)


def test_load_like_temporal(ray_session, fixtures_sf0001, tmp_path):
    import ray.data as rd

    from raygeo.engine import load_like
    from raygeo.fixtures import TEMPORAL_GRID

    cube = _mk_cube(tmp_path / "cube_llt", TEMPORAL_GRID)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    roi = {"roi_id": "rt", "lon_min": -0.15, "lat_min": -0.15,
           "lon_max": 0.15, "lat_max": 0.15}
    wins = load(cube, roi, images_ds=images,
                toi=(np.datetime64("2024-01-02"), np.datetime64("2024-01-03")))
    again = load_like(cube, wins)
    assert sorted(again) == sorted(wins)
    for k in wins:
        assert np.array_equal(again[k].mask, wins[k].mask)
        assert np.array_equal(again[k].rgb, wins[k].rgb)


def test_load_toi_pad_bfill_methods(ray_session, fixtures_sf0001, tmp_path):
    """toi_method threads through load(): pad picks the earlier step,
    bfill the later one, for a between-steps scalar TOI."""
    import ray.data as rd

    from raygeo.fixtures import TEMPORAL_GRID

    cube = _mk_cube(tmp_path / "cube_pm", TEMPORAL_GRID)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    roi = {"roi_id": "rp", "lon_min": -0.1, "lat_min": -0.1,
           "lon_max": 0.1, "lat_max": 0.1}
    t = np.datetime64("2024-01-02T20:00")  # between steps 1 and 2
    pad = load(cube, roi, images_ds=images, toi=t, toi_method="pad")
    assert list(pad) == ["2024-01-02T00:00:00"]
    bfill = load(cube, roi, images_ds=images, toi=t, toi_method="bfill")
    assert list(bfill) == ["2024-01-03T00:00:00"]
    nearest = load(cube, roi, toi=t)  # default nearest -> later (closer)
    assert list(nearest) == ["2024-01-03T00:00:00"]


def test_current_state_reports_committed_tiles(ray_session, fixtures_sf0001,
                                               tmp_path):
    import ray.data as rd

    from raygeo.engine import current_state
    from raygeo.ops.ingest import ingest

    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube_cs", g)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"]).limit(100)
    n = ingest(images, g, cube_path=cube).count()
    st = current_state(cube).to_pandas()
    assert len(st) == n
    # geometry is the exact tile box
    row = st.iloc[0]
    assert row.lon_min == g.x0 + row.tx * g.chunk * g.res
    assert (st.lon_max > st.lon_min).all() and (st.lat_max > st.lat_min).all()


def test_load_lazy_equals_persist(ray_session, fixtures_sf0001, tmp_path):
    """persist=False returns a streaming Dataset of cropped tile windows
    whose reassembly equals the persist=True window bit-for-bit."""
    import ray.data as rd

    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube_lazy", g)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    roi = {"roi_id": "rl", "lon_min": -0.3, "lat_min": -0.25,
           "lon_max": 0.15, "lat_max": 0.2}
    win = load(cube, roi, images_ds=images, persist=True)
    lazy = load(cube, roi, persist=False)
    rgb = np.zeros_like(win.rgb)
    mask = np.zeros_like(win.mask)
    for r in lazy.to_pandas().to_dict("records"):
        h, w = r["h"], r["w"]
        frag = np.frombuffer(r["px"], np.uint8).reshape(h, w, 3)
        m = np.frombuffer(r["mask"], np.uint8).reshape(h, w).astype(bool)
        rgb[r["y0"]:r["y0"]+h, r["x0"]:r["x0"]+w] = frag
        mask[r["y0"]:r["y0"]+h, r["x0"]:r["x0"]+w] = m
    assert np.array_equal(rgb, win.rgb)
    assert np.array_equal(mask, win.mask)


def test_visualize_state_ascii(ray_session, fixtures_sf0001, tmp_path):
    import ray.data as rd

    from raygeo.engine import visualize_state
    from raygeo.ops.ingest import ingest

    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube_vz", g)
    art_empty = visualize_state(cube)
    assert "#" not in art_empty and art_empty.count("\n") == g.n_ty - 1
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"]).limit(50)
    n = ingest(images, g, cube_path=cube).count()
    art = visualize_state(cube)
    assert art.count("#") == n  # one cell per committed tile at this size


def test_toi_snap_kernels_match_pandas_get_indexer():
    """snap_nearest/pad/bfill claim pandas get_indexer parity (J6,
    core/toi.py analog) — pin it property-style over random axes/queries."""
    import numpy as np
    import pandas as pd

    from raygeo.toi import snap_bfill, snap_nearest, snap_pad

    for seed in range(20):
        rng = np.random.Generator(np.random.PCG64(seed))
        n_axis = int(rng.integers(2, 12))
        base = np.datetime64("2024-01-01", "s")
        axis = np.sort(rng.choice(
            np.arange(0, 10_000_000, 97), size=n_axis, replace=False
        )).astype("timedelta64[s]") + base
        ts = (rng.integers(-100_000, 10_100_000, size=50)
              .astype("timedelta64[s]") + base)
        idx = pd.DatetimeIndex(axis.astype("datetime64[ns]"))
        q = pd.DatetimeIndex(ts.astype("datetime64[ns]"))
        assert np.array_equal(
            snap_nearest(axis, ts), idx.get_indexer(q, method="nearest")
        ), f"nearest seed {seed}"
        pad = idx.get_indexer(q, method="pad")
        assert np.array_equal(snap_pad(axis, ts), pad), f"pad seed {seed}"
        bf = idx.get_indexer(q, method="bfill")
        # pandas encodes 'after axis end' as -1; the kernel returns len(axis)
        got_bf = snap_bfill(axis, ts)
        got_bf = np.where(got_bf == len(axis), -1, got_bf)
        assert np.array_equal(got_bf, bf), f"bfill seed {seed}"


def test_load_wrapped_roi_refuses_window_blowup(ray_session, fixtures_sf0001,
                                                tmp_path):
    """An antimeridian-wrapping ROI normalizes to thin strips at both grid
    edges; assembling their UNION bbox would allocate a near-grid-wide,
    mostly-invalid driver array — load() must refuse with guidance."""
    g = FIXTURE_GRID
    cube = _mk_cube(tmp_path / "cube", g)
    roi = {"roi_id": "wrap", "lon_min": 0.9, "lat_min": -0.05,
           "lon_max": -0.9, "lat_max": 0.05}  # wraps: min > max
    with pytest.raises(ValueError, match="disjoint boxes"):
        load(cube, roi)


def test_temporal_coverage_matches_golden(ray_session, fixtures_sf0001):
    """Spatial-keyed coverage fold == serial temporal-plane replay; mass
    check: sum over levels of lvl*n_px == total valid px of the t-tiles."""
    import pyarrow.parquet as pq

    from raygeo.fixtures import TEMPORAL_GRID, ensure_coverage_golden
    from raygeo.ops.composite import temporal_coverage
    from raygeo.ops.ingest import ingest
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    tiles = ingest(read_parquet_clean(
        f"{d}/images.parquet", columns=["image_id", "bytes", "w", "h"]),
        TEMPORAL_GRID)
    got = (temporal_coverage(tiles, TEMPORAL_GRID)
           .to_pandas().sort_values(["tile_id", "coverage"])
           .reset_index(drop=True))
    exp = (pq.read_table(ensure_coverage_golden(d))
           .to_pandas().sort_values(["tile_id", "coverage"])
           .reset_index(drop=True))
    assert got.values.tolist() == exp.values.tolist()
    t_golden = pq.read_table(f"{d}/tiles_golden_t.parquet")
    mass = (got["coverage"] * got["n_px"]).sum()
    assert mass == t_golden.column("n_valid_px").to_numpy().sum()


def test_persist_budget_refuses_grid_scale_roi(ray_session, tmp_path):
    """VERDICT r3 #5: a grid-sized ROI with persist=True must never
    allocate a grid-sized driver array — the byte budget raises at PLAN
    time (before any ingest or tile read); persist=False streams fine."""
    import ray.data

    from raygeo.cube import CubeSpec, create
    from raygeo.channels import RGB_CHANNELS
    from raygeo.grid import GridSpec

    # production-scale frame: 64x64 tiles of 3600^2 px -> ~212 GiB RGB+mask
    g = GridSpec(name="prod", crs="EPSG:4326", x0=-120.0, y1=60.0,
                 res=2.0 ** -11, width=64 * 3600, height=64 * 3600,
                 chunk=3600)
    cube = str(tmp_path / "cube_budget")
    create(CubeSpec("budget", g, RGB_CHANNELS), cube)
    roi = {"roi_id": "all",
           "lon_min": g.x0, "lat_min": g.y1 - g.height * g.res,
           "lon_max": g.x0 + g.width * g.res, "lat_max": g.y1}
    with pytest.raises(ValueError, match="persist=False"):
        load(cube, roi, images_ds=None, persist=True)
    # the lazy path takes the same ROI without driver allocation
    lazy = load(cube, roi, persist=False)
    assert isinstance(lazy, ray.data.Dataset)
    # an explicitly raised budget restores the old behavior contract
    # (a small ROI within budget still assembles)
    small = {"roi_id": "s", "lon_min": g.x0, "lat_min": g.y1 - 100 * g.res,
             "lon_max": g.x0 + 100 * g.res, "lat_max": g.y1}
    win = load(cube, small, images_ds=None, persist=True)
    assert win.mask.shape[0] >= 100
