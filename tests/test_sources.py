"""Source protocol + fetch actor pool: cache, retry budget, ingest parity.

Mirrors the reference's download machinery contracts: per-actor session
state (``backends/threaded.py:35-46``), 5-attempt retry on transient errors
(``core/backend.py:274-293``), and the ingest result being independent of
HOW payloads arrived (threaded download vs direct read).
"""

import pyarrow as pa
import pytest

from raygeo.fixtures import FIXTURE_GRID
from raygeo.ops.ingest import ingest
from raygeo.sources import (
    FETCH_RETRIES,
    FetchPatches,
    ParquetImageSource,
    TransientFetchError,
    fetch_dataset,
)


def _tiles_dict(ds):
    return {
        r["tile_id"]: (r["n_frags"], r["n_valid_px"], r["pix_sum"])
        for r in ds.to_pandas().to_dict("records")
    }


def test_fetch_ingest_equals_direct_ingest(ray_session, fixtures_sf0001):
    import ray.data as rd

    images_path = f"{fixtures_sf0001}/images.parquet"
    src = ParquetImageSource(images_path, FIXTURE_GRID, flaky_every=7)
    roi = {"lon_min": -0.5, "lat_min": -0.5, "lon_max": 0.5, "lat_max": 0.5}

    fetched = fetch_dataset(src, roi=roi, concurrency=(2, 4))
    got = _tiles_dict(ingest(fetched, FIXTURE_GRID))

    # direct path: same ROI subset via the stored table
    ids = set(src.list_patches(roi).column("patch_id").to_pylist())
    direct = rd.read_parquet(images_path,
                             columns=["image_id", "bytes", "w", "h"])
    direct = direct.filter(lambda r: r["image_id"] in ids)
    exp = _tiles_dict(ingest(direct, FIXTURE_GRID))
    assert got == exp
    assert len(got) > 0


def test_fetch_retry_budget_exhaustion(fixtures_sf0001):
    class AlwaysDown(ParquetImageSource):
        def fetch_with_session(self, session, patch_ids, attempt):
            raise TransientFetchError("source down")

    src = AlwaysDown(f"{fixtures_sf0001}/images.parquet", FIXTURE_GRID)
    actor = FetchPatches(src)
    batch = pa.table({"patch_id": pa.array(["img-00000001"], pa.string())})
    with pytest.raises(RuntimeError, match=f"after {FETCH_RETRIES} attempts"):
        actor(batch)
    assert actor.stats["retries"] == FETCH_RETRIES


def test_fetch_actor_cache_hits(fixtures_sf0001):
    src = ParquetImageSource(f"{fixtures_sf0001}/images.parquet", FIXTURE_GRID)
    actor = FetchPatches(src)
    batch = pa.table({"patch_id": pa.array([f"img-{i:08d}" for i in range(8)],
                                           pa.string())})
    out1 = actor(batch)
    out2 = actor(batch)  # second call served from the per-actor cache
    assert out1.num_rows == out2.num_rows == 8
    assert actor.stats["cache_hits"] == 8
    assert actor.stats["fetched"] == 8


def test_extent_index_one_time_setup(tmp_path):
    """S4: fetch each index part exactly once; re-entry is a no-op; the
    loaded index is one small Arrow table ready for broadcast."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygeo.sources import ensure_extent_index, load_extent_index

    calls = []

    def fake_fetch(part: str) -> bytes:
        calls.append(part)
        t = pa.table({
            "tile": [f"{part}-0", f"{part}-1"],
            "lon_min": [0.0, 0.5], "lat_min": [0.0, 0.5],
            "lon_max": [0.5, 1.0], "lat_max": [0.5, 1.0],
        })
        import io
        buf = io.BytesIO()
        pq.write_table(t, buf)
        return buf.getvalue()

    cache = str(tmp_path / "extent_cache")
    p1 = ensure_extent_index(cache, fake_fetch)
    assert sorted(calls) == ["l", "m", "s"]
    p2 = ensure_extent_index(cache, fake_fetch)  # cached: no new fetches
    assert sorted(calls) == ["l", "m", "s"]
    assert p1 == p2
    idx = load_extent_index(p1)
    assert idx.num_rows == 6
    assert set(idx.column_names) >= {"tile", "lon_min", "lat_max"}


def test_extent_index_broadcast_join(ray_session, fixtures_sf0001, tmp_path):
    """S4 -> S5 flow: the cached extent index becomes the broadcast small
    side of the ROI x footprint join (one ray.put, read in every task)."""
    import pyarrow.parquet as pq

    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.spatial_join import roi_image_join
    from raygeo.sources import ensure_extent_index, load_extent_index
    from raygeo.util import read_parquet_clean

    zones = pq.read_table(f"{fixtures_sf0001}/zones.parquet")

    def fetch(part: str) -> bytes:
        import io
        buf = io.BytesIO()
        lo = {"s": 0, "m": 16, "l": 32}[part]
        t = zones.slice(lo, 16).rename_columns(
            ["roi_id" if c == "zone_id" else c for c in zones.column_names])
        pq.write_table(t, buf)
        return buf.getvalue()

    paths = ensure_extent_index(str(tmp_path / "c"), fetch)
    idx = load_extent_index(paths)
    assert idx.num_rows == 48
    images = read_parquet_clean(f"{fixtures_sf0001}/images.parquet",
                                columns=["image_id", "w", "h"])
    out = roi_image_join(images, idx, FIXTURE_GRID).to_pandas()
    assert len(out) > 0
    assert set(out.columns) == {"roi_id", "image_id"}


def test_read_image_table_fallback_and_lance_boundary(ray_session,
                                                      fixtures_sf0001):
    """The Lance-or-parquet input adapter: parquet mirror loads with
    column pruning; a bare .lance URI without the lance package raises
    the declared environment boundary instead of misreading."""
    import pytest as _pytest

    from raygeo.sources import read_image_table

    ds = read_image_table(f"{fixtures_sf0001}/images.parquet",
                          columns=["image_id", "w", "h"])
    assert ds.count() == 1000
    assert ds.schema().names == ["image_id", "w", "h"]
    try:
        import lance  # noqa: F401
        has_lance = True
    except ImportError:
        has_lance = False
    if not has_lance:
        with _pytest.raises(NotImplementedError):
            read_image_table("/nonexistent/table.lance")


def test_lifecycle_hooks_order_and_skip(tmp_path):
    """VERDICT r4 #5: post_create fires once after the manifest commit of
    a NEW cube (exists_ok short-circuit skips it); post_init fires on
    every init_cube, from the caller's spec object."""
    import os

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import MANIFEST, CubeSpec, create, init_cube
    from raygeo.fixtures import FIXTURE_GRID

    events = []

    def on_create(path, spec):
        # ordering contract: the manifest is already committed
        assert os.path.exists(os.path.join(path, MANIFEST))
        events.append(("create", spec.title))

    def on_init(path, spec):
        events.append(("init", spec.title))

    spec = CubeSpec("hooked", FIXTURE_GRID, RGB_CHANNELS,
                    post_create=on_create, post_init=on_init)
    cube = str(tmp_path / "cube_hooks")
    create(spec, cube)
    assert events == [("create", "hooked")]
    create(spec, cube, exists_ok=True)  # short-circuit: no re-run
    assert events == [("create", "hooked")]
    loaded = init_cube(cube, spec)
    init_cube(cube, spec)
    assert events == [("create", "hooked"), ("init", "hooked"),
                      ("init", "hooked")]
    assert loaded.title == "hooked"  # manifest round-trip, hook-free
    assert loaded.post_create is None  # hooks never serialize
    init_cube(cube)  # no spec object: no hook, still asserts existence
    assert len(events) == 3


def test_extent_index_warm_rides_post_create(tmp_path):
    """The ArcticDEM-analog index warm moves onto the hook (reference
    datasets/arcticdem.py:187-189 rides post_create)."""
    import io
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.sources import extent_index_post_create, load_extent_index

    calls = []

    def fetch(part: str) -> bytes:
        calls.append(part)
        buf = io.BytesIO()
        pq.write_table(pa.table({"tile": [part]}), buf)
        return buf.getvalue()

    spec = CubeSpec(
        "adem", FIXTURE_GRID, RGB_CHANNELS,
        post_create=extent_index_post_create("extent_cache", fetch))
    cube = str(tmp_path / "cube_adem")
    create(spec, cube)
    assert sorted(calls) == ["l", "m", "s"]
    cache = os.path.join(cube, "extent_cache")
    paths = sorted(os.path.join(cache, n) for n in os.listdir(cache))
    assert load_extent_index(paths).num_rows == 3
    create(spec, cube, exists_ok=True)  # no re-fetch on reopen
    assert len(calls) == 3
