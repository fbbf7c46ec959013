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
