"""Distributed connected-components + temporal trend vs independent goldens."""

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from raygeo.channels import RGB_CHANNELS, ChannelPack
from raygeo.grid import GridSpec


def test_components_match_golden(ray_session, fixtures_sf0001):
    """Per-tile labeling + border union-find == serial row-run union-find
    golden: two independent algorithms, identical component table."""
    from raygeo.fixtures import COMPONENTS_THRESHOLD, FIXTURE_GRID
    from raygeo.ops.components import mosaic_components
    from raygeo.ops.ingest import ingest
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    tiles = ingest(read_parquet_clean(f"{d}/images.parquet",
                                      columns=["image_id", "bytes", "w", "h"]),
                   FIXTURE_GRID)
    got = (mosaic_components(tiles, FIXTURE_GRID, COMPONENTS_THRESHOLD)
           .to_pandas().sort_values("comp_id").reset_index(drop=True))
    exp = (pq.read_table(f"{d}/components_golden.parquet")
           .to_pandas().sort_values("comp_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    assert len(got) > 10_000  # non-degenerate foreground


def test_components_cross_tile_merge(ray_session):
    """A component spanning two tiles merges across the border: one output
    row, summed area, combined bbox, id = global min linear index."""
    import ray.data as rd

    from raygeo.ops.components import mosaic_components

    grid = GridSpec(name="mini", crs="EPSG:4326", x0=0.0, y1=1.0,
                    res=0.125, width=8, height=4, chunk=4)
    pack = ChannelPack(RGB_CHANNELS)

    def tile_row(tx, ty, fg):
        canvas = np.where(fg[:, :, None], 255, 0).astype(np.uint8)
        canvas = np.repeat(canvas, 3, axis=2)
        mask = np.ones((4, 4), bool)
        return {
            "tx": tx, "ty": ty,
            "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
            "mask_z": zlib.compress(mask.astype(np.uint8).tobytes(), 1),
        }

    # bar on row 1 crossing the tile border: cols 2..3 of tile 0, cols 0..1
    # of tile 1 -> one component, area 4, bbox rows 1..1, cols 2..5.
    # plus an isolated pixel at (3, 0) in tile 0.
    fg0 = np.zeros((4, 4), bool)
    fg0[1, 2:] = True
    fg0[3, 0] = True
    fg1 = np.zeros((4, 4), bool)
    fg1[1, :2] = True
    tiles = rd.from_pandas(pd.DataFrame([tile_row(0, 0, fg0),
                                         tile_row(1, 0, fg1)]))
    got = (mosaic_components(tiles, grid, threshold=400)
           .to_pandas().sort_values("comp_id").reset_index(drop=True))
    # min linear index of the bar = y=1, x=2 -> 1*8+2 = 10; isolated = 3*8=24
    assert got["comp_id"].tolist() == [10, 24]
    assert got["area"].tolist() == [4, 1]
    assert got[["y0", "x0", "y1", "x1"]].values.tolist() == [
        [1, 2, 1, 5], [3, 0, 3, 0]]


def test_temporal_trend_matches_golden(ray_session, fixtures_sf0001):
    from raygeo.fixtures import TEMPORAL_GRID
    from raygeo.ops.composite import temporal_trend
    from raygeo.ops.ingest import ingest
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    tiles = ingest(read_parquet_clean(f"{d}/images.parquet",
                                      columns=["image_id", "bytes", "w", "h"]),
                   TEMPORAL_GRID)
    got = (temporal_trend(tiles, TEMPORAL_GRID.chunk)
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    exp = (pq.read_table(f"{d}/trend_golden.parquet")
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    # trend must actually discriminate: some pixels positive, some not
    assert 0 < got["n_px_pos"].sum() < got["n_px_trend"].sum()


def test_cc_single_task_equals_iterative(ray_session):
    """The under-cap single-task union-find and the Dataset-resident
    round loop must agree bit-for-bit (same (node, rep=min id) rows)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.graph import connected_components_pairs

    rng = np.random.Generator(np.random.PCG64(3))
    a = rng.integers(0, 400, 1500).astype(np.int64)
    b = rng.integers(0, 400, 1500).astype(np.int64)
    keep = a != b
    df = pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})
    fast = connected_components_pairs(rd.from_pandas(df).repartition(5)) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    slow = connected_components_pairs(rd.from_pandas(df).repartition(5),
                                      single_task_cap=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
