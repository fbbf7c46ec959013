"""Skew metrics + band normalization vs independent numpy oracles."""

import numpy as np
import pyarrow.parquet as pq

from raygeo.codec import decode
from raygeo.fixtures import FIXTURE_GRID, HOT_TILE


def test_key_skew_report_hot_tile_rank1(ray_session, fixtures_sf0001):
    import ray.data as rd

    from raygeo.ops.metrics import key_skew_report
    from raygeo.ops.spatial_join import image_tiles

    tiles = image_tiles(
        rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                        columns=["image_id", "w", "h"]),
        FIXTURE_GRID,
    )
    rep = key_skew_report(tiles, "tile_id", top_n=5).to_pandas()
    # the deliberate 10% hot-spot tile must dominate
    assert rep.iloc[0]["tile_id"] == f"{HOT_TILE[0]}-{HOT_TILE[1]}"
    assert rep["n"].is_monotonic_decreasing


def test_partition_report_after_ingest(ray_session, fixtures_sf0001, tmp_path):
    import ray.data as rd

    from raygeo.ops.ingest import ingest
    from raygeo.ops.metrics import partition_report

    cube = str(tmp_path / "cube")
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    n = ingest(images, FIXTURE_GRID, cube_path=cube).count()
    rep = partition_report(cube)
    assert len(rep) == n
    assert (rep["wall_ms"] > 0).all()
    sk = rep.attrs["skew"]["wall_ms"]
    assert sk["n_keys"] == n and sk["max"] >= sk["p50"]


def test_normalize_bands_matches_numpy(ray_session, fixtures_sf0001):
    import ray.data as rd

    from raygeo.ops.multimodal import normalize_bands

    got = (
        normalize_bands(
            rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                            columns=["image_id", "bytes"]).limit(200)
        )
        .to_pandas()
        .set_index("image_id")
        .sort_index()
    )
    t = pq.read_table(f"{fixtures_sf0001}/images.parquet",
                      columns=["image_id", "bytes"])
    by_id = dict(zip(t.column("image_id").to_pylist(),
                     t.column("bytes").to_pylist()))
    # limit(200) takes 200 rows in block order, not id order — drive the
    # oracle from whatever ids the engine actually returned
    assert len(got) == 200
    for iid, buf in ((i, by_id[i]) for i in got.index):
        pix = decode(buf).astype(np.int64)
        mn = pix.min(axis=(0, 1))
        mx = pix.max(axis=(0, 1))
        rng = np.maximum(mx - mn, 1)
        norm = ((pix - mn) * 255 + rng // 2) // rng
        row = got.loc[iid]
        assert [row.min_r, row.min_g, row.min_b] == mn.tolist()
        assert [row.max_r, row.max_g, row.max_b] == mx.tolist()
        assert row.norm_sum == int(norm.sum())


def test_ngram_jaccard_uses_char_shingles(ray_session):
    """Single-token texts can only pair via CHAR n-grams (word shingles see
    one opaque token each) — guards the use_words=False wiring."""
    import ray.data as rd

    from raygeo.ops.dedup import ngram_jaccard_pairs

    docs = [
        {"doc_id": 1, "text": "abcdefghijklmnopqrstuvwxyz0123456789"},
        {"doc_id": 2, "text": "abcdefghijklmnopqrstuvwxyz012345678X"},
        {"doc_id": 3, "text": "completely-unrelated-content-here!!!"},
    ]
    pairs = ngram_jaccard_pairs(rd.from_items(docs), "text", "doc_id",
                                k=4, threshold=0.5)
    got = set(zip(pairs.id_a.astype(int), pairs.id_b.astype(int)))
    assert got == {(1, 2)}
