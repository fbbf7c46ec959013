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


def test_interpolate_na_nearest_fills_borders():
    """M9 fill kernel (tctrend.py:82 analog): NaN borders fill from nearest
    valid pixels, valid pixels never change, result is idempotent."""
    import numpy as np

    from raygeo.ops.multimodal import interpolate_na_nearest

    rng = np.random.Generator(np.random.PCG64(9))
    data = rng.integers(0, 255, (12, 10, 3), dtype=np.uint8)
    valid = np.zeros((12, 10), bool)
    valid[3:9, 2:8] = True  # interior valid block, NaN border
    out = interpolate_na_nearest(data, valid)
    # valid pixels unchanged
    assert np.array_equal(out[valid], data[valid])
    # border pixels take the nearest interior value: row 0..2 of col 4 copy
    # row 3 (N-priority fill propagates upward)
    assert np.array_equal(out[0, 4], data[3, 4])
    assert np.array_equal(out[11, 4], data[8, 4])
    assert np.array_equal(out[5, 0], data[5, 2])
    # every filled value exists among the original valid values
    vals = {tuple(v) for v in data[valid].reshape(-1, 3)}
    assert all(tuple(v) in vals for v in out[~valid].reshape(-1, 3))
    # idempotent once mask is full
    again = interpolate_na_nearest(out, np.ones_like(valid))
    assert np.array_equal(again, out)
    # degenerate frames
    none_valid = interpolate_na_nearest(data, np.zeros_like(valid))
    assert np.array_equal(none_valid, data)


def test_fill_window_na_roundtrip():
    import numpy as np

    from raygeo.engine import RoiWindow
    from raygeo.ops.multimodal import fill_window_na

    win = RoiWindow(0, 6, 0, 4)
    win.data[0][...] = 0
    win.data[0][1:3, 1:4] = 7
    win.mask[1:3, 1:4] = True
    fill_window_na(win)
    assert win.mask.all()
    assert (win.data[0] == 7).all()


def test_event_timeline_and_gantt(ray_session, fixtures_sf0001, tmp_path):
    """T6: the lineage ledger reconstructs a per-worker partition timeline
    (durations + producing worker) and renders an ASCII Gantt."""
    import ray.data as rd

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import ingest
    from raygeo.ops.metrics import event_timeline, gantt_ascii

    cube = str(tmp_path / "cube_tl")
    create(CubeSpec("tl", FIXTURE_GRID, RGB_CHANNELS), cube)
    ds = rd.read_parquet(f"{fixtures_sf0001}/images.parquet").limit(200)
    tiles = ingest(ds, FIXTURE_GRID, cube_path=cube).to_pandas()
    tl = event_timeline(cube)
    assert len(tl) == len(tiles)
    assert (tl.end_ts >= tl.start_ts).all()
    assert (tl.wall_ms >= 0).all()
    assert tl.worker.nunique() >= 1 and (tl.worker != "?").all()
    g = gantt_ascii(cube)
    assert "partitions" in g and "#" in g


def test_video_container_roundtrip():
    """RGV1 pack/parse + frame decode roundtrip, including the lossy codec."""
    import numpy as np

    from raygeo.codec import decode, encode
    from raygeo.fixtures import pack_video, pixels_of
    from raygeo.ops.multimodal import parse_video_container, sample_video_frames

    frames = [pixels_of(f"v/f{k}", 32, 32) for k in range(5)]
    encoded = [encode(f, fmt) for f, fmt in zip(frames, ["raw", "pngz", "dctq", "raw", "pngz"])]
    buf = pack_video(encoded)
    parsed = parse_video_container(buf)
    assert len(parsed) == 5
    for k in (0, 1, 3, 4):  # lossless formats roundtrip exactly
        assert np.array_equal(decode(parsed[k]), frames[k])
    sampled = sample_video_frames(buf, every_n=2)
    assert len(sampled) == 3  # frames 0, 2, 4
    import pytest

    with pytest.raises(ValueError):
        parse_video_container(b"XXXX" + buf[4:])


def test_video_frame_stats_matches_goldens(ray_session, fixtures_sf0001):
    import pandas as pd
    import pyarrow.parquet as pq

    from raygeo.ops.multimodal import video_frame_stats
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    got = (video_frame_stats(
        read_parquet_clean(f"{d}/videos.parquet", columns=["video_id", "bytes"]),
        every_n=2).to_pandas()
        .sort_values(["video_id", "frame_no"]).reset_index(drop=True))
    exp = pq.read_table(f"{d}/video_frames_golden.parquet").to_pandas()
    exp = exp[exp.frame_no % 2 == 0].sort_values(
        ["video_id", "frame_no"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_audio_features_matches_goldens(ray_session, fixtures_sf0001):
    import pandas as pd
    import pyarrow.parquet as pq

    from raygeo.ops.multimodal import audio_features
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    got = (audio_features(
        read_parquet_clean(f"{d}/audio.parquet", columns=["audio_id", "bytes"]))
        .to_pandas().sort_values("audio_id").reset_index(drop=True))
    exp = (pq.read_table(f"{d}/audio.parquet",
                         columns=["audio_id", "n_samples", "peak",
                                  "zero_crossings", "rms_fp"])
           .to_pandas().sort_values("audio_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_join_semantics(ray_session):
    """As-of inner join: latest right row at-or-before each left row per
    key; ties match (<=); left rows with no prior right row drop; int
    dtypes survive the union's null-padding."""
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.asof import asof_join

    left = pd.DataFrame({
        "k": [1, 1, 1, 2, 3],
        "t": [10, 5, 2, 7, 4],
        "lid": [100, 101, 102, 103, 104],
    })
    right = pd.DataFrame({
        "k": [1, 1, 2, 2],
        "t": [3, 7, 7, 9],
        "rid": [900, 901, 902, 903],
    })
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    by="k", on="t", left_keep=["lid"], right_keep=["rid"],
                    right_suffix="").to_pandas().sort_values("lid")
    # lid 100 (t=10) -> rid 901 (t=7); lid 101 (t=5) -> rid 900 (t=3);
    # lid 102 (t=2) -> none; lid 103 (t=7) -> rid 902 (tie, <=);
    # lid 104 (k=3) -> none
    assert out.lid.tolist() == [100, 101, 103]
    assert out.rid.tolist() == [901, 900, 902]
    assert out.lag_us.tolist() == [3, 2, 0]
    assert str(out.lid.dtype) == "int64" and str(out.rid.dtype) == "int64"


def test_langid_nonenglish_arms_match_sql_oracle(ray_session, tmp_path):
    """The fixture corpus is all-English, so the de/fr/es/zh tie-break arms
    of the docs_langid SQL oracle were structurally mirrored but never
    exercised (NOTES r1 gap). Run engine vs oracle on a synthetic
    multilingual table to pin all arms."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    import __ray_entry__ as entrymod
    from raygeo.ops.text import lang_id

    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [
            "the quick brown fox and the lazy dog with some words",
            "der schnelle braune fuchs und die katze nicht mit oder auch",
            "le renard brun rapide et le chien les mots dans une pour",
            "el zorro marrón rápido y el perro con las palabras para una",
            "的 快速 棕色 狐狸 和 懒惰 的 狗 在 一个",
            "the der le el mixed up words everywhere the the",
            "",
            "12345 67890 !!!",
        ],
    })
    got = lang_id(rd.from_pandas(docs)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    import pyarrow as pa

    path = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    exp = con.execute(entrymod.oracle_sql()["docs_langid"]).fetchdf()
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp,
                                  check_dtype=False)


def test_scrub_texts_word_boundaries(ray_session):
    """Whole-word semantics: 'spark' hits, 'sparkle'/'rehash' don't; md5
    parity vs a serial Python re pass on adversarial boundary cases."""
    import hashlib
    import re

    import pandas as pd
    import ray.data as rd

    from raygeo.ops.text import scrub_texts

    texts = [
        "spark and hash meet vector",          # 3 hits
        "sparkle rehashed vectors",            # 0 hits (no whole words)
        "spark.spark,spark spark!",            # punctuation boundaries: 4
        "hashhash hash-hash",                  # 2 (hyphen is a boundary)
        "",                                    # empty row survives
        "vector",                              # entire text is a hit
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (scrub_texts(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    pat = re.compile(r"\b(spark|hash|vector)\b")
    exp_hits = [len(pat.findall(t)) for t in texts]
    exp_md5 = [hashlib.md5(pat.sub("[X]", t).encode()).hexdigest()
               for t in texts]
    assert got["n_hits"].tolist() == exp_hits
    assert got["scrub_md5"].tolist() == exp_md5
    assert exp_hits == [3, 0, 4, 2, 0, 1]


def test_csv_catalog_roundtrip_exact(ray_session, fixtures_sf0001):
    """CSV floats written with repr round-trip bit-exactly through
    ray.data.read_csv, and the cell histogram is partition-invariant."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.fixtures import ensure_catalog_csv

    d = fixtures_sf0001
    path = ensure_catalog_csv(d)
    csv = rd.read_csv(path).to_pandas().sort_values("image_id")
    parts = sorted(glob.glob(f"{d}/images.parquet/*.parquet"))
    import pyarrow as pa
    ref = pa.concat_tables([
        pq.read_table(p, columns=["image_id", "lon_min", "lat_min",
                                  "lon_max", "lat_max"]) for p in parts
    ]).to_pandas().sort_values("image_id")
    for c in ["lon_min", "lat_min", "lon_max", "lat_max"]:
        assert np.array_equal(csv[c].to_numpy(), ref[c].to_numpy())  # bit-exact


def test_mosaic_histogram_matches_serial_paint(ray_session, fixtures_sf0001):
    """Distributed per-tile bin fold == np.bincount over the independent
    serial full-plane paint; mass check vs the lww golden's valid count."""
    import pyarrow.parquet as pq

    from raygeo.fixtures import FIXTURE_GRID, ensure_histogram_golden
    from raygeo.ops.ingest import ingest
    from raygeo.ops.zonal import mosaic_histogram
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    tiles = ingest(read_parquet_clean(
        f"{d}/images.parquet", columns=["image_id", "bytes", "w", "h"]),
        FIXTURE_GRID)
    got = (mosaic_histogram(tiles, FIXTURE_GRID)
           .to_pandas().sort_values("v_bin").reset_index(drop=True))
    exp = (pq.read_table(ensure_histogram_golden(d))
           .to_pandas().sort_values("v_bin").reset_index(drop=True))
    assert got["v_bin"].tolist() == exp["v_bin"].tolist()
    assert got["n_px"].tolist() == exp["n_px"].tolist()
    lww = pq.read_table(f"{d}/tiles_golden_lww.parquet")
    assert got["n_px"].sum() == lww.column("n_valid_px").to_numpy().sum()


def test_image_patches_tile_exactly(ray_session):
    """Patch explosion tiles each image exactly: clipped edge sizes, patch
    count ((w+15)//16)*((h+15)//16), and per-image sum conservation."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raygeo.codec import encode
    from raygeo.ops.multimodal import image_patches

    rng = np.random.Generator(np.random.PCG64(2))
    rows = []
    for i, (w, h) in enumerate([(16, 16), (17, 31), (48, 33), (15, 15)]):
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rows.append({"image_id": f"t-{i}", "bytes": encode(pix, "raw"),
                     "w": w, "h": h,
                     "pix_sum": int(pix.astype(np.int64).sum())})
    df = pd.DataFrame(rows)
    out = image_patches(rd.from_pandas(df), size=16).to_pandas()
    g = out.groupby("image_id").agg(n=("patch_sum", "size"),
                                    total=("patch_sum", "sum"),
                                    max_pw=("pw", "max"), min_pw=("pw", "min"))
    for r in df.itertuples():
        expect_n = ((r.w + 15) // 16) * ((r.h + 15) // 16)
        assert g.loc[r.image_id, "n"] == expect_n
        assert g.loc[r.image_id, "total"] == r.pix_sum
    # 17-wide image: edge patch is 1 pixel wide
    assert g.loc["t-1", "min_pw"] == 1


def test_mosaic_equalize_matches_serial_lut(ray_session, fixtures_sf0001):
    """Chained histogram -> LUT -> remap == the same integer LUT applied
    to the serial full-plane paint; equalized means must span the range."""
    import pyarrow.parquet as pq

    from raygeo.fixtures import FIXTURE_GRID, ensure_equalize_golden
    from raygeo.ops.ingest import ingest
    from raygeo.ops.zonal import mosaic_equalize
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    tiles = ingest(read_parquet_clean(
        f"{d}/images.parquet", columns=["image_id", "bytes", "w", "h"]),
        FIXTURE_GRID).materialize()
    got = (mosaic_equalize(tiles, FIXTURE_GRID)
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    exp = (pq.read_table(ensure_equalize_golden(d))
           .to_pandas().sort_values("tile_id").reset_index(drop=True))
    assert got["tile_id"].tolist() == exp["tile_id"].tolist()
    assert got["n_valid_px"].tolist() == exp["n_valid_px"].tolist()
    assert got["eq_sum"].tolist() == exp["eq_sum"].tolist()
    # equalization sanity: mean equalized value sits mid-range
    mean_eq = got["eq_sum"].sum() / max(got["n_valid_px"].sum(), 1)
    assert 64 < mean_eq < 192


def test_mosaic_histogram_equalize_negative_bins(ray_session):
    """Float packs quantize x1000 around zero: histogram bins can be
    NEGATIVE, and the equalize LUT must index from the min bin instead of
    wrap-indexing. Synthetic DEM tiles with negative values, replayed
    serially."""
    import zlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from raygeo.channels import DEM_CHANNELS, ChannelPack
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.zonal import mosaic_equalize, mosaic_histogram

    pack = ChannelPack(DEM_CHANNELS)
    g = FIXTURE_GRID
    c = g.chunk
    rng = np.random.Generator(np.random.PCG64(12))
    rows = []
    for j, (tx, ty) in enumerate([(0, 0), (1, 0), (2, 1)]):
        dem = rng.uniform(-5.0, 5.0, size=(c, c)).astype(np.float32)
        dm = rng.uniform(size=(c, c)) < 0.9
        mask = (rng.uniform(size=(c, c)) < 0.8).astype(np.uint8)
        chans = pack.alloc(c, c)
        chans[0][:] = dem.reshape(chans[0].shape)
        chans[1][:] = dm.reshape(chans[1].shape)
        rows.append({
            "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
            "px_z": zlib.compress(pack.to_bytes(chans), 1),
            "mask_z": zlib.compress(mask.tobytes(), 1),
        })
    tiles = rd.from_arrow(pa.Table.from_pylist(rows))

    hist = (mosaic_histogram(tiles, g, pack)
            .to_pandas().sort_values("v_bin").reset_index(drop=True))
    assert (hist["v_bin"] < 0).any()  # negative bins actually exercised

    got = (mosaic_equalize(tiles, g, pack)
           .to_pandas().sort_values("tile_id").reset_index(drop=True))

    # serial replay with identical integer arithmetic
    vs, per_tile = [], {}
    for r in rows:
        chans = pack.from_bytes(zlib.decompress(r["px_z"]), c, c)
        mask = np.frombuffer(zlib.decompress(r["mask_z"]),
                             np.uint8).reshape(c, c).astype(bool)
        v = np.zeros((c, c), np.int64)
        for a in chans:
            q = (np.round(a.astype(np.float64) * 1000).astype(np.int64)
                 if a.dtype.kind == "f" else a.astype(np.int64))
            v += q.sum(axis=2) if a.ndim == 3 else q
        per_tile[r["tile_id"]] = v[mask]
        vs.append(v[mask])
    allv = np.concatenate(vs)
    u, cnt = np.unique(allv, return_counts=True)
    exp_hist = dict(zip(u.tolist(), cnt.tolist()))
    assert dict(zip(hist["v_bin"], hist["n_px"])) == exp_hist
    vmin = int(u.min())
    counts = np.zeros(int(u.max()) - vmin + 1, np.int64)
    counts[u - vmin] = cnt
    lut = (np.cumsum(counts) * 255 // len(allv)).astype(np.int64)
    for r in got.itertuples():
        vals = per_tile[r.tile_id]
        assert r.eq_sum == int(lut[vals - vmin].sum())
        assert r.n_valid_px == len(vals)


def test_images_clean_corpus_invariants(ray_session, fixtures_sf0001):
    """Composed pipeline sanity: monotone counts, dedup actually removed
    phash duplicates, and the summary matches a duckdb replay from the
    golden columns."""
    import duckdb

    from raygeo.ops.multimodal import images_clean_corpus
    from raygeo.util import read_parquet_clean

    d = fixtures_sf0001
    out = images_clean_corpus(read_parquet_clean(
        f"{d}/images.parquet",
        columns=["image_id", "bytes", "w", "h", "phash"])).to_pandas()
    r = out.iloc[0]
    assert r.n_images >= r.n_quality >= r.n_kept > 0
    exp = duckdb.sql(f"""
        WITH s AS (
          SELECT CAST(substr(image_id, 5) AS BIGINT) AS pno, phash,
            CASE WHEN w * h >= 2048
                  AND (pix_sum * 1000) // (w * h * 3)
                      BETWEEN 147000 AND 148500
                 THEN 1 ELSE 0 END AS q
          FROM read_parquet('{d}/images.parquet/*.parquet')
        ), kept AS (SELECT phash, min(pno) AS pno FROM s WHERE q = 1
                    GROUP BY phash)
        SELECT (SELECT count(*) FROM s), (SELECT sum(q) FROM s),
               (SELECT count(*) FROM kept),
               (SELECT coalesce(sum(pno), 0) FROM kept)
    """).fetchone()
    assert (r.n_images, r.n_quality, r.n_kept, r.kept_pno_sum) == \
        tuple(int(x) for x in exp)


def test_bpe_pretokenizer_adversarial_parity(ray_session):
    """Python re and the RE2 oracle pattern segment identically on
    adversarial inputs (double spaces, newlines, contractions, digits,
    punctuation runs) — incl. counts of whitespace pretokens."""
    import re

    import duckdb
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.text import BPE_ISH_RE, bpe_token_counts

    texts = ["it's  a test\n\nnew42 line!", "  lead", "tail  ",
             "don't we'll i'm 3.14...", "", "a,b;c", "x" * 100]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (bpe_token_counts(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pat = re.compile(BPE_ISH_RE)
    for i, t in enumerate(texts):
        toks = pat.findall(t)
        assert got.loc[i, "n_pretokens"] == len(toks)
        assert got.loc[i, "n_text_pretokens"] == sum(
            1 for x in toks if not x.isspace())
    # the RE2 side segments identically (the oracle's own pattern)
    duck_pat = "'" + BPE_ISH_RE.replace("'", "''") + "'"
    for t in texts:
        dk = duckdb.sql(
            f"SELECT regexp_extract_all(?, {duck_pat})",
            params=[t]).fetchone()[0]
        assert dk == pat.findall(t)


def test_augment_check_conserves_golden_sums(ray_session, fixtures_sf0001):
    """Flip kernels must conserve the stored generation-time pixel sums,
    and the in-op involution guard must hold over the whole fixture."""
    import pyarrow.parquet as pq

    from raygeo.ops.multimodal import augment_check
    from raygeo.util import read_parquet_clean

    got = (augment_check(
        read_parquet_clean(f"{fixtures_sf0001}/images.parquet",
                           columns=["image_id", "bytes"]).limit(300))
        .to_pandas().set_index("image_id"))
    golden = pq.read_table(f"{fixtures_sf0001}/images.parquet",
                           columns=["image_id", "pix_sum"]).to_pandas()
    golden = golden.set_index("image_id").loc[got.index]
    assert (got["pix_sum"] == golden["pix_sum"]).all()


def test_augment_flips_positionally_correct():
    """Pin flip POSITIONS (sum conservation can't see a wrong axis) on a
    hand-written 2x3 image against explicit expected arrays."""
    import numpy as np

    from raygeo.ops.multimodal import AugmentCheck

    img = np.array([[[1, 0, 0], [2, 0, 0], [3, 0, 0]],
                    [[4, 0, 0], [5, 0, 0], [6, 0, 0]]], np.uint8)
    h, v, r = AugmentCheck.flips(img)
    assert h[:, :, 0].tolist() == [[3, 2, 1], [6, 5, 4]]
    assert v[:, :, 0].tolist() == [[4, 5, 6], [1, 2, 3]]
    assert r[:, :, 0].tolist() == [[6, 5, 4], [3, 2, 1]]


def test_repetition_signals_adversarial(ray_session):
    """Gopher repetition rules against hand-computed counts: a degenerate
    one-token doc, a repeated-bigram doc, a trigram-looping doc, and a
    clean doc that must NOT flag."""
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.corpus import repetition_signals

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "spam spam spam spam eggs",          # top word 4/5 -> flag
            "big data big data big data works",  # top bigram 3/6 -> flag
            "a b c a b c a b c",                 # every trigram dup -> flag
            "one two three four five six seven", # clean
            "",                                   # empty: all zeros, no flag
        ],
    })
    out = (repetition_signals(rd.from_pandas(docs))
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "top_word_cnt"] == 4 and out.loc[0, "flagged"] == 1
    assert out.loc[1, "top_2gram_cnt"] == 3 and out.loc[1, "flagged"] == 1
    # doc 2: trigrams at 7 positions, distinct {abc,bca,cab}=3+2+2 dups
    assert out.loc[2, "n_3grams"] == 7
    assert out.loc[2, "dup_3gram_pos"] == 7 and out.loc[2, "flagged"] == 1
    assert out.loc[3, "flagged"] == 0
    assert (out.loc[4] == 0).all()


def test_lm_bits_score_hand_computed(ray_session):
    """Integer floor-log2 LM bits vs hand counts on a tiny corpus."""
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.corpus import lm_bits_score

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b", "a b", "c"],
    })
    out = (lm_bits_score(rd.from_pandas(docs))
           .to_pandas().set_index("doc_id").sort_index())
    # counts: a=3, b=3, c=1; pairs: 'a b'=3, 'b a'=1
    # bits('a b') = bl(3)-bl(3) = 0; bits('b a') = bl(3)-bl(1) = 1
    assert out.loc[0, "n_bigrams"] == 3 and out.loc[0, "lm_bits"] == 1
    assert out.loc[1, "n_bigrams"] == 1 and out.loc[1, "lm_bits"] == 0
    assert out.loc[2, "n_bigrams"] == 0 and out.loc[2, "lm_bits"] == 0


def test_timeline_svg_renders_ledger(ray_session, fixtures_sf0001, tmp_path):
    """The Gantt SVG is valid XML with one bar per committed partition."""
    import xml.etree.ElementTree as ET

    import ray.data as rd

    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import ingest
    from raygeo.ops.metrics import timeline_svg

    cube = str(tmp_path / "cube")
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    n = ingest(images, FIXTURE_GRID, cube_path=cube).count()
    svg = timeline_svg(cube)
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    rects = root.findall(f"{ns}rect")
    assert len(rects) == n
    assert all(float(r.get("width")) >= 1.0 for r in rects)
    # empty ledger degrades gracefully
    assert "empty ledger" in timeline_svg(str(tmp_path / "nope"))


def test_state_svg_matches_commit_count(ray_session, fixtures_sf0001,
                                        tmp_path):
    import xml.etree.ElementTree as ET

    import ray.data as rd

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.engine import state_svg
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import ingest

    cube = str(tmp_path / "cube")
    create(CubeSpec("viz", FIXTURE_GRID, RGB_CHANNELS), cube)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    n = ingest(images, FIXTURE_GRID, cube_path=cube).count()
    root = ET.fromstring(state_svg(cube))
    ns = "{http://www.w3.org/2000/svg}"
    assert len(root.findall(f"{ns}rect")) == n


def test_token_entropy_matches_counter(ray_session):
    """Integer entropy surrogate vs a Counter replay; constant doc has
    ent_bits == 0 iff n*bl(n) == n*bl(n)... i.e. all-same-token docs
    score n*(bl(n)-bl(n)) = 0."""
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.corpus import token_entropy

    docs = pd.DataFrame({
        "doc_id": np.arange(6),
        "text": ["a b c d e f g h",
                 "a a a a a a a a",
                 "x y x y x y",
                 "", "one",
                 "Mixed CASE mixed case tokens_1 tokens_1"]})
    got = (token_entropy(rd.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp_rows = []
    import re
    for did, t in zip(docs.doc_id, docs.text):
        ws = re.findall(r"[0-9a-z_]+", t.lower())
        n = len(ws)
        c = Counter(ws)
        ent = (n * n.bit_length()
               - sum(v * v.bit_length() for v in c.values()))
        exp_rows.append((did, n, len(c), ent))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "n_tokens",
                                          "n_distinct", "ent_bits"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the all-same-token doc has zero surprise
    assert exp.loc[1, "ent_bits"] == 0


def test_span_scrub_matches_counter(ray_session):
    """Window-cover accounting vs a serial replay; overlapping hits must
    not double count covered tokens, and an external bench_ds exercises
    the production path."""
    import re

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.corpus import span_scrub

    words = "a b c d e f g h i j k l".split()
    rng = np.random.Generator(np.random.PCG64(3))
    texts = [" ".join(rng.choice(words, 40)) for _ in range(60)]
    docs = pd.DataFrame({"doc_id": np.arange(60), "text": texts})
    got = (span_scrub(rd.from_pandas(docs).repartition(4))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    tokre = re.compile(r"[0-9a-z_]+")
    bench = set()
    for did, t in zip(docs.doc_id, docs.text):
        if did % 7 == 0:
            ws = tokre.findall(t.lower())
            bench |= {" ".join(ws[i:i + 8]) for i in range(len(ws) - 7)}
    exp = []
    for did, t in zip(docs.doc_id, docs.text):
        ws = tokre.findall(t.lower())
        cover = np.zeros(len(ws), bool)
        hits = 0
        for i in range(len(ws) - 7):
            if " ".join(ws[i:i + 8]) in bench:
                hits += 1
                cover[i:i + 8] = True
        exp.append((did, len(ws), hits, int(cover.sum())))
    exp = pd.DataFrame(exp, columns=["doc_id", "n_tokens",
                                     "n_contam_grams",
                                     "n_tokens_redacted"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # overlap discipline: redacted tokens < 8 * gram hits somewhere
    over = exp[exp.n_contam_grams > 1]
    assert len(over) and (over.n_tokens_redacted
                          < 8 * over.n_contam_grams).any()
