"""Round-2 relational/corpus extensions: bloom semi-join exactness,
grouped top-k vs a serial window-rank oracle, overlapping-interval range
join double-counting, and corpus term stats / tf-idf determinism across
partitionings."""

import numpy as np
import pandas as pd
import pytest

from raygeo.ops.relational import (
    _bloom_build,
    _bloom_maybe,
    grouped_topk,
    interval_range_join,
)


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.Generator(np.random.PCG64(3))
    members = rng.choice(10_000_000, size=30_000, replace=False).astype(np.int64)
    bm = _bloom_build(members, 1 << 20)
    assert _bloom_maybe(bm, members, 1 << 20).all()  # zero false negatives
    probe = rng.choice(10_000_000, size=100_000, replace=False).astype(np.int64)
    non = probe[~np.isin(probe, members)]
    fp = _bloom_maybe(bm, non, 1 << 20).mean()
    assert fp < 0.02  # m=1M bits, n=30k, k=2 -> ~0.3% expected


def _rank_oracle(df, k):
    df = df.assign(_v=np.rint(df.p_retailprice.to_numpy() * 100).astype("int64"))
    df = df.sort_values(["p_brand", "_v", "p_partkey"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("p_brand", sort=False).head(k).copy()
    out["rank"] = out.groupby("p_brand", sort=False).cumcount() + 1
    return out[["p_brand", "p_partkey", "_v", "rank"]].rename(
        columns={"_v": "p_retailprice_c"})


def test_grouped_topk_matches_serial_rank(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(11))
    n = 5000
    df = pd.DataFrame({
        "p_brand": [f"B{i % 7}" for i in range(n)],
        # few distinct prices -> exercises the tie-break heavily
        "p_retailprice": rng.integers(1, 20, size=n) / 4.0,
        "p_partkey": np.arange(n, dtype=np.int64),
    })
    ds = rd.from_pandas(df).repartition(13)  # group rows scattered over blocks
    got = (grouped_topk(ds, "p_brand", "p_retailprice", "p_partkey", k=3)
           .to_pandas()
           .sort_values(["p_brand", "rank"]).reset_index(drop=True))
    exp = (_rank_oracle(df, 3)
           .sort_values(["p_brand", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["p_brand", "p_partkey", "p_retailprice_c", "rank"]], exp,
        check_dtype=False)


def test_interval_join_counts_overlaps_twice(ray_session):
    import ray.data as rd

    ts = pd.to_datetime(["2024-01-02", "2024-01-09", "2024-01-16"])
    df = pd.DataFrame({"ts": ts, "value": [1.0, 2.0, 4.0]})
    iv = [("a", "2024-01-01", "2024-01-10"), ("b", "2024-01-08", "2024-01-20")]
    got = (interval_range_join(rd.from_pandas(df).repartition(3), iv)
           .to_pandas().set_index("interval_id"))
    # 01-09 event overlaps both windows -> contributes to a AND b
    assert got.loc["a", "n_events"] == 2 and got.loc["a", "value_cents"] == 300
    assert got.loc["b", "n_events"] == 2 and got.loc["b", "value_cents"] == 600


def test_term_stats_partition_invariant(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import term_stats

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat", "THE the dog", "cat cat cat",
                 "", "dog. the!", "sat"],
    })
    outs = []
    for parts in (1, 5):
        ds = rd.from_pandas(docs).repartition(parts)
        outs.append(term_stats(ds).to_pandas()
                    .sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    row = outs[0].set_index("term")
    assert row.loc["the", "tf"] == 4 and row.loc["the", "df"] == 3
    assert row.loc["cat", "tf"] == 4 and row.loc["cat", "df"] == 2


def test_tfidf_top_term_tiebreak(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import tfidf_top_term

    # 'aa' and 'bb' both appear once in doc 0 and have equal df=1:
    # equal scores -> term-asc tie-break must pick 'aa' deterministically
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["bb aa common", "common common"],
    })
    got = (tfidf_top_term(rd.from_pandas(docs).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got.loc[0, "term"] == "aa" and got.loc[0, "df"] == 1
    assert got.loc[1, "term"] == "common"
    assert got.loc[1, "score"] == pytest.approx(2 / 2)


def test_inverted_index_partition_invariant(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import inverted_index

    docs = pd.DataFrame({
        "doc_id": np.array([5, 3, 9, 1], dtype=np.int64),
        "text": ["x y", "y y z", "x", "z x"],
    })
    outs = []
    for parts in (1, 4):
        ds = rd.from_pandas(docs).repartition(parts)
        outs.append(inverted_index(ds).to_pandas()
                    .sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    row = outs[0].set_index("term")
    assert row.loc["x", "postings"] == "1,5,9"  # sorted, distinct
    assert row.loc["y", "n_docs"] == 2  # within-doc dups collapse


def test_grouped_zscore_moments(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import grouped_zscore

    df = pd.DataFrame({
        "event_id": np.arange(8, dtype=np.int64),
        "event_type": ["a"] * 4 + ["b"] * 4,
        "value": [1.0, 2.0, 3.0, 4.0, 10.0, 10.0, 20.0, 20.0],
    })
    got = (grouped_zscore(rd.from_pandas(df).repartition(4)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # group a: mean 250c, population sd = sqrt(mean(x^2)-mean^2)
    cents = np.array([100, 200, 300, 400], dtype=np.int64)
    mean = cents.sum() / 4.0
    sd = np.sqrt((cents * cents).sum() / 4.0 - mean * mean)
    np.testing.assert_array_equal(
        got.loc[:3, "zscore"].to_numpy(), (cents - mean) / sd)
    # group b is symmetric two-point -> z = ±1 exactly
    np.testing.assert_array_equal(
        got.loc[4:, "zscore"].to_numpy(), np.array([-1.0, -1.0, 1.0, 1.0]))


def test_pivot_sum_categories(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import pivot_sum

    df = pd.DataFrame({
        "g": np.array([1, 1, 2, 2, 2], dtype=np.int64),
        "cat": ["hi", "lo", "hi", "hi", "zz"],  # 'zz' not declared -> dropped
        "v": [1.0, 2.0, 3.0, 4.0, 99.0],
    })
    got = (pivot_sum(rd.from_pandas(df).repartition(3), "g", "cat", "v",
                     ["hi", "lo"]).to_pandas()
           .sort_values("g").reset_index(drop=True))
    assert got.loc[0, "sum_hi"] == 100 and got.loc[0, "sum_lo"] == 200
    assert got.loc[1, "sum_hi"] == 700 and got.loc[1, "sum_lo"] == 0


def test_label_centroids_quantized_exact(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import label_centroids

    rng = np.random.Generator(np.random.PCG64(5))
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    labels = np.repeat(np.array([0, 1], dtype=np.int32), 20)
    df = pd.DataFrame({"embedding": list(vecs), "label": labels})
    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        outs.append(label_centroids(ds).to_pandas()
                    .sort_values(["label", "dim"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # order-independent fold
    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    exp0 = q[:20].sum(axis=0)
    got0 = outs[0][outs[0].label == 0].sort_values("dim")["sum_q"].to_numpy()
    np.testing.assert_array_equal(got0, exp0)
    assert (outs[0]["mean_q"].to_numpy()
            == outs[0]["sum_q"].to_numpy() / outs[0]["n"].to_numpy()).all()


def test_rollup_levels(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import rollup_sum

    df = pd.DataFrame({
        "y": np.array([2020, 2020, 2021], dtype=np.int64),
        "p": ["a", "b", "a"],
        "v": [1.0, 2.0, 4.0],
    })
    got = (rollup_sum(rd.from_pandas(df).repartition(3), "y", "p", "v")
           .to_pandas().set_index(["y", "p"]))
    assert got.loc[("2020", "a"), "value_cents"] == 100
    assert got.loc[("2020", "ALL"), "value_cents"] == 300  # subtotal
    assert got.loc[("ALL", "ALL"), "value_cents"] == 700  # grand total
    assert got.loc[("ALL", "ALL"), "n_rows"] == 3


def test_grouped_distinct_count_cross_batch(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import grouped_distinct_count

    # user 7 repeats for 'a' across many partitions: must count once
    df = pd.DataFrame({"k": ["a"] * 6 + ["b"] * 2,
                       "u": [7, 7, 7, 8, 9, 7, 7, 7]})
    got = (grouped_distinct_count(rd.from_pandas(df).repartition(5), "k", "u")
           .to_pandas().set_index("k"))
    assert got.loc["a", "n_distinct"] == 3
    assert got.loc["b", "n_distinct"] == 1


def test_funnel_strict_order_and_batches(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import funnel_counts

    ts = pd.to_datetime([
        "2024-01-01", "2024-01-02", "2024-01-03",   # u1: full ordered funnel
        "2024-01-05", "2024-01-04",                 # u2: click BEFORE view
        "2024-01-06",                               # u3: view only
    ])
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
        "event_type": ["view", "click", "purchase", "view", "click", "view"],
        "ts": ts,
    })
    got = (funnel_counts(rd.from_pandas(df).repartition(4),
                         ["view", "click", "purchase"])
           .to_pandas().sort_values("stage_idx").reset_index(drop=True))
    # u2's click precedes its view: reaches stage 0 only
    assert got["n_users"].tolist() == [3, 1, 1]


def test_search_all_terms_conjunctive(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import search_all_terms

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["alpha beta alpha", "alpha", "beta beta", "Alpha BETA"],
    })
    got = (search_all_terms(rd.from_pandas(docs).repartition(2),
                            ["alpha", "beta"])
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 3]  # both terms required
    assert got["match_tf"].tolist() == [3, 2]  # rank = total occurrences


def test_sample_bottom_k_partition_invariant(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import sample_bottom_k

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    outs = []
    for parts in (1, 9):
        ds = rd.from_pandas(df).repartition(parts)
        outs.append(sample_bottom_k(ds, "doc_id", k=20).to_pandas()
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) == 20
    assert outs[0]["h"].is_monotonic_increasing


def test_left_outer_fulfillment_keeps_empty_orders(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.relational import orders_fulfillment

    li = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 2], dtype=np.int64),
        "l_extendedprice": [10.0, 20.0, 5.0],
        "l_discount": [0.0, 0.1, 0.0],
    })
    orders = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3], dtype=np.int64),  # 3 has no items
        "o_orderstatus": ["F", "F", "O"],
    })
    with tempfile.TemporaryDirectory() as d:
        opath = os.path.join(d, "orders.parquet")
        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                       opath)
        got = (orders_fulfillment(rd.from_pandas(li).repartition(2), opath,
                                  num_partitions=4)
               .to_pandas().set_index("o_orderstatus"))
    assert got.loc["O", "n_orders"] == 1 and got.loc["O", "n_empty"] == 1
    assert got.loc["O", "revenue_c4"] == 0
    assert got.loc["F", "n_empty"] == 0
    # 10.00*100*100 + 20.00*100*90 + 5.00*100*100
    assert got.loc["F", "revenue_c4"] == 100000 + 180000 + 50000


def test_anti_join_inactive_customers(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.relational import inactive_customers

    orders = pd.DataFrame({
        "o_custkey": np.array([1, 1, 2, 4], dtype=np.int64),
        "o_orderpriority": ["1-URGENT", "5-LOW", "5-LOW", "1-URGENT"],
    })
    cust = pd.DataFrame({
        "c_custkey": np.array([1, 2, 3, 4], dtype=np.int64),
        "c_mktsegment": ["A", "B", "C", "D"],
    })
    with tempfile.TemporaryDirectory() as d:
        cpath = os.path.join(d, "customer.parquet")
        pq.write_table(pa.Table.from_pandas(cust, preserve_index=False), cpath)
        ds = rd.from_pandas(orders).repartition(3)
        got_all = inactive_customers(ds, cpath)
        got_urgent = inactive_customers(ds, cpath, priority="1-URGENT")
    assert got_all["c_custkey"].tolist() == [3]  # only 3 never ordered
    assert got_urgent["c_custkey"].tolist() == [2, 3]  # 2 never urgent


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),        # user
                          st.integers(0, 2),        # stage index
                          st.integers(0, 1000)),    # ts offset (seconds)
                min_size=1, max_size=60))
def test_funnel_matches_serial_oracle(events):
    """Property: the distributed funnel chain equals a per-user serial
    first-occurrence strict-order walk (pure-kernel check, no Ray)."""
    stages = ["s0", "s1", "s2"]
    df = pd.DataFrame({
        "u": [u for u, _, _ in events],
        "s": [stages[s] for _, s, _ in events],
        "ts": [t for _, _, t in events],
    })
    # serial oracle
    exp = np.zeros(3, dtype=int)
    for _, g in df.groupby("u"):
        firsts = g.groupby("s")["ts"].min()
        prev, ok = -1, True
        for i, s in enumerate(stages):
            ok = ok and s in firsts.index and firsts[s] > prev
            if not ok:
                break
            exp[i] += 1
            prev = firsts[s]
    # vectorized chain (the engine's kernel, applied to the wide fold)
    wide = df.pivot_table(index="u", columns="s", values="ts", aggfunc="min")
    n = len(wide)
    okv = np.ones(n, dtype=bool)
    prev = np.full(n, -1, dtype=float)
    got = np.zeros(3, dtype=int)
    for i, s in enumerate(stages):
        ts = (wide[s].to_numpy(dtype=float) if s in wide.columns
              else np.full(n, np.nan))
        okv = okv & ~np.isnan(ts) & (ts > prev)
        got[i] = int(okv.sum())
        prev = np.where(okv, ts, prev)
    np.testing.assert_array_equal(got, exp)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),       # group
                          st.integers(0, 9),       # value
                          st.integers(0, 999)),    # id
                min_size=1, max_size=80, unique_by=lambda e: e[2]))
def test_grouped_topk_partial_cap_is_lossless(rows):
    """Property: batch-local top-k partials never drop a global top-k row,
    for ANY split of the input into batches (the map-side cap argument)."""
    k = 3
    df = pd.DataFrame({"g": [g for g, _, _ in rows],
                       "v": [v for _, v, _ in rows],
                       "i": [i for _, _, i in rows]})

    def topk(frame):
        s = frame.sort_values(["g", "v", "i"], ascending=[True, False, True],
                              kind="mergesort")
        return s.groupby("g", sort=False).head(k)

    direct = topk(df).sort_values(["g", "v", "i"],
                                  ascending=[True, False, True],
                                  kind="mergesort").reset_index(drop=True)
    # arbitrary 3-way split -> partial top-k -> merge -> final top-k
    parts = [df.iloc[i::3] for i in range(3)]
    merged = topk(pd.concat([topk(p) for p in parts]))
    merged = merged.sort_values(["g", "v", "i"],
                                ascending=[True, False, True],
                                kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, direct)


def test_cohort_retention_cells(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import cohort_retention

    ts = pd.to_datetime([
        "2024-01-01 09:00", "2024-01-01 17:00",  # u1 day0 twice (dedup)
        "2024-01-03 08:00",                      # u1 offset 2
        "2024-01-02 12:00",                      # u2 cohort = Jan 2
        "2024-01-03 23:59",                      # u2 offset 1
    ])
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "ts": ts,
    })
    got = (cohort_retention(rd.from_pandas(df).repartition(3))
           .to_pandas()
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    assert got.values.tolist() == [
        ["2024-01-01", 0, 1],   # u1 first day (same-day repeat collapsed)
        ["2024-01-01", 2, 1],   # u1 active on Jan 3
        ["2024-01-02", 0, 1],   # u2 first day
        ["2024-01-02", 1, 1],   # u2 active on Jan 3
    ]


def test_grouped_rank_and_median_match_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import grouped_exact_median, grouped_rank

    rng = np.random.Generator(np.random.PCG64(31))
    n = 4000
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_orderpriority": rng.choice(["A", "B", "C"], size=n),
        # few distinct prices -> heavy ties exercise RANK semantics
        "o_totalprice": rng.integers(1, 60, size=n) / 4.0,
    })
    ds = rd.from_pandas(df).repartition(13)

    ranked = grouped_rank(ds, "o_orderpriority", "o_totalprice",
                          "o_orderkey").to_pandas()
    ranked = ranked.sort_values("o_orderkey").reset_index(drop=True)
    cents = np.rint(df.o_totalprice.to_numpy() * 100).astype(np.int64)
    exp_rank = np.empty(n, np.int64)
    exp_pr = np.empty(n, np.float64)
    for k, g in df.assign(c=cents).groupby("o_orderpriority"):
        c = g.c.to_numpy()
        r = np.array([(c < x).sum() + 1 for x in c], np.int64)
        exp_rank[g.index.to_numpy()] = r
        exp_pr[g.index.to_numpy()] = (r - 1) / (len(c) - 1)
    assert np.array_equal(ranked.rnk.to_numpy(), exp_rank)
    assert np.array_equal(ranked.pct_rank.to_numpy(), exp_pr)

    med = grouped_exact_median(rd.from_pandas(df).repartition(7),
                               "o_orderpriority", "o_totalprice").to_pandas()
    for _, row in med.iterrows():
        c = np.sort(cents[df.o_orderpriority.to_numpy() == row.o_orderpriority])
        rank = (len(c) + 1) // 2
        assert row.median_cents == c[rank - 1]
        assert row.n_rows == len(c)


def test_cohort_retention_cross_batch_dedup(ray_session):
    """Regression: a user active the same day in MULTIPLE map bundles must
    count once (5x inflation before the global distinct was added)."""
    import ray.data as rd

    from raygeo.ops.relational import cohort_retention

    rng = np.random.Generator(np.random.PCG64(1))
    n = 150_000  # >> one 65536-row map bundle
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": (np.datetime64("2024-01-01")
               + rng.integers(0, 10 * 86400, n).astype("timedelta64[s]")),
    })
    out = cohort_retention(rd.from_pandas(df).repartition(9)).to_pandas()
    d = df.assign(day=df.ts.to_numpy().astype("datetime64[D]"))
    pairs = d[["user_id", "day"]].drop_duplicates()
    coh = pairs.groupby("user_id").day.min().rename("cohort")
    j = pairs.merge(coh, on="user_id")
    cells = j.groupby([j.cohort.dt.strftime("%Y-%m-%d"),
                       (j.day - j.cohort).dt.days]).user_id.nunique()
    got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()}
    assert len(got) == len(cells)
    for (cd, off), n_users in cells.items():
        assert got[(cd, off)] == n_users


def test_grouped_mode_tiebreak_and_partitioning(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import grouped_mode

    rng = np.random.Generator(np.random.PCG64(7))
    n = 20_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, size=n).astype(np.int64),
        "event_type": rng.choice(["b", "a", "c", "d"], size=n),
    })
    # force an exact tie for one user: the winner must be the smaller value
    tie = pd.DataFrame({"user_id": np.full(10, 999, np.int64),
                        "event_type": ["zz"] * 5 + ["aa"] * 5})
    df = pd.concat([df, tie], ignore_index=True)

    got = (grouped_mode(rd.from_pandas(df).repartition(9),
                        "user_id", "event_type")
           .to_pandas().sort_values("user_id").reset_index(drop=True))

    cnt = df.groupby(["user_id", "event_type"]).size().rename("cnt").reset_index()
    cnt = cnt.sort_values(["user_id", "cnt", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
    exp = cnt.groupby("user_id", sort=True).head(1).reset_index(drop=True)
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["top_value"].tolist() == exp["event_type"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()
    assert got.loc[got.user_id == 999, "top_value"].iloc[0] == "aa"


def test_large_orders_matches_serial(ray_session):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"

    from raygeo.ops.relational import large_orders
    from raygeo.util import read_parquet_clean

    got = large_orders(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet"),
        f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet",
        qty_threshold=250, k=10).to_pandas()
    exp = duckdb.sql(f"""
        WITH big AS (
          SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
          FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 HAVING sum_qty > 250)
        SELECT c_name, o_orderkey, sum_qty::BIGINT AS sum_qty
        FROM big JOIN '{sf_dir}/orders.parquet' ON o_orderkey = l_orderkey
        JOIN '{sf_dir}/customer.parquet' ON c_custkey = o_custkey
        ORDER BY sum_qty DESC, o_orderkey LIMIT 10
    """).df()
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert got["sum_qty"].tolist() == exp["sum_qty"].tolist()
    assert got["c_name"].tolist() == exp["c_name"].tolist()


def test_discounted_revenue_band_edges(ray_session):
    """Band-edge rows (qty exactly at lo/hi) and multi-band-eligible parts
    must count exactly once, under the part's own brand band."""
    import ray.data as rd

    from raygeo.ops.relational import discounted_revenue

    parts = pd.DataFrame({
        "p_partkey": np.arange(6, dtype=np.int64),
        "p_brand": ["Brand#11", "Brand#12", "Brand#13",
                    "Brand#11", "Brand#99", "Brand#12"],
    })
    li = pd.DataFrame({
        "l_partkey": np.array([0, 0, 1, 2, 3, 4, 5, 5], np.int64),
        # part0: qty 11 (in) + 12 (out); part1: 10 (edge in); part2: 30 (edge in)
        # part3: 1 (edge in); part4: any (brand out); part5: 9 (out) + 20 (in)
        "l_quantity": [11.0, 12.0, 10.0, 30.0, 1.0, 15.0, 9.0, 20.0],
        "l_extendedprice": [100.0] * 8,
        "l_discount": [0.0] * 8,
    })
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        ppath = f"{td}/part.parquet"
        pq.write_table(pa.Table.from_pandas(parts), ppath)
        got = discounted_revenue(rd.from_pandas(li).repartition(3), ppath)
        rev = got.column("revenue_c4").to_pylist()[0]
    # qualifying rows: 5 x (10000 cents * 100) = 5_000_000
    assert rev == 5 * 10000 * 100


def test_heavy_hitters_exact_under_compression(ray_session):
    """Vocabulary >> sketch_k so the per-batch Misra-Gries compress
    actually fires; the two-pass answer must still be the EXACT top-k."""
    import ray.data as rd

    from raygeo.ops.corpus import heavy_hitters

    rng = np.random.Generator(np.random.PCG64(42))
    # 2000 distinct tail words + 12 heavy words
    tail = [f"w{i:04d}" for i in range(2000)]
    heavy = [f"hot{i}" for i in range(12)]
    texts = []
    for d in range(400):
        words = list(rng.choice(tail, size=30))
        for i, h in enumerate(heavy):
            if d % (i + 1) == 0:  # hot0 in every doc, hot11 in every 12th
                words.append(h)
        rng.shuffle(words)
        texts.append(" ".join(words))
    df = pd.DataFrame({"text": texts})

    got = (heavy_hitters(rd.from_pandas(df).repartition(8),
                         k=8, sketch_k=64)
           .to_pandas().reset_index(drop=True))

    vc = pd.Series(" ".join(texts).split()).value_counts()
    ex = pd.DataFrame({"term": vc.index.to_numpy(), "tf": vc.to_numpy()})
    ex = (ex.sort_values(["tf", "term"], ascending=[False, True])
          .head(8).reset_index(drop=True))
    assert got["term"].tolist() == ex["term"].tolist()
    assert got["tf"].tolist() == ex["tf"].tolist()


def test_pagerank_matches_serial_and_conserves_shape(ray_session):
    """Distributed integer PageRank == serial numpy replay on a random
    graph, independent of edge partitioning; ranks sum near total mass."""
    import ray.data as rd

    from raygeo.ops.graph import pagerank

    rng = np.random.Generator(np.random.PCG64(5))
    n_nodes, n_edges = 60, 400
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    df = (pd.DataFrame({"term_a": [f"n{x:02d}" for x in a],
                        "term_b": [f"n{x:02d}" for x in b]})
          .drop_duplicates())

    got = (pagerank(rd.from_pandas(df).repartition(7), rounds=2)
           .to_pandas().sort_values("node").reset_index(drop=True))

    # serial replay with identical integer ops
    edges = pd.concat([df.rename(columns={"term_a": "s", "term_b": "t"}),
                       df.rename(columns={"term_a": "t", "term_b": "s"})])
    nodes = np.sort(edges["s"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    s = edges["s"].map(idx).to_numpy()
    t = edges["t"].map(idx).to_numpy()
    outdeg = np.bincount(s, minlength=len(nodes)).astype(np.int64)
    q = 10**12
    r = np.full(len(nodes), q, dtype=np.int64)
    for _ in range(2):
        send = (r * 85 // 100) // outdeg
        inc = np.zeros(len(nodes), np.int64)
        np.add.at(inc, t, send[s])
        r = q * 15 // 100 + inc
    assert got["node"].tolist() == list(nodes)
    assert got["rank"].tolist() == r.tolist()
    total = len(nodes) * q
    assert abs(got["rank"].sum() - total) < total * 0.01  # floor-loss only


def test_json_props_regex_parity_with_real_parse(ray_session):
    """The regex fast path must agree with an actual json.loads on both
    well-formed payloads and rows missing the key."""
    import json

    import ray.data as rd

    from raygeo.ops.relational import json_props_stats

    props = ['{"k": 87}', '{"k": -3}', '{"k":0}', '{ "k" : 12 }',
             '{"other": 5}', '{}', '{"k": 7, "j": 1}',
             # a group that NEVER carries the key (min/max must fold as
             # null, not crash the int cast)
             '{"z": 1}', '{}']
    df = pd.DataFrame({"event_type": ["a", "a", "b", "b", "a", "b", "a",
                                      "c", "c"],
                       "props": props})
    got = (json_props_stats(rd.from_pandas(df).repartition(3))
           .to_pandas().sort_values("event_type").reset_index(drop=True))

    rows = []
    for et, p in zip(df.event_type, df.props):
        d = json.loads(p)
        rows.append({"event_type": et, "k": d.get("k")})
    r = pd.DataFrame(rows)
    exp = r.groupby("event_type").agg(
        n_events=("k", "size"), n_with_key=("k", "count"),
        sum_k=("k", lambda s: int(s.dropna().sum())),
        min_k=("k", "min"), max_k=("k", "max")).reset_index()
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["n_with_key"].tolist() == exp["n_with_key"].tolist()
    assert got["sum_k"].tolist() == exp["sum_k"].tolist()
    for c in ("min_k", "max_k"):
        for gv, ev in zip(got[c], exp[c]):
            assert (pd.isna(gv) and pd.isna(ev)) or int(gv) == int(ev)


def test_pagerank_directed_sink_nodes(ray_session):
    """Directed mode: destination-only (sink) nodes get rank rows and
    absorb incoming mass without crashing the scatter."""
    import ray.data as rd

    from raygeo.ops.graph import pagerank

    df = pd.DataFrame({"term_a": ["a", "a", "b"],
                       "term_b": ["b", "sink", "sink"]})
    got = (pagerank(rd.from_pandas(df), rounds=2, undirected=False)
           .to_pandas().set_index("node")["rank"])
    assert set(got.index) == {"a", "b", "sink"}
    q = 10**12
    # serial replay: a->b, a->sink, b->sink
    r = {n: q for n in ["a", "b", "sink"]}
    for _ in range(2):
        send_a = (r["a"] * 85 // 100) // 2
        send_b = (r["b"] * 85 // 100) // 1
        r = {"a": q * 15 // 100,
             "b": q * 15 // 100 + send_a,
             "sink": q * 15 // 100 + send_a + send_b}
    assert got.to_dict() == r


def test_pagerank_dataset_matches_broadcast(ray_session):
    """The ranks-as-Dataset (partitioned-join) variant is bit-identical to
    the broadcast-state variant on the same graph, directed and not."""
    import ray.data as rd

    from raygeo.ops.graph import pagerank, pagerank_dataset

    rng = np.random.Generator(np.random.PCG64(8))
    a = rng.integers(0, 40, 200)
    b = rng.integers(0, 40, 200)
    keep = a != b
    df = (pd.DataFrame({"term_a": [f"n{x:02d}" for x in a[keep]],
                        "term_b": [f"n{x:02d}" for x in b[keep]]})
          .drop_duplicates())
    for und in (True, False):
        exp = (pagerank(rd.from_pandas(df), rounds=2, undirected=und)
               .to_pandas().sort_values("node").reset_index(drop=True))
        got = (pagerank_dataset(rd.from_pandas(df).repartition(5),
                                rounds=2, undirected=und)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert got["node"].tolist() == exp["node"].tolist()
        assert got["rank"].tolist() == exp["rank"].tolist()


def test_copurchase_pairs_exact_and_batch_safe(ray_session):
    """Pair counts are exact when an order's lines straddle batches (the
    global distinct prevents double counting), ties break by part ids."""
    import ray.data as rd
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygeo.ops.relational import copurchase_pairs

    # order 1: parts (1,2,2,3) — dup line of part 2 must not inflate
    # order 2: parts (1,2); order 3: parts (1,2) -> pair (1,2) count 3
    df = pd.DataFrame({
        "l_orderkey": np.array([1, 1, 1, 1, 2, 2, 3, 3], np.int64),
        "l_partkey": np.array([1, 2, 2, 3, 1, 2, 1, 2], np.int64),
    })
    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/li.parquet"
        pq.write_table(pa.Table.from_pandas(df), p)
        got = (copurchase_pairs(rd.from_pandas(df).repartition(5), p, k=10)
               .to_pandas().reset_index(drop=True))
    assert got.iloc[0].tolist() == [1, 2, 3]
    assert sorted(map(tuple, got.values)) == [(1, 2, 3), (1, 3, 1), (2, 3, 1)]


def test_returned_order_priority_matches_serial(ray_session):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"

    from raygeo.ops.relational import returned_order_priority
    from raygeo.util import read_parquet_clean

    got = (returned_order_priority(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet"),
        f"{sf_dir}/orders.parquet")
        .to_pandas().sort_values("o_orderpriority").reset_index(drop=True))
    exp = duckdb.sql(f"""
        SELECT o_orderpriority, count(*)::BIGINT AS order_count
        FROM '{sf_dir}/orders.parquet'
        WHERE o_orderdate >= DATE '1996-07-01'
          AND o_orderdate < DATE '1996-10-01'
          AND EXISTS (SELECT 1 FROM '{sf_dir}/lineitem.parquet'
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY 1 ORDER BY 1
    """).df()
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["order_count"].tolist() == exp["order_count"].tolist()


def test_promo_revenue_matches_serial(ray_session):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"

    from raygeo.ops.relational import promo_revenue
    from raygeo.util import read_parquet_clean

    got = promo_revenue(read_parquet_clean(f"{sf_dir}/lineitem.parquet"),
                        f"{sf_dir}/part.parquet")
    exp = duckdb.sql(f"""
        SELECT
          coalesce(sum(CASE WHEN p_type LIKE 'PROMO%'
            THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT)) END),
            0)::BIGINT AS promo_c4,
          coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0)::BIGINT
            AS total_c4
        FROM '{sf_dir}/lineitem.parquet'
        JOIN '{sf_dir}/part.parquet' ON p_partkey = l_partkey
        WHERE l_shipdate >= DATE '1996-09-01'
          AND l_shipdate < DATE '1996-10-01'
    """).df()
    assert got.column("promo_c4").to_pylist() == [int(exp["promo_c4"][0])]
    assert got.column("total_c4").to_pylist() == [int(exp["total_c4"][0])]


def test_top_supplier_tie_inclusive(ray_session):
    """Two suppliers tying on max revenue must BOTH be returned, sorted."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.relational import top_supplier

    li = pd.DataFrame({
        "l_suppkey": np.array([7, 7, 3, 5, 5], np.int64),
        "l_shipdate": pd.to_datetime(["1996-02-01"] * 5),
        # supp 7: 100+100=200; supp 3: 150; supp 5: 100+100=200 (tie)
        "l_extendedprice": [100.0, 100.0, 150.0, 100.0, 100.0],
        "l_discount": [0.0] * 5,
    })
    supp = pd.DataFrame({
        "s_suppkey": np.array([3, 5, 7], np.int64),
        "s_name": ["s-three", "s-five", "s-seven"],
    })
    with tempfile.TemporaryDirectory() as td:
        spath = f"{td}/supplier.parquet"
        pq.write_table(pa.Table.from_pandas(supp), spath)
        got = top_supplier(rd.from_pandas(li).repartition(3), spath)
    assert got.column("s_suppkey").to_pylist() == [5, 7]
    assert got.column("s_name").to_pylist() == ["s-five", "s-seven"]
    assert got.column("total_c4").to_pylist() == [2_000_000, 2_000_000]


def test_customer_order_histogram_zero_bin(ray_session):
    """Customers with no (qualifying) orders must land in the c_count=0
    bin — the LEFT OUTER semantics the plain inner-join plan would drop.
    Excluded-priority orders must not count."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.relational import customer_order_histogram

    orders = pd.DataFrame({
        "o_custkey": np.array([1, 1, 2, 3, 3, 3], np.int64),
        "o_orderpriority": ["5-LOW", "5-LOW", "1-URGENT",
                            "5-LOW", "5-LOW", "5-LOW"],
    })
    cust = pd.DataFrame({"c_custkey": np.arange(1, 6, dtype=np.int64)})
    with tempfile.TemporaryDirectory() as td:
        cpath = f"{td}/customer.parquet"
        pq.write_table(pa.Table.from_pandas(cust), cpath)
        got = (customer_order_histogram(
            rd.from_pandas(orders).repartition(3), cpath)
            .to_pandas().sort_values("c_count").reset_index(drop=True))
    # cust1: 2 orders; cust2: 0 (urgent excluded); cust3: 3; cust4,5: 0
    assert got["c_count"].tolist() == [0, 2, 3]
    assert got["custdist"].tolist() == [3, 1, 1]


def test_bi_nation_volume_matches_serial(ray_session):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"

    from raygeo.ops.relational import bi_nation_volume
    from raygeo.util import read_parquet_clean

    got = (bi_nation_volume(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet"),
        f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet",
        f"{sf_dir}/supplier.parquet", f"{sf_dir}/nation.parquet")
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True))
    exp = duckdb.sql(f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          sum(CAST(round(l_extendedprice*100) AS BIGINT)
              * (100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT
            AS revenue_c4
        FROM '{sf_dir}/supplier.parquet', '{sf_dir}/lineitem.parquet',
             '{sf_dir}/orders.parquet', '{sf_dir}/customer.parquet',
             '{sf_dir}/nation.parquet' n1, '{sf_dir}/nation.parquet' n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1997-01-01'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    assert got["supp_nation"].tolist() == exp["supp_nation"].tolist()
    assert got["cust_nation"].tolist() == exp["cust_nation"].tolist()
    assert got["l_year"].tolist() == exp["l_year"].tolist()
    assert got["revenue_c4"].tolist() == exp["revenue_c4"].tolist()


def test_important_parts_threshold_exact(ray_session):
    """value*multiplier > total must agree bit-exactly with the integer
    floor-threshold filter, including a part exactly AT the threshold."""
    import ray.data as rd

    from raygeo.ops.relational import important_parts

    # three parts: values 100, 100, 800 -> total 1000.  multiplier 10 ->
    # threshold total/10 = 100: parts at exactly 100 are NOT important.
    li = pd.DataFrame({
        "l_partkey": np.array([1, 2, 3, 3], np.int64),
        "l_extendedprice": [1.0, 1.0, 4.0, 4.0],
        "l_discount": [0.0] * 4,
    })
    got = (important_parts(rd.from_pandas(li).repartition(3), multiplier=10)
           .to_pandas().sort_values("l_partkey").reset_index(drop=True))
    assert got["l_partkey"].tolist() == [3]
    assert got["value_c4"].tolist() == [80000]


def test_supplier_part_counts_matches_serial(ray_session):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"

    from raygeo.ops.relational import supplier_part_counts
    from raygeo.util import read_parquet_clean

    got = (supplier_part_counts(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet"),
        f"{sf_dir}/part.parquet", f"{sf_dir}/supplier.parquet")
        .to_pandas().sort_values(["p_brand", "p_size"])
        .reset_index(drop=True))
    exp = duckdb.sql(f"""
        WITH ds AS (SELECT DISTINCT l_partkey, l_suppkey
                    FROM '{sf_dir}/lineitem.parquet'
                    WHERE l_suppkey NOT IN
                      (SELECT s_suppkey FROM '{sf_dir}/supplier.parquet'
                       WHERE s_acctbal < 0))
        SELECT p_brand, p_size::BIGINT AS p_size,
          count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        FROM ds JOIN '{sf_dir}/part.parquet' ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45'
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert got["p_brand"].tolist() == exp["p_brand"].tolist()
    assert got["p_size"].tolist() == exp["p_size"].tolist()
    assert got["supplier_cnt"].tolist() == exp["supplier_cnt"].tolist()


def test_idle_rich_customers_threshold_and_antijoin(ray_session):
    """Boundary: a customer exactly AT the average is excluded (> not >=);
    a rich customer WITH a recent order is excluded by the anti-join."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.relational import idle_rich_customers

    cust = pd.DataFrame({
        "c_custkey": np.arange(1, 6, dtype=np.int64),
        "c_mktsegment": ["MACHINERY"] * 5,
        # positives: 10, 20, 30 -> avg 20.  cust2 at exactly 20 excluded.
        # cust3 (30) idle -> IN.  cust4 (30) has a recent order -> OUT.
        # cust5 negative -> below avg anyway.
        "c_acctbal": [10.0, 20.0, 30.0, 30.0, -5.0],
    })
    orders = pd.DataFrame({
        "o_custkey": np.array([4], np.int64),
        "o_orderdate": pd.to_datetime(["2000-06-01"]),
    })
    # cust4's balance participates in the average: positives are
    # 10, 20, 30, 30 -> avg 22.5; cust3 and cust4 are above, cust4 has
    # the recent order -> only cust3 survives.
    with tempfile.TemporaryDirectory() as td:
        cpath = f"{td}/customer.parquet"
        pq.write_table(pa.Table.from_pandas(cust), cpath)
        got = (idle_rich_customers(
            rd.from_pandas(orders).repartition(2), cpath,
            segments=("MACHINERY",), recent="1999-01-01")
            .to_pandas())
    assert got["c_mktsegment"].tolist() == ["MACHINERY"]
    assert got["numcust"].tolist() == [1]
    assert got["totacctbal_cents"].tolist() == [3000]


def test_min_cost_supplier_tiebreak(ray_session):
    """Equal min prices must resolve to the smaller suppkey via the
    packed argmin, across batches."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.relational import min_cost_supplier

    li = pd.DataFrame({
        "l_partkey": np.array([1, 1, 1, 2, 2], np.int64),
        "l_suppkey": np.array([9, 4, 6, 2, 8], np.int64),
        # part1: min price 5.0 shared by supp 9 and 4 -> supp 4 wins
        "l_extendedprice": [5.0, 5.0, 7.0, 3.0, 2.0],
    })
    parts = pd.DataFrame({
        "p_partkey": np.array([1, 2, 3], np.int64),
        "p_size": np.array([5, 30, 5], np.int32),  # part2 filtered out
    })
    with tempfile.TemporaryDirectory() as td:
        ppath = f"{td}/part.parquet"
        pq.write_table(pa.Table.from_pandas(parts), ppath)
        got = (min_cost_supplier(
            rd.from_pandas(li).repartition(4), ppath, max_size=15)
            .to_pandas().sort_values("p_partkey").reset_index(drop=True))
    assert got["p_partkey"].tolist() == [1]
    assert got["s_suppkey"].tolist() == [4]
    assert got["min_cents"].tolist() == [500]


def test_decontaminate_overlap_and_exclusions(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import decontaminate

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], np.int64),  # 0 = benchmark (mod 7)
        "text": [
            f"BENCH {shared} tail words here",
            f"prefix {shared} and more",          # contaminated: 1 hit
            "totally unrelated text with no overlap at all whatsoever",
            f"{shared} {shared}",                 # dup ngram counted once
        ],
    })
    got = (decontaminate(rd.from_pandas(docs).repartition(3), n=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 3]
    # doc3 contains the shared 8-gram at several positions plus rolled
    # windows crossing the repeat; count DISTINCT shared ngrams >= 1
    assert got.loc[0, "n_hits"] == 1
    assert got.loc[1, "n_hits"] >= 1


def test_bigram_top_partition_invariant(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import bigram_top

    docs = pd.DataFrame({"text": ["a b a b c", "b c b c", "a b"] * 7})
    a = (bigram_top(rd.from_pandas(docs).repartition(1), k=5)
         .to_pandas().reset_index(drop=True))
    b = (bigram_top(rd.from_pandas(docs).repartition(9), k=5)
         .to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # serial oracle
    from collections import Counter
    c = Counter()
    for t in docs["text"]:
        ws = t.split()
        c.update(zip(ws, ws[1:]))
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(a["w1"], a["w2"], a["n"])) == [
        (w1, w2, n) for (w1, w2), n in exp]


def test_kcenter_matches_serial_greedy(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import kcenter_greedy

    rng = np.random.Generator(np.random.PCG64(5))
    n, d, k = 200, 8, 5
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [v for v in vecs]})
    got = kcenter_greedy(rd.from_pandas(df).repartition(7),
                         k=k).to_pandas()

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    sel = [0]  # index of min id
    dists = [0]
    dmin = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for _ in range(k - 1):
        diff = q - q[sel[-1]][None, :]
        dmin = np.minimum(dmin, np.einsum("ij,ij->i", diff, diff))
        order = np.lexsort((ids, -dmin))
        sel.append(int(order[0]))
        dists.append(int(dmin[order[0]]))
    assert got["vec_id"].tolist() == [int(ids[i]) for i in sel]
    assert got["dist"].tolist() == dists
    assert got["sel_round"].tolist() == list(range(k))


def test_mad_outliers_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import mad_outliers

    rng = np.random.Generator(np.random.PCG64(17))
    n = 4000
    df = pd.DataFrame({
        "event_type": [f"t{i % 3}" for i in range(n)],
        # coarse grid -> heavy ties; includes rows exactly AT 3*MAD
        "value": rng.integers(-20, 21, size=n) / 4.0,
    })
    got = (mad_outliers(rd.from_pandas(df).repartition(11))
           .to_pandas().sort_values("event_type").reset_index(drop=True))

    rows = []
    for t, g in df.groupby("event_type"):
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        v = np.sort(cents)
        med = int(v[(len(v) + 1) // 2 - 1])
        dev = np.sort(np.abs(cents - med))
        mad = int(dev[(len(dev) + 1) // 2 - 1])
        rows.append((t, med, mad, int((np.abs(cents - med) > 3 * mad).sum())))
    exp = pd.DataFrame(rows, columns=["event_type", "median_cents",
                                      "mad_cents", "n_outliers"])
    pd.testing.assert_frame_equal(
        got[["event_type", "median_cents", "mad_cents", "n_outliers"]],
        exp, check_dtype=False)


def test_range_search_matches_brute(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import range_search

    rng = np.random.Generator(np.random.PCG64(23))
    n, d = 300, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})
    r = 4_000_000_000_000
    got = (range_search(rd.from_pandas(df).repartition(7),
                        probe_mod=50, radius=r)
           .to_pandas().sort_values(["pid", "vec_id"])
           .reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    exp = []
    for pid in ids[ids % 50 == 0]:
        diff = q - q[pid][None, :]
        dist = np.einsum("ij,ij->i", diff, diff)
        keep = (dist < r) & (ids != pid)
        for v, dd in zip(ids[keep], dist[keep]):
            exp.append((int(pid), int(v), int(dd)))
    exp_df = (pd.DataFrame(exp, columns=["pid", "vec_id", "dist"])
              .sort_values(["pid", "vec_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)


def test_nation_balance_full_outer_sides(ray_session):
    """Nations present on only ONE side must survive with the other side
    coalesced to zero."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygeo.ops.relational import nation_balance

    cust = pd.DataFrame({
        "c_nationkey": np.array([1, 1, 2], np.int32),
        "c_mktsegment": ["MACHINERY"] * 3,
        "c_acctbal": [9500.0, 9600.0, 9700.0],
    })
    supp = pd.DataFrame({
        "s_nationkey": np.array([2, 3], np.int32),
        "s_acctbal": [6000.0, 7000.0],
    })
    with tempfile.TemporaryDirectory() as td:
        cp, sp = f"{td}/c.parquet", f"{td}/s.parquet"
        pq.write_table(pa.Table.from_pandas(cust), cp)
        pq.write_table(pa.Table.from_pandas(supp), sp)
        got = (nation_balance(cp, sp).to_pandas()
               .sort_values("n_nationkey").reset_index(drop=True))
    assert got["n_nationkey"].tolist() == [1, 2, 3]
    assert got["cust_cents"].tolist() == [1910000, 970000, 0]
    assert got["n_cust"].tolist() == [2, 1, 0]
    assert got["supp_cents"].tolist() == [0, 600000, 700000]
    assert got["n_supp"].tolist() == [0, 1, 1]


def test_range_search_no_probes_returns_empty(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import range_search

    df = pd.DataFrame({
        "vec_id": np.arange(1, 40, dtype=np.int64),  # no multiple of 100
        "embedding": [np.ones(4, np.float32) for _ in range(39)],
    })
    got = range_search(rd.from_pandas(df).repartition(3), probe_mod=100)
    out = got.to_pandas() if hasattr(got, "to_pandas") else got
    import pyarrow as pa

    if isinstance(out, pa.Table):
        out = out.to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["pid", "vec_id", "dist"]


def test_decontaminate_external_bench_ds(ray_session):
    """With an external benchmark set, EVERY corpus doc is a training doc
    (no mod-slice exclusion) and hits count against the external set."""
    import ray.data as rd

    from raygeo.ops.corpus import decontaminate

    shared = "one two three four five six seven eight"
    docs = pd.DataFrame({
        "doc_id": np.array([0, 7, 14], np.int64),  # all ≡ 0 mod 7
        "text": [f"{shared} tail", "clean text with no overlap here at all",
                 f"lead in {shared}"],
    })
    bench = pd.DataFrame({"text": [f"bench doc holding {shared} inside"]})
    got = (decontaminate(rd.from_pandas(docs).repartition(2), n=8,
                         bench_ds=rd.from_pandas(bench))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # doc 0 and 14 overlap; doc 7 does not; mod-7 ids are NOT excluded
    assert got["doc_id"].tolist() == [0, 14]
    assert got["n_hits"].tolist() == [1, 1]


def test_quantile_cont_matches_duckdb_bits(ray_session):
    """The (1-f)*lo + f*hi operand order must match DuckDB's quantile_cont
    to the last bit, incl. heavy ties and tiny groups."""
    import duckdb
    import ray.data as rd

    from raygeo.ops.relational import grouped_quantile_cont

    rng = np.random.Generator(np.random.PCG64(31))
    n = 3000
    df = pd.DataFrame({
        "k": [f"g{i % 4}" for i in range(n)],
        "v": rng.integers(0, 40, size=n) / 8.0,  # coarse grid: ties
    })
    df.loc[df.k == "g3", "v"] = 7.25  # constant group
    got = (grouped_quantile_cont(rd.from_pandas(df).repartition(9),
                                 "k", "v", q=0.9)
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, count(*)::BIGINT AS n_rows,
          quantile_cont(CAST(round(v * 100) AS BIGINT), 0.9) AS p_value
        FROM df GROUP BY 1 ORDER BY 1""").df()
    assert got["n_rows"].tolist() == exp["n_rows"].tolist()
    assert got["p_value"].tolist() == exp["p_value"].tolist()  # bit-exact


def test_context_windows_edges(ray_session):
    """Doc shorter than one window -> one clipped window; exact-multiple
    lengths must not emit a trailing empty window."""
    import ray.data as rd

    from raygeo.ops.corpus import context_windows

    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], np.int64),
        "text": ["w " * 5,            # 5 tokens: one window len 5
                 "w " * 64,           # exactly one window len 64
                 "w " * 65,           # windows at 0 (64) and 48 (17)
                 ""],                 # zero tokens: no windows
    })
    got = (context_windows(rd.from_pandas(docs).repartition(3),
                           win=64, stride=48)
           .to_pandas().sort_values(["doc_id", "win_start"])
           .reset_index(drop=True))
    assert got[["doc_id", "win_start", "win_len"]].values.tolist() == [
        [1, 0, 5], [2, 0, 64], [3, 0, 64], [3, 48, 17]]


def test_skyline_strict_dominance_and_partitioning(ray_session):
    """Duplicates of a front point both survive (no strict dominance);
    same-price smaller-size and same-size pricier rows are dominated;
    result is partitioning-invariant (skyline algebra associativity)."""
    import ray.data as rd

    from raygeo.ops.relational import skyline_parts

    df = pd.DataFrame({
        "p_partkey": np.arange(8, dtype=np.int64),
        #                 front  dup   domA  domB  front  domC  front  domD
        "p_retailprice": [1.00, 1.00, 1.00, 2.00, 2.00, 3.00, 0.50, 0.50],
        "p_size": np.array([10, 10, 7, 10, 20, 15, 5, 4], np.int32),
        # 0,1: equal-(price,size) duplicates -> both kept
        # 2: same price, smaller size -> dominated by 0
        # 3: same size as 0 but pricier -> dominated
        # 4: pricier but bigger -> front; 5: dominated by 4
        # 6: cheapest, small -> front; 7: same price smaller -> dominated
    })
    for parts in (1, 5):
        got = (skyline_parts(rd.from_pandas(df).repartition(parts))
               .to_pandas().sort_values("p_partkey").reset_index(drop=True))
        assert got["p_partkey"].tolist() == [0, 1, 4, 6]


def test_join_type_matrix_right_outer_and_semis(ray_session):
    """Pin the remaining Dataset.join types the ops rely on implicitly:
    right_outer mirrors left_outer (coalesced key under the LEFT name),
    left_semi/left_anti partition the left side exactly."""
    import pyarrow as pa
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": [10, 20, 30]}))
    right = rd.from_arrow(pa.table({"rk": [2, 3, 4], "b": [200, 300, 400]}))

    ro = (left.join(right, join_type="right_outer", num_partitions=2,
                    on=("k",), right_on=("rk",))
          .to_pandas().sort_values("b").reset_index(drop=True))
    assert ro["b"].tolist() == [200, 300, 400]
    # left-missing row (rk=4) survives with a null left payload
    assert ro["a"].isna().tolist() == [False, False, True]

    semi = (left.join(right, join_type="left_semi", num_partitions=2,
                      on=("k",), right_on=("rk",))
            .to_pandas().sort_values("k").reset_index(drop=True))
    anti = (left.join(right, join_type="left_anti", num_partitions=2,
                      on=("k",), right_on=("rk",))
            .to_pandas().sort_values("k").reset_index(drop=True))
    assert semi["k"].tolist() == [2, 3]
    assert anti["k"].tolist() == [1]
    # semi ∪ anti == left, disjoint
    assert sorted(semi["k"].tolist() + anti["k"].tolist()) == [1, 2, 3]


def test_sql_round_cents_matches_duckdb_round():
    """Adversarial grid (k/8: exact .5 cents, negatives) — engine cents
    must equal DuckDB's CAST(round(v*100) AS BIGINT) on every value."""
    import duckdb

    from raygeo.ops.relational import sql_round_cents

    vals = np.concatenate([
        np.arange(-40, 41) / 8.0,       # ±x.125 -> .5-cent classes
        np.arange(-40, 41) / 16.0,
        np.array([0.0, -0.005, 0.005, 1.115, -1.115]),
    ])
    got = sql_round_cents(vals).tolist()
    df = pd.DataFrame({"v": vals})
    exp = duckdb.sql(
        "SELECT CAST(round(v * 100) AS BIGINT) c FROM df").df()["c"].tolist()
    assert got == exp


def test_local_skyline_property_random():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raygeo.ops.relational import _local_skyline

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                    min_size=1, max_size=40))
    def run(pts):
        df = pd.DataFrame({
            "p_partkey": np.arange(len(pts), dtype=np.int64),
            "price_c": np.array([p for p, _ in pts], np.int64),
            "p_size": np.array([s for _, s in pts], np.int64),
        })
        got = set(_local_skyline(df)["p_partkey"])
        exp = set()
        for i, (pi, si) in enumerate(pts):
            dominated = any(
                qj <= pi and sj >= si and (qj < pi or sj > si)
                for j, (qj, sj) in enumerate(pts) if j != i)
            if not dominated:
                exp.add(i)
        assert got == exp

    run()


def test_label_propagation_chain_and_rounds(ray_session):
    """A path graph needs hop-count rounds: after r rounds each node has
    the min label within r hops — NOT necessarily the component min.
    Verify exact r-hop semantics and full convergence at diameter."""
    import hashlib

    import ray.data as rd

    from raygeo.ops.graph import label_propagation

    def h63(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                              "big") & ((1 << 63) - 1)

    # path a-b-c-d-e plus isolated pair x-y
    edges = pd.DataFrame({
        "term_a": ["a", "b", "c", "d", "x"],
        "term_b": ["b", "c", "d", "e", "y"],
    })
    names = ["a", "b", "c", "d", "e", "x", "y"]
    lab = {n: h63(n) for n in names}

    def serial(rounds):
        cur = dict(lab)
        adj = {n: set() for n in names}
        for _, r in edges.iterrows():
            adj[r.term_a].add(r.term_b)
            adj[r.term_b].add(r.term_a)
        for _ in range(rounds):
            cur = {n: min([cur[n]] + [cur[m] for m in adj[n]])
                   for n in names}
        return cur

    for rounds in (1, 2, 4):
        got = (label_propagation(rd.from_pandas(edges).repartition(3),
                                 rounds=rounds)
               .to_pandas().set_index("term")["label"].to_dict())
        assert got == serial(rounds), rounds
    # diameter-4 path: 4 rounds converge the whole component
    conv = (label_propagation(rd.from_pandas(edges), rounds=4)
            .to_pandas())
    comp_abcde = conv[conv.term.isin(list("abcde"))]["label"].nunique()
    comp_xy = conv[conv.term.isin(["x", "y"])]["label"].nunique()
    assert comp_abcde == 1 and comp_xy == 1


def test_latest_state_compaction(ray_session):
    """Upsert compaction vs a pandas window oracle, with ts ties broken
    by id and keys spread across many partitions."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.relational import latest_state

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pd.to_datetime(rng.integers(0, 500, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(size=n),
    })
    got = (latest_state(rd.from_pandas(df).repartition(7),
                        ["user_id", "event_type"], "ts", "event_id",
                        ["value"])
           .to_pandas().sort_values(["user_id", "event_type"])
           .reset_index(drop=True))
    exp = (df.sort_values(["ts", "event_id"])
           .drop_duplicates(["user_id", "event_type"], keep="last")
           [["user_id", "event_type", "ts", "event_id", "value"]]
           .sort_values(["user_id", "event_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_weighted_sample_deterministic_and_biased(ray_session):
    """The weighted draw is partitioning-invariant and actually biased:
    heavy rows appear far more often than light ones."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.corpus import weighted_sample

    n = 4000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "n_chars": np.where(np.arange(n) % 10 == 0,
                                           5000, 50).astype(np.int64)})
    a = weighted_sample(rd.from_pandas(df), k=100).to_pandas()
    b = weighted_sample(rd.from_pandas(df.sample(frac=1.0, random_state=5))
                        .repartition(11), k=100).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    heavy = (a["n_chars"] == 5000).sum()
    # heavy rows are 10% of the corpus but 100x the weight -> they must
    # dominate the sample (expected ~90%+; require a loose majority)
    assert heavy > 60


def test_ntile_stats_matches_duckdb(ray_session):
    """NTILE tile assignment must match SQL NTILE exactly (larger tiles
    first), including groups smaller than n."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.relational import ntile_stats

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "o_orderpriority": rng.choice(["A", "B", "C"], 57),
        "o_totalprice": np.round(rng.uniform(1, 999, 57), 2),
        "o_orderkey": np.arange(57),
    })
    # a group smaller than n tiles
    df.loc[df.index[:2], "o_orderpriority"] = "TINY"
    df = pd.concat([df[df.o_orderpriority != "TINY"],
                    df[df.o_orderpriority == "TINY"].head(2)])
    got = (ntile_stats(rd.from_pandas(df), "o_orderpriority",
                       "o_totalprice", "o_orderkey", n=4)
           .to_pandas().sort_values(["o_orderpriority", "tile"])
           .reset_index(drop=True))
    exp = duckdb.sql("""
        WITH t AS (
          SELECT o_orderpriority,
            CAST(round(o_totalprice*100) AS BIGINT) AS pc,
            ntile(4) OVER (PARTITION BY o_orderpriority
                           ORDER BY round(o_totalprice*100) DESC,
                                    o_orderkey) AS tile
          FROM df)
        SELECT o_orderpriority, tile::BIGINT AS tile,
               count(*)::BIGINT AS n_rows, min(pc) AS min_price_c,
               max(pc) AS max_price_c, sum(pc)::BIGINT AS sum_price_c
        FROM t GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert got.astype({"tile": "int64"}).equals(
        exp.astype({"tile": "int64"}))


def test_bm25_topk_matches_bruteforce(ray_session):
    """BM25 integer score equals the serial formula; top-k order is
    (score desc, id asc); partitioning cannot change the result."""
    import re

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.corpus import bm25_topk

    docs = pd.DataFrame({
        "doc_id": range(30),
        "text": [f"hash join batch {'hash ' * (i % 5)}stream pipeline "
                 f"{'join ' * (i % 3)}data" if i % 4 else "no query terms"
                 for i in range(30)],
    })
    terms = ["hash", "join", "batch"]
    got = bm25_topk(rd.from_pandas(docs), terms, k=5).to_pandas()

    tok = re.compile(r"[0-9a-z_]+")
    toks = {r.doc_id: tok.findall(r.text.lower()) for r in docs.itertuples()}
    N = sum(1 for t in toks.values() if t)
    S = sum(len(t) for t in toks.values())
    dfs = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}
    idf = {t: max(1, (N + 1).bit_length() - dfs[t].bit_length())
           for t in terms if dfs[t]}
    exp = []
    for d, ts in toks.items():
        dl = len(ts)
        sc, hit = 0, False
        for t, w in idf.items():
            tf = ts.count(t)
            if tf:
                hit = True
                sc += w * ((44 * S * tf * 10**6)
                           // (20 * S * tf + 6 * S + 18 * dl * N))
        if hit and dl:
            exp.append((d, sc))
    exp.sort(key=lambda r: (-r[1], r[0]))
    exp = pd.DataFrame(exp[:5], columns=["doc_id", "bm25_q6"])
    assert got.reset_index(drop=True).astype("int64").equals(
        exp.astype("int64"))
    got8 = bm25_topk(rd.from_pandas(docs).repartition(8), terms,
                     k=5).to_pandas()
    assert got8.reset_index(drop=True).astype("int64").equals(
        exp.astype("int64"))


def test_regr_moments_matches_duckdb(ray_session):
    """OLS slope moments + truncating fixed-point slope vs DuckDB
    REGR-family replay, including a negative-slope group and a
    zero-variance group (dropped)."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.relational import regr_moments

    rng = np.random.RandomState(7)
    x = rng.randint(1, 51, 400)
    df = pd.DataFrame({
        "g": rng.choice(["up", "down", "flat"], 400),
        "x": x.astype(float),
        "y": np.round(x * 3.5 + rng.uniform(-20, 20, 400), 2),
    })
    df.loc[df.g == "down", "y"] = np.round(
        200 - df.loc[df.g == "down", "x"] * 2.25, 2)
    df.loc[df.g == "flat", "x"] = 7.0  # zero variance -> dropped
    got = (regr_moments(rd.from_pandas(df), "g", "x", "y")
           .to_pandas().sort_values("g").reset_index(drop=True))
    exp = duckdb.sql("""
        WITH m AS (
          SELECT g, count(*)::BIGINT AS n_rows,
            sum(CAST(round(x) AS BIGINT))::BIGINT AS sum_x,
            sum(CAST(round(y*100) AS BIGINT))::BIGINT AS sum_y_c,
            sum(CAST(round(x) AS BIGINT)
                * CAST(round(y*100) AS BIGINT))::BIGINT AS sum_xy,
            sum(CAST(round(x) AS BIGINT)
                * CAST(round(x) AS BIGINT))::BIGINT AS sum_x2
          FROM df GROUP BY 1)
        SELECT g, n_rows, sum_x, sum_y_c, sum_xy, sum_x2,
          CAST(((n_rows::HUGEINT*sum_xy - sum_x::HUGEINT*sum_y_c)*1000000)
               // (n_rows::HUGEINT*sum_x2 - sum_x::HUGEINT*sum_x)
               AS BIGINT) AS slope_q6
        FROM m WHERE n_rows::HUGEINT*sum_x2 - sum_x::HUGEINT*sum_x > 0
        ORDER BY g""").df()
    assert set(got["g"]) == {"up", "down"}
    assert got["slope_q6"][got.g == "down"].iloc[0] < 0
    pd.testing.assert_frame_equal(got, exp)


def test_herfindahl_monopoly_and_uniform(ray_session):
    """HHI pins: a single-entity group scores exactly q; k equal
    entities score exactly q // k."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.relational import herfindahl

    fact = pd.DataFrame({
        "ek": [1, 1, 2, 3, 4, 5],
        "val": [5.0, 7.0, 12.0, 4.0, 4.0, 4.0],
    })
    dim = pd.DataFrame({"ek": [1, 2, 3, 4, 5],
                        "grp": [10, 10, 20, 20, 20]})
    got = (herfindahl(rd.from_pandas(fact), dim, "ek", "ek", "grp", "val")
           .to_pandas().sort_values("grp").reset_index(drop=True))
    # grp 10: revs 1200, 1200 -> HHI = 1e6 * (2*1200^2) // 2400^2 = 500000
    # grp 20: revs 400, 400, 400 -> 1e6 // 3 = 333333
    assert got.loc[0, "grp"] == 10 and got.loc[0, "hhi_q6"] == 500000
    assert got.loc[1, "grp"] == 20 and got.loc[1, "hhi_q6"] == 333333
    assert got.loc[0, "n_entities"] == 2 and got.loc[1, "n_entities"] == 3
    mono = herfindahl(
        rd.from_pandas(fact[fact.ek == 3]), dim, "ek", "ek", "grp",
        "val").to_pandas()
    assert mono["hhi_q6"].iloc[0] == 10**6


def test_percent_rank_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.relational import percent_rank

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "c_custkey": np.arange(101, dtype=np.int64),
        "c_nationkey": np.append(rng.randint(0, 5, 100).astype(np.int32),
                                 np.int32(99)),  # singleton group
        "c_acctbal": np.round(rng.uniform(-999, 9999, 101), 2),
    })
    got = (percent_rank(rd.from_pandas(df), "c_nationkey", "c_acctbal",
                        "c_custkey")
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
          CAST(round(c_acctbal*100) AS BIGINT) AS val_c,
          (row_number() OVER w - 1)::BIGINT AS pr_num,
          (count(*) OVER (PARTITION BY c_nationkey) - 1)::BIGINT AS pr_den
        FROM df
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY round(c_acctbal*100), c_custkey)
        ORDER BY c_custkey""").df()
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # singleton group reports den 0
    assert got[got.c_nationkey == 99]["pr_den"].iloc[0] == 0


def _tpch_tail_fixture(tmp_path, seed=5, n_orders=400, n_parts=60,
                       n_supp=12):
    """Random mini star schema on disk for the Q6/Q8/Q9/Q20/Q21 shapes."""
    import numpy as np
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(seed))
    nation = pd.DataFrame({
        "n_nationkey": np.arange(6), "n_name": [f"NATION_{i}" for i in
                                                range(6)],
        "n_regionkey": np.arange(6) % 3})
    region = pd.DataFrame({"r_regionkey": np.arange(3),
                           "r_name": ["ASIA", "EUROPE", "AFRICA"]})
    words = ["bolt", "gear", "widget"]
    part = pd.DataFrame({
        "p_partkey": np.arange(n_parts),
        "p_name": [f"{rng.choice(['red', 'big'])} "
                   f"{words[i % 3]}" for i in range(n_parts)],
        "p_type": [["ECONOMY", "SMALL"][i % 2] for i in range(n_parts)]})
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"Supplier#{i:04d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 6, n_supp)})
    customer = pd.DataFrame({
        "c_custkey": np.arange(50),
        "c_nationkey": rng.integers(0, 6, 50)})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_orders),
        "o_custkey": rng.integers(0, 50, n_orders),
        "o_orderdate": (np.datetime64("1995-01-01")
                        + rng.integers(0, 900, n_orders)
                        .astype("timedelta64[D]"))})
    n_li = n_orders * 4
    lineitem = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_orders, n_li),
        "l_partkey": rng.integers(0, n_parts, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_quantity": rng.integers(1, 50, n_li).astype(float),
        "l_extendedprice": np.round(rng.uniform(10, 5000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100, 2),
        "l_shipdate": (np.datetime64("1995-01-01")
                       + rng.integers(0, 1000, n_li)
                       .astype("timedelta64[D]"))})
    # give some parts a dominant supplier so Q20 has deterministic winners
    dom = (lineitem["l_partkey"] % 5 == 0) & (rng.random(n_li) < 0.8)
    lineitem.loc[dom, "l_suppkey"] = 0
    paths = {}
    for name, df in [("nation", nation), ("region", region),
                     ("part", part), ("supplier", supplier),
                     ("customer", customer), ("orders", orders),
                     ("lineitem", lineitem)]:
        p = str(tmp_path / f"{name}.parquet")
        df.to_parquet(p)
        paths[name] = p
    return paths


def test_tpch_tail_shapes_match_duckdb(ray_session, tmp_path):
    """Q6/Q9/Q8/Q21/Q20 adapted shapes vs a DuckDB replay on a random
    mini star schema — covers probe filters, the partitioned joins, the
    bucketed per-order/per-part folds, and exact integer money/share
    arithmetic."""
    import duckdb
    import pandas as pd

    from raygeo.ops.relational import (q6_band_revenue, q8_market_share,
                                       q9_profit, q20_excess_suppliers,
                                       q21_waiting_suppliers)
    from raygeo.util import read_parquet_clean

    paths = _tpch_tail_fixture(tmp_path)
    li = read_parquet_clean(paths["lineitem"])
    con = duckdb.connect()
    for n, p in paths.items():
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{p}')")

    import __ray_entry__ as entrymod
    sql = entrymod.oracle_sql()

    got = q6_band_revenue(li).to_pandas()
    exp = con.execute(sql["q6_band_revenue"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got = q9_profit(li, paths["orders"], paths["part"], paths["supplier"],
                    paths["nation"]).to_pandas().reset_index(drop=True)
    exp = con.execute(sql["q9_profit"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got = q8_market_share(li, paths["orders"], paths["customer"],
                          paths["supplier"], paths["nation"],
                          paths["region"], paths["part"]) \
        .to_pandas().reset_index(drop=True)
    exp = con.execute(sql["q8_market_share"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got.share_num_c4 <= got.share_den_c4).all()

    got = q21_waiting_suppliers(li, paths["supplier"],
                                paths["nation"]).to_pandas()
    exp = con.execute(sql["q21_waiting_suppliers"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.numwait.sum() > 0

    got = q20_excess_suppliers(li, paths["part"], paths["supplier"],
                               paths["nation"]).to_pandas()
    exp = con.execute(sql["q20_excess_suppliers"]).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_association_rules_matches_duckdb(ray_session, tmp_path):
    """Lift-ranked rules vs a DuckDB replay on a random basket table —
    covers the distinct fold, the pair self-join, the dimension-bounded
    support probe and the exact integer lift."""
    import duckdb
    import numpy as np
    import pandas as pd

    from raygeo.ops.relational import association_rules
    from raygeo.util import read_parquet_clean

    rng = np.random.Generator(np.random.PCG64(12))
    n = 4000
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, 600, n),
        "l_partkey": rng.integers(0, 80, n),
    })
    # plant a strongly-associated pair
    extra = pd.DataFrame({"l_orderkey": np.arange(600, 640).repeat(2),
                          "l_partkey": np.tile([900, 901], 40)})
    li = pd.concat([li, extra], ignore_index=True)
    p = str(tmp_path / "li.parquet")
    li.to_parquet(p)
    got = association_rules(read_parquet_clean(p), p, k=15).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{p}')")
    import __ray_entry__ as entrymod
    sql = entrymod.oracle_sql()["parts_rules"].replace("LIMIT 20",
                                                       "LIMIT 15")
    exp = con.execute(sql).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the planted pair dominates by lift
    assert (got.iloc[0].part_a, got.iloc[0].part_b) == (900, 901)


def test_roc_auc_matches_sklearn_formula(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import roc_auc

    rng = np.random.Generator(np.random.PCG64(41))
    n = 5000
    pos = rng.random(n) < 0.3
    # positives shifted up, coarse grid -> heavy ties incl. cross-class
    score = np.where(pos, rng.integers(5, 25, n), rng.integers(0, 20, n)) / 4.0
    df = pd.DataFrame({"event_type": np.where(pos, "purchase", "view"),
                       "value": score})
    got = roc_auc(rd.from_pandas(df).repartition(9)).to_pandas().iloc[0]

    # serial oracle: average ranks over the raw scores
    cents = np.rint(score * 100).astype(np.int64)
    order = np.argsort(cents, kind="mergesort")
    ranks = np.empty(n, dtype=np.float64)
    sorted_c = cents[order]
    i = 0
    while i < n:
        j = i
        while j < n and sorted_c[j] == sorted_c[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # avg of ranks i+1..j
        i = j
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    auc = (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert got.n_pos == n_pos and got.n_neg == n_neg
    assert got.auc_num / got.auc_den == pytest.approx(auc, abs=1e-12)
    assert got.auc_micro == int(np.floor(auc * 1e6 + 1e-9))
    assert 0.5 < auc < 1.0  # the shift makes it informative


def test_roc_auc_extremes(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import roc_auc

    # perfectly separated -> AUC exactly 1
    df = pd.DataFrame({
        "event_type": ["purchase"] * 10 + ["view"] * 15,
        "value": [10.0 + i for i in range(10)] + [float(i) / 2 for i in range(15)],
    })
    got = roc_auc(rd.from_pandas(df)).to_pandas().iloc[0]
    assert got.auc_num == got.auc_den and got.auc_micro == 10**6
    # all scores identical -> AUC exactly 1/2
    df2 = pd.DataFrame({"event_type": ["purchase"] * 7 + ["view"] * 9,
                        "value": [3.33] * 16})
    got2 = roc_auc(rd.from_pandas(df2)).to_pandas().iloc[0]
    assert got2.auc_num * 2 == got2.auc_den


def test_changepoint_planted_shift(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import changepoint

    # user 1: clean level shift at k=40 of 100; user 2: constant (stat 0
    # everywhere -> smallest k wins); user 3: single event -> excluded
    ts = pd.date_range("2024-01-01", periods=100, freq="1min")
    u1 = pd.DataFrame({"user_id": 1, "ts": ts,
                       "event_id": np.arange(100),
                       "value": [1.0] * 40 + [5.0] * 60})
    u2 = pd.DataFrame({"user_id": 2, "ts": ts[:20],
                       "event_id": np.arange(100, 120),
                       "value": [2.0] * 20})
    u3 = pd.DataFrame({"user_id": 3, "ts": ts[:1],
                       "event_id": [200], "value": [9.9]})
    df = pd.concat([u1, u2, u3], ignore_index=True)
    got = (changepoint(rd.from_pandas(df).repartition(7)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got.user_id.tolist() == [1, 2]
    assert got.loc[0, "k_star"] == 40
    # |n*S_k - k*S_n| at k=40: S_40=4000, S_100=34000 -> |400000-1360000|
    assert got.loc[0, "stat"] == abs(100 * 4000 - 40 * 34000)
    assert got.loc[1, "k_star"] == 1 and got.loc[1, "stat"] == 0


def test_mmd_poly_matches_bruteforce_pairs(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import mmd_poly

    rng = np.random.Generator(np.random.PCG64(7))
    d, sizes = 8, {0: 30, 1: 45, 2: 20}
    rows = []
    for lab, n in sizes.items():
        shift = lab * 0.5
        for _ in range(n):
            rows.append((lab, (rng.random(d) - 0.5 + shift).astype(np.float32)))
    df = pd.DataFrame({"label": [r[0] for r in rows],
                       "embedding": [r[1] for r in rows]})
    got = (mmd_poly(rd.from_pandas(df).repartition(6))
           .to_pandas().sort_values(["label_a", "label_b"])
           .reset_index(drop=True))

    q = {lab: np.floor(np.stack([r[1] for r in rows if r[0] == lab])
                       .astype(np.float64) * 1000 + 0.5).astype(object)
         for lab in sizes}
    exp = []
    for la in sorted(sizes):
        for lb in sorted(sizes):
            if la >= lb:
                continue
            na, nb = sizes[la], sizes[lb]
            def tr_pairs(xa, xb):  # brute force sum of <x,y>^2 in Python ints
                return sum(int(np.dot(x, y)) ** 2
                           for x in xa for y in xb)
            num = (nb * nb * tr_pairs(q[la], q[la])
                   + na * na * tr_pairs(q[lb], q[lb])
                   - 2 * na * nb * tr_pairs(q[la], q[lb]))
            exp.append((la, lb, na, nb, num // (na * na * nb * nb)))
    expdf = pd.DataFrame(exp, columns=["label_a", "label_b", "n_a", "n_b",
                                       "mmd2_q4"])
    pd.testing.assert_frame_equal(got, expdf, check_dtype=False)
    # same-distribution sanity: labels 0 vs 0-shifted-copy unavailable,
    # but monotonicity holds: farther label pairs have larger MMD
    g = got.set_index(["label_a", "label_b"]).mmd2_q4
    assert g[(0, 2)] > g[(0, 1)] and g[(0, 2)] > g[(1, 2)]


def test_mmr_matches_serial_greedy(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import mmr_select

    rng = np.random.Generator(np.random.PCG64(11))
    n, d, k = 150, 8, 5
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(300, 300 + n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [v for v in vecs]})
    got = mmr_select(rd.from_pandas(df).repartition(6),
                     k=k).to_pandas()

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    probe = q[0]  # min id row
    rel = q @ probe
    sel_idx: list[int] = []
    exp_ids, exp_scores = [], []
    excluded = {0}
    maxsim = np.zeros(n, dtype=np.int64)
    for r in range(k):
        if sel_idx:
            maxsim = np.maximum(maxsim, q @ q[sel_idx[-1]])
        score = 7 * rel - 3 * maxsim
        mask = np.array([i in excluded for i in range(n)])
        # sentinel must survive negation inside lexsort (int64.min wraps)
        s = np.where(mask, np.iinfo(np.int64).min // 4, score)
        order = np.lexsort((ids, -s))
        b = int(order[0])
        sel_idx.append(b)
        excluded.add(b)
        exp_ids.append(int(ids[b]))
        exp_scores.append(int(score[b]))
    assert got["vec_id"].tolist() == exp_ids
    assert got["score"].tolist() == exp_scores
    assert got["sel_round"].tolist() == list(range(k))


def _serial_kcore(edges, k):
    """Brute-force peel over a list of (a, b) undirected edges."""
    import collections
    alive = set()
    es = set()
    for a, b in edges:
        es.add((a, b)); es.add((b, a))
        alive.add(a); alive.add(b)
    while True:
        deg = collections.Counter(s for s, t in es)
        bad = {n for n in alive if deg.get(n, 0) < k}
        if not bad:
            return {n: deg[n] for n in alive}
        alive -= bad
        es = {(s, t) for s, t in es if s not in bad and t not in bad}


@pytest.mark.parametrize("cap", [2_000_000, 0])
def test_kcore_matches_serial_peel(ray_session, cap):
    import ray.data as rd

    from raygeo.ops.graph import kcore

    rng = np.random.Generator(np.random.PCG64(23))
    n_nodes, n_edges = 80, 160
    raw = {tuple(sorted(p)) for p in
           rng.integers(0, n_nodes, size=(n_edges, 2)) if p[0] != p[1]}
    edges = sorted(raw)
    df = pd.DataFrame({"part_a": [a for a, _ in edges],
                       "part_b": [b for _, b in edges]})
    got = (kcore(rd.from_pandas(df).repartition(5), k=3,
                 broadcast_cap=cap)
           .to_pandas().sort_values("node").reset_index(drop=True))
    exp = _serial_kcore(edges, 3)
    assert got["node"].tolist() == sorted(exp)
    assert got["core_deg"].tolist() == [exp[n] for n in sorted(exp)]


def test_kcore_empty_core(ray_session):
    import ray.data as rd

    from raygeo.ops.graph import kcore

    # a path graph has no 2-core
    df = pd.DataFrame({"part_a": [0, 1, 2, 3], "part_b": [1, 2, 3, 4]})
    got = kcore(rd.from_pandas(df).repartition(2), k=2).to_pandas()
    assert len(got) == 0


def test_nn_all_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import nn_all

    rng = np.random.Generator(np.random.PCG64(29))
    n, d = 120, 6
    # coarse grid values force exact-distance ties to exercise the
    # min-id tiebreak, including duplicate vectors (dist 0)
    vecs = (rng.integers(0, 3, size=(n, d)) / 2.0).astype(np.float32)
    ids = rng.permutation(np.arange(500, 500 + n)).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})
    got = (nn_all(rd.from_pandas(df).repartition(7), chunk_rows=17)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    exp = []
    for i in range(n):
        best = None
        for j in range(n):
            if ids[j] == ids[i]:
                continue
            dd = int(((q[i] - q[j]) ** 2).sum())
            key = (dd, int(ids[j]))
            if best is None or key < best:
                best = key
        exp.append((int(ids[i]), best[1], best[0]))
    exp = sorted(exp)
    assert got["vec_id"].tolist() == [e[0] for e in exp]
    assert got["nn_id"].tolist() == [e[1] for e in exp]
    assert got["dist"].tolist() == [e[2] for e in exp]


def test_hubness_matches_serial(ray_session):
    """k-occurrence histogram vs a serial replay on tie-heavy vectors
    (coarse grid -> massive exact-distance ties exercise the boundary-
    tie-inclusive candidate pool + (dist, id) lexsort)."""
    import ray.data as rd

    from raygeo.ops.ann import hubness

    rng = np.random.Generator(np.random.PCG64(31))
    n, d, k = 130, 5, 4
    vecs = (rng.integers(0, 3, size=(n, d)) / 2.0).astype(np.float32)
    ids = rng.permutation(np.arange(900, 900 + n)).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})
    got = (hubness(rd.from_pandas(df).repartition(7), k=k, chunk_rows=23)
           .to_pandas().sort_values("k_occ").reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    occ = {int(i): 0 for i in ids}
    for i in range(n):
        cand = []
        for j in range(n):
            if ids[j] == ids[i]:
                continue
            cand.append((int(((q[i] - q[j]) ** 2).sum()), int(ids[j])))
        cand.sort()
        for _, nid in cand[:k]:
            occ[nid] += 1
    exp = pd.Series(list(occ.values())).value_counts().sort_index()
    assert got["k_occ"].tolist() == exp.index.tolist()
    assert got["n_vecs"].tolist() == exp.values.tolist()
    assert got["n_vecs"].sum() == n


def test_kmv_overlap_matches_serial(ray_session):
    """KMV pair algebra vs a serial replay; small groups hit the exact
    (<k) path, large ones the estimator path."""
    import hashlib

    import ray.data as rd

    from raygeo.ops.dedup import kmv_overlap

    rng = np.random.Generator(np.random.PCG64(37))
    k = 16
    users = {
        "a": rng.integers(0, 40, 300),     # ~40 distinct > k
        "b": rng.integers(20, 60, 300),    # overlaps a
        "c": rng.integers(0, 8, 50),       # < k: exact path
    }
    df = pd.DataFrame({
        "event_type": np.concatenate(
            [[t] * len(v) for t, v in users.items()]),
        "user_id": np.concatenate(list(users.values())),
    })
    got = (kmv_overlap(rd.from_pandas(df).repartition(6),
                       "event_type", "user_id", k=k)
           .to_pandas().sort_values(["key_a", "key_b"])
           .reset_index(drop=True))

    def h(v):
        return int.from_bytes(
            hashlib.md5(str(v).encode()).digest()[:4], "big")

    sk = {t: sorted({h(v) for v in vs})[:k] for t, vs in users.items()}
    exp = []
    for ta in sorted(sk):
        for tb in sorted(sk):
            if ta >= tb:
                continue
            a, b = set(sk[ta]), set(sk[tb])
            merged = sorted(a | b)[:k]
            common = sum(1 for x in merged if x in a and x in b)
            if len(merged) < k:
                eu, ei = len(merged) * 1000, common * 1000
            else:
                eu = ((k - 1) * (1 << 32) * 1000) // merged[k - 1]
                ei = (common * eu) // k
            exp.append((ta, tb, eu, ei))
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_triplet_mine_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import triplet_mine

    rng = np.random.Generator(np.random.PCG64(61))
    n, d = 90, 5
    vecs = (rng.integers(0, 4, size=(n, d)) / 2.0).astype(np.float32)
    ids = np.arange(0, 10 * n, 10, dtype=np.int64)  # every 5th ≡ 0 mod 50
    labs = rng.integers(0, 3, n).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "label": labs,
                       "embedding": [v for v in vecs]})
    got = (triplet_mine(rd.from_pandas(df).repartition(6), anchor_mod=50)
           .to_pandas().reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    exp = []
    for i in range(n):
        if ids[i] % 50 != 0:
            continue
        pos = neg = None
        for j in range(n):
            dd = int(((q[i] - q[j]) ** 2).sum())
            key = (dd, int(ids[j]))
            if labs[j] == labs[i] and ids[j] != ids[i]:
                if pos is None or key < pos:
                    pos = key
            elif labs[j] != labs[i]:
                if neg is None or key < neg:
                    neg = key
        if pos and neg:
            exp.append((int(ids[i]), pos[1], neg[1], pos[0], neg[0],
                        neg[0] - pos[0]))
    exp = sorted(exp)
    assert list(map(tuple, got.itertuples(index=False))) == exp
    assert len(exp) > 3


def test_nn_label_accuracy_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import nn_label_accuracy

    rng = np.random.Generator(np.random.PCG64(67))
    n, d = 100, 4
    vecs = (rng.integers(0, 5, size=(n, d)) / 2.0).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 3 + 7
    labs = rng.integers(0, 4, n).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "label": labs,
                       "embedding": [v for v in vecs]})
    got = (nn_label_accuracy(rd.from_pandas(df).repartition(5),
                             chunk_rows=23)
           .to_pandas().reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    per = {}
    for i in range(n):
        best = None
        for j in range(n):
            if i == j:
                continue
            key = (int(((q[i] - q[j]) ** 2).sum()), int(ids[j]), j)
            if best is None or key[:2] < best[:2]:
                best = key
        nlab = labs[best[2]]
        s = per.setdefault(int(labs[i]), [0, 0])
        s[0] += 1
        s[1] += int(nlab == labs[i])
    exp = [(k, per[k][0], per[k][1], per[k][1] * 1_000_000 // per[k][0])
           for k in sorted(per)]
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_pmi_collocations_matches_serial(ray_session):
    import re as _re
    from collections import Counter

    import ray.data as rd

    from raygeo.ops.corpus import pmi_collocations

    rng = np.random.Generator(np.random.PCG64(83))
    vocab = [f"w{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
            for _ in range(60)]
    df = pd.DataFrame({"text": docs})
    got = (pmi_collocations(rd.from_pandas(df).repartition(5),
                            k=10, min_count=3)
           .to_pandas().reset_index(drop=True))

    tok = _re.compile(r"[0-9a-z_]+")
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in docs:
        ws = tok.findall(t.lower())
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nt = sum(uni.values())
    rows = [(w1, w2, n, n * nt * 1_000_000 // (uni[w1] * uni[w2]))
            for (w1, w2), n in bi.items() if n >= 3]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert list(map(tuple, got.itertuples(index=False))) == rows[:10]


def test_freq_of_freqs_matches_serial(ray_session):
    import re as _re
    from collections import Counter

    import ray.data as rd

    from raygeo.ops.corpus import freq_of_freqs

    rng = np.random.Generator(np.random.PCG64(89))
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(1, 15),
                                p=None))
            for _ in range(40)]
    df = pd.DataFrame({"text": docs})
    got = (freq_of_freqs(rd.from_pandas(df).repartition(5), max_r=5)
           .to_pandas().reset_index(drop=True))

    tok = _re.compile(r"[0-9a-z_]+")
    uni: Counter = Counter()
    for t in docs:
        uni.update(tok.findall(t.lower()))
    cc: Counter = Counter(v for v in uni.values() if v <= 5)
    exp = sorted(cc.items())
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_customer_order_gaps_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.relational import customer_order_gaps

    rng = np.random.Generator(np.random.PCG64(97))
    n = 400
    custs = rng.integers(1, 60, n)
    days = rng.integers(0, 365, n)
    df = pd.DataFrame({
        "o_custkey": custs.astype(np.int64),
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_orderdate": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(days, unit="D"),
    })
    got = (customer_order_gaps(rd.from_pandas(df).repartition(6))
           .to_pandas().sort_values("c_custkey").reset_index(drop=True))

    exp = []
    for c in sorted(set(custs)):
        sel = df[df["o_custkey"] == c].sort_values(
            ["o_orderdate", "o_orderkey"])
        d = (sel["o_orderdate"].astype("int64")
             // 86_400_000_000_000).to_numpy()
        if len(d) < 2:
            continue
        gaps = np.diff(d)
        exp.append((c, len(d), int(gaps.min()), int(gaps.max()),
                    int(gaps.sum())))
    exp = pd.DataFrame(exp, columns=["c_custkey", "n_orders", "min_gap",
                                     "max_gap", "sum_gap"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dim_quantiles_matches_serial(ray_session):
    import ray.data as rd

    from raygeo.ops.ann import dim_quantiles

    rng = np.random.Generator(np.random.PCG64(101))
    n, d = 257, 6  # odd n exercises both rank formulas
    vecs = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"embedding": [v for v in vecs]})
    got = (dim_quantiles(rd.from_pandas(df).repartition(5))
           .to_pandas().reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 100 + 0.5).astype(np.int64)
    exp = []
    for j in range(d):
        s = np.sort(q[:, j])
        r50 = (n + 1) // 2
        r90 = (9 * n + 9) // 10
        exp.append((j, n, int(s[r50 - 1]), int(s[r90 - 1])))
    assert list(map(tuple, got.itertuples(index=False))) == exp


def test_blocklist_filter_serial(ray_session):
    """Blocklist gate vs a serial replay; covers zero-token docs and the
    exact integer threshold boundary (n_hits * 20 == n_tokens is NOT
    blocked)."""
    import hashlib

    import ray.data as rd

    from raygeo.ops.corpus import blocklist_filter

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["aa bb cc dd " * 5,        # maybe-hits by md5 rule
                 "",                          # zero tokens
                 "zz yy xx " * 10,
                 "aa aa aa aa"],
    })
    got = (blocklist_filter(rd.from_pandas(docs).repartition(3), mod=3,
                            hit_per=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    import re as _re
    tok = _re.compile(r"[0-9a-z_]+")
    vocab = set()
    for t in docs["text"]:
        vocab.update(tok.findall(t.lower()))
    bl = {t for t in vocab
          if int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                            "big") % 3 == 0}
    exp = []
    for _, r in docs.iterrows():
        ts = tok.findall(r["text"].lower())
        nh = sum(1 for t in ts if t in bl)
        nu = len({t for t in ts if t in bl})
        exp.append((r["doc_id"], len(ts), nh, nu,
                    int(nh * 2 > len(ts))))
    exp = pd.DataFrame(exp, columns=["doc_id", "n_tokens", "n_hits",
                                     "n_uniq_hits", "blocked"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["n_tokens"] == 0).any()


def test_rp_distortion_serial(ray_session):
    """JL distortion histogram vs a serial replay (incl. duplicate
    vectors -> bucket -1 and the max_bucket cap)."""
    import hashlib

    import ray.data as rd

    from raygeo.ops.ann import rp_distortion

    rng = np.random.Generator(np.random.PCG64(7))
    n, d, k = 60, 16, 4
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs[20] = vecs[10]  # duplicate pair; id 110 is an anchor (mod 10)
    ids = np.arange(100, 100 + n).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v for v in vecs]})
    got = (rp_distortion(rd.from_pandas(df).repartition(5), k=k,
                         anchor_mod=10, max_bucket=15)
           .to_pandas().sort_values("bucket").reset_index(drop=True))

    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    P = np.empty((d, k), np.int64)
    for i in range(d):
        for j in range(k):
            h = int.from_bytes(
                hashlib.md5(f"{i}_{j}".encode()).digest()[:4], "big")
            P[i, j] = 1 if h % 2 == 0 else -1
    y = q @ P
    from collections import Counter
    cnt: Counter = Counter()
    for a in range(n):
        if ids[a] % 10 != 0:
            continue
        for b in range(n):
            if ids[b] == ids[a]:
                continue
            d0 = int(((q[a] - q[b]) ** 2).sum())
            dp = int(((y[a] - y[b]) ** 2).sum())
            cnt[-1 if d0 == 0 else min((dp * 2 * k) // (d0 * k), 15)] += 1
    exp = pd.DataFrame(sorted(cnt.items()), columns=["bucket", "n_pairs"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["bucket"] == -1).any()


def test_countmin_matches_serial(ray_session):
    """CM estimates vs a serial sketch replay on a skewed key stream;
    pins the one-sided-error invariant (est >= true for every probe)."""
    import hashlib

    import ray.data as rd

    from raygeo.ops.dedup import countmin_estimates

    rng = np.random.Generator(np.random.PCG64(13))
    keys = rng.integers(0, 40, 5000) ** 2  # skew + collisions
    df = pd.DataFrame({"user_id": keys.astype(np.int64)})
    got = (countmin_estimates(rd.from_pandas(df).repartition(7),
                              depth=3, width=16, probe_mod=4)
           .to_pandas().sort_values("key").reset_index(drop=True))

    G = np.zeros((3, 16), np.int64)
    for k in keys:
        for r in range(3):
            c = int.from_bytes(
                hashlib.md5(f"{r}_{k}".encode()).digest()[:4], "big") % 16
            G[r, c] += 1
    exp = []
    vc = pd.Series(keys).value_counts()
    for k in sorted(vc.index):
        if k % 4 != 0:
            continue
        est = min(G[r, int.from_bytes(
            hashlib.md5(f"{r}_{k}".encode()).digest()[:4], "big") % 16]
            for r in range(3))
        exp.append((int(k), int(vc[k]), int(est), int(est - vc[k])))
    exp = pd.DataFrame(exp, columns=["key", "true_cnt", "cm_est",
                                     "overcount"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["overcount"] >= 0).all()
    assert (got["overcount"] > 0).any()  # width 16 forces collisions


def test_rolling_frame_sum_serial(ray_session):
    """ROWS-frame rolling sum vs a serial replay; exercises partitions
    shorter than the frame and duplicate order keys."""
    import ray.data as rd

    from raygeo.ops.relational import rolling_frame_sum

    rng = np.random.Generator(np.random.PCG64(3))
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "o1": rng.integers(0, 10, n).astype(np.int64),
        "o2": np.arange(n, dtype=np.int64),   # unique tiebreak
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    got = (rolling_frame_sum(rd.from_pandas(df).repartition(6), "k",
                             ["o1", "o2"], "v", preceding=2)
           .to_pandas().sort_values(["k", "o1", "o2"])
           .reset_index(drop=True))
    exp = df.sort_values(["k", "o1", "o2"]).reset_index(drop=True)
    fs = []
    hist: dict = {}
    for _, r in exp.iterrows():
        q = hist.setdefault(r["k"], [])
        q.append(r["v"])
        fs.append(int(sum(q[-3:])))
    exp["frame_sum"] = fs
    pd.testing.assert_frame_equal(
        got[["k", "o1", "o2", "v", "frame_sum"]],
        exp[["k", "o1", "o2", "v", "frame_sum"]], check_dtype=False)


def test_bpe_train_serial(ray_session):
    """BPE merge learning vs a serial replay; pins the full-symbol
    boundary rule ('ax y' must NOT merge via pair (x, y)) and the
    tie -> lexicographic-smallest rule."""
    import ray.data as rd

    from raygeo.ops.corpus import bpe_train

    docs = pd.DataFrame({"text": [
        "banana banana bandana",
        "ax y ax y ax y",          # 'x y' never merges across 'ax|y'
        "aa aa aa bb bb",
    ] * 3})
    got = (bpe_train(rd.from_pandas(docs).repartition(3), n_merges=3)
           .to_pandas())

    # serial replay
    import re as _re
    from collections import Counter
    tok = _re.compile(r"[0-9a-z_]+")
    wc: Counter = Counter()
    for t in docs["text"]:
        wc.update(tok.findall(t.lower()))
    spaced = {" " + " ".join(w) + " ": n for w, n in wc.items()}
    exp = []
    for rnd in range(3):
        pairs: Counter = Counter()
        for s, n in spaced.items():
            syms = s.strip().split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        mx = max(pairs.values())
        l, r = sorted(p for p, n in pairs.items() if n == mx)[0]
        exp.append((rnd, l, r, mx))
        spaced = {s.replace(f" {l} {r} ", f" {l}{r} "): n
                  for s, n in spaced.items()}
    exp = pd.DataFrame(exp, columns=["round", "lft", "rgt", "pair_count"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the boundary rule: no learned merge glues across 'ax|y'
    assert not (((got["lft"] == "x") & (got["rgt"] == "y")).any()
                and wc["ax"] > 0)


def test_abc_analysis_serial(ray_session):
    """ABC classes vs a serial replay; ties at class boundaries broken
    by part id, class thresholds exact cross-multiplied."""
    import ray.data as rd

    from raygeo.ops.relational import abc_analysis

    rng = np.random.Generator(np.random.PCG64(21))
    n = 4000
    df = pd.DataFrame({
        "l_partkey": rng.integers(0, 400, n).astype(np.int64),
        "l_extendedprice": np.round(
            rng.uniform(1, 5000, n) ** 2 / 1000, 2),  # skewed revenue
    })
    got = (abc_analysis(rd.from_pandas(df).repartition(7))
           .to_pandas().reset_index(drop=True))

    cents = np.rint(df["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    rev = pd.DataFrame({"part": df["l_partkey"], "rev": cents}) \
        .groupby("part")["rev"].sum().reset_index()
    rev = rev.sort_values(["rev", "part"],
                          ascending=[False, True]).reset_index(drop=True)
    total = int(rev["rev"].sum())
    cum = rev["rev"].to_numpy(np.int64).cumsum()
    cls = np.where(cum * 5 <= 4 * total, "A",
                   np.where(cum * 20 <= 19 * total, "B", "C"))
    exp = pd.DataFrame({"abc_class": cls, "rev": rev["rev"]}) \
        .groupby("abc_class").agg(n_parts=("rev", "size"),
                                  revenue_c=("rev", "sum")).reset_index()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert set(got["abc_class"]) == {"A", "B", "C"}


def test_gini_coefficient_serial(ray_session):
    """Gini ppm vs a serial rank replay; duplicate revenue values force
    cross-bucket-safe tie ranking."""
    import ray.data as rd

    from raygeo.ops.relational import gini_coefficient

    rng = np.random.Generator(np.random.PCG64(27))
    n = 3000
    df = pd.DataFrame({
        "l_suppkey": rng.integers(0, 200, n).astype(np.int64),
        "l_extendedprice": np.round(rng.uniform(1, 1000, n), 2),
    })
    got = gini_coefficient(rd.from_pandas(df).repartition(6)) \
        .to_pandas().iloc[0]

    cents = np.rint(df["l_extendedprice"].to_numpy() * 100) \
        .astype(np.int64)
    rev = pd.DataFrame({"key": df["l_suppkey"], "rev": cents}) \
        .groupby("key")["rev"].sum().reset_index() \
        .sort_values(["rev", "key"]).reset_index(drop=True)
    x = rev["rev"].to_numpy(np.int64)
    nk = len(x)
    s0 = int(x.sum())
    s1 = int((np.arange(1, nk + 1, dtype=np.int64) * x).sum())
    gini = (2 * s1 - (nk + 1) * s0) * 1_000_000 // (nk * s0)
    assert got["n_keys"] == nk
    assert got["revenue_c"] == s0
    assert got["gini_ppm"] == gini
    assert 0 <= got["gini_ppm"] < 1_000_000


def test_lpa_communities_serial(ray_session):
    """Synchronous frequency-vote LPA vs a serial replay: two dense
    cliques joined by one bridge edge keep distinct labels under
    bounded rounds, and ties break to the smaller label."""
    import ray.data as rd

    from raygeo.ops.graph import lpa_communities

    edges = []
    for grp in (range(0, 5), range(10, 15)):
        g = list(grp)
        edges += [(a, b) for i, a in enumerate(g) for b in g[i + 1:]]
    edges.append((4, 10))  # bridge
    df = pd.DataFrame(edges, columns=["part_a", "part_b"])
    got = lpa_communities(rd.from_pandas(df).repartition(3),
                          rounds=3).to_pandas()

    # serial synchronous replay
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            best = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == best)
        lab = new
    exp = pd.DataFrame(sorted(lab.items()), columns=["node", "label"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.set_index("node")["label"][0] != \
        got.set_index("node")["label"][14]  # cliques stay distinct
