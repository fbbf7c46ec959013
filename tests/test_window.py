"""Window-function analogs (raygeo/ops/window.py): LAG gap stats, running
cumulative crossing, dense gap-fill, Q17 decorrelation, stratified sample —
each against a serial pandas/numpy oracle, partition-invariant."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from raygeo.ops.window import (
    cumulative_first_crossing,
    gapfill_hourly,
    stratified_sample,
    user_gap_stats,
)


def _events(n=4000, users=37, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    ts = (np.datetime64("2024-03-01T00:00:00", "us")
          + rng.integers(0, 14 * 86400, size=n) * np.timedelta64(1, "s"))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, size=n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "buy"], size=n),
        "ts": ts,
        "value": rng.integers(0, 10_000, size=n) / 100.0,
    })


def test_user_gap_stats_matches_serial(ray_session):
    import ray.data as rd

    df = _events()
    out = user_gap_stats(rd.from_pandas(df).repartition(11),
                         gap_threshold_s=7200).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)

    rows = []
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        t = g.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(t) // 1_000_000 if len(t) > 1 else np.array([], np.int64)
        rows.append((u, len(g), int(gaps.max()) if len(gaps) else 0,
                     int((gaps > 7200).sum())))
    exp = pd.DataFrame(rows, columns=["user_id", "n_events", "max_gap_s",
                                      "n_gaps_gt"])
    pd.testing.assert_frame_equal(
        out.astype({"n_events": np.int64}), exp.astype({"n_events": np.int64}),
        check_dtype=False)


def test_cumulative_crossing_first_order(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(9))
    n = 3000
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": rng.integers(0, 120, size=n).astype(np.int64),
        "o_orderdate": (np.datetime64("2023-01-01")
                        + rng.integers(0, 700, size=n).astype("timedelta64[D]")),
        "o_totalprice": rng.integers(100, 400_000, size=n) / 100.0,
    })
    thr = 1_500_000
    out = cumulative_first_crossing(
        rd.from_pandas(df).repartition(9), threshold_cents=thr).to_pandas()
    out = out.sort_values("o_custkey").reset_index(drop=True)

    rows = []
    for c, g in df.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        cum = np.cumsum(np.rint(g.o_totalprice.to_numpy() * 100).astype(np.int64))
        hit = np.nonzero(cum >= thr)[0]
        if len(hit):
            i = hit[0]
            rows.append((c, pd.Timestamp(g.o_orderdate.iloc[i]).strftime("%Y-%m-%d"),
                         int(cum[i]), int(i + 1)))
    exp = pd.DataFrame(rows, columns=["o_custkey", "cross_date", "cum_cents",
                                      "n_orders_to_cross"])
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_gapfill_dense_axis_and_zeros(ray_session):
    import ray.data as rd

    df = _events(n=500, seed=7)
    # force a hole: drop every event in one specific hour for one type
    hour = df.ts.astype("datetime64[ns]").astype("int64") // (3600 * 10**9)
    some = df[df.event_type == "view"]
    if len(some):
        kill = hour[some.index[0]]
        df = df[~((df.event_type == "view") & (hour == kill))]
    out = gapfill_hourly(rd.from_pandas(df).repartition(7)).to_pandas()

    for et, g in out.groupby("event_type"):
        g = g.sort_values("hour_bucket")
        b = g.hour_bucket.to_numpy()
        assert np.array_equal(b, np.arange(b[0], b[-1] + 1))  # dense
        sub = df[df.event_type == et]
        h = (sub.ts.astype("datetime64[ns]").astype("int64")
             // (3600 * 10**9)).value_counts()
        exp_n = np.array([int(h.get(x, 0)) for x in b])
        assert np.array_equal(g.n_events.to_numpy(), exp_n)
        cents = np.rint(sub.value.to_numpy() * 100).astype(np.int64)
        exp_c = pd.Series(cents).groupby(
            (sub.ts.astype("datetime64[ns]").astype("int64")
             // (3600 * 10**9)).to_numpy()).sum()
        got_c = dict(zip(b, g.value_cents.to_numpy()))
        for hb, v in exp_c.items():
            assert got_c[hb] == v


def test_stratified_sample_partition_invariant(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(3))
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], size=900),
        "doc_id": [f"doc-{i:05d}" for i in range(900)],
    })
    a = stratified_sample(rd.from_pandas(df).repartition(3),
                          "lang", "doc_id", k=7).to_pandas()
    b = stratified_sample(rd.from_pandas(df.sample(frac=1, random_state=0))
                          .repartition(17), "lang", "doc_id", k=7).to_pandas()
    ka = a.sort_values(["lang", "rnk"]).reset_index(drop=True)
    kb = b.sort_values(["lang", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(ka, kb)
    assert (ka.groupby("lang").size() == 7).all()
    # rank-1 row per lang is the global min-md5 doc of that lang
    for lang, g in df.groupby("lang"):
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
             for s in g.doc_id), dtype=np.int64, count=len(g))
        best = g.doc_id.to_numpy()[np.lexsort((g.doc_id.to_numpy(), h))][0]
        assert ka[(ka.lang == lang) & (ka.rnk == 1)].doc_id.iloc[0] == best


def test_period_overlap_categories(ray_session):
    import ray.data as rd

    from raygeo.ops.window import user_period_overlap

    df = _events(n=2500, users=60, seed=13)
    a = ("2024-03-02T00:00:00", "2024-03-04T00:00:00")
    b = ("2024-03-04T00:00:00", "2024-03-06T00:00:00")
    out = user_period_overlap(rd.from_pandas(df).repartition(9), a=a,
                              b=b).to_pandas()
    got = dict(zip(out.category, out.n_users))

    ts = df.ts.to_numpy().astype("datetime64[us]")
    in_a = pd.Series(
        (ts >= np.datetime64(a[0])) & (ts < np.datetime64(a[1]))
    ).groupby(df.user_id.to_numpy()).max()
    in_b = pd.Series(
        (ts >= np.datetime64(b[0])) & (ts < np.datetime64(b[1]))
    ).groupby(df.user_id.to_numpy()).max()
    exp = {"both": int((in_a & in_b).sum()),
           "only_a": int((in_a & ~in_b).sum()),
           "only_b": int((~in_a & in_b).sum())}
    exp = {k: v for k, v in exp.items() if v > 0}
    assert got == exp


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    from raygeo.ops.corpus import pack_sequences

    rng = np.random.Generator(np.random.PCG64(17))
    docs = pd.DataFrame({
        "doc_id": [f"d-{i:04d}" for i in range(300)],
        "text": [" ".join(["w"] * int(t))
                 for t in rng.integers(1, 400, size=300)],
    })
    cap = 256
    out = pack_sequences(rd.from_pandas(docs).repartition(7),
                         capacity=cap, n_shards=3).to_pandas()
    assert len(out) == 300
    for shard, g in out.groupby("shard"):
        g = g.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
        # bins are consecutive starting at 0 and next-fit-consistent
        assert g.bin_no.iloc[0] == 0
        fill, b = 0, 0
        for _, row in g.iterrows():
            t = int(row.n_tokens)
            if fill == 0 or fill + t > cap:
                if fill != 0:
                    b += 1
                fill = t
            else:
                fill += t
            assert row.bin_no == b
        # every bin except possibly oversize-single-doc bins fits capacity
        sums = g.groupby("bin_no").n_tokens.agg(["sum", "size"])
        over = sums[sums["sum"] > cap]
        assert (over["size"] == 1).all()
    # partition invariance
    out2 = pack_sequences(
        rd.from_pandas(docs.sample(frac=1, random_state=2)).repartition(13),
        capacity=cap, n_shards=3).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b2 = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b2)


def test_late_data_watermark_matches_serial(ray_session):
    """Bucketed distributed prefix-max == serial replay in md5-arrival
    order; drops must be non-trivial (both classes present) and invariant
    to input partitioning."""
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import late_data_stats

    rng = np.random.Generator(np.random.PCG64(9))
    n = 30_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (np.datetime64("2024-01-01")
               + rng.integers(0, 30 * 86400, n).astype("timedelta64[s]")),
        "value": rng.uniform(0, 100, n).round(2),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    lateness = 14 * 86400

    got = (late_data_stats(rd.from_pandas(df).repartition(11),
                           lateness_s=lateness, n_buckets=64)
           .to_pandas().sort_values("event_type").reset_index(drop=True))

    # serial oracle: replay in (md5(event_id), event_id) order
    h = np.array([int.from_bytes(
        hashlib.md5(str(int(e)).encode()).digest()[:8], "big")
        for e in df.event_id], dtype=np.uint64)
    order = np.lexsort((df.event_id.to_numpy(), h))
    ts = df.ts.to_numpy().astype("datetime64[us]").astype(np.int64)[order]
    wm = np.maximum.accumulate(ts)
    dropped = (wm - ts) > lateness * 1_000_000
    cents = np.rint(df.value.to_numpy() * 100).astype(np.int64)[order]
    et = df.event_type.to_numpy()[order]
    exp = (pd.DataFrame({"event_type": et, "n_events": 1,
                         "n_dropped": dropped.astype(np.int64),
                         "accepted_cents": np.where(dropped, 0, cents)})
           .groupby("event_type").sum().reset_index())
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["n_dropped"].tolist() == exp["n_dropped"].tolist()
    assert got["accepted_cents"].tolist() == exp["accepted_cents"].tolist()
    assert 0 < got["n_dropped"].sum() < n  # both classes exercised


def test_ohlc_partial_merge_partition_invariant(ray_session):
    """Open/close fold correctness across batch boundaries: shuffled input
    partitions must give identical bars to a serial pandas replay."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import ohlc_bars

    rng = np.random.Generator(np.random.PCG64(4))
    n = 50_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (np.datetime64("2024-03-01")
               + rng.integers(0, 5 * 86400, n).astype("timedelta64[s]")),
        "event_type": rng.choice(["x", "y"], n),
        "value": rng.uniform(0, 50, n).round(2),
    })
    # shuffle row order so batch boundaries scatter each bucket's events
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)

    got = (ohlc_bars(rd.from_pandas(df).repartition(9), freq_s=86400)
           .to_pandas().sort_values(["event_type", "bucket"])
           .reset_index(drop=True))

    d = df.assign(
        cents=np.rint(df.value.to_numpy() * 100).astype(np.int64),
        ts_us=df.ts.to_numpy().astype("datetime64[us]").astype(np.int64))
    d["bucket"] = d.ts_us // (86400 * 1_000_000)
    d = d.sort_values(["ts_us", "event_id"], kind="mergesort")
    exp = d.groupby(["event_type", "bucket"]).agg(
        open_c=("cents", "first"), close_c=("cents", "last"),
        high_c=("cents", "max"), low_c=("cents", "min"),
        n_events=("cents", "size")).reset_index().sort_values(
        ["event_type", "bucket"]).reset_index(drop=True)
    for c in ["open_c", "high_c", "low_c", "close_c", "n_events"]:
        assert got[c].tolist() == exp[c].tolist(), c


def test_event_transitions_matches_serial(ray_session):
    """Bigram transition counts == serial per-user replay, robust to
    partitioning and single-event users."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import event_transitions

    rng = np.random.Generator(np.random.PCG64(21))
    n = 20_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 30, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": (np.datetime64("2024-01-01")
               + rng.integers(0, 86400, n).astype("timedelta64[s]")),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    lonely = pd.DataFrame({"user_id": [999], "event_id": [n],
                           "ts": [np.datetime64("2024-01-01")],
                           "event_type": ["a"]})
    df = pd.concat([df, lonely], ignore_index=True)
    got = (event_transitions(rd.from_pandas(df).repartition(7))
           .to_pandas().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))

    d = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    prev = d.groupby("user_id")["event_type"].shift(1)
    pairs = pd.DataFrame({"from_type": prev, "to_type": d["event_type"]}
                         ).dropna()
    exp = (pairs.groupby(["from_type", "to_type"]).size().rename("n")
           .reset_index().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["n"].sum() == len(df) - df["user_id"].nunique()


def test_windowed_funnel_budget_enforced(ray_session):
    """The window budget must cut conversions the unwindowed funnel would
    count: user A converts in-window, user B's click is past the budget,
    user C's purchase precedes the click (order enforced)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import windowed_funnel

    d0 = np.datetime64("2024-01-01")
    h = np.timedelta64(3600, "s")
    rows = [
        (1, d0, "view"), (1, d0 + 2 * h, "click"), (1, d0 + 3 * h, "purchase"),
        (2, d0, "view"), (2, d0 + 300 * h, "click"),  # > 7-day budget
        (3, d0, "view"), (3, d0 + 1 * h, "purchase"), (3, d0 + 2 * h, "click"),
    ]
    df = pd.DataFrame({"user_id": [r[0] for r in rows],
                       "ts": [r[1] for r in rows],
                       "event_type": [r[2] for r in rows],
                       "event_id": np.arange(len(rows), dtype=np.int64)})
    got = (windowed_funnel(rd.from_pandas(df).repartition(3),
                           ("view", "click", "purchase"),
                           window_s=7 * 86400)
           .to_pandas().sort_values("stage").reset_index(drop=True))
    # stage1: all 3; stage2: users 1,3 (user 2 late); stage3: user 1 only
    # (user 3's purchase precedes its click)
    assert got["n_users"].tolist() == [3, 2, 1]


def test_dedup_within_gap_lag_semantics(ray_session):
    """Gap dedup vs a pandas LAG oracle, incl. same-ts duplicates."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import dedup_within_gap

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(["a", "b"], n),
        "ts": pd.to_datetime(rng.integers(0, 400, n), unit="s"),
        "event_id": np.arange(n, dtype=np.int64),
    })
    got = set(dedup_within_gap(rd.from_pandas(df).repartition(9),
                               ["user_id", "event_type"], "ts", "event_id",
                               gap_us=5_000_000)
              .to_pandas()["event_id"])
    s = df.sort_values(["user_id", "event_type", "ts", "event_id"])
    prev = s.groupby(["user_id", "event_type"])["ts"].shift()
    gap = (s["ts"] - prev).dt.total_seconds() * 1e6
    exp = set(s.loc[gap.isna() | (gap > 5_000_000), "event_id"])
    assert got == exp


def test_ewma_last_recurrence_and_buckets(ray_session):
    """Integer EWMA: matches the serial recurrence; bucketing/partitioning
    cannot change it; negative values are refused (the floor-vs-truncate
    division boundary)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from raygeo.ops.window import ewma_last

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.randint(0, 9, n),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
        "event_id": np.arange(n),
        "value": np.round(rng.uniform(0, 50, n), 2),
    })
    got = ewma_last(rd.from_pandas(df), "user_id", "ts", "event_id",
                    "value").to_pandas().sort_values(
        "user_id").reset_index(drop=True)

    exp_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        vc = np.rint(g.value.to_numpy() * 100).astype(np.int64)
        s = int(vc[0]) * 10**6
        for v in vc[1:]:
            s = (int(v) * 10**6 + 3 * s) // 4
        exp_rows.append((uid, s, len(g)))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "ewma_q6", "n_events"]
                       ).sort_values("user_id").reset_index(drop=True)
    assert got.astype("int64").equals(exp.astype("int64"))

    # partitioning invariance
    got8 = ewma_last(rd.from_pandas(df).repartition(8), "user_id", "ts",
                     "event_id", "value").to_pandas().sort_values(
        "user_id").reset_index(drop=True)
    assert got8.astype("int64").equals(exp.astype("int64"))

    bad = df.copy()
    bad.loc[0, "value"] = -1.0
    with pytest.raises(Exception, match="non-negative"):
        ewma_last(rd.from_pandas(bad), "user_id", "ts", "event_id",
                  "value").materialize()


def test_pattern_counts_matches_serial(ray_session):
    """MATCH_RECOGNIZE analog vs a serial per-user replay on random event
    streams — non-overlapping findall semantics, tie-broken ordering."""
    import re

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import pattern_counts

    rng = np.random.Generator(np.random.PCG64(31))
    n = 5000
    types = np.array(["view", "click", "purchase", "error", "signup"])
    ev = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 40, n),
        "event_type": types[rng.integers(0, 5, n)],
        # duplicate timestamps force the (ts, event_id) tie-break
        "ts": pd.to_datetime(rng.integers(0, 2000, n), unit="s"),
    })
    got = (pattern_counts(rd.from_pandas(ev).repartition(7))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp_rows = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        seq = "".join(x[0] for x in g.event_type)
        exp_rows.append((uid, len(seq),
                         len(re.findall("vc*p", seq)),
                         len(re.findall("vcp", seq))))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "n_events",
                                          "n_funnel", "n_exact"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.n_funnel.sum() >= got.n_exact.sum() > 0


def test_scd2_intervals_matches_serial(ray_session):
    """Time-weighted state integral vs a serial LEAD replay, with
    duplicate timestamps (tie-break by event_id) and single-event keys
    (zero closed span)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import scd2_intervals

    rng = np.random.Generator(np.random.PCG64(9))
    n = 3000
    ev = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 30, n),
        "value": np.round(rng.uniform(0, 50, n), 2),
        "ts": pd.to_datetime(rng.integers(0, 5000, n), unit="s"),
    })
    # a single-event key
    ev.loc[0, "user_id"] = 999
    ev = ev[(ev.user_id != 999) | (ev.index == 0)]
    got = (scd2_intervals(rd.from_pandas(ev).repartition(6))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp_rows = []
    for uid, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
        v = np.rint(g.value.to_numpy() * 100).astype(np.int64)
        gaps = np.diff(ts)
        exp_rows.append((uid, len(g), int(gaps.sum()),
                         int((v[:-1] * gaps).sum()) if len(g) > 1 else 0))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "n_versions",
                                          "closed_usec", "value_usec"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got.loc[got.user_id == 999, "closed_usec"] == 0).all()


def test_last_touch_attribution_edges(ray_session):
    """Window boundary inclusive, ts-tie -> larger event_id, users with
    no touches credit 'none'; exact cent arithmetic."""
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.window import last_touch_attribution

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600_000_000, "us")
    rows = [
        # user 1: click at t0, view at t0 (tie, view has larger id),
        # purchase at t0+1h -> view wins the tie
        (10, 1, base, "click", 0.0),
        (11, 1, base, "view", 0.0),
        (12, 1, base + h, "purchase", 10.004),   # cents round half-even? 1000
        # user 2: touch exactly 24h before purchase -> inside window
        (20, 2, base, "click", 0.0),
        (21, 2, base + 24 * h, "purchase", 5.0),
        # user 3: touch 24h+1us before -> outside, credits none
        (30, 3, base - np.timedelta64(1, "us"), "view", 0.0),
        (31, 3, base + 24 * h, "purchase", 2.5),
        # user 4: no touches at all
        (40, 4, base, "purchase", 1.0),
        # user 5: touch AFTER purchase only -> none
        (50, 5, base + 2 * h, "click", 0.0),
        (51, 5, base + h, "purchase", 3.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    got = last_touch_attribution(rd.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("channel")
    assert got.loc["view", "n_conv"] == 1          # user 1 tie-break
    assert got.loc["click", "n_conv"] == 1         # user 2 boundary
    assert got.loc["none", "n_conv"] == 3          # users 3, 4, 5
    assert got.loc["view", "revenue_cents"] == int(
        np.rint(10.004 * 100))
    assert got.loc["click", "revenue_cents"] == 500
    assert got.loc["none", "revenue_cents"] == 250 + 100 + 300


def test_sliding_distinct_users_serial(ray_session):
    """Trailing 3h distinct-user windows vs a serial replay; covers
    inactive-hour gaps (windows only for active hours) and users
    spanning several hours."""
    import ray.data as rd

    from raygeo.ops.window import sliding_distinct_users

    rng = np.random.Generator(np.random.PCG64(5))
    n = 2000
    hours = rng.choice([0, 1, 2, 5, 6, 9], n)  # gaps at 3-4, 7-8
    users = rng.integers(0, 50, n)
    ts = pd.to_datetime(hours * 3600 + rng.integers(0, 3600, n), unit="s")
    df = pd.DataFrame({"ts": ts, "user_id": users.astype(np.int64)})
    got = (sliding_distinct_users(rd.from_pandas(df).repartition(5))
           .to_pandas().reset_index(drop=True))
    uh = set(zip(users.tolist(), hours.tolist()))
    active = sorted({h for _, h in uh})
    exp = []
    for w in active:
        s = {u for u, h in uh if w - 2 <= h <= w}
        exp.append((w, len(s)))
    exp = pd.DataFrame(exp, columns=["hour_bucket", "n_users"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_heavy_changers_serial(ray_session):
    """PoP top changers vs a serial replay; covers one-half-only users
    and |delta| ties broken by smaller user_id at the k boundary."""
    import ray.data as rd

    from raygeo.ops.window import heavy_changers

    rng = np.random.Generator(np.random.PCG64(9))
    rows = []
    for u in range(30):
        n_a, n_b = int(rng.integers(0, 20)), int(rng.integers(0, 20))
        for _ in range(n_a):
            rows.append((u, int(rng.integers(0, 50))))       # hours 0-49
        for _ in range(n_b):
            rows.append((u, int(rng.integers(51, 100))))     # hours 51-99
    df = pd.DataFrame(rows, columns=["user_id", "hh"])
    df["ts"] = pd.to_datetime(df["hh"] * 3600, unit="s")
    df["user_id"] = df["user_id"].astype(np.int64)
    got = (heavy_changers(rd.from_pandas(df[["ts", "user_id"]])
                          .repartition(6), k=8).to_pandas())

    lo, hi = df["hh"].min(), df["hh"].max()
    mid = lo + (hi - lo) // 2
    exp = []
    for u, grp in df.groupby("user_id"):
        a = int((grp["hh"] <= mid).sum())
        b = int((grp["hh"] > mid).sum())
        if a or b:
            exp.append((u, a, b, b - a))
    exp.sort(key=lambda r: (-abs(r[3]), r[0]))
    exp = pd.DataFrame(exp[:8], columns=["user_id", "cnt_a", "cnt_b",
                                         "delta"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_heavy_changers_empty_events(ray_session):
    """ADVICE r4 (low): an empty events dataset used to crash on the
    None min/max fold; it must return an empty 4-column table."""
    import ray.data as rd

    from raygeo.ops.window import heavy_changers

    df = pd.DataFrame({"ts": pd.to_datetime([], unit="s"),
                       "user_id": pd.array([], dtype=np.int64)})
    got = heavy_changers(rd.from_pandas(df), k=5).to_pandas()
    assert list(got.columns) == ["user_id", "cnt_a", "cnt_b", "delta"]
    assert len(got) == 0


def test_downtime_gaps_matches_serial(ray_session):
    """Global gap islands vs a serial sorted-diff replay, with gaps that
    span empty hour buckets (the cross-bucket stitch path)."""
    import ray.data as rd

    from raygeo.ops.window import downtime_gaps

    rng = np.random.Generator(np.random.PCG64(13))
    # clustered bursts with multi-hour silences between them
    ts = []
    base = 0
    for _ in range(12):
        n = int(rng.integers(3, 30))
        ts.extend(base + np.sort(rng.integers(0, 3000, n)))
        base += int(rng.integers(1800, 6 * 3600))  # silence, maybe > 30min
    ts = np.asarray(sorted(ts), np.int64)
    df = pd.DataFrame({"ts": pd.to_datetime(ts, unit="s")})
    got = downtime_gaps(rd.from_pandas(df).repartition(5)).to_pandas()

    t_us = ts * 1_000_000
    gaps = np.diff(t_us)
    over = gaps > 1_800_000_000
    assert int(got["n_gaps"][0]) == int(over.sum())
    assert int(got["max_gap_us"][0]) == int(gaps.max())
    assert int(got["downtime_us"][0]) == int(gaps[over].sum())
    assert int(got["n_gaps"][0]) > 0  # silences actually exercised
