"""Sequence / window-function analogs the reference's streaming shapes imply
(LAG deltas, running cumulative sums, dense gap-filled series, the
correlated-subquery avg filter) plus stratified sampling.

All monetary math is integer cents (per-row ROUND then SUM) so results are
bit-exact and summation-order independent; date/ts math is integer epoch
buckets. Every op keeps the shuffle bounded: raw rows shuffle at most once
(keyed by the partition column the window needs), partials everywhere else.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import table_from_pandas


def user_gap_stats(events_ds, gap_threshold_s: int = 3600,
                   user_col: str = "user_id"):
    """Per-user LAG(ts) gap statistics: max inter-event gap and the number
    of gaps exceeding ``gap_threshold_s``.

    The ``ts - LAG(ts) OVER (PARTITION BY user ORDER BY ts, id)`` analog.
    Consecutive-event deltas need each user's full event order, so the one
    unavoidable exchange is a keyed shuffle of the pruned (user, ts, id)
    columns; the per-group kernel is a vectorized sort + ``np.diff`` (no
    Python over rows). Ties on ts break by event_id so the delta sequence
    is deterministic under any shuffle order. Output is one row per user —
    bounded by user cardinality, not events.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(ts) > 1:
            gaps = np.diff(ts) // 1_000_000  # whole seconds, floor
            max_gap = int(gaps.max())
            n_big = int((gaps > gap_threshold_s).sum())
        else:
            max_gap, n_big = 0, 0
        return pd.DataFrame({
            user_col: [g[user_col].iloc[0]],
            "n_events": np.int64(len(g)),
            "max_gap_s": np.int64(max_gap),
            "n_gaps_gt": np.int64(n_big),
        })

    return (events_ds.select_columns([user_col, "ts", "event_id"])
            .groupby(user_col)
            .map_groups(per_user, batch_format="pandas"))


def cumulative_first_crossing(orders_ds, threshold_cents: int,
                              key_col: str = "o_custkey"):
    """Per-customer running revenue: the first order at which the cumulative
    integer-cents total reaches ``threshold_cents``.

    The ``SUM() OVER (PARTITION BY k ORDER BY date, id ROWS UNBOUNDED
    PRECEDING)`` analog. One keyed shuffle of the pruned order columns,
    then a vectorized per-group ``cumsum`` + ``searchsorted`` (the running
    sum is strictly increasing — prices are positive — so the first
    crossing is a binary search, not a scan). Customers that never cross
    are dropped (SQL ``WHERE cum >= T`` + first-row qualify). Output is at
    most one row per customer.
    """

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        cents = np.rint(g.o_totalprice.to_numpy() * 100).astype(np.int64)
        cum = np.cumsum(cents)
        i = int(np.searchsorted(cum, threshold_cents))
        if i >= len(cum):
            return pd.DataFrame({key_col: pd.Series([], dtype=np.int64),
                                 "cross_date": pd.Series([], dtype=str),
                                 "cum_cents": pd.Series([], dtype=np.int64),
                                 "n_orders_to_cross": pd.Series([], dtype=np.int64)})
        d = g.o_orderdate.iloc[i]
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "cross_date": [pd.Timestamp(d).strftime("%Y-%m-%d")],
            "cum_cents": np.int64(cum[i]),
            "n_orders_to_cross": np.int64(i + 1),
        })

    return (orders_ds.select_columns(
                [key_col, "o_orderdate", "o_orderkey", "o_totalprice"])
            .groupby(key_col)
            .map_groups(per_cust, batch_format="pandas"))


def gapfill_hourly(events_ds):
    """Dense gap-filled hourly series per event type: every hour between a
    type's first and last event appears, absent hours as explicit zeros.

    The ``generate_series LEFT JOIN`` analog. The distributed part is the
    existing tumbling partial fold (one row per (type, hour) per batch —
    raw events never shuffle); the fill runs per type over that already
    hours×types-bounded aggregate, as a vectorized dense reindex (allocate
    the [min,max] axis, scatter the sparse counts in). Emitting zeros from
    the map side instead would ship empty hours per batch — the fill
    belongs after the fold.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        bucket = df.ts.astype("datetime64[ns]").astype("int64") // (3600 * 10**9)
        cents = np.rint(df.value * 100).astype("int64")
        g = (pd.DataFrame({"event_type": df.event_type, "hour_bucket": bucket,
                           "value_cents": cents})
             .groupby(["event_type", "hour_bucket"], sort=False)
             .agg(n_events=("value_cents", "size"),
                  value_cents=("value_cents", "sum"))
             .reset_index())
        return table_from_pandas(g)

    hourly = (events_ds.select_columns(["event_type", "ts", "value"])
              .map_batches(partial, batch_format="pyarrow", batch_size=65536)
              .groupby(["event_type", "hour_bucket"])
              .aggregate(Sum("n_events", alias_name="n_events"),
                         Sum("value_cents", alias_name="value_cents")))

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = int(g.hour_bucket.min()), int(g.hour_bucket.max())
        n = hi - lo + 1
        dense_n = np.zeros(n, dtype=np.int64)
        dense_c = np.zeros(n, dtype=np.int64)
        idx = g.hour_bucket.to_numpy() - lo
        dense_n[idx] = g.n_events.to_numpy()
        dense_c[idx] = g.value_cents.to_numpy()
        return pd.DataFrame({
            "event_type": np.repeat(g.event_type.iloc[0], n),
            "hour_bucket": np.arange(lo, hi + 1, dtype=np.int64),
            "n_events": dense_n,
            "value_cents": dense_c,
        })

    return hourly.groupby("event_type").map_groups(fill, batch_format="pandas")


def small_qty_revenue(lineitem_ds, part_path: str, brand: str):
    """TPC-H Q17 shape: revenue of small-quantity lineitems for one brand,
    where "small" means below 20% of that part's own average quantity.

    The correlated-subquery (``l_quantity < 0.2 * (SELECT avg ... WHERE
    p_partkey = l_partkey)``) decorrelated the scale-safe way: per-part
    (sum_qty, count) folds map-side into a partkey-bounded aggregate
    (part is a dimension table — its cardinality, not lineitem's, bounds
    the state), which broadcasts once; the probe pass filters and sums in
    a single streaming map. The 0.2·avg comparison is exact integer math:
    ``5·qty·cnt < sum_qty`` (quantities are integral), so no float
    threshold can disagree with the oracle.

    Output: one row (n_items, revenue_cents).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    part = pq.read_table(part_path, columns=["p_partkey", "p_brand"])
    brand_keys = np.sort(
        part.filter(pc.equal(part.column("p_brand"), brand))
        .column("p_partkey").to_numpy())
    bk_ref = ray.put(brand_keys)

    def qty_partial(t: pa.Table) -> pa.Table:
        bk = ray.get(bk_ref)
        lp = t.column("l_partkey").to_numpy()
        if len(bk) == 0:
            found = np.zeros(len(lp), dtype=bool)
        else:
            pos = np.searchsorted(bk, lp)
            found = bk[np.clip(pos, 0, len(bk) - 1)] == lp
        t = t.filter(pa.array(found))
        qty = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
        df = pd.DataFrame({"l_partkey": t.column("l_partkey").to_numpy(),
                           "sum_qty": qty, "cnt": np.int64(1)})
        g = (df.groupby("l_partkey", sort=False)
             .agg(sum_qty=("sum_qty", "sum"), cnt=("cnt", "sum")).reset_index())
        return table_from_pandas(g)

    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    from ..util import bucketed_sum

    avgs = (bucketed_sum(
        lineitem_ds.select_columns(cols[:2])
        .map_batches(qty_partial, batch_format="pyarrow",
                     batch_size=65536),
        "l_partkey", ["sum_qty", "cnt"])
            .to_pandas())  # bounded by the part dimension, not lineitem
    order = np.argsort(avgs.l_partkey.to_numpy())
    avg_ref = ray.put((avgs.l_partkey.to_numpy()[order],
                       avgs.sum_qty.to_numpy()[order].astype(np.int64),
                       avgs.cnt.to_numpy()[order].astype(np.int64)))

    def probe(t: pa.Table) -> pa.Table:
        pk, s, c = ray.get(avg_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.searchsorted(pk, lp)
        posc = np.clip(pos, 0, max(len(pk) - 1, 0))
        found = (len(pk) > 0) & (pk[posc] == lp) if len(pk) else np.zeros(len(lp), bool)
        qty = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
        small = found & (5 * qty * c[posc] < s[posc])
        price = t.column("l_extendedprice").to_numpy()
        cents = np.rint(price * 100).astype(np.int64)
        return pa.table({
            "n_items": pa.array([int(small.sum())], pa.int64()),
            "revenue_cents": pa.array([int(cents[small].sum())], pa.int64()),
        })

    parts = lineitem_ds.select_columns(cols).map_batches(
        probe, batch_format="pyarrow", batch_size=65536)
    out = parts.to_pandas()  # one row per batch
    return pd.DataFrame({"n_items": [np.int64(out.n_items.sum())],
                         "revenue_cents": [np.int64(out.revenue_cents.sum())]})


def stratified_sample(ds, group_col: str, key_col: str, k: int):
    """Deterministic stratified sample: the k smallest md5-rank keys PER
    GROUP (the ``row_number() OVER (PARTITION BY g ORDER BY md5(key))``
    analog of the global bottom-k sample).

    Map side keeps each batch's k smallest per group (a hot stratum
    contributes at most k rows per batch to the shuffle); the keyed
    ``map_groups`` finishes rank ≤ k. The sample is a pure function of
    the key set — resharding cannot change it — and md5 makes the rank
    value DuckDB-computable for row-by-row oracle checks.
    """
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].astype(str)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
             for s in keys),
            dtype=np.int64, count=len(df))
        out = pd.DataFrame({group_col: df[group_col],
                            key_col: df[key_col], "h": h})
        out = out.sort_values(["h", key_col], kind="mergesort")
        return out.groupby(group_col, sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", key_col], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.select_columns([group_col, key_col])
            .map_batches(partial, batch_format="pandas", batch_size=8192)
            .groupby(group_col)
            .map_groups(final, batch_format="pandas"))


def user_period_overlap(events_ds,
                        a: tuple[str, str] = ("2024-01-01T00:00:00",
                                              "2024-01-01T06:00:00"),
                        b: tuple[str, str] = ("2024-01-01T06:00:00",
                                              "2024-01-01T12:00:00"),
                        user_col: str = "user_id"):
    """Set-operation segmentation: users active in period A, period B, or
    both (INTERSECT / EXCEPT over per-period distinct-user sets, computed
    in ONE pass — never two scans + a set shuffle).

    Map side folds each batch to at most one (user, in_a, in_b) flag row
    per user (bool-max partial — a hot user collapses map-side); the keyed
    groupby Max-folds the flags; a 3-row category count fold finishes.
    Output: (category in {'both','only_a','only_b'}, n_users).
    """
    from ray.data.aggregate import Max, Sum

    a0, a1 = np.datetime64(a[0], "us"), np.datetime64(a[1], "us")
    b0, b1 = np.datetime64(b[0], "us"), np.datetime64(b[1], "us")

    def flags(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy()
        u = t.column(user_col).to_numpy()
        in_a = ((ts >= a0) & (ts < a1)).astype(np.int64)
        in_b = ((ts >= b0) & (ts < b1)).astype(np.int64)
        df = (pd.DataFrame({"u": u, "in_a": in_a, "in_b": in_b})
              .groupby("u", sort=False).max().reset_index())
        df = df[(df.in_a > 0) | (df.in_b > 0)]
        return table_from_pandas(df)

    folded = (events_ds.select_columns([user_col, "ts"])
              .map_batches(flags, batch_format="pyarrow", batch_size=65536)
              .groupby("u")
              .aggregate(Max("in_a", alias_name="in_a"),
                         Max("in_b", alias_name="in_b")))

    def classify(t: pa.Table) -> pa.Table:
        ia = t.column("in_a").to_numpy()
        ib = t.column("in_b").to_numpy()
        cat = np.where(ia & ib, "both", np.where(ia > 0, "only_a", "only_b"))
        df = (pd.DataFrame({"category": cat, "n_users": np.int64(1)})
              .groupby("category", sort=False).sum().reset_index())
        return table_from_pandas(df)

    return (folded.map_batches(classify, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("category").aggregate(Sum("n_users",
                                               alias_name="n_users")))


def late_data_stats(events_ds, lateness_s: int = 3600, n_buckets: int = 256):
    """Watermark / allowed-lateness semantics (the streaming-engine
    contract, evaluated deterministically over a replayable log).

    The fixture log is perfectly time-ordered, so ARRIVAL order is defined
    as the md5 permutation of ``event_id`` (the seeded-shuffle replay used
    by ``docs_epoch_shuffle``) — a deterministic out-of-order arrival both
    engines compute identically. The watermark at an event's arrival is
    ``max(ts of everything that arrived before or with it) - lateness``;
    an event is DROPPED iff its ts is older than that watermark. Output:
    per event type, arrivals, drops, integer-cents sum of accepted events.

    Distributed prefix-max without a global sort: the md5 arrival key is
    uniform over [0, 2^64), so its top bits bucket arrivals into
    ``n_buckets`` ranges directly (no span prescan); pass 1 folds
    per-bucket max-ts partials (tiny), the driver prefix-maxes them into
    broadcast "watermark floor before bucket b"; pass 2 is ONE keyed
    shuffle — each bucket group sorts by arrival key and runs a vectorized
    cummax seeded with its floor. Raw rows shuffle exactly once.
    """
    import hashlib

    import ray
    from ray.data.aggregate import Max, Sum

    lat_us = int(lateness_s) * 1_000_000

    def arrival_key(eids: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(e)).encode()).digest()[:8],
                            "big") for e in eids),
            dtype=np.uint64, count=len(eids))

    def bucket_of(h: np.ndarray) -> np.ndarray:
        # uniform md5 keys: equal-width ranges over [0, 2^64)
        return (h // np.uint64((1 << 64) // n_buckets)).astype(np.int64)

    def tag(t: pa.Table) -> pa.Table:
        e = t.column("event_id").to_numpy()
        h = arrival_key(e)
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "b": pa.array(np.minimum(bucket_of(h), n_buckets - 1), pa.int64()),
            "h": pa.array(h, pa.uint64()),
            "event_id": pa.array(e, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
            "event_type": t.column("event_type"),
        })

    # tag once, reuse for both passes: the md5 arrival key is the
    # dominant per-row cost, and the tagged column set IS this op's own
    # shuffle volume, so materializing it adds no asymptotic footprint
    # while halving the hash work
    tagged = (events_ds.select_columns(["event_id", "ts", "value",
                                        "event_type"])
              .map_batches(tag, batch_format="pyarrow",
                           batch_size=65536)
              .materialize())

    def bmax_from_tagged(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"b": t.column("b").to_numpy(),
                            "mx": t.column("ts_us").to_numpy()})
              .groupby("b", sort=False)["mx"].max().reset_index())
        return table_from_pandas(df)

    bmax = (tagged.select_columns(["b", "ts_us"])
            .map_batches(bmax_from_tagged, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("b").aggregate(Max("mx", alias_name="mx"))
            .to_pandas().sort_values("b"))
    floors = np.full(n_buckets, np.iinfo(np.int64).min, dtype=np.int64)
    run = np.iinfo(np.int64).min
    by_b = dict(zip(bmax["b"].astype(int), bmax["mx"].astype(np.int64)))
    for b in range(n_buckets):
        floors[b] = run  # max ts of all COMPLETE buckets before b
        run = max(run, by_b.get(b, run))
    floors_ref = ray.put(floors)

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        fl = ray.get(floors_ref)
        g = g.sort_values(["h", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        wm = np.maximum.accumulate(
            np.maximum(ts, fl[int(g["b"].iloc[0])]))
        dropped = (wm - ts) > lat_us
        out = pd.DataFrame({
            "event_type": g["event_type"],
            "n_events": 1,
            "n_dropped": dropped.astype("int64"),
            "accepted_cents": np.where(dropped, 0, g["cents"].to_numpy()),
        }).groupby("event_type", sort=False).sum().reset_index()
        return out

    return (tagged
            .groupby("b").map_groups(scan_bucket, batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_dropped", alias_name="n_dropped"),
                       Sum("accepted_cents", alias_name="accepted_cents")))


def ohlc_bars(events_ds, freq_s: int = 86400):
    """Time-series downsample into OHLC bars per event type (the
    financial-bars / sensor-resample classic): per (event_type, bucket):
    open = value of the FIRST event, close = the LAST (both by
    (ts, event_id) — deterministic under any partitioning), high/low =
    integer-cents extremes, n = count.

    First/last are associative folds over (key, value) pairs — each batch
    partial carries its own (min_key, open) / (max_key, close), so the
    shuffle moves one row per (type, bucket) per batch and the final
    merge just re-folds partials. No window sort anywhere.
    """
    f_us = int(freq_s) * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = t.column("event_id").to_numpy()
        cents = np.rint(t.column("value").to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pylist(),
            "bucket": ts // f_us,
            "ts": ts, "eid": eid, "cents": cents,
        })
        rows = []
        for (et, bk), g in df.groupby(["event_type", "bucket"], sort=False):
            order = np.lexsort((g["eid"].to_numpy(), g["ts"].to_numpy()))
            c = g["cents"].to_numpy()
            rows.append({
                "event_type": et, "bucket": int(bk),
                # arrival keys travel with the partial so merges stay exact
                "open_ts": int(g["ts"].to_numpy()[order[0]]),
                "open_eid": int(g["eid"].to_numpy()[order[0]]),
                "open_c": int(c[order[0]]),
                "close_ts": int(g["ts"].to_numpy()[order[-1]]),
                "close_eid": int(g["eid"].to_numpy()[order[-1]]),
                "close_c": int(c[order[-1]]),
                "high_c": int(c.max()), "low_c": int(c.min()),
                "n_events": len(g),
            })
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False) if len(out) \
            else pa.table({k: pa.array([], pa.int64() if k != "event_type"
                                       else pa.string())
                           for k in ["event_type", "bucket", "open_ts",
                                     "open_eid", "open_c", "close_ts",
                                     "close_eid", "close_c", "high_c",
                                     "low_c", "n_events"]})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        oo = np.lexsort((g["open_eid"].to_numpy(), g["open_ts"].to_numpy()))
        co = np.lexsort((g["close_eid"].to_numpy(), g["close_ts"].to_numpy()))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "bucket": [int(g["bucket"].iloc[0])],
            "open_c": [int(g["open_c"].to_numpy()[oo[0]])],
            "high_c": [int(g["high_c"].max())],
            "low_c": [int(g["low_c"].min())],
            "close_c": [int(g["close_c"].to_numpy()[co[-1]])],
            "n_events": [int(g["n_events"].sum())],
        })

    return (events_ds.select_columns(["event_type", "ts", "event_id",
                                      "value"])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["event_type", "bucket"])
            .map_groups(merge, batch_format="pandas"))


def event_transitions(events_ds, user_col: str = "user_id"):
    """Per-user event-sequence bigram counts folded into the global
    transition matrix (the Markov-chain estimation step of behavioral
    modeling): consecutive (prev_type -> next_type) pairs in each user's
    (ts, event_id) order.

    Consecutive pairs need each user's full order, so the ONE exchange is
    a user-keyed shuffle of the pruned (user, ts, id, type) columns; the
    per-group kernel is a vectorized sort + shift, and per-group partial
    counts make the final fold a |types|^2-row groupby.
    """
    from ray.data.aggregate import Sum

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["event_id"].to_numpy(), g["ts"].to_numpy()))
        et = g["event_type"].to_numpy()[order]
        if len(et) < 2:
            # typed empties: untyped lists promote 'n' to float64 through
            # concat and diverge from the BIGINT oracle
            return pd.DataFrame({
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            })
        pairs = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:],
                              "n": np.int64(1)})
        return (pairs.groupby(["from_type", "to_type"], sort=False)
                .sum().reset_index())

    return (events_ds.select_columns([user_col, "ts", "event_id",
                                      "event_type"])
            .groupby(user_col).map_groups(per_user, batch_format="pandas")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n")))


def windowed_funnel(events_ds, stages: tuple[str, ...],
                    window_s: int = 7 * 86400,
                    user_col: str = "user_id"):
    """Conversion funnel WITH a time budget: a user converts stage k only
    if stage k's first qualifying event lands within ``window_s`` of the
    user's stage-1 entry — the product-analytics variant the unwindowed
    Min-fold funnel cannot express (each later stage's earliest qualifying
    time depends on the previous stage's chosen time).

    Per-user sequential semantics need each user's ordered events: ONE
    keyed shuffle of the pruned columns, a vectorized searchsorted chain
    per group (ts-sorted arrays per stage, no Python over events), then a
    K-row histogram fold. Output: (stage, stage_name, n_users).
    """
    from ray.data.aggregate import Sum

    stage_ix = {sname: k for k, sname in enumerate(stages)}

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        per_stage = [ts[et == sname] for sname in stages]
        if len(per_stage[0]) == 0:
            depth = 0
        else:
            t0 = per_stage[0][0]
            deadline = t0 + window_s * 1_000_000
            depth = 1
            cur = t0
            for k in range(1, len(stages)):
                arr = per_stage[k]
                # first event of stage k strictly AFTER the previous
                # stage's chosen time, and within the window of stage 1
                pos = np.searchsorted(arr, cur, side="right")
                if pos < len(arr) and arr[pos] <= deadline:
                    cur = arr[pos]
                    depth += 1
                else:
                    break
        out = pd.DataFrame({"stage": np.arange(1, depth + 1, dtype=np.int64),
                            "n_users": np.int64(1)})
        return out

    hist = (events_ds.select_columns([user_col, "ts", "event_id",
                                      "event_type"])
            .groupby(user_col).map_groups(per_user, batch_format="pandas")
            .groupby("stage").aggregate(Sum("n_users",
                                            alias_name="n_users")))

    names = list(stages)

    def name(t: pa.Table) -> pa.Table:
        st = t.column("stage").to_numpy()
        return pa.table({
            "stage": pa.array(st.astype(np.int64), pa.int64()),
            "stage_name": pa.array([names[int(x) - 1] for x in st],
                                   pa.string()),
            "n_users": t.column("n_users").cast(pa.int64()),
        })

    return hist.map_batches(name, batch_format="pyarrow")


def dedup_within_gap(events_ds, key_cols: list[str], ts_col: str,
                     id_col: str, gap_us: int, n_buckets: int = 16):
    """Streaming delivery-dedup: drop events closer than ``gap_us`` to
    their key's PREVIOUS event — the at-least-once-delivery suppression
    every event pipeline runs (LAG semantics: an event survives iff it is
    its key's first, or ts - lag(ts) > gap; same-ts duplicates order by
    id and collapse).

    Plan: project to the 4 key/ts/id columns (payloads never move), ONE
    coarse-bucket shuffle (crc32 of the key into ``n_buckets`` — the
    high-cardinality-groupby lesson), per-bucket vectorized sort + diff
    across ALL keys at once (np.diff over the key-sorted frame with a
    key-boundary reset). Returns the surviving (id) rows.
    """
    import zlib as _z

    import numpy as np
    import pandas as pd

    cols = [*key_cols, ts_col, id_col]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_cols].astype(str).agg("\x1f".join, axis=1)
        out = df[cols].copy()
        out["pk"] = np.fromiter(
            (_z.crc32(s.encode()) % n_buckets for s in key),
            dtype=np.int64, count=len(df))
        out["_key"] = key.to_numpy()
        return out

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_key", ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = g["_key"].to_numpy()[1:] == g["_key"].to_numpy()[:-1]
        gap = ts[1:] - ts[:-1]
        keep = np.ones(len(g), bool)
        keep[1:] = ~same | (gap > gap_us)
        return g.loc[keep, [id_col]]

    return (events_ds.select_columns(cols)
            .map_batches(bucket, batch_format="pandas", batch_size=65536)
            .groupby("pk").map_groups(survivors, batch_format="pandas"))


def ewma_last(events_ds, key_col: str, ts_col: str, id_col: str,
              value_col: str, alpha_num: int = 1, alpha_den: int = 4,
              q: int = 10**6, n_buckets: int = 16):
    """Per-key integer EWMA, final value — the streaming smoothed-state
    register every metrics pipeline keeps per entity.

    Recurrence over the key's events ordered by (ts, id), values in
    cents (the repo's fixed-point money convention), state scaled by
    ``q``::

        s_1 = vc_1 * q
        s_t = (alpha_num * vc_t * q + (alpha_den - alpha_num) * s_{t-1})
              // alpha_den

    Integer floor division makes the recurrence exact and SQL-replayable
    (a recursive CTE steps the same rows); values must be NON-NEGATIVE —
    DuckDB's ``//`` truncates toward zero while Python floors, so the
    semantics only agree on the non-negative domain (guarded here).

    Plan: project to 4 columns, ONE coarse-bucket shuffle (crc32 of the
    key — the high-cardinality-groupby lesson), then a per-bucket pass.
    The recurrence is inherently SEQUENTIAL per key (each state depends
    on the previous), so the per-bucket fold is a single ordered Python
    loop — O(rows in bucket), parallel ACROSS buckets, with payloads
    never shuffled. Returns (key_col, ewma_q, n_events).
    """
    import zlib as _z

    cols = [key_col, ts_col, id_col, value_col]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["pk"] = np.fromiter(
            (_z.crc32(str(k).encode()) % n_buckets for k in df[key_col]),
            dtype=np.int64, count=len(df))
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col],
                          kind="mergesort").reset_index(drop=True)
        vc = np.rint(g[value_col].to_numpy() * 100).astype(np.int64)
        if len(vc) and vc.min() < 0:
            raise ValueError("ewma_last needs non-negative values (the "
                             "floor-vs-truncate division boundary)")
        keys = g[key_col].to_numpy()
        out_k, out_s, out_n = [], [], []
        s, n, cur = 0, 0, None
        a, d = alpha_num, alpha_den
        for i in range(len(g)):
            k = keys[i]
            if k != cur:
                if cur is not None:
                    out_k.append(cur); out_s.append(s); out_n.append(n)
                cur, s, n = k, int(vc[i]) * q, 1
            else:
                s = (a * int(vc[i]) * q + (d - a) * s) // d
                n += 1
        if cur is not None:
            out_k.append(cur); out_s.append(s); out_n.append(n)
        return pd.DataFrame({key_col: out_k,
                             "ewma_q6": pd.Series(out_s, dtype=np.int64),
                             "n_events": pd.Series(out_n, dtype=np.int64)})

    return (events_ds.select_columns(cols)
            .map_batches(bucket, batch_format="pandas", batch_size=65536)
            .groupby("pk").map_groups(fold, batch_format="pandas"))


def running_total(events_ds, value_col: str = "value",
                  ts_col: str = "ts", id_col: str = "event_id"):
    """Per-event running total (cumulative revenue / burn-down counters) —
    the 1D distributed prefix SCAN, sibling of the 2D summed-area table
    (``ops/integral.py``): SUM OVER (ORDER BY ts, id) for EVERY row
    without a global sort.

    Plan: rows range-bucket by epoch HOUR (order-preserving, so the scan
    decomposes); per-bucket sums are O(#hours) bounded metadata whose
    driver-side exclusive prefix gives each bucket its starting offset
    (broadcast once); one keyed exchange then scans each bucket locally
    under the deterministic (ts, id) order. Same-timestamp rows always
    share a bucket, so the tiebreak never crosses the exchange.

    Returns (id_col, running_cents) — exact int64 cents.
    """
    import ray

    HOUR_US = 3_600_000_000

    def tag(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        cents = np.rint(t.column(value_col).to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({
            "b": pa.array(ts // HOUR_US, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            id_col: t.column(id_col).cast(pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    tagged = (events_ds.select_columns([ts_col, value_col, id_col])
              .map_batches(tag, batch_format="pyarrow", batch_size=65536)
              .materialize())  # two consumers: bucket sums + the scan

    def bsum(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"b": t.column("b").to_numpy(),
                            "s": t.column("cents").to_numpy()})
              .groupby("b", sort=False)["s"].sum().reset_index())
        return table_from_pandas(df.astype(np.int64))

    from ray.data.aggregate import Sum

    # hours are bounded metadata (the tile-totals discipline): the keyed
    # fold output is O(#hours) rows, pulled once for the driver prefix
    bsums = (tagged.map_batches(bsum, batch_format="pyarrow",
                                batch_size=65536)
             .groupby("b").aggregate(Sum("s", alias_name="s"))
             .to_pandas().sort_values("b"))
    offs = dict(zip(
        bsums["b"].astype(np.int64),
        np.concatenate([[0], bsums["s"].to_numpy(np.int64)[:-1].cumsum()]),
    ))
    offs_ref = ray.put(offs)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["b"].iloc[0])]
        g = g.sort_values(["ts_us", id_col], kind="mergesort")
        run = g["cents"].to_numpy(np.int64).cumsum() + off
        return pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                             "running_cents": run.astype(np.int64)})

    return tagged.groupby("b").map_groups(scan, batch_format="pandas")


def pattern_counts(events_ds, patterns=None, user_col: str = "user_id"):
    """MATCH_RECOGNIZE analog: count NON-OVERLAPPING regex matches over
    each user's time-ordered event-type sequence (one char per event —
    the fixture types' initials are distinct). Default patterns: the
    strict view→click→purchase trigram and the view,click*,purchase
    funnel.

    Plan: ONE bucketed exchange on the user hash (same-user rows share a
    bucket); the per-bucket kernel sorts by (user, ts, event_id) once and
    runs the compiled patterns per user string — work is bounded by
    events, state by the bucket. Python's ``re.findall`` and DuckDB's
    ``regexp_extract_all`` share non-overlapping leftmost semantics, so
    the oracle replays exactly. Output: one row per user, plus the match
    counts."""
    import re as _re

    from ..util import bucketed_fold

    patterns = patterns or {"n_funnel": "vc*p", "n_exact": "vcp"}
    compiled = {name: _re.compile(p) for name, p in patterns.items()}

    def tag(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        ch = pa.array([x[0] for x in et], pa.string())
        return pa.table({
            user_col: t.column(user_col),
            "ts": t.column("ts"),
            "event_id": t.column("event_id"),
            "ch": ch,
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, "ts", "event_id"],
                            kind="mergesort")
        out = {user_col: [], "n_events": []}
        for name in compiled:
            out[name] = []
        for uid, g in df.groupby(user_col, sort=False):
            seq = "".join(g["ch"])
            out[user_col].append(uid)
            out["n_events"].append(len(seq))
            for name, rx in compiled.items():
                out[name].append(len(rx.findall(seq)))
        o = pd.DataFrame(out)
        for c2 in o.columns:
            if c2 != user_col:
                o[c2] = o[c2].astype(np.int64)
        return o

    pre = (events_ds.select_columns([user_col, "ts", "event_id",
                                     "event_type"])
           .map_batches(tag, batch_format="pyarrow", batch_size=65536))
    return bucketed_fold(pre, user_col, fold)


def scd2_intervals(events_ds, user_col: str = "user_id"):
    """SCD2 validity intervals from an event stream (the slowly-changing-
    dimension type-2 shape): per key, each event's value is held until
    the next event — emit the per-key interval summary
    (n_versions, closed_usec = span first→last, value_usec =
    Σ value_cents x interval_µs over closed intervals), i.e. the
    time-weighted state integral, exact in integer microseconds.

    ONE bucketed exchange on the key hash; per-bucket kernel is a
    vectorized sort + diff (the LEAD(ts) OVER (PARTITION BY key) analog).
    Oracle: the LEAD window replay."""
    from ..util import bucketed_fold

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, "ts", "event_id"],
                            kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
        uid = df[user_col].to_numpy()
        out = {user_col: [], "n_versions": [], "closed_usec": [],
               "value_usec": []}
        # group bounds on the sorted key column
        cut = np.ones(len(df), bool)
        cut[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(cut)[0]
        ends = np.append(starts[1:], len(df))
        for a, b in zip(starts, ends):
            gaps = np.diff(ts[a:b])
            out[user_col].append(uid[a])
            out["n_versions"].append(b - a)
            out["closed_usec"].append(int(gaps.sum()) if b - a > 1 else 0)
            out["value_usec"].append(
                int((v[a:b - 1] * gaps).sum()) if b - a > 1 else 0)
        o = pd.DataFrame(out)
        for c2 in ("n_versions", "closed_usec", "value_usec"):
            o[c2] = o[c2].astype(np.int64)
        return o

    return bucketed_fold(
        events_ds.select_columns([user_col, "ts", "event_id", "value"]),
        user_col, fold)


def last_touch_attribution(events_ds, conv_type: str = "purchase",
                           touch_types: tuple[str, ...] = ("click", "view"),
                           window_s: int = 86400,
                           user_col: str = "user_id"):
    """Last-touch conversion attribution — the marketing-analytics join:
    each ``conv_type`` event is credited to the user's LATEST
    ``touch_types`` event at or before it and within ``window_s``
    (ties on ts -> the larger event_id, i.e. the later arrival), or to
    ``'none'``. Returns (channel, n_conv, revenue_cents) sorted by
    channel — revenue as exact integer cents.

    Per-user sequential semantics = the transition-matrix shape: one
    user-keyed coarse-bucket exchange of the pruned columns, a
    vectorized per-user kernel (sorted touch array + one searchsorted
    per user's purchase vector — no per-event Python), channel-bounded
    partials fold in a tiny keyed aggregate.
    """
    from ray.data.aggregate import Sum

    from ..util import bucketed_fold

    touch_set = set(touch_types)
    window_us = np.int64(window_s) * 1_000_000

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby(user_col, sort=False):
            et = sub["event_type"].to_numpy()
            ts = sub["ts"].to_numpy().astype("datetime64[us]").astype(
                np.int64)
            eid = sub["event_id"].to_numpy().astype(np.int64)
            val = sub["value"].to_numpy()
            is_t = np.isin(et, list(touch_set))
            is_c = et == conv_type
            if not is_c.any():
                continue
            t_ts, t_eid, t_ch = ts[is_t], eid[is_t], et[is_t]
            order = np.lexsort((t_eid, t_ts))
            t_ts, t_ch = t_ts[order], t_ch[order]
            p_ts = ts[is_c]
            cents = np.rint(val[is_c] * 100).astype(np.int64)
            if t_ts.size:
                pos = np.searchsorted(t_ts, p_ts, side="right") - 1
                safe = np.clip(pos, 0, None)
                okc = (pos >= 0) & (p_ts - t_ts[safe] <= window_us)
                ch = np.where(okc, t_ch[safe], "none")
            else:
                ch = np.full(len(p_ts), "none", object)
            outs.append(pd.DataFrame({"channel": ch, "n_conv": np.int64(1),
                                      "revenue_cents": cents}))
        if not outs:
            return pd.DataFrame({
                "channel": pd.Series([], dtype=object),
                "n_conv": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64")})
        allp = pd.concat(outs, ignore_index=True)
        return (allp.groupby("channel", sort=False)[
            ["n_conv", "revenue_cents"]].sum().reset_index())

    keep = tuple(touch_types) + (conv_type,)

    def prune(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        mask = pa.array([e in keep for e in et])
        return t.filter(mask)

    partials = (events_ds.select_columns(
        [user_col, "ts", "event_id", "event_type", "value"])
        .map_batches(prune, batch_format="pyarrow", batch_size=65536))
    return (bucketed_fold(partials, user_col, fold)
            .groupby("channel")
            .aggregate(Sum("n_conv", alias_name="n_conv"),
                       Sum("revenue_cents", alias_name="revenue_cents"))
            .sort("channel"))


def sliding_distinct_users(events_ds, window_hours: int = 3):
    """Sliding-window COUNT(DISTINCT) — the trailing-uniques analog
    (``count(DISTINCT user) OVER (RANGE 2 hours PRECEDING)`` per active
    hour): every hour bucket reports the distinct users active in it or
    the ``window_hours - 1`` buckets before it.

    Exact and shuffle-light: per-batch distinct (user, hour) partials
    (map-side dedup), ONE coarse-bucket global distinct, then each
    (user, hour) EXPLODES to the windows it serves (w in
    [h, h+window_hours-1]) and a second coarse-bucket distinct + count
    folds per window — no window ever sees raw events, only the
    per-user hour set. Windows are reported only for ACTIVE hours (the
    hour set is time-bounded, broadcast as a filter).

    Output: (hour_bucket, n_users).
    """
    import ray

    from ..util import bucketed_fold, bucketed_distinct

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.ts.astype("datetime64[ns]").astype("int64")
             // (3600 * 10**9))
        return (pd.DataFrame({"user_id": df.user_id.to_numpy(),
                              "h": h.to_numpy()})
                .drop_duplicates())

    uh = bucketed_distinct(
        events_ds.select_columns(["ts", "user_id"]).map_batches(
            partial, batch_format="pandas", batch_size=65536),
        ["user_id", "h"]).materialize()

    hours = np.sort(np.asarray(
        [r["h"] for r in
         bucketed_distinct(uh.select_columns(["h"]), "h").take_all()],
        np.int64))
    hrs_ref = ray.put(hours)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hrs = ray.get(hrs_ref)
        parts = []
        for k in range(window_hours):
            w = df["h"].to_numpy() + k
            keep = np.isin(w, hrs)
            parts.append(pd.DataFrame(
                {"user_id": df["user_id"].to_numpy()[keep], "w": w[keep]}))
        return pd.concat(parts, ignore_index=True).drop_duplicates()

    uw = uh.map_batches(explode, batch_format="pandas", batch_size=65536)

    def count_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        agg = d.groupby("w", sort=False).size().rename("n_users")
        out = agg.reset_index().rename(columns={"w": "hour_bucket"})
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return bucketed_fold(uw, "w", count_fold).sort("hour_bucket")


def heavy_changers(events_ds, k: int = 20):
    """Heavy CHANGERS between the two halves of the event-time range —
    the anomaly/drift shape ("which keys changed volume most,
    period-over-period"): per-user event counts in each half (split at
    the midpoint hour, integer arithmetic on epoch hours), ranked by
    absolute count delta (ties -> smaller user_id).

    The time-range midpoint comes from a tiny global (min, max) hour
    fold; per-(user, half) counts fold map-side + one coarse-bucket
    sum; the top-k finish is a per-bucket local top-k union -> bounded
    driver sort (only k rows per bucket reach the driver).

    Output: (user_id, cnt_a, cnt_b, delta) with delta = cnt_b - cnt_a,
    top k by |delta|.
    """
    from ray.data.aggregate import Max, Min

    from ..util import bucketed_fold

    def hour_col(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.ts.astype("datetime64[ns]").astype("int64")
             // (3600 * 10**9))
        return pd.DataFrame({"user_id": df.user_id.to_numpy(),
                             "h": h.to_numpy()})

    uh = events_ds.select_columns(["ts", "user_id"]).map_batches(
        hour_col, batch_format="pandas", batch_size=65536).materialize()
    agg = uh.aggregate(Min("h", alias_name="lo"),
                       Max("h", alias_name="hi"))
    if agg is None or agg.get("lo") is None:  # empty events: no halves
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "cnt_a": pa.array([], pa.int64()),
                         "cnt_b": pa.array([], pa.int64()),
                         "delta": pa.array([], pa.int64())})
    lo, hi = int(agg["lo"]), int(agg["hi"])
    mid = lo + (hi - lo) // 2  # second half starts ABOVE mid

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        half = (df["h"].to_numpy() > mid).astype(np.int64)
        g = (pd.DataFrame({"user_id": df["user_id"].to_numpy(),
                           "half": half})
             .groupby(["user_id", "half"], sort=False).size()
             .rename("c").reset_index())
        g["c"] = g["c"].astype(np.int64)
        return g

    counts = uh.map_batches(cnt_partial, batch_format="pandas",
                            batch_size=65536)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "half"], sort=False)["c"].sum() \
            .reset_index()
        w = s.pivot_table(index="user_id", columns="half", values="c",
                          fill_value=0, aggfunc="sum")
        cnt_a = w[0].to_numpy(np.int64) if 0 in w.columns else \
            np.zeros(len(w), np.int64)
        cnt_b = w[1].to_numpy(np.int64) if 1 in w.columns else \
            np.zeros(len(w), np.int64)
        out = pd.DataFrame({"user_id": w.index.to_numpy(np.int64),
                            "cnt_a": cnt_a, "cnt_b": cnt_b,
                            "delta": cnt_b - cnt_a})
        out["absd"] = out["delta"].abs()
        # local top-k: only k rows per bucket travel onward
        return out.sort_values(["absd", "user_id"],
                               ascending=[False, True]).head(k) \
            .drop(columns=["absd"])

    parts = bucketed_fold(counts, "user_id", fold).take_all()
    df = pd.DataFrame(parts)
    df["absd"] = df["delta"].abs()
    df = df.sort_values(["absd", "user_id"],
                        ascending=[False, True]).head(k) \
        .drop(columns=["absd"]).reset_index(drop=True)
    return pa.table({
        "user_id": pa.array(df["user_id"].to_numpy(np.int64),
                            pa.int64()),
        "cnt_a": pa.array(df["cnt_a"].to_numpy(np.int64), pa.int64()),
        "cnt_b": pa.array(df["cnt_b"].to_numpy(np.int64), pa.int64()),
        "delta": pa.array(df["delta"].to_numpy(np.int64), pa.int64()),
    })


def hourly_autocorr_moments(events_ds, k_lag: int = 1):
    """Lag-k autocorrelation MOMENTS of each event type's hourly count
    series — the seasonality/persistence probe: for the DENSE hourly
    series x_t (zero-filled over the type's [min, max] hour span),
    report the exact integer moments (n, sum_x, sum_x2, sum_xy with
    y = x_{t+k}, sum_head, sum_tail) from which any engine computes the
    Pearson lag-k r — no division or float ever enters the compare.

    Hourly totals are time-bounded metadata (the tile-totals
    discipline): one coarse-bucket (type, hour) count fold, then the
    per-type series assembles inside a single group task (bounded by
    the hour span) and the moments are one vectorized pass. Output:
    (event_type, n_pairs, sum_x, sum_x2, sum_y, sum_y2, sum_xy).
    """
    from ..util import bucketed_fold, bucketed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.ts.astype("datetime64[ns]").astype("int64")
             // (3600 * 10**9))
        g = (pd.DataFrame({"event_type": df.event_type.to_numpy(),
                           "h": h.to_numpy()})
             .groupby(["event_type", "h"], sort=False).size()
             .rename("c").reset_index())
        g["c"] = g["c"].astype(np.int64)
        return g

    counts = bucketed_sum(
        events_ds.select_columns(["ts", "event_type"]).map_batches(
            partial, batch_format="pandas", batch_size=65536),
        ["event_type", "h"], "c")

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            lo, hi = int(grp["h"].min()), int(grp["h"].max())
            x = np.zeros(hi - lo + 1, np.int64)
            x[grp["h"].to_numpy(np.int64) - lo] = \
                grp["c"].to_numpy(np.int64)
            if len(x) <= k_lag:
                continue
            a, b = x[:-k_lag], x[k_lag:]
            out.append((et, len(a), int(a.sum()), int((a * a).sum()),
                        int(b.sum()), int((b * b).sum()),
                        int((a * b).sum())))
        return pd.DataFrame(out, columns=["event_type", "n_pairs",
                                          "sum_x", "sum_x2", "sum_y",
                                          "sum_y2", "sum_xy"])

    return bucketed_fold(counts, "event_type", moments) \
        .sort("event_type")


def downtime_gaps(events_ds, threshold_us: int = 1_800_000_000):
    """Global DOWNTIME report — the ops-observability gap-island scan
    over the whole event stream: consecutive-event gaps longer than
    ``threshold_us`` count as outages; reports (n_gaps, max_gap_us,
    downtime_us = Σ over-threshold gaps), all exact integer µs.

    Plan: events shuffle ONCE into hour buckets (groups bounded by the
    TIME DOMAIN, never the event count); each bucket sorts locally and
    folds its internal gaps plus its (min, max) boundary timestamps;
    the driver stitches cross-bucket gaps from the domain-bounded
    bucket table (a gap spanning silent hours is exactly next-present-
    bucket min − current max). No global sort of the stream anywhere.
    """
    BUCKET_US = 3_600_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["b"].to_numpy(np.int64)
        out = {"b": [], "lo": [], "hi": [], "n_gaps": [],
               "max_gap": [], "downtime": []}
        for bucket in np.unique(b):
            tt = np.sort(df.loc[df["b"] == bucket, "t"]
                         .to_numpy(np.int64))
            gaps = np.diff(tt)
            over = gaps > threshold_us
            out["b"].append(int(bucket))
            out["lo"].append(int(tt[0]))
            out["hi"].append(int(tt[-1]))
            out["n_gaps"].append(int(over.sum()))
            out["max_gap"].append(int(gaps.max()) if len(gaps) else 0)
            out["downtime"].append(int(gaps[over].sum()))
        return pd.DataFrame(out).astype("int64")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        t = (df["ts"].astype("datetime64[ns]").astype("int64")
             // 1000).to_numpy(np.int64)
        return pd.DataFrame({"b": t // BUCKET_US, "t": t})

    from ..util import bucketed_fold

    parts = bucketed_fold(
        events_ds.select_columns(["ts"]).map_batches(
            bucketize, batch_format="pandas", batch_size=65536),
        "b", partial,
        clean_schema=pa.schema([("b", pa.int64()), ("lo", pa.int64()),
                                ("hi", pa.int64()), ("n_gaps", pa.int64()),
                                ("max_gap", pa.int64()),
                                ("downtime", pa.int64())]))
    rows = sorted(parts.take_all(), key=lambda r: r["b"])  # domain-bounded
    n_gaps = sum(r["n_gaps"] for r in rows)
    max_gap = max((r["max_gap"] for r in rows), default=0)
    downtime = sum(r["downtime"] for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        gap = cur["lo"] - prev["hi"]
        max_gap = max(max_gap, gap)
        if gap > threshold_us:
            n_gaps += 1
            downtime += gap
    return pa.table({
        "n_gaps": pa.array([n_gaps], pa.int64()),
        "max_gap_us": pa.array([max_gap], pa.int64()),
        "downtime_us": pa.array([downtime], pa.int64()),
    })


def hourly_peaks(events_ds):
    """Per-type PEAK detection over the hourly series — the
    anomaly/alerting scan next to changepoint/zscore: a peak hour's
    count strictly exceeds both neighbors (series edges can't qualify).
    Reports per event type: n_peaks, the max peak count, and its hour
    (ties -> smallest hour). Exact integers.

    The distributed part is the tumbling (type, hour) count fold (one
    row per pair per batch — raw events never shuffle); the peak scan
    runs per type over that hours x types-bounded aggregate.
    """
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bucket = (df.ts.astype("datetime64[ns]").astype("int64")
                  // (3600 * 10**9))
        g = (pd.DataFrame({"event_type": df.event_type,
                           "hour_bucket": bucket})
             .groupby(["event_type", "hour_bucket"], sort=False).size()
             .reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hourly = (events_ds.select_columns(["event_type", "ts"])
              .map_batches(partial, batch_format="pandas",
                           batch_size=65536)
              .groupby(["event_type", "hour_bucket"])
              .aggregate(Sum("n", alias_name="n")))

    def peaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour_bucket")
        h = g["hour_bucket"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        # dense axis so missing hours count as zero-activity valleys
        lo, hi = int(h[0]), int(h[-1])
        dense = np.zeros(hi - lo + 1, np.int64)
        dense[h - lo] = n
        if len(dense) < 3:
            is_peak = np.zeros(len(dense), bool)
        else:
            is_peak = np.zeros(len(dense), bool)
            is_peak[1:-1] = (dense[1:-1] > dense[:-2]) \
                & (dense[1:-1] > dense[2:])
        idx = np.nonzero(is_peak)[0]
        if not len(idx):
            return pd.DataFrame({
                "event_type": [g["event_type"].iloc[0]],
                "n_peaks": np.int64(0), "max_peak_n": np.int64(0),
                "max_peak_hour": np.int64(-1)})
        vals = dense[idx]
        best = idx[np.lexsort((idx, -vals))[0]]
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_peaks": np.int64(len(idx)),
            "max_peak_n": np.int64(dense[best]),
            "max_peak_hour": np.int64(lo + best)})

    return hourly.groupby("event_type").map_groups(peaks,
                                                   batch_format="pandas")


def rate_limit_audit(events_ds, per_minute_cap: int = 1,
                     user_col: str = "user_id"):
    """Rate-limit AUDIT — which users burst past a per-minute event cap
    and how hard (the throttling/abuse observability scan): per user,
    the number of minutes exceeding ``per_minute_cap`` events and the
    worst per-minute burst. Exact integers.

    Plan: map-side (user, minute) count partials (each batch emits one
    row per pair it saw — the tumbling-fold discipline, raw events
    never shuffle); one coarse-bucket fold closes the per-pair counts
    AND reduces them straight to the per-user violation stats inside
    the same fold, so only user-bounded rows leave it. Output
    (user_id, n_violation_minutes, max_per_minute) for users with at
    least one violation, sorted by user.
    """
    from ..util import bucketed_fold

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        minute = (df.ts.astype("datetime64[ns]").astype("int64")
                  // (60 * 10**9))
        g = (pd.DataFrame({"u": df[user_col].to_numpy(np.int64),
                           "m": minute.to_numpy(np.int64)})
             .groupby(["u", "m"], sort=False).size().reset_index(name="n"))
        g["n"] = g["n"].astype(np.int64)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per_pair = (g.groupby(["u", "m"], sort=False)["n"].sum()
                    .reset_index())
        viol = per_pair[per_pair["n"] > per_minute_cap]
        if not len(viol):
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_violation_minutes":
                                     pd.Series([], dtype=np.int64),
                                 "max_per_minute":
                                     pd.Series([], dtype=np.int64)})
        out = (viol.groupby("u")["n"].agg(["size", "max"]).reset_index())
        return pd.DataFrame({
            "user_id": out["u"].to_numpy(np.int64),
            "n_violation_minutes": out["size"].to_numpy(np.int64),
            "max_per_minute": out["max"].to_numpy(np.int64)})

    OUT = pa.schema([("user_id", pa.int64()),
                     ("n_violation_minutes", pa.int64()),
                     ("max_per_minute", pa.int64())])
    # bucket by USER so one fold sees every (user, minute) partial of its
    # users — violation stats close exactly in one pass
    res = bucketed_fold(
        events_ds.select_columns([user_col, "ts"]).map_batches(
            partial, batch_format="pandas", batch_size=65536),
        "u", fold, clean_schema=OUT).materialize()
    if int(res.count()) == 0:
        # nobody bursts: a TYPED empty result (drop_empty_blocks leaves
        # a schema-less dataset otherwise)
        import ray.data as rd
        return rd.from_arrow(pa.table({k: [] for k in OUT.names},
                                      schema=OUT))
    return res.sort("user_id")
