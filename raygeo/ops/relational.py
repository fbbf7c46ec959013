"""Relational operators over the TPC-H-ish tables: the generic engine plumbing
(partial-aggregate groupby, broadcast join, sort/top-k, sessionization).

These prove the wide-step machinery the geocube pipelines reuse:
- map-side partial aggregation before every groupby (never shuffle raw rows);
- broadcast hash join for small dimension sides (``ray.put`` once);
- event-time windows as keyed ``map_groups`` over ts-sorted groups.

Monetary sums are computed in integer cents (per-row ROUND then SUM) so the
result is bit-exact and summation-order independent — the DuckDB oracle does
the same arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import table_from_pandas


def q1_pricing_summary(lineitem_ds, cutoff: str = "1998-09-01"):
    """TPC-H Q1-style pricing summary with exact integer-cents sums."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"), pa.scalar(np.datetime64(cutoff, "us"))))
        df = t.to_pandas()
        df["base_cents"] = np.rint(df.l_extendedprice * 100).astype("int64")
        df["disc_pct"] = np.rint(df.l_discount * 100).astype("int64")
        df["disc_cents"] = df.base_cents * (100 - df.disc_pct)  # cents*1e2 units
        df["qty_i"] = np.rint(df.l_quantity).astype("int64")
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty_i", "sum"),
                sum_base_cents=("base_cents", "sum"),
                sum_disc_cents=("disc_cents", "sum"),
                count_order=("qty_i", "size"),
            )
            .reset_index()
        )
        return table_from_pandas(g)

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=65536)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
        Sum("count_order", alias_name="count_order"),
    )


def _sorted_probe(keys: np.ndarray, probe: np.ndarray):
    """Inner-join probe of ``probe`` against sorted ``keys``.

    Returns (positions, found_mask): positions are valid only where found.
    A missing key must NOT silently match the next-larger key (and a probe
    beyond max(keys) must not IndexError) — rows with missing keys are
    dropped by the caller, matching SQL inner-join semantics.
    """
    if len(keys) == 0:  # empty dimension slice: nothing matches
        return (np.zeros(len(probe), np.int64),
                np.zeros(len(probe), bool))
    pos = np.searchsorted(keys, probe)
    pos_c = np.clip(pos, 0, len(keys) - 1)
    found = keys[pos_c] == probe
    return pos_c, found


def revenue_by_nation(lineitem_ds, orders_path: str, customer_path: str,
                      nation_path: str, num_partitions: int | None = None):
    """lineitem ⋈ orders ⋈ customer ⋈ nation, revenue summed per nation.

    The fact⋈fact step (lineitem ⋈ orders) is a **partitioned hash join**
    (``Dataset.join``): both sides hash-shuffle on the order key, so neither
    grows-with-SF table is ever broadcast. lineitem is pre-aggregated
    map-side to one (l_orderkey, revenue_cents) row per key per batch before
    the join, so the shuffle carries partial sums, not raw line items.
    customer and nation are genuinely small dimension sides (fixed row
    counts per SF class) and stay broadcast lookups, with validated probes
    (missing keys drop, inner-join semantics).
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..util import join_partitions

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(nation_path, columns=["n_nationkey", "n_name"])
    c_key = cust.column("c_custkey").to_numpy()
    c_nat = cust.column("c_nationkey").to_numpy()
    cust_sorted = np.argsort(c_key)
    n_key = nation.column("n_nationkey").to_numpy()
    nat_sorted = np.argsort(n_key)
    n_name = np.array(nation.column("n_name").to_pylist(), dtype=object)
    dim_ref = ray.put((c_key[cust_sorted], c_nat[cust_sorted],
                       n_key[nat_sorted], n_name[nat_sorted]))

    def partial_rev(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64)
        )
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "revenue_cents": cents})
        g = df.groupby("l_orderkey", sort=False)["revenue_cents"].sum().reset_index()
        return table_from_pandas(g)

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(partial_rev, batch_format="pyarrow", batch_size=65536)

    from ..util import read_parquet_clean

    orders = read_parquet_clean(orders_path, columns=["o_orderkey", "o_custkey"])
    joined = rev.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def to_nation(t: pa.Table) -> pa.Table:
        ck, cn, nk, nn = ray.get(dim_ref)
        custkey = t.column("o_custkey").to_numpy()
        cents = t.column("revenue_cents").to_numpy()
        cpos, cfound = _sorted_probe(ck, custkey)
        natkey = cn[cpos]
        npos, nfound = _sorted_probe(nk, natkey)
        keep = cfound & nfound
        df = pd.DataFrame({"n_name": nn[npos][keep],
                           "revenue_cents": cents[keep]})
        g = df.groupby("n_name", sort=False)["revenue_cents"].sum().reset_index()
        return table_from_pandas(g)

    partials = joined.map_batches(to_nation, batch_format="pyarrow",
                                  batch_size=65536)
    return partials.groupby("n_name").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents")
    )


def top_orders_by_revenue(lineitem_ds, k: int = 10):
    """groupby(orderkey) revenue -> global sort desc -> limit k."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cents = np.rint(df.l_extendedprice * 100).astype("int64") * (
            100 - np.rint(df.l_discount * 100).astype("int64")
        )
        g = (
            pd.DataFrame({"l_orderkey": df.l_orderkey, "revenue_cents": cents})
            .groupby("l_orderkey", sort=False)["revenue_cents"]
            .sum()
            .reset_index()
        )
        return table_from_pandas(g)

    rev = (
        lineitem_ds.select_columns(["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    return rev.sort(["revenue_cents", "l_orderkey"], descending=[True, True]).limit(k)


def events_hourly(events_ds):
    """Tumbling 1-hour window aggregate: (event_type, hour) count + cents sum."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        hour = df.ts.dt.floor("h")
        cents = np.rint(df.value * 100).astype("int64")
        g = (
            pd.DataFrame({"event_type": df.event_type, "hour": hour,
                          "value_cents": cents})
            .groupby(["event_type", "hour"], sort=False)
            .agg(n_events=("value_cents", "size"), value_cents=("value_cents", "sum"))
            .reset_index()
        )
        return table_from_pandas(g)

    partials = events_ds.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    )
    return partials.groupby(["event_type", "hour"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )


def sessionize(events_ds, gap_minutes: int = 30):
    """Session windows per user (gap-based), reference streaming-shape op.

    Partition by user_id (keyed shuffle), sort each group by ts, split where
    the gap exceeds ``gap_minutes``. Output (user_id, n_sessions, n_events,
    max_session_events).
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g.ts.to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        sess = np.cumsum(new_session)
        sizes = pd.Series(sess).value_counts()
        return pd.DataFrame(
            {
                "user_id": [g.user_id.iloc[0]],
                "n_sessions": [int(sess[-1])],
                "n_events": [len(g)],
                "max_session_events": [int(sizes.max())],
            }
        )

    return (
        events_ds.select_columns(["user_id", "ts"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
    )


def top_parts_by_price(part_ds, k: int = 20):
    """Global sort + limit over the part table (sort/top-k machinery)."""

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t.column("p_retailprice"), 100.0)), pa.int64())
        return pa.table({"p_partkey": t.column("p_partkey"), "price_cents": c})

    return (
        part_ds.select_columns(["p_partkey", "p_retailprice"])
        .map_batches(cents, batch_format="pyarrow")
        .sort(["price_cents", "p_partkey"], descending=[True, True])
        .limit(k)
    )


def sliding_window_hourly(events_ds, window_hours: int = 3):
    """Sliding event-time window: per (event_type, hour), count + cents sum
    over the trailing ``window_hours`` bucket range [h-(w-1), h].

    The custom windowed-aggregate pattern: tumbling map-side partials (one
    row per (key, hour) per batch) -> small ``groupby`` merge -> per-key
    ``map_groups`` computing the trailing window on a DENSE bucket axis via
    prefix sums (gap-aware, so it matches SQL ``RANGE BETWEEN w-1 PRECEDING
    AND CURRENT ROW``). Only tumbling partials shuffle — never raw events.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        bucket = df.ts.astype("datetime64[ns]").astype("int64") // (3600 * 10**9)
        cents = np.rint(df.value * 100).astype("int64")
        g = (
            pd.DataFrame({"event_type": df.event_type, "hour_bucket": bucket,
                          "value_cents": cents})
            .groupby(["event_type", "hour_bucket"], sort=False)
            .agg(n_events=("value_cents", "size"),
                 value_cents=("value_cents", "sum"))
            .reset_index()
        )
        return table_from_pandas(g)

    hourly = (
        events_ds.select_columns(["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour_bucket"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("value_cents", alias_name="value_cents"),
        )
    )

    w = window_hours

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour_bucket")
        lo, hi = int(g.hour_bucket.min()), int(g.hour_bucket.max())
        n = hi - lo + 1
        dense_n = np.zeros(n + 1, dtype=np.int64)  # prefix arrays
        dense_c = np.zeros(n + 1, dtype=np.int64)
        idx = g.hour_bucket.to_numpy() - lo
        dense_n[idx + 1] = g.n_events.to_numpy()
        dense_c[idx + 1] = g.value_cents.to_numpy()
        pn = np.cumsum(dense_n)
        pc_ = np.cumsum(dense_c)
        start = np.maximum(idx - (w - 1), 0)
        return pd.DataFrame(
            {
                "event_type": g.event_type.to_numpy(),
                "hour_bucket": g.hour_bucket.to_numpy(),
                "win_events": pn[idx + 1] - pn[start],
                "win_cents": pc_[idx + 1] - pc_[start],
            }
        )

    return hourly.groupby("event_type").map_groups(trailing, batch_format="pandas")


def q3_shipping(lineitem_ds, orders_path: str, customer_path: str,
                segment: str = "BUILDING", cutoff: str = "1995-03-15",
                k: int = 10, num_partitions: int | None = None):
    """TPC-H Q3 shape: unshipped-order revenue ranking.

    Plan: the segment-qualified custkey set is a broadcast sorted array
    (customer is a dimension table); orders are date- and custkey-filtered
    at the read side; lineitem pre-aggregates revenue per orderkey map-side
    before the partitioned hash join with the filtered orders; a tiny
    final groupby + top-k sort ranks the orders. Fact tables are never
    broadcast; the join input carries one partial row per orderkey per
    batch, not raw line items.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Min, Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    cutoff_ts = np.datetime64(cutoff)

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_mktsegment"])
    seg_keys = np.sort(
        cust.filter(pc.equal(cust.column("c_mktsegment"), segment))
        .column("c_custkey").to_numpy()
    )
    seg_ref = ray.put(seg_keys)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilter(t: pa.Table) -> pa.Table:
        ck = ray.get(seg_ref)
        od = t.column("o_orderdate").to_numpy()
        okc = t.column("o_custkey").to_numpy()
        pos, found = _sorted_probe(ck, okc)
        keep = (od < cutoff_ts) & found
        return t.filter(pa.array(keep)).select(["o_orderkey", "o_orderdate"])

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow",
                                  batch_size=65536)

    def lpartial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy()
        keep = sd > cutoff_ts
        t = t.filter(pa.array(keep))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64)
        )
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "revenue_c4": cents})
        g = df.groupby("l_orderkey", sort=False)["revenue_c4"].sum().reset_index()
        return table_from_pandas(g)

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    joined = rev.join(orders_f, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))
    agg = joined.groupby("l_orderkey").aggregate(
        Sum("revenue_c4", alias_name="revenue_c4"),
        Min("o_orderdate", alias_name="o_orderdate"),
    )
    top = agg.sort(["revenue_c4", "o_orderdate", "l_orderkey"],
                   descending=[True, False, False]).limit(k).to_pandas()
    top["o_orderdate"] = top["o_orderdate"].dt.strftime("%Y-%m-%d")
    return top[["l_orderkey", "revenue_c4", "o_orderdate"]]


def grouped_bucket_quantiles(ds, key_col: str, value_col: str,
                             bucket_cents: int = 1000,
                             qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Distributed grouped quantiles via a bounded histogram.

    Exact per-group quantiles need a per-group sort — a group holding
    billions of rows at corpus scale. Instead each batch emits per
    (key, value-bucket) counts (bucket = integer cents // ``bucket_cents``),
    the groupby reduces histograms (volume bounded by keys x buckets, NOT
    rows), and the driver picks the bucket containing each rank from the
    tiny cumulative histogram. The result is deterministic and
    SQL-replayable: quantile resolution is one bucket (``bucket_cents``
    cents), an explicit, documented discretization — not a sketch.

    Returns (key, q, bucket_lo_cents) — the inclusive lower bound of the
    bucket holding the percentile_disc-rank element.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": t.column(key_col).to_pylist(),
            "bucket": (np.rint(t.column(value_col).to_numpy() * 100)
                       .astype(np.int64) // bucket_cents),
        })
        g = df.groupby(["k", "bucket"], sort=False).size().rename("n").reset_index()
        return table_from_pandas(g)

    hist = (ds.select_columns([key_col, value_col])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["k", "bucket"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # keys x buckets rows — small by construction

    out_k, out_q, out_lo = [], [], []
    for k, g in hist.groupby("k"):
        g = g.sort_values("bucket")
        cum = g.n.cumsum().to_numpy()
        total = int(cum[-1])
        for q in qs:
            rank = max(1, int(np.ceil(q * total)))  # percentile_disc rank
            idx = int(np.searchsorted(cum, rank))
            out_k.append(k)
            out_q.append(q)
            out_lo.append(int(g.bucket.to_numpy()[idx]) * bucket_cents)
    return pd.DataFrame({key_col: out_k, "q": out_q,
                         "bucket_lo_cents": out_lo}).sort_values(
        [key_col, "q"]).reset_index(drop=True)


def _bloom_hash(keys: np.ndarray, m_bits: int, salt: np.uint64) -> np.ndarray:
    """Vectorized multiply-xorshift hash of int64 keys into [0, m_bits)."""
    x = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + salt
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x % np.uint64(m_bits)).astype(np.int64)


_BLOOM_SALTS = (np.uint64(0xA5A5A5A5A5A5A5A5), np.uint64(0x0123456789ABCDEF))


def _bloom_build(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Bitmap (uint8 array of m_bits/8 bytes) with every key's k=2 bits set."""
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    for salt in _BLOOM_SALTS:
        pos = _bloom_hash(keys, m_bits, salt)
        np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bm


def _bloom_maybe(bm: np.ndarray, keys: np.ndarray, m_bits: int) -> np.ndarray:
    """Membership mask: True = possibly present, False = definitely absent."""
    ok = np.ones(len(keys), dtype=bool)
    for salt in _BLOOM_SALTS:
        pos = _bloom_hash(keys, m_bits, salt)
        ok &= (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return ok


def bloom_semijoin_shipmode(lineitem_ds, orders_path: str,
                            priority: str = "1-URGENT",
                            m_bits: int = 1 << 20,
                            num_partitions: int | None = None):
    """Revenue of lineitems whose order has the given priority, by return flag.

    The large⋈large semi-join pattern for 100 TB: a *fixed-size* Bloom
    filter of the qualifying orderkeys is folded from per-batch partial
    bitmaps (the driver ORs num_batches × m/8-byte arrays — constant in
    data size) and broadcast once; the probe side drops definite
    non-members before the exact partitioned hash join, so the shuffle
    carries only survivors (qualifying fraction + false positives) instead
    of the whole fact table. Exactness never depends on the filter — the
    keyed join verifies every survivor.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_orderpriority"])

    def obloom(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("o_orderpriority"), priority)
        keys = t.filter(keep).column("o_orderkey").to_numpy()
        bm = _bloom_build(keys, m_bits)
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    parts = orders.map_batches(obloom, batch_format="pyarrow",
                               batch_size=65536).take_all()
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:  # constant-size state per batch, not data-size
        bm |= np.frombuffer(row["bm"], dtype=np.uint8)
    bm_ref = ray.put(bm)

    def okeys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("o_orderpriority"), priority)
        return t.filter(keep).select(["o_orderkey"])

    orders_q = orders.map_batches(okeys, batch_format="pyarrow",
                                  batch_size=65536)

    def lprobe(t: pa.Table) -> pa.Table:
        bmap = ray.get(bm_ref)
        lk = t.column("l_orderkey").to_numpy()
        t = t.filter(pa.array(_bloom_maybe(bmap, lk, m_bits)))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev_c4 = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "l_returnflag": t.column("l_returnflag").to_numpy(),
                           "revenue_c4": rev_c4, "n": np.int64(1)})
        g = (df.groupby(["l_orderkey", "l_returnflag"], sort=False)
             .agg(revenue_c4=("revenue_c4", "sum"), n=("n", "sum"))
             .reset_index())
        return table_from_pandas(g)

    survivors = lineitem_ds.select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(lprobe, batch_format="pyarrow", batch_size=65536)

    joined = survivors.join(orders_q, join_type="inner",
                            num_partitions=num_partitions,
                            on=("l_orderkey",), right_on=("o_orderkey",))
    return joined.groupby("l_returnflag").aggregate(
        Sum("revenue_c4", alias_name="revenue_c4"),
        Sum("n", alias_name="n_items"),
    )


def grouped_topk(ds, group_col: str, order_col: str, id_col: str,
                 k: int = 2, cents: bool = True):
    """Top-k rows per group by order_col desc (ties: id_col asc) with rank.

    The window-function ``row_number() OVER (PARTITION BY g ORDER BY v)``
    analog: a map-side partial top-k per group per batch caps the shuffle
    at k rows per (group, batch), then a keyed ``map_groups`` finishes the
    rank — skew-proof because a hot group contributes at most k rows per
    batch regardless of its size.
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if cents:
            df = df.assign(
                _v=np.rint(df[order_col].to_numpy() * 100).astype("int64"))
        else:
            df = df.assign(_v=df[order_col])
        df = df.sort_values([group_col, "_v", id_col],
                            ascending=[True, False, True], kind="mergesort")
        return (df.groupby(group_col, sort=False).head(k)
                [[group_col, id_col, "_v"]])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_v", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
        out = df.rename(columns={"_v": f"{order_col}_c" if cents else order_col})
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    partials = ds.select_columns([group_col, order_col, id_col]).map_batches(
        partial, batch_format="pandas", batch_size=65536)
    return partials.groupby(group_col).map_groups(
        final, batch_format="pandas")


def interval_range_join(events_ds, intervals: list[tuple[str, str, str]]):
    """Events × interval-set range join with per-interval aggregates.

    ``intervals`` is a small broadcast side of (interval_id, start, end)
    half-open [start, end) windows that MAY OVERLAP — each event lands in
    every interval containing its ts (a true range join, not bucketing).
    The per-batch kernel is one vectorized mask per interval (K small);
    output is a per-batch partial (interval_id, n, value_cents) folded by
    a K-row groupby. For large K the mask loop becomes searchsorted over
    interval endpoints; the shuffle volume (K rows per batch) is the same.
    """
    from ray.data.aggregate import Sum

    ids = [i for i, _, _ in intervals]
    starts = np.array([np.datetime64(s, "us") for _, s, _ in intervals])
    ends = np.array([np.datetime64(e, "us") for _, _, e in intervals])

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy()
        val = t.column("value").to_numpy()
        cents = np.rint(val * 100).astype(np.int64)
        out_id, out_n, out_c = [], [], []
        for j, iid in enumerate(ids):
            m = (ts >= starts[j]) & (ts < ends[j])
            n = int(m.sum())
            if n:
                out_id.append(iid)
                out_n.append(n)
                out_c.append(int(cents[m].sum()))
        return pa.table({
            "interval_id": pa.array(out_id, type=pa.string()),
            "n_events": pa.array(out_n, type=pa.int64()),
            "value_cents": pa.array(out_c, type=pa.int64()),
        })

    partials = events_ds.select_columns(["ts", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("interval_id").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("value_cents", alias_name="value_cents"),
    )


def grouped_zscore(events_ds, key_col: str = "event_type",
                   value_col: str = "value", id_col: str = "event_id"):
    """Per-group standardization (the AVG/STDDEV OVER (PARTITION BY) analog).

    Two streaming passes: pass 1 folds per-group (n, sum, sum-of-squares)
    in integer cents — a groups-sized table pulled to the driver and
    broadcast; pass 2 standardizes each row against its group's moments.
    All arithmetic that feeds the float output is integer sums followed by
    IEEE double divide/sqrt (both correctly rounded), so the z-scores are
    bit-identical to the SQL oracle's same-formula computation.
    """
    import ray
    from ray.data.aggregate import Sum

    def moments(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"k": t.column(key_col).to_pandas(),
                           "n": np.int64(1), "s": cents, "ss": cents * cents})
        g = (df.groupby("k", sort=False)
             .agg(n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum"))
             .reset_index())
        return table_from_pandas(g)

    mom = (events_ds.select_columns([key_col, value_col])
           .map_batches(moments, batch_format="pyarrow", batch_size=65536)
           .groupby("k").aggregate(Sum("n", alias_name="n"),
                                   Sum("s", alias_name="s"),
                                   Sum("ss", alias_name="ss"))
           .to_pandas())
    keys = mom["k"].to_numpy()
    order = np.argsort(keys)
    mom_ref = ray.put((keys[order],
                       mom["n"].to_numpy()[order].astype(np.int64),
                       mom["s"].to_numpy()[order].astype(np.int64),
                       mom["ss"].to_numpy()[order].astype(np.int64)))

    def standardize(t: pa.Table) -> pa.Table:
        ks, ns, sums, sumsqs = ray.get(mom_ref)
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, k)
        n = ns[idx].astype(np.float64)
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        mean = sums[idx] / n
        # population variance from integer sums: E[x^2] - E[x]^2
        var = sumsqs[idx] / n - mean * mean
        sd = np.sqrt(var)
        z = (cents - mean) / sd
        return pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            "value_cents": pa.array(cents, type=pa.int64()),
            "zscore": pa.array(z, type=pa.float64()),
        })

    return events_ds.select_columns([id_col, key_col, value_col]).map_batches(
        standardize, batch_format="pyarrow", batch_size=65536)


def pivot_sum(ds, row_col: str, col_col: str, value_col: str,
              categories: list[str]):
    """Pivot: one output column per category, summed in integer cents.

    The category set is declared up front (small, fixed), so the map side
    emits an already-pivoted partial — one row per row_col value per batch
    with K category columns — and the groupby just sums columns. No
    two-phase discovery pass, no per-category shuffle.
    """
    from ray.data.aggregate import Sum

    cols = [f"sum_{c.lower().replace('-', '_').replace(' ', '_')}"
            for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"r": t.column(row_col).to_pandas(),
                           "c": t.column(col_col).to_pandas()})
        for cat, name in zip(categories, cols):
            df[name] = np.where(df["c"].to_numpy() == cat, cents, 0)
        g = (df.drop(columns="c").groupby("r", sort=False).sum()
             .reset_index().rename(columns={"r": row_col}))
        return table_from_pandas(g)

    partials = ds.select_columns([row_col, col_col, value_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(row_col).aggregate(
        *[Sum(c, alias_name=c) for c in cols])


def rollup_sum(ds, row_col: str, col_col: str, value_col: str):
    """GROUP BY ROLLUP(a, b) analog: subtotal and grand-total rows.

    Only the finest granularity (a, b) is folded distributed (map-side
    partials, one row per (a, b) per batch); the coarser levels are
    derived from that tiny aggregate in a final single-block map — never a
    second pass over the data. NULL group keys are encoded as the string
    'ALL' so the schema stays non-nullable."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"a": t.column(row_col).to_pandas().astype(str),
                           "b": t.column(col_col).to_pandas().astype(str),
                           "v": cents, "n": np.int64(1)})
        g = (df.groupby(["a", "b"], sort=False)
             .agg(v=("v", "sum"), n=("n", "sum")).reset_index())
        return table_from_pandas(g)

    fine = ds.select_columns([row_col, col_col, value_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).groupby(["a", "b"]).aggregate(Sum("v", alias_name="v"),
                                    Sum("n", alias_name="n"))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        lvl_a = (df.groupby("a", as_index=False).agg(v=("v", "sum"),
                                                     n=("n", "sum")))
        lvl_a["b"] = "ALL"
        total = pd.DataFrame({"a": ["ALL"], "b": ["ALL"],
                              "v": [df["v"].sum()], "n": [df["n"].sum()]})
        out = pd.concat([df[["a", "b", "v", "n"]], lvl_a[["a", "b", "v", "n"]],
                         total], ignore_index=True)
        return out.rename(columns={"a": row_col, "b": col_col,
                                   "v": "value_cents", "n": "n_rows"})

    # the fine aggregate is groups-sized: collapse to one block and expand
    return fine.repartition(1).map_batches(expand, batch_format="pandas",
                                           batch_size=None)


def grouped_distinct_count(ds, key_col: str, distinct_col: str):
    """Exact COUNT(DISTINCT x) per group (the KMV sketch's exact sibling).

    Map side emits per-batch distinct (key, x) pairs — the first dedup
    level, collapsing within-batch repeats before any shuffle; a keyed
    groupby then collapses cross-batch repeats and a pandas nunique per
    group finishes. Shuffle volume is the number of distinct pairs, the
    information-theoretic minimum for an exact answer (the sketch path is
    the constant-memory alternative when that is too much)."""
    def pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_col: t.column(key_col).to_pandas(),
                           distinct_col: t.column(distinct_col).to_pandas()})
        return table_from_pandas(df.drop_duplicates())

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n_distinct": np.int64(g[distinct_col].nunique()),
        })

    partial = ds.select_columns([key_col, distinct_col]).map_batches(
        pairs, batch_format="pyarrow", batch_size=65536)
    return partial.groupby(key_col).map_groups(fold, batch_format="pandas")


_FUNNEL_ABSENT = np.int64(1 << 62)  # sentinel: stage never reached


def funnel_counts(events_ds, stages: list[str],
                  user_col: str = "user_id", type_col: str = "event_type"):
    """Ordered funnel: users reaching stage i with strictly increasing
    first-occurrence timestamps through stages 0..i.

    Fully distributed and vectorized: the map side emits one WIDE partial
    row per user per batch (first-occurrence int64 ts per stage, absent =
    sentinel), the keyed groupby Min-folds each stage column, and the
    strict-order chain comparison runs vectorized over the one-row-per-
    user aggregate (safe at any batch boundary). A final K-row partial
    histogram folds the counts. Shuffle volume is users x batches wide
    rows; no single-block collapse anywhere.
    """
    from ray.data.aggregate import Min, Sum

    cols = [f"ts_{i}" for i in range(len(stages))]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"u": t.column(user_col).to_numpy(),
                           "s": t.column(type_col).to_pandas(),
                           "ts": t.column("ts").to_numpy().astype(
                               "datetime64[us]").astype(np.int64)})
        out = None
        for i, s in enumerate(stages):
            g = (df[df["s"] == s].groupby("u", sort=False)["ts"].min()
                 .rename(cols[i]))
            out = g.to_frame() if out is None else out.join(g, how="outer")
        if out is None or len(out) == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             **{c: pa.array([], pa.int64()) for c in cols}})
        for c in cols:
            if c not in out.columns:
                out[c] = np.float64(np.nan)
        filled = out[cols].fillna(np.float64(_FUNNEL_ABSENT)).astype(np.int64)
        filled.insert(0, "u", out.index.to_numpy())
        return table_from_pandas(filled.reset_index(drop=True))

    mins = events_ds.select_columns([user_col, type_col, "ts"]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).groupby("u").aggregate(*[Min(c, alias_name=c) for c in cols])

    def chain(t: pa.Table) -> pa.Table:
        n = len(t)
        ok = np.ones(n, dtype=bool)
        prev = np.full(n, np.int64(-1))
        reached = np.zeros((n, len(stages)), dtype=np.int64)
        for i, c in enumerate(cols):
            ts = t.column(c).to_numpy()
            ok = ok & (ts != _FUNNEL_ABSENT) & (ts > prev)
            reached[:, i] = ok
            prev = np.where(ok, ts, prev)
        sums = reached.sum(axis=0)
        return pa.table({"stage_idx": pa.array(range(len(stages)), pa.int64()),
                         "n_users": pa.array(sums, pa.int64())})

    counts = mins.map_batches(chain, batch_format="pyarrow", batch_size=65536)
    agg = counts.groupby("stage_idx").aggregate(
        Sum("n_users", alias_name="n_users"))

    def name_stages(t: pa.Table) -> pa.Table:
        idx = t.column("stage_idx").to_numpy()
        return t.append_column(
            "stage", pa.array([stages[i] for i in idx], pa.string()))

    return agg.map_batches(name_stages, batch_format="pyarrow")


def orders_fulfillment(lineitem_ds, orders_path: str,
                       num_partitions: int | None = None):
    """Per-orderstatus fulfillment report via a LEFT OUTER partitioned join.

    Orders with no lineitems must survive (revenue 0, counted as empty):
    lineitem revenue is exactly pre-aggregated to one row per orderkey
    (map-side partials + keyed groupby) BEFORE the left join — joining
    partials directly would duplicate the preserved left rows. The outer
    join itself is the same hash-shuffle exchange as the inner joins, with
    null-probe rows kept."""
    from ray.data.aggregate import Sum

    from ..util import bucketed_sum, join_partitions, \
        read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)

    def lpartial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev_c4 = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "revenue_c4": rev_c4})
        g = (df.groupby("l_orderkey", sort=False)["revenue_c4"].sum()
             .reset_index())
        return table_from_pandas(g)

    rev = bucketed_sum(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount"]
        ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536),
        "l_orderkey", "revenue_c4",
        clean_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("revenue_c4", pa.int64())]))

    orders = read_parquet_clean(orders_path,
                                columns=["o_orderkey", "o_orderstatus"])
    joined = orders.join(rev, join_type="left_outer",
                         num_partitions=num_partitions,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def opartial(t: pa.Table) -> pa.Table:
        rv = t.column("revenue_c4").to_numpy(zero_copy_only=False)
        empty = pd.isna(rv)
        df = pd.DataFrame({
            "o_orderstatus": t.column("o_orderstatus").to_pandas(),
            "n_orders": np.int64(1),
            "n_empty": empty.astype(np.int64),
            "revenue_c4": np.where(empty, 0, rv).astype(np.int64),
        })
        g = (df.groupby("o_orderstatus", sort=False)
             .agg(n_orders=("n_orders", "sum"), n_empty=("n_empty", "sum"),
                  revenue_c4=("revenue_c4", "sum")).reset_index())
        return table_from_pandas(g)

    return joined.map_batches(opartial, batch_format="pyarrow",
                              batch_size=65536
                              ).groupby("o_orderstatus").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("n_empty", alias_name="n_empty"),
        Sum("revenue_c4", alias_name="revenue_c4"))


def inactive_customers(orders_ds, customer_path: str,
                       priority: str | None = None):
    """Customers with no (priority-filtered) orders: the distributed anti-join.

    The fact side (orders) streams into an exact distinct-custkey set —
    map-side per-batch distinct collapses repeats before the shuffle, the
    keyed groupby collapses across batches, and the result is bounded by
    the CUSTOMER table's cardinality (dimension-sized), so pulling it to
    the driver and probing the dimension against it broadcast-style is
    scale-safe. Output: one row per inactive customer."""
    import pyarrow.parquet as pq

    def pairs(t: pa.Table) -> pa.Table:
        if priority is not None:
            t = t.filter(pc.equal(t.column("o_orderpriority"), priority))
        u = np.unique(t.column("o_custkey").to_numpy())
        return pa.table({"o_custkey": pa.array(u, pa.int64())})

    from ..util import bucketed_distinct

    cols = ["o_custkey"] + ([] if priority is None else ["o_orderpriority"])
    distinct = bucketed_distinct(
        orders_ds.select_columns(cols)
        .map_batches(pairs, batch_format="pyarrow", batch_size=65536),
        "o_custkey",
        clean_schema=pa.schema([("o_custkey", pa.int64())]))
    active = np.sort(distinct.to_pandas()["o_custkey"].to_numpy())

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_mktsegment"])
    ck = cust.column("c_custkey").to_numpy()
    _, found = _sorted_probe(active, ck)
    out = cust.filter(pa.array(~found))
    return out.to_pandas().sort_values("c_custkey").reset_index(drop=True)


def cohort_retention(events_ds, user_col: str = "user_id",
                     num_partitions: int | None = None):
    """Cohort retention matrix: users bucketed by first-active day, distinct
    users counted per (cohort_day, day_offset) cell.

    The training-dashboard classic (and a generalized self-join shape: each
    user's rows joined against that user's own MIN). TWO exchanges total,
    both on coarse bucket keys — the previous 4-exchange plan (repartition +
    (u,day) sort-groupby + Min sort-groupby + hash join) spent ~0.1 ms of
    per-key Python on each of its ~90k distinct keys twice (measured 22.4 s
    at sf0.1; this plan: the same cells in ~2 s):

    - map side collapses each batch to its distinct (user, epoch-day) pairs,
      so the one wide exchange carries at most one row per user per active
      day per batch — a hot user is absorbed map-side;
    - pairs shuffle ONCE on ``hash(u) % buckets`` (``util.bucketed_fold``);
      every row of a user lands in one bucket, so the in-bucket vectorized
      pandas fold computes the global distinct set, each user's true
      cohort MIN, and the (cohort, offset) partial cells without any
      cross-bucket traffic;
    - per-bucket partial cells re-fold on the (cohort, offset) key — tiny
      (cohort-days x offsets rows), second bucketed exchange.

    Output: (cohort_day 'YYYY-MM-DD' str, day_offset int64, n_users int64).
    """
    from ..util import bucketed_fold

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy()
        day = (t.column("ts").to_numpy().astype("datetime64[D]")
               .astype(np.int64))
        df = pd.DataFrame({"u": u, "day": day}).drop_duplicates()
        return pa.table({"u": pa.array(df["u"].to_numpy(), pa.int64()),
                         "day": pa.array(df["day"].to_numpy(), pa.int64())})

    pair_ds = events_ds.select_columns([user_col, "ts"]).map_batches(
        pairs, batch_format="pyarrow", batch_size=65536)

    def cells_fold(g: pd.DataFrame) -> pd.DataFrame:
        # global per-user view: drop cross-bundle dup pairs, then the
        # user's min day is the cohort; vectorized via transform("min")
        d = g.drop_duplicates()
        cohort = d.groupby("u", sort=False)["day"].transform("min")
        cells = (pd.DataFrame({"cohort_day": cohort.to_numpy(),
                               "day_offset": d["day"].to_numpy()
                               - cohort.to_numpy()})
                 .groupby(["cohort_day", "day_offset"], sort=False)
                 .size().rename("n").reset_index())
        return cells.astype(np.int64)

    partial_cells = bucketed_fold(pair_ds, "u", cells_fold,
                                  num_buckets=num_partitions)

    def sum_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["cohort_day", "day_offset"], sort=False)["n"]
               .sum().rename("n_users").reset_index())
        return agg.astype(np.int64)

    cells = bucketed_fold(partial_cells, ["cohort_day", "day_offset"],
                          sum_fold)

    def finalize(t: pa.Table) -> pa.Table:
        days = t.column("cohort_day").to_numpy().astype("datetime64[D]")
        return pa.table({
            "cohort_day": pa.array(np.datetime_as_string(days, unit="D")),
            "day_offset": t.column("day_offset").cast(pa.int64()),
            "n_users": t.column("n_users").cast(pa.int64()),
        })

    return cells.map_batches(finalize, batch_format="pyarrow")


def q5_local_volume(lineitem_ds, orders_path: str, customer_path: str,
                    supplier_path: str, nation_path: str, region_path: str,
                    region: str = "ASIA", date_lo: str = "1996-01-01",
                    date_hi: str = "1998-01-01",
                    num_partitions: int | None = None):
    """TPC-H Q5 shape: revenue per nation where supplier and customer share
    the nation, restricted to one region and an order-date range.

    The 6-table star-join plan: region -> nation -> {customer, supplier}
    are genuinely dimension-sized and broadcast as sorted probe arrays;
    the fact⋈fact step (lineitem ⋈ date-filtered orders) is the one
    partitioned hash join. lineitem rows resolve their supplier nation
    MAP-SIDE (dropping out-of-region suppliers before any shuffle) and
    pre-aggregate per (orderkey, nation); the customer-nation equality is
    checked after the join against the broadcast customer probe. Shuffle
    volume: surviving per-(orderkey, nation) partials + filtered orders.
    """
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    nation = pq.read_table(nation_path,
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(region_path, columns=["r_regionkey", "r_name"])
    rkeys = {r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region}
    nat_rows = [r for r in nation.to_pylist() if r["n_regionkey"] in rkeys]
    nat_keys = np.sort(np.array([r["n_nationkey"] for r in nat_rows],
                                np.int64))
    nat_names = np.array(
        [r["n_name"] for r in sorted(nat_rows,
                                     key=lambda x: x["n_nationkey"])],
        dtype=object)

    supp = pq.read_table(supplier_path, columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy()
    sn = supp.column("s_nationkey").to_numpy().astype(np.int64)
    so = np.argsort(sk)
    cust = pq.read_table(customer_path, columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy()
    cn = cust.column("c_nationkey").to_numpy().astype(np.int64)
    co = np.argsort(ck)
    dim_ref = ray.put((sk[so], sn[so], ck[co], cn[co], nat_keys))

    def lpartial(t: pa.Table) -> pa.Table:
        skk, snn, _, _, nk = ray.get(dim_ref)
        ls = t.column("l_suppkey").to_numpy()
        pos, found = _sorted_probe(skk, ls)
        s_nat = np.where(found, snn[pos], -1)
        _, in_reg = _sorted_probe(nk, s_nat)
        keep = found & in_reg
        t = t.filter(pa.array(keep))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "s_nat": s_nat[keep], "revenue_c4": rev})
        g = (df.groupby(["l_orderkey", "s_nat"], sort=False)["revenue_c4"]
             .sum().reset_index())
        return table_from_pandas(g)

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilter(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy()
        return t.filter(pa.array((od >= d0) & (od < d1))).select(
            ["o_orderkey", "o_custkey"])

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow",
                                  batch_size=65536)
    joined = rev.join(orders_f, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def local_only(t: pa.Table) -> pa.Table:
        _, _, ckk, cnn, nk = ray.get(dim_ref)
        oc = t.column("o_custkey").to_numpy()
        pos, found = _sorted_probe(ckk, oc)
        c_nat = np.where(found, cnn[pos], -2)
        s_nat = t.column("s_nat").to_numpy()
        keep = found & (c_nat == s_nat)
        df = pd.DataFrame({
            "n_nationkey": s_nat[keep],
            "revenue_c4": t.column("revenue_c4").to_numpy()[keep],
        })
        g = (df.groupby("n_nationkey", sort=False)["revenue_c4"].sum()
             .reset_index())
        return table_from_pandas(g)

    agg = (joined.map_batches(local_only, batch_format="pyarrow",
                              batch_size=65536)
           .groupby("n_nationkey")
           .aggregate(Sum("revenue_c4", alias_name="revenue_c4")))

    def name(t: pa.Table) -> pa.Table:
        keys = t.column("n_nationkey").to_numpy()
        idx = np.searchsorted(nat_keys, keys)
        return pa.table({
            "n_name": pa.array(nat_names[idx], pa.string()),
            "revenue_c4": t.column("revenue_c4").cast(pa.int64()),
        })

    return agg.map_batches(name, batch_format="pyarrow")


def sql_round_cents(values: np.ndarray) -> np.ndarray:
    """value*100 -> int64 cents with SQL ``round()`` semantics
    (half-AWAY-from-zero). ``np.rint`` rounds half-to-even and diverges
    from every DuckDB oracle on exact .5-cent inputs (e.g. 0.125*100):
    the histogram-fold ops use THIS so engine-vs-oracle parity holds on
    every input, not just inputs that never land on a half cent."""
    v = np.asarray(values, dtype=np.float64) * 100.0
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(
        np.int64)


def _grouped_cents_hist(ds, key_col: str, value_col: str):
    """Shared domain-bounded (key, cents) histogram fold: map-side
    distinct-pair count partials, bounded block count, one keyed groupby.
    The single copy behind median / quantile_cont / MAD — a quantization
    or repartition change cannot silently diverge between them."""
    from ray.data.aggregate import Sum

    from ..util import cluster_cpus

    def partial(t: pa.Table) -> pa.Table:
        cents = sql_round_cents(t.column(value_col).to_numpy())
        df = pd.DataFrame({"k": t.column(key_col).to_pandas(), "cents": cents})
        g = (df.groupby(["k", "cents"], sort=False).size().rename("n")
             .reset_index())
        return table_from_pandas(g)

    return (ds.select_columns([key_col, value_col])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            # bound the block count before the sort-groupby: its cost grows
            # with blocks x partitions, and partial blocks are tiny
            .repartition(max(8, min(64, cluster_cpus())))
            .groupby(["k", "cents"])
            .aggregate(Sum("n", alias_name="n")))


def grouped_exact_median(ds, key_col: str, value_col: str):
    """EXACT per-group median (percentile_disc 0.5) via a full-resolution
    integer-cents histogram fold — the bucketed-quantile op's exact
    sibling for bounded-domain values.

    The shuffle carries distinct (key, cents) pairs with counts — bounded
    by the VALUE DOMAIN x keys, not the row count (prices are cents in
    [0, ~5e7]: at any scale the histogram stops growing once the domain
    is saturated). The median is the rank-ceil(n/2) element of the
    cumulative histogram: exact, deterministic, no sort of raw rows
    anywhere. Output: (key, n_rows, median_cents).
    """
    hist = _grouped_cents_hist(ds, key_col, value_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        rank = (total + 1) // 2  # ceil(n/2): percentile_disc(0.5)
        idx = int(np.searchsorted(cum, rank))
        return pd.DataFrame({key_col: [g["k"].iloc[0]],
                             "n_rows": np.int64(total),
                             "median_cents": np.int64(g["cents"].to_numpy()[idx])})

    return hist.groupby("k").map_groups(pick, batch_format="pandas")


def grouped_rank(ds, key_col: str, value_col: str, id_col: str):
    """Exact RANK() / percent_rank() of EVERY row within its group — the
    full-output window-ranking op (grouped_topk's unbounded sibling).

    Distributed ranking without a global sort: pass 1 folds the
    domain-bounded (key, cents) histogram (same shape as the exact
    median); the per-key cumulative histogram — key-cardinality x domain
    sized, NOT row-count sized — broadcasts; pass 2 streams every row and
    assigns rank = (# strictly smaller) + 1 by binary search. Ties share
    a rank exactly like SQL RANK(); percent_rank = (rank-1)/(n-1) is one
    exact IEEE division. No raw-row sort or shuffle anywhere — the only
    exchanges are histogram partials and the broadcast.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"k": t.column(key_col).to_pandas(), "cents": cents})
        g = df.groupby(["k", "cents"], sort=False).size().rename("n").reset_index()
        return table_from_pandas(g)

    from ..util import cluster_cpus

    hist = (ds.select_columns([key_col, value_col])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            # bound the block count before the sort-groupby (blocks x
            # partitions cost; measured 23.9s -> 5.0s on 150k near-unique
            # cents at sf0.1/32cpus)
            .repartition(max(8, min(64, cluster_cpus())))
            .groupby(["k", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # keys x distinct-values rows (domain-bounded)

    lut = {}
    for k, g in hist.groupby("k"):
        g = g.sort_values("cents")
        cents = g["cents"].to_numpy()
        n = g["n"].to_numpy()
        before = np.concatenate(([0], np.cumsum(n)[:-1]))
        lut[k] = (cents, before, int(n.sum()))
    lut_ref = ray.put(lut)

    def assign(t: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        keys = pd.Series(t.column(key_col).to_pylist())
        codes, uniques = pd.factorize(keys, sort=False)
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        rank = np.empty(len(keys), np.int64)
        pr = np.empty(len(keys), np.float64)
        for ci, k in enumerate(uniques):  # one vectorized pass per key
            sel = codes == ci
            cs, before, total = table[k]
            pos = np.searchsorted(cs, cents[sel])
            r = before[pos] + 1
            rank[sel] = r
            pr[sel] = (r - 1) / (total - 1) if total > 1 else 0.0
        return pa.table({
            id_col: t.column(id_col),
            key_col: t.column(key_col),
            "rnk": pa.array(rank, pa.int64()),
            "pct_rank": pa.array(pr, pa.float64()),
        })

    return ds.select_columns([id_col, key_col, value_col]).map_batches(
        assign, batch_format="pyarrow", batch_size=65536)


def priority_shipping(lineitem_ds, orders_path: str,
                      date_lo: str = "1996-01-01", date_hi: str = "1997-01-01",
                      high: tuple[str, ...] = ("1-URGENT", "2-HIGH"),
                      num_partitions: int | None = None):
    """TPC-H Q12 shape: line items shipped in a date window, classified by
    their order's priority — per return flag, how many came from
    high-priority vs low-priority orders.

    Plan: lineitem pre-aggregates map-side to one (l_orderkey,
    l_returnflag, n) partial per key per batch (the shuffle carries
    counts, never raw line items); the fact⋈fact step is a partitioned
    hash join against orders (both sides hash-shuffle on the order key —
    orders grows with SF so it is never broadcast); the post-join CASE
    fold is another map-side partial into a 3-row final groupby.
    All-integer counts: bit-exact vs the SQL oracle.
    """
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    def lpartial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy()
        t = t.filter(pa.array((sd >= d0) & (sd < d1)))
        df = pd.DataFrame({
            "l_orderkey": t.column("l_orderkey").to_numpy(),
            "l_returnflag": t.column("l_returnflag").to_pylist(),
        })
        g = (df.groupby(["l_orderkey", "l_returnflag"], sort=False)
             .size().rename("n").reset_index())
        # explicit types: a batch wholly outside the date window would
        # otherwise emit an empty OBJECT column that degrades to float64
        # and poisons downstream schema unification / the hash join
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "l_returnflag": pa.array(g["l_returnflag"].tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        })

    lcounts = lineitem_ds.select_columns(
        ["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_orderpriority"])
    joined = lcounts.join(orders, join_type="inner",
                          num_partitions=num_partitions,
                          on=("l_orderkey",), right_on=("o_orderkey",))

    high_set = frozenset(high)

    def case_fold(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority").to_pylist()
        n = t.column("n").to_numpy()
        is_high = np.fromiter((p in high_set for p in pr), bool, len(pr))
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pylist(),
            "high_line_count": np.where(is_high, n, 0),
            "low_line_count": np.where(is_high, 0, n),
        })
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        return pa.table({
            "l_returnflag": pa.array(g["l_returnflag"].tolist(), pa.string()),
            "high_line_count": pa.array(
                g["high_line_count"].to_numpy(np.int64), pa.int64()),
            "low_line_count": pa.array(
                g["low_line_count"].to_numpy(np.int64), pa.int64()),
        })

    return (joined.map_batches(case_fold, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("l_returnflag")
            .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                       Sum("low_line_count", alias_name="low_line_count")))


def discounted_revenue(lineitem_ds, part_path: str,
                       bands: list[tuple[str, int, int]] | None = None,
                       num_partitions: int | None = None):
    """TPC-H Q19 shape: revenue from brand-specific quantity bands
    (disjunctive brand × qty-range predicate), single-row answer.

    Plan: each lineitem row lands in zero or more qty bands; the map side
    folds one row per (l_partkey, band sums…) per batch — rows outside
    every band never leave the scan task. The banded partials then meet
    part in a partitioned hash join on the part key (part grows with SF:
    broadcast would re-ship a dimension that can be multi-GB at 100 TB);
    part is pre-filtered map-side to the banded brands, so the join's
    right side is ~3/25 of the table. The brand picks its band's sum
    post-join; integer cents throughout.
    """
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if bands is None:
        bands = [("Brand#11", 1, 11), ("Brand#12", 10, 20),
                 ("Brand#13", 20, 30)]
    brand_to_band = {b: i for i, (b, _, _) in enumerate(bands)}
    qty_lo = min(lo for _, lo, _ in bands)
    qty_hi = max(hi for _, _, hi in bands)
    if num_partitions is None:
        num_partitions = join_partitions(part_path)

    def lpartial(t: pa.Table) -> pa.Table:
        qty = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
        keep = (qty >= qty_lo) & (qty <= qty_hi)
        t, qty = t.filter(pa.array(keep)), qty[keep]
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        cents = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        cols = {"l_partkey": t.column("l_partkey").to_numpy()}
        for i, (_, lo, hi) in enumerate(bands):
            in_band = (qty >= lo) & (qty <= hi)
            cols[f"rev_b{i}"] = np.where(in_band, cents, 0)
        df = pd.DataFrame(cols)
        g = df.groupby("l_partkey", sort=False).sum().reset_index()
        return table_from_pandas(g)

    partials = lineitem_ds.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    banded_brands = frozenset(brand_to_band)

    def pfilter(t: pa.Table) -> pa.Table:
        br = t.column("p_brand").to_pylist()
        keep = np.fromiter((b in banded_brands for b in br), bool, len(br))
        return t.filter(pa.array(keep))

    part = read_parquet_clean(
        part_path, columns=["p_partkey", "p_brand"]
    ).map_batches(pfilter, batch_format="pyarrow", batch_size=65536)

    joined = partials.join(part, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_partkey",), right_on=("p_partkey",))

    def pick(t: pa.Table) -> pa.Table:
        br = t.column("p_brand").to_pylist()
        band = np.fromiter((brand_to_band[b] for b in br), np.int64, len(br))
        sums = np.stack([t.column(f"rev_b{i}").to_numpy()
                         for i in range(len(bands))], axis=1)
        rev = sums[np.arange(len(br)), band]
        return pa.table({"one": pa.array(np.zeros(1, np.int64)),
                         "revenue_c4": pa.array([int(rev.sum())], pa.int64())})

    agg = (joined.map_batches(pick, batch_format="pyarrow", batch_size=65536)
           .groupby("one").aggregate(Sum("revenue_c4",
                                         alias_name="revenue_c4"))
           .to_pandas())  # ≤ 1 row by construction (single-group aggregate)
    total = int(agg["revenue_c4"].sum()) if len(agg) else 0
    return pa.table({"revenue_c4": pa.array([total], pa.int64())})


def large_orders(lineitem_ds, orders_path: str, customer_path: str,
                 qty_threshold: int = 300, k: int = 20):
    """TPC-H Q18 shape: customers whose orders exceed a total-quantity
    threshold — HAVING-subquery decorrelated into an aggregate-then-
    semi-join plan.

    Plan: map-side per-orderkey qty partials → one keyed groupby → filter
    > threshold → top-k (sum_qty DESC, orderkey ASC). Only the ≤k
    surviving keys come to the driver (a bounded aggregate result, not
    data); they broadcast back as a tiny semi-join filter over orders,
    and the ≤k matching custkeys do the same over customer. No
    grows-with-SF table is ever broadcast or collected.
    """
    from ..util import read_parquet_clean

    def lpartial(t: pa.Table) -> pa.Table:
        qty = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "sum_qty": qty})
        g = df.groupby("l_orderkey", sort=False)["sum_qty"].sum().reset_index()
        return table_from_pandas(g)

    from ..util import bucketed_sum

    big = (bucketed_sum(
        lineitem_ds.select_columns(["l_orderkey", "l_quantity"])
        .map_batches(lpartial, batch_format="pyarrow", batch_size=65536),
        "l_orderkey", "sum_qty")
           .filter(expr=f"sum_qty > {qty_threshold}")
           .sort(["sum_qty", "l_orderkey"], descending=[True, False])
           .limit(k))
    big_df = big.to_pandas()  # ≤ k rows by construction
    if big_df.empty:
        return pa.table({"c_name": pa.array([], pa.string()),
                         "c_custkey": pa.array([], pa.int64()),
                         "o_orderkey": pa.array([], pa.int64()),
                         "o_orderdate": pa.array([], pa.string()),
                         "total_cents": pa.array([], pa.int64()),
                         "sum_qty": pa.array([], pa.int64())})
    okeys = np.sort(big_df["l_orderkey"].to_numpy(np.int64))

    def ofilter(t: pa.Table) -> pa.Table:
        ok = t.column("o_orderkey").to_numpy()
        return t.filter(pa.array(np.isin(ok, okeys)))

    orows = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_custkey", "o_orderdate",
                              "o_totalprice"]
    ).map_batches(ofilter, batch_format="pyarrow",
                  batch_size=65536).to_pandas()  # ≤ k rows

    ckeys = np.sort(orows["o_custkey"].to_numpy(np.int64))

    def cfilter(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy()
        return t.filter(pa.array(np.isin(ck, ckeys)))

    crows = read_parquet_clean(
        customer_path, columns=["c_custkey", "c_name"]
    ).map_batches(cfilter, batch_format="pyarrow",
                  batch_size=65536).to_pandas()  # ≤ k rows

    df = (big_df.merge(orows, left_on="l_orderkey", right_on="o_orderkey")
          .merge(crows, left_on="o_custkey", right_on="c_custkey"))
    df = df.sort_values(["sum_qty", "o_orderkey"],
                        ascending=[False, True]).head(k)
    return pa.table({
        "c_name": pa.array(df["c_name"].tolist(), pa.string()),
        "c_custkey": pa.array(df["c_custkey"].to_numpy(), pa.int64()),
        "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
        "o_orderdate": pa.array(
            [str(d)[:10] for d in df["o_orderdate"].tolist()], pa.string()),
        "total_cents": pa.array(
            np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64),
            pa.int64()),
        "sum_qty": pa.array(df["sum_qty"].to_numpy(), pa.int64()),
    })


def grouped_mode(ds, key_col: str, value_col: str):
    """Most-frequent value per key (grouped mode / categorical argmax);
    ties break to the lexicographically smallest value — matching a
    row_number() OVER (ORDER BY cnt DESC, value) = 1 window oracle.

    Plan: per-batch (key, value) count partials (the shuffle carries at
    most |distinct values| rows per key per batch), ONE keyed groupby,
    and the argmax picked inside ``map_groups`` — no second shuffle, no
    window sort.
    """
    def partial(t: pa.Table) -> pa.Table:
        kt = t.schema.field(key_col).type
        vt = t.schema.field(value_col).type
        df = pd.DataFrame({"k": t.column(key_col).to_pandas(),
                           "v": t.column(value_col).to_pandas()})
        g = df.groupby(["k", "v"], sort=False).size().rename("cnt").reset_index()
        # explicit types so empty partials cannot degrade the schema
        return pa.table({"k": pa.array(g["k"].tolist(), kt),
                         "v": pa.array(g["v"].tolist(), vt),
                         "cnt": pa.array(g["cnt"].to_numpy(np.int64),
                                         pa.int64())})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("v", sort=False)["cnt"].sum().reset_index()
             .sort_values(["cnt", "v"], ascending=[False, True]))
        top = s.iloc[0]
        return pd.DataFrame({key_col: [g["k"].iloc[0]],
                             "top_value": [top["v"]],
                             "cnt": [int(top["cnt"])]})

    return (ds.select_columns([key_col, value_col])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby("k").map_groups(pick, batch_format="pandas"))


def json_props_stats(events_ds, key: str = "k"):
    """Semi-structured payload parse + aggregate: extract an integer field
    from the JSON ``props`` column per event, fold per event type
    (n_events, n_with_key, sum/min/max of the value).

    The extraction is a compiled regex over the raw JSON text — the
    vectorized fast path for flat single-key payloads (a full json.loads
    per row measured ~6x slower; parity with a real JSON parse is pinned
    by the offline test). Min/Max fold via per-batch partials, so batches
    where a group has no key emit no min/max row for it.
    """
    import re as _re

    from ray.data.aggregate import Max, Min, Sum

    pat = _re.compile(r'"' + _re.escape(key) + r'"\s*:\s*(-?\d+)')

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(pat, expand=False)
        present = k.notna()
        vals = pd.to_numeric(k, errors="coerce")
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "n_events": 1,
            "n_with_key": present.astype("int64"),
            "sum_k": vals.fillna(0).astype("int64"),
            "min_k": vals,
            "max_k": vals,
        }).groupby("event_type", sort=False).agg(
            n_events=("n_events", "sum"),
            n_with_key=("n_with_key", "sum"),
            sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"),
            max_k=("max_k", "max"),
        ).reset_index()
        # a group whose batch rows ALL lack the key folds min/max as NaN:
        # emit nullable Int64 (Ray's Min/Max ignore nulls), never a cast
        # that crashes on NaN
        g["min_k"] = g["min_k"].round().astype("Int64")
        g["max_k"] = g["max_k"].round().astype("Int64")
        return g

    return (events_ds.select_columns(["event_type", "props"])
            .map_batches(partial, batch_format="pandas", batch_size=65536)
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_with_key", alias_name="n_with_key"),
                       Sum("sum_k", alias_name="sum_k"),
                       Min("min_k", alias_name="min_k"),
                       Max("max_k", alias_name="max_k")))


def returned_revenue(lineitem_ds, orders_path: str, customer_path: str,
                     date_lo: str = "1996-01-01", date_hi: str = "1996-04-01",
                     k: int = 20, num_partitions: int | None = None):
    """TPC-H Q10 shape: revenue lost to returned items per customer in a
    quarter, top-k customers.

    lineitem pre-aggregates map-side to (l_orderkey, revenue) partials over
    returned rows only; orders date-filter map-side; the fact⋈fact step is
    the one partitioned hash join. The per-customer fold after the join is
    again partial-then-final, and only the k winning custkeys broadcast
    back to fetch names — no grows-with-SF table is broadcast or
    collected.
    """

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    def lpartial(t: pa.Table) -> pa.Table:
        rf = t.column("l_returnflag").to_pylist()
        keep = np.fromiter((x == "R" for x in rf), bool, len(rf))
        t = t.filter(pa.array(keep))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        df = pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "revenue_c4": rev})
        g = df.groupby("l_orderkey", sort=False)["revenue_c4"].sum().reset_index()
        return table_from_pandas(g)

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def ofilter(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy()
        return t.filter(pa.array((od >= d0) & (od < d1))).select(
            ["o_orderkey", "o_custkey"])

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow",
                                  batch_size=65536)
    joined = rev.join(orders_f, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def cpartial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"c_custkey": t.column("o_custkey").to_numpy(),
                           "revenue_c4": t.column("revenue_c4").to_numpy()})
        g = df.groupby("c_custkey", sort=False)["revenue_c4"].sum().reset_index()
        return table_from_pandas(g)

    from ..util import bucketed_sum

    top = (bucketed_sum(
        joined.map_batches(cpartial, batch_format="pyarrow",
                           batch_size=65536),
        "c_custkey", "revenue_c4")
           .sort(["revenue_c4", "c_custkey"], descending=[True, False])
           .limit(k)
           .to_pandas())  # <= k rows by construction
    if top.empty:
        return pa.table({"c_name": pa.array([], pa.string()),
                         "c_custkey": pa.array([], pa.int64()),
                         "revenue_c4": pa.array([], pa.int64())})
    ckeys = np.sort(top["c_custkey"].to_numpy(np.int64))

    def cfilter(t: pa.Table) -> pa.Table:
        ck = t.column("c_custkey").to_numpy()
        return t.filter(pa.array(np.isin(ck, ckeys)))

    names = read_parquet_clean(
        customer_path, columns=["c_custkey", "c_name"]
    ).map_batches(cfilter, batch_format="pyarrow",
                  batch_size=65536).to_pandas()  # <= k rows
    df = top.merge(names, on="c_custkey").sort_values(
        ["revenue_c4", "c_custkey"], ascending=[False, True])
    return pa.table({
        "c_name": pa.array(df["c_name"].tolist(), pa.string()),
        "c_custkey": pa.array(df["c_custkey"].to_numpy(), pa.int64()),
        "revenue_c4": pa.array(df["revenue_c4"].to_numpy(), pa.int64()),
    })


def cube_sum(ds, row_col: str, col_col: str, value_col: str):
    """GROUP BY CUBE(a, b) analog: all four grouping sets — (a, b),
    (a, ALL), (ALL, b), (ALL, ALL).

    Same shape as ``rollup_sum``: only the finest (a, b) granularity is
    folded distributed; every coarser set derives from that tiny aggregate
    in one single-block map — never a second pass over the data. NULL
    group keys encode as 'ALL'.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"a": t.column(row_col).to_pandas().astype(str),
                           "b": t.column(col_col).to_pandas().astype(str),
                           "v": cents, "n": np.int64(1)})
        g = (df.groupby(["a", "b"], sort=False)
             .agg(v=("v", "sum"), n=("n", "sum")).reset_index())
        return table_from_pandas(g)

    fine = ds.select_columns([row_col, col_col, value_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).groupby(["a", "b"]).aggregate(Sum("v", alias_name="v"),
                                    Sum("n", alias_name="n"))

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        lvl_a = df.groupby("a", as_index=False).agg(v=("v", "sum"),
                                                    n=("n", "sum"))
        lvl_a["b"] = "ALL"
        lvl_b = df.groupby("b", as_index=False).agg(v=("v", "sum"),
                                                    n=("n", "sum"))
        lvl_b["a"] = "ALL"
        total = pd.DataFrame({"a": ["ALL"], "b": ["ALL"],
                              "v": [df["v"].sum()], "n": [df["n"].sum()]})
        cols = ["a", "b", "v", "n"]
        out = pd.concat([df[cols], lvl_a[cols], lvl_b[cols], total],
                        ignore_index=True)
        return out.rename(columns={"a": row_col, "b": col_col,
                                   "v": "value_cents", "n": "n_rows"})

    return fine.repartition(1).map_batches(expand, batch_format="pandas",
                                           batch_size=None)


def copurchase_pairs(lineitem_ds, lineitem_path: str, k: int | None = 25,
                     num_partitions: int | None = None,
                     min_count: int | None = None):
    """Market-basket affinity: part pairs co-purchased in the same order,
    top-k by order count — the association-rule mining input. With
    ``k=None`` returns the FULL pair Dataset (optionally thresholded by
    ``min_count``) — the edge list the triangle/community ops consume.

    Plan: exact distinct (order, part) via map-side dedup partials + one
    COARSE-BUCKET fold on the order key (``util.bucketed_fold`` — the
    ~100k-key sort-groupby paid ~0.1 ms/key of Python; a per-batch-only
    dedup would double-count pairs whose rows straddle batches — the
    cohort-retention lesson); then ONE partitioned hash self-join on the
    order key (per-order pair explosion is bounded by lines-per-order,
    so join output is ~O(rows x avg basket)); pair-count partials fold
    map-side, then globally by a second bucketed fold on the pair key.
    Join inputs pass through ``drop_empty_blocks``.
    """
    from ..util import bucketed_fold, drop_empty_blocks, join_partitions

    if num_partitions is None:
        num_partitions = join_partitions(lineitem_path)

    def dpartial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"o": t.column("l_orderkey").to_numpy(),
                            "p": t.column("l_partkey").to_numpy()})
              .drop_duplicates())
        return pa.table({"o": pa.array(df["o"].to_numpy(np.int64), pa.int64()),
                         "p": pa.array(df["p"].to_numpy(np.int64), pa.int64())})

    def distinct_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates().astype(np.int64)

    dp_schema = pa.schema([("o", pa.int64()), ("p", pa.int64())])
    dp = drop_empty_blocks(
        bucketed_fold(
            lineitem_ds.select_columns(["l_orderkey", "l_partkey"])
            .map_batches(dpartial, batch_format="pyarrow",
                         batch_size=65536),
            "o", distinct_fold)
        .materialize(), dp_schema)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"o2": t.column("o"), "p2": t.column("p")})

    right = dp.map_batches(rename, batch_format="pyarrow")
    joined = dp.join(right, join_type="inner",
                     num_partitions=num_partitions,
                     on=("o",), right_on=("o2",))

    def pair_partial(t: pa.Table) -> pa.Table:
        a = t.column("p").to_numpy()
        b = t.column("p2").to_numpy()
        keep = a < b
        df = (pd.DataFrame({"part_a": a[keep], "part_b": b[keep],
                            "n_orders": np.int64(1)})
              .groupby(["part_a", "part_b"], sort=False).sum().reset_index())
        return pa.table({
            "part_a": pa.array(df["part_a"].to_numpy(np.int64), pa.int64()),
            "part_b": pa.array(df["part_b"].to_numpy(np.int64), pa.int64()),
            "n_orders": pa.array(df["n_orders"].to_numpy(np.int64),
                                 pa.int64()),
        })

    def count_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["part_a", "part_b"], sort=False)["n_orders"]
               .sum().reset_index())
        return agg.astype(np.int64)

    counts = bucketed_fold(
        joined.map_batches(pair_partial, batch_format="pyarrow",
                           batch_size=65536),
        ["part_a", "part_b"], count_fold)
    if min_count is not None:
        counts = counts.filter(expr=f"n_orders >= {int(min_count)}")
    if k is None:
        return counts
    return (counts.sort(["n_orders", "part_a", "part_b"],
                        descending=[True, False, False])
            .limit(k))


def customer_rfm(orders_ds, asof: str = "1998-08-01"):
    """RFM segmentation input (the CRM classic): per customer the days
    since the last order (recency), order count (frequency) and total
    spend in integer cents (monetary). One map-side partial fold + one
    keyed groupby; all-integer.
    """

    asof_d = np.datetime64(asof, "D")

    def partial(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy().astype("datetime64[D]")
        cents = np.rint(t.column("o_totalprice").to_numpy() * 100
                        ).astype(np.int64)
        df = pd.DataFrame({
            "c_custkey": t.column("o_custkey").to_numpy(),
            "last_day": od.astype(np.int64),
            "frequency": np.int64(1),
            "monetary_cents": cents,
        }).groupby("c_custkey", sort=False).agg(
            last_day=("last_day", "max"),
            frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum")).reset_index()
        return table_from_pandas(df)

    from ..util import bucketed_fold

    def rfm_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("c_custkey", sort=False)
               .agg(last_day=("last_day", "max"),
                    frequency=("frequency", "sum"),
                    monetary_cents=("monetary_cents", "sum"))
               .reset_index())
        return out.astype(np.int64)

    agg = bucketed_fold(
        orders_ds.select_columns(["o_custkey", "o_orderdate",
                                  "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "c_custkey", rfm_fold)

    asof_i = int(asof_d.astype(np.int64))

    def finish(t: pa.Table) -> pa.Table:
        rec = asof_i - t.column("last_day").to_numpy()
        return pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "recency_days": pa.array(rec.astype(np.int64), pa.int64()),
            "frequency": t.column("frequency").cast(pa.int64()),
            "monetary_cents": t.column("monetary_cents").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def returned_order_priority(lineitem_ds, orders_path: str,
                            date_lo: str = "1996-07-01",
                            date_hi: str = "1996-10-01",
                            num_partitions: int | None = None):
    """TPC-H Q4 shape: per order priority, how many orders placed in a
    quarter had at least one returned line (EXISTS semi-join count;
    reference Q4's late-lines predicate adapted to this schema's
    ``l_returnflag``).

    Plan: the EXISTS decorelates to an exact distinct of returned order
    keys (map-side unique partials + one keyed groupby — per-batch-only
    dedup would overcount across blocks), then ONE partitioned hash
    semi-join against the date-filtered orders; the per-priority count is
    a 5-row partial-then-final fold. Neither fact table is broadcast or
    collected.
    """
    from ..util import bucketed_fold, drop_empty_blocks, \
        join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    def rpartial(t: pa.Table) -> pa.Table:
        rf = t.column("l_returnflag").to_pylist()
        keep = np.fromiter((x == "R" for x in rf), bool, len(rf))
        ok = np.unique(t.column("l_orderkey").to_numpy()[keep])
        return pa.table({"l_orderkey": pa.array(ok, pa.int64())})

    def dfold(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates().astype(np.int64)

    rk_schema = pa.schema([("l_orderkey", pa.int64())])
    rkeys = drop_empty_blocks(
        bucketed_fold(
            lineitem_ds.select_columns(["l_orderkey", "l_returnflag"])
            .map_batches(rpartial, batch_format="pyarrow",
                         batch_size=65536),
            "l_orderkey", dfold)
        .materialize(), rk_schema)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_orderdate",
                              "o_orderpriority"])

    def ofilter(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy()
        return t.filter(pa.array((od >= d0) & (od < d1))).select(
            ["o_orderkey", "o_orderpriority"])

    orders_f = orders.map_batches(ofilter, batch_format="pyarrow",
                                  batch_size=65536)
    joined = rkeys.join(orders_f, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",))

    def ppartial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"o_orderpriority":
                            t.column("o_orderpriority").to_pylist()})
              .groupby("o_orderpriority", sort=False).size()
              .rename("order_count").reset_index())
        return pa.table({
            "o_orderpriority": pa.array(df["o_orderpriority"].tolist(),
                                        pa.string()),
            "order_count": pa.array(df["order_count"].to_numpy(np.int64),
                                    pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (joined.map_batches(ppartial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("o_orderpriority")
            .aggregate(Sum("order_count", alias_name="order_count")))


def promo_revenue(lineitem_ds, part_path: str,
                  date_lo: str = "1996-09-01", date_hi: str = "1996-10-01",
                  promo_prefix: str = "PROMO",
                  num_partitions: int | None = None):
    """TPC-H Q14 shape: share of a month's revenue from promo parts —
    one row (promo_c4, total_c4), both exact integer cents*1e2.

    Plan: lineitem folds map-side to per-partkey revenue partials inside
    the date window (the shuffle carries one row per part key per batch,
    never raw line items); part is the partitioned-join side (it grows
    with SF — never broadcast); the promo/total CASE fold is a
    dimension-bounded two-cell aggregate.
    """
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(part_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    def lpartial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy()
        t = t.filter(pa.array((sd >= d0) & (sd < d1)))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        g = (pd.DataFrame({"l_partkey": t.column("l_partkey").to_numpy(),
                           "revenue_c4": rev})
             .groupby("l_partkey", sort=False)["revenue_c4"].sum()
             .reset_index())
        return pa.table({
            "l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "revenue_c4": pa.array(g["revenue_c4"].to_numpy(np.int64),
                                   pa.int64()),
        })

    rev = lineitem_ds.select_columns(
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    part = read_parquet_clean(part_path, columns=["p_partkey", "p_type"])
    joined = rev.join(part, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_partkey",), right_on=("p_partkey",))

    def case_fold(t: pa.Table) -> pa.Table:
        ptype = t.column("p_type").to_pylist()
        r = t.column("revenue_c4").to_numpy()
        is_promo = np.fromiter((x.startswith(promo_prefix) for x in ptype),
                               bool, len(ptype))
        return pa.table({
            "promo_c4": pa.array([int(r[is_promo].sum())], pa.int64()),
            "total_c4": pa.array([int(r.sum())], pa.int64()),
        })

    agg = (joined.map_batches(case_fold, batch_format="pyarrow",
                              batch_size=65536)
           .aggregate(Sum("promo_c4", alias_name="promo_c4"),
                      Sum("total_c4", alias_name="total_c4")))
    return pa.table({
        "promo_c4": pa.array([int(agg["promo_c4"] or 0)], pa.int64()),
        "total_c4": pa.array([int(agg["total_c4"] or 0)], pa.int64()),
    })


def top_supplier(lineitem_ds, supplier_path: str,
                 date_lo: str = "1996-01-01", date_hi: str = "1996-04-01"):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a quarter
    (the revenue-view + WHERE total = (SELECT max(...)) decorrelation).

    Plan: per-suppkey revenue fold (map-side partials, one keyed groupby);
    the global max is a scalar aggregate over that supplier-bounded
    result; only the winning key(s) — ties included — are collected and
    broadcast back as a tiny filter to fetch names. Output sorted by
    s_suppkey for determinism under ties.
    """
    from ray.data.aggregate import Max, Sum

    from ..util import read_parquet_clean

    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    def lpartial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy()
        t = t.filter(pa.array((sd >= d0) & (sd < d1)))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        g = (pd.DataFrame({"s_suppkey": t.column("l_suppkey").to_numpy(),
                           "total_c4": rev})
             .groupby("s_suppkey", sort=False)["total_c4"].sum()
             .reset_index())
        return pa.table({
            "s_suppkey": pa.array(g["s_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "total_c4": pa.array(g["total_c4"].to_numpy(np.int64),
                                 pa.int64()),
        })

    per_supp = (lineitem_ds.select_columns(
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(lpartial, batch_format="pyarrow", batch_size=65536)
        .groupby("s_suppkey")
        .aggregate(Sum("total_c4", alias_name="total_c4"))
        .materialize())

    best = per_supp.aggregate(Max("total_c4", alias_name="max_c4"))
    max_c4 = best["max_c4"]
    if max_c4 is None:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_c4": pa.array([], pa.int64())})
    max_c4 = int(max_c4)

    def wfilter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("total_c4"), pa.scalar(max_c4)))

    winners = (per_supp.map_batches(wfilter, batch_format="pyarrow")
               .to_pandas())  # ties only: a handful of rows
    skeys = np.sort(winners["s_suppkey"].to_numpy(np.int64))

    def sfilter(t: pa.Table) -> pa.Table:
        sk = t.column("s_suppkey").to_numpy()
        return t.filter(pa.array(np.isin(sk, skeys)))

    names = read_parquet_clean(
        supplier_path, columns=["s_suppkey", "s_name"]
    ).map_batches(sfilter, batch_format="pyarrow",
                  batch_size=65536).to_pandas()
    df = winners.merge(names, on="s_suppkey").sort_values("s_suppkey")
    return pa.table({
        "s_suppkey": pa.array(df["s_suppkey"].to_numpy(np.int64), pa.int64()),
        "s_name": pa.array(df["s_name"].tolist(), pa.string()),
        "total_c4": pa.array(df["total_c4"].to_numpy(np.int64), pa.int64()),
    })


def customer_order_histogram(orders_ds, customer_path: str,
                             exclude_priority: str = "1-URGENT",
                             num_partitions: int | None = None):
    """TPC-H Q13 shape: distribution of customers by order count (orders
    below an excluded priority class), INCLUDING zero-order customers —
    the LEFT OUTER join + count histogram.

    Plan: orders fold map-side to per-custkey count partials + one keyed
    groupby; customer LEFT-joins those counts on the partitioned hash
    join (customer grows with SF — never broadcast; absent matches
    surface as nulls and fill to 0 with an int64-preserving
    ``pc.fill_null``); the final histogram is a domain-bounded
    (counts-per-customer) partial-then-final fold.
    """
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(customer_path)

    def opartial(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority").to_pylist()
        keep = np.fromiter((x != exclude_priority for x in pr), bool, len(pr))
        g = (pd.DataFrame({"k": t.column("o_custkey").to_numpy()[keep]})
             .groupby("k", sort=False).size().rename("n").reset_index())
        return pa.table({
            "k": pa.array(g["k"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        })

    from ..util import bucketed_sum

    cnt_schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])
    counts = bucketed_sum(
        orders_ds.select_columns(["o_custkey", "o_orderpriority"])
        .map_batches(opartial, batch_format="pyarrow", batch_size=65536),
        "k", "n", clean_schema=cnt_schema)

    customer = read_parquet_clean(customer_path, columns=["c_custkey"])
    joined = customer.join(counts, join_type="left_outer",
                           num_partitions=num_partitions,
                           on=("c_custkey",), right_on=("k",))

    def hpartial(t: pa.Table) -> pa.Table:
        n = pc.fill_null(t.column("n"), 0).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"c_count": n.astype(np.int64)})
             .groupby("c_count", sort=False).size().rename("custdist")
             .reset_index())
        return pa.table({
            "c_count": pa.array(g["c_count"].to_numpy(np.int64), pa.int64()),
            "custdist": pa.array(g["custdist"].to_numpy(np.int64),
                                 pa.int64()),
        })

    return (joined.map_batches(hpartial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("c_count")
            .aggregate(Sum("custdist", alias_name="custdist")))


def bi_nation_volume(lineitem_ds, orders_path: str, customer_path: str,
                     supplier_path: str, nation_path: str,
                     nation_a: str = "NATION_3", nation_b: str = "NATION_7",
                     date_lo: str = "1995-01-01", date_hi: str = "1997-01-01",
                     num_partitions: int | None = None):
    """TPC-H Q7 shape: shipping volume between two nations by year —
    (supp_nation, cust_nation, l_year, revenue_c4) for both directions.

    Plan mirrors ``q5_local_volume``: supplier/nation (and the
    customer→nation map) are genuinely dimension-sized and broadcast as
    sorted probes; out-of-pair supplier rows are dropped map-side BEFORE
    the one partitioned lineitem⋈orders hash join, so the shuffle carries
    only per-(orderkey, year) partials of the two surviving nations.
    """
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    import pyarrow.parquet as pq
    import ray

    nat = pq.read_table(nation_path).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    key_of = {v: k for k, v in name_of.items()}
    ka, kb = np.int64(key_of[nation_a]), np.int64(key_of[nation_b])
    # probes carry int NATIONKEYS, never name strings: the broadcast is
    # one int64 per dimension row and the map-side filter is two integer
    # compares; names materialize only in the |nations|-bounded final fold
    supp = pq.read_table(supplier_path, columns=["s_suppkey",
                                                 "s_nationkey"])
    s_keys = supp.column("s_suppkey").to_numpy().astype(np.int64)
    order_ix = np.argsort(s_keys)
    sk = s_keys[order_ix]
    s_nk = supp.column("s_nationkey").to_numpy().astype(
        np.int64)[order_ix]
    cust = pq.read_table(customer_path, columns=["c_custkey",
                                                 "c_nationkey"])
    c_keys = cust.column("c_custkey").to_numpy().astype(np.int64)
    c_ix = np.argsort(c_keys)
    ck = c_keys[c_ix]
    c_nk = cust.column("c_nationkey").to_numpy().astype(np.int64)[c_ix]
    supp_ref = ray.put((sk, s_nk))
    cust_ref = ray.put((ck, c_nk))

    def lpartial(t: pa.Table) -> pa.Table:
        skeys, snk = ray.get(supp_ref)
        sd = t.column("l_shipdate").to_numpy()
        t = t.filter(pa.array((sd >= d0) & (sd < d1)))
        lsupp = t.column("l_suppkey").to_numpy()
        pos, found = _sorted_probe(skeys, lsupp)
        nk = np.where(found, snk[np.clip(pos, 0, len(skeys) - 1)], -1)
        keep = (nk == ka) | (nk == kb)
        t = t.filter(pa.array(keep))
        nk = nk[keep]
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        year = t.column("l_shipdate").to_numpy().astype(
            "datetime64[Y]").astype(np.int64) + 1970
        g = (pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "s_nk": nk, "l_year": year,
                           "revenue_c4": rev})
             .groupby(["l_orderkey", "s_nk", "l_year"], sort=False)
             ["revenue_c4"].sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "s_nk": pa.array(g["s_nk"].to_numpy(np.int64), pa.int64()),
            "l_year": pa.array(g["l_year"].to_numpy(np.int64), pa.int64()),
            "revenue_c4": pa.array(g["revenue_c4"].to_numpy(np.int64),
                                   pa.int64()),
        })

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
         "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(orders_path,
                                columns=["o_orderkey", "o_custkey"])
    joined = rev.join(orders, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def final_partial(t: pa.Table) -> pa.Table:
        ckeys, cnk = ray.get(cust_ref)
        oc = t.column("o_custkey").to_numpy()
        pos, found = _sorted_probe(ckeys, oc)
        cn = np.where(found, cnk[np.clip(pos, 0, len(ckeys) - 1)], -1)
        sn = t.column("s_nk").to_numpy()
        keep = ((sn == ka) & (cn == kb)) | ((sn == kb) & (cn == ka))
        g = (pd.DataFrame({"s_nk": sn[keep], "c_nk": cn[keep],
                           "l_year": t.column("l_year").to_numpy()[keep],
                           "revenue_c4":
                           t.column("revenue_c4").to_numpy()[keep]})
             .groupby(["s_nk", "c_nk", "l_year"], sort=False)
             ["revenue_c4"].sum().reset_index())
        # names materialize HERE: at most |nations|^2 x years rows
        return pa.table({
            "supp_nation": pa.array(
                [name_of[int(x)] for x in g["s_nk"]], pa.string()),
            "cust_nation": pa.array(
                [name_of[int(x)] for x in g["c_nk"]], pa.string()),
            "l_year": pa.array(g["l_year"].to_numpy(np.int64), pa.int64()),
            "revenue_c4": pa.array(g["revenue_c4"].to_numpy(np.int64),
                                   pa.int64()),
        })

    return (joined.map_batches(final_partial, batch_format="pyarrow",
                               batch_size=65536)
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_c4", alias_name="revenue_c4")))


def important_parts(lineitem_ds, multiplier: int = 1500):
    """TPC-H Q11 shape: parts whose total revenue exceeds a fixed fraction
    (1/multiplier) of the global total — the HAVING-vs-global-scalar
    decorrelation.

    Plan: one per-partkey fold (map-side partials, keyed groupby,
    materialized once); the global total is a scalar aggregate over that
    part-bounded result; the filter compares ``value_c4 > total //
    multiplier`` — exactly equivalent to ``value_c4 * multiplier >
    total`` for integers, with no overflow at any scale.
    """
    from ray.data.aggregate import Sum

    def lpartial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        g = (pd.DataFrame({"l_partkey": t.column("l_partkey").to_numpy(),
                           "value_c4": rev})
             .groupby("l_partkey", sort=False)["value_c4"].sum()
             .reset_index())
        return pa.table({
            "l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "value_c4": pa.array(g["value_c4"].to_numpy(np.int64),
                                 pa.int64()),
        })

    per_part = (lineitem_ds.select_columns(
        ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(lpartial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_partkey")
        .aggregate(Sum("value_c4", alias_name="value_c4"))
        .materialize())

    total = per_part.aggregate(Sum("value_c4", alias_name="t"))["t"]
    if total is None:
        return pa.table({"l_partkey": pa.array([], pa.int64()),
                         "value_c4": pa.array([], pa.int64())})
    floor_thr = int(total) // int(multiplier)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("value_c4"),
                                   pa.scalar(floor_thr)))

    return per_part.map_batches(keep, batch_format="pyarrow")


def supplier_part_counts(lineitem_ds, part_path: str, supplier_path: str,
                         exclude_brand: str = "Brand#45",
                         num_partitions: int | None = None):
    """TPC-H Q16 shape: distinct supplier count per (p_brand, p_size),
    excluding one brand and a deny-list of suppliers (negative account
    balance standing in for Q16's complaints subquery; this schema has no
    partsupp, so lineitem is the part↔supplier link).

    Plan: exact distinct (partkey, suppkey) via map-side dedup partials +
    one keyed groupby; deny-listed suppliers drop map-side against a
    broadcast sorted key array (the deny list is a filtered dimension —
    genuinely small); ONE partitioned hash join against the brand-filtered
    part table; then a second exact distinct on (brand, size, suppkey)
    before the final count fold (the same supplier may serve many parts of
    one (brand, size) cell).
    """
    from ray.data.aggregate import Sum

    from ..util import drop_empty_blocks, join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(part_path)

    import pyarrow.parquet as pq

    supp = pq.read_table(supplier_path,
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()
    deny = np.sort(supp.loc[supp["s_acctbal"] < 0,
                            "s_suppkey"].to_numpy(np.int64))

    def dpartial(t: pa.Table) -> pa.Table:
        sk = t.column("l_suppkey").to_numpy()
        ok = ~np.isin(sk, deny)
        df = (pd.DataFrame({"pk": t.column("l_partkey").to_numpy()[ok],
                            "sk": sk[ok]})
              .drop_duplicates())
        return pa.table({
            "pk": pa.array(df["pk"].to_numpy(np.int64), pa.int64()),
            "sk": pa.array(df["sk"].to_numpy(np.int64), pa.int64()),
        })

    from ..util import bucketed_distinct

    ps_schema = pa.schema([("pk", pa.int64()), ("sk", pa.int64())])
    ps = bucketed_distinct(
        lineitem_ds.select_columns(["l_partkey", "l_suppkey"])
        .map_batches(dpartial, batch_format="pyarrow", batch_size=65536),
        ["pk", "sk"], clean_schema=ps_schema)

    part = read_parquet_clean(part_path,
                              columns=["p_partkey", "p_brand", "p_size"])

    def pfilter(t: pa.Table) -> pa.Table:
        br = t.column("p_brand").to_pylist()
        keep = np.fromiter((b != exclude_brand for b in br), bool, len(br))
        return t.filter(pa.array(keep))

    part_f = part.map_batches(pfilter, batch_format="pyarrow",
                              batch_size=65536)
    joined = ps.join(part_f, join_type="inner",
                     num_partitions=num_partitions,
                     on=("pk",), right_on=("p_partkey",))

    def bspartial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"p_brand": t.column("p_brand").to_pylist(),
                            "p_size": t.column("p_size").to_numpy()
                            .astype(np.int64),
                            "sk": t.column("sk").to_numpy()})
              .drop_duplicates())
        return pa.table({
            "p_brand": pa.array(df["p_brand"].tolist(), pa.string()),
            "p_size": pa.array(df["p_size"].to_numpy(np.int64), pa.int64()),
            "sk": pa.array(df["sk"].to_numpy(np.int64), pa.int64()),
        })

    bss_schema = pa.schema([("p_brand", pa.string()), ("p_size", pa.int64()),
                            ("sk", pa.int64())])
    bss = drop_empty_blocks(
        joined.map_batches(bspartial, batch_format="pyarrow",
                           batch_size=65536)
        .groupby(["p_brand", "p_size", "sk"]).count()
        .select_columns(["p_brand", "p_size", "sk"])
        .materialize(), bss_schema)

    def cpartial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"p_brand": t.column("p_brand").to_pylist(),
                           "p_size": t.column("p_size").to_numpy()})
             .groupby(["p_brand", "p_size"], sort=False).size()
             .rename("supplier_cnt").reset_index())
        return pa.table({
            "p_brand": pa.array(g["p_brand"].tolist(), pa.string()),
            "p_size": pa.array(g["p_size"].to_numpy(np.int64), pa.int64()),
            "supplier_cnt": pa.array(g["supplier_cnt"].to_numpy(np.int64),
                                     pa.int64()),
        })

    return (bss.map_batches(cpartial, batch_format="pyarrow",
                            batch_size=65536)
            .groupby(["p_brand", "p_size"])
            .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt")))


def idle_rich_customers(orders_ds, customer_path: str,
                        segments: tuple[str, ...] = ("MACHINERY", "BUILDING",
                                                     "AUTOMOBILE"),
                        recent: str = "1999-01-01",
                        num_partitions: int | None = None):
    """TPC-H Q22 shape: per segment, count + total balance of customers
    whose balance exceeds the segment-set's positive-balance average and
    who placed no RECENT orders (global-avg filter + anti-join).

    Plan: the average decorelates to an exact integer comparison
    ``cents * n > sum`` against two scalars folded from customer
    partials (no float average anywhere); recent order custkeys fold to
    an exact distinct; the NOT EXISTS is a partitioned LEFT OUTER join
    with a null-match filter — neither fact table is broadcast.
    """
    from ray.data.aggregate import Sum

    from ..util import cluster_cpus, drop_empty_blocks, join_partitions, \
        read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(customer_path)
    seg_set = frozenset(segments)
    r0 = np.datetime64(recent)

    customer = read_parquet_clean(
        customer_path, columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def thr_partial(t: pa.Table) -> pa.Table:
        seg = t.column("c_mktsegment").to_pylist()
        bal = t.column("c_acctbal").to_numpy()
        keep = np.fromiter((s in seg_set for s in seg), bool, len(seg)) & (
            bal > 0)
        cents = np.rint(bal[keep] * 100).astype(np.int64)
        return pa.table({"s": pa.array([int(cents.sum())], pa.int64()),
                         "n": pa.array([len(cents)], pa.int64())})

    thr = (customer.map_batches(thr_partial, batch_format="pyarrow",
                                batch_size=65536)
           .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n")))
    s_total, n_total = int(thr["s"] or 0), int(thr["n"] or 0)

    def rpartial(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy()
        ck = np.unique(t.column("o_custkey").to_numpy()[od >= r0])
        return pa.table({"k": pa.array(ck, pa.int64())})

    def mark(t: pa.Table) -> pa.Table:
        # a non-key marker column: left_outer output coalesces/drops the
        # bare join key, so null-match detection needs a payload column
        return pa.table({"k": t.column("k").cast(pa.int64()),
                         "hit": pa.array(np.ones(len(t), np.int64),
                                         pa.int64())})

    rk_schema = pa.schema([("k", pa.int64()), ("hit", pa.int64())])
    recent_keys = drop_empty_blocks(
        orders_ds.select_columns(["o_custkey", "o_orderdate"])
        .map_batches(rpartial, batch_format="pyarrow", batch_size=65536)
        .repartition(max(8, min(64, cluster_cpus())))
        .groupby("k").count().select_columns(["k"])
        .map_batches(mark, batch_format="pyarrow")
        .materialize(), rk_schema)

    def cfilter(t: pa.Table) -> pa.Table:
        seg = t.column("c_mktsegment").to_pylist()
        bal = t.column("c_acctbal").to_numpy()
        cents = np.rint(bal * 100).astype(np.int64)
        keep = np.fromiter((s in seg_set for s in seg), bool, len(seg)) & (
            cents * n_total > s_total)
        t = t.filter(pa.array(keep))
        return pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
            "cents": pa.array(np.rint(t.column("c_acctbal").to_numpy()
                                      * 100).astype(np.int64), pa.int64()),
        })

    cand = customer.map_batches(cfilter, batch_format="pyarrow",
                                batch_size=65536)
    joined = cand.join(recent_keys, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("c_custkey",), right_on=("k",))

    def fold(t: pa.Table) -> pa.Table:
        miss = pc.is_null(t.column("hit")).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"c_mktsegment":
                           np.asarray(t.column("c_mktsegment")
                                      .to_pylist())[miss],
                           "cents": t.column("cents").to_numpy()[miss]})
             .groupby("c_mktsegment", sort=False)
             .agg(numcust=("cents", "size"),
                  totacctbal_cents=("cents", "sum")).reset_index())
        return pa.table({
            "c_mktsegment": pa.array(g["c_mktsegment"].tolist(), pa.string()),
            "numcust": pa.array(g["numcust"].to_numpy(np.int64), pa.int64()),
            "totacctbal_cents": pa.array(
                g["totacctbal_cents"].to_numpy(np.int64), pa.int64()),
        })

    return (joined.map_batches(fold, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("c_mktsegment")
            .aggregate(Sum("numcust", alias_name="numcust"),
                       Sum("totacctbal_cents",
                           alias_name="totacctbal_cents")))


_PACK_BASE = 1_000_000_000  # suppkey < 1e9; cents*1e9 + suppkey < 2^63


def min_cost_supplier(lineitem_ds, part_path: str, max_size: int = 15,
                      num_partitions: int | None = None):
    """TPC-H Q2 shape: for each small part, the supplier offering the
    cheapest sale — correlated-min decorrelated as an associative argmin
    fold (min over ``cents * 1e9 + suppkey`` packs value and tie-break
    into one int64; ties resolve to the smaller suppkey by construction).

    Plan: per-partkey packed-min partials + one keyed groupby (Min), then
    ONE partitioned hash join against the size-filtered part table and a
    vectorized unpack — no sort, no window, no driver materialization.
    """
    from ray.data.aggregate import Min

    from ..util import drop_empty_blocks, join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(part_path)

    def lpartial(t: pa.Table) -> pa.Table:
        price = np.rint(t.column("l_extendedprice").to_numpy()
                        * 100).astype(np.int64)
        packed = price * _PACK_BASE + t.column("l_suppkey").to_numpy()
        g = (pd.DataFrame({"l_partkey": t.column("l_partkey").to_numpy(),
                           "packed": packed})
             .groupby("l_partkey", sort=False)["packed"].min().reset_index())
        return pa.table({
            "l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "packed": pa.array(g["packed"].to_numpy(np.int64), pa.int64()),
        })

    pp_schema = pa.schema([("l_partkey", pa.int64()), ("packed", pa.int64())])
    per_part = drop_empty_blocks(
        lineitem_ds.select_columns(
            ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(lpartial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_partkey")
        .aggregate(Min("packed", alias_name="packed"))
        .materialize(), pp_schema)

    part = read_parquet_clean(part_path, columns=["p_partkey", "p_size"])

    def pfilter(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("p_size"),
                                pa.scalar(max_size))).select(["p_partkey"])

    part_f = part.map_batches(pfilter, batch_format="pyarrow",
                              batch_size=65536)
    joined = per_part.join(part_f, join_type="inner",
                           num_partitions=num_partitions,
                           on=("l_partkey",), right_on=("p_partkey",))

    def unpack(t: pa.Table) -> pa.Table:
        packed = t.column("packed").to_numpy()
        return pa.table({
            "p_partkey": t.column("l_partkey").cast(pa.int64()),
            "s_suppkey": pa.array(packed % _PACK_BASE, pa.int64()),
            "min_cents": pa.array(packed // _PACK_BASE, pa.int64()),
        })

    return joined.map_batches(unpack, batch_format="pyarrow")


def mad_outliers(events_ds, key_col: str = "event_type",
                 value_col: str = "value", sigma: int = 3):
    """Robust per-group anomaly count: rows whose |x - median| exceeds
    ``sigma`` x MAD (median absolute deviation) — the outlier gate a
    quality pipeline runs before training-data admission.

    Both medians are EXACT via the domain-bounded histogram fold (the
    ``grouped_exact_median`` contract: the shuffle carries distinct
    (key, cents) pairs with counts, never raw rows). Pass 1 folds the
    value histogram -> per-key median (keys are few; broadcast as a dict).
    Pass 2 folds the |x - med| histogram once and reads BOTH the MAD and
    the outlier count off the same cumulative histogram — two scans
    total, all-integer, deterministic. Output: (key, median_cents,
    mad_cents, n_outliers).
    """
    from ray.data.aggregate import Sum

    from ..util import cluster_cpus

    med_rows = grouped_exact_median(events_ds, key_col, value_col).to_pandas()
    med_of = dict(zip(med_rows[key_col], med_rows["median_cents"]))

    def dev_partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pandas()
        cents = sql_round_cents(t.column(value_col).to_numpy())
        med = keys.map(med_of).to_numpy(np.int64)
        g = (pd.DataFrame({"k": keys, "dev": np.abs(cents - med)})
             .groupby(["k", "dev"], sort=False).size().rename("n")
             .reset_index())
        return table_from_pandas(g)

    hist = (events_ds.select_columns([key_col, value_col])
            .map_batches(dev_partial, batch_format="pyarrow",
                         batch_size=65536)
            .repartition(max(8, min(64, cluster_cpus())))
            .groupby(["k", "dev"])
            .aggregate(Sum("n", alias_name="n")))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("dev")
        devs = g["dev"].to_numpy()
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        rank = (total + 1) // 2  # percentile_disc(0.5)
        mad = int(devs[int(np.searchsorted(cum, rank))])
        cut = int(np.searchsorted(devs, sigma * mad, side="right"))
        n_out = int(total - (cum[cut - 1] if cut > 0 else 0))
        key = g["k"].iloc[0]
        return pd.DataFrame({key_col: [key],
                             "median_cents": np.int64(med_of[key]),
                             "mad_cents": np.int64(mad),
                             "n_outliers": np.int64(n_out)})

    return hist.groupby("k").map_groups(pick, batch_format="pandas")


def roc_auc(events_ds, pos_type: str = "purchase", value_col: str = "value"):
    """Exact tie-corrected ROC-AUC of ``value`` as a predictor of
    ``event_type == pos_type`` — the Mann-Whitney U rank statistic, the
    model-eval / label-quality op a curation pipeline runs on scored
    data (no reference analog; the eval sibling of the LM-score gate).

    AUC = (rank_sum_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with tied
    scores at their AVERAGE rank. The distributed part is the
    domain-bounded (cents -> pos/neg count) histogram fold (the
    ``grouped_exact_median`` contract: the shuffle carries distinct
    scores with counts, never raw rows); the rank arithmetic is a
    driver-side cumulative scan over that BOUNDED histogram in
    arbitrary-precision Python ints (2*rank_sum stays integral under
    average ranks, so the whole statistic is exact). Output one row:
    (n_pos, n_neg, auc_num, auc_den, auc_micro) with
    AUC = auc_num/auc_den exactly and auc_micro = floor(1e6*num/den).
    """
    from ray.data.aggregate import Sum

    from ..util import cluster_cpus

    def partial(t: pa.Table) -> pa.Table:
        cents = sql_round_cents(t.column(value_col).to_numpy())
        pos = pc.equal(t.column("event_type"), pos_type).to_numpy(
            zero_copy_only=False)
        g = (pd.DataFrame({"c": cents,
                           "npos": pos.astype(np.int64),
                           "nneg": (~pos).astype(np.int64)})
             .groupby("c", sort=False)[["npos", "nneg"]].sum()
             .reset_index())
        return table_from_pandas(g)

    hist = (events_ds.select_columns(["event_type", value_col])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .repartition(max(8, min(64, cluster_cpus())))
            .groupby("c")
            .aggregate(Sum("npos", alias_name="npos"),
                       Sum("nneg", alias_name="nneg")))

    h = hist.to_pandas().sort_values("c")  # bounded by the cents domain
    npos = h["npos"].to_numpy(np.int64)
    nneg = h["nneg"].to_numpy(np.int64)
    cnt = npos + nneg
    cum_before = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    # block of cnt ties at ranks cb+1..cb+cnt -> average rank (2cb+cnt+1)/2
    s2 = sum(int(a) * (2 * int(b) + int(c) + 1)
             for a, b, c in zip(npos, cum_before, cnt))  # = 2 * rank_sum_pos
    n_pos = int(npos.sum())
    n_neg = int(nneg.sum())
    auc_num = s2 - n_pos * (n_pos + 1)
    auc_den = 2 * n_pos * n_neg
    auc_micro = (auc_num * 10**6) // auc_den if auc_den else 0
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_num": pa.array([auc_num], pa.int64()),
        "auc_den": pa.array([auc_den], pa.int64()),
        "auc_micro": pa.array([auc_micro], pa.int64()),
    })


def changepoint(events_ds, value_col: str = "value"):
    """Per-user offline change-point detection (single best split): the
    k maximizing |n*S_k - k*S_n| over the ts-ordered cents prefix sums
    S — the integer-exact CUSUM statistic (the scaled form of
    |mean(left)-mean(right)| * k(n-k), so no division ever happens).
    The regime-change / drift gate a feed-quality pipeline runs per
    entity before admitting its history.

    Distributed as a bucketed per-user fold (``util.bucketed_fold``):
    user rows co-locate in ONE coarse-bucket shuffle, then each user is
    a vectorized cumsum + argmax (per-user state bounded by that user's
    history, the sessionize contract). Ties break to the SMALLEST k
    (np.argmax returns the first maximum). Users with <2 events have no
    interior split and are excluded. Output: (user_id, k_star, stat,
    n_events).
    """
    from ..util import bucketed_fold

    cols = ["user_id", "ts", "event_id", value_col]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        uids, kstars, stats, sizes = [], [], [], []
        for uid, u in g.groupby("user_id", sort=False):
            n = len(u)
            if n < 2:
                continue
            u = u.sort_values(["ts", "event_id"], kind="mergesort")
            s = np.cumsum(sql_round_cents(u[value_col].to_numpy()))
            k = np.arange(1, n, dtype=np.int64)
            stat = np.abs(n * s[:-1] - k * s[-1])
            i = int(np.argmax(stat))
            uids.append(int(uid))
            kstars.append(i + 1)
            stats.append(int(stat[i]))
            sizes.append(n)
        return pd.DataFrame({
            "user_id": np.asarray(uids, np.int64),
            "k_star": np.asarray(kstars, np.int64),
            "stat": np.asarray(stats, np.int64),
            "n_events": np.asarray(sizes, np.int64),
        })

    return bucketed_fold(events_ds.select_columns(cols), "user_id", fold)


def nation_balance(customer_path: str, supplier_path: str,
                   segment: str = "MACHINERY", cust_min: float = 9000.0,
                   supp_min: float = 5000.0,
                   num_partitions: int | None = None):
    """Per-nation rich-customer vs rich-supplier balance comparison — the
    FULL OUTER join shape (nations present on either side survive, the
    missing side coalesces to zero), completing the engine's join-type
    matrix (inner / left_outer / semi / anti elsewhere).

    Both sides pre-aggregate map-side to nation-bounded partials before
    the join, so the full-outer exchange carries ≤ |nations| rows per
    side regardless of scale.
    """
    from ray.data.aggregate import Sum

    from ..util import cluster_cpus, drop_empty_blocks, read_parquet_clean

    if num_partitions is None:
        num_partitions = 8

    def cpartial(t: pa.Table) -> pa.Table:
        seg = t.column("c_mktsegment").to_pylist()
        bal = t.column("c_acctbal").to_numpy()
        keep = np.fromiter((s == segment for s in seg), bool, len(seg)) & (
            bal > cust_min)
        g = (pd.DataFrame({"nk": t.column("c_nationkey").to_numpy()[keep]
                           .astype(np.int64),
                           "cust_cents": np.rint(bal[keep] * 100)
                           .astype(np.int64), "n_cust": np.int64(1)})
             .groupby("nk", sort=False).agg(
                 cust_cents=("cust_cents", "sum"), n_cust=("n_cust", "sum"))
             .reset_index())
        return pa.table({
            "nk": pa.array(g["nk"].to_numpy(np.int64), pa.int64()),
            "cust_cents": pa.array(g["cust_cents"].to_numpy(np.int64),
                                   pa.int64()),
            "n_cust": pa.array(g["n_cust"].to_numpy(np.int64), pa.int64()),
        })

    def spartial(t: pa.Table) -> pa.Table:
        bal = t.column("s_acctbal").to_numpy()
        keep = bal > supp_min
        g = (pd.DataFrame({"snk": t.column("s_nationkey").to_numpy()[keep]
                           .astype(np.int64),
                           "supp_cents": np.rint(bal[keep] * 100)
                           .astype(np.int64), "n_supp": np.int64(1)})
             .groupby("snk", sort=False).agg(
                 supp_cents=("supp_cents", "sum"), n_supp=("n_supp", "sum"))
             .reset_index())
        return pa.table({
            "snk": pa.array(g["snk"].to_numpy(np.int64), pa.int64()),
            "supp_cents": pa.array(g["supp_cents"].to_numpy(np.int64),
                                   pa.int64()),
            "n_supp": pa.array(g["n_supp"].to_numpy(np.int64), pa.int64()),
        })

    nparts = max(8, min(64, cluster_cpus()))
    c_schema = pa.schema([("nk", pa.int64()), ("cust_cents", pa.int64()),
                          ("n_cust", pa.int64())])
    s_schema = pa.schema([("snk", pa.int64()), ("supp_cents", pa.int64()),
                          ("n_supp", pa.int64())])
    cust = drop_empty_blocks(
        read_parquet_clean(customer_path,
                           columns=["c_nationkey", "c_mktsegment",
                                    "c_acctbal"])
        .map_batches(cpartial, batch_format="pyarrow", batch_size=65536)
        .repartition(nparts)
        .groupby("nk").aggregate(Sum("cust_cents", alias_name="cust_cents"),
                                 Sum("n_cust", alias_name="n_cust"))
        .materialize(), c_schema)
    supp = drop_empty_blocks(
        read_parquet_clean(supplier_path,
                           columns=["s_nationkey", "s_acctbal"])
        .map_batches(spartial, batch_format="pyarrow", batch_size=65536)
        .repartition(nparts)
        .groupby("snk").aggregate(Sum("supp_cents", alias_name="supp_cents"),
                                  Sum("n_supp", alias_name="n_supp"))
        .materialize(), s_schema)

    joined = cust.join(supp, join_type="full_outer",
                       num_partitions=num_partitions,
                       on=("nk",), right_on=("snk",))

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer emits ONE coalesced key column under the left
        # key's name (non-null even for right-only rows)
        out = {"n_nationkey": t.column("nk").cast(pa.int64())}
        for col in ("cust_cents", "n_cust", "supp_cents", "n_supp"):
            out[col] = pc.fill_null(t.column(col), 0).cast(pa.int64())
        return pa.table(out)

    return joined.map_batches(finish, batch_format="pyarrow")


def grouped_quantile_cont(ds, key_col: str, value_col: str, q: float = 0.9):
    """EXACT per-group linearly-interpolated quantile (percentile_cont /
    DuckDB quantile_cont) via the same domain-bounded integer histogram
    fold as ``grouped_exact_median`` — no raw-row sort at any scale.

    The interpolation reproduces DuckDB bit-for-bit: rank r = (n-1)*q,
    result = (1-f)*v[lo] + f*v[lo+1] with f = r - floor(r) — the exact
    operand order matters in IEEE arithmetic and is pinned by test.
    Output: (key, n_rows, p_value) with p_value float64.
    """
    hist = _grouped_cents_hist(ds, key_col, value_col)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy()
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        r = (total - 1) * q
        lo = int(np.floor(r))
        f = r - lo
        v_lo = float(vals[int(np.searchsorted(cum, lo + 1))])
        if lo + 1 < total:
            v_hi = float(vals[int(np.searchsorted(cum, lo + 2))])
            p = (1 - f) * v_lo + f * v_hi
        else:
            p = v_lo
        return pd.DataFrame({key_col: [g["k"].iloc[0]],
                             "n_rows": np.int64(total),
                             "p_value": np.float64(p)})

    return hist.groupby("k").map_groups(pick, batch_format="pandas")


# epoch hours at 1995-01-01 (the testdata's first order date): rebasing the
# time axis keeps every OLS moment far from int64 overflow at any SF
_TREND_T0_HOURS = 219144


def grouped_value_trend(events_ds, key_col: str = "event_type",
                        ts_col: str = "ts", value_col: str = "value"):
    """Per-group integer-exact OLS slope moments of value-vs-time — the
    reference's TCTrend statistic (per-pixel temporal regression,
    ``datasets/tctrend.py``) in relational form over an event stream.

    One pass folds the five moments (n, Σt, Σv, Σtv, Σt²) map-side with
    t = epoch-hours rebased to the corpus start (bounds every MOMENT
    within int64 at any scale). The slope itself is returned as exact
    parts-per-million: ``slope_ppm = trunc(1e6·(nΣtv − ΣtΣv) /
    (nΣt² − (Σt)²))`` — the num/den pair is n²-scaled and can exceed
    int64 for groups beyond ~6e5 rows, so it is formed in
    arbitrary-precision Python ints over the key-bounded final rows and
    only the bounded ppm value (truncating division, matching DuckDB
    ``//``) is emitted. Zero-variance groups emit 0.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        hours = (t.column(ts_col).to_numpy().astype("datetime64[s]")
                 .astype(np.int64) // 3600) - _TREND_T0_HOURS
        cents = np.rint(t.column(value_col).to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({
            "k": t.column(key_col).to_pandas(),
            "n": np.int64(1), "sum_t": hours, "sum_v": cents,
            "sum_tv": hours * cents, "sum_t2": hours * hours,
        })
        g = df.groupby("k", sort=False).sum().reset_index()
        return table_from_pandas(g)

    agg = (events_ds.select_columns([key_col, ts_col, value_col])
           .map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby("k")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_t", alias_name="sum_t"),
                      Sum("sum_v", alias_name="sum_v"),
                      Sum("sum_tv", alias_name="sum_tv"),
                      Sum("sum_t2", alias_name="sum_t2")))

    def finish(t: pa.Table) -> pa.Table:
        # key-bounded rows: exact Python-int products (n*Σtv can exceed
        # int64 at extreme row counts even though every MOMENT fits)
        n = t.column("n").to_pylist()
        st = t.column("sum_t").to_pylist()
        sv = t.column("sum_v").to_pylist()
        stv = t.column("sum_tv").to_pylist()
        st2 = t.column("sum_t2").to_pylist()
        ppm = []
        for a, b, c, d, e in zip(n, stv, st, sv, st2):
            num = (a * b - c * d) * 1_000_000
            den = a * e - c * c
            if den == 0:
                ppm.append(0)
            else:  # truncating division toward zero: DuckDB's `//`
                q = abs(num) // den
                ppm.append(q if num >= 0 else -q)
        return pa.table({
            key_col: t.column("k"),
            "n": pa.array(n, pa.int64()),
            "slope_ppm": pa.array(ppm, pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _local_skyline(df: pd.DataFrame) -> pd.DataFrame:
    """Strict-dominance skyline sweep (minimize price_c, maximize p_size).

    Sorted by (price asc, size desc): a row survives iff its size strictly
    exceeds the best size among strictly cheaper rows AND it achieves the
    max size within its own price class (equal-(price, size) duplicates
    all survive — neither strictly dominates the other)."""
    df = df.sort_values(["price_c", "p_size"],
                        ascending=[True, False], kind="mergesort")
    price = df["price_c"].to_numpy()
    size = df["p_size"].to_numpy()
    keep = np.zeros(len(df), bool)
    best_cheaper = -(1 << 62)
    i = 0
    while i < len(df):
        j = i
        while j < len(df) and price[j] == price[i]:
            j += 1
        gmax = size[i]  # sorted desc within the price class
        if gmax > best_cheaper:
            keep[i:j] = size[i:j] == gmax
        best_cheaper = max(best_cheaper, gmax)
        i = j
    return df[keep]


def skyline_parts(part_ds):
    """SKYLINE / Pareto-front operator: parts not strictly dominated in
    (lower price, larger size) — the multi-objective shortlist query.

    Distributed plan exploits skyline algebra: skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)), so each batch prunes to its LOCAL
    skyline map-side (typically a tiny anti-correlated front) and one
    final fold merges the partials — the shuffle carries fronts, never
    the table. Output: (p_partkey, price_c, p_size).
    """
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p_partkey": t.column("p_partkey").to_numpy(),
            "price_c": np.rint(t.column("p_retailprice").to_numpy()
                               * 100).astype(np.int64),
            "p_size": t.column("p_size").to_numpy().astype(np.int64),
        })
        return table_from_pandas(_local_skyline(df))

    parts = (part_ds.select_columns(["p_partkey", "p_retailprice", "p_size"])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=65536))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(df)

    # single global fold over the union of tiny local fronts
    return (parts.repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=1 << 30))


def unpivot(ds, id_col: str, value_cols: list[str], var_name: str = "var",
            value_name: str = "value"):
    """UNPIVOT / melt — the reshape inverse of :func:`pivot_sum`: each of
    the K declared value columns becomes a (id, var, value) row. Pure
    per-batch reshape (flat map ×K, K fixed and small); never a shuffle.
    """
    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t.column(id_col).combine_chunks()
        out_id, out_var, out_val = [], [], []
        for c in value_cols:
            out_id.append(ids)
            out_var.append(pa.array([c] * n, pa.string()))
            out_val.append(t.column(c).cast(pa.int64()).combine_chunks())
        return pa.table({
            id_col: pa.concat_arrays(out_id),
            var_name: pa.concat_arrays(out_var),
            value_name: pa.concat_arrays(out_val),
        })

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=65536)


def latest_state(ds, key_cols: list[str], ts_col: str, id_col: str,
                 val_cols: list[str], n_buckets: int = 16):
    """Streaming upsert compaction: the LATEST row per key (max ts, ties
    to max id) — the changelog -> table materialization every
    Delta/Hudi-style ingest runs (CDC compaction, "current state" reads).

    Plan: per-batch vectorized compaction (sort + drop_duplicates keep
    last — one surviving row per key per batch, so the shuffle carries
    key-cardinality x batches rows, never the log), then ONE coarse-
    bucket groupby (crc32 of the key into ``n_buckets``; a groupby on the
    raw key would pay Python per distinct key — the high-cardinality-
    groupby lesson) with the same vectorized compaction per bucket.
    Equivalent to row_number() OVER (PARTITION BY key ORDER BY ts DESC,
    id DESC) = 1.
    """
    import zlib as _zlib

    cols = list(dict.fromkeys([*key_cols, ts_col, id_col, *val_cols]))
    out_cols = cols

    def compact(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort")
        return df.drop_duplicates(key_cols, keep="last")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = compact(df)[out_cols].copy()
        key_bytes = df[key_cols].astype(str).agg("\x1f".join, axis=1)
        df["pk"] = np.fromiter(
            (_zlib.crc32(s.encode()) % n_buckets for s in key_bytes),
            dtype=np.int64, count=len(df))
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return compact(g)[out_cols]

    return (ds.select_columns(cols)
            .map_batches(partial, batch_format="pandas", batch_size=65536)
            .groupby("pk").map_groups(finish, batch_format="pandas"))


def ntile_stats(ds, group_col: str, price_col: str, key_col: str,
                n: int = 4):
    """NTILE(n) window-function analog with per-tile stats: within each
    group, rank rows by (price desc, key asc), split into ``n`` tiles of
    near-equal size (larger tiles first — the SQL NTILE contract), and
    report per (group, tile) the row count and min/max/sum of the price
    in cents.

    Exact NTILE needs each group's full ordered extent, so the plan is
    one ``groupby(group_col).map_groups`` — the same shape as the other
    window-function analogs (orders_rank's row_number). Group count is
    the partition bound; at 100 TB per-group sorts are what a SQL engine
    pays for NTILE too, and the approximate alternative (histogram
    quantile boundaries, see orders_p90's plan) is the escape hatch when
    per-group extents stop fitting a task.
    """
    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        pc = np.rint(g[price_col].to_numpy() * 100).astype(np.int64)
        order = np.lexsort((g[key_col].to_numpy(), -pc))
        pc = pc[order]
        cnt = len(pc)
        q, r = divmod(cnt, n)
        sizes = np.full(n, q, np.int64)
        sizes[:r] += 1
        tile_of = np.repeat(np.arange(1, n + 1, dtype=np.int64), sizes)
        df = pd.DataFrame({"tile": tile_of, "pc": pc})
        agg = df.groupby("tile")["pc"].agg(["size", "min", "max", "sum"])
        agg = agg.reset_index()
        return pd.DataFrame({
            group_col: g[group_col].iloc[0],
            "tile": agg["tile"].astype(np.int64),
            "n_rows": agg["size"].astype(np.int64),
            "min_price_c": agg["min"].astype(np.int64),
            "max_price_c": agg["max"].astype(np.int64),
            "sum_price_c": agg["sum"].astype(np.int64),
        })

    return (ds.select_columns([group_col, price_col, key_col])
            .groupby(group_col).map_groups(tiles, batch_format="pandas"))


def regr_moments(ds, group_col: str, x_col: str, y_col: str,
                 q: int = 10**6):
    """Per-group integer-exact OLS regression moments + fixed-point slope
    (the REGR_SLOPE window/aggregate family): x = rint(x_col), y = cents
    rint(100*y_col), slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) scaled by
    ``q`` under TRUNCATING division (DuckDB's ``//`` truncates toward
    zero while Python floors — the sign-adjusted trunc matches both).

    Map-side per-batch partial moments (5 int64 sums per group), one
    tiny keyed Sum, then a driver-free finish map computing the slope in
    PYTHON ints — nΣxy overflows int64 near ~10^19, so the final
    arithmetic never touches numpy. Groups with zero x-variance are
    dropped (slope undefined), matching the SQL's den > 0 filter.
    Returns (group, n_rows, sum_x, sum_y_c, sum_xy, sum_x2, slope_q6).
    """
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(df[x_col].to_numpy(np.float64)).astype(np.int64)
        y = np.rint(df[y_col].to_numpy(np.float64) * 100).astype(np.int64)
        g = pd.DataFrame({group_col: df[group_col], "x": x, "y": y,
                          "xy": x * y, "x2": x * x})
        agg = g.groupby(group_col, sort=False).agg(
            n_rows=("x", "size"), sum_x=("x", "sum"), sum_y_c=("y", "sum"),
            sum_xy=("xy", "sum"), sum_x2=("x2", "sum")).reset_index()
        return agg.astype({c: np.int64 for c in agg.columns
                           if c != group_col})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r in df.itertuples(index=False):
            n, sx, sy = int(r.n_rows), int(r.sum_x), int(r.sum_y_c)
            sxy, sx2 = int(r.sum_xy), int(r.sum_x2)
            den = n * sx2 - sx * sx
            if den <= 0:
                continue
            num = (n * sxy - sx * sy) * q
            slope = -((-num) // den) if num < 0 else num // den
            out.append((getattr(r, group_col), n, sx, sy, sxy, sx2, slope))
        return pd.DataFrame(out, columns=[group_col, "n_rows", "sum_x",
                                          "sum_y_c", "sum_xy", "sum_x2",
                                          "slope_q6"])

    from ray.data.aggregate import Sum

    return (ds.select_columns([group_col, x_col, y_col])
            .map_batches(partial, batch_format="pandas", batch_size=65536,
                         num_cpus=1)
            .groupby(group_col)
            .aggregate(Sum("n_rows", alias_name="n_rows"),
                       Sum("sum_x", alias_name="sum_x"),
                       Sum("sum_y_c", alias_name="sum_y_c"),
                       Sum("sum_xy", alias_name="sum_xy"),
                       Sum("sum_x2", alias_name="sum_x2"))
            .map_batches(finish, batch_format="pandas"))


def herfindahl(fact_ds, dim: pd.DataFrame, fact_key: str, dim_key: str,
               group_col: str, value_col: str, q: int = 10**6):
    """Market-concentration index (Herfindahl–Hirschman) per group: each
    entity's share of the group total, HHI = Σ share² reported as the
    exact integer floor ``hhi_q = q·Σ rev_i² // (Σ rev_i)²`` (all
    revenues non-negative, so floor == trunc on both sides).

    Entity revenue folds map-side into cents, then globally via ONE
    coarse-bucket exchange (``util.bucketed_fold`` — a 10k-entity
    sort-aggregate paid ~0.1 ms/key of Python, 9.2 s at sf0.1; the
    bucketed fold is a vectorized pandas sum per bucket). The dimension
    table (entity → group) is dimension-sized and broadcasts in the
    closure; Σ rev² runs in PYTHON ints inside the per-group finish
    (rev² sums overflow int64 at ~10^5 entities × 10^9 cents). Returns
    (group_col, n_entities, total_c, hhi_q6).
    """
    from ..util import bucketed_fold

    lut = dict(zip(dim[dim_key].astype(np.int64),
                   dim[group_col].astype(np.int64)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df[value_col].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        g = pd.DataFrame({fact_key: df[fact_key].astype(np.int64),
                          "c": cents})
        agg = g.groupby(fact_key, sort=False)["c"].sum().reset_index()
        return agg.astype(np.int64)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        grp = df[fact_key].map(lut)
        keep = grp.notna()
        return pd.DataFrame({group_col: grp[keep].astype(np.int64),
                             "c": df["c"][keep].astype(np.int64)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        revs = [int(v) for v in g["c"]]
        total = sum(revs)
        if total <= 0:
            return pd.DataFrame(columns=[group_col, "n_entities",
                                         "total_c", "hhi_q6"])
        hhi = q * sum(r * r for r in revs) // (total * total)
        return pd.DataFrame({group_col: [int(g[group_col].iloc[0])],
                             "n_entities": [len(revs)],
                             "total_c": [total],
                             "hhi_q6": [hhi]}).astype(np.int64)

    def entity_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(fact_key, sort=False)["c"].sum().reset_index()
        return agg.astype(np.int64)

    partials = fact_ds.select_columns([fact_key, value_col]).map_batches(
        partial, batch_format="pandas", batch_size=65536, num_cpus=1)
    totals = bucketed_fold(partials, fact_key, entity_fold)
    return (totals.map_batches(attach, batch_format="pandas")
            .groupby(group_col).map_groups(finish, batch_format="pandas"))


def percent_rank(ds, group_col: str, value_col: str, key_col: str):
    """PERCENT_RANK window analog as an exact rational: within each
    group, rows order by (value cents, key) — the tiebreak makes ranks
    unique, so percent_rank = (row_number − 1) / (n − 1) and the result
    reports the exact integer pair (pr_num, pr_den); den is 0 for
    singleton groups, exactly as the SQL replay computes it.

    Same per-group plan as the other window analogs (orders_rank,
    ntile_stats): group count bounds the partitions. Returns
    (key_col, group_col, val_c, pr_num, pr_den).
    """
    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        vc = np.rint(g[value_col].to_numpy(np.float64) * 100) \
            .astype(np.int64)
        keys = g[key_col].to_numpy()
        order = np.lexsort((keys, vc))
        n = len(g)
        out = pd.DataFrame({
            key_col: keys[order],
            group_col: np.full(n, np.int64(g[group_col].iloc[0]), np.int64)
            if np.issubdtype(type(g[group_col].iloc[0]), np.integer)
            else g[group_col].iloc[0],
            "val_c": vc[order],
            "pr_num": np.arange(n, dtype=np.int64),
            "pr_den": np.full(n, n - 1, np.int64),
        })
        return out

    return (ds.select_columns([group_col, value_col, key_col])
            .groupby(group_col).map_groups(ranks, batch_format="pandas"))


def q6_band_revenue(lineitem_ds, date_lo: str = "1996-01-01",
                    date_hi: str = "1997-01-01", disc_lo: int = 5,
                    disc_hi: int = 7, qty_lt: int = 24):
    """TPC-H Q6 shape: forecast-revenue-change — one map-side fold over
    lineitem, single-row exact integer answer (revenue_c4 = sum of
    price_cents * discount_cents over the year/discount-band/quantity
    filter; n_lines counts qualifying rows). No join, no shuffle: the
    partials are a 2-cell Sum."""
    from ray.data.aggregate import Sum

    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)

    def partial(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy()
        qty = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
        disc_c = np.rint(t.column("l_discount").to_numpy() * 100) \
            .astype(np.int64)
        price_c = np.rint(t.column("l_extendedprice").to_numpy() * 100) \
            .astype(np.int64)
        keep = ((sd >= d0) & (sd < d1) & (disc_c >= disc_lo)
                & (disc_c <= disc_hi) & (qty < qty_lt))
        return pa.table({
            "revenue_c4": pa.array([int((price_c[keep]
                                         * disc_c[keep]).sum())],
                                   pa.int64()),
            "n_lines": pa.array([int(keep.sum())], pa.int64()),
        })

    agg = (lineitem_ds.select_columns(
        ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"),
                   Sum("n_lines", alias_name="n_lines")))
    return pa.table({
        "revenue_c4": pa.array([int(agg["revenue_c4"] or 0)], pa.int64()),
        "n_lines": pa.array([int(agg["n_lines"] or 0)], pa.int64()),
    })


def q9_profit(lineitem_ds, orders_path: str, part_path: str,
              supplier_path: str, nation_path: str,
              name_word: str = "bolt", num_partitions: int | None = None):
    """TPC-H Q9 shape (adapted: no partsupp table, so profit = revenue):
    per (supplier nation, order year) revenue for parts whose name
    contains ``name_word`` — (nation, o_year, profit_c4).

    Plan: the matching part keys and the supplier→nationkey map are
    dimension-sized sorted probes broadcast once (``ray.put``); lineitem
    folds map-side to per-(orderkey, s_nationkey) partials AFTER both
    probes filter/annotate, the one partitioned hash join attaches
    o_orderdate, and the final fold is |nations| x |years| bounded.
    """
    import pyarrow.parquet as pq
    import ray

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    nat = pq.read_table(nation_path).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    part = pq.read_table(part_path, columns=["p_partkey", "p_name"])
    keep = np.fromiter((name_word in x for x in
                        part.column("p_name").to_pylist()), bool,
                       len(part))
    pkeys = np.sort(part.column("p_partkey").to_numpy()
                    .astype(np.int64)[keep])
    supp = pq.read_table(supplier_path, columns=["s_suppkey",
                                                 "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy().astype(np.int64)
    ix = np.argsort(sk)
    sk = sk[ix]
    snk = supp.column("s_nationkey").to_numpy().astype(np.int64)[ix]
    probes_ref = ray.put((pkeys, sk, snk))

    def lpartial(t: pa.Table) -> pa.Table:
        pk, skeys, snat = ray.get(probes_ref)
        lp = t.column("l_partkey").to_numpy()
        if len(pk) == 0:
            found = np.zeros(len(lp), bool)
        else:
            posc = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            found = pk[posc] == lp
        t = t.filter(pa.array(found))
        if len(t) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "s_nk": pa.array([], pa.int64()),
                             "profit_c4": pa.array([], pa.int64())})
        ls = t.column("l_suppkey").to_numpy()
        spos, sfound = _sorted_probe(skeys, ls)
        nk = np.where(sfound, snat[spos], -1)
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        g = (pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "s_nk": nk, "profit_c4": rev})
             .groupby(["l_orderkey", "s_nk"], sort=False)["profit_c4"]
             .sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "s_nk": pa.array(g["s_nk"].to_numpy(np.int64), pa.int64()),
            "profit_c4": pa.array(g["profit_c4"].to_numpy(np.int64),
                                  pa.int64()),
        })

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(orders_path,
                                columns=["o_orderkey", "o_orderdate"])
    joined = rev.join(orders, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def year_partial(t: pa.Table) -> pa.Table:
        year = t.column("o_orderdate").to_numpy().astype(
            "datetime64[Y]").astype(np.int64) + 1970
        g = (pd.DataFrame({"s_nk": t.column("s_nk").to_numpy(),
                           "o_year": year,
                           "profit_c4": t.column("profit_c4").to_numpy()})
             .groupby(["s_nk", "o_year"], sort=False)["profit_c4"].sum()
             .reset_index())
        return pa.table({
            "s_nk": pa.array(g["s_nk"].to_numpy(np.int64), pa.int64()),
            "o_year": pa.array(g["o_year"].to_numpy(np.int64), pa.int64()),
            "profit_c4": pa.array(g["profit_c4"].to_numpy(np.int64),
                                  pa.int64()),
        })

    from ray.data.aggregate import Sum
    agg = (joined.map_batches(year_partial, batch_format="pyarrow")
           .groupby(["s_nk", "o_year"])
           .aggregate(Sum("profit_c4", alias_name="profit_c4")))

    def to_names(t: pa.Table) -> pa.Table:
        nk = t.column("s_nk").to_pylist()
        return pa.table({
            "nation": pa.array([name_of[int(k)] for k in nk], pa.string()),
            "o_year": t.column("o_year"),
            "profit_c4": t.column("profit_c4"),
        })

    return agg.map_batches(to_names,
                           batch_format="pyarrow").sort(["nation", "o_year"])


def q8_market_share(lineitem_ds, orders_path: str, customer_path: str,
                    supplier_path: str, nation_path: str, region_path: str,
                    part_path: str, region: str = "ASIA",
                    share_nation: str = "NATION_2",
                    p_type: str = "ECONOMY",
                    date_lo: str = "1995-01-01", date_hi: str = "1997-01-01",
                    num_partitions: int | None = None):
    """TPC-H Q8 shape: per order year, the share of ``p_type`` revenue
    (orders by customers of ``region``) supplied by ``share_nation`` —
    exact integer moments (o_year, share_num_c4, share_den_c4), the share
    itself being the rational num/den (no float division cross-engine).

    Plan mirrors q5/q7: part-type keys, supplier→nation and
    customer→(nation→region) maps broadcast as sorted int probes;
    lineitem folds map-side; the one partitioned hash join attaches
    (o_custkey, o_orderdate); region filter + year fold happen map-side
    after the join; final fold is |years| bounded."""
    import pyarrow.parquet as pq
    import ray

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)
    nat = pq.read_table(nation_path).to_pandas()
    reg = pq.read_table(region_path).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    share_nk = int(nat.loc[nat["n_name"] == share_nation,
                           "n_nationkey"].iloc[0])
    region_of = dict(zip(nat["n_nationkey"].astype(int),
                         nat["n_regionkey"].astype(int)))

    part = pq.read_table(part_path, columns=["p_partkey", "p_type"])
    keep = np.fromiter((x == p_type for x in
                        part.column("p_type").to_pylist()), bool, len(part))
    pkeys = np.sort(part.column("p_partkey").to_numpy()
                    .astype(np.int64)[keep])
    supp = pq.read_table(supplier_path, columns=["s_suppkey",
                                                 "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy().astype(np.int64)
    ix = np.argsort(sk)
    sk = sk[ix]
    snk = supp.column("s_nationkey").to_numpy().astype(np.int64)[ix]
    cust = pq.read_table(customer_path, columns=["c_custkey",
                                                 "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy().astype(np.int64)
    cx = np.argsort(ck)
    ck = ck[cx]
    crk = np.asarray([region_of[int(k)] for k in
                      cust.column("c_nationkey").to_numpy()[cx]],
                     np.int64)
    probes_ref = ray.put((pkeys, sk, snk, ck, crk))

    def lpartial(t: pa.Table) -> pa.Table:
        pk, skeys, snat, _, _ = ray.get(probes_ref)
        lp = t.column("l_partkey").to_numpy()
        if len(pk) == 0:
            found = np.zeros(len(lp), bool)
        else:
            posc = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            found = pk[posc] == lp
        t = t.filter(pa.array(found))
        if len(t) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "share_c4": pa.array([], pa.int64()),
                             "total_c4": pa.array([], pa.int64())})
        ls = t.column("l_suppkey").to_numpy()
        spos, sfound = _sorted_probe(skeys, ls)
        nk = np.where(sfound, snat[spos], -1)
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        g = (pd.DataFrame({"l_orderkey": t.column("l_orderkey").to_numpy(),
                           "share_c4": np.where(nk == share_nk, rev, 0),
                           "total_c4": rev})
             .groupby("l_orderkey", sort=False)[["share_c4", "total_c4"]]
             .sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "share_c4": pa.array(g["share_c4"].to_numpy(np.int64),
                                 pa.int64()),
            "total_c4": pa.array(g["total_c4"].to_numpy(np.int64),
                                 pa.int64()),
        })

    rev = lineitem_ds.select_columns(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    orders = read_parquet_clean(
        orders_path, columns=["o_orderkey", "o_custkey", "o_orderdate"])
    joined = rev.join(orders, join_type="inner",
                      num_partitions=num_partitions,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def year_partial(t: pa.Table) -> pa.Table:
        _, _, _, ckeys, creg = ray.get(probes_ref)
        od = t.column("o_orderdate").to_numpy()
        t = t.filter(pa.array((od >= d0) & (od < d1)))
        if len(t) == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "share_num_c4": pa.array([], pa.int64()),
                             "share_den_c4": pa.array([], pa.int64())})
        oc = t.column("o_custkey").to_numpy()
        cpos, cfound = _sorted_probe(ckeys, oc)
        rk = np.where(cfound, creg[cpos], -1)
        t = t.filter(pa.array(rk == rkey))
        if len(t) == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "share_num_c4": pa.array([], pa.int64()),
                             "share_den_c4": pa.array([], pa.int64())})
        year = t.column("o_orderdate").to_numpy().astype(
            "datetime64[Y]").astype(np.int64) + 1970
        g = (pd.DataFrame({"o_year": year,
                           "share_num_c4":
                               t.column("share_c4").to_numpy(),
                           "share_den_c4":
                               t.column("total_c4").to_numpy()})
             .groupby("o_year", sort=False)[["share_num_c4",
                                             "share_den_c4"]]
             .sum().reset_index())
        return pa.table({
            "o_year": pa.array(g["o_year"].to_numpy(np.int64), pa.int64()),
            "share_num_c4": pa.array(g["share_num_c4"].to_numpy(np.int64),
                                     pa.int64()),
            "share_den_c4": pa.array(g["share_den_c4"].to_numpy(np.int64),
                                     pa.int64()),
        })

    from ray.data.aggregate import Sum
    return (joined.map_batches(year_partial, batch_format="pyarrow")
            .groupby("o_year")
            .aggregate(Sum("share_num_c4", alias_name="share_num_c4"),
                       Sum("share_den_c4", alias_name="share_den_c4"))
            .sort("o_year"))


def q21_waiting_suppliers(lineitem_ds, supplier_path: str, nation_path: str,
                          nation: str | None = None, k: int = 20):
    """TPC-H Q21 shape (adapted: the schema has no commit/receipt dates,
    so "kept the order waiting" = the supplier is the SOLE owner of a
    multi-supplier order's latest ship date — the same EXISTS / NOT
    EXISTS decorrelation): per supplier, the count of such orders;
    top-``k`` by (numwait desc, s_name asc).

    Plan: ONE bucketed fold on l_orderkey does the whole correlated
    subquery vectorized per bucket (order max date, distinct-supplier
    count, sole-attainer test — same-order rows always share a bucket);
    winners emerge as (suppkey, 1) partials whose final fold is
    supplier-dimension bounded. Optional ``nation`` filters via the
    broadcast nationkey probe before counting."""
    import pyarrow.parquet as pq

    from ..util import bucketed_fold

    supp = pq.read_table(supplier_path,
                         columns=["s_suppkey", "s_name", "s_nationkey"])
    name_of = dict(zip(supp.column("s_suppkey").to_pylist(),
                       supp.column("s_name").to_pylist()))
    nk_of = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_nationkey").to_pylist()))
    want_nk = None
    if nation is not None:
        nat = pq.read_table(nation_path).to_pandas()
        want_nk = int(nat.loc[nat["n_name"] == nation,
                              "n_nationkey"].iloc[0])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d2 = (df.groupby(["l_orderkey", "l_suppkey"], sort=False)
              ["l_shipdate"].max().reset_index())
        grp = d2.groupby("l_orderkey", sort=False)
        omax = grp["l_shipdate"].transform("max")
        nsupp = grp["l_suppkey"].transform("size")
        attain = d2["l_shipdate"] == omax
        natt = attain.groupby(d2["l_orderkey"], sort=False) \
            .transform("sum")
        win = d2.loc[attain & (natt == 1) & (nsupp >= 2), "l_suppkey"]
        out = win.value_counts().rename_axis("s_suppkey") \
            .reset_index(name="numwait")
        return out

    parts = bucketed_fold(
        lineitem_ds.select_columns(["l_orderkey", "l_suppkey",
                                    "l_shipdate"]),
        "l_orderkey", fold)

    # the per-bucket partials are supplier-dimension bounded
    # (<= |supplier| x n_buckets rows): the finish runs driver-side on
    # that bounded pull — schema-stable even when no order qualifies
    df = parts.to_pandas()
    if len(df):
        df = (df.groupby("s_suppkey", sort=False)["numwait"]
              .sum().reset_index())
        if want_nk is not None:
            df = df[df["s_suppkey"].map(nk_of) == want_nk]
        df["s_name"] = df["s_suppkey"].map(name_of)
        df = df.sort_values(["numwait", "s_name"],
                            ascending=[False, True]).head(k)
    else:
        df = pd.DataFrame({"s_name": [], "numwait": []})
    return pa.table({
        "s_name": pa.array(df["s_name"].tolist(), pa.string()),
        "numwait": pa.array(df["numwait"].to_numpy(np.int64),
                            pa.int64()),
    })


def q20_excess_suppliers(lineitem_ds, part_path: str, supplier_path: str,
                         nation_path: str, name_word: str = "gear",
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1997-01-01",
                         nation: str | None = None):
    """TPC-H Q20 shape (adapted: no partsupp availability, so "excess
    share" replaces "excess stock"): suppliers who shipped MORE THAN HALF
    of some ``name_word`` part's total volume inside the date window —
    (s_name, n_parts) with n_parts = how many such parts, sorted by name.

    Plan: part keys broadcast (sorted probe) filter lineitem map-side;
    one bucketed fold on l_partkey computes per-part totals and the
    2*supplier_qty > total winners vectorized per bucket (same-part rows
    share a bucket); distinct winner (suppkey, partkey) pairs are
    supplier-x-matched-part bounded, so the count-per-supplier finishes
    in one tiny task. The integer cross-multiply keeps the half-share
    test exact."""
    import pyarrow.parquet as pq
    import ray

    from ..util import bucketed_fold

    d0, d1 = np.datetime64(date_lo), np.datetime64(date_hi)
    part = pq.read_table(part_path, columns=["p_partkey", "p_name"])
    keep = np.fromiter((name_word in x for x in
                        part.column("p_name").to_pylist()), bool,
                       len(part))
    pkeys = np.sort(part.column("p_partkey").to_numpy()
                    .astype(np.int64)[keep])
    pk_ref = ray.put(pkeys)
    supp = pq.read_table(supplier_path,
                         columns=["s_suppkey", "s_name", "s_nationkey"])
    name_of = dict(zip(supp.column("s_suppkey").to_pylist(),
                       supp.column("s_name").to_pylist()))
    nk_of = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_nationkey").to_pylist()))
    want_nk = None
    if nation is not None:
        nat = pq.read_table(nation_path).to_pandas()
        want_nk = int(nat.loc[nat["n_name"] == nation,
                              "n_nationkey"].iloc[0])

    def lpartial(t: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        sd = t.column("l_shipdate").to_numpy()
        t = t.filter(pa.array((sd >= d0) & (sd < d1)))
        lp = t.column("l_partkey").to_numpy()
        if len(pk) == 0 or len(lp) == 0:
            found = np.zeros(len(lp), bool)
        else:
            posc = np.clip(np.searchsorted(pk, lp), 0, len(pk) - 1)
            found = pk[posc] == lp
        t = t.filter(pa.array(found))
        qty = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
        g = (pd.DataFrame({"l_partkey": t.column("l_partkey").to_numpy(),
                           "l_suppkey": t.column("l_suppkey").to_numpy(),
                           "qty": qty})
             .groupby(["l_partkey", "l_suppkey"], sort=False)["qty"].sum()
             .reset_index())
        return pa.table({
            "l_partkey": pa.array(g["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "l_suppkey": pa.array(g["l_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "qty": pa.array(g["qty"].to_numpy(np.int64), pa.int64()),
        })

    pre = lineitem_ds.select_columns(
        ["l_partkey", "l_suppkey", "l_shipdate", "l_quantity"]
    ).map_batches(lpartial, batch_format="pyarrow", batch_size=65536)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["l_partkey", "l_suppkey"], sort=False)["qty"]
             .sum().reset_index())
        total = g.groupby("l_partkey", sort=False)["qty"].transform("sum")
        win = g.loc[2 * g["qty"] > total, ["l_suppkey", "l_partkey"]]
        return win

    winners = bucketed_fold(pre, "l_partkey", fold)

    # winner pairs are supplier x matched-part bounded: driver-side
    # finish on the bounded pull — schema-stable when no part has a
    # majority supplier
    df = winners.to_pandas()
    if len(df):
        df = df.drop_duplicates()
        cnt = (df.groupby("l_suppkey", sort=False)["l_partkey"].size()
               .rename_axis("s_suppkey").reset_index(name="n_parts"))
        if want_nk is not None:
            cnt = cnt[cnt["s_suppkey"].map(nk_of) == want_nk]
        cnt["s_name"] = cnt["s_suppkey"].map(name_of)
        cnt = cnt.sort_values("s_name")
    else:
        cnt = pd.DataFrame({"s_name": [], "n_parts": []})
    return pa.table({
        "s_name": pa.array(cnt["s_name"].tolist(), pa.string()),
        "n_parts": pa.array(cnt["n_parts"].to_numpy(np.int64),
                            pa.int64()),
    })


def association_rules(lineitem_ds, lineitem_path: str, k: int = 20,
                      min_pair: int = 2):
    """Market-basket ASSOCIATION RULES: part pairs ranked by exact
    integer lift — ``lift_1e6 = floor(pair_n * N_orders * 1e6 /
    (cnt_a * cnt_b))`` over distinct-order supports (the
    confidence/lift step on top of :func:`copurchase_pairs`).

    Plan: the pair table comes from the bucketed copurchase machinery;
    per-part distinct-order supports are PART-dimension bounded, so they
    broadcast as a sorted probe (never a join); the lift map is pure and
    each block emits only its top-k candidates. All arithmetic int64
    (pair*N*1e6 <= ~1e15 at any plausible basket scale).
    Output: (part_a, part_b, n_orders, lift_1e6) top-k by (lift desc,
    part_a, part_b)."""
    import ray

    from ..util import bucketed_fold

    pairs = copurchase_pairs(lineitem_ds, lineitem_path, k=None,
                             min_count=min_pair)

    def dpartial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"o": t.column("l_orderkey").to_numpy(),
                            "p": t.column("l_partkey").to_numpy()})
              .drop_duplicates())
        return pa.table({"o": pa.array(df["o"].to_numpy(np.int64),
                                       pa.int64()),
                         "p": pa.array(df["p"].to_numpy(np.int64),
                                       pa.int64())})

    def distinct_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates().astype(np.int64)

    dp = bucketed_fold(
        lineitem_ds.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(dpartial, batch_format="pyarrow", batch_size=65536),
        "o", distinct_fold).materialize()

    # per-part supports + the order count: PART-dimension bounded pulls
    def support_partial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"p": t.column("p").to_numpy(),
                            "n": np.int64(1)})
              .groupby("p", sort=False)["n"].sum().reset_index())
        return pa.table({"p": pa.array(df["p"].to_numpy(np.int64),
                                       pa.int64()),
                         "n": pa.array(df["n"].to_numpy(np.int64),
                                       pa.int64())})

    sup = (dp.map_batches(support_partial, batch_format="pyarrow",
                          batch_size=65536).to_pandas()
           .groupby("p")["n"].sum())
    # exact distinct-order count: buckets partition the order-key space,
    # so per-bucket nunique sums are globally exact — one scalar per
    # bucket ever reaches the driver
    def o_count_fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": np.array([g["o"].nunique()], np.int64)})

    n_orders_total = int(bucketed_fold(dp.select_columns(["o"]), "o",
                                       o_count_fold)
                         .to_pandas()["n"].sum())
    keys = np.sort(sup.index.to_numpy().astype(np.int64))
    vals = sup.reindex(keys).to_numpy().astype(np.int64)
    probe = ray.put((keys, vals, n_orders_total))

    def lift_topk(t: pa.Table) -> pa.Table:
        pk, pv, N = ray.get(probe)
        a = t.column("part_a").to_numpy()
        b = t.column("part_b").to_numpy()
        n = t.column("n_orders").to_numpy()
        ca = pv[np.searchsorted(pk, a)]
        cb = pv[np.searchsorted(pk, b)]
        lift = (n * np.int64(N) * np.int64(1_000_000)) // (ca * cb)
        df = pd.DataFrame({"part_a": a, "part_b": b, "n_orders": n,
                           "lift_1e6": lift})
        df = df.sort_values(["lift_1e6", "part_a", "part_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k)
        return pa.table({c: pa.array(df[c].to_numpy(np.int64), pa.int64())
                         for c in ("part_a", "part_b", "n_orders",
                                   "lift_1e6")})

    cand = pairs.map_batches(lift_topk, batch_format="pyarrow",
                             batch_size=65536).to_pandas()
    cand = cand.sort_values(["lift_1e6", "part_a", "part_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k).reset_index(drop=True)
    return pa.table({c: pa.array(cand[c].to_numpy(np.int64), pa.int64())
                     for c in ("part_a", "part_b", "n_orders",
                               "lift_1e6")})


def customer_order_gaps(orders_ds):
    """Repeat-purchase interval statistics per customer: for customers
    with ≥ 2 orders, the min/max/total gap in DAYS between consecutive
    orders (ordered by (o_orderdate, o_orderkey) — the LAG window shape,
    decorrelated into ONE coarse-bucket fold on the customer key; the
    per-customer sort runs vectorized inside the bucket, order rows
    shuffle exactly once)."""
    from ..util import bucketed_fold

    def prep(t: pa.Table) -> pa.Table:
        ts = (t.column("o_orderdate").cast(pa.timestamp("us"))
              .cast(pa.int64()).to_numpy())
        return pa.table({
            "cust": t.column("o_custkey").cast(pa.int64()),
            "day": pa.array(ts // 86_400_000_000, pa.int64()),
            "okey": t.column("o_orderkey").cast(pa.int64()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cust = g["cust"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        okey = g["okey"].to_numpy(np.int64)
        order = np.lexsort((okey, day, cust))
        cust, day = cust[order], day[order]
        same = np.zeros(len(cust), bool)
        same[1:] = cust[1:] == cust[:-1]
        gaps = np.where(same, day - np.roll(day, 1), 0)[same]
        gc = cust[same]
        if not len(gc):
            return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                                 "n_orders": pd.Series([], dtype="int64"),
                                 "min_gap": pd.Series([], dtype="int64"),
                                 "max_gap": pd.Series([], dtype="int64"),
                                 "sum_gap": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"c": gc, "g": gaps})
        agg = df.groupby("c", sort=True)["g"].agg(["count", "min", "max",
                                                   "sum"]).reset_index()
        return pd.DataFrame({
            "c_custkey": agg["c"].to_numpy(np.int64),
            "n_orders": (agg["count"] + 1).to_numpy(np.int64),
            "min_gap": agg["min"].to_numpy(np.int64),
            "max_gap": agg["max"].to_numpy(np.int64),
            "sum_gap": agg["sum"].to_numpy(np.int64),
        })

    return bucketed_fold(
        orders_ds.select_columns(["o_custkey", "o_orderdate",
                                  "o_orderkey"])
        .map_batches(prep, batch_format="pyarrow", batch_size=65536),
        "cust", fold)


def rolling_frame_sum(ds, key_col: str, order_cols, value_col: str,
                      preceding: int = 2, num_buckets: int | None = None):
    """ROWS-frame rolling sum — the window-FRAME analog
    (``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    <preceding> PRECEDING AND CURRENT ROW)``): every row reports the sum
    of its own value and up to ``preceding`` prior rows of its
    partition in (order_cols) order.

    Plan: one coarse-bucket exchange on the partition key (the
    high-cardinality-groupby discipline), then a fully vectorized
    in-bucket computation — rows sort once by (key, *order_cols) and
    the frame sum is the value plus its shifted copies masked to the
    same key (no per-group Python, no pandas .rolling). Values are
    int64 cents (exact).

    Output: key, order cols, value, frame_sum.
    """
    from ..util import bucketed_fold

    ocols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *ocols],
                          kind="mergesort").reset_index(drop=True)
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy().astype(np.int64)
        s = v.copy()
        for lag in range(1, preceding + 1):
            shifted = np.empty_like(v)
            shifted[:lag] = 0
            shifted[lag:] = v[:-lag]
            same = np.zeros(len(v), bool)
            same[lag:] = k[lag:] == k[:-lag]
            s += np.where(same, shifted, 0)
        g = g.copy()
        g["frame_sum"] = s
        return g

    return bucketed_fold(ds.select_columns([key_col, *ocols, value_col]),
                         key_col, fold, num_buckets=num_buckets)


def abc_analysis(lineitem_ds, part_col: str = "l_partkey",
                 price_col: str = "l_extendedprice"):
    """ABC / Pareto revenue classification — the inventory-analytics
    shape (class A = items whose running revenue share, in revenue-DESC
    order, stays <= 80%; B <= 95%; C the tail), decided by exact
    integer cross-multiplication (cum*5 <= 4*total, cum*20 <= 19*total)
    under the deterministic (revenue DESC, part ASC) order.

    The global running sum uses the 1D prefix-scan discipline
    (``window.running_total``): per-part revenues range-bucket by
    VALUE (order-preserving, <= ~1k buckets from a tiny min/max fold),
    the driver prefixes the O(#buckets) bucket sums, and one keyed
    exchange scans each bucket locally — equal revenues always share a
    bucket, so the part-id tiebreak never crosses the exchange. Output:
    (abc_class, n_parts, revenue_c), 3 rows.
    """
    import ray

    from ..util import bucketed_sum

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column(price_col).to_numpy() * 100).astype(np.int64)
        return pa.table({"part": t.column(part_col).cast(pa.int64()),
                         "rev": pa.array(c, pa.int64())})

    rev = bucketed_sum(
        lineitem_ds.select_columns([part_col, price_col]).map_batches(
            cents, batch_format="pyarrow", batch_size=65536),
        "part", "rev").materialize()

    from ray.data.aggregate import Max, Min, Sum
    agg = rev.aggregate(Min("rev", alias_name="lo"),
                        Max("rev", alias_name="hi"),
                        Sum("rev", alias_name="tot"))
    lo, hi, total = int(agg["lo"]), int(agg["hi"]), int(agg["tot"])
    step = max(1, (hi - lo) // 1024 + 1)

    def tag(t: pa.Table) -> pa.Table:
        r = t.column("rev").to_numpy()
        return t.append_column("b", pa.array((hi - r) // step, pa.int64()))

    tagged = rev.map_batches(tag, batch_format="pyarrow").materialize()

    def bsum(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"b": t.column("b").to_numpy(),
                            "s": t.column("rev").to_numpy()})
              .groupby("b", sort=False)["s"].sum().reset_index())
        return pa.table({"b": pa.array(df["b"].to_numpy(np.int64),
                                       pa.int64()),
                         "s": pa.array(df["s"].to_numpy(np.int64),
                                       pa.int64())})

    bs = (tagged.map_batches(bsum, batch_format="pyarrow")
          .groupby("b").aggregate(Sum("s", alias_name="s"))
          .to_pandas().sort_values("b"))
    offs = dict(zip(
        bs["b"].astype(np.int64),
        np.concatenate([[0],
                        bs["s"].to_numpy(np.int64)[:-1].cumsum()]),
    ))
    offs_ref = ray.put(offs)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["b"].iloc[0])]
        g = g.sort_values(["rev", "part"], ascending=[False, True],
                          kind="mergesort")
        cum = g["rev"].to_numpy(np.int64).cumsum() + off
        cls = np.where(cum * 5 <= 4 * total, "A",
                       np.where(cum * 20 <= 19 * total, "B", "C"))
        out = pd.DataFrame({"abc_class": cls,
                            "rev": g["rev"].to_numpy(np.int64)})
        agg2 = out.groupby("abc_class", sort=False).agg(
            n_parts=("rev", "size"), revenue_c=("rev", "sum"))
        agg2 = agg2.reset_index()
        agg2["n_parts"] = agg2["n_parts"].astype(np.int64)
        agg2["revenue_c"] = agg2["revenue_c"].astype(np.int64)
        return agg2

    parts = tagged.groupby("b").map_groups(scan, batch_format="pandas") \
        .to_pandas()  # <= 3 rows per bucket, bounded finish
    fin = parts.groupby("abc_class", sort=True).agg(
        n_parts=("n_parts", "sum"),
        revenue_c=("revenue_c", "sum")).reset_index()
    return pa.table({
        "abc_class": pa.array(fin["abc_class"].tolist(), pa.string()),
        "n_parts": pa.array(fin["n_parts"].to_numpy(np.int64),
                            pa.int64()),
        "revenue_c": pa.array(fin["revenue_c"].to_numpy(np.int64),
                              pa.int64()),
    })


def gini_coefficient(lineitem_ds, key_col: str = "l_suppkey",
                     price_col: str = "l_extendedprice"):
    """Gini inequality coefficient of per-key revenue — the
    concentration metric next to HHI (`supplier_hhi`): with revenues
    x_1 <= ... <= x_n (ties ordered by key id),
    G = (2*S1 - (n+1)*S0) / (n*S0) where S1 = sum(i * x_i). Reported
    as exact floor ppm — every moment is int64.

    Global ranks use the 1D prefix-scan discipline: per-key revenues
    range-bucket by VALUE ascending (<= ~1k buckets from a tiny min/max
    fold), the driver prefixes O(#buckets) (count, sum) pairs, and one
    keyed exchange ranks each bucket locally — equal revenues share a
    bucket, so the key tiebreak never crosses the exchange. Output:
    ONE row (n_keys, revenue_c, gini_ppm).
    """
    import ray

    from ..util import bucketed_sum

    def cents(t: pa.Table) -> pa.Table:
        c = np.rint(t.column(price_col).to_numpy() * 100).astype(np.int64)
        return pa.table({"key": t.column(key_col).cast(pa.int64()),
                         "rev": pa.array(c, pa.int64())})

    rev = bucketed_sum(
        lineitem_ds.select_columns([key_col, price_col]).map_batches(
            cents, batch_format="pyarrow", batch_size=65536),
        "key", "rev").materialize()

    from ray.data.aggregate import Max, Min
    agg = rev.aggregate(Min("rev", alias_name="lo"),
                        Max("rev", alias_name="hi"))
    lo, hi = int(agg["lo"]), int(agg["hi"])
    step = max(1, (hi - lo) // 1024 + 1)

    def tag(t: pa.Table) -> pa.Table:
        r = t.column("rev").to_numpy()
        return t.append_column("b",
                               pa.array((r - lo) // step, pa.int64()))

    tagged = rev.map_batches(tag, batch_format="pyarrow").materialize()

    def bstat(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({"b": t.column("b").to_numpy(),
                            "s": t.column("rev").to_numpy()})
              .groupby("b", sort=False)
              .agg(cnt=("s", "size"), s=("s", "sum")).reset_index())
        return pa.table({"b": pa.array(df["b"].to_numpy(np.int64),
                                       pa.int64()),
                         "cnt": pa.array(df["cnt"].to_numpy(np.int64),
                                         pa.int64()),
                         "s": pa.array(df["s"].to_numpy(np.int64),
                                       pa.int64())})

    from ray.data.aggregate import Sum
    bs = (tagged.map_batches(bstat, batch_format="pyarrow")
          .groupby("b").aggregate(Sum("cnt", alias_name="cnt"),
                                  Sum("s", alias_name="s"))
          .to_pandas().sort_values("b"))
    cnt_prefix = np.concatenate(
        [[0], bs["cnt"].to_numpy(np.int64)[:-1].cumsum()])
    offs = dict(zip(bs["b"].astype(np.int64), cnt_prefix))
    n_total = int(bs["cnt"].sum())
    s_total = int(bs["s"].sum())
    offs_ref = ray.put(offs)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["b"].iloc[0])]
        g = g.sort_values(["rev", "key"], kind="mergesort")
        ranks = np.arange(1, len(g) + 1, dtype=np.int64) + off
        s1 = int((ranks * g["rev"].to_numpy(np.int64)).sum())
        return pd.DataFrame({"s1": [s1]})

    s1 = sum(int(r["s1"]) for r in
             tagged.groupby("b").map_groups(
                 scan, batch_format="pandas").take_all())
    num = 2 * s1 - (n_total + 1) * s_total
    den = n_total * s_total
    gini_ppm = num * 1_000_000 // den if den else 0
    return pa.table({
        "n_keys": pa.array([n_total], pa.int64()),
        "revenue_c": pa.array([s_total], pa.int64()),
        "gini_ppm": pa.array([int(gini_ppm)], pa.int64()),
    })


def q7_nations_trade(lineitem_ds, orders_path: str, customer_path: str,
                     supplier_path: str, nation_path: str,
                     nation_a: str = "NATION_1", nation_b: str = "NATION_2",
                     y_lo: int = 1996, y_hi: int = 1998,
                     num_partitions: int | None = None):
    """TPC-H Q7 shape (volume shipping): revenue between the two fixed
    nations per (supp_nation, cust_nation, ship year), both directions,
    ship year in [y_lo, y_hi] — (supp_nation, cust_nation, l_year,
    revenue_c4) with revenue in cent x (100 - disc_pct) fixed point.

    Plan: supplier->nation and customer->nation maps are dimension-sized
    sorted probes broadcast ONCE (``ray.put``); lineitem folds map-side
    to per-(orderkey, supp-nation, year) revenue partials after the
    supplier probe filters to the two nations; orders pre-probes its
    customer side map-side (o_custkey -> cust nation, non-matching
    orders drop), so the ONE partitioned hash join carries only
    annotated partials; the final fold is 2 x 2 x years bounded.
    """
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from ..util import join_partitions, read_parquet_clean

    if num_partitions is None:
        num_partitions = join_partitions(orders_path)
    nat = pq.read_table(nation_path).to_pandas()
    want = {nation_a, nation_b}
    keys = {int(k): n for k, n in zip(nat["n_nationkey"], nat["n_name"])
            if n in want}

    def _nation_probe(path, key_col, nk_col):
        t = pq.read_table(path, columns=[key_col, nk_col])
        k = t.column(key_col).to_numpy().astype(np.int64)
        nk = t.column(nk_col).to_numpy().astype(np.int64)
        sel = np.isin(nk, list(keys))
        k, nk = k[sel], nk[sel]
        ix = np.argsort(k)
        return k[ix], nk[ix]

    sk, snk = _nation_probe(supplier_path, "s_suppkey", "s_nationkey")
    ck, cnk = _nation_probe(customer_path, "c_custkey", "c_nationkey")
    probes_ref = ray.put((sk, snk, ck, cnk))

    def lpartial(t: pa.Table) -> pa.Table:
        skeys, snat, _ck, _cnk = ray.get(probes_ref)
        yr = t.column("l_shipdate").to_numpy().astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        ls = t.column("l_suppkey").to_numpy().astype(np.int64)
        spos, sfound = _sorted_probe(skeys, ls)
        keep = sfound & (yr >= y_lo) & (yr <= y_hi)
        if not keep.any():
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "s_nk": pa.array([], pa.int64()),
                             "l_year": pa.array([], pa.int64()),
                             "rev_c4": pa.array([], pa.int64())})
        price = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        rev = np.rint(price * 100).astype(np.int64) * (
            100 - np.rint(disc * 100).astype(np.int64))
        g = (pd.DataFrame({
            "l_orderkey": t.column("l_orderkey").to_numpy()[keep],
            "s_nk": snat[spos[keep]],
            "l_year": yr[keep],
            "rev_c4": rev})
            .groupby(["l_orderkey", "s_nk", "l_year"], sort=False)
            ["rev_c4"].sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64)),
            "s_nk": pa.array(g["s_nk"].to_numpy(np.int64)),
            "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
            "rev_c4": pa.array(g["rev_c4"].to_numpy(np.int64)),
        })

    def opartial(t: pa.Table) -> pa.Table:
        _sk, _snk, ckeys, cnat = ray.get(probes_ref)
        oc = t.column("o_custkey").to_numpy().astype(np.int64)
        cpos, cfound = _sorted_probe(ckeys, oc)
        t2 = pa.table({
            "o_orderkey": t.column("o_orderkey").filter(pa.array(cfound)),
            "c_nk": pa.array(cnat[cpos[cfound]], pa.int64()),
        })
        return t2

    from ..util import drop_empty_blocks

    # drop_empty_blocks: an all-filtered side emits 0-row schema-less
    # blocks that poison the hash join's finalize (the bucketed_fold
    # clean_schema lesson)
    parts = drop_empty_blocks(
        lineitem_ds.select_columns(
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount"]).map_batches(
            lpartial, batch_format="pyarrow",
            batch_size=65536).materialize(),
        pa.schema([("l_orderkey", pa.int64()), ("s_nk", pa.int64()),
                   ("l_year", pa.int64()), ("rev_c4", pa.int64())]))
    orders = drop_empty_blocks(
        read_parquet_clean(orders_path,
                           columns=["o_orderkey", "o_custkey"])
        .map_batches(opartial, batch_format="pyarrow",
                     batch_size=65536).materialize(),
        pa.schema([("o_orderkey", pa.int64()), ("c_nk", pa.int64())]))
    _EMPTY_OUT = pa.table({
        "supp_nation": pa.array([], pa.string()),
        "cust_nation": pa.array([], pa.string()),
        "l_year": pa.array([], pa.int64()),
        "revenue_c4": pa.array([], pa.int64()),
    })
    if int(parts.count()) == 0 or int(orders.count()) == 0:
        # a zero-row side leaves the hash-join partitions schema-less
        # (FieldRef resolution fails in finalize) — and the answer is
        # known anyway
        return _EMPTY_OUT
    joined = parts.join(orders, join_type="inner",
                        num_partitions=num_partitions,
                        on=("l_orderkey",), right_on=("o_orderkey",))

    names = keys

    def fold(t: pa.Table) -> pa.Table:
        snk_ = t.column("s_nk").to_numpy()
        cnk_ = t.column("c_nk").to_numpy()
        keep = snk_ != cnk_  # cross-nation trade only
        g = (pd.DataFrame({
            "s_nk": snk_[keep], "c_nk": cnk_[keep],
            "l_year": t.column("l_year").to_numpy()[keep],
            "rev_c4": t.column("rev_c4").to_numpy()[keep]})
            .groupby(["s_nk", "c_nk", "l_year"], sort=False)["rev_c4"]
            .sum().reset_index())
        return pa.table({
            "s_nk": pa.array(g["s_nk"].to_numpy(np.int64)),
            "c_nk": pa.array(g["c_nk"].to_numpy(np.int64)),
            "l_year": pa.array(g["l_year"].to_numpy(np.int64)),
            "rev_c4": pa.array(g["rev_c4"].to_numpy(np.int64)),
        })

    agg = (joined.map_batches(fold, batch_format="pyarrow",
                              batch_size=65536)
           .groupby(["s_nk", "c_nk", "l_year"])
           .aggregate(Sum("rev_c4", alias_name="revenue_c4"))
           .to_pandas())  # 2 x 2 x years bounded
    agg["supp_nation"] = agg["s_nk"].map(names)
    agg["cust_nation"] = agg["c_nk"].map(names)
    agg = agg.sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)
    return pa.table({
        "supp_nation": pa.array(agg["supp_nation"], pa.string()),
        "cust_nation": pa.array(agg["cust_nation"], pa.string()),
        "l_year": pa.array(agg["l_year"].to_numpy(np.int64)),
        "revenue_c4": pa.array(agg["revenue_c4"].to_numpy(np.int64)),
    })
