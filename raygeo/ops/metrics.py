"""Per-partition throughput + skew metrics (north-rule observability).

Two report surfaces:

- :func:`key_skew_report` — hot-key report over any keyed Dataset: map-side
  partial counts (one row per key per batch — the combiner pattern, so the
  shuffle never carries raw rows) -> tiny ``groupby().sum`` -> global
  ``sort(desc).limit(n)``. This is how a run decides which keys need salting
  (the fixture's deliberate HOT_TILE shows up as rank 1).
- :func:`partition_report` — per-partition wall/bytes/rows from the lineage
  ledger (the reference's stopuhr-timer role, ``core/accessor.py:107-108``,
  ``core/backend.py:59-93``), plus summary skew indicators
  (max/mean, p50/p99) a scheduler would alert on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import lineage


def key_skew_report(ds, key: str, top_n: int = 20):
    """Top-N hottest keys by row count (Dataset -> Dataset, fully streaming)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        counts = t.group_by(key).aggregate([(key, "count")])
        return pa.table(
            {
                key: counts.column(key),
                "n": counts.column(f"{key}_count").cast(pa.int64()),
            }
        )

    per_key = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )
    # descending count, ascending key as the deterministic tie-break
    return per_key.sort([("n"), (key)], descending=[True, False]).limit(top_n)


def skew_stats(counts: np.ndarray) -> dict:
    """Summary skew indicators over per-key or per-partition loads."""
    c = np.asarray(counts, dtype=np.float64)
    if len(c) == 0:
        return {"n_keys": 0}
    return {
        "n_keys": int(len(c)),
        "total": float(c.sum()),
        "mean": float(c.mean()),
        "p50": float(np.percentile(c, 50)),
        "p99": float(np.percentile(c, 99)),
        "max": float(c.max()),
        "max_over_mean": float(c.max() / c.mean()) if c.mean() else None,
    }


def partition_report(cube_path: str) -> pd.DataFrame:
    """Per-partition lineage metrics table + attached summary attrs."""
    rows = lineage.partition_metrics(cube_path)
    df = pd.DataFrame(rows, columns=["partition_id", "rows", "bytes", "wall_ms"])
    if len(df):
        df = df.sort_values("wall_ms", ascending=False).reset_index(drop=True)
        df.attrs["skew"] = {
            "wall_ms": skew_stats(df["wall_ms"].to_numpy()),
            "bytes": skew_stats(df["bytes"].to_numpy()),
        }
    return df


def pair_start_end(events_ds, start_type: str, end_type: str,
                   key_col: str = "user_id"):
    """J5: start/end event pairing -> wait durations (the reference's
    thread-event pairing, ``core/backend.py:79-93``: a pandas merge of start
    and stop rows on (patch, action, thread) computing per-action durations
    for the Gantt report).

    Engine semantics (deterministic, SQL-expressible): per ``key_col``, each
    ``start_type`` event pairs with the FIRST ``end_type`` event strictly
    after it; starts with no later end drop. One keyed shuffle
    (``groupby(key).map_groups``) — a key's events always fit one task —
    then a vectorized searchsorted match per group.

    Returns a Dataset of (key_col, event_id, wait_us:int64).
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        starts = g[g.event_type == start_type]
        ends_ts = g.loc[g.event_type == end_type, "ts"].to_numpy()
        if len(starts) == 0 or len(ends_ts) == 0:
            return pd.DataFrame({key_col: pd.Series(dtype=g[key_col].dtype),
                                 "event_id": pd.Series(dtype="int64"),
                                 "wait_us": pd.Series(dtype="int64")})
        s_ts = starts["ts"].to_numpy()
        pos = np.searchsorted(ends_ts, s_ts, side="right")
        ok = pos < len(ends_ts)
        wait = (
            ends_ts[pos[ok]].astype("datetime64[us]").astype(np.int64)
            - s_ts[ok].astype("datetime64[us]").astype(np.int64)
        )
        return pd.DataFrame(
            {
                key_col: starts[key_col].to_numpy()[ok],
                "event_id": starts["event_id"].to_numpy()[ok].astype(np.int64),
                "wait_us": wait,
            }
        )

    return (
        events_ds.select_columns([key_col, "event_id", "ts", "event_type"])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def event_timeline(cube_path: str) -> pd.DataFrame:
    """T6: per-partition event timeline from the lineage ledger (the
    reference's thread-event log, ``core/backend.py:46-93``: start/stop
    events per (thread, action, patch) -> durations -> Gantt). Each committed
    partition record carries its wall time, commit instant, and producing
    worker, so the timeline reconstructs without any in-memory event list —
    it survives restarts and multi-process runs by construction.

    Returns (partition_id, worker, start_ts, end_ts, wall_ms) sorted by
    start_ts.
    """
    rows = []
    for r in lineage.read_records(cube_path):
        end = float(r.get("commit_ts", 0.0))
        wall = float(r.get("wall_ms", 0.0))
        rows.append(
            {
                "partition_id": r["partition_id"],
                "worker": r.get("worker", "?"),
                "start_ts": end - wall / 1e3,
                "end_ts": end,
                "wall_ms": wall,
            }
        )
    df = pd.DataFrame(
        rows, columns=["partition_id", "worker", "start_ts", "end_ts", "wall_ms"]
    )
    return df.sort_values("start_ts", kind="mergesort").reset_index(drop=True)


def gantt_ascii(cube_path: str, width: int = 80) -> str:
    """ASCII Gantt of the partition timeline, one row per worker (the
    matplotlib-free analog of the reference's Gantt plot assets,
    ``core/backend.py:95-185``). '#' marks the span a worker spent producing
    partitions; the header shows the run's wall-clock extent."""
    df = event_timeline(cube_path)
    if df.empty:
        return "(no committed partitions)"
    t0 = float(df.start_ts.min())
    t1 = float(df.end_ts.max())
    span = max(t1 - t0, 1e-9)
    out = [f"run span {span:.3f}s, {df.worker.nunique()} workers, "
           f"{len(df)} partitions"]
    for worker, g in df.groupby("worker", sort=True):
        bar = [" "] * width
        for _, r in g.iterrows():
            a = int((r.start_ts - t0) / span * (width - 1))
            b = int((r.end_ts - t0) / span * (width - 1))
            for k in range(a, b + 1):
                bar[k] = "#"
        out.append(f"{worker:>24} |{''.join(bar)}|")
    return "\n".join(out)


def timeline_svg(cube_path: str, width: int = 960, row_h: int = 8) -> str:
    """Gantt timeline of per-partition ingest work as a standalone SVG
    string — the reference's task-timeline plot (``core/backend.py:
    95-185``) without a plotting dependency (SVG is text; this sandbox
    has no matplotlib).

    One bar per committed partition: start = commit_ts - wall_ms, end =
    commit_ts, rows sorted by start. Bar color encodes relative duration
    (longer = darker) so stragglers and skew pop visually. Deterministic
    for a given ledger. Render with any browser or embed in reports.
    """
    from .. import lineage

    recs = sorted(lineage.read_records(cube_path),
                  key=lambda r: (r["commit_ts"] - r["wall_ms"] / 1e3,
                                 r["partition_id"]))
    if not recs:
        return ('<svg xmlns="http://www.w3.org/2000/svg" width="200" '
                'height="20"><text x="4" y="14">empty ledger</text></svg>')
    t0 = min(r["commit_ts"] - r["wall_ms"] / 1e3 for r in recs)
    t1 = max(r["commit_ts"] for r in recs)
    span = max(t1 - t0, 1e-6)
    max_ms = max(r["wall_ms"] for r in recs) or 1.0
    pad, label_w = 4, 90
    h = pad * 2 + row_h * len(recs) + 16
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{h}" font-family="monospace" font-size="{row_h - 1}">',
        f'<text x="{pad}" y="{h - 4}">span {span:.3f}s, '
        f'{len(recs)} partitions, max {max_ms:.0f}ms</text>',
    ]
    plot_w = width - label_w - 2 * pad
    for i, r in enumerate(recs):
        s = (r["commit_ts"] - r["wall_ms"] / 1e3 - t0) / span
        w = max(r["wall_ms"] / 1e3 / span, 1e-4)
        x = label_w + pad + s * plot_w
        y = pad + i * row_h
        shade = 230 - int(180 * (r["wall_ms"] / max_ms))
        parts.append(
            f'<rect x="{x:.1f}" y="{y}" width="{max(w * plot_w, 1):.1f}" '
            f'height="{row_h - 1}" fill="rgb({shade},{shade},255)"/>')
        parts.append(
            f'<text x="{pad}" y="{y + row_h - 2}">'
            f'{r["partition_id"][:12]}</text>')
    parts.append("</svg>")
    return "\n".join(parts)


def benford_stats(events_ds, value_col: str = "value"):
    """Benford first-significant-digit audit — the fraud/anomaly
    screening test (natural multi-scale quantities follow
    P(d) = log10(1 + 1/d)): histogram the first significant digit of
    the integer cent values and report, per digit, the observed count
    next to the Benford-expected count in parts-per-million of N
    (expected_ppm uses the exact rational floor((ln(d+1)-ln(d)) /
    ln(10) * 1e6) — a CONSTANT 9-entry table, identical in SQL).

    Pure map + 9-bin bounded fold: first digit via string of the
    absolute cent value (no float log in the data path). Zero-valued
    rows drop (no significant digit). Output: (digit, n, expected_ppm).
    """
    # literal table (floor(log10(1+1/d) * 1e6)) so the SQL replay embeds
    # the SAME constants — no cross-engine libm in the comparison path
    exp_ppm = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t.column(value_col).to_numpy() * 100) \
            .astype(np.int64)
        cents = np.abs(cents[cents != 0])
        if not len(cents):
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        digs = np.asarray([int(str(c)[0]) for c in cents], np.int64)
        u, n = np.unique(digs, return_counts=True)
        return pa.table({"digit": pa.array(u, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum

    hist = (events_ds.select_columns([value_col])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("digit").aggregate(Sum("n", alias_name="n")))

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("digit").to_numpy()
        return t.append_column(
            "expected_ppm",
            pa.array([exp_ppm[int(x)] for x in d], pa.int64()))

    return hist.map_batches(finish, batch_format="pyarrow").sort("digit")
