"""Keyed as-of join: for each left row, the latest right row at or before it.

Generalizes the engine's axis-snap as-of lookup (J6, ``raygeo.toi``) from a
fixed broadcast time axis to a full dataset-vs-dataset join — the classic
event-attribution shape (each click joins its user's most recent prior
view). Ray Data has no native as-of join; the composition here is the
co-partition idiom:

    tag each side -> union -> ONE hash shuffle on the key ->
    per-group sort of the right side + vectorized searchsorted

Both inputs cross the wire exactly once; per-group work is
O(n log n) in the group size, and group skew is bounded by per-key row
counts, not by the join fan-out (as-of emits at most one match per left
row). Oracle: DuckDB ``ASOF JOIN``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def asof_join(left_ds, right_ds, by: str, on: str,
              left_keep: list[str], right_keep: list[str],
              right_suffix: str = "_right"):
    """As-of inner join of two Datasets on ``by``, matching the greatest
    right ``on`` <= left ``on``.

    Returns a Dataset with ``left_keep`` columns, ``right_keep`` columns
    (suffixed), and ``lag_us`` (microseconds between the matched rows when
    ``on`` is a timestamp, else the raw difference cast to int64).
    """

    side_col = "__asof_side"

    def tag(side: int, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[[by, on] + [c for c in keep if c not in (by, on)]].copy()
            out[side_col] = np.int8(side)
            return out
        return fn

    left_tagged = left_ds.map_batches(tag(0, left_keep), batch_format="pandas",
                                      batch_size=8192)
    right_tagged = right_ds.map_batches(tag(1, right_keep),
                                        batch_format="pandas", batch_size=8192)
    both = left_tagged.union(right_tagged)

    lcols = [c for c in left_keep if c != by]
    rcols = [c for c in right_keep if c != by]

    # the union null-pads each side's missing columns, which silently
    # promotes int/bool columns to float64 inside the groups — record the
    # declared dtypes now and cast the output back
    cast_map: dict[str, object] = {}
    for sch, cols, suf in ((left_ds.schema(), lcols, ""),
                           (right_ds.schema(), rcols, right_suffix)):
        for name, typ in zip(sch.names, sch.types):
            if name in cols:
                dt = typ.to_pandas_dtype() if hasattr(typ, "to_pandas_dtype") else None
                if dt is not None and np.issubdtype(dt, np.integer):
                    cast_map[name + suf] = dt

    def group_asof(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g[side_col] == 0]
        # sort ties by the payload columns too: group arrival order depends
        # on the shuffle, so an `on`-only sort would make equal-timestamp
        # matches nondeterministic across runs
        r = g[g[side_col] == 1].sort_values([on] + rcols, kind="mergesort")
        empty = {
            **{c: pd.Series(dtype=g[c].dtype) for c in lcols},
            **{c + right_suffix: pd.Series(dtype=g[c].dtype) for c in rcols},
            "lag_us": pd.Series(dtype="int64"),
        }
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame(empty).astype(cast_map)
        idx = np.searchsorted(r[on].to_numpy(), l[on].to_numpy(),
                              side="right") - 1
        hit = idx >= 0
        if not hit.any():
            return pd.DataFrame(empty).astype(cast_map)
        lm = l[hit]
        rm = r.iloc[idx[hit]]
        lag = (lm[on].to_numpy() - rm[on].to_numpy())
        if np.issubdtype(lag.dtype, np.timedelta64):
            lag = lag.astype("timedelta64[us]").astype(np.int64)
        else:
            lag = lag.astype(np.int64)
        out = {c: lm[c].to_numpy() for c in lcols}
        out.update({c + right_suffix: rm[c].to_numpy() for c in rcols})
        out["lag_us"] = lag
        return pd.DataFrame(out).astype(cast_map)

    return both.groupby(by).map_groups(group_asof, batch_format="pandas")
