"""Temporal-of-interest normalization + nearest/pad/bfill snapping.

Re-derives the reference's TOI handling (``core/toi.py:10-42``) and the
ingest-side nearest-snap (``core/backend.py:256-257``) as numpy searchsorted
kernels over a sorted fixed time axis — usable both on the driver (query
normalization) and vectorized inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np


def snap_nearest(axis: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Index of the nearest axis element for each ts (ties -> later element,
    matching pandas ``get_indexer(method='nearest')`` midpoint behavior)."""
    axis = np.asarray(axis, dtype="datetime64[us]").astype(np.int64)
    t = np.asarray(ts, dtype="datetime64[us]").astype(np.int64)
    pos = np.searchsorted(axis, t)  # first element >= t ('left')
    pos = np.clip(pos, 0, len(axis) - 1)
    prev = np.clip(pos - 1, 0, len(axis) - 1)
    d_next = np.abs(axis[pos] - t)
    d_prev = np.abs(t - axis[prev])
    return np.where(d_prev < d_next, prev, pos)


def snap_pad(axis: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """Last axis element <= ts (pandas method='pad'/'ffill'); -1 if before axis."""
    axis = np.asarray(axis, dtype="datetime64[us]").astype(np.int64)
    t = np.asarray(ts, dtype="datetime64[us]").astype(np.int64)
    return np.searchsorted(axis, t, side="right") - 1


def snap_bfill(axis: np.ndarray, ts: np.ndarray) -> np.ndarray:
    """First axis element >= ts (pandas method='bfill'); len(axis) if after."""
    axis = np.asarray(axis, dtype="datetime64[us]").astype(np.int64)
    t = np.asarray(ts, dtype="datetime64[us]").astype(np.int64)
    return np.searchsorted(axis, t, side="left")


def toi_to_index(
    axis: np.ndarray,
    toi,
    method: str = "nearest",
) -> np.ndarray:
    """Normalize a TOI (None | scalar | (start, end) slice | list) to axis
    indices, reference ``core/toi.py:26-42`` semantics: scalar/list TOIs
    snap per ``method`` (``nearest`` default, ``pad`` = last step <= t,
    ``bfill`` = first step >= t; out-of-range pad/bfill lookups drop, the
    get_indexer -1 analog), slices select the inclusive range."""
    axis = np.asarray(axis, dtype="datetime64[us]")
    if toi is None:
        return np.arange(len(axis))
    if isinstance(toi, tuple) and len(toi) == 2:
        start, end = toi
        lo = 0 if start is None else int(snap_bfill(axis, np.array([start]))[0])
        hi = len(axis) - 1 if end is None else int(snap_pad(axis, np.array([end]))[0])
        return np.arange(max(lo, 0), min(hi, len(axis) - 1) + 1)
    arr = np.atleast_1d(np.asarray(toi, dtype="datetime64[us]"))
    if method == "nearest":
        return snap_nearest(axis, arr)
    if method == "pad":
        idx = snap_pad(axis, arr)
        return idx[idx >= 0]
    if method == "bfill":
        idx = snap_bfill(axis, arr)
        return idx[idx < len(axis)]
    raise ValueError(f"unknown TOI method {method!r}")
