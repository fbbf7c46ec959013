"""Hierarchical spatial cell ids (the H3/S2 role) — pure numpy.

A cell id addresses one square of a 2^level x 2^level quadtree over a grid's
extent, packed into a single int64::

    id = (level << 58) | interleave_bits(ix, iy)     (Z-order / Morton)

Z-order keeps spatially-near cells numerically near, which makes the id a
good hash-partition AND range-partition key — the "deterministic cell->tile
hash partitioner" of the north star. Neighbor rings (``ring``) drive the
cell-ring-expansion kNN operator (SURVEY.md §2.4).

All encode/decode/parent/children ops are vectorized over Arrow-backed numpy
buffers; nothing here touches Ray.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 28  # 2*28 = 56 bits of Morton + 5 bits of level < 63


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 28 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64) & np.uint64(0x0FFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x000000000FFFFFFF)
    return v


def encode_xy(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    """Pack quadtree coords (ix, iy) at ``level`` into int64 cell ids."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level out of range")
    morton = _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))
    return ((np.uint64(level) << np.uint64(58)) | morton).astype(np.int64)


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unpack cell ids -> (ix, iy, level)."""
    c = np.asarray(cell).astype(np.uint64)
    level = (c >> np.uint64(58)).astype(np.int64)
    morton = c & np.uint64((1 << 58) - 1)
    ix = _compact1by1(morton).astype(np.int64)
    iy = _compact1by1(morton >> np.uint64(1)).astype(np.int64)
    return ix, iy, level


def cell_of(
    x: np.ndarray,
    y: np.ndarray,
    level: int,
    x0: float = -180.0,
    y0: float = -90.0,
    x1: float = 180.0,
    y1: float = 90.0,
) -> np.ndarray:
    """Cell id of each point at ``level`` over the extent [x0,x1]x[y0,y1]."""
    n = 1 << level
    fx = (np.asarray(x, dtype=np.float64) - x0) / (x1 - x0)
    fy = (np.asarray(y, dtype=np.float64) - y0) / (y1 - y0)
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1)
    return encode_xy(ix, iy, level)


def parent(cell: np.ndarray, levels_up: int = 1) -> np.ndarray:
    ix, iy, level = decode_xy(cell)
    new_level = np.atleast_1d(level - levels_up)
    if np.any(new_level < 0):
        raise ValueError("cannot go above level 0")
    if not np.all(new_level == new_level[0]):
        # encode_xy takes one scalar level for the whole batch; silently
        # using the first element's level would mis-encode every cell whose
        # level differs — reject mixed-level input instead
        raise ValueError("parent() requires all cells at the same level")
    out = encode_xy(ix >> levels_up, iy >> levels_up, int(new_level[0]))
    return out if np.ndim(cell) else out.reshape(())


def children(cell: int) -> np.ndarray:
    """The 4 child cell ids of a single cell."""
    ix, iy, level = decode_xy(np.asarray([cell]))
    ix, iy, level = int(ix[0]), int(iy[0]), int(level[0])
    cx = np.array([2 * ix, 2 * ix + 1, 2 * ix, 2 * ix + 1])
    cy = np.array([2 * iy, 2 * iy, 2 * iy + 1, 2 * iy + 1])
    return encode_xy(cx, cy, level + 1)


def ring(cell: int, r: int, wrap_x: bool = False) -> np.ndarray:
    """Cell ids at Chebyshev distance exactly ``r`` from ``cell`` (r=0 -> self).

    ``wrap_x=True`` wraps the x axis (antimeridian-continuous grids).
    Out-of-range cells are dropped (or wrapped for x).
    """
    ix, iy, level = decode_xy(np.asarray([cell]))
    ix, iy, level = int(ix[0]), int(iy[0]), int(level[0])
    n = 1 << level
    if r == 0:
        return encode_xy(np.array([ix]), np.array([iy]), level)
    xs, ys = [], []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            if max(abs(dx), abs(dy)) != r:
                continue
            cx, cy = ix + dx, iy + dy
            if wrap_x:
                cx %= n
            if 0 <= cx < n and 0 <= cy < n:
                xs.append(cx)
                ys.append(cy)
    if not xs:
        return np.empty(0, dtype=np.int64)
    return encode_xy(np.array(xs), np.array(ys), level)


def disk(cell: int, r: int, wrap_x: bool = False) -> np.ndarray:
    """All cells within Chebyshev distance <= r (union of rings 0..r)."""
    parts = [ring(cell, k, wrap_x=wrap_x) for k in range(r + 1)]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
