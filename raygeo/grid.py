"""GeoBox / chunk-grid math: the deterministic footprint -> tile kernel.

Re-derives the reference's chunk-alignment semantics (odc-geo ``GeoboxTiles``
used at ``accessors/gee.py:58-60`` and the pixel-slice mapping of
``core/backend.py:241-261``) as pure numpy functions over Arrow coordinate
buffers. Convention is north-up rasters:

    col = (x - x0) / res          (x grows east)
    row = (y1 - y) / res          (y1 = north edge, rows grow south)

A footprint box maps to the half-open pixel window
``[floor(col_min), ceil(col_max)) x [floor(row_min), ceil(row_max))`` clipped
to the grid, and to every chunk tile that window intersects. Tile ids follow
the reference's string format (``accessors/gee.py:62-78``):
``"{tx}-{ty}"`` or ``"{t}-{tx}-{ty}"`` for temporal cubes.

The same floor/ceil arithmetic is expressible in ANSI SQL, which is how the
driver's DuckDB oracle independently checks tile assignment.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict

import numpy as np


@dataclass(frozen=True)
class GridSpec:
    """Spatial frame of a cube: CRS + origin + resolution + chunking.

    Mirrors the reference's per-dataset class constants (extent, chunk_size,
    ``core/accessor.py:58-64``) as an explicit value object.
    """

    name: str
    crs: str  # e.g. "EPSG:4326"
    x0: float  # west edge
    y1: float  # north edge
    res: float  # pixel size (same units as CRS axes)
    width: int  # pixels (x)
    height: int  # pixels (y)
    chunk: int  # chunk/tile size in pixels
    times: tuple[str, ...] = ()  # ISO-8601 instants; empty = non-temporal

    @property
    def x1(self) -> float:
        return self.x0 + self.width * self.res

    @property
    def y0(self) -> float:
        return self.y1 - self.height * self.res

    @property
    def n_tx(self) -> int:
        return -(-self.width // self.chunk)

    @property
    def n_ty(self) -> int:
        return -(-self.height // self.chunk)

    @property
    def temporal(self) -> bool:
        return len(self.times) > 0

    def time_axis(self) -> np.ndarray:
        return np.array(list(self.times), dtype="datetime64[us]")

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "GridSpec":
        d = dict(d)
        d["times"] = tuple(d.get("times") or ())
        return GridSpec(**d)

    # ---- pixel-window math (vectorized over arrays of boxes) ----

    def pixel_window(
        self,
        lon_min: np.ndarray,
        lat_min: np.ndarray,
        lon_max: np.ndarray,
        lat_max: np.ndarray,
        clip: bool = True,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Half-open pixel windows ``(col_lo, col_hi, row_lo, row_hi)``.

        Semantics of ``overlap_roi`` / ``stac.py:19-46``: floor at the low
        edge, ceil at the high edge, clipped to the grid.
        """
        col_lo = np.floor((np.asarray(lon_min) - self.x0) / self.res).astype(np.int64)
        col_hi = np.ceil((np.asarray(lon_max) - self.x0) / self.res).astype(np.int64)
        row_lo = np.floor((self.y1 - np.asarray(lat_max)) / self.res).astype(np.int64)
        row_hi = np.ceil((self.y1 - np.asarray(lat_min)) / self.res).astype(np.int64)
        if clip:
            col_lo = np.clip(col_lo, 0, self.width)
            col_hi = np.clip(col_hi, 0, self.width)
            row_lo = np.clip(row_lo, 0, self.height)
            row_hi = np.clip(row_hi, 0, self.height)
        return col_lo, col_hi, row_lo, row_hi

    def tile_ranges(
        self,
        lon_min: np.ndarray,
        lat_min: np.ndarray,
        lon_max: np.ndarray,
        lat_max: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Per-box inclusive tile ranges ``(tx_lo, tx_hi, ty_lo, ty_hi, valid)``."""
        col_lo, col_hi, row_lo, row_hi = self.pixel_window(
            lon_min, lat_min, lon_max, lat_max
        )
        valid = (col_hi > col_lo) & (row_hi > row_lo)
        tx_lo = col_lo // self.chunk
        tx_hi = (col_hi - 1) // self.chunk
        ty_lo = row_lo // self.chunk
        ty_hi = (row_hi - 1) // self.chunk
        return tx_lo, tx_hi, ty_lo, ty_hi, valid

    def explode_tiles(
        self,
        lon_min: np.ndarray,
        lat_min: np.ndarray,
        lon_max: np.ndarray,
        lat_max: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Explode boxes to (row_index, tx, ty) covering tiles — vectorized.

        Returns parallel arrays ``(idx, tx, ty)`` where ``idx`` indexes back
        into the input arrays. This is the J1 analytic spatial join: the grid
        is a pure function, so no shuffle is needed to assign tiles.
        """
        tx_lo, tx_hi, ty_lo, ty_hi, valid = self.tile_ranges(
            lon_min, lat_min, lon_max, lat_max
        )
        nx = np.where(valid, tx_hi - tx_lo + 1, 0)
        ny = np.where(valid, ty_hi - ty_lo + 1, 0)
        counts = nx * ny
        total = int(counts.sum())
        if total == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z.copy(), z.copy()
        idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # local rank within each box's tile block
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        nyr = np.repeat(ny, counts)
        tx = np.repeat(tx_lo, counts) + local // np.maximum(nyr, 1)
        ty = np.repeat(ty_lo, counts) + local % np.maximum(nyr, 1)
        return idx, tx, ty

    def tile_pixel_window(self, tx: int, ty: int) -> tuple[int, int, int, int]:
        """Pixel window (col_lo, col_hi, row_lo, row_hi) of one tile (clipped)."""
        c = self.chunk
        return (
            tx * c,
            min((tx + 1) * c, self.width),
            ty * c,
            min((ty + 1) * c, self.height),
        )


def tile_id_strings(
    tx: np.ndarray, ty: np.ndarray, t: np.ndarray | None = None
) -> np.ndarray:
    """Reference-format tile id strings (``gee.py:62-78``)."""
    tx = np.asarray(tx).astype(str)
    ty = np.asarray(ty).astype(str)
    if t is None:
        return np.char.add(np.char.add(tx, "-"), ty)
    t = np.asarray(t).astype(str)
    return np.char.add(np.char.add(np.char.add(np.char.add(t, "-"), tx), "-"), ty)


def parse_tile_id(tile_id: str) -> tuple[int, ...]:
    """Inverse of :func:`tile_id_strings` for a single id."""
    return tuple(int(p) for p in tile_id.split("-"))
