"""Geometry kernels: point-in-polygon, bbox ops, antimeridian handling.

All pure numpy over coordinate buffers — the sandbox has no shapely/geopandas.
Semantics mirrored from the reference:

- antimeridian x-shift (``accessors/gee.py:211-215``): geometry touching the
  +/-180 seam is normalized by splitting into in-range boxes rather than
  shifting pixel data, which is the equivalent operation one level earlier.
- ROI x grid joins use bbox prefilter + exact predicate, like the sjoin at
  ``accessors/gee.py:101-107`` / ``datasets/arcticdem.py:217-233``.
"""

from __future__ import annotations

import numpy as np


def winding_number_pip(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Vectorized winding-number point-in-polygon test.

    ``px, py``: (N,) point coordinates. ``ring``: (M, 2) closed or open
    exterior ring (closure is enforced). Returns (N,) bool — True when the
    winding number is non-zero (points exactly on an edge follow the usual
    half-open crossing convention).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    x0, y0 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
    x1, y1 = ring[1:, 0][:, None], ring[1:, 1][:, None]
    px = np.asarray(px, dtype=np.float64)[None, :]
    py = np.asarray(py, dtype=np.float64)[None, :]
    # is_left > 0 => point left of edge (x0,y0)->(x1,y1)
    is_left = (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)
    up = (y0 <= py) & (y1 > py) & (is_left > 0)
    down = (y0 > py) & (y1 <= py) & (is_left < 0)
    wn = up.sum(axis=0).astype(np.int64) - down.sum(axis=0).astype(np.int64)
    return wn != 0


def boxes_intersect(
    a_min_x, a_min_y, a_max_x, a_max_y, b_min_x, b_min_y, b_max_x, b_max_y
) -> np.ndarray:
    """Vectorized open-interval box intersection (touching edges don't count,
    matching the half-open pixel-window semantics of the grid kernel)."""
    return (
        (np.asarray(a_min_x) < np.asarray(b_max_x))
        & (np.asarray(a_max_x) > np.asarray(b_min_x))
        & (np.asarray(a_min_y) < np.asarray(b_max_y))
        & (np.asarray(a_max_y) > np.asarray(b_min_y))
    )


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    ring = np.asarray(ring, dtype=np.float64)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def split_antimeridian_box(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float
) -> list[tuple[float, float, float, float]]:
    """Normalize a lon/lat box that may cross the +/-180 seam.

    A box given with ``lon_min > lon_max`` (wrapping) or with lon outside
    [-180, 180] is split into one or two in-range boxes. Mirrors the
    reference's antimeridian correction (``gee.py:211-215``), applied to the
    query geometry instead of the returned raster.
    """
    if lon_min < -180.0:
        lon_min += 360.0
    if lon_max > 180.0:
        lon_max -= 360.0
    if lon_min <= lon_max:
        return [(lon_min, lat_min, lon_max, lat_max)]
    return [
        (lon_min, lat_min, 180.0, lat_max),
        (-180.0, lat_min, lon_max, lat_max),
    ]


def polygon_intersects_boxes(
    ring: np.ndarray,
    bx_min: np.ndarray,
    by_min: np.ndarray,
    bx_max: np.ndarray,
    by_max: np.ndarray,
) -> np.ndarray:
    """Conservative-exact polygon x box intersection for axis-aligned boxes.

    True iff (a) any box corner is inside the polygon, (b) any polygon vertex
    is inside the box, or (c) any polygon edge crosses a box edge. Used as the
    exact predicate after a bbox prefilter (J1/J2).
    """
    ring = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    n = len(bx_min)
    out = np.zeros(n, dtype=bool)

    # (a) corners inside polygon
    for cx, cy in (
        (bx_min, by_min),
        (bx_min, by_max),
        (bx_max, by_min),
        (bx_max, by_max),
    ):
        out |= winding_number_pip(np.asarray(cx), np.asarray(cy), ring)
        if out.all():
            return out

    # (b) polygon vertex inside box
    vx, vy = ring[:-1, 0], ring[:-1, 1]
    inside = (
        (vx[None, :] > np.asarray(bx_min)[:, None])
        & (vx[None, :] < np.asarray(bx_max)[:, None])
        & (vy[None, :] > np.asarray(by_min)[:, None])
        & (vy[None, :] < np.asarray(by_max)[:, None])
    )
    out |= inside.any(axis=1)
    if out.all():
        return out

    # (c) edge / box-edge crossing via segment-box overlap (Liang-Barsky style)
    ex0, ey0 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    ex1, ey1 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    bxm = np.asarray(bx_min)[:, None]
    bym = np.asarray(by_min)[:, None]
    bxM = np.asarray(bx_max)[:, None]
    byM = np.asarray(by_max)[:, None]
    dx = ex1 - ex0
    dy = ey1 - ey0
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = np.zeros_like(dx + bxm)
        t1 = np.ones_like(t0)
        for p, q in (
            (-dx, ex0 - bxm),
            (dx, bxM - ex0),
            (-dy, ey0 - bym),
            (dy, byM - ey0),
        ):
            r = np.where(p != 0, q / np.where(p == 0, 1.0, p), np.inf)
            ent = np.where(p < 0, r, -np.inf)
            ext = np.where(p > 0, r, np.inf)
            rej = (p == 0) & (q < 0)
            t0 = np.maximum(t0, np.where(rej, np.inf, ent))
            t1 = np.minimum(t1, np.where(rej, -np.inf, ext))
        out |= (t0 <= t1).any(axis=1)
    return out


# --------------------------------------------------------------- projections
# M1 (CRS reprojection, ``accessor.py:372-373`` / ``arcticdem.py:216-231``):
# the engine carries explicit CRS codes on GridSpec and reprojects query
# geometry to the cube CRS with pure-numpy forward/inverse kernels — the two
# families the reference's shipped datasets use: a web-mercator-style
# projected CRS (EPSG:3857 analog) and a polar stereographic one
# (EPSG:3413 analog, the ArcticDEM frame). Spherical formulas (R = 6378137),
# deterministic and exactly invertible to float64 round-off.

EARTH_R = 6378137.0


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray):
    """EPSG:3857-style forward: (lon, lat) deg -> (x, y) meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = EARTH_R * np.deg2rad(lon)
    y = EARTH_R * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / EARTH_R)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / EARTH_R)) - np.pi / 2.0)
    return lon, lat


def lonlat_to_polar_stereo(lon: np.ndarray, lat: np.ndarray,
                           lon0: float = -45.0, north: bool = True):
    """EPSG:3413-style polar stereographic forward (spherical, scale at pole).

    The projection the ArcticDEM path intersects in (antimeridian-safe:
    the +/-180 seam maps to a ray through the pole, not a discontinuity).
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    sgn = 1.0 if north else -1.0
    t = np.tan(np.pi / 4.0 - sgn * np.deg2rad(lat) / 2.0)
    rho = 2.0 * EARTH_R * t
    theta = np.deg2rad(lon - lon0)
    x = rho * np.sin(theta)
    y = -sgn * rho * np.cos(theta)
    return x, y


def polar_stereo_to_lonlat(x: np.ndarray, y: np.ndarray,
                           lon0: float = -45.0, north: bool = True):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    sgn = 1.0 if north else -1.0
    rho = np.hypot(x, y)
    lat = sgn * np.rad2deg(np.pi / 2.0 - 2.0 * np.arctan(rho / (2.0 * EARTH_R)))
    theta = np.arctan2(x, -sgn * y)
    lon = np.rad2deg(theta) + lon0
    lon = (lon + 180.0) % 360.0 - 180.0
    return lon, lat


def forward_xy(crs: str, lon: np.ndarray, lat: np.ndarray):
    """Forward-project lon/lat arrays into ``crs`` coordinates (M1 dispatch,
    ``accessor.py:372-373`` ``to_crs`` analog)."""
    c = crs.upper()
    if c in ("EPSG:4326", "CRS:84"):
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if c in ("EPSG:3857", "MERCATOR"):
        return lonlat_to_mercator(lon, lat)
    if c in ("EPSG:3413", "POLAR_N"):
        return lonlat_to_polar_stereo(lon, lat)
    if c == "POLAR_S":
        return lonlat_to_polar_stereo(lon, lat, north=False)
    raise ValueError(f"unsupported CRS {crs}")


def project_box_bbox(
    crs: str,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    n_samples: int = 8,
) -> tuple[float, float, float, float]:
    """Projected-CRS bbox of a lon/lat box: densify each edge with
    ``n_samples`` steps, project, take min/max.

    Edge densification bounds the curvature error of projected box edges
    (a lon/lat box maps to an annular sector under polar stereographic); the
    deterministic sample positions ``t = i / n`` are mirrored verbatim by
    the SQL oracle, so engine and oracle compute bit-identical bboxes.

    Antimeridian: a wrapping box (``lon_min > lon_max``) is projected as the
    contiguous lon range ``[lon_min, lon_max + 360]`` — the projected plane
    has no seam (the reference's motivation for intersecting in EPSG:3413,
    ``arcticdem.py:216-231``), so no split is needed.
    """
    if lon_min > lon_max:
        lon_max = lon_max + 360.0
    ts = np.arange(n_samples + 1, dtype=np.float64) / n_samples
    lon_e = lon_min + (lon_max - lon_min) * ts
    lat_e = lat_min + (lat_max - lat_min) * ts
    lon = np.concatenate([
        lon_e, lon_e,
        np.full(n_samples + 1, lon_min), np.full(n_samples + 1, lon_max),
    ])
    lat = np.concatenate([
        np.full(n_samples + 1, lat_min), np.full(n_samples + 1, lat_max),
        lat_e, lat_e,
    ])
    x, y = forward_xy(crs, lon, lat)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())


def reproject_ring(ring: np.ndarray, crs: str) -> np.ndarray:
    """Reproject a (M, 2) lon/lat ring into the grid CRS (M1 kernel)."""
    ring = np.asarray(ring, dtype=np.float64)
    if crs.upper() in ("EPSG:4326", "CRS:84"):
        return ring
    if crs.upper() in ("EPSG:3857", "MERCATOR"):
        x, y = lonlat_to_mercator(ring[:, 0], ring[:, 1])
    elif crs.upper() in ("EPSG:3413", "POLAR_N"):
        x, y = lonlat_to_polar_stereo(ring[:, 0], ring[:, 1])
    elif crs.upper() == "POLAR_S":
        x, y = lonlat_to_polar_stereo(ring[:, 0], ring[:, 1], north=False)
    else:
        raise ValueError(f"unsupported CRS {crs}")
    return np.column_stack([x, y])


def inverse_xy(crs: str, x: np.ndarray, y: np.ndarray):
    """Inverse-project ``crs`` coordinates back to lon/lat arrays — the
    partner of :func:`forward_xy` (M1 dispatch; the reference's
    accessor reprojects query geometry INTO the dataset CRS, this is the
    raster-warp direction back out)."""
    c = crs.upper()
    if c in ("EPSG:4326", "CRS:84"):
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if c in ("EPSG:3857", "MERCATOR"):
        return mercator_to_lonlat(x, y)
    if c in ("EPSG:3413", "POLAR_N"):
        return polar_stereo_to_lonlat(x, y)
    if c == "POLAR_S":
        return polar_stereo_to_lonlat(x, y, north=False)
    raise ValueError(f"unsupported CRS {crs}")
