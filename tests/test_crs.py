"""CRS-aware query path (M1 wiring): lon/lat ROIs against projected-CRS
cube grids — the ArcticDEM EPSG:3413 pattern (``arcticdem.py:216-231``),
antimeridian-safe without splitting."""

import numpy as np
import pyarrow as pa
import pytest

from raygeo.fixtures import POLAR_GRID, footprint_of, generate_images
from raygeo.geom import (
    forward_xy,
    lonlat_to_polar_stereo,
    project_box_bbox,
)
from raygeo.ops.spatial_join import normalize_rois, roi_tiles


def test_project_box_bbox_contains_dense_sampling():
    """The 8-sample edge bbox must contain (and tightly track) a 1000-sample
    reference bbox — curvature error stays inside one grid pixel at the
    fixture resolution."""
    for box in [(10.0, 60.0, 40.0, 75.0), (-130.0, 80.0, -60.0, 88.0),
                (-20.0, -5.0, 10.0, 20.0)]:
        xm, ym, xb, yb = project_box_bbox("EPSG:3413", *box)
        lon = np.linspace(box[0], box[2], 1001)
        lat = np.linspace(box[1], box[3], 1001)
        lons = np.concatenate([lon, lon, np.full(1001, box[0]), np.full(1001, box[2])])
        lats = np.concatenate([np.full(1001, box[1]), np.full(1001, box[3]), lat, lat])
        x, y = lonlat_to_polar_stereo(lons, lats)
        assert xm <= x.min() and xb >= x.max() - POLAR_GRID.res
        assert ym <= y.min() and yb >= y.max() - POLAR_GRID.res
        # sampled bbox never exceeds the dense one by more than curvature tol
        assert x.min() - xm < POLAR_GRID.res and xb - x.max() < POLAR_GRID.res


def test_project_box_bbox_antimeridian_contiguous():
    """A wrapping box projects as one contiguous region (no split): its bbox
    equals the unwrapped [170, 195] range's bbox."""
    a = project_box_bbox("EPSG:3413", 170.0, 55.0, -165.0, 70.0)
    b = project_box_bbox("EPSG:3413", 170.0, 55.0, 195.0, 70.0)
    assert a == b


def test_normalize_rois_projects_boxes():
    t = pa.table(
        {
            "roi_id": ["r0"],
            "lon_min": [10.0], "lat_min": [60.0],
            "lon_max": [40.0], "lat_max": [75.0],
        }
    )
    lonlat = normalize_rois(t)[0]["boxes"][0]
    proj = normalize_rois(t, POLAR_GRID)[0]["boxes"][0]
    assert lonlat == (10.0, 60.0, 40.0, 75.0)
    assert proj == project_box_bbox("EPSG:3413", 10.0, 60.0, 40.0, 75.0)
    # projected ROI covers tiles on the polar grid
    cov = roi_tiles(normalize_rois(t, POLAR_GRID), POLAR_GRID)
    assert cov.num_rows > 0


def test_forward_xy_identity_on_4326():
    lon = np.array([1.0, -170.0])
    lat = np.array([45.0, -30.0])
    x, y = forward_xy("EPSG:4326", lon, lat)
    assert np.array_equal(x, lon) and np.array_equal(y, lat)


@pytest.mark.usefixtures("ray_session")
def test_polar_cube_load_end_to_end(tmp_path):
    """load(lon/lat ROI) against a projected-CRS cube: ROI reprojects into
    the cube frame, missing tiles ingest (footprints live in grid meters),
    and the window mask matches a numpy oracle using the same kernels."""
    import ray.data as rd

    from raygeo.channels import RGB_CHANNELS
    from raygeo.codec import decode
    from raygeo.cube import CubeSpec, create
    from raygeo.engine import load

    g = POLAR_GRID
    images_path = str(tmp_path / "polar_images.parquet")
    generate_images(200, images_path, grid=g)
    cube = str(tmp_path / "polar_cube")
    create(CubeSpec(title="polar", grid=g, channels=RGB_CHANNELS), cube)
    images = rd.read_parquet(images_path,
                             columns=["image_id", "bytes", "w", "h"])
    # ROI in lon/lat covering a band of the northern hemisphere
    roi = {"roi_id": "p", "lon_min": -60.0, "lat_min": 55.0,
           "lon_max": 30.0, "lat_max": 75.0}
    win = load(cube, roi, images_ds=images)

    # oracle: project the ROI with the same kernel, assemble the mosaic mask
    import pyarrow.parquet as pq

    xm, ym, xb, yb = project_box_bbox(g.crs, roi["lon_min"], roi["lat_min"],
                                      roi["lon_max"], roi["lat_max"])
    cl, ch, rl, rh = (int(v[0]) for v in g.pixel_window(
        np.array([xm]), np.array([ym]), np.array([xb]), np.array([yb])))
    mask = np.zeros((rh - rl, ch - cl), bool)
    rgb = np.zeros((rh - rl, ch - cl, 3), np.uint8)
    rows = sorted(pq.read_table(images_path).to_pylist(),
                  key=lambda r: int(r["image_id"].rsplit("-", 1)[1]))
    for r in rows:
        box = footprint_of(r["image_id"], r["w"], r["h"], g)
        icl, ich, irl, irh = (int(v[0]) for v in g.pixel_window(
            np.array([box[0]]), np.array([box[1]]),
            np.array([box[2]]), np.array([box[3]])))
        c0, c1 = max(icl, cl), min(ich, ch)
        r0, r1 = max(irl, rl), min(irh, rh)
        if c1 <= c0 or r1 <= r0:
            continue
        pix = decode(r["bytes"])
        src = np.s_[r0 - irl : r1 - irl, c0 - icl : c1 - icl]
        dst = np.s_[r0 - rl : r1 - rl, c0 - cl : c1 - cl]
        rgb[dst] = pix[src]
        mask[dst] = True
    assert win.mask.shape == mask.shape
    assert np.array_equal(win.mask, mask)
    assert np.array_equal(win.rgb[mask], rgb[mask])
    assert win.stats()["n_valid_px"] > 0
