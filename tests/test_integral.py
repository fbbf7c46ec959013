"""Distributed summed-area table vs a serial full-plane paint: box sums
and valid counts over random mosaics with absent tiles, random validity
masks, and boxes that overhang every grid edge."""

import zlib

import numpy as np
import pyarrow as pa
import pytest

from raygeo.channels import RGB_CHANNELS, ChannelPack
from raygeo.grid import GridSpec
from raygeo.ops.integral import integral_box_stats

G = GridSpec(name="s", crs="EPSG:4326", x0=0.0, y1=1.0, res=2.0**-7,
             width=96, height=96, chunk=16)


def _random_mosaic(seed, p_absent=0.3):
    rng = np.random.Generator(np.random.PCG64(seed))
    pack = ChannelPack(RGB_CHANNELS)
    rows = []
    plane = np.zeros((G.height, G.width, 3), np.uint8)
    valid = np.zeros((G.height, G.width), bool)
    for ty in range(G.n_ty):
        for tx in range(G.n_tx):
            if rng.random() < p_absent:
                continue
            canvas = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            mask = rng.random((16, 16)) < 0.8
            canvas[~mask] = 0
            tc0, tc1, tr0, tr1 = G.tile_pixel_window(tx, ty)
            plane[tr0:tr1, tc0:tc1] = canvas
            valid[tr0:tr1, tc0:tc1] = mask
            rows.append({
                "tile_id": f"{tx}-{ty}", "tx": tx, "ty": ty,
                "px_z": zlib.compress(pack.to_bytes([canvas]), 1),
                "mask_z": zlib.compress(mask.astype(np.uint8).tobytes(), 1),
            })
    v = np.where(valid, plane.astype(np.int64).sum(axis=2), 0)
    return rows, v, valid


@pytest.mark.parametrize("seed", [2, 9])
def test_box_sums_match_full_plane(ray_session, seed):
    import ray.data as rd

    rows, v, valid = _random_mosaic(seed)
    rng = np.random.Generator(np.random.PCG64(seed + 100))
    n = 40
    r0 = rng.integers(-10, G.height, n)
    r1 = r0 + rng.integers(0, 60, n)
    c0 = rng.integers(-10, G.width, n)
    c1 = c0 + rng.integers(0, 60, n)
    boxes = pa.table({
        "probe_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "r0": pa.array(r0.astype(np.int64), pa.int64()),
        "r1": pa.array(r1.astype(np.int64), pa.int64()),
        "c0": pa.array(c0.astype(np.int64), pa.int64()),
        "c1": pa.array(c1.astype(np.int64), pa.int64()),
    })
    got = (integral_box_stats(rd.from_items(rows).repartition(5), G, boxes)
           .to_pandas().set_index("probe_id"))
    for i in range(n):
        rr0, rr1 = max(int(r0[i]), 0), min(int(r1[i]), G.height - 1)
        cc0, cc1 = max(int(c0[i]), 0), min(int(c1[i]), G.width - 1)
        if rr1 < rr0 or cc1 < cc0:
            assert i not in got.index
            continue
        want_v = int(v[rr0:rr1 + 1, cc0:cc1 + 1].sum())
        want_c = int(valid[rr0:rr1 + 1, cc0:cc1 + 1].sum())
        assert int(got.loc[i, "v_sum"]) == want_v, i
        assert int(got.loc[i, "n_valid"]) == want_c, i


def test_box_sums_full_grid_box(ray_session):
    """One box covering the whole grid == global totals."""
    import ray.data as rd

    rows, v, valid = _random_mosaic(5, p_absent=0.5)
    boxes = pa.table({
        "probe_id": pa.array([0], pa.int64()),
        "r0": pa.array([0], pa.int64()),
        "r1": pa.array([G.height - 1], pa.int64()),
        "c0": pa.array([0], pa.int64()),
        "c1": pa.array([G.width - 1], pa.int64()),
    })
    got = (integral_box_stats(rd.from_items(rows).repartition(3), G, boxes)
           .to_pandas())
    assert int(got["v_sum"].iloc[0]) == int(v.sum())
    assert int(got["n_valid"].iloc[0]) == int(valid.sum())
