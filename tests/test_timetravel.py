"""Snapshot-pinned (time-travel) loads — VERDICT r4 #4.

The reference commits every update to an icechunk store and lets readers
pin a snapshot (``core/accessor.py:284-293``, ``backends/threaded.py:
136-138``). Here ``engine.snapshot`` commits a per-tile version manifest
(a metadata transaction — no tile bytes copy), ``load(..., epoch=id)``
resolves each tile to exactly the recorded version via the CAS epoch
files updates already retain, and ``gc_update_versions(retain_snapshots_from=...)``
bounds the retained window.
"""

import numpy as np
import pyarrow as pa
import pytest


def _images(fix_dir, lo, hi):
    import ray.data as rd

    def part(t, lo=lo, hi=hi):
        # nested so cloudpickle ships it by value (the tests package is
        # not importable from Ray workers)
        keep = [lo <= int(i.rsplit("-", 1)[1]) < hi
                for i in t.column("image_id").to_pylist()]
        return t.filter(pa.array(keep))

    return (rd.read_parquet(f"{fix_dir}/images.parquet",
                            columns=["image_id", "bytes", "w", "h"])
            .limit(300)
            .map_batches(part, batch_format="pyarrow"))


ROI = {"roi_id": "tt", "lon_min": -0.6, "lat_min": -0.6,
       "lon_max": 0.6, "lat_max": 0.6}


def _win_bytes(win):
    return (b"".join(np.ascontiguousarray(a).tobytes() for a in win.data)
            + win.mask.tobytes())


@pytest.fixture()
def epoch_cube(ray_session, fixtures_sf0001, tmp_path):
    """Cube with three committed snapshots: after ingest (0) and after
    each of two updates (1, 2). Yields (cube_path, [window bytes per
    snapshot])."""
    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.engine import load, snapshot
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import ingest, ingest_update

    cube = str(tmp_path / "cube_tt")
    create(CubeSpec("tt", FIXTURE_GRID, RGB_CHANNELS), cube)
    ingest(_images(fixtures_sf0001, 0, 180), FIXTURE_GRID,
           cube_path=cube).materialize()
    assert snapshot(cube) == 0
    snaps = [_win_bytes(load(cube, ROI))]
    for i, (lo, hi) in enumerate(((180, 240), (240, 300))):
        ingest_update(_images(fixtures_sf0001, lo, hi), FIXTURE_GRID,
                      cube).materialize()
        assert snapshot(cube) == i + 1
        snaps.append(_win_bytes(load(cube, ROI)))
    assert len({snaps[0], snaps[1], snaps[2]}) == 3  # states differ
    return cube, snaps


def test_load_at_snapshot_resolves_each_state(epoch_cube):
    from raygeo.engine import load

    cube, snaps = epoch_cube
    for e in (0, 1, 2):
        assert _win_bytes(load(cube, ROI, epoch=e)) == snaps[e]
    with pytest.raises(ValueError, match="no snapshot 99"):
        load(cube, ROI, epoch=99)


def test_load_at_snapshot_lazy_dataset(epoch_cube):
    """persist=False snapshot read streams the pinned tile crops."""
    from raygeo.engine import load

    cube, _snaps = epoch_cube

    def crops(e=None):
        rows = load(cube, ROI, persist=False, epoch=e).take_all()
        return {r["tile_id"]: (bytes(r["px"]), bytes(r["mask"]))
                for r in rows}

    c0, c2 = crops(0), crops(2)
    assert set(c0) <= set(c2)  # updates may add tiles, never drop
    assert c0 != {t: c2[t] for t in c0}  # content moved between epochs
    assert crops() == c2  # current lazy read == latest snapshot


def test_gc_retain_floor_bounds_time_travel(epoch_cube):
    from raygeo.engine import load
    from raygeo.ops.ingest import gc_update_versions

    cube, snaps = epoch_cube
    n = gc_update_versions(cube, retain_snapshots_from=1)
    assert n > 0  # versions only snapshot 0 references reclaimed
    with pytest.raises(ValueError, match="no retained version"):
        load(cube, ROI, epoch=0)
    assert _win_bytes(load(cube, ROI, epoch=1)) == snaps[1]  # floor kept
    assert _win_bytes(load(cube, ROI, epoch=2)) == snaps[2]
    gc_update_versions(cube)  # default: reclaim everything
    with pytest.raises(ValueError, match="no retained version"):
        load(cube, ROI, epoch=1)
    assert _win_bytes(load(cube, ROI)) == snaps[2]  # current unaffected
    # the latest snapshot stays readable: every tile resolves to its
    # canonical file, no CAS version needed
    assert _win_bytes(load(cube, ROI, epoch=2)) == snaps[2]


def test_snapshot_read_is_read_only(epoch_cube, fixtures_sf0001):
    from raygeo.engine import load

    cube, _ = epoch_cube
    with pytest.raises(ValueError, match="read-only"):
        load(cube, ROI, images_ds=_images(fixtures_sf0001, 0, 10),
             epoch=0)
    with pytest.raises(ValueError, match="epoch must be >= 0"):
        load(cube, ROI, epoch=-1)


def test_list_snapshots(epoch_cube, tmp_path):
    from raygeo.engine import list_snapshots

    cube, _ = epoch_cube
    assert list_snapshots(cube) == [0, 1, 2]
    assert list_snapshots(str(tmp_path / "nope")) == []


def test_snapshot_reads_compose_with_temporal_cubes(ray_session,
                                                   fixtures_sf0001,
                                                   tmp_path):
    """Time travel x TOI: a temporal cube's snapshot reads pin every
    't-tx-ty' tile version, composing with the TOI time-step selection."""
    import numpy as np

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.engine import load, snapshot
    from raygeo.fixtures import TEMPORAL_GRID
    from raygeo.ops.ingest import ingest, ingest_update

    cube = str(tmp_path / "cube_tt_t")
    create(CubeSpec("ttt", TEMPORAL_GRID, RGB_CHANNELS), cube)
    ingest(_images(fixtures_sf0001, 0, 180), TEMPORAL_GRID,
           cube_path=cube).materialize()
    assert snapshot(cube) == 0
    roi = dict(ROI, roi_id="ttt")
    toi = np.datetime64("2024-01-02")
    pre = {k: w.stats() for k, w in load(cube, roi, toi=toi).items()}
    ingest_update(_images(fixtures_sf0001, 180, 300), TEMPORAL_GRID,
                  cube).materialize()
    assert snapshot(cube) == 1
    post = {k: w.stats() for k, w in load(cube, roi, toi=toi).items()}
    assert pre != post  # the update touched this step's window
    at0 = {k: w.stats() for k, w in load(cube, roi, toi=toi,
                                         epoch=0).items()}
    at1 = {k: w.stats() for k, w in load(cube, roi, toi=toi,
                                         epoch=1).items()}
    assert at0 == pre
    assert at1 == post
