"""Multi-process cube sharing (reference concurrency tests analog).

Mirrors ``tests/test_arcticdem.py:104-137`` / ``tests/test_tctrend.py:167-200``:
two independent OS processes run ``engine.load`` with overlapping ROIs against ONE
cube directory concurrently. Safety comes from atomic-rename lineage commits
(idempotent — both writers may compute a shared tile; the content is
deterministic so either commit is correct) — the engine's stand-in for
icechunk's optimistic concurrency. A third process then loads a window
spanning both ROIs purely from the cache and must match the brute-force
oracle.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
from raygeo.engine import load
from raygeo.fixtures import ensure_fixtures
d = ensure_fixtures(0.001)
images = rd.read_parquet(f"{d}/images.parquet",
                         columns=["image_id", "bytes", "w", "h"])
win = load(%(cube)r, %(roi)s, images_ds=images)
print(json.dumps(win.stats()))
ray.shutdown()
"""


def _spawn(cube: str, roi: dict):
    return subprocess.Popen(
        [sys.executable, "-c", CHILD % {"repo": REPO, "cube": cube,
                                        "roi": json.dumps(roi)}],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )


def test_two_processes_share_one_cube(fixtures_sf0001, tmp_path):
    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo import lineage

    cube = str(tmp_path / "shared_cube")
    create(CubeSpec("shared", FIXTURE_GRID, RGB_CHANNELS), cube)
    roi_a = {"roi_id": "a", "lon_min": -0.4, "lat_min": -0.3,
             "lon_max": 0.1, "lat_max": 0.2}
    roi_b = {"roi_id": "b", "lon_min": -0.1, "lat_min": -0.1,
             "lon_max": 0.4, "lat_max": 0.3}  # overlaps roi_a
    pa_, pb = _spawn(cube, roi_a), _spawn(cube, roi_b)
    out_a, err_a = pa_.communicate(timeout=300)
    out_b, err_b = pb.communicate(timeout=300)
    assert pa_.returncode == 0, err_a[-2000:]
    assert pb.returncode == 0, err_b[-2000:]
    stats_a = json.loads(out_a.strip().splitlines()[-1])
    stats_b = json.loads(out_b.strip().splitlines()[-1])
    assert stats_a["n_valid_px"] > 0 and stats_b["n_valid_px"] > 0

    # all tiles of both ROIs committed exactly once in the ledger
    done = lineage.loaded_partitions(cube)
    assert len(done) == len(set(done))

    # a third (in-process) cache-only load over the union region agrees with
    # a fresh single-writer cube — concurrent writes converged
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    from raygeo.engine import load

    # a rectangle fully inside roi_a ∪ roi_b (every lon<=0.1 point is in a,
    # every lon>0.1 point has lat in [-0.1, 0.2] ⊂ b) so all its tiles are
    # guaranteed cached by one of the two concurrent writers
    union_roi = {"roi_id": "u", "lon_min": -0.35, "lat_min": -0.1,
                 "lon_max": 0.35, "lat_max": 0.2}
    got = load(cube, union_roi, images_ds=None).stats()

    clean = str(tmp_path / "clean_cube")
    create(CubeSpec("clean", FIXTURE_GRID, RGB_CHANNELS), clean)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    exp = load(clean, union_roi, images_ds=images).stats()
    assert got == exp


def test_export_sharded_resume(ray_session, tmp_path):
    """Sharded export: atomic per-shard commits; a re-run recomputes ONLY
    shards whose markers are missing; total content is complete and
    deterministic."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.ops.export import completed_shards, export_sharded

    docs = pd.DataFrame({
        "doc_id": range(1000),
        "text": [f"doc number {i}" for i in range(1000)],
    })
    out = str(tmp_path / "corpus_out")
    r1 = export_sharded(rd.from_pandas(docs), out, "doc_id", num_shards=8)
    r1 = r1.to_pandas().sort_values("shard").reset_index(drop=True)
    assert r1.shard.tolist() == list(range(8))
    assert r1.n_rows.sum() == 1000
    assert completed_shards(out) == set(range(8))
    # re-run: everything committed -> zero shards rewritten
    r2 = export_sharded(rd.from_pandas(docs), out, "doc_id", num_shards=8)
    assert len(r2.to_pandas()) == 0
    # crash simulation: drop two markers; only those shards recompute
    import os
    for s in (2, 5):
        os.remove(os.path.join(out, f"shard-{s:05d}.done"))
    r3 = export_sharded(rd.from_pandas(docs), out, "doc_id", num_shards=8)
    assert sorted(r3.to_pandas().shard.tolist()) == [2, 5]
    # full content round-trip (data files only; .done markers sit alongside)
    import glob

    back = pq.read_table(sorted(glob.glob(os.path.join(out, "*.parquet")))).to_pandas()
    assert len(back) == 1000
    assert set(back.doc_id) == set(range(1000))


UPDATE_CHILD = r"""
import sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import pyarrow as pa
import ray.data as rd
from raygeo.fixtures import FIXTURE_GRID, ensure_fixtures
from raygeo.ops.ingest import ingest, ingest_update
d = ensure_fixtures(0.001)
images = rd.read_parquet(f"{d}/images.parquet",
                         columns=["image_id", "bytes", "w", "h"]).limit(300)

def part(t, lo, hi):
    keep = [lo <= int(i.rsplit("-", 1)[1]) < hi
            for i in t.column("image_id").to_pylist()]
    return t.filter(pa.array(keep))

if %(phase)d == 0:
    ingest(images.map_batches(lambda t: part(t, 0, 180),
                              batch_format="pyarrow"),
           FIXTURE_GRID, cube_path=%(cube)r).materialize()
else:
    ingest_update(images.map_batches(lambda t: part(t, 180, 300),
                                     batch_format="pyarrow"),
                  FIXTURE_GRID, %(cube)r).materialize()
ray.shutdown()
"""


def test_update_from_fresh_process_equals_batch(fixtures_sf0001, tmp_path):
    """The reference's steady-state loop across PROCESS lifetimes: one
    process batch-ingests, a later fresh process folds in new patches via
    ingest_update — final tile bytes must equal the one-shot union."""
    import subprocess
    import zlib as _z

    import ray.data as rd

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import Channel, CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import ingest
    from tests.test_ingest import _tile_bytes

    spec = CubeSpec("u", FIXTURE_GRID, (Channel("rgb", "uint8", 0),))
    cube_inc = str(tmp_path / "cube_inc")
    create(spec, cube_inc)
    for phase in (0, 1):  # sequential: the documented one-updater contract
        p = subprocess.run(
            [sys.executable, "-c",
             UPDATE_CHILD % {"repo": REPO, "cube": cube_inc,
                             "phase": phase}],
            cwd=REPO, capture_output=True, text=True,
            env=dict(os.environ, RAY_ADDRESS="local"), timeout=300)
        assert p.returncode == 0, p.stderr[-2000:]

    cube_batch = str(tmp_path / "cube_batch")
    create(spec, cube_batch)
    ds = rd.read_parquet(f"{fixtures_sf0001}/images.parquet").limit(300)
    ingest(ds, FIXTURE_GRID, cube_path=cube_batch).materialize()

    ti, tb = _tile_bytes(cube_inc), _tile_bytes(cube_batch)
    assert set(ti) == set(tb)
    for tid in tb:
        assert ti[tid][2] == tb[tid][2]
        assert _z.decompress(ti[tid][0]) == _z.decompress(tb[tid][0])

    # fsck: a healthy cube is all-ok; removing one record flags recompute
    from raygeo.lineage import fsck

    rep = fsck(cube_inc)
    assert (rep["status"] == "ok").all()
    victim = rep["tile_id"].iloc[0]
    os.remove(os.path.join(cube_inc, "lineage", f"part-{victim}.json"))
    rep2 = fsck(cube_inc).set_index("tile_id")
    assert rep2.loc[victim, "status"] == "recompute"
    assert (rep2.drop(victim)["status"] == "ok").all()


UPDATE_RACE_CHILD = r"""
import sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import pyarrow as pa
import ray.data as rd
from raygeo.fixtures import FIXTURE_GRID, ensure_fixtures
from raygeo.ops.ingest import ingest_update
d = ensure_fixtures(0.001)
images = rd.read_parquet(f"{d}/images.parquet",
                         columns=["image_id", "bytes", "w", "h"]).limit(300)
lo, hi = %(lo)d, %(hi)d

def part(t):
    keep = [lo <= int(i.rsplit("-", 1)[1]) < hi
            for i in t.column("image_id").to_pylist()]
    return t.filter(pa.array(keep))

ingest_update(images.map_batches(part, batch_format="pyarrow"),
              FIXTURE_GRID, %(cube)r, mode="max").materialize()
print("UPDATED")
ray.shutdown()
"""


def test_concurrent_updaters_converge_to_batch(fixtures_sf0001, tmp_path):
    """VERDICT r3 #2: TWO concurrent updater processes on ONE cube. Each
    tile commit is an epoch CAS (hard-link claim + bounded retry), so the
    interleaving is safe; with the commutative ``mode="max"`` fold the
    final bytes must equal a one-shot batch ingest of the union regardless
    of which job wins each tile's epoch race (the reference's icechunk
    conflict-retry story, ``backends/threaded.py:85-99``)."""
    import zlib as _z

    import ray.data as rd

    from raygeo import lineage
    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import gc_update_versions, ingest
    from tests.test_ingest import _tile_bytes

    spec = CubeSpec("race", FIXTURE_GRID, RGB_CHANNELS)
    cube = str(tmp_path / "cube_race")
    create(spec, cube)
    # base state: batch ingest of patches [0, 100)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"]
                             ).limit(300)
    import pyarrow as pa_

    def head(t):
        keep = [int(i.rsplit("-", 1)[1]) < 100
                for i in t.column("image_id").to_pylist()]
        return t.filter(pa_.array(keep))

    ingest(images.map_batches(head, batch_format="pyarrow"),
           FIXTURE_GRID, cube_path=cube, mode="max").materialize()

    # two updater JOBS race: patches [100,200) and [200,300) — their
    # footprints overlap many tiles, so CAS conflicts are exercised
    def spawn(lo, hi):
        return subprocess.Popen(
            [sys.executable, "-c",
             UPDATE_RACE_CHILD % {"repo": REPO, "cube": cube,
                                  "lo": lo, "hi": hi}],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=dict(os.environ, RAY_ADDRESS="local"))

    p1, p2 = spawn(100, 200), spawn(200, 300)
    out1, err1 = p1.communicate(timeout=300)
    out2, err2 = p2.communicate(timeout=300)
    assert p1.returncode == 0, err1[-2000:]
    assert p2.returncode == 0, err2[-2000:]

    # golden: one-shot batch ingest of all 300 patches
    cube_batch = str(tmp_path / "cube_batch")
    create(spec, cube_batch)
    ingest(images, FIXTURE_GRID, cube_path=cube_batch,
           mode="max").materialize()

    ti, tb = _tile_bytes(cube), _tile_bytes(cube_batch)
    assert set(ti) == set(tb)
    for tid in tb:
        assert _z.decompress(ti[tid][0]) == _z.decompress(tb[tid][0]), tid
        assert _z.decompress(ti[tid][1]) == _z.decompress(tb[tid][1]), tid
        assert ti[tid][2] == tb[tid][2], tid  # n_frags: no double-count

    # every applied update left its claimed-epoch CAS file; offline gc
    # reclaims them and the cube stays healthy
    tdir = os.path.join(cube, "tiles")
    cas = [n for n in os.listdir(tdir) if n.startswith(".cas-")]
    assert cas, "updaters committed without CAS epoch claims"
    assert gc_update_versions(cube) == len(cas)
    assert not [n for n in os.listdir(tdir) if n.startswith(".cas-")]
    rep = lineage.fsck(cube)
    assert (rep["status"] == "ok").all()


def test_cas_heal_completes_crashed_winner(ray_session, fixtures_sf0001,
                                           tmp_path):
    """A winner that claimed an epoch but died before installing the
    canonical file: the next writer's ``_heal_canonical`` must finish the
    install (and a subsequent update must build on the healed state)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID
    from raygeo.ops.ingest import _heal_canonical, _tile_epoch_state, ingest_update

    cube = str(tmp_path / "cube_heal")
    create(CubeSpec("heal", FIXTURE_GRID, RGB_CHANNELS), cube)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"]
                             ).limit(60)
    ingest_update(images, FIXTURE_GRID, cube).materialize()
    tdir = os.path.join(cube, "tiles")
    tiles = [n for n in os.listdir(tdir)
             if n.startswith("part-") and n.endswith(".parquet")]
    tid = tiles[0][len("part-"):-len(".parquet")]
    canonical = os.path.join(tdir, f"part-{tid}.parquet")
    st, epoch, _ = _tile_epoch_state(canonical)
    assert epoch == 1  # one applied update

    # forge a crashed winner: epoch-2 claim exists, canonical still at 1
    forged = st.replace_schema_metadata(
        {b"raygeo_epoch": b"2", b"raygeo_update_tokens": b"deadbeef"})
    crash = os.path.join(tdir, f".cas-{tid}.v2.parquet")
    pq.write_table(forged, crash)
    _heal_canonical(tdir, tid)
    _, epoch2, toks = _tile_epoch_state(canonical)
    assert epoch2 == 2 and toks == [b"deadbeef"]
    # healing is idempotent
    _heal_canonical(tdir, tid)
    assert _tile_epoch_state(canonical)[1] == 2
    # the next real update builds on the healed epoch (claims v3)
    ingest_update(images, FIXTURE_GRID, cube).materialize()
    assert _tile_epoch_state(canonical)[1] == 3
    assert os.path.exists(os.path.join(tdir, f".cas-{tid}.v3.parquet"))


INGEST_CHILD = r"""
import sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
from raygeo.fixtures import ensure_fixtures, FIXTURE_GRID
from raygeo.ops.ingest import ingest
d = ensure_fixtures(0.001)
images = rd.read_parquet(f"{d}/images.parquet",
                         columns=["image_id", "bytes", "w", "h"])
n = ingest(images, FIXTURE_GRID, cube_path=%(cube)r).count()
print("INGESTED", n)
ray.shutdown()
"""


def test_ingest_survives_sigkill_midrun(fixtures_sf0001, tmp_path):
    """Checkpoint-resume under a HARD crash (the north rule's
    'resumable from checkpoint' clause, adversarially): SIGKILL the whole
    ingest process group mid-run — after >=1 atomic lineage commit,
    before completion — then re-run in a fresh process. The rerun must
    skip committed partitions (anti-join vs the ledger), finish the rest,
    and the cube must be indistinguishable from a never-crashed one."""
    import signal
    import time

    from raygeo import lineage
    from raygeo.channels import RGB_CHANNELS
    from raygeo.cube import CubeSpec, create
    from raygeo.fixtures import FIXTURE_GRID

    cube = str(tmp_path / "crash_cube")
    create(CubeSpec("crash", FIXTURE_GRID, RGB_CHANNELS), cube)
    src = INGEST_CHILD % {"repo": REPO, "cube": cube}
    child = subprocess.Popen(
        [sys.executable, "-c", src], cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, start_new_session=True,
        env=dict(os.environ, RAY_ADDRESS="local"))
    # wait for the first atomic commits, then kill the whole session group
    # (driver + its private ray cluster) without any chance to clean up
    deadline = time.time() + 240
    committed_before = 0
    total = FIXTURE_GRID.n_tx * FIXTURE_GRID.n_ty
    while time.time() < deadline:
        if child.poll() is not None:
            break  # finished before we could kill: handled below
        committed_before = len(lineage.loaded_partitions(cube))
        if committed_before >= 1:
            try:
                os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass  # finished in the race window; handled below
            break
        time.sleep(0.02)
    child.wait(timeout=60)
    committed_before = len(lineage.loaded_partitions(cube))
    assert committed_before >= 1, "never observed a commit to kill around"

    # fresh process resumes; the ledger anti-join must skip finished work
    child2 = subprocess.Popen(
        [sys.executable, "-c", src], cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
        env=dict(os.environ, RAY_ADDRESS="local"))
    out2, err2 = child2.communicate(timeout=300)
    assert child2.returncode == 0, err2[-2000:]
    n2 = int(out2.strip().splitlines()[-1].split()[-1])
    done = lineage.loaded_partitions(cube)
    assert len(done) == total  # complete after resume
    if committed_before < total:
        assert n2 == total - committed_before  # resumed, not redone
    # a cache-only window over the whole extent equals a clean cube's
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    from raygeo.engine import load

    roi = {"roi_id": "all", "lon_min": -0.49, "lat_min": -0.49,
           "lon_max": 0.49, "lat_max": 0.49}
    got = load(cube, roi, images_ds=None).stats()
    clean = str(tmp_path / "clean_cube")
    create(CubeSpec("clean", FIXTURE_GRID, RGB_CHANNELS), clean)
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "w", "h"])
    exp = load(clean, roi, images_ds=images).stats()
    assert got == exp


def test_webdataset_roundtrip_and_resume(ray_session, fixtures_sf0001,
                                         tmp_path):
    """Tar shards re-read with tarfile: caption byte-equality and pixel
    decode for every sample; a second run writes nothing (resume)."""
    import hashlib
    import tarfile

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from raygeo.codec import decode
    from raygeo.ops.export import export_webdataset

    out = str(tmp_path / "wds")
    images = rd.read_parquet(f"{fixtures_sf0001}/images.parquet",
                             columns=["image_id", "bytes", "caption"])
    rep = export_webdataset(images, out, n_shards=4).to_pandas()
    assert rep["n_samples"].sum() == images.count()

    src = pq.read_table(f"{fixtures_sf0001}/images.parquet",
                        columns=["image_id", "bytes", "caption"])
    by_id = {i: (b, c) for i, b, c in zip(
        src.column("image_id").to_pylist(),
        src.column("bytes").to_pylist(),
        src.column("caption").to_pylist())}
    seen = 0
    for shard in range(4):
        with tarfile.open(f"{out}/shard-{shard:05d}.tar") as tar:
            members = tar.getmembers()
            img = {m.name[:-4]: tar.extractfile(m).read()
                   for m in members if m.name.endswith(".img")}
            txt = {m.name[:-4]: tar.extractfile(m).read()
                   for m in members if m.name.endswith(".txt")}
        assert set(img) == set(txt)
        for iid, payload in img.items():
            b, c = by_id[iid]
            exp_shard = int.from_bytes(
                hashlib.md5(iid.encode()).digest()[:4], "big") % 4
            assert exp_shard == shard
            assert txt[iid].decode() == c              # caption equality
            np.testing.assert_array_equal(decode(payload), decode(b))
            seen += 1
    assert seen == len(by_id)
    # resume: everything committed -> second run writes nothing
    rep2 = export_webdataset(images, out, n_shards=4).to_pandas()
    assert len(rep2) == 0
