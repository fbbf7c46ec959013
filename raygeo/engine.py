"""The query path: ``load(roi, toi)`` — plan over the tile table.

Re-expresses ``accessor.load`` (``core/accessor.py:331-398``) as a Dataset
plan:

  1. assert cube created (manifest read);
  2. ROI -> covered tiles via the analytic grid kernel (no shuffle);
  3. anti-join covered tiles vs the lineage ledger -> missing tiles;
  4. ingest ONLY the missing tiles (procedural-download analog,
     ``accessor.py:400-443``): images are pre-filtered map-side to those
     tiles, then the normal ingest shuffle runs and commits per-tile
     lineage records — so ``load`` returns only after its tiles' records
     exist (the reference's synchronous-submit contract, §4.2);
  5. read the (cached + new) tile partitions, crop each to the ROI pixel
     window, and assemble the window on the driver (persist=True analog —
     the window is small by contract; the lazy variant returns the cropped
     Dataset instead).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa

from . import lineage
from .channels import RGB_CHANNELS, ChannelPack
from .cube import TILES_DIR, load_spec
from .grid import parse_tile_id
from .ops.ingest import ingest
from .ops.spatial_join import normalize_rois, roi_tiles
from .toi import toi_to_index


class RoiWindow:
    """Materialized query result: per-channel pixels + validity over the ROI
    window. Channel layout follows the cube's ``CubeSpec.channels`` (the
    reference's per-dataset variable set); ``.rgb`` stays a direct alias for
    the canonical single-RGB-channel cube."""

    def __init__(self, col_lo: int, col_hi: int, row_lo: int, row_hi: int,
                 pack: ChannelPack | None = None):
        self.pack = pack or ChannelPack(RGB_CHANNELS)
        self.col_lo, self.col_hi = col_lo, col_hi
        self.row_lo, self.row_hi = row_lo, row_hi
        h, w = row_hi - row_lo, col_hi - col_lo
        self.data = self.pack.alloc(h, w)
        self.mask = np.zeros((h, w), dtype=bool)

    @property
    def channels(self) -> dict[str, np.ndarray]:
        return {c.name: a for c, a in zip(self.pack.channels, self.data)}

    @property
    def rgb(self) -> np.ndarray:
        if not self.pack.is_rgb:
            raise AttributeError(
                "cube is not the canonical RGB layout; use .channels"
            )
        return self.data[0]

    @rgb.setter
    def rgb(self, value: np.ndarray) -> None:
        self.data[0][...] = value

    def stats(self) -> dict:
        """Golden-stat summary (tests/test_arcticdem.py:26-29 analog):
        validity count, the pack's deterministic content checksum, and
        min/max over valid values across all channels (ints for integer
        cubes, floats otherwise)."""
        n_valid = int(self.mask.sum())
        mins, maxs = [], []
        all_int = all(dt.kind in ("u", "i", "b") for dt in self.pack.dtypes)
        if n_valid:
            for a in self.data:
                v = a[self.mask]
                mins.append(v.min())
                maxs.append(v.max())
        cast = int if all_int else float
        return {
            "n_valid_px": n_valid,
            "pix_sum": self.pack.pix_sum(self.data, self.mask),
            "pix_min": cast(min(mins)) if n_valid else None,
            "pix_max": cast(max(maxs)) if n_valid else None,
        }


def load(
    cube_path: str,
    roi: dict | pa.Table,
    images_ds=None,
    toi=None,
    persist: bool = True,
    num_salts: int = 4,
    toi_method: str = "nearest",
    persist_byte_budget: int = 4 << 30,
    epoch: int | None = None,
):
    """Load an ROI window from the cube, ingesting missing tiles on demand.

    ``roi``: a single-row ROI table (roi_id/lon_min/../ring) or a dict with
    those keys. ``images_ds``: the source images Dataset used to ingest
    missing tiles (None = query the cache only). ``toi_method``: how scalar
    or list TOIs snap to the cube's time axis — ``nearest`` (default),
    ``pad`` (last step <= t) or ``bfill`` (first step >= t), the reference's
    indexer methods (``core/toi.py:26-42``).

    ``persist_byte_budget`` (VERDICT r3 "wrong" #4): ``persist=True``
    assembles the window as one driver-side array — bounded by the ROI
    contract, but nothing used to stop a caller passing a grid-scale ROI.
    Windows whose assembled size would exceed the budget now raise at PLAN
    time (before any ingest or read) with guidance to use the streaming
    ``persist=False`` path, which handles arbitrarily large ROIs.

    ``epoch`` (VERDICT r4 #4 — the reference's icechunk snapshot-pinned
    reads, ``core/accessor.py:284-293``): the id of a snapshot committed
    with :func:`snapshot`; every tile resolves to exactly the per-tile
    version the manifest recorded (updates retain superseded versions as
    CAS epoch files until :func:`ops.ingest.gc_update_versions` reclaims
    them — pass its ``retain_snapshots_from`` to keep a time-travel
    window).
    Snapshot reads are read-only: ``images_ds`` must be None, tiles the
    manifest lacks stay invalid, and a read of a reclaimed version
    raises.
    """
    spec = load_spec(cube_path)
    g = spec.grid
    if toi is not None and not g.temporal:
        raise ValueError("TOI given for a non-temporal cube (accessor.py:354-355)")

    if isinstance(roi, dict):
        roi_tbl = pa.table({k: [v] for k, v in roi.items()})
    else:
        roi_tbl = roi
    # CRS-normalize the lon/lat ROI into the cube frame (M1 wiring: on a
    # projected-CRS grid the ROI box densify-projects to a grid-unit bbox,
    # antimeridian-safe — arcticdem.py:216-231 semantics)
    rois = normalize_rois(roi_tbl, g)
    covered = roi_tiles(rois, g)
    covered_ids = set(covered.column("tile_id").to_pylist())
    if not covered_ids:
        raise ValueError("no adjacent tiles for ROI (accessor.py:430-432 analog)")
    t_sel = None
    if g.temporal:
        # sel(time=toi) analog (accessor.py:387-389): expand each covered
        # spatial tile across the selected time steps ("t-tx-ty" keys)
        t_sel = [int(t) for t in toi_to_index(g.time_axis(), toi,
                                              method=toi_method)]
        if not t_sel:
            raise ValueError(
                "TOI selects no time steps of the cube axis "
                f"({g.times[0]} .. {g.times[-1]})"
            )

    boxes = [b for r in rois for b in r["boxes"]]
    lon_min = min(b[0] for b in boxes)
    lat_min = min(b[1] for b in boxes)
    lon_max = max(b[2] for b in boxes)
    lat_max = max(b[3] for b in boxes)
    cl, ch, rl, rh = (
        int(v[0])
        for v in g.pixel_window(
            np.array([lon_min]), np.array([lat_min]),
            np.array([lon_max]), np.array([lat_max]),
        )
    )
    if len(boxes) > 1:
        # the assembled window is the UNION BBOX of all boxes: an
        # antimeridian-split ROI (strips at both grid edges) or disjoint
        # multi-ROI input would allocate a near-grid-wide driver array
        # with everything between invalid. Refuse the silent blowup and
        # tell the caller to load per strip/ROI instead.
        bcl, bch, brl, brh = g.pixel_window(
            np.array([b[0] for b in boxes]), np.array([b[1] for b in boxes]),
            np.array([b[2] for b in boxes]), np.array([b[3] for b in boxes]))
        covered_px = int(((bch - bcl) * (brh - brl)).sum())
        union_px = (ch - cl) * (rh - rl)
        if covered_px > 0 and union_px > 8 * covered_px:
            raise ValueError(
                "ROI spans disjoint boxes whose union bbox is "
                f"{union_px / covered_px:.0f}x their covered area — the "
                "assembled window would be mostly invalid driver memory. "
                "Load each box/ROI separately (e.g. the two sides of an "
                "antimeridian split)."
            )
    if epoch is not None:
        if epoch < 0:
            raise ValueError("epoch must be >= 0")
        if images_ds is not None:
            raise ValueError(
                "epoch reads are read-only snapshots — on-demand ingest "
                "(images_ds) cannot apply to a past epoch")
    return _load_window(cube_path, spec, covered_ids, (cl, ch, rl, rh),
                        t_sel, images_ds, persist, num_salts,
                        persist_byte_budget, epoch=epoch)


def _load_window(cube_path, spec, spatial_ids: set[str], window, t_sel,
                 images_ds, persist: bool, num_salts: int,
                 persist_byte_budget: int = 4 << 30, epoch: int | None = None):
    """Shared tail of :func:`load` / :func:`load_like`: anti-join the
    covered tile ids vs the lineage ledger, ingest the missing subset,
    then read + crop + assemble (or return the lazy Dataset)."""
    g = spec.grid
    cl, ch, rl, rh = window
    pack = ChannelPack(spec.channels)
    if persist:
        # plan-time budget gate: fail BEFORE any ingest/read/allocation
        n_steps = len(t_sel) if t_sel is not None else 1
        need = (pack.nbytes_px + 1) * (ch - cl) * (rh - rl) * n_steps
        if need > persist_byte_budget:
            raise ValueError(
                f"persist=True would assemble a {need / (1 << 30):.1f} GiB "
                f"driver-side window ({ch - cl} x {rh - rl} px x {n_steps} "
                f"time step(s) x {pack.nbytes_px + 1} B/px) over the "
                f"{persist_byte_budget / (1 << 30):.1f} GiB budget. Use "
                "persist=False for a streaming Dataset of ROI-cropped tile "
                "windows (handles arbitrarily large ROIs), shrink the ROI/"
                "TOI, or raise persist_byte_budget explicitly."
            )
    covered_ids = (
        {f"{t}-{tid}" for t in t_sel for tid in spatial_ids}
        if t_sel is not None
        else set(spatial_ids)
    )

    done = lineage.loaded_partitions(cube_path)
    missing = covered_ids - done
    tiles_dir = os.path.join(cube_path, TILES_DIR)

    if missing and images_ds is not None:
        # procedural-download analog: ingest ONLY this ROI's missing tiles;
        # ingest() additionally drops tiles committed since the ledger read.
        # Each tile's data+lineage commit happens inside the merge task
        # (atomic, data-before-record) — consuming the stream here is the
        # synchronous-submit contract (§4.2): load returns only after its
        # tiles' records exist.
        ingest(
            images_ds, g, cube_path=cube_path, num_salts=num_salts,
            only_tiles=missing, channels=spec.channels,
        ).materialize()

    versions = (_read_snapshot(cube_path, epoch)
                if epoch is not None else None)
    if not persist:
        # lazy variant (accessor.load without .load(), ``accessor.py:394-397``):
        # a streaming Dataset of ROI-cropped tile windows — no driver-side
        # materialization, suitable for arbitrarily large ROIs
        return _lazy_window_dataset(tiles_dir, covered_ids, g,
                                    (cl, ch, rl, rh), pack,
                                    versions=versions)

    # read cached tiles for the window
    window_tiles = _read_tiles(tiles_dir, covered_ids, g.chunk, pack,
                               versions=versions)
    wins = {
        t: RoiWindow(cl, ch, rl, rh, pack)
        for t in (t_sel if t_sel is not None else [None])
    }
    for trow in window_tiles:
        parts = parse_tile_id(trow["tile_id"])
        if len(parts) == 3:
            ti, tx, ty = parts
        else:
            ti, (tx, ty) = None, parts
        win = wins.get(ti)
        if win is None:
            continue
        tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
        c0, c1 = max(cl, tc0), min(ch, tc1)
        r0, r1 = max(rl, tr0), min(rh, tr1)
        if c1 <= c0 or r1 <= r0:
            continue
        dst = np.s_[r0 - rl : r1 - rl, c0 - cl : c1 - cl]
        src = np.s_[r0 - tr0 : r1 - tr0, c0 - tc0 : c1 - tc0]
        for d, s in zip(win.data, trow["channels"]):
            d[dst] = s[src]
        win.mask[dst] = trow["mask"][src]
    if t_sel is None:
        return wins[None]
    # temporal result: {ISO time step -> RoiWindow} for the selected steps
    return {g.times[t]: wins[t] for t in t_sel}


def load_like(
    cube_path: str,
    ref,
    images_ds=None,
    persist: bool = True,
    num_salts: int = 4,
):
    """Load the exact window of a previous result (``accessor.load_like``,
    ``core/accessor.py:302-329``): the reference extracts the geobox + time
    axis from a reference dataset and loads the same frame — here the pixel
    window and time selection come straight from a prior :func:`load` result
    (a :class:`RoiWindow`, or the ``{iso_time: RoiWindow}`` dict a temporal
    load returns), so no ROI geometry math re-runs and the returned window
    is positionally identical. Missing tiles still ingest on demand."""
    spec = load_spec(cube_path)
    g = spec.grid
    if isinstance(ref, dict):
        if not g.temporal:
            raise ValueError("temporal reference window for a non-temporal cube")
        times = list(g.times)
        t_sel = [times.index(k) for k in ref]
        win0 = next(iter(ref.values()))
    elif isinstance(ref, RoiWindow):
        t_sel = None
        if g.temporal:
            raise ValueError(
                "non-temporal reference window for a temporal cube; pass the "
                "{iso_time: RoiWindow} dict a temporal load returns"
            )
        win0 = ref
    else:
        raise TypeError("ref must be a RoiWindow or {iso_time: RoiWindow}")
    cl, ch = win0.col_lo, win0.col_hi
    rl, rh = win0.row_lo, win0.row_hi
    if not (0 <= cl < ch <= g.width and 0 <= rl < rh <= g.height):
        raise ValueError("reference window exceeds the cube grid")
    spatial_ids = {
        f"{tx}-{ty}"
        for tx in range(cl // g.chunk, (ch - 1) // g.chunk + 1)
        for ty in range(rl // g.chunk, (rh - 1) // g.chunk + 1)
    }
    return _load_window(cube_path, spec, spatial_ids, (cl, ch, rl, rh),
                        t_sel, images_ds, persist, num_salts)


SNAPSHOT_DIR = "snapshots"


def snapshot(cube_path: str) -> int:
    """Commit a read snapshot of the cube's CURRENT state (the icechunk
    commit analog, reference ``core/accessor.py:284-293``): records every
    committed tile's per-tile update epoch in an atomically-published
    manifest and returns the snapshot id. ``load(..., epoch=id)`` then
    resolves each tile to exactly that version (updates retain superseded
    versions as CAS epoch files; :func:`ops.ingest.gc_update_versions`'s
    ``retain_floor`` bounds how far back snapshots stay readable).

    The manifest is an O(n_tiles) metadata scan (parquet footer reads
    only — no tile data moves) and an O(n_tiles) JSON write; snapshot
    commits are metadata transactions, not data copies. Concurrent
    snapshot calls race safely: ids claim via hard link, the loser
    retries with the next id."""
    import json
    import uuid

    import pyarrow.parquet as pq

    from .cube import TILES_DIR

    tdir = os.path.join(cube_path, TILES_DIR)
    manifest: dict[str, int] = {}
    if os.path.isdir(tdir):
        for name in sorted(os.listdir(tdir)):
            if not (name.startswith("part-") and name.endswith(".parquet")):
                continue
            tid = name[len("part-"):-len(".parquet")]
            try:
                meta = pq.read_schema(os.path.join(tdir, name)).metadata or {}
            except FileNotFoundError:
                continue  # raced a concurrent CAS install; tile is newer
            manifest[tid] = int(meta.get(b"raygeo_epoch", b"0"))
    sdir = os.path.join(cube_path, SNAPSHOT_DIR)
    os.makedirs(sdir, exist_ok=True)
    tmp = os.path.join(sdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    sid = len([n for n in os.listdir(sdir) if n.startswith("snap-")])
    while True:
        try:
            os.link(tmp, os.path.join(sdir, f"snap-{sid}.json"))
            break
        except FileExistsError:
            sid += 1  # another snapshot raced this id
    os.remove(tmp)
    return sid


def list_snapshots(cube_path: str) -> list[int]:
    """Ids of every committed read snapshot, ascending (the icechunk
    history listing analog). Empty when :func:`snapshot` never ran."""
    sdir = os.path.join(cube_path, SNAPSHOT_DIR)
    if not os.path.isdir(sdir):
        return []
    return sorted(int(n[len("snap-"):-len(".json")])
                  for n in os.listdir(sdir)
                  if n.startswith("snap-") and n.endswith(".json"))


def _read_snapshot(cube_path: str, sid: int) -> dict[str, int]:
    import json

    path = os.path.join(cube_path, SNAPSHOT_DIR, f"snap-{sid}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        sdir = os.path.join(cube_path, SNAPSHOT_DIR)
        have = sorted(int(n[len("snap-"):-len(".json")])
                      for n in os.listdir(sdir)) \
            if os.path.isdir(sdir) else []
        raise ValueError(
            f"no snapshot {sid} for cube {cube_path} (recorded: {have}) — "
            "call raygeo.engine.snapshot(cube_path) after each update to "
            "commit a readable state") from None


def _resolve_tile_version(tiles_dir: str, tid: str, k: int):
    """Path of ``tid``'s exact version ``k`` (from a snapshot manifest),
    or raise if that version was reclaimed by gc_update_versions."""
    import pyarrow.parquet as pq

    from .ops.ingest import _cas_files

    canonical = os.path.join(tiles_dir, f"part-{tid}.parquet")
    try:
        cur = int((pq.read_schema(canonical).metadata or {})
                  .get(b"raygeo_epoch", b"0"))
    except FileNotFoundError:
        cur = None
    if cur == k:
        return canonical
    for e, p in _cas_files(tiles_dir, tid):
        if e == k:
            return p
    raise ValueError(
        f"tile {tid} has no retained version {k} (current epoch {cur}) — "
        "the snapshot's version was reclaimed by gc_update_versions; keep "
        "a time-travel window with its retain_snapshots_from")


def _lazy_window_dataset(tiles_dir: str, tile_ids: set[str], g, window,
                         pack: ChannelPack,
                         versions: dict[str, int] | None = None):
    """Streaming K5 read path: filter cached tiles to the ROI's ids, crop
    each to the ROI pixel window inside ``map_batches`` (M2/M8 crop kernel),
    emit (tile_id, y0, x0, h, w, px, mask) rows (``px`` = the pack's
    concatenated channel buffers for the cropped window)."""
    import ray.data as rd

    cl, ch, rl, rh = window
    wanted = set(tile_ids)
    chunk = g.chunk

    def crop(t: pa.Table) -> pa.Table:
        out = {"tile_id": [], "y0": [], "x0": [], "h": [], "w": [],
               "px": [], "mask": []}
        seen = set()
        for i in range(t.num_rows):
            tid = t.column("tile_id")[i].as_py()
            if tid not in wanted or tid in seen:
                continue
            seen.add(tid)
            parts = parse_tile_id(tid)
            tx, ty = parts[-2], parts[-1]
            tc0, tc1, tr0, tr1 = g.tile_pixel_window(tx, ty)
            c0, c1 = max(cl, tc0), min(ch, tc1)
            r0, r1 = max(rl, tr0), min(rh, tr1)
            if c1 <= c0 or r1 <= r0:
                continue
            chans = pack.from_bytes(
                zlib.decompress(t.column("px_z")[i].as_py()), chunk, chunk
            )
            mask = np.frombuffer(
                zlib.decompress(t.column("mask_z")[i].as_py()), dtype=np.uint8
            ).reshape(chunk, chunk)
            sl = np.s_[r0 - tr0 : r1 - tr0, c0 - tc0 : c1 - tc0]
            out["tile_id"].append(tid)
            out["y0"].append(r0 - rl)
            out["x0"].append(c0 - cl)
            out["h"].append(r1 - r0)
            out["w"].append(c1 - c0)
            out["px"].append(pack.to_bytes([c[sl] for c in chans]))
            out["mask"].append(np.ascontiguousarray(mask[sl]).tobytes())
        return pa.table(
            {
                "tile_id": pa.array(out["tile_id"], pa.string()),
                "y0": pa.array(out["y0"], pa.int32()),
                "x0": pa.array(out["x0"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "w": pa.array(out["w"], pa.int32()),
                "px": pa.array(out["px"], pa.binary()),
                "mask": pa.array(out["mask"], pa.binary()),
            }
        )

    empty = pa.table({"tile_id": pa.array([], pa.string()),
                      "px_z": pa.array([], pa.binary()),
                      "mask_z": pa.array([], pa.binary())})
    if not os.path.isdir(tiles_dir) or not any(os.scandir(tiles_dir)):
        return rd.from_arrow(crop(empty))
    if versions is not None:
        # snapshot read: resolve each tile's manifest version file up
        # front (driver-side, bounded by the ROI's tile count), then
        # stream-read exactly those files; tiles absent from the
        # manifest did not exist at the snapshot
        paths = [_resolve_tile_version(tiles_dir, tid, versions[tid])
                 for tid in sorted(wanted) if tid in versions]
        if not paths:
            return rd.from_arrow(crop(empty))
        return rd.read_parquet(
            paths, columns=["tile_id", "px_z", "mask_z"],
        ).map_batches(crop, batch_format="pyarrow", batch_size=64)
    return rd.read_parquet(
        tiles_dir, columns=["tile_id", "px_z", "mask_z"]
    ).map_batches(crop, batch_format="pyarrow", batch_size=64)


def _read_tiles(tiles_dir: str, tile_ids: set[str], chunk: int,
                pack: ChannelPack,
                versions: dict[str, int] | None = None) -> list[dict]:
    """Read + decompress the requested tile rows from the tiles parquet dir."""
    import pyarrow.dataset as pads

    if not os.path.isdir(tiles_dir) or not any(os.scandir(tiles_dir)):
        return []
    if versions is not None:
        paths = [_resolve_tile_version(tiles_dir, tid, versions[tid])
                 for tid in sorted(tile_ids) if tid in versions]
        if not paths:
            return []
        dset = pads.dataset(paths, format="parquet")
    else:
        dset = pads.dataset(tiles_dir, format="parquet")
    t = dset.to_table(filter=pads.field("tile_id").isin(list(tile_ids)))
    out = []
    seen = set()
    for i in range(t.num_rows):
        tid = t.column("tile_id")[i].as_py()
        if tid in seen:
            continue  # duplicate rows across runs are identical (deterministic)
        seen.add(tid)
        chans = pack.from_bytes(
            zlib.decompress(t.column("px_z")[i].as_py()), chunk, chunk
        )
        mask = np.frombuffer(
            zlib.decompress(t.column("mask_z")[i].as_py()), dtype=np.uint8
        ).reshape(chunk, chunk).astype(bool)
        out.append({"tile_id": tid, "channels": chans, "mask": mask})
    return out


def current_state(cube_path: str) -> pa.Table:
    """Committed-tile geometry report (J7: ``current_state`` semi-join of the
    lineage ledger with the tile grid, ``stac.py:159-169`` /
    ``gee.py:236-252`` analog). Returns one row per committed tile with its
    lon/lat box (and time step for temporal cubes)."""
    spec = load_spec(cube_path)
    g = spec.grid
    rows = sorted(lineage.loaded_partitions(cube_path))
    out = {"tile_id": [], "t": [], "tx": [], "ty": [],
           "lon_min": [], "lat_min": [], "lon_max": [], "lat_max": []}
    for tid in rows:
        parts = parse_tile_id(tid)
        ti, tx, ty = (parts if len(parts) == 3 else (None, *parts))
        c0, c1, r0, r1 = g.tile_pixel_window(tx, ty)
        out["tile_id"].append(tid)
        out["t"].append(g.times[ti] if ti is not None else None)
        out["tx"].append(tx)
        out["ty"].append(ty)
        out["lon_min"].append(g.x0 + c0 * g.res)
        out["lon_max"].append(g.x0 + c1 * g.res)
        out["lat_max"].append(g.y1 - r0 * g.res)
        out["lat_min"].append(g.y1 - r1 * g.res)
    return pa.table(
        {
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "t": pa.array(out["t"], pa.string()),
            "tx": pa.array(out["tx"], pa.int32()),
            "ty": pa.array(out["ty"], pa.int32()),
            "lon_min": pa.array(out["lon_min"], pa.float64()),
            "lat_min": pa.array(out["lat_min"], pa.float64()),
            "lon_max": pa.array(out["lon_max"], pa.float64()),
            "lat_max": pa.array(out["lat_max"], pa.float64()),
        }
    )


def visualize_state(cube_path: str, max_width: int = 80) -> str:
    """ASCII tile-occupancy map (the ``visualize_state`` accessor hook,
    ``accessor.py:483-498`` — matplotlib-free analog). One character per
    grid cell ('#' committed, '.' empty), downsampled to ``max_width``;
    temporal cubes render one panel per time step."""
    spec = load_spec(cube_path)
    g = spec.grid
    st = current_state(cube_path)
    panels: dict[str | None, np.ndarray] = {}
    step = max(1, -(-g.n_tx // max_width))
    w = -(-g.n_tx // step)
    h = -(-g.n_ty // step)
    txs = st.column("tx").to_numpy()
    tys = st.column("ty").to_numpy()
    ts = st.column("t").to_pylist()
    for tx, ty, t in zip(txs, tys, ts):
        panel = panels.setdefault(t, np.zeros((h, w), dtype=bool))
        panel[min(int(ty) // step, h - 1), min(int(tx) // step, w - 1)] = True
    if not panels:
        panels[None] = np.zeros((h, w), dtype=bool)
    out = []
    for t in sorted(panels, key=lambda v: (v is not None, v)):
        if t is not None:
            out.append(f"-- {t} --")
        grid_chars = np.where(panels[t], "#", ".")
        out.extend("".join(r) for r in grid_chars)
    return "\n".join(out)


def state_svg(cube_path: str, cell: int = 6) -> str:
    """Tile-occupancy map as a standalone SVG (the graphical
    ``visualize_state``, ``accessor.py:483-498`` — SVG is text, so no
    plotting dependency). One square per grid tile, filled when
    committed; temporal cubes stack one panel per time step."""
    spec = load_spec(cube_path)
    g = spec.grid
    st = current_state(cube_path)
    txs = st.column("tx").to_numpy()
    tys = st.column("ty").to_numpy()
    ts = st.column("t").to_pylist()
    panels: dict = {}
    for tx, ty, t in zip(txs, tys, ts):
        panels.setdefault(t, set()).add((int(tx), int(ty)))
    if not panels:
        panels[None] = set()
    keys = sorted(panels, key=lambda v: (v is not None, v))
    pad, title_h = 4, 12
    panel_h = g.n_ty * cell + title_h
    width = g.n_tx * cell + 2 * pad
    height = len(keys) * (panel_h + pad) + pad
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
             f'height="{height}" font-family="monospace" font-size="10">']
    for p, t in enumerate(keys):
        oy = pad + p * (panel_h + pad)
        label = "(atemporal)" if t is None else str(t)
        parts.append(f'<text x="{pad}" y="{oy + 10}">{label} '
                     f'{len(panels[t])}/{g.n_tx * g.n_ty}</text>')
        done = panels[t]
        for (tx, ty) in sorted(done):
            parts.append(
                f'<rect x="{pad + tx * cell}" '
                f'y="{oy + title_h + ty * cell}" width="{cell - 1}" '
                f'height="{cell - 1}" fill="rgb(60,100,220)"/>')
    parts.append("</svg>")
    return "\n".join(parts)
