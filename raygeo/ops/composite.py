"""Compositing operators beyond the associative mosaics: exact per-pixel
median composite and mosaic change detection.

Median composite (the cloud-free-compositing classic; the reference collapses
temporal stacks only with max — ``stac.py:141-143`` — median is the standard
production alternative) is NOT associative, so it cannot ride the map-side
partial-fold plan that lww/max use. The Ray-Data-first plan is the fragment
plan: decode+explode emits per-tile fragments, one ``groupby(tile_id)``
brings every fragment of a tile to one task, and the median is computed
there in a single vectorized sort over a depth stack.

Scale shape, two plans (bit-identical outputs, pinned by tests):

- ``plan="stack"``: the shuffle carries raw fragment pixels (O(total
  decoded bytes)) and the per-task peak is depth x chunk^2 x value-size —
  depth (overlap count per pixel) is the scale knob; ``sub_split``
  decomposes hot tiles spatially. Works for ANY channel dtype.
- ``plan="hist"`` (small-domain integer channels: uint8 / bool): a
  per-pixel value histogram (256 / 2 bins) IS associative, so the exact
  median rides the same map-side partial-fold + combiner-tree shape as
  lww/max. The map stage is ADAPTIVE per (task, tile): once a tile's
  accumulated fragment bytes in one task exceed the hist wire estimate
  (the high-depth / hot-tile regime) it folds them into one bounded hist
  partial; below that it forwards raw fragments (low depth — a dense hist
  would INFLATE the shuffle). The combiner tree coalesces same-tile rows
  block-locally under the same rule, and the final per-tile merge folds
  fragments + hist partials into ONE fixed-size histogram — per-task peak
  is levels x chunk^2 x 8 B regardless of depth, so the thousands-of-
  overlaps hot tile that OOMs the depth stack streams through a ~100 MB
  array at chunk=128. (At production 3600^2 chunks the hist array itself
  is the budget — compose with a spatial split or keep ``stack`` +
  ``sub_split``; the eligibility gate enforces this.)

Hot-tile skew is inherent to exact medians (every fragment of a tile must
meet one task) and is surfaced by tile_skew_report rather than hidden by
salting; the hist plan bounds what that task must HOLD, not what it reads.

Change detection (``mosaic_change``) compares two mosaic variants of the
same grid per tile — e.g. lww (latest observation) vs max (brightest
composite): tag + union + one keyed groupby, per-pixel compare inside the
group. Streams tile-by-tile; nothing materializes beyond one tile pair per
task.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..channels import RGB_CHANNELS, ChannelPack
from ..grid import GridSpec
from ..util import binary_views, cluster_cpus
from .ingest import fragments_dataset

MEDIAN_TILE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("n_frags", pa.int64()),
        ("n_valid_px", pa.int64()),
        ("pix_sum", pa.int64()),
        ("px_z", pa.binary()),
        ("mask_z", pa.binary()),
    ]
)


def _stack_dtype(dt: np.dtype):
    """(stack dtype, sentinel that sorts AFTER every valid value)."""
    if dt.kind == "f":
        return np.dtype(np.float64) if dt.itemsize > 4 else np.dtype(
            np.float32), np.inf
    if dt.kind == "b":
        return np.dtype(np.uint8), 2
    if dt.kind == "u" and dt.itemsize <= 2:
        up = np.dtype(np.uint16) if dt.itemsize == 1 else np.dtype(np.uint32)
        return up, np.iinfo(up).max
    return np.dtype(np.int64), np.int64(1) << 62


def make_median_fold(chunk: int, pack: ChannelPack):
    """groupby(tile_id).map_groups fold: exact per-pixel lower median.

    Per channel component, the tile's value at a pixel is the lower median
    (order statistic at index (count-1)//2) of all fragments writing that
    pixel; validity = any writer. Lower median (not the averaged even-count
    midpoint) keeps integer channels integral and the definition
    dtype-uniform.
    """

    def median_fold(group: pa.Table) -> pa.Table:
        y_off = group.column("y_off").to_numpy()
        x_off = group.column("x_off").to_numpy()
        fh = group.column("fh").to_numpy()
        fw = group.column("fw").to_numpy()
        px = binary_views(group.column("px"))
        n = group.num_rows

        count = np.zeros((chunk, chunk), np.int32)
        for j in range(n):
            count[y_off[j]:y_off[j] + fh[j], x_off[j]:x_off[j] + fw[j]] += 1
        depth = int(count.max()) if n else 0
        valid = count > 0

        proto = pack.alloc(chunk, chunk)
        stacks = []
        for a in proto:
            sdt, sent = _stack_dtype(a.dtype)
            stacks.append(np.full((max(depth, 1),) + a.shape, sent, dtype=sdt))
        fill = np.zeros((chunk, chunk), np.int32)
        for j in range(n):
            ys = np.s_[y_off[j]:y_off[j] + fh[j]]
            xs = np.s_[x_off[j]:x_off[j] + fw[j]]
            frag = pack.from_bytes(px[j], int(fh[j]), int(fw[j]))
            layer = fill[ys, xs]
            rr = np.arange(y_off[j], y_off[j] + fh[j])[:, None]
            cc = np.arange(x_off[j], x_off[j] + fw[j])[None, :]
            for st, fr in zip(stacks, frag):
                st[layer, rr, cc] = fr
            fill[ys, xs] += 1

        med_idx = np.maximum(count - 1, 0) // 2
        canvas = []
        for st, a in zip(stacks, proto):
            st.sort(axis=0)
            idx = med_idx
            if st.ndim == 4:  # (depth, h, w, k) component channels
                idx = med_idx[:, :, None]
            med = np.take_along_axis(st, idx[None, ...], axis=0)[0]
            canvas.append(med.astype(a.dtype, copy=False))
        canvas = pack.fill_invalid(canvas, valid)

        px_z = zlib.compress(
            b"".join(np.ascontiguousarray(c).tobytes() for c in canvas), 1)
        mask_z = zlib.compress(valid.astype(np.uint8).tobytes(), 1)
        return pa.table(
            {
                "tile_id": [group.column("tile_id")[0].as_py()],
                "tx": [group.column("tx")[0].as_py()],
                "ty": [group.column("ty")[0].as_py()],
                "n_frags": [n],
                "n_valid_px": [int(valid.sum())],
                "pix_sum": [pack.pix_sum(canvas, valid)],
                "px_z": [px_z],
                "mask_z": [mask_z],
            },
            schema=MEDIAN_TILE_SCHEMA,
        )

    return median_fold


SUB_PIECE_SCHEMA = pa.schema([
    ("sub_key", pa.string()),
    ("tile_id", pa.string()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("qy", pa.int32()),
    ("qx", pa.int32()),
    ("patch_no", pa.int64()),  # preserved so LWW folds keep their order
    ("y_off", pa.int32()),  # piece origin within the SUB-tile
    ("x_off", pa.int32()),
    ("fh", pa.int32()),
    ("fw", pa.int32()),
    ("own", pa.int32()),  # 1 iff this sub-tile holds the fragment's corner
    ("px", pa.binary()),
])


def _split_to_subtiles(frags, pack: ChannelPack, sub: int,
                       batch_size: int = 2048):
    """Fragments -> sub-tile piece rows (the spatial skew decomposition
    shared by every per-pixel fragment fold: median, change, ...)."""

    def split(t: pa.Table) -> pa.Table:
        out = {k: [] for k in SUB_PIECE_SCHEMA.names}
        px = binary_views(t.column("px"))
        y_off = t.column("y_off").to_numpy()
        x_off = t.column("x_off").to_numpy()
        fh = t.column("fh").to_numpy()
        fw = t.column("fw").to_numpy()
        pno = t.column("patch_no").to_numpy()
        tids = t.column("tile_id").to_pylist()
        txs = t.column("tx").to_numpy()
        tys = t.column("ty").to_numpy()
        for j in range(t.num_rows):
            chans = pack.from_bytes(px[j], int(fh[j]), int(fw[j]))
            y0, x0 = int(y_off[j]), int(x_off[j])
            y1, x1 = y0 + int(fh[j]), x0 + int(fw[j])
            for qy in range(y0 // sub, (y1 - 1) // sub + 1):
                for qx in range(x0 // sub, (x1 - 1) // sub + 1):
                    py0, py1 = max(y0, qy * sub), min(y1, (qy + 1) * sub)
                    px0, px1 = max(x0, qx * sub), min(x1, (qx + 1) * sub)
                    sl = np.s_[py0 - y0:py1 - y0, px0 - x0:px1 - x0]
                    piece = [a[sl] for a in chans]
                    out["sub_key"].append(f"{tids[j]}#{qy}-{qx}")
                    out["tile_id"].append(tids[j])
                    out["tx"].append(int(txs[j]))
                    out["ty"].append(int(tys[j]))
                    out["qy"].append(qy)
                    out["qx"].append(qx)
                    out["patch_no"].append(int(pno[j]))
                    out["y_off"].append(py0 - qy * sub)
                    out["x_off"].append(px0 - qx * sub)
                    out["fh"].append(py1 - py0)
                    out["fw"].append(px1 - px0)
                    out["own"].append(
                        int(qy == y0 // sub and qx == x0 // sub))
                    out["px"].append(pack.to_bytes(
                        [np.ascontiguousarray(a) for a in piece]))
        return pa.table(out, schema=SUB_PIECE_SCHEMA)

    return frags.map_batches(split, batch_format="pyarrow",
                             batch_size=batch_size)

SUB_RESULT_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("qy", pa.int32()),
    ("qx", pa.int32()),
    ("n_frags_owned", pa.int64()),
    ("px", pa.binary()),
    ("mask", pa.binary()),
])


def ingest_median(images_ds, grid: GridSpec, batch_size: int = 64,
                  channels=None, sub_split: int = 4, plan: str = "stack"):
    """images Dataset -> median-composite tiles Dataset (lazy).

    ``plan``: "stack" (depth-stack fragment plan below — any dtype),
    "hist" (:func:`ingest_median_hist` — bounded-histogram partial fold,
    uint8/bool channels), or "auto" (hist when eligible, else stack).
    Both plans produce bit-identical tiles (pinned by tests).

    Fragment plan with SPATIAL skew decomposition: exact medians are
    per-pixel, so a tile splits losslessly into ``sub_split^2`` sub-tiles
    that fold independently — the hot tile (every fragment of a popular
    tile must meet the order statistic) stops being one straggler task
    and becomes sub_split^2 parallel tasks of 1/sub_split^2 the area.
    Depth (overlap count) stays the irreducible knob; spatial splitting
    bounds the per-TASK cost at depth x (chunk/sub_split)^2. A second,
    tiny keyed groupby pastes the sub-results (mosaic-sized, one row per
    sub-tile) into the final tile canvas — output is bit-identical to the
    unsplit plan (``sub_split=1`` keeps the single-group path).

    ``n_frags`` stays exact under the split: each fragment is counted by
    the one sub-tile containing its corner (owner-flag), never per piece.
    """
    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(
        RGB_CHANNELS)
    if plan not in ("stack", "hist", "auto"):
        raise ValueError(f"unknown median plan {plan!r}")
    if plan == "hist" or (plan == "auto" and hist_comp_levels(pack)
                          is not None
                          and sum(hist_comp_levels(pack)) * grid.chunk
                          * grid.chunk * 8 <= (4 << 30)):
        return ingest_median_hist(images_ds, grid, batch_size=batch_size,
                                  channels=channels)
    frags = fragments_dataset(images_ds, grid, num_salts=1,
                              batch_size=batch_size, pack=pack)
    n_blocks = max(8, min(64, cluster_cpus()))
    chunk = grid.chunk
    if sub_split <= 1 or chunk % sub_split:
        return frags.repartition(n_blocks).groupby("tile_id").map_groups(
            make_median_fold(chunk, pack), batch_format="pyarrow")

    sub = chunk // sub_split
    pieces = _split_to_subtiles(frags, pack, sub)

    def sub_fold(group: pa.Table) -> pa.Table:
        y_off = group.column("y_off").to_numpy()
        x_off = group.column("x_off").to_numpy()
        fh = group.column("fh").to_numpy()
        fw = group.column("fw").to_numpy()
        px = binary_views(group.column("px"))
        n = group.num_rows

        count = np.zeros((sub, sub), np.int32)
        for j in range(n):
            count[y_off[j]:y_off[j] + fh[j], x_off[j]:x_off[j] + fw[j]] += 1
        depth = int(count.max()) if n else 0
        valid = count > 0

        proto = pack.alloc(sub, sub)
        stacks = []
        for a in proto:
            sdt, sent = _stack_dtype(a.dtype)
            stacks.append(np.full((max(depth, 1),) + a.shape, sent, dtype=sdt))
        fill = np.zeros((sub, sub), np.int32)
        for j in range(n):
            ys = np.s_[y_off[j]:y_off[j] + fh[j]]
            xs = np.s_[x_off[j]:x_off[j] + fw[j]]
            frag = pack.from_bytes(px[j], int(fh[j]), int(fw[j]))
            layer = fill[ys, xs]
            rr = np.arange(y_off[j], y_off[j] + fh[j])[:, None]
            cc = np.arange(x_off[j], x_off[j] + fw[j])[None, :]
            for st, fr in zip(stacks, frag):
                st[layer, rr, cc] = fr
            fill[ys, xs] += 1

        med_idx = np.maximum(count - 1, 0) // 2
        canvas = []
        for st, a in zip(stacks, proto):
            st.sort(axis=0)
            idx = med_idx
            if st.ndim == 4:
                idx = med_idx[:, :, None]
            med = np.take_along_axis(st, idx[None, ...], axis=0)[0]
            canvas.append(med.astype(a.dtype, copy=False))
        canvas = pack.fill_invalid(canvas, valid)
        return pa.table(
            {
                "tile_id": [group.column("tile_id")[0].as_py()],
                "tx": [group.column("tx")[0].as_py()],
                "ty": [group.column("ty")[0].as_py()],
                "qy": [group.column("qy")[0].as_py()],
                "qx": [group.column("qx")[0].as_py()],
                "n_frags_owned": [int(group.column("own").to_numpy().sum())],
                "px": [pack.to_bytes(canvas)],
                "mask": [valid.astype(np.uint8).tobytes()],
            },
            schema=SUB_RESULT_SCHEMA,
        )

    sub_results = pieces.repartition(n_blocks).groupby("sub_key").map_groups(
        sub_fold, batch_format="pyarrow")

    def assemble(group: pa.Table) -> pa.Table:
        canvas = pack.alloc(chunk, chunk)
        valid = np.zeros((chunk, chunk), bool)
        n_frags = 0
        for j in range(group.num_rows):
            qy = int(group.column("qy")[j].as_py())
            qx = int(group.column("qx")[j].as_py())
            piece = pack.from_bytes(group.column("px")[j].as_py(), sub, sub)
            pmask = np.frombuffer(group.column("mask")[j].as_py(),
                                  np.uint8).reshape(sub, sub).astype(bool)
            ys = np.s_[qy * sub:(qy + 1) * sub]
            xs = np.s_[qx * sub:(qx + 1) * sub]
            for dst, src in zip(canvas, piece):
                dst[ys, xs] = src
            valid[ys, xs] = pmask
            n_frags += int(group.column("n_frags_owned")[j].as_py())
        # sub-tiles no fragment touched were never pasted: normalize them
        # to the channel nodata exactly like the unsplit plan's
        # fill_invalid (idempotent on the already-filled piece regions)
        canvas = pack.fill_invalid(canvas, valid)
        px_z = zlib.compress(
            b"".join(np.ascontiguousarray(c).tobytes() for c in canvas), 1)
        mask_z = zlib.compress(valid.astype(np.uint8).tobytes(), 1)
        return pa.table(
            {
                "tile_id": [group.column("tile_id")[0].as_py()],
                "tx": [group.column("tx")[0].as_py()],
                "ty": [group.column("ty")[0].as_py()],
                "n_frags": [n_frags],
                "n_valid_px": [int(valid.sum())],
                "pix_sum": [pack.pix_sum(canvas, valid)],
                "px_z": [px_z],
                "mask_z": [mask_z],
            },
            schema=MEDIAN_TILE_SCHEMA,
        )

    return sub_results.groupby("tile_id").map_groups(
        assemble, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bounded-histogram median plan (uint8 / bool channels)
# ---------------------------------------------------------------------------

_HIST_LEVELS = {"uint8": 256, "bool": 2}

MEDIAN_MIX_SCHEMA = pa.schema([
    ("tile_id", pa.string()),
    ("tx", pa.int32()),
    ("ty", pa.int32()),
    ("kind", pa.int32()),    # 0 = raw fragment, 1 = hist partial
    ("n_frags", pa.int64()),
    ("y_off", pa.int32()),   # kind 0 only
    ("x_off", pa.int32()),
    ("fh", pa.int32()),
    ("fw", pa.int32()),
    ("px", pa.binary()),     # kind 0: fragment channel bytes; kind 1: hist_z
])


def hist_comp_levels(pack: ChannelPack) -> list[int] | None:
    """Per-COMPONENT bin counts for the hist plan, or None if ineligible
    (any channel dtype outside the small-domain integer set)."""
    levels: list[int] = []
    for dt, nc in zip(pack.dtypes, pack.ncomps):
        n = _HIST_LEVELS.get(dt.name)
        if n is None:
            return None
        levels.extend([n] * nc)
    return levels


def _comp_values(chans: list[np.ndarray]) -> list[np.ndarray]:
    """Channel arrays -> flat list of 2-D uint8 component planes."""
    out = []
    for a in chans:
        if a.ndim == 3:
            for c in range(a.shape[2]):
                out.append(a[..., c].astype(np.uint8, copy=False))
        else:
            out.append(a.astype(np.uint8, copy=False))
    return out


def _hist_alloc(levels: list[int], area: int) -> list[np.ndarray]:
    return [np.zeros((n, area), np.int64) for n in levels]


def _hist_add_frags(hists: list[np.ndarray], frag_rows, pack: ChannelPack,
                    chunk: int) -> None:
    """Fold raw fragments into per-comp histograms — ONE bincount per comp
    over all fragments' (value, pixel) pairs, never a depth stack."""
    area = chunk * chunk
    pair_idx: list[list[np.ndarray]] = [[] for _ in hists]
    for (y0, x0, fh, fw, buf) in frag_rows:
        chans = pack.from_bytes(buf, fh, fw)
        pos = (np.arange(y0, y0 + fh, dtype=np.int64)[:, None] * chunk
               + np.arange(x0, x0 + fw, dtype=np.int64)[None, :]).ravel()
        for ci, v in enumerate(_comp_values(chans)):
            pair_idx[ci].append(v.ravel().astype(np.int64) * area + pos)
    for ci, (h, parts) in enumerate(zip(hists, pair_idx)):
        if not parts:
            continue
        idx = np.concatenate(parts)
        h += np.bincount(idx, minlength=h.shape[0] * area).reshape(
            h.shape[0], area)


def _hist_to_wire(hists: list[np.ndarray]) -> bytes:
    return zlib.compress(
        b"".join(h.astype(np.uint32).tobytes() for h in hists), 1)


def _hist_from_wire(buf: bytes, levels: list[int], area: int) -> list[np.ndarray]:
    raw = zlib.decompress(buf)
    out, off = [], 0
    for n in levels:
        nb = n * area * 4
        out.append(np.frombuffer(raw[off:off + nb], np.uint32)
                   .reshape(n, area).astype(np.int64))
        off += nb
    return out


def _median_from_hists(hists: list[np.ndarray], pack: ChannelPack,
                       chunk: int):
    """(canvas channel-list, valid HxW bool) — lower median per component:
    smallest value v with cumulative count > (depth-1)//2, identical to the
    depth-stack plan's order statistic at index (count-1)//2."""
    counts = hists[0].sum(axis=0)  # same depth for every comp
    valid = (counts > 0).reshape(chunk, chunk)
    med_idx = np.maximum(counts - 1, 0) // 2
    meds = []
    for h in hists:
        cum = np.cumsum(h, axis=0)
        meds.append((cum > med_idx[None, :]).argmax(axis=0)
                    .astype(np.uint8).reshape(chunk, chunk))
    canvas, ci = [], 0
    for dt, nc in zip(pack.dtypes, pack.ncomps):
        if nc > 1:
            a = np.stack(meds[ci:ci + nc], axis=2)
        else:
            a = meds[ci]
        canvas.append(a.astype(dt, copy=False))
        ci += nc
    return canvas, valid


class DecodeFoldHistAdaptive:
    """Decode + adaptive map-side median partials (task pool).

    Per (task, tile): accumulate fragments; at batch end, tiles whose
    fragment bytes exceed ``hist_bytes // hist_gain`` (hist_gain ~ the
    zlib ratio of a sparse hist — folding must SHRINK the shuffle) fold
    into one hist-partial row, the rest forward as raw fragment rows.
    Low-depth inputs therefore pay exactly the fragment plan's volume;
    the hot tile's thousands of overlaps collapse map-side.
    """

    def __init__(self, grid: GridSpec, pack: ChannelPack | None = None,
                 hist_gain: int = 8):
        self.grid = grid
        self.pack = pack or ChannelPack(RGB_CHANNELS)
        self.levels = hist_comp_levels(self.pack)
        if self.levels is None:
            raise ValueError("hist median plan needs uint8/bool channels")
        self.hist_thresh = (sum(self.levels) * grid.chunk * grid.chunk * 4
                            // max(hist_gain, 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codec import decode
        from ..fixtures import footprint_of
        from .ingest import _clip_fragment

        g, pk = self.grid, self.pack
        chunk = g.chunk
        ids = batch.column("image_id").to_pylist()
        out = {k: [] for k in MEDIAN_MIX_SCHEMA.names}
        if not ids:
            return pa.table(out, schema=MEDIAN_MIX_SCHEMA)
        bufs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        boxes = np.array([footprint_of(i, int(w), int(h), g)
                          for i, w, h in zip(ids, ws, hs)]).reshape(-1, 4)
        cl, chh, rl, rhh = g.pixel_window(boxes[:, 0], boxes[:, 1],
                                          boxes[:, 2], boxes[:, 3])
        acc: dict[tuple[int, int], tuple[list, list[int]]] = {}
        for i in range(len(ids)):
            if int(chh[i]) <= int(cl[i]) or int(rhh[i]) <= int(rl[i]):
                continue
            chans = None
            tx_lo, tx_hi = int(cl[i]) // chunk, (int(chh[i]) - 1) // chunk
            ty_lo, ty_hi = int(rl[i]) // chunk, (int(rhh[i]) - 1) // chunk
            for tx in range(tx_lo, tx_hi + 1):
                for ty in range(ty_lo, ty_hi + 1):
                    if chans is None:
                        chans = pk.derive(decode(bufs[i]))
                    clip = _clip_fragment(g, tx, ty, int(cl[i]), int(chh[i]),
                                          int(rl[i]), int(rhh[i]),
                                          chans[0].shape[0], chans[0].shape[1])
                    if clip is None:
                        continue
                    tr0, tc0, r0, c0, sr0, sr1, sc0, sc1 = clip
                    frag = pk.region(chans, np.s_[sr0:sr1], np.s_[sc0:sc1])
                    buf = pk.to_bytes([np.ascontiguousarray(a) for a in frag])
                    rows, nbytes = acc.setdefault((tx, ty), ([], [0]))
                    rows.append((r0 - tr0, c0 - tc0, sr1 - sr0, sc1 - sc0,
                                 buf))
                    nbytes[0] += len(buf)
        area = chunk * chunk
        for (tx, ty), (rows, nbytes) in acc.items():
            tid = f"{tx}-{ty}"
            if nbytes[0] > self.hist_thresh:
                hists = _hist_alloc(self.levels, area)
                _hist_add_frags(hists, rows, pk, chunk)
                out["tile_id"].append(tid)
                out["tx"].append(tx)
                out["ty"].append(ty)
                out["kind"].append(1)
                out["n_frags"].append(len(rows))
                out["y_off"].append(0)
                out["x_off"].append(0)
                out["fh"].append(0)
                out["fw"].append(0)
                out["px"].append(_hist_to_wire(hists))
            else:
                for (y0, x0, fh, fw, buf) in rows:
                    out["tile_id"].append(tid)
                    out["tx"].append(tx)
                    out["ty"].append(ty)
                    out["kind"].append(0)
                    out["n_frags"].append(1)
                    out["y_off"].append(y0)
                    out["x_off"].append(x0)
                    out["fh"].append(fh)
                    out["fw"].append(fw)
                    out["px"].append(buf)
        return pa.table(out, schema=MEDIAN_MIX_SCHEMA)


def _fold_mix_rows(group: pa.Table, levels: list[int], pack: ChannelPack,
                   chunk: int):
    """Fold mixed fragment/hist rows into (hists, n_frags)."""
    area = chunk * chunk
    hists = _hist_alloc(levels, area)
    kinds = group.column("kind").to_numpy()
    y_off = group.column("y_off").to_numpy()
    x_off = group.column("x_off").to_numpy()
    fh = group.column("fh").to_numpy()
    fw = group.column("fw").to_numpy()
    nf = group.column("n_frags").to_numpy()
    px = binary_views(group.column("px"))
    frag_rows = []
    n_frags = 0
    for j in range(group.num_rows):
        n_frags += int(nf[j])
        if kinds[j] == 1:
            for h, h2 in zip(hists, _hist_from_wire(bytes(px[j]), levels,
                                                    area)):
                h += h2
        else:
            frag_rows.append((int(y_off[j]), int(x_off[j]), int(fh[j]),
                              int(fw[j]), px[j]))
    _hist_add_frags(hists, frag_rows, pack, chunk)
    return hists, n_frags


def make_hist_tree_combine(levels: list[int], pack: ChannelPack, chunk: int,
                           hist_gain: int = 8):
    """Block-local combine: same-tile mixed rows coalesce into one hist row
    when their bytes exceed the hist wire estimate (same adaptive rule as
    the map stage) — the combiner-tree step of the partial-fold plan."""
    thresh = sum(levels) * chunk * chunk * 4 // max(hist_gain, 1)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        tids = t.column("tile_id").to_pylist()
        by_tile: dict[str, list[int]] = {}
        for j, tid in enumerate(tids):
            by_tile.setdefault(tid, []).append(j)
        px = binary_views(t.column("px"))
        kinds = t.column("kind").to_numpy()
        fold_tiles = {
            tid: rows for tid, rows in by_tile.items()
            if len(rows) > 1 and (
                (kinds[rows] == 1).sum() > 1
                or sum(len(px[j]) for j in rows if kinds[j] == 0) > thresh)
        }
        if not fold_tiles:
            return t
        keep = [j for j in range(t.num_rows)
                if tids[j] not in fold_tiles]
        out = {k: [] for k in MEDIAN_MIX_SCHEMA.names}
        txc, tyc = t.column("tx"), t.column("ty")
        for tid, rows in fold_tiles.items():
            hists, n_frags = _fold_mix_rows(t.take(rows), levels, pack, chunk)
            out["tile_id"].append(tid)
            out["tx"].append(txc[rows[0]].as_py())
            out["ty"].append(tyc[rows[0]].as_py())
            out["kind"].append(1)
            out["n_frags"].append(n_frags)
            out["y_off"].append(0)
            out["x_off"].append(0)
            out["fh"].append(0)
            out["fw"].append(0)
            out["px"].append(_hist_to_wire(hists))
        folded = pa.table(out, schema=MEDIAN_MIX_SCHEMA)
        return pa.concat_tables([t.take(keep), folded]) if keep else folded

    return combine


def ingest_median_hist(images_ds, grid: GridSpec, batch_size: int = 64,
                       channels=None, hist_gain: int = 8):
    """Bounded-histogram exact median composite (uint8/bool channels).

    See the module docstring: adaptive map-side hist partials ride the
    lww/max partial-fold + combiner-tree shape; the final per-tile merge
    streams every row into one fixed ``levels x chunk^2`` histogram —
    per-task peak memory is independent of depth. Output is bit-identical
    to :func:`ingest_median` (pinned by tests/test_ingest.py).
    """
    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(
        RGB_CHANNELS)
    levels = hist_comp_levels(pack)
    if levels is None:
        raise ValueError(
            "hist median plan needs uint8/bool channels; use plan='stack'")
    hist_bytes = sum(levels) * grid.chunk * grid.chunk * 8
    if hist_bytes > (4 << 30):
        raise ValueError(
            f"per-tile hist is {hist_bytes >> 20} MiB at chunk="
            f"{grid.chunk}; compose a spatial split or use plan='stack'")
    chunk = grid.chunk
    # a map task's LIVE set is the batch's accumulated fragment buffers
    # (decoded bytes, ~px_bytes x batch) plus ONE transient hist during a
    # flush — hists are compressed and released per tile, so the batch cap
    # follows fragment bytes, not hist size
    per_img = pack.nbytes_px * 64 * 64  # fixture-scale estimate
    fold_cap = max(64, (1 << 29) // max(per_img, 1))

    mixed = images_ds.map_batches(
        DecodeFoldHistAdaptive(grid, pack, hist_gain),
        batch_format="pyarrow",
        batch_size=int(min(batch_size * 32, fold_cap)),
        num_cpus=1,
    )
    # combiner tree (num_cpus differs from the fold stage so Ray Data does
    # NOT fuse them — a fused combine sees one fold output and no-ops)
    mixed = mixed.map_batches(
        make_hist_tree_combine(levels, pack, chunk, hist_gain),
        batch_format="pyarrow", batch_size=4096, num_cpus=0.5)
    n_merge = max(8, min(64, cluster_cpus()))

    stack_fold = make_median_fold(chunk, pack)
    thresh = sum(levels) * chunk * chunk * 4 // max(hist_gain, 1)

    def merge(group: pa.Table) -> pa.Table:
        # per-group adaptive kernel (outputs bit-identical): shallow
        # all-fragment groups skip the levels x area histogram alloc and
        # run the depth-stack sort; deep or hist-bearing groups stream
        # through the bounded histogram
        kinds = group.column("kind").to_numpy()
        if (kinds == 0).all():
            frag_bytes = sum(len(v) for v in binary_views(group.column("px")))
            if frag_bytes <= thresh:
                return stack_fold(group)
        hists, n_frags = _fold_mix_rows(group, levels, pack, chunk)
        canvas, valid = _median_from_hists(hists, pack, chunk)
        canvas = pack.fill_invalid(canvas, valid)
        px_z = zlib.compress(
            b"".join(np.ascontiguousarray(c).tobytes() for c in canvas), 1)
        mask_z = zlib.compress(valid.astype(np.uint8).tobytes(), 1)
        return pa.table(
            {
                "tile_id": [group.column("tile_id")[0].as_py()],
                "tx": [group.column("tx")[0].as_py()],
                "ty": [group.column("ty")[0].as_py()],
                "n_frags": [n_frags],
                "n_valid_px": [int(valid.sum())],
                "pix_sum": [pack.pix_sum(canvas, valid)],
                "px_z": [px_z],
                "mask_z": [mask_z],
            },
            schema=MEDIAN_TILE_SCHEMA,
        )

    return (mixed.repartition(n_merge).groupby("tile_id")
            .map_groups(merge, batch_format="pyarrow"))


def _diff_stats(ca, ma, cb, mb):
    """Per-pixel change statistics between two canvases: the ONE
    definition shared by the two-Dataset and fused change plans.
    Float channels quantize per pixel at 1e-3 (associative — safe under
    the sub-tile decomposition); integer channels diff exactly.
    Returns (n_valid_px, n_diff_px, abs_diff_sum)."""
    either, bothv = ma | mb, ma & mb
    diff = ma != mb
    adiff = 0
    for a, b in zip(ca, cb):
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        if d.ndim == 3:
            dd = d.sum(axis=2)
            ne = (a != b).any(axis=2)
        else:
            dd, ne = d, a != b
        diff = diff | (ne & bothv)
        if a.dtype.kind == "f":
            adiff += int(np.round(dd[bothv] * 1000.0).astype(np.int64).sum())
        else:
            adiff += int(dd[bothv].astype(np.int64).sum())
    return int(either.sum()), int(diff.sum()), adiff


def mosaic_change(tiles_a, tiles_b, chunk: int, channels=None):
    """Per-tile change stats between two mosaic variants of the same grid.

    ``tiles_a`` / ``tiles_b``: tile Datasets (TILE_SCHEMA-shaped: px_z /
    mask_z) from two ingest runs — e.g. ``mode="lww"`` (latest observation)
    vs ``mode="max"`` (brightest composite). Tag + union + one keyed
    groupby; per-pixel compare runs inside the group task, so the pipeline
    streams tile pairs and never materializes a full mosaic.

    Output per tile: n_valid_px (pixels valid on either side), n_diff_px
    (valid-on-both pixels where any channel component differs; a pixel
    valid on exactly one side also counts as changed), abs_diff_sum
    (sum over both-valid pixels of |a - b| summed across components, ints
    exact, floats at 1e-3 fixed point).
    """
    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(
        RGB_CHANNELS)

    def tag(side: int):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column("side", pa.array([side] * len(t),
                                                    pa.int32()))
        return add

    cols = ["tile_id", "tx", "ty", "px_z", "mask_z"]
    both = (tiles_a.select_columns(cols).map_batches(
                tag(0), batch_format="pyarrow")
            .union(tiles_b.select_columns(cols).map_batches(
                tag(1), batch_format="pyarrow")))

    def compare(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_numpy()
        px_v = binary_views(group.column("px_z"))
        mk_v = binary_views(group.column("mask_z"))
        decoded = {}
        for j in range(group.num_rows):
            canvas = pack.from_bytes(zlib.decompress(px_v[j]), chunk, chunk)
            mask = np.frombuffer(zlib.decompress(mk_v[j]),
                                 np.uint8).reshape(chunk, chunk).astype(bool)
            decoded[int(sides[j])] = (canvas, mask)
        out = {
            "tile_id": [group.column("tile_id")[0].as_py()],
            "tx": [group.column("tx")[0].as_py()],
            "ty": [group.column("ty")[0].as_py()],
        }
        if len(decoded) == 1:  # tile present on one side only
            (_, mask), = decoded.values()
            out.update({"n_valid_px": [int(mask.sum())],
                        "n_diff_px": [int(mask.sum())],
                        "abs_diff_sum": [0]})
        else:
            (ca, ma), (cb, mb) = decoded[0], decoded[1]
            nv, nd, adiff = _diff_stats(ca, ma, cb, mb)
            out.update({"n_valid_px": [nv], "n_diff_px": [nd],
                        "abs_diff_sum": [adiff]})
        return pa.table({
            "tile_id": pa.array(out["tile_id"], pa.string()),
            "tx": pa.array(out["tx"], pa.int32()),
            "ty": pa.array(out["ty"], pa.int32()),
            "n_valid_px": pa.array(out["n_valid_px"], pa.int64()),
            "n_diff_px": pa.array(out["n_diff_px"], pa.int64()),
            "abs_diff_sum": pa.array(out["abs_diff_sum"], pa.int64()),
        })

    return both.groupby("tile_id").map_groups(compare,
                                              batch_format="pyarrow")


def mosaic_change_from_images(images_ds, grid: GridSpec,
                              modes: tuple[str, str] = ("lww", "max"),
                              batch_size: int = 64, channels=None,
                              sub_split: int = 1):
    """Fused single-pass change detection straight from the image table.

    The general :func:`mosaic_change` runs two full ingests (two decodes of
    every image, two shuffles) and joins the tile streams. When both mosaic
    variants come from the SAME input, this fused plan decodes once and
    shuffles once: the fragment plan brings every fragment of a tile to one
    task, which folds the group twice (once per mode, reusing the ingest
    fold kernel) and diffs the two canvases in place — measured ~2x less
    wall than the two-ingest plan at 100k images.

    ``sub_split`` > 1 applies the median's spatial skew decomposition
    (the diff stats are additive over disjoint regions, so the final row
    is a Sum of sub-tile partials). MEASURED A LOSS here at sf0.1 (6.4s
    -> 13-18s): the LWW/max fold is linear in fragment bytes, so the hot
    tile is no straggler, and the split pass (extra byte copy + 16x rows
    through the sort-groupby) is pure overhead. Default stays 1; the knob
    exists because a fold with superlinear per-task cost (the median's
    depth-stack sort) DOES pay — see :func:`ingest_median`.
    """
    from .ingest import _fold_group

    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(
        RGB_CHANNELS)
    mode_a, mode_b = modes
    chunk = grid.chunk

    def fold_both(group: pa.Table, size: int | None = None) -> pa.Table:
        sz = size or chunk
        ca, wa, _ = _fold_group(group, sz, pack, mode_a)
        cb, wb, _ = _fold_group(group, sz, pack, mode_b)
        nv, nd, adiff = _diff_stats(ca, wa >= 0, cb, wb >= 0)
        return pa.table({
            "tile_id": pa.array([group.column("tile_id")[0].as_py()],
                                pa.string()),
            "tx": pa.array([group.column("tx")[0].as_py()], pa.int32()),
            "ty": pa.array([group.column("ty")[0].as_py()], pa.int32()),
            "n_valid_px": pa.array([nv], pa.int64()),
            "n_diff_px": pa.array([nd], pa.int64()),
            "abs_diff_sum": pa.array([adiff], pa.int64()),
        })

    frags = fragments_dataset(images_ds, grid, num_salts=1,
                              batch_size=batch_size, pack=pack)
    n_blocks = max(8, min(64, cluster_cpus()))
    if sub_split <= 1 or chunk % sub_split:
        return frags.repartition(n_blocks).groupby("tile_id").map_groups(
            fold_both, batch_format="pyarrow")

    # spatial skew decomposition (same as the median): both folds and the
    # diff stats are per-pixel, and the quantized diff sums are plain
    # ADDITIVE over disjoint regions — so the final per-tile row is a
    # Sum-aggregate of sub-tile partials, no canvas reassembly at all.
    from ray.data.aggregate import Max, Sum

    sub = chunk // sub_split
    pieces = _split_to_subtiles(frags, pack, sub)

    def fold_sub(group: pa.Table) -> pa.Table:
        t = fold_both(group, size=sub)
        return t

    sub_rows = pieces.repartition(n_blocks).groupby("sub_key").map_groups(
        fold_sub, batch_format="pyarrow")
    agg = sub_rows.groupby("tile_id").aggregate(
        Max("tx", alias_name="tx"), Max("ty", alias_name="ty"),
        Sum("n_valid_px", alias_name="n_valid_px"),
        Sum("n_diff_px", alias_name="n_diff_px"),
        Sum("abs_diff_sum", alias_name="abs_diff_sum"))

    def cast(t: pa.Table) -> pa.Table:
        return pa.table({
            "tile_id": t.column("tile_id"),
            "tx": t.column("tx").cast(pa.int32()),
            "ty": t.column("ty").cast(pa.int32()),
            "n_valid_px": t.column("n_valid_px").cast(pa.int64()),
            "n_diff_px": t.column("n_diff_px").cast(pa.int64()),
            "abs_diff_sum": t.column("abs_diff_sum").cast(pa.int64()),
        })

    return agg.map_batches(cast, batch_format="pyarrow")


def temporal_trend(temporal_tiles_ds, chunk: int, channels=None):
    """Per-pixel OLS trend over a temporal mosaic's time steps, aggregated
    per spatial tile — the engine analog of the reference's TCTrend
    dataset, whose bands are per-pixel trend statistics over yearly
    composites (``datasets/tctrend.py``).

    Input: tiles from a temporal ingest (tile_id ``"{step}-{tx}-{ty}"``).
    Plan: parse the spatial key map-side, one ``groupby(spatial key)``
    (<= n_steps rows per group), and a fully vectorized per-pixel
    regression inside the group: slope = (n*Stv - St*Sv) / (n*Stt - St^2)
    over the steps where the pixel is valid (needs >= 2). v = the integer
    sum of all channel components. slope_fp = round(slope * 1e6): the
    inputs to the division are exact int64s, float64 division is correctly
    rounded, so the fixed-point result is bit-stable across plans and
    engines.

    Output per spatial tile: n_px_trend (pixels with a defined slope),
    n_px_pos (slope_fp > 0), slope_fp_sum.
    """
    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(
        RGB_CHANNELS)

    def keyed(t: pa.Table) -> pa.Table:
        tids = t.column("tile_id").to_pylist()
        steps = [int(s.split("-", 1)[0]) for s in tids]
        spatial = [s.split("-", 1)[1] for s in tids]
        return pa.table({
            "skey": pa.array(spatial, pa.string()),
            "step": pa.array(steps, pa.int64()),
            "tx": t.column("tx"),
            "ty": t.column("ty"),
            "px_z": t.column("px_z"),
            "mask_z": t.column("mask_z"),
        })

    def trend(group: pa.Table) -> pa.Table:
        n = np.zeros((chunk, chunk), np.int64)
        st = np.zeros((chunk, chunk), np.int64)
        stt = np.zeros((chunk, chunk), np.int64)
        sv = np.zeros((chunk, chunk), np.int64)
        stv = np.zeros((chunk, chunk), np.int64)
        px_v = binary_views(group.column("px_z"))
        mk_v = binary_views(group.column("mask_z"))
        steps = group.column("step").to_numpy()
        for j in range(group.num_rows):
            canvas = pack.from_bytes(zlib.decompress(px_v[j]), chunk, chunk)
            m = np.frombuffer(zlib.decompress(mk_v[j]),
                              np.uint8).reshape(chunk, chunk).astype(bool)
            v = np.zeros((chunk, chunk), np.int64)
            for a in canvas:
                s = a.astype(np.int64)
                v += s.sum(axis=2) if s.ndim == 3 else s
            ti = int(steps[j])
            n += m
            st += np.where(m, ti, 0)
            stt += np.where(m, ti * ti, 0)
            sv += np.where(m, v, 0)
            stv += np.where(m, ti * v, 0)
        den = n * stt - st * st
        ok = (n >= 2) & (den > 0)
        slope = np.zeros((chunk, chunk), np.float64)
        slope[ok] = (n[ok] * stv[ok] - st[ok] * sv[ok]) / den[ok]
        slope_fp = np.round(slope * 1e6).astype(np.int64)
        return pa.table({
            "tile_id": pa.array([group.column("skey")[0].as_py()],
                                pa.string()),
            "tx": pa.array([group.column("tx")[0].as_py()], pa.int32()),
            "ty": pa.array([group.column("ty")[0].as_py()], pa.int32()),
            "n_px_trend": pa.array([int(ok.sum())], pa.int64()),
            "n_px_pos": pa.array([int((slope_fp[ok] > 0).sum())],
                                 pa.int64()),
            "slope_fp_sum": pa.array([int(slope_fp[ok].sum())], pa.int64()),
        })

    return (temporal_tiles_ds
            .select_columns(["tile_id", "tx", "ty", "px_z", "mask_z"])
            .map_batches(keyed, batch_format="pyarrow")
            .groupby("skey").map_groups(trend, batch_format="pyarrow"))


def temporal_coverage(tiles_ds, grid: GridSpec):
    """Per-pixel valid-observation count over the temporal stack — the
    remote-sensing QA classic ("how many cloud-free looks does each pixel
    have"): for every spatial tile, the histogram of per-pixel coverage
    counts across the cube's time steps.

    One keyed groupby on the SPATIAL tile (each group holds at most
    n_steps temporal variants); the per-group kernel sums mask planes and
    bincounts — canvases never decode (masks only), and the shuffle
    carries mask bytes, O(n_steps x tile) per group. Output: one row per
    (tile, coverage) level with its pixel count (coverage 0 = pixels
    invalid at every present step of a tile that exists somewhere).
    """
    import pandas as pd

    n_steps = len(grid.times)
    chunk = grid.chunk

    def key_of(t: pa.Table) -> pa.Table:
        sid = [s.split("-", 1)[1] for s in t.column("tile_id").to_pylist()]
        return pa.table({
            "sp_id": pa.array(sid, pa.string()),
            "mask_z": t.column("mask_z"),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cov = np.zeros((chunk, chunk), np.int64)
        for mz in g["mask_z"]:
            cov += np.frombuffer(zlib.decompress(mz),
                                 np.uint8).reshape(chunk, chunk)
        counts = np.bincount(cov.reshape(-1), minlength=n_steps + 1)
        occ = np.nonzero(counts)[0]
        return pd.DataFrame({
            "tile_id": g["sp_id"].iloc[0],
            "coverage": occ.astype(np.int64),
            "n_px": counts[occ].astype(np.int64),
        })

    return (tiles_ds.select_columns(["tile_id", "mask_z"])
            .map_batches(key_of, batch_format="pyarrow", batch_size=64)
            .groupby("sp_id").map_groups(fold, batch_format="pandas"))
