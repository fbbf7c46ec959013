"""Ingest pipeline: images -> decode -> map-side mosaic fold -> cube tiles.

The Ray-Data re-expression of the reference's procedural-download + threaded
write path (``accessor.py:400-443``, ``backends/threaded.py:103-139``).
Default physical plan (``map_side_combine=True``, the scale path):

    read_parquet(images, columns=[...])
      -> map_batches(DecodeFoldPartial, tasks)   # decode + footprint + fold
                                                 #   into per-tile partial
                                                 #   canvases (combiner)
      -> map_batches(tree_combine, tasks)        # merge same-tile partials
      -> repartition(n)                          # bound shuffle block count
      -> groupby(tile_id).map_groups(merge_fold) # one task per tile
      -> tiles parquet + per-tile lineage record # icechunk-commit analog

The shuffle carries per-tile PARTIAL CANVASES (<= one per tile per batch),
never per-fragment pixels — partial-aggregate-before-groupby. Skew from hot
tiles is absorbed map-side by construction. The alternative fragment-explode
plan (``map_side_combine=False``: explode -> salted two-stage shuffle with
``tile_id#salt`` sub-keys) is kept for fragment-level operators and as the
cross-check in tests; both plans produce bit-identical tiles.

Channels: the cube's per-channel dtypes (``CubeSpec.channels`` — the
reference's ``_channels_encoding`` model, ``core/accessor.py:62-64``,
``arcticdem.py:159-172`` float32+bool, ``alphaearth.py:38-46`` Nxfloat32)
flow through the whole path via :class:`raygeo.channels.ChannelPack`: a
canvas is a list of per-channel arrays, fragments and tiles carry one
concatenated buffer (``px`` / ``px_z``), and every fold/merge kernel loops
channels around the same per-pixel winner plane. The canonical RGB cube is
the 1-channel uint8x3 special case and pays no extra cost.

Mosaic semantics (SURVEY §4.4): the reference serializes patch writes in
arrival order with a NaN-merge (keep existing where incoming is NaN,
``core/backend.py:263-272``). This engine makes the fold **deterministic and
associative**: each pixel is owned by the numerically-largest writing patch
index (sorted-by-patch_id last-writer-wins). Cross-partial merges take a
pure-uint16 fast path when patch-number ranges are disjoint (patch-ordered
input) and an exact per-pixel-winner slow path otherwise — see
:func:`merge_packed`. ``mode="max"`` switches the fold to per-pixel max (the
reference's temporal mosaic collapse, ``stac.py:141-143``).

Resume: completed tile ids are read from the lineage ledger once on the
driver and work for those tiles is dropped before the shuffle (reference
``accessor.py:434-436`` anti-join); per-tile lineage records commit with
atomic renames, so re-runs and task retries are idempotent.
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa

from ..channels import RGB_CHANNELS, ChannelPack
from ..codec import decode
from ..fixtures import footprint_of, timestamp_of
from ..toi import snap_nearest
from ..grid import GridSpec
from .. import lineage
from ..util import binary_views, cluster_cpus

FRAGMENT_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("salt_key", pa.string()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("image_id", pa.string()),
        ("patch_no", pa.int64()),  # numeric patch order (LWW rank)
        ("y_off", pa.int32()),  # fragment origin within the tile
        ("x_off", pa.int32()),
        ("fh", pa.int32()),
        ("fw", pa.int32()),
        ("px", pa.binary()),  # concatenated per-channel (fh, fw[, nc]) buffers
    ]
)

TILE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("n_frags", pa.int64()),
        ("n_valid_px", pa.int64()),
        ("pix_sum", pa.int64()),
        # large_binary: a production-size canvas (3600^2 x 64 x float32 ~
        # 3.3 GiB) overflows 32-bit binary offsets (ArrowCapacityError at
        # 2 GiB); large offsets cost nothing at test scale
        ("px_z", pa.large_binary()),  # zlib concat per-channel canvases, invalid=nodata
        ("mask_z", pa.large_binary()),  # zlib uint8 (chunk, chunk) validity
    ]
)



def _clip_fragment(grid, tx, ty, cl, chh, rl, rhh, img_h, img_w):
    """Intersect an image's pixel window with one tile and clamp the source
    slice to the decoded image (non-exact-binary grid resolutions can
    re-derive a window one pixel wider than the image). The ONE definition
    shared by both physical plans — tests require them bit-identical.

    Returns (tr0, tc0, r0, c0, sr0, sr1, sc0, sc1) or None when empty;
    the target slice is rows [r0-tr0, r0-tr0+(sr1-sr0)) etc.
    """
    tc0, tc1, tr0, tr1 = grid.tile_pixel_window(tx, ty)
    c0, c1 = max(cl, tc0), min(chh, tc1)
    r0, r1 = max(rl, tr0), min(rhh, tr1)
    if c1 <= c0 or r1 <= r0:
        return None
    sr0, sc0 = r0 - rl, c0 - cl
    sr1 = min(r1 - rl, img_h)
    sc1 = min(c1 - cl, img_w)
    if sr1 <= sr0 or sc1 <= sc0:
        return None
    return tr0, tc0, r0, c0, sr0, sr1, sc0, sc1


class DecodeExplode:
    """Stateful decode + footprint + fragment-explode stage (actor pool).

    Per-actor state (grid tables, codec setup, channel pack) is built once in
    ``__init__`` — the Ray analog of the reference's per-thread
    download/client state (``backends/threaded.py:35-46``). ``__call__``
    decodes each image, derives its footprint as a pure function of
    ``image_id`` (the engine derivation, NOT the stored golden columns),
    derives the cube's channel values from the decoded RGB, maps the
    footprint onto the chunk grid, and emits one fragment row per covered
    tile.
    """

    def __init__(self, grid: GridSpec, num_salts: int = 4,
                 pack: ChannelPack | None = None):
        self.grid = grid
        self.num_salts = num_salts
        self.pack = pack or ChannelPack(RGB_CHANNELS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        pk = self.pack
        ids = batch.column("image_id").to_pylist()
        bufs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()

        boxes = np.array(
            [footprint_of(i, int(w), int(h), g) for i, w, h in zip(ids, ws, hs)]
        )
        out = {k: [] for k in FRAGMENT_SCHEMA.names}
        if len(ids) == 0:
            return pa.table({k: [] for k in FRAGMENT_SCHEMA.names}, schema=FRAGMENT_SCHEMA)
        idx, txs, tys = g.explode_tiles(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        # pixel windows of each image (exact, clipped)
        cl, chh, rl, rhh = g.pixel_window(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        if g.temporal:
            tids_t = snap_nearest(
                g.time_axis(), np.array([timestamp_of(i) for i in ids])
            )
        else:
            tids_t = None
        decoded: dict[int, list[np.ndarray]] = {}
        for k in range(len(idx)):
            i = int(idx[k])
            if i not in decoded:
                decoded[i] = pk.derive(decode(bufs[i]))
            chans = decoded[i]
            tx, ty = int(txs[k]), int(tys[k])
            clip = _clip_fragment(g, tx, ty, int(cl[i]), int(chh[i]),
                                  int(rl[i]), int(rhh[i]),
                                  chans[0].shape[0], chans[0].shape[1])
            if clip is None:
                continue
            tr0, tc0, r0, c0, sr0, sr1, sc0, sc1 = clip
            r1 = r0 + (sr1 - sr0)
            c1 = c0 + (sc1 - sc0)
            frag = pk.region(chans, np.s_[sr0:sr1], np.s_[sc0:sc1])
            patch_no = int(ids[i].rsplit("-", 1)[1])
            tile_id = (
                f"{tx}-{ty}" if tids_t is None else f"{int(tids_t[i])}-{tx}-{ty}"
            )
            salt = zlib.crc32(ids[i].encode()) % self.num_salts
            out["tile_id"].append(tile_id)
            out["salt_key"].append(f"{tile_id}#{salt}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["image_id"].append(ids[i])
            out["patch_no"].append(patch_no)
            out["y_off"].append(r0 - tr0)
            out["x_off"].append(c0 - tc0)
            out["fh"].append(r1 - r0)
            out["fw"].append(c1 - c0)
            out["px"].append(pk.to_bytes(frag))
        return pa.table(out, schema=FRAGMENT_SCHEMA)


def _fold_group(table: pa.Table, chunk: int, pack: ChannelPack,
                mode: str = "lww") -> tuple[list[np.ndarray], np.ndarray, int]:
    """Fold a fragment group into (canvas channel-list, winner int64 HxW, n).

    Winner = patch_no of the pixel's owner, -1 where unwritten. In ``lww``
    mode fragments are applied in ascending patch_no so within one fold later
    patches overwrite — and the winner array makes the fold associative
    across salt groups. In ``max`` mode each pixel is the per-channel
    elementwise max over all writers and winner = max writing patch_no
    (order-independent), so the same :func:`_merge_partials` max rule
    applies across salt groups.
    """
    canvas = pack.alloc(chunk, chunk)
    winner = np.full((chunk, chunk), -1, dtype=np.int64)
    order = np.argsort(table.column("patch_no").to_numpy(), kind="stable")
    y_off = table.column("y_off").to_numpy()
    x_off = table.column("x_off").to_numpy()
    fh = table.column("fh").to_numpy()
    fw = table.column("fw").to_numpy()
    pno = table.column("patch_no").to_numpy()
    px = binary_views(table.column("px"))
    for j in order:
        h, w = int(fh[j]), int(fw[j])
        y0, x0 = int(y_off[j]), int(x_off[j])
        frag = pack.from_bytes(px[j], h, w)
        ys, xs = np.s_[y0 : y0 + h], np.s_[x0 : x0 + w]
        region_c = pack.region(canvas, ys, xs)
        region_w = winner[ys, xs]
        if mode == "max":
            written = region_w >= 0
            pack.max_where(region_c, frag, written)
            np.maximum(region_w, pno[j], out=region_w)
        else:
            pack.overwrite(region_c, frag)
            region_w[:] = pno[j]
    return canvas, winner, table.num_rows


def _merge_partials(parts: list[tuple[list[np.ndarray], np.ndarray, int]],
                    pack: ChannelPack, mode: str = "lww"):
    """Associative cross-partial merge.

    ``lww``: per-pixel owner = max patch_no (sorted-LWW, §4.4).
    ``max``: per-pixel value = per-channel max over all writers (the
    reference's temporal mosaic collapse, ``stac.py:141-143`` /
    ``gee.py:189-190``); the winner array degenerates to a validity flag.
    """
    canvas, winner, n = parts[0]
    canvas = [c.copy() for c in canvas]
    winner = winner.copy()
    for c2, w2, n2 in parts[1:]:
        if mode == "max":
            both = (winner >= 0) & (w2 >= 0)
            new = (w2 >= 0) & (winner < 0)
            for d, s in zip(canvas, c2):
                d[both] = np.maximum(d[both], s[both])
                d[new] = s[new]
            winner = np.maximum(winner, w2)
        else:
            take = w2 > winner
            pack.assign_where(canvas, c2, take)
            winner[take] = w2[take]
        n += n2
    return canvas, winner, n


PARTIAL_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("n_frags", pa.int64()),
        ("pno_lo", pa.int64()),  # min/max patch_no present — the range-
        ("pno_hi", pa.int64()),  # disjointness test for the fast merge path
        ("canvas_z", pa.large_binary()),  # see TILE_SCHEMA: 2 GiB offsets
        ("winner_z", pa.large_binary()),
    ]
)


# ---- partial wire codecs -------------------------------------------------
# canvas: zlib level 0 (stored) — decoded image pixels are noise-like, so
# compressing them between stages only burns CPU; real compression happens
# once, in the final tile row. winner: a per-pixel patch_no map would be
# 8 B/px — instead store (sorted distinct pnos, uint16 index per pixel),
# zlib-1 (long runs compress well). Falls back to raw int64 when a partial
# sees >= 65535 distinct patches (flag byte 1).


def compress_canvas(canvas: list[np.ndarray]) -> bytes:
    return zlib.compress(
        b"".join(np.ascontiguousarray(c).tobytes() for c in canvas), 0
    )


def decompress_canvas(buf: bytes, chunk: int, pack: ChannelPack) -> list[np.ndarray]:
    return pack.from_bytes(zlib.decompress(buf), chunk, chunk)


def pack_winner(winner: np.ndarray) -> bytes:
    vals, idx = np.unique(winner, return_inverse=True)
    if len(vals) < 0xFFFF:
        payload = (
            b"\x00"
            + np.int32(len(vals)).tobytes()
            + vals.astype(np.int64).tobytes()
            + idx.astype(np.uint16).tobytes()
        )
    else:
        payload = b"\x01" + winner.astype(np.int64).tobytes()
    return zlib.compress(payload, 1)


def pack_winner_indexed(plist: list, widx: np.ndarray) -> bytes:
    """Pack a winner map already kept as (pno list, uint16 index per pixel).

    Same flag-0 wire format as :func:`pack_winner`, but built without the
    per-partial ``np.unique`` sort — the fold maintains the index as it goes.
    Callers keep batch sizes far below 65535 writers per canvas.
    """
    if len(plist) >= 0xFFFF:
        raise ValueError("too many writers for uint16 winner index")
    payload = (
        b"\x00"
        + np.int32(len(plist)).tobytes()
        + np.asarray(plist, dtype=np.int64).tobytes()
        + widx.astype(np.uint16, copy=False).tobytes()
    )
    return zlib.compress(payload, 1)


def unpack_winner(buf: bytes, chunk: int) -> np.ndarray:
    raw = zlib.decompress(buf)
    if raw[0] == 0:
        n = int(np.frombuffer(raw[1:5], np.int32)[0])
        vals = np.frombuffer(raw[5 : 5 + 8 * n], np.int64)
        idx = np.frombuffer(raw[5 + 8 * n :], np.uint16).astype(np.intp)
        return vals[idx].reshape(chunk, chunk)
    return np.frombuffer(raw[1:], np.int64).reshape(chunk, chunk).copy()


def unpack_winner_packed(buf: bytes, chunk: int):
    """Decode to the compact (plist int64, widx uint16) pair WITHOUT the
    int64 per-pixel expansion. Returns (None, winner int64) for the rare
    flag-1 raw form."""
    raw = zlib.decompress(buf)
    if raw[0] == 0:
        n = int(np.frombuffer(raw[1:5], np.int32)[0])
        plist = np.frombuffer(raw[5 : 5 + 8 * n], np.int64)
        widx = np.frombuffer(raw[5 + 8 * n :], np.uint16).reshape(chunk, chunk)
        return plist, widx
    return None, np.frombuffer(raw[1:], np.int64).reshape(chunk, chunk).copy()


def merge_packed(parts: list[dict], chunk: int, pack: ChannelPack,
                 mode: str = "lww") -> dict:
    """Merge packed partials of one tile into one packed partial.

    FAST PATH (the 100 TB common case): when the partials' patch-number
    ranges are pairwise DISJOINT — true whenever the input stream is
    patch-ordered, since each batch then covers a contiguous exclusive pno
    range — sorted-LWW reduces to overlaying partials in ascending range
    order. The merge is then pure narrow-dtype ops: canvas overwrite by
    validity mask + index offsetting, no per-pixel int64 winner expansion
    and no ``np.unique`` (measured ~3x cheaper per partial).

    SLOW PATH (overlapping ranges — unsorted input, or the salted fragment
    plan): expand to per-pixel int64 winners and take the max-pno pixel,
    exactly as SURVEY §4.4 defines. Both paths produce identical results on
    disjoint inputs (tested).

    ``parts``: dicts with keys cz, wz, n, lo, hi. Returns the same shape.
    """
    if len(parts) == 1:
        return parts[0]
    parts = sorted(parts, key=lambda p: (p["lo"], p["hi"]))
    disjoint = all(
        parts[i]["hi"] < parts[i + 1]["lo"] for i in range(len(parts) - 1)
    )
    n_total = sum(p["n"] for p in parts)
    lo = min(p["lo"] for p in parts)
    hi = max(p["hi"] for p in parts)

    if mode == "lww" and disjoint:
        unpacked = [unpack_winner_packed(p["wz"], chunk) for p in parts]
        if all(pl is not None for pl, _ in unpacked) and sum(
            len(pl) for pl, _ in unpacked
        ) < 0xFFFE:
            canvas = None
            for (pl2, w2), p in zip(unpacked, parts):
                c2 = decompress_canvas(p["cz"], chunk, pack)
                valid2 = (pl2 >= 0)[w2]
                if canvas is None:
                    canvas = [c.copy() for c in c2]
                    widx = w2.astype(np.uint16).copy()
                    plist = pl2.astype(np.int64).copy()
                else:
                    off = np.uint16(len(plist))
                    pack.assign_where(canvas, c2, valid2)
                    widx[valid2] = w2[valid2] + off
                    plist = np.concatenate([plist, pl2])
            return {
                "cz": compress_canvas(canvas),
                "wz": pack_winner_indexed(plist.tolist(), widx),
                "n": n_total, "lo": lo, "hi": hi,
            }

    expanded = [
        (
            decompress_canvas(p["cz"], chunk, pack),
            unpack_winner(p["wz"], chunk),
            p["n"],
        )
        for p in parts
    ]
    canvas, winner, _ = _merge_partials(expanded, pack, mode)
    return {
        "cz": compress_canvas(canvas),
        "wz": pack_winner(winner),
        "n": n_total, "lo": lo, "hi": hi,
    }


# per-worker-process cache of resolved broadcast skip sets (keyed by the
# ObjectRef hex): ray.get deserializes a large set on every call, so resolve
# once per process, not once per task
_SKIP_CACHE: dict = {}


class DecodeFoldPartial:
    """Combiner stage: decode + explode + MAP-SIDE partial mosaic fold.

    The scale-defining optimization: instead of shuffling raw fragment pixels
    (O(total decoded bytes) through the object store), each large batch folds
    its fragments into at most one partial canvas per touched tile, and only
    those (compressed) canvases enter the ``groupby(tile_id)`` merge. Because
    the fold is associative (per-pixel winner = max patch_no), this is exactly
    the partial-aggregate-before-groupby pattern — and it also absorbs skew:
    a hot tile contributes <= 1 partial per batch no matter how many fragments
    hit it, so no salting stage is needed on this path.

    Images are applied in ascending patch_no within the batch, preserving the
    deterministic sorted-LWW semantics (SURVEY §4.4).

    Winner tracking is a uint16 *local index* per pixel into the list of
    patch_nos that wrote the canvas (index 0 = unwritten sentinel, pno -1) —
    built incrementally during the fold, so packing a partial is a straight
    serialize with no per-partial ``np.unique`` sort. Wire format matches
    :func:`unpack_winner` flag-0.

    Instances are passed to ``map_batches`` as plain callables (task pool,
    not actor pool): the stage is stateless per batch, and tasks reuse Ray's
    prestarted workers instead of paying a fresh actor-pool ramp per query.
    """

    def __init__(self, grid: GridSpec, skip=(set(), None),
                 mode: str = "lww", pack: ChannelPack | None = None):
        self.grid = grid
        # ``skip`` is a (done, only) tuple OR a ``ray.ObjectRef`` to one
        # (VERDICT r3 #3): a multi-million-tile resume set must travel the
        # object store ONCE as a broadcast, not ride the pickled callable
        # into every task spec. Resolution is lazy (first __call__) and
        # cached per worker process.
        self._skip = skip
        self.mode = mode  # "lww" (§4.4) or "max" (A1 temporal-collapse analog)
        self.pack = pack or ChannelPack(RGB_CHANNELS)

    @property
    def done(self):
        self._resolve_skip()
        return self._done

    @property
    def only(self):
        self._resolve_skip()
        return self._only

    def _resolve_skip(self):
        if not hasattr(self, "_done"):
            skip = self._skip
            if not isinstance(skip, tuple):
                import ray

                key = skip.hex()
                got = _SKIP_CACHE.get(key)
                if got is None:
                    got = _SKIP_CACHE[key] = ray.get(skip)
                skip = got
            self._done, self._only = skip

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._resolve_skip()
        done, only = self._done, self._only  # locals: tile loop is hot
        g = self.grid
        pk = self.pack
        ids = batch.column("image_id").to_pylist()
        if not ids:
            return pa.table({k: [] for k in PARTIAL_SCHEMA.names},
                            schema=PARTIAL_SCHEMA)
        bufs = binary_views(batch.column("bytes"))
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        boxes = np.array(
            [footprint_of(i, int(w), int(h), g) for i, w, h in zip(ids, ws, hs)]
        ).reshape(-1, 4)
        cl, chh, rl, rhh = g.pixel_window(boxes[:, 0], boxes[:, 1],
                                          boxes[:, 2], boxes[:, 3])
        pnos = np.array([int(i.rsplit("-", 1)[1]) for i in ids], dtype=np.int64)
        order = np.argsort(pnos, kind="stable")
        # temporal cube: snap each image's derived acquisition time to the
        # nearest axis step (ingest-side J6, core/backend.py:256-257 analog);
        # tile key becomes "t-tx-ty" (gee.py:62-78 format)
        if g.temporal:
            tids_t = snap_nearest(
                g.time_axis(), np.array([timestamp_of(i) for i in ids])
            )
        else:
            tids_t = None
        # (canvas channel-list, widx uint16 local winner index,
        #  pno list w/ -1 sentinel)
        canvases: dict[tuple, tuple[list[np.ndarray], np.ndarray, list]] = {}
        c = g.chunk
        for i in order:
            i = int(i)
            if int(chh[i]) <= int(cl[i]) or int(rhh[i]) <= int(rl[i]):
                continue
            chans = None
            ti = int(tids_t[i]) if tids_t is not None else None
            tx_lo, tx_hi = int(cl[i]) // c, (int(chh[i]) - 1) // c
            ty_lo, ty_hi = int(rl[i]) // c, (int(rhh[i]) - 1) // c
            for tx in range(tx_lo, tx_hi + 1):
                for ty in range(ty_lo, ty_hi + 1):
                    tid = f"{tx}-{ty}" if ti is None else f"{ti}-{tx}-{ty}"
                    if tid in done or (only is not None and tid not in only):
                        continue
                    tc0_, tc1_, tr0_, tr1_ = g.tile_pixel_window(tx, ty)
                    if (min(int(chh[i]), tc1_) <= max(int(cl[i]), tc0_)
                            or min(int(rhh[i]), tr1_)
                            <= max(int(rl[i]), tr0_)):
                        continue  # cheap reject BEFORE decoding the image
                    if chans is None:
                        chans = pk.derive(decode(bufs[i]))
                    clip = _clip_fragment(
                        g, tx, ty, int(cl[i]), int(chh[i]), int(rl[i]),
                        int(rhh[i]), chans[0].shape[0], chans[0].shape[1])
                    if clip is None:
                        continue
                    tr0, tc0, r0, c0, sr0, sr1, sc0, sc1 = clip
                    r1 = r0 + (sr1 - sr0)
                    c1 = c0 + (sc1 - sc0)
                    key = (ti, tx, ty)
                    if key not in canvases:
                        canvases[key] = (
                            pk.alloc(c, c),
                            np.zeros((c, c), dtype=np.uint16),
                            [-1],
                        )
                    canvas, widx, plist = canvases[key]
                    frag = pk.region(chans, np.s_[sr0:sr1], np.s_[sc0:sc1])
                    ys = np.s_[r0 - tr0 : r1 - tr0]
                    xs = np.s_[c0 - tc0 : c1 - tc0]
                    region_c = pk.region(canvas, ys, xs)
                    region_w = widx[ys, xs]
                    if self.mode == "max":
                        written = region_w > 0
                        pk.max_where(region_c, frag, written)
                        region_w[:] = 1  # winner slot 1 = validity flag
                    else:
                        pk.overwrite(region_c, frag)
                        region_w[:] = len(plist)
                    plist.append(int(pnos[i]))
        out = {k: [] for k in PARTIAL_SCHEMA.names}
        for (ti, tx, ty), (canvas, widx, plist) in canvases.items():
            out["tile_id"].append(f"{tx}-{ty}" if ti is None else f"{ti}-{tx}-{ty}")
            out["tx"].append(tx)
            out["ty"].append(ty)
            out["n_frags"].append(len(plist) - 1)
            out["pno_lo"].append(min(plist[1:]))
            out["pno_hi"].append(max(plist[1:]))
            out["canvas_z"].append(compress_canvas(canvas))
            out["winner_z"].append(pack_winner_indexed(plist, widx))
        return pa.table(out, schema=PARTIAL_SCHEMA)


def make_tree_combine(chunk: int, mode: str = "lww",
                      pack: ChannelPack | None = None):
    """Block-local combine of partial canvases by tile — NO shuffle.

    Between the map-side fold and the global ``groupby(tile_id)`` merge,
    coalesce several partial blocks per task and merge same-tile partials
    (the fold is associative). Cuts the sort-shuffle input ~8x for the cost
    of one cheap streaming pass — the classic combiner-tree.
    """
    pack = pack or ChannelPack(RGB_CHANNELS)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        by_tile: dict[str, list[int]] = {}
        tids = t.column("tile_id").to_pylist()
        for j, tid in enumerate(tids):
            by_tile.setdefault(tid, []).append(j)
        if all(len(v) == 1 for v in by_tile.values()):
            return t
        out = {k: [] for k in PARTIAL_SCHEMA.names}
        cz = binary_views(t.column("canvas_z"))
        wz = binary_views(t.column("winner_z"))
        nf = t.column("n_frags")
        lo = t.column("pno_lo")
        hi = t.column("pno_hi")
        txc = t.column("tx")
        tyc = t.column("ty")
        for tid, rows in by_tile.items():
            merged = merge_packed(
                [
                    {"cz": cz[j], "wz": wz[j],
                     "n": int(nf[j].as_py()), "lo": int(lo[j].as_py()),
                     "hi": int(hi[j].as_py())}
                    for j in rows
                ],
                chunk, pack, mode,
            )
            out["tile_id"].append(tid)
            out["tx"].append(txc[rows[0]].as_py())
            out["ty"].append(tyc[rows[0]].as_py())
            out["n_frags"].append(merged["n"])
            out["pno_lo"].append(merged["lo"])
            out["pno_hi"].append(merged["hi"])
            out["canvas_z"].append(merged["cz"])
            out["winner_z"].append(merged["wz"])
        return pa.table(out, schema=PARTIAL_SCHEMA)

    return combine


def make_partial_fold(chunk: int, mode: str = "lww",
                      pack: ChannelPack | None = None):
    pack = pack or ChannelPack(RGB_CHANNELS)

    def partial_fold(group: pa.Table) -> pa.Table:
        canvas, winner, n = _fold_group(group, chunk, pack, mode)
        pnos = group.column("patch_no").to_numpy()
        return pa.table(
            {
                "tile_id": [group.column("tile_id")[0].as_py()],
                "tx": [group.column("tx")[0].as_py()],
                "ty": [group.column("ty")[0].as_py()],
                "n_frags": [n],
                "pno_lo": [int(pnos.min())],
                "pno_hi": [int(pnos.max())],
                "canvas_z": [compress_canvas(canvas)],
                "winner_z": [pack_winner(winner)],
            },
            schema=PARTIAL_SCHEMA,
        )

    return partial_fold


def make_merge_fold(chunk: int, cube_path: str | None, mode: str = "lww",
                    pack: ChannelPack | None = None):
    pack = pack or ChannelPack(RGB_CHANNELS)

    def merge_fold(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        cz_v = binary_views(group.column("canvas_z"))
        wz_v = binary_views(group.column("winner_z"))
        merged = merge_packed(
            [
                {
                    "cz": cz_v[j],
                    "wz": wz_v[j],
                    "n": int(group.column("n_frags")[j].as_py()),
                    "lo": int(group.column("pno_lo")[j].as_py()),
                    "hi": int(group.column("pno_hi")[j].as_py()),
                }
                for j in range(group.num_rows)
            ],
            chunk, pack, mode,
        )
        n = merged["n"]
        canvas = decompress_canvas(merged["cz"], chunk, pack)
        plist, widx = unpack_winner_packed(merged["wz"], chunk)
        if plist is None:  # rare raw-int64 form
            valid = widx >= 0
        else:
            valid = (plist >= 0)[widx]
        canvas = pack.fill_invalid(canvas, valid)
        tile_id = group.column("tile_id")[0].as_py()
        px_z = zlib.compress(
            b"".join(np.ascontiguousarray(c).tobytes() for c in canvas), 1
        )
        mask_z = zlib.compress(valid.astype(np.uint8).tobytes(), 1)
        row = {
            "tile_id": [tile_id],
            "tx": [group.column("tx")[0].as_py()],
            "ty": [group.column("ty")[0].as_py()],
            "n_frags": [n],
            "n_valid_px": [int(valid.sum())],
            "pix_sum": [pack.pix_sum(canvas, valid)],
            "px_z": [px_z],
            "mask_z": [mask_z],
        }
        out = pa.table(row, schema=TILE_SCHEMA)
        if cube_path is not None:
            # per-partition commit (icechunk-commit analog): tile DATA first
            # (atomic tmp+rename parquet, one file per tile), THEN the
            # lineage record — a crash between the two re-runs the tile;
            # the reverse order would leave a committed record without data.
            # Both writes are idempotent, so Ray task retries are safe.
            import os
            import uuid

            import pyarrow.parquet as pq

            from ..cube import TILES_DIR

            tdir = os.path.join(cube_path, TILES_DIR)
            os.makedirs(tdir, exist_ok=True)
            tmp = os.path.join(tdir, f".tmp-{tile_id}-{uuid.uuid4().hex}")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(tdir, f"part-{tile_id}.parquet"))
            lineage.record_partition(
                cube_path,
                tile_id,
                # patch-granularity dedup is deliberately NOT ledger-based:
                # recording every contributing patch id would make the hot
                # tile's record O(patches). Resume anti-joins at TILE
                # granularity (loaded_partitions); in-flight patch dedup is
                # the per-actor LRU in sources.py.
                [],
                row_count=1,
                n_bytes=len(px_z) + len(mask_z),
                wall_ms=(time.monotonic() - t0) * 1e3,
            )
        return out

    return merge_fold


def fragments_dataset(
    images_ds,
    grid: GridSpec,
    num_salts: int = 4,
    concurrency=None,
    batch_size: int = 64,
    pack: ChannelPack | None = None,
):
    """images Dataset -> fragments Dataset (decode+explode task pool).

    ``concurrency`` bounds the stage's parallelism when given (an
    ``(min, max)`` tuple or int, passed straight to ``map_batches``);
    None lets the streaming executor size the task pool.
    """
    kw = {} if concurrency is None else {"concurrency": concurrency}
    return images_ds.map_batches(
        DecodeExplode(grid, num_salts, pack),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        **kw,
    )


def ingest(
    images_ds,
    grid: GridSpec,
    cube_path: str | None = None,
    num_salts: int = 4,
    skip_tiles: set[str] | None = None,
    only_tiles: set[str] | None = None,
    concurrency=None,
    batch_size: int = 64,
    map_side_combine: bool = True,
    combine_batch_size: int = 2048,
    mode: str = "lww",
    channels=None,
):
    """Full ingest pipeline; returns the tiles Dataset (lazy).

    ``channels``: the cube's ``CubeSpec.channels`` tuple (defaults to the
    canonical RGB triple). Every canvas/fragment/tile buffer in the plan is
    laid out per that tuple's dtypes; pixel values for non-RGB channels are
    derived deterministically from the decoded source RGB (see
    :mod:`raygeo.channels`).

    ``skip_tiles`` (or the cube's lineage ledger when ``cube_path`` is set)
    anti-joins completed partitions out before the shuffle; ``only_tiles``
    restricts the shuffle to an ROI's tile set (the load() subplan).

    Two physically different but semantically identical plans:
    - ``map_side_combine=True`` (default, the scale path): decode + fold into
      per-tile partial canvases inside large batches, shuffle only canvases,
      one ``groupby(tile_id)`` merge. ~4-10x less shuffle volume; skew
      absorbed map-side.
    - ``map_side_combine=False``: explicit fragment explode -> salted
      two-stage shuffle (kept for the fragment-level operators and as the
      cross-check in tests — both plans must produce identical tiles).
    """
    import ray

    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(RGB_CHANNELS)
    done = set(skip_tiles or ())
    if cube_path is not None:
        done |= lineage.loaded_partitions(cube_path)

    if map_side_combine:
        # task pool, not actor pool: the stage is stateless per batch, and
        # tasks reuse Ray's prestarted workers (no per-query pool ramp-up).
        # The fold's live set is one canvas per TOUCHED tile (not per image),
        # so the worst-case heap is (px+2) B/px x touched tiles; cap the
        # batch for very large chunks so a task can't accumulate unbounded
        # canvases.
        per_partial = (pack.nbytes_px + 2) * grid.chunk * grid.chunk
        # floor 8 (not 64): at production-size chunks (3600^2 RGB ~ 65 MB
        # per canvas) a 64-image floor would hold ~4 GB of canvases in one
        # task — the byte budget must win over the batching floor
        fold_cap = max(8, (1 << 30) // per_partial)
        conc_kw = {} if concurrency is None else {"concurrency": concurrency}
        # broadcast the resume/ROI tile sets (VERDICT r3 #3, mirroring the
        # fragment plan below): ray.put once, workers ray.get from the
        # object store — the pickled callable in every task spec stays
        # O(1) even at a multi-million-tile resume
        skip = (done, only_tiles)
        if done or only_tiles is not None:
            skip = ray.put(skip)
        partials = images_ds.map_batches(
            DecodeFoldPartial(grid, skip, mode=mode, pack=pack),
            batch_format="pyarrow",
            batch_size=int(min(combine_batch_size, fold_cap)),
            num_cpus=1,
            **conc_kw,
        )
        # combiner tree: block-local merge of same-tile partials before the
        # global shuffle (~(batch/num_tiles)x less sort input). num_cpus=0.5
        # deliberately differs from the fold stage so Ray Data does NOT fuse
        # them — a fused combine never sees more than one fold output per
        # call and silently becomes a no-op, sending every partial into the
        # sort (measured 4x wall blowup at 400k images).
        # Memory-aware batch: a combine task holds ~(px+2) B/px per in-flight
        # partial (canvas channels + widx uint16); cap the batch so one task
        # stays under ~512 MB — at the reference's 3600^2 production chunk
        # that is ~8 RGB partials per task, at the 128^2 test chunk ~4096.
        mem_cap = max(4, (512 << 20) // per_partial)
        partials = partials.map_batches(
            make_tree_combine(grid.chunk, mode, pack),
            batch_format="pyarrow",
            batch_size=int(min(2 * combine_batch_size, mem_cap)),
            num_cpus=0.5,
        )
        # bound the sort-shuffle block count: the sort-based groupby slices
        # every input block into num_partitions ranges, so cost grows with
        # blocks x partitions. A handful of fat blocks keeps the all-to-all
        # linear in bytes while leaving one merge task per block.
        n_merge = max(8, min(64, cluster_cpus()))
        partials = partials.repartition(n_merge)
    else:
        frags = fragments_dataset(images_ds, grid, num_salts, concurrency,
                                  batch_size, pack)
        if done or only_tiles is not None:
            filt_ref = ray.put((done, only_tiles))

            def drop_done(t: pa.Table) -> pa.Table:
                d, only = ray.get(filt_ref)
                keep = [
                    tid not in d and (only is None or tid in only)
                    for tid in t.column("tile_id").to_pylist()
                ]
                return t.filter(pa.array(keep))

            frags = frags.map_batches(drop_done, batch_format="pyarrow")
        # keep shuffle block count bounded: many tiny fragment blocks make the
        # sort-based groupby quadratic in block count
        partials = frags.repartition(64).groupby("salt_key").map_groups(
            make_partial_fold(grid.chunk, mode, pack), batch_format="pyarrow"
        )

    tiles = partials.groupby("tile_id").map_groups(
        make_merge_fold(grid.chunk, cube_path, mode, pack), batch_format="pyarrow"
    )
    return tiles


def _tile_epoch_state(stored_path: str):
    """Read one tile's canonical file + CAS state: (table|None, epoch,
    applied-token list). Epoch/token ride the parquet schema metadata so
    they share the data file's atomic rename."""
    import pyarrow.parquet as pq

    if not os.path.exists(stored_path):
        return None, 0, []
    try:
        st = pq.read_table(stored_path)
    except FileNotFoundError:  # raced a concurrent CAS install
        return None, 0, []
    meta = st.schema.metadata or {}
    epoch = int(meta.get(b"raygeo_epoch", b"0"))
    tokens = [t for t in meta.get(b"raygeo_update_tokens", b"").split(b",") if t]
    legacy = meta.get(b"raygeo_update_token")
    if legacy:
        tokens.append(legacy)
    return st, epoch, tokens


def _cas_files(tdir: str, tile_id: str) -> list[tuple[int, str]]:
    prefix = f".cas-{tile_id}.v"
    out = []
    for n in os.listdir(tdir):
        if n.startswith(prefix) and n.endswith(".parquet"):
            try:
                out.append((int(n[len(prefix):-len(".parquet")]),
                            os.path.join(tdir, n)))
            except ValueError:
                continue
    return out


def _heal_canonical(tdir: str, tile_id: str) -> None:
    """Install the highest claimed CAS epoch onto the canonical tile file.

    Idempotent and safe to run from any process at any time: every install
    is a hard link of an already-committed epoch file followed by an atomic
    rename, and the loop re-checks until the canonical epoch catches up —
    so a crashed winner's claim is completed by the next writer, and a
    transiently stomped canonical (two healers racing) self-heals before
    either returns."""
    import uuid

    import pyarrow.parquet as pq

    canonical = os.path.join(tdir, f"part-{tile_id}.parquet")
    while True:
        claims = _cas_files(tdir, tile_id)
        if not claims:
            return
        mx, mxp = max(claims)
        try:
            cur = int((pq.read_schema(canonical).metadata or {})
                      .get(b"raygeo_epoch", b"0"))
        except FileNotFoundError:
            cur = -1
        if cur >= mx:
            return
        tmp = os.path.join(tdir, f".heal-{tile_id}-{uuid.uuid4().hex}")
        try:
            os.link(mxp, tmp)
        except FileNotFoundError:
            continue  # raced gc_update_versions; re-list
        os.replace(tmp, canonical)


def _preserve_epoch0(tdir: str, tile_id: str, st) -> None:
    """Retain the pre-update (epoch 0) tile content as ``.cas-...v0`` so
    :func:`raygeo.engine.load` can resolve reads at epoch 0 (VERDICT r4
    #4 — the reference pins icechunk snapshots, ``core/accessor.py:284-
    293``). Idempotent and race-safe: the content of epoch 0 is
    deterministic (the initial ingest output), so whichever updater's
    link lands first wins with identical bytes."""
    import uuid

    import pyarrow.parquet as pq

    cas0 = os.path.join(tdir, f".cas-{tile_id}.v0.parquet")
    if os.path.exists(cas0):
        return
    tmp = os.path.join(tdir, f".tmp0-{tile_id}-{uuid.uuid4().hex}")
    pq.write_table(
        st.replace_schema_metadata({b"raygeo_epoch": b"0"}), tmp)
    try:
        os.link(tmp, cas0)
    except FileExistsError:
        pass
    os.remove(tmp)


def gc_update_versions(cube_path: str,
                       retain_snapshots_from: int | None = None) -> int:
    """Delete claimed-epoch CAS files left by :func:`ingest_update`.

    Each applied update retains its epoch file as the CAS token (a hard
    link — zero extra space while it is the current version, one old tile
    version otherwise); those files are also the version history that
    snapshot-pinned loads (``engine.load(..., epoch=id)``) resolve. Run
    this ONLY when no updater job is active (the compaction contract,
    like :func:`raygeo.lineage.compact`): deleting a claimed epoch while
    a writer is mid-conflict would let a stale claim be re-won.

    ``retain_snapshots_from``: keep every (tile, version) referenced by a
    snapshot manifest with id >= the floor (the time-travel retention
    window — those snapshots stay fully readable; older ones raise with
    guidance). ``None`` (default) reclaims every non-canonical version,
    disabling time travel for past snapshots (the LATEST snapshot of a
    quiesced cube always stays readable: its versions are the canonical
    files). Returns the number of files removed."""
    import json

    from ..cube import TILES_DIR

    tdir = os.path.join(cube_path, TILES_DIR)
    if not os.path.isdir(tdir):
        return 0
    keep: set[tuple[str, int]] = set()
    if retain_snapshots_from is not None:
        sdir = os.path.join(cube_path, "snapshots")
        if os.path.isdir(sdir):
            for name in os.listdir(sdir):
                if not (name.startswith("snap-") and name.endswith(".json")):
                    continue
                if int(name[len("snap-"):-len(".json")]) \
                        < retain_snapshots_from:
                    continue
                with open(os.path.join(sdir, name)) as f:
                    keep.update((tid, int(e))
                                for tid, e in json.load(f).items())
    n = 0
    for name in os.listdir(tdir):
        if name.startswith(".cas-") and name.endswith(".parquet"):
            if keep:
                stem = name[len(".cas-"):-len(".parquet")]
                tid, _, e = stem.rpartition(".v")
                try:
                    if (tid, int(e)) in keep:
                        continue
                except ValueError:
                    pass
            try:
                os.remove(os.path.join(tdir, name))
                n += 1
            except FileNotFoundError:
                pass
    return n


def ingest_update(
    images_ds,
    grid: GridSpec,
    cube_path: str,
    mode: str = "lww",
    channels=None,
    max_conflict_retries: int = 100,
    **ingest_kw,
):
    """Incremental ingest: fold a NEW batch of patches into an EXISTING
    cube — the reference's actual steady-state loop (procedural_download
    merging fresh patches into committed chunks, ``backends/threaded.py:
    103-139`` + the K4 NaN-border merge ``core/backend.py:263-272``).

    Semantics: the incoming batch is the later arrival — where an incoming
    pixel is valid it overwrites the stored tile (``mode="lww"``; the
    reference's arrival-order LWW with NaN-merge keeping stored data under
    incoming nodata borders), or folds per-pixel max (``mode="max"``).
    With incoming patch numbers all AFTER the stored ones this is
    bit-identical to a one-shot batch ingest of the union (the sorted-LWW
    refinement; cross-plan equality test in tests/test_ingest.py).

    Concurrency contract: WITHIN a job each tile is updated by exactly one
    task (the new batch's groupby(tile_id) merge emits one row per tile).
    ACROSS jobs, concurrent updaters are safe: each tile commit is an
    optimistic-concurrency CAS on a per-tile epoch (the icechunk
    conflict-retry analog, reference ``backends/threaded.py:85-99`` +
    ``core/accessor.py:403-407``). A writer reads the stored tile at epoch
    E, merges, and claims epoch E+1 by ``os.link``-ing its result to
    ``.cas-{tile}.v{E+1}.parquet`` — link EEXIST means another job won that
    epoch; the loser re-reads the (now newer) canonical tile and retries,
    bounded at ``max_conflict_retries`` (default 100, mirroring the
    reference's retry budget). A winner that crashes between claiming the
    epoch and installing the canonical file is healed by any later writer
    (``_heal_canonical`` re-links the highest claimed epoch onto the
    canonical name), so the protocol is lock-free and crash-safe with no
    timeouts. Claimed-epoch files accumulate one hard link per applied
    update; reclaim them with :func:`gc_update_versions` when no updater
    is running. Inter-job ordering is arrival order at the CAS (for
    ``mode="max"`` the fold is commutative, so any interleaving yields the
    batch-ingest golden bytes; for ``mode="lww"`` overlapping *pixels*
    from concurrent jobs resolve in CAS arrival order, as the reference's
    arrival-order LWW does across its retried commits).

    Plan: the new batch runs the normal fold/combine/shuffle pipeline with
    NO ledger anti-join (committed tiles must accept updates), producing
    one merged incoming canvas per touched tile; a final per-tile stage
    reads that tile's stored parquet (the cube layout is one file per
    tile — a point read, never a scan), merges, and commits data-then-
    record exactly like the batch sink. Untouched tiles never move.
    Idempotent: re-applying the same batch reproduces the same bytes.
    Returns the updated tiles Dataset (touched tiles only).
    """
    import os
    import uuid

    import pyarrow.parquet as pq

    from ..cube import TILES_DIR

    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(RGB_CHANNELS)
    chunk = grid.chunk
    new_tiles = ingest(images_ds, grid, cube_path=None, mode=mode,
                       channels=channels, **ingest_kw)
    tdir = os.path.join(cube_path, TILES_DIR)

    def apply_update(t: pa.Table) -> pa.Table:
        import hashlib

        os.makedirs(tdir, exist_ok=True)
        out_rows = []
        px_v = binary_views(t.column("px_z"))
        mz_v = binary_views(t.column("mask_z"))
        for j in range(t.num_rows):
            t0 = time.monotonic()  # per tile: the ledger's wall_ms is
            # per-partition, not cumulative-across-the-batch
            tile_id = t.column("tile_id")[j].as_py()
            new_canvas = pack.from_bytes(zlib.decompress(px_v[j]),
                                         chunk, chunk)
            new_mask = np.frombuffer(
                zlib.decompress(mz_v[j]), np.uint8
            ).reshape(chunk, chunk).astype(bool)
            # idempotence token: the incoming merged canvas is a pure
            # function of the update batch, so its content hash identifies
            # the update. It rides the tile file's SCHEMA METADATA — the
            # same atomic rename as the data — so a Ray task retry (or a
            # second consumption of the returned lazy dataset) that finds
            # its own token already applied skips the read-modify-write
            # instead of double-counting n_frags. The last 64 applied
            # tokens are kept (not just the latest) so a retry still
            # recognizes its own commit after other jobs' updates landed
            # in between. (Two genuinely distinct updates with
            # bit-identical incoming canvases coalesce — the merged values
            # are unchanged by construction; only n_frags would differ,
            # documented.)
            token = hashlib.md5(
                bytes(px_v[j]) + bytes(mz_v[j]) + mode.encode()
            ).hexdigest().encode()
            stored_path = os.path.join(tdir, f"part-{tile_id}.parquet")
            for _attempt in range(max_conflict_retries):
                st, epoch, tokens = _tile_epoch_state(stored_path)
                if token in tokens:
                    out_rows.append(
                        st.replace_schema_metadata(None).select(
                            TILE_SCHEMA.names).cast(TILE_SCHEMA))
                    break
                n_frags = int(t.column("n_frags")[j].as_py())
                if st is not None and epoch == 0:
                    # first update of this tile: retain epoch 0 for
                    # read-at-epoch before the canonical is replaced
                    _preserve_epoch0(tdir, tile_id, st)
                if st is not None:
                    # writable copies: from_bytes returns read-only buffer
                    # views and the merge mutates in place
                    canvas = [np.array(c) for c in pack.from_bytes(
                        zlib.decompress(st.column("px_z")[0].as_py()),
                        chunk, chunk)]
                    mask = np.frombuffer(
                        zlib.decompress(st.column("mask_z")[0].as_py()),
                        np.uint8).reshape(chunk, chunk).astype(bool)
                    n_frags += int(st.column("n_frags")[0].as_py())
                    if mode == "max":
                        # NOT pack.max_where: its else-branch copies src
                        # onto every non-"both" pixel, clobbering
                        # stored-only px
                        both = new_mask & mask
                        pack.assign_where(canvas, new_canvas,
                                          new_mask & ~mask)
                        for d, s, nc in zip(canvas, new_canvas, pack.ncomps):
                            w = both[..., None] if nc > 1 else both
                            np.maximum(d, s, out=d, where=w)
                    else:  # incoming batch is the later arrival: it wins
                        pack.assign_where(canvas, new_canvas, new_mask)
                    mask = mask | new_mask
                else:
                    canvas = [np.array(c) for c in new_canvas]
                    mask = new_mask.copy()
                canvas = pack.fill_invalid(canvas, mask)
                px_z = zlib.compress(
                    b"".join(np.ascontiguousarray(c).tobytes()
                             for c in canvas), 1)
                mask_z = zlib.compress(mask.astype(np.uint8).tobytes(), 1)
                row = pa.table({
                    "tile_id": [tile_id],
                    "tx": [t.column("tx")[j].as_py()],
                    "ty": [t.column("ty")[j].as_py()],
                    "n_frags": [n_frags],
                    "n_valid_px": [int(mask.sum())],
                    "pix_sum": [pack.pix_sum(canvas, mask)],
                    "px_z": [px_z],
                    "mask_z": [mask_z],
                }, schema=TILE_SCHEMA)
                # optimistic-concurrency commit (see the concurrency
                # contract in the docstring): claim epoch+1 with a hard
                # link — EEXIST means another job won; re-read and retry.
                # birth epoch: lets read-at-epoch distinguish "tile did
                # not exist yet" (silently absent) from "version gc'd"
                # (error) — tiles created BY an update are born at their
                # first claimed epoch; ingest-created tiles at 0.
                if st is None:
                    birth = epoch + 1
                else:
                    birth = int((st.schema.metadata or {})
                                .get(b"raygeo_birth_epoch", b"0"))
                meta = {
                    b"raygeo_epoch": str(epoch + 1).encode(),
                    b"raygeo_birth_epoch": str(birth).encode(),
                    b"raygeo_update_tokens":
                        b",".join((tokens + [token])[-64:]),
                }
                tmp = os.path.join(tdir,
                                   f".tmp-{tile_id}-{uuid.uuid4().hex}")
                pq.write_table(row.replace_schema_metadata(meta), tmp)
                cas = os.path.join(tdir,
                                   f".cas-{tile_id}.v{epoch + 1}.parquet")
                try:
                    os.link(tmp, cas)
                except FileExistsError:
                    os.remove(tmp)
                    # complete a possibly-crashed winner's install, then
                    # merge against the fresh canonical
                    _heal_canonical(tdir, tile_id)
                    continue
                os.replace(tmp, stored_path)
                # heal any higher epoch another healer installed while we
                # were between claim and install (transient-stomp window)
                _heal_canonical(tdir, tile_id)
                lineage.record_partition(
                    cube_path, tile_id, [], row_count=1,
                    n_bytes=len(px_z) + len(mask_z),
                    wall_ms=(time.monotonic() - t0) * 1e3,
                )
                out_rows.append(row)
                break
            else:
                raise RuntimeError(
                    f"ingest_update: CAS conflict retries exhausted "
                    f"({max_conflict_retries}) for tile {tile_id} — "
                    f"another updater job is persistently winning; raise "
                    f"max_conflict_retries or serialize the jobs")
        if not out_rows:
            return pa.table({k: [] for k in TILE_SCHEMA.names},
                            schema=TILE_SCHEMA)
        return pa.concat_tables(out_rows)

    return new_tiles.map_batches(apply_update, batch_format="pyarrow",
                                 batch_size=16)
