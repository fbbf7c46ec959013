"""Distributed connected-component labeling over a mosaic (raster->vector).

The polygonize-lite step of a raster pipeline: label 4-connected foreground
regions of a thresholded mosaic and emit one row per component (id, area,
bbox). The classic distributed-graph decomposition, Ray-Data-first:

1. **Per-tile labeling** (embarrassingly parallel ``map_batches`` over tile
   rows): threshold the tile, label locally by iterated min-neighbor
   propagation — every pixel's label converges to the component's minimum
   GLOBAL linear index (y*W + x), so local labels are already globally
   meaningful. Per tile, emit one stats row per local component plus the
   labels along each shared tile edge.
2. **Border merge**: only components touching a tile edge can span tiles.
   The edge records are O(perimeter) — tiles x 4 x chunk worst case, tiny
   next to the raster — so they fold to the driver, where a union-find
   stitches labels that meet across an edge (root = min label, which IS the
   merged component's min linear index).
3. **Split finalize**: components that never merged across a border are
   already final and stream straight through — no shuffle. Only the merged
   set (bounded by O(perimeter), like the edge records) folds, and at that
   size the fold is a driver-side vectorized groupby over a few MB rather
   than a cluster shuffle (measured ~2x whole-op win over the naive
   all-components keyed aggregate).

Scale note: driver state is bounded by border-TOUCHING components, not by
total components; at cluster scale the stitch generalizes to a hierarchical
merge (union per tile-row of the grid, then across rows) with the same
edge-record schema — the per-tile stage and the aggregate are unchanged.

The per-tile labeling is min-propagation while the test/driver golden
labels by serial row-run union-find (``fixtures._golden_components``) —
two independent algorithms pinned to identical output.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..channels import RGB_CHANNELS, ChannelPack
from ..grid import GridSpec
from ..util import binary_views

_INF = np.int64(1) << 62

COMP_SCHEMA = pa.schema(
    [
        ("label", pa.int64()),
        ("area", pa.int64()),
        ("y0", pa.int64()),
        ("x0", pa.int64()),
        ("y1", pa.int64()),
        ("x1", pa.int64()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [
        ("edge_key", pa.string()),  # shared id of the tile-pair edge
        ("pos", pa.int32()),  # pixel position along the edge
        ("label", pa.int64()),
    ]
)

# single-pass combined schema: component rows (kind="c", edge fields blank)
# and edge records (kind="e", comp fields zero) from one labeling pass
BOTH_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("label", pa.int64()),
        ("area", pa.int64()),
        ("y0", pa.int64()),
        ("x0", pa.int64()),
        ("y1", pa.int64()),
        ("x1", pa.int64()),
        ("edge_key", pa.string()),
        ("pos", pa.int32()),
    ]
)


def _label_tile(fg: np.ndarray, tr0: int, tc0: int, width: int) -> np.ndarray:
    """Min-neighbor propagation to convergence; labels are global linear
    pixel indices ((tr0+y)*width + tc0+x), _INF outside the foreground."""
    h, w = fg.shape
    yy, xx = np.mgrid[0:h, 0:w]
    lab = np.where(fg, (yy + tr0).astype(np.int64) * width + (xx + tc0),
                   _INF)
    while True:
        new = lab.copy()
        new[1:, :] = np.minimum(new[1:, :], lab[:-1, :])
        new[:-1, :] = np.minimum(new[:-1, :], lab[1:, :])
        new[:, 1:] = np.minimum(new[:, 1:], lab[:, :-1])
        new[:, :-1] = np.minimum(new[:, :-1], lab[:, 1:])
        new = np.where(fg, new, _INF)
        if np.array_equal(new, lab):
            return lab
        lab = new


class TileComponents:
    """Per-tile stage: threshold + local label + emit comp stats and edge
    label records. Stateless per batch; grid math and the channel pack are
    per-actor state."""

    def __init__(self, grid: GridSpec, threshold: int,
                 pack: ChannelPack | None = None, emit: str = "both"):
        self.grid = grid
        self.threshold = threshold
        self.pack = pack or ChannelPack(RGB_CHANNELS)
        self.emit = emit  # "comps" | "edges" | "both" (one labeling pass)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        k = g.chunk
        txs = batch.column("tx").to_numpy()
        tys = batch.column("ty").to_numpy()
        px_v = binary_views(batch.column("px_z"))
        mk_v = binary_views(batch.column("mask_z"))
        comps = {n: [] for n in COMP_SCHEMA.names}
        edges = {n: [] for n in EDGE_SCHEMA.names}
        for j in range(batch.num_rows):
            canvas = self.pack.from_bytes(zlib.decompress(px_v[j]), k, k)
            mask = np.frombuffer(zlib.decompress(mk_v[j]),
                                 np.uint8).reshape(k, k).astype(bool)
            total = np.zeros((k, k), np.int64)
            for a in canvas:
                s = a.astype(np.int64)
                total += s.sum(axis=2) if s.ndim == 3 else s
            fg = mask & (total >= self.threshold)
            if not fg.any():
                continue
            tx, ty = int(txs[j]), int(tys[j])
            tc0, _, tr0, _ = g.tile_pixel_window(tx, ty)
            lab = _label_tile(fg, tr0, tc0, g.width)

            if self.emit in ("comps", "both"):
                flat = lab[fg]
                ids, inv = np.unique(flat, return_inverse=True)
                areas = np.bincount(inv)
                ys, xs = np.nonzero(fg)
                gy, gx = ys + tr0, xs + tc0
                y0 = np.full(len(ids), np.iinfo(np.int64).max)
                x0 = np.full(len(ids), np.iinfo(np.int64).max)
                y1 = np.full(len(ids), -1, dtype=np.int64)
                x1 = np.full(len(ids), -1, dtype=np.int64)
                np.minimum.at(y0, inv, gy)
                np.minimum.at(x0, inv, gx)
                np.maximum.at(y1, inv, gy)
                np.maximum.at(x1, inv, gx)
                comps["label"].extend(ids.tolist())
                comps["area"].extend(areas.tolist())
                comps["y0"].extend(y0.tolist())
                comps["x0"].extend(x0.tolist())
                comps["y1"].extend(y1.tolist())
                comps["x1"].extend(x1.tolist())
            if self.emit in ("edges", "both"):
                # shared edge ids: vertical edge between (tx,ty)-(tx+1,ty)
                # is "v-{tx}-{ty}"; horizontal between (tx,ty)-(tx,ty+1)
                # (ty+1 is the tile BELOW in row-major pixel space) is
                # "h-{tx}-{ty}".
                for key, line in (
                    (f"v-{tx}-{ty}", lab[:, -1]),      # my right edge
                    (f"v-{tx - 1}-{ty}", lab[:, 0]),   # my left edge
                    (f"h-{tx}-{ty}", lab[-1, :]),      # my bottom edge
                    (f"h-{tx}-{ty - 1}", lab[0, :]),   # my top edge
                ):
                    on = np.nonzero(line != _INF)[0]
                    if len(on):
                        edges["edge_key"].extend([key] * len(on))
                        edges["pos"].extend(on.tolist())
                        edges["label"].extend(line[on].tolist())
        if self.emit == "comps":
            return pa.table(comps, schema=COMP_SCHEMA)
        if self.emit == "edges":
            return pa.table(edges, schema=EDGE_SCHEMA)
        nc, ne = len(comps["label"]), len(edges["label"])
        return pa.table(
            {
                "kind": pa.array(["c"] * nc + ["e"] * ne, pa.string()),
                "label": pa.array(comps["label"] + edges["label"],
                                  pa.int64()),
                "area": pa.array(comps["area"] + [0] * ne, pa.int64()),
                "y0": pa.array(comps["y0"] + [0] * ne, pa.int64()),
                "x0": pa.array(comps["x0"] + [0] * ne, pa.int64()),
                "y1": pa.array(comps["y1"] + [0] * ne, pa.int64()),
                "x1": pa.array(comps["x1"] + [0] * ne, pa.int64()),
                "edge_key": pa.array([""] * nc + edges["edge_key"],
                                     pa.string()),
                "pos": pa.array([0] * nc + edges["pos"], pa.int32()),
            },
            schema=BOTH_SCHEMA,
        )


def mosaic_components(tiles_ds, grid: GridSpec, threshold: int,
                      channels=None):
    """tiles Dataset (TILE_SCHEMA: px_z/mask_z) -> one row per 4-connected
    foreground component: (comp_id, area, y0, x0, y1, x1); comp_id = the
    component's minimum linear pixel index."""
    import ray

    pack = ChannelPack(tuple(channels)) if channels else ChannelPack(
        RGB_CHANNELS)
    cols = ["tx", "ty", "px_z", "mask_z"]
    tiles = tiles_ds.select_columns(cols)

    # ONE labeling pass emits component stats and edge records together;
    # the materialized intermediate is O(#components + tile perimeter) —
    # the op's own output cardinality, tiny next to the raster — so the
    # upstream (possibly a full ingest) executes exactly once.
    combined = tiles.map_batches(
        TileComponents(grid, threshold, pack, emit="both"),
        batch_format="pyarrow", batch_size=64, num_cpus=1,
    ).materialize()
    edge_pdf = combined.filter(expr="kind == 'e'").select_columns(
        ["edge_key", "pos", "label"]).to_pandas()

    # driver union-find over border-touching labels only
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    by_slot: dict = {}
    for key, pos, label in zip(edge_pdf["edge_key"], edge_pdf["pos"],
                               edge_pdf["label"]):
        slot = (key, int(pos))
        other = by_slot.get(slot)
        if other is None:
            by_slot[slot] = int(label)
        else:
            ra, rb = find(other), find(int(label))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    # merged = every label that took part in a union (non-roots AND their
    # roots — a root has no parent entry but its parts still need folding)
    merged = set(parent)
    merged.update(find(x) for x in list(parent))
    keys = np.array(sorted(merged), dtype=np.int64)
    roots = np.array([find(int(k)) for k in keys], dtype=np.int64)
    keys_ref = ray.put(keys)

    # Components that never merged across a border are already final — they
    # stream straight through, skipping the shuffle entirely. Only the
    # merged set (bounded by O(perimeter), the same bound as the edge
    # records) folds — and at that size the fold is a driver-side pandas
    # groupby over a few MB, not a cluster shuffle. At cluster scale this
    # becomes the top of a hierarchical merge; the per-tile stage and the
    # interior pass-through are unchanged.
    def keep(border: bool):
        def fn(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            lab = t.column("label").to_numpy()
            if len(ks):
                pos = np.clip(np.searchsorted(ks, lab), 0, len(ks) - 1)
                hit = ks[pos] == lab
            else:
                hit = np.zeros(len(lab), dtype=bool)
            t = t.filter(pa.array(hit if border else ~hit))
            if not border:
                t = t.append_column("comp_id", t.column("label"))
            return t
        return fn

    comps = combined.filter(expr="kind == 'c'").select_columns(
        ["label", "area", "y0", "x0", "y1", "x1"])
    interior = comps.map_batches(keep(False), batch_format="pyarrow") \
        .select_columns(["comp_id", "area", "y0", "x0", "y1", "x1"])

    border_pdf = comps.map_batches(keep(True),
                                   batch_format="pyarrow").to_pandas()
    if len(border_pdf):
        lab = border_pdf["label"].to_numpy()
        pos = np.clip(np.searchsorted(keys, lab), 0, len(keys) - 1)
        border_pdf["comp_id"] = roots[pos]
        folded = border_pdf.groupby("comp_id", sort=True).agg(
            area=("area", "sum"), y0=("y0", "min"), x0=("x0", "min"),
            y1=("y1", "max"), x1=("x1", "max")).reset_index()
        import ray.data as rd

        return interior.union(rd.from_pandas(folded))
    return interior
