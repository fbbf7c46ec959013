"""Spatial joins: ROI x images, ROI x tile-grid, with antimeridian handling.

Re-expresses the reference's sjoin paths:

- J1 (``accessors/gee.py:101-112``): ROI x chunk grid is ANALYTIC — the grid
  is a pure function, so covered tiles come from inverse-affine floor/ceil,
  no shuffle, no data movement.
- J2 (``datasets/arcticdem.py:217-233``): ROI x feature-footprint join is a
  **broadcast small-side join**: the ROI table is ``ray.put`` once and every
  ``map_batches`` task does a vectorized bbox prefilter + exact
  polygon/winding-number predicate against its Arrow batch. No all-to-all
  exchange — at 100 TB only the (small) ROI table is replicated.
- Antimeridian (``accessors/gee.py:211-215``): wrapping ROIs are split into
  in-range boxes before the predicate, so the seam never produces a wrapped
  bbox test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures import footprint_of
from ..geom import (
    polygon_intersects_boxes,
    project_box_bbox,
    reproject_ring,
    split_antimeridian_box,
)
from ..grid import GridSpec, tile_id_strings


def normalize_rois(roi_table: pa.Table, grid: GridSpec | None = None) -> list[dict]:
    """Driver-side ROI prep: CRS-normalize + antimeridian handling.

    ROIs are always given in lon/lat (EPSG:4326), the reference's query
    convention (``accessor.py:331-358``). When ``grid`` names a projected
    CRS, each ROI is reprojected into the cube frame before tiling (M1,
    ``accessor.py:372-373``; ArcticDEM intersects in EPSG:3413,
    ``arcticdem.py:216-231``): boxes via the densified-edge bbox kernel
    (antimeridian-continuous, no split), rings vertex-wise. On lon/lat
    grids, wrapping boxes split into in-range boxes as before.

    Returns a list of dicts: {roi_id, kind,
    boxes: [(x_min, y_min, x_max, y_max)] in GRID units,
    ring: (M,2) ndarray in grid units | None}.
    """
    out = []
    has_ring = "ring" in roi_table.schema.names
    projected = grid is not None and grid.crs.upper() not in ("EPSG:4326", "CRS:84")
    for i in range(roi_table.num_rows):
        roi_id = roi_table.column("roi_id")[i].as_py()
        kind = (
            roi_table.column("kind")[i].as_py()
            if "kind" in roi_table.schema.names
            else "box"
        )
        lon_min = roi_table.column("lon_min")[i].as_py()
        lat_min = roi_table.column("lat_min")[i].as_py()
        lon_max = roi_table.column("lon_max")[i].as_py()
        lat_max = roi_table.column("lat_max")[i].as_py()
        if projected:
            boxes = [project_box_bbox(grid.crs, lon_min, lat_min,
                                      lon_max, lat_max)]
        else:
            boxes = split_antimeridian_box(lon_min, lat_min, lon_max, lat_max)
        ring = None
        if has_ring and kind == "concave":
            ring = np.array(roi_table.column("ring")[i].as_py(), dtype=np.float64)
            if projected:
                ring = reproject_ring(ring, grid.crs)
        out.append({"roi_id": roi_id, "kind": kind, "boxes": boxes, "ring": ring})
    return out


def roi_tiles(rois: list[dict], grid: GridSpec) -> pa.Table:
    """J1: covered (roi_id, tile_id, tx, ty) via the analytic grid kernel."""
    roi_ids, txs, tys = [], [], []
    for roi in rois:
        for b in roi["boxes"]:
            _, tx, ty = grid.explode_tiles(
                np.array([b[0]]), np.array([b[1]]), np.array([b[2]]), np.array([b[3]])
            )
            roi_ids.extend([roi["roi_id"]] * len(tx))
            txs.extend(tx.tolist())
            tys.extend(ty.tolist())
    tx_arr = np.array(txs, dtype=np.int64)
    ty_arr = np.array(tys, dtype=np.int64)
    tids = tile_id_strings(tx_arr, ty_arr) if len(tx_arr) else np.array([], dtype=str)
    return pa.table(
        {
            "roi_id": pa.array(roi_ids, pa.string()),
            "tile_id": pa.array(tids.tolist(), pa.string()),
            "tx": pa.array(tx_arr, pa.int32()),
            "ty": pa.array(ty_arr, pa.int32()),
        }
    )


class ImageTiles:
    """M3/J1 kernel as a stateless batch op: image -> covered tile rows.

    The partitioner-key computation (``core/backend.py:241-261`` analog):
    footprint from image_id (pure function), then the analytic grid explode.
    """

    def __init__(self, grid: GridSpec):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        ids = batch.column("image_id").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        boxes = np.array(
            [footprint_of(i, int(w), int(h), g) for i, w, h in zip(ids, ws, hs)]
        ).reshape(-1, 4)
        idx, tx, ty = g.explode_tiles(boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3])
        img = pa.array(ids, pa.string()).take(pa.array(idx))
        tids = tile_id_strings(tx, ty) if len(tx) else np.array([], dtype=str)
        return pa.table(
            {
                "image_id": img,
                "tile_id": pa.array(tids.tolist(), pa.string()),
                "tx": pa.array(tx, pa.int32()),
                "ty": pa.array(ty, pa.int32()),
            }
        )


def image_tiles(images_ds, grid: GridSpec):
    """images Dataset -> (image_id, tile_id, tx, ty) assignment Dataset."""
    return images_ds.select_columns(["image_id", "w", "h"]).map_batches(
        ImageTiles(grid),
        batch_format="pyarrow",
        batch_size=8192,
        num_cpus=1,
    )


class RoiImageJoin:
    """J2 broadcast join: emits (roi_id, image_id) intersection pairs.

    ROI list is deserialized once per actor from the object store; each batch
    derives image footprints from image_id (pure function — the engine path)
    and runs bbox prefilter + exact predicate vectorized over the batch.
    """

    def __init__(self, rois_ref, grid: GridSpec, use_stored_boxes: bool = False):
        import ray

        self.rois = ray.get(rois_ref) if not isinstance(rois_ref, list) else rois_ref
        self.grid = grid
        self.use_stored_boxes = use_stored_boxes

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_stored_boxes:
            bx_min = batch.column("lon_min").to_numpy()
            by_min = batch.column("lat_min").to_numpy()
            bx_max = batch.column("lon_max").to_numpy()
            by_max = batch.column("lat_max").to_numpy()
        else:
            ids = batch.column("image_id").to_pylist()
            ws = batch.column("w").to_numpy()
            hs = batch.column("h").to_numpy()
            boxes = np.array(
                [
                    footprint_of(i, int(w), int(h), self.grid)
                    for i, w, h in zip(ids, ws, hs)
                ]
            ).reshape(-1, 4)
            bx_min, by_min, bx_max, by_max = boxes.T
        image_ids = batch.column("image_id")
        out_roi, out_img = [], []
        for roi in self.rois:
            hit = np.zeros(len(batch), dtype=bool)
            for b in roi["boxes"]:
                hit |= (
                    (bx_min < b[2])
                    & (bx_max > b[0])
                    & (by_min < b[3])
                    & (by_max > b[1])
                )
            if roi["ring"] is not None and hit.any():
                # exact concave-polygon predicate on bbox-prefiltered candidates
                cand = np.nonzero(hit)[0]
                exact = polygon_intersects_boxes(
                    roi["ring"],
                    bx_min[cand],
                    by_min[cand],
                    bx_max[cand],
                    by_max[cand],
                )
                hit[:] = False
                hit[cand[exact]] = True
            sel = np.nonzero(hit)[0]
            if len(sel):
                out_roi.extend([roi["roi_id"]] * len(sel))
                out_img.extend(image_ids.take(pa.array(sel)).to_pylist())
        return pa.table(
            {
                "roi_id": pa.array(out_roi, pa.string()),
                "image_id": pa.array(out_img, pa.string()),
            }
        )


def roi_image_join(
    images_ds,
    roi_table: pa.Table,
    grid: GridSpec,
    use_stored_boxes: bool = False,
    concurrency=None,
):
    """images Dataset x ROI table -> (roi_id, image_id) pairs Dataset.

    The small ROI side is embedded in the task closure (serialized once to
    the cluster, cached per worker) — the broadcast small-side join pattern.
    Task pool: no actor-pool ramp-up per query.
    """
    rois = normalize_rois(roi_table)
    cols = (
        ["image_id", "lon_min", "lat_min", "lon_max", "lat_max"]
        if use_stored_boxes
        else ["image_id", "w", "h"]
    )
    return images_ds.select_columns(cols).map_batches(
        RoiImageJoin(rois, grid, use_stored_boxes),
        batch_format="pyarrow",
        batch_size=8192,
        num_cpus=1,
    )


def footprint_overlap_degree(images_ds, grid: GridSpec,
                             bound: tuple[float, float, float, float]):
    """Spatial SELF-join: per-image count of other images whose footprint
    boxes strictly overlap — the all-pairs neighbor-degree report.

    The Partition-Based Spatial Merge (PBSM) join re-expressed on Ray Data
    (the classic duplicate-avoidance technique; the reference's chunk grid
    doubles as the partition grid):

    - each image fans out to every chunk CELL its bbox touches (analytic,
      no index build) — the one keyed shuffle, carrying only (cell, id,
      4 floats);
    - pairs are found per cell with a vectorized all-pairs bbox test
      (cells bound the candidate set; a denser grid level bounds it
      tighter when footprints shrink relative to cells);
    - a pair spanning k shared cells is REPORTED ONCE: only the owner cell
      — the cell containing the intersection box's west-north corner,
      which provably lies in both images' cell covers — emits it
      (duplicate-avoidance without a distinct-shuffle);
    - per-image degree partials fold through a final small keyed groupby.

    ``bound`` (x_min, y_min, x_max, y_max) restricts the join to images
    whose bbox lies entirely inside it (makes the brute SQL oracle
    tractable; pass the grid extent to join everything).

    Output: (image_id, n_overlaps), images with zero overlaps absent.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    bx0, by0, bx1, by1 = bound

    def fanout(t: pa.Table) -> pa.Table:
        lon_min = t.column("lon_min").to_numpy()
        lat_min = t.column("lat_min").to_numpy()
        lon_max = t.column("lon_max").to_numpy()
        lat_max = t.column("lat_max").to_numpy()
        keep = ((lon_min >= bx0) & (lon_max <= bx1)
                & (lat_min >= by0) & (lat_max <= by1))
        t = t.filter(pa.array(keep))
        lon_min, lat_min = lon_min[keep], lat_min[keep]
        lon_max, lat_max = lon_max[keep], lat_max[keep]
        idx, tx, ty = grid.explode_tiles(lon_min, lat_min, lon_max, lat_max)
        return pa.table({
            "tx": pa.array(tx, pa.int64()),
            "ty": pa.array(ty, pa.int64()),
            "image_id": pa.array(
                np.asarray(t.column("image_id").to_pylist(), object)[idx],
                pa.string()),
            "lon_min": pa.array(lon_min[idx]), "lat_min": pa.array(lat_min[idx]),
            "lon_max": pa.array(lon_max[idx]), "lat_max": pa.array(lat_max[idx]),
        })

    cols = ["image_id", "lon_min", "lat_min", "lon_max", "lat_max"]
    frags = images_ds.select_columns(cols).map_batches(
        fanout, batch_format="pyarrow", batch_size=8192)

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return pd.DataFrame({"image_id": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        tx, ty = int(g.tx.iloc[0]), int(g.ty.iloc[0])
        x0 = g.lon_min.to_numpy()
        y0 = g.lat_min.to_numpy()
        x1 = g.lon_max.to_numpy()
        y1 = g.lat_max.to_numpy()
        i, j = np.triu_indices(n, k=1)
        ov = ((x0[i] < x1[j]) & (x0[j] < x1[i])
              & (y0[i] < y1[j]) & (y0[j] < y1[i]))
        i, j = i[ov], j[ov]
        # owner cell: the one containing the intersection's west-north corner.
        # Same float path as explode_tiles (floor to pixel, THEN // chunk) so
        # borderline rounding can never disagree with the fan-out cover.
        px = np.maximum(x0[i], x0[j])
        py = np.minimum(y1[i], y1[j])
        own_tx = np.floor((px - grid.x0) / grid.res).astype(np.int64) // grid.chunk
        own_ty = np.floor((grid.y1 - py) / grid.res).astype(np.int64) // grid.chunk
        own = (own_tx == tx) & (own_ty == ty)
        i, j = i[own], j[own]
        ids = g.image_id.to_numpy()
        s = pd.Series(np.concatenate([ids[i], ids[j]]))
        d = s.value_counts()
        return pd.DataFrame({"image_id": d.index.to_numpy(),
                             "n": d.to_numpy().astype(np.int64)})

    return (frags.groupby(["tx", "ty"]).map_groups(
                cell_pairs, batch_format="pandas")
            .groupby("image_id")
            .aggregate(Sum("n", alias_name="n_overlaps")))


def cell_rollup(images_ds, level: int = 6,
                x0: float = -1.0, y0: float = -1.0,
                x1: float = 1.0, y1: float = 1.0):
    """Multi-resolution cell aggregation (the H3/S2 ``cellToParent``
    rollup): images counted per Z-order quadtree cell at ``level`` AND at
    the parent level, the coarse rows derived from the fine fold — one
    pass over the data, counts per level shuffled as cell-bounded
    partials. Output: (cell, lvl, n_images) for lvl ∈ {level, level-1}.

    The cell id IS the engine's partition key (Morton-packed int64,
    ``raygeo/cells.py``) — numerically-near cells are spatially near, so
    the same key serves hash AND range partitioning; the SQL oracle
    re-derives the bit interleave arithmetically.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from .. import cells

    def partial(t: pa.Table) -> pa.Table:
        cx = (t.column("lon_min").to_numpy()
              + t.column("lon_max").to_numpy()) / 2.0
        cy = (t.column("lat_min").to_numpy()
              + t.column("lat_max").to_numpy()) / 2.0
        c6 = cells.cell_of(cx, cy, level, x0=x0, y0=y0, x1=x1, y1=y1)
        c5 = cells.parent(c6)
        df = pd.DataFrame({
            "cell": np.concatenate([c6, c5]),
            "lvl": np.concatenate([
                np.full(len(c6), level, np.int64),
                np.full(len(c5), level - 1, np.int64)]),
            "n_images": np.int64(1),
        })
        g = (df.groupby(["cell", "lvl"], sort=False)["n_images"].sum()
             .reset_index())
        return pa.table({
            "cell": pa.array(g["cell"].to_numpy(np.int64), pa.int64()),
            "lvl": pa.array(g["lvl"].to_numpy(np.int64), pa.int64()),
            "n_images": pa.array(g["n_images"].to_numpy(np.int64),
                                 pa.int64()),
        })

    return (images_ds.select_columns(["lon_min", "lat_min", "lon_max",
                                      "lat_max"])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby(["cell", "lvl"])
            .aggregate(Sum("n_images", alias_name="n_images")))


def quadtree_partition(images_ds, cap: int = 256, depth: int = 6,
                       x0: float = -1.0, y0: float = -1.0,
                       x1: float = 1.0, y1: float = 1.0):
    """Adaptive quadtree partition plan over image centroids — the
    skew-aware spatial partitioner: starting from the whole extent, any
    cell holding more than ``cap`` images splits into its 4 children,
    down to ``depth``. Output is the LEAF table (level:int64,
    cell_x:int64, cell_y:int64, n_images:int64, pix_sum:int64) sorted by
    (level, cell_x, cell_y) — dense regions get deep small cells, sparse
    regions stay coarse, so per-leaf work is bounded by ``cap`` wherever
    the data permits (hot cells at ``depth`` surface with their true
    count for explicit salting). Feeding these leaves to the shuffle as
    partition keys is the adaptive alternative to the fixed cell grid of
    ``cell_rollup`` (reference grid logic: ``core/accessor.py`` chunk
    alignment; here re-derived as a data-dependent split).

    Plan shape: ONE distributed pass folds (ix, iy, count, pix_sum) at
    the max ``depth`` (map-side partials + a coarse-bucket global fold);
    that table is bounded by 4^depth cells — partition METADATA, not
    data — so the top-down split decision is a vectorized driver rollup
    over it, exactly like tile manifests. Centroid→cell arithmetic
    matches ``cells.cell_of`` (floor((c+1)/2·2^depth), clamped), which
    the SQL oracle replays bit-for-bit in doubles.
    """
    import pandas as pd
    import ray.data as rd

    from ..util import bucketed_sum, drop_empty_blocks

    n = 1 << depth

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        cx = (t.column("lon_min").to_numpy()
              + t.column("lon_max").to_numpy()) / 2.0
        cy = (t.column("lat_min").to_numpy()
              + t.column("lat_max").to_numpy()) / 2.0
        fx = (cx - x0) / (x1 - x0)
        fy = (cy - y0) / (y1 - y0)
        ix = np.clip(np.floor(fx * n).astype(np.int64), 0, n - 1)
        iy = np.clip(np.floor(fy * n).astype(np.int64), 0, n - 1)
        df = pd.DataFrame({
            "ix": ix, "iy": iy,
            "n_images": np.int64(1),
            "pix_sum": t.column("pix_sum").to_numpy().astype(np.int64),
        })
        g = (df.groupby(["ix", "iy"], sort=False)[["n_images", "pix_sum"]]
             .sum().reset_index())
        return pa.table({c: pa.array(g[c].to_numpy(np.int64), pa.int64())
                         for c in ("ix", "iy", "n_images", "pix_sum")})

    cell_schema = pa.schema([("ix", pa.int64()), ("iy", pa.int64()),
                             ("n_images", pa.int64()),
                             ("pix_sum", pa.int64())])
    cells_d = drop_empty_blocks(
        bucketed_sum(
            images_ds.select_columns(
                ["lon_min", "lat_min", "lon_max", "lat_max", "pix_sum"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=65536),
            ["ix", "iy"], ["n_images", "pix_sum"]).materialize(),
        cell_schema)

    # bounded rollup (<= 4^depth rows of metadata): leaf level per
    # depth-cell = shallowest ancestor whose count fits the cap
    df = cells_d.to_pandas()
    if len(df) == 0:
        return rd.from_arrow(pa.table({
            "level": pa.array([], pa.int64()),
            "cell_x": pa.array([], pa.int64()),
            "cell_y": pa.array([], pa.int64()),
            "n_images": pa.array([], pa.int64()),
            "pix_sum": pa.array([], pa.int64())}))
    ix = df["ix"].to_numpy()
    iy = df["iy"].to_numpy()
    cnt = df["n_images"].to_numpy()
    leaf = np.full(len(df), depth, np.int64)
    assigned = np.zeros(len(df), bool)
    for lv in range(0, depth + 1):
        sh = depth - lv
        key = (ix >> sh) * (n * 2) + (iy >> sh)
        tot = pd.Series(cnt).groupby(key).transform("sum").to_numpy()
        ok = (~assigned) & (tot <= cap)
        leaf[ok] = lv
        assigned |= ok
    sh = depth - leaf
    out = (pd.DataFrame({
        "level": leaf,
        "cell_x": ix >> sh,
        "cell_y": iy >> sh,
        "n_images": cnt,
        "pix_sum": df["pix_sum"].to_numpy(),
    }).groupby(["level", "cell_x", "cell_y"], sort=True)[
        ["n_images", "pix_sum"]].sum().reset_index())
    return rd.from_arrow(pa.table(
        {c: pa.array(out[c].to_numpy(np.int64), pa.int64())
         for c in ("level", "cell_x", "cell_y", "n_images", "pix_sum")}))


_DB_OFF = np.int64(1 << 20)
_DB_K = np.int64(1 << 21)


def radius_pairs(images_ds, eps: float = 2.0 ** -5,
                 num_partitions: int | None = None):
    """Exact ε-neighborhood spatial self-join over image centroids — the
    all-pairs-within-radius primitive (DBSCAN's region query, collision
    detection, duplicate-footprint sweep): every unordered pair with
    squared centroid distance <= eps² as (id_a, id_b, dist2), ids parsed
    to int64 from the 'img-NNN' key.

    Plan: bucket points into an eps-sized cell lattice (``eps`` a power
    of two so floor(c/eps) replays exactly in SQL doubles); each point
    rides ONE partitioned hash join twice — once keyed by its home cell,
    once replicated to the FORWARD half-neighborhood (home + the 4
    lexicographically-forward neighbor cells), so a cross-cell pair
    meets exactly once (the backward direction never probes) and a
    same-cell pair meets twice and dedups on id order. Shuffle volume is
    5 rows per point (the 9-cell plan's candidate volume halves); no N²
    anywhere, hot cells cost |cell|·|ring| inside one join partition
    (salt the lattice level if a cell outgrows a task). Exact verify is
    one vectorized double compare.
    """
    from ..util import auto_join_partitions, drop_empty_blocks

    e2 = eps * eps

    def base_cols(t: pa.Table):
        import pyarrow.compute as pc

        nid = pc.cast(pc.utf8_slice_codeunits(
            t.column("image_id"), 4, 32767), pa.int64()).to_numpy()
        cx = (t.column("lon_min").to_numpy()
              + t.column("lon_max").to_numpy()) / 2.0
        cy = (t.column("lat_min").to_numpy()
              + t.column("lat_max").to_numpy()) / 2.0
        ix = np.floor(cx / eps).astype(np.int64)
        iy = np.floor(cy / eps).astype(np.int64)
        return nid, cx, cy, ix, iy

    def homes(t: pa.Table) -> pa.Table:
        nid, cx, cy, ix, iy = base_cols(t)
        cell = (ix + _DB_OFF) * _DB_K + (iy + _DB_OFF)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "nid": pa.array(nid, pa.int64()),
                         "cx": pa.array(cx, pa.float64()),
                         "cy": pa.array(cy, pa.float64())})

    # forward half-neighborhood: a probe copy of q lands in q_cell - d,
    # so a pair with b_cell - a_cell = d meets in a's home cell exactly
    # for the 4 forward directions + the home cell (same-cell pairs meet
    # in both orders and dedup on id order in verify)
    _FWD = ((0, 0), (1, -1), (1, 0), (1, 1), (0, 1))

    def probes(t: pa.Table) -> pa.Table:
        nid, cx, cy, ix, iy = base_cols(t)
        reps = []
        for dx, dy in _FWD:
            cell = (ix - dx + _DB_OFF) * _DB_K + (iy - dy + _DB_OFF)
            reps.append(cell)
        nrep = len(_FWD)
        return pa.table({
            "cellp": pa.array(np.concatenate(reps), pa.int64()),
            "nidp": pa.array(np.tile(nid, nrep), pa.int64()),
            "cxp": pa.array(np.tile(cx, nrep), pa.float64()),
            "cyp": pa.array(np.tile(cy, nrep), pa.float64())})

    cols = ["image_id", "lon_min", "lat_min", "lon_max", "lat_max"]
    home_schema = pa.schema([("cell", pa.int64()), ("nid", pa.int64()),
                             ("cx", pa.float64()), ("cy", pa.float64())])
    h = drop_empty_blocks(
        images_ds.select_columns(cols)
        .map_batches(homes, batch_format="pyarrow", batch_size=65536)
        .materialize(), home_schema)
    p = images_ds.select_columns(cols).map_batches(
        probes, batch_format="pyarrow", batch_size=65536).materialize()
    if num_partitions is None:
        num_partitions = auto_join_partitions(h, p, pools=1)
    cand = h.join(p, join_type="inner", num_partitions=num_partitions,
                  on=("cell",), right_on=("cellp",))

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("nid").to_numpy()
        b = t.column("nidp").to_numpy()
        ax, bx = t.column("cx").to_numpy(), t.column("cxp").to_numpy()
        ay, by = t.column("cy").to_numpy(), t.column("cyp").to_numpy()
        dx, dy = ax - bx, ay - by
        d2 = dx * dx + dy * dy
        same_cell = (np.floor(ax / eps) == np.floor(bx / eps)) \
            & (np.floor(ay / eps) == np.floor(by / eps))
        # same-cell pairs arrive in both orders (the home-cell probe
        # copy): keep the a < b order only. Cross-cell pairs arrive
        # exactly once in arbitrary id order: keep all, emit normalized.
        keep = (d2 <= e2) & (a != b) & (~same_cell | (a < b))
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64()),
                         "dist2": pa.array(d2[keep], pa.float64())})

    return cand.map_batches(verify, batch_format="pyarrow",
                            batch_size=65536)


def dbscan_clusters(images_ds, eps: float = 2.0 ** -5, minpts: int = 4,
                    num_partitions: int | None = None,
                    broadcast_cap: int = 2_000_000):
    """Exact deterministic DBSCAN over image centroids — the
    density-based spatial clustering a curation pipeline uses to find
    over-sampled regions: core points have >= ``minpts`` neighbors
    within eps (themselves included), clusters are connected components
    of the core-core ε-graph labeled by their minimum core id, border
    points join the MINIMUM label among their core neighbors (the
    deterministic variant of DBSCAN's order-dependent border rule),
    everything else is noise. Returns (cluster:int64, n_core, n_border,
    n_points) sorted by cluster with one cluster=-1 noise row — bounded
    output.

    Scale shape (the ``dedup_keep_list`` dual-path discipline): the
    ε-graph comes from :func:`radius_pairs` (9-cell lattice hash join);
    degrees fold coarse-bucketed. When the core set fits
    ``broadcast_cap`` it ships once via ``ray.put`` and core-membership
    flags + border extraction are pure maps, with the component labels
    from a driver union-find over the (cap-bounded) core-core edge list
    — at these sizes the Dataset CC machinery's per-round fixed cost
    dominates (measured 37 s for a 160k-edge graph that union-find does
    in milliseconds). Above the cap everything degrades to partitioned
    marker joins + :func:`raygeo.ops.graph.connected_components_pairs`
    (min-label + pointer jumping, driver sees only checksums).
    """
    import ray
    import ray.data as rd

    from ..util import (auto_join_partitions, bucketed_fold, bucketed_sum,
                        drop_empty_blocks)

    pair_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    pairs = drop_empty_blocks(
        radius_pairs(images_ds, eps=eps,
                     num_partitions=num_partitions)
        .select_columns(["id_a", "id_b"]).materialize(), pair_schema)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy()
        b = t.column("id_b").to_numpy()
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64()),
                         "one": pa.array(np.ones(2 * len(a), np.int64))})

    deg = bucketed_sum(
        pairs.map_batches(both_dirs, batch_format="pyarrow"),
        "node", "one",
        clean_schema=pa.schema([("node", pa.int64()),
                                ("one", pa.int64())]))
    core = drop_empty_blocks(
        deg.filter(expr=f"one >= {minpts - 1}")
        .select_columns(["node"]).materialize(),
        pa.schema([("node", pa.int64())]))

    out_schema = pa.schema([("cluster", pa.int64()),
                            ("n_core", pa.int64()),
                            ("n_border", pa.int64()),
                            ("n_points", pa.int64())])
    n_core_total = core.count()
    if n_core_total == 0:  # no dense region anywhere: all noise
        return rd.from_arrow(pa.table({
            "cluster": pa.array([-1], pa.int64()),
            "n_core": pa.array([0], pa.int64()),
            "n_border": pa.array([0], pa.int64()),
            "n_points": pa.array([int(images_ds.count())], pa.int64())}))

    lab_schema = pa.schema([("node", pa.int64()), ("rep", pa.int64())])
    border_schema = pa.schema([("noncore", pa.int64()),
                               ("rep", pa.int64())])
    jp = auto_join_partitions(pairs, pools=1)

    if n_core_total <= broadcast_cap:
        # ---- broadcast path: core flags are one np.isin per batch ----
        core_ids = np.sort(np.concatenate(
            [t.column("node").to_numpy()
             for t in core.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20)]))
        cref = ray.put(core_ids)

        def cc_edges(t: pa.Table, _r=cref) -> pa.Table:
            cs = ray.get(_r)
            a = t.column("id_a").to_numpy()
            b = t.column("id_b").to_numpy()
            keep = np.isin(a, cs) & np.isin(b, cs)
            return pa.table({"id_a": pa.array(a[keep], pa.int64()),
                             "id_b": pa.array(b[keep], pa.int64())})

        cc_in = drop_empty_blocks(
            pairs.map_batches(cc_edges, batch_format="pyarrow")
            .materialize(), pair_schema)
        if cc_in.count() <= broadcast_cap:
            # cap-bounded edge list: exact driver union-find (same
            # min-root semantics, pinned vs the Dataset plan by tests)
            from .dedup import _min_root_union_find
            edf = cc_in.to_pandas()
            rep_map = _min_root_union_find(edf)
            rep = np.array([rep_map.get(int(n_), int(n_))
                            for n_ in core_ids], np.int64)
            lab = rd.from_arrow(pa.table({
                "node": pa.array(core_ids, pa.int64()),
                "rep": pa.array(rep, pa.int64())}))
        else:
            from .graph import connected_components_pairs
            lab = connected_components_pairs(cc_in.union(
                core.map_batches(
                    lambda t: pa.table({"id_a": t.column("node"),
                                        "id_b": t.column("node")}),
                    batch_format="pyarrow")))
        lab = drop_empty_blocks(lab.materialize(), lab_schema)

        # border: per-pair xor flags, then min core-neighbor label; the
        # label lookup broadcasts the (cap-bounded) core label map
        lab_pdf = lab.to_pandas()
        lref = ray.put(dict(zip(lab_pdf["node"].to_numpy(),
                                lab_pdf["rep"].to_numpy())))

        def border_rows(t: pa.Table, _c=cref, _l=lref) -> pa.Table:
            cs = ray.get(_c)
            lm = ray.get(_l)
            a = t.column("id_a").to_numpy()
            b = t.column("id_b").to_numpy()
            ha = np.isin(a, cs)
            hb = np.isin(b, cs)
            m1 = ~ha & hb
            m2 = ha & ~hb
            nc = np.concatenate([a[m1], b[m2]])
            cp = np.concatenate([b[m1], a[m2]])
            rep_ = np.array([lm[int(x)] for x in cp], np.int64)
            return pa.table({"noncore": pa.array(nc, pa.int64()),
                             "rep": pa.array(rep_, pa.int64())})

        bw = drop_empty_blocks(
            pairs.map_batches(border_rows, batch_format="pyarrow")
            .materialize(), border_schema)
    else:
        # ---- partitioned path: marker joins, Dataset-resident CC ----
        from .graph import connected_components_pairs

        def mark(name):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({
                    name: t.column("node"),
                    f"hit_{name}": pa.array(np.ones(t.num_rows,
                                                    np.int64))})
            return f

        ma = core.map_batches(mark("ka"), batch_format="pyarrow")
        mb = core.map_batches(mark("kb"), batch_format="pyarrow")
        marked = pairs.join(ma, join_type="left_outer",
                            num_partitions=jp,
                            on=("id_a",), right_on=("ka",))
        marked = drop_empty_blocks(
            marked.select_columns(["id_a", "id_b", "hit_ka"])
            .materialize(),
            pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("hit_ka", pa.int64())]))
        marked = marked.join(mb, join_type="left_outer",
                             num_partitions=jp,
                             on=("id_b",), right_on=("kb",))
        marked = drop_empty_blocks(
            marked.select_columns(["id_a", "id_b", "hit_ka", "hit_kb"])
            .materialize(),
            pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                       ("hit_ka", pa.int64()), ("hit_kb", pa.int64())]))

        def core_core(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            ok = pc.and_(pc.is_valid(t.column("hit_ka")),
                         pc.is_valid(t.column("hit_kb")))
            t2 = t.filter(ok)
            return pa.table({"id_a": t2.column("id_a"),
                             "id_b": t2.column("id_b")})

        cc_in = (marked.map_batches(core_core, batch_format="pyarrow")
                 .union(core.map_batches(
                     lambda t: pa.table({"id_a": t.column("node"),
                                         "id_b": t.column("node")}),
                     batch_format="pyarrow")))
        lab = drop_empty_blocks(
            connected_components_pairs(cc_in).materialize(), lab_schema)

        def border_pairs(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            ha = pc.is_valid(t.column("hit_ka")).to_numpy(
                zero_copy_only=False)
            hb = pc.is_valid(t.column("hit_kb")).to_numpy(
                zero_copy_only=False)
            a = t.column("id_a").to_numpy()
            b = t.column("id_b").to_numpy()
            m1 = ~ha & hb
            m2 = ha & ~hb
            return pa.table({
                "noncore": pa.array(np.concatenate([a[m1], b[m2]]),
                                    pa.int64()),
                "corep": pa.array(np.concatenate([b[m1], a[m2]]),
                                  pa.int64())})

        bwr = drop_empty_blocks(
            marked.map_batches(border_pairs, batch_format="pyarrow")
            .materialize(),
            pa.schema([("noncore", pa.int64()), ("corep", pa.int64())]))
        if bwr.count() == 0:
            # joining an EMPTY Dataset side drops its schema inside the
            # hash shuffle and breaks the Acero key lookup
            bw = rd.from_arrow(pa.table(
                {f.name: pa.array([], f.type) for f in border_schema}))
        else:
            lr = lab.map_batches(
                lambda t: pa.table({"ln": t.column("node"),
                                    "rep": t.column("rep")}),
                batch_format="pyarrow")
            bw = drop_empty_blocks(
                bwr.join(lr, join_type="inner", num_partitions=jp,
                         on=("corep",), right_on=("ln",))
                .select_columns(["noncore", "rep"]).materialize(),
                border_schema)

    # min label per border point, then bounded per-cluster stats
    if bw.count() == 0:
        border = rd.from_arrow(pa.table(
            {f.name: pa.array([], f.type) for f in border_schema}))
    else:
        border = bucketed_fold(
            bw, "noncore",
            lambda g: g.groupby("noncore", sort=False)["rep"].min()
            .reset_index(),
            clean_schema=border_schema).materialize()

    n_core_per = drop_empty_blocks(
        bucketed_fold(
            lab.select_columns(["rep"]), "rep",
            lambda g: g.groupby("rep", sort=False).size()
            .reset_index(name="n_core"),
            clean_schema=pa.schema([("rep", pa.int64()),
                                    ("n_core", pa.int64())]))
        .materialize(),
        pa.schema([("rep", pa.int64()), ("n_core", pa.int64())]))
    if border.count() == 0 or n_core_per.count() == 0:
        joined = n_core_per.map_batches(
            lambda t: pa.table({
                "rep": t.column("rep"), "n_core": t.column("n_core"),
                "n_border": pa.array([0] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")
    else:
        n_bord_per = bucketed_fold(
            border.select_columns(["rep"]), "rep",
            lambda g: g.groupby("rep", sort=False).size()
            .reset_index(name="n_border"),
            clean_schema=pa.schema([("rep", pa.int64()),
                                    ("n_border", pa.int64())]))
        n_bord_per = n_bord_per.map_batches(
            lambda t: pa.table({"repb": t.column("rep"),
                                "n_border": t.column("n_border")}),
            batch_format="pyarrow").materialize()
        joined = n_core_per.join(
            n_bord_per, join_type="left_outer", num_partitions=jp,
            on=("rep",), right_on=("repb",))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        nb = pc.fill_null(t.column("n_border"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nc = t.column("n_core").to_numpy().astype(np.int64)
        return pa.table({"cluster": t.column("rep").cast(pa.int64()),
                         "n_core": pa.array(nc, pa.int64()),
                         "n_border": pa.array(nb, pa.int64()),
                         "n_points": pa.array(nc + nb, pa.int64())})

    clusters = joined.map_batches(finish, batch_format="pyarrow")
    n_noise = images_ds.count() - lab.count() - border.count()
    noise = rd.from_arrow(pa.table({
        "cluster": pa.array([-1], pa.int64()),
        "n_core": pa.array([0], pa.int64()),
        "n_border": pa.array([0], pa.int64()),
        "n_points": pa.array([int(n_noise)], pa.int64())}))
    return drop_empty_blocks(
        clusters.union(noise).materialize(), out_schema).sort("cluster")
