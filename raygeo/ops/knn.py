"""Exact kNN via cell-ring expansion (north-star op, SURVEY §2.4).

For each broadcast query point: candidates are images whose spatial cell lies
within Chebyshev ring radius R of the query's cell (map-side filter — only
candidate pairs enter the shuffle), then a per-query top-k
(``groupby(query_id).map_groups``). The driver loops:

  1. start at radius R0, doubling until every query has >= k candidates;
  2. compute each query's provisional k-th distance d_k, derive the radius
     R* that is *guaranteed* to contain every point within d_k
     (ring r only contains points at distance >= (r-1)*cell_side), and run
     one final pass at max(R, R*) — making the result exact, equal to a
     brute-force oracle.

Each round is a full streaming pass over the images dataset, but only the
(tiny) candidate pair set is shuffled — the 100 TB-scale behavior the north
star asks for. Distances are float64 ``(dx*dx + dy*dy)`` with
``(dist2, image_id)`` tie-break so ordering is bit-reproducible and matches
the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..cells import cell_of, decode_xy
from ..fixtures import footprint_of
from ..grid import GridSpec


class CandidateEmit:
    """Emit (query_id, image_id, dist2) for images within each query's ring."""

    def __init__(self, queries_ref, grid: GridSpec, level: int):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.q_ids = q["query_id"]
        self.q_lon = np.asarray(q["lon"], dtype=np.float64)
        self.q_lat = np.asarray(q["lat"], dtype=np.float64)
        self.q_radius = np.asarray(q["radius"], dtype=np.int64)  # per-query ring radius
        self.grid = grid
        self.level = level
        qc = cell_of(
            self.q_lon, self.q_lat, level, grid.x0, grid.y0, grid.x1, grid.y1
        )
        self.q_ix, self.q_iy, _ = decode_xy(qc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        ids = batch.column("image_id").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        boxes = np.array(
            [footprint_of(i, int(w), int(h), g) for i, w, h in zip(ids, ws, hs)]
        ).reshape(-1, 4)
        lon_c = (boxes[:, 0] + boxes[:, 2]) / 2.0
        lat_c = (boxes[:, 1] + boxes[:, 3]) / 2.0
        c = cell_of(lon_c, lat_c, self.level, g.x0, g.y0, g.x1, g.y1)
        ix, iy, _ = decode_xy(c)
        out_q, out_img, out_d = [], [], []
        img_arr = np.array(ids, dtype=object)
        for qi in range(len(self.q_ids)):
            cheb = np.maximum(
                np.abs(ix - self.q_ix[qi]), np.abs(iy - self.q_iy[qi])
            )
            hit = cheb <= self.q_radius[qi]
            if not hit.any():
                continue
            dx = lon_c[hit] - self.q_lon[qi]
            dy = lat_c[hit] - self.q_lat[qi]
            d2 = dx * dx + dy * dy
            out_q.extend([self.q_ids[qi]] * int(hit.sum()))
            out_img.extend(img_arr[hit].tolist())
            out_d.extend(d2.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "image_id": pa.array(out_img, pa.string()),
                "dist2": pa.array(out_d, pa.float64()),
            }
        )


def _topk_per_query(k: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist2", "image_id"], kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "rank", "image_id", "dist2"]]

    return fn


def knn(
    images_ds,
    queries: pd.DataFrame,
    grid: GridSpec,
    k: int = 5,
    level: int = 5,
    r0: int = 1,
    concurrency=None,
):
    """Exact k nearest image centroids per query point.

    ``queries``: DataFrame with columns (query_id, lon, lat). Returns a
    pandas DataFrame (query_id, rank, image_id, dist2) — small by
    construction (len(queries) * k rows).
    """
    import ray

    g = grid
    n_cells = 1 << level
    cell_side = min(
        (g.x1 - g.x0) / n_cells,
        (g.y1 - g.y0) / n_cells,
    )
    q = {
        "query_id": queries["query_id"].tolist(),
        "lon": queries["lon"].to_numpy(dtype=np.float64),
        "lat": queries["lat"].to_numpy(dtype=np.float64),
        "radius": np.full(len(queries), r0, dtype=np.int64),
    }
    base = images_ds.select_columns(["image_id", "w", "h"])

    def run_pass(qdict) -> pd.DataFrame:
        cand = base.map_batches(
            CandidateEmit(qdict, g, level),
            batch_format="pyarrow",
            batch_size=8192,
            num_cpus=1,
        )
        top = cand.groupby("query_id").map_groups(
            _topk_per_query(k), batch_format="pandas"
        )
        return top.to_pandas()

    max_radius = n_cells  # covers the whole extent
    # phase A: grow radii until every query has >= k candidates or has
    # reached max_radius. Radii double each round, so the loop terminates in
    # <= log2(max_radius)+2 rounds; no fixed iteration cap (a cap could exit
    # early at high `level` and phase B would then misread "still short" as
    # "fewer than k points exist").
    while True:
        res = run_pass(q)
        counts = res.groupby("query_id")["rank"].max() if len(res) else pd.Series(dtype=int)
        short = [
            i
            for i, qid in enumerate(q["query_id"])
            if counts.get(qid, 0) < k and q["radius"][i] < max_radius
        ]
        if not short:
            break
        for i in short:
            q["radius"][i] = min(q["radius"][i] * 2 + 1, max_radius)
    # phase B: exactness — radius must cover the provisional k-th distance
    need_rerun = False
    for i, qid in enumerate(q["query_id"]):
        sub = res[res.query_id == qid]
        if len(sub) < k:
            # phase A guarantees radius reached max before giving up, so
            # fewer than k points exist in total
            assert q["radius"][i] >= max_radius
            continue
        d_k = float(np.sqrt(sub.dist2.max()))
        r_star = int(np.floor(d_k / cell_side)) + 1
        if r_star > q["radius"][i]:
            q["radius"][i] = min(r_star, max_radius)
            need_rerun = True
    if need_rerun:
        res = run_pass(q)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)
