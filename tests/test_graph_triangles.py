"""triangle_counts + util.bucketed_fold: exactness against brute force.

The triangle op is the degree-ordered compact-forward plan
(``ops/graph.py``); the brute-force oracle here enumerates all node
triples over the same edge set. bucketed_fold is the engine-wide
high-cardinality fold primitive — its contract (global per-key result,
any bucket count) is what every converted call site relies on.
"""

import itertools

import numpy as np
import pandas as pd
import pytest


def _brute_triangles(edges):
    """node -> number of triangles containing it, by triple enumeration."""
    es = {tuple(e) for e in edges}
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


@pytest.mark.parametrize("seed", [0, 7])
def test_triangle_counts_match_brute_force(ray_session, seed):
    import ray.data as rd

    from raygeo.ops.graph import triangle_counts

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 40, 160
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    edges = sorted({(int(x), int(y)) for x, y in zip(lo, hi)})

    ds = rd.from_pandas(pd.DataFrame(edges, columns=["part_a", "part_b"]))
    got = (triangle_counts(ds.repartition(5), "part_a", "part_b")
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = _brute_triangles(edges)
    assert dict(zip(got["node"], got["n_tri"])) == want
    # total participation = 3x the triangle count
    assert got["n_tri"].sum() % 3 == 0


def test_triangle_counts_empty_and_no_triangles(ray_session):
    import ray.data as rd

    from raygeo.ops.graph import triangle_counts

    # a path graph has zero triangles
    ds = rd.from_pandas(pd.DataFrame({"part_a": [0, 1, 2],
                                      "part_b": [1, 2, 3]}))
    got = triangle_counts(ds, "part_a", "part_b").to_pandas()
    assert len(got) == 0


def test_triangle_counts_rejects_wide_ids(ray_session):
    import ray.data as rd

    from raygeo.ops.graph import triangle_counts

    ds = rd.from_pandas(pd.DataFrame({"part_a": [1 << 31], "part_b": [1]}))
    with pytest.raises(Exception, match="2\\^31|node ids"):
        triangle_counts(ds, "part_a", "part_b").materialize()


@pytest.mark.parametrize("nb", [1, 3, 16])
def test_bucketed_fold_global_per_key(ray_session, nb):
    """Result is key-global and independent of the bucket count."""
    import ray.data as rd

    from raygeo.util import bucketed_fold

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 500, 5000).astype(np.int64),
                       "v": rng.integers(0, 100, 5000).astype(np.int64)})

    def fold(g):
        agg = g.groupby("k", sort=False)["v"].sum().reset_index()
        return agg.astype(np.int64)

    got = (bucketed_fold(rd.from_pandas(df).repartition(7), "k", fold,
                         num_buckets=nb)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k", sort=False)["v"].sum().reset_index()
            .astype(np.int64).sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_fold_multi_column_key(ray_session):
    import ray.data as rd

    from raygeo.util import bucketed_fold

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"a": rng.integers(0, 30, 2000).astype(np.int64),
                       "b": rng.integers(0, 30, 2000).astype(np.int64),
                       "v": np.ones(2000, np.int64)})

    def fold(g):
        agg = g.groupby(["a", "b"], sort=False)["v"].sum().reset_index()
        return agg.astype(np.int64)

    got = (bucketed_fold(rd.from_pandas(df).repartition(4), ["a", "b"],
                         fold)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    want = (df.groupby(["a", "b"], sort=False)["v"].sum().reset_index()
            .astype(np.int64).sort_values(["a", "b"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_edge_jaccard_matches_brute(ray_session):
    import ray.data as rd

    from raygeo.ops.graph import edge_jaccard

    rng = np.random.Generator(np.random.PCG64(73))
    n_nodes, n_edges = 40, 120
    raw = {tuple(sorted(p)) for p in
           rng.integers(0, n_nodes, size=(n_edges, 2)) if p[0] != p[1]}
    edges = sorted(raw)
    df = pd.DataFrame({"part_a": [a for a, _ in edges],
                       "part_b": [b for _, b in edges]})
    got = (edge_jaccard(rd.from_pandas(df).repartition(5), k=15)
           .to_pandas().reset_index(drop=True))

    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    rows = []
    for a, b in edges:
        common = len(nbrs[a] & nbrs[b])
        union = len(nbrs[a]) + len(nbrs[b]) - common
        rows.append((a, b, common, common * 1_000_000 // union))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = rows[:15]
    assert list(map(tuple, got.itertuples(index=False))) == exp
    assert exp[0][2] > 0


def _brute_bfs(edges, seed_mod, max_hops):
    """min hop distance from {node % seed_mod == 0} by queue BFS."""
    from collections import deque

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {n: 0 for n in adj if n % seed_mod == 0}
    q = deque(dist)
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


@pytest.mark.parametrize("seed,cap", [(0, 2_000_000), (3, 0)])
def test_bfs_hops_match_brute_force(ray_session, seed, cap):
    """Level-synchronous BFS == queue BFS on random graphs, on BOTH the
    broadcast path (cap high) and the partitioned-join path (cap=0)."""
    import ray.data as rd

    from raygeo.ops.graph import bfs_hops

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 60, 90  # sparse: several hop levels + unreached
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    edges = sorted({(int(min(x, y)), int(max(x, y)))
                    for x, y in zip(a[keep], b[keep])})
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["part_a", "part_b"]))
    got = (bfs_hops(ds.repartition(4), "part_a", "part_b", seed_mod=7,
                    max_hops=3, broadcast_cap=cap)
           .to_pandas())
    want = _brute_bfs(edges, 7, 3)
    assert dict(zip(got["node"], got["hops"])) == want
    assert list(got["node"]) == sorted(got["node"])  # sorted contract


def test_bfs_hops_no_seeds(ray_session):
    import ray.data as rd

    from raygeo.ops.graph import bfs_hops

    ds = rd.from_pandas(pd.DataFrame({"part_a": [1, 3], "part_b": [3, 5]}))
    got = bfs_hops(ds, "part_a", "part_b", seed_mod=97, max_hops=2)
    assert got.count() == 0


def test_clustering_coefficients_match_brute_force(ray_session):
    """coef = 2·tri/(deg·(deg−1)) on random graphs vs triple enumeration;
    includes deg>=2 nodes with ZERO triangles (the coalesce path)."""
    import ray.data as rd

    from raygeo.ops.graph import clustering_coefficients

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 40, 120
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    keep = a != b
    edges = sorted({(int(min(x, y)), int(max(x, y)))
                    for x, y in zip(a[keep], b[keep])})
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["part_a", "part_b"]))
    got = (clustering_coefficients(ds.repartition(4), "part_a", "part_b")
           .to_pandas().sort_values("node").reset_index(drop=True))

    es = set(edges)
    deg: dict = {}
    for x, y in edges:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    tri = {n: 0 for n in deg}
    nodes = sorted(deg)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) not in es:
                continue
            for w in nodes:
                if w <= v:
                    continue
                if (u, w) in es and (v, w) in es:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    exp = []
    for n in nodes:
        if deg[n] < 2:
            continue
        exp.append((n, deg[n], tri[n],
                    (2 * tri[n] * 1_000_000) // (deg[n] * (deg[n] - 1))))
    exp = pd.DataFrame(exp, columns=["node", "deg", "n_tri", "coef_ppm"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["n_tri"] == 0).any()  # zero-triangle deg>=2 nodes present
