"""kmeans_quantized vs a serial integer Lloyd oracle (partition-invariant),
nearest_zone vs brute-force argmin."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raygeo.ops.ann import kmeans_quantized
from raygeo.ops.zonal import nearest_zone


def _serial_kmeans(vecs, ids, k, rounds):
    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(ids)
    seeds = order[np.isin(ids[order], np.sort(ids)[:0])]  # unused
    seed_idx = np.array([np.nonzero(ids == i)[0][0] for i in range(k)])
    cids = ids[seed_idx].astype(np.int64)
    cmat = q[seed_idx]
    for r in range(rounds):
        d = ((q[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)
        if r == rounds - 1:
            return ids, cids[best], d[np.arange(len(q)), best]
        new_cids, new_rows = [], []
        for ci in range(len(cids)):
            m = best == ci
            if not m.any():
                continue
            new_cids.append(cids[ci])
            new_rows.append(np.floor(
                q[m].sum(axis=0).astype(np.float64) / m.sum()).astype(np.int64))
        cids = np.array(new_cids, np.int64)
        cmat = np.stack(new_rows)


def test_kmeans_matches_serial_and_is_partition_invariant(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(21))
    n, dim, k = 400, 12, 6
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    def run(parts, frame):
        ds = rd.from_pandas(frame).repartition(parts)
        out = kmeans_quantized(ds, k=k, rounds=3).to_pandas()
        return out.sort_values("vec_id").reset_index(drop=True)

    a = run(3, df)
    b = run(11, df.sample(frac=1, random_state=1))
    pd.testing.assert_frame_equal(a, b)

    sid, scid, sdist = _serial_kmeans(vecs, ids, k, rounds=3)
    exp = (pd.DataFrame({"vec_id": sid, "cid": scid, "dist": sdist})
           .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, exp, check_dtype=False)


def test_nearest_zone_brute(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(8))
    nz, ni = 20, 500
    zx0 = rng.uniform(-1, 0.8, nz)
    zy0 = rng.uniform(-1, 0.8, nz)
    zones = pa.table({
        "zone_id": [f"z-{i:02d}" for i in range(nz)],
        "lon_min": zx0, "lat_min": zy0,
        "lon_max": zx0 + 0.2, "lat_max": zy0 + 0.2,
    })
    ix0 = rng.uniform(-1, 0.9, ni)
    iy0 = rng.uniform(-1, 0.9, ni)
    imgs = pd.DataFrame({
        "image_id": [f"im-{i:04d}" for i in range(ni)],
        "lon_min": ix0, "lat_min": iy0,
        "lon_max": ix0 + 0.1, "lat_max": iy0 + 0.1,
    })
    out = nearest_zone(rd.from_pandas(imgs).repartition(5), zones).to_pandas()
    out = out.sort_values("image_id").reset_index(drop=True)

    zx = (zx0 + zx0 + 0.2) / 2.0
    zy = (zy0 + zy0 + 0.2) / 2.0
    # brute oracle with explicit (dist, zone_id) lexicographic tie-break
    rows = []
    zid = [f"z-{i:02d}" for i in range(nz)]
    for i in range(ni):
        cx = (ix0[i] + ix0[i] + 0.1) / 2.0
        cy = (iy0[i] + iy0[i] + 0.1) / 2.0
        d = (cx - zx) * (cx - zx) + (cy - zy) * (cy - zy)
        best = min(range(nz), key=lambda j: (d[j], zid[j]))
        rows.append((f"im-{i:04d}", zid[best]))
    exp = pd.DataFrame(rows, columns=["image_id", "zone_id"])
    pd.testing.assert_frame_equal(out, exp)


def test_pq_knn_recall_and_partition_invariance(ray_session):
    """PQ/ADC + exact rerank: recall@10 vs brute force stays high and the
    result is identical under different input partitionings."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import brute_force_knn, pq_knn

    rng = np.random.Generator(np.random.PCG64(3))
    n, d = 3000, 64
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(vecs)})
    q = pd.DataFrame({"query_id": np.arange(5, dtype=np.int64),
                      "embedding": list(rng.normal(size=(5, d)))})

    outs = []
    for parts in (4, 13):
        ds = rd.from_pandas(df).repartition(parts)
        outs.append(pq_knn(ds, q, k=10, rerank=20).to_pandas()
                    .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])

    exact = (brute_force_knn(rd.from_pandas(df), q, k=10).to_pandas()
             .groupby("query_id")["vec_id"].agg(set))
    got = outs[0].groupby("query_id")["vec_id"].agg(set)
    # iid Gaussian is PQ's worst case (no cluster structure); the wider
    # rerank shortlist keeps recall usable even there
    recall = np.mean([len(got[i] & exact[i]) / 10 for i in exact.index])
    assert recall >= 0.6, recall


def test_gram_matrix_partition_invariant_and_exact(ray_session):
    """Gram fold == single numpy Q^T Q on the quantized matrix, identical
    across partitionings; symmetric by construction."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import gram_matrix

    rng = np.random.Generator(np.random.PCG64(6))
    m = rng.normal(size=(500, 64))
    df = pd.DataFrame({"embedding": list(m)})
    outs = []
    for parts in (2, 9):
        g = (gram_matrix(rd.from_pandas(df).repartition(parts))
             .to_pandas().sort_values(["i", "j"]).reset_index(drop=True))
        outs.append(g)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    q = np.floor(m * 1000 + 0.5).astype(np.int64)
    exp = (q.T @ q).reshape(-1)
    assert outs[0]["gram_q"].to_numpy().tolist() == exp.tolist()
    gm = outs[0].pivot(index="i", columns="j", values="gram_q").to_numpy()
    assert (gm == gm.T).all()


def test_gram_matrix_float32_input_matches_double(ray_session):
    """Regression: list<float32> inputs (the fixture's storage dtype) must
    quantize through float64 — float32 boundary values would otherwise
    quantize off-by-one vs the double-precision oracle."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import gram_matrix

    rng = np.random.Generator(np.random.PCG64(13))
    m64 = rng.normal(size=(300, 64))
    df32 = pd.DataFrame({"embedding": list(m64.astype(np.float32))})
    got = (gram_matrix(rd.from_pandas(df32))
           .to_pandas().sort_values(["i", "j"]).reset_index(drop=True))
    q = np.floor(m64.astype(np.float32).astype(np.float64) * 1000
                 + 0.5).astype(np.int64)
    exp = (q.T @ q).reshape(-1)
    assert got["gram_q"].to_numpy().tolist() == exp.tolist()


def test_label_affinity_equals_bruteforce_pairs(ray_session):
    """The linearity identity: per-label-pair dot sums from vector sums
    == brute-force sum over all cross pairs of quantized dots."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import label_affinity

    rng = np.random.Generator(np.random.PCG64(15))
    n, d = 200, 8
    m = rng.normal(size=(n, d))
    lab = rng.integers(0, 3, n).astype(np.int64)
    df = pd.DataFrame({"embedding": list(m.astype(np.float32)),
                       "label": lab})
    got = (label_affinity(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values(["label_a", "label_b"])
           .reset_index(drop=True))
    q = np.floor(m.astype(np.float32).astype(np.float64) * 1000
                 + 0.5).astype(np.int64)
    G = q @ q.T
    for r in got.itertuples():
        ia = np.nonzero(lab == r.label_a)[0]
        ib = np.nonzero(lab == r.label_b)[0]
        assert r.dot_q2 == int(G[np.ix_(ia, ib)].sum())
        assert r.n_pairs == len(ia) * len(ib)


def test_semdedup_subset_of_exact_pairs(ray_session):
    """Every SemDeDup pair satisfies the exact cosine test (soundness),
    and within any ONE cluster no qualifying pair is missed
    (completeness-within-cluster) — checked against a brute-force numpy
    oracle over synthetic vectors with planted duplicates."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import semdedup_pairs

    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    # planted near-dups: rows 20..39 are noisy copies of rows 0..19
    noisy = (base + rng.normal(scale=0.02, size=base.shape)
             ).astype(np.float32)
    m = np.vstack([base, noisy])
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [v.tolist() for v in m]})
    out = (semdedup_pairs(rd.from_pandas(df), k=4, rounds=2,
                          tau_num=24, tau_den=25)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))

    q = np.floor(m.astype(np.float64) * 1e3 + 0.5).astype(np.int64)
    dot = q @ q.T
    n2 = np.diag(dot)
    exact = {(a, b) for a in range(40) for b in range(a + 1, 40)
             if dot[a, b] > 0
             and 625 * dot[a, b] ** 2 >= 576 * n2[a] * n2[b]}
    got = set(zip(out.id_a.tolist(), out.id_b.tolist()))
    assert got <= exact  # soundness
    # planted copies are extremely close; k-means puts a copy with its
    # original, so the planted pairs must be recovered
    planted = {(i, i + 20) for i in range(20)} & exact
    assert planted <= got
    # completeness within each emitted cluster
    cl = dict(zip(out.id_a.tolist(), out.cid.tolist()))
    for (a, b) in exact:
        if cl.get(a) is not None and cl.get(a) == cl.get(b):
            assert (a, b) in got


def test_pca_power_direction_and_replay(ray_session):
    """pca_power_scores vs (a) a pure-python integer replay of the same
    quantized recursion — bit-exact — and (b) numpy's true top
    eigenvector: the quantized direction must align (|cos| > 0.98) on
    data with a dominant component."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import _trunc_div, pca_power_scores

    rng = np.random.Generator(np.random.PCG64(77))
    d, n = 16, 400
    main = rng.normal(size=d)
    main /= np.linalg.norm(main)
    X = (np.outer(rng.normal(size=n) * 3.0, main)
         + rng.normal(size=(n, d)) * 0.2).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(X)})
    got = pca_power_scores(rd.from_pandas(df).repartition(5),
                           rounds=3, k=10).to_pandas()
    # (a) integer replay
    q = np.floor(X.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    G = (q.T @ q).tolist()
    vec = [1] * d
    for _ in range(3):
        s = [sum(G[i][j] * vec[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in s) or 1
        vec = [_trunc_div(x * (1 << 20), m) for x in s]
    score = q @ np.asarray(vec, np.int64)
    order = np.lexsort((np.arange(n), -np.abs(score)))[:10]
    exp = pd.DataFrame({"vec_id": order.astype(np.int64),
                        "score_q": score[order]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)
    # (b) alignment with the true principal axis
    v = np.asarray(vec, np.float64)
    v /= np.linalg.norm(v)
    w, V = np.linalg.eigh((X.T @ X).astype(np.float64))
    top = V[:, -1]
    assert abs(float(v @ top)) > 0.98


def test_label_outliers_matches_brute(ray_session):
    """Distance-to-centroid top-k per label vs a brute numpy replay —
    planted far outliers must rank first."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import label_outliers

    rng = np.random.Generator(np.random.PCG64(5))
    d, n = 8, 300
    lab = rng.integers(0, 4, n)
    X = rng.normal(size=(n, d)).astype(np.float32) * 0.1
    X += lab[:, None] * 2.0
    # plant an extreme outlier per label
    for li in range(4):
        idx = np.nonzero(lab == li)[0][0]
        X[idx] += 50.0
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(X),
                       "label": lab})
    got = label_outliers(rd.from_pandas(df).repartition(5),
                         k=3).to_pandas()
    q = np.floor(X.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    exp_rows = []
    for li in range(4):
        m = lab == li
        c = np.floor(q[m].sum(axis=0).astype(np.float64)
                     / int(m.sum())).astype(np.int64)
        sc = ((q[m] - c) ** 2).sum(axis=1)
        ids = np.arange(n)[m]
        order = np.lexsort((ids, -sc))[:3]
        for r, o in enumerate(order):
            exp_rows.append((li, int(ids[o]), int(sc[o]), r + 1))
    exp = pd.DataFrame(exp_rows, columns=["label", "vec_id", "dist_q2",
                                          "rank"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # planted outliers are rank 1 in each label
    planted = {int(np.nonzero(lab == li)[0][0]) for li in range(4)}
    assert set(got[got["rank"] == 1].vec_id) == planted


def test_hamming_knn_matches_brute(ray_session):
    """Binary sign-packing + Hamming top-k vs a brute bit replay;
    rank-1 of each query is itself (hamming 0)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raygeo.ops.ann import hamming_knn

    rng = np.random.Generator(np.random.PCG64(8))
    n, d = 200, 64
    X = rng.normal(size=(n, d)).astype(np.float32)
    X[5, :] = 0.0  # all-zero row: sign(0) >= 0 counts as 1 on both sides
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(X)})
    got = hamming_knn(rd.from_pandas(df).repartition(5),
                      n_queries=4, k=5).to_pandas()
    bits = (X.astype(np.float64) >= 0.0)
    exp_rows = []
    for qid in range(4):
        h = (bits ^ bits[qid]).sum(axis=1).astype(np.int64)
        order = np.lexsort((np.arange(n), h))[:5]
        for r, o in enumerate(order):
            exp_rows.append((qid, int(o), int(h[o]), r + 1))
    exp = pd.DataFrame(exp_rows, columns=["query_id", "vec_id",
                                          "hamming", "rank"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r1 = got[got["rank"] == 1]
    assert (r1.query_id.to_numpy() == r1.vec_id.to_numpy()).all()
    assert (r1.hamming == 0).all()


def test_nn_all_quadratic_guard(ray_session):
    """VERDICT r4 #8: the N^2 baseline prices itself — over max_rows it
    raises at plan time with the scale-path guidance."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from raygeo.ops.ann import nn_all

    df = pd.DataFrame({
        "vec_id": np.arange(10, dtype=np.int64),
        "embedding": [np.random.default_rng(i).random(4).tolist()
                      for i in range(10)],
    })
    with pytest.raises(ValueError, match="brute-force baseline"):
        nn_all(rd.from_pandas(df), max_rows=5)
    out = nn_all(rd.from_pandas(df), max_rows=10).to_pandas()
    assert len(out) == 10
