"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale patterns (the 100 TB shapes):
- exact dedup = vectorized content-hash in ``map_batches`` -> **map-side
  partial reduce** (min patch id per hash within each batch) -> tiny
  ``groupby(hash).min`` — the shuffle only carries one row per distinct key
  per batch, never the payloads. (Reference analog: set-difference vs the
  ``loaded_patches`` ledger + ``drop_duplicates(keep="first")``,
  ``accessor.py:434-436``, ``gee.py:104-107``.)
- MinHash-LSH = shingle -> k minhashes per doc (vectorized) -> explode to
  (band_id, band_hash) rows -> ``groupby`` band buckets -> candidate pairs
  -> exact-Jaccard verification. Only bucket collisions shuffle.
- SimHash = 64-bit weighted token hash, bucket by rotated prefixes.
- embedding near-dup = brute-force cosine per batch against a broadcast
  matrix (exact; the LSH-bucketed variant is in ops/ann.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa



def _sha1_i64(values: list[bytes]) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.sha1(v).digest()[:8], "big") & ((1 << 63) - 1)
            for v in values
        ],
        dtype=np.int64,
    )


# ---------------------------------------------------------------- exact dedup
def exact_dedup(ds, key_col: str, id_col: str, precomputed_hash: str | None = None):
    """Keep the first (min id) row per distinct ``key_col`` value.

    Returns a Dataset of (hash64, <id_col> kept, n_dups). When
    ``precomputed_hash`` is given (e.g. the images table's ``phash``), that
    int64 column is the key directly.
    """
    from ray.data.aggregate import Min, Sum

    def add_hash(t: pa.Table) -> pa.Table:
        if precomputed_hash is not None:
            h = t.column(precomputed_hash)
        else:
            vals = [
                v.encode() if isinstance(v, str) else v
                for v in t.column(key_col).to_pylist()
            ]
            h = pa.array(_sha1_i64(vals), pa.int64())
        out = pa.table({"hash64": h, id_col: t.column(id_col)})
        # map-side partial reduce: one row per distinct hash per batch
        df = out.to_pandas()
        part = (
            df.groupby("hash64", sort=False)
            .agg(**{id_col: (id_col, "min"), "n_dups": (id_col, "size")})
            .reset_index()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    cols = [c for c in {key_col if precomputed_hash is None else precomputed_hash, id_col}]
    partial = ds.select_columns(cols).map_batches(
        add_hash, batch_format="pyarrow", batch_size=16384
    )
    return partial.groupby("hash64").aggregate(
        Min(id_col, alias_name=id_col), Sum("n_dups", alias_name="n_dups")
    )


# ------------------------------------------------------------- shingles utils
def char_shingles(text: str, k: int = 4) -> set[int]:
    if len(text) < k:
        return {hash_bytes(text.encode())}
    return {hash_bytes(text[i : i + k].encode()) for i in range(len(text) - k + 1)}


def word_shingles(text: str, k: int = 2) -> set[int]:
    toks = text.split()
    if len(toks) < k:
        return {hash_bytes(" ".join(toks).encode())}
    return {
        hash_bytes(" ".join(toks[i : i + k]).encode())
        for i in range(len(toks) - k + 1)
    }


def hash_bytes(b: bytes) -> int:
    import zlib

    return zlib.crc32(b)


# --------------------------------------------------------------- MinHash sigs
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not shingles:
        return np.full(len(a), _MERSENNE, dtype=np.int64)
    s = np.array(sorted(shingles), dtype=np.int64)
    # (num_perm, n_shingles) universal hash, min over shingles
    vals = (a[:, None].astype(object) * s[None, :] + b[:, None]) % _MERSENNE
    return np.min(vals, axis=1).astype(np.int64)


class MinHashBands:
    """doc -> (band_id, band_hash, doc id) rows; state = permutation params."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64,
                 bands: int = 16, shingle_k: int = 2, use_words: bool = True):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.use_words = use_words
        self.a, self.b = _perm_params(num_perm)

    def shingles(self, text: str) -> set[int]:
        return (
            word_shingles(text, self.shingle_k)
            if self.use_words
            else char_shingles(text, self.shingle_k)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        out_band, out_hash, out_id = [], [], []
        for did, text in zip(ids, texts):
            sig = minhash_signature(self.shingles(text), self.a, self.b)
            for bidx in range(self.bands):
                seg = sig[bidx * self.rows_per_band : (bidx + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.sha1(seg.tobytes() + bytes([bidx])).digest()[:8], "big"
                ) & ((1 << 63) - 1)
                out_band.append(bidx)
                out_hash.append(bh)
                out_id.append(did)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                self.id_col: pa.array(out_id),
            }
        )


def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 2,
    jaccard_threshold: float = 0.8,
    use_words: bool = True,
    concurrency=None,
):
    """Near-dup candidate pairs via LSH banding, verified by exact Jaccard.

    Returns a Dataset of (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold. With threshold=1.0 recall is exact (identical
    shingle sets always share every band), which is what the SQL-checkable
    query uses; lower thresholds trade recall for candidate volume as usual.
    """
    import ray

    mk = dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
              use_words=use_words)
    banded = ds.select_columns([text_col, id_col]).map_batches(
        MinHashBands(text_col, id_col, **mk),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    cand = (
        banded.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand_pdf = cand.to_pandas().drop_duplicates()
    if len(cand_pdf) == 0:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})

    # verification: broadcast the candidate id set, collect shingles once
    need = set(cand_pdf.id_a) | set(cand_pdf.id_b)
    need_ref = ray.put(need)
    mh = MinHashBands(text_col, id_col, **mk)

    def collect_shingles(t: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        keep_ids, sh = [], []
        for did, text in zip(ids, texts):
            if did in needed:
                keep_ids.append(did)
                sh.append(np.array(sorted(mh.shingles(text)), dtype=np.int64).tobytes())
        return pa.table({id_col: pa.array(keep_ids), "shingles": pa.array(sh, pa.binary())})

    sh_pdf = (
        ds.select_columns([text_col, id_col])
        .map_batches(collect_shingles, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    smap = {
        r[id_col]: set(np.frombuffer(r["shingles"], dtype=np.int64).tolist())
        for _, r in sh_pdf.iterrows()
    }
    ja, keep_a, keep_b = [], [], []
    for a, b in zip(cand_pdf.id_a, cand_pdf.id_b):
        sa, sb = smap[a], smap[b]
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= jaccard_threshold:
            keep_a.append(a)
            keep_b.append(b)
            ja.append(j)
    return pd.DataFrame({"id_a": keep_a, "id_b": keep_b, "jaccard": ja})


# ------------------------------------------------------------------- SimHash
class SimHash:
    """64-bit SimHash over word tokens (deterministic crc32-based)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        texts = batch.column(self.text_col).to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, text in enumerate(texts):
            acc = np.zeros(64, dtype=np.int64)
            for tok in text.split():
                h = (
                    zlib.crc32(tok.encode()) << 32 | zlib.crc32(tok[::-1].encode())
                ) & ((1 << 64) - 1)
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            bits_out = (acc > 0).astype(np.uint64)
            out[i] = np.bitwise_or.reduce(bits_out << np.arange(64, dtype=np.uint64))
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash64": pa.array(out.astype(np.int64), pa.int64()),
            }
        )


def simhash(ds, text_col: str, id_col: str, concurrency=None):
    return ds.select_columns([text_col, id_col]).map_batches(
        SimHash(text_col, id_col),
        batch_format="pyarrow",
        batch_size=4096,
        num_cpus=1,
    )


# --------------------------------------------------- n-gram Jaccard (pairwise)
def ngram_jaccard_pairs(ds, text_col: str, id_col: str, k: int = 4,
                        threshold: float = 0.5):
    """Exact char-n-gram Jaccard pairs >= threshold via LSH candidates.

    Same machinery as minhash_lsh_pairs but char shingles; used for
    near-identical texts.
    """
    return minhash_lsh_pairs(
        ds, text_col, id_col, num_perm=64, bands=32, shingle_k=k,
        jaccard_threshold=threshold, use_words=False,
    )


# ------------------------------------------------- embedding cosine near-dup
def embedding_neardup_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                            threshold: float = 0.95):
    """Exact cosine near-dup pairs via brute force vs a broadcast matrix.

    The full (id, unit-vector) matrix is ``ray.put`` once; each batch does one
    float64 matmul against it. Exact (matches the SQL oracle bit-for-bit in
    ordering-independent comparisons); the sub-quadratic path for true scale
    is ops.ann.lsh_bucket_neardup.
    """
    import ray

    mat_pdf = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = mat_pdf[id_col].to_numpy()
    m = np.stack(mat_pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    ref = ray.put((ids, m, norms))

    def pairs(t: pa.Table) -> pa.Table:
        all_ids, mat, nrm = ray.get(ref)
        bids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False))
        bv = np.stack(t.column(vec_col).to_pylist()).astype(np.float64)
        bn = np.sqrt((bv * bv).sum(axis=1))
        sims = (bv @ mat.T) / (bn[:, None] * nrm[None, :])
        keep_a, keep_b, s_out = [], [], []
        for r in range(len(bids)):
            hit = np.nonzero((sims[r] >= threshold) & (all_ids > bids[r]))[0]
            for c in hit:
                keep_a.append(int(bids[r]))
                keep_b.append(int(all_ids[c]))
                s_out.append(float(sims[r, c]))
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                "cos_sim": pa.array(s_out, pa.float64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        pairs, batch_format="pyarrow", batch_size=2048
    )
