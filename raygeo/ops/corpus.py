"""Composed training-data corpus pipeline: quality filter -> exact dedup.

The end-to-end cleaning flow a large-scale text-corpus user runs before
training (the composition showcase over ops.text + ops.dedup primitives):

    read documents -> one streaming pass computing (content hash, token
    stats, quality keep) -> filter -> map-side partial dedup (one row per
    distinct hash per batch) -> bounded-block groupby keeping the min
    doc_id -> clean (doc_id, n_tokens) corpus.

Everything streams; the only all-to-all exchange is the final content-hash
groupby, whose volume is one row per distinct document per batch — at a
realistic dup rate orders of magnitude below corpus size. Quality semantics
mirror ops.text.QualityScore exactly (same token regex, same thresholds) so
the DuckDB oracle replays the whole pipeline in SQL.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import TOKEN_RE
from ..util import cluster_cpus

# token class over lower(text); the DuckDB oracle uses the identical RE2
LOWER_TOKEN_RE = r"[0-9a-z_]+"


class _HashQualityStage:
    """Single pass: content hash + token stats + quality keep flag."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col]
        toks = texts.str.lower().str.findall(self.tok)
        n_tokens = toks.map(len).astype("int64")
        tok_chars = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
        mean_tok_len = tok_chars / n_tokens.where(n_tokens > 0, 1)
        keep = (n_tokens >= 5) & (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
        h = np.fromiter(
            (int.from_bytes(hashlib.sha1(t.encode()).digest()[:8], "big")
             & ((1 << 63) - 1) for t in texts),
            dtype=np.int64, count=len(df),
        )
        out = pd.DataFrame(
            {
                "hash64": h,
                self.id_col: df[self.id_col],
                "n_tokens": n_tokens,
            }
        )[keep.to_numpy()]
        # map-side partial dedup: one row per distinct content per batch
        return (out.groupby("hash64", sort=False)
                .agg(**{self.id_col: (self.id_col, "min"),
                        "n_tokens": ("n_tokens", "min")})
                .reset_index())


def clean_corpus(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """documents -> deduplicated quality-filtered (doc_id, n_tokens)."""
    partial = docs_ds.select_columns([text_col, id_col]).map_batches(
        _HashQualityStage(text_col, id_col),
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    )
    from ..util import bucketed_fold

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("hash64", sort=False)
               .agg(**{id_col: (id_col, "min"),
                       "n_tokens": ("n_tokens", "min")})
               .reset_index())
        return agg.astype(np.int64)

    return (bucketed_fold(partial, "hash64", fold)
            .select_columns([id_col, "n_tokens"]))


class _HashSplitStage:
    """Deterministic split assignment from the key's md5 — stable across
    runs, machines and partitionings (never ``random()``: resharding the
    input must not reshuffle the split)."""

    def __init__(self, key_col: str, fractions: dict[str, float]):
        self.key_col = key_col
        self.names = list(fractions)
        cum, acc = [], 0.0
        for n in self.names:
            acc += fractions[n]
            cum.append(acc)
        if abs(acc - 1.0) > 1e-9:
            raise ValueError("split fractions must sum to 1")
        # integer thresholds over the md5-derived 32-bit bucket space
        self.bounds = [int(round(c * (1 << 32))) for c in cum]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        keys = df[self.key_col].astype(str)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(k.encode()).digest()[:4], "big")
             for k in keys),
            dtype=np.int64, count=len(df),
        )
        idx = np.searchsorted(np.asarray(self.bounds), h, side="right")
        idx = np.clip(idx, 0, len(self.names) - 1)
        out = df.copy()
        out["split"] = np.asarray(self.names, dtype=object)[idx]
        return out


def hash_split(ds, key_col: str, fractions: dict[str, float] | None = None):
    """Assign every row a deterministic train/val/test split label.

    ``h = first 4 bytes of md5(str(key))`` as an integer bucket in
    [0, 2^32); fraction boundaries partition that space. DuckDB computes
    the identical value (``('0x' || substr(md5(k), 1, 8))::UBIGINT``), so
    the assignment is oracle-checkable row by row. md5 costs ~1 us/row in
    Python — the price of cross-engine parity; it is embarrassingly
    parallel and never shuffles, so at corpus scale it stays a thin
    streaming map.
    """
    if fractions is None:
        fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    return ds.map_batches(
        _HashSplitStage(key_col, fractions),
        batch_format="pandas",
        batch_size=8192,
        num_cpus=1,
    )


class _TermFreqPartial:
    """Per-batch partial (term -> tf, df).

    Documents are whole rows, so a batch sees each doc completely: the
    per-batch distinct-(doc, term) count is an exact partial of corpus
    document frequency, and the groupby that follows only ships one row
    per distinct term per batch — never raw token streams.
    """

    def __init__(self, text_col: str):
        self.text_col = text_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.lower().str.findall(self.tok)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "tf": pd.Series([], dtype="int64"),
                                 "df": pd.Series([], dtype="int64")})
        pairs = pd.DataFrame({"d": ex.index.to_numpy(), "term": ex.to_numpy()})
        tf = pairs["term"].value_counts()
        dfc = pairs.drop_duplicates()["term"].value_counts()
        out = pd.DataFrame({"term": tf.index.to_numpy(),
                            "tf": tf.to_numpy().astype("int64")})
        out["df"] = dfc.reindex(out["term"]).to_numpy().astype("int64")
        return out


def term_stats(docs_ds, text_col: str = "text"):
    """Corpus-level (term, tf, df) over ASCII word tokens of lower(text)."""
    from ray.data.aggregate import Sum

    from ..util import cluster_cpus

    # tokenize is the CPU-bound stage: 512-doc batches fan it across
    # the cluster (a 4096-doc batch left a 5k-doc corpus on 2 cores —
    # measured 3.0 s -> ~0.6 s at sf0.1)
    partial = docs_ds.select_columns([text_col]).map_batches(
        _TermFreqPartial(text_col), batch_format="pandas",
        batch_size=512, num_cpus=1,
    )
    partial = partial.repartition(max(8, min(64, cluster_cpus())))
    return partial.groupby("term").aggregate(
        Sum("tf", alias_name="tf"), Sum("df", alias_name="df"))


def top_terms(docs_ds, k: int = 50, text_col: str = "text"):
    """Top-k corpus terms by total frequency (ties broken by term asc)."""
    agg = term_stats(docs_ds, text_col)
    return agg.sort(["tf", "term"], descending=[True, False]).limit(k)


class _TfidfTopTerm:
    """Per-doc argmax of tf/df against a broadcast document-frequency table.

    The df side is the *vocabulary* (Heaps-law sublinear in corpus size),
    broadcast once via ``ray.put`` as a sorted term array + df array and
    probed with searchsorted — never a shuffle join of token streams.
    Scoring uses tf/df (one IEEE-754 double division of two int64s), which
    is bit-exact across engines — unlike log-based idf, whose libm rounding
    may differ — so the DuckDB oracle value-matches to the last bit.
    """

    def __init__(self, vocab, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(LOWER_TOKEN_RE)
        self.terms, self.dfs = vocab

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.lower().str.findall(self.tok)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame({self.id_col: pd.Series([], dtype="int64"),
                                 "term": pd.Series([], dtype=object),
                                 "tf": pd.Series([], dtype="int64"),
                                 "df": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        pairs = (pd.DataFrame({"pos": ex.index.to_numpy(),
                               "term": ex.to_numpy()})
                 .groupby(["pos", "term"], sort=False).size()
                 .rename("tf").reset_index())
        idx = np.searchsorted(self.terms, pairs["term"].to_numpy())
        pairs["df"] = self.dfs[idx]
        pairs["score"] = pairs["tf"].to_numpy() / pairs["df"].to_numpy()
        # deterministic per-doc argmax: score desc, then term asc
        pairs = pairs.sort_values(["pos", "score", "term"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        best = pairs.drop_duplicates("pos", keep="first")
        out = pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy()[best["pos"].to_numpy()],
            "term": best["term"].to_numpy(),
            "tf": best["tf"].to_numpy().astype("int64"),
            "df": best["df"].to_numpy().astype("int64"),
            "score": best["score"].to_numpy(),
        })
        return out


def tfidf_top_term(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """For every doc, its highest-scoring term by tf/df (rarity-weighted).

    Two streaming passes over documents: pass 1 folds the corpus df table
    (one row per distinct term per batch into a small groupby); pass 2
    probes the broadcast vocabulary per batch. The vocabulary pull to the
    driver is the one materialization, and it is vocabulary-sized, not
    corpus-sized.
    """
    import ray

    stats = term_stats(docs_ds, text_col).to_pandas()
    order = np.argsort(stats["term"].to_numpy())
    terms = stats["term"].to_numpy()[order]
    dfs = stats["df"].to_numpy()[order].astype("int64")
    # the vocabulary is Heaps-law small: ship it BY VALUE in the actor
    # ctor args (serialized once per actor) instead of an ObjectRef —
    # a ref in fn_constructor_args makes Ray log a restart-safety error
    # per actor (ray#53727). ray.put stays the pattern for big sides.

    return docs_ds.select_columns([text_col, id_col]).map_batches(
        _TfidfTopTerm, fn_constructor_args=((terms, dfs), text_col, id_col),
        batch_format="pandas", batch_size=4096, concurrency=(1, 8),
        # deterministic stage, args live in the plan: disable actor restart
        # so Ray stops logging the restart-safety error per actor (#53727);
        # a lost actor re-executes through Ray Data's task retry instead
        max_restarts=0,
    )


def inverted_index(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Build a term -> posting-list index (sorted distinct doc ids).

    The map side emits distinct (term, doc) pairs per batch (dedup within
    the doc happens before the shuffle); the keyed ``map_groups`` folds
    each term's postings into a sorted comma-joined list. Postings ARE the
    index payload, so the shuffle volume here is the output size — at
    corpus scale you shard this by term hash (the groupby already does)
    and write one postings shard per partition.
    """
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        tok = re.compile(LOWER_TOKEN_RE)
        toks = df[text_col].str.lower().str.findall(tok)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype="int64")})
        out = pd.DataFrame({
            "term": ex.to_numpy(),
            id_col: df[id_col].to_numpy()[ex.index.to_numpy()],
        })
        return out.drop_duplicates()

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        return pd.DataFrame({
            "term": [g["term"].iloc[0]],
            "n_docs": np.int64(len(ids)),
            "postings": [",".join(str(i) for i in ids)],
        })

    partial = docs_ds.select_columns([text_col, id_col]).map_batches(
        pairs, batch_format="pandas", batch_size=4096, num_cpus=1)
    return partial.groupby("term").map_groups(fold, batch_format="pandas")


class _SearchStage:
    """Conjunctive keyword search: one streaming pass, no index required.

    For each doc: keep iff every query term occurs; rank score = total
    occurrences of query terms. The query term set is tiny and lives in
    the actor; per-batch work is the same vectorized tokenize as the
    other corpus stages plus a K-column membership test.
    """

    def __init__(self, terms: list[str], text_col: str, id_col: str):
        self.terms = sorted(terms)
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.lower().str.findall(self.tok)
        ex = toks.explode().dropna()
        ex = ex[ex.isin(self.terms)]
        if len(ex) == 0:
            return pd.DataFrame({self.id_col: pd.Series([], dtype="int64"),
                                 "match_tf": pd.Series([], dtype="int64")})
        hits = (pd.DataFrame({"pos": ex.index.to_numpy(), "t": ex.to_numpy()})
                .groupby(["pos", "t"], sort=False).size().rename("c")
                .reset_index())
        per_doc = hits.groupby("pos", sort=False).agg(
            n_terms=("t", "nunique"), match_tf=("c", "sum")).reset_index()
        keep = per_doc[per_doc["n_terms"] == len(self.terms)]
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy()[keep["pos"].to_numpy()],
            "match_tf": keep["match_tf"].to_numpy().astype("int64"),
        })


def search_all_terms(docs_ds, terms: list[str], text_col: str = "text",
                     id_col: str = "doc_id"):
    """Docs containing ALL query terms, with total-match-count rank score."""
    return docs_ds.select_columns([text_col, id_col]).map_batches(
        _SearchStage(terms, text_col, id_col), batch_format="pandas",
        batch_size=4096, num_cpus=1)


def sample_bottom_k(ds, key_col: str, k: int = 100):
    """Deterministic uniform k-sample without replacement: the k smallest
    md5-hash values of the key.

    Resharding/reordering the input cannot change the sample (the sample
    is a pure function of the key set), and the map side keeps only its
    batch-local k smallest rows, so the final sort sees k rows per batch
    — never the dataset. The same md5 idiom as hash_split makes the
    selection DuckDB-replayable row by row.
    """
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].astype(str)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
             for s in keys),
            dtype=np.int64, count=len(df),
        )
        out = pd.DataFrame({key_col: df[key_col], "h": h})
        return out.nsmallest(k, ["h", key_col])

    return (ds.select_columns([key_col])
            .map_batches(partial, batch_format="pandas", batch_size=8192,
                         num_cpus=1)
            .sort(["h", key_col]).limit(k))


def pack_sequences(docs_ds, capacity: int = 256, n_shards: int = 4,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Sequence packing for LLM training: assign documents to fixed
    token-budget bins (next-fit over a deterministic order) — the step
    that turns a cleaned corpus into dense training sequences.

    Packing is inherently sequential, so it shards first: docs hash to
    ``n_shards`` independent streams (the same md5 bucket idiom as
    hash_split — DuckDB computes identical shard ids), each shard packs
    next-fit over its (token_count desc, doc_id) order, and shards pack
    in parallel with no coordination. Bin quality is within-shard
    next-fit-decreasing; ``n_shards`` trades parallelism against
    cross-shard fill (shards never share bins — at corpus scale one
    shard per worker keeps the scan O(rows/shard)).

    Tokens = whitespace-delimited (``\\S+``), the docs_token_stats
    definition. Docs longer than ``capacity`` get a bin of their own
    (next-fit semantics: the running bin closes, the big doc fills a new
    one — never dropped silently).

    Output: (doc_id, shard, n_tokens, bin_no) — bin_no is 0-based within
    the shard. Oracle: a per-shard recursive CTE replays the identical
    next-fit scan.
    """
    import hashlib

    tok = re.compile(r"\S+")

    def with_meta(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = df[text_col].str.findall(tok).str.len().astype("int64")
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
             for s in df[id_col].astype(str)),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({id_col: df[id_col],
                             "shard": (h % n_shards).astype(np.int64),
                             "n_tokens": n_tok})

    meta = docs_ds.select_columns([id_col, text_col]).map_batches(
        with_meta, batch_format="pandas", batch_size=4096)

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_tokens", id_col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
        toks = g.n_tokens.to_numpy()
        bins = np.empty(len(g), np.int64)
        fill, b = 0, 0
        first = True
        for i, t in enumerate(toks):  # next-fit: O(rows/shard) scan
            if first:
                fill, b, first = int(t), 0, False
            elif fill + t <= capacity:
                fill += int(t)
            else:
                b += 1
                fill = int(t)
            bins[i] = b
        g["bin_no"] = bins
        return g[[id_col, "shard", "n_tokens", "bin_no"]]

    return meta.groupby("shard").map_groups(pack_shard,
                                            batch_format="pandas")


def term_cooccurrence(docs_ds, top_k: int = 20, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Document co-occurrence counts between the corpus's top-k terms —
    the graph-edge extraction step (PMI / embedding-training pairs).

    Unbounded per-doc term-pair explosion is quadratic in vocabulary; the
    scale-safe plan restricts pairs to the TOP-K global terms: pass 1 is
    the existing term-frequency fold + a k-row driver pull; pass 2 maps
    each doc to its distinct top-term subset (a k-bit membership mask —
    one int per doc) and emits the <= k(k-1)/2 present pairs as count
    partials. Shuffle volume: at most k^2/2 rows per batch.

    Output: (term_a, term_b, n_docs) with term_a < term_b.
    """
    from ray.data.aggregate import Sum

    top = top_terms(docs_ds, k=top_k, text_col=text_col).to_pandas()
    terms = np.sort(top["term"].to_numpy())

    class _Pairs:
        def __init__(self):
            self.tok = re.compile(LOWER_TOKEN_RE)
            self.terms = terms

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            toks = df[text_col].str.lower().str.findall(self.tok)
            rows_a, rows_b, ns = [], [], []
            counts: dict[tuple[str, str], int] = {}
            for doc_terms in toks:
                present = np.unique(np.asarray(doc_terms, dtype=object))
                idx = np.searchsorted(self.terms, present)
                ok = (idx < len(self.terms))
                idx = idx[ok]
                hit = idx[self.terms[idx] == present[ok]]
                hit = np.unique(hit)
                for a in range(len(hit)):
                    for b in range(a + 1, len(hit)):
                        key = (self.terms[hit[a]], self.terms[hit[b]])
                        counts[key] = counts.get(key, 0) + 1
            for (a, b), n in counts.items():
                rows_a.append(a)
                rows_b.append(b)
                ns.append(n)
            return pd.DataFrame({"term_a": rows_a, "term_b": rows_b,
                                 "n_docs": np.array(ns, np.int64)})

    partials = docs_ds.select_columns([text_col]).map_batches(
        _Pairs, batch_format="pandas", batch_size=512, concurrency=(1, 8),
        max_restarts=0)
    return partials.groupby(["term_a", "term_b"]).aggregate(
        Sum("n_docs", alias_name="n_docs"))


def epoch_shuffle(docs_ds, seed: int = 0, n_shards: int = 8,
                  id_col: str = "doc_id"):
    """Deterministic training-epoch shuffle: every row gets a (shard,
    position) under a seeded pseudo-random permutation — the distributed
    shuffle-for-SGD step, reproducible across runs and resharding.

    Key = md5(seed || id): changing ``seed`` re-permutes every epoch;
    the permutation is a pure function of (seed, id set) so a resumed or
    re-run epoch reads the identical order. Shard = key mod n_shards
    (NOT a range-split of the hash: mod mixes the orderless low bits);
    position = rank of the key within the shard. One keyed shuffle of
    (id, key) pairs; payload columns stay where they are and join back
    by id when the training reader consumes the plan.
    """
    import hashlib

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        pref = f"{seed}:".encode()
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(pref + s.encode()).digest()[:8],
                            "big") >> 1  # keep it positive in int64
             for s in df[id_col].astype(str)),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({id_col: df[id_col], "h": h,
                             "shard": (h % n_shards).astype(np.int64)})

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="mergesort").reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g[[id_col, "shard", "pos"]]

    return (docs_ds.select_columns([id_col])
            .map_batches(keyed, batch_format="pandas", batch_size=8192)
            .groupby("shard")
            .map_groups(rank_shard, batch_format="pandas"))


def heavy_hitters(docs_ds, k: int = 10, sketch_k: int = 256,
                  text_col: str = "text"):
    """Two-pass EXACT heavy hitters with bounded scan state: Misra-Gries
    candidate sketch, then an exact verify pass over the candidates only.

    Pass 1 folds a Misra-Gries summary per batch (exact batch counts,
    compressed by decrementing the (sketch_k+1)-th largest — the classic
    mergeable-summaries compress). Summaries merge by term-wise SUM then a
    driver-side re-compress: per-worker state is O(sketch_k) no matter the
    corpus size — unlike the exact ``top_terms`` fold, whose shuffle
    carries the entire vocabulary. MG guarantee: every term with frequency
    > N/(sketch_k+1) survives; with sketch_k >> k the true top-k are
    candidates (the standard two-pass heavy-hitter assumption).

    Pass 2 exact-counts the <= sketch_k candidates (broadcast sorted term
    array, integer partials) and emits the exact top-k (ties -> term asc),
    so the final answer is SQL-checkable despite the sketch.
    """
    import ray
    from ray.data.aggregate import Sum

    tok = re.compile(LOWER_TOKEN_RE)

    def mg_partial(df: pd.DataFrame):
        import pyarrow as _pa

        ex = df[text_col].str.lower().str.findall(tok).explode().dropna()
        if len(ex) == 0:  # explicit types: empty object cols degrade schemas
            return _pa.table({"term": _pa.array([], _pa.string()),
                              "cnt": _pa.array([], _pa.int64())})
        vc = ex.value_counts()  # exact within the batch, sorted desc
        if len(vc) > sketch_k:
            thresh = int(vc.iloc[sketch_k])
            vc = vc - thresh
            vc = vc[vc > 0]
        return _pa.table({"term": _pa.array(vc.index.tolist(), _pa.string()),
                          "cnt": _pa.array(vc.to_numpy().astype("int64"),
                                           _pa.int64())})

    merged = (docs_ds.select_columns([text_col])
              .map_batches(mg_partial, batch_format="pandas",
                           batch_size=4096, num_cpus=1)
              .groupby("term").aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())  # <= sketch_k x n_batches rows, tiny
    merged = merged.sort_values(["cnt", "term"], ascending=[False, True])
    if len(merged) > sketch_k:  # final MG compress of the merged summary
        thresh = int(merged["cnt"].iloc[sketch_k])
        merged = merged[merged["cnt"] > thresh]
    cands = np.sort(merged["term"].to_numpy().astype(object))
    cands_ref = ray.put(cands)

    def exact_partial(df: pd.DataFrame):
        import pyarrow as _pa

        cs = ray.get(cands_ref)
        ex = df[text_col].str.lower().str.findall(tok).explode().dropna()
        if len(ex) == 0 or len(cs) == 0:
            return _pa.table({"term": _pa.array([], _pa.string()),
                              "tf": _pa.array([], _pa.int64())})
        terms = ex.to_numpy().astype(object)
        pos = np.searchsorted(cs, terms)
        pos_c = np.clip(pos, 0, len(cs) - 1)
        keep = cs[pos_c] == terms
        vc = pd.Series(terms[keep]).value_counts()
        return _pa.table({"term": _pa.array(vc.index.tolist(), _pa.string()),
                          "tf": _pa.array(vc.to_numpy().astype("int64"),
                                          _pa.int64())})

    return (docs_ds.select_columns([text_col])
            .map_batches(exact_partial, batch_format="pandas",
                         batch_size=4096, num_cpus=1)
            .groupby("term").aggregate(Sum("tf", alias_name="tf"))
            .sort(["tf", "term"], descending=[True, False]).limit(k))


def source_stats(docs_ds, text_col: str = "text"):
    """Per-source corpus accounting (the first dashboard of any
    training-data pipeline): documents, characters and tokens per source.
    Map-side partials; the shuffle carries one row per source per batch.
    """
    from ray.data.aggregate import Sum

    tok = re.compile(LOWER_TOKEN_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ntok = df[text_col].str.lower().str.count(tok).astype("int64")
        g = pd.DataFrame({
            "source": df["source"],
            "n_docs": 1,
            "sum_chars": df["n_chars"].astype("int64"),
            "n_tokens": ntok,
        }).groupby("source", sort=False).sum().reset_index()
        return g

    return (docs_ds.select_columns(["source", "n_chars", text_col])
            .map_batches(partial, batch_format="pandas", batch_size=4096)
            .groupby("source")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("sum_chars", alias_name="sum_chars"),
                       Sum("n_tokens", alias_name="n_tokens")))


def vocab_growth(docs_ds, checkpoints: tuple[int, ...] = (100, 200, 300,
                                                          400, 500),
                 text_col: str = "text", id_col: str = "doc_id"):
    """Vocabulary-growth (Heaps-law) report: |vocab of the first k docs|
    at each checkpoint, where "first" is doc-id order.

    Sequential on its face, but first-appearance is an associative Min:
    fold (term -> min doc id) with per-batch partials and one keyed
    groupby (vocabulary-sized, never token streams), then bucket the
    first-appearance ids against the checkpoints — a cumulative histogram
    on the driver over |vocab| rows.
    """

    tok = re.compile(LOWER_TOKEN_RE)

    def partial(df: pd.DataFrame):
        import pyarrow as _pa

        toks = df[text_col].str.lower().str.findall(tok)
        ex = toks.explode().dropna()
        if len(ex) == 0:
            return _pa.table({"term": _pa.array([], _pa.string()),
                              "first_doc": _pa.array([], _pa.int64())})
        ids = df[id_col].to_numpy()
        pairs = pd.DataFrame({"term": ex.to_numpy(),
                              "first_doc": ids[ex.index.to_numpy()]})
        g = pairs.groupby("term", sort=False)["first_doc"].min().reset_index()
        return _pa.table({
            "term": _pa.array(g["term"].tolist(), _pa.string()),
            "first_doc": _pa.array(g["first_doc"].to_numpy(np.int64),
                                   _pa.int64()),
        })

    from ..util import bucketed_fold

    def min_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("term", sort=False)["first_doc"].min()
               .reset_index())
        agg["first_doc"] = agg["first_doc"].astype(np.int64)
        return agg

    firsts = (bucketed_fold(
        docs_ds.select_columns([id_col, text_col])
        .map_batches(partial, batch_format="pandas", batch_size=512),
        "term", min_fold)
        .to_pandas())  # vocabulary-sized
    fd = np.sort(firsts["first_doc"].to_numpy())
    ck = np.asarray(checkpoints, np.int64)
    vocab = np.searchsorted(fd, ck, side="left")  # first_doc < k
    return pa.table({
        "n_docs": pa.array(ck, pa.int64()),
        "vocab_size": pa.array(vocab.astype(np.int64), pa.int64()),
    })


class _NgramSetPartial:
    """Per-batch distinct word n-grams (space-joined strings)."""

    def __init__(self, n: int, text_col: str):
        self.n = n
        self.text_col = text_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def doc_ngrams(self, text: str) -> set:
        ws = self.tok.findall(text.lower())
        n = self.n
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        acc = set()
        for t in df[self.text_col]:
            acc |= self.doc_ngrams(t)
        return pd.DataFrame({"ngram": pd.Series(sorted(acc), dtype=object)})


class _ContaminationCount:
    """Distinct benchmark n-grams per training doc (broadcast set probe)."""

    def __init__(self, bench_ref, n: int, bench_mod: int, text_col: str,
                 id_col: str):
        self.bench_ref = bench_ref
        self.helper = _NgramSetPartial(n, text_col)
        self.bench_mod = bench_mod
        self.text_col = text_col
        self.id_col = id_col
        self._bench = None

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import ray

        if self._bench is None:
            self._bench = ray.get(self.bench_ref)
        bench = self._bench
        # bench_mod None: the benchmark is external (bench_ds) and every
        # corpus doc is a training doc
        train = (df if self.bench_mod is None
                 else df[df[self.id_col] % self.bench_mod != 0])
        hits = np.fromiter(
            (len(self.helper.doc_ngrams(t) & bench)
             for t in train[self.text_col]),
            dtype=np.int64, count=len(train))
        keep = hits > 0
        return pd.DataFrame({
            self.id_col: train[self.id_col].to_numpy()[keep],
            "n_hits": hits[keep],
        })


def decontaminate(docs_ds, n: int = 8, bench_mod: int = 7,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_ds=None):
    """Benchmark decontamination: flag training documents sharing any
    word-level n-gram with a held-out benchmark set.

    The classic contamination check (GPT-3 App. C / PaLM style: 8-13-gram
    overlap against eval sets). In production pass the REAL eval suite as
    ``bench_ds`` — a fixed external set whose size does not grow with the
    corpus, which is what justifies folding its distinct n-grams to the
    driver and broadcasting once via ``ray.put``. With ``bench_ds=None``
    the mod-``bench_mod`` id slice of the corpus stands in for tests and
    oracles; note that THIS predicate selects a constant FRACTION of the
    corpus, so it is only a fixture-scale stand-in, not the scale plan.
    The training pass is a pure map (set probe per doc, no shuffle).
    Returns (doc_id, n_hits) for contaminated docs, n_hits = DISTINCT
    shared n-grams.
    """
    import ray

    src = bench_ds if bench_ds is not None else docs_ds
    helper = _NgramSetPartial(n, text_col)
    if bench_ds is not None:
        def bpartial(df, _h=helper):
            return _h(df)
    else:
        def bpartial(df, _h=helper):
            return _h(df[df[id_col] % bench_mod == 0])
    cols = [text_col] if bench_ds is not None else [id_col, text_col]
    bench_parts = (src.select_columns(cols)
                   .map_batches(bpartial, batch_format="pandas",
                                batch_size=4096, num_cpus=1)
                   .to_pandas())
    bench = frozenset(bench_parts["ngram"].tolist())
    bench_ref = ray.put(bench)
    mod = None if bench_ds is not None else bench_mod
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _ContaminationCount(bench_ref, n, mod, text_col, id_col),
        batch_format="pandas", batch_size=4096, num_cpus=1)


class _BigramPartial:
    """Per-batch bigram counts over lower-token streams."""

    def __init__(self, text_col: str):
        self.text_col = text_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        acc = Counter()
        for t in df[self.text_col]:
            ws = self.tok.findall(t.lower())
            acc.update(zip(ws, ws[1:]))
        if not acc:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        items = sorted(acc.items())
        return pd.DataFrame({
            "w1": [k[0] for k, _ in items],
            "w2": [k[1] for k, _ in items],
            "n": pd.Series([v for _, v in items], dtype="int64"),
        })


def bigram_top(docs_ds, k: int = 30, text_col: str = "text"):
    """Top-k corpus bigrams (the n-gram LM count table input): map-side
    Counter partials per batch — the shuffle carries one row per distinct
    bigram per batch, never token streams — then one keyed groupby + a
    bounded top-k sort. Ties break lexicographically."""

    from ..util import bucketed_sum

    partial = docs_ds.select_columns([text_col]).map_batches(
        _BigramPartial(text_col), batch_format="pandas",
        batch_size=512, num_cpus=1)
    return (bucketed_sum(partial, ["w1", "w2"], "n")
            .sort(["n", "w1", "w2"], descending=[True, False, False])
            .limit(k))


class _ContextWindows:
    """Strided fixed-length token windows per doc (intra-row, no shuffle)."""

    def __init__(self, win: int, stride: int, text_col: str, id_col: str):
        self.win = win
        self.stride = stride
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids_out, starts, lens = [], [], []
        for did, t in zip(df[self.id_col], df[self.text_col]):
            n = len(self.tok.findall(t.lower()))
            if n == 0:
                continue
            s = 0
            while s < n:
                ids_out.append(did)
                starts.append(s)
                lens.append(min(self.win, n - s))
                if s + self.win >= n:
                    break
                s += self.stride
        return pd.DataFrame({
            self.id_col: pd.Series(ids_out, dtype="int64"),
            "win_start": pd.Series(starts, dtype="int64"),
            "win_len": pd.Series(lens, dtype="int64"),
        })


def context_windows(docs_ds, win: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Strided context-window extraction (the LLM pretraining chunker):
    each doc emits fixed-length token windows at ``stride`` offsets, the
    final window clipped to the doc end (and emitted once even when the
    doc is shorter than one window). Pure per-row map — zero shuffle;
    the flat-map row expansion is bounded by tokens/stride."""
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _ContextWindows(win, stride, text_col, id_col),
        batch_format="pandas", batch_size=4096, num_cpus=1)


class _RepetitionStage:
    """Per-doc within-document repetition signals (one pass, no shuffle)."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n_docs = len(df)
        out = {
            "n_tokens": np.zeros(n_docs, np.int64),
            "top_word_cnt": np.zeros(n_docs, np.int64),
            "n_2grams": np.zeros(n_docs, np.int64),
            "top_2gram_cnt": np.zeros(n_docs, np.int64),
            "n_3grams": np.zeros(n_docs, np.int64),
            "dup_3gram_pos": np.zeros(n_docs, np.int64),
        }
        for j, text in enumerate(df[self.text_col]):
            ws = self.tok.findall(text.lower())
            n = len(ws)
            out["n_tokens"][j] = n
            if n == 0:
                continue
            arr = np.asarray(ws, dtype=object)
            out["top_word_cnt"][j] = int(
                np.unique(arr, return_counts=True)[1].max())
            if n >= 2:
                bg = np.asarray([f"{ws[i]} {ws[i + 1]}"
                                 for i in range(n - 1)], dtype=object)
                out["n_2grams"][j] = n - 1
                out["top_2gram_cnt"][j] = int(
                    np.unique(bg, return_counts=True)[1].max())
            if n >= 3:
                tg = np.asarray([" ".join(ws[i:i + 3])
                                 for i in range(n - 2)], dtype=object)
                out["n_3grams"][j] = n - 2
                cnt = np.unique(tg, return_counts=True)[1]
                out["dup_3gram_pos"][j] = int(cnt[cnt > 1].sum())
        res = pd.DataFrame({self.id_col: df[self.id_col].to_numpy(), **out})
        res["flagged"] = (
            (res["top_word_cnt"] * 5 > res["n_tokens"])
            | (res["top_2gram_cnt"] * 5 > res["n_2grams"])
            | (res["dup_3gram_pos"] * 2 > res["n_3grams"])
        ).astype(np.int64)
        return res


def repetition_signals(docs_ds, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Gopher-style within-document repetition quality signals.

    The repetition family of the Gopher/MassiveText quality rules (Rae et
    al. 2021, Table A1): documents dominated by one token, one bigram, or
    by repeated trigram spans are low-quality (boilerplate, keyword spam,
    degenerate generations) and get ``flagged``. Exact integer-rational
    thresholds so DuckDB replays the rule bit-for-bit:

    - ``top_word_cnt * 5  > n_tokens``  (top token > 1/5 of tokens)
    - ``top_2gram_cnt * 5 > n_2grams``  (top bigram > 1/5 of bigrams)
    - ``dup_3gram_pos * 2 > n_3grams``  (>1/2 of trigram positions lie in
      trigrams occurring more than once)

    Pure per-row map over token streams — zero shuffle at any corpus size;
    the per-doc state is one token array. Returns one row per document:
    (doc_id, n_tokens, top_word_cnt, n_2grams, top_2gram_cnt, n_3grams,
    dup_3gram_pos, flagged 0/1).
    """
    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _RepetitionStage(text_col, id_col),
        batch_format="pandas", batch_size=4096, num_cpus=1)


def _ngram_md5_keys(ngrams: list) -> np.ndarray:
    """uint64 keys (first 8 md5 bytes) for n-gram strings, for Bloom use."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
         for g in ngrams), dtype=np.uint64, count=len(ngrams))


def bloom_decontaminate(docs_ds, n: int = 8, bench_mod: int = 7,
                        m_bits: int = 1 << 17,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_ds=None):
    """``decontaminate()`` for benchmark sets too big to broadcast exactly.

    The broadcast path folds the benchmark's DISTINCT n-grams into one
    driver-side frozenset — memory grows with the benchmark. This variant
    replaces the broadcast SET with a FIXED-size Bloom bitmap (associative
    OR-fold of per-batch partial bitmaps, m/8 bytes each regardless of
    n-gram count), so the training pass ships only ``m_bits/8`` bytes to
    every worker. Bloom hits (false-positive-bounded: (1-e^{-2n/m})^2 per
    probe) emit (doc, ngram) rows; the EXACT verify is a distributed hash
    semi-join of those rows against the benchmark's distinct-n-gram rows,
    so the output equals ``decontaminate()`` bit-for-bit — the filter only
    prunes, never decides (the bloom_semijoin_shipmode contract, applied
    to the GPT-3-style 8-gram contamination check).

    Returns (doc_id, n_hits) for contaminated training docs.
    """
    import ray
    from ray.data.aggregate import Count

    from .relational import _bloom_build, _bloom_maybe
    from ..util import drop_empty_blocks

    helper = _NgramSetPartial(n, text_col)
    src = bench_ds if bench_ds is not None else docs_ds
    if bench_ds is not None:
        def bpartial(df, _h=helper):
            return _h(df)
    else:
        def bpartial(df, _h=helper):
            return _h(df[df[id_col] % bench_mod == 0])
    cols = [text_col] if bench_ds is not None else [id_col, text_col]
    # benchmark distinct n-gram ROWS (stay distributed; benchmark-bounded).
    # distinct via ~16 coarse hash buckets + vectorized drop_duplicates per
    # bucket — a groupby on the ngram itself pays Python per distinct key
    # (the high-cardinality-groupby lesson, see graph/dedup pair-distinct)
    nparts = 16

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        import zlib

        df = df.drop_duplicates(["ngram"])
        # crc32, NOT hash(): Python string hashing is per-process salted,
        # and the same ngram must land in the same bucket on every worker
        pk = np.fromiter((zlib.crc32(g.encode()) % nparts
                          for g in df["ngram"]),
                         dtype=np.int64, count=len(df))
        return pd.DataFrame({"pk": pk, "ngram": df["ngram"].to_numpy()})

    bench_ng = (src.select_columns(cols)
                .map_batches(bpartial, batch_format="pandas",
                             batch_size=4096, num_cpus=1)
                .map_batches(bucketed, batch_format="pandas")
                .groupby("pk")
                .map_groups(lambda g: g.drop_duplicates(["ngram"])[["ngram"]],
                            batch_format="pandas"))
    bench_ng = drop_empty_blocks(
        bench_ng.materialize(), pa.schema([("ngram", pa.string())]))

    # fixed-size bitmap: per-batch partial OR (m/8 bytes per batch, constant
    # in benchmark size), folded on the driver, broadcast once
    def bbloom(t: pa.Table) -> pa.Table:
        keys = _ngram_md5_keys(t.column("ngram").to_pylist())
        bm = _bloom_build(keys.astype(np.int64), m_bits)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    bm = np.zeros(m_bits // 8, np.uint8)
    for row in bench_ng.map_batches(bbloom, batch_format="pyarrow",
                                    batch_size=65536).take_all():
        bm |= np.frombuffer(row["bm"], np.uint8)
    bm_ref = ray.put(bm)

    mod = None if bench_ds is not None else bench_mod

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bm_ref)
        train = df if mod is None else df[df[id_col] % mod != 0]
        out_id, out_g = [], []
        for doc_id, text in zip(train[id_col], train[text_col]):
            ngs = sorted(helper.doc_ngrams(text))
            if not ngs:
                continue
            keys = _ngram_md5_keys(ngs)
            hit = _bloom_maybe(bmap, keys.astype(np.int64), m_bits)
            for j in np.flatnonzero(hit):
                out_id.append(doc_id)
                out_g.append(ngs[j])
        return pd.DataFrame({id_col: pd.Series(out_id, dtype=np.int64),
                             "ngram": pd.Series(out_g, dtype=object)})

    hits = docs_ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pandas", batch_size=4096, num_cpus=1)
    bench_bg = bench_ng.map_batches(
        lambda t: pa.table({"bg": t.column("ngram").cast(pa.string())}),
        batch_format="pyarrow")
    from ..util import auto_join_partitions

    verified = hits.join(bench_bg, join_type="inner",
                         num_partitions=auto_join_partitions(bench_ng,
                                                             pools=1),
                         on=("ngram",), right_on=("bg",))
    return (verified.groupby(id_col)
            .aggregate(Count(alias_name="n_hits")))


def weighted_sample(ds, key_col: str = "doc_id",
                    weight_col: str = "n_chars", k: int = 64):
    """Deterministic weighted bottom-k sample: priority = h(key) //
    max(weight, 1) with h = the first 8 md5 bytes of the key — an
    integer-exact analog of weighted reservoir sampling (A-ES keys
    u^(1/w) are float; integer division keeps the whole draw
    SQL-replayable) where doubling a row's weight roughly doubles its
    selection odds. The k smallest priorities win, ties to the smaller
    key.

    Mergeable: per-batch bottom-k partials cap the final sort at k rows
    per batch — the sampling shuffle never carries the corpus. Returns
    (key, weight, priority) for the k sampled rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        w = np.maximum(np.asarray(t.column(weight_col).to_pylist(),
                                  dtype=np.int64), 1)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(x).encode()).digest()[:8],
                            "big") for x in keys),
            dtype=np.uint64, count=len(keys))
        pr = h // w.astype(np.uint64)
        order = np.lexsort((np.asarray(keys), pr))[:k]
        order = np.sort(order)
        return pa.table({
            key_col: pa.array([keys[i] for i in order], pa.int64()),
            weight_col: pa.array(w[order].astype(np.int64), pa.int64()),
            "priority": pa.array(pr[order], pa.uint64()),
        })

    return (ds.select_columns([key_col, weight_col])
            .map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .sort(["priority", key_col]).limit(k))


def lm_bits_score(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """CCNet-shaped language-model quality score, integer-exact.

    The perplexity-filter pattern (CCNet / KenLM: score every document
    under a corpus LM, gate on the score) with the log2 made EXACTLY
    replayable: per adjacent token pair (w1, w2),

        bits += bit_length(count(w1)) - bit_length(count(w1 w2))

    i.e. the integer floor-log2 surrogate of -log2 P(w2|w1); DuckDB
    computes the identical value as length(bin(c)). Two passes, both
    scale-safe: (1) corpus unigram/bigram count tables — VOCABULARY-
    bounded (Heaps-law sublinear), folded once and broadcast via
    ray.put as sorted key arrays + bit-length arrays; (2) a pure
    streaming map scoring each doc by searchsorted lookups — no shuffle
    touches the corpus. Every doc's bigrams occur in the corpus (the doc
    is in it), so lookups never miss. Returns (doc_id, n_bigrams,
    lm_bits); higher bits-per-bigram = less predictable = lower quality
    under the corpus model.
    """
    import ray

    tok = re.compile(LOWER_TOKEN_RE)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        u: dict = {}
        b: dict = {}
        for t in df[text_col]:
            ws = tok.findall(t.lower())
            for w in ws:
                u[w] = u.get(w, 0) + 1
            for i in range(len(ws) - 1):
                k = ws[i] + " " + ws[i + 1]
                b[k] = b.get(k, 0) + 1
        keys = ["u\x1f" + k for k in u] + ["b\x1f" + k for k in b]
        cnts = list(u.values()) + list(b.values())
        return pd.DataFrame({"k": pd.Series(keys, dtype=object),
                             "c": pd.Series(cnts, dtype=np.int64)})

    # vocabulary-bounded fold: coarse crc32 buckets + vectorized sum —
    # never a Python call per distinct key
    nparts = 16

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        import zlib as _z

        g = df.groupby("k", sort=False)["c"].sum().reset_index()
        g["pk"] = np.fromiter((_z.crc32(s.encode()) % nparts
                               for s in g["k"]), dtype=np.int64,
                              count=len(g))
        return g

    counts = (docs_ds.select_columns([text_col])
              .map_batches(count_partial, batch_format="pandas",
                           batch_size=4096, num_cpus=1)
              .map_batches(bucketed, batch_format="pandas")
              .groupby("pk")
              .map_groups(lambda g: g.groupby("k", sort=False)["c"].sum()
                          .reset_index(), batch_format="pandas")
              .to_pandas())  # vocab + bigram-vocab rows: Heaps-bounded
    is_u = counts["k"].str.startswith("u\x1f")
    u_keys = np.sort(counts.loc[is_u, "k"].str[2:].to_numpy(dtype=object))
    u_bits = np.zeros(len(u_keys), np.int64)
    uc = dict(zip(counts.loc[is_u, "k"].str[2:], counts.loc[is_u, "c"]))
    for i, k in enumerate(u_keys):
        u_bits[i] = int(uc[k]).bit_length()
    b_keys = np.sort(counts.loc[~is_u, "k"].str[2:].to_numpy(dtype=object))
    bc = dict(zip(counts.loc[~is_u, "k"].str[2:], counts.loc[~is_u, "c"]))
    b_bits = np.zeros(len(b_keys), np.int64)
    for i, k in enumerate(b_keys):
        b_bits[i] = int(bc[k]).bit_length()
    model_ref = ray.put((u_keys, u_bits, b_keys, b_bits))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        uk, ub, bk, bb = ray.get(model_ref)
        out_id = df[id_col].to_numpy()
        n_bg = np.zeros(len(df), np.int64)
        bits = np.zeros(len(df), np.int64)
        for j, t in enumerate(df[text_col]):
            ws = tok.findall(t.lower())
            if len(ws) < 2:
                continue
            w1 = np.asarray(ws[:-1], dtype=object)
            pair = np.asarray([ws[i] + " " + ws[i + 1]
                               for i in range(len(ws) - 1)], dtype=object)
            n_bg[j] = len(pair)
            bits[j] = int(ub[np.searchsorted(uk, w1)].sum()
                          - bb[np.searchsorted(bk, pair)].sum())
        return pd.DataFrame({id_col: out_id, "n_bigrams": n_bg,
                             "lm_bits": bits})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=4096, num_cpus=1)


def dsir_scores(docs_ds, target_mod: int = 9, n_buckets: int = 8192,
                text_col: str = "text", id_col: str = "doc_id"):
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    with integer-exact scoring: hashed-bigram importance weight of every
    raw document against a target-domain slice,

        score = sum_g [bl(c_tgt(g)) - bl(N_tgt) - bl(c_raw(g)) + bl(N_raw)]

    over the doc's bigrams g hashed into ``n_buckets`` md5 buckets, with
    bl = bit_length (bl(0) = 0) — the floor-log2 surrogate of
    log p_tgt(g)/p_raw(g) that DuckDB replays exactly (length(bin(c))
    guarded at 0). The bucketed model is FIXED-size (two n_buckets count
    arrays) regardless of corpus scale — DSIR's entire point — folded
    once, broadcast once; scoring is a pure streaming map. The target
    stands in as the mod-``target_mod`` id slice (same fixture-scale
    convention as decontaminate; pass a real target via its own table in
    production). Returns (doc_id, n_bigrams, dsir_score) for raw
    (non-target) docs.
    """
    import ray

    tok = re.compile(LOWER_TOKEN_RE)

    def buckets_of(text: str) -> np.ndarray:
        ws = tok.findall(text.lower())
        if len(ws) < 2:
            return np.empty(0, np.int64)
        return np.fromiter(
            (int.from_bytes(
                hashlib.md5((ws[i] + " " + ws[i + 1]).encode()).digest()[:4],
                "big") % n_buckets for i in range(len(ws) - 1)),
            dtype=np.int64, count=len(ws) - 1)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        tgt = np.zeros(n_buckets, np.int64)
        raw = np.zeros(n_buckets, np.int64)
        for doc_id, t in zip(df[id_col], df[text_col]):
            b = buckets_of(t)
            if len(b) == 0:
                continue
            acc = tgt if doc_id % target_mod == 0 else raw
            np.add.at(acc, b, 1)
        return pd.DataFrame({"tgt": [tgt.tobytes()], "raw": [raw.tobytes()]})

    parts = (docs_ds.select_columns([id_col, text_col])
             .map_batches(count_partial, batch_format="pandas",
                          batch_size=4096, num_cpus=1).take_all())
    tgt = np.zeros(n_buckets, np.int64)
    raw = np.zeros(n_buckets, np.int64)
    for r in parts:  # fixed n_buckets*8 B per batch, associative fold
        tgt += np.frombuffer(r["tgt"], np.int64)
        raw += np.frombuffer(r["raw"], np.int64)

    def bl(a: np.ndarray) -> np.ndarray:
        # Python int.bit_length: always exact (bl(0) = 0); n_buckets-sized
        return np.fromiter((int(x).bit_length() for x in a.tolist()),
                           np.int64, count=len(a))

    blt, blr = bl(tgt), bl(raw)
    n_t, n_r = int(tgt.sum()), int(raw.sum())
    const = n_r.bit_length() - n_t.bit_length()
    ref = ray.put((blt, blr))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        t_bits, r_bits = ray.get(ref)
        keep = df[id_col].to_numpy() % target_mod != 0
        sub = df[keep]
        n_bg = np.zeros(len(sub), np.int64)
        sc = np.zeros(len(sub), np.int64)
        for j, t in enumerate(sub[text_col]):
            b = buckets_of(t)
            n_bg[j] = len(b)
            if len(b):
                sc[j] = int(t_bits[b].sum() - r_bits[b].sum()
                            + len(b) * const)
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "n_bigrams": n_bg, "dsir_score": sc})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=4096, num_cpus=1)


def bm25_topk(docs_ds, terms: list[str], text_col: str = "text",
              id_col: str = "doc_id", k: int = 15, q: int = 10**6):
    """BM25 ranking for a fixed query-term set, integer-exact — the
    retrieval scorer a real corpus pipeline runs next to TF-IDF.

    BM25 with k1 = 6/5, b = 3/4 rewrites rationally (N docs, S total
    tokens, dl doc length, tf term frequency, all from the shared
    ``[0-9a-z_]+`` lowercase tokenizer)::

        tf*(k1+1) / (tf + k1*((1-b) + b*dl*N/S))
          = 44*S*tf / (20*S*tf + 6*S + 18*dl*N)

    scaled by ``q`` under floor division, and idf uses the integer
    bit-length log2 surrogate (the lm_score/HLL trick):
    ``idf = max(1, bitlen(N+1) - bitlen(df))``. Every operation is int,
    so DuckDB replays score and ranking bit-for-bit.

    Plan: pass 1 folds the corpus constants (N, S, per-term df) via a
    tiny keyed sum — 2+len(terms) rows ever reach the driver; pass 2
    probes each batch against the broadcast constants and keeps its
    LOCAL top-k, so the final exact sort+limit sees k rows per batch,
    never the corpus. Scores use Python ints (44*S*tf*q overflows int64
    near ~10^12 tokens; candidates are term-bearing docs only).
    Returns (id_col, bm25_q6) — the global top-k, ties to smaller id.
    """
    from ray.data.aggregate import Sum

    tok = re.compile(LOWER_TOKEN_RE)
    tset = list(dict.fromkeys(terms))

    def const_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(tok)
        lens = toks.str.len().to_numpy(np.int64)
        nz = lens > 0
        keys = ["_N", "_S"]
        vals = [int(nz.sum()), int(lens.sum())]
        for t in tset:
            keys.append(f"t:{t}")
            vals.append(int(sum(1 for ts in toks[nz] if t in ts)))
        return pd.DataFrame({"k": keys,
                             "v": pd.Series(vals, dtype=np.int64)})

    consts = (docs_ds.select_columns([text_col])
              .map_batches(const_partial, batch_format="pandas",
                           batch_size=4096, num_cpus=1)
              .groupby("k").aggregate(Sum("v", alias_name="v"))
              .to_pandas())
    cmap = dict(zip(consts["k"], consts["v"].astype(int)))
    big_n, big_s = int(cmap.get("_N", 0)), int(cmap.get("_S", 0))
    dfs = {t: int(cmap.get(f"t:{t}", 0)) for t in tset}
    if big_n == 0 or big_s == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "bm25_q6": pa.array([], pa.int64())})
    idf = {t: max(1, (big_n + 1).bit_length() - dfs[t].bit_length())
           for t in tset if dfs[t] > 0}

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(tok)
        ids = df[id_col].to_numpy(np.int64)
        out_id, out_s = [], []
        for i, ts in enumerate(toks):
            dl = len(ts)
            if dl == 0:
                continue
            score = 0
            hit = False
            for t, w in idf.items():
                tf = ts.count(t)
                if tf == 0:
                    continue
                hit = True
                score += w * ((44 * big_s * tf * q)
                              // (20 * big_s * tf + 6 * big_s
                                  + 18 * dl * big_n))
            if hit:
                out_id.append(int(ids[i]))
                out_s.append(score)
        loc = pd.DataFrame({id_col: pd.Series(out_id, dtype=np.int64),
                            "bm25_q6": pd.Series(out_s, dtype=np.int64)})
        return loc.sort_values(["bm25_q6", id_col],
                               ascending=[False, True]).head(k)

    local = docs_ds.select_columns([id_col, text_col]).map_batches(
        score_topk, batch_format="pandas", batch_size=4096, num_cpus=1)
    return local.sort(["bm25_q6", id_col],
                      descending=[True, False]).limit(k)


def ngram_novelty(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                  ngram: int = 8):
    """Per-document n-gram NOVELTY (the contamination-over-time curve a
    corpus curator reads before ordering training epochs): for every doc,
    how many of its distinct word ``ngram``-grams appear for the FIRST
    time in this doc (first = the minimum doc_id carrying the gram) vs
    its total distinct grams. A doc full of already-seen grams is a
    near-duplicate or boilerplate; novelty ~1 marks fresh content.

    Plan: one streaming pass emits distinct (gram-hash, doc) keys
    (word-token md5 hashes combined polynomially to int64 — the
    containment_pairs discipline; the statistic is gram-identity-only so
    the SQL oracle's string grams replay it exactly); per-gram first
    doc and per-doc totals both reduce in coarse-bucket folds; the two
    doc-keyed count tables merge in one more bucketed fold. The corpus
    never shuffles; everything keyed is gram- or doc-bounded. Output
    (doc_id, n_grams, n_novel) for docs with >= 1 gram, sorted by doc.
    """
    from ..util import bucketed_fold

    def grams(df: pd.DataFrame) -> pa.Table:
        from .dedup import _CONT_B, _CONT_TOKEN_MEMO

        out_h, out_d = [], []
        memo = _CONT_TOKEN_MEMO
        for i, txt in zip(df[id_col], df[text_col]):
            toks = txt.split(" ")
            n = len(toks)
            if n < ngram:
                continue
            hs = np.empty(n, np.uint64)
            for j, tk in enumerate(toks):
                h = memo.get(tk)
                if h is None:
                    h = int.from_bytes(
                        hashlib.md5(tk.encode()).digest()[:8], "big")
                    memo[tk] = h
                hs[j] = h
            acc = hs[:n - ngram + 1].copy()
            for t in range(1, ngram):
                acc = acc * _CONT_B + hs[t:n - ngram + 1 + t]
            ss = np.unique(acc)
            out_h.append(ss.view(np.int64))
            out_d.append(np.full(len(ss), int(i), np.int64))
        if not out_h:
            return pa.table({"g": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        return pa.table({"g": pa.array(np.concatenate(out_h), pa.int64()),
                         "d": pa.array(np.concatenate(out_d), pa.int64())})

    keys = docs_ds.select_columns([id_col, text_col]).map_batches(
        grams, batch_format="pandas", batch_size=4096).materialize()

    def first_fold(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("g", sort=False)["d"].min().reset_index(name="fd")
        out = f.groupby("fd", sort=False).size().reset_index(name="c")
        out.columns = ["d", "c"]
        out["tag"] = np.int64(1)  # novel-count rows
        return out

    def total_fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop_duplicates(["g", "d"]).groupby("d", sort=False)
               .size().reset_index(name="c"))
        out["tag"] = np.int64(0)  # total-gram rows
        return out

    tag_schema = pa.schema([("d", pa.int64()), ("c", pa.int64()),
                            ("tag", pa.int64())])
    novel = bucketed_fold(keys, "g", first_fold, clean_schema=tag_schema)
    total = bucketed_fold(keys, "d", total_fold, clean_schema=tag_schema)

    def merge_fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["d", "tag"], sort=False)["c"].sum().unstack(
            "tag", fill_value=0)
        return pd.DataFrame({
            "doc_id": s.index.to_numpy(np.int64),
            "n_grams": s[0].to_numpy(np.int64) if 0 in s.columns
            else np.zeros(len(s), np.int64),
            "n_novel": s[1].to_numpy(np.int64) if 1 in s.columns
            else np.zeros(len(s), np.int64),
        })

    return bucketed_fold(
        novel.union(total), "d", merge_fold,
        clean_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_grams", pa.int64()),
                                ("n_novel", pa.int64())])).sort("doc_id")


def rrf_fuse_topk(docs_ds, terms: list[str], text_col: str = "text",
                  id_col: str = "doc_id", k: int = 20, kconst: int = 60,
                  topn: int = 100):
    """Reciprocal-Rank Fusion of two retrieval rankings for a fixed
    query-term set (Cormack et al. 2009 — the hybrid-retrieval combiner
    used to merge lexical and secondary scorers): list A ranks by the
    integer-exact BM25 (:func:`bm25_topk`), list B by raw summed query-
    term frequency; ``rrf_q6(d) = Σ_lists 10⁶ // (kconst + rank_d)``
    under floor division, so the fused score replays bit-for-bit in SQL.
    Ranks are 1-based positions under (score desc, id asc) within each
    list's top-``topn``; a doc outside a list's top-``topn`` contributes
    nothing from that list (standard truncated-list RRF).

    Plan: each ranking follows the bm25_topk discipline (corpus
    constants fold via a tiny keyed sum + broadcast; scoring a pure map
    keeping its LOCAL top-n, so the final sort sees n rows per batch);
    the fusion itself touches <= 2·topn driver rows — never the corpus.
    Output (doc_id, rrf_q6, bm25_rank, tf_rank), rank 0 = absent from
    that list's top-``topn``, top ``k`` by (rrf_q6 desc, doc_id).
    """
    tok = re.compile(LOWER_TOKEN_RE)
    tset = list(dict.fromkeys(terms))

    bm = bm25_topk(docs_ds, terms, text_col=text_col, id_col=id_col,
                   k=topn)
    bm = bm if isinstance(bm, pa.Table) else pa.Table.from_pandas(
        bm.to_pandas())

    def tf_topk(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(tok)
        ids = df[id_col].to_numpy(np.int64)
        out_id, out_s = [], []
        for i, ts in enumerate(toks):
            s = sum(ts.count(t) for t in tset)
            if s:
                out_id.append(int(ids[i]))
                out_s.append(s)
        loc = pd.DataFrame({id_col: pd.Series(out_id, dtype=np.int64),
                            "tf": pd.Series(out_s, dtype=np.int64)})
        return loc.sort_values(["tf", id_col],
                               ascending=[False, True]).head(topn)

    tf = (docs_ds.select_columns([id_col, text_col])
          .map_batches(tf_topk, batch_format="pandas", batch_size=4096,
                       num_cpus=1)
          .sort(["tf", id_col], descending=[True, False])
          .limit(topn).to_pandas())

    ranks: dict[int, list[int]] = {}
    for pos, did in enumerate(bm.column(id_col).to_pylist(), 1):
        ranks.setdefault(int(did), [0, 0])[0] = pos
    for pos, did in enumerate(tf[id_col].tolist(), 1):
        ranks.setdefault(int(did), [0, 0])[1] = pos
    fused = []
    for did, (ra, rb) in ranks.items():
        s = (10**6 // (kconst + ra) if ra else 0) \
            + (10**6 // (kconst + rb) if rb else 0)
        fused.append((did, s, ra, rb))
    fused.sort(key=lambda r: (-r[1], r[0]))
    fused = fused[:k]
    return pa.table({
        id_col: pa.array([r[0] for r in fused], pa.int64()),
        "rrf_q6": pa.array([r[1] for r in fused], pa.int64()),
        "bm25_rank": pa.array([r[2] for r in fused], pa.int64()),
        "tf_rank": pa.array([r[3] for r in fused], pa.int64()),
    })


def cdc_chunks(docs_ds, text_col: str = "text", id_col: str = "doc_id",
               k: int = 8, mod: int = 64, n_buckets: int | None = None):
    """Content-defined chunking (the rolling-window boundary rule behind
    chunk-level dedup / delta storage — FastCDC/rsync family): a chunk
    boundary falls after 1-indexed position i when
    ``md5(text[i-k:i]) % mod == 0``; chunks are the segments between
    boundaries plus the tail. Because boundaries depend only on LOCAL
    content, an insertion early in a document shifts at most one chunk —
    which is why chunk hashes, unlike fixed-size blocks, survive edits
    and expose cross-document duplication.

    Chunk hashes are the md5 top-15-hex integer (60 bits, int64-safe —
    the SimHash/KMV convention) so DuckDB replays boundary rule, chunk
    split, and hash bit-for-bit.

    Plan: one text pass emits per-doc stats + the doc's DISTINCT chunk
    hashes; the hash rows shuffle ONCE into coarse buckets (crc-style
    ``h % nparts`` — the high-cardinality-groupby lesson) where a
    vectorized count marks hashes seen in ≥2 docs and folds per-doc
    shared counts; a final keyed Sum reassembles. Returns
    (doc_id, n_chunks, max_chunk_len, n_shared_chunks).
    """
    from ..util import bucketed_fold, cluster_cpus as _ccpus

    nparts = n_buckets or max(8, _ccpus())

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        ids, hs, ncs, mls = [], [], [], []
        for did, text in zip(df[id_col], df[text_col]):
            t = text or ""
            L = len(t)
            # ASCII fast path: byte offsets == char offsets, so encode
            # ONCE and slice bytes (saves a str-slice + encode per
            # window — the window loop is the query's hot inner loop)
            tb = t.encode() if t.isascii() else None
            chunks = []
            prev = 0
            for i in range(k, L + 1):
                w = tb[i - k:i] if tb is not None else t[i - k:i].encode()
                if int.from_bytes(md5(w).digest()[:8], "big") % mod == 0:
                    chunks.append(t[prev:i])
                    prev = i
            if prev < L:
                chunks.append(t[prev:])
            # sentinel row carries the per-doc stats
            ids.append(did)
            hs.append(-1)
            ncs.append(len(chunks))
            mls.append(max((len(c) for c in chunks), default=0))
            seen = {int(hashlib.md5(c.encode()).hexdigest()[:15], 16)
                    for c in chunks}
            for h in seen:
                ids.append(did)
                hs.append(h)
                ncs.append(0)
                mls.append(0)
        return pd.DataFrame({id_col: ids,
                             "h": pd.Series(hs, dtype=np.int64),
                             "n_chunks": pd.Series(ncs, dtype=np.int64),
                             "max_chunk_len": pd.Series(mls,
                                                        dtype=np.int64)})

    # batch_size sized for the window loop, not bytes: 2048-doc batches
    # left most of the cluster idle on a 5k-doc corpus (3 tasks for a
    # CPU-bound md5 loop — measured 10.8 s; 256-doc batches fan out wide)
    rows = (docs_ds.select_columns([id_col, text_col])
            .map_batches(explode, batch_format="pandas", batch_size=256,
                         num_cpus=1)
            .materialize())  # two consumers: stats rows + hash buckets

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["h"] >= 0]
        return pd.DataFrame({id_col: d[id_col],
                             "h": d["h"].to_numpy(np.int64),
                             "pk": d["h"].to_numpy(np.int64) % nparts})

    def shared_fold(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy(np.int64)
        uniq, inv, cnt = np.unique(h, return_inverse=True,
                                   return_counts=True)
        hit = cnt[inv] >= 2  # rows are distinct per doc already
        d = g[hit]
        if len(d) == 0:
            return pd.DataFrame({id_col: [], "n_shared_chunks":
                                 pd.Series([], dtype=np.int64)})
        agg = d.groupby(id_col, sort=False).size().reset_index(
            name="n_shared_chunks")
        agg["n_shared_chunks"] = agg["n_shared_chunks"].astype(np.int64)
        return agg

    shared = (rows.map_batches(bucket, batch_format="pandas")
              .groupby("pk").map_groups(shared_fold, batch_format="pandas"))

    def stats_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["h"] < 0]
        return pd.DataFrame({
            id_col: d[id_col],
            "n_chunks": d["n_chunks"].to_numpy(np.int64),
            "max_chunk_len": d["max_chunk_len"].to_numpy(np.int64),
            "n_shared_chunks": np.zeros(len(d), np.int64),
        })

    def pad_shared(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: df[id_col],
            "n_chunks": np.zeros(len(df), np.int64),
            "max_chunk_len": np.zeros(len(df), np.int64),
            "n_shared_chunks": df["n_shared_chunks"].to_numpy(np.int64),
        })

    # per-doc reassembly: coarse-bucket fold, not a per-key
    # sort-aggregate (~0.1 ms/key Python x 5k+ docs)
    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(id_col, sort=False)
               [["n_chunks", "max_chunk_len", "n_shared_chunks"]]
               .sum().reset_index())
        for c in ("n_chunks", "max_chunk_len", "n_shared_chunks"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    both = (rows.map_batches(stats_rows, batch_format="pandas")
            .union(shared.map_batches(pad_shared, batch_format="pandas")))
    return bucketed_fold(both, id_col, doc_fold)


def token_entropy(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document token-diversity quality signal, integer-exact.

    The unigram-entropy filter (low-entropy docs are repetitive/spammy)
    with the log2 made exactly replayable: with token counts c_w and
    n = Σ c_w,

        ent_bits = n * bit_length(n) - Σ c_w * bit_length(c_w)

    — the integer floor-log2 surrogate of n·H (same bit-length family as
    ``lm_bits_score``; DuckDB computes the identical value as
    length(bin(c))). A PURE streaming map — per-doc counts never leave
    the task, no shuffle at all. Output: (doc_id, n_tokens, n_distinct,
    ent_bits)."""
    tok = re.compile(LOWER_TOKEN_RE)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ids, nt, ndist, ent = [], [], [], []
        for did, t in zip(df[id_col], df[text_col]):
            ws = tok.findall(t.lower())
            n = len(ws)
            ids.append(did)
            nt.append(n)
            if n == 0:
                ndist.append(0)
                ent.append(0)
                continue
            _, counts = np.unique(np.asarray(ws, object),
                                  return_counts=True)
            c = counts.astype(np.int64)
            # bit_length(x) = floor(log2(x)) + 1; float log2 is exact at
            # powers of two and monotone between them for x < 2^52
            bl = np.floor(np.log2(c)).astype(np.int64) + 1
            ndist.append(len(c))
            ent.append(n * int(n).bit_length() - int((c * bl).sum()))
        return pd.DataFrame({id_col: ids,
                             "n_tokens": np.asarray(nt, np.int64),
                             "n_distinct": np.asarray(ndist, np.int64),
                             "ent_bits": np.asarray(ent, np.int64)})

    return (docs_ds.select_columns([id_col, text_col])
            .map_batches(score, batch_format="pandas", batch_size=512))


def span_scrub(docs_ds, n: int = 8, bench_mod: int = 7,
               text_col: str = "text", id_col: str = "doc_id",
               bench_ds=None):
    """SPAN-level decontamination accounting: instead of flagging whole
    documents (:func:`decontaminate`), count the TOKENS that would be
    redacted — every token covered by at least one contaminated n-gram
    window — per document (the surgical-removal variant used when
    dropping whole documents wastes too much data).

    Same broadcast contract as ``decontaminate``: the benchmark n-gram
    set is fixed-size, folded once, shipped via ``ray.put``; the
    training pass is a pure map (per-doc boolean cover via vectorized
    window marking, no shuffle). Returns one row per doc:
    (doc_id, n_tokens, n_contam_grams, n_tokens_redacted)."""
    import ray

    src = bench_ds if bench_ds is not None else docs_ds
    helper = _NgramSetPartial(n, text_col)
    if bench_ds is not None:
        def bpartial(df, _h=helper):
            return _h(df)
    else:
        def bpartial(df, _h=helper):
            return _h(df[df[id_col] % bench_mod == 0])
    cols = [text_col] if bench_ds is not None else [id_col, text_col]
    bench_parts = (src.select_columns(cols)
                   .map_batches(bpartial, batch_format="pandas",
                                batch_size=4096, num_cpus=1)
                   .to_pandas())
    bench_ref = ray.put(frozenset(bench_parts["ngram"].tolist()))
    tok = re.compile(LOWER_TOKEN_RE)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_ref)
        ids, nt, ng, nr = [], [], [], []
        for did, t in zip(df[id_col], df[text_col]):
            ws = tok.findall(t.lower())
            m = len(ws)
            ids.append(did)
            nt.append(m)
            if m < n:
                ng.append(0)
                nr.append(0)
                continue
            cover = np.zeros(m, bool)
            hits = 0
            for i in range(m - n + 1):
                if " ".join(ws[i:i + n]) in bench:
                    hits += 1
                    cover[i:i + n] = True
            ng.append(hits)
            nr.append(int(cover.sum()))
        return pd.DataFrame({id_col: ids,
                             "n_tokens": np.asarray(nt, np.int64),
                             "n_contam_grams": np.asarray(ng, np.int64),
                             "n_tokens_redacted": np.asarray(nr,
                                                             np.int64)})

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas", batch_size=4096, num_cpus=1)


def pmi_collocations(docs_ds, k: int = 20, min_count: int = 3,
                     text_col: str = "text"):
    """Collocation mining by exact integer lift (the PMI numerator): for
    every corpus bigram with count ≥ ``min_count``,
    ``lift_q6 = floor(c_ab · N_tok · 10⁶ / (c_a · c_b))`` where c_a/c_b
    are corpus token counts and N_tok the total token count — the
    association-rules shape (``parts_rules``) applied to adjacent word
    pairs; top-``k`` by (lift desc, w1, w2).

    Bigram and unigram count tables both fold map-side (one row per
    distinct gram per batch), then the lift scoring joins the bigram
    stream against the VOCABULARY-BOUNDED unigram table broadcast once
    as sorted arrays (the ``docs_lm_score`` model-table contract — at
    open-vocabulary scale the same score runs as two partitioned hash
    joins; the bounded path is the one this corpus family uses).
    """
    import ray

    from ..util import bucketed_sum

    bi = bucketed_sum(
        docs_ds.select_columns([text_col]).map_batches(
            _BigramPartial(text_col), batch_format="pandas",
            batch_size=512, num_cpus=1),
        ["w1", "w2"], "n").materialize()

    class _UniPartial:
        def __init__(self):
            self.tok = re.compile(LOWER_TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from collections import Counter
            c: Counter = Counter()
            for t in df[text_col]:
                c.update(self.tok.findall(t.lower()))
            if not c:
                return pd.DataFrame({"w": pd.Series([], dtype=object),
                                     "n": pd.Series([], dtype="int64")})
            ws, ns = zip(*sorted(c.items()))
            return pd.DataFrame({"w": list(ws),
                                 "n": np.asarray(ns, np.int64)})

    uni = bucketed_sum(
        docs_ds.select_columns([text_col]).map_batches(
            _UniPartial(), batch_format="pandas",
            batch_size=512, num_cpus=1),
        "w", "n").to_pandas()  # vocabulary-bounded
    if uni.empty:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "n_pair": pa.array([], pa.int64()),
                         "lift_q6": pa.array([], pa.int64())})
    uni = uni.sort_values("w")
    n_tok = int(uni["n"].sum())
    u_ref = ray.put((uni["w"].to_numpy(object),
                     uni["n"].to_numpy(np.int64), n_tok))

    def score(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.int64)
        keep = n >= min_count
        if not keep.any():
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n_pair": pa.array([], pa.int64()),
                             "lift_q6": pa.array([], pa.int64())})
        w1 = np.asarray(t.column("w1").to_pylist(), object)[keep]
        w2 = np.asarray(t.column("w2").to_pylist(), object)[keep]
        n = n[keep]
        vw, vn, nt = ray.get(u_ref)
        ca = vn[np.searchsorted(vw, w1)]
        cb = vn[np.searchsorted(vw, w2)]
        lift = n * nt * 1_000_000 // (ca * cb)
        return pa.table({"w1": pa.array(w1.tolist(), pa.string()),
                         "w2": pa.array(w2.tolist(), pa.string()),
                         "n_pair": pa.array(n, pa.int64()),
                         "lift_q6": pa.array(lift.astype(np.int64),
                                             pa.int64())})

    return (bi.map_batches(score, batch_format="pyarrow",
                           batch_size=65536)
            .sort(["lift_q6", "w1", "w2"], descending=[True, False, False])
            .limit(k))


def freq_of_freqs(docs_ds, max_r: int = 10, text_col: str = "text"):
    """Good-Turing frequency-of-frequencies table: N_r = how many
    vocabulary words occur exactly r times in the corpus (r ≤ ``max_r``,
    the smoothing region; the N_1/N ratio is the Good-Turing unseen-mass
    estimate and the singleton/doubleton counts drive Heaps/Zipf
    diagnostics and vocabulary-pruning decisions).

    Two chained bounded folds: unigram counts fold map-side into the
    coarse-bucket vocabulary fold (same plan as every corpus count), then
    the count-of-counts is a SECOND fold whose domain is r ≤ max_r — a
    fixed-size histogram regardless of corpus or vocabulary size.
    """
    from ray.data.aggregate import Sum

    from ..util import bucketed_sum

    class _UniPartial:
        def __init__(self):
            self.tok = re.compile(LOWER_TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from collections import Counter
            c: Counter = Counter()
            for t in df[text_col]:
                c.update(self.tok.findall(t.lower()))
            if not c:
                return pd.DataFrame({"w": pd.Series([], dtype=object),
                                     "n": pd.Series([], dtype="int64")})
            ws, ns = zip(*sorted(c.items()))
            return pd.DataFrame({"w": list(ws),
                                 "n": np.asarray(ns, np.int64)})

    uni = bucketed_sum(
        docs_ds.select_columns([text_col]).map_batches(
            _UniPartial(), batch_format="pandas",
            batch_size=512, num_cpus=1),
        "w", "n")

    def cc_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.int64)
        n = n[n <= max_r]
        if not len(n):
            return pa.table({"freq": pa.array([], pa.int64()),
                             "n_words": pa.array([], pa.int64())})
        r, c = np.unique(n, return_counts=True)
        return pa.table({"freq": pa.array(r, pa.int64()),
                         "n_words": pa.array(c.astype(np.int64),
                                             pa.int64())})

    return (uni.map_batches(cc_partial, batch_format="pyarrow",
                            batch_size=65536)
            .groupby("freq")
            .aggregate(Sum("n_words", alias_name="n_words"))
            .sort("freq"))


def blocklist_filter(docs_ds, text_col: str = "text",
                     id_col: str = "doc_id", mod: int = 41,
                     hit_per: int = 20):
    """Multi-term blocklist scan — the PII/NSFW-wordlist curation gate:
    count per-document hits against a term blocklist and flag documents
    whose hit density crosses an exact integer threshold
    (``blocked = n_hits * hit_per > n_tokens``, i.e. > 1/hit_per of the
    tokens). The blocklist here is derived deterministically from the
    corpus vocabulary by an md5 rule (md5_64(term) % mod == 0 — the
    SQL-replayable stand-in for an external wordlist; a real deployment
    passes its own list through the same broadcast path).

    Plan: the vocabulary (Heaps-law sublinear) folds via map-side
    partial distinct + ONE coarse-bucket distinct; the md5-filtered
    blocklist broadcasts once via ``ray.put`` as a sorted array and each
    scoring task reads it zero-copy from the object store and probes
    with searchsorted — the corpus streams through exactly once, no
    token-stream shuffle. Output per doc:
    (doc_id, n_tokens, n_hits, n_uniq_hits, blocked).
    """
    import ray

    from ..util import bucketed_distinct

    tok_re = re.compile(LOWER_TOKEN_RE)

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(tok_re)
        ex = toks.explode().dropna()
        terms = pd.unique(ex)
        keep = [t for t in terms
                if int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                                  "big") % mod == 0]
        return pd.DataFrame({"term": pd.Series(keep, dtype=object)})

    vocab = bucketed_distinct(
        docs_ds.select_columns([text_col]).map_batches(
            vocab_partial, batch_format="pandas", batch_size=512),
        "term")
    terms = np.sort(np.asarray(
        [r["term"] for r in vocab.take_all()], dtype=object))
    bl_ref = ray.put(terms)

    def score_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        out = {"doc_id": [], "n_tokens": [], "n_hits": [],
               "n_uniq_hits": [], "blocked": []}
        toks = df[text_col].str.lower().str.findall(tok_re)
        bl = ray.get(bl_ref)  # zero-copy plasma read per task
        for i, ts in enumerate(toks):
            ta = np.asarray(ts, dtype=object)
            n = len(ta)
            if n and len(bl):
                pos = np.searchsorted(bl, ta)
                pos[pos >= len(bl)] = len(bl) - 1
                hit = bl[pos] == ta
                nh = int(hit.sum())
                nu = len(pd.unique(ta[hit]))
            else:
                nh = nu = 0
            out["doc_id"].append(int(ids[i]))
            out["n_tokens"].append(n)
            out["n_hits"].append(nh)
            out["n_uniq_hits"].append(nu)
            out["blocked"].append(int(nh * hit_per > n))
        return pd.DataFrame(out)

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        score_batch, batch_format="pandas", batch_size=512)


def bpe_train(docs_ds, text_col: str = "text", n_merges: int = 4):
    """Distributed BPE-STYLE tokenizer training (after Sennrich et al.
    2016, with one deliberate deviation — see below): learn
    the first ``n_merges`` merge rules from the corpus: the word
    frequency dictionary folds DISTRIBUTED (map-side partial counts +
    one coarse-bucket sum — the corpus streams once and only (word,
    count) rows shuffle); merge learning then runs on that dictionary,
    which is Heaps-law VOCABULARY-bounded by contract (the same
    dimension-bounded-finish boundary as the df/LM count tables). Each
    round counts adjacent symbol pairs weighted by word count, picks
    the most frequent pair (ties -> lexicographically smallest), and
    applies it with left-to-right non-overlapping replacement on the
    space-separated symbol string — exactly ``str.replace`` semantics,
    so DuckDB's ``replace()`` replays every round bit-for-bit.

    Deviation from reference BPE (ADVICE r4): with back-to-back
    occurrences of the winning pair (symbols ``a b a b``), standard
    scan-based merging collapses both in one round, while the
    ``str.replace`` discipline here merges only the first
    non-overlapping occurrence per round, and ``pair_count`` is
    tallied pre-replacement with overlap counting. The engine and the
    SQL oracle share these semantics, so results are deterministic and
    replayable — but the learned table is not guaranteed to be
    byte-identical to a scan-based reference implementation on corpora
    where a pair abuts itself.

    Output: (round, left, right, pair_count) — one row per learned
    merge, rounds 0-based; stops early if no pair repeats.
    """
    from ..util import bucketed_sum

    tok_re = re.compile(LOWER_TOKEN_RE)

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(tok_re)
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
        vc = ex.value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy().astype(np.int64)})

    wc = bucketed_sum(
        docs_ds.select_columns([text_col]).map_batches(
            word_partial, batch_format="pandas", batch_size=512),
        "word", "cnt").take_all()  # vocabulary-bounded by contract

    # sentinel spaces on both ends so a merge pattern " l r " can only
    # match FULL symbols (bare "l r" would also match the tail of a
    # longer symbol, e.g. "ax y" contains "x y")
    spaced = {" " + " ".join(r["word"]) + " ": int(r["cnt"]) for r in wc}
    out_rows = []
    for rnd in range(n_merges):
        pairs: dict = {}
        for s, n in spaced.items():
            syms = s.strip().split(" ")
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # most frequent pair; tie -> lexicographically smallest (l, r)
        mx = max(pairs.values())
        cand = sorted([p for p, n in pairs.items() if n == mx])
        left, right = cand[0]
        if mx < 2:
            break
        out_rows.append((rnd, left, right, mx))
        oldpat = " " + left + " " + right + " "
        newpat = " " + left + right + " "
        spaced = {s.replace(oldpat, newpat): n
                  for s, n in spaced.items()}
    return pa.table({
        "round": pa.array([r for r, *_ in out_rows], pa.int64()),
        "lft": pa.array([l for _, l, *_ in out_rows], pa.string()),
        "rgt": pa.array([r2 for _, _l, r2, _ in out_rows], pa.string()),
        "pair_count": pa.array([n for *_, n in out_rows], pa.int64()),
    })
