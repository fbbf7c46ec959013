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
    from ray.data.aggregate import Min

    partial = docs_ds.select_columns([text_col, id_col]).map_batches(
        _HashQualityStage(text_col, id_col),
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    )
    partial = partial.repartition(max(8, min(64, cluster_cpus())))
    agg = partial.groupby("hash64").aggregate(
        Min(id_col, alias_name=id_col),
        Min("n_tokens", alias_name="n_tokens"),
    )
    return agg.select_columns([id_col, "n_tokens"])


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
