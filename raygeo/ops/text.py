"""Text-analysis operators over the documents table: token counting, quality
scoring, language ID, document fingerprinting.

All stateful pieces (compiled regexes, stopword tables, language profiles)
live in actor ``__init__`` — once per actor, never per batch. Kernels are
pandas-vectorized string ops; token semantics are ASCII ``[0-9A-Za-z_]+`` so
the DuckDB (RE2) oracle computes the identical value.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd


TOKEN_RE = r"[0-9A-Za-z_]+"
LOWER_TOKEN_RE = r"[0-9a-z_]+"  # shared with ops.corpus

# tiny deterministic stopword profiles for the n-gram/stopword language
# heuristic (public-knowledge function words)
LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
    "zh": {"de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "na"},
}


class TokenStats:
    """Per-doc token count / char stats (compiled once per actor)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(TOKEN_RE)
        self.upper = re.compile(r"[A-Z]")
        self.punct = re.compile(r"[!-/:-@\[-`{-~]")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.findall(self.tok)
        n_tokens = toks.map(len).astype("int64")
        tok_chars = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
        out = pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "n_chars": df[self.text_col].str.len().astype("int64"),
                "n_tokens": n_tokens,
                "tok_chars": tok_chars,
                "n_upper": df[self.text_col].str.count(self.upper).astype("int64"),
                "n_punct": df[self.text_col].str.count(self.punct).astype("int64"),
            }
        )
        return out


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                concurrency=None):
    return ds.select_columns([text_col, id_col]).map_batches(
        TokenStats(text_col, id_col),
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    )


class QualityScore:
    """Length/punct/stopword-ratio quality heuristics (training-data filter)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(TOKEN_RE)
        self.stop = LANG_STOPWORDS["en"]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.lower().str.findall(self.tok)
        n_tokens = toks.map(len).astype("int64")
        stop_hits = toks.map(lambda ws: sum(w in self.stop for w in ws)).astype("int64")
        tok_chars = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
        mean_tok_len = tok_chars / n_tokens.where(n_tokens > 0, 1)
        stop_ratio = stop_hits / n_tokens.where(n_tokens > 0, 1)
        # simple composite: plausible docs have tokens, moderate word length
        keep = (n_tokens >= 5) & (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "n_tokens": n_tokens,
                "stop_hits": stop_hits,
                "mean_tok_len": mean_tok_len,
                "keep": keep.astype("int32"),
            }
        )


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id",
                  concurrency=None):
    return ds.select_columns([text_col, id_col]).map_batches(
        QualityScore(text_col, id_col),
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    )


class LangId:
    """Stopword + char-trigram heuristic language ID (deterministic)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(TOKEN_RE)
        self.profiles = LANG_STOPWORDS

    def predict_one(self, text: str) -> str:
        toks = [t.lower() for t in self.tok.findall(text)]
        if not toks:
            return "und"
        best_lang, best_score = "und", -1.0
        for lang, stops in self.profiles.items():
            score = sum(t in stops for t in toks) / len(toks)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang if best_score > 0 else "und"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "pred_lang": df[self.text_col].map(self.predict_one),
            }
        )


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id", concurrency=None):
    return ds.select_columns([text_col, id_col]).map_batches(
        LangId(text_col, id_col),
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    )


class Fingerprint:
    """Winnowing-style rolling-hash document fingerprint (int64).

    Rolling hash over a sliding char window (stride 4); fingerprint = min
    hash of the window set (robust to small edits at the margins;
    deterministic). The window hash is the first 8 bytes (big-endian) of
    md5(window) so DuckDB computes the identical value and the whole
    fingerprint is SQL-expressible (``min`` over ``generate_series``
    window positions) — corpus text is ASCII, so char == byte offsets.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 window: int = 8):
        self.text_col = text_col
        self.id_col = id_col
        self.window = window

    @staticmethod
    def _h64(b: bytes) -> int:
        import hashlib

        return int.from_bytes(hashlib.md5(b).digest()[:8], "big")

    def fp_one(self, text: str) -> int:
        b = text.encode()
        w = self.window
        if len(b) <= w:
            return self._h64(b)
        return min(self._h64(b[i:i + w]) for i in range(0, len(b) - w + 1, 4))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        vals = np.fromiter(
            (self.fp_one(t) for t in df[self.text_col]),
            dtype=np.uint64, count=len(df),
        ).astype(np.int64)  # modular wrap matches the SQL BIGINT reinterpret
        return pd.DataFrame(
            {
                self.id_col: df[self.id_col],
                "fingerprint": vals,
            }
        )


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id",
                concurrency=None):
    return ds.select_columns([text_col, id_col]).map_batches(
        Fingerprint(text_col, id_col),
        batch_format="pandas",
        batch_size=4096,
        num_cpus=1,
    )


def normalize_texts(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Text normalization (the pre-dedup cleanup every corpus pipeline
    runs): lowercase, non-alphanumerics -> space, whitespace collapsed,
    trimmed. Pure streaming map; output carries the md5 of the normalized
    text so the oracle checks the TRANSFORM row by row, not just lengths.

    The character classes are plain ASCII ranges, identical under Python
    re and RE2/DuckDB regex semantics.
    """
    import hashlib
    import re as _re

    class _Norm:
        def __init__(self):
            self.nonword = _re.compile(r"[^0-9a-z]+")

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            norm = (df[text_col].str.lower()
                    .str.replace(self.nonword, " ", regex=True)
                    .str.strip())
            h = [hashlib.md5(s.encode()).hexdigest() for s in norm]
            return pd.DataFrame({
                id_col: df[id_col],
                "norm_len": norm.str.len().astype("int64"),
                "norm_md5": h,
            })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _Norm, batch_format="pandas", batch_size=4096, concurrency=(1, 8),
        max_restarts=0)


def scrub_texts(docs_ds, deny: tuple[str, ...] = ("spark", "hash", "vector"),
                repl: str = "[X]", text_col: str = "text",
                id_col: str = "doc_id"):
    """Deny-list term scrub — the contamination-removal / PII-redaction
    shape of a training-data pipeline: replace every whole-word occurrence
    of a deny-listed term, report the hit count and the md5 of the
    scrubbed text so the oracle checks the transform row by row.

    The pattern is a plain alternation inside ``\\b`` word boundaries over
    lowercase ASCII terms — identical semantics under Python ``re`` and
    RE2/DuckDB. Compiled once per actor; pandas drives the per-row C loop.
    """
    import hashlib
    import re as _re

    pat_src = r"\b(" + "|".join(_re.escape(t) for t in deny) + r")\b"

    class _Scrub:
        def __init__(self):
            self.pat = _re.compile(pat_src)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            hits = df[text_col].str.count(self.pat).astype("int64")
            scrubbed = df[text_col].str.replace(self.pat, repl, regex=True)
            h = [hashlib.md5(s.encode()).hexdigest() for s in scrubbed]
            return pd.DataFrame({
                id_col: df[id_col],
                "n_hits": hits,
                "scrub_md5": h,
            })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _Scrub, batch_format="pandas", batch_size=4096, concurrency=(1, 8),
        max_restarts=0)


# GPT-2-style pretokenizer, restricted to a lookahead-free RE2-compatible
# subset so Python re and DuckDB produce the identical segmentation
# (leftmost-first alternation in both engines): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_ISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_counts(docs_ds, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Token budgeting under a BPE-ish pretokenizer (the sequence-length
    accounting a training pipeline runs before packing): per doc the
    pretoken count and the count of non-whitespace pretokens.

    Pure streaming map; the compiled pattern lives in the actor. The
    pattern is deliberately a lookahead-free subset of the GPT-2
    pretokenizer so the oracle's RE2 segmentation is identical.
    """
    import re as _re

    class _Bpe:
        def __init__(self):
            self.pat = _re.compile(BPE_ISH_RE)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            toks = df[text_col].str.findall(self.pat)
            n_all = toks.map(len).astype("int64")
            n_text = toks.map(
                lambda ts: sum(1 for t in ts if not t.isspace())
            ).astype("int64")
            return pd.DataFrame({
                id_col: df[id_col],
                "n_pretokens": n_all,
                "n_text_pretokens": n_text,
            })

    return docs_ds.select_columns([id_col, text_col]).map_batches(
        _Bpe, batch_format="pandas", batch_size=4096, concurrency=(1, 8),
        max_restarts=0)


class LexicalDiversity:
    """Per-doc lexical-diversity signals (the type-token-ratio family a
    corpus curator gates on — low diversity marks boilerplate/spam,
    very high hapax share marks OCR noise): distinct types and
    hapax legomena (tokens occurring exactly once IN the doc) over the
    shared lowercase tokenizer. Pure map, zero shuffle; ratios are left
    to the consumer so every output stays integer-exact."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(LOWER_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.lower().str.findall(self.tok)
        out = {"doc_id": [], "n_tokens": [], "n_types": [], "n_hapax": []}
        for did, ts in zip(df[self.id_col], toks):
            if not ts:
                continue
            vc = pd.Series(ts).value_counts()
            out["doc_id"].append(int(did))
            out["n_tokens"].append(len(ts))
            out["n_types"].append(len(vc))
            out["n_hapax"].append(int((vc.to_numpy() == 1).sum()))
        return pd.DataFrame(out).astype("int64", errors="ignore")


def lexical_diversity(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([text_col, id_col]).map_batches(
        LexicalDiversity(text_col, id_col), batch_format="pandas",
        batch_size=4096, num_cpus=1)
