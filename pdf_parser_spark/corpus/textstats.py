"""Text analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

These lift the reference's per-block text predicates (keyword scan
/root/reference/A003_colored_footer.py:199-210, digit test :209, whitespace
normalization /root/reference/pdf_extractor_protocol.py:186-191) to
document granularity. Everything is built-in `pyspark.sql.functions`
expressions — JVM-side, whole-stage-codegen friendly, no Python in the hot
path — and each has an exact ANSI-SQL twin for the DuckDB oracle
(see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Small deterministic stopword marker lists for the n-gram/marker language
# heuristic. Ties break by the fixed language order below.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "en", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "une"),
}
LANG_ORDER = ("en", "es", "de", "fr")

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))

# BPE-ish token classes: letter runs, digit runs, single other-glyphs.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

# Winnowing gram-hash parameters: polynomial rolling hash over Unicode
# codepoints mod 2^32. The base is a prime; powers are precomputed mod
# 2^32 so every per-character product stays < 2^53 (exact in BIGINT and
# in float64, so NumPy, DuckDB and any ANSI engine agree bit-for-bit).
WINNOW_BASE = 1000003
WINNOW_MOD = 1 << 32


def winnow_base_powers(k: int) -> list:
    """[BASE^0 mod 2^32, ..., BASE^(k-1) mod 2^32]."""
    pows = [1]
    for _ in range(k - 1):
        pows.append((pows[-1] * WINNOW_BASE) % WINNOW_MOD)
    return pows


def _marker_count(col, words) -> F.Column:
    """Count tokens of `col` that are in `words` (split on single spaces)."""
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(
        f"size(filter(split(lower({col}), ' '), w -> w in ({lst})))"
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts with
    deterministic tie-break by LANG_ORDER; 'und' when no marker hits."""
    out = df
    for lang in LANG_ORDER:
        out = out.withColumn(
            f"score_{lang}", _marker_count(text_col, LANG_MARKERS[lang])
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_ORDER:  # first language reaching the max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("pred_lang", pred)


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword-ratio quality features.

    All ratios are exact integer divisions in double, rounded to 4dp so the
    DuckDB twin hashes identically."""
    n_chars = F.length(F.col(text_col))
    tokens = F.split(F.col(text_col), " ")
    n_tokens = F.size(tokens)
    n_punct = F.regexp_count(F.col(text_col), F.lit(PUNCT_RE))
    n_digit = F.regexp_count(F.col(text_col), F.lit(r"[0-9]"))
    n_stop = _marker_count(text_col, STOPWORDS)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4).alias("mean_token_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4).alias("digit_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return df.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).alias("bpe_tokens"),
    )


def token_df_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two-pass corpus statistics: per-document aggregates of token
    document frequency (the backbone of rarity/quality scoring and TF-IDF
    at corpus scale).

    Pass 1 computes each distinct token's document frequency (one shuffle
    on the token); pass 2 joins it back to the exploded tokens and
    aggregates per doc. All outputs are integers so the result is
    bit-stable across engines (no float log/agg-order hazards)."""
    toks = df.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))).alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.min("df").alias("min_df"),
            F.max("df").alias("max_df"),
            F.sum("df").alias("sum_df"),
        )
    )


def winnow_fingerprints(df: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer,
    Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm): hash every
    character k-gram of the canonical text, then keep the minimum hash of
    each window of ``w`` consecutive k-grams. Output: distinct
    (doc_id, fp) rows — the sketch used for local-similarity /
    containment detection, complementary to MinHash (which sketches
    global set similarity).

    Gram hashes are a degree-(k-1) polynomial over Unicode codepoints mod
    2^32 (base WINNOW_BASE = 1000003) — chosen over per-gram md5 because every
    gram of a document hashes in ONE NumPy pass over its codepoint array
    (k shifted multiply-adds), where md5 cost one interpreter-loop digest
    per gram (O(chars) Python calls per doc: the repo's heaviest per-char
    Python, ~10x slower at sf0.1). The same polynomial is exactly
    expressible in ANSI SQL (ord + integer arithmetic), so the DuckDB
    oracle twin stays bit-identical. Fingerprints are formatted %08x.

    Canonicalization stays JVM-side (so lower/whitespace semantics match
    every other operator exactly); the per-document gram-hash + rolling
    min runs row-local in an Arrow pandas UDF with a NumPy
    shifted-minimum (w-1 vector mins) — no gram explode, no per-gram
    shuffle (the explode + window-function form pushed ~50 grams per char
    through an exchange and was ~10× slower). Only the per-doc distinct
    fingerprints are emitted; the final distinct is the one shuffle."""
    canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    bpows = winnow_base_powers(k)

    @pandas_udf("array<string>")
    def winnow_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            n = len(t) - k + 1
            if n < w:
                out.append([])
                continue
            # one vectorized polynomial-hash pass over the codepoints:
            # utf-32-le bytes ARE the codepoint array
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32
                                  ).astype(np.uint64)
            hs = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                hs += codes[j:j + n] * bpows[k - 1 - j]
            hs &= 0xFFFFFFFF
            m = hs[: n - w + 1].copy()
            for s in range(1, w):
                np.minimum(m, hs[s: s + n - w + 1], out=m)
            out.append([f"{v:08x}" for v in set(m.tolist())])
        return pd.Series(out)

    return (
        df.select("doc_id", canon.alias("t"))
        .filter(F.length("t") >= k)
        .select("doc_id", F.explode(winnow_udf(F.col("t"))).alias("fp"))
        .distinct()
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical document fingerprint: md5 of the lowercased,
    whitespace-collapsed text (the document-granularity analog of the
    snapshot normalization F2)."""
    canon = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select("doc_id", F.md5(canon).alias("fp"))
