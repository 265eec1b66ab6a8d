"""Adversarial cross-engine fuzz: the dedup canonicalization contract
(lower + \\s+ collapse + trim + md5) and everything built on it (shingle
sets, conversation fingerprints) must agree between Spark and DuckDB on
HOSTILE text, not just the fixture distribution the driver gate samples —
unicode whitespace, regex metacharacters, quotes/backslashes, CJK,
combining marks, astral-plane emoji, empty and whitespace-only strings.

One batched comparison per operator (a single Spark job + a single DuckDB
query over the same 300 seeded-random documents), not per-example jobs."""

import random

import duckdb
import pandas as pd
import pytest

from pdf_parser_spark.corpus import dedup as D
from pyspark.sql import functions as F

_PIECES = [
    "word", "WORD", "Wörd", "naïve", "日本語テキスト", "emoji🙂🙃",
    "áccent", "tab\there", "nl\nline", "cr\rret", "vt\x0bvt",
    "ff\x0cff", "nbsp nbsp", "thin space", "ideo　space",
    "line sep", "para sep", "quote'\"q", "back\\slash",
    "regex.*+?[]()|^$chars", "percent%s%d", "null\x00byte".replace("\x00", ""),
    "", " ", "   ", "\t\n\r", "UPPER lower MiXeD", "123 456.789",
    "repeat repeat repeat repeat", "x" * 300, "ünïcödé-dàsh–émdash—",
]


def _docs(n=300, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(_PIECES) for _ in range(k))
                     if k else rng.choice(_PIECES)))
    return rows


@pytest.fixture(scope="module")
def fuzz_pdf():
    return pd.DataFrame(_docs(), columns=["doc_id", "text"])


import __spark_entry__ as _entry

_CANON = _entry._CANON  # the REAL oracle fragment — the test must not drift


def test_canonical_fp_cross_engine(spark, fuzz_pdf):
    df = spark.createDataFrame(fuzz_pdf)
    got = {r.doc_id: r.fp for r in df.select(
        "doc_id", F.md5(D.canonical_text()).alias("fp")).collect()}
    con = duckdb.connect()
    con.register("docs", fuzz_pdf)
    want = dict(con.execute(
        f"SELECT doc_id, md5({_CANON}) FROM docs").fetchall())
    diffs = {k for k in want if got[k] != want[k]}
    assert not diffs, sorted(diffs)[:5]


def test_shingle_sets_cross_engine(spark, fuzz_pdf):
    df = spark.createDataFrame(fuzz_pdf)
    got = {}
    for r in D.shingles(df).collect():
        got.setdefault(r.doc_id, set()).add(r.sh)
    con = duckdb.connect()
    con.register("docs", fuzz_pdf)
    want = {}
    for doc_id, sh in con.execute(f"""
        WITH canon AS (
            SELECT doc_id, string_split({_CANON}, ' ') AS toks FROM docs),
        grams AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                        ELSE [array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, len(toks) - 1)]
                   END AS gs
            FROM canon)
        SELECT DISTINCT doc_id, md5(unnest(gs)) FROM grams""").fetchall():
        want.setdefault(doc_id, set()).add(sh)
    assert got == want


def test_conv_fingerprint_cross_engine(spark, fuzz_pdf):
    from pdf_parser_spark.operators.convstats import conv_fingerprint

    rows = [(f"c{i % 40}", i // 40, t)
            for i, t in fuzz_pdf.itertuples(index=False)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    df = spark.createDataFrame(pdf)
    got = {r.conv_id: r.fp for r in conv_fingerprint(df).collect()}
    con = duckdb.connect()
    con.register("tr", pdf)
    want = dict(con.execute("""
        SELECT conv_id, md5(string_agg(md5(coalesce(text, '')), ''
                                       ORDER BY turn_idx))
        FROM tr GROUP BY conv_id""").fetchall())
    assert got == want
