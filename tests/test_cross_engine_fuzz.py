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


_PII_PIECES = [
    "a@b.co", "x.y+z%w@sub.domain.org", "no-at-sign.com", "a@b", "@b.co",
    "UPPER@CASE.COM", "tail a@b.co.", "(a@b.co)", "ümlaut@b.co",
    "a@b.co,b@c.io", "10.0.0.1", "999.999.999.999", "1.2.3.4.5",
    "10.0.0.256", "v1.2.3", "+12 555-0101", "12 555-0101", "555-0101",
    "+123 456-7890", "12 555-0101x", "edge@case.co 1.2.3.4 +12 345-6789",
    "", " ", "text without any pii at all", "٠١٢٣@unicode.digits",
    "12 555-0101", "wörd 1.2.3.4wörd",
]


def _pii_docs(n=200, seed=13):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(0, 6)
        rows.append((i, " ".join(rng.choice(_PII_PIECES) for _ in range(k))
                     if k else rng.choice(_PII_PIECES)))
    return rows


def test_pii_scrub_cross_engine(spark):
    """The ordered email→IP→phone redaction chain (shared regex
    constants, Java vs RE2 dialects) agrees on hostile inputs: unicode
    digits/letters at match boundaries, adjacent PII, out-of-range IP
    octets, partial phones, empty strings."""
    from pdf_parser_spark.corpus import scrub as SC

    pdf = pd.DataFrame(_pii_docs(), columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    got = {r.doc_id: (r.text, r.n_emails, r.n_ips, r.n_phones)
           for r in SC.pii_scrub(df).collect()}
    con = duckdb.connect()
    con.register("docs", pdf)
    want = {row[0]: (row[1], row[2], row[3], row[4]) for row in con.execute(f"""
        WITH s1 AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{SC.EMAIL_RE}'))::BIGINT AS ne,
                   regexp_replace(text, '{SC.EMAIL_RE}',
                                  '{SC.EMAIL_TOKEN}', 'g') AS t1
            FROM docs),
        s2 AS (
            SELECT doc_id, ne,
                   len(regexp_extract_all(t1, '{SC.IPV4_RE}'))::BIGINT AS ni,
                   regexp_replace(t1, '{SC.IPV4_RE}',
                                  '{SC.IPV4_TOKEN}', 'g') AS t2
            FROM s1)
        SELECT doc_id,
               regexp_replace(t2, '{SC.PHONE_RE}', '{SC.PHONE_TOKEN}', 'g'),
               ne, ni,
               len(regexp_extract_all(t2, '{SC.PHONE_RE}'))::BIGINT
        FROM s2""").fetchall()}
    diffs = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not diffs, diffs[:3]


def test_winnow_fingerprints_cross_engine(spark, fuzz_pdf):
    """The codepoint-polynomial gram hash + rolling min agrees on astral
    emoji, CJK, combining marks — every char path through ord()/utf-32."""
    from pdf_parser_spark.corpus import textstats as TS
    import __spark_entry__ as _entry

    df = spark.createDataFrame(fuzz_pdf)
    got = {}
    for r in TS.winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    con = duckdb.connect()
    con.register("documents", fuzz_pdf)
    want = {}
    for doc_id, fp in con.execute(
            f"WITH {_entry._WINNOW_CTES} SELECT doc_id, fp FROM wfp"
    ).fetchall():
        want.setdefault(doc_id, set()).add(fp)
    assert got == want


def test_token_counts_cross_engine(spark, fuzz_pdf):
    """ws/BPE token counts (trim + explicit-class split, BPE class
    extract) agree including empty and whitespace-only documents."""
    from pdf_parser_spark.corpus import textstats as TS
    from pdf_parser_spark.corpus.dedup import WS_CHARS

    df = spark.createDataFrame(fuzz_pdf)
    got = {r.doc_id: (r.ws_tokens, r.bpe_tokens)
           for r in TS.token_counts(df).collect()}
    con = duckdb.connect()
    con.register("docs", fuzz_pdf)
    want = {row[0]: (row[1], row[2]) for row in con.execute(f"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '[{WS_CHARS}]+'))::BIGINT,
               len(regexp_extract_all(text, '{TS.BPE_TOKEN_RE}'))::BIGINT
        FROM docs""").fetchall()}
    diffs = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not diffs, diffs[:5]


def test_link_regex_cross_engine_hostile_html(spark):
    """The anchor-tag grammar must fork nowhere between Java regex
    (engine) and RE2/DuckDB (oracle): hostile HTML — empty hrefs,
    unicode anchors, unclosed tags, attributes after href, quotes and
    regex metachars in text, multiple links per line, nested angle
    brackets."""
    import duckdb

    from pdf_parser_spark.corpus.links import extract_links

    cases = [
        '<a href="">empty href</a>',
        '<a href="/ünïcode">ünïcode änchor €</a>',
        '<a href="/a">one</a><a href="/b">two</a><a href="/c"></a>',
        '<a href="/unclosed">no end tag',
        '<a href="/x" class="btn">attr after href</a>',
        '<a href=\'/single\'>single quotes</a>',
        '<a href="/meta">.*+?[]{}()|^$\\</a>',
        'text <a href="/mid">mid</a> text <b><a href="/n">n</a></b>',
        '<A HREF="/upper">case</A>',
        '<a  href="/twospace">two spaces</a>',
        '<a href="/gt>inside">gt in href</a>',
        '<a href="/tab">an\tchor</a>',
        '',
        'no links at all',
        '<a href="/dup">same</a> <a href="/dup">same</a>',
    ]
    rows = [(f"c{i}", 0, t) for i, t in enumerate(cases)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = sorted((r.conv_id, r.link_idx, r.href, r.anchor)
                 for r in extract_links(df).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t (conv_id VARCHAR, turn_idx INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute("""
        WITH h AS (
            SELECT conv_id,
                   regexp_extract_all(text, '<a href="([^"]*)">([^<]*)</a>', 1) AS hs,
                   regexp_extract_all(text, '<a href="([^"]*)">([^<]*)</a>', 2) AS ans
            FROM t)
        SELECT conv_id, unnest([i FOR i IN range(0, len(hs))]) AS idx,
               unnest(hs), unnest(ans)
        FROM h""").fetchall()))
    assert got == [(c, int(i), h, a) for c, i, h, a in want]
