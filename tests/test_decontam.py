"""Decontamination tests against brute-force n-gram recomputation."""

import hashlib

from pdf_parser_spark.corpus import decontam as DC


def _canon(t):
    return " ".join(t.lower().split())


def _grams(t, n):
    w = _canon(t).split(" ")
    if len(w) < n:
        return [" ".join(w)]
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def _brute(corpus, eval_texts, n):
    eset = {g for t in eval_texts for g in _grams(t, n)}
    out = {}
    for doc_id, t in corpus:
        gs = _grams(t, n)
        hits = sum(1 for g in gs if g in eset)
        out[doc_id] = (len(gs), hits, hits > 0)
    return out


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    (1, "completely unrelated text about gardening and the joy of tomato plants in summer"),
    (2, "short doc"),
    (3, "  The   QUICK brown fox JUMPS over the lazy dog near the old river bank today extra tail  "),
    (4, "prefix words then the quick brown fox jumps over the lazy dog near the old river bank suffix"),
]
EVALS = [
    (100, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (101, "short doc"),
]


def test_decontaminate_matches_brute_force(spark):
    n = 13
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    ev = spark.createDataFrame(EVALS, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_hits, r.contaminated)
           for r in DC.decontaminate(corpus, ev, n=n).collect()}
    exp = _brute(CORPUS, [t for _, t in EVALS], n)
    assert got == exp
    # sanity on the fixture itself: doc 0/3/4 contaminated (13-gram
    # overlap, case/whitespace-insensitive), 2 by whole-short-doc
    # match, 1 clean
    assert got[0][2] and got[3][2] and got[4][2] and got[2][2]
    assert not got[1][2]
    assert got[2] == (1, 1, True)


def test_decontaminated_keep_drops_flagged(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    ev = spark.createDataFrame(EVALS, "doc_id long, text string")
    kept = sorted(r.doc_id for r in
                  DC.decontaminated_keep(corpus, ev, n=13).collect())
    assert kept == [1]


def test_eval_gram_set_is_distinct_md5(spark):
    ev = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "a b a b")], "doc_id long, text string")
    got = sorted(r.gh for r in DC.eval_gram_set(ev, n=2).collect())
    exp = sorted({hashlib.md5(g.encode()).hexdigest()
                  for t in ("a b a b a b", "a b a b")
                  for g in _grams(t, 2)})
    assert got == exp


def test_contamination_spans_merges_hit_windows(spark):
    n = 3
    corpus = [
        # hits at token positions: grams starting at 1..3 ("a b c", "b c d",
        # "c d e") plus a separate hit at the tail
        (0, "a b c d e x x x x a b c"),
        (1, "nothing shared here at all"),
        (2, "a b"),  # short doc, whole-text gram
    ]
    evals = [(100, "a b c d e"), (101, "a b")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    edf = spark.createDataFrame(evals, "doc_id long, text string")
    got = sorted((r.doc_id, r.tok_start, r.tok_end, r.n_windows)
                 for r in DC.contamination_spans(cdf, edf, n=n).collect())
    # doc 0: windows @1-3,2-4,3-5 merge to [1,5]; window @10-12 ("a b c")
    # is separate; doc 2 whole-text matches eval 101 exactly
    assert got == [(0, 1, 5, 3), (0, 10, 12, 1), (2, 1, 2, 1)]


def test_contamination_spans_adjacent_windows_merge(spark):
    # spans [1,3] and [4,6] are adjacent (no clean token between) -> one
    # masked region [1,6]
    cdf = spark.createDataFrame(
        [(0, "p q r s t u tail words here")], "doc_id long, text string")
    edf = spark.createDataFrame(
        [(100, "p q r"), (101, "s t u")], "doc_id long, text string")
    got = [(r.tok_start, r.tok_end, r.n_windows)
           for r in DC.contamination_spans(cdf, edf, n=3).collect()]
    assert got == [(1, 6, 2)]


def test_decontam_id_col_threading(spark):
    """decontaminate/decontaminated_keep/contamination_spans accept a
    non-default id column (the curation CLI advertises --id-col); a
    stale doc_id column alongside must NOT be silently used."""
    cdf = spark.createDataFrame(
        [(10, 999, "w1 w2 w3 w4 w5"), (11, 999, "clean text only here")],
        "id long, doc_id long, text string")
    edf = spark.createDataFrame([(0, "w1 w2 w3")], "doc_id long, text string")
    flags = {r.id: r.contaminated
             for r in DC.decontaminate(cdf, edf, n=3, id_col="id").collect()}
    assert flags == {10: True, 11: False}
    kept = [r.id for r in DC.decontaminated_keep(
        cdf, edf, n=3, id_col="id").collect()]
    assert kept == [11]
    spans = [(r.id, r.tok_start, r.tok_end) for r in DC.contamination_spans(
        cdf, edf, n=3, id_col="id").collect()]
    assert spans == [(10, 1, 3)]
