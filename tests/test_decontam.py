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
