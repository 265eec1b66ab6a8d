

def test_unigram_surprisal_matches_brute_force(spark):
    import math
    from pdf_parser_spark.corpus import textstats as TS

    rows = [(0, "a a a b b c rare1"),
            (1, "a b c"),
            (2, "rare2 rare3"),
            (3, "  A   a B  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    V = 3  # vocabulary: top-3 by count -> {a, b, c}; rare*/OOV floor to 1
    toks = [t for _, x in rows for t in " ".join(x.lower().split()).split(" ")]
    total = len(toks)
    cnt = {}
    for t in toks:
        cnt[t] = cnt.get(t, 0) + 1
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:V])
    exp = {}
    for doc_id, x in rows:
        ts = " ".join(x.lower().split()).split(" ")
        bits = [math.log2(total) - math.log2(vocab.get(t, 1)) for t in ts]
        oov = sum(1 for t in ts if t not in vocab) / len(ts)
        exp[doc_id] = (len(ts), round(oov, 4), round(sum(bits) / len(bits), 4))
    got = {r.doc_id: (r.n_tokens, r.oov_frac, r.mean_bits)
           for r in TS.unigram_surprisal(df, vocab_size=V).collect()}
    assert got == exp
    # sanity: the all-rare doc is the most surprising
    assert got[2][2] > got[0][2] and got[2][1] == 1.0
