"""Hostile-data replica of the driver's correctness gate: run the REAL
`__spark_entry__.queries()` against the REAL `oracle_sql()` (same
row-count + column + value-hash compare as tools/check_correctness) over
ADVERSARIAL documents/embeddings tables — null text, empty strings,
unicode whitespace/case hazards, control characters, regex metachars,
duplicate and near-duplicate rows, null/empty/zero-norm embeddings.

The fixture-distribution gates can only certify the contracts on the
generator's vocabulary; this suite certifies them where engines actually
fork (it is how the Java-vs-RE2 \\s split was found). Gates whose oracle
embeds literals derived from the real sf0.01 parquet (k-means / PQ
codebooks) are excluded — their literals cannot describe this data."""

import os
import random

import duckdb
import pandas as pd
import pytest

from tests.test_cross_engine_fuzz import _PIECES

DOC_GATES = [
    "bm25_topk", "cms_heavy_hitters", "table_stats", "weighted_sample",
    "hybrid_rrf_topk", "quality_model_score", "pmi_cooccurrence",
    "temperature_mixture",
    "chunk_documents", "mixture_sample", "hashed_bow", "rag_chunk_topk",
    "contamination_spans", "decontaminate", "dedup_clusters", "dedup_exact",
    "dedup_jaccard_lsh", "dedup_keep_docs", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "doc_fingerprint",
    "dup_passage_stats", "dup_passage_scrub", "dedup_incremental",
    "footer_keyword_filter", "lang_id",
    "multimodal_decode_meta", "near_dedup_keep", "pack_sequences",
    "pii_scrub", "quality_by_source", "quality_filter_keep",
    "quality_probe_weights", "quality_probe_agreement",
    "repetition_stats", "split_assign", "stratified_sample",
    "text_quality_scores", "token_count", "token_df_stats", "topk_terms",
    "unigram_surprisal", "bigram_surprisal",
    "whitespace_normalize", "winnow_containment",
    "winnow_fingerprints",
]
EMB_GATES = [
    "jl_project_transform",
    "ann_sq8_encode", "ann_sq8_topk", "ann_ivf_sq8_topk",
    "ann_batch_topk", "ann_ivf_assign", "ann_ivf_topk",
    "ann_ivf_topk_probe2", "ann_lsh_buckets", "ann_lsh_topk",
    "ann_topk_cosine", "centroid_by_label", "embedding_cosine_dups",
]

LANGS = ["en", "de", "fr", "es", "zz", None]


def _hostile_docs(n=240, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i in (17, 53):
            text = None                      # null text
        elif i == 54:
            text = ""                        # empty
        elif i == 55:
            text = " \t\x0b\n "              # whitespace-only incl. VT
        elif i % 37 == 1 and i > 37:
            text = rows[i - 37][1]           # exact duplicate of an earlier doc
        else:
            k = rng.randint(1, 14)
            text = " ".join(rng.choice(_PIECES) for _ in range(k))
        rows.append((i, text, LANGS[i % len(LANGS)], f"src{i % 3}",
                     len(text) if text else 0))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def _hostile_embs(n=200, seed=23, dims=8):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if i in (9, 110):
            v = None                         # null embedding
        elif i == 10:
            v = []                           # empty
        elif i in (11, 111):
            v = [0.0] * dims                 # zero-norm
        elif i == 12:
            v = [float(f"{rng.uniform(-1, 1):.4f}") for _ in range(dims)]
            rows.append((i, v, i % 5))
            rows.append((i + 1, list(v), (i + 1) % 5))  # exact dup pair
            continue
        else:
            v = [float(f"{rng.uniform(-1, 1):.4f}") for _ in range(dims)]
        rows.append((i, v, i % 5))
    seen = set()
    out = [r for r in rows if not (r[0] in seen or seen.add(r[0]))]
    return pd.DataFrame(out, columns=["vec_id", "embedding", "label"])


@pytest.fixture(scope="module")
def hostile_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostile_sf"))
    docs = _hostile_docs()
    embs = _hostile_embs()
    spark.createDataFrame(docs).repartition(4).write.parquet(
        os.path.join(d, "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).repartition(3).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


def _run_suite(spark, sf_dir, names):
    import __spark_entry__ as E
    from tools.check_correctness import canon_frame, value_hash

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')")
    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name in names:
        got = qs[name](spark, sf_dir).toPandas()
        want = con.sql(oracles[name]).df()
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
        elif sorted(got.columns) != sorted(want.columns):
            failures.append((name, f"cols {sorted(got.columns)} != "
                                   f"{sorted(want.columns)}"))
        elif value_hash(got) != value_hash(want):
            a, b = canon_frame(got), canon_frame(want)
            diff = a.compare(b) if a.shape == b.shape else "shape"
            failures.append((name, f"value mismatch: {str(diff)[:300]}"))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)


def test_document_gates_on_hostile_corpus(spark, hostile_sf_dir):
    _run_suite(spark, hostile_sf_dir, DOC_GATES)


def test_embedding_gates_on_hostile_corpus(spark, hostile_sf_dir):
    _run_suite(spark, hostile_sf_dir, EMB_GATES)
