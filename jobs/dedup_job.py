"""CLI corpus near-dedup job: the spark-submit deployment surface for the
training-data pipeline (the corpus analog of jobs/extract_job.py):

    spark-submit --py-files engine.zip jobs/dedup_job.py \\
        --input  /path/to/documents_ds \\
        --output /path/to/kept_ds \\
        [--method minhash|exact|simhash|semdedup|semdecontam] \\
        [--threshold 0.5] [--keeper min_id|best --score-col quality] \\
        [--eval-input /path/to/eval_embs] [--report-clusters]

Runs the scale-shaped pipeline (candidates are always bucketed, never
all-pairs; exact Jaccard only on candidates; connected components via
pointer-jumping label propagation) and writes the surviving documents
through the pluggable table IO.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="corpus near-dedup job")
    p.add_argument("--input", required=True, help="documents table/path")
    p.add_argument("--output", required=True, help="kept-documents output")
    p.add_argument("--method", default="minhash",
                   choices=("minhash", "exact", "simhash", "semdedup",
                            "semdecontam"))
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Jaccard threshold (minhash method)")
    p.add_argument("--max-hamming", type=int, default=1,
                   help="Hamming radius (simhash method)")
    p.add_argument("--cosine-threshold", type=float, default=0.95,
                   help="cosine threshold (semdedup/semdecontam methods)")
    p.add_argument("--keeper", default="min_id", choices=("min_id", "best"),
                   help="dup-cluster survivor rule for the pair methods "
                        "(minhash/simhash): min_id, or 'best' = argmax of "
                        "--score-col with min-id tie-break")
    p.add_argument("--score-col", default=None,
                   help="score column on the input table (--keeper best)")
    p.add_argument("--eval-input", default=None,
                   help="eval/benchmark embeddings table (semdecontam "
                        "method): rows within --cosine-threshold of any "
                        "eval vector are dropped")
    p.add_argument("--cells", default="auto",
                   help="k-means cell count (semdedup method), or 'auto' "
                        "to scale cells with the corpus (~300 vectors/"
                        "cell) — fixed cells at 10x data mean 100x "
                        "within-cell pair work (measured, BASELINE.md)")
    p.add_argument("--vec-col", default="embedding",
                   help="embedding column (semdedup method)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--report-clusters", action="store_true",
                   help="also print the duplicate-cluster summary")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("dedup-job").getOrCreate()

    from pdf_parser_spark.corpus import dedup as D
    from pdf_parser_spark.io import read_table, write_table

    docs = read_table(spark, args.input)
    n_in = docs.count()

    if args.keeper == "best" and not args.score_col:
        raise SystemExit("--keeper best requires --score-col")

    stats: dict = {}
    clusters = None
    if args.method == "semdecontam":
        # embedding-space eval-overlap removal: input + eval are
        # embeddings tables; the eval set broadcasts, the corpus never
        # shuffles (corpus/similarity.py:semantic_decontaminated_keep)
        if not args.eval_input:
            raise SystemExit("--method semdecontam requires --eval-input")
        from pdf_parser_spark.corpus import similarity as S

        eval_df = read_table(spark, args.eval_input)
        kept = S.semantic_decontaminated_keep(
            docs, eval_df, threshold=args.cosine_threshold,
            id_col=args.id_col, vec_col=args.vec_col)
    elif args.method == "semdedup":
        # embedding-space SemDeDup: greedy lowest-id keep inside k-means
        # cells (corpus/similarity.py); input is an embeddings table
        from pdf_parser_spark.corpus import similarity as S

        cells = (S.auto_centroids(docs) if args.cells == "auto"
                 else int(args.cells))
        stats["cells"] = cells
        cb = S.kmeans_codebook(docs, n_centroids=cells,
                               id_col=args.id_col, vec_col=args.vec_col)
        kept = S.semdedup_keep(docs, threshold=args.cosine_threshold,
                               n_centroids=cells, codebook=cb,
                               id_col=args.id_col, vec_col=args.vec_col)
    elif args.method == "exact":
        keep = D.exact_dedup(docs, id_col=args.id_col, text_col=args.text_col)
        kept = docs.join(
            keep.select(F.col("keep_id").alias(args.id_col)),
            args.id_col, "left_semi")
    else:
        if args.method == "simhash":
            pairs = D.simhash_pairs(
                docs, max_hamming=args.max_hamming,
                id_col=args.id_col, text_col=args.text_col)
        else:
            pairs = D.jaccard_on_candidates(
                D.minhash_lsh_pairs(docs, id_col=args.id_col,
                                    text_col=args.text_col),
                docs, threshold=args.threshold,
                id_col=args.id_col, text_col=args.text_col)
        # one clustering run feeds BOTH the keep set and the report
        clusters = D.dup_clusters(pairs, stats=stats)
        if args.keeper == "best":
            kept = D.keep_best_from_pairs(docs, pairs, args.score_col,
                                          id_col=args.id_col,
                                          clusters=clusters)
        else:
            kept = D.keep_from_pairs(docs, pairs, id_col=args.id_col,
                                     clusters=clusters)

    write_table(kept, args.output)
    n_out = read_table(spark, args.output).count()
    print(f"dedup-job done: method={args.method} docs_in={n_in} "
          f"docs_kept={n_out} removed={n_in - n_out}")
    if args.report_clusters and clusters is not None:
        summary = (
            clusters.groupBy("cluster_id").count()
            .filter(F.col("count") > 1)
            .orderBy(F.col("count").desc()))
        summary.show(20, truncate=False)
        print(f"cluster rounds={stats.get('rounds')} "
              f"converged={stats.get('converged')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
