"""CLI corpus near-dedup job: the spark-submit deployment surface for the
training-data pipeline (the corpus analog of jobs/extract_job.py):

    spark-submit --py-files engine.zip jobs/dedup_job.py \\
        --input  /path/to/documents_ds \\
        --output /path/to/kept_ds \\
        [--method minhash|exact|simhash] [--threshold 0.5] \\
        [--report-clusters]

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
                   choices=("minhash", "exact", "simhash", "semdedup"))
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Jaccard threshold (minhash method)")
    p.add_argument("--max-hamming", type=int, default=1,
                   help="Hamming radius (simhash method)")
    p.add_argument("--cosine-threshold", type=float, default=0.95,
                   help="cosine threshold (semdedup method)")
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

    stats: dict = {}
    clusters = None
    if args.method == "semdedup":
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
