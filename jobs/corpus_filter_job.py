"""CLI corpus quality-filter job: the spark-submit deployment surface for
the pre-training data funnel (quality gate first, then near-dedup — the
order every production pipeline uses, because the cheap per-doc filter
shrinks the corpus BEFORE the shuffle-bearing dedup stages):

    spark-submit --py-files engine.zip jobs/corpus_filter_job.py \\
        --input  /path/to/documents_ds \\
        --output /path/to/kept_ds \\
        [--min-tokens 10] [--min-stopword-ratio 0.0001] \\
        [--max-top2-char-frac 0.20] [--max-dup3-frac 0.55] \\
        [--near-dedup] [--threshold 0.5]

Prints the funnel report (docs in -> after quality -> after dedup) from
counts the job computes anyway; the surviving documents are written
through the pluggable table IO.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="corpus quality-filter job")
    p.add_argument("--input", required=True, help="documents table/path")
    p.add_argument("--output", required=True, help="kept-documents output")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--min-stopword-ratio", type=float, default=0.0001)
    p.add_argument("--max-top2-char-frac", type=float, default=0.20)
    p.add_argument("--max-dup3-frac", type=float, default=0.55)
    p.add_argument("--near-dedup", action="store_true",
                   help="run MinHash-LSH near-dedup after the quality gate")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="Jaccard threshold for --near-dedup")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("corpus-filter-job").getOrCreate()

    from pdf_parser_spark.corpus import dedup as D
    from pdf_parser_spark.corpus import textstats as TS
    from pdf_parser_spark.io import read_table, write_table

    docs = read_table(spark, args.input)
    n_in = docs.count()

    kept_ids = TS.quality_filter_keep(
        docs, text_col=args.text_col,
        min_tokens=args.min_tokens,
        min_stopword_ratio=args.min_stopword_ratio,
        max_top2_char_frac=args.max_top2_char_frac,
        max_dup3_frac=args.max_dup3_frac,
    ).select(args.id_col)
    # re-join the payload only once, after the filter plumbing
    kept = docs.join(kept_ids, args.id_col, "left_semi")
    n_quality = kept.count()

    n_out = n_quality
    if args.near_dedup:
        kept = D.near_dedup_keep_docs(
            kept, threshold=args.threshold,
            id_col=args.id_col, text_col=args.text_col)
        n_out = kept.count()

    write_table(kept, args.output)
    n_written = read_table(spark, args.output).count()
    assert n_written == n_out, (n_written, n_out)
    print(f"corpus-filter-job done: docs_in={n_in} "
          f"after_quality={n_quality} after_dedup={n_out} "
          f"removed_quality={n_in - n_quality} "
          f"removed_dedup={n_quality - n_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
