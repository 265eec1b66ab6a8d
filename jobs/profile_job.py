"""CLI table profiler: the ANALYZE surface as one spark-submit job —
per-column stats, hot-key skew diagnosis, and numeric quantiles for any
table, written as three small relations plus a one-line JSON summary.

    spark-submit --py-files engine.zip jobs/profile_job.py \\
        --input  /path/to/table \\
        --output /path/to/profile_dir \\
        [--columns doc_id,text,lang] [--key-col doc_id] \\
        [--numeric-col n_chars] [--top 10] [--bins 128]

This is the measurement pass that runs BEFORE layout and plan decisions
at scale: `table_stats` ndv/null counts size broadcast joins and pick
bucket counts, `skew_report` decides whether a key needs salting, and
`histogram_quantiles` sizes partition budgets off the value
distribution — all bounded-output queries (column count, top-N, bins)
regardless of table size.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="table profile job")
    p.add_argument("--input", required=True, help="table/path to profile")
    p.add_argument("--output", required=True, help="profile output root")
    p.add_argument("--columns", default=None,
                   help="comma-separated column subset (default: all)")
    p.add_argument("--key-col", default=None,
                   help="key column for the skew report")
    p.add_argument("--numeric-col", default=None,
                   help="numeric column for histogram quantiles")
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--bins", type=int, default=128)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("profile-job").getOrCreate()

    from pdf_parser_spark.io import read_table, write_table
    from pdf_parser_spark.plans import stats as ST

    df = read_table(spark, args.input)
    cols = args.columns.split(",") if args.columns else list(df.columns)

    stats = ST.table_stats(df, cols)
    write_table(stats, os.path.join(args.output, "table_stats"))
    summary = {"input": args.input, "columns": len(cols)}

    if args.key_col:
        skew = ST.skew_report(df, args.key_col, top=args.top)
        write_table(skew, os.path.join(args.output, "skew"))
        hot = skew.first()
        summary["hot_key"] = hot.key
        summary["hot_key_ppm"] = hot.ppm

    if args.numeric_col:
        qs = ST.histogram_quantiles(df, args.numeric_col, bins=args.bins)
        write_table(qs, os.path.join(args.output, "quantiles"))
        summary["quantiles"] = {str(r.p): r.est for r in qs.collect()}

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
