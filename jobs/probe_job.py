"""CLI quality-probe trainer: distill the corpus quality rule into a
linear probe and publish the model + its report card as one
spark-submit job.

    spark-submit --py-files engine.zip jobs/probe_job.py \\
        --input  /path/to/documents \\
        --output /path/to/probe_dir \\
        [--iters 16] [--lr 0.5] [--dims 64] [--init-scale 16] \\
        [--no-rule-feats]

Writes:
    output/weights/   (dim, weight) relation, bias at dim = -1
    output/scores/    (doc_id, quality_score) over the training corpus
and prints a one-line JSON summary with the rule-agreement counts —
the number a pipeline owner reads before trusting the probe as the
cheap pre-filter in front of the full rule at 100 TB (the probe scores
with one codegen projection; the rule pays a pandas UDF for the
repetition counts).

Each extra iteration is one partial-agg corpus pass, but MORE is not
better here: fast-sigmoid GD drifts from the centroid init toward the
soft-loss optimum through an agreement dip (measured 0.858 at 2 steps
-> 0.806 at 16), so the default pins the measured-best point and the
report prints the numbers to re-check on new data. BASELINE.md records
the ladder and the ~95% offline linear ceiling on the fixture.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="quality probe trainer job")
    p.add_argument("--input", required=True, help="documents table/path")
    p.add_argument("--output", required=True, help="model/report root")
    p.add_argument("--iters", type=int, default=2,
                   help="GD refinement passes after the centroid init "
                        "(2 is the measured best agreement on the "
                        "fixture; more steps drift toward the soft-loss "
                        "optimum through an agreement dip — see "
                        "BASELINE.md)")
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--dims", type=int, default=64,
                   help="hashed-BoW feature buckets")
    p.add_argument("--init-scale", type=float, default=16.0,
                   help="centroid-discriminant init scale (0 = zeros)")
    p.add_argument("--no-rule-feats", action="store_true",
                   help="BoW features only (measured base-rate-only on "
                        "the fixture; see BASELINE.md)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("probe-job").getOrCreate()

    from pdf_parser_spark.corpus import textstats as TS
    from pdf_parser_spark.io import read_table, write_table

    docs = read_table(spark, args.input)
    rule_feats = not args.no_rule_feats

    w, b, n = TS.train_quality_probe(
        docs, iters=args.iters, lr=args.lr, dims=args.dims,
        rule_feats=rule_feats, init_scale=args.init_scale,
        id_col=args.id_col, text_col=args.text_col)
    weights = spark.createDataFrame(
        [(-1, b)] + list(enumerate(w)), "dim long, weight double")
    write_table(weights, os.path.join(args.output, "weights"))

    agree = TS.quality_probe_agreement(
        docs, iters=args.iters, lr=args.lr, dims=args.dims,
        rule_feats=rule_feats, init_scale=args.init_scale,
        id_col=args.id_col, text_col=args.text_col).first()

    # score the corpus with the BoW block only — the apply path a 100 TB
    # run uses (pure codegen projection; the rule features exist to
    # supervise training, the deployment score must stay UDF-free)
    scores = TS.linear_quality_score(
        docs, w[:args.dims], bias=b, id_col=args.id_col,
        text_col=args.text_col)
    write_table(scores, os.path.join(args.output, "scores"))

    print(json.dumps({
        "n_docs": n,
        "iters": args.iters,
        "rule_feats": rule_feats,
        "n_rule_keep": agree.n_rule_keep,
        "n_probe_keep": agree.n_probe_keep,
        "n_agree": agree.n_agree,
        "agreement": round(agree.n_agree / max(agree.n_docs, 1), 4),
        "bias": b,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
