"""CLI quality-probe trainer: distill the corpus quality rule into a
linear probe and publish the model + its report card as one
spark-submit job.

    spark-submit --py-files engine.zip jobs/probe_job.py \\
        --input  /path/to/documents \\
        --output /path/to/probe_dir \\
        [--head codegen|rule|bow] [--iters N] [--lr 0.5] \\
        [--dims 64] [--init-scale 16]

Writes:
    output/weights/   (dim, weight) relation, bias at dim = -1
    output/scores/    (doc_id, quality_score, probe_keep) over the
                      training corpus — scored with the SAME feature
                      frame and weights the printed agreement grades,
                      so thresholding the published scores reproduces
                      the report card exactly
and prints a one-line JSON summary with the rule-agreement counts —
the number a pipeline owner reads before trusting the probe as the
cheap pre-filter in front of the full rule at 100 TB.

Heads (feature blocks appended to the hashed BoW):
    codegen  (default) the 6 UDF-free `quality_codegen_features` —
             scoring is a pure whole-stage-codegen projection, no
             pandas UDF anywhere in the apply path. Measured 0.842
             agreement at iters=4 on the sf0.01 fixture.
    rule     the 4 teacher-rule features — highest fidelity (0.858 at
             iters=2) but `top2_cf`/`dup3_f` pay a pandas UDF per
             scoring pass, so it is the TEACHER head, not the cheap
             100 TB pre-filter.
    bow      BoW only — measured exactly the keep base rate (0.76) on
             the fixture; kept as the recorded negative result.

Each extra iteration is one partial-agg corpus pass, but MORE is not
better: fast-sigmoid GD drifts from the centroid init toward the
soft-loss optimum through an agreement dip, so each head defaults to
its measured-best point (codegen 4, rule 2) and the report prints the
numbers to re-check on new data. BASELINE.md records the ladders and
the ~95% offline linear ceiling on the fixture.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession

HEAD_DEFAULT_ITERS = {"codegen": 4, "rule": 2, "bow": 2}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="quality probe trainer job")
    p.add_argument("--input", required=True, help="documents table/path")
    p.add_argument("--output", required=True, help="model/report root")
    p.add_argument("--head", choices=("codegen", "rule", "bow"),
                   default="codegen",
                   help="feature block beside the hashed BoW: codegen "
                        "(UDF-free deployable, default), rule (teacher "
                        "features, pandas UDF at apply time), bow "
                        "(none — measured base-rate-only)")
    p.add_argument("--iters", type=int, default=None,
                   help="GD refinement passes after the centroid init "
                        "(default: the head's measured-best point — "
                        "codegen 4, rule 2; see BASELINE.md)")
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--dims", type=int, default=64,
                   help="hashed-BoW feature buckets")
    p.add_argument("--init-scale", type=float, default=16.0,
                   help="centroid-discriminant init scale (0 = zeros)")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.appName("probe-job").getOrCreate()

    from pdf_parser_spark.corpus import textstats as TS
    from pdf_parser_spark.io import read_table, write_table

    docs = read_table(spark, args.input)
    rule_feats = args.head == "rule"
    codegen_feats = args.head == "codegen"
    iters = (args.iters if args.iters is not None
             else HEAD_DEFAULT_ITERS[args.head])

    # train ONCE; everything below — weights/, the agreement report,
    # and scores/ — derives from this single (w, b), so the published
    # artifact IS the model the report card describes.
    w, b, n = TS.train_quality_probe(
        docs, iters=iters, lr=args.lr, dims=args.dims,
        rule_feats=rule_feats, codegen_feats=codegen_feats,
        init_scale=args.init_scale,
        id_col=args.id_col, text_col=args.text_col)
    weights = spark.createDataFrame(
        [(-1, b)] + list(enumerate(w)), "dim long, weight double")
    write_table(weights, os.path.join(args.output, "weights"))

    agree = TS.quality_probe_agreement_for(
        docs, w, b, dims=args.dims, rule_feats=rule_feats,
        codegen_feats=codegen_feats,
        id_col=args.id_col, text_col=args.text_col).first()

    scores = TS.quality_probe_scores(
        docs, w, b, dims=args.dims, rule_feats=rule_feats,
        codegen_feats=codegen_feats,
        id_col=args.id_col, text_col=args.text_col)
    write_table(scores, os.path.join(args.output, "scores"))

    print(json.dumps({
        "n_docs": n,
        "head": args.head,
        "iters": iters,
        "n_rule_keep": agree.n_rule_keep,
        "n_probe_keep": agree.n_probe_keep,
        "n_agree": agree.n_agree,
        "agreement": round(agree.n_agree / max(agree.n_docs, 1), 4),
        "bias": b,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
