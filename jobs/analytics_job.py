"""CLI event-analytics job: the spark-submit surface for the
events-table workload — funnel, retention, percentiles, temporal
joins/rollups, and rate anomalies in one submit:

    spark-submit --py-files engine.zip jobs/analytics_job.py \\
        --events /path/to/events_ds \\
        --output /path/to/report_root \\
        [--reports funnel,retention,percentiles,asof,rollup,anomaly,kmv]

Each selected report writes its own table under <output>/<name> via
the pluggable table IO and contributes one line to the printed
summary. All operators are the gate-verified library functions — this
job only wires selection, IO, and reporting (the same thin-CLI policy
as extract/dedup/curation/index jobs)."""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

ALL_REPORTS = ("funnel", "retention", "percentiles", "asof", "rollup",
               "anomaly", "kmv")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="event analytics job")
    p.add_argument("--events", required=True, help="events table/path")
    p.add_argument("--output", required=True, help="report root")
    p.add_argument("--reports", default=",".join(ALL_REPORTS),
                   help=f"comma list from {ALL_REPORTS}")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    wanted = [r.strip() for r in args.reports.split(",") if r.strip()]
    unknown = sorted(set(wanted) - set(ALL_REPORTS))
    if unknown:
        raise SystemExit(f"analytics-job: unknown reports {unknown}; "
                         f"choose from {ALL_REPORTS}")
    spark = SparkSession.builder.appName("analytics-job").getOrCreate()

    from pdf_parser_spark.io import read_table, write_table
    from pdf_parser_spark.operators import funnel as FN
    from pdf_parser_spark.plans import sketch as SK
    from pdf_parser_spark.plans import temporal as TP

    events = read_table(spark, args.events)
    builders = {
        "funnel": lambda: FN.funnel_counts(events),
        "retention": lambda: FN.retention_cohorts(events),
        "percentiles": lambda: FN.value_percentiles(events),
        "asof": lambda: TP.asof_join_latest(events),
        "rollup": lambda: TP.hyper_rollup(events),
        "anomaly": lambda: TP.rate_anomaly(events),
        "kmv": lambda: SK.distinct_kmv(events, "event_type", "user_id"),
    }
    root = args.output.rstrip("/")
    counts = {}
    for name in wanted:
        out = builders[name]()
        write_table(out, f"{root}/{name}")
        counts[name] = read_table(spark, f"{root}/{name}").count()
    print("analytics-job done: "
          + " ".join(f"{n}={counts[n]}" for n in wanted))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
