"""One-pass table statistics (the ANALYZE primitive).

Cost-based decisions — broadcast-vs-shuffle join planning, partition
sizing, skew detection — start from per-column statistics. Collecting
them naively is one scan per column; this operator computes every
column's row/null/distinct counts in ONE pass: multiple
count(DISTINCT ...) aggregates in a single groupBy compile to one
Expand + partial aggregate (Catalyst's expand trick — each input row
fans out once per distinct column, map-side combine collapses before
the Exchange), and the long-format output unpivots driver-free.

The reference has no statistics machinery (SURVEY.md §2.8) —
north-rule addition for the analytics/layout surface next to
`plans/layout.py` and `io.write_bucketed`, whose decisions these
numbers feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(df: DataFrame, cols: list | None = None) -> DataFrame:
    """Per-column (n_rows, n_null, ndv) in one pass, long format:
    ``(column, n_rows, n_null, ndv)``. ``ndv`` is exact (`countDistinct`
    ignores nulls, standard ANALYZE semantics); for the
    sketch-accuracy tradeoff at 100 TB see `plans.sketch.distinct_kmv`
    (mergeable bounded state) — exact ndv is the right default below
    the memory cliff because the same Expand pass also yields nulls
    for free. Output row order is the input column order (stable)."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f"_null_{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_ndv_{i}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{i}, _ndv_{i}" for i, c in enumerate(cols))
    return one.select(
        F.expr(f"stack({len(cols)}, {stack_args}) "
               "AS (column, n_null, ndv)"),
        F.col("_n").alias("n_rows"),
    ).select("column", "n_rows", "n_null", "ndv")


def skew_report(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Join/shuffle-key skew diagnosis: the top-``top`` heaviest keys
    with their exact counts and parts-per-million share of the table —
    the measurement that decides WHETHER to salt (see
    `convstats.conv_context_windows_salted`) and by HOW MUCH, before a
    100 TB shuffle discovers the answer the hard way. NULL keys are
    reported as a key (the classic real-world hot key: a nullable join
    column funnels every null into one reducer).

    One partial-agg Exchange of (key, count) longs + a
    TakeOrderedAndProject for the top slice; the share is exact
    integer arithmetic (ppm = cnt * 1_000_000 DIV total), so the
    output is engine-bit-stable. Ranking breaks count ties on the key
    with NULLS FIRST pinned explicitly — null ordering is an engine
    fork otherwise."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    total = df.count()
    w = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.asc_nulls_first("key")))
    return (counts
            .withColumn("ppm", F.expr(f"(cnt * 1000000) div {total}"))
            .withColumn("rank", w)
            .filter(F.col("rank") <= top)
            .select(F.col("key").cast("string").alias("key"),
                    "cnt", "ppm", "rank"))
