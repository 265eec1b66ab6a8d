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


def histogram_quantiles(df: DataFrame, value_col: str,
                        ps: tuple = (0.5, 0.9, 0.99),
                        bins: int = 128) -> DataFrame:
    """Quantile estimation from a fixed-grid histogram — the bounded-
    state member of the sketch trio (`distinct_kmv` cardinality,
    `cms_sketch` frequency, this one order statistics). An exact
    percentile sorts or windows the full column; the histogram needs
    ONE partial-agg Exchange of at most ``bins`` longs (mergeable:
    histograms add cell-wise), then interpolates each requested p
    inside its bucket — error bounded by the bin width, the classic
    DB2/Postgres equi-width ANALYZE histogram. Engine-exact where
    t-digest/GK sketches are implementation-private: the bin rule
    ``least(floor((x-lo)/(hi-lo)*B), B-1)`` and the interpolation are
    plain IEEE arithmetic both engines replay (estimates rounded 6dp).

    lo/hi are the measured min/max (two scalars, collected once with
    the non-null count). NULL values are excluded (percentile
    semantics). Degenerate all-equal columns return that value for
    every p. Output: (p, est) per requested percentile."""
    from pyspark.sql import Row
    from pyspark.sql.window import Window

    spark = df.sparkSession
    s = df.agg(F.min(value_col).alias("lo"), F.max(value_col).alias("hi"),
               F.count(value_col).alias("n")).first()
    lo, hi, n = float(s["lo"]), float(s["hi"]), int(s["n"])
    pdf = spark.createDataFrame([Row(p=float(p)) for p in ps])
    if hi == lo:
        return pdf.select("p", F.round(F.lit(lo), 6).alias("est"))

    b = F.least(F.floor((F.col(value_col) - lo) / (hi - lo) * bins),
                F.lit(bins - 1)).cast("long")
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(b.alias("bin"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    cum = F.sum("cnt").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
    hist = counts.select("bin", "cnt", cum.alias("cum"))

    width = (hi - lo) / bins
    target = F.col("p") * n
    est = (F.lit(lo) + F.col("bin") * width
           + (target - (F.col("cum") - F.col("cnt")))
           / F.col("cnt") * width)
    # first bin whose cumulative count reaches the target rank
    pick = Window.partitionBy("p").orderBy("bin")
    return (pdf.join(hist, F.col("cum") >= target)
            .withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select("p", F.round(est, 6).alias("est")))


def histogram_quantiles_by(df: DataFrame, group_col: str, value_col: str,
                           ps: tuple = (0.5, 0.9, 0.99),
                           bins: int = 64) -> DataFrame:
    """`histogram_quantiles` per GROUP — the shape ANALYZE actually
    runs (one histogram per column per partition/type), and fully
    in-plan: the per-group lo/hi/n live in a tiny broadcast-joined
    stats frame instead of driver scalars, so one pass fits ANY number
    of groups. Per group: ≤``bins`` cells, cumulative window over the
    tiny cell frame, in-bucket interpolation per requested p.

    NULL groups are kept (standard GROUP BY) — all group joins are
    NULL-SAFE (`eqNullSafe` / IS NOT DISTINCT FROM): a plain equi-join
    or USING would silently drop the NULL group's rows (the
    distinct_kmv hostile-suite lesson). Degenerate all-equal groups
    return their constant for every p. Output:
    (group, p, est) — estimates 6dp."""
    from pyspark.sql import Row
    from pyspark.sql.window import Window

    base = df.filter(F.col(value_col).isNotNull()) \
        .select(F.col(group_col).alias("g"),
                F.col(value_col).cast("double").alias("v"))
    gs = base.groupBy("g").agg(F.min("v").alias("lo"),
                               F.max("v").alias("hi"),
                               F.count(F.lit(1)).alias("n"))
    joined = base.join(F.broadcast(gs.withColumnRenamed("g", "g2")),
                       F.col("g").eqNullSafe(F.col("g2"))).drop("g2")
    bin_c = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(F.floor((F.col("v") - F.col("lo"))
                        / (F.col("hi") - F.col("lo")) * bins),
                F.lit(bins - 1))).cast("long")
    cells = (joined.groupBy("g", bin_c.alias("bin"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    cum = F.sum("cnt").over(
        Window.partitionBy("g").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0))
    hist = (cells.select("g", "bin", "cnt", cum.alias("cum"))
            .join(F.broadcast(gs.withColumnRenamed("g", "g2")),
                  F.col("g").eqNullSafe(F.col("g2"))).drop("g2"))

    spark = df.sparkSession
    pdf = spark.createDataFrame([Row(p=float(p)) for p in ps])
    width = (F.col("hi") - F.col("lo")) / bins
    target = F.col("p") * F.col("n")
    est = F.when(
        F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
        F.col("lo") + F.col("bin") * width
        + (target - (F.col("cum") - F.col("cnt")))
        / F.col("cnt") * width)
    pick = Window.partitionBy("g", "p").orderBy("bin")
    return (hist.join(pdf, F.col("cum") >= target)
            .withColumn("_rn", F.row_number().over(pick))
            .filter(F.col("_rn") == 1)
            .select(F.col("g").alias(group_col), "p",
                    F.round(est, 6).alias("est")))
