"""Temporal join and multi-resolution rollup operators over the events
table — the time-series workload (as-of joins, interval containment,
hypertable-style continuous aggregates) that sits beside the funnel /
percentile analytics in `operators.funnel`.

These are operators Spark famously LACKS as built-ins (an `ASOF JOIN`
keyword shipped in DuckDB/Pandas/QuestDB; `time_bucket` rollups in
TimescaleDB), so each is re-expressed as a composition of DataFrame
primitives whose plan shape survives 100 TB:

- as-of join: the union-and-window technique — tag both sides, union,
  one window pass per key carrying the last right-side timestamp
  forward. ONE shuffle on the join key, no range explosion, no
  quadratic candidate pairs (the naive `t_r <= t_l` theta-join is a
  broadcast-nested-loop that dies at scale).
- interval containment: buckets-as-equi-keys — intervals exploded to
  their covering time bins, points bucketed to one bin, equi-join +
  residual predicate. Spark turns non-equi time joins into BNLJ;
  binning restores hash-join shape.
- hypertable rollup: `rollup()` grouping sets over a time bucket —
  every granularity computed in ONE pass with partial aggregation
  (the Expand operator multiplies rows map-side, then one exchange of
  partial aggregates; N separate groupBys would be N scans + N
  shuffles).

Timestamps follow the repo-wide `_epoch_us` contract (timezone-proof
NTZ micros, `operators/funnel.py:31`). The reference has no temporal
ops (SURVEY.md §2.8) — these are north-rule additions for the
training-data / analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_parser_spark.operators.funnel import _epoch_us

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def asof_join_latest(events: DataFrame,
                     left_type: str = "purchase",
                     right_type: str = "click",
                     user_col: str = "user_id",
                     type_col: str = "event_type",
                     ts_col: str = "ts") -> DataFrame:
    """As-of join within the event stream: for every ``left_type``
    event, the timestamp of the latest ``right_type`` event by the same
    user at-or-before it (inclusive on ties) — "which click led to this
    purchase". Equivalent to DuckDB's
    ``purchases ASOF LEFT JOIN clicks ON user AND p.ts >= c.ts``.

    Implementation is the union-and-window technique, not a range join:
    both sides are pruned map-side (`isin` pushed to the scan), tagged
    with a side bit, unioned, and a single running `last(right_ts,
    ignorenulls)` window per user carries the match forward. The sort
    key is ``(t_us, side)`` with the right side sorting FIRST, which is
    exactly what makes the equal-timestamp match inclusive. Output is
    tie-safe: only the matched TIMESTAMP is emitted (when several right
    events share one timestamp, any engine's choice of row is arbitrary
    but the asof timestamp is not).

    Scale: ONE exchange, keyed on user_id — a uniform key here; a
    mega-user would be handled the same way the extraction pipeline
    salts mega-conversations (split the window into salted chunks and
    stitch the boundary, worth it only past ~10^7 events/user). The
    naive formulation (theta-join `c.ts <= p.ts` + max) is a
    broadcast-nested-loop producing O(clicks_per_user) candidates per
    purchase; this is O(events) total.
    """
    t_us = _epoch_us(ts_col)
    base = (events
            .filter(F.col(type_col).isin([left_type, right_type]))
            .select(F.col(user_col).alias("user_id"),
                    t_us.alias("t_us"),
                    (F.col(type_col) == left_type).cast("int")
                    .alias("side"),
                    F.col("event_id")))
    w = (Window.partitionBy("user_id")
         .orderBy("t_us", "side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    asof = F.last(F.when(F.col("side") == 0, F.col("t_us")),
                  ignorenulls=True).over(w)
    return (base
            .withColumn("asof_t_us", asof)
            .filter(F.col("side") == 1)
            .select("event_id", "user_id", "t_us", "asof_t_us",
                    (F.col("t_us") - F.col("asof_t_us"))
                    .alias("gap_us")))


def congestion_windows(events: DataFrame,
                       bucket_us: int = US_PER_HOUR,
                       min_events: int = 20,
                       ts_col: str = "ts") -> DataFrame:
    """Maximal high-traffic intervals: time buckets holding at least
    ``min_events`` events, adjacent hot buckets merged into one window
    (gaps-and-islands). Output ``(win_start_us, win_end_us)`` with the
    end EXCLUSIVE.

    Scale: the bucket aggregation is a uniform-key partial agg whose
    output cardinality is bounded by the TIME RANGE over the bucket
    width (one month of hours = 744 rows), independent of event volume
    — so the islands window's single-partition sort is over a
    bounded-by-calendar frame, not by data size. Bucket indices use
    integer `div` (DuckDB `//`): identical floor semantics for the
    non-negative epoch micros here.
    """
    b = F.expr(f"t_us div {bucket_us}").alias("b")
    hot = (events
           .select(_epoch_us(ts_col).alias("t_us"))
           .select(b)
           .groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
           .filter(F.col("cnt") >= min_events))
    iw = Window.orderBy("b")
    return (hot
            .withColumn("g", F.col("b") - F.row_number().over(iw))
            .groupBy("g")
            .agg(F.min("b").alias("sb"), F.max("b").alias("eb"))
            .select((F.col("sb") * bucket_us).alias("win_start_us"),
                    ((F.col("eb") + 1) * bucket_us)
                    .alias("win_end_us")))


def interval_join_events(events: DataFrame,
                         point_type: str = "error",
                         bucket_us: int = US_PER_HOUR,
                         min_events: int = 20,
                         ts_col: str = "ts",
                         type_col: str = "event_type") -> DataFrame:
    """Point-in-interval join: which congestion window (see
    `congestion_windows`) contains each ``point_type`` event — "were the
    errors clustered inside the traffic spikes". Non-equi time joins
    compile to BroadcastNestedLoopJoin in Spark; this restores hash-join
    shape by the bins-as-equi-keys trick: every interval is exploded to
    the time bins it covers (`sequence`), every point maps to exactly
    one bin, and the join is a plain equi-join on the bin index with a
    residual containment predicate. Windows here are merged maximal
    intervals, so they are DISJOINT and each point matches at most one —
    no post-join dedup needed.

    Scale: the interval side is calendar-bounded (see
    `congestion_windows`), so the bin table broadcasts at any corpus
    size; the point side never shuffles at all. For interval sides that
    genuinely grow with the data, the same binning still works as a
    shuffle equi-join on uniform bin keys, with bin width chosen so the
    per-bin interval fanout stays O(1)."""
    wins = congestion_windows(events, bucket_us, min_events, ts_col)
    bins = wins.select(
        "win_start_us", "win_end_us",
        F.explode(F.sequence(
            F.expr(f"win_start_us div {bucket_us}"),
            F.expr(f"(win_end_us - 1) div {bucket_us}"))).alias("b"))
    pts = (events
           .filter(F.col(type_col) == point_type)
           .select("event_id", _epoch_us(ts_col).alias("t_us"))
           .withColumn("b", F.expr(f"t_us div {bucket_us}")))
    return (pts
            .join(F.broadcast(bins), "b")
            .filter((F.col("t_us") >= F.col("win_start_us"))
                    & (F.col("t_us") < F.col("win_end_us")))
            .select("event_id", "t_us", "win_start_us", "win_end_us"))


def hyper_rollup(events: DataFrame,
                 bucket_us: int = US_PER_DAY,
                 ts_col: str = "ts",
                 type_col: str = "event_type",
                 value_col: str = "value") -> DataFrame:
    """Hypertable-style continuous aggregate: event counts and value
    sums at EVERY granularity of (day bucket, event type) — per
    (day, type), per day, and the grand total — in one pass via
    `rollup()` grouping sets. ``gid`` is Spark's `grouping_id()`
    bitmask (0 = finest, 3 = grand total; DuckDB's GROUPING() uses the
    same MSB-first convention, verified).

    Money-grade exactness: values are 2-decimal doubles, so sums run in
    integer cents (the `plans.relational` policy) — bit-identical
    across engines and partition orders, immune to double reassociation.

    Scale: ONE exchange. The Expand operator emits the 3 grouping-set
    replicas map-side, partial aggregation collapses them before the
    shuffle, and the exchange carries only per-(bucket,type,gid)
    partials — the classic reason rollup beats N separate groupBys
    (N scans, N shuffles) at 100 TB."""
    day = F.expr(f"t_us div {bucket_us}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (events
            .select(_epoch_us(ts_col).alias("t_us"),
                    F.col(type_col).alias("event_type"),
                    cents.alias("vc"))
            .select(day.alias("day_idx"), "event_type", "vc")
            .rollup("day_idx", "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("vc") / 100, 2).alias("sum_value"),
                 F.grouping_id().alias("gid")))


def rate_anomaly(events: DataFrame, window: int = 24,
                 min_hist: int = 12, type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Event-rate anomaly scores: hourly counts per type, z-scored
    against the trailing ``window`` OBSERVED buckets — the monitoring
    rollup that sits on every ingest pipeline ("did the error rate
    spike this hour"). Emits one row per (type, hour bucket) with at
    least ``min_hist`` trailing buckets: the count, trailing mean, and
    the 4dp z-score.

    Engine-exact variance: the trailing moments are INTEGER sums
    (sum c, sum c², n — order-independent), and mean/variance derive
    from them in one pinned double-op order
    (var = (sumsq - sum*sum/n) / (n-1)), so the z-score is portable
    without the accepted-reassociation caveat the float aggregates
    carry. Exactness domain: int64 moments hold while every bucket
    count stays under ~3.0e9 (c² < 2^63) and the trailing sum's square
    does too — beyond that, pre-aggregate to finer buckets or per-type
    shards before scoring; engines FORK past the bound (Spark wraps
    silently with ANSI off, SQL engines promote to 128-bit), so the
    bound is the contract, not a soft limit. Buckets with zero events are NOT materialized — the z is
    over observed buckets (a dense-spine variant would sequence() the
    calendar; at 100 TB the observed form is also the one whose state
    is bounded by activity, not by time).

    Scale: one partial-agg exchange to (type, bucket) counts —
    cardinality = types × active hours, tiny — then one window per
    type over that tiny frame. The raw events never hit a window.

    Null contract (hostile events suite): null-timestamp events are
    EXCLUDED — they have no bucket, and a null bucket row would sit
    FIRST in Spark's window order but LAST in SQL engines', silently
    shifting every early bucket's trailing moments. Null types are a
    legitimate group and are kept."""
    b = F.floor(_epoch_us(ts_col) / US_PER_HOUR).alias("bucket")
    counts = (events.filter(F.col(ts_col).isNotNull())
              .groupBy(F.col(type_col).alias("event_type"), b)
              .agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy("event_type").orderBy("bucket")
         .rowsBetween(-window, -1))
    stats = (counts
             .withColumn("_n", F.count(F.lit(1)).over(w))
             .withColumn("_s", F.sum("c").over(w))
             .withColumn("_q", F.sum(F.col("c") * F.col("c")).over(w)))
    mean = F.col("_s") / F.col("_n")
    var = (F.col("_q") - F.col("_s") * F.col("_s") / F.col("_n")) \
        / (F.col("_n") - 1)
    return (stats.filter(F.col("_n") >= min_hist)
            .select("event_type", "bucket", "c",
                    F.round(mean, 4).alias("trailing_mean"),
                    F.when(var > 0,
                           F.round((F.col("c") - mean) / F.sqrt(var), 4))
                    .alias("z")))


def ewma_hourly(events: DataFrame, alpha: float = 0.1, window: int = 24,
                type_col: str = "event_type",
                ts_col: str = "ts") -> DataFrame:
    """Exponentially-weighted moving average of hourly event rates —
    `rate_anomaly`'s smoothed-baseline companion (EWMA is the control-
    chart statistic: it reacts to level SHIFTS that a z-score against a
    flat trailing mean under-weights). Per (type, hour): the EWMA over
    the trailing ``window`` observed buckets,

        s = fold(counts[t-W+1 .. t]; s0 = first, s <- a*x + (1-a)*s)

    computed as a per-row left fold over the windowed count list — the
    recursive definition is not a relational window function, but a
    BOUNDED fold over a ``window``-element array is one codegen
    expression (and DuckDB's list_reduce replays the identical
    left-fold, seeded with the first element, so the gate is a full
    value-hash despite the recursion). Same null/bucket contracts as
    `rate_anomaly`; same tiny post-aggregate frame — the raw events
    never hit a window."""
    b = F.floor(_epoch_us(ts_col) / US_PER_HOUR).alias("bucket")
    counts = (events.filter(F.col(ts_col).isNotNull())
              .groupBy(F.col(type_col).alias("event_type"), b)
              .agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy("event_type").orderBy("bucket")
         .rowsBetween(-(window - 1), 0))
    arr = F.collect_list(F.col("c").cast("double")).over(w)
    a1, a0 = float(alpha), 1.0 - float(alpha)
    ewma = F.expr(
        f"round(aggregate(slice(_arr, 2, {window}), "
        f"element_at(_arr, 1), "
        f"(a, x) -> {a1!r}D * x + {a0!r}D * a), 6)")
    return (counts.withColumn("_arr", arr)
            .select("event_type", "bucket", "c",
                    F.size("_arr").alias("n_window"),
                    ewma.alias("ewma")))
