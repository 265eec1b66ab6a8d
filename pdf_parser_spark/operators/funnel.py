"""Event-sequence analytics over the events table: ordered funnels and
value percentiles.

The funnel — "which users did signup, then view, then purchase, in that
order, and when" — is the canonical event-sequence query every
analytics engine ships. The classic SQL formulation chains one
aggregation + self-join per stage (N shuffles + N joins for an N-step
funnel). This implementation does it in ONE shuffle: events are pruned
to funnel steps map-side, gathered per user as a time-sorted array, and
folded with Spark's `aggregate` higher-order function — a linear scan
per user, entirely inside whole-stage codegen, no Python anywhere.

Stage semantics are strict: stage k matches the earliest step-k event
whose timestamp is STRICTLY after the matched stage-(k-1) event
(equal timestamps do not advance the funnel — the rule an engine must
pin down for cross-engine reproducibility; the DuckDB oracle's
min-over-join formulation implies the same rule).

Scale: the per-user array holds only FUNNEL-STEP events (the isin
prune runs at the scan), so its size is bounded by a user's funnel
activity, not their event volume; user_id is a uniform key. The
reference has no event ops (SURVEY.md §2.8) — north-rule addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(col: str) -> F.Column:
    """Session-timezone-INDEPENDENT epoch micros of a timestamp column:
    parquet timestamps load as TIMESTAMP_NTZ, and routing them through a
    timestamp_ltz cast shifts the value by whatever timezone the
    driver's session happens to use (caught by tools/driver_sim.py).
    timestampdiff against an NTZ origin reads the wall clock as UTC in
    ANY session, matching DuckDB's epoch_us on the same column."""
    return F.expr(
        "timestampdiff(MICROSECOND, to_timestamp_ntz('1970-01-01 00:00:00'), "
        f"cast({col} as timestamp_ntz))")


def funnel_stages(events: DataFrame, steps: tuple = ("signup", "view",
                                                     "purchase"),
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Per user: epoch-micro timestamps ``t1..tN`` at which each funnel
    stage was first reached (null from the first unreached stage on)
    and ``max_stage`` (0..N). One groupBy + one codegen fold."""
    n = len(steps)
    per_user = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            user_col,
            F.struct(
                _epoch_us(ts_col).alias("t"),
                F.col(type_col).alias("et")).alias("e"))
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("e")).alias("seq")))

    init = "array(" + ", ".join(["cast(null as bigint)"] * n) + ")"
    branches = []
    for k, step in enumerate(steps):
        prev_ok = "true" if k == 0 else \
            f"acc[{k - 1}] is not null and x.t > acc[{k - 1}]"
        newacc = "array(" + ", ".join(
            f"x.t" if j == k else f"acc[{j}]" for j in range(n)) + ")"
        branches.append(
            f"when x.et = '{step}' and acc[{k}] is null and {prev_ok} "
            f"then {newacc}")
    fold = (f"aggregate(seq, {init}, (acc, x) -> case "
            + " ".join(branches) + " else acc end)")
    out = per_user.select(user_col, F.expr(fold).alias("st"))
    stage_cols = [F.col("st").getItem(k).alias(f"t{k + 1}")
                  for k in range(n)]
    reached = sum(
        (F.when(F.col("st").getItem(k).isNotNull(), 1).otherwise(0)
         for k in range(n)), F.lit(0))
    return out.select(user_col, *stage_cols,
                      reached.cast("long").alias("max_stage"))


def funnel_counts(events: DataFrame, steps: tuple = ("signup", "view",
                                                     "purchase"),
                  user_col: str = "user_id") -> DataFrame:
    """The funnel report: users reaching at least each stage (a second
    tiny rollup over the per-user frame)."""
    st = funnel_stages(events, steps, user_col)
    # coalesce: sum over the empty global aggregate is null, but a funnel
    # with no step events reached zero users, not unknown-many
    return (st.groupBy()
            .agg(*[F.coalesce(
                       F.sum(F.when(F.col("max_stage") >= k + 1, 1)
                             .otherwise(0)), F.lit(0))
                   .cast("long").alias(f"reached_{s}")
                   for k, s in enumerate(steps)]))


def value_percentiles(events: DataFrame, ps: tuple = (0.5, 0.9, 0.99),
                      key_col: str = "event_type",
                      value_col: str = "value",
                      exact: bool = True) -> DataFrame:
    """Per-key value percentiles. ``exact=True`` uses Spark's exact
    `percentile` (linear interpolation — the same definition as ANSI
    `percentile_cont` / DuckDB `quantile_cont`, so the oracle matches
    to rounding); it buffers each group's values, which is fine for
    bounded groups but NOT for 100 TB — at scale pass ``exact=False``
    for the t-digest `approx_percentile` (mergeable partial state,
    bounded memory, no cross-engine oracle)."""
    fn = "percentile" if exact else "approx_percentile"
    arr = ", ".join(str(p) for p in ps)
    agg = F.expr(f"{fn}({value_col}, array({arr}))").alias("q")
    out = events.groupBy(key_col).agg(agg)
    return out.select(
        key_col,
        *[F.round(F.col("q").getItem(i), 4).alias(f"p{round(p * 100)}")
          for i, p in enumerate(ps)])


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix — the third classic event-analytics query
    (funnel, percentile, retention): users are cohorted by their first
    active UTC day; each (cohort_day, day_offset) cell counts the cohort
    members active that many days later. Days are integer epoch days
    derived through the tz-independent `_epoch_us`, so the matrix is
    engine- and session-portable.

    Three partial-agg shuffles on uniform keys — distinct (user, day)
    activity, per-user min for the cohort, and the final cell rollup
    (a plain count: activity is already distinct). The activity frame
    is the largest thing shuffled and it is two longs per user-day."""
    day = F.floor(_epoch_us(ts_col) / F.lit(86400000000)).cast("long")
    act = events.select(F.col(user_col), day.alias("day")).distinct()
    cohort = act.groupBy(user_col).agg(F.min("day").alias("cohort_day"))
    return (act.join(cohort, user_col)
            .groupBy("cohort_day",
                     (F.col("day") - F.col("cohort_day")).alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def json_props_rollup(events: DataFrame, field: str = "k",
                      type_col: str = "event_type",
                      props_col: str = "props") -> DataFrame:
    """Semi-structured extraction + rollup: pull a field out of the JSON
    ``props`` payload column and aggregate it per event type — the
    schema-on-read pattern for event streams whose payloads evolve
    faster than their tables (the alternative, a full from_json with a
    declared schema, is `io.read_jsonl`'s contract; this one reads ONE
    path lazily). `get_json_object` evaluates the JSONPath per row in
    codegen without materializing a parsed tree, and TRY_CAST (not
    CAST: ANSI mode throws on malformed numerics) nulls anything that
    is not an integer — malformed JSON, missing field, wrong type all
    degrade to NULL and are counted, never failures (D1 at the payload
    level). One partial-agg Exchange; integers only, engine-exact."""
    k = F.expr(f"try_cast(get_json_object({props_col}, '$.{field}') "
               "AS LONG)")
    return (events
            .select(F.col(type_col), k.alias("k"))
            .groupBy(type_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count("k").alias("n_with_field"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))
