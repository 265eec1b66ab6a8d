"""Deterministic cardinality sketches.

Spark's native approximate-distinct is `approx_count_distinct`
(HyperLogLog++), which is the right 100 TB answer when cross-engine
reproducibility doesn't matter — but its register layout is
implementation-private, so no other engine can replay the estimate and
a correctness gate can't pin it. The KMV (k-minimum-values) sketch
here trades a little variance for full auditability: the sketch state
is just the k smallest md5 hashes of the key, a pure function of the
data that ANY engine reproduces bit-for-bit (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"; estimator
(k-1)/U_(k)).

The reference has no sketches (SURVEY.md §2.8) — north-rule addition
for the analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: inside both engines' comfortable integer
# ranges (signed int64 here, UBIGINT in the DuckDB twin).
_KMV_BITS = 60
_KMV_KEYSPACE = 1 << _KMV_BITS


def kmv_key(key_col: str, salt: str = "kmv") -> F.Column:
    """Uniform 60-bit hash of ``key:salt`` — the same md5-prefix rule as
    `corpus.scrub.sample_key`, widened to 60 bits so the kth-minimum
    statistic has negligible collision probability."""
    h = F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def distinct_kmv(df: DataFrame, group_col: str, key_col: str,
                 k: int = 64, salt: str = "kmv") -> DataFrame:
    """Per-group distinct-count estimate via the KMV sketch, alongside
    the exact count for error audit. Estimate: if the group holds fewer
    than ``k`` distinct keys the sketch IS the exact set; otherwise
    ``(k-1) * keyspace / U_k`` with ``U_k`` the kth smallest hash.

    Both the estimate and the exact count flow from one `distinct` of
    (group, hash) pairs, so the whole query is: one dedup exchange, one
    window over the deduped pairs, one tiny per-group rollup. The
    division is double-on-double from identical integer operands, so
    the rounded estimate is engine-portable.

    Scale honesty: this formulation shuffles the DISTINCT pairs (same
    cost class as an exact distinct count) because Spark lacks a native
    bounded k-min aggregate; the sketch's real 100 TB win — a mergeable
    k-row state per group replacing the distinct shuffle — needs a
    custom JVM Aggregator (or `approx_count_distinct` when
    auditability isn't required). What this operator pins down is the
    portable SEMANTICS of the sketch: the estimator, the hash contract,
    and the exact-below-k rule, gate-verified cross-engine.

    Plan shape: ONE pass over one distinct frame — the k-min rank and
    the exact group count are both window functions over the same
    `grp` partitioning, so they share a single exchange (a two-branch
    exact/sketch formulation recomputed the distinct upstream twice and
    joined; measured 2x slower at sf1). The dedup itself is a partial
    aggregate (map-side collapse of duplicate keys).

    Null contract (pinned by the hostile events suite): NULL keys are
    EXCLUDED — `count(distinct key)` ignores nulls in every engine,
    and a null key also hashes to a null rank that Spark sorts first
    while SQL engines sort last, so including it would fork the kth
    minimum. NULL groups are kept (standard GROUP BY semantics); a
    group whose keys are all null vanishes in both engines."""
    pairs = (df.filter(F.col(key_col).isNotNull())
             .select(F.col(group_col).alias("grp"),
                     kmv_key(key_col, salt).alias("h"))
             .distinct())
    wk = Window.partitionBy("grp").orderBy("h")
    wall = Window.partitionBy("grp")
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")).otherwise(
        F.lit(float((k - 1) * _KMV_KEYSPACE)) / F.col("hk").cast("double"))
    return (pairs
            .select("grp", "h",
                    F.row_number().over(wk).alias("rn"),
                    F.count(F.lit(1)).over(wall).alias("n_exact"))
            .filter(F.col("rn") <= k)
            .groupBy("grp", "n_exact")
            .agg(F.max("h").alias("hk"))
            .select(F.col("grp").alias(group_col), "n_exact",
                    F.round(est, 2).alias("kmv_est")))
