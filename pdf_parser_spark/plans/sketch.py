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


def cms_cell(key_col: str, row: int, width: int,
             salt: str = "cms") -> F.Column:
    """Cell index of ``key`` in sketch row ``row``: first 8 md5 hex
    digits of ``key:salt:row`` mod ``width`` — non-negative on both
    operands, so ``pmod``/``%`` agree across engines (the
    `_feat_bucket` hashing contract)."""
    h = F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(f":{salt}:{row}")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def cms_sketch(df: DataFrame, key_col: str, weight_col: str | None = None,
               depth: int = 4, width: int = 256,
               salt: str = "cms") -> DataFrame:
    """Count-Min sketch of a key stream (Cormode & Muthukrishnan 2005):
    ``depth`` hash rows of ``width`` cells; every key increments one
    cell per row; a key's frequency estimate is the MIN over its cells
    — always >= the true count, over by at most ~2/width of the total
    mass with probability 1 - 2^-depth. The point-query companion to
    `distinct_kmv`: bounded-size, mergeable, engine-reproducible
    frequency state where exact per-key counts would mean shuffling
    the full key space (the heavy-hitters building block).

    Scale shape: the cell coordinates are a per-row codegen projection
    (depth md5 calls), and the sketch aggregate is partial->final —
    map-side combine collapses every task to at most depth*width
    cells, so the Exchange carries O(tasks * depth * width) longs no
    matter how many input rows (the whole reason sketches exist).
    ``weight_col`` feeds pre-aggregated (key, count) relations — CMS
    over weighted keys is identical to CMS over the raw stream, so a
    tf relation the query already has can feed the sketch without a
    second corpus pass. NULL keys are excluded (the `distinct_kmv`
    null contract).

    Output: (row, cell, cnt) — at most depth*width rows."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.array(*[
        F.struct(F.lit(r).cast("long").alias("row"),
                 cms_cell(key_col, r, width, salt).alias("cell"))
        for r in range(depth)])
    return (df.filter(F.col(key_col).isNotNull())
            .select(w.alias("_w"), F.explode(cells).alias("rc"))
            .groupBy(F.col("rc.row").alias("row"),
                     F.col("rc.cell").alias("cell"))
            .agg(F.sum("_w").cast("long").alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 256,
                 salt: str = "cms") -> DataFrame:
    """Point-query a CMS: for each key in ``keys`` (small — a candidate
    list), the min over its ``depth`` cells. The sketch (at most
    depth*width rows) broadcasts, so the probe is a map-side join +
    one tiny per-key rollup; keys absent from the stream estimate 0
    via the left-join coalesce (an empty cell never has a row)."""
    cells = F.array(*[
        F.struct(F.lit(r).cast("long").alias("row"),
                 cms_cell(key_col, r, width, salt).alias("cell"))
        for r in range(depth)])
    probes = (keys.filter(F.col(key_col).isNotNull())
              .select(F.col(key_col), F.explode(cells).alias("rc"))
              .select(key_col, F.col("rc.row").alias("row"),
                      F.col("rc.cell").alias("cell")))
    return (probes
            .join(F.broadcast(sketch), ["row", "cell"], "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_est")))
