"""Classic relational reporting queries over the TPC-H-style tables —
the warehouse workload every analytics engine must also serve beside
the extraction/curation pipelines.

Money arithmetic is INTEGER CENTS throughout: prices/discounts/taxes in
the source data are exact 2-decimal values stored as doubles, so
``cast(round(x*100) as bigint)`` reconstructs the exact integer and
every aggregate below is integer-exact — bit-identical across engines
and immune to the float-sum reassociation that plagues distributed
aggregation (a 60k-row double sum can drift ~1e-3 between partition
orders; an int64 sum cannot). Final columns divide back by the scale
factor once, at the end. The same integer-stability policy as
``textstats.topk_terms``.

Scale notes per query in the docstrings; both plans are
pushdown+partial-agg shapes, and the Q3 join broadcasts the dimension
side (plan-asserted in PLANS.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_parser_spark.operators.funnel import _epoch_us


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def pricing_summary(lineitem: DataFrame,
                    cutoff: str = "1998-12-01") -> DataFrame:
    """TPC-H Q1 (pricing summary report): per (returnflag, linestatus)
    over lineitems shipped up to ``cutoff`` — quantities, gross and
    discounted revenue, charge including tax, averages, row count.

    disc_price = price·(1−disc) and charge = disc_price·(1+tax) are
    integer products of cent/percent values (scale 10^2·10^2 = 10^4 and
    10^6 respectively — far inside int64 for any realistic row). The
    date filter is pushed to the parquet scan (row-group pruning); the
    aggregation is a two-phase partial agg on a handful of group keys —
    the canonical map-side-combine shape, no skew possible with a
    6-value key space."""
    pc = _cents("l_extendedprice")
    dp = F.round(F.col("l_discount") * 100).cast("long")   # percent
    tp = F.round(F.col("l_tax") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    disc_price = pc * (100 - dp)            # cents·10^2
    charge = disc_price * (100 + tp)        # cents·10^4
    agg = (lineitem
           .filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(qty).alias("sum_qty"),
                F.sum(pc).alias("_base_c"),
                F.sum(disc_price).alias("_disc_c2"),
                F.sum(charge).alias("_charge_c4"),
                F.count(F.lit(1)).alias("count_order")))
    n = F.col("count_order")
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty",
        F.round(F.col("_base_c") / 100, 2).alias("sum_base_price"),
        F.round(F.col("_disc_c2") / 10000, 2).alias("sum_disc_price"),
        F.round(F.col("_charge_c4") / 1000000, 2).alias("sum_charge"),
        F.round(F.col("sum_qty") / n, 4).alias("avg_qty"),
        F.round(F.col("_base_c") / n / 100, 4).alias("avg_price"),
        F.round(F.col("_disc_c2") / n / 10000, 4).alias("avg_disc_price"),
        "count_order")


def top_revenue_orders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: str = "BUILDING",
                       date: str = "1998-01-01", k: int = 10) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-k unshipped orders by revenue
    for one market segment — orders placed before ``date`` with
    lineitems shipping after it.

    Join shape at scale: customer (filtered to one segment) is the
    small side and BROADCASTS into orders (plan-asserted), so the only
    wide exchange is lineitem's aggregation by orderkey — a uniform
    key. Both date predicates push to their scans. The top-k is a
    TakeOrderedAndProject (per-partition heap + driver merge of k
    rows), never a global sort; ties break by (orderdate, orderkey) so
    the result is total-ordered and engine-portable."""
    d = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment) \
        .select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < d).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    items = lineitem.filter(F.col("l_shipdate") > d).select(
        "l_orderkey",
        (_cents("l_extendedprice")
         * (100 - F.round(F.col("l_discount") * 100).cast("long")))
        .alias("rev_c2"))
    joined = (ords.join(F.broadcast(cust),
                        ords.o_custkey == cust.c_custkey)
              .join(items, ords.o_orderkey == items.l_orderkey)
              .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
              .agg(F.sum("rev_c2").alias("rev_c2")))
    return (joined
            .orderBy(F.col("rev_c2").desc(), F.col("o_orderdate").asc(),
                     F.col("o_orderkey").asc())
            .limit(k)
            .select("o_orderkey",
                    F.round(F.col("rev_c2") / 10000, 2).alias("revenue"),
                    _epoch_us("o_orderdate").alias("odate_us"),
                    "o_orderpriority"))


def local_supplier_volume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame,
                          region_name: str = "ASIA",
                          date: str = "1996-01-01") -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation from orders
    where the CUSTOMER and the line's SUPPLIER sit in the same nation
    of one region, for a one-year order window — the classic 6-way
    join that exercises join ORDERING, which Catalyst gets right here
    without hand-scheduling precisely because the plan is declared
    relationally.

    Join shape at scale (plan-asserted in PLANS.md): every dimension
    chain is a BROADCAST — region→nation→customer collapses to a
    customer-key set joined into orders; supplier⋈nation feeds
    lineitem — so the ONLY wide exchange is the orders⋈lineitem
    equi-join on orderkey (uniform key, AQE-planned). Only nation
    (bounded at 25 rows forever) carries an explicit broadcast HINT;
    the customer and supplier slices are left to the size-based
    planner, because a hint is unconditional — those dimensions GROW
    with the scale factor, and past Spark's broadcast hard limits a
    hinted plan ABORTS where the stats-based one degrades to a
    shuffle join.
    Date predicates push to the orders scan. Revenue is exact integer
    cents² (the module's money policy), divided back once at the end;
    the same-nation predicate is applied as the Q5 join condition
    c_nationkey = s_nationkey, and output rows order by revenue desc
    with the nation-name tiebreak so the result is total-ordered."""
    d0 = F.lit(date).cast("timestamp")
    d1 = F.lit(date).cast("timestamp") + F.expr("interval 1 year")
    nat = (nation.join(F.broadcast(
        region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name"))
    cust = (customer.join(F.broadcast(nat),
                          customer.c_nationkey == nat.n_nationkey)
            .select("c_custkey", F.col("n_nationkey").alias("c_nat"),
                    "n_name"))
    ords = (orders
            .filter((F.col("o_orderdate") >= d0)
                    & (F.col("o_orderdate") < d1))
            .select("o_orderkey", "o_custkey"))
    supp = (supplier.join(F.broadcast(nat.select("n_nationkey")),
                          supplier.s_nationkey == nat.n_nationkey)
            .select("s_suppkey", F.col("s_nationkey").alias("s_nat")))
    items = (lineitem
             .join(supp, lineitem.l_suppkey == supp.s_suppkey)
             .select("l_orderkey", "s_nat",
                     (_cents("l_extendedprice")
                      * (100 - F.round(F.col("l_discount") * 100)
                         .cast("long"))).alias("rev_c2")))
    return (ords.join(cust, ords.o_custkey == cust.c_custkey)
            .join(items, ords.o_orderkey == items.l_orderkey)
            .filter(F.col("c_nat") == F.col("s_nat"))
            .groupBy("n_name")
            .agg(F.round(F.sum("rev_c2") / 10000, 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("n_name").asc()))


def sales_cube(lineitem: DataFrame) -> DataFrame:
    """Sales summary at all four granularities of (returnflag,
    linestatus) — per pair, per flag, per status, grand total — in ONE
    pass via `cube()` grouping sets. The companion to
    `plans.temporal.hyper_rollup`: rollup is the hierarchy lattice
    (prefixes only), cube is the full lattice, and both compile to the
    same Expand + single partial-agg exchange. ``gid`` is
    `grouping_id()` (0 finest .. 3 grand total, MSB-first — identical
    to DuckDB's GROUPING()).

    Integer-cents exactness as in `pricing_summary`. Scale: Expand
    multiplies rows 4x MAP-SIDE, but partial aggregation collapses each
    replica to at most |key-space| rows before the exchange — with a
    6-value key space the shuffle carries a few dozen partials no
    matter how many billion lineitems feed it."""
    pc = _cents("l_extendedprice")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (lineitem
            .select("l_returnflag", "l_linestatus", pc.alias("pc"),
                    qty.alias("qty"))
            .cube("l_returnflag", "l_linestatus")
            .agg(F.sum("qty").alias("sum_qty"),
                 F.round(F.sum("pc") / 100, 2).alias("sum_base_price"),
                 F.count(F.lit(1)).alias("n_items"),
                 F.grouping_id().alias("gid")))


def apply_changeset(base: DataFrame, changes: DataFrame, key_col: str,
                    ts_col: str, op_col: str = "op") -> DataFrame:
    """MERGE INTO semantics without a table format: apply a CDC
    changeset (upserts + deletes) to a base snapshot, producing the next
    snapshot — the maintenance operation every Iceberg/Delta pipeline
    runs on ingest. ``changes`` rows carry ``op`` ('u' upsert /
    'd' delete) and a change timestamp; the LATEST change per key wins
    (ties broken in favor of the delete, so a same-instant upsert+delete
    deletes — the deterministic rule both engines must share), base rows
    rank below every change.

    One union + one window shuffle on the key — the same cost class as
    the shuffle join a MERGE compiles to, but with ONE pass and no
    join-explosion risk on duplicate change keys (dup keys collapse in
    the window instead of multiplying through a join). At scale the key
    is the table's primary key (uniform); AQE's skew split covers a
    hot-key changeset. Emits the base's columns only.
    """
    cols = [f.name for f in base.schema.fields]
    b = (base.select(*cols)
         .withColumn("_rank_ts", F.lit(None).cast("long"))
         .withColumn("_del", F.lit(0)))
    ch = (changes.select(*cols,
                         _epoch_us(ts_col).alias("_rank_ts"),
                         (F.col(op_col) == "d").cast("int").alias("_del")))
    w = (Window.partitionBy(key_col)
         .orderBy(F.col("_rank_ts").desc_nulls_last(),
                  F.col("_del").desc()))
    return (b.unionByName(ch)
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("_del") == 0))
            .select(*cols))


def scd2_history(base: DataFrame, changes: DataFrame, key_col: str,
                 ts_col: str, base_ts_col: str,
                 op_col: str = "op") -> DataFrame:
    """Type-2 slowly-changing-dimension historization: apply the same
    CDC changeset `apply_changeset` consumes, but instead of the next
    snapshot emit the FULL version history — one row per (key, version)
    with ``valid_from_us`` / ``valid_to_us`` (null = still open) and
    ``is_current``. This is the other half of every warehouse MERGE
    story: `apply_changeset` maintains the hot snapshot, this maintains
    the audit/history table.

    Version rules (the deterministic contract both engines share):
    each upsert opens a version at its change timestamp; the NEXT event
    on the key (upsert or delete) closes it at that event's timestamp;
    a delete closes without opening. The base row is version 0, valid
    from ``base_ts_col``. At equal timestamps the order is
    base < upsert < delete, so a change landing exactly at the base
    timestamp supersedes the base row (zero-length base version — kept,
    because SCD2 history never silently drops a state that existed),
    and a same-instant upsert+delete yields a closed zero-length
    version, mirroring `apply_changeset`'s delete-wins tie rule. The
    changeset must not carry two upserts on one (key, ts) — no total
    order exists for that; `validate` in the caller should enforce it.

    Plan: ONE union + ONE window shuffle on the key (lead() for the
    closing timestamp), exactly `apply_changeset`'s cost class — no
    self-join of versions, no range join, so duplicate-heavy keys cost
    O(versions log versions) in one partition rather than O(versions²)
    through a join. History grows monotonically; at 100 TB this runs
    on the changeset PLUS the previous open versions only (closed
    versions are immutable and never reread), which is what the
    one-pass union form enables.
    """
    cols = [f.name for f in base.schema.fields]
    b = (base.select(*cols)
         .withColumn("_ts", _epoch_us(base_ts_col))
         .withColumn("_src", F.lit(0)))
    ch = (changes.select(
        *cols, _epoch_us(ts_col).alias("_ts"),
        F.when(F.col(op_col) == "d", F.lit(2)).otherwise(F.lit(1))
        .alias("_src")))
    w = Window.partitionBy(key_col).orderBy("_ts", "_src")
    return (b.unionByName(ch)
            .withColumn("_to", F.lead("_ts").over(w))
            .filter(F.col("_src") != 2)
            .select(*cols,
                    F.col("_ts").alias("valid_from_us"),
                    F.col("_to").alias("valid_to_us"),
                    F.col("_to").isNull().cast("int").alias("is_current")))
