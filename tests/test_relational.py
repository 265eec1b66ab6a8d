"""Relational reporting tests: integer-cents exactness and top-k
determinism."""

from datetime import datetime

from pdf_parser_spark.plans import relational as R


def test_pricing_summary_cents_exact(spark):
    rows = [
        # (flag, status, qty, price, disc, tax, shipdate)
        ("A", "F", 10.0, 100.10, 0.05, 0.02, datetime(1998, 1, 1)),
        ("A", "F", 20.0, 200.20, 0.10, 0.00, datetime(1998, 2, 1)),
        ("N", "O", 1.0, 0.03, 0.00, 0.08, datetime(1998, 3, 1)),
        ("A", "F", 99.0, 999.99, 0.01, 0.01, datetime(1999, 6, 1)),  # cut
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, l_quantity double, "
              "l_extendedprice double, l_discount double, l_tax double, "
              "l_shipdate timestamp")
    got = {(r.l_returnflag, r.l_linestatus): r
           for r in R.pricing_summary(df, cutoff="1998-12-01").collect()}
    af = got[("A", "F")]
    assert af.sum_qty == 30 and af.count_order == 2
    assert af.sum_base_price == 300.30
    # 100.10*0.95 + 200.20*0.90 = 95.095 + 180.18 = 275.275 -> 275.28
    assert af.sum_disc_price == 275.28
    # 95.095*1.02 + 180.18*1.00 = 96.9969 + 180.18 = 277.1769 -> 277.18
    assert af.sum_charge == 277.18
    no = got[("N", "O")]
    assert (no.sum_base_price, no.sum_charge) == (0.03, 0.03)  # 3c*1.08=3.24c
    # stability under repartitioning (the float-sum failure mode)
    got2 = {(r.l_returnflag, r.l_linestatus): r.sum_charge
            for r in R.pricing_summary(df.repartition(7),
                                       cutoff="1998-12-01").collect()}
    assert got2[("A", "F")] == af.sum_charge


def test_top_revenue_orders_ordering(spark):
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")],
        "c_custkey long, c_mktsegment string")
    d0, d1 = datetime(1997, 1, 1), datetime(1999, 1, 1)
    orders = spark.createDataFrame(
        [(10, 1, d0, "1-URGENT"), (11, 1, d0, "2-HIGH"),
         (12, 2, d0, "3-LOW"),      # wrong segment
         (13, 1, d1, "1-URGENT")],  # ordered after cutoff
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string")
    items = spark.createDataFrame(
        [(10, 100.0, 0.0, d1), (11, 100.0, 0.0, d1), (11, 50.0, 0.5, d1),
         (12, 900.0, 0.0, d1), (13, 900.0, 0.0, d1),
         (10, 900.0, 0.0, d0)],  # shipped before cutoff
        "l_orderkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp")
    got = [(r.o_orderkey, r.revenue) for r in R.top_revenue_orders(
        cust, orders, items, segment="BUILDING",
        date="1998-01-01", k=10).collect()]
    # order 11: 100 + 50*0.5 = 125; order 10: 100
    assert got == [(11, 125.0), (10, 100.0)]


def test_local_supplier_volume_same_nation_rule(spark):
    """Q5 counts a line only when the customer's and the supplier's
    nations match inside the region; cross-nation and out-of-window
    lines contribute nothing."""
    from datetime import datetime

    from pdf_parser_spark.plans import relational as R

    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey long, r_name string")
    nation = spark.createDataFrame(
        [(10, "JAPAN", 0), (11, "INDIA", 0), (20, "FRANCE", 1)],
        "n_nationkey long, n_name string, n_regionkey long")
    customer = spark.createDataFrame(
        [(1, "c1", 10, 0.0, "X"), (2, "c2", 11, 0.0, "X"),
         (3, "c3", 20, 0.0, "X")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string")
    supplier = spark.createDataFrame(
        [(100, "s1", 10, 0.0), (101, "s2", 11, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, "
        "s_acctbal double")
    d_in, d_out = datetime(1996, 6, 1), datetime(1999, 1, 1)
    orders = spark.createDataFrame(
        [(1000, 1, "O", 0.0, d_in, "P"),    # JAPAN customer, in window
         (1001, 2, "O", 0.0, d_in, "P"),    # INDIA customer, in window
         (1002, 1, "O", 0.0, d_out, "P")],  # out of window
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")

    def li(ok, sk, price, disc):
        return (ok, 1, sk, 1, 1.0, price, disc, 0.0, "N", "O", d_in)

    lineitem = spark.createDataFrame(
        [li(1000, 100, 100.0, 0.10),   # JAPAN cust x JAPAN supp: counts
         li(1000, 101, 50.0, 0.0),     # JAPAN cust x INDIA supp: no
         li(1001, 101, 40.0, 0.0),     # INDIA x INDIA: counts
         li(1002, 100, 999.0, 0.0)],   # out-of-window order
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp")
    got = [(r.n_name, r.revenue) for r in R.local_supplier_volume(
        region, nation, customer, supplier, orders, lineitem).collect()]
    assert got == [("JAPAN", 90.0), ("INDIA", 40.0)]
