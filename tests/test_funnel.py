"""Funnel / percentile tests against hand-computed fixtures."""

from datetime import datetime

from pdf_parser_spark.operators import funnel as FN


def _t(us):
    return datetime(2024, 1, 1, 0, 0, us // 1_000_000, us % 1_000_000)


B = 1704067200 * 1_000_000  # epoch micros of 2024-01-01

ROWS = [
    # u0: full funnel in order
    (0, "signup", _t(10)), (0, "view", _t(20)), (0, "purchase", _t(30)),
    # u1: purchase BEFORE view -> stops at view (purchase not after view)
    (1, "signup", _t(10)), (1, "purchase", _t(15)), (1, "view", _t(20)),
    # u2: view before signup doesn't count; later view does
    (2, "view", _t(5)), (2, "signup", _t(10)), (2, "view", _t(40)),
    # u3: only noise events
    (3, "click", _t(10)), (3, "error", _t(20)),
    # u4: equal timestamp does not advance (strict >)
    (4, "signup", _t(10)), (4, "view", _t(10)),
    # u5: first matching signup wins, duplicates ignored
    (5, "signup", _t(10)), (5, "signup", _t(5)), (5, "view", _t(7)),
]
SCHEMA = "user_id long, event_type string, ts timestamp"


def test_funnel_stages(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r.user_id: (r.t1, r.t2, r.t3, r.max_stage)
           for r in FN.funnel_stages(df).collect()}
    assert got[0] == (B + 10, B + 20, B + 30, 3)
    assert got[1] == (B + 10, B + 20, None, 2)
    assert got[2] == (B + 10, B + 40, None, 2)
    assert 3 not in got  # noise-only users are pruned before the shuffle
    assert got[4] == (B + 10, None, None, 1)
    # sorted scan: the t(5) signup is first -> t1=5; view at 7 counts
    assert got[5] == (B + 5, B + 7, None, 2)


def test_funnel_counts(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    r = FN.funnel_counts(df).first()
    assert (r.reached_signup, r.reached_view, r.reached_purchase) == (5, 4, 1)


def test_value_percentiles_exact(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 5.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r.event_type: (r.p50, r.p90, r.p99)
           for r in FN.value_percentiles(df).collect()}
    # linear interpolation over 1..100: p = 1 + p*(99)
    assert got["a"] == (50.5, 90.1, 99.01)
    assert got["b"] == (5.0, 5.0, 5.0)


def test_funnel_counts_empty_input_is_zero(spark):
    df = spark.createDataFrame(
        [(9, "click", _t(10))], "user_id long, event_type string, ts timestamp")
    r = FN.funnel_counts(df).first()
    assert (r.reached_signup, r.reached_view, r.reached_purchase) == (0, 0, 0)


def test_value_percentiles_labels_do_not_truncate(spark):
    df = spark.createDataFrame([("a", 1.0)], "event_type string, value double")
    cols = FN.value_percentiles(df, ps=(0.29, 0.58)).columns
    assert cols == ["event_type", "p29", "p58"]


def test_decontam_empty_eval_doc_flags_nothing(spark):
    from pdf_parser_spark.corpus import decontam as DC
    corpus = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "real text here")],
        "doc_id long, text string")
    ev = spark.createDataFrame([(9, "  "), (10, None)],
                               "doc_id long, text string")
    got = {r.doc_id: r.contaminated
           for r in DC.decontaminate(corpus, ev, n=13).collect()}
    assert got == {0: False, 1: False, 2: False}


def test_retention_cohorts(spark):
    from datetime import timedelta

    def _d(days, s=0):
        return datetime(2024, 1, 1) + timedelta(days=days, seconds=s)

    rows = [
        # u0: first day 0, active days 0, 1, 3
        (0, "view", _d(0)), (0, "view", _d(0, 10)), (0, "click", _d(1, 5)),
        (0, "view", _d(3, 1)),
        # u1: first day 1, active days 1, 3
        (1, "view", _d(1)), (1, "error", _d(3)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    base = 1704067200 // 86400  # 2024-01-01 epoch day
    got = {(r.cohort_day, r.day_offset): r.n_users
           for r in FN.retention_cohorts(df).collect()}
    assert got == {
        (base, 0): 1, (base, 1): 1, (base, 3): 1,
        (base + 1, 0): 1, (base + 1, 2): 1,
    }


def test_json_props_rollup_degrades_not_fails(spark):
    """Malformed JSON, missing field, non-integer field, and NULL props
    all become NULL k (counted via n_events - n_with_field), never task
    failures; clean rows aggregate exactly."""
    from pdf_parser_spark.operators.funnel import json_props_rollup

    rows = [("a", '{"k": 10}'), ("a", '{"k": 32}'),
            ("a", 'not json'), ("a", '{"other": 1}'),
            ("a", '{"k": "str"}'), ("a", None),
            ("b", '{"k": -5}')]
    df = spark.createDataFrame(rows, "event_type string, props string")
    got = {r.event_type: r for r in json_props_rollup(df).collect()}
    assert got["a"].n_events == 6 and got["a"].n_with_field == 2
    assert got["a"].sum_k == 42 and got["a"].min_k == 10
    assert got["b"].sum_k == -5 and got["b"].n_with_field == 1
