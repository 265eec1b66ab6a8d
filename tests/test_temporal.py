"""Temporal joins, grouping-set rollups, KMV sketch, DSIR weights —
hand-computed fixtures pinning the semantics the DuckDB gate verifies
at corpus scale."""

from datetime import datetime, timedelta

from pdf_parser_spark.corpus import textstats as TS
from pdf_parser_spark.plans import relational as R
from pdf_parser_spark.plans import sketch as SK
from pdf_parser_spark.plans import temporal as TP


def _t(us):
    return datetime(2024, 1, 1) + timedelta(microseconds=us)


B = 1704067200 * 1_000_000  # epoch micros of 2024-01-01
EV_SCHEMA = ("event_id long, user_id long, event_type string, "
             "ts timestamp, value double")


def _ev(eid, uid, et, us, value=0.0):
    return (eid, uid, et, _t(us), value)


def test_asof_join_latest(spark):
    rows = [
        _ev(1, 1, "click", 10), _ev(2, 1, "click", 20),
        _ev(3, 1, "purchase", 20),    # tie: inclusive match at 20
        _ev(4, 1, "purchase", 30),    # latest prior is 20, not 10
        _ev(5, 2, "purchase", 5),     # no click before -> null
        _ev(6, 3, "click", 50),       # must not leak across users
        _ev(7, 1, "view", 25),        # non-participating type is pruned
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r.event_id: (r.t_us - B, None if r.asof_t_us is None
                        else r.asof_t_us - B, r.gap_us)
           for r in TP.asof_join_latest(df).collect()}
    assert got == {
        3: (20, 20, 0),      # equal timestamps match (ASOF >= contract)
        4: (30, 20, 10),     # latest, not first
        5: (5, None, None),  # left join keeps unmatched purchases
    }


def _congestion_rows():
    # 1-second buckets, min_events=2:
    # bucket 0 holds 3 events (hot), bucket 1 holds 2 (hot, merges with
    # 0), bucket 2 holds 1 (cold, splits the island), bucket 3 holds 2
    # (hot), bucket 4 holds 1 (cold).
    s = 1_000_000
    return [
        _ev(1, 1, "click", 100_000), _ev(2, 1, "view", 200_000),
        _ev(3, 1, "error", 500_000),
        _ev(4, 1, "click", s + 100_000), _ev(5, 1, "click", s + 200_000),
        _ev(6, 1, "error", 2 * s + 500_000),
        _ev(7, 1, "error", 3 * s), _ev(8, 1, "view", 3 * s + 200_000),
        _ev(9, 1, "error", 4 * s),
    ]


def test_congestion_windows_islands(spark):
    df = spark.createDataFrame(_congestion_rows(), EV_SCHEMA)
    wins = sorted((r.win_start_us - B, r.win_end_us - B)
                  for r in TP.congestion_windows(
                      df, bucket_us=1_000_000, min_events=2).collect())
    assert wins == [(0, 2_000_000), (3_000_000, 4_000_000)]


def test_interval_join_boundaries(spark):
    df = spark.createDataFrame(_congestion_rows(), EV_SCHEMA)
    got = {r.event_id: (r.win_start_us - B, r.win_end_us - B)
           for r in TP.interval_join_events(
               df, bucket_us=1_000_000, min_events=2).collect()}
    # error@0.5s inside [0,2s); error@3.0s ON the start (inclusive);
    # error@2.5s in a cold bucket and error@4.0s past the exclusive end
    # both unmatched (inner join drops them).
    assert got == {3: (0, 2_000_000), 7: (3_000_000, 4_000_000)}


def test_hyper_rollup_levels_and_cents(spark):
    day = 86_400_000_000
    rows = [
        _ev(1, 1, "click", 10, 1.25), _ev(2, 1, "click", 20, 2.25),
        _ev(3, 1, "view", 30, 3.10),
        # 0.1 + 0.2 sums to exactly 0.30 only in integer cents
        _ev(4, 1, "click", day + 10, 0.10),
        _ev(5, 1, "click", day + 20, 0.20),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    d0 = (B // day)
    out = {(r.day_idx, r.event_type, r.gid): (r.n_events, r.sum_value)
           for r in TP.hyper_rollup(df).collect()}
    assert out[(d0, "click", 0)] == (2, 3.50)
    assert out[(d0, "view", 0)] == (1, 3.10)
    assert out[(d0 + 1, "click", 0)] == (2, 0.30)
    assert out[(d0, None, 1)] == (3, 6.60)
    assert out[(d0 + 1, None, 1)] == (2, 0.30)
    assert out[(None, None, 3)] == (5, 6.90)
    # rollup (not cube): no per-type-across-days rows
    assert not any(g == 2 for (_, _, g) in out)


def test_sales_cube_full_lattice(spark):
    li = spark.createDataFrame(
        [("A", "F", 10.0, 100.50), ("A", "O", 20.0, 200.25),
         ("R", "F", 30.0, 300.25)],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double")
    out = {(r.l_returnflag, r.l_linestatus, r.gid):
           (r.sum_qty, r.sum_base_price, r.n_items)
           for r in R.sales_cube(li).collect()}
    assert out[("A", "F", 0)] == (10, 100.50, 1)
    assert out[("A", None, 1)] == (30, 300.75, 2)      # per-flag
    assert out[(None, "F", 2)] == (40, 400.75, 2)      # per-status
    assert out[(None, None, 3)] == (60, 601.00, 3)     # grand total
    assert len(out) == 3 + 2 + 2 + 1


def test_distinct_kmv_exact_below_k_and_estimate(spark):
    rows = ([(i, i, "a", _t(i), 0.0) for i in range(10)]
            + [(1000 + i, i % 500, "b", _t(i), 0.0) for i in range(2000)])
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r.event_type: (r.n_exact, r.kmv_est)
           for r in SK.distinct_kmv(df, "event_type", "user_id",
                                    k=64).collect()}
    # below k: the sketch holds the whole set -> estimate IS exact
    assert out["a"] == (10, 10.0)
    # above k: (k-1)/U_k estimator; 3-sigma band at k=64 is ~38%
    n, est = out["b"]
    assert n == 500
    assert 300 < est < 750
    # determinism: md5 keyspace, not RNG — rerun gives the same estimate
    out2 = {r.event_type: r.kmv_est
            for r in SK.distinct_kmv(df, "event_type", "user_id",
                                     k=64).collect()}
    assert out2["b"] == est


def test_dsir_weights_orders_target_likeness(spark):
    # buckets verified collision-free for these tokens (931/688/215/1016)
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta", "en"),   # pure target-vocabulary doc
         (2, "gamma gamma delta", "de"),  # pure raw-only vocabulary
         (3, "gamma delta", "en")],       # target doc, raw-ish tokens
        "doc_id long, text string, lang string")
    out = {r.doc_id: (r.n_tokens, r.dsir_logratio)
           for r in TS.dsir_weights(docs).collect()}
    assert out[1][0] == 3 and out[2][0] == 3 and out[3][0] == 2
    # target-looking text must outscore raw-only text
    assert out[1][1] > out[2][1]
    # alpha/beta appear ONLY in target docs -> positive log ratio;
    # gamma/delta are diluted by the non-target doc -> doc2 below doc3
    assert out[1][1] > 0
    assert out[2][1] < out[3][1]


def test_apply_changeset_rules(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, s string, price double")
    changes = spark.createDataFrame(
        [   # key 1: two upserts, later ts must win
            (1, "a", 11.0, "u", _t(100)),
            (1, "a", 99.0, "u", _t(50)),
            # key 2: delete
            (2, "b", 20.0, "d", _t(100)),
            # key 3: same-instant upsert+delete -> delete wins
            (3, "c", 31.0, "u", _t(100)),
            (3, "c", 30.0, "d", _t(100)),
            # key 5: brand-new key inserts
            (5, "e", 50.0, "u", _t(100)),
        ],
        "id long, s string, price double, op string, change_ts timestamp")
    out = {r.id: r.price
           for r in R.apply_changeset(base, changes, "id",
                                      "change_ts").collect()}
    assert out == {1: 11.0, 4: 40.0, 5: 50.0}


def test_scd2_history_version_rules(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0, _t(0)), (2, "b", 20.0, _t(0)),
         (3, "c", 30.0, _t(0)), (4, "d", 40.0, _t(0))],
        "id long, s string, price double, loaded_ts timestamp")
    changes = spark.createDataFrame(
        [   # key 1: two versions after base
            (1, "a", 11.0, "u", _t(100), None),
            (1, "a", 12.0, "u", _t(200), None),
            # key 2: delete, then REINSERT after a gap
            (2, "b", 20.0, "d", _t(100), None),
            (2, "b2", 21.0, "u", _t(300), None),
            # key 3: same-instant upsert+delete -> zero-length version
            (3, "c", 31.0, "u", _t(100), None),
            (3, "c", 30.0, "d", _t(100), None),
            # key 5: brand-new key (no base version)
            (5, "e", 50.0, "u", _t(100), None),
        ],
        "id long, s string, price double, op string, "
        "change_ts timestamp, loaded_ts timestamp")
    rows = R.scd2_history(base, changes, "id", "change_ts",
                          "loaded_ts").collect()
    got = sorted((r.id, r.price, r.valid_from_us - B,
                  None if r.valid_to_us is None else r.valid_to_us - B,
                  r.is_current) for r in rows)
    assert got == [
        (1, 10.0, 0, 100, 0), (1, 11.0, 100, 200, 0),
        (1, 12.0, 200, None, 1),
        # delete closes at 100; reinsert opens a NEW version at 300
        (2, 20.0, 0, 100, 0), (2, 21.0, 300, None, 1),
        # zero-length version closed by the same-instant delete
        (3, 30.0, 0, 100, 0), (3, 31.0, 100, 100, 0),
        (4, 40.0, 0, None, 1),
        (5, 50.0, 100, None, 1),
    ]
    # snapshot consistency: the open versions ARE apply_changeset's
    # output (restricted to shared semantics)
    snap = {(r.id, r.price) for r in R.apply_changeset(
        base.drop("loaded_ts"), changes.drop("loaded_ts"),
        "id", "change_ts").collect()}
    open_versions = {(g[0], g[1]) for g in got if g[4] == 1}
    assert open_versions == snap


def test_stream_click_attribution_batch_semantics(spark):
    # withWatermark is a no-op on batch frames, so the join semantics
    # are testable statically; the gate drives the real streaming query.
    from pdf_parser_spark.streaming.pipeline import stream_click_attribution

    ev = spark.createDataFrame(
        [_ev(1, 1, "purchase", 600_000_000),
         _ev(2, 1, "click", 0),              # exactly max_gap before: kept
         _ev(3, 1, "click", 400_000_000),    # inside window: kept
         _ev(4, 1, "click", 700_000_000),    # after purchase: dropped
         _ev(5, 2, "click", 500_000_000)],   # other user: dropped
        EV_SCHEMA)
    got = sorted(
        (r.purchase_id, r.click_id)
        for r in stream_click_attribution(
            ev.filter("event_type = 'purchase'"),
            ev.filter("event_type = 'click'"),
            max_gap="10 minutes").collect())
    assert got == [(1, 2), (1, 3)]


def test_rate_anomaly_zscore_math(spark):
    import math

    # one type, 14 hourly buckets: 12 quiet (count 2), one spike (20),
    # plus enough history rows before the spike
    rows = []
    eid = 0
    for h in range(13):
        n = 20 if h == 12 else 2
        for i in range(n):
            rows.append(_ev(eid, 1, "error", h * 3_600_000_000 + i))
            eid += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r.bucket: r for r in TP.rate_anomaly(
        df, window=24, min_hist=12).collect()}
    base_bucket = 1704067200 // 3600  # 2024-01-01 epoch hours
    spike = out[base_bucket + 12]
    assert spike.c == 20
    # trailing 12 buckets all count 2: mean 2, var 0 -> z is NULL-safe?
    # var==0 -> z None; perturb: recompute expectations directly
    assert spike.trailing_mean == 2.0
    assert spike.z is None  # zero-variance history: no finite z
    # now add one noisy history bucket so variance > 0
    rows += [(eid + i, 1, "error", _t(5 * 3_600_000_000 + 2_000_000 + i),
              0.0) for i in range(2)]
    df2 = spark.createDataFrame(rows, EV_SCHEMA)
    out2 = {r.bucket: r for r in TP.rate_anomaly(
        df2, window=24, min_hist=12).collect()}
    spike2 = out2[base_bucket + 12]
    hist = [2] * 12
    hist[5] = 4
    n = len(hist)
    s, q = sum(hist), sum(v * v for v in hist)
    mean = s / n
    var = (q - s * s / n) / (n - 1)
    want = round((20 - mean) / math.sqrt(var), 4)
    assert spike2.z == want and spike2.z > 3


def test_histogram_quantiles_accuracy_and_edges(spark):
    """Histogram quantile estimates land within one bin width of the
    exact percentile; nulls excluded; the all-equal column degenerates
    to the constant."""
    from pdf_parser_spark.plans.stats import histogram_quantiles

    vals = [(float(i),) for i in range(1, 1001)] + [(None,)]
    df = spark.createDataFrame(vals, "value double")
    est = {r.p: r.est for r in histogram_quantiles(
        df, "value", ps=(0.5, 0.9, 0.99), bins=100).collect()}
    width = (1000.0 - 1.0) / 100
    import numpy as np
    arr = np.arange(1, 1001, dtype=float)
    for p, e in est.items():
        exact = float(np.quantile(arr, p))
        assert abs(e - exact) <= width + 1e-6, (p, e, exact)

    same = spark.createDataFrame([(7.5,)] * 10, "value double")
    out = histogram_quantiles(same, "value", ps=(0.5, 0.99)).collect()
    assert all(r.est == 7.5 for r in out)


def test_ewma_hourly_matches_recursive_definition(spark):
    """The per-row windowed fold equals the textbook recursion
    s_t = a*x_t + (1-a)*s_{t-1} (seeded at the window's first value),
    and a level shift moves the EWMA toward the new level
    monotonically."""
    import datetime

    from pdf_parser_spark.plans.temporal import ewma_hourly

    base = datetime.datetime(2024, 1, 1)
    rows = []
    counts = [10, 10, 10, 10, 40, 40, 40, 40]  # level shift at t=4
    eid = 0
    for t, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(hours=t), "x"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    got = sorted((r.bucket, r.c, r.n_window, r.ewma)
                 for r in ewma_hourly(df, alpha=0.3, window=4).collect())

    # brute-force the same windowed fold
    for i, (_, c, nw, ew) in enumerate(got):
        lo = max(0, i - 3)
        s = float(counts[lo])
        for x in counts[lo + 1: i + 1]:
            s = 0.3 * x + 0.7 * s
        assert nw == i - lo + 1 and abs(ew - round(s, 6)) < 1e-9, i
    # the shift pulls the smoothed level up monotonically
    tail = [ew for _, _, _, ew in got[4:]]
    assert tail == sorted(tail) and tail[-1] > 30
