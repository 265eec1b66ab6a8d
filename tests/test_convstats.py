"""Conversation stats / sessionization tests against hand-computed
fixtures."""

from datetime import datetime

from pdf_parser_spark.operators import convstats as CS


def _t(s):
    return datetime(2024, 1, 1, 0, 0, s) if s < 60 else \
        datetime(2024, 1, 1, s // 3600, (s % 3600) // 60, s % 60)


ROWS = [
    # c0: clean alternation, one big idle gap at turn 2
    ("c0", 0, "user", "hi there", None, _t(0)),
    ("c0", 1, "assistant", "hello", None, _t(10)),
    ("c0", 2, "user", "back after lunch", None, _t(8000)),
    ("c0", 3, "assistant", "welcome", "search/v1", _t(8010)),
    # c1: role repeat + timestamp inversion
    ("c1", 0, "user", "a", None, _t(100)),
    ("c1", 1, "user", "b", None, _t(90)),
    ("c1", 2, "assistant", "c", "calc/v1", _t(120)),
]
SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


def test_conv_stats(spark):
    got = {r.conv_id: r for r in CS.conv_stats(
        spark.createDataFrame(ROWS, SCHEMA)).collect()}
    c0, c1 = got["c0"], got["c1"]
    assert (c0.n_turns, c0.n_user, c0.n_assistant, c0.n_tool_calls) == (4, 2, 2, 1)
    assert c0.n_chars == len("hi there") + len("hello") + \
        len("back after lunch") + len("welcome")
    assert c0.duration_s == 8010
    assert (c0.n_role_repeats, c0.n_ts_inversions) == (0, 0)
    assert (c1.n_turns, c1.n_role_repeats, c1.n_ts_inversions) == (3, 1, 1)
    assert c1.duration_s == 30  # max-min, inversion notwithstanding


def test_conv_sessionize(spark):
    got = {(r.conv_id, r.turn_idx): r for r in CS.conv_sessionize(
        spark.createDataFrame(ROWS, SCHEMA), gap_s=3600).collect()}
    assert [got[("c0", i)].session_idx for i in range(4)] == [0, 0, 1, 1]
    assert got[("c0", 2)].gap_s_prev == 7990
    assert got[("c0", 0)].gap_s_prev == 0
    # c1's inversion yields a negative gap, never a new session
    assert [got[("c1", i)].session_idx for i in range(3)] == [0, 0, 0]
    assert got[("c1", 1)].gap_s_prev == -10


def test_session_stats(spark):
    got = {(r.conv_id, r.session_idx): r for r in CS.session_stats(
        spark.createDataFrame(ROWS, SCHEMA), gap_s=3600).collect()}
    assert got[("c0", 0)].n_turns == 2 and got[("c0", 0)].span_s == 10
    assert got[("c0", 1)].n_turns == 2 and got[("c0", 1)].span_s == 10
    assert got[("c1", 0)].n_turns == 3 and got[("c1", 0)].span_s == 30


def test_conv_fingerprint_dedup_and_order_invariance(spark):
    """Identical conversation content hashes identically no matter how
    the scan delivers turns; null text joins as ''; dup groups pick the
    lowest conv_id as canonical."""
    rows = [
        ("a", 0, "hi"), ("a", 1, None), ("a", 2, "bye"),
        ("b", 2, "bye"), ("b", 0, "hi"), ("b", 1, None),  # same content, scrambled
        ("c", 0, "hi"), ("c", 1, "x"), ("c", 2, "bye"),   # differs at turn 1
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    fps = {r.conv_id: r.fp for r in CS.conv_fingerprint(
        df.repartition(5)).collect()}
    assert fps["a"] == fps["b"] != fps["c"]
    groups = {r.fp: (r.n_convs, r.keep_conv_id)
              for r in CS.conv_exact_dup_groups(df).collect()}
    assert groups[fps["a"]] == (2, "a")
    assert groups[fps["c"]] == (1, "c")


def test_conv_context_windows_rules(spark):
    import pytest as _pt
    from pdf_parser_spark.operators import convstats as CS

    def conv(cid, n):
        return [(cid, i, "user" if i % 2 == 0 else "assistant",
                 f"t{i}", None, None) for i in range(n)]

    rows = conv("a", 3) + conv("b", 6) + conv("c", 7) + conv("d", 1)
    rows.append(("e", 0, None, None, None, None))  # null role+text
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = CS.conv_context_windows(df, n_turns=6, stride=3).collect()
    got = {}
    for r in out:
        got.setdefault(r.conv_id, []).append(
            (r.win_idx, r.first_turn, r.n_in_win))
    assert got["a"] == [(0, 0, 3)]          # short conv: one window
    assert got["b"] == [(0, 0, 6)]          # exactly n_turns: one window
    assert sorted(got["c"]) == [(0, 0, 6), (1, 3, 4)]  # tail window
    assert got["d"] == [(0, 0, 1)]
    assert got["e"] == [(0, 0, 1)]
    texts = {(r.conv_id, r.win_idx): r.win_text for r in out}
    assert texts[("b", 0)] == "\n".join(
        f"{'user' if i % 2 == 0 else 'assistant'}: t{i}" for i in range(6))
    assert texts[("c", 1)] == "\n".join(
        f"{'user' if i % 2 == 0 else 'assistant'}: t{i}" for i in range(3, 7))
    assert texts[("e", 0)] == ": "          # null role/text degrade to ''
    with _pt.raises(ValueError):
        CS.conv_context_windows(df, n_turns=4, stride=5)


def test_conv_context_windows_salted_equals_unsalted(spark):
    from pdf_parser_spark.operators import convstats as CS

    def conv(cid, n):
        return [(cid, i, "user" if i % 2 == 0 else "assistant",
                 f"t{i}", None, None) for i in range(n)]

    # 37-turn conversation with chunk=8: five salt chunks, windows
    # crossing every boundary; plus small/edge conversations
    rows = conv("big", 37) + conv("a", 3) + conv("b", 8) + conv("d", 1)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    for n_turns, stride, chunk in [(6, 3, 8), (4, 2, 4), (6, 6, 16)]:
        plain = {(r.conv_id, r.win_idx): (r.first_turn, r.n_in_win,
                                          r.win_text)
                 for r in CS.conv_context_windows(
                     df, n_turns=n_turns, stride=stride).collect()}
        salted = {(r.conv_id, r.win_idx): (r.first_turn, r.n_in_win,
                                           r.win_text)
                  for r in CS.conv_context_windows_salted(
                      df, n_turns=n_turns, stride=stride,
                      chunk=chunk).collect()}
        assert salted == plain, (n_turns, stride, chunk)
    # bounded partitions: the OPERATOR's own staging frame never puts
    # more than chunk + n_turns - 1 rows into any (conv, salt-chunk)
    # group — the scale property that justifies the salted form
    from pyspark.sql import functions as F

    n_turns, chunk = 6, 8
    sizes = (CS._salted_stage(df, n_turns, chunk)
             .groupBy("conv_id", F.col("_s.g").alias("g"))
             .count().collect())
    assert max(r["count"] for r in sizes) <= chunk + n_turns - 1
    # and the hot conversation really did split across salt chunks
    assert sum(1 for r in sizes if r.conv_id == "big") == 5

    import pytest as _pt
    with _pt.raises(ValueError):
        CS.conv_context_windows_salted(df, n_turns=8, stride=2, chunk=4)
