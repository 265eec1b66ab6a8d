"""Conversation-level statistics and time-gap sessionization over the
north-rule transcript shape (conv_id, turn_idx, role, text, tool, ts).

A transcript corpus is curated at the CONVERSATION grain — filtering
rules ("drop conversations with no assistant turn", "cap mega
conversations", "split stale sessions") need per-conversation rollups
and session boundaries before any per-turn extraction runs. These are
the transcript-table siblings of the per-document corpus stats
(corpus/textstats.py); the reference processes one document at a time
and has no cross-conversation ops (SURVEY.md §2.8), so they are
north-rule additions.

Scale shape: both operators shuffle ONCE on conv_id (a uniform key —
the generator's mega-conversation skew is the extraction phase's
problem, handled there by salting; here a conversation contributes one
window partition and the state per key is O(1)). `conv_stats` computes
its lag-based protocol checks in the same window partitioning its
groupBy reuses, so the plan carries a single Exchange end to end
(plan-asserted in PLANS.md). All outputs are exact integers
(epoch-second arithmetic, UTC session TZ) — bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _es(name: str) -> F.Column:
    """SESSION-TIMEZONE-INDEPENDENT epoch seconds of a timestamp column.
    Parquet transcript tables carry TIMESTAMP_NTZ; an ltz-cast route
    would shift by the session timezone (and, across a DST transition,
    by DIFFERENT offsets for the two ends of one conversation — breaking
    even duration differences). timestampdiff against an NTZ origin
    reads the wall clock as UTC in any session, matching DuckDB's
    epoch(); LTZ inputs render through the session zone first, which is
    the identity under the UTC session session.py pins."""
    return F.expr(
        "timestampdiff(SECOND, to_timestamp_ntz('1970-01-01 00:00:00'), "
        f"cast({name} as timestamp_ntz))")


def conv_stats(tr: DataFrame) -> DataFrame:
    """Per-conversation rollup: turn counts by role, tool-call count,
    char volume, wall-clock span, and two protocol-health signals —
    ``n_role_repeats`` (adjacent turns with the same role: a broken
    alternation protocol) and ``n_ts_inversions`` (timestamps that move
    backwards along turn order: a broken clock or a mis-merged log).
    The curation rules a pipeline thresholds on before extraction."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    withlag = tr.select(
        "conv_id", "role", "tool", "ts",
        F.length("text").alias("n_chars"),
        (F.col("role") == F.lag("role").over(w)).alias("role_repeat"),
        (_es("ts") < F.lag(_es("ts")).over(w))
        .alias("ts_inversion"))
    return withlag.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .alias("n_assistant"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
        .alias("n_tool_calls"),
        F.sum("n_chars").alias("n_chars"),
        (F.max(_es("ts"))
         - F.min(_es("ts"))).alias("duration_s"),
        F.sum(F.when(F.col("role_repeat"), 1).otherwise(0))
        .alias("n_role_repeats"),
        F.sum(F.when(F.col("ts_inversion"), 1).otherwise(0))
        .alias("n_ts_inversions"))


def _sessionized(tr: DataFrame, gap_s: int) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = (_es("ts")
           - F.lag(_es("ts")).over(w))
    base = tr.select(
        "conv_id", "turn_idx", "role", "ts",
        F.coalesce(gap, F.lit(0)).alias("gap_s_prev"))
    boundary = F.when(F.col("gap_s_prev") > gap_s, 1).otherwise(0)
    return base.select(
        "conv_id", "turn_idx", "role", "ts", "gap_s_prev",
        F.sum(boundary).over(cum).alias("session_idx"))


def conv_sessionize(tr: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Split each conversation into sessions at idle gaps larger than
    ``gap_s`` seconds: per turn, emit ``session_idx`` (0-based, a
    running count of gap boundaries along turn order) and ``gap_s_prev``
    (seconds since the previous turn; 0 for the first). The classic
    sessionize — lag + conditional running sum in one window
    partitioning, one shuffle, O(1) state per conversation."""
    return _sessionized(tr, gap_s).drop("ts")


def session_stats(tr: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Roll sessions up to (conv_id, session_idx): turn count and
    span. The groupBy reuses the window's conv_id partitioning (conv_id
    is a prefix of the grouping key), so no extra wide exchange is
    required."""
    return _sessionized(tr, gap_s).groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.max(_es("ts"))
         - F.min(_es("ts"))).alias("span_s"))


def conv_fingerprint(tr: DataFrame) -> DataFrame:
    """Order-stable content fingerprint per conversation: md5 over the
    turn texts joined by RS (0x1e) in turn order — conversation-grain
    exact dedup, the transcript sibling of `corpus.dedup.exact_dedup`
    (document grain). A re-crawled or mirrored conversation hashes
    identically regardless of how its turns were partitioned or in what
    order the scan delivered them.

    Hash-of-hashes, so the shuffle never carries text: each turn is
    md5'd MAP-SIDE and the conversation fingerprint is the md5 of the
    per-turn hex digests joined in turn order — one partial-agg Exchange
    of (conv_id, 32-hex-char) pairs (~64 B/turn instead of the full turn
    text, a ~25x shuffle cut on this corpus and far more on long-turn
    data). sort_array(collect_list(struct(turn_idx, h))) makes the join
    order deterministic engine-side; null texts hash as '' (pins both
    engines to the same byte stream even for an all-null turn)."""
    base = tr.select(
        "conv_id",
        F.struct(F.col("turn_idx"),
                 F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"))
        .alias("turn"))
    return (base.groupBy("conv_id")
            .agg(F.md5(F.concat_ws(
                "",
                F.expr("transform(sort_array(collect_list(turn)), x -> x.h)")))
                .alias("fp"),
                F.count(F.lit(1)).alias("n_turns")))


def conv_exact_dup_groups(tr: DataFrame) -> DataFrame:
    """Roll fingerprints up to dup groups: per distinct conversation
    content, how many conversations carry it and the lowest conv_id (the
    canonical keep). Second partial-agg shuffle on the fp key — group
    summaries only, never texts."""
    fps = conv_fingerprint(tr)
    return (fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n_convs"),
                 F.min("conv_id").alias("keep_conv_id"),
                 F.max("n_turns").alias("n_turns")))


def _win_line() -> F.Column:
    """The shared window rendering rule: `role: text`, nulls as '' —
    one definition, because a gate asserts the salted and unsalted
    window operators are identical."""
    return F.concat(F.coalesce(F.col("role"), F.lit("")), F.lit(": "),
                    F.coalesce(F.col("text"), F.lit("")))


def _n_wins(total: F.Column, n_turns: int, stride: int) -> F.Column:
    """The shared covered-tail window count: 1 window for short
    conversations, else ceil((T - n) / stride) + 1."""
    return F.when(total <= n_turns, F.lit(1)).otherwise(
        F.floor((total - n_turns + stride - 1) / stride) + 1)


def conv_context_windows(tr: DataFrame, n_turns: int = 4,
                         stride: int = 2) -> DataFrame:
    """Sliding context windows over conversations — the transcript-grain
    sibling of `corpus.packing.chunk_documents`: every training example
    built from a multi-turn dialog is "the last N turns of context",
    and this materializes that layout declaratively — windows of
    ``n_turns`` consecutive turns advancing by ``stride``, rendered as
    a `role: text` transcript block per window.

    Window rule mirrors the chunking contract exactly: starts at
    ``i * stride`` for ``i < 1 + ceil(max(0, T - n_turns) / stride)``
    (every turn covered, final window may be short, a tail already
    covered by the previous window never yields an extra one). Null
    role/text render as '' (degrade-don't-drop). Emits (conv_id,
    win_idx, first_turn, n_in_win, win_text).

    Plan: ONE conv_id Exchange shared by the row-number, the total
    count, and the forward collect_list frame (same-partitioning
    windows reuse the sort), then a codegen filter/projection — no
    join, no second shuffle. A conversation costs one window partition;
    the mega-conversation note in the module docstring applies
    unchanged."""
    if not 1 <= stride <= n_turns:
        raise ValueError(
            f"need 1 <= stride <= n_turns, got {stride=} {n_turns=}")
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_all = Window.partitionBy("conv_id")
    w_fwd = w_ord.rowsBetween(Window.currentRow, n_turns - 1)
    base = (tr.select("conv_id", "turn_idx", _win_line().alias("_line"))
            .withColumn("_rn", F.row_number().over(w_ord))
            .withColumn("_total", F.count(F.lit(1)).over(w_all))
            .withColumn("_win", F.collect_list("_line").over(w_fwd)))
    start = F.col("_rn") - 1
    n_wins = _n_wins(F.col("_total"), n_turns, stride)
    return (base
            .filter((start % stride == 0)
                    & (F.floor(start / stride) < n_wins))
            .select("conv_id",
                    F.floor(start / stride).cast("long").alias("win_idx"),
                    F.col("turn_idx").alias("first_turn"),
                    F.size("_win").cast("long").alias("n_in_win"),
                    F.array_join("_win", "\n").alias("win_text")))


def _salted_stage(tr: DataFrame, n_turns: int, chunk: int) -> DataFrame:
    """The salt-chunk staging frame: every turn in its native chunk
    (emit=1), plus a mirror of the ``n_turns - 1`` lookahead margin
    into the previous chunk (emit=0, feed-only). Factored out so the
    bounded-partition property — no (conv, chunk) group larger than
    ``chunk + n_turns - 1`` rows — is asserted on the OPERATOR's own
    frame by the tests, not on a re-derivation."""
    g = F.floor(F.col("turn_idx") / chunk)
    return (tr.select("conv_id", "turn_idx", _win_line().alias("_line"))
            .select("conv_id", "turn_idx", "_line",
                    F.explode(F.when(
                        (g > 0) & (F.col("turn_idx") % chunk
                                   <= n_turns - 2),
                        F.array(F.struct(g.alias("g"),
                                         F.lit(1).alias("emit")),
                                F.struct((g - 1).alias("g"),
                                         F.lit(0).alias("emit"))))
                        .otherwise(F.array(F.struct(
                            g.alias("g"), F.lit(1).alias("emit")))))
                    .alias("_s")))


def conv_context_windows_salted(tr: DataFrame, n_turns: int = 4,
                                stride: int = 2,
                                chunk: int = 4096) -> DataFrame:
    """`conv_context_windows` with the mega-conversation skew handled
    EXPLICITLY (the module docstring defers skew to the extraction
    phase; this is the window-op version of that salting): each
    conversation splits into salt chunks of ``chunk`` turns, each turn
    additionally REPLICATES into the previous chunk when it sits in
    that chunk's ``n_turns - 1`` lookahead margin, and the forward
    window runs per (conv, salt-chunk) — so no partition ever holds
    more than ``chunk + n_turns - 1`` rows, whatever the conversation
    size. Replicated rows feed windows but never emit them, and window
    starts/counts derive from ``turn_idx`` arithmetic plus one tiny
    per-conv total (partial-agg, joined back AQE-sized), so the output
    is IDENTICAL to the unsalted form — the gate value-hashes both
    against the same oracle.

    Contract: requires DENSE turn indices (0..T-1 per conversation,
    the transcript-table invariant) — salting keys off ``turn_idx``
    directly, which is exactly what removes the need for a global
    per-conversation row_number. Use the unsalted form when indices
    may be sparse. Cost vs unsalted: one extra tiny aggregate + a
    ≤ (n_turns-1)/chunk row-replication factor, bought once; the win
    is that a 10^7-turn conversation becomes ~2,400 bounded partitions
    instead of one straggler."""
    if not 1 <= stride <= n_turns:
        raise ValueError(
            f"need 1 <= stride <= n_turns, got {stride=} {n_turns=}")
    if chunk < n_turns:
        raise ValueError(
            f"need chunk >= n_turns, got {chunk=} {n_turns=}")
    totals = tr.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("_total"))
    base = _salted_stage(tr, n_turns, chunk)
    w_fwd = (Window.partitionBy("conv_id", "_s.g").orderBy("turn_idx")
             .rowsBetween(Window.currentRow, n_turns - 1))
    start = F.col("turn_idx")
    n_wins = _n_wins(F.col("_total"), n_turns, stride)
    return (base
            .withColumn("_win", F.collect_list("_line").over(w_fwd))
            .filter(F.col("_s.emit") == 1)
            .join(totals, "conv_id")
            .filter((start % stride == 0)
                    & (F.floor(start / stride) < n_wins))
            .select("conv_id",
                    F.floor(start / stride).cast("long").alias("win_idx"),
                    F.col("turn_idx").alias("first_turn"),
                    F.size("_win").cast("long").alias("n_in_win"),
                    F.array_join("_win", "\n").alias("win_text")))
