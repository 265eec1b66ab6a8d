"""Conversation reassembly (O7): turn rows -> one ordered document per
conversation, skew-safe.

The reference's analog is the all-pages loop + ExtractionResult wrapper
(/root/reference/A002_header_footer_2_col.py:282-288,
/root/reference/pdf_layout_tester.py:70-84): pages concatenated in index
order. On Spark the naive plan — ``groupBy(conv_id).agg(collect_list)`` —
serializes a mega-conversation (10^6 turns) through one task and one
driver-side sort. This module implements the two-stage merge from
SURVEY.md section 4:

  stage 1  group by (conv_id, block = turn_idx div B): each task
           sort-merges at most B turns (partial map-side aggregation;
           the salt is *derived from the order key*, so partials are
           contiguous runs that concatenate without re-sorting turns)
  stage 2  group by conv_id over the (much smaller) block partials,
           ordered by block id

Both stages use sort_array over structs — deterministic, no reliance on
shuffle order (the stable-turn-order invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble_conversations(
    df: DataFrame,
    text_col: str = "left_column",
    sep: str = "\n\n",
    block_size: int = 1024,
) -> DataFrame:
    """One row per conv_id: ``doc`` = text_col of every turn joined by
    ``sep`` in turn_idx order, plus n_turns. Two-stage for skew safety.

    The separator rides as a plain literal through ``array_join`` — never
    spliced into the SQL text, where backslashes/quotes would be
    re-parsed as escape sequences."""
    partial = (
        df.select("conv_id", "turn_idx", F.col(text_col).alias("t"))
        .withColumn("block", (F.col("turn_idx") / block_size).cast("long"))
        .groupBy("conv_id", "block")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "t"))),
                    lambda s: s["t"],
                ),
                sep,
            ).alias("part"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        partial.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("block", "part"))),
                    lambda s: s["part"],
                ),
                sep,
            ).alias("doc"),
            F.sum("n").alias("n_turns"),
        )
    )
