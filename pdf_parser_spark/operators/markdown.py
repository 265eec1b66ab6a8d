"""Markdown sinks S9/S10: layout rows -> per-turn markdown columns.

Reimplements the two JSON->markdown formatters as pure built-in column
expressions (JVM-side, codegen-friendly — no UDF):

* ``markdown_c001`` — the layout flavor: ``<!-- Page N -->`` marker,
  ``---`` separator, conditional ``**Header:**`` / ``**Footer:**``
  sections, left column before right
  (/root/reference/C001_create_markdown.py:24-50: each page appends
  fragments to a list later joined with "\\n").
* ``markdown_c002`` — the LayoutLM flavor: ``# Page N`` heading,
  ``--- Page N Start ---`` / ``--- Page N Footer ---`` marker lines,
  ``## Header`` / ``### Page N Content`` / ``## Footer`` sections, columns
  joined with a blank line (/root/reference/C002_json_to_md.py:49-86,
  fields stripped at :51-54).

Document-level assembly (all pages joined with "\\n") is the
conversation-reassembly operator's job (operators/reassemble.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_fragments(*frags) -> F.Column:
    """'\\n'.join(fragments), where a fragment may be conditionally absent
    (NULL columns are dropped, matching the reference's conditional
    ``append`` calls)."""
    arr = F.array_compact(F.array(*frags))
    return F.array_join(arr, "\n")


def markdown_c001_col(page_number="page_number", header="header",
                      footer="footer", left="left_column",
                      right="right_column") -> F.Column:
    """One page's C001 markdown (C001_create_markdown.py:30-49)."""
    nonempty = lambda c: F.col(c).isNotNull() & (F.col(c) != "")  # noqa: E731
    return _join_fragments(
        F.concat(F.lit("<!-- Page "), F.col(page_number).cast("string"), F.lit(" -->")),
        F.lit("\n---\n"),
        F.when(nonempty(header), F.lit("**Header:**\n")),
        F.when(nonempty(header), F.col(header)),
        F.when(nonempty(header), F.lit("\n")),
        F.when(nonempty(left), F.col(left)),
        F.when(nonempty(left), F.lit("\n")),
        F.when(nonempty(right), F.col(right)),
        F.when(nonempty(right), F.lit("\n")),
        F.when(nonempty(footer), F.lit("**Footer:**\n")),
        F.when(nonempty(footer), F.col(footer)),
        F.when(nonempty(footer), F.lit("\n")),
    )


def markdown_c002_col(page_number="page_number", header="header",
                      footer="footer", left="left_column",
                      right="right_column") -> F.Column:
    """One page's C002 markdown (C002_json_to_md.py:49-86). Fields are
    stripped first (:51-54); empty columns contribute an empty joined
    content block, exactly like the reference's "\\n\\n".join."""
    n = F.col(page_number).cast("string")
    h = F.trim(F.col(header))
    f_ = F.trim(F.col(footer))
    lc = F.trim(F.col(left))
    rc = F.trim(F.col(right))
    cols_joined = F.concat_ws(
        "\n\n",
        F.array_compact(F.array(
            F.when(lc != "", lc), F.when(rc != "", rc))),
    )
    return _join_fragments(
        F.concat(F.lit("---\n\n# Page "), n, F.lit("\n")),
        F.concat(F.lit("--- Page "), n, F.lit(" Start ---")),
        F.lit("## Header"),
        h,
        F.lit("\n"),
        F.concat(F.lit("### Page "), n, F.lit(" Content")),
        cols_joined,
        F.lit("\n"),
        F.concat(F.lit("--- Page "), n, F.lit(" Footer ---")),
        F.lit("## Footer"),
        f_,
        F.lit("\n"),
    )


def to_markdown(layouts: DataFrame, flavor: str = "c001") -> DataFrame:
    """Add a ``markdown`` column to a layouts DataFrame."""
    col = markdown_c001_col() if flavor == "c001" else markdown_c002_col()
    return layouts.withColumn("markdown", col)
