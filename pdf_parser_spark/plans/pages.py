"""Page-selection predicate P7: normalize page specs at plan time, filter
at scan time.

Reimplements the reference's ``parse_pages_argument`` + ``PageRange``
(/root/reference/pdf_layout_tester.py:139-192, :47-67): accepts an int, a
list of ints, a ``PageRange``, or a ``"start-end"`` string; validates
1-indexed pages (``>= 1``) and ``end >= start``; returns a sorted,
de-duplicated list. The Spark side then pushes the selection into the
scan as an ``isin``/``between`` predicate on ``turn_idx`` (the reference's
manual "only touch requested pages" pushdown, :240-251 — Catalyst gets us
parquet row-group pruning for free).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PageRange:
    """Inclusive 1-indexed page range (pdf_layout_tester.py:47-67)."""

    start: int
    end: int

    def __post_init__(self):
        if self.start < 1:
            raise ValueError(f"start page must be >= 1, got {self.start}")
        if self.end < self.start:
            raise ValueError(
                f"end page ({self.end}) must be >= start page ({self.start})")

    def to_list(self) -> list:
        return list(range(self.start, self.end + 1))


def parse_pages_argument(pages) -> list:
    """Normalize a page spec to a sorted, de-duplicated 1-indexed list
    (pdf_layout_tester.py:139-192)."""
    if isinstance(pages, bool):
        raise ValueError(f"invalid pages argument: {pages!r}")
    if isinstance(pages, int):
        if pages < 1:
            raise ValueError(f"page number must be >= 1, got {pages}")
        return [pages]
    if isinstance(pages, PageRange):
        return pages.to_list()
    if isinstance(pages, str):
        text = pages.strip()
        if "-" in text[1:]:
            left, _, right = text.partition("-")
            try:
                rng = PageRange(int(left), int(right))
            except ValueError as exc:
                if "start page" in str(exc) or "end page" in str(exc):
                    raise
                raise ValueError(f"invalid page range string: {pages!r}") from exc
            return rng.to_list()
        try:
            return parse_pages_argument(int(text))
        except ValueError as exc:
            if "page number" in str(exc):
                raise
            raise ValueError(f"invalid pages argument: {pages!r}") from exc
    if isinstance(pages, (list, tuple)):
        out = set()
        for p in pages:
            out.update(parse_pages_argument(p))
        return sorted(out)
    raise ValueError(f"invalid pages argument: {pages!r}")


def select_turns(df: DataFrame, pages, turn_col: str = "turn_idx") -> DataFrame:
    """Filter transcript turns by 1-indexed page spec (page = turn_idx + 1).

    Contiguous specs become a ``between`` (range predicate -> parquet
    row-group stats pruning); sparse specs become ``isin``."""
    page_list = parse_pages_argument(pages)
    idxs = [p - 1 for p in page_list]
    if len(idxs) > 1 and idxs == list(range(idxs[0], idxs[-1] + 1)):
        return df.filter(F.col(turn_col).between(idxs[0], idxs[-1]))
    return df.filter(F.col(turn_col).isin(idxs))
