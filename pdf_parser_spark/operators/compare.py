"""Extractor comparison fan-out D4 and registry dispatch D6.

D4 (/root/reference/pdf_layout_tester.py:325-365): run several extractor
variants over the same input and return one keyed result set — here a
union of the variant outputs tagged with ``extractor_name`` (the Spark
idiom for the reference's dict-of-results).

D6 (/root/reference/tests/extractor_config.py:33-96): the registry mapping
inputs to extractor implementations. In this engine dispatch happens on
the ``tool`` column inside the extraction UDF (page/v1 -> layout parser,
html/v1 -> boilerplate stripper, else plain fallback); this module holds
the variant registry for the layout parser itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_parser_spark.operators.extract import extract_layouts
from pdf_parser_spark.oracle.extractor import VARIANTS

DEFAULT_VARIANT = "a003"  # EXTRACTOR_MAP default (extractor_config.py:45)


def registered_variants() -> tuple:
    return tuple(sorted(VARIANTS))


def get_variant(name: str | None) -> str:
    """Registry lookup with default (extractor_config.py:48-79)."""
    if name is None:
        return DEFAULT_VARIANT
    if name not in VARIANTS:
        raise KeyError(f"unknown extractor variant {name!r}; "
                       f"registered: {registered_variants()}")
    return name


def compare_extractors(df: DataFrame, variants=("a002", "a003", "a004")) -> DataFrame:
    """Run each variant over the same turns; union tagged results."""
    parts = [
        extract_layouts(df, variant=get_variant(v))
        .withColumn("extractor_name", F.lit(v))
        for v in variants
    ]
    return reduce(DataFrame.unionByName, parts)
