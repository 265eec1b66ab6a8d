"""pdf_parser_spark — a PySpark-native main-content extraction engine.

From-scratch reimplementation of the capabilities of the reference
layout-extraction engine (ai-tools-all/pdf-parser, read-only at
/root/reference) over Spark DataFrames + Arrow-vectorized pandas UDFs, per
SURVEY.md. Not a port: the reference tells us WHAT to compute (operator
semantics, thresholds, output schema); the architecture is Spark-first.
"""

__version__ = "0.1.0"
