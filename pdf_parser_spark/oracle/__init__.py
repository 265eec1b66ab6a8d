from pdf_parser_spark.oracle.extractor import (  # noqa: F401
    VARIANTS,
    VariantConfig,
    blocks_to_text,
    extract_turn,
    normalize_layout,
)
from pdf_parser_spark.oracle.questions import extract_questions_from_text  # noqa: F401
from pdf_parser_spark.oracle.boilerplate import strip_boilerplate  # noqa: F401
