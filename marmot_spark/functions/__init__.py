from marmot_spark.functions.binarize import binarize, fit_vocab
from marmot_spark.functions.text import (
    doc_fingerprint_col,
    lang_id_col,
    quality_cols,
    token_count_cols,
)

__all__ = [
    "fit_vocab",
    "binarize",
    "lang_id_col",
    "quality_cols",
    "token_count_cols",
    "doc_fingerprint_col",
]
