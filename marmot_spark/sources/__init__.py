from marmot_spark.sources.corpus import (
    read_alignment_file,
    read_token_corpus,
    read_wmt_tsv,
)
from marmot_spark.sources.tables import TableIO

__all__ = ["read_token_corpus", "read_wmt_tsv", "read_alignment_file", "TableIO"]
