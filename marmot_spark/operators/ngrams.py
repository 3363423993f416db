"""N-gram generation and LM-membership features (SURVEY.md J3/W3, A2).

Reference semantics: marmot loads an SRILM-style n-gram counts file into an
in-memory set and, per token, reports (a) membership of the n-gram windows
covering the token and (b) the longest n such that the n-gram ENDING at the
token is in the LM — Raybaud-style backoff features
(marmot/features/lm_feature_extractor.py :: LMFeatureExtractor [R —
SURVEY.md §0]).

Spark-first design: n-grams are generated array-side (``transform`` +
``slice`` — no Python, no shuffle), membership is a BROADCAST hash join
against the (small) n-gram dictionary, and longest-order is a ``greatest``
over per-n membership flags. The dictionary is the broadcast side by
construction (LM vocab ≪ corpus), so the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngrams_col(tokens_col: str, n: int) -> Column:
    """array<array<int>> of all n-grams of the tokens array (empty if too short)."""
    toks = F.col(tokens_col)
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), lambda i: F.slice(toks, i + 1, n)),
    ).otherwise(F.array().cast("array<array<int>>"))


def left_ngram_col(tokens_col: str, pos_col: str, n: int) -> Column:
    """The n-gram ENDING at pos (tokens[pos-n+1 .. pos]); null if pos < n-1."""
    toks, pos = F.col(tokens_col), F.col(pos_col)
    return F.when(pos >= n - 1, F.slice(toks, pos - (n - 2), n)).otherwise(F.lit(None))


def with_ngram_membership(
    exploded: DataFrame,
    ngram_dict: DataFrame,
    max_n: int = 3,
    tokens_col: str = "tokens",
    pos_col: str = "pos",
) -> DataFrame:
    """Add in_lm_1..in_lm_max_n flags + longest_ngram per token.

    in_lm_n: the n-gram ending at pos is in the dictionary.
    longest_ngram: max n with in_lm_n = 1 (0 if none) — requires the
    marmot backoff convention that membership is tested per exact n.
    """
    out = exploded
    # all probe n-grams in ONE projection before any join: the joins then
    # reference only the (short) __left_n slices, so Catalyst prunes the full
    # ``tokens`` array out of the probe stream before the first join instead
    # of copying it through every broadcast-join output row (guide §2.3:
    # project before the exchange/join)
    for n in range(1, max_n + 1):
        out = out.withColumn(f"__left_{n}", left_ngram_col(tokens_col, pos_col, n))
    for n in range(1, max_n + 1):
        dict_n = ngram_dict.filter(F.col("n") == n).select(F.col("ngram").alias(f"__ng_{n}"))
        out = out.join(
            F.broadcast(dict_n.distinct()),
            out[f"__left_{n}"] == dict_n[f"__ng_{n}"],
            "left",
        )
        out = out.withColumn(f"in_lm_{n}", F.col(f"__ng_{n}").isNotNull().cast("int"))
        out = out.drop(f"__ng_{n}", f"__left_{n}")
    longest = F.lit(0)
    for n in range(1, max_n + 1):
        longest = F.when(F.col(f"in_lm_{n}") == 1, n).otherwise(longest)
    return out.withColumn("longest_ngram", longest.cast("int"))


def ngram_counts(df: DataFrame, tokens_col: str = "tokens", n: int = 2) -> DataFrame:
    """Corpus n-gram frequency table (A2): explode n-grams, groupBy, count.

    Partial aggregation (map-side combine) is automatic in HashAggregateExec.
    """
    return (
        df.select(F.explode(ngrams_col(tokens_col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
