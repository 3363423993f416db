"""Alignment-derived features (SURVEY.md J1/W2).

Reference semantics: for target token i, marmot fetches the aligned source
token source[a(i)] and its ±k context; unaligned tokens get an
'__unaligned__' sentinel; multi-aligned tokens take the FIRST aligned index
(marmot/features/alignment_feature_extractor.py ::
AlignmentFeatureExtractor.get_features() [R — SURVEY.md §0]).

Spark-first design: alignments ride as an ``array<array<int>>`` column joined
once per doc (equi-join on doc_id — sort-merge for big sides, broadcast for
small), after which every per-token lookup is pure array arithmetic
(``F.get``) inside whole-stage codegen — no shuffle per token, no Python.
Sentinel on int32 ids: UNALIGNED=-3; aligned-context padding uses START/END.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from marmot_spark import END_ID, START_ID, UNALIGNED_ID


def first_aligned_idx(align_col: str, pos_col: str) -> Column:
    """First aligned source index for the token at pos (null if unaligned)."""
    return F.get(F.get(F.col(align_col), F.col(pos_col)), 0)


def join_alignments(tokens_exploded: DataFrame, alignments: DataFrame, on: str = "doc_id") -> DataFrame:
    """Attach src_tokens / align arrays to the exploded token stream (one equi-join)."""
    return tokens_exploded.join(alignments, on, "left")


def with_aligned_token(df: DataFrame, k_context: int = 0) -> DataFrame:
    """Add aligned_tok (+ aligned context ±k) columns.

    Expects columns: pos, align (array<array<int>>), src_tokens (array<int>).
    aligned_tok = src_tokens[align[pos][0]] | UNALIGNED.
    aligned_lag_i / aligned_lead_i pad with START/END like W1.
    """
    # a missing source sentence (left-join miss) is "unaligned" for every token
    idx = F.when(F.col("src_tokens").isNotNull(), first_aligned_idx("align", "pos"))
    df = df.withColumn(
        "aligned_tok",
        F.when(idx.isNull(), F.lit(UNALIGNED_ID)).otherwise(
            F.coalesce(F.get(F.col("src_tokens"), idx), F.lit(UNALIGNED_ID))
        ),
    )
    for i in range(1, k_context + 1):
        df = df.withColumn(
            f"aligned_lag_{i}",
            F.when(idx.isNull(), F.lit(UNALIGNED_ID)).otherwise(
                F.coalesce(F.get(F.col("src_tokens"), idx - i), F.lit(START_ID))
            ),
        )
        df = df.withColumn(
            f"aligned_lead_{i}",
            F.when(idx.isNull(), F.lit(UNALIGNED_ID)).otherwise(
                F.coalesce(F.get(F.col("src_tokens"), idx + i), F.lit(END_ID))
            ),
        )
    return df


def with_pseudo_ref_membership(
    tokens_exploded: DataFrame,
    pseudo_refs: DataFrame,
    on: str = "doc_id",
    ref_tokens_col: str = "ref_tokens",
    out_col: str = "in_pseudo_ref",
) -> DataFrame:
    """J4 pseudo-reference membership: flag whether each target token occurs in
    the doc's pseudo-reference translation.

    Reference semantics: marmot scores each token against a pseudo-reference
    produced by another MT system (token-in-reference binary feature,
    marmot/features — pseudo-reference extractor family [R — SURVEY.md §0]).

    Spark-first shape: ONE equi-join per doc attaches the reference token
    array (sort-merge for large reference sets, broadcast when small — left
    to Catalyst/AQE stats), then per-token membership is ``array_contains``
    on the riding array inside whole-stage codegen — no per-token join, no
    shuffle beyond the single doc-level join. A doc with no pseudo-reference
    yields 0 (not-in-reference), matching the reference's treatment of
    missing system output.
    """
    joined = tokens_exploded.join(pseudo_refs, on, "left")
    return joined.withColumn(
        out_col,
        F.when(
            F.col(ref_tokens_col).isNotNull()
            & F.array_contains(F.col(ref_tokens_col), F.col("tok")),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("int"),
    ).drop(ref_tokens_col)
