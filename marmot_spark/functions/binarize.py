"""Deterministic categorical one-hot binarization (SURVEY.md F8).

Reference semantics: marmot binarizes categorical (string) features with
sklearn LabelBinarizer/DictVectorizer before learning
(marmot/experiment/preprocessing_utils.py :: fit_binarizers()/binarize()
[R — SURVEY.md §0]). For reproducible (allclose-stable) vectors the engine
pins the vocabulary order: SORTED distinct values, indexed from 0.

Spark-first: fit = one distinct+sort on the (small) value domain; transform =
broadcast join value→index + array construction — no UDF, no per-row Python.
The one-hot is an array<double> so downstream numpy comparison is direct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


MAX_VOCAB = 100_000  # one-hot width / single-task-sort / broadcast ceiling


def fit_vocab(df: DataFrame, col: str, max_vocab: int = MAX_VOCAB) -> DataFrame:
    """(value, idx) vocabulary: sorted distinct values, idx 0..V-1.

    Only valid for CATEGORICAL domains: fitting a high-cardinality column
    (a doc_id by mistake) would need a >max_vocab-wide one-hot and a giant
    broadcast, a silent scale-killer. Guarded: raises above ``max_vocab``
    distinct values (the check is a bounded ``limit(max_vocab+1).count()``,
    so it never aggregates the full domain just to fail). Mirrors the
    64-entity chunk-bounds guard in operators/windows.py.

    The guarded bound also lets the SORT happen on the driver over the
    collected distinct values (<= max_vocab rows of plan metadata — the
    same bounded-collect pattern as packing's base offsets) instead of a
    ``Window.orderBy`` global rank, whose ``Exchange SinglePartition`` is
    banned plan-wide by tests/test_plan_audit.py. The distributed part —
    the distinct over the full data — stays a normal hash aggregation.
    """
    distinct = (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    rows = distinct.limit(max_vocab + 1).collect()
    if len(rows) > max_vocab:
        raise ValueError(
            f"fit_vocab({col!r}): more than {max_vocab} distinct values — this is "
            "not a categorical domain; one-hot binarization would need a "
            f">{max_vocab}-wide array and a giant broadcast. Use hashing/embedding "
            "features instead, or raise max_vocab explicitly if the domain really "
            "is categorical."
        )
    from pyspark.sql import types as T

    values = sorted(r["value"] for r in rows)
    # build a FRESH StructType: .add() mutates in place and df.schema is
    # cached on the DataFrame, so schema.add would corrupt `distinct`'s own
    # schema (same hazard sources/external.py documents and avoids)
    schema = T.StructType(
        list(distinct.schema.fields) + [T.StructField("idx", T.IntegerType())]
    )
    return distinct.sparkSession.createDataFrame(
        [(v, i) for i, v in enumerate(values)], schema=schema
    )


def binarize(
    df: DataFrame,
    col: str,
    vocab: DataFrame,
    out_col: str | None = None,
    drop_idx: bool = True,
    max_vocab: int = MAX_VOCAB,
) -> DataFrame:
    """Append ``{col}_onehot`` array<double> (all zeros for out-of-vocab/null)."""
    out_col = out_col or f"{col}_onehot"
    v = F.broadcast(vocab.select(F.col("value").alias(f"__{col}_v"), F.col("idx").alias(f"__{col}_i")))
    size = vocab.count()
    if size > max_vocab:
        raise ValueError(
            f"binarize({col!r}): vocab has {size} entries > max_vocab={max_vocab} — "
            "refusing the one-hot fan-out (see fit_vocab guardrail)"
        )
    df = df.join(v, df[col] == v[f"__{col}_v"], "left")
    onehot = F.transform(
        F.sequence(F.lit(0), F.lit(size - 1)),
        lambda j: F.when(F.col(f"__{col}_i") == j, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    df = df.withColumn(out_col, onehot).drop(f"__{col}_v")
    if drop_idx:
        df = df.drop(f"__{col}_i")
    else:
        df = df.withColumnRenamed(f"__{col}_i", f"{col}_idx")
    return df
