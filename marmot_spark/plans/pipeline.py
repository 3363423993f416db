"""Feature-pipeline spec: a declarative list of FeatureOps compiled into ONE
DataFrame expression DAG (SURVEY.md §3.4).

This replaces marmot's YAML + reflection experiment wiring
(marmot/experiment/experiment_utils.py :: import_class()/build_objects()
[R — SURVEY.md §0]) with plain dataclasses — no reflection, no magic. The
compile step only *composes* Column expressions and the as-of kernel, so the
whole pipeline stays a single Catalyst plan: pushdown/pruning/AQE see
everything, and no intermediate materialization happens between ops.

Every op is pure metadata; ``compile_pipeline`` is the only function that
touches DataFrames.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame

from marmot_spark.functions.binarize import binarize, fit_vocab
from marmot_spark.operators.asof import asof_join
from marmot_spark.operators.ngrams import with_ngram_membership
from marmot_spark.operators.windows import rolling_count, sessionize, with_context_window


@dataclass(frozen=True)
class FeatureOp:
    """Base marker for pipeline ops."""


@dataclass(frozen=True)
class ContextWindowOp(FeatureOp):
    k: int = 2
    tokens_col: str = "tokens"
    pos_col: str = "pos"


@dataclass(frozen=True)
class NgramMembershipOp(FeatureOp):
    dict_df: DataFrame = None
    max_n: int = 3
    tokens_col: str = "tokens"
    pos_col: str = "pos"


@dataclass(frozen=True)
class AsofBackfillOp(FeatureOp):
    labels: DataFrame = None
    on: str = "doc_id"
    left_ts: str = "seq_ts"
    right_ts: str = "label_ts"
    payload: Sequence[str] = field(default_factory=tuple)
    tie_break: str | None = None
    tolerance_us: int | None = None
    strategy: str = "window"
    hot_keys: Sequence | None = None
    n_salts: int = 16


@dataclass(frozen=True)
class SessionizeOp(FeatureOp):
    entity: str = "source"
    ts: str = "seq_ts"
    gap_seconds: float = 1800.0
    session_col: str = "session_id"
    order_extra: tuple = ()


@dataclass(frozen=True)
class RollingCountOp(FeatureOp):
    entity: str = "source"
    ts: str = "seq_ts"
    window_seconds: int = 3600
    out_col: str = "rolling_n"
    value_col: str | None = None


@dataclass(frozen=True)
class BinarizeOp(FeatureOp):
    col: str = ""
    vocab: DataFrame | None = None  # fitted lazily from the input if None


def compile_pipeline(df: DataFrame, ops: Sequence[FeatureOp]) -> DataFrame:
    """Fold the op list into one DataFrame plan (no action is triggered)."""
    for op in ops:
        if isinstance(op, ContextWindowOp):
            df = with_context_window(df, op.k, op.tokens_col, op.pos_col)
        elif isinstance(op, NgramMembershipOp):
            df = with_ngram_membership(df, op.dict_df, op.max_n, op.tokens_col, op.pos_col)
        elif isinstance(op, AsofBackfillOp):
            df = asof_join(
                df, op.labels, op.on, op.left_ts, op.right_ts, list(op.payload),
                tie_break=op.tie_break, tolerance_us=op.tolerance_us,
                strategy=op.strategy, hot_keys=op.hot_keys, n_salts=op.n_salts,
            )
        elif isinstance(op, SessionizeOp):
            df = sessionize(df, op.entity, op.ts, op.gap_seconds, op.session_col, list(op.order_extra))
        elif isinstance(op, RollingCountOp):
            df = rolling_count(df, op.entity, op.ts, op.window_seconds, op.out_col, op.value_col)
        elif isinstance(op, BinarizeOp):
            vocab = op.vocab if op.vocab is not None else fit_vocab(df, op.col)
            df = binarize(df, op.col, vocab)
        else:
            raise TypeError(f"unknown FeatureOp: {op!r}")
    return df
