"""Windowed operators: token context windows, lag/lead, sessionize, rolling counts.

Reference semantics re-expressed (SURVEY.md §2.5):

* W1 context window — marmot pads ±k windows with '_START_'/'_END_'
  (marmot/util/ngram_window_extractor.py :: left_context/right_context/
  extract_window [R — SURVEY.md §0]). On int32 token ids the sentinels are
  START=-1 / END=-2 (FIXTURES.md). Because the whole sentence rides in the
  row's ``tokens`` array, the context window needs NO window function and NO
  shuffle: ``posexplode`` + 0-based ``F.get(tokens, pos±k)`` + ``coalesce``
  sentinel is a narrow, whole-stage-codegen'd plan that scales linearly.

* W4 lag/lead over an ordered stream — true cross-row windows
  (``Window.partitionBy(entity).orderBy(ts)``), one shuffle on the entity key.

* W6 sessionize — gap-based session ids: flag gap > threshold, running sum of
  flags. Identical formulation to DuckDB window SQL so oracles are exact.

* A4 rolling counts — event-time range frames over epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marmot_spark import END_ID, START_ID


def explode_tokens(df: DataFrame, tokens_col: str = "tokens", keep: list[str] | None = None) -> DataFrame:
    """Per-token exploded view: one row per (doc, pos). Narrow — no shuffle.

    Mirrors marmot's create_contexts() flattening (marmot/experiment/
    context_utils.py [R]): each output row is a context_obj — token, index,
    plus the full sentence array carried along for array-side features.
    """
    keep = keep if keep is not None else [c for c in df.columns if c != tokens_col]
    return df.select(*keep, tokens_col, F.posexplode(tokens_col).alias("pos", "tok"))


def context_col(tokens_col: str, pos_col: str, offset: int) -> Column:
    """Token at pos+offset with START/END sentinel padding (0-based F.get)."""
    sentinel = START_ID if offset < 0 else END_ID
    return F.coalesce(F.get(F.col(tokens_col), F.col(pos_col) + F.lit(offset)), F.lit(sentinel))


def with_context_window(df: DataFrame, k: int = 2, tokens_col: str = "tokens", pos_col: str = "pos") -> DataFrame:
    """Add lag_1..lag_k / lead_1..lead_k sentinel-padded context columns."""
    for i in range(1, k + 1):
        df = df.withColumn(f"lag_{i}", context_col(tokens_col, pos_col, -i))
        df = df.withColumn(f"lead_{i}", context_col(tokens_col, pos_col, i))
    return df


def sessionize(
    df: DataFrame,
    entity: str,
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
    order_extra: list[str] | None = None,
) -> DataFrame:
    """Gap-based session ids per entity (1-based, in event order).

    One shuffle on ``entity``; deterministic under duplicate timestamps via
    ``order_extra`` tie-break columns.
    """
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (order_extra or [])]
    w = Window.partitionBy(entity).orderBy(*order)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double"), 1).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def rolling_count(
    df: DataFrame,
    entity: str,
    ts: str,
    window_seconds: int,
    out_col: str = "rolling_n",
    value_col: str | None = None,
) -> DataFrame:
    """Event-time rolling count (or sum of value_col) over the trailing window.

    Frame: [ts - window_seconds, ts] inclusive, per entity. RANGE frame over
    epoch seconds — all rows with equal ts share the same value (matches SQL
    RANGE semantics, so the DuckDB oracle is exact).
    """
    w = (
        Window.partitionBy(entity)
        .orderBy(F.col(ts).cast("double"))
        .rangeBetween(-int(window_seconds), 0)
    )
    if value_col is None:
        return df.withColumn(out_col, F.count(F.lit(1)).over(w).cast("long"))
    return df.withColumn(out_col, F.sum(F.col(value_col)).over(w))
