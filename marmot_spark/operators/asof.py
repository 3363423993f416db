"""Point-in-time AS-OF join (per-token label backfill, SURVEY.md J2).

Semantics: for each left row, attach the payload of the LAST right row with
``right_ts <= left_ts`` (inclusive) for the same key — i.e. zero temporal
leakage: a right row at ``left_ts + 1us`` must never be selected. Ties on
``right_ts`` within a key break deterministically by ``tie_break`` (largest
wins, e.g. ``label_seq``). Optional ``tolerance_us``: a match older than
``left_ts - tolerance_us`` is treated as no-match (null payload) — the batch
analogue of a streaming watermark / max-staleness bound.

Reference semantics re-expressed: marmot backfills phrase/sentence-level tags
onto each token of the span (marmot/representations/
segmentation_representation_generator.py, marmot/experiment/context_utils.py
[R — SURVEY.md §0]); the north rule recasts that positional backfill as a
point-in-time as-of join.

Spark has no native AS-OF join; a raw inequality join is O(n*m). Two
scale-correct strategies are provided (tests assert they agree and match
DuckDB's ASOF JOIN):

* ``strategy="window"`` (default): union both sides with a side flag, then
  ``last(payload, ignorenulls=True)`` over a window partitioned by
  ``(key [, salt])`` ordered by ``(ts, side, tie)``. One shuffle, stays
  entirely in the JVM (whole-stage codegen), and AQE handles partition
  coalescing. This is a linear merge — the sort-merge as-of join expressed
  declaratively so Catalyst owns the physical execution.

* ``strategy="merge"``: the explicit Arrow-batched kernel — co-partition both
  sides by ``(key, salt)``, ``sortWithinPartitions(key, salt, ts, side,
  tie)``, then a vectorized grouped forward-fill over sorted Arrow batches in
  ``mapInPandas`` (pandas ops only — never per-row Python), with carry state
  across batch boundaries within a partition. This is the fallback shape for
  engines where the window exec spills (very wide payloads), and the form the
  north star describes.

Skew: a hot key (one doc_id = 30% of rows) would pin one task. Pass
``hot_keys=[...]`` or ``auto_salt=True``: left rows of hot keys get
``salt = xxhash64(left_ts) % n_salts``; right rows of hot keys are REPLICATED
to every salt (each salted group then carries the full right-side timeline
for that key, so the as-of result is unchanged — only the parallelism
changes). Non-hot keys use salt=0 and are not replicated.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_SALT = "__asof_salt"
_TS = "__asof_ts"
_TIE = "__asof_tie"
_MATCH_TS = "__asof_match_ts"


def detect_hot_keys(df: DataFrame, key: str, threshold: float = 0.05, sample_fraction: float | None = None) -> list:
    """Keys owning more than ``threshold`` of rows (sampled scan, one agg)."""
    src = df.sample(sample_fraction) if sample_fraction else df
    counts = src.groupBy(key).agg(F.count(F.lit(1)).alias("__c"))
    total = src.count()
    if total == 0:
        return []
    rows = counts.filter(F.col("__c") >= threshold * total).select(key).collect()
    return [r[0] for r in rows]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tie_break: str | None = None,
    tolerance_us: int | None = None,
    strategy: str = "window",
    hot_keys: Sequence | None = None,
    auto_salt: bool = False,
    n_salts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Left as-of join: left columns + ``payload`` columns from right.

    Payload columns are null where no right row with ``right_ts <= left_ts``
    (within tolerance) exists for the key.
    """
    keys = [on] if isinstance(on, str) else list(on)
    spark = left.sparkSession
    if auto_salt and hot_keys is None:
        hot_keys = detect_hot_keys(left, keys[0])
    hot_keys = list(hot_keys or [])

    left_cols = left.columns
    for c in payload:
        if c in left_cols:
            raise ValueError(f"payload column {c!r} collides with a left column")

    # ---- salt assignment ----------------------------------------------------
    if hot_keys:
        hot = F.col(keys[0]).isin([k for k in hot_keys])
        l_salt = F.when(hot, F.pmod(F.xxhash64(F.col(left_ts)), F.lit(n_salts)).cast("int")).otherwise(F.lit(0))
        r_salts = F.when(hot, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(F.array(F.lit(0)))
    else:
        l_salt = F.lit(0)
        r_salts = F.array(F.lit(0))

    tie_l = F.lit(0).cast("long")  # left rows sort AFTER right rows at equal ts via _SIDE
    tie_r = F.col(tie_break).cast("long") if tie_break else F.lit(0).cast("long")

    lhs = left.withColumn(_SALT, l_salt).withColumn(_SIDE, F.lit(1)).withColumn(_TS, F.col(left_ts)).withColumn(_TIE, tie_l)
    for c in payload:
        lhs = lhs.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    lhs = lhs.withColumn(_MATCH_TS, F.lit(None).cast(dict(right.dtypes)[right_ts]))

    rhs = (
        right.select(keys + [right_ts] + list(payload) + ([tie_break] if tie_break else []))
        .withColumn(_SALT, F.explode(r_salts))
        .withColumn(_SIDE, F.lit(0))
        .withColumn(_TS, F.col(right_ts))
        .withColumn(_TIE, tie_r)
        .withColumn(_MATCH_TS, F.col(right_ts))
    )
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    union_cols = left_cols + list(payload) + [_SALT, _SIDE, _TS, _TIE, _MATCH_TS]
    merged = lhs.select(union_cols).unionByName(rhs.select(union_cols))

    if strategy == "window":
        w = (
            Window.partitionBy(*keys, _SALT)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = merged
        for c in list(payload) + [_MATCH_TS]:
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
        out = out.filter(F.col(_SIDE) == 1)
    elif strategy == "merge":
        out = _merge_kernel(merged, keys, payload, num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions")))
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    if tolerance_us is not None:
        stale = F.col(_MATCH_TS) < F.col(_TS) - F.expr(f"INTERVAL {tolerance_us} MICROSECOND")
        for c in payload:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn(_MATCH_TS, F.when(stale, F.lit(None)).otherwise(F.col(_MATCH_TS)))

    return out.select(left_cols + list(payload) + [F.col(_MATCH_TS).alias("matched_ts")])


def _merge_kernel(merged: DataFrame, keys: list[str], payload: Sequence[str], num_partitions: int) -> DataFrame:
    """Explicit sorted-merge kernel: co-partition, sort, grouped ffill per Arrow batch."""
    fill_cols = list(payload) + [_MATCH_TS]
    grp_cols = keys + [_SALT]
    part = merged.repartition(num_partitions, *grp_cols).sortWithinPartitions(
        *grp_cols, F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc()
    )
    schema = part.schema

    def ffill_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_key: tuple | None = None
        carry_vals: dict | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            first_key = tuple(pdf.iloc[0][grp_cols])
            prepended = False
            if carry_key is not None and first_key == carry_key:
                synth = pdf.iloc[[0]].copy()
                for c, v in carry_vals.items():
                    synth[c] = v
                pdf = pd.concat([synth, pdf], ignore_index=True)
                prepended = True
            g = pdf.groupby(grp_cols, sort=False, dropna=False)[fill_cols]
            pdf[fill_cols] = g.ffill()
            last_key = tuple(pdf.iloc[-1][grp_cols])
            carry_key = last_key
            carry_vals = {c: pdf.iloc[-1][c] for c in fill_cols}
            if prepended:
                pdf = pdf.iloc[1:]
            yield pdf[pdf[_SIDE] == 1]

    return part.mapInPandas(ffill_partition, schema=schema)
