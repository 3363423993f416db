"""Snapshot drift diagnostics: per-bin distribution comparison between two
corpus snapshots (train vs test, yesterday vs today) — the monitoring op a
production feature pipeline runs next to every backfill.

Follows the engine's sufficient-statistics discipline (see a8_corr_stats):
emit EXACT integers per bin — counts, ppm proportions, and a chi-square-
style contribution computed with truncating integer division — rather than
a float statistic whose summation order and libm log would diverge between
engines. Any consumer derives PSI/KL/chi-square from the (n_a, n_b) table
deterministically; the built-in ``chi2_q`` column is the overflow-safe
proportion form ``(pa_ppm - pb_ppm)^2 div max(pa_ppm + pb_ppm, 1)`` whose
intermediates stay under 10^12 at ANY corpus size (a raw-count chi-square
squares n_a*N_b ~ 10^21 at web scale — BIGINT overflow by construction).

Binning is the engine's exact distributed quantile CDF over the POOLED
sample (operators/rank.py::quantile_buckets — octave-decomposed, never a
global one-task sort), so both snapshots are measured against the same
edges and every bin is populated when the snapshots agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_drift"]


def snapshot_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Per-bin drift table between snapshots A and B of ``value_col``.

    Returns one row per pooled-quantile bucket:
    ``(bucket, n_a, n_b, pa_ppm, pb_ppm, chi2_q)`` — counts, exact floor-ppm
    proportions, and the proportion-form chi-square contribution (micro
    units). Total drift = ``sum(chi2_q)`` over the result (left to the
    caller, like the correlation sums).

    Plan: one union scan -> the exact-CDF bucketing -> one
    groupBy(bucket) with conditional counts -> a 1-row total broadcast.
    Two exchanges total, both bounded by n_buckets on the reduce side.
    """
    from marmot_spark.operators.rank import quantile_buckets

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    u = df_a.select(F.lit(0).alias("__side"), F.col(value_col)).unionByName(
        df_b.select(F.lit(1).alias("__side"), F.col(value_col))
    )
    bucketed = quantile_buckets(u, value_col, n_buckets, keep=["__side"])
    per = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.col("__side")).cast("long").alias("n_b"),
    )
    tot = per.agg(
        F.sum("n_a").alias("__na"), F.sum("n_b").alias("__nb")
    )
    out = per.join(F.broadcast(tot))
    out = out.withColumn(
        "pa_ppm", F.expr("n_a * 1000000L div greatest(__na, 1L)")
    ).withColumn("pb_ppm", F.expr("n_b * 1000000L div greatest(__nb, 1L)"))
    return out.withColumn(
        "chi2_q",
        F.expr("(pa_ppm - pb_ppm) * (pa_ppm - pb_ppm) div greatest(pa_ppm + pb_ppm, 1L)"),
    ).select("bucket", "n_a", "n_b", "pa_ppm", "pb_ppm", "chi2_q")
