"""Structured Streaming wrapper (SURVEY.md §2.9 stretch goal).

The correctness contract is batch; this module provides the streaming
counterparts of the batch event-time semantics so the same tables can be
consumed incrementally:

* watermark <-> the as-of tolerance (late labels beyond the watermark are
  dropped, exactly like tolerance nulls stale matches),
* session_window() <-> batch gap-sessionize (W6),
* windowed counts <-> batch rolling counts (A4).

Sinks are exercised with format("memory") + processAllAvailable() in tests —
a deterministic drain of a parquet-backed stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def streaming_source(spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(schema).load(path)


def streaming_session_counts(
    events: DataFrame,
    ts: str = "ts",
    entity: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-entity session aggregation with late-data watermark."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap), F.col(entity))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col(entity),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
