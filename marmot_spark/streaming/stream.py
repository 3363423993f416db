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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def streaming_source(spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet") -> DataFrame:
    """File-backed stream. The file source monitors DIRECTORIES; a single-file
    path is exposed through a per-file symlink directory (partition discovery
    rejects bare files even with basePath set)."""
    import hashlib
    import os
    import tempfile

    if os.path.isfile(path):
        target = os.path.abspath(path)
        d = os.path.join(
            tempfile.gettempdir(),
            f"stream_src_{os.getuid()}_{hashlib.sha1(target.encode()).hexdigest()[:12]}",
        )
        os.makedirs(d, mode=0o700, exist_ok=True)
        link = os.path.join(d, os.path.basename(path))
        # verify an existing entry actually points at the requested file (a
        # stale/foreign regular file or wrong link must not be silently read),
        # and tolerate the islink-check/symlink race
        try:
            if os.path.islink(link):
                if os.readlink(link) != target:
                    os.unlink(link)
            elif os.path.exists(link):
                os.unlink(link)
        except FileNotFoundError:
            pass  # concurrent unlink in the islink/readlink race window
        if not os.path.islink(link):
            try:
                os.symlink(target, link)
            except FileExistsError:
                if os.readlink(link) != target:
                    raise
        path = d
    return spark.readStream.format(fmt).schema(schema).load(path)


def streaming_stateful_totals(
    events: DataFrame,
    entity: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-entity
    running (n_events, sum_value) maintained in GroupState across micro-batches.

    The arbitrary-stateful escape hatch for semantics session_window/agg can't
    express (the streaming analogue of the engine's batch kernels): state is
    a single tuple per key, updates are vectorized per Arrow batch (pandas
    sums — never per-row Python over events), output mode "update" emits one
    row per touched key per micro-batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{entity} long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({entity: [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        events.groupBy(entity)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_session_counts(
    events: DataFrame,
    ts: str = "ts",
    entity: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity session aggregation with late-data watermark.

    Pass an integer ``value_col`` (e.g. cents) when the output must be
    order-independent and exactly comparable to a SQL oracle — float sums
    depend on reduction order.
    """
    # withWatermark rejects TIMESTAMP_NTZ (parquet naive timestamps under a
    # default session); normalize like the batch operators do
    if dict(events.dtypes)[ts] == "timestamp_ntz":
        events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap), F.col(entity))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col(entity),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark: str = "90 days",
) -> DataFrame:
    """Streaming exact deduplication — the incremental counterpart of the
    batch ``dedup.exact`` pass: the first event per key set is emitted, later
    replays are dropped. State holds one entry per key and is EVICTED once
    the event-time watermark passes (``dropDuplicatesWithinWatermark``), so
    the state store is bounded by the key arrival rate times the watermark
    horizon rather than growing with the whole stream — the property that
    makes streaming dedup viable on an unbounded 10^12-event feed. Choose
    ``watermark`` >= the maximum replay lag; duplicates straggling beyond it
    are no longer guaranteed dropped (that tail belongs to the batch dedup
    backstop)."""
    if dict(events.dtypes)[ts] == "timestamp_ntz":
        events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_asof_backfill(
    events: DataFrame,
    labels: DataFrame,
    out_path: str,
    checkpoint_path: str,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload=("label",),
    **asof_kwargs,
):
    """Streaming point-in-time backfill — the engine's flagship as-of join
    deployed INCREMENTALLY: each micro-batch of the append-only event stream
    is backfilled against the static label-history table with the batch
    as-of kernel (operators/asof.py), via ``foreachBatch``.

    Correct by construction: a backward as-of output row depends only on its
    own left row and the (static) label history — there is no cross-event
    state — so applying the batch kernel per micro-batch yields exactly the
    batch join over the union of all micro-batches, whatever the batch
    boundaries. The requirement is that ``labels`` stays FIXED for the run:
    snapshot-pin it (sources/tables.TableIO reads a pinned snapshot) so a
    restart replays identical batches against identical labels — with the
    parquet sink + checkpoint this gives end-to-end exactly-once output.
    Labels that arrive AFTER an event was processed are by design not
    retro-filled (that is the batch backfill's job on the next snapshot);
    the streaming path exists for fresh events, not history rewrites.

    Returns the configured ``DataStreamWriter`` (parquet sink at
    ``out_path``, checkpoint at ``checkpoint_path``, availableNow trigger) —
    call ``.start()`` and await it. Per micro-batch the as-of kernel keeps
    its batch plan shape (window strategy, optional salting kwargs pass
    through); the label side re-broadcasts/re-shuffles per batch, so persist
    ``labels`` when batches are frequent.
    """
    from marmot_spark.operators.asof import asof_join

    def _do_batch(batch_df: DataFrame, _epoch_id: int) -> None:
        out = asof_join(
            batch_df, labels, on=on, left_ts=left_ts, right_ts=right_ts,
            payload=list(payload), **asof_kwargs,
        )
        out.write.mode("append").parquet(out_path)

    return (
        events.writeStream.foreachBatch(_do_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
