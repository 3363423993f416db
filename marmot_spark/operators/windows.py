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


def ntz_to_ts(df: DataFrame, ts: str) -> DataFrame:
    """Normalize a TIMESTAMP_NTZ column to TIMESTAMP at the operator boundary.

    Parquet written with naive (non-UTC-adjusted) timestamps reads back as
    TIMESTAMP_NTZ under a default Spark 4 session, which ``unix_micros``,
    ``cast(double)``, range frames on micros, and ``withWatermark`` all
    reject. The cast interprets the wall-clock value in the session timezone;
    under UTC (the engine's convention) it is a semantic no-op. Gap/window
    math only uses differences, so any fixed-offset zone is also exact — only
    a DST-shifting session zone could perturb results, which is why
    ``build_session`` pins UTC.
    """
    if dict(df.dtypes)[ts] == "timestamp_ntz":
        df = df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df


def explode_tokens(df: DataFrame, tokens_col: str = "tokens", keep: list[str] | None = None) -> DataFrame:
    """Per-token exploded view: one row per (doc, pos). Narrow — no shuffle.

    Mirrors marmot's create_contexts() flattening (marmot/experiment/
    context_utils.py [R]): each output row is a context_obj — token, index,
    plus the full sentence array carried along for array-side features.
    """
    keep = keep if keep is not None else [c for c in df.columns if c != tokens_col]
    # the array is always projected explicitly; a caller-supplied keep that
    # also names it would otherwise produce an ambiguous duplicate column
    keep = [c for c in keep if c != tokens_col]
    return df.select(*keep, tokens_col, F.posexplode(tokens_col).alias("pos", "tok"))


def context_col(tokens_col: str, pos_col: str, offset: int) -> Column:
    """Token at pos+offset with START/END sentinel padding (0-based F.get)."""
    sentinel = START_ID if offset < 0 else END_ID
    return F.coalesce(F.get(F.col(tokens_col), F.col(pos_col) + F.lit(offset)), F.lit(sentinel))


def with_context_window(df: DataFrame, k: int = 2, tokens_col: str = "tokens", pos_col: str = "pos") -> DataFrame:
    """Add lag_1..lag_k / lead_1..lead_k sentinel-padded context columns.

    Post-explode form: requires the tokens array on each exploded row. NOTE —
    carrying the array through the explode costs O(len^2) memory traffic per
    doc; prefer ``explode_with_context`` (O(len*k)) on long documents.
    """
    for i in range(1, k + 1):
        df = df.withColumn(f"lag_{i}", context_col(tokens_col, pos_col, -i))
        df = df.withColumn(f"lead_{i}", context_col(tokens_col, pos_col, i))
    return df


def shifted_col(tokens_col: str, offset: int) -> Column:
    """The tokens array shifted by ``offset`` with sentinel padding.

    shifted[p] = tokens[p+offset], START/END-padded — built array-side so the
    per-doc cost is O(len) regardless of how the result is consumed.
    """
    toks = F.col(tokens_col)
    n = F.size(toks)
    i = abs(offset)
    if offset < 0:
        pad = F.array_repeat(F.lit(START_ID), F.least(F.lit(i), n))
        body = F.slice(toks, 1, F.greatest(n - i, F.lit(0)))
        return F.concat(pad, body)
    pad = F.array_repeat(F.lit(END_ID), F.least(F.lit(i), n))
    body = F.when(n > i, F.slice(toks, i + 1, n - i)).otherwise(F.array().cast("array<int>"))
    return F.concat(body, pad)


def explode_with_context(
    df: DataFrame, k: int = 2, tokens_col: str = "tokens", keep: list[str] | None = None
) -> DataFrame:
    """Per-token rows with lag/lead context, WITHOUT materializing shifted copies.

    ``posexplode`` + inline ``F.get(tokens, pos±i)``: whole-stage codegen
    fuses the generate and the context projection into one stage, so the
    tokens array is read IN PLACE per output row and never copied — measured
    6-25x faster than zipping (2k+1) shifted array copies per doc (the zip
    form churns (2k+1)*len*4B of struct garbage through the allocator). The
    array is projected away in the same select, so it cannot leak into a
    downstream shuffle. Narrow plan: zero shuffles.
    """
    keep = keep if keep is not None else [c for c in df.columns if c != tokens_col]
    # the array is consumed in place and projected away; keep must not re-name
    # it or the final select would hit an ambiguous duplicate column
    keep = [c for c in keep if c != tokens_col]
    ex = df.select(*keep, tokens_col, F.posexplode(tokens_col).alias("pos", "tok"))
    ctx = []
    for i in range(1, k + 1):
        ctx.append(context_col(tokens_col, "pos", -i).alias(f"lag_{i}"))
        ctx.append(context_col(tokens_col, "pos", i).alias(f"lead_{i}"))
    return ex.select(*keep, "pos", "tok", *ctx)


def sessionize(
    df: DataFrame,
    entity: str,
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
    order_extra: list[str] | None = None,
    n_chunks: int | None = None,
    bounds: dict | None = None,
    chunk_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Gap-based session ids per entity (1-based, in event order).

    One shuffle on ``entity``; deterministic under duplicate timestamps via
    ``order_extra`` tie-break columns.

    ``n_chunks``: the scale path for LOW-CARDINALITY / HOT entity keys (the
    north rule's sessionize-by-source with a 55%-hot source). A per-entity
    ordered scan caps parallelism at #entities, so with n_chunks each entity
    is split into time-range chunks, sessions are computed locally per chunk
    (parallel), and a tiny per-chunk summary (first/last ts, #sessions)
    computes boundary offsets: a chunk whose first event is within
    gap_seconds of the previous chunk's last event merges its first session
    backwards. Exactly equal to the serial result; parallelism becomes
    #entities * n_chunks.
    """
    df = ntz_to_ts(df, ts)
    tdouble = F.col(ts).cast("double")
    # order by integer micros (same ordering as the raw timestamp) so a
    # downstream rolling_count window — whose RANGE frames must sort by
    # unix_micros — can reuse this operator's sort instead of re-sorting.
    # ``order_col`` names a MATERIALIZED column holding exactly
    # unix_micros(ts): ordering by the shared attribute (instead of a
    # computed expression that window resolution re-aliases to a fresh _w0
    # per operator) is what lets a downstream window's sort requirement
    # prefix-match this operator's sort order and be elided.
    if order_col is not None:
        lead = F.col(order_col)
    else:
        lead = (
            F.unix_micros(F.col(ts))
            if dict(df.dtypes)[ts].startswith("timestamp")
            else F.col(ts)
        )
    if (not n_chunks or n_chunks <= 1) and chunk_col is None:
        order = [lead.asc()] + [F.col(c).asc() for c in (order_extra or [])]
        w = Window.partitionBy(entity).orderBy(*order)
        gap = tdouble - F.lag(tdouble, 1).over(w)
        new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
        return df.withColumn(
            session_col,
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )

    if chunk_col is not None:
        # pre-chunked input (with_time_chunk): partition by the EXISTING column
        # so this operator rides the upstream exchange instead of re-shuffling
        chunked, ch = df, chunk_col
    else:
        chunked, ch = _with_time_chunk(df, entity, tdouble, n_chunks, bounds=bounds), "__chunk"
    order = [lead.asc()] + [F.col(c).asc() for c in (order_extra or [])]
    w_loc = Window.partitionBy(entity, ch).orderBy(*order)
    gap = tdouble - F.lag(tdouble, 1).over(w_loc)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    local = chunked.withColumn(
        "__lsess", F.sum(new_sess).over(w_loc.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    )

    summ = local.groupBy(entity, F.col(ch).alias("__chunk")).agg(
        F.min(tdouble).alias("__first_t"),
        F.max(tdouble).alias("__last_t"),
        F.max("__lsess").alias("__nsess"),
    )
    w_chunks = Window.partitionBy(entity).orderBy(F.col("__chunk").asc())
    merge = (
        (F.col("__first_t") - F.lag("__last_t", 1).over(w_chunks)) <= gap_seconds
    ).cast("long")
    summ = summ.withColumn("__merge", F.coalesce(merge, F.lit(0)))
    # offset_k = sum of previous chunks' session counts minus merges up to k
    summ = summ.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__nsess").over(w_chunks.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        )
        - F.sum("__merge").over(w_chunks.rowsBetween(Window.unboundedPreceding, 0)),
    ).select(entity, "__chunk", "__offset")

    out = local.join(
        F.broadcast(summ.withColumnRenamed("__chunk", ch) if ch != "__chunk" else summ),
        [entity, ch],
    )
    out = out.withColumn(session_col, (F.col("__lsess") + F.col("__offset")).cast("long")).drop(
        "__lsess", "__offset"
    )
    # internal chunk col is dropped; a caller-provided chunk_col stays
    return out.drop("__chunk") if chunk_col is None else out


def _bounds_us(bounds: dict) -> dict:
    """Seconds-domain bounds dict -> integer-micros dict (single rounding rule
    shared by every consumer so chunk ids and chunk starts always agree)."""
    return {
        k: (int(round(mn * 1e6)), int(round(mx * 1e6)))
        for k, (mn, mx) in bounds.items()
        if mn is not None and mx is not None
    }


def _spans_us(bounds_us: dict, n_chunks: int) -> dict:
    return {k: max((mx - mn) // n_chunks, 1) for k, (mn, mx) in bounds_us.items()}


def _case_over_entities(build, bounds_us: dict, ent_col: str):
    expr = None
    for k in bounds_us:
        cond = F.col(ent_col).isNull() if k is None else (F.col(ent_col) == F.lit(k))
        expr = F.when(cond, build(k)) if expr is None else expr.when(cond, build(k))
    return expr


def _chunk_of_expr(cus, bounds_us: dict, spans: dict, n_chunks: int, ent_col: str):
    return F.coalesce(
        _case_over_entities(
            lambda k: F.greatest(
                F.least(
                    F.floor((cus - F.lit(bounds_us[k][0])) / F.lit(spans[k])).cast("int"),
                    F.lit(n_chunks - 1),
                ),
                F.lit(0),
            ),
            bounds_us,
            ent_col,
        ),
        F.lit(0),
    )


def with_time_chunk(
    df: DataFrame,
    entity: str,
    ts: str,
    n_chunks: int,
    bounds: dict | None = None,
    chunk_col: str = "__tchunk",
) -> DataFrame:
    """Add a per-entity time-range chunk column for SHARING one shuffle across
    chunked operators: `rolling_count(..., chunk_col=...)` then
    `sessionize(..., chunk_col=...)` both partition by (entity, chunk_col), so
    the second operator reuses the first's exchange instead of re-shuffling
    the wide payload. Requires TimestampType ``ts``.
    """
    df = ntz_to_ts(df, ts)
    if not dict(df.dtypes)[ts].startswith("timestamp"):
        raise ValueError("with_time_chunk requires a TimestampType ts column")
    if bounds is None:
        bounds = entity_time_bounds(df, entity, ts)
    bus = _bounds_us(bounds)
    spans = _spans_us(bus, n_chunks)
    return df.withColumn(
        chunk_col, _chunk_of_expr(F.unix_micros(F.col(ts)), bus, spans, n_chunks, entity)
    )


def entity_time_bounds(df: DataFrame, entity: str, ts: str) -> dict:
    """Per-entity (min, max) of ``ts`` as double — one tiny aggregate, collected once.

    Compute this on the CHEAPEST upstream frame (usually the raw scan) and pass
    it to ``sessionize``/``rolling_count`` via ``bounds=``: chunking only needs
    the time range per entity, and row-preserving operators upstream don't
    change it. Without precomputed bounds each chunked operator collects its
    own, which re-executes the whole upstream plan at plan-build time.
    """
    df = ntz_to_ts(df, ts)
    tdouble = F.col(ts).cast("double")
    rows = df.groupBy(entity).agg(F.min(tdouble).alias("mn"), F.max(tdouble).alias("mx")).collect()
    return {r[entity]: (r["mn"], r["mx"]) for r in rows}


def _with_time_chunk(
    df: DataFrame, entity: str, tdouble, n_chunks: int, bounds: dict | None = None
) -> DataFrame:
    """Assign each row a per-entity time-range chunk id in [0, n_chunks).

    Range chunking (not hash) keeps equal timestamps together and preserves
    order across chunks — required for exact scan merging. Bounds are a tiny
    per-entity min/max aggregate collected ONCE to the driver and inlined as
    literal CASE branches: a broadcast-join would re-execute per plan branch
    and add an exchange + stage per consumer, which dominates wall time on
    small-to-medium inputs. Rows whose entity is missing from ``bounds`` (or
    whose ts falls outside) clamp into chunk 0 / n_chunks-1 — correctness never
    depends on bounds being tight, only parallelism does.
    """
    if bounds is None:
        rows = df.groupBy(entity).agg(F.min(tdouble).alias("mn"), F.max(tdouble).alias("mx")).collect()
        bounds = {r[entity]: (r["mn"], r["mx"]) for r in rows}
    if len(bounds) > 64:
        raise ValueError(
            f"n_chunks chunking is for low-cardinality/hot entities; {entity!r} has "
            f"{len(bounds)} values — a plain per-entity window already parallelizes"
        )
    expr = None
    for ent, (mn, mx) in bounds.items():
        if mn is None or mx is None or mx <= mn:
            branch = F.lit(0)
        else:
            span = (mx - mn) / n_chunks
            branch = F.greatest(
                F.least(F.floor((tdouble - F.lit(mn)) / F.lit(span)), F.lit(n_chunks - 1)), F.lit(0)
            )
        cond = F.col(entity).isNull() if ent is None else (F.col(entity) == F.lit(ent))
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    chunk = F.coalesce(expr, F.lit(0)) if expr is not None else F.lit(0)
    return df.withColumn("__chunk", chunk.cast("int"))


def _rolling_chunked_frames(
    df: DataFrame,
    entity: str,
    ts: str,
    window_seconds: int,
    out_col: str,
    value_col: str | None,
    n_chunks: int,
    bounds: dict | None,
    delta_type: str,
    chunk_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame | None:
    """Chunked rolling counts via in-chunk frames + a chunk-tail sideband.

    KEY IDENTITY (makes global offsets unnecessary): the guard below ensures
    window < chunk span, so a row's window reaches AT MOST one chunk back.
    With lcum = in-chunk cum(ts' <= t) and llt = in-chunk cum(ts' < t-W),
    the global chunk offsets CANCEL:

        rolling(t) = [coff + lcum] - [coff - cnt_ge + llt]
                   = lcum - llt + cnt_ge

    where cnt_ge counts earlier-chunk events with ts' in [t-W, chunk_start) —
    nonzero only for boundary rows (t-W before their chunk start, ~W/span of
    rows), and computable from each chunk's LAST-W tail only. So the plan is:
    ONE exchange on (entity, chunk), one WindowExec (two add-only RANGE
    frames + row_number), a tiny sideband (union of ~W/span tail events +
    probes, reverse-cumulative window), and a broadcast join-back. No totals
    aggregate, no offset spine, no full-data second pass — at scale this is
    one full shuffle of the narrow frame, full stop.

    Returns None when any entity's window spans >= its chunk span (every row
    would be a boundary row — the probe-stream path handles that better).

    ``order_col``: a MATERIALIZED column holding exactly unix_micros(ts)
    (same contract as :func:`sessionize`): windows then order by the shared
    attribute, so when an upstream operator already sorted by it this
    operator's sort requirement is prefix-satisfied and elided.
    """
    tus = F.col(order_col) if order_col is not None else F.unix_micros(F.col(ts))
    wus = window_seconds * 1_000_000
    if bounds is None:
        rows = df.groupBy(entity).agg(F.min(tus).alias("mn"), F.max(tus).alias("mx")).collect()
        bounds_us = {r[entity]: (r["mn"], r["mx"]) for r in rows}
    else:
        bounds_us = _bounds_us(bounds)
    if len(bounds_us) > 64:
        raise ValueError(
            f"n_chunks chunking is for low-cardinality/hot entities; {entity!r} has "
            f"{len(bounds_us)} values — a plain per-entity window already parallelizes"
        )
    spans = _spans_us(bounds_us, n_chunks)
    if not bounds_us or any(wus >= span for span in spans.values()):
        return None

    def chunk_of(cus, ent_col: str):
        return _chunk_of_expr(cus, bounds_us, spans, n_chunks, ent_col)

    delta = F.lit(1).cast("long") if value_col is None else F.col(value_col)
    if chunk_col is not None:
        # pre-chunked input (with_time_chunk, same bounds/n_chunks): ride the
        # existing column so the exchange is shared with sibling operators
        base, ch = df, chunk_col
    else:
        base, ch = df.withColumn("__chunk", chunk_of(tus, entity)), "__chunk"

    w_ord = Window.partitionBy(entity, ch).orderBy(tus)
    # ONE select, not three withColumns: each withColumn makes its own Window
    # logical node whose computed order key (unix_micros) is re-aliased to a
    # fresh _w0 attribute, so the order specs stop being syntactically equal
    # and CollapseWindow cannot merge them — the physical plan gets THREE
    # Sort+WindowExec passes over the stream (and the probe branch below
    # re-executes all three). From a single projection, ExtractWindowExpressions
    # groups all three frames under one (partition, order) spec: one sort,
    # one WindowExec.
    ev = base.select(
        "*",
        F.sum(delta).over(w_ord.rangeBetween(Window.unboundedPreceding, 0)).alias("__lcum"),
        F.sum(delta).over(w_ord.rangeBetween(Window.unboundedPreceding, -(wus + 1))).alias("__llt"),
        F.row_number().over(w_ord).cast("long").alias("__lrn"),
    )

    start = F.coalesce(
        _case_over_entities(
            lambda k: F.lit(bounds_us[k][0]) + F.col(ch).cast("long") * F.lit(spans[k]),
            bounds_us, entity,
        ),
        F.lit(0).cast("long"),
    )
    p = tus - F.lit(wus)
    # chunk 0 has no earlier chunk: every event below the probe point is
    # in-chunk (clamped rows included), so llt already covers it — interior
    # formula applies and no probe is needed
    is_bnd = (p < start) & (F.col(ch) > 0)

    probes = ev.filter(is_bnd).select(
        F.col(entity).alias("__ent"), p.alias("__tus"), F.lit(0).alias("__side"),
        F.col(ch).alias("__pchunk"), F.col("__lrn").alias("__prn"),
        F.lit(None).cast(delta_type).alias("__delta"),
    )
    # sideband events: only each chunk's LAST-W tail can be >= some probe
    # point (plus loose-bounds clamped strays) — chunk_of(ts + W) names the
    # chunk whose probes the event can serve; keep iff ts < that chunk's
    # start (i.e. the event lies strictly before the served chunk)
    serve = chunk_of(tus + F.lit(wus), entity)
    serve_start = F.coalesce(
        _case_over_entities(
            lambda k: F.lit(bounds_us[k][0]) + serve.cast("long") * F.lit(spans[k]),
            bounds_us, entity,
        ),
        F.lit(0).cast("long"),
    )
    tail = base.filter(tus < serve_start).select(
        F.col(entity).alias("__ent"), tus.alias("__tus"), F.lit(1).alias("__side"),
        F.lit(None).cast("int").alias("__pchunk"), F.lit(None).cast("long").alias("__prn"),
        delta.cast(delta_type).alias("__delta"),
    )
    # reverse-cumulative count within (entity, served chunk): at a probe row,
    # sum(delta) over the DESC stream = events with ts >= probe point. Events
    # sort before probes at equal ts (side desc) so ts == t-W is included —
    # the window frame [t-W, t] is closed on the left.
    merged = tail.unionByName(probes).withColumn(
        "__k2", chunk_of(F.col("__tus") + F.lit(wus), "__ent")
    )
    w2 = (
        Window.partitionBy("__ent", "__k2")
        .orderBy(F.col("__tus").desc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    probe_res = (
        merged.withColumn("__ge", F.coalesce(F.sum("__delta").over(w2), F.lit(0).cast(delta_type)))
        .filter(F.col("__side") == 0)
        .select("__ent", "__pchunk", "__prn", F.col("__ge").alias("__pge"))
    )

    out = ev.join(
        F.broadcast(probe_res),
        (ev[entity] == probe_res["__ent"])
        & (ev[ch] == probe_res["__pchunk"])
        & (ev["__lrn"] == probe_res["__prn"]),
        "left",
    )
    result = (
        F.col("__lcum")
        - F.coalesce(F.col("__llt"), F.lit(0).cast(delta_type))
        + F.coalesce(F.col("__pge"), F.lit(0).cast(delta_type))
    )
    if value_col is None:
        result = result.cast("long")
    return out.select(*[F.col(c) for c in df.columns], result.alias(out_col))


def rolling_count(
    df: DataFrame,
    entity: str,
    ts: str,
    window_seconds: int,
    out_col: str = "rolling_n",
    value_col: str | None = None,
    strategy: str = "difference",
    n_chunks: int | None = None,
    bounds: dict | None = None,
    chunk_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Event-time rolling count (or sum of value_col) over the trailing window.

    Frame: [ts - window_seconds, ts] inclusive, per entity. Equal-ts rows
    share the same value (SQL RANGE semantics — the DuckDB oracle is exact).

    strategy="difference" (default, the scale path): Spark's WindowExec
    recomputes SLIDING frames from scratch per row — O(n * rows_in_window) —
    which degenerates catastrophically on dense timestamps. GROWING frames
    (unboundedPreceding -> currentRow) are incremental, so we compute
        rolling(t) = cum_le(t) - cnt_lt(t - W)
    with growing-frame passes: cum_le over the events, and cnt_lt via PROBE
    rows at (ts - W) unioned into the stream (probes sort BEFORE events at
    equal time, giving the strict <), joined back by a per-entity row number.
    O(n log n) total, JVM-only.

    strategy="range": the naive RANGE frame — fine for sparse windows, kept
    for tiny inputs and as the semantics reference.

    ``order_col`` (difference-strategy paths): a caller-MATERIALIZED column
    holding exactly ``unix_micros(ts)``. Ordering windows by the shared
    attribute (instead of a computed expression that resolution re-aliases
    per operator) lets adjacent window operators collapse into one
    WindowExec and lets an upstream sort on the same attribute satisfy this
    operator's ordering requirement (see :func:`sessionize`).

    Fast path (unchunked + TimestampType ts): both terms are ADD-ONLY range
    frames over integer microseconds — cum_le = [unbounded, 0] and cnt_lt =
    [unbounded, -(W*1e6 + 1)] (strict < via the -1µs on an integer domain) —
    evaluated in ONE WindowExec sharing one sort: one shuffle, zero probe
    rows, zero joins. Spark's UnboundedPreceding frames advance their upper
    pointer monotonically (O(n)), unlike sliding frames which rescan.
    """
    df = ntz_to_ts(df, ts)
    if strategy == "range":
        w = (
            Window.partitionBy(entity)
            .orderBy(F.col(ts).cast("double"))
            .rangeBetween(-int(window_seconds), 0)
        )
        if value_col is None:
            return df.withColumn(out_col, F.count(F.lit(1)).over(w).cast("long"))
        return df.withColumn(out_col, F.sum(F.col(value_col)).over(w))
    if strategy != "difference":
        raise ValueError(f"unknown strategy {strategy!r}")

    tdouble = F.col(ts).cast("double")
    delta_type = "long" if value_col is None else dict(df.dtypes)[value_col]
    ts_is_timestamp = dict(df.dtypes)[ts].startswith("timestamp")

    if n_chunks and n_chunks > 1 and ts_is_timestamp:
        out = _rolling_chunked_frames(
            df, entity, ts, int(window_seconds), out_col, value_col, n_chunks, bounds,
            delta_type, chunk_col=chunk_col, order_col=order_col,
        )
        if out is not None:
            return out
        # fall through to the probe-stream formulation (window >= chunk span)

    if (not n_chunks or n_chunks <= 1) and ts_is_timestamp:
        tus = F.col(order_col) if order_col is not None else F.unix_micros(F.col(ts))
        w_le = Window.partitionBy(entity).orderBy(tus).rangeBetween(Window.unboundedPreceding, 0)
        w_lt = Window.partitionBy(entity).orderBy(tus).rangeBetween(
            Window.unboundedPreceding, -(int(window_seconds) * 1_000_000 + 1)
        )
        delta = F.lit(1).cast("long") if value_col is None else F.col(value_col)
        result = F.sum(delta).over(w_le) - F.coalesce(
            F.sum(delta).over(w_lt), F.lit(0).cast(delta_type)
        )
        if value_col is None:
            result = result.cast("long")
        return df.withColumn(out_col, result)

    if n_chunks and n_chunks > 1:
        # scale path for hot/low-cardinality entities: chunk each entity by
        # time range, compute local running totals, add broadcast per-chunk
        # offsets (cumulative totals of earlier chunks). Equal timestamps
        # stay in one chunk, so RANGE semantics are preserved exactly.
        base = _with_time_chunk(df, entity, tdouble, n_chunks, bounds=bounds)
        w_loc_grow = (
            Window.partitionBy(entity, "__chunk").orderBy(tdouble)
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        w_loc_rid = Window.partitionBy(entity, "__chunk").orderBy(tdouble)
        loc_delta = F.lit(1).cast("long") if value_col is None else F.col(value_col)
        totals = base.groupBy(entity, "__chunk").agg(
            F.sum(loc_delta).alias("__tot"), F.count(F.lit(1)).alias("__rows")
        )
        w_ch = Window.partitionBy(entity).orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
        offs = totals.select(
            entity, "__chunk",
            F.coalesce(F.sum("__tot").over(w_ch), F.lit(0).cast(delta_type)).alias("__coff"),
            F.coalesce(F.sum("__rows").over(w_ch), F.lit(0)).alias("__roff"),
        )
        # one projection so both frames share one Window node (see
        # _rolling_chunked_frames for why separate withColumns plan 2 sorts)
        ev = (
            base.select(
                "*",
                F.sum(loc_delta).over(w_loc_grow).alias("__lcum"),
                F.row_number().over(w_loc_rid).alias("__lrn"),
            )
            .join(F.broadcast(offs), [entity, "__chunk"])
            .withColumn("__cum_le", F.col("__lcum") + F.col("__coff"))
            .withColumn("__rid", (F.col("__lrn") + F.col("__roff")).cast("long"))
            .drop("__chunk", "__lcum", "__lrn", "__coff", "__roff")
        )
        if value_col is None:
            ev = ev.withColumn("__cum_le", F.col("__cum_le").cast("long"))
    else:
        w_grow = Window.partitionBy(entity).orderBy(tdouble).rangeBetween(Window.unboundedPreceding, 0)
        w_rid = Window.partitionBy(entity).orderBy(tdouble)
        if value_col is None:
            cum_le = F.count(F.lit(1)).over(w_grow).cast("long")
        else:
            cum_le = F.sum(F.col(value_col)).over(w_grow)
        # one projection -> one Window node for both frames (see above)
        ev = df.select(
            "*", cum_le.alias("__cum_le"), F.row_number().over(w_rid).cast("long").alias("__rid")
        )

    # probe stream at ts - W; __side 0 sorts before events at equal time -> strict <
    probes = ev.select(
        F.col(entity).alias("__ent"),
        (tdouble - F.lit(float(window_seconds))).alias("__t"),
        F.lit(0).alias("__side"),
        F.col("__rid").alias("__prid"),
        F.lit(None).cast(delta_type).alias("__delta"),
    )
    events = ev.select(
        F.col(entity).alias("__ent"),
        tdouble.alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__prid"),
        (F.lit(1).cast("long") if value_col is None else F.col(value_col)).alias("__delta"),
    )
    merged_src = events.unionByName(probes)
    if n_chunks and n_chunks > 1:
        # merged stream spans [mn - W, mx] (probe rows sit at ts - W): derive
        # its bounds analytically from the event bounds — no second collect
        mbounds = None
        if bounds is not None:
            w = float(window_seconds)
            mbounds = {k: (mn - w if mn is not None else None, mx) for k, (mn, mx) in bounds.items()}
        merged_src = _with_time_chunk(merged_src, "__ent", F.col("__t"), n_chunks, bounds=mbounds)
        w_loc_cum = (
            Window.partitionBy("__ent", "__chunk")
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        mtotals = merged_src.groupBy("__ent", "__chunk").agg(F.sum("__delta").alias("__tot"))
        w_mch = Window.partitionBy("__ent").orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
        moffs = mtotals.select(
            "__ent", "__chunk",
            F.coalesce(F.sum("__tot").over(w_mch), F.lit(0).cast(delta_type)).alias("__moff"),
        )
        merged = (
            merged_src.withColumn("__lc", F.coalesce(F.sum("__delta").over(w_loc_cum), F.lit(0).cast(delta_type)))
            .join(F.broadcast(moffs), ["__ent", "__chunk"])
            .withColumn("__cnt_lt", F.col("__lc") + F.col("__moff"))
        )
    else:
        w_cum = (
            Window.partitionBy("__ent")
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        merged = merged_src.withColumn(
            "__cnt_lt", F.coalesce(F.sum("__delta").over(w_cum), F.lit(0).cast(delta_type))
        )
    probe_res = merged.filter(F.col("__side") == 0).select("__ent", "__prid", "__cnt_lt")
    out = ev.join(
        probe_res,
        (ev[entity] == probe_res["__ent"]) & (ev["__rid"] == probe_res["__prid"]),
        "left",
    )
    result = F.col("__cum_le") - F.coalesce(F.col("__cnt_lt"), F.lit(0).cast(delta_type))
    if value_col is None:
        result = result.cast("long")
    return out.select(*[F.col(c) for c in df.columns], result.alias(out_col))


def session_features(
    df: DataFrame,
    entity: str,
    ts: str,
    session_col: str = "session_id",
    value_col: str | None = None,
    order_extra: list[str] | None = None,
    prefix: str = "sess_",
) -> DataFrame:
    """Per-SESSION aggregate features joined back onto every event row.

    Given a frame already labeled by :func:`sessionize`, adds:

    * ``{p}n``      — events in this event's session,
    * ``{p}dur_us`` — session duration (last - first event, micros),
    * ``{p}idx``    — this event's 1-based position within its session
      (``order_extra`` tie-breaks duplicate timestamps, same contract as
      sessionize),
    * ``{p}sum``    — sum of ``value_col`` over the session (omitted when
      ``value_col`` is None); integer-exact when the input is quantized.

    Plan shape: windows partitioned by (entity, session). Because
    ``hashpartitioning(entity)`` already CLUSTERS rows by any superset of
    its keys, these windows reuse sessionize's single Exchange — Catalyst
    inserts only a sort, never a second shuffle — so session features are
    free riders on the sessionize pass (the fused plan is pinned by
    tests/test_ops_surface.py). The unbounded frame over (entity, session)
    is safe at web scale: a session is gap-bounded, so no partition-sized
    frame exists.
    """
    df = ntz_to_ts(df, ts)
    p = prefix
    us = F.unix_micros(F.col(ts))
    w = Window.partitionBy(entity, session_col)
    ws = w.orderBy(*[us.asc()] + [F.col(c).asc() for c in (order_extra or [])])
    out = (
        df.withColumn(f"{p}n", F.count(F.lit(1)).over(w))
        .withColumn(f"{p}dur_us", F.max(us).over(w) - F.min(us).over(w))
        .withColumn(f"{p}idx", F.row_number().over(ws).cast("long"))
    )
    if value_col is not None:
        out = out.withColumn(f"{p}sum", F.sum(value_col).over(w))
    return out


def rolling_distinct(
    df: DataFrame,
    entity: str,
    ts: str,
    window_seconds: int,
    value_col: str,
    out_col: str = "rolling_distinct",
) -> DataFrame:
    """Event-time rolling DISTINCT count of ``value_col`` over the trailing
    window ([ts - W, ts] inclusive, per entity — same frame contract as
    :func:`rolling_count`).

    Distinctness is not subtractive, so rolling_count's two-growing-frames
    difference trick does not apply; this is the honest RANGE-frame
    ``size(collect_set(...))`` — O(rows-in-frame) work and state per row,
    the right plan when the frame is naturally bounded (events per entity
    per hour), which is the feature-engineering case ("distinct event types
    this user touched in the last hour"). For unbounded frames at corpus
    scale, use the mergeable sketch path (operators/sketch.py — HLL per
    time bucket, union-merged) and accept the approximation; this exact
    form is deliberately not chunked.

    Shares the (entity) Exchange and the integer-micros sort with
    rolling_count's fast path — composing both adds no shuffle.
    """
    df = ntz_to_ts(df, ts)
    us = (
        F.unix_micros(F.col(ts))
        if dict(df.dtypes)[ts].startswith("timestamp")
        else F.col(ts)
    )
    w = (
        Window.partitionBy(entity)
        .orderBy(us.asc())
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    return df.withColumn(out_col, F.size(F.collect_set(value_col).over(w)).cast("long"))
