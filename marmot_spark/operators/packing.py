"""Sequence packing for LLM pretraining: concat-and-chunk documents into
fixed-length training windows (SURVEY.md §2 extension — token-pipeline ops).

The reference operates on per-sentence feature rows and has no notion of
packing (its corpora are small enough to batch in memory:
marmot/experiment/run_experiment.py [R — SURVEY.md §0]); packing is the
standard shape a 100 TB token pipeline needs: order the document stream
deterministically, concatenate token arrays, slice the stream into packs of
exactly ``max_len`` tokens. A document that straddles a pack boundary is
SPLIT across packs (the usual pretraining convention — no padding waste).

Output: one row per (document x pack it overlaps):
    (part, pack_id, <order_key>, seg_start, seg_len, pack_off)
seg_start = offset of the segment within the document's token array,
pack_off  = offset of the segment within the pack. Downstream assembly is a
groupBy(pack_id) + sort by pack_off + flatten of slices — all metadata here
is exact-integer and SQL-mirrorable (the driver oracle reproduces it with a
window cumsum + UNNEST(range)).

Scale design — the naive form is a scale-killer and is NOT what this does:
a single ``Window.partitionBy(part).orderBy(key)`` running-sum serializes an
entire part (one task per source at 10^12 rows). Instead the TWO-PHASE
prefix-sum the engine already uses for chunked rolling/sessionize
(operators/windows.py): phase 1 aggregates per-(part, chunk) token totals
(one partial-aggregated job, n_parts x n_chunks rows to the driver); the
driver prefix-sums those into chunk base offsets (broadcast as a literal
lookup); phase 2 computes the cumsum WITHIN each (part, chunk) — parallelism
= parts x chunks, and the global offset = chunk base + local cumsum is exact.
Chunks are contiguous ranges of the numeric order key, so ordering across
chunk boundaries is preserved by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_DRIVER_CELLS = 4096  # parts x chunks ceiling for the driver prefix pass


def pack_segments(
    df: DataFrame,
    order_key: str,
    n_tok_col: str,
    max_len: int,
    part_col: str | None = None,
    n_chunks: int = 1,
    bounds: dict | None = None,
) -> DataFrame:
    """Assign every document's tokens to fixed-``max_len`` packs.

    ``order_key`` must be a NUMERIC, per-part-unique column — it defines the
    deterministic stream order (and the chunk ranges when ``n_chunks > 1``).
    ``bounds``: optional {part: (min_key, max_key)} to skip the bounds job
    (pass it when the caller already knows the key ranges — metadata-cheap
    on a partitioned table). Rows with ``n_tok <= 0`` are dropped.
    """
    part = part_col or "__g"
    if part_col is None:
        df = df.withColumn("__g", F.lit(0))
    df = df.filter(F.col(n_tok_col) > 0)

    if n_chunks > 1:
        if bounds is None:
            bounds = {
                r["p"]: (int(r["mn"]), int(r["mx"]))
                for r in df.groupBy(F.col(part).alias("p"))
                .agg(F.min(order_key).alias("mn"), F.max(order_key).alias("mx"))
                .collect()
            }
        if any(p is None for p in bounds):
            raise ValueError(
                f"pack_segments: part_col {part!r} contains NULLs — null parts "
                "cannot be keyed in the chunk-offset lookup; filter or fill them"
            )
        if len(bounds) * n_chunks > MAX_DRIVER_CELLS:
            raise ValueError(
                f"{len(bounds)} parts x {n_chunks} chunks exceeds {MAX_DRIVER_CELLS} "
                "driver prefix cells — lower n_chunks or split the job"
            )
        # chunk = clamped floor((key - mn) / span); contiguous in order_key,
        # so cross-chunk order is preserved by construction
        chunk_expr = F.lit(0)
        for p, (mn, mx) in bounds.items():
            span = max(1, (mx - mn + n_chunks) // n_chunks)
            # clamp BOTH ends: a caller-supplied bounds dict whose min
            # overstates the true min would otherwise yield chunk -1, which
            # the driver base-offset loop never covers (base 0 -> silent
            # overlap with chunk 0). Clamping to 0 is monotone, so exactness
            # is preserved when bounds are data-derived.
            c = F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_chunks - 1),
                    F.floor((F.col(order_key) - F.lit(mn)) / F.lit(span)).cast(
                        "int"
                    ),
                ),
            )
            chunk_expr = F.when(F.col(part) == p, c).otherwise(chunk_expr)
        df = df.withColumn("__chunk", chunk_expr)
        # phase 1: per-(part, chunk) totals -> driver prefix -> base offsets
        totals = (
            df.groupBy(part, "__chunk")
            .agg(F.sum(F.col(n_tok_col).cast("long")).alias("t"))
            .collect()
        )
        tot = {(r[part], int(r["__chunk"])): int(r["t"]) for r in totals}
        base: dict[tuple, int] = {}
        for p in sorted({k[0] for k in tot}):
            acc = 0
            for c in range(n_chunks):
                base[(p, c)] = acc
                acc += tot.get((p, c), 0)
        base_expr = F.lit(0).cast("long")
        for (p, c), off in base.items():
            if off:
                base_expr = F.when(
                    (F.col(part) == p) & (F.col("__chunk") == c), F.lit(off)
                ).otherwise(base_expr)
        w = Window.partitionBy(part, "__chunk").orderBy(order_key)
        df = df.withColumn(
            "__off",
            base_expr
            + F.sum(F.col(n_tok_col).cast("long")).over(w)
            - F.col(n_tok_col).cast("long"),
        ).drop("__chunk")
    else:
        w = Window.partitionBy(part).orderBy(order_key)
        df = df.withColumn(
            "__off",
            F.sum(F.col(n_tok_col).cast("long")).over(w) - F.col(n_tok_col).cast("long"),
        )

    L = F.lit(int(max_len)).cast("long")
    off, n = F.col("__off"), F.col(n_tok_col).cast("long")

    def _idiv(a):
        # exact integer floor-division for non-negative a: subtract the
        # remainder first so the double division is a whole number (exact up
        # to 2^53 packs — far beyond any real stream)
        return ((a - a % L) / L).cast("long")

    packs = F.sequence(_idiv(off), _idiv(off + n - 1))
    seg = F.inline(
        F.transform(
            packs,
            lambda p: F.struct(
                p.cast("long").alias("pack_id"),
                F.greatest(p * L - off, F.lit(0).cast("long")).cast("int").alias("seg_start"),
                (F.least((p + 1) * L, off + n) - F.greatest(p * L, off)).cast("int").alias("seg_len"),
                (F.greatest(p * L, off) - p * L).cast("int").alias("pack_off"),
            ),
        )
    )
    keep = ([part] if part_col else []) + [order_key]
    return df.select(*keep, seg)


def assemble_packs(
    docs: DataFrame,
    segments: DataFrame,
    tokens_col: str,
    order_key: str,
    part_col: str | None = None,
) -> DataFrame:
    """Materialize the packed training sequences described by ``segments``
    (the output of :func:`pack_segments`) into actual token arrays.

    Join the segment metadata back to the token-bearing scan (equi-join on
    the order key — the wide arrays shuffle ONCE, already sliced to just the
    bytes each pack needs), then one groupBy(pack) gathers the slices in
    pack_off order and flattens. Per-pack state is bounded by max_len tokens
    by construction, so the collect_list can never blow up a task.

    Output: (part?, pack_id, tokens array<...>, n_tok).
    """
    part = [part_col] if part_col else []
    keys = part + [order_key]
    joined = segments.join(docs.select(*keys, tokens_col), keys)
    sliced = joined.select(
        *part,
        "pack_id",
        F.struct(
            F.col("pack_off"),
            F.slice(F.col(tokens_col), F.col("seg_start") + 1, F.col("seg_len")).alias("seg"),
        ).alias("__s"),
    )
    return (
        sliced.groupBy(*part, "pack_id")
        .agg(F.flatten(F.array_sort(F.collect_list("__s")).getField("seg")).alias("tokens"))
        .withColumn("n_tok", F.size("tokens"))
    )
