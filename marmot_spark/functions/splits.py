"""Deterministic dataset splitting and mixture sampling for training-data
pipelines (SURVEY.md §2 extension — token-pipeline ops).

The reference splits train/test by file convention (separate WMT files —
marmot/experiment/run_experiment.py [R — SURVEY.md §0]); a 100 TB pipeline
needs CONTENT-DETERMINISTIC assignment instead: the same document lands in
the same split on every run, any cluster shape, any row order — so splits
are reproducible, leak-free, and computable as a pure projection (no
shuffle, no state, embarrassingly parallel at any scale).

Hash: a polynomial rolling hash of the id rendered as a string —
acc = (acc*31 + ascii(c)+1) mod P31 folded left over the characters, seeded
by ``seed`` (exact int64 arithmetic, mirrored verbatim in DuckDB SQL via
``list_reduce`` — no engine hash builtins, so the oracle reproduces it
bit-for-bit). A positional-linear form was rejected: its multipliers are
piecewise-linear in position, so decimal ids collided into ~1% of buckets;
the polynomial fold + final mix hits all 10^4 buckets near-uniformly
(verified over 100k ids: max bucket 19 vs expectation 10; 90071/4942/4987
at a 9000/500 split).

basis points (bps, 1/10000) everywhere: integer thresholds, no float
comparisons at the boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marmot_spark.functions.text import FP_MOD, FP_MULT

BPS = 10_000


def _norm_seed(seed: int) -> int:
    """Reduce the seed into [0, FP_MOD) non-negatively — a negative seed
    would drive the fold accumulator negative, making every hash negative
    so all rows compare < train_bps and silently land in 'train'."""
    return int(seed) % FP_MOD


def split_hash_col(id_col: str = "doc_id", seed: int = 0) -> Column:
    """Deterministic bucket in [0, BPS) from the stringified id.

    h = fold_left(chars, acc=seed, acc*31 + ascii(c)+1 mod FP_MOD), then one
    final Knuth-multiply mix (h*FP_MULT mod FP_MOD) before mod BPS — short
    ids never wrap the prime during the fold, so without the final mix their
    hashes are the raw polynomial value (clustered runs, biased buckets).
    Exact int64 at every step (acc < 2^31, acc*FP_MULT < 2^63).
    """
    s = F.col(id_col).cast("string")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.ascii(F.substring(s, i, F.lit(1))).cast("long") + 1,
    )
    h = F.aggregate(
        chars,
        F.lit(_norm_seed(seed)).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(FP_MOD),
    )
    return ((h * F.lit(FP_MULT)) % F.lit(FP_MOD) % BPS).cast("int")


def split_hash_sql(id_col: str = "doc_id", seed: int = 0) -> str:
    """DuckDB mirror of split_hash_col (exact)."""
    s = f"CAST({id_col} AS VARCHAR)"
    chars = (
        f"list_transform(range(1, length({s})+1), i -> "
        f"CAST(ascii(substr({s}, CAST(i AS INT), 1))+1 AS BIGINT))"
    )
    return (
        f"CAST((list_reduce(list_prepend(CAST({_norm_seed(seed)} AS BIGINT), {chars}), "
        f"(acc, x) -> (acc * 31 + x) % {FP_MOD}) * {FP_MULT}) % {FP_MOD} % {BPS} AS INT)"
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_bps: int = 9_000,
    val_bps: int = 500,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Append ``split`` in {train, val, test} by hash-bucket thresholds.

    Pure narrow projection: no shuffle, no sampling state; the assignment of
    a document never changes when the corpus grows (hash depends only on the
    id), which is what keeps eval sets stable across snapshot refreshes.
    """
    if train_bps < 0 or val_bps < 0:
        raise ValueError("train_bps and val_bps must each be >= 0")
    if not 0 <= train_bps + val_bps <= BPS:
        raise ValueError("train_bps + val_bps must be within [0, 10000]")
    h = split_hash_col(id_col, seed)
    return df.withColumn(
        out_col,
        F.when(h < train_bps, F.lit("train"))
        .when(h < train_bps + val_bps, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def mixture_sample(
    df: DataFrame,
    rates_bps: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 1,
    default_bps: int = 0,
) -> DataFrame:
    """Deterministic per-source downsampling (dataset mixture weights).

    Keeps a row iff hash(id) mod BPS < rates_bps[source] — e.g.
    {"web": 3000, "wiki": 10000} keeps 30% of web and all of wiki. The
    SAME documents are kept on every run (reproducible mixtures, and a
    document's inclusion is stable under corpus growth). Unknown sources
    get ``default_bps``. Narrow filter — pushes to the scan, no shuffle.
    """
    for src, bps in rates_bps.items():
        if not 0 <= bps <= BPS:
            raise ValueError(f"rate for {src!r} outside [0, {BPS}]")
    h = split_hash_col(id_col, seed)
    rate = F.lit(int(default_bps))
    for src, bps in rates_bps.items():
        rate = F.when(F.col(source_col) == src, F.lit(int(bps))).otherwise(rate)
    return df.filter(h < rate)


def temperature_rates(
    df: DataFrame,
    source_col: str = "source",
    tau: float = 0.7,
    scale_bps: int = BPS,
) -> DataFrame:
    """Derive per-source keep rates from corpus statistics — the standard
    temperature-scaled mixture recipe (multilingual BERT/XLM-R sampling;
    the source-reweighting step of public LLM data recipes): sampled share
    p_s ∝ n_s^tau with tau < 1 flattening the source distribution toward
    the tail. The one-pass realization is a keep RATE per source
    ∝ n_s^(tau-1), max-normalized so the most-upweighted (smallest) source
    keeps everything:

        rate_bps(s) = floor(scale_bps * n_s^(tau-1) / max_s' n_s'^(tau-1))

    Returns (source_col, rate_bps) — a sources-sized table; feed it to
    ``mixture_sample``-style filtering (hash(id) < rate) for the
    deterministic per-document decision. n^(tau-1) is exp((tau-1)·ln n):
    single float expressions over exact integer counts, computed identically
    by the SQL oracles (the module's established cross-engine class).

    Plan: one groupBy(source) count (the only pass over the corpus;
    map-side combined to the source cardinality), a 1-row max broadcast
    crossJoined back. tau=1 degenerates to rate=scale_bps everywhere
    (proportional sampling = keep all); tau=0 equalizes expected counts.
    """
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"tau must be in [0, 1], got {tau}")
    n = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.exp(F.lit(float(tau) - 1.0) * F.log(F.col("__n").cast("double")))
    tbl = n.select(source_col, w.alias("__w"))
    mx = tbl.agg(F.max("__w").alias("__mx"))
    return tbl.crossJoin(F.broadcast(mx)).select(
        source_col,
        F.floor(F.lit(float(scale_bps)) * F.col("__w") / F.col("__mx"))
        .cast("long")
        .alias("rate_bps"),
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
    id_col: str = "doc_id",
    seed: int = 2,
    out_col: str = "budget_keep",
) -> DataFrame:
    """Keep a content-stable PREFIX of each group totalling at most
    ``budget`` weight ("sample ~10B tokens per domain" — the curation op
    that budgets by tokens, not documents).

    Rows are ordered inside each group by the cross-engine content hash of
    the id (then the id — total order), and a row is kept iff its INCLUSIVE
    running weight sum is within budget. Prefix semantics, deliberately:
    first-fit would pack the budget tighter but threads sequential state
    through the scan; the prefix form is one window cumsum — distributed,
    deterministic, reproducible under corpus growth for the kept prefix's
    hash range, and exactly SQL-mirrorable. A row heavier than the whole
    budget blocks its suffix; callers who want it skipped should pre-filter
    ``weight_col <= budget``.

    Scale: one Exchange on ``group_col`` + one sort; hot groups are
    AQE-skew-splittable on the Exchange and the frame is add-only (no
    sliding rescan).
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    w = (
        Window.partitionBy(group_col)
        .orderBy(split_hash_col(id_col, seed).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(weight_col).cast("long")).over(w)
    return df.withColumn(out_col, cum <= F.lit(int(budget)))
