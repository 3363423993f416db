"""Count-min sketch + heavy hitters — bounded-state frequency estimation
(Cormode & Muthukrishnan 2005, "An improved data stream summary: the
count-min sketch and its applications").

Why a sketch in a batch engine: at 10^12 tokens the exact vocabulary
aggregate is a 10^7–10^8-group shuffle. The CMS answers "which tokens occur
>= T times" with d x w integers of state (d rows of w counters) — the sketch
aggregation map-side combines into <= d*w groups per partition, so the
exchange is a few KB regardless of corpus size, and the only vocabulary-sized
work left is an EXACT count over the candidate tokens the sketch admits
(<= N/T of them by the CMS over-estimate guarantee: est >= true count
always, so no true heavy hitter is ever missed — the same
no-false-negatives prefilter contract as the dedup bloom filter).

Everything is deterministic (fixed per-row hash constants, integer-only
arithmetic), so a SQL oracle computes the bit-identical sketch — estimates
are exactly comparable across engines, not just approximately.

Hash domain safety (the dedup-bloom ADVICE lesson): token ids are first
reduced ``pmod(tok, P31)`` so the per-row affine hash multiplies two values
< 2^31 — no int64 overflow wrap for any int64 token id, and pmod keeps every
intermediate non-negative on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P31 = 2_147_483_647

# per-sketch-row affine hash constants (primes; literal so SQL oracles can
# interpolate them). d <= len(_CMS_MULTS).
_CMS_MULTS = (1_000_003, 999_983, 1_000_033, 1_000_037, 1_000_039, 1_000_081)
_CMS_ADDS = (12_345, 67_891, 24_680, 13_579, 86_420, 97_531)


def cms_bucket(tok, j: int, w: int) -> Column:
    """Row-``j`` bucket of a token id: ``((pmod(tok,P)*M_j + A_j) mod P) mod w``.
    Integer-only, overflow-safe for any int64 input, identical in SQL."""
    t = F.pmod(tok.cast("long"), F.lit(P31))
    return F.pmod(t * F.lit(_CMS_MULTS[j]) + F.lit(_CMS_ADDS[j]), F.lit(P31)) % F.lit(w)


def cms_bucket_sql(expr: str, j: int, w: int) -> str:
    """The DuckDB mirror of ``cms_bucket`` over SQL expression ``expr``."""
    return (
        f"(((CAST({expr} AS BIGINT) % {P31} + {P31}) % {P31}) * {_CMS_MULTS[j]}"
        f" + {_CMS_ADDS[j]}) % {P31} % {w}"
    )


def count_min_sketch(
    df: DataFrame, tokens_col: str = "tokens", d: int = 4, w: int = 1024
) -> DataFrame:
    """Build the d x w sketch over every token occurrence.

    Returns (j, b, cnt) with at most d*w rows. Plan: ONE narrow explode of
    (d-array of buckets) per token — posexplode carries the row index j —
    then a single groupBy(j, b) whose partial aggregation collapses each
    partition to <= d*w groups before the (tiny) exchange. No driver work.
    """
    if d > len(_CMS_MULTS):
        raise ValueError(f"d={d} exceeds the {len(_CMS_MULTS)} pinned hash rows")
    tok = F.col("__tok")
    buckets = F.array(*[cms_bucket(tok, j, w) for j in range(d)])
    return (
        df.select(F.explode(tokens_col).alias("__tok"))
        .select(F.posexplode(buckets).alias("j", "b"))
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, tok, d: int = 4, w: int = 1024) -> Column:
    """Whole-stage-codegen estimate column: min over the d sketch rows of the
    token's bucket counters.

    The sketch is collected ONCE into a flat d*w literal array (bounded by
    construction — the sanctioned plan-metadata collect class, <= a few
    thousand BIGINTs) so per-token lookup is pure codegen arithmetic:
    no join, no shuffle, applicable inside any projection.
    """
    flat = [0] * (d * w)
    for r in sketch.collect():
        flat[r["j"] * w + r["b"]] = r["cnt"]
    arr = F.lit(flat)
    return F.least(
        *[
            F.element_at(arr, (F.lit(j * w) + cms_bucket(tok, j, w) + 1).cast("int"))
            for j in range(d)
        ]
    )


def heavy_hitters(
    df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 100,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """EXACT heavy hitters with sketch-bounded state: tokens occurring
    >= ``min_count`` times, with their exact counts.

    Two passes over the token stream, neither shuffling the vocabulary:
    (1) the d*w sketch; (2) a codegen filter keeping only occurrences whose
    sketch estimate reaches ``min_count`` (est >= truth, so every true heavy
    hitter survives; at most N/min_count distinct tokens do), then an exact
    groupBy over that small candidate stream and the final exact-count
    filter that discards the sketch's false positives.

    Returns (tok, cnt, est) — cnt exact, est the CMS over-estimate.
    """
    sk = count_min_sketch(df, tokens_col, d, w)
    ex = df.select(F.explode(tokens_col).alias("tok"))
    est = cms_estimate(sk, F.col("tok"), d, w)
    return (
        ex.withColumn("est", est)
        .filter(F.col("est") >= F.lit(min_count))
        .groupBy("tok", "est")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(min_count))
        .select("tok", F.col("cnt").cast("long").alias("cnt"), F.col("est").cast("long").alias("est"))
    )
