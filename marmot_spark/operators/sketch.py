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

import math

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


# ---------------------------------------------------------------------------
# HyperLogLog — bounded-state distinct counting (Flajolet et al. 2007).
# Same determinism discipline as the CMS: integer registers from fixed affine
# hashes, and the harmonic denominator kept as an EXACT BIGINT sum of
# 2^(32-rank) terms (associative — immune to float summation order), so the
# registers and the final quantized estimate are bit-identical across
# engines. The only float ops are single ln/division expressions over those
# exact integers — the module's established identical-across-engines class.

# Two multiply-mod-prime rounds with an xor-shift between them. A single
# affine map mod P31 is equidistributed but has NO avalanche — on structured
# inputs (sequential token ids) the leading-zero statistic deviates wildly
# from geometric and the estimate biases by >2x (measured). The xor-shift
# breaks the affine structure; accuracy on sequential ids is then within the
# standard 1.04/sqrt(m) band (measured: +8% at p=8, +1.3% at p=10).
_HLL_M1, _HLL_A1 = 1_000_003, 12_345       # bucket hash, round 1
_HLL_M1B, _HLL_A1B = 999_983, 67_891       # bucket hash, round 2
_HLL_M2, _HLL_A2 = 754_974_721, 104_729    # rank hash, round 1
_HLL_M2B, _HLL_A2B = 998_244_353, 7_919    # rank hash, round 2
_HLL_SHIFT = 15


def _hll_mix(t: Column, ma: int, aa: int, mb: int, ab: int) -> Column:
    """((t*ma+aa mod P) ^ (.. >> 15)) * mb + ab mod P — 31-bit mixed hash.
    All intermediates < 2^62 (31-bit value x 31-bit multiplier), overflow-safe."""
    u = F.pmod(t * F.lit(ma) + F.lit(aa), F.lit(P31))
    v = u.bitwiseXOR(F.shiftright(u, _HLL_SHIFT))
    return F.pmod(v * F.lit(mb) + F.lit(ab), F.lit(P31))


def _hll_mix_sql(t: str, ma: int, aa: int, mb: int, ab: int) -> str:
    u = f"(({t}) * {ma} + {aa}) % {P31}"
    return f"(xor({u}, ({u}) >> {_HLL_SHIFT}) * {mb} + {ab}) % {P31}"


def _hll_alpha(m: int) -> float:
    # the standard bias constant; exact python double, inlined as a literal
    # on BOTH engines so no cross-engine arithmetic is involved
    return 0.7213 / (1.0 + 1.079 / m)


def hll_bucket_rank_cols(col, p: int = 10) -> tuple[Column, Column]:
    """The (bucket, rank) expression pair the HLL registers aggregate over —
    exposed so composed queries can ride an existing exchange with the
    registers' max instead of paying a dedicated pass (same math,
    bit-identical registers)."""
    m = 1 << p
    t = F.pmod(col.cast("long"), F.lit(P31))
    h1 = _hll_mix(t, _HLL_M1, _HLL_A1, _HLL_M1B, _HLL_A1B)
    h2 = _hll_mix(t, _HLL_M2, _HLL_A2, _HLL_M2B, _HLL_A2B)
    rank = F.when(h2 == 0, F.lit(32)).otherwise(
        F.lit(31) - F.floor(F.log(h2.cast("double")) / F.lit(math.log(2.0)))
    )
    return h1 % F.lit(m), rank.cast("int")


def hll_registers(df: DataFrame, col, p: int = 10) -> DataFrame:
    """The 2^p HLL registers over ``col``'s values: (b, r) with r = max over
    values in bucket b of (leading zeros of the 31-bit rank hash) + 1.

    One narrow projection + one groupBy(b) max — map-side combined to
    <= 2^p groups per partition, so the exchange is KB-sized at any
    cardinality. floor(ln(h)/ln(2)) stands in for the bit-length (no clz in
    either SQL dialect); any power-of-two rounding quirk is IDENTICAL on
    both engines, which is all determinism needs.
    """
    b, r = hll_bucket_rank_cols(col, p)
    return (
        df.select(b.alias("b"), r.alias("r"))
        .groupBy("b")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(regs: DataFrame, p: int = 10) -> DataFrame:
    """1-row (hll_est BIGINT) from an ``hll_registers`` table: the standard
    HLL estimator with the small-range linear-counting correction. The
    harmonic denominator is the exact integer
    ``(m - n_present) * 2^32 + sum(2^(32-r))`` (absent registers hold rank
    0); every float op downstream is a single expression over exact
    integers, then round-half-up to BIGINT.
    """
    agg = regs.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - r)")).alias("sp"),
    )
    return agg.select(hll_estimate_expr(F.col("np"), F.col("sp"), p).alias("hll_est"))


def hll_estimate_expr(np_col: Column, sp_col: Column, p: int = 10) -> Column:
    """The estimator as a plain column over exact-integer (np, sp) — the
    register-present count and the harmonic 2^(32-r) sum — so a composed
    query that already aggregated registers inline can finish the estimate
    without a second registers pass. Identical math to ``hll_estimate``."""
    m = 1 << p
    alpha = _hll_alpha(m)
    s = (F.lit(m) - np_col).cast("long") * F.lit(4294967296) + sp_col
    zeros = (F.lit(m) - np_col).cast("long")
    raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) * F.lit(4294967296.0) / s.cast("double")
    est = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return F.floor(est + F.lit(0.5)).cast("long")


def hll_sql(expr_from: str, p: int = 10) -> str:
    """DuckDB mirror of hll_registers + hll_estimate over ``expr_from`` — a
    SQL fragment ``(SELECT v FROM ...)`` producing the value column ``v``.
    Returns a scalar subquery-able SELECT yielding hll_est."""
    m = 1 << p
    alpha = _hll_alpha(m)
    ln2 = repr(math.log(2.0))
    # every float literal is CAST(... AS DOUBLE): DuckDB parses bare decimal
    # literals as DECIMAL and the alpha*m*m*2^32 chain overflows DECIMAL(18)
    a = f"CAST({alpha!r} AS DOUBLE)"
    md = f"CAST({float(m)!r} AS DOUBLE)"
    return f"""
SELECT CAST(floor(CASE
    WHEN (({m} - np) > 0)
         AND ({a} * {md} * {md} * CAST(4294967296.0 AS DOUBLE)
              / CAST(({m} - np) * 4294967296 + sp AS DOUBLE)) <= CAST({2.5 * m!r} AS DOUBLE)
    THEN {md} * ln({md} / CAST({m} - np AS DOUBLE))
    ELSE {a} * {md} * {md} * CAST(4294967296.0 AS DOUBLE)
         / CAST(({m} - np) * 4294967296 + sp AS DOUBLE)
  END + 0.5) AS BIGINT) AS hll_est
FROM (
  SELECT count(*) AS np, sum(1::BIGINT << CAST(32 - r AS INT)) AS sp
  FROM (
    SELECT h1 % {m} AS b,
      max(CASE WHEN h2 = 0 THEN 32
               ELSE 31 - CAST(floor(ln(CAST(h2 AS DOUBLE)) / {ln2}) AS INT)
          END) AS r
    FROM (
      SELECT {_hll_mix_sql('t', _HLL_M1, _HLL_A1, _HLL_M1B, _HLL_A1B)} AS h1,
             {_hll_mix_sql('t', _HLL_M2, _HLL_A2, _HLL_M2B, _HLL_A2B)} AS h2
      FROM (SELECT (CAST(v AS BIGINT) % {P31} + {P31}) % {P31} AS t FROM {expr_from})
    )
    GROUP BY 1
  )
)
"""
