"""Text-analysis functions for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All are pure Column expressions (JVM-side, whole-stage codegen — no UDFs), and
each has an exactly-equivalent ANSI-SQL formulation used as the DuckDB oracle
(see __spark_entry__.py), so correctness is cross-checked engine-vs-engine.

The functions operate on a raw ``text`` column (documents table) and/or the
engine's canonical ``tokens: array<int>`` payload.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny embedded marker-word sets for the n-gram/stopword language heuristic;
# deterministic and mirrored verbatim in the oracle SQL
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "zh": ("shi", "de", "le", "wo", "ni"),
}

STOPWORDS: tuple[str, ...] = ("the", "and", "of", "to", "in", "a", "is", "it", "on", "for")

FP_MULT = 2_654_435_761  # Knuth multiplicative-hash constant
FP_MOD = 2_147_483_647  # Mersenne prime 2^31-1


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def token_count_cols(text_col: str = "text") -> dict[str, Column]:
    """Whitespace token count + regex token count (BPE-ish alpha/num runs)."""
    t = F.col(text_col)
    return {
        "n_tok_ws": F.size(F.split(t, " ")).cast("int"),
        "n_alpha_runs": F.size(F.regexp_extract_all(t, F.lit("[A-Za-z]+"), F.lit(0))).cast("int"),
        "n_num_runs": F.size(F.regexp_extract_all(t, F.lit("[0-9]+"), F.lit(0))).cast("int"),
    }


def quality_cols(text_col: str = "text") -> dict[str, Column]:
    """Length / punctuation / stopword-ratio quality signals (exact-rational forms)."""
    t = F.col(text_col)
    toks = F.split(t, " ")
    n_tok = F.size(toks)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, "[.,;:!?]", ""))
    n_stop = _count_in(toks, STOPWORDS)
    return {
        "n_chars_obs": n_chars.cast("int"),
        "n_punct": n_punct.cast("int"),
        "n_stop": n_stop.cast("int"),
        # ratios kept as exact scaled integers (x1e6, floor) so the DuckDB
        # oracle hash-matches without float-rounding hazards
        "stop_ratio_ppm": F.floor(n_stop * F.lit(1_000_000) / n_tok).cast("long"),
        "punct_ratio_ppm": F.floor(n_punct * F.lit(1_000_000) / F.greatest(n_chars, F.lit(1))).cast("long"),
    }


def lang_id_col(text_col: str = "text") -> Column:
    """Marker-word language-ID heuristic with deterministic tie-break (en>es>zh)."""
    toks = F.split(F.col(text_col), " ")
    h_en = _count_in(toks, LANG_MARKERS["en"])
    h_es = _count_in(toks, LANG_MARKERS["es"])
    h_zh = _count_in(toks, LANG_MARKERS["zh"])
    return (
        F.when((h_en >= h_es) & (h_en >= h_zh), F.lit("en"))
        .when(h_es >= h_zh, F.lit("es"))
        .otherwise(F.lit("zh"))
    )


def repetition_cols(text_col: str = "text") -> dict[str, Column]:
    """Gopher-style repetition signals: the fraction of duplicate word
    n-grams in a document (highly repetitive docs — boilerplate, generated
    spam — score high and get filtered before training).

    dup_ngram_ppm = (n_ngrams - n_distinct_ngrams) / n_ngrams, scaled 1e6
    floor (exact-rational, oracle-hashable); docs too short for the n-gram
    order get 0. Pure Column expressions over the split array — JVM-side,
    no shuffle, codegen-fused with the rest of the quality projection.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)

    def dup_ppm(k: int) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), n - k),
            # join with a space (cannot appear inside a token, which came
            # from splitting on spaces) so ['ab','c'] and ['a','bc'] stay
            # distinct grams; mirrored exactly by _rep_sql in the oracle
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
        n_g = F.size(grams)
        n_d = F.size(F.array_distinct(grams))
        return F.when(
            n >= k, F.floor((n_g - n_d) * F.lit(1_000_000) / n_g)
        ).otherwise(F.lit(0)).cast("long")

    return {"dup_2gram_ppm": dup_ppm(2), "dup_3gram_ppm": dup_ppm(3)}


def doc_fingerprint_col(tokens_col: str = "tokens") -> Column:
    """Order-sensitive rolling fingerprint over int token ids.

    fp = sum_pos (tok[pos]+1) * (((pos+1)*FP_MULT) mod FP_MOD), exact int64
    (bounded: 513 * 2^31 * n_tok < 2^63 for n_tok <= 512).
    """
    toks = F.col(tokens_col)
    terms = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: (F.get(toks, i).cast("long") + 1) * (((i.cast("long") + 1) * F.lit(FP_MULT)) % F.lit(FP_MOD)),
    )
    return F.when(F.size(toks) > 0, F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x)).otherwise(
        F.lit(0).cast("long")
    )


def normalized_text_col(text_col: str = "text") -> Column:
    """Dedup normalization (the RefinedWeb/Falcon "exact dedup on normalized
    text" recipe): lowercase, collapse every non-alphanumeric run to one
    space, trim. Hashing THIS instead of the raw text catches re-encoded
    copies (case changes, punctuation variants, whitespace reflows) that
    byte-exact dedup misses, at zero distribution cost — one codegen
    projection feeding the same groupBy(md5) word-count shape.

    Patterns stay in the Java/RE2 common subset (same discipline as
    redact.py) so a SQL oracle mirrors them verbatim.
    """
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, "[^a-z0-9]+", " ")
    return F.trim(t)
