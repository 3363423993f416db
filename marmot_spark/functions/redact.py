"""PII redaction as pure codegen column expressions.

The standard web-corpus privacy pass (CCNet / RefinedWeb / Dolma all ship
one): replace emails, IPv4 addresses and phone-shaped numbers with typed
placeholder tokens, and count what was hit, in ONE whole-stage-codegen
projection over the scan — no shuffle, no Python, no UDF. At 100 TB this is
the cheapest possible plan: the pass rides the same scan as the rest of the
quality projection (see ``functions/text.py``).

Pattern-dialect contract: every regex below is written in the common subset
of Java ``java.util.regex`` (Spark) and RE2 (DuckDB oracle) — character
classes, bounded quantifiers, ``\\b`` / ``\\d`` only; no alternation, no
backreferences, no lookaround — so the two engines match byte-identically
and the driver's value-hash comparison is exact. Replacement order is part
of the contract (emails first: their domain part may contain digit runs the
later patterns would otherwise bite into); placeholders contain no digits or
``@``, so a replacement can never re-trigger a later pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, regex, placeholder) — order matters and is mirrored in oracle SQL.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
)


def pii_count_cols(text_col: str = "text") -> dict[str, Column]:
    """Per-pattern match counts (``n_email``, ``n_ipv4``, ``n_phone``) on the
    ORIGINAL text. Counts are taken before any replacement so they are
    independent of redaction order."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii_col(text_col: str = "text") -> Column:
    """The text with every PII pattern replaced by its placeholder, applied
    in ``PII_PATTERNS`` order."""
    c = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_oracle_sql(text_expr: str) -> dict[str, str]:
    """The DuckDB-equivalent SQL snippets for the same pass: per-pattern
    count expressions and the chained redaction expression over
    ``text_expr``. DuckDB's ``regexp_replace`` is first-match-only by
    default — the ``'g'`` flag makes it match Spark's replace-all."""
    counts = {
        f"n_{name}": f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS INT)"
        for name, pat, _ in PII_PATTERNS
    }
    red = text_expr
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return {**counts, "text_redacted": red}
