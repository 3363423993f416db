"""PII redaction + cross-corpus boilerplate line removal.

Differential strategy mirrors the rest of the suite: a pure-Python reference
(``re`` module / dict counting) recomputes every output on crafted fixtures,
and the plan is audited for the declared scale shape.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from marmot_spark.functions.redact import (
    PII_PATTERNS,
    pii_count_cols,
    redact_pii_col,
)
from marmot_spark.operators.lines import strip_boilerplate_lines

PII_ROWS = [
    (1, "mail me at a.b+x@foo.co.uk or 10.0.0.1 tel 555-123-4567 end"),
    (2, "no pii here just words"),
    (3, "two mails x@y.io z@q.com plus 192.168.0.255 and 1.2.3.4"),
    (4, "not-an-ip 1234.5.6.7 half 1.2.3 phone 55-123-4567 nope"),
    (5, "dots a.b.c.d words 999.999.999.999 edge 555 123 4567"),
    (6, "adjacent x@y.io10.0.0.1"),  # email eats the run, boundary decides the rest
    (7, ""),
]


def _py_redact(text: str) -> tuple[dict[str, int], str]:
    counts = {}
    for name, pat, _ in PII_PATTERNS:
        counts[f"n_{name}"] = len(re.findall(pat, text))
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = re.sub(pat, repl, red)
    return counts, red


def test_pii_redaction_matches_python_reference(spark):
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(k) for k, c in pii_count_cols().items()],
            redact_pii_col().alias("red"),
        ).collect()
    }
    for i, text in PII_ROWS:
        counts, red = _py_redact(text)
        for k, v in counts.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
        assert got[i]["red"] == red, (i, got[i]["red"], red)


def test_pii_redaction_is_single_projection(spark):
    """The whole pass must stay one codegen projection over the scan: no
    exchange, no Python boundary."""
    df = spark.createDataFrame(PII_ROWS, ["id", "text"])
    plan = (
        df.select("id", redact_pii_col().alias("r"), *pii_count_cols().values())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


BOILER_DOCS = [
    (1, "subscribe now\nreal content one\nfooter 1"),
    (2, "subscribe now\nreal content two\nfooter 2"),
    (3, "SUBSCRIBE NOW \nreal content three\nfooter 3"),
    (4, "subscribe now\nsubscribe now\nunique line"),  # dup within one doc
    (5, "all\nunique\nhere"),
    (6, "subscribe now"),  # whole doc is boilerplate
]


def _py_strip(docs, min_docs=3):
    from collections import defaultdict

    seen = defaultdict(set)
    for i, t in docs:
        for line in t.split("\n"):
            seen[line.strip().lower()].add(i)
    boiler = {k for k, v in seen.items() if len(v) >= min_docs}
    out = {}
    for i, t in docs:
        lines = t.split("\n")
        kept = [l for l in lines if l.strip().lower() not in boiler]
        out[i] = (len(lines), len(kept), "\n".join(kept))
    return out


def test_boilerplate_lines_match_python_reference(spark):
    df = spark.createDataFrame(BOILER_DOCS, ["id", "text"])
    got = {
        r["id"]: r
        for r in strip_boilerplate_lines(df, "id", "text", min_docs=3).collect()
    }
    exp = _py_strip(BOILER_DOCS)
    assert set(got) == set(exp)  # left join keeps all-boilerplate docs
    for i, (n, nk, clean) in exp.items():
        assert got[i]["n_lines"] == n
        assert got[i]["n_lines_kept"] == nk
        assert got[i]["text_clean"] == clean


def test_boilerplate_counts_distinct_docs_not_occurrences(spark):
    """A line repeated many times inside ONE doc must not become boilerplate."""
    docs = [(1, "spam\nspam\nspam\nspam\nreal"), (2, "other\ntext")]
    df = spark.createDataFrame(docs, ["id", "text"])
    got = {r["id"]: r for r in strip_boilerplate_lines(df, "id", "text", min_docs=2).collect()}
    assert got[1]["text_clean"] == "spam\nspam\nspam\nspam\nreal"
    assert got[2]["n_lines_kept"] == 2


def test_boilerplate_normalization_off(spark):
    docs = [(1, "Header\na"), (2, "header\nb"), (3, "HEADER\nc")]
    df = spark.createDataFrame(docs, ["id", "text"])
    got = {r["id"]: r for r in strip_boilerplate_lines(
        df, "id", "text", min_docs=3, normalize=False).collect()}
    # case-distinct lines are NOT merged without normalization
    assert all(got[i]["n_lines_kept"] == 2 for i in (1, 2, 3))


def test_boilerplate_plan_shape(spark):
    """Anti-join + two keyed exchanges; never an Exchange SinglePartition and
    never a Python boundary."""
    df = spark.createDataFrame(BOILER_DOCS, ["id", "text"])
    plan = (
        strip_boilerplate_lines(df, "id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "SinglePartition" not in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan


def test_boilerplate_min_docs_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "text"])
    import pytest as _pt

    with _pt.raises(ValueError):
        strip_boilerplate_lines(df, "id", "text", min_docs=1)
