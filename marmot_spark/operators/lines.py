"""Cross-corpus boilerplate line removal (CCNet-style line dedup).

Web corpora repeat navigation/footer/header lines across thousands of pages
("subscribe to our newsletter", cookie banners). The standard fix — CCNet's
per-shard line dedup, kept by RefinedWeb and Dolma — drops every line whose
(normalized) form appears in at least ``min_docs`` DISTINCT documents, then
reassembles each document from its surviving lines in original order.

Scale shape (the plan, not an approximation of it):

* lines are exploded WITH their position from a narrow (id, text) projection
  — the corpus-wide exchange carries (id, pos, 64-bit line hash), never the
  wide document row;
* the boilerplate set is ``groupBy(line_hash).agg(countDistinct(id))`` —
  partial aggregation map-side, one shuffle keyed on the hash (uniform by
  construction), then a ``HAVING``-style filter;
* membership is a LEFT ANTI join of the line rows against that (small by
  construction: only lines repeated across >= min_docs docs survive the
  filter) set — declared as a plain join so AQE's runtime statistics pick a
  broadcast anti-join when the set is small and degrade to shuffle when an
  adversarial corpus makes it large, exactly the conditional-strategy
  posture used by the flagship join-back;
* reassembly is one groupBy(id) with an array_sort over (pos, line) structs
  — per-document state only, no global sort, no window over the corpus.

Normalization (trim + lowercase) applies to MATCHING only; surviving lines
are emitted verbatim. Hash note: matching is on ``xxhash64`` of the
normalized line — at 2^64 a collision needs ~10^10 distinct lines (a 100 TB
corpus holds ~10^9), and a collision's failure mode is dropping one
innocent line, not corrupting output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_docs: int = 3,
    normalize: bool = True,
    sep: str = "\n",
    out_col: str = "text_clean",
) -> DataFrame:
    """Return ``df`` plus ``out_col`` (the document rebuilt from lines that
    appear in fewer than ``min_docs`` distinct documents), ``n_lines`` and
    ``n_lines_kept``. Documents whose every line is boilerplate keep an
    empty-string ``out_col`` and ``n_lines_kept = 0``."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("__pos", "__line"),
    )
    norm = F.trim(F.lower(F.col("__line"))) if normalize else F.col("__line")
    lines = lines.withColumn("__h", F.xxhash64(norm))
    boiler = (
        lines.groupBy("__h")
        .agg(F.countDistinct("__id").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    kept = lines.join(boiler, "__h", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda x: x["__line"],
            ),
            sep,
        ).alias(out_col),
        F.count(F.lit(1)).cast("int").alias("n_lines_kept"),
    )
    return (
        df.withColumn("n_lines", F.size(F.split(F.col(text_col), sep, -1)))
        .join(rebuilt, F.col(id_col) == F.col("__id"), "left")
        .drop("__id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
        .withColumn("n_lines_kept", F.coalesce(F.col("n_lines_kept"), F.lit(0)))
    )
