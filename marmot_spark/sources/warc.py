"""WARC / WET web-archive source adapters — the ingestion path a web-scale
training-data pipeline starts from (Common-Crawl-shaped input).

No reference analogue (the reference toolkit reads line-per-sentence MT
corpora only — SURVEY.md §0/§2 S1–S3); this is part of the
training-data-pipeline surface the brief adds on top of reference parity.

Spark-first design: the text datasource's custom ``lineSep`` splits a WARC
file into one DataFrame row per record at the ``WARC/1.0`` version line —
a fully parallel, splittable columnar scan (no per-file driver loop, no
Python record iterator). Header and payload are then separated and parsed
with built-in SQL functions only (regexp over the header block), so the
whole reader is one whole-stage-codegen projection: zero Python, zero
shuffle, linear in bytes.

Format caveats, documented honestly:
- Record splitting trusts that the payload does not contain the literal
  record delimiter (``\\r\\n\\r\\nWARC/1.0\\r\\n``). Strictly, WARC framing is
  Content-Length-counted; for WET (plain-text conversion) records and for
  HTML response payloads the delimiter collision is not a practical hazard,
  and ``content_length`` is surfaced so callers can drop the rare
  truncated/overlong record (``payload_len_ok``).
- Per-record-gzipped ``.warc.gz`` (each record its own gzip member) is NOT
  supported — Spark's codec layer decompresses whole files, so point this
  reader at uncompressed/whole-file-gzipped archives (whole-file gzip reads
  fine but is non-splittable: one task per file, the standard Spark trade).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# A record begins "WARC/1.0\r\n"; records are separated by a blank line.
# Splitting on the version line keeps each row = one full record with its
# header block first.
_RECORD_SEP = "WARC/1.0\r\n"
_HEADER_END = "\r\n\r\n"


def _header(name: str) -> Column:
    """Extract a WARC header value from the record's header block (group 1).

    Header names are case-insensitive per the spec; values run to CRLF.
    """
    return F.nullif(
        F.regexp_extract(F.col("__head"), rf"(?im)^{name}:\s*([^\r\n]*)", 1),
        F.lit(""),
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive(s) -> one row per record.

    Columns: ``record_id`` (WARC-Record-ID), ``warc_type`` (request /
    response / conversion / warcinfo / ...), ``target_uri``, ``date``,
    ``content_type``, ``content_length`` (declared), ``payload`` (string,
    as framed), ``payload_len_ok`` (declared length == framed length after
    trailing record-separator CRLFs are stripped).

    One codegen projection over a parallel text scan; every column derives
    from the record string. Multi-terabyte archives scan with one task per
    split (uncompressed) or per file (gzip) — no driver involvement.
    """
    raw = (
        spark.read.option("lineSep", _RECORD_SEP)
        .text(path)
        .filter(F.length(F.trim("value")) > 0)
    )
    # Header block = everything before the first blank line; payload = rest.
    split_at = F.instr(F.col("value"), _HEADER_END)
    rec = raw.select(
        F.substring(F.col("value"), F.lit(1), split_at - 1).alias("__head"),
        F.when(split_at > 0, F.expr(f"substring(value, instr(value, '{_HEADER_END}') + 4)"))
        .otherwise(F.lit(""))
        .alias("__body"),
    )
    # Record framing is payload + CRLF CRLF before the next version line;
    # strip exactly that boundary (a payload's own trailing CRLF is part of
    # its declared Content-Length and must survive).
    payload = F.regexp_replace(F.col("__body"), r"\r\n\r\n$", "")
    return rec.select(
        _header("WARC-Record-ID").alias("record_id"),
        _header("WARC-Type").alias("warc_type"),
        _header("WARC-Target-URI").alias("target_uri"),
        _header("WARC-Date").alias("date"),
        _header("Content-Type").alias("content_type"),
        _header("Content-Length").cast("long").alias("content_length"),
        payload.alias("payload"),
    ).withColumn(
        "payload_len_ok",
        F.col("content_length").isNotNull()
        & (F.length("payload") == F.col("content_length")),
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET (extracted-text) archive(s) -> documents-shaped frame.

    Keeps ``conversion`` records only (WET's text payloads), shaped like the
    ``documents`` table: (doc_id = record id, url, lang = null — feed
    ``functions.text.lang_id`` downstream —, text, n_chars).
    """
    recs = read_warc(spark, path)
    return recs.filter(F.col("warc_type") == "conversion").select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("payload").alias("text"),
        F.length("payload").cast("int").alias("n_chars"),
    )


def html_to_text(col: Column) -> Column:
    """HTML -> visible text, as one chain of built-in regexp/replace ops
    (whole-stage codegen; no Python, no external parser).

    Pipeline (the CCNet/WET-style extraction, simplified): drop
    script/style/comment blocks, break block-level tags to newlines, strip
    remaining tags, decode the common entities, collapse horizontal
    whitespace, trim per line. Regexes are RE2-safe (no backtracking
    constructs) so an identical chain runs in DuckDB for oracle pairing.

    A real-world extractor adds DOM heuristics (boilerplate removal is
    ``functions.redact.strip_boilerplate``'s job, applied per-line AFTER
    this) — this is the scale-path text reduction, not a browser.
    """
    t = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\b[^>]*>", "\n"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in [
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
    ]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def extract_documents(warc: DataFrame) -> DataFrame:
    """response-record HTML -> documents-shaped text frame.

    (doc_id, url, text = html_to_text(payload), n_chars). Composes with the
    curation surface: lang_id / quality_filter / dedup all take this frame.
    """
    html = warc.filter(
        (F.col("warc_type") == "response")
        & F.col("content_type").rlike("(?i)text/html|application/http")
    )
    # An application/http response payload carries HTTP headers before the
    # HTML body; strip them the same way WARC headers were stripped.
    body = F.when(
        F.col("content_type").rlike("(?i)application/http")
        & (F.instr("payload", _HEADER_END) > 0),
        F.expr(f"substring(payload, instr(payload, '{_HEADER_END}') + 4)"),
    ).otherwise(F.col("payload"))
    return html.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        html_to_text(body).alias("text"),
    ).withColumn("n_chars", F.length("text").cast("int"))
