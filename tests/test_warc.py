"""WARC/WET source reader + HTML text extraction (sources/warc.py).

Evidence model: like the other single-format source adapters (S1–S3,
SURVEY.md §2), these are pytest-evidenced against an independent Python
reference parser over a deterministically synthesized archive — no DuckDB
query exists because the input is a bespoke file format, not a registered
parquet table.
"""

from __future__ import annotations

import re

import pytest

from marmot_spark.sources.warc import extract_documents, html_to_text, read_warc, read_wet
from pyspark.sql import functions as F

CRLF = "\r\n"


def _record(warc_type: str, rec_id: str, uri: str | None, ctype: str, payload: str) -> str:
    headers = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{rec_id}>",
        "WARC-Date: 2026-01-02T03:04:05Z",
    ]
    if uri is not None:
        headers.append(f"WARC-Target-URI: {uri}")
    headers += [f"Content-Type: {ctype}", f"Content-Length: {len(payload.encode('utf-8'))}"]
    return CRLF.join(headers) + CRLF + CRLF + payload + CRLF + CRLF


HTML_A = (
    "<html><head><title>T</title><style>p {color: red}</style></head>"
    "<body><h1>Header One</h1><!-- hidden comment -->"
    "<p>First &amp; second &lt;para&gt;.</p>"
    "<script>var x = '<p>not text</p>';</script>"
    "<div>Block two&nbsp;here</div>\n<ul><li>item 1</li><li>item 2</li></ul>"
    "</body></html>"
)
HTML_B = "<p>Short &quot;page&quot; b</p>"
HTTP_RESP = (
    "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html" + CRLF + CRLF + HTML_B
)


def _archive() -> str:
    return "".join(
        [
            _record("warcinfo", "info-1", None, "application/warc-fields", "software: test" + CRLF),
            _record("request", "req-1", "http://a.example/x", "application/http;msgtype=request", "GET /x HTTP/1.1"),
            _record("response", "resp-1", "http://a.example/x", "text/html", HTML_A),
            _record("response", "resp-2", "http://b.example/y", "application/http;msgtype=response", HTTP_RESP),
            _record("conversion", "conv-1", "http://a.example/x", "text/plain", "Plain extracted text.\nTwo lines."),
        ]
    )


def _py_reference_records(blob: str) -> list[dict]:
    """Independent reference parse: spec-style split on the version line."""
    out = []
    for chunk in blob.split("WARC/1.0" + CRLF):
        if not chunk.strip():
            continue
        head, _, body = chunk.partition(CRLF + CRLF)
        hdrs = {}
        for line in head.split(CRLF):
            k, _, v = line.partition(":")
            if v:
                hdrs[k.strip().lower()] = v.strip()
        out.append({"h": hdrs, "payload": re.sub(r"\r\n\r\n$", "", body)})
    return out


@pytest.fixture(scope="module")
def warc_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    # Two files so the reader demonstrably parallelizes across files.
    (d / "part0.warc").write_text(_archive(), newline="")
    (d / "part1.warc").write_text(
        _record("conversion", "conv-2", "http://c.example/z", "text/plain", "Second file text."),
        newline="",
    )
    return str(d)


def test_read_warc_matches_reference_parse(spark, warc_path):
    got = {r["record_id"]: r.asDict() for r in read_warc(spark, warc_path).collect()}
    ref = _py_reference_records(_archive())
    ref += _py_reference_records(
        _record("conversion", "conv-2", "http://c.example/z", "text/plain", "Second file text.")
    )
    assert len(got) == len(ref) == 6
    for r in ref:
        rid = r["h"]["warc-record-id"]
        row = got[rid]
        assert row["warc_type"] == r["h"]["warc-type"]
        assert row["target_uri"] == r["h"].get("warc-target-uri")
        assert row["content_type"] == r["h"]["content-type"]
        assert row["payload"] == r["payload"]
        assert row["content_length"] == int(r["h"]["content-length"])
        assert row["payload_len_ok"] is True


def test_read_wet_documents_shape(spark, warc_path):
    rows = {r["doc_id"]: r for r in read_wet(spark, warc_path).collect()}
    assert set(rows) == {"<urn:uuid:conv-1>", "<urn:uuid:conv-2>"}
    r = rows["<urn:uuid:conv-1>"]
    assert r["url"] == "http://a.example/x"
    assert r["text"] == "Plain extracted text.\nTwo lines."
    assert r["n_chars"] == len(r["text"])


def test_html_to_text_extraction(spark, warc_path):
    docs = {r["doc_id"]: r for r in extract_documents(read_warc(spark, warc_path)).collect()}
    assert set(docs) == {"<urn:uuid:resp-1>", "<urn:uuid:resp-2>"}
    text_a = docs["<urn:uuid:resp-1>"]["text"]
    # Script/style/comment bodies gone; entities decoded; blocks newline-split.
    assert "color" not in text_a and "not text" not in text_a and "hidden" not in text_a
    assert "First & second <para>." in text_a
    assert "Header One" in text_a and "Block two here" in text_a
    assert "item 1\nitem 2" in text_a
    # application/http payload: HTTP headers stripped before extraction.
    assert docs["<urn:uuid:resp-2>"]["text"] == 'Short "page" b'


def test_html_to_text_python_parity(spark):
    """Same regex chain in Python `re` — pins the chain's semantics so a
    Spark regex-dialect surprise cannot pass silently."""

    def py_html_to_text(s: str) -> str:
        t = re.sub(r"(?is)<script\b[^>]*>.*?</script>", " ", s)
        t = re.sub(r"(?is)<style\b[^>]*>.*?</style>", " ", t)
        t = re.sub(r"(?s)<!--.*?-->", " ", t)
        t = re.sub(r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\b[^>]*>", "\n", t)
        t = re.sub(r"(?s)<[^>]*>", " ", t)
        for ent, ch in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
            t = t.replace(ent, ch)
        t = re.sub(r"[ \t\x0b\f\r]+", " ", t)
        t = re.sub(r" ?\n ?", "\n", t)
        t = re.sub(r"\n{2,}", "\n", t)
        return re.sub(r"^\s+|\s+$", "", t)

    samples = [HTML_A, HTML_B, "", "no tags at all", "<br><br><br>x<BR>y",
               "a &amp;&amp; b < c", "<table><tr><td>1</td><td>2</td></tr></table>"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, html string")
    got = {r["i"]: r["t"] for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()}
    for i, s in enumerate(samples):
        assert got[i] == py_html_to_text(s), f"sample {i}"


def test_warc_reader_plan_is_scan_projection(spark, warc_path):
    """Reader stays a parallel scan + one projection: no exchange, no Python."""
    plan = read_warc(spark, warc_path)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_warc_to_curated_corpus_end_to_end(spark, tmp_path):
    """The full web-pipeline composition a real user runs: raw WARC archive
    -> extract_documents (HTML -> text) -> quality/lang columns -> exact
    dedup -> curated corpus. Certifies the module boundaries compose (schema
    and semantics), with an exact expected-survivor check: duplicate pages
    under different URLs collapse to one; the junk page drops on quality."""
    from marmot_spark.functions.text import lang_id_col, quality_cols
    from marmot_spark.operators.dedup import exact_dedup

    page = (
        "<html><body><h1>Title {i}</h1>"
        "<p>the quick brown fox and the lazy dog of page {i} went to the market "
        "and it was a fine day for all of them there</p></body></html>"
    )
    recs = []
    for i in range(20):
        recs.append(_record("response", f"p{i}", f"http://site{i}.ex/a", "text/html", page.format(i=i)))
    # three byte-identical reposts of page 3 under new URLs -> dedup fodder
    for j in range(3):
        recs.append(_record("response", f"dup{j}", f"http://mirror{j}.ex/b", "text/html", page.format(i=3)))
    # one junk page: punctuation soup -> quality drop
    recs.append(_record("response", "junk", "http://spam.ex/c", "text/html",
                        "<html><body><p>!!! ??? *** $$$ %%% ### @@@ &&&</p></body></html>"))
    arc = tmp_path / "crawl.warc"
    arc.write_text("".join(recs), newline="")

    docs = extract_documents(read_warc(spark, str(arc)))
    q = quality_cols("text")
    scored = docs.select(
        "doc_id", "url", "text",
        lang_id_col("text").alias("pred_lang"),
        q["punct_ratio_ppm"].alias("punct_ppm"),
    ).filter(F.col("punct_ppm") <= 100_000)
    groups = exact_dedup(scored, content_col="text", id_col="doc_id")
    kept = scored.join(groups.select(F.col("survivor_id").alias("doc_id")), "doc_id")
    rows = kept.collect()
    ids = {r["doc_id"] for r in rows}
    assert "<urn:uuid:junk>" not in ids  # quality gate
    # 20 distinct pages survive; the 3 mirrors of page 3 collapse into its group
    assert len(rows) == 20
    dup_group = [r for r in rows if "page 3 " in r["text"]]
    assert len(dup_group) == 1
    assert all(r["pred_lang"] == "en" for r in rows)
