"""Corpus source adapters (SURVEY.md S1-S4).

Reference semantics re-expressed: marmot reads pre-tokenized line-per-sentence
text files with parallel target/source/tags files (marmot/util/
simple_corpus.py :: SimpleCorpus [R — SURVEY.md §0]), WMT tab-separated
word-level files (marmot/representations/wmt_representation_generator.py [R]),
and Pharaoh-format 'i-j' alignment lines (marmot/util/alignments.py [R]).

Each adapter returns a DataFrame with a declared schema — the engine is
fixed-schema at every boundary (the reference is duck-typed dicts). Line
number = sentence id, recovered via a zero-shuffle monotonic id within a
single file read (files are line-split by Spark; for multi-file corpora pass
an explicit id column instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_token_corpus(spark: SparkSession, path: str, id_prefix: str = "s") -> DataFrame:
    """Line-per-sentence whitespace-tokenized text -> (doc_id, tokens array<string>, n_tok)."""
    df = spark.read.text(path).withColumn("__line", F.monotonically_increasing_id())
    return df.select(
        F.format_string(f"{id_prefix}%08d", F.col("__line")).alias("doc_id"),
        F.split(F.col("value"), r"\s+").alias("tokens"),
    ).withColumn("n_tok", F.size("tokens").cast("int"))


def read_wmt_tsv(spark: SparkSession, path: str) -> DataFrame:
    """WMT word-level TSV (sent_id, tok_idx, token, tag) -> per-sentence arrays.

    Collapses the per-token rows back to (doc_id, tokens, tags) with
    position-ordered arrays (sort inside the group via array_sort on struct).
    """
    raw = spark.read.csv(path, sep="\t", schema="sent_id long, tok_idx int, token string, tag string")
    return (
        raw.groupBy("sent_id")
        .agg(F.array_sort(F.collect_list(F.struct("tok_idx", "token", "tag"))).alias("s"))
        .select(
            F.format_string("s%08d", F.col("sent_id")).alias("doc_id"),
            F.transform("s", lambda x: x["token"]).alias("tokens"),
            F.transform("s", lambda x: x["tag"]).alias("tags"),
        )
    )


def read_alignment_file(spark: SparkSession, path: str, id_prefix: str = "s") -> DataFrame:
    """Pharaoh 'i-j i-j ...' lines -> (doc_id, align array<array<int>>).

    align[t] = sorted source indices aligned to target index t. Target
    positions never mentioned get an empty array only up to the max seen
    index (callers pad against n_tok).
    """
    df = spark.read.text(path).withColumn("__line", F.monotonically_increasing_id())
    pairs = df.select(
        "__line",
        F.transform(
            F.split(F.trim("value"), r"\s+"),
            lambda p: F.struct(
                F.split(p, "-")[0].cast("int").alias("t"),
                F.split(p, "-")[1].cast("int").alias("s"),
            ),
        ).alias("ps"),
    )
    exploded = pairs.select("__line", F.explode("ps").alias("p")).select(
        "__line", F.col("p.t").alias("t"), F.col("p.s").alias("s")
    )
    per_t = exploded.groupBy("__line", "t").agg(F.array_sort(F.collect_list("s")).alias("srcs"))
    per_line = per_t.groupBy("__line").agg(
        F.map_from_arrays(F.collect_list("t"), F.collect_list("srcs")).alias("m"),
        F.max("t").alias("max_t"),
    )
    return per_line.select(
        F.format_string(f"{id_prefix}%08d", F.col("__line")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.col("max_t")),
            lambda t: F.coalesce(F.element_at(F.col("m"), t), F.array().cast("array<int>")),
        ).alias("align"),
    )


def read_conll_tagged(spark: SparkSession, path: str, id_prefix: str = "s") -> DataFrame:
    """CoNLL-style tagged corpus (S-item extension): one token per line with
    tab-separated columns ``token<TAB>pos<TAB>label``, sentences separated by
    blank lines -> (doc_id, tokens, pos_tags, labels, n_tok).

    Sentence recovery is a running count of blank separators PER FILE:
    sentence id = number of blank lines at-or-before the row within its
    file, via a window partitioned by ``input_file_name()`` and ordered by
    the file's line ids. Sentence boundaries are a strictly sequential
    property of one file's line order, so the file is the natural parallel
    unit — a multi-file corpus recovers every file concurrently, and NO
    Exchange SinglePartition appears (the former unpartitioned window
    funneled the whole corpus through one task and carried the registry's
    only plan-audit exemption). ``doc_id`` output is identical for
    single-file inputs; sentence numbering restarts per file, so multi-file
    callers disambiguate with a distinct ``id_prefix`` per read (or read
    files separately), as before.
    """
    from pyspark.sql import Window

    raw = spark.read.text(path).select(
        F.input_file_name().alias("__file"),
        F.col("value"),
        F.monotonically_increasing_id().alias("__line"),
    )
    w = Window.partitionBy("__file").orderBy("__line").rowsBetween(Window.unboundedPreceding, 0)
    marked = raw.select(
        "__file",
        "__line",
        F.col("value"),
        F.sum((F.trim("value") == "").cast("int")).over(w).alias("__sent"),
    ).filter(F.trim("value") != "")
    cols = F.split(F.col("value"), "\t")
    return (
        marked.select(
            "__file", "__sent", "__line",
            cols.getItem(0).alias("token"),
            cols.getItem(1).alias("pos"),
            cols.getItem(2).alias("label"),
        )
        .groupBy("__file", "__sent")
        .agg(F.array_sort(F.collect_list(F.struct("__line", "token", "pos", "label"))).alias("s"))
        .select(
            F.format_string(f"{id_prefix}%08d", F.col("__sent")).alias("doc_id"),
            F.transform("s", lambda x: x["token"]).alias("tokens"),
            F.transform("s", lambda x: x["pos"]).alias("pos_tags"),
            F.transform("s", lambda x: x["label"]).alias("labels"),
        )
        .withColumn("n_tok", F.size("tokens").cast("int"))
    )
