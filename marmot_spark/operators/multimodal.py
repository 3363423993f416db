"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with a typed metadata struct.
The Spark-side plumbing — schema, partition sizing, Arrow batch shape,
mapInPandas UDF signature — is real and tested; the actual codec decode is
STUBBED (the image/audio libraries are not in this container): the default
``decoder`` raises NotImplementedError, and ``fake_decoder`` provides a
deterministic byte-statistics stand-in so the pipeline shape is testable
end-to-end.

At 100 TB: binary payloads dominate partition size, so feature extraction
runs in ``mapInPandas`` (Arrow-batched; spark.sql.files.maxPartitionBytes
controls scan granularity) and outputs ONLY the small feature struct — the
binary never reshuffles.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "media_type string, n_bytes long, codec_hint string"
FEATURE_SCHEMA = "id long, media_type string, n_bytes long, feat_mean double, feat_dim int"


def attach_media(df: DataFrame, content_col: str, media_type: str, id_col: str) -> DataFrame:
    """Wrap a column as (id, content binary, meta struct) — the canonical media row."""
    content = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        content.alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.lit("raw").alias("codec_hint"),
        ).alias("meta"),
    )


def default_decoder(content: bytes, media_type: str):
    raise NotImplementedError(
        f"codec for {media_type!r} not available in this environment; "
        "plug a real decoder (PIL/torchaudio/ffmpeg) in deployment"
    )


def fake_decoder(content: bytes, media_type: str) -> list[float]:
    """Deterministic stand-in: 4-byte-stride byte means as a tiny 'feature'."""
    if not content:
        return [0.0]
    return [sum(content[i::4]) / max(1, len(content[i::4])) for i in range(min(4, len(content)))]


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = default_decoder,
) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of media rows.

    The decoder runs per row INSIDE a vectorized batch loop (unavoidable for
    opaque codecs — this is the one sanctioned per-element Python site, and
    it is batch-amortized via Arrow transfer).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(c), m["media_type"]) for c, m in zip(pdf["content"], pdf["meta"])]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feat_mean": [sum(f) / len(f) for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
