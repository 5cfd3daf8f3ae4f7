"""Multimodal column plumbing (north-star): binary media columns with
typed metadata, decoded/feature-extracted via Arrow-batched pandas.

Media bytes are opaque ``binary`` columns; metadata travels in a typed
struct. The decode step is STUBBED (image/audio libs absent in this
environment — clearly marked below); everything Spark-side is real:
schema, partitioning, mapInPandas batch shape, and a deterministic
byte-level feature extractor that exercises the exact plumbing a real
decoder plugs into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, width int, height int"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, byte_sum bigint, "
    "byte_mean double, head_hex string"
)


def synth_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic stand-in media: 16 'pixel' bytes derived from the
    document text (md5), with metadata from n_chars. Real pipelines
    read (path, bytes) via spark.read.format('binaryFile')."""
    return documents.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("media"),
        F.when(F.col("doc_id") % 2 == 0, "image/png")
        .otherwise("audio/wav")
        .alias("media_type"),
        (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
    )


def _decode_media(media_type: str, raw: bytes):  # pragma: no cover - stub
    """STUB: the real decoder (PIL / torchaudio / pyav) is not
    available in this container. A production build replaces this with
    the actual decode; the Spark plumbing around it is unchanged."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present here"
    )


def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Uses the deterministic byte-level features (always available) —
    the same batch shape a real decoder would use. One pass, no
    shuffle; Arrow carries the binary column zero-copy.
    """

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": raw.map(len).astype("int32"),
                    "byte_sum": raw.map(lambda b: int(sum(b))).astype("int64"),
                    "byte_mean": raw.map(
                        lambda b: float(sum(b)) / max(len(b), 1)
                    ),
                    "head_hex": raw.map(lambda b: b[:4].hex()),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_features(documents: DataFrame) -> DataFrame:
    """End-to-end: synth media → batched feature extraction."""
    return extract_media_features(synth_media_table(documents))
