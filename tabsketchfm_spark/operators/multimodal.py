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


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hex string"
RESIZE_SCHEMA = "doc_id bigint, n_bytes int, resized_hex string"


def sample_frames(
    media: DataFrame, frame_bytes: int = 4, stride: int = 2
) -> DataFrame:
    """Frame-sampling plumbing: treat the media blob as a sequence of
    fixed-size frames, keep every ``stride``-th (the video
    frame-sample shape: decode → pick keyframes). The frame SPLIT is
    deterministic byte slicing (a real build decodes containers
    instead — see _decode_media stub); the fan-out (one input row →
    many frame rows) is the real production plumbing: mapInPandas
    yields a longer frame than it receives, no explode/shuffle needed.
    Output frames as lowercase hex for engine-portable comparison.
    """

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hexes = [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(raw)
                for i in range(0, len(raw) // frame_bytes, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hexes.append(raw[i * frame_bytes : (i + 1) * frame_bytes].hex())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hex": pd.Series(hexes, dtype="object"),
                }
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


def sample_frames_oracle_sql(
    table: str = "documents", frame_bytes: int = 4, stride: int = 2
) -> str:
    """DuckDB twin over the same deterministic synth media
    (md5-of-text bytes, sliced on the hex string)."""
    return f"""
WITH media AS (
  SELECT doc_id, md5(text) AS mh,
         octet_length(unhex(md5(text))) AS mlen
  FROM {table}),
idx AS (
  SELECT doc_id, mh,
         unnest(generate_series(0, CAST(mlen/{frame_bytes} AS BIGINT) - 1)) AS i
  FROM media)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       substring(mh, CAST(i*{frame_bytes}*2 + 1 AS BIGINT), {frame_bytes * 2})
         AS frame_hex
FROM idx WHERE i % {stride} = 0
"""


def resize_media(media: DataFrame, target_bytes: int = 8) -> DataFrame:
    """Resize plumbing: nearest-neighbor downsample of the media blob
    to ``target_bytes`` (out[i] = raw[floor(i*len/target)]) — the
    byte-level stand-in for an image resize kernel (a real build calls
    PIL inside the same batch loop). One narrow mapInPandas pass."""

    from tabsketchfm_spark.session import ensure_package_on_workers

    ensure_package_on_workers(media.sparkSession)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for raw in pdf["media"]:
                raw = bytes(raw)
                out.append(
                    bytes(
                        raw[i * len(raw) // target_bytes]
                        for i in range(target_bytes)
                    ).hex()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(
                        [target_bytes] * len(pdf), dtype="int32"
                    ),
                    "resized_hex": pd.Series(out, dtype="object"),
                }
            )

    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


def resize_media_oracle_sql(table: str = "documents", target_bytes: int = 8) -> str:
    return f"""
WITH media AS (
  SELECT doc_id, md5(text) AS mh,
         octet_length(unhex(md5(text))) AS mlen
  FROM {table}),
px AS (
  SELECT doc_id, mh, mlen, unnest(generate_series(0, {target_bytes} - 1)) AS i
  FROM media)
SELECT doc_id, CAST({target_bytes} AS INTEGER) AS n_bytes,
       string_agg(substring(mh, CAST(floor(i * mlen / {target_bytes}) AS BIGINT) * 2 + 1, 2),
                  '' ORDER BY i) AS resized_hex
FROM px GROUP BY doc_id
"""


def media_dedup(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup over BINARY media content — SK6 for blobs: group on
    the lowercase hex digest of the bytes (hex() case differs between
    engines, so lowercase is the canonical key), keep the smallest id.
    At 100 TB this is the first pass of any media pipeline: byte-equal
    assets collapse before a single decode runs. One shuffle on the
    digest. Output: (media_key, keep_id, n_dups, bytes_each)."""
    key = F.lower(F.hex(F.col("media")))
    return (
        media_df.where(F.col("media").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            key.alias("media_key"),
            F.length(F.col("media")).alias("nbytes"),
        )
        .groupBy("media_key")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.min("nbytes").cast("int").alias("bytes_each"),
        )
    )


def media_dedup_oracle_sql(doc_table: str) -> str:
    """DELIBERATE SYNTHETIC COUPLING: the synth media bytes ARE
    unhex(md5(text)) (synth_media_table), so the oracle regenerates
    the digest from the source text — DuckDB 1.x has no md5(BLOB).
    bytes_each ties to the digest length (strlen/2), not a literal,
    and NULL text mirrors the Spark side's NULL-media filter. A real
    media lake swaps this oracle for a rows-only check; the Spark
    operator itself only ever reads the bytes."""
    return f"""
SELECT md5(text) AS media_key, min(doc_id) AS keep_id,
       count(*) AS n_dups,
       CAST(strlen(md5(text)) / 2 AS INTEGER) AS bytes_each
FROM {doc_table}
WHERE text IS NOT NULL
GROUP BY 1
"""
