"""Multimodal column plumbing (SURVEY.md §2.11; mandated extension).

Images/audio/video ride through Spark as opaque ``binary`` payload
columns plus a typed metadata struct — the schema pattern that scales
to 100 TB because the engine shuffles/prunes metadata without touching
payload bytes (column pruning drops the blob unless a stage needs it).

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the
decode step is stubbed: ``decode_media`` raises NotImplementedError by
design, and ``byte_histogram_features`` is the deterministic fake
feature extractor used to test the real Spark-side plumbing (schema,
partitioning, Arrow batch shape through mapInPandas).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16

MEDIA_SCHEMA = (
    "doc_id long, content_type string, width int, height int, payload binary"
)


def with_media_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata to each row.

    Payload is the utf-8 encoding of the text (a deterministic stand-in
    for real image bytes); metadata is derived from doc_id.
    """
    return df.select(
        "doc_id",
        F.lit("image/fake").alias("content_type"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("height"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_media(payload: bytes, content_type: str):  # pragma: no cover - stub
    """Real decode (image/audio/video → tensor). STUB: the codec
    libraries are not available in this environment."""
    raise NotImplementedError(
        "media codecs (PIL/av) are not installed in this environment; "
        "use byte_histogram_features for the deterministic fake path"
    )


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """Deterministic fake 'feature extractor': 16-bin histogram over
    payload bytes, via mapInPandas (Arrow-batched, streaming over
    partitions — never materializes a partition in memory at once)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        shift = 8 - FEATURE_BINS.bit_length() + 1  # byte>>shift == bin index
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(b >> shift, minlength=FEATURE_BINS)
                # serialize at the boundary: the driver's canonicalizer
                # cannot handle list cells in pandas
                rows.append((doc_id, len(b), "|".join(map(str, hist.tolist()))))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "features"])

    return media.mapInPandas(extract, "doc_id long, n_bytes long, features string")
