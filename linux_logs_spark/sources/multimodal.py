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
                # NULL payload (e.g. a null source text) behaves as
                # empty media, not a worker TypeError (round-5 review)
                b = np.frombuffer(bytes(blob) if blob is not None else b"", dtype=np.uint8)
                hist = np.bincount(b >> shift, minlength=FEATURE_BINS)
                # serialize at the boundary: the driver's canonicalizer
                # cannot handle list cells in pandas
                rows.append((doc_id, len(b), "|".join(map(str, hist.tolist()))))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "features"])

    return media.mapInPandas(extract, "doc_id long, n_bytes long, features string")


RESIZE_MAX = 224  # stand-in for a 224x224 vision-model input
FRAME_BYTES = 32
FRAME_STRIDE = 4


def resize_media(media: DataFrame) -> DataFrame:
    """Deterministic fake 'resize': clamp dims to RESIZE_MAX and
    truncate the payload to out_w+out_h bytes (a real resize would
    decode → interpolate → re-encode inside this same mapInPandas
    batch loop; codecs are stubbed per module docstring)."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w = pdf["width"].clip(upper=RESIZE_MAX)
            out_h = pdf["height"].clip(upper=RESIZE_MAX)
            n_out = [
                min(len(bytes(b)) if b is not None else 0, int(w) + int(h))
                for b, w, h in zip(pdf["payload"], out_w, out_h)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_out": n_out,
                }
            )

    return media.mapInPandas(
        do_resize,
        "doc_id long, width int, height int, out_w int, out_h int, n_bytes_out long",
    )


def frame_sample_media(media: DataFrame) -> DataFrame:
    """Deterministic fake 'video frame sampling': treat the payload as
    FRAME_BYTES-sized frames, keep every FRAME_STRIDE-th frame, and
    fingerprint the first frame (byte sum). The Spark shape — binary
    in, per-frame stats out of an Arrow-batched mapInPandas — is the
    real one; only the decoder is fake."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(blob) if blob is not None else b"", dtype=np.uint8)
                n_frames = -(-len(b) // FRAME_BYTES)
                n_sampled = -(-n_frames // FRAME_STRIDE)
                first_sum = int(b[:FRAME_BYTES].sum())
                rows.append((doc_id, n_frames, n_sampled, first_sum))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_sampled", "first_frame_sum"]
            )

    return media.mapInPandas(
        do_sample, "doc_id long, n_frames long, n_sampled long, first_frame_sum long"
    )
