"""Multimodal-column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing — schemas, batch shapes, partitioning, Arrow transfer —
is real and tested; the actual media DECODE is stubbed (no image/audio libs
in this container) behind ``decode_stub`` which either raises
NotImplementedError ('real' mode) or produces a deterministic fake feature
vector ('fake' mode) so the downstream plumbing can be exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, payload binary, mime string, "
                "width int, height int")

FEATURE_SCHEMA = "media_id long, n_bytes long, magic string, feature array<double>"


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat a text column as an opaque binary payload with typed
    metadata — the shape a real media table would have."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(t, "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(t).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.encode(t, "UTF-8"), 1, 4))).alias("magic"),
    )


def decode_stub(payload: bytes, mode: str):
    """STUB for media decode (image resize / audio resample / frame sample).

    'real' raises NotImplementedError — the container has no codec libs;
    on a production cluster this is where PIL/libsndfile/ffmpeg plug in.
    'fake' returns a deterministic 4-dim feature from the payload bytes so
    the Arrow batch plumbing is testable.
    """
    if mode == "real":
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "container; plug PIL/soundfile/ffmpeg in here on a real cluster")
    n = len(payload)
    head = payload[:8].ljust(8, b"\x00")
    return [float(n), float(head[0]), float(head[-1]),
            float(sum(head) % 997)]


def _feature_mapper(mode: str):
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, magics, nbytes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                feats.append(decode_stub(b, mode))
                magics.append(b[:4].hex())
                nbytes.append(len(b))
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(),
                                "n_bytes": nbytes,
                                "magic": magics,
                                "feature": feats})
    return compute


def extract_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas): the real
    pattern for media pipelines — binary in, fixed-width feature out.
    Prunes to (media_id, payload) before the Python exchange."""
    return (media.select("media_id", "payload")
            .mapInPandas(_feature_mapper(mode), schema=FEATURE_SCHEMA))
