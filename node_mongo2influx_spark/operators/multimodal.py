"""Multimodal columns (SURVEY.md §2.12): opaque binary payloads + typed
metadata, with Arrow-batched decode/feature plumbing.

Design: image/audio/video payloads are ``BinaryType`` columns travelling
next to typed metadata (mime, byte size, checksum). Spark never interprets
the bytes; decode/resize/frame-sample run as ``mapInPandas`` stages so the
bytes cross into Python once per Arrow batch, not per row.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: ``mode="fake"`` produces deterministic
pseudo-features from the bytes (so the plumbing — schema, batching,
partitioning — is fully testable); ``mode="real"`` raises
NotImplementedError at the exact point a codec would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature-extraction stage.
FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, feature array<float>, decoder string"
)


def as_binary_payload(
    df: DataFrame,
    source_col: str,
    id_col: str = "doc_id",
    mime: str = "text/plain",
) -> DataFrame:
    """Wrap a column as an opaque binary payload with mime metadata —
    the ingestion shape for any modality."""
    return df.select(
        F.col(id_col),
        F.col(source_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def payload_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata over opaque payloads: byte length, checksum, size
    class. Pure Column expressions — no payload bytes leave the JVM."""
    n_bytes = F.length("payload").cast("long")
    return df.select(
        F.col(id_col),
        n_bytes.alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.when(n_bytes >= 4096, "large")
        .when(n_bytes >= 1024, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding from payload bytes (sha256 expansion)
    — stands in for a real decode+encode so tests exercise real shapes."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    dim: int = 16,
    mode: str = "fake",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mode="real"`` is the integration point for PIL/ffmpeg/librosa —
    deliberately NotImplemented in this container. ``mode="fake"`` keeps the
    full Spark-side contract (schema, batch iteration, null payloads) real.
    """
    if mode not in ("fake", "real"):
        raise ValueError("mode must be 'fake' or 'real'")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "image/audio codecs are not available in this container; "
                    "plug PIL/ffmpeg decode here"
                )
            feats = [
                None if p is None else _fake_feature(bytes(p), dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["mime"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": feats,
                    "decoder": f"stub-{mode}",
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    frame_bytes: int = 16,
) -> DataFrame:
    """Deterministic 'frame sampling' over opaque payloads: one slice every
    ``every_n_bytes``. Stands in for video frame extraction; the slicing is
    pure Column expressions so only the sampled bytes ever leave the scan."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(1), F.greatest(n - frame_bytes + 1, F.lit(1)),
                         F.lit(every_n_bytes))
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(offsets, lambda off: F.substring(F.col("payload"), off, frame_bytes))
        ).alias("frame_no", "frame"),
    )
