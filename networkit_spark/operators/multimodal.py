"""Multimodal asset plumbing — opaque binary columns with typed metadata,
decoded/feature-extracted through Arrow-batched ``mapInPandas``.

Training-data-pipeline operators (no reference counterpart). The real
image/audio codecs are not in this container, so the *decode* step is a
deterministic stand-in (byte statistics standing in for pixel
statistics) clearly marked below — but the Spark-side plumbing is real
and tested: asset schema, batch iteration shape, output schema, and the
partition-parallel execution path are exactly what a libjpeg/ffmpeg
decoder would plug into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: output schema of the feature extractor — fixed, engine-level contract
FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, byte_sum long, "
    "byte_mean double, feature array<double>"
)


def _fake_decode_features(payload: bytes, n_bins: int = 8) -> list[float]:
    """DETERMINISTIC STAND-IN for a real decoder (libjpeg / ffmpeg not in
    this container): an ``n_bins``-bucket byte histogram, normalized.
    Replace with a real decode + embedding under the same signature."""
    if not payload:
        return [0.0] * n_bins
    hist = [0] * n_bins
    for b in payload:
        hist[b % n_bins] += 1
    total = float(len(payload))
    return [h / total for h in hist]


def extract_features(assets: DataFrame, n_bins: int = 8) -> DataFrame:
    """``assets(asset_id long, media_type string, payload binary)`` →
    FEATURE_SCHEMA rows via ``mapInPandas``.

    Batch shape: one pandas DataFrame per Arrow batch per partition —
    the decoder touches each partition's bytes exactly once, in place,
    with no shuffle; parallelism = input partitioning.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda p: len(p) if p is not None else 0)
            byte_sum = payloads.map(
                lambda p: int(sum(p)) if p is not None else 0
            )
            feats = payloads.map(lambda p: _fake_decode_features(p, n_bins))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "byte_sum": byte_sum,
                    "byte_mean": byte_sum / n_bytes.clip(lower=1),
                    "feature": feats,
                }
            )

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Fixture builder: treat each document's utf-8 bytes as an opaque
    payload — gives the multimodal path a deterministic, oracle-checkable
    input (byte_sum of ASCII text = char-code sum, computable in SQL)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def frame_sample(assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """\"Frame sampling\" over opaque payloads: deterministic stride
    slices standing in for video frame extraction — real plumbing
    (explode to one row per frame, binary slices), stub semantics."""
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return (
        assets.select(
            "asset_id",
            F.explode(idx).alias("frame_no"),
            F.col("payload"),
        )
        .where(F.col("frame_no") * every_n_bytes < F.length("payload"))
        .select(
            "asset_id",
            "frame_no",
            F.substring(
                F.col("payload"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )
