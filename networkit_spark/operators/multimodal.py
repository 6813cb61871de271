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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: output schema of the feature extractor — fixed, engine-level contract
FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, byte_sum long, "
    "byte_mean double, feature array<double>"
)


def _fake_decode_features(payload: bytes, n_bins: int = 8) -> list[float]:
    """Scalar SPEC of the deterministic decoder stand-in (libjpeg /
    ffmpeg not in this container): an ``n_bins``-bucket byte histogram,
    normalized. The batch path below computes the same values
    vectorized (numpy ``frombuffer`` + ``bincount``); this scalar form
    exists as the readable definition and the test reference. Replace
    both with a real decode + embedding under the same signature."""
    if not payload:
        return [0.0] * n_bins
    hist = [0] * n_bins
    for b in payload:
        hist[b % n_bins] += 1
    total = float(len(payload))
    return [h / total for h in hist]


def _batch_decode(raw: list[bytes], n_bins: int):
    """Vectorized batch form of ``_fake_decode_features`` plus byte
    stats: ONE ``np.frombuffer`` over the concatenated batch payload,
    segment sums via cumsum differences, per-row histograms via a
    single ``bincount`` over ``row_index * n_bins + byte % n_bins`` —
    no per-row (let alone per-byte) Python in the hot loop, which is
    what survives 100 TB of assets."""
    n = len(raw)
    lens = np.fromiter((len(p) for p in raw), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(raw), dtype=np.uint8)
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=bounds[1:])
    csum = np.zeros(len(buf) + 1, dtype=np.int64)
    np.cumsum(buf, dtype=np.int64, out=csum[1:])
    byte_sum = csum[bounds[1:]] - csum[bounds[:-1]]
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    hist = np.bincount(
        row_idx * n_bins + (buf % n_bins).astype(np.int64),
        minlength=n * n_bins,
    ).reshape(n, n_bins)
    feats = hist / np.maximum(lens, 1)[:, None].astype(np.float64)
    return lens, byte_sum, feats


def extract_features(assets: DataFrame, n_bins: int = 8) -> DataFrame:
    """``assets(asset_id long, media_type string, payload binary)`` →
    FEATURE_SCHEMA rows via ``mapInPandas``.

    Batch shape: one pandas DataFrame per Arrow batch per partition —
    the decoder touches each partition's bytes exactly once, in place,
    with no shuffle; parallelism = input partitioning.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the only per-row Python is the None→b"" normalization at
            # the Arrow boundary; all byte-level work is numpy
            raw = [p if p is not None else b"" for p in pdf["payload"]]
            lens, byte_sum, feats = _batch_decode(raw, n_bins)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": lens,
                    "byte_sum": byte_sum,
                    "byte_mean": byte_sum / np.maximum(lens, 1),
                    "feature": list(feats),
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
