"""Multimodal-column queries (north-star scope): binary payload -> Arrow-
batched decode/frame-sample/feature pipelines -> relational aggregation.

The corpus is the deterministic synthetic media table (the container has no
codec libraries — operators/multimodal.py documents the stub contract), so
these register rows-only; schema/batch-shape correctness is pytest-covered
in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..operators import multimodal as M
from .base import Query as _q

N_MEDIA = 300


def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode image payloads (Arrow mapInPandas, narrow) and aggregate the
    extracted feature vectors: per-channel-count stats + mean feature norm.
    Rows-only check: DuckDB cannot decode the binary payloads — the codec
    round-trip is pinned in pytest against the package's own encoders."""
    media = M.synth_media(spark, N_MEDIA)
    images = media.filter(F.col("kind") == "image")
    decoded = M.decode_images(images)
    nrm = V.norm(V.as_double(F.col("features")))
    return decoded.groupBy("n_channels").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.avg("dec_width").alias("avg_width"),
        F.avg("dec_height").alias("avg_height"),
        F.avg(nrm).alias("avg_feature_norm"),
    )


def media_frame_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample video frames (row-expanding mapInPandas) and count frames and
    span per video — the row-multiplying multimodal shape. Rows-only
    check: DuckDB cannot parse the container format; frame arithmetic is
    pinned in pytest against the package's own encoder."""
    media = M.synth_media(spark, N_MEDIA)
    frames = M.sample_video_frames(media.filter(F.col("kind") == "video"))
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_ts_ms").alias("first_ms"),
        F.max("frame_ts_ms").alias("last_ms"),
    )


QUERIES = {
    "media_decode_features": _q(media_decode_features, None),
    "media_frame_inventory": _q(media_frame_inventory, None),
}
