"""Multimodal columns: opaque binary payloads + typed metadata
(north-star extension).

Convention (schemas.MEDIA): ``payload: binary`` is an opaque blob
(image/audio/video bytes); ``meta: map<string,string>`` carries typed
metadata (mime, width, duration…).  Decode / feature-extract / resize /
frame-sample run as ``mapInPandas`` — Arrow-batched, schema-stable,
partition-parallel.  The actual codecs (PIL/ffmpeg/torchvision) are NOT
in this container, so the decode step is STUBBED: ``decode_media`` raises
NotImplementedError unless a codec import succeeds, and
``extract_features`` uses a deterministic md5-based fake feature vector —
the Spark-side plumbing (schema, batching, UDF signature, partitioning)
is real and tested either way.

At 100 TB: payloads dominate bytes — mapInPandas streams Arrow batches so
a task never holds more than ``maxRecordsPerBatch`` blobs; metadata-only
queries prune the payload column at the parquet scan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from ..sources import load_table

_FEATURE_DIM = 8

MEDIA_FEATURES = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(DoubleType())),
])


def decode_media(payload: bytes, kind: str):
    """Decode an image/audio/video payload.  STUB: the container ships no
    codec libraries; gate on their availability so the operator lights up
    when they exist."""
    if kind == "image":
        try:
            from PIL import Image  # noqa: F401  (not installed here)
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires PIL — not available in this "
                "container; plumbing is exercised via extract_features") from exc
    raise NotImplementedError(f"no decoder for kind={kind!r}")


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real feature extractor: 8 doubles from
    the md5 digest, in [0, 1)."""
    d = hashlib.md5(payload).digest()
    return [int.from_bytes(d[i * 2:i * 2 + 2], "little") / 65536.0
            for i in range(_FEATURE_DIM)]


def extract_features_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "features": pdf["payload"].map(_fake_features),
        })


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a MEDIA-shaped frame from ``documents`` (payload = utf-8
    bytes) so the binary-column plumbing runs against driver data."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("mime"), F.lit("text/plain"),
                     F.lit("lang"), F.col("lang")).alias("meta"))


def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas, then a
    relational summary (per-kind count + mean of feature[0]) so the
    result is compact and stable."""
    media = documents_as_media(spark, sf_dir)
    feats = media.mapInPandas(extract_features_udf, schema=MEDIA_FEATURES)
    return (feats
            .select("media_id", "kind", "n_bytes",
                    F.element_at("features", 1).alias("f0"))
            .groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.round(F.avg("f0"), 6).alias("avg_f0")))


QUERIES = {
    "media_feature_extract": media_feature_extract,  # rows-only: md5-float
}                                                    # math not in SQL
ORACLES: dict[str, str] = {}
