"""Forecast sinks: the distributed form of the reference's RDS cache dir.

The reference persists one RDS blob per (clean(name), index, method)
(``TimeSeriesFunctions_GPL_0.5.1.R:42-48``).  The cluster-scale analog is
a parquet table partitioned by the same key — partition pruning then
serves the reference's by-key ``load`` (R:50-55) without touching other
series' data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.scrub import clean_key_col
from .. import schemas


def write_forecasts(df: DataFrame, path: str, mode: str = "append") -> None:
    """Forecast rows → parquet partitioned by (clean_name, index, method)
    — the S3 sink (R:42-48) in table form."""
    (df
     .withColumn("clean_name", clean_key_col("name"))
     .write.mode(mode)
     .partitionBy("clean_name", "index", "method")
     .parquet(path))


def read_forecasts(spark: SparkSession, path: str,
                   name: str | None = None, index: str | None = None,
                   method: str | None = None) -> DataFrame:
    """The S4 source (R:50-55): by-key load via partition pruning."""
    from ..functions.scrub import clean_key
    df = spark.read.parquet(path)
    if name is not None:
        df = df.where(F.col("clean_name") == clean_key(name))
    if index is not None:
        df = df.where(F.col("index") == index)
    if method is not None:
        df = df.where(F.col("method") == method)
    return df.select([f.name for f in schemas.FORECAST.fields])
