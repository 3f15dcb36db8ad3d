"""Custom source via Spark 4's Python Data Source API.

The reference's only source is an Elasticsearch HTTP pull
(``TimeSeriesFunctions_GPL_0.5.1.R:16-28``).  ``sources/elastic.py``
holds the production connector form; this module is the *engine-native*
third form: a first-class ``pyspark.sql.datasource.DataSource``
registered under ``format("qrapids_metrics")`` — the Spark 4 API whose
role is exactly this case, wrapping a bespoke external system (an
internal metrics service, a REST endpoint, a scroll API) as a
partition-parallel DataFrame source with no JVM code.

The demo source serves a deterministic synthetic daily metric series:

    value(day) = ((day*day) % 97) * 0.25 + (day % 7) * 2.5 + day * 0.25

— integer arithmetic scaled by exact binary fractions, so every value is
an exact double and the DuckDB oracle (a pure ``range()`` SELECT, no
tables) reproduces it bit-for-bit.

Scale shape: ``partitions()`` splits the day range into contiguous
chunks, one ``read()`` generator per task — the planner sees a real
partitioned scan (parallelism = npartitions, no driver materialization),
which is the contract any 100 TB custom source must honor.  Arrow-batch
conversion happens in the worker; the generator yields plain tuples.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, \
    InputPartition

_FORMAT_NAME = "qrapids_metrics"
_SCHEMA = "name string, index string, day int, value double"


def _value(day: int) -> float:
    # exact in IEEE double: integers scaled by 1/4, 5/2, 1/4
    return ((day * day) % 97) * 0.25 + (day % 7) * 2.5 + day * 0.25


class _DayRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticMetricsReader(DataSourceReader):
    def __init__(self, options):
        self.metric = options.get("metric", "click")
        self.index = options.get("index", "synthetic.metrics")
        self.n_days = int(options.get("n_days", "365"))
        self.n_partitions = int(options.get("partitions", "8"))

    def partitions(self):
        n, p = self.n_days, max(1, self.n_partitions)
        step = (n + p - 1) // p
        return [_DayRangePartition(lo, min(lo + step, n))
                for lo in range(0, n, step)]

    def read(self, partition: _DayRangePartition) -> Iterator[tuple]:
        for day in range(partition.start, partition.end):
            yield (self.metric, self.index, day, _value(day))


class SyntheticMetricsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticMetricsReader:
        return SyntheticMetricsReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent per-session registration."""
    if not getattr(spark, "_qrapids_pyds_registered", False):
        spark.dataSource.register(SyntheticMetricsDataSource)
        spark._qrapids_pyds_registered = True


_N_DAYS = 365


def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: scan the custom Python data source and reduce it —
    proves the source is partition-parallel (8 input partitions), typed,
    and exactly reproducible (the oracle regenerates the series in pure
    SQL — no parquet involved)."""
    from pyspark.sql import functions as F
    register(spark)
    df = (spark.read.format(_FORMAT_NAME)
          .option("n_days", str(_N_DAYS)).option("partitions", "8").load())
    return (df.groupBy("name", "index")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"),
                 F.round(F.avg(F.col("day") * F.col("value")), 4)
                  .alias("avg_day_weighted")))


QUERIES = {"python_datasource_scan": python_datasource_scan}

ORACLES = {
    "python_datasource_scan": f"""
        WITH series AS (
            SELECT 'click' AS name, 'synthetic.metrics' AS index,
                   CAST(d AS INT) AS day,
                   CAST(((d*d) % 97) * 0.25 + (d % 7) * 2.5 + d * 0.25
                        AS DOUBLE) AS value
            FROM range(0, {_N_DAYS}) t(d)
        )
        SELECT name, index, count(*) AS n_days,
               round(sum(value), 2) AS sum_value,
               min(value) AS min_value,
               max(value) AS max_value,
               round(avg(day * value), 4) AS avg_day_weighted
        FROM series GROUP BY 1, 2
    """,
}
