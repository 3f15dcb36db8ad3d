"""Elasticsearch-shaped source (production form of ``search_element``).

The reference reads from Elasticsearch over HTTP
(``TimeSeriesFunctions_GPL_0.5.1.R:16-28``): connection via
``elasticConnection(host, path, user, pwd, port)`` and a query-string
search with source projection / sort / size.  The Spark-native equivalent
is the public ``elasticsearch-spark`` (elasticsearch-hadoop) connector —
not bundled in this container, so this module only *builds* the reader
and degrades to a clear error, keeping the API surface complete.

The parquet test harness path (sources/registry.py) exposes the same
operator semantics; swapping ``es_reader`` in is a one-line change for a
deployment that has the connector jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def es_reader(spark: SparkSession, host: str, port: int = 9200,
              user: str | None = None, password: str | None = None,
              ssl: bool = False):
    """DataFrameReader configured like elasticConnection (R:16-21).

    Raises a clear error if the connector jar is absent (this container
    ships no external jars).
    """
    reader = (spark.read.format("org.elasticsearch.spark.sql")
              .option("es.nodes", host)
              .option("es.port", str(port))
              .option("es.net.ssl", str(ssl).lower())
              .option("es.nodes.wan.only", "true"))
    if user:
        reader = (reader.option("es.net.http.auth.user", user)
                  .option("es.net.http.auth.pass", password or ""))
    return reader


def search_element_es(spark: SparkSession, host: str, name: str, index: str,
                      limit: int = 10_000, **conn_kwargs) -> DataFrame:
    """searchElement (R:23-40) against a live ES cluster.

    The connector pushes the query-string filter, the 2-field source
    projection, and the sort — the same pushdowns the reference hand-codes
    (R:27-28) and that Catalyst applies to the parquet path.
    """
    field = ("metric" if "metrics" in index
             else "factor" if "factors" in index
             else "strategic_indicator")           # R:25-26
    reader = es_reader(spark, host, **conn_kwargs)
    try:
        df = (reader
              .option("es.query", f'{{"query":{{"query_string":{{"query":"{field}:{name}"}}}}}}')
              .option("es.read.field.include", "value,evaluationDate")
              .load(index))
    except Exception as exc:  # connector jar absent in this container
        raise RuntimeError(
            "elasticsearch-spark connector not available; use the parquet "
            "source (sources.search_element) or add the connector jar"
        ) from exc
    from pyspark.sql import functions as F
    return (df.select(F.lit(name).alias("name"), F.lit(index).alias("index"),
                      F.to_date("evaluationDate").alias("evaluationDate"),
                      F.col("value").cast("double").alias("value"))
            .orderBy("evaluationDate")
            .limit(limit))
