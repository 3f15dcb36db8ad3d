"""Multi-format sources/sinks: CSV, JSON-lines, and ORC, round-tripped.

The reference reads exactly one source (Elasticsearch HTTP, R:27-28) and
writes exactly one sink (RDS files, R:47).  A general engine needs the
standard lake formats; each is exercised end-to-end as write→read→query
with the SAME explicit StructTypes as the parquet path (schemas.py) —
no inference pass, which at 100 TB would mean an extra full scan (CSV/
JSON inference reads the data once just to guess types).

Each round-trip query's oracle runs on the original parquet, so the
driver hash-checks serializer fidelity (dates, timestamps, doubles,
nulls) through the text/columnar codecs — not just "it parses".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from .registry import load_table


def _roundtrip(spark: SparkSession, sf_dir: str, table: str,
               fmt: str, **read_opts) -> DataFrame:
    """Write <table> in <fmt> under /tmp once per scale dir, read it back
    with the explicit schema.  Timestamps travel as microsecond-precision
    strings in the text formats (Spark's default writer pattern keeps
    them round-trippable)."""
    from .registry import cached_artifact_dir
    # fingerprint guards against the driver regenerating testdata between
    # rounds — a stale round-trip copy must never feed a hash-checked query
    path = os.path.join(cached_artifact_dir("qrapids_formats", sf_dir, table),
                        f"{table}.{fmt}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, table).write.mode("overwrite") \
            .format(fmt).options(**read_opts).save(path)
    return (spark.read.schema(schemas.TABLES[table])
            .format(fmt).options(**read_opts).load(path))


def orders_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV (header, explicit schema both ways) → monthly revenue.
    Exercises timestamp and double text serialization; doubles survive
    because Spark writes shortest-round-trip decimal strings."""
    orders = _roundtrip(spark, sf_dir, "orders", "csv", header="true")
    return (orders.groupBy(F.trunc("o_orderdate", "month").alias("month"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .orderBy("month"))


def events_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines → per-type stats.  The ``props`` column is a
    JSON *string inside* JSON — the escape/unescape path is part of what
    the oracle hash checks (distinct props counted post-roundtrip)."""
    ev = _roundtrip(spark, sf_dir, "events", "json")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count_distinct("props").alias("n_distinct_props"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .orderBy("event_type"))


def lineitem_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC → Q1-shaped rollup.  ORC is the other columnar
    format with predicate pushdown + pruning; same explicit schema, no
    inference."""
    li = _roundtrip(spark, sf_dir, "lineitem", "orc")
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"))
            .orderBy("l_returnflag", "l_linestatus"))


_PRUNE_DATE = "2024-01-15"


def events_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition-pruned scan — THE core
    100 TB table-layout primitive: events written once partitioned by
    ``event_date`` (directory-per-day), then a one-day query whose date
    predicate prunes at the DIRECTORY level, so the scan touches 1/31 of
    the data before a single row is read (tests pin the
    ``PartitionFilters`` plan contract).  At scale this is the
    difference between reading 100 TB and reading 3 TB for a daily
    report; the oracle aggregates the unpartitioned original, so the
    hash also proves the partitioned rewrite is lossless for the
    selected day."""
    from .registry import cached_artifact_dir
    path = os.path.join(cached_artifact_dir("qrapids_formats", sf_dir,
                                            "events"),
                        "events_by_date.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (load_table(spark, sf_dir, "events")
         .withColumn("event_date", F.to_date("ts"))
         .write.mode("overwrite").partitionBy("event_date").parquet(path))
    ev = spark.read.parquet(path)
    return (ev.where(F.col("event_date") == F.lit(_PRUNE_DATE).cast("date"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total_value"),
                 F.count_distinct("user_id").alias("n_users"))
            .orderBy("event_type"))


def events_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across a partitioned lake — the ingest reality a
    fixed-schema reader breaks on: an early batch wrote events WITHOUT
    the ``props`` column, a later batch added it; ``mergeSchema`` reads
    both generations as one table with NULL back-fill for the old rows.
    The query aggregates per event_type counting rows where props is
    absent vs present — the oracle reproduces the generation split from
    the original table, so the hash proves null back-fill touched
    exactly the old generation and no values were disturbed.

    Scale note: mergeSchema pays a footer read per file at planning —
    on a 100 TB lake you pin the merged schema in a catalog instead of
    re-merging per query; the capability under test is the
    null-back-fill READ semantics both approaches rely on.
    """
    from .registry import cached_artifact_dir
    base = os.path.join(cached_artifact_dir("qrapids_formats", sf_dir,
                                            "events"), "events_evolved")
    if not os.path.exists(os.path.join(base, "gen=2", "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        old = ev.where(F.col("event_id") % 2 == 0) \
            .select("event_id", "event_type", "value")
        new = ev.where(F.col("event_id") % 2 == 1) \
            .select("event_id", "event_type", "value", "props")
        old.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
        new.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=1"), os.path.join(base, "gen=2"))
    return (merged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("props").isNull().cast("long"))
                 .alias("n_backfilled"),
                 F.count("props").alias("n_with_props"),
                 F.round(F.sum("value"), 4).alias("total_value"))
            .orderBy("event_type"))


QUERIES = {
    "orders_csv_roundtrip": orders_csv_roundtrip,
    "events_json_roundtrip": events_json_roundtrip,
    "lineitem_orc_roundtrip": lineitem_orc_roundtrip,
    "events_partitioned_pruning": events_partitioned_pruning,
    "events_schema_evolution": events_schema_evolution,
}

ORACLES = {
    "orders_csv_roundtrip": """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    "events_json_roundtrip": """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT props) AS n_distinct_props,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
    "lineitem_orc_roundtrip": """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS sum_disc_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "events_schema_evolution": """
        SELECT event_type,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_backfilled,
               CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_props,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
    "events_partitioned_pruning": f"""
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        WHERE CAST(ts AS DATE) = DATE '{_PRUNE_DATE}'
        GROUP BY 1 ORDER BY 1
    """,
}
