"""Sources: parquet scans shaped like the reference's data access.

The reference's only scan is ``searchElement``
(``TimeSeriesFunctions_GPL_0.5.1.R:23-40``): an Elasticsearch query-string
search with a 2-field projection, ascending date sort, and a 10,000-doc cap.
Here the same operator is a declarative DataFrame chain — Catalyst pushes the
name predicate and the 2-column projection into the parquet scan
(PushedFilters / ReadSchema), which is the distributed analog of the
reference's hand-coded source pushdown (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from .. import schemas

# Reference cap: ES ``size = 10000`` (R:28).  Silently truncates longer
# series in the reference (quirk 7); we keep the cap for parity.  The
# truncation is surfaced where it bites: forecast.api.prepare_series logs
# a warning when a series group exceeds the cap.
MAX_SERIES_LENGTH = 10_000


def events_ts_is_nanos(path: str) -> bool:
    """True when ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS).

    One parquet-footer read on the driver — a schema decision, not a data
    scan (same cost on a 1000-executor cluster as on local[32]).  The
    driver's generator has shipped both physical types across rounds
    (NANOS in round 1, MICROS in round 2), so the reader must dispatch on
    what is actually on disk rather than bake in either era's layout.
    """
    import pyarrow.parquet as pq

    return str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"


def source_fingerprint(sf_dir: str, table: str) -> str:
    """8-hex-char fingerprint of a source parquet's (size, mtime).

    Every /tmp artifact cache (bucketed layouts, format round-trips,
    compaction fragments) must key on this, not just the sf tag: the
    driver REGENERATES /root/testdata between rounds (the events ``ts``
    physical type already changed once — see :func:`events_ts_is_nanos`),
    and an artifact derived from the previous round's bytes would
    silently serve stale data into a hash-checked query.
    """
    import hashlib

    path = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(path)
    token = f"{st.st_size}:{st.st_mtime_ns}"
    return hashlib.md5(token.encode()).hexdigest()[:8]


def cached_artifact_dir(root: str, sf_dir: str, table: str) -> str:
    """The shared /tmp artifact-cache location:
    ``/tmp/<root>/<sf-tag>_<source fingerprint>`` — single source of
    truth for the staleness-guard idiom (previously copy-pasted per
    caller).  Callers append their own file/dir names and guard on
    their own ``_SUCCESS`` marker."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return f"/tmp/{root}/{tag}_{source_fingerprint(sf_dir, table)}"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. Explicit schema → no inference pass at scale.

    ``events.ts`` dispatch: when physically TIMESTAMP(NANOS) (which
    Spark's parquet reader rejects), ``spark.sql.legacy.parquet.
    nanosAsLong`` (set in session.py) surfaces it as long nanoseconds and
    it is converted here (ns → µs truncation, matching DuckDB's read of
    the same file); when TIMESTAMP(MICROS) it reads directly as a
    timestamp.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and events_ts_is_nanos(path):
        raw = schemas.EVENTS_RAW_NS
        df = spark.read.schema(raw).parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select([f.name for f in schemas.EVENTS.fields])
    if name not in schemas.TABLES:
        # fail here, not later: silently inferring a schema would break
        # the engine's no-inference contract (and a ns-timestamp column
        # would arrive mistyped, surfacing as a distant oracle mismatch)
        raise KeyError(
            f"unknown table {name!r}; declared tables: "
            f"{sorted(schemas.TABLES)}")
    return spark.read.schema(schemas.TABLES[name]).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table and register temp views for spark.sql use."""
    out = {}
    for name in schemas.TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def _field_for_index(index: str) -> str:
    """Index-name substring dispatch (R:25-26): the index name selects which
    element-name field the query targets."""
    if "metrics" in index:
        return "metric"
    if "factors" in index:
        return "factor"
    return "strategic_indicator"


def search_element(metrics: DataFrame, name: str, index: str,
                   limit: int = MAX_SERIES_LENGTH) -> DataFrame:
    """The reference's scan (R:23-40) over a qr_metrics-shaped DataFrame.

    Equivalent chain: filter by element name + index, project the two
    source fields (R:28), sort ascending by evaluationDate (R:27), cap at
    10,000 rows (R:28).  All four steps push into the parquet scan or fold
    into one stage under Catalyst.

    The sort carries a ``value`` tiebreak beyond the reference's bare
    date sort: with duplicate dates at the cap boundary, Spark's
    sort-limit would otherwise pick among ties nondeterministically and
    feed a run-to-run-varying survivor set into the series builder.
    """
    return (metrics
            .where((F.col("name") == name) & (F.col("index") == index))
            .select("name", "index", "evaluationDate", "value")
            .orderBy(F.col("evaluationDate").asc(), F.col("value").asc())
            .limit(limit))


def load_series(metrics: DataFrame, name: str | None = None,
                index: str | None = None) -> DataFrame:
    """Positional series (SURVEY §1.2): Spark form of ``ts(v, f, start=0)``
    (R:32).  Dates are discarded into a 0-based positional index ``t`` in
    date order; calendar gaps are NOT filled (reference quirk 6).

    With no name/index this is the batch form: every series at once, one
    window partition per (name, index) — embarrassingly parallel at scale.
    The per-series 10k cap (R:28) becomes a windowed row_number filter.
    """
    df = metrics
    if name is not None:
        df = df.where(F.col("name") == name)
    if index is not None:
        df = df.where(F.col("index") == index)
    w = Window.partitionBy("name", "index").orderBy(
        F.col("evaluationDate").asc(), F.col("value").asc())
    return (df
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= MAX_SERIES_LENGTH)
            .select("name", "index",
                    (F.col("rn") - F.lit(1)).cast("long").alias("t"),
                    F.col("value").cast("double").alias("y")))


def events_as_metrics(events: DataFrame) -> DataFrame:
    """Derive a qr_metrics-shaped frame from the driver's ``events`` table
    (FIXTURES.md §3): daily sum of ``value`` per event_type.

    ``name := event_type``, ``index := 'test.metrics.events'`` so the
    metric-prefix dispatch branch (R:25-26) is exercised.
    """
    return (events
            .groupBy(F.col("event_type").alias("name"),
                     F.to_date("ts").alias("evaluationDate"))
            .agg(F.round(F.sum("value"), 6).alias("value"))
            .select("name",
                    F.lit("test.metrics.events").alias("index"),
                    "evaluationDate", "value"))
