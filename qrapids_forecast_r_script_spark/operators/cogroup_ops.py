"""Co-grouped Pandas surface — `groupBy().cogroup().applyInPandas`,
the last member of the Pandas-on-Spark execution family this engine
exercises (grouped applyInPandas: `forecast/api.py`; mapInPandas:
`operators/multimodal.py`; applyInPandasWithState /
transformWithStateInPandas: `streaming/stateful.py`; UDTF:
`operators/udtf_ops.py`).

The demo workload is per-user AS-OF alignment: attribute every event to
the user's most recent order (pandas ``merge_asof`` per co-group) — the
feature-attribution step a propensity pipeline runs when joining a
clickstream to a slowly-changing fact table.  The relational twin is
the union+window as-of form (`operators/relational.py::
events_asof_last_error`); as with the UDTF chunker, this form exists to
prove the API shape, and the docstring is explicit about when each
wins.

Budget note (PLANS.md): one FlatMapCoGroupsInPandas node — a THIRD
documented Python site next to forecast fitting and multimodal
extraction.  The escape hatch is justified exactly when per-key logic
is imperative-sequential (merge_asof's ordered cursor); for plain as-of
semantics at 100 TB the relational union+window form is preferred
because it stays in codegen.

100 TB shape: both sides shuffle ONCE on the user key (co-partitioned
co-group), then each group is an independent Arrow batch — the
embarrassingly-parallel contract, state bounded by the largest single
user's rows, never the corpus.  Reference: the R service has no
co-grouped surface; engine-surface parity per SURVEY §2B (UDF/UDAF
row).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

_SCHEMA = ("event_id bigint, user_id bigint, ts timestamp, "
           "last_orderkey bigint, last_orderdate date, "
           "days_since_order bigint")


def _cogroup_buckets(spark: SparkSession) -> int:
    """Bucket count = the session's ``spark.sql.shuffle.partitions``
    (ADVICE r3: a fixed 32 was a parallelism cap the docstring claimed
    scaled with the cluster — now it actually does).  Results are
    invariant to the bucket count: bucketing only groups users into
    pandas batches, and ``merge_asof(by=user)`` keys the logic on the
    user inside each batch — the oracle-parity test at any setting is
    the proof."""
    from ..session import shuffle_width
    return shuffle_width(spark)


def _align(_key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket asof: ``merge_asof(..., by=user)`` does the
    per-user backward search inside ONE sorted merge over the whole
    bucket.  For each event, the latest order with o_orderdate <= ts;
    ties on o_orderdate resolve to the highest o_orderkey (right side
    sorted (date, key) — with equal on-keys asof takes the last row,
    mirrored by the oracle's DESC/DESC row_number).  Users with no
    orders null-extend: exact LEFT-join semantics."""
    ev = ev.sort_values("ts")
    od = od.sort_values(["o_orderdate", "o_orderkey"])
    m = pd.merge_asof(ev, od, left_on="ts", right_on="o_orderdate",
                      left_by="user_id", right_by="o_custkey",
                      direction="backward")
    days = (m["ts"].dt.normalize()
            - m["o_orderdate"].dt.normalize()).dt.days
    return pd.DataFrame({
        "event_id": m["event_id"],
        "user_id": m["user_id"],
        "ts": m["ts"],
        "last_orderkey": m["o_orderkey"].astype("Int64"),
        "last_orderdate": m["o_orderdate"].dt.date,
        "days_since_order": pd.array(days, dtype="Int64"),
    })


def events_orders_asof_cogroup(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-user as-of attribution of events to their latest preceding
    order, via co-grouped applyInPandas (see module docstring).

    Co-group key: a user-hash BUCKET (one per shuffle partition of the
    session), not the raw user — one pandas group per user pays the
    fixed Arrow/pandas per-group cost per key (measured 24.8 s at
    sf0.1 for ~1.5k users), while bucketed groups amortize it and let
    merge_asof(by=user) do the per-user logic vectorized inside the
    batch (measured ~1 s).  Same shuffle, same semantics; the bucket
    count follows ``spark.sql.shuffle.partitions``, so it scales with
    the cluster config — bounded state per task either way."""
    n_buckets = _cogroup_buckets(spark)
    events = (load_table(spark, sf_dir, "events")
              .select("event_id", "user_id", "ts")
              .withColumn("bucket",
                          F.pmod("user_id", F.lit(n_buckets))))
    orders = (load_table(spark, sf_dir, "orders")
              .select("o_custkey", "o_orderkey", "o_orderdate")
              .withColumn("bucket",
                          F.pmod("o_custkey", F.lit(n_buckets))))
    return (events.groupBy("bucket")
            .cogroup(orders.groupBy("bucket"))
            .applyInPandas(_align, schema=_SCHEMA))


QUERIES = {
    "events_orders_asof_cogroup": events_orders_asof_cogroup,
}

ORACLES = {
    # LEFT join keeps no-order users as single null-extended rows
    # (row_number over that one row is 1); DESC/DESC ordering matches
    # merge_asof's last-qualifying-row pick under date ties.
    "events_orders_asof_cogroup": """
        WITH j AS (
            SELECT e.event_id, e.user_id, e.ts,
                   o.o_orderkey, o.o_orderdate,
                   row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC NULLS LAST,
                                o.o_orderkey DESC NULLS LAST) AS rn
            FROM events e
            LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        )
        SELECT event_id, user_id, ts,
               o_orderkey AS last_orderkey,
               CAST(o_orderdate AS DATE) AS last_orderdate,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(ts AS DATE)) AS days_since_order
        FROM j WHERE rn = 1
    """,
}
