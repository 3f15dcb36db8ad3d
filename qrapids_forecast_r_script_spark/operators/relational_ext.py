"""Second tranche of relational coverage: simple-predicate aggregation
(TPC-H Q6 shape), correlated/scalar subqueries, ranking windows
(rank/ntile/cumulative), and a forecast-backtest join — all pure
Catalyst, all fully oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import events_as_metrics, load_table


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure predicate + single-row aggregate — the
    pushdown-everything query (scan should carry all three filters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li
            .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                   & (F.col("l_shipdate") < F.lit("1997-01-01"))
                   & (F.col("l_discount").between(0.05, 0.07))
                   & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                  .alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape: customers whose balance beats their
    nation's average.  Spark form: window average (one shuffle) rather
    than a re-scanning correlated subquery — same semantics, better plan."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return (cust
            .withColumn("nation_avg", F.avg("c_acctbal").over(w))
            .where(F.col("c_acctbal") > F.col("nation_avg"))
            .select("c_custkey", "c_nationkey",
                    F.round("c_acctbal", 2).alias("acctbal"),
                    F.round("nation_avg", 4).alias("nation_avg")))


def order_rank_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window sampler: rank, dense_rank, ntile(4), cumulative sum
    per customer over order dates."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders
            .select("o_custkey", "o_orderkey",
                    F.rank().over(w).alias("rnk"),
                    F.dense_rank().over(w).alias("drnk"),
                    F.ntile(4).over(w).alias("quartile"),
                    F.round(F.sum("o_totalprice").over(
                        w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)), 2)
                     .alias("cum_spend")))


def snaive_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-vs-actuals backtest: hold out the last 7 days of each
    events-derived series, forecast them seasonal-naively (value 7 days
    earlier), join forecasts to actuals, report MAE per series.

    This is the accuracy-evaluation operator a forecasting engine needs
    (align forecasts with later actuals — SURVEY §2B joins); with SNAIVE
    it is exactly SQL-expressible, so the whole evaluate path is
    hash-checked.  Scale: two windows + one self-join on the series key.
    """
    metrics = events_as_metrics(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("name", "index").orderBy("evaluationDate")
    wdesc = Window.partitionBy("name", "index")
    t = (metrics
         .withColumn("t", F.row_number().over(w) - 1)
         .withColumn("n", F.count(F.lit(1)).over(wdesc)))
    holdout = t.where(F.col("t") >= F.col("n") - 7)
    train_tail = (t.where((F.col("t") >= F.col("n") - 14))
                  .select("name", "index",
                          (F.col("t") + 7).alias("t_target"),
                          F.col("value").alias("snaive_pred")))
    joined = (holdout.join(train_tail,
                           (holdout.name == train_tail.name)
                           & (holdout.index == train_tail.index)
                           & (holdout.t == train_tail.t_target))
              .select(holdout.name.alias("name"), holdout.index.alias("index"),
                      F.abs(F.col("value") - F.col("snaive_pred")).alias("abs_err")))
    return (joined.groupBy("name", "index")
            .agg(F.count(F.lit(1)).alias("n_holdout"),
                 F.round(F.avg("abs_err"), 6).alias("mae")))


QUERIES = {
    "q6_revenue_delta": q6_revenue_delta,
    "customers_above_nation_avg": customers_above_nation_avg,
    "order_rank_windows": order_rank_windows,
    "snaive_backtest_mae": snaive_backtest_mae,
}

ORACLES = {
    "q6_revenue_delta": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "customers_above_nation_avg": """
        SELECT c_custkey, c_nationkey,
               round(c_acctbal, 2) AS acctbal,
               round(nation_avg, 4) AS nation_avg
        FROM (
            SELECT c_custkey, c_nationkey, c_acctbal,
                   avg(c_acctbal) OVER (PARTITION BY c_nationkey) AS nation_avg
            FROM customer)
        WHERE c_acctbal > nation_avg
    """,
    "order_rank_windows": """
        SELECT o_custkey, o_orderkey,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING), 2) AS cum_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "snaive_backtest_mae": """
        WITH metrics AS (
            SELECT event_type AS name,
                   'test.metrics.events' AS index,
                   CAST(ts AS DATE) AS evaluationDate,
                   round(sum(value), 6) AS value
            FROM events GROUP BY 1, 2, 3
        ), t AS (
            SELECT name, index, value,
                   row_number() OVER (PARTITION BY name, index
                                      ORDER BY evaluationDate) - 1 AS t,
                   count(*) OVER (PARTITION BY name, index) AS n
            FROM metrics
        )
        SELECT h.name, h.index,
               count(*) AS n_holdout,
               round(avg(abs(h.value - p.value)), 6) AS mae
        FROM t h
        JOIN t p ON p.name = h.name AND p.index = h.index
                AND p.t = h.t - 7
        WHERE h.t >= h.n - 7
        GROUP BY h.name, h.index
    """,
}
