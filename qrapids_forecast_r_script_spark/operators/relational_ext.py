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


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + aggregate (orders with at least
    one late lineitem, counted per priority)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.where(F.col("l_linestatus") == "O").select("l_orderkey")
    return (orders
            .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                   & (F.col("o_orderdate") < F.lit("1997-01-01")))
            .join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-conditional aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1) \
        .otherwise(0)
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .where(F.col("l_shipdate") >= F.lit("1996-01-01"))
            .where(F.col("l_shipdate") < F.lit("1997-01-01"))
            .groupBy("l_returnflag")
            .agg(F.sum(high).alias("high_line_count"),
                 F.sum(1 - high).alias("low_line_count"))
            .orderBy("l_returnflag"))


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: join + conditional-ratio aggregate (share of
    revenue from promo parts)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("SMALL"), rev).otherwise(F.lit(0.0))
    # no broadcast hint: part scales with the facts (TPC-H proportions),
    # so the join strategy is left to AQE's runtime stats — same policy
    # as q2/q19
    return (li.join(part, li.l_partkey == part.p_partkey)
            .where(F.col("l_shipdate") >= F.lit("1996-03-01"))
            .where(F.col("l_shipdate") < F.lit("1996-04-01"))
            .agg(F.round(F.sum(promo) * 100.0 / F.sum(rev), 4)
                  .alias("promo_revenue_pct"),
                 F.count(F.lit(1)).alias("n_lines")))


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_effect": q14_promo_effect,
    "q6_revenue_delta": q6_revenue_delta,
    "customers_above_nation_avg": customers_above_nation_avg,
    "order_rank_windows": order_rank_windows,
    "snaive_backtest_mae": snaive_backtest_mae,
}

ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_linestatus = 'O')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q12_shipmode_priority": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q14_promo_effect": """
        SELECT round(sum(CASE WHEN p_type LIKE 'SMALL%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END) * 100.0
                     / sum(l_extendedprice * (1 - l_discount)), 4)
                   AS promo_revenue_pct,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
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


def order_cycle_time_stats(spark: SparkSession, sf_dir: str
                           ) -> DataFrame:
    """Order-to-ship cycle-time distribution per order priority — the
    operational-latency percentile table (p50/p90/p99) the TPC-H
    shapes never surface: join orders to their line items, take the
    integer day gap order-date → ship-date, and summarize per
    priority.  The supply-chain twin of `funnel_latency_percentiles`
    (which does the same read over event funnels).

    Gaps are exact integer days (DATE-cast subtraction on both
    engines, no timestamp rounding); percentiles are the established
    exact type-7 pairing (Spark `percentile` == DuckDB
    `quantile_cont`); the mean divides an exact integer sum.  Scale:
    one fact-fact equi-join on the order key (both sides ship two
    columns), one grouped aggregate with map-side combine over 5
    priority groups."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.to_date("o_orderdate").alias("od"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.to_date("l_shipdate").alias("sd"))
    gaps = (orders.join(li, "o_orderkey")
            .select("o_orderpriority",
                    F.datediff("sd", "od").cast("long").alias("gap")))
    return (gaps.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lineitems"),
                 F.round(F.sum("gap").cast("double")
                         / F.count(F.lit(1)).cast("double"), 6)
                 .alias("mean_days"),
                 F.expr("percentile(gap, 0.5)").alias("_p50"),
                 F.expr("percentile(gap, 0.9)").alias("_p90"),
                 F.expr("percentile(gap, 0.99)").alias("_p99"),
                 F.min("gap").alias("min_days"),
                 F.max("gap").alias("max_days"))
            .select("o_orderpriority", "n_lineitems", "mean_days",
                    F.round("_p50", 6).alias("p50_days"),
                    F.round("_p90", 6).alias("p90_days"),
                    F.round("_p99", 6).alias("p99_days"),
                    "min_days", "max_days")
            .orderBy("o_orderpriority"))


QUERIES["order_cycle_time_stats"] = order_cycle_time_stats
ORACLES["order_cycle_time_stats"] = """
    WITH gaps AS (
        SELECT o.o_orderpriority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE)) AS BIGINT)
                   AS gap
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority, count(*) AS n_lineitems,
           round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE),
                 6) AS mean_days,
           round(quantile_cont(gap, 0.5), 6) AS p50_days,
           round(quantile_cont(gap, 0.9), 6) AS p90_days,
           round(quantile_cont(gap, 0.99), 6) AS p99_days,
           min(gap) AS min_days, max(gap) AS max_days
    FROM gaps GROUP BY 1 ORDER BY 1
"""


def brand_concentration_hhi(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """Market-concentration report: the Herfindahl-Hirschman index
    (Σ share², the antitrust/procurement-risk staple) of BRAND revenue
    within each part type — the single-number answer to "is this
    category single-sourced?", with the DOJ's 1500/2500 banding
    (unconcentrated / moderate / high).  The category-level sibling
    of `parts_abc_pareto` (which ranks items; this scores MARKETS)
    and `customer_revenue_gini` (the customer-side concentration).

    Revenue is exact integer cents; brand shares are snapped to the
    1e-6 grid before squaring (the pow-drift discipline), so the HHI
    sum — in the conventional 0..10000 points — is exact integer
    arithmetic per market.  Scale: one (type, brand) revenue
    aggregate with map-side combine, one window-free second aggregate
    per type; markets × brands is catalog-bounded, never fact-
    bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_brand")
    rev = (li.join(F.broadcast(part),
                   li["l_partkey"] == part["p_partkey"])
           .groupBy("p_type", "p_brand")
           .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0)
                      .cast("long")).alias("cents")))
    tot = rev.groupBy("p_type").agg(F.sum("cents").alias("tot"),
                                    F.count(F.lit(1)).alias("n_brands"))
    share_u = F.round(F.col("cents").cast("double")
                      / F.col("tot").cast("double") * 1_000_000, 0
                      ).cast("long")
    hhi_pts = (F.sum(share_u * share_u).cast("double")
               / F.lit(100_000_000.0))
    scored = (rev.join(tot, "p_type")
              .groupBy("p_type")
              .agg(F.max("n_brands").alias("n_brands"),
                   F.round(F.max("tot").cast("double") / 100, 2)
                   .alias("revenue"),
                   F.round(hhi_pts, 6).alias("hhi")))
    band = (F.when(F.col("hhi") < 1500, F.lit("unconcentrated"))
            .when(F.col("hhi") < 2500, F.lit("moderate"))
            .otherwise(F.lit("high")))
    return (scored.withColumn("band", band)
            .orderBy("p_type"))


QUERIES["brand_concentration_hhi"] = brand_concentration_hhi
ORACLES["brand_concentration_hhi"] = """
    WITH rev AS (
        SELECT p.p_type, p.p_brand,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT p_type, CAST(sum(cents) AS BIGINT) AS tot,
               count(*) AS n_brands
        FROM rev GROUP BY 1
    ), scored AS (
        SELECT r.p_type, max(t.n_brands) AS n_brands,
               round(CAST(max(t.tot) AS DOUBLE) / 100, 2) AS revenue,
               round(CAST(sum(su * su) AS DOUBLE) / 100000000, 6)
                   AS hhi
        FROM (SELECT r0.p_type,
                     CAST(round(CAST(r0.cents AS DOUBLE)
                                / CAST(t0.tot AS DOUBLE) * 1000000,
                                0) AS BIGINT) AS su,
                     r0.cents
              FROM rev r0 JOIN tot t0 USING (p_type)) r
        JOIN tot t USING (p_type)
        GROUP BY r.p_type
    )
    SELECT p_type, n_brands, revenue, hhi,
           CASE WHEN hhi < 1500 THEN 'unconcentrated'
                WHEN hhi < 2500 THEN 'moderate'
                ELSE 'high' END AS band
    FROM scored ORDER BY p_type
"""


def parts_skyline_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query over the part catalog — the
    multi-criteria shortlist operator (Börzsönyi et al., ICDE 2001
    "The Skyline Operator"): the parts for which no other part is
    BOTH cheaper-or-equal AND larger-or-equal with at least one
    strict inequality (minimize retail price, maximize size) — i.e.
    the price/size trade-off curve a sourcing or serving-tier
    decision reads directly.

    The textbook definition is a quadratic NOT EXISTS self-join; the
    Spark plan is the O(n log n) sort-scan rewrite: per-price tier
    max size, one ordered window pass carrying the running max size
    over STRICTLY cheaper tiers, and a part is on the frontier iff it
    achieves its tier max and strictly beats every cheaper tier's
    best (ties on both axes are mutually non-dominating, so whole
    duplicate groups survive together — exactly the NOT EXISTS
    semantics, which the oracle pins by running the quadratic form).

    Scale shape: one price-keyed aggregate (map-side combined), one
    global sort over DISTINCT prices (tier cardinality, not fact
    cardinality), one shuffle join of parts to their tier row — no
    O(n²) pair enumeration anywhere.  At 100 TB the sort is the only
    wide stage, and AQE handles the tier-table skew."""
    part = load_table(spark, sf_dir, "part")
    tier = (part.groupBy("p_retailprice")
            .agg(F.max("p_size").alias("tier_max")))
    w = (Window.orderBy("p_retailprice")
         .rowsBetween(Window.unboundedPreceding, -1))
    tier = tier.withColumn("best_cheaper", F.max("tier_max").over(w))
    return (part.join(tier, "p_retailprice")
            .where((F.col("p_size") == F.col("tier_max"))
                   & (F.col("best_cheaper").isNull()
                      | (F.col("p_size") > F.col("best_cheaper"))))
            .select("p_partkey", "p_name",
                    F.round("p_retailprice", 2).alias("retail_price"),
                    "p_size"))


QUERIES["parts_skyline_frontier"] = parts_skyline_frontier
ORACLES["parts_skyline_frontier"] = """
    SELECT p.p_partkey, p.p_name,
           round(p.p_retailprice, 2) AS retail_price, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size))
"""


_PVB_Y0 = 1996
_PVB_Y1 = 1997


def revenue_price_volume_bridge(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """Price/volume/mix revenue bridge between two years, per part
    type — THE waterfall every revenue review runs: for parts sold in
    BOTH years, Δrev decomposes exactly as (Δp)·v0 [price effect] +
    p0·(Δv) [volume effect] + (Δp)(Δv) [mix/interaction]; parts sold
    only in one year land in new/lost columns.  The five effect
    columns sum EXACTLY to Δrev per type — the reconciliation
    identity is pinned in tests, which is what separates a bridge
    from four unrelated aggregates.

    Revenue in exact integer cents and integer-valued quantities; the
    per-(part,year) unit price p = rev/vol is one IEEE division, and
    the algebraic identity holds in floating point because every
    effect term is built from the SAME p0/p1/v0/v1 values.

    Scale: one (part, year) aggregate over the fact table (map-side
    combined), a part-keyed self-align via conditional aggregation
    (no join), one type-level rollup with the part dim broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    yr = F.year("l_shipdate")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    per = (li.where(yr.isin(_PVB_Y0, _PVB_Y1))
           .groupBy("l_partkey", yr.alias("y"))
           .agg(F.sum(cents).alias("rev"),
                F.sum(F.col("l_quantity").cast("long")).alias("vol")))
    aligned = (per.groupBy("l_partkey")
               .agg(F.sum(F.when(F.col("y") == _PVB_Y0, F.col("rev")))
                    .alias("rev0"),
                    F.sum(F.when(F.col("y") == _PVB_Y0, F.col("vol")))
                    .alias("vol0"),
                    F.sum(F.when(F.col("y") == _PVB_Y1, F.col("rev")))
                    .alias("rev1"),
                    F.sum(F.when(F.col("y") == _PVB_Y1, F.col("vol")))
                    .alias("vol1")))
    p0 = F.col("rev0").cast("double") / F.col("vol0")
    p1 = F.col("rev1").cast("double") / F.col("vol1")
    both = F.col("rev0").isNotNull() & F.col("rev1").isNotNull()
    eff = (aligned.join(F.broadcast(part),
                        aligned["l_partkey"] == part["p_partkey"])
           .select(
               "p_type",
               F.when(both, (p1 - p0) * F.col("vol0")).alias("price_c"),
               F.when(both, p0 * (F.col("vol1") - F.col("vol0")))
               .alias("volume_c"),
               F.when(both, (p1 - p0) * (F.col("vol1") - F.col("vol0")))
               .alias("mix_c"),
               F.when(F.col("rev0").isNull(), F.col("rev1"))
               .alias("new_c"),
               F.when(F.col("rev1").isNull(), F.col("rev0"))
               .alias("lost_c"),
               F.coalesce("rev0", F.lit(0)).alias("r0"),
               F.coalesce("rev1", F.lit(0)).alias("r1")))
    return (eff.groupBy("p_type")
            .agg(F.round(F.sum("r0") / 100.0, 2).alias("rev_y0"),
                 F.round(F.sum("r1") / 100.0, 2).alias("rev_y1"),
                 F.round((F.sum("r1") - F.sum("r0")) / 100.0, 2)
                 .alias("delta_rev"),
                 F.round(F.coalesce(F.sum("price_c"), F.lit(0.0))
                         / 100.0, 2).alias("price_effect"),
                 F.round(F.coalesce(F.sum("volume_c"), F.lit(0.0))
                         / 100.0, 2).alias("volume_effect"),
                 F.round(F.coalesce(F.sum("mix_c"), F.lit(0.0))
                         / 100.0, 2).alias("mix_effect"),
                 F.round(F.coalesce(F.sum("new_c"), F.lit(0))
                         / 100.0, 2).alias("new_parts_effect"),
                 F.round(F.coalesce(F.sum("lost_c"), F.lit(0))
                         / 100.0, 2).alias("lost_parts_effect"))
            .orderBy("p_type"))


QUERIES["revenue_price_volume_bridge"] = revenue_price_volume_bridge
ORACLES["revenue_price_volume_bridge"] = f"""
    WITH per AS (
        SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS y,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vol
        FROM lineitem
        WHERE year(l_shipdate) IN ({_PVB_Y0}, {_PVB_Y1})
        GROUP BY 1, 2
    ), aligned AS (
        SELECT l_partkey,
               sum(CASE WHEN y = {_PVB_Y0} THEN rev END) AS rev0,
               sum(CASE WHEN y = {_PVB_Y0} THEN vol END) AS vol0,
               sum(CASE WHEN y = {_PVB_Y1} THEN rev END) AS rev1,
               sum(CASE WHEN y = {_PVB_Y1} THEN vol END) AS vol1
        FROM per GROUP BY 1
    ), eff AS (
        SELECT p.p_type,
               CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL THEN
                   (CAST(rev1 AS DOUBLE) / vol1
                    - CAST(rev0 AS DOUBLE) / vol0) * vol0 END
                   AS price_c,
               CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL THEN
                   CAST(rev0 AS DOUBLE) / vol0 * (vol1 - vol0) END
                   AS volume_c,
               CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL THEN
                   (CAST(rev1 AS DOUBLE) / vol1
                    - CAST(rev0 AS DOUBLE) / vol0)
                   * (vol1 - vol0) END AS mix_c,
               CASE WHEN rev0 IS NULL THEN rev1 END AS new_c,
               CASE WHEN rev1 IS NULL THEN rev0 END AS lost_c,
               coalesce(rev0, 0) AS r0, coalesce(rev1, 0) AS r1
        FROM aligned a JOIN part p ON a.l_partkey = p.p_partkey
    )
    SELECT p_type,
           round(sum(r0) / 100.0, 2) AS rev_y0,
           round(sum(r1) / 100.0, 2) AS rev_y1,
           round((sum(r1) - sum(r0)) / 100.0, 2) AS delta_rev,
           round(coalesce(sum(price_c), 0) / 100.0, 2) AS price_effect,
           round(coalesce(sum(volume_c), 0) / 100.0, 2)
               AS volume_effect,
           round(coalesce(sum(mix_c), 0) / 100.0, 2) AS mix_effect,
           round(coalesce(sum(new_c), 0) / 100.0, 2)
               AS new_parts_effect,
           round(coalesce(sum(lost_c), 0) / 100.0, 2)
               AS lost_parts_effect
    FROM eff GROUP BY 1 ORDER BY 1
"""


_RB_PARTS = 5          # parts tracked (top by Q1 line count)
_RB_DAYS = 91          # 1996-Q1 spine — inside the recursion level limit
_RB_WEEKS = 13.0       # restock cadence denominator


def parts_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped inventory running balance — the warehouse ledger:
    ``stock_t = max(0, stock_{t-1} + inflow_t − outflow_t)`` per part
    over the 1996-Q1 day spine, with weekly restocks sized to the
    part's average weekly demand (ceil) and demand = that day's
    shipped quantity.  The ``max(0, .)`` clamp looks like it forces
    a sequential recursion — but it is the LINDLEY recursion
    (queueing's waiting-time equation), whose reflection identity
    ``stock_t = S_t - min(0, min_{k<=t} S_k)`` (S = running net-flow
    sum) turns the whole ledger into TWO ordered windows; shortage_t
    = max(0, m_{t-1} - S_t) falls out of the same prefix minimum.
    Spark runs that O(n) window algebra; the ORACLE runs the
    definitional day-by-day clamp recursion as a recursive CTE — two
    different algorithms, one answer, so the reflection identity
    itself is what the driver hash checks (the house bin-and-refine
    pattern: the definition oracles, the fast form executes; a prior
    draft ran the recursion in Spark too and paid 91 join stages,
    38 s at sf0.1 — the window form is sub-second).  Shortage_t =
    unmet demand that day — the stockout report.

    Exactness: quantities are integral (BIGINT after round); prefix
    sums and minima are integer window aggregates.

    Scale shape: one lineitem scan pre-aggregated to (part, day) —
    the only data-sized stage; then two part-partitioned windows
    over spine rows (no recursion, no per-level scheduling)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01")))
    top = (li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 0).cast("bigint").alias("tot_q"))
        .orderBy(F.col("n_lines").desc(), F.col("l_partkey").asc())
        .limit(_RB_PARTS)
        .select(F.col("l_partkey").alias("pk"),
                F.ceil(F.col("tot_q") / _RB_WEEKS).cast("bigint")
                .alias("restock")))
    demand = (li.join(F.broadcast(top),
                      li.l_partkey == top.pk)
              .groupBy("pk", F.to_date("l_shipdate").alias("day"))
              .agg(F.round(F.sum("l_quantity"), 0).cast("bigint")
                   .alias("outflow")))
    spine = (top.select(
        "pk", "restock",
        F.explode(F.sequence(F.to_date(F.lit("1996-01-01")),
                             F.to_date(F.lit("1996-03-31"))))
        .alias("day"))
        .withColumn("t", F.datediff("day",
                                    F.to_date(F.lit("1996-01-01"))) + 1)
        .join(demand, ["pk", "day"], "left")
        .select("pk", "t", "day",
                F.when((F.col("t") % 7) == 1, F.col("restock"))
                .otherwise(F.lit(0)).cast("bigint").alias("inflow"),
                F.coalesce("outflow", F.lit(0)).cast("bigint")
                .alias("outflow")))
    wseq = Window.partitionBy("pk").orderBy("t")
    wcum = wseq.rowsBetween(Window.unboundedPreceding, 0)
    wprev = wseq.rowsBetween(Window.unboundedPreceding, -1)
    net = (F.col("inflow") - F.col("outflow")).cast("bigint")
    led = (spine
           .withColumn("s", F.sum(net).over(wcum))
           .withColumn("m_prev",
                       F.least(F.lit(0).cast("bigint"),
                               F.coalesce(F.min("s").over(wprev),
                                          F.lit(0).cast("bigint")))))
    stock = (F.col("s")
             - F.least(F.col("m_prev"), F.col("s"))).cast("bigint")
    shortage = F.greatest(F.lit(0).cast("bigint"),
                          (F.col("m_prev") - F.col("s")).cast("bigint"))
    return (led.select(F.col("pk").alias("p_partkey"), "t", "day",
                       "inflow", "outflow",
                       stock.alias("stock"),
                       shortage.alias("shortage"))
            .orderBy("p_partkey", "t"))


QUERIES["parts_running_balance"] = parts_running_balance
ORACLES["parts_running_balance"] = f"""
    WITH RECURSIVE li AS (
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    ), top AS (
        SELECT l_partkey AS pk,
               CAST(ceil(CAST(round(sum(l_quantity), 0) AS BIGINT)
                         / {_RB_WEEKS}) AS BIGINT) AS restock
        FROM li GROUP BY l_partkey
        ORDER BY count(*) DESC, l_partkey ASC LIMIT {_RB_PARTS}
    ), demand AS (
        SELECT tp.pk, CAST(l.l_shipdate AS DATE) AS day,
               CAST(round(sum(l.l_quantity), 0) AS BIGINT) AS outflow
        FROM li l JOIN top tp ON l.l_partkey = tp.pk
        GROUP BY tp.pk, CAST(l.l_shipdate AS DATE)
    ), spine AS (
        SELECT tp.pk, tp.restock, d.day,
               datediff('day', DATE '1996-01-01', d.day) + 1 AS t
        FROM top tp CROSS JOIN (
            SELECT unnest(generate_series(DATE '1996-01-01',
                                          DATE '1996-03-31',
                                          INTERVAL 1 DAY))::DATE AS day
        ) d
    ), flow AS (
        SELECT s.pk, s.t, s.day,
               CAST(CASE WHEN s.t % 7 = 1 THEN s.restock ELSE 0 END
                    AS BIGINT) AS inflow,
               CAST(coalesce(dm.outflow, 0) AS BIGINT) AS outflow
        FROM spine s LEFT JOIN demand dm
          ON dm.pk = s.pk AND dm.day = s.day
    ), bal(pk, t, stock, shortage) AS (
        SELECT pk, t,
               CAST(greatest(0, inflow - outflow) AS BIGINT),
               CAST(greatest(0, outflow - inflow) AS BIGINT)
        FROM flow WHERE t = 1
        UNION ALL
        SELECT f.pk, f.t,
               CAST(greatest(0, b.stock + f.inflow - f.outflow)
                    AS BIGINT),
               CAST(greatest(0, f.outflow - b.stock - f.inflow)
                    AS BIGINT)
        FROM bal b JOIN flow f ON f.pk = b.pk AND f.t = b.t + 1
    )
    SELECT b.pk AS p_partkey, b.t, f.day, f.inflow, f.outflow,
           b.stock, b.shortage
    FROM bal b JOIN flow f ON f.pk = b.pk AND f.t = b.t
    ORDER BY p_partkey, b.t
"""


def dow_type_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey MEDIAN POLISH of the (day-of-week × event-type) mean-value
    grid (Tukey 1977, EDA ch. 11) — the robust two-way decomposition:
    cell ≈ row_effect(dow) + col_effect(type) + residual, fitted by
    alternately sweeping out row and column MEDIANS (two full sweeps
    unrolled).  Where a two-way ANOVA mean fit lets one anomalous
    cell drag a whole row's effect, the median sweeps shrug it off —
    the residual grid is the honest "which (dow, type) cell is
    actually weird" heatmap behind seasonality-aware anomaly triage.

    Exactness: the grid is 7×5, so every row median is over 5 values
    and every column median over 7 — both ODD, so each median is a
    middle ORDER STATISTIC (no interpolation ever happens); stages
    re-round at 1e-6.  The unroll is the declarative form of the
    iterate-until-stable loop; two sweeps is Tukey's own default for
    reporting, and the residual-median column shows how close to
    converged the fit is.

    Scale: one events scan to a 35-cell aggregate; the polish is four
    grid-sized groupBy+broadcast-join rounds — free at any corpus
    size."""
    ev = load_table(spark, sf_dir, "events")
    # r9 (guide §2.4): cut the 35-cell grid — each polish stage below
    # references its predecessor twice (median agg + join back), so the
    # uncut plan re-ran the events scan+aggregate 2^5 = 32 times
    cells = (ev.groupBy(F.dayofweek("ts").alias("dow"),
                        F.col("event_type"))
             .agg(F.round(F.avg("value"), 6).alias("cell"))
             .localCheckpoint())
    med = lambda c: F.expr(f"percentile({c}, 0.5D)")  # noqa: E731

    rm1 = cells.groupBy("dow").agg(F.round(med("cell"), 6).alias("rm1"))
    s1 = (cells.join(F.broadcast(rm1), "dow")
          .withColumn("r1", F.round(F.col("cell") - F.col("rm1"), 6)))
    cm1 = s1.groupBy("event_type").agg(F.round(med("r1"), 6).alias("cm1"))
    s2 = (s1.join(F.broadcast(cm1), "event_type")
          .withColumn("r2", F.round(F.col("r1") - F.col("cm1"), 6)))
    rm2 = s2.groupBy("dow").agg(F.round(med("r2"), 6).alias("rm2"))
    s3 = (s2.join(F.broadcast(rm2), "dow")
          .withColumn("r3", F.round(F.col("r2") - F.col("rm2"), 6)))
    cm2 = s3.groupBy("event_type").agg(F.round(med("r3"), 6).alias("cm2"))
    s4 = (s3.join(F.broadcast(cm2), "event_type")
          .withColumn("residual", F.round(F.col("r3") - F.col("cm2"), 6)))
    return (s4.select("dow", "event_type", "cell",
                      F.round(F.col("rm1") + F.col("rm2"), 6)
                      .alias("row_effect"),
                      F.round(F.col("cm1") + F.col("cm2"), 6)
                      .alias("col_effect"),
                      "residual")
            .orderBy("dow", "event_type"))


QUERIES["dow_type_median_polish"] = dow_type_median_polish
ORACLES["dow_type_median_polish"] = """
    WITH cells AS (
        SELECT dayofweek(CAST(ts AS DATE)) + 1 AS dow, event_type,
               round(avg(value), 6) AS cell
        FROM events GROUP BY 1, 2
    ), rm1 AS (
        SELECT dow, round(median(cell), 6) AS rm1
        FROM cells GROUP BY dow
    ), s1 AS (
        SELECT c.*, r.rm1, round(c.cell - r.rm1, 6) AS r1
        FROM cells c JOIN rm1 r USING (dow)
    ), cm1 AS (
        SELECT event_type, round(median(r1), 6) AS cm1
        FROM s1 GROUP BY event_type
    ), s2 AS (
        SELECT s.*, c.cm1, round(s.r1 - c.cm1, 6) AS r2
        FROM s1 s JOIN cm1 c USING (event_type)
    ), rm2 AS (
        SELECT dow, round(median(r2), 6) AS rm2
        FROM s2 GROUP BY dow
    ), s3 AS (
        SELECT s.*, r.rm2, round(s.r2 - r.rm2, 6) AS r3
        FROM s2 s JOIN rm2 r USING (dow)
    ), cm2 AS (
        SELECT event_type, round(median(r3), 6) AS cm2
        FROM s3 GROUP BY event_type
    )
    SELECT s.dow, s.event_type, s.cell,
           round(s.rm1 + s.rm2, 6) AS row_effect,
           round(s.cm1 + c.cm2, 6) AS col_effect,
           round(s.r3 - c.cm2, 6) AS residual
    FROM s3 s JOIN cm2 c USING (event_type)
    ORDER BY s.dow, s.event_type
"""


_NV_CU = 4.0    # underage cost (lost margin per unit short)
_NV_CO = 1.0    # overage cost (holding per unit left over)
_NV_PARTS = 10  # parts reported (highest-demand, deterministic)


def newsvendor_stock_levels(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """NEWSVENDOR optimal stock per part (Arrow-Harris-Marschak 1951;
    the critical-fractile rule): with underage cost c_u = 4 and
    overage cost c_o = 1, the profit-maximizing stock is the
    demand-distribution quantile at the critical fractile
    c_u/(c_u+c_o) = 0.8 — the DECISION operator the
    `parts_running_balance` ledger simulates around and every
    replenishment system solves daily.  Demand = daily shipped
    quantity over 1996-H1 for the 10 highest-demand parts; reported
    next to the optimal stock: expected daily shortage and leftover
    AT that stock (exact empirical expectations), so the cost trade
    the fractile optimizes is visible in units.

    Exactness: daily demands are integer quantity sums (zero-demand
    days included via the date spine — dropping them biases the
    quantile up); the 0.8 quantile is the same linear-interpolation
    percentile both engines compute on integers; shortage/leftover
    expectations are integer sums divided once.

    Scale: one lineitem scan pre-aggregated to (part, day); the
    quantile + expectation stages run on |parts| x days rows."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01")))
    dd = (li.groupBy(F.col("l_partkey").alias("pk"),
                     F.col("l_shipdate").alias("day"))
          .agg(F.sum("l_quantity").cast("long").alias("q")))
    tot = (dd.groupBy("pk").agg(F.sum("q").alias("tq"))
           .orderBy(F.col("tq").desc(), F.col("pk").asc())
           .limit(_NV_PARTS))
    # r9 (guide §2.4): cut the (10 parts × days) demand spine — the
    # quantile pass and the shortage/leftover expectation pass each
    # reference it (and qtl is read twice more), so the uncut plan
    # re-ran the lineitem scan+top-k chain 18 times for ~1.8k rows
    spine = (tot.crossJoin(
        F.broadcast(li.select(F.col("l_shipdate").alias("day"))
                    .distinct()))
        .join(dd, ["pk", "day"], "left")
        .select("pk", "tq", "day",
                F.coalesce("q", F.lit(0)).cast("long").alias("q"))
        .localCheckpoint())
    frac = _NV_CU / (_NV_CU + _NV_CO)
    qtl = (spine.groupBy("pk", "tq")
           .agg(F.expr(f"percentile(q, {frac!r})").alias("stock"),
                F.count(F.lit(1)).alias("n_days")))
    j = (spine.join(F.broadcast(qtl.select("pk", "stock")), "pk")
         .groupBy("pk")
         .agg(F.sum(F.greatest(F.col("q") - F.col("stock"),
                               F.lit(0.0))).alias("short_sum"),
              F.sum(F.greatest(F.col("stock") - F.col("q"),
                               F.lit(0.0))).alias("over_sum")))
    return (qtl.join(j, "pk")
            .select(F.col("pk").alias("p_partkey"),
                    F.col("tq").alias("total_demand"), "n_days",
                    F.round("stock", 6).alias("opt_stock"),
                    F.round(F.col("short_sum")
                            / F.col("n_days").cast("double"), 6)
                    .alias("exp_daily_shortage"),
                    F.round(F.col("over_sum")
                            / F.col("n_days").cast("double"), 6)
                    .alias("exp_daily_leftover"))
            .orderBy(F.col("total_demand").desc(),
                     F.col("p_partkey").asc()))


QUERIES["newsvendor_stock_levels"] = newsvendor_stock_levels
ORACLES["newsvendor_stock_levels"] = f"""
    WITH li AS (
        SELECT l_partkey AS pk, l_shipdate AS day,
               CAST(l_quantity AS BIGINT) AS lq
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1996-07-01'
    ), dd AS (
        SELECT pk, day, CAST(sum(lq) AS BIGINT) AS q
        FROM li GROUP BY 1, 2
    ), tot AS (
        SELECT pk, CAST(sum(q) AS BIGINT) AS tq
        FROM dd GROUP BY 1
        ORDER BY tq DESC, pk ASC LIMIT {_NV_PARTS}
    ), days AS (SELECT DISTINCT day FROM li),
    spine AS (
        SELECT t.pk, t.tq, d.day, coalesce(x.q, 0) AS q
        FROM tot t CROSS JOIN days d
        LEFT JOIN dd x ON x.pk = t.pk AND x.day = d.day
    ), qtl AS (
        SELECT pk, tq,
               quantile_cont(q, {_NV_CU / (_NV_CU + _NV_CO)!r})
                   AS stock,
               CAST(count(*) AS BIGINT) AS n_days
        FROM spine GROUP BY 1, 2
    )
    SELECT s.pk AS p_partkey, q2.tq AS total_demand, q2.n_days,
           round(q2.stock, 6) AS opt_stock,
           round(sum(greatest(s.q - q2.stock, 0.0))
                 / CAST(q2.n_days AS DOUBLE), 6)
               AS exp_daily_shortage,
           round(sum(greatest(q2.stock - s.q, 0.0))
                 / CAST(q2.n_days AS DOUBLE), 6)
               AS exp_daily_leftover
    FROM spine s JOIN qtl q2 USING (pk)
    GROUP BY s.pk, q2.tq, q2.n_days, q2.stock
    ORDER BY total_demand DESC, p_partkey ASC
"""
