"""Third relational tranche: the remaining TPC-H query *shapes*, adapted
to the driver's slimmed star schema (no partsupp / comment / phone /
commitdate columns — see TESTDATA.md), so that all 22 classic shapes are
covered by oracled queries:

already covered elsewhere: Q1 Q3 Q4 Q5 Q6 Q12 Q14 (relational.py /
relational_ext.py).  This module adds Q2 Q7 Q8 Q9 Q10 Q11 Q13 Q15 Q16
Q17 Q18 Q19 Q20 Q21 Q22 equivalents.

Adaptations (documented per query): partsupp-based costs are replaced by
lineitem-derived unit prices or ``p_retailprice``; phone country codes by
nation keys; comment filters by priority/acctbal predicates; the
commitdate/receiptdate lateness test (Q21) by a strictly-latest-shipper
test.  The *relational shape* — correlated scalar subquery, groupwise
min, double aggregation over an outer join, HAVING vs a global scalar,
OR-of-conjunction predicate blocks, anti-join with scalar threshold — is
preserved in each case; that is what the engine must execute well.

Scale notes apply to every query here: region/nation are constant-size
→ always ``F.broadcast``; customer/supplier/part scale with the facts
(TPC-H proportions) → join strategy left to AQE's runtime stats
(broadcast at test SFs, shuffle-hash/sort-merge at 100 TB).  Windowed
rewrites of correlated subqueries are used wherever they save a rescan
of the fact table — same semantics, one shuffle instead of two scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: groupwise-min correlated subquery — for each part,
    the supplier with the lowest observed avg unit price.

    Adaptation: no partsupp, so unit price = avg(l_extendedprice /
    l_quantity) per (part, supplier) from lineitem.  The classic
    ``WHERE cost = (SELECT min(cost) ... WHERE partkey = p_partkey)``
    becomes a rank-1 window over (part), ordered by rounded price with
    suppkey tiebreak — one shuffle, no per-row rescan, deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pricing = (li.groupBy("l_partkey", "l_suppkey")
               .agg(F.round(F.avg(F.col("l_extendedprice")
                                  / F.col("l_quantity")), 4)
                     .alias("unit_price")))
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = (pricing.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).drop("rn"))
    return (best
            .join(part.where((F.col("p_size") == 10)
                             & (F.col("p_type") == "STANDARD")),
                  best.l_partkey == F.col("p_partkey"))
            .join(supp, best.l_suppkey == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("p_partkey", "p_name", "s_name",
                    F.col("n_name").alias("supp_nation"), "unit_price"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade volume — double nation join
    (supplier nation x customer nation) with a symmetric pair predicate,
    revenue per (supp_nation, cust_nation, year)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(n1), supp.s_nationkey == F.col("sn_key"))
            .join(F.broadcast(n2), cust.c_nationkey == F.col("cn_key"))
            .where(pair)
            .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                   & (F.col("l_shipdate") < F.lit("1998-01-01")))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — conditional-sum ratio per year over
    a 7-table star join (share of ASIA-customer PROMO-part revenue
    supplied by NATION_5)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nat = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (li
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .join(cust, orders.o_custkey == cust.c_custkey)
              .join(supp, li.l_suppkey == supp.s_suppkey)
              .join(part.where(F.col("p_type") == "PROMO"),
                    li.l_partkey == F.col("p_partkey"))
              .join(F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"),
                                           F.col("n_regionkey").alias("cr_key"))),
                    cust.c_nationkey == F.col("cn_key"))
              .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                    F.col("cr_key") == F.col("r_regionkey"))
              .join(F.broadcast(nat.select(F.col("n_nationkey").alias("sn_key"),
                                           F.col("n_name").alias("supp_nation"))),
                    supp.s_nationkey == F.col("sn_key")))
    target = F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(F.lit(0.0))
    return (joined
            .groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(target) / F.sum(rev), 6).alias("mkt_share"),
                 F.round(F.sum(rev), 2).alias("total_revenue"))
            .orderBy("o_year"))


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, year) for parts whose
    name matches a token.  Adaptation: no ps_supplycost → cost proxy is
    ``0.6 * p_retailprice * l_quantity``; the LIKE-filter + multi-join +
    two-level grouping shape is intact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (li
            .join(part.where(F.col("p_name").like("%widget%")),
                  li.l_partkey == F.col("p_partkey"))
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer in a quarter,
    top 20 — group-by over a 4-table join then global top-k (per-partition
    top-20 merged on the driver, never a full sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.where(F.col("l_returnflag") == "R")
            .join(orders.where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                               & (F.col("o_orderdate") < F.lit("1996-04-01"))),
                  li.l_orderkey == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name",
                     F.round("c_acctbal", 2).alias("c_acctbal"),
                     F.col("n_name").alias("nation"))
            # rounded to 1 decimal: at 2 the sf0.01 sum for one customer
            # lands ~1e-10 from a .xx5 boundary and Spark/DuckDB disagree
            .agg(F.round(F.sum(rev), 1).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with HAVING against a *global*
    scalar aggregate (value > fraction of the total over the same set).

    Adaptation: part value = sum(l_extendedprice) of lines shipped by
    suppliers of three nations (no partsupp).  Spark form: aggregate
    once, then cross-join the single-row total — the scalar subquery
    becomes a broadcast of one row, not a rescan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nations = [1, 2, 3]
    filtered = (li.join(supp.where(F.col("s_nationkey").isin(nations)),
                        li.l_suppkey == F.col("s_suppkey")))
    per_part = (filtered.groupBy("l_partkey")
                .agg(F.sum("l_extendedprice").alias("value")))
    total = per_part.agg((F.sum("value") * 0.001).alias("threshold"))
    return (per_part.crossJoin(F.broadcast(total))
            .where(F.col("value") > F.col("threshold"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.round("value", 2).alias("part_value"))
            .orderBy(F.col("part_value").desc(), "p_partkey"))


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation over an outer join — order
    count per customer (left join keeps zero-order customers; the
    comment anti-filter becomes a priority filter), then the histogram
    of those counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders") \
        .where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy(cust.c_custkey)
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue view + scalar-max selection — the
    supplier(s) whose quarterly revenue equals the maximum.  Spark form:
    aggregate once, broadcast the one-row max, equi-filter on the rounded
    value (both sides rounded identically → stable equality)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                    & (F.col("l_shipdate") < F.lit("1996-04-01")))
           .groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                 .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (rev.crossJoin(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("max_revenue"))
            .join(supp, F.col("l_suppkey") == supp.s_suppkey)
            .select(F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")))


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute combo
    with a NOT-IN supplier exclusion.  Adaptation: supplier-part pairs
    come from lineitem; the complaint-comment exclusion becomes
    ``s_acctbal < 0`` (anti-join, null-safe by construction)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (li
            .join(part.where((F.col("p_brand") != "Brand#1")
                             & (F.col("p_size").isin(1, 5, 10, 15, 20))),
                  li.l_partkey == F.col("p_partkey"))
            .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"))


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-avg subquery — lines with
    quantity below 20% of that part's average quantity, for one brand.
    Spark form: the per-part average is a window over the brand-filtered
    join (one shuffle), not a re-scanning subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(part.where(F.col("p_brand") == "Brand#1"),
                     li.l_partkey == F.col("p_partkey"))
    w = Window.partitionBy("p_partkey")
    return (joined
            .withColumn("avg_qty", F.avg("l_quantity").over(w))
            .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                  .alias("avg_yearly"),
                 F.count(F.lit(1)).alias("n_lines")))


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-HAVING semi-join — orders whose total
    quantity exceeds 250 (≈ p99 here), joined back to customer and
    re-aggregated."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("total_qty"))
           .where(F.col("total_qty") > 250))
    return (orders.join(big, orders.o_orderkey == big.l_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_custkey", "c_name", "o_orderkey",
                    F.col("o_orderdate").cast("date").alias("o_orderdate"),
                    F.round("o_totalprice", 2).alias("o_totalprice"),
                    F.round("total_qty", 1).alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(100))


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive predicate blocks spanning
    both join sides — the classic test that the optimizer still pushes
    the join key and per-side predicates through a disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    block = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30)))
    return (j.where(block)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers who shipped more
    than 100 units of 'red *' parts in 1996, listed with their nation.
    Spark form: aggregate the inner fact subquery, then a left-semi join
    into supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    heavy = (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                      & (F.col("l_shipdate") < F.lit("1997-01-01")))
             .join(part.where(F.col("p_name").like("red%")),
                   li.l_partkey == F.col("p_partkey"), "left_semi")
             .groupBy("l_suppkey")
             .agg(F.sum("l_quantity").alias("qty"))
             .where(F.col("qty") > 100)
             .select("l_suppkey"))
    return (supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
            .orderBy("s_suppkey"))


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS self-joins on the fact table.
    Adaptation (no commitdate/receiptdate): a supplier "kept the order
    waiting" when, in a multi-supplier order, its latest shipment is
    strictly later than every other supplier's.

    Spark form: per (order, supplier) max shipdate, then one window over
    the order computes (supplier count, order max, #suppliers at max) —
    "uniquely latest in a multi-supplier order" replaces the classic
    EXISTS(other supplier) AND NOT EXISTS(other supplier shipped later
    or tied) pair with a single shuffle instead of two self-joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_os = (li.groupBy("l_orderkey", "l_suppkey")
              .agg(F.max("l_shipdate").alias("smax")))
    w = Window.partitionBy("l_orderkey")
    flagged = (per_os
               .withColumn("n_supp", F.count(F.lit(1)).over(w))
               .withColumn("omax", F.max("smax").over(w))
               .withColumn("n_at_max",
                           F.sum(F.when(F.col("smax") == F.col("omax"), 1)
                                 .otherwise(0)).over(w)))
    waiting = flagged.where((F.col("n_supp") > 1)
                            & (F.col("smax") == F.col("omax"))
                            & (F.col("n_at_max") == 1))
    return (waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20))


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti-join + scalar-avg threshold — "rich but
    lapsed" customers: above the average positive balance AND no order
    since 2000-01-01 (every customer here has *some* order, so the
    classic NOT EXISTS is date-restricted), grouped by nation (the
    phone-prefix proxy)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = (orders.where(F.col("o_orderdate") >= F.lit("2000-01-01"))
              .select("o_custkey"))
    avg_pos = (cust.where(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    return (cust.crossJoin(F.broadcast(avg_pos))
            .where(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").alias("nationkey"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("nationkey"))


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_stock": q11_important_stock,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_part_promotion_suppliers": q20_part_promotion_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    "q2_min_cost_supplier": """
        WITH pricing AS (
            SELECT l_partkey, l_suppkey,
                   round(avg(l_extendedprice / l_quantity), 4) AS unit_price
            FROM lineitem GROUP BY 1, 2
        ), best AS (
            SELECT *, row_number() OVER (PARTITION BY l_partkey
                        ORDER BY unit_price, l_suppkey) AS rn
            FROM pricing
        )
        SELECT p_partkey, p_name, s_name,
               n_name AS supp_nation, unit_price
        FROM best
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE rn = 1 AND p_size = 10 AND p_type = 'STANDARD'
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q8_market_share": """
        SELECT year(o_orderdate) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6)
                   AS mkt_share,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        GROUP BY 1 ORDER BY 1
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
               n_name AS nation,
               round(sum(l_extendedprice * (1 - l_discount)), 1) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q11_important_stock": """
        WITH per_part AS (
            SELECT l_partkey, sum(l_extendedprice) AS value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE s_nationkey IN (1, 2, 3)
            GROUP BY 1
        )
        SELECT l_partkey AS p_partkey, round(value, 2) AS part_value
        FROM per_part
        WHERE value > (SELECT sum(value) * 0.001 FROM per_part)
        ORDER BY part_value DESC, p_partkey
    """,
    "q13_customer_distribution": """
        WITH per_cust AS (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        WITH j AS (
            SELECT l_quantity, l_extendedprice,
                   avg(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#1'
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
               count(*) AS n_lines
        FROM j WHERE l_quantity < 0.2 * avg_qty
    """,
    "q18_large_volume_customers": """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               round(o_totalprice, 2) AS o_totalprice,
               round(total_qty, 1) AS total_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY 1
              HAVING sum(l_quantity) > 250) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_discounted_revenue": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q20_part_promotion_suppliers": """
        SELECT s_suppkey, s_name, n_name AS nation
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'red%')
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 100)
        ORDER BY s_suppkey
    """,
    "q21_waiting_suppliers": """
        WITH per_os AS (
            SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
            FROM lineitem GROUP BY 1, 2
        ), win1 AS (
            SELECT *,
                   count(*) OVER w AS n_supp,
                   max(smax) OVER w AS omax
            FROM per_os
            WINDOW w AS (PARTITION BY l_orderkey)
        ), flagged AS (
            SELECT *,
                   sum(CASE WHEN smax = omax THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS n_at_max
            FROM win1
        )
        SELECT s_name, count(*) AS numwait
        FROM flagged JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp > 1 AND smax = omax AND n_at_max = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q22_global_sales_opportunity": """
        SELECT c_nationkey AS nationkey,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1 ORDER BY 1
    """,
}
