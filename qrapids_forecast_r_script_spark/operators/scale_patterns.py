"""Scale-pattern operators: the two join strategies a 100 TB cluster job
reaches for when broadcast is off the table — key salting for skew, and
bucketed co-located joins for shuffle elimination — each exercised as a
driver query with an exact DuckDB oracle (the rewrites are
result-preserving by construction, so the oracle is the naive form).

The reference never joins (SURVEY §2B: joins ABSENT); this is pure
engine-extension surface for the training-data-pipeline north star.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..sources import load_table

_SALT_BUCKETS = 16
_N_BUCKETS = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim join via key salting: weighted event value per
    event_type.

    ``event_type`` has 5 values with a heavily skewed distribution — the
    canonical Zipf key.  A plain shuffle join on it puts each hot key on
    ONE reducer (5 partitions do all the work regardless of cluster
    size).  The salting rewrite: the fact side gets a deterministic salt
    ``xxhash64(event_id) mod 16``, the dim side is exploded ×16 (bounded
    blow-up of the SMALL side only), and the join key becomes
    (event_type, salt) — 80 evenly-spread partitions instead of 5 hot
    ones.  The ``shuffle_hash`` hint keeps the demo honest (Catalyst
    would otherwise broadcast the 5-row dim, which is the right call at
    THIS size but unavailable when the dim is tens of GB).  The final
    re-aggregation by event_type is safe because map-side partial
    aggregation collapses each partition before the second (tiny)
    shuffle — the standard two-stage skew-agg pattern.

    Result is salt-invariant, so the oracle is the naive join.
    """
    ev = load_table(spark, sf_dir, "events")
    # 5-row dim derived in closed form so the oracle can reproduce it.
    dim = (ev.select("event_type").distinct()
           .withColumn("weight", F.length("event_type") * F.lit(0.1)))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT_BUCKETS)])))
    fact = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(_SALT_BUCKETS)))
    return (fact.join(salted_dim.hint("shuffle_hash"),
                      ["event_type", "salt"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value") * F.col("weight")), 4)
                  .alias("weighted_value"))
            .orderBy("event_type"))


def _bucketed_table(spark: SparkSession, df: DataFrame, table: str,
                    bucket_col: str, path: str) -> DataFrame:
    """Bucketed table, written at most once per path.

    First run pays the clustering write (``bucketBy`` + ``saveAsTable``).
    Later sessions find the files on disk and only re-register the
    catalog entry (bucket spec + location) via DDL — the read then uses
    the persisted bucket layout with no write and no shuffle.  This IS
    the bucketing contract at scale: cluster once, amortize forever.
    """
    if spark.catalog.tableExists(table):
        return spark.table(table)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                         for f in df.schema.fields)
        spark.sql(f"""
            CREATE TABLE {table} ({cols}) USING parquet
            CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col})
            INTO {_N_BUCKETS} BUCKETS
            LOCATION '{path}'""")
        return spark.table(table)
    (df.write.bucketBy(_N_BUCKETS, bucket_col).sortBy(bucket_col)
     .mode("overwrite").option("path", path)
     .format("parquet").saveAsTable(table))
    return spark.table(table)


def bucketed_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join: orders ⋈ customer over bucketed
    tables, aggregated to market segment.

    Both sides are written ``bucketBy(8, <join key>)`` — Spark's
    persistent hash-clustering (one file group per bucket).  Because the
    bucket counts and keys match, the sort-merge join consumes the
    bucketed layout directly: NO Exchange on either join input
    (asserted in tests/test_plan_shapes.py).  At 100 TB this is the
    fact-to-fact strategy: pay the partitioning once at write time,
    amortize it over every subsequent join on that key.  The ``merge``
    hint disables the broadcast Catalyst would pick at test scale —
    bucketing targets the both-sides-huge regime.

    Bucketed copies land under /tmp keyed by scale factor; bucketing is
    layout-only, so the naive join is an exact oracle.
    """
    from ..sources import source_fingerprint
    from ..sources.registry import cached_artifact_dir
    # fingerprints guard against cross-round testdata regeneration: a
    # bucketed layout of last round's bytes must not serve this round;
    # two-table layout → append the second table's fingerprint
    base = (cached_artifact_dir("qrapids_bucketed", sf_dir, "customer")
            + source_fingerprint(sf_dir, "orders"))
    tag = os.path.basename(base)     # catalog table names key on it too
    cust = _bucketed_table(
        spark, load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment"),
        f"bkt_customer_{tag}", "c_custkey", f"{base}/customer")
    orders = _bucketed_table(
        spark, load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice"),
        f"bkt_orders_{tag}", "o_custkey", f"{base}/orders")
    return (cust.hint("merge")
            .join(orders, cust.c_custkey == orders.o_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"))
            .orderBy("c_mktsegment"))


_Z_BITS = 11                     # bits per dimension (user_id < 2048)
_Z_BIN_SHIFT = 12                # zbin = zval >> 12: 16-512 bins across sf0.001-0.1


def _interleave(a, b):
    """Bit-interleave two ``_Z_BITS``-bit integer columns into a Morton
    (z-order) value: a's bit i lands at 2i, b's at 2i+1."""
    z = F.lit(0).cast("bigint")
    for i in range(_Z_BITS):
        z = (z
             + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zorder_bin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering of events on (user_id, hour):
    per z-bin row counts and min/max of BOTH dimensions.

    The 100 TB layout technique this demonstrates: sorting a fact table
    by the interleaved bits of two filter columns gives every file/bin a
    TIGHT min/max range on each dimension simultaneously — so parquet
    min/max stats prune scans for predicates on either column, where a
    single-column sort only prunes its own column.  The emitted min/max
    per bin IS the skipping index a writer would persist; the bounded
    fraction of bins a 1-dim predicate touches is asserted in
    tests/test_plan_shapes.py.

    Pure integer bit arithmetic (shift/and), identical in the SQL
    oracle; no shuffle beyond the 64-row aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    hour = ((F.dayofmonth("ts") - 1) * 24 + F.hour("ts")).cast("bigint")
    binned = ev.select(
        F.col("user_id"),
        hour.alias("hour_idx"),
        F.shiftright(_interleave(F.col("user_id"), hour), _Z_BIN_SHIFT)
        .alias("zbin"))
    return (binned.groupBy("zbin")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("user_id").alias("min_user"),
                 F.max("user_id").alias("max_user"),
                 F.min("hour_idx").alias("min_hour"),
                 F.max("hour_idx").alias("max_hour"))
            .orderBy("zbin"))


def _z_sql(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# SCD-1 upsert: every 7th order key gets a deterministic "update" record
_UPSERT_MOD = 7


def orders_upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / SCD-type-1 upsert expressed on plain parquet: an
    updates batch (derived deterministically from orders — every
    ``o_orderkey % 7 == 0`` gets a repriced, restatused record) is
    merged into the base table, latest version per key winning.

    The engine has no transactional table format in this container, so
    the merge is the union + per-key latest-record window — the exact
    reduction Delta/Iceberg MERGE performs under the hood when it cannot
    prune files.  100 TB shape: ONE shuffle, keyed by the merge key; on
    a real cluster the base table would be bucketed by ``o_orderkey``
    (see :func:`bucketed_orders_join`) so only the (small) updates side
    moves.  A version tiebreak on a unique key is total, so the survivor
    set is deterministic and fully oracled.
    """
    from pyspark.sql.window import Window

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "src_version"]
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(0).alias("src_version"))
    # +1000.00 surcharge, not a 1.1 multiplier: a multiplier lands some
    # prices exactly on a third decimal's half-way point, where Spark
    # (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
    # (binary rint) round differently — the strict audit caught 2 such
    # rows at sf0.01.  Addition keeps the value 2-decimal, so round is
    # boundary-free on both engines.
    updates = (orders
               .where(F.col("o_orderkey") % _UPSERT_MOD == 0)
               .select("o_orderkey", "o_custkey",
                       F.lit("U").alias("o_orderstatus"),
                       F.round(F.col("o_totalprice") + 1000.0, 2)
                       .alias("o_totalprice"),
                       F.lit(1).alias("src_version")))
    w = Window.partitionBy("o_orderkey").orderBy(F.col("src_version").desc())
    return (base.unionByName(updates)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(*cols))


def orders_upsert_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 upsert — the HISTORY-keeping sibling of
    :func:`orders_upsert_scd1`: instead of the latest record winning,
    every version of a key survives with its validity interval
    (``effective_from`` / ``effective_to`` version stamps) and an
    ``is_current`` flag — the standard dimension-table shape for
    point-in-time joins and reproducible training-data snapshots
    ("which document versions existed when this model trained?").

    The closure is ONE window pass over the unioned versions:
    ``effective_to = lead(src_version)`` per key in version order, and
    ``is_current = effective_to IS NULL`` — no self-join, no per-version
    scan.  100 TB shape: a single shuffle keyed by the merge key (same
    contract as SCD-1); on a real cluster the base would be bucketed by
    the key so only the small updates side moves.  The version stamp is
    unique per key, so intervals are total and the result is exactly
    oracled.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(0).alias("src_version"))
    # +1000.00 surcharge, not a multiplier — same rounding-boundary
    # rationale as SCD-1 above
    updates = (orders
               .where(F.col("o_orderkey") % _UPSERT_MOD == 0)
               .select("o_orderkey",
                       F.lit("U").alias("o_orderstatus"),
                       F.round(F.col("o_totalprice") + 1000.0, 2)
                       .alias("o_totalprice"),
                       F.lit(1).alias("src_version")))
    w = Window.partitionBy("o_orderkey").orderBy("src_version")
    hist = (base.unionByName(updates)
            .withColumn("effective_to", F.lead("src_version").over(w)))
    return hist.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.col("src_version").alias("effective_from"),
        "effective_to",
        F.col("effective_to").isNull().alias("is_current"))


_FRAG_FILES = 200                 # deliberate fragmentation degree
_COMPACT_TARGET_BYTES = 32 << 20  # per-file size target after compaction


def _compact_dirs(sf_dir: str) -> tuple[str, str]:
    from ..sources.registry import cached_artifact_dir
    # events fingerprint: stale fragments from a regenerated testdata
    # round must force a rewrite (same rule as the bucketed layouts)
    base = cached_artifact_dir("qrapids_compact", sf_dir, "events")
    return f"{base}/fragmented", f"{base}/compacted"


def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance pass every long-running
    100 TB ingest needs: streaming/incremental writers leave thousands of
    KB-sized parquet files per partition, and scan cost degrades from
    data-bound to file-open-bound (driver-side listing, one footer read
    + task per file).

    The demo fragments ``events`` into 200 tiny files (written once,
    cached under /tmp keyed by sf), then the compaction pass sizes its
    output as ``ceil(input_bytes / 32 MB)`` and rewrites with a single
    round-robin ``repartition`` — the same bin-packing OPTIMIZE performs
    in Delta/Iceberg.  At scale the repartition count derives from the
    file listing the driver already has, compaction runs per-partition
    (so it parallelizes and restarts cleanly), and readers never block:
    parquet rewrites are atomic at the directory-commit level.

    The returned query aggregates the COMPACTED copy per event_type; the
    oracle is the same aggregate over the ORIGINAL table, so a hash
    match proves the rewrite is byte-lossless on every column that feeds
    the aggregate (count, value sum, distinct users).  File-count
    reduction is asserted separately in tests/test_curation.py.
    """
    import math

    frag, compacted = _compact_dirs(sf_dir)
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        (load_table(spark, sf_dir, "events")
         .repartition(_FRAG_FILES).write.mode("overwrite").parquet(frag))
    if not os.path.exists(os.path.join(compacted, "_SUCCESS")):
        total = sum(e.stat().st_size for e in os.scandir(frag)
                    if e.name.endswith(".parquet"))
        n_out = max(1, math.ceil(total / _COMPACT_TARGET_BYTES))
        (spark.read.parquet(frag)
         .repartition(n_out).write.mode("overwrite").parquet(compacted))
    return (spark.read.parquet(compacted)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"),
                 F.count_distinct("user_id").alias("n_users"))
            .orderBy("event_type"))


def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a skewed key: count, sum, max AND
    count-distinct-users per event_type, pre-aggregated by
    (event_type, salt) then merged.

    The single-stage form puts each hot key's final merge on ONE reducer;
    with 5 Zipf keys, 5 partitions do all the work no matter the cluster
    size.  Salting spreads stage 1 across 16× more partitions; stage 2
    merges 16 tiny partials per key.  count/sum/max re-aggregate
    losslessly; the distinct-user count survives because stage 1 keeps
    the distinct USER SET per (key, salt) — ``collect_set`` — and stage 2
    counts the union's distinct members.  (Spark's map-side partial
    aggregation does this automatically for most aggs; the explicit form
    is the template for aggregates the partial-agg planner can't split,
    e.g. exact distincts over skewed keys.)  At extreme per-key user
    cardinality the set-per-bucket form gives way to a (key, user)
    pre-dedup shuffle or the HLL sketch (``distinct_users_hll``) — the
    set must fit an executor here.  Result is salt-invariant → the
    oracle is the plain GROUP BY.
    """
    ev = load_table(spark, sf_dir, "events")
    stage1 = (ev
              .withColumn("salt",
                          F.pmod(F.xxhash64("event_id"),
                                 F.lit(_SALT_BUCKETS)))
              .groupBy("event_type", "salt")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("value").alias("sv"),
                   F.max("value").alias("mx"),
                   F.collect_set("user_id").alias("users")))
    return (stage1
            .groupBy("event_type")
            .agg(F.sum("n").alias("n_events"),
                 F.round(F.sum("sv"), 2).alias("sum_value"),
                 F.round(F.max("mx"), 6).alias("max_value"),
                 F.size(F.array_distinct(
                     F.flatten(F.collect_list("users")))).cast("long")
                 .alias("n_users"))
            .orderBy("event_type"))


# Count-Min sketch: depth × width counter table.  Constants, so the
# sketch is broadcastable and its build is a map-side partial aggregate
# regardless of stream length.  Deterministic universal hashing (same
# (a·x + b) mod p mod w family as the MinHash/Bloom operators; a < 2^30
# keeps a·x below 2^62 under ANSI overflow checking on both engines).
_CMS_P = 4294967311
_CMS_PARAMS = [(1103515245, 12345), (214013, 2531011),
               (22695477, 1), (1664525, 1013904223)]
_CMS_DEPTH = len(_CMS_PARAMS)
_CMS_WIDTH = 256
_CMS_TOP = 10


def cms_heavy_hitters(spark: SparkSession, sf_dir: str,
                      width: int = _CMS_WIDTH) -> DataFrame:
    """Count-Min-sketch heavy hitters (Cormode & Muthukrishnan 2005)
    built in PURE Catalyst: the per-user event-count estimate is
    ``min over d of counter[d][h_d(user)]`` on a fixed depth×width
    counter table, reported for the top-``_CMS_TOP`` users alongside
    their exact counts (CMS guarantees estimate ≥ exact; equality when
    the user's cells carry no collisions).

    Unlike the built-in HLL/percentile sketches (opaque internal state →
    rows-only driver checks), this hand-built sketch is fully
    deterministic, so it carries an EXACT SQL oracle — the sketch
    contents themselves are hash-checked, not just sanity-bounded.

    Scale shape: the counter build is a map-side partial aggregate into
    d·w = 1024 cells (constant — the entire sketch broadcasts); the
    estimate lookup is a broadcast join.  The exact-count column is the
    verification baseline for the demo — at true scale you keep only
    the sketch (that is its point) and the exact shuffle disappears.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cell_structs = [
        F.struct(F.lit(d).alias("d"),
                 ((F.col("user_id") * F.lit(a) + F.lit(b))
                  % F.lit(_CMS_P) % F.lit(width)).alias("cell"))
        for d, (a, b) in enumerate(_CMS_PARAMS)]
    counters = (ev.select(F.explode(F.array(*cell_structs)).alias("x"))
                .groupBy(F.col("x.d").alias("d"),
                         F.col("x.cell").alias("cell"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    user_cells = exact.select(
        "user_id", "exact_count",
        F.explode(F.array(*cell_structs)).alias("x"))
    est = (user_cells
           .join(F.broadcast(counters),
                 (F.col("x.d") == F.col("d"))
                 & (F.col("x.cell") == F.col("cell")))
           .groupBy("user_id", "exact_count")
           .agg(F.min("cnt").alias("est_count")))
    # TakeOrdered first (no global-sort shuffle over the full user set);
    # the rank window then runs over only the k surviving rows
    top = (est.orderBy(F.col("est_count").desc(), F.col("user_id").asc())
           .limit(_CMS_TOP))
    w = Window.orderBy(F.col("est_count").desc(), F.col("user_id").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "user_id", "est_count", "exact_count"))


def orders_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD-2 payoff: AS-OF reconstruction.  For each version stamp
    v, the table as it existed at v is exactly the rows with
    ``effective_from <= v < coalesce(effective_to, ∞)`` — one predicate,
    no log replay.  Emitted per (version, status): row count and a
    2-dp price checksum, proving v=0 reproduces the pre-update table
    byte-for-byte and v=1 shows exactly the upserted rows — the
    reproducible-training-snapshot query ("rebuild the corpus the model
    trained on").

    Scale: the history table is read once; both reconstructions are
    predicate filters over it (partition-prunable on effective_from in
    a production layout), aggregated per status."""
    hist = orders_upsert_scd2(spark, sf_dir)
    outs = []
    for v in (0, 1):
        asof = hist.where((F.col("effective_from") <= v)
                          & (F.col("effective_to").isNull()
                             | (F.col("effective_to") > v)))
        outs.append(asof.groupBy("o_orderstatus")
                    .agg(F.count(F.lit(1)).alias("n_orders"),
                         F.round(F.sum("o_totalprice"), 2)
                         .alias("total_price"))
                    .select(F.lit(v).alias("as_of_version"),
                            "o_orderstatus", "n_orders", "total_price"))
    a, b = outs
    return a.unionByName(b).orderBy("as_of_version", "o_orderstatus")


# incremental aggregation cutoff: history = events strictly before this
# date, the "daily batch" = events on/after it (events span 2024-01)
_INC_CUTOFF = "2024-01-25"


def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate MAINTENANCE — the production ETL shape that
    makes a 100 TB history affordable: yesterday's per-key aggregate
    STATE (count / sum / min / max — all algebraic, so partials merge
    losslessly) is combined with the new day's partial aggregate, and
    history is NEVER rescanned.  Here both sides derive from the same
    events table split at a cutoff date, and the oracle computes the
    full-table aggregate directly — a hash match proves merge(state,
    delta) == recompute(everything), which is the correctness contract
    of every incremental pipeline.

    Scale shape: each side is one keyed partial aggregate over ONLY its
    own slice (the history side would be a stored state table in
    production, read not recomputed); the merge is a same-key full-outer
    union-groupBy — one shuffle of two already-aggregated (tiny) sides.
    Non-algebraic aggregates (exact distinct) need the set/sketch
    treatment (`salted_skew_agg` keeps sets; `distinct_users_hll` is the
    mergeable-sketch path) — deliberately excluded here.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_INC_CUTOFF).cast("date")

    def _partial(df: DataFrame) -> DataFrame:
        return (df.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.sum("value").alias("sum_value"),
                     F.min("value").alias("min_value"),
                     F.max("value").alias("max_value")))

    history = _partial(ev.where(F.to_date("ts") < cutoff))
    delta = _partial(ev.where(F.to_date("ts") >= cutoff))
    return (history.unionByName(delta)
            .groupBy("event_type")
            .agg(F.sum("n_events").alias("n_events"),
                 F.round(F.sum("sum_value"), 4).alias("sum_value"),
                 F.round(F.min("min_value"), 6).alias("min_value"),
                 F.round(F.max("max_value"), 6).alias("max_value"))
            .orderBy("event_type"))


QUERIES = {
    "salted_skew_join": salted_skew_join,
    "salted_skew_agg": salted_skew_agg,
    "bucketed_orders_join": bucketed_orders_join,
    "zorder_bin_stats": zorder_bin_stats,
    "orders_upsert_scd1": orders_upsert_scd1,
    "orders_upsert_scd2": orders_upsert_scd2,
    "orders_scd2_asof": orders_scd2_asof,
    "compact_small_files": compact_small_files,
    "cms_heavy_hitters": cms_heavy_hitters,
    "incremental_agg_merge": incremental_agg_merge,
}

_CMS_PARAMS_SQL = ", ".join(
    f"({d}, {a}, {b})" for d, (a, b) in enumerate(_CMS_PARAMS))

ORACLES = {
    "salted_skew_join": """
        SELECT e.event_type,
               count(*) AS n_events,
               round(sum(e.value * d.weight), 4) AS weighted_value
        FROM events e
        JOIN (SELECT DISTINCT event_type,
                     length(event_type) * 0.1 AS weight
              FROM events) d USING (event_type)
        GROUP BY e.event_type
        ORDER BY e.event_type
    """,
    "bucketed_orders_join": """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "salted_skew_agg": """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(max(value), 6) AS max_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "compact_small_files": """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "orders_upsert_scd1": f"""
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   round(o_totalprice, 2) AS o_totalprice,
                   0 AS src_version
            FROM orders
        ), updates AS (
            SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   round(o_totalprice + 1000.0, 2) AS o_totalprice,
                   1 AS src_version
            FROM orders WHERE o_orderkey % {_UPSERT_MOD} = 0
        ), merged AS (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
                       ORDER BY src_version DESC) AS rn
            FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               src_version
        FROM merged WHERE rn = 1
    """,
    "orders_upsert_scd2": f"""
        WITH base AS (
            SELECT o_orderkey, o_orderstatus,
                   round(o_totalprice, 2) AS o_totalprice,
                   0 AS src_version
            FROM orders
        ), updates AS (
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   round(o_totalprice + 1000.0, 2) AS o_totalprice,
                   1 AS src_version
            FROM orders WHERE o_orderkey % {_UPSERT_MOD} = 0
        ), hist AS (
            SELECT *, lead(src_version) OVER (PARTITION BY o_orderkey
                       ORDER BY src_version) AS effective_to
            FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
        )
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               src_version AS effective_from, effective_to,
               effective_to IS NULL AS is_current
        FROM hist
    """,
    "orders_scd2_asof": f"""
        WITH hist AS (
            SELECT o_orderkey, o_orderstatus,
                   round(o_totalprice, 2) AS o_totalprice,
                   0 AS src_version
            FROM orders
            UNION ALL
            SELECT o_orderkey, 'U', round(o_totalprice + 1000.0, 2), 1
            FROM orders WHERE o_orderkey % {_UPSERT_MOD} = 0
        ), closed AS (
            SELECT *, lead(src_version) OVER (PARTITION BY o_orderkey
                       ORDER BY src_version) AS effective_to
            FROM hist
        ), versions(v) AS (VALUES (0), (1))
        SELECT ver.v AS as_of_version, c.o_orderstatus,
               count(*) AS n_orders,
               round(sum(c.o_totalprice), 2) AS total_price
        FROM closed c JOIN versions ver
          ON c.src_version <= ver.v
         AND (c.effective_to IS NULL OR c.effective_to > ver.v)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "incremental_agg_merge": """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value
        FROM events
        GROUP BY 1 ORDER BY 1
    """,
    "cms_heavy_hitters": f"""
        WITH params(d, a, b) AS (VALUES {_CMS_PARAMS_SQL}),
        counters AS (
            SELECT p.d, (e.user_id * p.a + p.b) % {_CMS_P} % {_CMS_WIDTH}
                       AS cell,
                   count(*) AS cnt
            FROM events e, params p GROUP BY 1, 2
        ), exact AS (
            SELECT user_id, count(*) AS exact_count FROM events GROUP BY 1
        ), est AS (
            SELECT x.user_id, x.exact_count, min(c.cnt) AS est_count
            FROM (SELECT u.user_id, u.exact_count, p.d,
                         (u.user_id * p.a + p.b) % {_CMS_P} % {_CMS_WIDTH}
                             AS cell
                  FROM exact u, params p) x
            JOIN counters c ON c.d = x.d AND c.cell = x.cell
            GROUP BY 1, 2
        )
        SELECT rank, user_id, est_count, exact_count FROM (
            SELECT *, row_number() OVER (ORDER BY est_count DESC,
                                         user_id ASC) AS rank
            FROM est)
        WHERE rank <= {_CMS_TOP}
    """,
    "zorder_bin_stats": f"""
        WITH z AS (
            SELECT user_id,
                   CAST((day(ts) - 1) * 24 + hour(ts) AS BIGINT) AS hour_idx,
                   ({_z_sql('user_id', 'CAST((day(ts) - 1) * 24 + hour(ts) AS BIGINT)')})
                       >> {_Z_BIN_SHIFT} AS zbin
            FROM events
        )
        SELECT zbin,
               count(*) AS n_events,
               min(user_id) AS min_user,
               max(user_id) AS max_user,
               min(hour_idx) AS min_hour,
               max(hour_idx) AS max_hour
        FROM z
        GROUP BY zbin
        ORDER BY zbin
    """,
}


# ---------------------------------------------------------------------------
# Round-4 continuation: incremental JOIN-view maintenance — the delta
# algebra that keeps a materialized join view fresh without
# recomputing it.

_IJV_ORD_MOD = 10    # orders delta = md5 bucket 0 (~10% of rows)
_IJV_CUST_MOD = 20   # customer delta = md5 bucket 0 (~5% of rows)


def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a materialized JOIN view (the
    insert-only delta rule every IVM engine implements — Blakeley et
    al. 1986; DBSP/Materialize's linear case):

        V_new = (A∪ΔA) ⋈ (B∪ΔB)
              = A⋈B  ∪  A⋈ΔB  ∪  ΔA⋈B  ∪  ΔA⋈ΔB,

    so a view over append-only inputs updates from three DELTA joins —
    each bounded by a delta size, never |A|·|B| — instead of one full
    recompute.  Here A = orders, B = customer (the enriched-orders
    view), with deterministic md5 buckets carving out ΔA (~10%) and
    ΔB (~5%); the query BUILDS the view incrementally from the four
    pieces and aggregates per market segment.  The ORACLE computes the
    full join directly — the driver's hash equality IS the proof of
    the maintenance identity.

    Exactness: counts + exact integer cents.  Scale: the three delta
    joins ship only delta-sized probe sides (broadcast when tiny); the
    A⋈B term is the stored view, not recomputation — represented here
    by its own join since the harness has no persisted state, with the
    same keys and shapes."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ob = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                            1, 8), 16, 10).cast("long") % _IJV_ORD_MOD
    cb = F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")),
                            1, 8), 16, 10).cast("long") % _IJV_CUST_MOD
    orders = orders.withColumn("is_delta", ob == 0)
    cust = cust.withColumn("is_delta", cb == 0)
    a_old = orders.where(~F.col("is_delta"))
    d_a = orders.where(F.col("is_delta"))
    b_old = cust.where(~F.col("is_delta"))
    d_b = cust.where(F.col("is_delta"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    def piece(a: DataFrame, b: DataFrame) -> DataFrame:
        return (a.join(b, a["o_custkey"] == b["c_custkey"])
                .select(F.col("c_mktsegment"), cents.alias("cents")))

    view = (piece(a_old, b_old)
            .unionByName(piece(a_old, d_b))
            .unionByName(piece(d_a, b_old))
            .unionByName(piece(d_a, d_b)))
    return (view.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .orderBy("c_mktsegment"))


# The oracle is the FULL recompute — hash equality proves the four-way
# delta decomposition is lossless and overlap-free.
ORACLES["incremental_join_view"] = """
    SELECT c_mktsegment, count(*) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
"""
QUERIES["incremental_join_view"] = incremental_join_view


_ERASE_MOD = 50    # erasure set: md5(user/cust key) bucket 0 (~2%)


def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten PROPAGATION audit (the GDPR Art. 17 /
    CCPA deletion job every lakehouse runs on a schedule): a
    deterministic erasure cohort (md5 bucket — retry-stable, the
    sampling idiom) is deleted from ``customer`` and the deletion
    CASCADES along the FK graph: the cohort's ``orders``, those
    orders' ``lineitem`` rows, and the cohort's ``events`` (the
    unconstrained edge `fk_integrity_audit` documents).  Emitted as
    the audit table — per table: rows before, rows erased, rows
    after, erased fraction — the artifact a privacy officer signs,
    not a silent transform.

    The deletes are anti-joins (the deletion-vector reduction: at
    scale each becomes a MERGE ... WHEN MATCHED THEN DELETE or a DV
    stamp — same key plumbing); the cascade ships only key columns.
    Exactness: pure integer counts.  Scale: one anti-join per edge,
    each keyed by the FK already shuffled for the join layer;
    lineitem never materializes more than the deleted-orders key
    set."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    erased = (cust.where(
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")),
                           1, 8), 16, 10).cast("long")
        % _ERASE_MOD == 0)
        .select("c_custkey").localCheckpoint())
    # r9 (guide §2.4): cut the dead-order key set too — the orders AND
    # lineitem audits each semi-join against it, so uncut the
    # orders⋈erased chain replanned per consumer
    dead_orders = (orders.join(
        erased.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .select("o_orderkey").localCheckpoint())

    def audit(name: str, df: DataFrame, dead: DataFrame,
              key: str) -> DataFrame:
        # r9 (guide §2.4): ONE scan per table — before-count and
        # erased-count were two separate passes (a plain count + a
        # semi-join count); a left join against the key set (key-unique
        # by construction: both cohorts project primary keys) marks
        # erased rows so one conditional aggregate yields both counts
        marked = (dead.withColumnRenamed(dead.columns[0], key)
                  .withColumn("__dead", F.lit(1)))
        # no broadcast hint (r10, ADVICE r9): dead can be the ~2%-of-
        # customers order-key set — corpus-grain — so the hint bypassed
        # autoBroadcastJoinThreshold and risked a driver OOM at scale;
        # AQE picks the join strategy from the real sizes at runtime
        both = (df.select(key).join(marked, key, "left")
                .groupBy().agg(F.count(F.lit(1)).alias("rows_before"),
                               F.count("__dead").alias("rows_erased")))
        return (both
                .select(F.lit(name).alias("table_name"),
                        "rows_before", "rows_erased",
                        (F.col("rows_before") - F.col("rows_erased"))
                        .alias("rows_after"),
                        F.round(F.col("rows_erased").cast("double")
                                / F.col("rows_before").cast("double"), 6)
                        .alias("erased_frac")))

    out = (audit("customer", cust, erased, "c_custkey")
           .unionByName(audit("orders", orders, dead_orders,
                              "o_orderkey"))
           .unionByName(audit("lineitem", li, dead_orders,
                              "l_orderkey"))
           .unionByName(audit("events", ev, erased, "user_id")))
    return out.orderBy("table_name")


ORACLES["user_erasure_audit"] = f"""
    WITH erased AS (
        SELECT c_custkey FROM customer
        WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                  ::BIGINT % {_ERASE_MOD} = 0
    ), dead_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erased)
    ), audit AS (
        SELECT 'customer' AS table_name,
               (SELECT count(*) FROM customer) AS rows_before,
               (SELECT count(*) FROM customer
                WHERE c_custkey IN (SELECT c_custkey FROM erased))
                   AS rows_erased
        UNION ALL
        SELECT 'orders', (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders
                WHERE o_orderkey IN (SELECT o_orderkey
                                     FROM dead_orders))
        UNION ALL
        SELECT 'lineitem', (SELECT count(*) FROM lineitem),
               (SELECT count(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey
                                     FROM dead_orders))
        UNION ALL
        SELECT 'events', (SELECT count(*) FROM events),
               (SELECT count(*) FROM events
                WHERE user_id IN (SELECT c_custkey FROM erased))
    )
    SELECT table_name, rows_before, rows_erased,
           rows_before - rows_erased AS rows_after,
           round(CAST(rows_erased AS DOUBLE)
                 / CAST(rows_before AS DOUBLE), 6) AS erased_frac
    FROM audit ORDER BY table_name
"""
QUERIES["user_erasure_audit"] = user_erasure_audit


def orders_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC op-log APPLY — the missing third of the lakehouse-merge
    family next to `orders_upsert_scd1` (latest-wins upsert, no
    deletes) and `orders_upsert_scd2` (full history): a deterministic
    insert/update/delete change log is applied onto the base snapshot
    by per-key LAST-OP-WINS over the op sequence, with DELETE
    tombstones dropping keys and later re-INSERTs resurrecting them —
    exactly the reduction a Delta/Iceberg `MERGE ... WHEN MATCHED
    DELETE` chain performs, including the D-then-I ordering case
    (seq 2 deletes every key ≡ 3 (mod 10); seq 3 re-inserts the ≡ 3
    (mod 100) subset at a marker price, so survival depends on op
    ORDER, not op presence).

    One union + one per-key window (the SCD shuffle shape, keyed by
    the merge key); tombstones cost a row until the window drops
    them.  Exact integer/2-decimal arithmetic throughout (the +1000
    surcharge idiom — no multiplier rounding boundaries)."""
    from pyspark.sql.window import Window
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    base = orders.select(
        *cols[:3], F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(0).alias("seq"), F.lit("I").alias("op"))
    upd = (orders.where(F.col("o_orderkey") % 7 == 0)
           .select("o_orderkey", "o_custkey",
                   F.lit("U").alias("o_orderstatus"),
                   F.round(F.col("o_totalprice") + 1000.0, 2)
                   .alias("o_totalprice"),
                   F.lit(1).alias("seq"), F.lit("U").alias("op")))
    dels = (orders.where(F.col("o_orderkey") % 10 == 3)
            .select("o_orderkey", "o_custkey",
                    F.lit(None).cast("string").alias("o_orderstatus"),
                    F.lit(None).cast("double").alias("o_totalprice"),
                    F.lit(2).alias("seq"), F.lit("D").alias("op")))
    reins = (orders.where(F.col("o_orderkey") % 100 == 3)
             .select("o_orderkey", "o_custkey",
                     F.lit("R").alias("o_orderstatus"),
                     F.lit(9999.99).alias("o_totalprice"),
                     F.lit(3).alias("seq"), F.lit("I").alias("op")))
    log = base.unionAll(upd).unionAll(dels).unionAll(reins)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
    latest = (log
              .withColumn("rn", F.row_number().over(w))
              .withColumn("n_ops",
                          F.count(F.lit(1)).over(
                              Window.partitionBy("o_orderkey")))
              .where((F.col("rn") == 1) & (F.col("op") != "D")))
    return (latest.select("o_orderkey", "o_custkey", "o_orderstatus",
                          "o_totalprice",
                          F.col("seq").alias("last_seq"), "n_ops")
            .orderBy("o_orderkey"))


QUERIES["orders_cdc_apply"] = orders_cdc_apply
ORACLES["orders_cdc_apply"] = """
    WITH log AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice, 2) AS o_totalprice,
               0 AS seq, 'I' AS op
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U',
               round(o_totalprice + 1000.0, 2), 1, 'U'
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, CAST(NULL AS VARCHAR),
               CAST(NULL AS DOUBLE), 2, 'D'
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT o_orderkey, o_custkey, 'R', 9999.99, 3, 'I'
        FROM orders WHERE o_orderkey % 100 = 3
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY o_orderkey
                                  ORDER BY seq DESC) AS rn,
               count(*) OVER (PARTITION BY o_orderkey) AS n_ops
        FROM log
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(seq AS INTEGER) AS last_seq, n_ops
    FROM ranked
    WHERE rn = 1 AND op != 'D'
    ORDER BY o_orderkey
"""


_CH_SHARDS = 8    # baseline shard count
_CH_VNODES = 8    # virtual nodes per shard (Karger's smoothing knob)


def consistent_hash_rebalance(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Consistent-hash shard assignment of the document corpus and
    the REBALANCE DIFF when one shard joins (Karger et al. 1997;
    the Dynamo/Cassandra partitioner) — the data-placement operator
    behind every shard map: each of 8 shards projects 8 virtual
    nodes onto the md5 ring, a doc lands on the nearest vnode AT OR
    BELOW its own hash (the predecessor rule; hashes below the first
    vnode wrap to the ring's lowest point), and adding a 9th shard
    moves ONLY
    the keys that now fall in the new shard's arcs — measured here
    next to the naive ``hash % N`` partitioner, which reshuffles
    almost everything (the reason mod-N resharding is a 100 TB
    outage and ring resharding is a background trickle).

    Per shard: baseline doc count, count after the 9th shard joins,
    docs moved ring-wise, and docs the MOD-N scheme would have moved
    — all exact integer counts from one assignment join; every hash
    is the house md5-prefix rule, so both engines derive the
    identical ring and the identical verdict.

    Scale: the ring is a (shards x vnodes) literal relation
    broadcast into a 64-way min-reduce per doc (map-side, no
    shuffle of the corpus); the diff is a per-doc comparison of two
    broadcast assignments — placement never shuffles the data it
    places."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                           1, 15), 16, 10).cast("bigint")
    keyed = docs.select("doc_id", h.alias("h"))

    def ring(n_shards):
        pts = spark.range(n_shards * _CH_VNODES).select(
            (F.col("id") % n_shards).cast("int").alias("shard"),
            F.conv(F.substring(F.md5(F.concat_ws(
                ":", F.lit("ring"),
                (F.col("id") % n_shards).cast("string"),
                (F.col("id") / n_shards).cast("int").cast("string"))),
                1, 15), 16, 10).cast("bigint").alias("rh"))
        wrap = pts.orderBy("rh").limit(1).select(
            F.col("shard").alias("wrap_shard"))
        return pts, wrap

    def assign(n_shards, out):
        pts, wrap = ring(n_shards)
        nxt = (keyed.join(F.broadcast(pts), h >= F.col("rh"), "left")
               .groupBy("doc_id", "h")
               .agg(F.max_by("shard", "rh").alias("cw")))
        # docs past the last ring point wrap to the globally first
        return (nxt.crossJoin(F.broadcast(wrap))
                .select("doc_id", "h",
                        F.coalesce("cw", "wrap_shard").alias(out)))

    a8 = assign(_CH_SHARDS, "s8")
    a9 = assign(_CH_SHARDS + 1, "s9")
    both = (a8.join(a9.select("doc_id", "s9"), "doc_id")
            .withColumn("mod8", F.pmod("h", F.lit(_CH_SHARDS)))
            .withColumn("mod9", F.pmod("h", F.lit(_CH_SHARDS + 1))))
    return (both.groupBy(F.col("s8").alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count(F.when(F.col("s8") == F.col("s9"), 1))
                 .alias("n_stay"),
                 F.count(F.when(F.col("s8") != F.col("s9"), 1))
                 .alias("n_moved_ring"),
                 F.count(F.when(F.col("mod8") != F.col("mod9"), 1))
                 .alias("n_moved_modn"))
            .orderBy("shard"))


QUERIES["consistent_hash_rebalance"] = consistent_hash_rebalance
_CH_RING_SQL = """
        SELECT CAST(i % {n} AS INT) AS shard,
               CAST(('0x' || substr(md5('ring:' || CAST(i % {n}
                        AS VARCHAR) || ':' || CAST(i // {n}
                        AS VARCHAR)), 1, 15))::BIGINT AS BIGINT) AS rh
        FROM range({total}) t(i)
"""
ORACLES["consistent_hash_rebalance"] = f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                     1, 15))::BIGINT AS BIGINT) AS h
        FROM documents
    ), ring8 AS ({_CH_RING_SQL.format(
        n=_CH_SHARDS, total=_CH_SHARDS * _CH_VNODES)}),
    ring9 AS ({_CH_RING_SQL.format(
        n=_CH_SHARDS + 1, total=(_CH_SHARDS + 1) * _CH_VNODES)}),
    w8 AS (SELECT shard AS wrap8 FROM ring8 ORDER BY rh LIMIT 1),
    w9 AS (SELECT shard AS wrap9 FROM ring9 ORDER BY rh LIMIT 1),
    a8 AS (
        SELECT k.doc_id, k.h,
               coalesce(max_by(r.shard, r.rh), any_value(x.wrap8))
                   AS s8
        FROM keyed k
        LEFT JOIN ring8 r ON k.h >= r.rh
        CROSS JOIN w8 x
        GROUP BY k.doc_id, k.h
    ), a9 AS (
        SELECT k.doc_id,
               coalesce(max_by(r.shard, r.rh), any_value(x.wrap9))
                   AS s9
        FROM keyed k
        LEFT JOIN ring9 r ON k.h >= r.rh
        CROSS JOIN w9 x
        GROUP BY k.doc_id
    )
    SELECT a8.s8 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE a8.s8 = a9.s9) AS BIGINT)
               AS n_stay,
           CAST(count(*) FILTER (WHERE a8.s8 != a9.s9) AS BIGINT)
               AS n_moved_ring,
           CAST(count(*) FILTER (WHERE a8.h % {_CH_SHARDS}
                != a8.h % {_CH_SHARDS + 1}) AS BIGINT)
               AS n_moved_modn
    FROM a8 JOIN a9 USING (doc_id)
    GROUP BY a8.s8 ORDER BY shard
"""
