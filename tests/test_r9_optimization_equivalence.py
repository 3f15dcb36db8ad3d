"""Round-9 optimization equivalence pins.

The r9 optimization round changed HOW several operators compute —
lineage cuts, a shared-index refactor, and two expression-form swaps —
while the driver contract requires WHAT they compute to stay
bit-identical.  The oracle suite already pins every query's end-to-end
output; these tests pin the specific internal equivalences the
optimizations rely on, so a future edit that breaks one fails here by
name instead of as an opaque oracle mismatch.
"""

from pyspark.sql import functions as F


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivf_topk_precomputed_assigned_is_identity(spark, sf_dir):
    """The nprobe sweep feeds ivf_topk a PRE-BUILT (and pre-filtered)
    index frame — its results must equal the self-built path exactly
    (same centroids, same cells, same probe sets)."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        _SWEEP_NPROBES, _N_QUERIES, _ivf_assigned, ivf_topk)

    plain = ivf_topk(spark, sf_dir, nprobe=max(_SWEEP_NPROBES))
    assigned = (_ivf_assigned(spark, sf_dir)
                .where((F.col("rn") == 1)
                       | ((F.col("vec_id") < _N_QUERIES)
                          & (F.col("rn") <= max(_SWEEP_NPROBES))))
                .localCheckpoint())
    via_assigned = ivf_topk(spark, sf_dir, nprobe=max(_SWEEP_NPROBES),
                            assigned=assigned)
    assert _rows(plain) == _rows(via_assigned)


def test_unrolled_popcount_equals_hof_fold(spark):
    """lsh_precision_recall's unrolled popcount must equal the
    aggregate(zip_with(...)) fold it replaced — integer addition is
    associative, so this is exact, not approximate."""
    nwords = 7
    df = spark.range(2000).select(
        "id",
        F.array(*[(F.col("id") * F.lit(2654435761 + i)).cast("long")
                  for i in range(nwords)]).alias("bits_a"),
        F.array(*[(F.col("id") * F.lit(40503 + i)).cast("long")
                  for i in range(nwords)]).alias("bits_b"))
    fold = F.aggregate(
        F.zip_with("bits_a", "bits_b",
                   lambda x, y: F.bit_count(x.bitwiseAND(y)).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    unrolled = F.expr(
        "CAST(0 AS BIGINT) + " + " + ".join(
            f"CAST(bit_count(bits_a[{i}] & bits_b[{i}]) AS BIGINT)"
            for i in range(nwords)))
    assert df.where(fold != unrolled).count() == 0


def test_expr_text_projections_equal_column_fold(spark, sf_dir):
    """_nd_band_vals' expr-text projections must reproduce the old
    Column-HOF fold bit-for-bit (same left-to-right IEEE addition
    sequence), so the LSH band assignment — and every pair the bands
    admit — is unchanged."""
    from qrapids_forecast_r_script_spark.operators.similarity import (
        _ND_BANDS, _ND_BITS, _nd_band_vals, _nd_planes, _as_double)
    from qrapids_forecast_r_script_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v"))
    planes = _nd_planes()
    old_vals = []
    for band in range(_ND_BANDS):
        v = F.lit(0)
        for i in range(_ND_BITS):
            plane = planes[band * _ND_BITS + i]
            proj = F.aggregate(
                F.zip_with(F.col("v"),
                           F.array(*[F.lit(float(p)) for p in plane]),
                           lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x)
            v = v + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        old_vals.append(v)
    cmp = emb.select(
        F.array(*old_vals).alias("old"),
        F.array(*_nd_band_vals("v")).alias("new"))
    assert cmp.where(F.col("old") != F.col("new")).count() == 0


def test_backtest_from_preds_matches_public_query(spark, sf_dir):
    """ensemble_closed_forms now scores ONE shared preds frame through
    _backtest_from_preds — that helper must equal the public
    backtest_closed_forms row-for-row."""
    from qrapids_forecast_r_script_spark.forecast.queries import (
        _backtest_from_preds, _holdout_preds, backtest_closed_forms)

    public = backtest_closed_forms(spark, sf_dir)
    helper = _backtest_from_preds(_holdout_preds(spark, sf_dir))
    assert _rows(public) == _rows(helper)


def test_user_erasure_one_scan_audit_equals_two_pass(spark, sf_dir):
    """user_erasure_audit now derives rows_before and rows_erased from
    ONE scan per table (left join against the unique dead-key set + a
    conditional aggregate); it must equal the original two-pass form
    (plain count + left-semi count) on every audited table."""
    from qrapids_forecast_r_script_spark.operators.scale_patterns import (
        user_erasure_audit)
    from qrapids_forecast_r_script_spark.sources.registry import load_table

    new = {r["table_name"]: (r["rows_before"], r["rows_erased"])
           for r in user_erasure_audit(spark, sf_dir).collect()}

    cust = load_table(spark, sf_dir, "customer")
    erased = (cust.where(
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")),
                           1, 8), 16, 10).cast("long") % 50 == 0)
        .select("c_custkey"))
    dead_orders = (load_table(spark, sf_dir, "orders")
                   .join(erased.withColumnRenamed("c_custkey",
                                                  "o_custkey"),
                         "o_custkey")
                   .select("o_orderkey"))
    two_pass = {}
    for name, df, dead, key in [
            ("customer", cust, erased, "c_custkey"),
            ("orders", load_table(spark, sf_dir, "orders"),
             dead_orders, "o_orderkey"),
            ("lineitem", load_table(spark, sf_dir, "lineitem"),
             dead_orders, "l_orderkey"),
            ("events", load_table(spark, sf_dir, "events"),
             erased, "user_id")]:
        gone = df.join(dead.withColumnRenamed(dead.columns[0], key),
                       key, "left_semi").count()
        two_pass[name] = (df.count(), gone)
    assert new == two_pass
