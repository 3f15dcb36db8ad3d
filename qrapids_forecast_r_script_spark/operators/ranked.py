"""Distributed exact ranking / ntile — the two-pass quantile-boundary
swap for the global-ntile family (r8 verdict, What's wrong #1).

``F.ntile(n).over(Window.orderBy(...))`` is exact and oracle-friendly,
but Spark plans an empty-partition window as ``Exchange
SinglePartition`` + one window task: the whole input serializes through
one core.  Fine over a bounded aggregate; a scale-killer over
row-grain inputs (customer-grain RFM, document-grain calibration
deciles) at 100 TB.

:func:`exact_ntile` is the drop-in replacement built from the same
primitive as ``curation.token_shard_packing``'s distributed prefix sum:

1. ``repartitionByRange`` on the composite order key — a PARALLEL range
   exchange (deterministic boundaries: the underlying RangePartitioner
   samples with fixed per-partition seeds) — then
   ``sortWithinPartitions`` (partition-local sort, no exchange);
2. ``monotonically_increasing_id`` over the sorted layout: Spark's
   contract makes the low 33 bits a CONSECUTIVE per-partition record
   counter, so ``mid − min(mid) + 1`` within a partition IS the local
   row index — no ``Window.partitionBy(pid)`` and therefore no second
   full-data ``hash(pid)`` exchange (the first-cut form paid one;
   measured 2-6× at bench SF for zero benefit.  Equality with
   ``row_number`` stays property-pinned in tests/test_ranked.py);
3. per-partition (count, min-mid) — ONE map-side-combined aggregate
   shuffling ``#partitions`` rows — exclusive prefix over that tiny
   table (a window over config-bounded rows), broadcast back, joined
   on partition id;
4. the closed-form ntile bucket from (rank, N): with ``q = N div n``
   and ``rem = N mod n``, SQL ntile gives the first ``rem`` buckets
   ``q+1`` rows and the rest ``q`` — all-integer arithmetic, so the
   assignment is bit-identical to the single-task window the oracle
   runs.

Net cost per use: the ranged layout is ``persist``-ed and the offsets
pass and main pass both read the cache.  The cut exists because of two
MEASURED Spark 4.1 facts (AQE on): (a) identical
``repartitionByRange`` exchanges are NOT deduped by exchange reuse
(0 ``ReusedExchange`` even on a minimal self-join repro), and (b) a
range repartition costs a RangePartitioner SAMPLING job over its input
on top of the shuffle itself — so uncut, each helper call recomputes
its input ~3× and CHAINED calls (RFM's three ntile cuts, Heaps' two
cumsums) recompute the base aggregate ~3^k times (38 Spark jobs per
run on the 3-chain, measured at sf0.1; each extra job is a full
re-read at fact-grain scale).  ``persist`` beats the obvious
``localCheckpoint`` cut on both measured axes — see
:func:`_materialize` — and keeps the plan census fully sighted.  With
it the cost is linear: one pass of the input (sampling) + one range
shuffle + one cache write, then every consumer — including the next
chained helper — reads cached blocks (7 jobs/run on the 3-chain).
Recompute after cache eviction is SAFE by construction (fixed sampling
seeds + a total order key reproduce identical partition contents and
record ids).  This is still strictly better at scale than the
first-cut ``Window.partitionBy(pid)`` form (which paid a full-data
``hash(pid)`` exchange per call) and categorically better than the
single-task global window.  Locally the helper costs ~0.3-0.5 s of
fixed stage-scheduling overhead per use vs the single-task window —
the documented price of removing the serialization point (BASELINE.md
r9 note).

(:func:`global_cumsum` keeps the partition-local window form: a
running VALUE sum cannot be recovered from record numbers, and its
call sites run over aggregated grain where that window is cheap; it
takes the same persist cut, so chained cumsums are linear too.)

Exactness requires the order key to be a TOTAL order (callers append a
unique tiebreak column, the registry-wide discipline) — equal keys
could otherwise straddle a range boundary and the per-partition
row_number would break ties by physical placement.

The helper's own bounded global window (step 2) is recognizable in
plans by its grouping key ``__rb_pid`` — the plan sweep's global-window
census treats it as the documented benign form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["PID", "global_rank", "global_cumsum", "exact_ntile"]

# marker column names: the plan-census allowlist keys on PID
PID = "__rb_pid"
_CNT = "__rb_cnt"
_OFF = "__rb_off"
_MID = "__rb_mid"
_MID0 = "__rb_mid0"
_TOT = "__rb_n"


def _materialize(ranged: DataFrame) -> DataFrame:
    """Stop the ranged layout from being recomputed by ``persist``
    (MEMORY_AND_DISK): the offsets pass populates the cache, the main
    pass and any CHAINED helper call read it (module docstring,
    measured facts a/b).

    Why persist and not localCheckpoint (both were MEASURED on the
    3-chained-ntile query, warm session, sf0.1): under AQE a
    localCheckpoint executes its upstream shuffle stages SYNCHRONOUSLY
    at DataFrame-construction time, so k chained helpers serialize k
    blocking materializations into every construction — 17 jobs/run,
    1.32 s median — while persist defers everything to the action and
    Spark's CacheManager matches by logical-plan equality, so even
    RE-constructions of the same query hit the cache: 7 jobs/run,
    0.84 s (uncut: 38 jobs).  persist also keeps the full lineage
    visible (InMemoryRelation wraps the child plan) and recompute
    after block eviction is SAFE here by construction: the range
    partitioner samples with fixed seeds and the order key is total,
    so an evicted partition recomputes to the identical sorted content
    and the identical record-id counter.  Cache entries outlive the
    query until evicted (storage-memory LRU) — self-limiting, and the
    right trade for a layout every consumer re-reads."""
    return ranged.persist()


def global_rank(df: DataFrame, order_cols: list[Column],
                rank_col: str = "__rb_rank",
                keep_total: bool = False) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` without the
    single-partition exchange: exact 1-based global rank via range
    repartition + sorted-layout record ids + broadcast offsets (the
    zipWithIndex decomposition — see the module docstring).  Appends
    ``rank_col`` (and, with ``keep_total``, ``__rb_n`` — the total row
    count :func:`exact_ntile` needs for closed-form bucket
    assignment); ``order_cols`` must be a total order."""
    ranged = _materialize(
        df.repartitionByRange(*order_cols)
          .sortWithinPartitions(*order_cols)
          .withColumn(_MID, F.monotonically_increasing_id())
          .withColumn(PID, F.spark_partition_id()))
    counts = ranged.groupBy(PID).agg(F.count(F.lit(1)).alias(_CNT),
                                     F.min(_MID).alias(_MID0))
    woff = (Window.orderBy(PID)
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        PID, _MID0,
        F.coalesce(F.sum(_CNT).over(woff), F.lit(0)).alias(_OFF),
        F.sum(_CNT).over(
            Window.orderBy(PID).rowsBetween(Window.unboundedPreceding,
                                            Window.unboundedFollowing))
         .alias(_TOT))
    out = (ranged
           .join(F.broadcast(offsets), PID)
           .withColumn(rank_col,
                       (F.col(_OFF) + (F.col(_MID) - F.col(_MID0)) + 1)
                       .cast("long"))
           .drop(PID, _CNT, _OFF, _MID, _MID0))
    return out if keep_total else out.drop(_TOT)


def global_cumsum(df: DataFrame, order_cols: list[Column],
                  value_col: str, out_col: str) -> DataFrame:
    """``sum(value) OVER (ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW)`` without the single-partition exchange
    — the same decomposition as :func:`global_rank` with per-partition
    VALUE totals as the broadcast offsets (the running-share primitive
    behind Pareto/Lorenz cumulative reads).  ``order_cols`` must be a
    total order; the value column's type is preserved (BIGINT stays
    BIGINT — callers keep the exact-integer discipline)."""
    ranged = _materialize(
        df.repartitionByRange(*order_cols)
          .withColumn(PID, F.spark_partition_id()))
    totals = ranged.groupBy(PID).agg(F.sum(value_col).alias(_CNT))
    woff = (Window.orderBy(PID)
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        PID,
        F.coalesce(F.sum(_CNT).over(woff),
                   F.lit(0).cast("long")).alias(_OFF))
    wlocal = (Window.partitionBy(PID).orderBy(*order_cols)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (ranged
            .withColumn("__rb_within", F.sum(value_col).over(wlocal))
            .join(F.broadcast(offsets), PID)
            .withColumn(out_col, F.col(_OFF) + F.col("__rb_within"))
            .drop(PID, _CNT, _OFF, "__rb_within"))


def exact_ntile(df: DataFrame, n: int, order_cols: list[Column],
                out_col: str) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_cols)`` with the SQL bucket-size
    rule (first ``N mod n`` buckets one row larger), computed from the
    distributed global rank — no single-task window over the input.

    Output column type matches Spark's ntile (int).  The input columns
    pass through unchanged; ``order_cols`` must include a unique
    tiebreak so the assignment is partitioning-proof.

    All-integer arithmetic (``div``, never ``/``): a float quotient
    rounding up across an integer boundary would flip a bucket edge at
    scale.  ``ceil(a/b)`` is ``(a + b - 1) div b``; the ``greatest(q,1)``
    guard keeps ANSI mode from raising on the never-taken else branch
    when ``N < n`` (then every rank sits in the first-``rem`` region)."""
    rank = "__rb_rank"
    ranked = (global_rank(df, order_cols, rank_col=rank, keep_total=True)
              .withColumn("__rb_q", F.expr(f"{_TOT} div {int(n)}"))
              .withColumn("__rb_big", (F.col(_TOT) % int(n))
                          .cast("long")))
    cut = F.col("__rb_big") * (F.col("__rb_q") + F.lit(1))
    bucket = F.when(
        F.col(rank) <= cut,
        F.expr(f"({rank} + __rb_q) div (__rb_q + 1)"),
    ).otherwise(
        F.col("__rb_big")
        + F.expr(f"({rank} - __rb_big * (__rb_q + 1) + __rb_q - 1)"
                 " div greatest(__rb_q, 1L)"))
    return (ranked
            .withColumn(out_col, bucket.cast("int"))
            .drop(rank, _TOT, "__rb_q", "__rb_big"))
