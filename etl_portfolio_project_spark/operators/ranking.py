"""Distributed global-order ranking — the single-reducer-window
killer.

A bare ``row_number() OVER (ORDER BY ...)`` plans as ONE WindowExec
task sorting the whole relation: fine at harness SFs, the scale
ceiling at 100 TB (VERDICT r8 item 1 — the last systematic
scale-killer class). This module is the one shared implementation of
the proven alternative (`global_revenue_rank` shipped it first):

  range-partition by the sort keys → rank locally inside each
  (parallel) partition → add the cumulative row count of all
  preceding partitions.

The result is provably identical to the global window whatever
boundaries the range sampler picks, because range partitions are
order-contiguous and the offsets re-serialize them. Every consumer
(`ccnet_perplexity_filter` terciles, `embedding_norm_outliers` median
selection, `zorder_layout_audit` bucket ranks, `customer_value_tiles`
ntile/percent_rank/cume_dist, `global_revenue_rank`) keeps its DuckDB
oracle's plain ``row_number()`` — only the Spark plan changes.

Plan contract (pinned by tests/test_plans.py::
test_no_corpus_sized_unpartitioned_window): the ONLY unpartitioned
WindowExec a consumer plan may contain is the offsets window below —
recognizable because it orders by the helper's ``_rrn_pid`` column and
its input is the pid-grouped size aggregate (≤ `ranges` rows, bounded,
never corpus-proportional).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: range partitions for the distributed rank. Bounded and SF-invariant
#: on purpose: the offsets relation stays a ≤RANK_RANGES-row broadcast
#: at any corpus size; each range partition sorts ~n/RANK_RANGES rows
#: in parallel. A cluster deployment raises this to O(executors).
RANK_RANGES = 8

#: the helper's partition-id column — plan tests key on this name.
PID = "_rrn_pid"


def ranged_row_number(
    df: DataFrame,
    order_cols: list[Column],
    *,
    out: str = "rn",
    total: str | None = None,
    ranges: int = RANK_RANGES,
) -> DataFrame:
    """Append the exact global ``row_number() OVER (ORDER BY
    *order_cols)`` as `out` (BIGINT, 1-based) — and optionally the
    exact total row count as `total` (BIGINT) — WITHOUT a
    single-reducer window.

    `order_cols` must define a TOTAL order (ties would make the
    row_number nondeterministic in the plain window too — same
    contract as the oracle side).

    The ranged relation is eagerly localCheckpoint-ed: it feeds BOTH
    the local-rank branch and the partition-size branch, and
    checkpointing (a) runs the upstream plan + range exchange once and
    (b) FREEZES the nondeterministic pid assignment so both branches
    provably see the same partitioning (a lazy cache could be evicted
    and recomputed with different range bounds between branches;
    checkpointed partitions cannot).

    Scale shape: one range exchange, per-partition window sorts in
    parallel, one pid-grouped count (≤`ranges` rows) windowed and
    broadcast back. Nothing in the plan is a corpus-sized single-task
    sort.
    """
    ranged = (
        df.repartitionByRange(ranges, *order_cols)
        .withColumn(PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    wlocal = Window.partitionBy(PID).orderBy(*order_cols)
    local = ranged.withColumn("_rrn_lr", F.row_number().over(wlocal))
    sizes = ranged.groupBy(PID).agg(F.count(F.lit(1)).alias("_rrn_np"))
    # both frames ride ONE WindowExec over the ≤`ranges`-row sizes
    # relation (same partition+order spec) — bounded, not corpus-sized
    woff = Window.orderBy(PID).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wtot = Window.orderBy(PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col(PID),
        (F.sum("_rrn_np").over(woff) - F.col("_rrn_np")).alias("_rrn_off"),
    ]
    if total is not None:
        off_cols.append(
            F.sum("_rrn_np").over(wtot).cast("long").alias(total)
        )
    offsets = sizes.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), PID)
        .withColumn(
            out, (F.col("_rrn_lr").cast("long") + F.col("_rrn_off"))
        )
        .drop(PID, "_rrn_lr", "_rrn_off")
    )
