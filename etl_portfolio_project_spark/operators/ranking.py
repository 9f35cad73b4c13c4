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

    The ranged relation is localCheckpoint-ed: it feeds BOTH the
    local-rank branch and the partition-size branch, and checkpointing
    (a) runs the upstream plan + range exchange once and (b) FREEZES
    the nondeterministic pid assignment so both branches provably see
    the same partitioning (a lazy cache could be evicted and
    recomputed with different range bounds between branches;
    checkpointed partitions cannot). LAZY (eager=False, r13 opt): both
    variants wrap the SAME checkpoint-marked RDD instance — one
    shuffle dependency, one boundary sampling, partitions stored at
    first compute — so the freeze guarantee is identical, but the
    materialization rides inside the first consuming job instead of
    paying a separate eager job per helper call (measured ~0.4-0.5 s
    per call at sf0.1; the offsets broadcast build reads every
    partition, so the checkpoint is always fully stored before the
    rank branch runs).

    Scale shape: one range exchange, per-partition window sorts in
    parallel, one pid-grouped count (≤`ranges` rows) windowed and
    broadcast back. Nothing in the plan is a corpus-sized single-task
    sort.
    """
    ranged = (
        df.repartitionByRange(ranges, *order_cols)
        .withColumn(PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
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


# ---------------------------------------------------------------------------
# Per-group variants (VERDICT r9 item 1) — the sequel class: a window
# partitioned by a LOW-CARDINALITY key (source / event_type / domain)
# over corpus-proportional groups is "parallel" in name only — each
# group is ONE task whose input grows with the corpus. Two recipes,
# mirroring the global pair above:
#
#   * full rankings / running sums → `grouped_ranged_row_number` /
#     `grouped_ranged_cumsum`: range-partition on (group, order keys),
#     rank/sum locally, re-serialize with per-(pid, group) offsets.
#     Exact for ANY range boundaries, including a group split across
#     many partitions — a 100 TB megagroup parallelizes across
#     `ranges` tasks instead of one.
#
#   * bounded selections (rank ≤ k / rank = k, k small) →
#     `grouped_bottomk_survivors`: per-(group, value-bucket) minima
#     bound the k-th smallest value per group, so the rank window only
#     sorts ~k·(1+k/B) survivors per group — corpus-INVARIANT — while
#     the full relation is touched only by map-side partial
#     aggregates. The `similarity.boundary_survivors` trick, grouped.
#
# Both keep the consumer's DuckDB oracle unchanged: the rewrites are
# plan-only and provably value-identical.
# ---------------------------------------------------------------------------


def _null_safe_group_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    eq_keys: list[str] = (),
) -> DataFrame:
    """Broadcast-join `right` onto `left` on `keys` with NULL-SAFE
    equality (a NULL group key is a real group — a plain equi-join
    would silently drop its rows) plus plain equality on `eq_keys`
    (never-NULL columns like the helper pid), dropping every
    right-side key column. Right-side keys are renamed before the
    join: both sides usually derive from the same checkpointed frame,
    and name-based resolution sidesteps ambiguous-self-join traps.

    PRECONDITION (ADVICE r10): `right` is UNCONDITIONALLY broadcast,
    so it must be |groups|-bounded with LOW-CARDINALITY group keys
    (every current caller groups on source/domain/split/priority-class
    keys — ≤ a few thousand groups). A caller ranking on a
    high-cardinality key (doc_id, url, word) would blow the 8 GB
    broadcast ceiling: there, drop the hint and let a shuffled hash
    join carry the boundary relation instead (and expect the extra
    exchange in its plan budget)."""
    all_keys = list(keys) + list(eq_keys)
    ren = right
    for k in all_keys:
        ren = ren.withColumnRenamed(k, "_nsj_" + k)
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col("_nsj_" + k))
        cond = c if cond is None else (cond & c)
    for k in eq_keys:
        c = F.col(k) == F.col("_nsj_" + k)
        cond = c if cond is None else (cond & c)
    return left.join(F.broadcast(ren), cond).drop(
        *["_nsj_" + k for k in all_keys]
    )


def grouped_ranged_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    *,
    out: str = "rn",
    group_total: str | None = None,
    ranges: int = RANK_RANGES,
) -> DataFrame:
    """Append the exact per-group ``row_number() OVER (PARTITION BY
    *group_cols ORDER BY *order_cols)`` as `out` (BIGINT, 1-based) —
    and optionally each group's exact row count as `group_total`
    (BIGINT) — without any task ever sorting a whole group.

    (group_cols, order_cols) must define a TOTAL order within each
    group (the same determinism contract as the oracle's window).

    Shape: one range exchange on (group keys, order keys) — each range
    partition holds an order-contiguous slice — a per-(pid, group)
    local window, and a per-(pid, group) size aggregate (bounded:
    range contiguity means the relation has at most ranges + |groups|
    rows) whose per-group running sum re-serializes the local ranks.
    The (lazy — see `ranged_row_number`) localCheckpoint freezes the
    nondeterministic pid assignment so the rank branch and the size
    branch provably see the same partitioning (same reasoning as
    `ranged_row_number`)."""
    gcols = [F.col(g) for g in group_cols]
    ranged = (
        df.repartitionByRange(ranges, *gcols, *order_cols)
        .withColumn(PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wlocal = Window.partitionBy(PID, *group_cols).orderBy(*order_cols)
    local = ranged.withColumn("_grn_lr", F.row_number().over(wlocal))
    sizes = ranged.groupBy(PID, *group_cols).agg(
        F.count(F.lit(1)).alias("_grn_np")
    )
    # both frames ride ONE WindowExec over the bounded sizes relation,
    # partitioned by group and ordered by pid — never corpus-sized.
    # Plan tests recognize this bounded shape by the _rrn_pid column
    # in the ORDER spec (the grouped twin of the offsets whitelist).
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy(PID)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = (
        Window.partitionBy(*group_cols)
        .orderBy(PID)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    off_cols = [
        F.col(PID),
        *gcols,
        (F.sum("_grn_np").over(woff) - F.col("_grn_np")).alias("_grn_off"),
    ]
    if group_total is not None:
        off_cols.append(
            F.sum("_grn_np").over(wtot).cast("long").alias(group_total)
        )
    offsets = sizes.select(*off_cols)
    joined = _null_safe_group_join(local, offsets, group_cols, [PID])
    return (
        joined.withColumn(
            out, (F.col("_grn_lr").cast("long") + F.col("_grn_off"))
        )
        .drop(PID, "_grn_lr", "_grn_off")
    )


def grouped_ranged_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    val_col: str,
    *,
    out: str = "cum_before",
    ranges: int = RANK_RANGES,
) -> DataFrame:
    """Append the exact per-group EXCLUSIVE running sum of integer
    column `val_col` — ``sum(val) OVER (PARTITION BY group ORDER BY
    order ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)``, NULL→0 — as
    `out` (BIGINT), without any task ever scanning a whole group.

    Integer values only (the engine's no-double-window-sums rule:
    a float running sum is order-dependent in the last ulp; BIGINT
    partial sums re-associate exactly). Same ranged-offsets shape as
    `grouped_ranged_row_number`, with per-(pid, group) SUMs instead of
    counts (checkpoint lazy — see `ranged_row_number`)."""
    gcols = [F.col(g) for g in group_cols]
    ranged = (
        df.repartitionByRange(ranges, *gcols, *order_cols)
        .withColumn(PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    wlocal = (
        Window.partitionBy(PID, *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "_gcs_lc",
        F.coalesce(
            F.sum(val_col).over(wlocal), F.lit(0).cast("long")
        ).cast("long"),
    )
    sizes = ranged.groupBy(PID, *group_cols).agg(
        F.sum(val_col).cast("long").alias("_gcs_pn")
    )
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy(PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        F.col(PID),
        *gcols,
        F.coalesce(F.sum("_gcs_pn").over(woff), F.lit(0).cast("long"))
        .cast("long")
        .alias("_gcs_off"),
    )
    joined = _null_safe_group_join(local, offsets, group_cols, [PID])
    return (
        joined.withColumn(out, F.col("_gcs_lc") + F.col("_gcs_off"))
        .drop(PID, "_gcs_lc", "_gcs_off")
    )


#: value-residue buckets for the per-group bottom-k boundary — the
#: k-th smallest of a group's bucket minima is ≥ k distinct values
#: deep, so filtering value ≤ that boundary provably keeps every row
#: of per-group rank ≤ k while surviving ~k·(1 + k/B) rows per group
#: at ANY corpus size (bucket = value % B ⇒ equal values share a
#: bucket ⇒ the k minima are k DISTINCT values).
BOTTOMK_BUCKETS = 256


def grouped_bottomk_survivors(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    *,
    buckets: int = BOTTOMK_BUCKETS,
    group_count: str | None = None,
) -> DataFrame:
    """Rows of `df` that can rank ≤ k under ``ORDER BY value_col [,
    tiebreakers]`` within their group — the per-group twin of
    `similarity.boundary_survivors`, for SMALLEST-k selections on a
    non-negative integer value (md5 rank hashes).

    Exactness: per (group, value % buckets) minima are DISTINCT values
    (equal values share a residue bucket), so the k-th smallest bucket
    minimum is witnessed by ≥ k rows ≤ it — every row of true rank ≤ k
    (ties included: rank ≤ k ⇒ value ≤ the k-th value ≤ boundary)
    passes ``value ≤ boundary``. A group with < k non-empty buckets
    gets a NULL boundary → keep-all fallback (still exact). Rows with
    NULL `value_col` are dropped when a boundary exists — callers must
    rank on non-NULL values (all consumers rank on md5 hashes; see
    `domain_quota_sample`'s doc_id gate).

    Shape: ONE map-side-combining aggregate over ≤ |groups|·buckets
    keys, a per-group collect of ≤ buckets minima, and a broadcast of
    |groups| boundaries back onto the scan — the full relation is
    never shuffled or sorted; the downstream rank window sees a
    corpus-invariant survivor set.

    `group_count` (optional): also append each group's FULL row count
    (BIGINT) under that name — it rides the same bucket aggregate, so
    callers needing pre-prune group sizes (e.g. a retention
    denominator) avoid a second pass over the relation.

    PRECONDITIONS: (a) group keys must be LOW-CARDINALITY — the
    per-group boundary relation is unconditionally broadcast (see
    `_null_safe_group_join`); (b) `df` is scanned TWICE (bucket-minima
    aggregate + survivor join) — callers whose projection is expensive
    (per-row md5, explodes) must `caches.claim` it first (ADVICE r10;
    all three quota/mixture consumers do)."""
    aggs = [F.min(value_col).alias("_gbk_m")]
    if group_count is not None:
        aggs.append(F.count(F.lit(1)).alias("_gbk_n"))
    bmin = df.groupBy(
        *group_cols, F.pmod(F.col(value_col), F.lit(buckets)).alias("_gbk_b")
    ).agg(*aggs)
    gaggs = [
        F.expr(
            f"try_element_at(array_sort(collect_list(_gbk_m)), {int(k)})"
        ).alias("_gbk_bnd")
    ]
    if group_count is not None:
        gaggs.append(F.sum("_gbk_n").cast("long").alias(group_count))
    thr = bmin.groupBy(*group_cols).agg(*gaggs)
    return (
        _null_safe_group_join(df, thr, group_cols)
        .where(
            F.col("_gbk_bnd").isNull()
            | (F.col(value_col) <= F.col("_gbk_bnd"))
        )
        .drop("_gbk_bnd")
    )
