"""Property tests for `_prefix_max_carry` (r11 — the recursive
chunk→superchunk prefix scan that retired events_lateness_audit's
whitelisted unpartitioned carry window).

The helper must be BIT-IDENTICAL to the naive strictly-preceding
global running max, at every recursion depth: the harness SFs only
exercise depth 0 (≤1024 chunks → apex triangular join alone), so the
multi-level fold-down path would otherwise ship untested.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_portfolio_project_spark.operators.analytics import (
    _LATENESS_CHUNK,
    _prefix_max_carry,
)


def _naive_carry(df):
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, -1)
    return df.select("key", F.max("mx").over(w).alias("carry"))


def _mx_expr():
    # deterministic pseudo-random, non-monotone in key, with repeats
    return F.expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) "
        "AS BIGINT) % 1000"
    )


def _check(spark, n, sparse_stride=1):
    df = (
        spark.range(n)
        .select((F.col("id") * sparse_stride).alias("key"), _mx_expr().alias("mx"))
        .localCheckpoint(eager=True)
    )
    got = {r["key"]: r["carry"] for r in _prefix_max_carry(df).collect()}
    want = {r["key"]: r["carry"] for r in _naive_carry(df).collect()}
    assert got == want


def test_apex_only_depth0(spark):
    # ≤ _LATENESS_CHUNK keys: loop body never runs, apex join alone
    _check(spark, 200)


def test_one_recursion_level(spark):
    # > CHUNK keys forces one partitioned sibling-window level; keys
    # NOT aligned to chunk boundaries (stride 3 → parents uneven)
    _check(spark, _LATENESS_CHUNK * 3 + 17, sparse_stride=3)


def test_first_key_carry_is_null(spark):
    df = spark.range(5).select(
        F.col("id").alias("key"), F.lit(7).alias("mx")
    )
    rows = {r["key"]: r["carry"] for r in _prefix_max_carry(df).collect()}
    assert rows[0] is None and rows[4] == 7


def test_two_recursion_levels_tiny_chunk(spark, monkeypatch):
    # shrink the fan-out so depth 2 is reachable at test size: 4³ keys
    # with fan-out 4 → two sibling-window levels + apex
    import etl_portfolio_project_spark.operators.analytics as A

    monkeypatch.setattr(A, "_LATENESS_CHUNK", 4)
    _check(spark, 4 * 4 * 4 + 9, sparse_stride=7)
