"""Skew/shuffle-management operator tests: salted-join equivalence and
zero-exchange bucketed joins (the plan-level proof that bucketing
removes the runtime shuffle)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from etl_portfolio_project_spark.operators import skew
from etl_portfolio_project_spark.plans import explain
from etl_portfolio_project_spark.sources.registry import load_table

from .conftest import SF_SMALL


def test_salted_join_equals_plain_join(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey").select(
        "o_orderkey", "o_custkey", "c_name"
    )
    salted = skew.salted_join(
        orders, customer, "o_custkey", salt_buckets=7, unique_col="o_orderkey"
    ).select("o_orderkey", "o_custkey", "c_name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    # a degenerate all-one-key frame must land in multiple salt buckets
    hot = spark.range(1000).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    salt = F.pmod(F.xxhash64("row_id"), F.lit(7))
    n_buckets = hot.select(salt.alias("s")).distinct().count()
    assert n_buckets == 7


def test_bucketed_join_has_no_exchanges(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    with tempfile.TemporaryDirectory() as d:
        skew.write_bucketed(
            orders.select("o_orderkey", "o_totalprice"),
            "orders_b", "o_orderkey", 8, f"{d}/orders_b",
        )
        skew.write_bucketed(
            lineitem.select("l_orderkey", "l_quantity"),
            "lineitem_b", "l_orderkey", 8, f"{d}/lineitem_b",
        )
        try:
            ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
            # force SMJ: broadcast would hide the exchange question
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
            )
            try:
                joined = ob.join(
                    lb, ob.o_orderkey == lb.l_orderkey
                ).select("o_orderkey", "l_quantity", "o_totalprice")
                assert explain.count_shuffles(joined) == 0, (
                    explain.physical_plan(joined)
                )
                # and it still computes the right thing
                expected = (
                    orders.join(
                        lineitem, orders.o_orderkey == lineitem.l_orderkey
                    ).count()
                )
                assert joined.count() == expected
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
                spark.conf.unset(
                    "spark.sql.adaptive.autoBroadcastJoinThreshold"
                )
        finally:
            spark.sql("DROP TABLE IF EXISTS orders_b")
            spark.sql("DROP TABLE IF EXISTS lineitem_b")
