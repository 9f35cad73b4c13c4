"""The remaining TPC-H query shapes, adapted to the harness star
schema (no partsupp table; no l_commitdate/l_receiptdate/l_shipmode/
c_phone columns — each query keeps the ORIGINAL query's plan shape
and substitutes available columns, documented per query).

Together with Q1/Q3/Q5/Q14/Q17 (operators/relational.py,
operators/analytics.py) this gives the engine a near-complete TPC-H
shape corpus: scalar subqueries (Q11, Q15, Q22), argmin-per-group
(Q2), EXISTS/NOT-EXISTS chains (Q4, Q21), conditional aggregation
(Q7, Q8, Q12), two-level aggregation (Q13), group-HAVING semi joins
(Q18), disjunctive pushdown predicates (Q19), and count-distinct
aggregation (Q16).

All follow the engine determinism rules (operators/relational.py):
DECIMAL(18,4) money sums, mirrored operation order, identical output
aliases on both the Spark and DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import (
    dec,
    dec_disc_price,
    dec_disc_price_sql,
    dsum,
    dsum_sql,
)

# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (argmin per group). No partsupp, so "cost"
# is the minimum l_extendedprice observed per part; ties resolved to
# the smallest suppkey. Written as the decorrelated two-aggregate
# form: both aggregates and the join-back share the l_partkey
# partitioning, so the whole query needs ONE real shuffle at scale.
# ---------------------------------------------------------------------------


def tpch_q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part, the supplier quoting the minimum
    price (min over a correlated group + deterministic tie-break).
    Decorrelated: per-part MIN, join back on the same key (co-
    partitioned — Catalyst reuses the hash partitioning), then a
    second same-key aggregate picks min suppkey among ties. Dims
    (part, supplier) broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    mins = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = (
        li.join(mins, "l_partkey")
        .where(F.col("l_extendedprice") == F.col("min_price"))
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.best_suppkey == s.s_suppkey)
        .select("l_partkey", "p_name", "min_price", "best_suppkey", "s_name")
    )


TPCH_Q2_SQL = """
WITH mins AS (
  SELECT l_partkey, min(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
),
best AS (
  SELECT l.l_partkey, m.min_price, min(l.l_suppkey) AS best_suppkey
  FROM lineitem l JOIN mins m
    ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
  GROUP BY l.l_partkey, m.min_price
)
SELECT l_partkey, p_name, min_price, best_suppkey, s_name
FROM best
JOIN part ON l_partkey = p_partkey
JOIN supplier ON best_suppkey = s_suppkey
"""


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS semi join). "Late" is
# l_shipdate > o_orderdate + 60 days (no commit/receipt dates).
# ---------------------------------------------------------------------------


def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders that have at least
    one late line item — EXISTS expressed as a LEFT SEMI join with an
    extra non-equi conjunct. The semi join shuffles on orderkey (or
    broadcasts under AQE at harness sizes); the agg output is 5 rows."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure filter + scalar aggregate.
# ---------------------------------------------------------------------------


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective triple filter + a single scalar SUM of
    l_extendedprice*l_discount. All three predicates push into the
    parquet scan; the aggregation is a partial-combine with a 1-row
    final exchange. The 2-dp × 2-dp product is scale 4 — exact in
    DECIMAL(18,4)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_rev = (dec("l_extendedprice") * dec("l_discount")).cast(
        "decimal(18,4)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            # widened RAW range first (sargable — pushes to the
            # parquet row-group stats; the decimal-cast predicate
            # below is not pushable), then the exact membership on
            # the DECIMAL(18,4)-quantized discount: against raw
            # double literals a float32-stored 0.07 promotes to
            # 0.07000000029... and the boundary rows flip differently
            # in the two engines (r7 drift sweep; identical rows on
            # double-stored data since 2-dp values quantize
            # losslessly, and the widened bounds sit >4 quantization
            # steps from any admissible value, so the superset can
            # never disagree where the exact predicate matters)
            & (F.col("l_discount") >= 0.0449)
            & (F.col("l_discount") <= 0.0751)
            & F.expr(
                "CAST(l_discount AS DECIMAL(18,4)) "
                "BETWEEN CAST('0.05' AS DECIMAL(18,4)) "
                "AND CAST('0.07' AS DECIMAL(18,4))"
            )
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCH_Q6_SQL = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST(l_discount AS DECIMAL(18,4))
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= CAST('0.0449' AS DOUBLE)
  AND l_discount <= CAST('0.0751' AS DOUBLE)
  AND CAST(l_discount AS DECIMAL(18,4))
      BETWEEN CAST('0.05' AS DECIMAL(18,4))
      AND CAST('0.07' AS DECIMAL(18,4))
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations.
# ---------------------------------------------------------------------------


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flows between a nation pair, by
    supplier-nation × customer-nation × year. The nation dim joins
    twice under different roles (supplier side / customer side) —
    both broadcast; the li⋈orders equi-join carries the volume. The
    pair filter is applied after both role joins, exactly like the
    original's WHERE over (n1, n2)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    )
    revenue = dec_disc_price("l_extendedprice", "l_discount")
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | (
        (F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


TPCH_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {dec_disc_price_sql('l_extendedprice', 'l_discount')} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share within a region.
# ---------------------------------------------------------------------------


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue sold
    into ASIA, per year — the biggest star join in the corpus (fact +
    5 dims + nation-in-two-roles + region). Every dim broadcasts; the
    share is a conditional decimal sum over the same rows as the
    total, divided once in double at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("cust_nkey"),
        F.col("n_regionkey").alias("cust_rkey"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    revenue = dec_disc_price("l_extendedprice", "l_discount")
    zero = F.lit(0).cast("decimal(18,4)")
    target = F.when(F.col("supp_nation") == "NATION_3", revenue).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey"))
        .join(F.broadcast(r), F.col("cust_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(target).cast("double").alias("target_revenue"),
            F.sum(revenue).cast("double").alias("total_revenue"),
            (
                F.sum(target).cast("double") / F.sum(revenue).cast("double")
            ).alias("mkt_share"),
        )
    )


TPCH_Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                THEN {dec_disc_price_sql('l_extendedprice', 'l_discount')}
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS target_revenue,
       CAST(sum({dec_disc_price_sql('l_extendedprice', 'l_discount')})
            AS DOUBLE) AS total_revenue,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                THEN {dec_disc_price_sql('l_extendedprice', 'l_discount')}
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(sum({dec_disc_price_sql('l_extendedprice', 'l_discount')})
                AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit. No partsupp.ps_supplycost, so cost is
# modeled as 1% of p_retailprice × quantity (deterministic, decimal-
# exact); the shape — LIKE-filtered part dim, nation roll-up by year,
# profit = revenue − cost — is Q9's.
# ---------------------------------------------------------------------------


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year over a
    name-filtered part subset. Cost = retailprice×qty×0.01 keeps every
    intermediate in DECIMAL(18,4) (2-dp × integer qty → 2 dp; ×0.01 →
    4 dp — both lossless)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = dec_disc_price("l_extendedprice", "l_discount")
    cost = (
        (dec("p_retailprice") * dec("l_quantity")).cast("decimal(18,4)")
        * F.lit("0.01").cast("decimal(18,4)")
    ).cast("decimal(18,4)")
    profit = (revenue - cost).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


_COST_SQL = (
    "CAST(CAST(CAST(p_retailprice AS DECIMAL(18,4))"
    " * CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4))"
    " * CAST('0.01' AS DECIMAL(18,4)) AS DECIMAL(18,4))"
)

TPCH_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
       CAST(sum(CAST({dec_disc_price_sql('l_extendedprice', 'l_discount')}
                     - {_COST_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue).
# ---------------------------------------------------------------------------


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns per customer in one quarter,
    top 20. Deterministic total order (revenue desc, custkey) so the
    LIMIT is engine-stable; revenue is a decimal-exact sum so the sort
    key is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = dec_disc_price("l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum({dec_disc_price_sql('l_extendedprice', 'l_discount')})
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — important stock: per-part value above a fraction of the
# global total (scalar subquery HAVING).
# ---------------------------------------------------------------------------

#: keep parts whose value exceeds this multiple of the average
#: per-part value (scale-invariant, unlike the original's fixed
#: fraction of the total — which selects nothing once part
#: cardinality grows past 1/fraction)
Q11_AVG_MULT = 1.5


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a global scalar subquery —
    here "value above 1.5× the average part's value". The scalar is a
    1-row broadcast cross join over the SAME per-part aggregate (one
    shuffle, reused); the threshold comparison is double-vs-double
    with both engines deriving the operands identically
    (CAST(decimal_sum AS DOUBLE) / bigint count × 1.5)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum("l_extendedprice").alias("part_value")
    )
    avg_part = per_part.agg(
        (
            F.sum(dec("part_value")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_value")
    )
    return (
        per_part.crossJoin(F.broadcast(avg_part))
        .where(F.col("part_value") > F.lit(Q11_AVG_MULT) * F.col("avg_value"))
        .select("l_partkey", "part_value")
    )


TPCH_Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {dsum_sql('l_extendedprice')} AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > CAST({Q11_AVG_MULT} AS DOUBLE) * (
  SELECT CAST(sum(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE)
  FROM per_part)
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority counts. No l_shipmode: grouped by
# l_linestatus instead; "late" is shipdate > orderdate + 60 days.
# ---------------------------------------------------------------------------


def tpch_q12_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join fact→orders, filter to late lines, then a
    conditional count split by order priority class. count(CASE WHEN)
    keeps everything integer — no float concerns."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
    )


TPCH_Q12_SQL = """
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (two-level aggregate over a
# left outer join).
# ---------------------------------------------------------------------------


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer including the
    zero-order customers (LEFT join, count of non-null orderkeys),
    with the original's anti-filter mapped from o_comment to
    priority ≠ 1-URGENT. Two shuffles: custkey agg, then the tiny
    count-of-counts agg."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


TPCH_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: per-supplier quarterly revenue vs the MAX
# revenue scalar subquery.
# ---------------------------------------------------------------------------


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in a quarter.
    The revenue view aggregates once; the MAX is a 1-row broadcast;
    the equality compare is exact because both sides' revenue is the
    same decimal-sum-to-double value in both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(dsum(dec_disc_price("l_extendedprice", "l_discount")).alias(
            "total_revenue"
        ))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum({dec_disc_price_sql('l_extendedprice', 'l_discount')})
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q16 — part/supplier variety: count-distinct suppliers per part
# attribute combination (from lineitem; no partsupp).
# ---------------------------------------------------------------------------


def tpch_q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per (brand, type,
    size) excluding one brand. Spark plans distinct-agg as a two-phase
    expand+agg — still partial-combinable at scale."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (group-HAVING feeding a semi join).
# ---------------------------------------------------------------------------

#: minimum total quantity for an order to count as "large"
Q18_MIN_QTY = 200


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold,
    with customer context. The HAVING subquery and the outer per-order
    aggregate are the same groupBy — computed once and reused (the
    original's `IN (SELECT ...)` decorrelates to exactly this). One
    orderkey shuffle; orders/customer broadcast at harness size."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_MIN_QTY)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


TPCH_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {dsum_sql('l_quantity')} > {Q18_MIN_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under disjunctive predicates.
# ---------------------------------------------------------------------------


def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from lines matching any of three
    (brand, size-range, quantity-range) conjunctions. The OR-of-ANDs
    sits on top of an equi-join — Catalyst extracts the common
    l_partkey=p_partkey conjunct so the join stays hash-based, and
    pushes the p-only / l-only residues down to their scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    revenue = dec_disc_price("l_extendedprice", "l_discount")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCH_Q19_SQL = f"""
SELECT CAST(sum({dec_disc_price_sql('l_extendedprice', 'l_discount')})
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20 — excess shippers (nested semi joins over a correlated
# aggregate). No partsupp.availqty: "excess" is a supplier shipping
# more than a threshold quantity of any widget part in 1996.
# ---------------------------------------------------------------------------

#: per-(supplier, part) 1996 shipped quantity that counts as "excess"
Q20_MIN_QTY = 40


def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers selected through a NESTED semi-join
    chain — supplier ⋉ (per-(supp,part) aggregate over the
    name-filtered part set, HAVING a correlated quantity threshold).
    The aggregate shuffles on the compound key once; the outer semi
    join broadcasts the small distinct-supplier set."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    excess = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
        .where(F.col("qty") > Q20_MIN_QTY)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(excess), s.s_suppkey == excess.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


TPCH_Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {dsum_sql('l_quantity')} > {Q20_MIN_QTY})
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who were the last to ship on multi-supplier orders
# (EXISTS + NOT EXISTS chain). Adapted from commit/receipt lateness
# to ship-order position: supplier's line is the strictly-latest ship
# date on a finished multi-supplier order.
# ---------------------------------------------------------------------------


def tpch_q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-supplier count of finished orders where
    EXISTS another supplier's line on the same order AND NOT EXISTS
    any line shipped after this supplier's. Expressed as LEFT SEMI +
    LEFT ANTI self-joins on orderkey — each is one equi-shuffle (or a
    broadcast under AQE); no window needed, matching the original's
    correlated-EXISTS plan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    finished = l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
    with_other = finished.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    )
    last = with_other.join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey"))
        & (F.col("l3_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        last.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


TPCH_Q21_SQL = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: rich-but-inactive customers
# (scalar-subquery threshold + anti join). c_phone country codes are
# mapped to a nationkey subset.
# ---------------------------------------------------------------------------

#: a customer is "inactive" if they placed no order on/after this date
#: (every harness customer has SOME order, so the original's
#: no-orders-ever predicate selects nothing — recency keeps the
#: anti-join shape with real selectivity)
Q22_INACTIVE_SINCE = "2000-01-01"


def tpch_q22_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balance and no
    recent orders — AVG scalar subquery (broadcast 1-row cross join) +
    LEFT ANTI join against the date-filtered orders, grouped by
    nation. The average is CAST(decimal_sum AS DOUBLE)/count on both
    engines, so the threshold compare is bit-identical."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= Q22_INACTIVE_SINCE)
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = f"""
SELECT c_nationkey, count(*) AS numcust,
       {dsum_sql('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT {dsum_sql('c_acctbal')} / count(*)
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{Q22_INACTIVE_SINCE}')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated average subquery).
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#13"
Q17_MAX_SIZE = 15
Q17_QTY_FACTOR = "0.2"  # of the part's average quantity
Q17_YEARS = "7.0"


def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 20% of the part's average order quantity) were not filled.
    The reference Q17 filters on p_container, which the harness part
    table lacks — p_size ≤ Q17_MAX_SIZE stands in for it.

    The correlated `AVG(l_quantity) WHERE l_partkey = p_partkey`
    subquery decorrelates to one per-part aggregate joined back to
    lineitem on partkey — computed ONCE, not per row. Plan: per-part
    agg (one lineitem shuffle), broadcast the filtered part dim into
    both the agg's consumer join and the line scan, single global sum.
    Portability: the average is a DECIMAL(18,4)-exact sum cast to
    double divided by an exact count, and the final division is one
    double op (CLAUDE.md money rules)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") == Q17_BRAND)
            & (F.col("p_size") <= Q17_MAX_SIZE)
        )
        .select("p_partkey")
    )
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey")
        .agg(
            (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
        )
    )
    small = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), "l_partkey")
        .where(
            F.col("l_quantity")
            < F.expr(f"CAST({Q17_QTY_FACTOR} AS DOUBLE)") * F.col("avg_qty")
        )
    )
    return small.agg(
        (
            dsum("l_extendedprice")
            / F.expr(f"CAST({Q17_YEARS} AS DOUBLE)")
        ).alias("avg_yearly")
    )


TPCH_Q17_SQL = f"""
WITH p AS (
  SELECT p_partkey FROM part
  WHERE p_brand = '{Q17_BRAND}' AND p_size <= {Q17_MAX_SIZE}
),
per_part AS (
  SELECT l_partkey,
         {dsum_sql('l_quantity')} / count(*) AS avg_qty
  FROM lineitem JOIN p ON l_partkey = p_partkey
  GROUP BY l_partkey
)
SELECT {dsum_sql('l_extendedprice')} / CAST({Q17_YEARS} AS DOUBLE)
         AS avg_yearly
FROM lineitem
JOIN p ON l_partkey = p_partkey
JOIN per_part USING (l_partkey)
WHERE l_quantity < CAST({Q17_QTY_FACTOR} AS DOUBLE) * avg_qty
"""
