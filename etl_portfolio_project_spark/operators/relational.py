"""General relational operator library (SURVEY.md §7.3).

The reference surface proves out scans, equi-joins, scalar exprs,
explode, window cumsum, and union-all; this module rounds out the
standard categories a user of the engine expects — filters,
aggregations, sort/limit, semi/anti joins, distinct, ranking windows,
rollup, pivot, set ops, sessionization, as-of joins, and time-bucket
aggregation — each as a (Spark builder, DuckDB oracle) pair.

Cross-engine determinism for aggregates: double SUMs are
order-dependent, so every money SUM goes through DECIMAL(18,4)
(exact, associative) and the final value is cast back to DOUBLE —
identical bits in Spark and DuckDB. The harness numerics are 2-dp
generated, so the decimal cast is lossless. Averages are expressed as
CAST(sum AS DOUBLE)/count. At 100 TB the decimal sum is still a
single-pass partial aggregation (map-side combine) — no perf cliff.

Scale notes per operator are in each builder's docstring.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import tmpdirs
from ..sources import views
from ..sources.registry import load_table

DEC = "decimal(18,4)"


def dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column) -> Column:
    """Order-exact SUM of a money column → DOUBLE."""
    return F.sum(dec(c)).cast("double")


def dec_sql(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,4))"


def dsum_sql(expr: str) -> str:
    return f"CAST(sum({dec_sql(expr)}) AS DOUBLE)"


def dec_disc_price(price: str, disc: str) -> Column:
    """`price * (1 - disc)` as DECIMAL(18,4). The inputs are 2-dp
    money values, so the scale-8 product carries only zeros past 4 dp —
    casting back to scale 4 is LOSSLESS. Keeping revenue sums at scale
    4 is what makes the final DOUBLE conversion engine-exact: a
    scale-8 sum's scaled integer passes 2^53 around 9e7 (engines then
    disagree in the last ulp — Spark converts the full decimal
    correctly rounded, DuckDB divides a rounded int128), while scale 4
    stays exact up to ~9e11."""
    return (dec(price) * (F.lit(1).cast(DEC) - dec(disc))).cast(DEC)


def dec_disc_price_sql(price: str, disc: str) -> str:
    return (
        f"CAST({dec_sql(price)} * (CAST(1 AS DECIMAL(18,4)) - {dec_sql(disc)})"
        f" AS DECIMAL(18,4))"
    )


# --- filters / projections ------------------------------------------------


def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + narrow projection. Catalyst pushes both into
    the parquet scan (PushedFilters/ReadSchema) — at 100 TB this is the
    difference between scanning 4 columns of matching row-groups and
    scanning everything."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 25)
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


FILTER_PUSHDOWN_SQL = """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount,
       l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS revenue
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_quantity < 25
"""


# --- aggregation (TPC-H Q1 shape) ----------------------------------------


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy two low-cardinality keys + 6 aggregates. Partial
    aggregation (map-side combine) means the shuffle carries only
    |groups| × |partitions| rows at 100 TB; AQE coalesces the 6-group
    output."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec_disc_price("l_extendedprice", "l_discount")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            F.max("l_shipdate").alias("max_shipdate"),
        )
    )


AGG_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       CAST(sum({dec_disc_price_sql('l_extendedprice', 'l_discount')})
            AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order,
       {dsum_sql('l_quantity')} / count(*) AS avg_qty,
       max(l_shipdate) AS max_shipdate
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- sort / limit ---------------------------------------------------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT k → Spark TakeOrderedAndProject: each
    partition keeps its local top-k, driver merges k×partitions rows —
    no global sort at any scale. Tie-broken on key for determinism."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(25)
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


# --- semi / anti / distinct / set ops ------------------------------------


def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS. The build side is the filtered orders
    key set; Catalyst broadcasts it when small, else shuffles both
    sides on the key — never duplicates rows (no post-join dedup)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


CUSTOMERS_WITH_URGENT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (customers inactive since 2001)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2001-01-01"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
"""


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns; partial-agg shrinks
    the shuffle to unique combinations per partition."""
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
    )


DISTINCT_SEGMENTS_SQL = "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"


def repeat_customers_1995_1996(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two filtered key sets."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


REPEAT_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def churned_customers_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): ordered in 1995, never in 1996."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)  # EXCEPT (distinct) semantics


CHURNED_CUSTOMERS_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def yoy_customer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join of two yearly per-customer aggregates —
    customers active in only one year surface with NULLs on the other
    side. Both inputs are pre-aggregated (partial agg + one shuffle
    each on o_custkey); the join reuses the same key so AQE can plan a
    single co-partitioned sort-merge without an extra exchange."""
    o = load_table(spark, sf_dir, "orders")

    def year_side(year: int, n_alias: str, rev_alias: str) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == year)
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias(n_alias),
                dsum("o_totalprice").alias(rev_alias),
            )
        )

    y95 = year_side(1995, "n_1995", "rev_1995")
    y96 = year_side(1996, "n_1996", "rev_1996")
    return y95.join(y96, "o_custkey", "full_outer").select(
        "o_custkey", "n_1995", "rev_1995", "n_1996", "rev_1996"
    )


YOY_CUSTOMER_RECONCILIATION_SQL = f"""
WITH y95 AS (
  SELECT o_custkey, count(*) AS n_1995, {dsum_sql('o_totalprice')} AS rev_1995
  FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey
),
y96 AS (
  SELECT o_custkey, count(*) AS n_1996, {dsum_sql('o_totalprice')} AS rev_1996
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
)
SELECT COALESCE(y95.o_custkey, y96.o_custkey) AS o_custkey,
       n_1995, rev_1995, n_1996, rev_1996
FROM y95 FULL OUTER JOIN y96 ON y95.o_custkey = y96.o_custkey
"""


def price_quartiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (p25/p50/p75 of order price per priority)
    without interpolation ambiguity: the quantile is DEFINED as the
    value at rank ceil(q*n) (type-1/lower quantile), selected by a
    distributed per-group rank — deterministic and bit-identical
    across engines, unlike interpolating percentile functions whose
    arithmetic is implementation-defined.

    Scale shape (r10): o_orderpriority has 5 values, so a plain
    group-partitioned window is a corpus-sized single task per
    priority at 100× — the same class as the r9 per-group-window
    fixes; `ranking.grouped_ranged_row_number` supplies both the
    per-group rank AND the exact group count from one range exchange
    (no task ever sorts a whole priority)."""
    from .ranking import grouped_ranged_row_number

    o = load_table(spark, sf_dir, "orders")
    ranked = grouped_ranged_row_number(
        o.select("o_orderpriority", "o_totalprice", "o_orderkey"),
        ["o_orderpriority"],
        [F.col("o_totalprice"), F.col("o_orderkey")],
        out="rn",
        group_total="n",
    )

    def pick(q_num: int, q_den: int, alias: str) -> Column:
        target = F.ceil(F.col("n") * q_num / q_den)
        return F.max(
            F.when(F.col("rn") == target, F.col("o_totalprice"))
        ).alias(alias)

    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").alias("n_orders"),
        pick(1, 4, "p25"),
        pick(2, 4, "p50"),
        pick(3, 4, "p75"),
    )


PRICE_QUARTILES_BY_PRIORITY_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       max(n) AS n_orders,
       max(CASE WHEN rn = ceil(n * 1 / 4) THEN o_totalprice END) AS p25,
       max(CASE WHEN rn = ceil(n * 2 / 4) THEN o_totalprice END) AS p50,
       max(CASE WHEN rn = ceil(n * 3 / 4) THEN o_totalprice END) AS p75
FROM ranked
GROUP BY o_orderpriority
"""


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON `props` column with
    an explicit schema (`from_json` — schema-on-read, vectorized,
    null-safe on malformed input) and aggregate the extracted field.
    At 100 TB, parsing with a declared schema beats schema inference
    by a full extra pass over the data; integer aggregation keeps the
    oracle comparison exact."""
    e = load_table(spark, sf_dir, "events")
    # BIGINT parse schema: the oracle casts json_extract to BIGINT, so
    # an int32-overflowing k would silently become NULL here under
    # 'k INT' while DuckDB kept it — symmetric declared widths
    k = F.from_json("props", "k BIGINT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_PROPS_ROLLUP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


def events_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: hourly AND daily
    event aggregates in ONE pass via GROUPING SETS — a single Expand +
    aggregation instead of two scans (at 100 TB, one read of the fact
    table instead of one per granularity). `grain` disambiguates the
    grouping-set a row came from (the grouping-id in plan terms)."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    day = F.date_trunc("day", "ts")
    binned = e.select(
        hour.alias("bucket_hour"), day.alias("bucket_day"), "value"
    )
    return (
        binned.groupingSets(
            [["bucket_hour"], ["bucket_day"]], "bucket_hour", "bucket_day"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.when(F.col("bucket_hour").isNotNull(), F.lit("hour"))
            .otherwise(F.lit("day"))
            .alias("grain"),
            F.coalesce("bucket_hour", "bucket_day").alias("bucket"),
            "n_events",
            "total_value",
        )
    )


EVENTS_MULTI_GRANULARITY_ROLLUP_SQL = f"""
SELECT CASE WHEN bucket_hour IS NOT NULL THEN 'hour' ELSE 'day' END AS grain,
       COALESCE(bucket_hour, bucket_day) AS bucket,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM (
  SELECT date_trunc('hour', ts) AS bucket_hour,
         date_trunc('day', ts) AS bucket_day,
         value
  FROM events
)
GROUP BY GROUPING SETS ((bucket_hour), (bucket_day))
"""


def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-part numeric columns → long
    (metric, value) rows — the inverse reshape of pivot. Pure narrow
    Expand (each input row emits one row per unpivoted column), no
    shuffle; the long form is what metric stores and ML feature
    pipelines ingest."""
    p = load_table(spark, sf_dir, "part")
    out = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    # DuckDB's UNPIVOT EXCLUDES NULL measure values by default while
    # Spark's unpivot keeps them — filter to pin the same contract
    # should the part columns ever regenerate with NULLs
    return out.where(F.col("value").isNotNull())


UNPIVOT_PART_METRICS_SQL = """
SELECT p_partkey, metric, value
FROM (
  SELECT p_partkey,
         CAST(p_size AS DOUBLE) AS p_size,
         CAST(p_retailprice AS DOUBLE) AS p_retailprice
  FROM part
) UNPIVOT (value FOR metric IN (p_size, p_retailprice))
"""


def props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType pipeline: parse JSON props to map<string,bigint>,
    explode to (key, value) rows, aggregate per key — the generic
    schema-free path for ragged properties (vs json_props_rollup's
    declared-schema extraction of one known field). Narrow parse +
    generate; one shuffle for the aggregate."""
    e = load_table(spark, sf_dir, "events")
    kv = e.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "prop_value"
        ),
    )
    return kv.groupBy("event_type", "prop_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("prop_value").alias("sum_value"),
        F.min("prop_value").alias("min_value"),
        F.max("prop_value").alias("max_value"),
    )


#: ORACLE CONTRACT NOTE: values are reconstructed via
#: json_extract(props, '$.' || k), which assumes keys contain no
#: JSON-path metacharacters (dot/quote/bracket) and no duplicate keys
#: — true for the harness generator's single simple-key props. For
#: arbitrary keys the mirror would switch to DuckDB's json_each
#: (Spark's map<string,bigint> parse handles both already).
PROPS_MAP_EXPLODE_SQL = """
SELECT event_type, prop_key,
       count(*) AS n,
       CAST(sum(prop_value) AS BIGINT) AS sum_value,
       min(prop_value) AS min_value,
       max(prop_value) AS max_value
FROM (
  SELECT event_type, k AS prop_key,
         CAST(json_extract(props, '$.' || k) AS BIGINT) AS prop_value
  FROM (SELECT event_type, props, unnest(json_keys(props)) AS k FROM events)
)
GROUP BY event_type, prop_key
"""


def salted_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-management join surfaced as a query: orders ⋈ customer
    executed through `skew.salted_join` (hot keys spread across 7
    deterministic salt sub-keys, small side replicated per salt). The
    oracle is the PLAIN join — identical values is precisely the
    salted join's contract."""
    from .skew import salted_join

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    return salted_join(
        orders, customer, "o_custkey", salt_buckets=7, unique_col="o_orderkey"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment")


SALTED_CUSTOMER_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def bloom_pruned_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter join lever surfaced as a query: orders ⋈
    (customers of one nation, ~4% selectivity) through
    `skew.bloom_prefilter_join` — the fact side is pruned by a
    broadcast membership set BEFORE the join, the join removes the
    false positives, and the oracle is the PLAIN join (the prefilter's
    transparency contract). At 100 TB this is the difference between
    shuffling the full fact table and shuffling the ~4% that can
    join."""
    from .skew import bloom_prefilter_join

    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    return bloom_prefilter_join(
        orders, dim, fact_key="o_custkey", dim_key="c_custkey"
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_name")


BLOOM_PRUNED_CUSTOMER_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_nationkey = 3
"""


def region_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics suite over the nullable `region` column:
    grouping keeps the NULL group, count(*) vs count(col) differ by
    the nulls, and the null-sensitive scalar family (coalesce, nullif,
    null-safe equality) is exercised — SQL NULL rules are where
    engines silently diverge, so they get their own differential
    query."""
    loans = views.loans(spark, sf_dir)
    return (
        loans.groupBy("region")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("region").alias("n_region_nonnull"),
            F.count(F.when(F.col("region").isNull(), 1)).alias("n_region_null"),
            F.count(
                F.nullif(F.col("region"), F.lit("Mumbai"))
            ).alias("n_not_mumbai"),
            F.sum(
                F.col("region").eqNullSafe(F.lit("Delhi")).cast("long")
            ).alias("n_delhi_nullsafe"),
        )
        .select(
            F.coalesce("region", F.lit("<NULL>")).alias("region_display"),
            "n_rows",
            "n_region_nonnull",
            "n_region_null",
            "n_not_mumbai",
            "n_delhi_nullsafe",
        )
    )


REGION_NULL_AUDIT_SQL = views.with_loan_ctes(
    """
    SELECT COALESCE(region, '<NULL>') AS region_display,
           count(*) AS n_rows,
           count(region) AS n_region_nonnull,
           count(CASE WHEN region IS NULL THEN 1 END) AS n_region_null,
           count(nullif(region, 'Mumbai')) AS n_not_mumbai,
           CAST(sum(CAST(region IS NOT DISTINCT FROM 'Delhi' AS BIGINT))
                AS BIGINT) AS n_delhi_nullsafe
    FROM loans
    GROUP BY region
    """
)


# --- ranking window -------------------------------------------------------


def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the canonical Spark pattern.
    One shuffle on the partition key; rank ties broken on o_orderkey
    so results are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn(
            # BIGINT like the oracle (DuckDB row_number is BIGINT)
            "rank_in_customer", F.row_number().over(w).cast("long")
        )
        .where(F.col("rank_in_customer") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_customer")
    )


TOP3_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_customer FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey)
           AS rank_in_customer
  FROM orders
) WHERE rank_in_customer <= 3
"""


# --- rollup / pivot -------------------------------------------------------


def rollup_revenue_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) over the orders→customer→nation→region
    star join. Dims are broadcast (region 5, nation 25 rows — even at
    100 TB these stay broadcast); the fact shuffles once for the
    aggregation; rollup levels are computed in the same pass via
    Expand."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        dsum("o_totalprice").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ROLLUP_REVENUE_BY_GEO_SQL = f"""
SELECT r_name, n_name,
       {dsum_sql('o_totalprice')} AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot on order status with an explicit value list (never
    implicit at scale — that needs a pre-pass to discover values).
    Counts null-fill to 0 to match SQL conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["O", "F", "P"])
    )


PIVOT_STATUS_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""


# --- scalar function library showcase ------------------------------------


def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/string/math scalar expressions — all JVM built-ins inside
    one whole-stage-codegen'd projection (the reference computes its
    scalars in row-wise Python, /root/reference/main.py:82-141)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.length("o_orderpriority").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias(
            "prio_snake"
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_add(d, 30).alias("due_30d"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias("age_days"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.abs(F.col("o_totalprice") * F.lit(-1.0)).alias("price_abs"),
        F.floor(F.col("o_totalprice") / F.lit(1000)).cast("long").alias("price_k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("NOT_P")).alias(
            "status_or_default"
        ),
    )


SCALAR_FUNCTION_SUITE_SQL = """
SELECT o_orderkey,
       upper(o_orderpriority) AS prio_upper,
       lower(o_orderstatus) AS status_lower,
       CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
       substring(o_orderpriority, 1, 1) AS prio_code,
       replace(o_orderpriority, '-', '_') AS prio_snake,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
       concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       CAST(o_orderdate AS DATE) + 30 AS due_30d,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
            AS INTEGER) AS age_days,
       sqrt(o_totalprice) AS price_sqrt,
       abs(o_totalprice * CAST(-1.0 AS DOUBLE)) AS price_abs,
       CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
       o_orderkey % 7 AS key_mod7,
       coalesce(nullif(o_orderstatus, 'P'), 'NOT_P') AS status_or_default
FROM orders
"""


# --- event-time operators (batch shapes; streaming twins in streaming/) ---


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap via lag + integer cumsum.
    One shuffle on user_id; both window passes share the partitioning
    (Catalyst reuses the exchange). Integer session arithmetic keeps
    it engine-exact."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.withColumn("session_seq", F.sum(is_new).over(wsum))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("session_value"),
    )


SESSIONIZE_EVENTS_SQL = f"""
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       {dsum_sql('value')} AS session_value
FROM (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
            AS session_seq
  FROM (
    SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                   THEN 1 ELSE 0 END AS is_new
    FROM (
      SELECT *, epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id))
                AS gap_us
      FROM events
    )
  )
) GROUP BY user_id, session_seq
"""


def asof_latest_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time lookup), expressed as an ignore-nulls
    last_value window instead of a range join — one shuffle on the
    entity key, no O(n·m) candidate explosion. The same pattern at
    100 TB: partition by key, order by time, carry-forward."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        last_signup.alias("asof_signup_ts"),
    )


ASOF_LATEST_SIGNUP_SQL = """
SELECT event_id, user_id, ts, event_type,
       last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS asof_signup_ts
FROM events
"""


def events_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch twin of the
    Structured Streaming query in streaming/). `window()` is a plain
    projection + groupBy — partial-agg shuffles only group rows."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


EVENTS_TUMBLING_5MIN_SQL = f"""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {dsum_sql('value')} AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY time_bucket(INTERVAL '5 minutes', ts), event_type
"""


# --- bucketed (pre-shuffled) co-located join -------------------------------

N_BUCKETS = 8


def bucketed_customer_orders_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO-SHUFFLE equi-join via BUCKETING — the co-located-join
    feature every 100 TB warehouse leans on: both sides are written
    `bucketBy(N, key).sortBy(key)`, so at read time Spark knows rows
    with equal keys share a bucket file and plans a sort-merge join
    with NO exchange and NO sort on either side (asserted in
    tests/test_plans.py). At scale you bucket the fact table ONCE and
    every subsequent key join rides it; here the builder materializes
    the bucketed tables per call (the write cost IS the point — it's
    the one-time shuffle you amortize).

    The join output is aggregated per market segment; values match the
    plain-join oracle exactly (bucketing is a physical layout choice,
    invisible to results)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    base = tmpdirs.claim("bucketed_join", "bucketed_join_")
    # one task (hence ONE FILE) per bucket: Spark elides the merge-join
    # Sort only for single-file buckets (multi-file buckets cannot be
    # assumed globally sorted), so pre-repartition on the bucket key
    (
        c.repartition(N_BUCKETS, F.col("c_custkey"))
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{base}/customer_b")
        .saveAsTable("bucketed_customer_tmp")
    )
    (
        o.repartition(N_BUCKETS, F.col("o_custkey"))
        .write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{base}/orders_b")
        .saveAsTable("bucketed_orders_tmp")
    )
    cb = spark.table("bucketed_customer_tmp")
    ob = spark.table("bucketed_orders_tmp")
    joined = cb.join(ob, cb.c_custkey == ob.o_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


BUCKETED_CUSTOMER_ORDERS_JOIN_SQL = f"""
SELECT c_mktsegment,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# --- data-quality audit ----------------------------------------------------


def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass DATA-QUALITY audit over the orders fact — the
    validation gate a production pipeline runs before publishing:
    null-key counts, domain violations (non-positive price), temporal
    sanity (dates outside the known range), plus referential
    integrity against the customer dimension (orphan FKs via a
    broadcast anti-join membership flag folded into the same
    aggregate). All counters are conditional integer sums in ONE
    aggregation pass over the scan.

    Scale shape: narrow projection + broadcast dim key set + a single
    global aggregate (partial-agg'd map-side; one row out)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    flagged = o.join(
        F.broadcast(c),
        o.o_custkey == c.c_custkey,
        "left_outer",
    )
    bit = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    return flagged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        bit(F.col("o_custkey").isNull()).alias("n_null_custkey"),
        bit(F.col("o_totalprice") <= 0).alias("n_nonpositive_price"),
        bit(
            (F.col("o_orderdate") < "1992-01-01")
            | (F.col("o_orderdate") >= "1999-01-01")
        ).alias("n_date_out_of_range"),
        bit(F.col("c_custkey").isNull()).alias("n_orphan_orders"),
        bit(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "n_bad_status"
        ),
    )


DATA_QUALITY_AUDIT_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_custkey,
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nonpositive_price,
       CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                      OR o_orderdate >= TIMESTAMP '1999-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_date_out_of_range,
       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_orders,
       CAST(sum(CASE WHEN NOT (o_orderstatus IN ('O', 'F', 'P'))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


# --- interval-containment join via bin bucketing ---------------------------

#: deterministic promo campaign windows (inclusive start, exclusive
#: end) spanning the orders date range — the "small-but-not-broadcast-
#: able-at-scale" interval side of a containment join
PROMO_PERIODS: list[tuple[int, str, str]] = [
    (1, "1995-02-01", "1995-03-15"),
    (2, "1995-11-15", "1996-01-10"),
    (3, "1996-06-01", "1996-06-30"),
    (4, "1996-12-01", "1997-01-05"),
    (5, "1997-07-01", "1997-08-20"),
    (6, "1998-03-10", "1998-05-01"),
    (7, "1998-11-20", "1999-01-15"),
    (8, "1999-08-01", "1999-10-01"),
    (9, "2000-04-01", "2000-04-25"),
    (10, "2001-01-01", "2001-03-01"),
]


def interval_bin_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (order date ∈ promo window) executed
    as a BIN-BUCKETED EQUI-JOIN — the scale-safe form of a range join.

    A naive `o_orderdate BETWEEN p.start AND p.end` predicate gives
    Catalyst no equi-key, so with a non-broadcastable interval side it
    plans BroadcastNestedLoopJoin/CartesianProduct — O(n·m) and the
    classic 100 TB range-join cliff. The standard fix (built into
    Databricks' range-join hints, reproduced here with plain
    DataFrame ops): discretize time into bins (months), explode each
    interval into the bins it overlaps, equi-join fact rows to bins,
    then re-check the exact BETWEEN predicate. The join is now
    hash-partitionable on the bin key (shuffle/broadcast — the
    planner's choice, never nested-loop), candidates per row are
    bounded by intervals-per-bin, and the residual filter restores
    exact semantics. Windows here are non-overlapping, so each order
    matches ≤ 1 promo (no dedup step; overlapping intervals would add
    a distinct on (orderkey, promo)).

    The plan test pins the absence of BroadcastNestedLoopJoin AND
    CartesianProduct."""
    periods = spark.createDataFrame(
        [(i, dt.date.fromisoformat(s), dt.date.fromisoformat(e))
         for i, s, e in PROMO_PERIODS],
        "promo_id int, p_start date, p_end date",
    )
    bins = periods.select(
        "promo_id",
        "p_start",
        "p_end",
        F.explode(
            F.sequence(
                F.trunc("p_start", "month"),
                F.trunc("p_end", "month"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("bin_month"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    joined = o.join(
        bins,
        (F.trunc(F.col("o_orderdate").cast("date"), "month")
         == F.col("bin_month"))
        & (F.col("o_orderdate").cast("date") >= F.col("p_start"))
        & (F.col("o_orderdate").cast("date") < F.col("p_end")),
    )
    return joined.groupBy("promo_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("promo_revenue"),
    )


_PROMO_VALUES = ", ".join(
    f"({i}, DATE '{s}', DATE '{e}')" for i, s, e in PROMO_PERIODS
)

INTERVAL_BIN_JOIN_REVENUE_SQL = f"""
WITH periods(promo_id, p_start, p_end) AS (VALUES {_PROMO_VALUES})
SELECT CAST(promo_id AS INTEGER) AS promo_id,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS promo_revenue
FROM orders JOIN periods
  ON CAST(o_orderdate AS DATE) >= p_start
 AND CAST(o_orderdate AS DATE) < p_end
GROUP BY 1
"""


# --- join-key skew diagnostic ----------------------------------------------


def skew_detection_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for orders.o_custkey — the
    measurement that DRIVES the mitigation choices the engine already
    ships (salting in `salted_customer_orders`, AQE skew-join):
    per-key counts → one global row with key cardinality, max/avg
    key frequency, and the skew ratio. At 100 TB you run this (one
    partial-agg'd shuffle + a scalar fold) BEFORE the big join and
    pick the strategy from the ratio; a ratio near 1 means hash
    partitioning balances, a hot ratio means salt or broadcast.

    Doubles are two mirrored divisions of exact integers —
    deterministic cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.max("cnt").alias("max_key_rows"),
        (
            F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_key_rows"),
        (
            F.max("cnt").cast("double")
            / (F.sum("cnt").cast("double") / F.count(F.lit(1)).cast("double"))
        ).alias("skew_ratio"),
    )
    # deterministic argmax (max cnt, ties → min key) as a broadcast
    # 1-row scalar join — the engine's standard scalar-aggregate shape
    hot = (
        per_key.orderBy(F.col("cnt").desc(), F.col("o_custkey"))
        .limit(1)
        .select(F.col("o_custkey").alias("hottest_key"))
    )
    return stats.crossJoin(F.broadcast(hot))


SKEW_DETECTION_PROFILE_SQL = """
WITH per_key AS (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
)
SELECT count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS total_rows,
       max(cnt) AS max_key_rows,
       CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_key_rows,
       CAST(max(cnt) AS DOUBLE)
         / (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         AS skew_ratio,
       min(CASE WHEN cnt = (SELECT max(cnt) FROM per_key)
                THEN o_custkey END) AS hottest_key
FROM per_key
"""


# --- batch MERGE upsert (warehouse pattern) --------------------------------

#: deterministic change feed: every key ≡ 3 (mod 10) is UPDATED
#: (status 'U', price + 1.50), every key ≡ 0 (mod 97) also produces
#: an INSERT under key + INSERT_KEY_OFFSET with status 'N'
MERGE_UPDATE_MOD, MERGE_UPDATE_REM = 10, 3
MERGE_INSERT_MOD = 97
INSERT_KEY_OFFSET = 500_000_000


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO (upsert) — the warehouse maintenance pattern
    (Delta/Iceberg MERGE) expressed in pure DataFrame ops: target ⟗
    change-feed full-outer join on the key; matched rows take the
    source's values, unmatched-target rows pass through, unmatched-
    source rows insert. The change feed is synthesized
    deterministically from the target (same synthesize→process→verify
    strategy as the PII/excerpt/diff ops).

    Output: per final-status row counts + exact decimal revenue — the
    post-merge audit a MERGE job emits. Scale shape: both sides
    shuffle once on the key into a co-partitioned full-outer join
    (sort-merge at scale); at 100 TB this is file-pruned by the
    table format's min/max stats, same logical plan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.where(
        F.col("o_orderkey") % MERGE_UPDATE_MOD == MERGE_UPDATE_REM
    ).select(
        "o_orderkey",
        F.lit("U").alias("s_status"),
        (F.col("o_totalprice") + F.lit(1.5)).alias("s_totalprice"),
    )
    inserts = o.where(F.col("o_orderkey") % MERGE_INSERT_MOD == 0).select(
        (F.col("o_orderkey") + INSERT_KEY_OFFSET).alias("o_orderkey"),
        F.lit("N").alias("s_status"),
        F.col("o_totalprice").alias("s_totalprice"),
    )
    source = updates.unionByName(inserts)
    merged = o.join(source, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.coalesce("s_status", "o_orderstatus").alias("status"),
        F.coalesce("s_totalprice", "o_totalprice").alias("totalprice"),
    )
    return merged.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("totalprice").alias("revenue"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


MERGE_UPSERT_ORDERS_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
source AS (
  SELECT o_orderkey, 'U' AS s_status,
         o_totalprice + 1.5 AS s_totalprice
  FROM o WHERE o_orderkey % {MERGE_UPDATE_MOD} = {MERGE_UPDATE_REM}
  UNION ALL
  SELECT o_orderkey + {INSERT_KEY_OFFSET} AS o_orderkey, 'N' AS s_status,
         o_totalprice AS s_totalprice
  FROM o WHERE o_orderkey % {MERGE_INSERT_MOD} = 0
),
merged AS (
  SELECT COALESCE(s.o_orderkey, o.o_orderkey) AS o_orderkey,
         COALESCE(s.s_status, o.o_orderstatus) AS status,
         COALESCE(s.s_totalprice, o.o_totalprice) AS totalprice
  FROM o FULL OUTER JOIN source s ON o.o_orderkey = s.o_orderkey
)
SELECT status,
       count(*) AS n_rows,
       {dsum_sql('totalprice')} AS revenue,
       min(o_orderkey) AS min_key,
       max(o_orderkey) AS max_key
FROM merged
GROUP BY status
"""


# --- VARIANT (Spark 4 semi-structured type) schema-on-read ------------------


def variant_js_expr() -> str:
    """The nested-JSON construction over the events columns, shared
    by the operator and its row-level test so the two cannot drift.

    Escape-safe: to_json(named_struct(...)) quotes and escapes
    strings properly and degrades nulls by dropping the field (a raw
    concat would produce malformed JSON for a quote in event_type and
    a NULL document for any NULL column). The conditional `extra`
    field needs two shapes, hence the CASE over two to_json calls."""
    base_fields = (
        "'src', from_json(props, 'k BIGINT'), "
        "'meta', named_struct('t', event_type, 'u', user_id), "
        "'tags', array(event_id % 7, event_id % 3)"
    )
    return (
        f"CASE WHEN event_id % 3 = 0 THEN to_json(named_struct("
        f"{base_fields}, 'extra', event_id % 100)) "
        f"ELSE to_json(named_struct({base_fields})) END"
    )


def variant_schema_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT round trip — the open-schema semi-structured
    path (`from_json` with a declared schema, `json_props_rollup`,
    needs the shape up front; VARIANT parses ONCE into a typed binary
    encoding and lets every consumer extract its own paths later —
    the lakehouse semi-structured column type): build a nested JSON
    document from typed columns (objects, an array, a CONDITIONALLY
    PRESENT field), `parse_json` it into a VARIANT, then recover every
    scalar with typed `variant_get` paths and aggregate.

    The oracle recomputes the aggregates from the RAW columns (no
    JSON at all except the original props.k), so the construct →
    parse → path-extract round trip must return the original values
    exactly — including NULL for the absent path and the conditional
    field's presence count.

    Scale shape: fully narrow (parse + extraction ride the scan,
    zero Python) + one partial-agg'd shuffle on the event_type key.
    At 100 TB the win is parse-once: N downstream path extractions
    share one binary-encoded parse instead of N string re-parses."""
    e = load_table(spark, sf_dir, "events")
    js = variant_js_expr()
    v = e.select(
        "event_type",
        F.expr(f"parse_json({js})").alias("v"),
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.src.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.meta.u', 'bigint')").alias("u"),
        F.expr("variant_get(v, '$.tags[1]', 'bigint')").alias("tag1"),
        F.expr("variant_get(v, '$.extra', 'bigint')").alias("extra"),
        F.expr("variant_get(v, '$.nope', 'bigint')").alias("absent"),
        F.expr("variant_get(v, '$.meta.t', 'string')").alias("t_back"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum("u").cast("long").alias("sum_user"),
        F.sum("tag1").cast("long").alias("sum_tag1"),
        F.count("extra").alias("n_extra"),
        F.sum("extra").cast("long").alias("sum_extra"),
        F.count("absent").alias("n_absent_path"),
        # NULL-safe compare (drift-hardening sweep, r6): a NULL
        # event_type round-trips to a NULL t_back — `=` would yield
        # NULL → counted as NOT ok, while the oracle counts the row
        F.sum(
            F.when(F.col("t_back").eqNullSafe(F.col("event_type")), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_type_roundtrip_ok"),
    )


#: Oracle: recompute from the RAW columns — the VARIANT extraction
#: must return the original scalars bit-for-bit.
VARIANT_SCHEMA_ON_READ_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(sum(user_id) AS BIGINT) AS sum_user,
       CAST(sum(event_id % 3) AS BIGINT) AS sum_tag1,
       CAST(count(CASE WHEN event_id % 3 = 0 THEN 1 END) AS BIGINT)
         AS n_extra,
       CAST(sum(CASE WHEN event_id % 3 = 0 THEN event_id % 100 END)
            AS BIGINT) AS sum_extra,
       CAST(0 AS BIGINT) AS n_absent_path,
       CAST(count(*) AS BIGINT) AS n_type_roundtrip_ok
FROM events
GROUP BY event_type
"""


# --- GDPR right-to-erasure cascade audit -------------------------------------

ERASURE_MOD, ERASURE_OFF = 40, 7  # deletion set: c_custkey % 40 == 7


def right_to_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR Art. 17) CASCADE audit — the compliance
    pipeline a production engine owes its operators: given a deletion
    set of customers (c_custkey % ERASURE_MOD == ERASURE_OFF, the
    deterministic stand-in for a deletion-request feed), propagate
    the erasure across every table that references them — customer
    itself, orders by custkey, lineitem transitively through the
    deleted orders' keys, events by user_id — and emit one audit row
    per table: rows before, rows deleted, rows after, and RESIDUALS
    (kept rows still referencing a deleted identity — the compliance
    proof). Residuals are derived from an INDEPENDENT path (r9,
    ADVICE r8): direct legs re-detect deletion by the PREDICATE, and
    lineitem re-walks the transitive chain through orders-of-deleted-
    customers — never the same del-key relation the deletion used —
    so a wrong deletion-set construction yields a nonzero residual
    instead of a vacuous 0.

    NULL-safety: all joins are EXISTS/anti-join semantics (never
    `NOT IN`, whose three-valued logic silently empties the result
    if the subquery ever contains a NULL key).

    Scale shape: every leg is one keyed semi/anti join — the deleted
    customer set broadcasts at harness size (2.5% of a dimension);
    at 100 TB the same plan shuffles fact tables on their FK once per
    leg, and lineitem's transitive leg keys on the deleted ORDER set
    (never a three-way join). Counts are single partial-agg'd
    scalars per table."""
    from ..sources.registry import load_table

    del_cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.expr(f"c_custkey % {ERASURE_MOD} = {ERASURE_OFF}"))
        .select(F.col("c_custkey").alias("k"))
    )
    # no `balanced` here: every branch ends in a COUNT (partial aggs
    # reduce per input partition before any exchange), so a repartition
    # would only add an exchange per scan branch
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    del_orders = orders.join(
        F.broadcast(del_cust), orders.o_custkey == F.col("k")
    ).select(F.col("o_orderkey").alias("ok"))

    # residuals derive from an INDEPENDENT path (ADVICE r8: semi-of-
    # anti on the same key set is tautologically 0 and can't catch a
    # missed propagation): direct legs re-detect deleted keys by the
    # PREDICATE (not the del_cust relation the deletion used), and
    # lineitem re-walks the transitive chain through orders-of-
    # deleted-customers (not the del_orders set used for deletion) —
    # a wrong del_cust/del_orders construction now yields nonzero
    # residuals that mismatch the oracle
    resid_pred = f"% {ERASURE_MOD} = {ERASURE_OFF}"
    pred_orders = orders.where(
        F.expr(f"o_custkey {resid_pred}")
    ).select(F.col("o_orderkey").alias("pok"))

    def audit(name, df, key_col, del_keys, del_key_col, residual_of):
        kept = df.join(
            F.broadcast(del_keys),
            F.col(key_col) == F.col(del_key_col),
            "left_anti",
        )
        residual = residual_of(kept)
        return (
            df.agg(F.count(F.lit(1)).cast("long").alias("rows_before"))
            .crossJoin(
                kept.agg(
                    F.count(F.lit(1)).cast("long").alias("rows_after")
                )
            )
            .crossJoin(
                residual.agg(
                    F.count(F.lit(1)).cast("long").alias("residuals")
                )
            )
            .select(
                F.lit(name).alias("table_name"),
                "rows_before",
                (F.col("rows_before") - F.col("rows_after"))
                .cast("long")
                .alias("rows_deleted"),
                "rows_after",
                "residuals",
            )
        )

    out = audit(
        "customer", cust, "c_custkey", del_cust, "k",
        lambda kept: kept.where(F.expr(f"c_custkey {resid_pred}")),
    )
    out = out.unionByName(audit(
        "orders", orders, "o_custkey", del_cust, "k",
        lambda kept: kept.where(F.expr(f"o_custkey {resid_pred}")),
    ))
    out = out.unionByName(audit(
        "lineitem", li, "l_orderkey", del_orders, "ok",
        lambda kept: kept.join(
            F.broadcast(pred_orders),
            F.col("l_orderkey") == F.col("pok"),
            "left_semi",
        ),
    ))
    out = out.unionByName(audit(
        "events", ev, "user_id", del_cust, "k",
        lambda kept: kept.where(F.expr(f"user_id {resid_pred}")),
    ))
    return out


RIGHT_TO_ERASURE_AUDIT_SQL = f"""
WITH del_cust AS (
  SELECT c_custkey AS k FROM customer
  WHERE c_custkey % {ERASURE_MOD} = {ERASURE_OFF}
),
del_orders AS (
  SELECT o_orderkey AS ok FROM orders
  WHERE EXISTS (SELECT 1 FROM del_cust d WHERE d.k = o_custkey)
)
SELECT 'customer' AS table_name,
       CAST(count(*) AS BIGINT) AS rows_before,
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_cust d
                                  WHERE d.k = c_custkey)
                THEN 1 ELSE 0 END) AS BIGINT) AS rows_deleted,
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_cust d
                                  WHERE d.k = c_custkey)
                THEN 0 ELSE 1 END) AS BIGINT) AS rows_after,
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM del_cust d
                                      WHERE d.k = c_custkey)
                      AND c_custkey % {ERASURE_MOD} = {ERASURE_OFF}
                THEN 1 ELSE 0 END) AS BIGINT) AS residuals
FROM customer
UNION ALL
SELECT 'orders',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_cust d
                                  WHERE d.k = o_custkey)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_cust d
                                  WHERE d.k = o_custkey)
                THEN 0 ELSE 1 END) AS BIGINT),
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM del_cust d
                                      WHERE d.k = o_custkey)
                      AND o_custkey % {ERASURE_MOD} = {ERASURE_OFF}
                THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_orders d
                                  WHERE d.ok = l_orderkey)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_orders d
                                  WHERE d.ok = l_orderkey)
                THEN 0 ELSE 1 END) AS BIGINT),
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM del_orders d
                                      WHERE d.ok = l_orderkey)
                      AND EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l_orderkey
                                    AND o.o_custkey % {ERASURE_MOD}
                                        = {ERASURE_OFF})
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_cust d
                                  WHERE d.k = user_id)
                THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM del_cust d
                                  WHERE d.k = user_id)
                THEN 0 ELSE 1 END) AS BIGINT),
       CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM del_cust d
                                      WHERE d.k = user_id)
                      AND user_id % {ERASURE_MOD} = {ERASURE_OFF}
                THEN 1 ELSE 0 END) AS BIGINT)
FROM events
"""
