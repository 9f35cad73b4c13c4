"""Loan-domain mapping over the harness star schema.

The reference pipeline (SURVEY.md §1) reads `customers ⋈ loans` from
Postgres and `loan_extensions` from Mongo. The harness only ships the
TPC-H-ish star schema, so we derive deterministic loan-shaped views
from `orders`/`customer` — IDENTICALLY in Spark (for `queries()`) and
in ANSI SQL (for `oracle_sql()`, DuckDB). Both definitions live here,
side by side, so they cannot drift.

Derivation (pure functions of `o_orderkey`, so Spark and DuckDB agree
bit-for-bit):
- duration_months ∈ [-3, 60]  → exercises the zero/negative-duration
  guards (/root/reference/main.py:96,159) and EOM `add_months` clamping.
- region cycles through clean names, typos, and NULL → exercises the
  fuzzy cleanup incl. NULL passthrough (/root/reference/main.py:69-75).
- ~80% of loans get an "extension" row (o_orderkey % 5 <> 0) →
  exercises the left-join NULL propagation trap (SURVEY.md §2.11).
- emi_collected spans [0, 1.39×principal] → exercises overpayment
  (negative total_to_be_collected, /root/reference/main.py:106,115).

Scale note: these views are narrow projections over a single fact
scan; at 100 TB they stay embarrassingly parallel (no shuffle — every
derived column is a scalar function of the row).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_table

# Pinned "today" for all date-relative metrics over the star schema
# (orders span 1995-01..2001-08, so this yields a mix of matured,
# in-flight, and future loans → every DPD bucket is populated).
# The reference instead captures wall-clock datetime.today()
# (/root/reference/main.py:80) — parameterizing it is a deliberate
# engine decision (SURVEY.md §2.8).
AS_OF = dt.date(1998, 6, 17)
AS_OF_SQL = "DATE '1998-06-17'"

VALID_CITIES = ["Bangalore", "Mumbai", "Delhi", "Kolkata"]

_REGIONS = [
    "Bangalore",
    "Mumbai",
    "Delhi",
    "Kolkata",
    "Bengaluru",
    "Mumbay",
    "delhi",
    "KOLKATA",
    None,
]

_PRODUCTS = ["personal", "gold", "vehicle", "home"]


def loans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loan table analog of `loan_mgmt.loans` (/root/reference/main.py:29-35)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    disb = F.to_date("o_orderdate")
    dur = (k % 64 - 3).cast("int")
    region: Column = F.lit(None).cast("string")
    # build the CASE from the last branch backwards so order matches SQL
    expr = None
    for i, name in enumerate(_REGIONS[:-1]):
        cond = (k % 9) == i
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    region = expr.otherwise(F.lit(None))
    return o.select(
        k.alias("loan_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").alias("disbursement_amount"),
        disb.alias("disbursement_date"),
        F.add_months(disb, dur).alias("due_date"),
        region.alias("region"),
        (F.lit(5.0) + (k % 20) * F.lit(0.5)).alias("interest_rate"),
        (F.col("o_totalprice") * F.lit(0.5)).alias("pos"),
    )


def extensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo `loan_extensions` analog (/root/reference/main.py:51-55).

    The reference pushes a 3-field projection into the Mongo find();
    here the projection is the select list — Catalyst prunes the scan
    to exactly these columns (ReadSchema in .explain).
    """
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    product = None
    for i, name in enumerate(_PRODUCTS[:-1]):
        cond = (k % 4) == i
        product = F.when(cond, name) if product is None else product.when(cond, name)
    product = product.otherwise(_PRODUCTS[-1])
    return (
        o.where(k % 5 != 0)
        .select(
            k.alias("loan_id"),
            product.alias("product_type"),
            (F.col("o_totalprice") * ((k % 140) / F.lit(100.0))).alias("emi_collected"),
        )
    )


def customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dimension analog of `customer_mgmt.customers`."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
    )


# --- The same three views as DuckDB-runnable SQL CTE bodies. ---------------
# Arithmetic is written with the SAME operation order as the Spark
# expressions above so double results are bit-identical.

LOANS_SQL = """
  SELECT
    o_orderkey AS loan_id,
    o_custkey AS customer_id,
    o_totalprice AS disbursement_amount,
    CAST(o_orderdate AS DATE) AS disbursement_date,
    CAST(CAST(o_orderdate AS DATE)
         + to_months(CAST(o_orderkey % 64 - 3 AS INTEGER)) AS DATE) AS due_date,
    CASE CAST(o_orderkey % 9 AS INTEGER)
      WHEN 0 THEN 'Bangalore' WHEN 1 THEN 'Mumbai' WHEN 2 THEN 'Delhi'
      WHEN 3 THEN 'Kolkata' WHEN 4 THEN 'Bengaluru' WHEN 5 THEN 'Mumbay'
      WHEN 6 THEN 'delhi' WHEN 7 THEN 'KOLKATA' ELSE NULL
    END AS region,
    CAST(5.0 AS DOUBLE) + (o_orderkey % 20) * CAST(0.5 AS DOUBLE) AS interest_rate,
    o_totalprice * CAST(0.5 AS DOUBLE) AS pos
  FROM orders
"""

EXTENSIONS_SQL = """
  SELECT
    o_orderkey AS loan_id,
    CASE CAST(o_orderkey % 4 AS INTEGER)
      WHEN 0 THEN 'personal' WHEN 1 THEN 'gold' WHEN 2 THEN 'vehicle'
      ELSE 'home'
    END AS product_type,
    o_totalprice * ((o_orderkey % 140) / 100.0) AS emi_collected
  FROM orders
  WHERE o_orderkey % 5 <> 0
"""

CUSTOMERS_SQL = """
  SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer
"""


def with_loan_ctes(body: str) -> str:
    """Wrap a SELECT body with the loan-domain CTEs."""
    return (
        "WITH loans AS (" + LOANS_SQL + "),\n"
        "extensions AS (" + EXTENSIONS_SQL + "),\n"
        "customers AS (" + CUSTOMERS_SQL + ")\n" + body
    )
