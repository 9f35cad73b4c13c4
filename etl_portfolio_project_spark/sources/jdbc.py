"""JDBC (Postgres) source/sink — the production path for S1/S3/S4/S5/S6.

Reference behavior being re-expressed (SURVEY.md §2.1):
- S1: the customers⋈loans join is pushed INTO Postgres as SQL text
  (/root/reference/main.py:25-41, psycopg2 conn from
  connect_postgres.py:15-23). Spark keeps the same pushdown with
  `option("query", ...)` — the join executes server-side and Spark
  receives the projected result.
- S4: `CREATE SCHEMA IF NOT EXISTS test`
  (/root/reference/connect_postgres_target.py:25-26).
- S5/S6: full-replace loads via `to_sql(if_exists="replace")`
  (/root/reference/main.py:204-219) → `mode("overwrite")` with
  `truncate` to avoid drop/recreate churn.

The harness has no database server or JDBC driver jar, so these
builders are exercised up to (not including) `.load()`/`.save()` in
tests; the option plumbing is real.

Scale notes:
- A single-connection JDBC read is a 1-task bottleneck; for large
  tables pass `partition_column/lower/upper/num_partitions` so
  executors read range-partitioned slices in parallel.
- Writes batch `batchsize` rows per round-trip and parallelize per
  partition; `coalesce` the frame if the target can't take hundreds
  of concurrent connections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def postgres_url(host: str, port: int, database: str) -> str:
    return f"jdbc:postgresql://{host}:{port}/{database}"


def read_postgres_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrameReader:
    """Pushdown-query reader (S1 semantics). Returns the configured
    reader; call `.load()` against a live database."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("user", user)
        .option("password", password)
        .option("driver", "org.postgresql.Driver")
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


#: The reference's exact extraction SQL (S1), parameterized by schema
#: names (/root/reference/main.py:25-39).
CUSTOMER_LOAN_JOIN_SQL = """
SELECT
    c.customer_id, c.customer_name, l.loan_id, l.disbursement_amount,
    l.disbursement_date, l.due_date, l.region, l.interest_rate, l.pos
FROM {customers_schema}.customers c
JOIN {loans_schema}.loans l ON c.loan_id = l.loan_id
"""


def ensure_schema_sql(schema: str) -> str:
    """S4: DDL executed on the target before loading."""
    return f"CREATE SCHEMA IF NOT EXISTS {schema}"


def write_jdbc_overwrite(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    batchsize: int = 10_000,
    truncate: bool = True,
) -> None:
    """Full-replace table sink (S5/S6). `truncate=True` keeps the
    table definition and empties it instead of DROP+CREATE (safer than
    the reference's `if_exists="replace"` which drops indexes)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", "org.postgresql.Driver")
        .option("batchsize", str(batchsize))
        .option("truncate", str(truncate).lower())
        .mode("overwrite")
        .save()
    )
