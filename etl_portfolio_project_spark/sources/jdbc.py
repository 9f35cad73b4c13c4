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

The harness has no database SERVER, but the full JDBC code path —
DDL via DriverManager (S4), `mode("overwrite")` + truncate sink (S5/
S6), and pushdown-query read-back (S1) — is exercised end-to-end in
tests against EMBEDDED Apache Derby (its jars ship inside pyspark),
via the same functions parameterized by `driver`/`url`. Live
Postgres/Mongo smokes exist too, gated on SPARK_GRAFT_PG_URL /
SPARK_GRAFT_MONGO_URI (tests/test_jdbc_integration.py).

Identifier caveat exercised by the Derby round-trip: Spark's JDBC
writer QUOTES column names, so they are case-sensitive in the target;
pushdown SQL against Spark-written tables must quote identifiers
(`SELECT "loan_id" ...`) or Derby/Postgres fold the unquoted name and
miss the column.

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

POSTGRES_DRIVER = "org.postgresql.Driver"
#: embedded Derby ships inside pyspark's jars (used by the Hive
#: metastore) — the in-harness integration target for the JDBC path
DERBY_EMBEDDED_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def postgres_url(host: str, port: int, database: str) -> str:
    return f"jdbc:postgresql://{host}:{port}/{database}"


def derby_memory_url(name: str, create: bool = True) -> str:
    """In-memory embedded Derby URL (lives inside the driver JVM —
    reachable from executors only in local mode, which is exactly the
    integration-smoke scope)."""
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:memory:{name}{suffix}"


def execute_ddl(
    spark: SparkSession,
    url: str,
    ddl: str,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
) -> None:
    """S4: run DDL on the target over a plain java.sql connection —
    the Spark-side equivalent of the reference's
    `conn.execute(text("CREATE SCHEMA IF NOT EXISTS test"))`
    (/root/reference/connect_postgres_target.py:25-26). DataFrame
    writers cannot issue standalone DDL; production pipelines do this
    driver-side before the executors open write connections.

    Pass `user`/`password` for auth-requiring servers (Postgres) —
    embedded Derby needs none, which is why the credential-less form
    exists."""
    jvm = spark._jvm
    if driver is not None:
        jvm.java.lang.Class.forName(driver)
    if user is not None:
        conn = jvm.java.sql.DriverManager.getConnection(
            url, user, password or ""
        )
    else:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.execute(ddl)
        finally:
            st.close()
    finally:
        conn.close()


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
    driver: str = POSTGRES_DRIVER,
) -> DataFrameReader:
    """Pushdown-query reader (S1 semantics). Returns the configured
    reader; call `.load()` against a live database.

    Partitioned reads wrap the query as a `dbtable` subselect: Spark's
    JDBC source REFUSES 'query' together with 'partitionColumn'
    (JDBCOptions throws at load), so the naive query+partition option
    combination could never execute — exercised end-to-end against
    embedded Derby in tests/test_jdbc_integration.py."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC read requires lower_bound and "
                "upper_bound alongside partition_column"
            )
        reader = (
            reader.option("dbtable", f"({query}) spark_pushdown")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    else:
        reader = reader.option("query", query)
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
    driver: str = POSTGRES_DRIVER,
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
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .option("truncate", str(truncate).lower())
        .mode("overwrite")
        .save()
    )


#: Spark JDBC type mapping for PostgreSQL — mirrors Spark's
#: PostgresDialect.getJDBCType (apache/spark
#: sql/core/.../jdbc/PostgresDialect.scala, public source): the DDL
#: Spark would emit when `write_jdbc_overwrite` creates the table.
#: Exposed so the dialect can be executed against a REAL PostgreSQL
#: server even where the JDBC driver jar is absent (this container):
#: tools/pg_dialect_check.py runs these statements through psql.
_SPARK_PG_TYPES = {
    "string": "TEXT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "binary": "BYTEA",
}


def postgres_ddl_for(df: DataFrame, table: str) -> str:
    """CREATE TABLE statement for `df`'s schema under Spark's
    PostgresDialect mapping (decimal(p,s) → NUMERIC(p,s), string →
    TEXT, double → DOUBLE PRECISION, ...)."""
    cols = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            pg = t.upper().replace("DECIMAL", "NUMERIC")
        else:
            pg = _SPARK_PG_TYPES.get(t)
            if pg is None:
                raise ValueError(f"unmapped Spark type for Postgres: {t}")
        cols.append(f'"{f.name}" {pg}')
    return f'CREATE TABLE {table} ({", ".join(cols)})'
