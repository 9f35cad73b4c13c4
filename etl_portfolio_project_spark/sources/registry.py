"""Table registry for the test-harness star schema.

The harness tables (TESTDATA.md) are parquet with embedded schemas, so
scans are self-describing: Catalyst gets column pruning and predicate
pushdown for free (`PushedFilters`/`ReadSchema` in `.explain`).

At 100 TB the same entry point would read a partitioned parquet/
Iceberg layout (e.g. `orders/o_orderdate=.../*.parquet`) and partition
pruning would apply on top; nothing in the engine assumes single-file
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def balanced(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism —
    ONLY if the plan currently has fewer partitions (parquet scans
    can't split below row-group granularity, so a single-file table
    caps a narrow pipeline at 1-3 tasks no matter how wide the
    machine). At 100 TB sources have thousands of splits and this is
    a structural no-op; on under-split sources it trades one exchange
    of the slim pre-expansion rows for full-cluster parallelism in
    everything downstream. Use on narrow pipelines whose per-row work
    (explode fan-out, regex profiling) dwarfs a slim-row shuffle."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one harness table as a lazy DataFrame.

    `events.ts` is written as parquet TIMESTAMP(NANOS). How Spark
    surfaces that column depends on the version: Spark 4.1+ reads it
    natively as TIMESTAMP_NTZ (truncating nanos→µs, same as DuckDB's
    µs TIMESTAMP read of the file); older Sparks reject it in the
    vectorized reader unless `spark.sql.legacy.parquet.nanosAsLong`
    maps it to a raw nanosecond BIGINT. We branch on the observed
    dtype rather than the version string so either path normalizes to
    a session-TZ TIMESTAMP. The bigint branch uses exact integer
    division (`div 1000` — a double division would round: 1e18-scale
    nanos exceed 2^53); the NTZ branch is a plain cast, value-stable
    because the session timezone is pinned UTC. The harness data is
    µs-exact, so both are lossless and match DuckDB.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf removed in newer Sparks; dtype branch below covers it
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type != "timestamp":
            # timestamp_ntz (Spark 4.1+ native TIMESTAMP(NANOS) read)
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)
