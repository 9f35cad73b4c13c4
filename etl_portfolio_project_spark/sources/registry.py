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


def _scan_split_estimate(src_bytes: int, par: int) -> int:
    """Estimate how many splits a parquet scan of `src_bytes` packs,
    mirroring Spark's FilePartition math at its DEFAULT knobs
    (maxPartitionBytes 128 MB, openCostInBytes 4 MB): maxSplitBytes =
    min(maxPartitionBytes, max(openCost, bytes/parallelism)). The
    estimate only steers the repartition DECISION below (values are
    unaffected either way), so default-knob drift merely moves the
    cutover point — at 100 TB bytes/par ≫ 128 MB and the answer is
    always "already parallel", exactly like the exact probe."""
    target = min(128 * 1024 * 1024, max(4 * 1024 * 1024, src_bytes // max(par, 1)))
    return max(1, -(-src_bytes // target))


def balanced(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism —
    ONLY if the plan currently has fewer partitions (parquet scans
    can't split below row-group granularity, so a single-file table
    caps a narrow pipeline at 1-3 tasks no matter how wide the
    machine). At 100 TB sources have thousands of splits and this is
    a structural no-op; on under-split sources it trades one exchange
    of the slim pre-expansion rows for full-cluster parallelism in
    everything downstream. Use on narrow pipelines whose per-row work
    (explode fan-out, regex profiling) dwarfs a slim-row shuffle.

    Partition probe (r13 opt): when `df` came straight from
    `load_table` it carries the source file size, and the split count
    is ESTIMATED from it (`_scan_split_estimate`) instead of paying
    `df.rdd.getNumPartitions()` — a full physical-planning py4j round
    trip, measured ~90 ms per call × ~70 call sites. Transformed
    frames (no attribute) keep the exact probe."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    src_bytes = getattr(df, "_graft_src_bytes", None)
    if src_bytes is not None:
        if _scan_split_estimate(src_bytes, par) < par:
            return df.repartition(par)
        return df
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

    def _tag(df: DataFrame) -> DataFrame:
        # source size for balanced()'s split estimate; best-effort
        # (a remote/posix-less path just loses the fast path)
        try:
            import os

            df._graft_src_bytes = os.path.getsize(path)
        except OSError:
            pass
        return df

    if name == "events":
        from pyspark.sql import functions as F

        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # conf removed in newer Sparks; dtype branch below covers it
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return _tag(
                df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            )
        if ts_type != "timestamp":
            # timestamp_ntz (Spark 4.1+ native TIMESTAMP(NANOS) read)
            return _tag(df.withColumn("ts", F.col("ts").cast("timestamp")))
        return _tag(df)
    return _tag(spark.read.parquet(path))
