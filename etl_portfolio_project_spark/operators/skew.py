"""Skew- and shuffle-management utilities.

Two of the classic 100 TB join levers, as reusable operators:

- `salted_join`: for a HOT-KEY join where one key holds a huge share
  of the big side's rows, AQE's skew-join splitting handles the
  sort-merge case, but when the small side must be shuffled too (or
  AQE is unavailable — e.g. inside some streaming joins), explicit
  salting is the tool: the big side's rows are spread across
  `salt_buckets` sub-keys derived deterministically from a unique
  column, and the small side is replicated once per bucket. The join
  becomes (key, salt)-equi, so one hot key now occupies
  `salt_buckets` shuffle partitions instead of one.

- `write_bucketed` / bucketed tables: pre-shuffling at WRITE time.
  Two tables bucketed (and sort-bucketed) on the same key with the
  same bucket count join with ZERO runtime exchanges — at 100 TB this
  converts an every-query shuffle of the fact table into a one-time
  layout cost. Verified by plan assertion in tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int,
    unique_col: str,
) -> DataFrame:
    """Inner equi-join on `key`, salted against hot keys.

    `unique_col` must be a (near-)unique column of `big` — the salt is
    `pmod(xxhash64(unique_col), salt_buckets)`, deterministic across
    runs (no rand(): retries/speculative tasks must salt identically
    or the join drops/duplicates rows). Result is column-identical to
    `big.join(small, key)`.
    """
    salt = F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt_buckets))
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_salted.join(small_salted, [key, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Persist `df` hash-bucketed (and per-bucket sorted) on `key`.

    Equal bucket counts on both sides of a later join ⇒ Catalyst
    plans a sort-merge join with no Exchange on either side; the sort
    order also vanishes (SortMergeJoin reads the bucket-sorted files
    directly)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    buckets: int = 4096,
) -> DataFrame:
    """Inner equi-join with a broadcast membership PREFILTER on the
    fact side — the runtime-filter / semi-join-reduction pattern that
    matters at 100 TB: drop fact rows that cannot join BEFORE any
    exchange or expensive downstream work, then let the real join
    remove the false positives, so the result is column-identical to
    the plain join (the differential contract, like `salted_join`).

    The filter is a deterministic bucket set (md5-derived hash mod
    `buckets`, collected sorted from the dim side) rather than real
    bloom bits, so the whole pipeline stays engine-portable and
    oracle-checkable; FP rate ≈ n_dim/buckets. Spark's native
    equivalent (injected `bloom_filter_agg`/`might_contain`) is
    pinned by plan test — this operator is the explicit, portable
    form usable where the optimizer can't see the opportunity (e.g.
    pre-aggregated or UDF-obscured keys).
    """

    def bucket(col: Column) -> Column:
        from .text import portable_hash60

        return F.pmod(portable_hash60(col.cast("string")), F.lit(buckets))

    bucket_set = dim.select(
        F.array_sort(F.collect_set(bucket(F.col(dim_key)))).alias("__bset")
    )
    pre = (
        fact.join(F.broadcast(bucket_set))
        .where(F.array_contains(F.col("__bset"), bucket(F.col(fact_key))))
        .drop("__bset")
    )
    # join on a RENAMED dim key and drop it: with fact_key == dim_key
    # (the common same-named case) an expression join would keep two
    # identically-named key columns, breaking the 'column-identical to
    # the plain join' contract the docstring promises
    dim_r = dim.withColumnRenamed(dim_key, "__dim_key")
    return pre.join(
        F.broadcast(dim_r), pre[fact_key] == dim_r["__dim_key"]
    ).drop("__dim_key")


#: Z-order parameters: 10 bits per dimension, 20-bit Morton key,
#: 256 z-cells per reporting tile. Anchor = 2024-01-01 00:00:00 UTC.
Z_BITS = 10
Z_TILE_SHIFT = 8
Z_ANCHOR_US = 1_704_067_200_000_000
Z_HOUR_US = 3_600_000_000


def zorder_key_spark_sql(ux: str, hx: str) -> str:
    """Spark-SQL Morton interleave of two Z_BITS-bit ints — one
    generated codegen expression (CLAUDE.md: never chain Column ops
    in a loop)."""
    terms = [
        f"(shiftleft(shiftright({ux}, {i}) & 1, {2 * i}) + "
        f"shiftleft(shiftright({hx}, {i}) & 1, {2 * i + 1}))"
        for i in range(Z_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_key_duck_sql(ux: str, hx: str) -> str:
    """DuckDB mirror (operator syntax instead of shift functions)."""
    terms = [
        f"(((({ux} >> {i}) & 1) << {2 * i}) + "
        f"((({hx} >> {i}) & 1) << {2 * i + 1}))"
        for i in range(Z_BITS)
    ]
    return "(" + " + ".join(terms) + ")"
