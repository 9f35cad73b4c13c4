"""File-format source/sink surface: parquet, CSV, JSON, ORC.

The reference reads only databases (SURVEY.md §2.1), but an engine at
100 TB lives on columnar files; this module is the uniform entry point
the rest of the engine uses for non-catalog data, with the scale
decisions encoded:

- Parquet/ORC are the scan formats Catalyst can prune and push into
  (PushedFilters/ReadSchema); CSV/JSON are INGEST formats — schema is
  always declared explicitly (no inference pass over 100 TB), and the
  first thing a pipeline does is rewrite them columnar.
- Writers partition by a low-cardinality column when given one
  (`partitionBy`) so downstream scans get partition pruning.
- `mode("overwrite")` mirrors the reference's full-replace sink
  semantics (/root/reference/main.py:204-219).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV ingest with a DECLARED schema — schema inference is an
    extra full pass and non-deterministic under dirty data; at scale
    it is never acceptable. PERMISSIVE mode keeps malformed rows as
    nulls instead of failing the job."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines ingest with a declared schema (same rationale)."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Columnar sink, full replace. `partition_by` yields a
    hive-layout directory tree → partition pruning downstream."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
