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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one harness table as a lazy DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
