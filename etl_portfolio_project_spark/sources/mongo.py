"""MongoDB source — the production path for S2.

Reference behavior (SURVEY.md §2.1): `loan_etl.loan_extensions` read
with a server-side 3-field projection and `_id` suppressed
(/root/reference/main.py:51-55, client from connect_mongodb.py:3-14).

With the Spark MongoDB connector the same shape is
`spark.read.format("mongodb")` + `.select(...)` — the connector pushes
the projection (and any filters) into the aggregation pipeline. The
connector jar is not in this container, so the builder is exercised up
to `.load()` in tests; `extension_projection` applied to any DataFrame
reproduces the reference's projection semantics and is used by the
parquet-backed harness path (sources/views.extensions).

Scale notes: the connector splits collections by chunk ranges
(sharded) or `samplePoolSize` partitioning — reads parallelize across
executors; keep the projection tight so documents ship only the 3
needed fields.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

EXTENSION_FIELDS = ["loan_id", "product_type", "emi_collected"]


def read_mongo_collection(
    spark: SparkSession,
    connection_uri: str,
    database: str,
    collection: str,
) -> DataFrameReader:
    """Configured Mongo reader (S2). Call `.load()` against a live
    cluster, then `extension_projection` for the reference projection."""
    return (
        spark.read.format("mongodb")
        .option("connection.uri", connection_uri)
        .option("database", database)
        .option("collection", collection)
    )


def extension_projection(df: DataFrame) -> DataFrame:
    """The reference's find() projection: 3 fields, `_id` dropped
    (/root/reference/main.py:53). Catalyst prunes the scan to exactly
    these columns whatever the source."""
    return df.select(*EXTENSION_FIELDS)
