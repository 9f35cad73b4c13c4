"""Storage-format and layout operators: multi-format round-trips and
hive-partitioned writes with partition-pruned reads.

The reference's IO surface is Postgres/Mongo in, Postgres out
(SURVEY.md §2.1); no live DB exists in the harness, so its S5/S6
semantics are exercised through file sinks (`sources/files.py`). This
module adds the format breadth a Spark engine owes its users — CSV,
JSON, and ORC alongside parquet — and the single most important
data-layout lever at 100 TB: hive-style partitioned directories that
let the scan SKIP non-matching partitions entirely (the plan shows
`PartitionFilters`, and a date-filtered query reads 1/Nth of the
files before a single row is decoded).

Both ops are oracle-checked like everything else: the round-trip
re-aggregates what it read back and must match a plain batch
aggregate over the source table — any format-conversion corruption
(type coercion, quoting, encoding) breaks the bit-exact compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import tmpdirs
from ..sources.registry import load_table
from .text import portable_hash60_sql as _ph60_duck
from .text import portable_hash60_spark_sql as _ph60_spark
from .relational import dsum, dsum_sql
from .text import portable_hash60, portable_hash60_sql

#: formats exercised by the round-trip (all built into Spark; avro is
#: an external package and intentionally absent)
ROUNDTRIP_FORMATS = ("parquet", "orc", "json", "csv")

_DOCS_READ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def format_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the documents table to parquet, ORC, JSON, and CSV; read
    each back with an EXPLICIT schema (schema inference is a
    correctness hazard, not a convenience); emit one audit row per
    format. Every row must carry identical values — count, exact char
    sum, and a bit_xor fold of per-doc content hashes (order-free, so
    partition order can't perturb it) — and the oracle computes the
    same values once from the source table, so any format that
    mangles content (CSV quoting, JSON escaping, type drift) fails
    the hash compare.

    Scale note: the write cost is the point (fan-out to N formats is
    N scans or one cached scan); reads are format-parallel. CSV and
    JSON are row-oriented text — the audit is also a standing
    demonstration of WHY the engine's native format is columnar."""
    from .. import caches

    root = tmpdirs.claim("format_roundtrip", "format_roundtrip_")
    # claim + materialize ONCE: four write actions in the loop each
    # re-ran the source scan + projection (CLAUDE.md claim-once rule)
    d = caches.claim(
        "format_roundtrip_docs",
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        ),
    )
    audits: list[DataFrame] = []
    for fmt in ROUNDTRIP_FORMATS:
        path = f"{root}/{fmt}"
        w = d.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            # whitespace/newline fidelity: the writer TRIMS cell edge
            # whitespace by default and the reader splits quoted
            # records on embedded newlines without multiLine — both
            # would corrupt the audit if the corpus ever regenerates
            # with such text (today's corpus has none: data luck, not
            # a guarantee)
            # nullValue sentinel: by default BOTH NULL and '' write as
            # an empty field and read back as NULL — the \\N (MySQL
            # convention) sentinel preserves the NULL/'' distinction
            # through the round-trip (r7 drift-sweep NULL-doc finding)
            w = (
                w.option("header", "true")
                .option("escape", '"')
                .option("ignoreLeadingWhiteSpace", "false")
                .option("ignoreTrailingWhiteSpace", "false")
                .option("nullValue", "\\N")
            )
        w.save(path)
        r = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            r = r.schema(_DOCS_READ_SCHEMA)
            if fmt == "csv":
                r = (
                    r.option("header", "true")
                    .option("escape", '"')
                    .option("multiLine", "true")
                    .option("nullValue", "\\N")
                )
        back = r.load(path)
        audits.append(
            back.agg(
                F.lit(fmt).alias("fmt"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.expr(
                    "bit_xor("
                    + _ph60_spark(
                        "concat(cast(doc_id as string), ':', text)"
                    )
                    + ")"
                ).alias("content_xor60"),
            )
        )
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


_DOC_XOR = (
    "bit_xor("
    + _ph60_duck("CAST(doc_id AS VARCHAR) || ':' || text")
    + ")"
)

FORMAT_ROUNDTRIP_AUDIT_SQL = f"""
WITH one AS (
  SELECT count(*) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         {_DOC_XOR} AS content_xor60
  FROM documents
)
SELECT f.fmt, o.n_rows, o.total_chars, o.content_xor60
FROM (VALUES ('parquet'), ('orc'), ('json'), ('csv')) AS f(fmt), one o
"""


#: partition-pruning demo: the year kept by the filtered read-back
PRUNE_YEAR = 1996


def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition-pruned read: orders
    written `partitionBy(o_year)`, read back filtered to one year.
    The filter binds to the DIRECTORY structure — the scan lists only
    `o_year=1996/` and never opens the other years' files
    (`PartitionFilters` in the plan, pinned by a plan test). At 100 TB
    with daily partitions this is the difference between reading one
    day and reading three years.

    Output: per-month order counts + exact revenue for the kept year;
    the oracle recomputes from the source table with a value filter —
    layout must be semantically invisible."""
    root = tmpdirs.claim("partitioned_orders", "partitioned_orders_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.year("o_orderdate").alias("o_year"),
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(root)
    back = spark.read.parquet(root).where(F.col("o_year") == PRUNE_YEAR)
    return (
        back.groupBy(F.month("o_orderdate").cast("long").alias("o_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            portable_hash60(
                F.concat(F.lit("k:"), F.min("o_orderkey").cast("string"))
            ).alias("min_key_hash60"),
        )
    )


PARTITIONED_WRITE_PRUNE_SQL = f"""
SELECT CAST(month(o_orderdate) AS BIGINT) AS o_month,
       count(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS revenue,
       {portable_hash60_sql("'k:' || CAST(min(o_orderkey) AS VARCHAR)")}
         AS min_key_hash60
FROM orders
WHERE year(o_orderdate) = {PRUNE_YEAR}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Schema evolution: mergeSchema read across parquet generations.
# ---------------------------------------------------------------------------

EVO_SPLIT_YEAR = 1995  # v1 = orders before, v2 (wider) = from this year


def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution round trip — the lake reality at 100 TB: a
    table's early files predate a column. v1 files (orders before
    EVO_SPLIT_YEAR) are written WITHOUT `o_orderpriority`; v2 files
    (from the year on) include it. One `mergeSchema` read unifies the
    generations: the column materializes as NULL for v1 rows, typed
    from v2's footer.

    Output per order-year: row count, NULL vs present priority counts
    (proving which generation each row came from), distinct priority
    count, and exact revenue — the oracle recomputes from the source
    table by CASE-ing the column NULL for pre-split years, so the
    merge semantics (not just the plumbing) are hash-checked.

    Scale shape: two partitioned writes + one merged scan; at 100 TB
    `mergeSchema` costs a footer read per file (schema union on the
    driver) — production tables cache the merged schema in a
    catalog/Delta log; the READ semantics proven here are identical."""
    root = tmpdirs.claim("schema_evo", "schema_evo_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        "o_orderpriority",
        F.year("o_orderdate").alias("o_year"),
    )
    o.where(F.col("o_year") < EVO_SPLIT_YEAR).drop(
        "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{root}/v1")
    o.where(F.col("o_year") >= EVO_SPLIT_YEAR).write.mode(
        "overwrite"
    ).parquet(f"{root}/v2")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/v1", f"{root}/v2"
    )
    return (
        back.groupBy(F.col("o_year").cast("long").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias(
                "n_null_priority"
            ),
            F.count("o_orderpriority").alias("n_with_priority"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


SCHEMA_EVOLUTION_READ_SQL = f"""
WITH evolved AS (
  SELECT o_orderkey, o_orderdate, o_totalprice,
         CASE WHEN year(o_orderdate) < {EVO_SPLIT_YEAR} THEN NULL
              ELSE o_orderpriority END AS o_orderpriority,
         CAST(year(o_orderdate) AS BIGINT) AS o_year
  FROM orders
)
SELECT o_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(CASE WHEN o_orderpriority IS NULL THEN 1 END)
            AS BIGINT) AS n_null_priority,
       CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       {dsum_sql('o_totalprice')} AS revenue
FROM evolved
GROUP BY o_year
"""


# --- small-file compaction (the lakehouse OPTIMIZE primitive) ---------------

SMALL_FILES = 32  # deliberately over-partitioned ingest
COMPACT_FILES = 4  # target layout
_CKSUM_MOD = 1_000_000_007


def small_file_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-maintenance pass every lakehouse runs (Delta
    OPTIMIZE / Iceberg rewrite_data_files): streaming and per-task
    ingest produce thousands of small files whose per-file open/footer
    cost eventually dominates scans; compaction rewrites them into few
    large files WITHOUT changing a single row. The op ingests the
    events slice deliberately over-partitioned (SMALL_FILES part
    files), compacts via a narrow `coalesce` rewrite (no shuffle — the
    whole point of coalesce over repartition here), and audits BOTH
    layouts: actual part-file counts plus content checksums computed
    from the COMPACTED read.

    Losslessness is oracle-proven: the checksums (row count, exact
    cents total, an order-free md5-based content hash sum accumulated
    exactly in DECIMAL(38,0) then folded by an outer `% 1e9+7` into
    the graded BIGINT — graded schemas must never carry >18-precision
    decimals, the r5/r6 HUGEINT-conversion driver-red class) are
    recomputed by DuckDB from the ORIGINAL events
    table — a compaction that drops, duplicates, or mutates any row
    diverges. File-count grading (the r5 driver-red): `n_files_before`
    is deterministic (a round-robin repartition of ≥ SMALL_FILES rows
    leaves no partition empty, so the write emits exactly SMALL_FILES
    files in any session), but the EXACT post-coalesce count is NOT —
    it equals min(COMPACT_FILES, read splits), and how many splits a
    32-small-file scan gets is session file bin-packing config
    (`maxPartitionBytes` / `openCostInBytes` / default parallelism),
    which the grading session controls, not this builder. The graded
    contract is therefore the boolean every OPTIMIZE actually
    promises — `1 ≤ n_files_after ≤ COMPACT_FILES` — not the split
    count of one session. `value` is cast to DOUBLE at load so a
    physical-type drift in the testdata (the `events.ts` lesson)
    cannot change the cents quantization on one engine only.

    Scale shape: ingest = one repartition exchange; compaction = a
    pure narrow rewrite reading SMALL_FILES files and writing
    ≤ COMPACT_FILES; audit = one single-row aggregate. At 100 TB the
    same pass runs per partition-directory with
    `spark.sql.files.maxRecordsPerFile` bounding output sizes."""
    import glob
    import os

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    root = tmpdirs.claim("compaction", "compaction_")
    small, compact = f"{root}/small", f"{root}/compacted"
    e.repartition(SMALL_FILES).write.mode("overwrite").parquet(small)
    spark.read.parquet(small).coalesce(COMPACT_FILES).write.mode(
        "overwrite"
    ).parquet(compact)

    def _nfiles(d: str) -> int:
        return len(glob.glob(os.path.join(d, "part-*.parquet")))

    n_before, n_after = _nfiles(small), _nfiles(compact)
    cents = "CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)"
    row_hash = portable_hash60(
        F.expr(
            "concat('cmp:', CAST(event_id AS STRING), ':', event_type, "
            f"':', CAST({cents} AS STRING))"
        )
    )
    return (
        spark.read.parquet(compact)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.expr(cents)).cast("long").alias("value_cents_total"),
            (
                F.sum((row_hash % _CKSUM_MOD).cast("decimal(38,0)"))
                % F.lit(_CKSUM_MOD)
            )
            .cast("long")
            .alias("content_hash_sum"),
        )
        .select(
            F.lit(n_before).alias("n_files_before"),
            F.lit(1 <= n_after <= COMPACT_FILES).alias("compacted_to_target"),
            "n_events",
            "value_cents_total",
            "content_hash_sum",
        )
    )


_CMP_HASH = portable_hash60_sql(
    "'cmp:' || CAST(event_id AS VARCHAR) || ':' || event_type || ':' "
    "|| CAST(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) "
    "AS VARCHAR)"
)

SMALL_FILE_COMPACTION_SQL = f"""
SELECT CAST({SMALL_FILES} AS INTEGER) AS n_files_before,
       TRUE AS compacted_to_target,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS value_cents_total,
       CAST(sum(CAST({_CMP_HASH} % {_CKSUM_MOD} AS DECIMAL(38,0)))
            % {_CKSUM_MOD} AS BIGINT) AS content_hash_sum
FROM events
"""


# --- DQ expectations + dead-letter quarantine split -------------------------

DQ_BAD_ROWS = 40  # injected violations (synthesize → process → verify)
DQ_BAD_ID_OFFSET = 900_000_000
DQ_KNOWN_TYPES = ("click", "error", "purchase", "signup", "view")


def dq_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality EXPECTATIONS with a dead-letter split — the
    operational extension of `data_quality_audit` (which only
    measures): every row is validated against typed rules
    (non-negative value, event_type in the known enum), VALID rows are
    written to the publish path and violations to a quarantine path
    (the DLT-expectations / Delta-constraints / dead-letter-queue
    shape), and the audit proves the split is a PARTITION: per-rule
    violation counts plus md5-content checksums of both written sides
    whose sum must equal the input's — a row lost, duplicated, or
    routed to both sides diverges from the oracle.

    NULL fidelity (the r5 driver-red): a rule predicate evaluating
    NULL must route to QUARANTINE, not vanish — `where(pred)` and
    `where(NOT pred)` both reject NULL, silently dropping the row
    from BOTH sinks. Routing is therefore on `coalesce(pred, false)`
    (exactly the oracle's `CASE WHEN pred THEN valid ELSE quarantine`
    semantics), the per-rule counters treat NULL as a violation, and
    the content hash NULL-safes every field so no row hashes to NULL.

    The harness corpus has no violations, so the op INJECTS
    DQ_BAD_ROWS deterministic bad rows first — negative values,
    unknown event_types, NULL values, and NULL event_types in a 4-way
    rotation (the PII/WAV synthesize → process → verify strategy) —
    making both sinks non-empty and EXERCISING the NULL-predicate
    path at every SF, so a routing regression diverges on any corpus.

    Scale shape: one narrow validation projection riding the scan; the
    two writes partition the data in a single pass each
    (filter + write — Spark has no multi-sink split, so at 100 TB
    this is two scans or one pass via foreachBatch/DataFrame.cache;
    the harness uses the two-filter form and the audit reads both
    sinks back); the audit is two single-row aggregates unioned."""
    base = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("value").cast("double")
    )
    bad = spark.range(DQ_BAD_ROWS).select(
        (F.col("id") + DQ_BAD_ID_OFFSET).alias("event_id"),
        F.col("id").alias("user_id"),
        F.expr(
            "CASE WHEN id % 4 = 1 THEN 'corrupt' "
            "WHEN id % 4 = 3 THEN CAST(NULL AS STRING) "
            "ELSE 'click' END"
        ).alias("event_type"),
        F.expr(
            "CASE WHEN id % 4 = 0 THEN CAST(-1.0 - id AS DOUBLE) "
            "WHEN id % 4 = 2 THEN CAST(NULL AS DOUBLE) "
            "ELSE CAST(1.5 AS DOUBLE) END"
        ).alias("value"),
    )
    data = base.unionByName(bad)
    types = ", ".join(f"'{t}'" for t in DQ_KNOWN_TYPES)
    ok_value = "value >= 0"
    ok_type = f"event_type IN ({types})"
    # NULL-safe: rows where either rule evaluates NULL are NOT valid
    route_valid = f"coalesce(({ok_value}) AND ({ok_type}), false)"
    root = tmpdirs.claim("dq_split", "dq_split_")
    vdir, qdir = f"{root}/valid", f"{root}/quarantine"
    data.where(F.expr(route_valid)).write.mode("overwrite").parquet(vdir)
    data.where(~F.expr(route_valid)).write.mode("overwrite").parquet(qdir)

    hash_arg = (
        "concat('dq:', coalesce(CAST(event_id AS STRING), 'null'), ':', "
        "coalesce(event_type, 'null'), ':', "
        "coalesce(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) "
        "AS STRING), 'null'))"
    )
    row_hash = _ph60_spark(hash_arg)

    def audit(path: str, side: str):
        return (
            spark.read.parquet(path)
            .agg(
                F.count("*").cast("long").alias("n_rows"),
                F.sum(
                    F.expr(
                        f"CASE WHEN coalesce({ok_value}, false) "
                        "THEN 0 ELSE 1 END"
                    )
                )
                .cast("long")
                .alias("n_bad_value"),
                F.sum(
                    F.expr(
                        f"CASE WHEN coalesce({ok_type}, false) "
                        "THEN 0 ELSE 1 END"
                    )
                )
                .cast("long")
                .alias("n_bad_type"),
                (
                    F.sum(
                        F.expr(f"({row_hash}) % {_CKSUM_MOD}").cast(
                            "decimal(38,0)"
                        )
                    )
                    % F.lit(_CKSUM_MOD)
                )
                .cast("long")
                .alias("content_hash_sum"),
            )
            .select(F.lit(side).alias("side"), "*")
        )

    return audit(vdir, "valid").unionByName(audit(qdir, "quarantine"))


_DQ_TYPES_SQL = ", ".join(f"'{t}'" for t in DQ_KNOWN_TYPES)
_DQ_HASH = portable_hash60_sql(
    "'dq:' || COALESCE(CAST(event_id AS VARCHAR), 'null') || ':' || "
    "COALESCE(event_type, 'null') || ':' || "
    "COALESCE(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR), "
    "'null')"
)

DQ_QUARANTINE_SPLIT_SQL = f"""
WITH bad AS (
  SELECT {DQ_BAD_ID_OFFSET} + i AS event_id,
         i AS user_id,
         CASE WHEN i % 4 = 1 THEN 'corrupt'
              WHEN i % 4 = 3 THEN CAST(NULL AS VARCHAR)
              ELSE 'click' END AS event_type,
         CASE WHEN i % 4 = 0 THEN CAST(-1.0 - i AS DOUBLE)
              WHEN i % 4 = 2 THEN CAST(NULL AS DOUBLE)
              ELSE CAST(1.5 AS DOUBLE) END AS value
  FROM generate_series(0, {DQ_BAD_ROWS - 1}) t(i)
),
data AS (
  SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
  FROM events
  UNION ALL
  SELECT * FROM bad
),
tagged AS (
  SELECT *,
         CASE WHEN (value >= 0)
               AND (event_type IN ({_DQ_TYPES_SQL}))
              THEN 'valid' ELSE 'quarantine' END AS side
  FROM data
)
SELECT side,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN COALESCE(value >= 0, false) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_bad_value,
       CAST(sum(CASE WHEN COALESCE(event_type IN ({_DQ_TYPES_SQL}), false)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_type,
       CAST(sum(CAST({_DQ_HASH} % {_CKSUM_MOD} AS DECIMAL(38,0)))
            % {_CKSUM_MOD} AS BIGINT) AS content_hash_sum
FROM tagged
GROUP BY side
"""


# --- Z-order (Morton) clustering layout audit -------------------------------

ZORDER_BUCKETS = 64  # target file/bucket count of the layout job
ZNORM = 4096  # normalized coordinate space per key (12 bits)
#: scale-relative probes (cross-multiplied integer interval logic —
#: no data-dependent literals): the bottom 1/16 customer slice and
#: the [3/16, 4/16) date slice
ZPROBE_DEN = 16
ZDATE_NUM = 3

_SPREAD_ROUNDS = [
    (8, 16711935),     # 0x00FF00FF
    (4, 252645135),    # 0x0F0F0F0F
    (2, 858993459),    # 0x33333333
    (1, 1431655765),   # 0x55555555
]


def _spread16_spark(v: str) -> str:
    """Interleave-ready bit spread of a 16-bit value (Morton magic
    masks), as one Spark-SQL string."""
    e = v
    for sh, mask in _SPREAD_ROUNDS:
        e = f"(({e} | shiftleft({e}, {sh})) & {mask})"
    return e


def _spread16_duck(v: str) -> str:
    e = v
    for sh, mask in _SPREAD_ROUNDS:
        e = f"(({e} | ({e} << {sh})) & {mask})"
    return e


def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering audit — the multi-dimensional data-layout
    lever at 100 TB (Delta/Iceberg `OPTIMIZE ZORDER BY`): range-
    normalize two scan keys (customer, order date) into a shared
    ZNORM coordinate space, interleave their bits into a Morton code,
    range-bucket rows by it, and measure how many buckets a probe on
    EACH key must touch versus a single-key linear layout. One
    summary row per layout: linear-date prunes date probes perfectly
    but every customer probe scans ALL buckets; Z-order bounds BOTH
    probes to a grid slice (~√buckets of the 8×8 prefix grid at 64
    buckets) — the documented trade the layout job buys.

    The normalization step is load-bearing, not cosmetic: raw keys
    with mismatched bit-widths (custkey ≤ 2^11, datediff days ≤ 2^12
    here) degenerate the interleave into single-key order — exactly
    why production ZORDER computes range-partitioned ranks first
    (measured: un-normalized keys produced identical bucket hits for
    both layouts).

    Deterministic by construction: normalization is cross-multiplied
    integer math against the window max, the Morton spread is pure
    bit arithmetic, buckets come from exact integer rank math
    (((rn−1)·NB) div n over the unique (key, o_orderkey) order), the
    probes are scale-relative integer intervals (bottom 1/16 customer
    slice, [3/16, 4/16) date slice), and bucket-probe overlap is
    integer interval logic. The bucket ranks come from the shared
    `ranking.ranged_row_number` recipe (r9) — a literal
    repartitionByRange + parallel local rank + offset correction, the
    same physical move the production layout job itself performs, and
    the normalization maxima ride a scalar broadcast instead of an
    unpartitioned max-window.

    `cust_rows` / `date_rows` are layout-invariant row counts of the
    probes — the built-in sanity check that both layouts saw the same
    data."""
    from pyspark.sql import Window

    from ..sources.registry import balanced

    o = load_table(spark, sf_dir, "orders")
    scan = balanced(o).select(
        "o_orderkey",
        F.expr("CAST(o_custkey AS BIGINT)").alias("ck"),
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE \'1995-01-01\')"
            " AS BIGINT)"
        ).alias("dk"),
    )
    # normalization maxima via a partial-agg'd scalar broadcast (r9) —
    # the former unpartitioned max-window funneled the whole scan
    # through one task; a second pruned 3-col pass is near-free
    mx = scan.agg(F.max("ck").alias("mxc"), F.max("dk").alias("mxd"))
    base = (
        scan.crossJoin(F.broadcast(mx))
        .withColumn("cx", F.expr(f"(ck * {ZNORM}) div (mxc + 1)"))
        .withColumn("dx", F.expr(f"(dk * {ZNORM}) div (mxd + 1)"))
    )
    sx, sy = _spread16_spark("cx"), _spread16_spark("dx")
    base = base.withColumn(
        "z", F.expr(f"({sx} | shiftleft({sy}, 1))")
    )
    # base feeds BOTH layout branches — claim above the size threshold
    # so the scan + normalization max-windows never run twice at scale
    # (lazy at harness sizes; r8 self-review)
    from .. import caches

    base = caches.claim_if_large(
        "zorder_base", base, source_paths=[f"{sf_dir}/orders.parquet"]
    )
    cust_probe = f"(ck * {ZPROBE_DEN} < mxc + 1)"
    date_probe = (
        f"(dk * {ZPROBE_DEN} >= (mxd + 1) * {ZDATE_NUM}"
        f" AND dk * {ZPROBE_DEN} < (mxd + 1) * {ZDATE_NUM + 1})"
    )

    from .ranking import ranged_row_number

    def layout(order_col: str, name: str) -> DataFrame:
        b = ranged_row_number(
            base,
            [F.col(order_col).asc(), F.col("o_orderkey").asc()],
            out="rn",
            total="nn",
        ).withColumn(
            "bucket", F.expr(f"((rn - 1) * {ZORDER_BUCKETS}) div nn")
        )
        per = b.groupBy("bucket").agg(
            F.min("ck").alias("min_ck"),
            F.max("ck").alias("max_ck"),
            F.min("dk").alias("min_dk"),
            F.max("dk").alias("max_dk"),
            F.max("mxc").alias("mxc"),
            F.max("mxd").alias("mxd"),
            F.sum(F.expr(f"CASE WHEN {cust_probe} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("c_rows"),
            F.sum(F.expr(f"CASE WHEN {date_probe} THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("d_rows"),
        )
        return per.agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum(
                F.expr(
                    f"CASE WHEN min_ck * {ZPROBE_DEN} < mxc + 1"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("cust_probe_buckets"),
            F.sum(
                F.expr(
                    f"CASE WHEN min_dk * {ZPROBE_DEN}"
                    f" < (mxd + 1) * {ZDATE_NUM + 1}"
                    f" AND max_dk * {ZPROBE_DEN} >= (mxd + 1) * {ZDATE_NUM}"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("date_probe_buckets"),
            F.sum("c_rows").cast("long").alias("cust_rows"),
            F.sum("d_rows").cast("long").alias("date_rows"),
        ).select(F.lit(name).alias("layout"), "*")

    return layout("z", "zorder").unionByName(layout("dk", "linear_date"))


def _zorder_sql() -> str:
    cust_probe = f"(ck * {ZPROBE_DEN} < mxc + 1)"
    date_probe = (
        f"(dk * {ZPROBE_DEN} >= (mxd + 1) * {ZDATE_NUM}"
        f" AND dk * {ZPROBE_DEN} < (mxd + 1) * {ZDATE_NUM + 1})"
    )

    def one(order_col: str, name: str) -> str:
        return f"""
SELECT \'{name}\' AS layout,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN min_ck * {ZPROBE_DEN} < mxc + 1
                THEN 1 ELSE 0 END) AS BIGINT) AS cust_probe_buckets,
       CAST(sum(CASE WHEN min_dk * {ZPROBE_DEN} < (mxd + 1) * {ZDATE_NUM + 1}
                 AND max_dk * {ZPROBE_DEN} >= (mxd + 1) * {ZDATE_NUM}
                THEN 1 ELSE 0 END) AS BIGINT) AS date_probe_buckets,
       CAST(sum(c_rows) AS BIGINT) AS cust_rows,
       CAST(sum(d_rows) AS BIGINT) AS date_rows
FROM (
  SELECT bucket,
         min(ck) AS min_ck, max(ck) AS max_ck,
         min(dk) AS min_dk, max(dk) AS max_dk,
         max(mxc) AS mxc, max(mxd) AS mxd,
         sum(CASE WHEN {cust_probe} THEN 1 ELSE 0 END) AS c_rows,
         sum(CASE WHEN {date_probe} THEN 1 ELSE 0 END) AS d_rows
  FROM (
    SELECT ck, dk, mxc, mxd,
           ((row_number() OVER (ORDER BY {order_col}, o_orderkey) - 1)
             * {ZORDER_BUCKETS}) // (count(*) OVER ()) AS bucket
    FROM keyed
  )
  GROUP BY bucket
)"""

    return f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(datediff(\'day\', DATE \'1995-01-01\',
                       CAST(o_orderdate AS DATE)) AS BIGINT) AS dk,
         CAST(max(o_custkey) OVER () AS BIGINT) AS mxc,
         CAST(max(datediff(\'day\', DATE \'1995-01-01\',
                           CAST(o_orderdate AS DATE))) OVER ()
              AS BIGINT) AS mxd
  FROM orders
),
keyed AS (
  SELECT *,
         ({_spread16_duck(f"((ck * {ZNORM}) // (mxc + 1))")}
          | ({_spread16_duck(f"((dk * {ZNORM}) // (mxd + 1))")} << 1)) AS z
  FROM base
)
{one("z", "zorder")}
UNION ALL
{one("dk", "linear_date")}
"""


ZORDER_LAYOUT_AUDIT_SQL = _zorder_sql()
