"""Arrow-native grouped operators (`applyInArrow`).

`applyInPandas` pays a per-batch Arrow→pandas→Arrow conversion on the
worker; `applyInArrow` hands the group to Python as a `pyarrow.Table`
directly — for operators that only need columnar kernels (sorts,
take, arithmetic) this skips the pandas materialization entirely.
This module demonstrates the pattern with an operator the built-in
surface can't express cheaply: EXACT per-group median (Spark's
built-in `median`/`percentile` is exact too, but the point here is
the Arrow worker path — same plumbing as the multimodal featurizers,
without the stub codec).

Determinism: inputs are int64 counts; the median rule (odd → middle
as double; even → mean of the two middles) matches DuckDB's
`median(BIGINT)` exactly (int64 ≤ 2^53 so the double conversions are
lossless).

Worker-shipping rule (CLAUDE.md): the UDF is a self-contained closure
with inner imports — the grading driver imports `__spark_entry__.py`
by file path, so module-level references would not unpickle on
workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import load_table

ARROW_GROUP_MEDIAN_SCHEMA = (
    "source string, n_docs long, median_chars double, max_chars long"
)


def arrow_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact median of document length via
    `groupBy(...).applyInArrow` — the group arrives as a pyarrow.Table
    and is reduced with Arrow compute kernels only (sort + take), no
    pandas.

    Scale shape: one shuffle on the group key; each group must fit in
    one worker's memory (fine for per-source stats; for billion-row
    groups you'd switch to the two-pass distributed quantile in
    `price_quartiles_by_priority`)."""

    def median_fn(tbl):  # pyarrow.Table -> pyarrow.Table
        import pyarrow as pa
        import pyarrow.compute as pc

        # SQL aggregate NULL semantics (the oracle's median/max skip
        # NULLs; count(*) does not) — and the NULL-source group must
        # emit a TYPED null, or Arrow infers null-type and the worker
        # rejects the string schema (r7 drift-sweep NULL-doc finding)
        n = tbl.num_rows
        vals = tbl.column("n_chars").drop_null()
        k = len(vals)
        if k == 0:
            med, mx = None, None
        else:
            sorted_chars = pc.take(vals, pc.array_sort_indices(vals))
            if k % 2 == 1:
                med = float(sorted_chars[k // 2].as_py())
            else:
                lo = sorted_chars[k // 2 - 1].as_py()
                hi = sorted_chars[k // 2].as_py()
                med = (lo + hi) / 2.0
            mx = pc.max(vals).as_py()
        return pa.table(
            {
                "source": pa.array(
                    [tbl.column("source")[0].as_py()], pa.string()
                ),
                "n_docs": pa.array([n], pa.int64()),
                "median_chars": pa.array([med], pa.float64()),
                "max_chars": pa.array([mx], pa.int64()),
            }
        )

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return d.groupBy("source").applyInArrow(
        median_fn, schema=ARROW_GROUP_MEDIAN_SCHEMA
    )


ARROW_GROUP_MEDIAN_SQL = """
SELECT source,
       count(*) AS n_docs,
       median(n_chars) AS median_chars,
       max(n_chars) AS max_chars
FROM documents
GROUP BY source
"""


# --- Python UDAF: GROUPED_AGG pandas_udf -----------------------------------


def udaf_cents_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom AGGREGATE function (UDAF) via a GROUPED_AGG
    `pandas_udf` — the one Python-UDF flavor the rest of the engine
    doesn't already exercise (scalar pandas_udf: fuzzy.py;
    applyInPandas/-WithState: streaming; applyInArrow: this module;
    mapInPandas: multimodal). Computes each event type's exact total
    in integer cents using the engine's portable rounding
    (floor(v·100 + 0.5)) so the Python aggregation is oracle-exact —
    int64 summation is associative, so batch order cannot change the
    result.

    Scale shape: GROUPED_AGG pandas_udfs do NOT partial-aggregate —
    Spark plans AggregateInPandasExec, which shuffles raw rows and
    materializes each whole group in the Python worker (same
    co-location cost as applyInPandas). Fine when groups are bounded
    (|event_type| here); at 100 TB with fat groups you'd pre-aggregate
    per-partition cents with built-ins (floor/sum are expressible) and
    merge, keeping the UDAF only for genuinely non-built-in merges."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # explicit functionType: `from __future__ import annotations`
    # stringifies hints, which defeats pandas_udf's hint inference
    @F.pandas_udf(T.LongType(), F.PandasUDFType.GROUPED_AGG)
    def cents_sum(v):
        import numpy as _np

        # widen FIRST (a float32-physical column would otherwise do the
        # *100 in float32 while the oracle multiplies in DOUBLE), and
        # skip NULLs like SQL SUM (floor(NaN) would wrap to int64
        # garbage); an all-NULL group returns NULL, matching SUM
        x = v.values.astype(_np.float64)
        m = ~_np.isnan(x)
        if not m.any():
            return None
        return int(_np.floor(x[m] * 100.0 + 0.5).astype(_np.int64).sum())

    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg — the row count is a second pandas UDAF
    @F.pandas_udf(T.LongType(), F.PandasUDFType.GROUPED_AGG)
    def n_rows(v):
        return len(v)

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            cents_sum(F.col("value")).alias("cents_total"),
            n_rows(F.col("value")).alias("n_events"),
        )
    )


UDAF_CENTS_TOTAL_SQL = """
SELECT event_type,
       CAST(sum(CAST(floor(value * CAST(100.0 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)
         AS cents_total,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


# --- UDTF: token-run expansion (the UDF/UDAF/UDTF trio completed) -----------

RUN_MIN_LEN = 2


def udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of a repeated adjacent token per document, emitted
    through a Spark 4 Python USER-DEFINED TABLE FUNCTION joined
    LATERALLY per row — one input row fans out to 0..n output rows.
    Completes the Python-extensibility trio this engine demonstrates:
    scalar pandas_udf (WRatio), grouped-agg UDAF (`udaf_cents_total`),
    applyInArrow (`arrow_group_median`), and now a UDTF.

    The run-length semantics themselves ARE SQL-expressible (the
    oracle is the classic gaps-and-islands `pos - row_number()`
    grouping) — that is deliberate: like `arrow_group_median`, the
    operator exists to prove the worker path end-to-end against a
    relational oracle, so a real corpus op with no SQL form (a parser,
    a sentence splitter) can drop into the same plumbing. Built-in
    HOFs remain the hot path for anything expressible (CLAUDE.md).

    Scale shape: the UDTF is a narrow per-row expansion riding the
    scan (zero shuffles; `balanced` spread only) — the same fan-out
    cost model as explode, paying the Python boundary only where
    extensibility demands it."""
    from pyspark.sql.functions import udtf

    from ..sources.registry import balanced

    # bind CONSTANTS into the closure cells: a hardcoded copy inside
    # eval would silently drift from the oracle's interpolated value
    min_len = RUN_MIN_LEN

    @udtf(returnType="start_pos: int, run_len: int, token: string")
    class _Runs:
        def eval(self, doc_id, text):  # noqa: ANN001 (worker closure)
            import re as _re

            # mirror the oracle EXACTLY: SQL trim() strips SPACES
            # only (a leading tab yields a '' first token on both
            # sides), then \s+ split — ASCII flag because Java/RE2
            # \s is ASCII-only, Python's default is Unicode
            stripped = (text or "").strip(" ")
            toks = _re.split(r"\s+", stripped, flags=_re.ASCII)
            i, n = 0, len(toks)
            while i < n:
                j = i
                while j < n and toks[j] == toks[i]:
                    j += 1
                if j - i >= min_len:
                    yield (i, j - i, toks[i])
                i = j

    spark.udtf.register("token_runs_udtf", _Runs)
    d = balanced(load_table(spark, sf_dir, "documents"))
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, u.start_pos, u.run_len, u.token
        FROM _udtf_docs d, LATERAL token_runs_udtf(d.doc_id, d.text) u
        """
    )


#: Oracle: gaps-and-islands — a run is a maximal group where
#: pos - row_number() (per doc & token) is constant. 0-based pos
#: matches the UDTF's token indexing.
UDTF_TOKEN_RUNS_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, i - 1 AS pos, tk[i] AS token
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents),
       UNNEST(generate_series(1, len(tk))) AS g(i)
),
isl AS (
  SELECT doc_id, token, pos,
         pos - row_number() OVER (PARTITION BY doc_id, token
                                  ORDER BY pos) AS grp
  FROM toks
)
SELECT doc_id,
       CAST(min(pos) AS INTEGER) AS start_pos,
       CAST(count(*) AS INTEGER) AS run_len,
       token
FROM isl
GROUP BY doc_id, token, grp
HAVING count(*) >= {RUN_MIN_LEN}
"""
