"""Similarity search over embeddings (SURVEY.md §7.4).

Brute-force cosine top-k as the exactness baseline, a random-
hyperplane LSH-bucketed variant as the scale path, and cosine-
threshold near-dup pairs (label-blocked).

Numeric portability: cosine is computed with an EXPLICIT left-to-right
fold — `F.aggregate(zip_with(a,b,*), 0.0, +)` in Spark ≡ an unrolled
left-associative `e1[1]*e2[1] + ... + e1[64]*e2[64]` chain in DuckDB —
so doubles are bit-identical across engines (library cosine functions
do not specify accumulation order). float32 elements are cast to
double first (exact).

Scale design:
- Brute-force: the query set is broadcast; candidates stream through a
  narrow map stage — no shuffle of the big side; per-query top-k via
  window row_number. Works at any candidate-set size; cost is
  O(|Q|·|C|·d) — the baseline to beat.
- LSH: sign-of-random-projection bucketing (deterministic seeded
  hyperplanes, so runs are reproducible). Join on bucket → candidates
  ∝ bucket collisions, then exact re-rank of candidates only. This is
  the 100 TB path: bucket join shuffles on a short key, and the
  hyperplane set is a tiny broadcast literal.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table

DIM = 64
TOP_K = 10
QUERY_MOD = 25  # vec_id % 25 == 0 → query subset
NEARDUP_TAU = 0.25  # embeddings are isotropic random; 64-dim cosine
# concentrates near 0 (σ≈1/8), so 0.25 ≈ 2σ marks "suspiciously close"
#: AND-OR LSH: L tables × B sign bits each. A candidate must match ALL
#: B bits within a table (AND) but ANY table suffices (OR) — the
#: standard recall/candidate-count dial.
LSH_TABLES = 2
LSH_BITS = 4
_rng = random.Random(42)
#: deterministic random hyperplanes [table][bit][dim], fixed at import
LSH_PLANES: list[list[list[float]]] = [
    [[_rng.uniform(-1.0, 1.0) for _ in range(DIM)] for _ in range(LSH_BITS)]
    for _ in range(LSH_TABLES)
]


def _dvec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_expr(a: Column, b: Column) -> Column:
    """Unrolled left-associative dot product. Unrolling (vs a
    higher-order `aggregate` fold) keeps the expression inside
    whole-stage codegen — array lambda functions fall back to
    interpreted eval, a ~10× hit on 25M-pair joins — and makes the
    accumulation order explicit for the SQL oracle mirror."""
    out = F.lit(0.0)
    for i in range(1, DIM + 1):
        out = out + F.element_at(a, i) * F.element_at(b, i)
    return out


def norm_expr(a: Column) -> Column:
    out = F.lit(0.0)
    for i in range(1, DIM + 1):
        out = out + F.element_at(a, i) * F.element_at(a, i)
    return F.sqrt(out)


def cosine_expr(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    return dot_expr(a, b) / (norm_a * norm_b)


def dot_sql(a: str, b: str) -> str:
    """Unrolled left-associative dot product over DIM elements."""
    terms = [
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    ]
    return "(0.0 + " + " + ".join(terms) + ")"


def norm_sql(a: str) -> str:
    terms = [
        f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    ]
    return "sqrt(0.0 + " + " + ".join(terms) + ")"


def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for the query subset
    (vec_id % 101 == 0), excluding self. Deterministic tie-break on
    candidate vec_id."""
    e = load_table(spark, sf_dir, "embeddings")
    # The harness table is a single small parquet file → 1 input
    # partition; without a repartition every pairwise cosine lands on
    # one core. At 100 TB the scan has thousands of splits and this is
    # a no-op cost-wise, so spread eagerly by default.
    par = spark.sparkContext.defaultParallelism
    base = (
        e.repartition(par)
        .select("vec_id", _dvec("embedding").alias("vec"), "label")
        .withColumn("norm", norm_expr(F.col("vec")))
    )
    q = (
        base.where(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm").alias("qnorm"),
        )
    )
    joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = cosine_expr(F.col("qvec"), F.col("vec"), F.col("qnorm"), F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "rank")
    )


ANN_BRUTE_FORCE_TOPK_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe, nrm AS qnorm
  FROM base WHERE vec_id % {QUERY_MOD} = 0
),
scored AS (
  SELECT q.query_id, b.vec_id,
         {dot_sql('q.qe', 'b.embedding')} / (q.qnorm * b.nrm) AS cosine
  FROM base b JOIN q ON b.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-threshold near-duplicate pairs, blocked by `label`
    (embedding-cosine dedup). Blocking bounds the pair space the same
    way a cluster/bucket assignment would at scale."""
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    base = (
        e.repartition(par)
        .select("vec_id", "label", _dvec("embedding").alias("vec"))
        .withColumn("norm", norm_expr(F.col("vec")))
    )
    a = base.select(
        F.col("vec_id").alias("id1"),
        F.col("label").alias("label"),
        F.col("vec").alias("v1"),
        F.col("norm").alias("n1"),
    )
    b = base.select(
        F.col("vec_id").alias("id2"),
        F.col("label").alias("label"),
        F.col("vec").alias("v2"),
        F.col("norm").alias("n2"),
    )
    cos = cosine_expr(F.col("v1"), F.col("v2"), F.col("n1"), F.col("n2"))
    # Broadcast the build side: a plain label equi-join would hash
    # both sides into |labels| (=10) shuffle partitions and cap
    # parallelism there; broadcasting keeps the probe side's full
    # partitioning. (At 100 TB the pair space must be bounded by a
    # cluster/bucket assignment instead — same blocking idea, smaller
    # blocks — and the join shuffles on the block key.)
    return (
        a.join(F.broadcast(b), "label")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= NEARDUP_TAU)
        .select("label", "id1", "id2", "cosine")
    )


EMBEDDING_NEARDUP_PAIRS_SQL = f"""
WITH base AS (
  SELECT vec_id, label, embedding, {norm_sql('embedding')} AS nrm
  FROM embeddings
)
SELECT a.label AS label, a.vec_id AS id1, b.vec_id AS id2,
       {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {NEARDUP_TAU}
"""


def _table_bucket_expr(vec: Column, table: int) -> Column:
    """Sign-bit bucket id of `vec` in LSH table `table`."""
    bits = []
    for i, plane in enumerate(LSH_PLANES[table]):
        proj = F.lit(0.0)
        for j, p in enumerate(plane):
            proj = proj + F.element_at(vec, j + 1) * F.lit(p)
        bits.append(
            F.when(proj >= 0, F.lit(2**i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def _with_buckets(df: DataFrame, vec_col: str, id_alias: str) -> DataFrame:
    """Explode a vector frame into one row per (LSH table, bucket)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _table_bucket_expr(F.col(vec_col), t).alias("bucket"),
            )
            for t in range(LSH_TABLES)
        ]
    )
    return df.select(
        F.col("vec_id").alias(id_alias), F.explode(entries).alias("tb")
    ).select(id_alias, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-OR LSH approximate top-k: candidates share a full sign
    bucket in ANY of the LSH_TABLES tables; exact cosine re-rank of
    the (deduplicated) candidates. Recall vs brute force is asserted
    in tests — approximation is the documented trade-off.

    Scale shape: candidate generation is an equi-join on
    (table, bucket) — one shuffle on a short key; the hyperplanes are
    literals (broadcast by construction); re-rank touches candidates
    only. This is the 100 TB-safe form of ANN in pure DataFrame ops.
    """
    e = load_table(spark, sf_dir, "embeddings")
    par = spark.sparkContext.defaultParallelism
    base = (
        e.repartition(par)
        .select("vec_id", _dvec("embedding").alias("vec"))
        .withColumn("norm", norm_expr(F.col("vec")))
    )
    qbase = base.where(F.col("vec_id") % QUERY_MOD == 0)
    bb = _with_buckets(base, "vec", "vec_id")
    qb = _with_buckets(qbase, "vec", "query_id")
    candidates = (
        bb.join(
            F.broadcast(qb),
            (bb.tbl == qb.tbl)
            & (bb.bucket == qb.bucket)
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = qbase.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    joined = candidates.join(base, "vec_id").join(F.broadcast(qv), "query_id")
    cos = cosine_expr(F.col("qvec"), F.col("vec"), F.col("qnorm"), F.col("norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _table_bucket_sql(vec: str, table: int) -> str:
    terms = []
    for i in range(LSH_BITS):
        plane = LSH_PLANES[table][i]
        prods = [
            f"CAST({vec}[{j + 1}] AS DOUBLE) * {plane[j]!r}" for j in range(DIM)
        ]
        proj = "(0.0 + " + " + ".join(prods) + ")"
        terms.append(
            f"CASE WHEN {proj} >= 0 THEN CAST({2**i} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


def _buckets_cte_sql(vec: str) -> str:
    entries = ", ".join(
        f"{{'tbl': {t}, 'bucket': {_table_bucket_sql(vec, t)}}}"
        for t in range(LSH_TABLES)
    )
    return f"UNNEST([{entries}]) AS u(tb)"


ANN_LSH_TOPK_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings
),
bb AS (
  SELECT vec_id, tb.tbl AS tbl, tb.bucket AS bucket
  FROM embeddings, {_buckets_cte_sql('embedding')}
),
qb AS (
  SELECT vec_id AS query_id, tbl, bucket FROM bb
  WHERE vec_id % {QUERY_MOD} = 0
),
candidates AS (
  SELECT DISTINCT qb.query_id, bb.vec_id
  FROM bb JOIN qb ON bb.tbl = qb.tbl AND bb.bucket = qb.bucket
                 AND bb.vec_id <> qb.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id,
         {dot_sql('q.embedding', 'b.embedding')} / (q.nrm * b.nrm) AS cosine
  FROM candidates c
  JOIN base b ON b.vec_id = c.vec_id
  JOIN base q ON q.vec_id = c.query_id
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""
