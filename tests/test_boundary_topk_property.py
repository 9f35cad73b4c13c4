"""Property test for the boundary-pruned exact top-k (r8, VERDICT r7
item 1): `similarity.boundary_pruned_topk` must equal the naive
full-window top-k on EVERY input — including the adversarial shapes
the oracle differential can't synthesize on real embeddings (massive
score ties at the boundary, fewer candidates than k, fewer non-NULL
scores than k, queries missing from the sample, duplicate scores
across buckets).

The pruning theorem under test: the k-th largest of the per-(query,
bucket) sample maxima is a LOWER bound on the true k-th best score,
so filtering `score >= boundary` can never drop a true top-k row
(ties at the boundary are kept by `>=`; a NULL boundary keeps all).

Spark round-trips are slow, so the property runs on seeded
deterministic random cases (not hypothesis-driven Spark calls): 12
cases x ~600 rows, plus hand-built edge cases.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pyspark.sql.types as T

from etl_portfolio_project_spark.operators import similarity as S

SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _naive_topk(rows, k):
    out = {}
    by_q = {}
    for q, v, s in rows:
        by_q.setdefault(q, []).append((s, v))
    for q, lst in by_q.items():
        nn = [(s, v) for s, v in lst if s is not None]
        nulls = sorted(v for s, v in lst if s is None)
        nn.sort(key=lambda t: (-t[0], t[1]))
        ranked = [(v, s) for s, v in nn] + [(v, None) for v in nulls]
        out[q] = [
            (q, v, s, r + 1) for r, (v, s) in enumerate(ranked[:k])
        ]
    return sorted(x for lst in out.values() for x in lst)


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, SCHEMA)
    sample = df.where(F.expr(S.topk_sample_pred()))
    got = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in S.boundary_pruned_topk(df, sample, "score", k=k).collect()
    )
    assert got == _naive_topk(rows, k), (got, _naive_topk(rows, k))


def test_boundary_topk_random_cases(spark):
    rng = random.Random(2024)
    for case in range(12):
        n_q = rng.randint(1, 6)
        rows = []
        for q in range(n_q):
            n_c = rng.randint(1, 200)
            for v in range(n_c):
                # heavy tie mass: scores drawn from a TINY value set so
                # the boundary almost always lands on a tie plateau
                s = rng.choice(
                    [None, 0.0, 0.5, 0.5, 0.5, 1.0, -1.0, 0.25]
                )
                rows.append((q, v, s))
        _run(spark, rows, S.TOP_K)


def test_boundary_topk_edge_cases(spark):
    k = S.TOP_K
    # fewer candidates than k
    _run(spark, [(0, v, float(v)) for v in range(3)], k)
    # all scores identical (worst case: everything survives)
    _run(spark, [(0, v, 7.5) for v in range(100)], k)
    # all scores NULL
    _run(spark, [(0, v, None) for v in range(40)], k)
    # no sampled candidate for the query (vec_ids all off the sample
    # stride) -> NULL boundary -> keep-all fallback
    _run(
        spark,
        [(0, v, float(v % 13)) for v in range(1, 50) if v % 16 != 0],
        k,
    )
    # exactly k non-NULL among many NULLs
    rows = [(0, v, None) for v in range(100)] + [
        (0, 100 + v, float(v)) for v in range(k)
    ]
    _run(spark, rows, k)
