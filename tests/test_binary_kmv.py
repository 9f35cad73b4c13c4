"""Property tests for the r9b additions: KMV distinct sketch and
binary (sign-bit) Hamming retrieval. Oracle differentials live in
tools/verify_local.py; these pin the semantics against independent
Python re-implementations."""

from __future__ import annotations

import hashlib

from etl_portfolio_project_spark.operators import similarity as S
from etl_portfolio_project_spark.operators import sketch as SK

from .conftest import SF_SMALL

SF_MID = "/root/testdata/sf0.01"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_small_set_fallback(spark):
    """sf0.001 has 15 distinct users per type (< k=64): every group
    must take the exact-count fallback with the -1 sentinel."""
    rows = SK.kmv_distinct_users(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.kth_hash == -1
        assert r.kmv_estimate == float(r.exact_distinct)


def test_kmv_matches_python(spark):
    """sf0.01 has 150 distinct users per type (> k): the k-th smallest
    salted hash and the estimate must match an exact Python replay,
    and the estimate must land within 50% of truth (k=64 gives
    ~1/sqrt(62) ≈ 13% std error)."""
    rows = {r.event_type: r for r in SK.kmv_distinct_users(spark, SF_MID).collect()}
    # load_table, not spark.read.parquet: events' physical ts type
    # drifts between testdata generations (ADVICE r9)
    from etl_portfolio_project_spark.sources.registry import load_table

    ev = (
        load_table(spark, SF_MID, "events")
        .select("event_type", "user_id")
        .collect()
    )
    users: dict[str, set] = {}
    for r in ev:
        if r.user_id is not None:
            users.setdefault(r.event_type, set()).add(r.user_id)
    for t, us in users.items():
        got = rows[t]
        assert got.exact_distinct == len(us)
        hs = sorted(_h60(f"{SK.KMV_SALT}{u}") for u in us)
        if len(hs) >= SK.KMV_K:
            kth = hs[SK.KMV_K - 1]
            assert got.kth_hash == kth
            est = (
                float(SK.KMV_K - 1)
                * float(SK.KMV_HASH_SPACE)
                / float(kth)
            )
            assert got.kmv_estimate == est
            assert 0.5 * len(us) < est < 1.5 * len(us)


def _pack_words(vec):
    words = [0] * S.BQ_WORDS
    for d, x in enumerate(vec):
        if x is not None and x > 0:
            words[d // S.BQ_WORD_BITS] |= 1 << (d % S.BQ_WORD_BITS)
    return words


def test_hamming_topk_matches_python(spark):
    """Full replay: pack sign bits, score every candidate by
    DIM − popcount(xor), take top-K with the vec_id tie-break —
    the Spark result must agree exactly for every query."""
    out: dict[int, list] = {}
    for r in S.ann_binary_hamming_topk(spark, SF_SMALL).collect():
        out.setdefault(r.query_id, []).append(
            (r.rank, r.vec_id, r.hamming_sim)
        )
    vecs = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
        if r.embedding is not None
        and len(r.embedding) == S.DIM
        and all(x is not None for x in r.embedding)
    }
    packed = {i: _pack_words(v) for i, v in vecs.items()}
    queries = [
        i
        for i in packed
        if i % S.QUERY_MOD == 0 and i < S.QUERY_ID_BOUND
    ]
    assert queries
    for qid in queries:
        qw = packed[qid]
        scored = []
        for vid, w in packed.items():
            if vid == qid:
                continue
            ham = sum(bin(a ^ b).count("1") for a, b in zip(qw, w))
            scored.append((-(S.DIM - ham), vid))
        scored.sort()
        expect = [
            (rk + 1, vid, -negsim)
            for rk, (negsim, vid) in enumerate(scored[: S.TOP_K])
        ]
        assert sorted(out[qid]) == expect, qid


def test_binary_recall_bounds(spark):
    rows = S.binary_quant_recall_audit(spark, SF_MID).collect()
    assert rows
    for r in rows:
        assert r.n_exact >= 1
        assert 0 <= r.n_hits <= r.n_exact
        assert r.recall == r.n_hits / r.n_exact


def test_epoch_shuffle_matches_python(spark):
    """Replay: per-epoch md5 order, position-weighted permutation
    fingerprint and head-sample hash must match exactly."""
    from etl_portfolio_project_spark.operators import curation as CU

    out = {r.epoch: r for r in CU.epoch_shuffle_audit(spark, SF_SMALL).collect()}
    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id")
        .collect()
        if r.doc_id is not None
    ]
    P = CU.FP_MOD
    for ep in range(CU.EPOCH_COUNT):
        order = sorted(
            (_h60(f"{CU.EPOCH_SALT}{ep}:{i}"), i) for i in ids
        )
        fp = 0
        for pos, (h, _i) in enumerate(order, start=1):
            fp = (fp + (pos % P) * (h % P) % P) % P
        head = ",".join(str(i) for _h, i in order[: CU.EPOCH_HEAD_K])
        got = out[ep]
        assert got.n_docs == len(ids)
        assert got.perm_fp == fp
        assert got.head_fp == _h60(head)


def test_kcore_driver_and_distributed_branches_agree(spark):
    """The driver-finish peel and the distributed counted peel must
    produce identical cores (the CC two-phase equality contract)."""
    from etl_portfolio_project_spark import caches
    from etl_portfolio_project_spark.operators import dedup as D
    from etl_portfolio_project_spark.plans import explain

    edges = D.claimed_undirected_edges(spark, SF_MID, "kcore_test_edges")
    rows = edges.collect()
    via_driver = D._kcore_peel_py([(r.lo, r.hi) for r in rows])
    dist = D._kcore_distributed(edges)
    # the >200k-edge production path's plan contract, checked HERE
    # because the builder's SF_SMALL plan is the driver-finish
    # LocalTableScan: exchange budget + no unpartitioned window
    plan = explain.physical_plan(dist)
    assert explain.count_shuffles_in(plan) <= 21, plan
    assert not [
        w
        for w in explain.unpartitioned_windows(plan)
        if "_rrn_pid" not in w
    ], plan
    via_dist = sorted(
        (r.doc_id, r.core_degree) for r in dist.collect()
    )
    caches.release_all()
    assert via_driver == via_dist
    assert via_driver, "harness graph must have a non-empty 2-core"


def test_kcore_is_true_fixpoint_at_harness(spark):
    """At harness scale the counted 3-round peel must have converged:
    re-peeling the returned core in Python removes nothing, and every
    member has core_degree >= K within the core subgraph."""
    from etl_portfolio_project_spark.operators import dedup as D

    core = {
        r.doc_id: r.core_degree
        for r in D.kcore_dedup_graph(spark, SF_MID).collect()
    }
    edges = {
        (min(r.id1, r.id2), max(r.id1, r.id2))
        for r in D.neardup_jaccard(spark, SF_MID)
        .select("id1", "id2")
        .collect()
    }
    # python fixpoint peel
    es = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {i for i, d in deg.items() if d >= D.KCORE_K}
        nes = {(a, b) for a, b in es if a in keep and b in keep}
        if nes == es:
            break
        es = nes
    expect: dict[int, int] = {}
    for a, b in es:
        expect[a] = expect.get(a, 0) + 1
        expect[b] = expect.get(b, 0) + 1
    expect = {i: d for i, d in expect.items() if d >= D.KCORE_K}
    from etl_portfolio_project_spark import caches

    caches.release_all()  # the builder claims its edge list
    assert core == expect
