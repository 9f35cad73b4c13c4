"""Property tests for the LLM-pipeline extension operators.

Oracle parity is covered by test_oracle_parity; these assert the
SEMANTIC properties the oracles can't express: LSH recall vs the exact
baselines, score ranges, and signature locality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_portfolio_project_spark.operators import dedup as D
from etl_portfolio_project_spark.operators import similarity as S
from etl_portfolio_project_spark.operators import text as X

from .conftest import SF_SMALL


def test_minhash_recall_vs_exact_jaccard(spark):
    exact = {
        (r.id1, r.id2)
        for r in D.neardup_jaccard(spark, SF_SMALL).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in D.minhash_lsh_neardup(spark, SF_SMALL).collect()
    }
    assert exact, "degenerate: no exact near-dup pairs at sf0.001"
    assert lsh <= exact  # verification step guarantees precision 1.0
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.7, f"minhash recall {recall:.2f} < 0.7"


def test_ann_lsh_recall_vs_brute_force(spark):
    exact = D.__dict__  # noqa: F841 (readability only)
    bf = S.ann_brute_force_topk(spark, SF_SMALL).collect()
    lsh = S.ann_lsh_topk(spark, SF_SMALL).collect()
    bf_top = {(r.query_id, r.vec_id) for r in bf}
    lsh_top = {(r.query_id, r.vec_id) for r in lsh}
    assert bf_top, "degenerate brute-force result"
    # every LSH hit must be a true neighbor pair that brute force also
    # scored (same bucket → same cosine); and each query's LSH rank-1
    # must be a bucket-mate, so just require nonzero overlap per query
    overlap = len(bf_top & lsh_top) / len(bf_top)
    assert overlap > 0.05, f"LSH/BF overlap {overlap:.2f} suspiciously low"


def test_embedding_lsh_neardup_precision_and_yield(spark):
    """The LSH-bucketed embedding near-dup: every emitted pair must
    genuinely clear the cosine threshold (precision 1.0 — the exact
    verify step guarantees it), and the bucketing must yield a
    non-degenerate candidate set on the harness data."""
    pairs = S.embedding_lsh_neardup_pairs(spark, SF_SMALL).collect()
    assert pairs, "degenerate: LSH bucketing produced no near-dup pairs"
    for r in pairs:
        assert r.cosine >= S.NEARDUP_TAU
        assert r.id1 < r.id2


def test_simhash_locality(spark):
    """Near-identical texts get near-identical simhashes: take a doc,
    its hamming distance to itself is 0 and the pairs output respects
    the threshold."""
    pairs = D.simhash_pairs(spark, SF_SMALL).collect()
    for r in pairs:
        assert r.hamming <= D.SIMHASH_MAX_HAMMING
        assert 0 <= r.simhash1 < 2**D.SIMHASH_BITS
        assert 0 <= r.simhash2 < 2**D.SIMHASH_BITS


def test_text_profile_ranges(spark):
    df = X.text_profile(spark, SF_SMALL).collect()
    langs = {lang for lang, _ in X.LANG_MARKERS} | {"und"}
    for r in df:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.lang_pred in langs
        assert 0 <= r.fingerprint_rolling < X.FP_P
        assert len(r.fingerprint_md5) == 32
        assert r.n_tokens > 0
        assert abs(r.n_chars_calc) >= r.n_tokens  # tokens can't exceed chars


def test_dedup_exact_is_partition(spark):
    """Survivor set = one doc per fingerprint, covering all docs."""
    from etl_portfolio_project_spark.sources.registry import load_table

    total = load_table(spark, SF_SMALL, "documents").count()
    groups = D.dedup_exact(spark, SF_SMALL).collect()
    assert sum(r.n_copies for r in groups) == total
    assert len({r.doc_id for r in groups}) == len(groups)


def test_embedding_neardup_threshold(spark):
    rows = S.embedding_neardup_pairs(spark, SF_SMALL).collect()
    assert rows, "degenerate: no near-dup embedding pairs"
    for r in rows:
        assert r.cosine >= S.NEARDUP_TAU
        assert r.id1 < r.id2


def test_hll_estimate_accuracy(spark):
    """The portable HLL's relative error must sit in the expected
    1.04/sqrt(m) band (with slack): the estimate is useless if the
    deterministic re-derivation broke the math."""
    from etl_portfolio_project_spark.operators import sketch as SK

    import math

    rows = SK.hll_distinct_users(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # the registered query returns the RAW harmonic estimate (the
        # bit-exact, oracle-checkable part); the standard small-range
        # linear-counting correction involves ln(), whose last ulp is
        # engine-specific, so it is applied downstream — here
        est = r.hll_estimate
        empty = SK.HLL_M - r.n_filled
        if est <= 2.5 * SK.HLL_M and empty > 0:
            est = SK.HLL_M * math.log(SK.HLL_M / empty)
        rel_err = abs(est - r.exact_distinct) / r.exact_distinct
        assert rel_err < 3 * 1.04 / (SK.HLL_M ** 0.5), (
            f"{r.event_type}: corrected {est:.1f} vs exact "
            f"{r.exact_distinct} (rel err {rel_err:.3f})"
        )
        assert 0 < r.n_filled <= SK.HLL_M


def test_gopher_flags_internally_consistent(spark):
    """passes_all must equal the conjunction of the individual rule
    flags, and the integer cross-multiplied mean-word-len rule must
    agree with the emitted double mean."""
    out = X.gopher_quality_flags(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    conj = (
        out["word_count_ok"]
        & out["mean_word_len_ok"]
        & out["symbol_ratio_ok"]
        & out["alpha_word_ratio_ok"]
        & out["stopword_ok"]
    )
    assert (out["passes_all"] == conj).all()
    # cross-multiplied rule ⇔ double mean within [3, 10]
    in_range = (out["mean_word_len"] >= 3.0) & (out["mean_word_len"] <= 10.0)
    assert (out["mean_word_len_ok"] == in_range).all()
    # this corpus has no '#'/'...' symbols and all-alpha words
    assert out["symbol_ratio_ok"].all()
    assert out["alpha_word_ratio_ok"].all()


def test_ann_recall_audit_bounds_and_consistency(spark):
    """Per-query recall must be n_hits/n_exact in [0, 1], with
    n_hits ≤ n_exact = TOP_K, and the mean recall must match the
    independently-computed recall of the two underlying queries."""
    audit = S.ann_lsh_recall_audit(spark, SF_SMALL).toPandas()
    assert len(audit) > 0
    assert (audit["n_exact"] == S.TOP_K).all()
    assert ((audit["n_hits"] >= 0) & (audit["n_hits"] <= audit["n_exact"])).all()
    assert (audit["recall"] == audit["n_hits"] / audit["n_exact"]).all()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in S.ann_brute_force_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in S.ann_lsh_topk(spark, SF_SMALL).collect()
    }
    assert int(audit["n_hits"].sum()) == len(exact & approx)


def test_semantic_dedup_driver_and_distributed_cc_agree(spark):
    """semantic_dedup_clusters rides _cc_two_phase: forcing the
    distributed label-propagation branch must produce the identical
    cluster table (same contract as the neardup_clusters tests)."""
    from etl_portfolio_project_spark import caches

    a = sorted(
        map(tuple, S.semantic_dedup_clusters(spark, SF_SMALL).collect())
    )
    orig = D.CC_DRIVER_FINISH_MAX_EDGES
    try:
        D.CC_DRIVER_FINISH_MAX_EDGES = -1
        b = sorted(
            map(tuple, S.semantic_dedup_clusters(spark, SF_SMALL).collect())
        )
    finally:
        D.CC_DRIVER_FINISH_MAX_EDGES = orig
        caches.release_all()
    assert a == b and len(a) > 0
    for _cid, size, _keep, dropped in a:
        assert size >= 2 and dropped == size - 1


# --- r5 operators ----------------------------------------------------------


def test_minhash_tau_sweep_monotone(spark):
    rows = D.minhash_tau_sweep(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == len(D.SWEEP_TAUS)
    by_tau = sorted(rows, key=lambda r: r.tau)
    cands = {r.n_candidates for r in rows}
    assert len(cands) == 1, "candidate count must be tau-independent"
    pairs = [r.n_pairs for r in by_tau]
    assert pairs == sorted(pairs, reverse=True), (
        f"n_pairs must be non-increasing in tau: {pairs}"
    )
    for r in rows:
        assert 0.0 <= r.precision <= 1.0


def test_exact_substring_spans_are_real_and_maximal(spark):
    """Every reported span re-verifies against the RAW texts (the
    tokens genuinely match position-for-position over the full span),
    is at least ES_K + ES_MIN_GRAMS - 1 tokens, and is MAXIMAL (the
    tokens just before/after the span differ or run off an end) —
    a pure-Python recomputation, independent of the SQL/hash path."""
    from etl_portfolio_project_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.01"
    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in load_table(spark, sf, "documents").collect()
    }
    spans = D.exact_substring_spans(spark, sf).collect()
    assert spans, "degenerate: no shared spans at sf0.01"
    for r in spans:
        t1, t2 = docs[r.id1], docs[r.id2]
        a, b, ln = r.start1 - 1, r.start2 - 1, r.span_tokens
        assert ln >= D.ES_K + D.ES_MIN_GRAMS - 1
        assert t1[a: a + ln] == t2[b: b + ln], (r, t1[a: a + ln][:5])
        # maximality: can't extend in either direction
        if a > 0 and b > 0:
            assert t1[a - 1] != t2[b - 1], ("left-extendable", r)
        if a + ln < len(t1) and b + ln < len(t2):
            assert t1[a + ln] != t2[b + ln], ("right-extendable", r)


def test_embedding_pq_codes_properties(spark):
    sf = "/root/testdata/sf0.01"
    rows = S.embedding_pq_codes(spark, sf).collect()
    valid_cids = {
        r.vec_id for r in rows
        if r.vec_id % S.PQ_MOD == S.PQ_OFF and r.vec_id < S.PQ_ID_BOUND
    }
    assert valid_cids
    for r in rows:
        for m in range(1, S.PQ_M + 1):
            assert getattr(r, f"code_{m}") in valid_cids
        assert r.sq_error >= 0.0
    # a codebook vector reconstructs itself exactly (error 0, own code)
    for r in rows:
        if r.vec_id in valid_cids:
            assert r.sq_error == 0.0, r
            assert all(
                getattr(r, f"code_{m}") == r.vec_id
                for m in range(1, S.PQ_M + 1)
            )


def test_contrastive_margin_consistency(spark):
    """pos/neg are genuine per-side maxima: margin = pos - neg, and
    the negative's cosine never exceeds the true overall max."""
    sf = "/root/testdata/sf0.01"
    rows = S.contrastive_hard_negatives(spark, sf).collect()
    assert rows
    for r in rows:
        assert r.pos_vec_id != r.neg_vec_id
        assert abs(r.margin - (r.pos_cosine - r.neg_cosine)) == 0.0


def test_corpus_quality_funnel_consistency(spark):
    """Funnel counts must equal recounts from the component per-doc
    queries (composition contract)."""
    sf = SF_SMALL
    funnel = {r.source: r for r in X.corpus_quality_funnel(spark, sf).collect()}
    g = X.gopher_quality_flags(spark, sf).select(
        "doc_id", "source", "passes_all"
    ).collect()
    by_src: dict[str, int] = {}
    for r in g:
        if r.passes_all:
            by_src[r.source] = by_src.get(r.source, 0) + 1
    for src, row in funnel.items():
        assert row.n_pass_gopher == by_src.get(src, 0), src
        assert 0 <= row.n_pass_all <= min(
            row.n_pass_gopher, row.n_pass_c4, row.n_lang_match
        )
        assert row.n_docs >= row.n_pass_all


def test_embedding_norm_outliers_flags_exactly_planted(spark):
    sf = "/root/testdata/sf0.01"
    rows = S.embedding_norm_outliers(spark, sf).collect()
    got = {r.vec_id for r in rows}
    from etl_portfolio_project_spark.sources.registry import load_table

    src_ids = [
        r.vec_id
        for r in load_table(spark, sf, "embeddings").collect()
        if r.vec_id % S.NORM_PLANT_MOD == 1
    ]
    want = {i + S.NORM_PLANT_BIG for i in src_ids} | {
        i + S.NORM_PLANT_SMALL for i in src_ids
    }
    assert got == want
    for r in rows:
        assert r.ratio > 2.0 or r.ratio < 0.5


def test_source_lang_diversity_bounds(spark):
    rows = __import__(
        "etl_portfolio_project_spark.operators.analytics",
        fromlist=["analytics"],
    ).source_lang_diversity(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini_impurity < 1.0
        assert 0.0 < r.dominant_share <= 1.0
        if r.n_langs == 1:
            assert r.gini_impurity == 0.0 and r.dominant_share == 1.0


def test_bm25_matches_independent_reference(spark):
    """Differential: re-derive every BM25 score in plain Python from
    raw tokenized docs (rational idf, same constants) and compare the
    engine's top-k rows value-for-value."""
    import math
    import re

    from etl_portfolio_project_spark.operators import analytics as A

    def engine_toks(s):
        # mirror split(trim(lower(text)), '\s+'): Java trim strips
        # chars <= U+0020, ASCII \s only, and splitting '' yields ['']
        s = s.lower().strip("".join(chr(c) for c in range(0x21)))
        return re.split(r"\s+", s, flags=re.ASCII)

    docs = {
        r.doc_id: engine_toks(str(r.text))
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    terms = [t.lower() for t in A.SEARCH_TERMS]
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }

    def score(doc_id):
        toks = docs[doc_id]
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            s += (
                idf
                * (tf * 2.2)
                / (tf + 1.2 * (1 - 0.75 + 0.75 * (len(toks) / avgdl)))
            )
        return s

    rows = A.bm25_search_topk(spark, SF_SMALL).collect()
    # the engine only ranks docs containing >=1 query term
    matching = [
        d for d, toks in docs.items() if any(t in toks for t in terms)
    ]
    assert len(rows) == min(A.SEARCH_TOP_K, len(matching))
    assert rows, "degenerate: no document matches any query term"
    prev = None
    for r in rows:
        assert math.isclose(r.score, score(r.doc_id), rel_tol=1e-9), (
            r.doc_id,
            r.score,
            score(r.doc_id),
        )
        assert r.doc_len == len(docs[r.doc_id])
        if prev is not None:  # ranking is (score desc, doc_id asc)
            assert (prev.score, -prev.doc_id) >= (r.score, -r.doc_id)
        prev = r
    # the returned set IS the top-k of the matching docs
    better = sorted((-score(d), d) for d in matching)[: A.SEARCH_TOP_K]
    assert {d for _, d in better} == {r.doc_id for r in rows}


def test_doc_token_commonness_brute_force(spark):
    """Differential: recompute per-doc frequency sums from a Python
    Counter over the whole corpus; flags must match the integer
    cross-multiplication exactly."""
    from collections import Counter

    from etl_portfolio_project_spark.operators import text as T

    docs = {
        r.doc_id: str(r.text).strip().split()
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    # match the engines' split: splitting '' yields one empty token
    docs = {d: (t if t else [""]) for d, t in docs.items()}
    cnt = Counter(w for toks in docs.values() for w in toks)
    total = sum(len(t) for t in docs.values())
    rows = X.doc_token_commonness(spark, SF_SMALL).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        toks = docs[r.doc_id]
        sfreq = sum(cnt[w] for w in toks)
        assert r.n_tokens == len(toks)
        assert r.sum_token_freq == sfreq
        assert r.boilerplate_flag == (
            sfreq * T.COMMON_TAU_DEN > len(toks) * total
        )
        assert r.jargon_flag == (
            sfreq * T.RARE_TAU_DEN < len(toks) * total
        )


def test_hybrid_rrf_matches_independent_fusion(spark):
    """Differential: take the two input rankings (engine-built), then
    re-derive the FUSION — ranks, RRF terms, fixed-order sum, final
    top-k ordering — in plain Python and compare row-for-row."""
    from etl_portfolio_project_spark.operators import analytics as A

    sparse_rows = A.bm25_search_topk(spark, SF_SMALL).collect()
    sparse_rank = {
        r.doc_id: i + 1
        for i, r in enumerate(
            sorted(sparse_rows, key=lambda r: (-r.score, r.doc_id))
        )
    }
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e}
    qv = vecs[S.DENSE_QUERY_ID]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    qn = dot(qv, qv) ** 0.5
    cos = {
        vid: dot(qv, v) / (qn * dot(v, v) ** 0.5)
        for vid, v in vecs.items()
        if vid != S.DENSE_QUERY_ID
    }
    dense_ids = sorted(cos, key=lambda i: (-cos[i], i))[: A.SEARCH_TOP_K]
    dense_rank = {vid: i + 1 for i, vid in enumerate(dense_ids)}

    expected = {}
    for d in set(sparse_rank) | set(dense_rank):
        s = 0.0
        if d in sparse_rank:
            s += 1.0 / (S.RRF_K + sparse_rank[d])
        if d in dense_rank:
            s += 1.0 / (S.RRF_K + dense_rank[d])
        expected[d] = s
    top = sorted(expected, key=lambda d: (-expected[d], d))[
        : A.SEARCH_TOP_K
    ]

    rows = S.hybrid_rrf_search(spark, SF_SMALL).collect()
    assert [r.doc_id for r in rows] == top
    for r in rows:
        assert r.r_sparse == sparse_rank.get(r.doc_id)
        assert r.r_dense == dense_rank.get(r.doc_id)
        # same fixed-order float ops → exact equality is fair game
        assert r.rrf_score == expected[r.doc_id]


def test_split_leakage_audit_consistency(spark):
    """Cross-operator differential: the audit's per-split doc counts
    must equal train_val_test_split's, its canonical pair ordering
    must hold, and cross-split EXACT duplicates (identical text —
    identical signatures, so banding can never miss them) are a hard
    lower bound on the reported leak pairs."""
    from etl_portfolio_project_spark.operators import corpus as C

    rows = {
        (r.split_a, r.split_b): r
        for r in C.split_leakage_audit(spark, SF_SMALL).collect()
    }
    assert set(rows) == {
        ("train", "validation"),
        ("train", "test"),
        ("validation", "test"),
    }
    split_counts = {
        r.split: r.n_docs
        for r in C.train_val_test_split(spark, SF_SMALL).collect()
    }
    for (a, b), r in rows.items():
        assert r.n_docs_a == split_counts.get(a, 0)
        assert r.n_docs_b == split_counts.get(b, 0)
        assert 0 <= r.n_docs_exposed <= r.n_leak_pairs
        if r.n_leak_pairs:
            assert 0.0 < r.max_jaccard <= 1.0

    # exact-dup lower bound, re-derived independently
    d = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(
            "doc_id",
            C.split_assignment_expr().alias("split"),
            F.md5("text").alias("h"),
        )
        .collect()
    )
    from collections import defaultdict
    from itertools import combinations

    by_hash = defaultdict(list)
    for r in d:
        by_hash[r.h].append((r.doc_id, r.split))
    order = {"train": 0, "validation": 1, "test": 2}
    exact_cross = defaultdict(int)
    for docs in by_hash.values():
        for (i1, s1), (i2, s2) in combinations(docs, 2):
            if s1 != s2:
                pair = tuple(sorted((s1, s2), key=order.get))
                exact_cross[pair] += 1
    for pair, n in exact_cross.items():
        assert rows[pair].n_leak_pairs >= n, (
            f"{pair}: audit reports {rows[pair].n_leak_pairs} leak "
            f"pairs but {n} exact cross-split dups exist"
        )


def test_kmeans_assignment_step_matches_numpy(spark):
    """Differential: recompute the Lloyd step in numpy (float64) —
    per-label QUANTIZED centroids (the r10 order-free exact recipe:
    sum of floor(v·1e6 + 0.5) ints ÷ 1e6 ÷ n), squared-L2 argmin with
    (d2, label) tie-break — and compare the transition matrix. Random
    gaussian data keeps centroid distances far from ties."""
    import numpy as np

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in e}
    labels = {r.vec_id: r.label for r in e}
    labs = sorted(set(labels.values()))

    def _qcent(members):
        q = np.floor(np.stack(members) * S.CENTROID_Q + 0.5).astype(
            np.int64
        )
        return (q.sum(axis=0).astype(np.float64) / S.CENTROID_Q) / len(
            members
        )

    cents = {
        l: _qcent([vecs[v] for v in sorted(vecs) if labels[v] == l])
        for l in labs
    }
    expected = {}
    for v in vecs:
        d2 = {l: float(np.sum((vecs[v] - cents[l]) ** 2)) for l in labs}
        new = min(labs, key=lambda l: (d2[l], l))
        key = (labels[v], new)
        expected[key] = expected.get(key, 0) + 1

    rows = S.kmeans_assignment_step(spark, SF_SMALL).collect()
    got = {(r.old_label, r.new_label): r.n_vectors for r in rows}
    assert got == expected
    assert sum(got.values()) == len(vecs)
    for r in rows:
        assert r.inertia >= 0.0


def test_bpe_pair_stats_matches_python(spark):
    """Differential: re-derive the weighted adjacent-pair counts with
    a plain Python BPE-style loop (chars + </w>, counts weighted by
    word frequency) and compare the engine's top-k exactly."""
    import re
    from collections import Counter

    docs = [
        str(r.text)
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("text")
        .collect()
    ]
    wc = Counter()
    for t in docs:
        stripped = t.strip("".join(chr(c) for c in range(0x21)))
        for w in re.split(r"\s+", stripped, flags=re.ASCII):
            if w:
                wc[w] += 1
    pc = Counter()
    for w, n in wc.items():
        syms = list(w) + [X.BPE_EOW]
        for a, b in zip(syms, syms[1:]):
            pc[f"{a} {b}"] += n
    expected = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[
        : X.BPE_TOP_PAIRS
    ]

    rows = X.bpe_pair_stats(spark, SF_SMALL).collect()
    assert [(r.pair, r.pair_count) for r in rows] == expected


def test_hashed_ngram_quality_scores_matches_python(spark):
    """Differential: re-derive the hashing-trick classifier (md5
    bucket -> md5 weight, unigrams + adjacent bigrams) with plain
    Python hashlib and compare score_int / n_feats / keep_flag
    exactly for every document."""
    import hashlib
    import re

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def w(feat: str) -> int:
        b = h60("qcls:" + feat) % X.QCLS_BUCKETS
        return h60("qw:" + str(b)) % 2001 - 1000

    docs = {
        r.doc_id: str(r.text)
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    rows = X.hashed_ngram_quality_scores(spark, SF_SMALL).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        stripped = docs[r.doc_id].strip(
            "".join(chr(c) for c in range(0x21))
        )
        toks = re.split(r"\s+", stripped, flags=re.ASCII) or [""]
        n_feats = len(toks) + max(len(toks) - 1, 0)
        score = sum(w(t) for t in toks) + sum(
            w(f"{a} {b}") for a, b in zip(toks, toks[1:])
        )
        assert r.n_feats == n_feats
        assert r.score_int == score
        assert r.keep_flag == (score * X.QCLS_KEEP_MUL > n_feats * 1000)


def test_embedding_dim_profile_matches_numpy(spark):
    """Differential: recompute every per-dim quantized moment with
    numpy over the raw vectors (including the two planted dead dims)
    and compare all eight columns; exactly the planted dims may flag
    dead."""
    import math

    import numpy as np

    vecs = np.array(
        [
            [float(x) for x in r.embedding]
            for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    vecs[:, list(S.DIM_DEAD_PLANTED)] = 0.0
    q = np.floor(vecs * 1e6 + 0.5).astype(np.int64)

    rows = {r.dim: r for r in S.embedding_dim_profile(spark, SF_SMALL).collect()}
    assert set(rows) == set(range(vecs.shape[1]))
    dead = set()
    for d, r in rows.items():
        col = q[:, d]
        assert r.n_vecs == len(col)
        assert r.q_sum == int(col.sum())
        assert r.q_sumsq_mod == (
            int((col.astype(object) ** 2).sum()) % S.MOMENT_FOLD_MOD
        )
        assert (r.q_min, r.q_max) == (int(col.min()), int(col.max()))
        assert math.isclose(
            r.mean_val, col.sum() / (1e6 * len(col)), rel_tol=0, abs_tol=0
        )
        if r.dead_flag:
            dead.add(d)
    assert dead == set(S.DIM_DEAD_PLANTED)


def test_bpe_merge_loop_matches_python_trainer(spark):
    """Differential: run a plain-Python Sennrich BPE trainer (greedy
    index-walk merge — independently implemented, not the engine's
    last-token string fold) for BPE_MERGE_STEPS merges and compare
    every step's pair, count, and post-merge symbol total."""
    import re
    from collections import Counter

    docs = [
        str(r.text)
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("text")
        .collect()
    ]
    wc = Counter()
    for t in docs:
        stripped = t.strip("".join(chr(c) for c in range(0x21)))
        for w in re.split(r"\s+", stripped, flags=re.ASCII):
            if w:
                wc[w] += 1
    vocab = {w: list(w) + [X.BPE_EOW] for w in wc}

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    expected = []
    for _ in range(X.BPE_MERGE_STEPS):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[f"{a} {b}"] += wc[w]
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ")
        vocab = {w: merge_word(s, a, b) for w, s in vocab.items()}
        n_after = sum(wc[w] * len(s) for w, s in vocab.items())
        expected.append((pair, cnt, n_after))

    try:
        rows = sorted(X.bpe_merge_loop(spark, SF_SMALL).collect(),
                      key=lambda r: r.step)
        assert [
            (r.merged_pair, r.pair_count, r.n_symbols_after) for r in rows
        ] == expected
    finally:
        # same isolation as bench/verify between queries: don't leave
        # the claimed vocab generations live for later tests
        from etl_portfolio_project_spark import caches

        caches.release_all()


def test_ann_pq_adc_topk_matches_numpy(spark):
    """Differential: recompute PQ codes, the per-query LUT, ADC
    distances, and the top-k ranking with numpy (same tie-breaks) and
    compare the full (query, rank) -> (vec_id, dist) mapping."""
    import numpy as np

    try:
        rows = sorted(
            S.ann_pq_adc_topk(spark, SF_SMALL).collect(),
            key=lambda r: (r.query_id, r.rank),
        )
    finally:
        from etl_portfolio_project_spark import caches

        caches.release_all()

    recs = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in recs])
    vecs = np.array([[float(x) for x in r.embedding] for r in recs])
    cent_mask = (ids % S.PQ_MOD == S.PQ_OFF) & (ids < S.PQ_ID_BOUND)
    cids, cvecs = ids[cent_mask], vecs[cent_mask]
    m_codes = []
    for m in range(S.PQ_M):
        sl = slice(m * S.PQ_SUB, (m + 1) * S.PQ_SUB)
        d = ((vecs[:, None, sl] - cvecs[None, :, sl]) ** 2).sum(axis=2)
        # tie -> smaller codebook vec_id: argsort by (d, cid)
        order = np.lexsort((cids[None, :].repeat(len(ids), 0), d), axis=1)
        m_codes.append(cids[order[:, 0]])

    expected = {}
    for qi in np.where((ids % S.QUERY_MOD == 0) & (ids < S.QUERY_ID_BOUND))[0]:
        q = vecs[qi]
        lut = {}
        for m in range(S.PQ_M):
            sl = slice(m * S.PQ_SUB, (m + 1) * S.PQ_SUB)
            for ci, cid in enumerate(cids):
                lut[(m, cid)] = float(((q[sl] - cvecs[ci, sl]) ** 2).sum())
        cand = []
        for xi in range(len(ids)):
            if ids[xi] == ids[qi]:
                continue
            dist = sum(lut[(m, m_codes[m][xi])] for m in range(S.PQ_M))
            cand.append((dist, int(ids[xi])))
        cand.sort()
        for rank, (dist, vid) in enumerate(cand[: S.TOP_K], 1):
            expected[(int(ids[qi]), rank)] = vid

    got = {(r.query_id, r.rank): r.vec_id for r in rows}
    assert got == expected


def test_udtf_token_runs_properties_and_sample(spark):
    """The UDTF's runs must tile correctly: per (doc, token) run
    positions are disjoint and in-bounds, every run really repeats in
    the raw text (recomputed with an independent Python walk on a
    sample), and the total run coverage equals the independent
    count."""
    import re

    from etl_portfolio_project_spark.operators import arrow_ops as AR

    rows = AR.udtf_token_runs(spark, SF_SMALL).collect()
    assert rows, "degenerate: no repeated-token runs at sf0.001"
    docs = {
        r.doc_id: str(r.text)
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def runs_of(text):
        # SQL-trim semantics: spaces only, then ASCII \s+ split
        toks = re.split(r"\s+", text.strip(" "), flags=re.ASCII)
        out, i = [], 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            if j - i >= AR.RUN_MIN_LEN:
                out.append((i, j - i, toks[i]))
            i = j
        return out

    expected = {
        (d, s, n, t) for d, text in docs.items()
        for (s, n, t) in runs_of(text)
    }
    got = {(r.doc_id, r.start_pos, r.run_len, r.token) for r in rows}
    assert got == expected


def test_variant_round_trip_recovers_scalars(spark):
    """The VARIANT construct -> parse -> typed-path extraction must
    recover the original column values for every row (checked on a
    deterministic sample), the absent path must be NULL everywhere,
    and the type string must round-trip."""
    import json

    from pyspark.sql import functions as F

    from etl_portfolio_project_spark.operators import relational as R
    from etl_portfolio_project_spark.sources.registry import load_table

    base = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "props"
    )
    # ROW-LEVEL round trip on a deterministic sample, via the SAME
    # shared construction expression the operator uses (aggregates
    # alone could hide cancelling per-row errors)
    js = R.variant_js_expr()
    sample = (
        base.orderBy("event_id")
        .limit(200)
        .selectExpr(
            "event_id",
            "user_id",
            "props",
            f"variant_get(parse_json({js}), '$.src.k', 'bigint') AS k_back",
            f"variant_get(parse_json({js}), '$.meta.u', 'bigint') AS u_back",
            f"variant_get(parse_json({js}), '$.extra', 'bigint') AS e_back",
        )
        .collect()
    )
    for r in sample:
        assert r.k_back == json.loads(r.props)["k"]
        assert r.u_back == r.user_id
        expected_extra = r.event_id % 100 if r.event_id % 3 == 0 else None
        assert r.e_back == expected_extra
    out = {
        r.event_type: r
        for r in R.variant_schema_on_read(spark, SF_SMALL).collect()
    }
    agg = {}
    for r in base.collect():
        k = json.loads(r.props)["k"]
        a = agg.setdefault(
            r.event_type, {"n": 0, "k": 0, "u": 0, "t1": 0, "ne": 0, "se": 0}
        )
        a["n"] += 1
        a["k"] += k
        a["u"] += r.user_id
        a["t1"] += r.event_id % 3
        if r.event_id % 3 == 0:
            a["ne"] += 1
            a["se"] += r.event_id % 100
    assert set(out) == set(agg)
    for et, a in agg.items():
        o = out[et]
        assert (o.n_events, o.sum_k, o.sum_user) == (a["n"], a["k"], a["u"])
        assert (o.sum_tag1, o.n_extra, o.sum_extra) == (
            a["t1"], a["ne"], a["se"],
        )
        assert o.n_absent_path == 0
        assert o.n_type_roundtrip_ok == a["n"]


def test_bpe_fold_equivalent_to_index_walk_exhaustive(spark):
    """EXHAUSTIVE equivalence of the engine's greedy-merge string
    fold (_bpe_fold_spark) with the canonical index-walk merge, over
    every symbol sequence of length 1..6 from {'a','b'} x every
    relevant pair — including multi-char pairs that arise after a
    first merge and the overlapping-run cases ('a a a', 'a b a b').
    One Spark job evaluates the fold for all (sequence, pair) combos."""
    from itertools import product

    from etl_portfolio_project_spark.operators.text import _bpe_fold_spark

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    pairs = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"),
             ("ab", "a"), ("ab", "ab"), ("a", "ab")]
    cases = []
    for n in range(1, 7):
        for seq in product("ab", repeat=n):
            for a, b in pairs:
                cases.append((list(seq), a, b))
    # multi-char-symbol inputs (post-first-merge vocab shapes)
    for seq in ([["ab", "a", "b"]], [["ab", "ab", "ab"]],
                [["a", "ab", "ab", "a"]]):
        for a, b in pairs:
            cases.append((seq[0], a, b))

    df = spark.createDataFrame(
        [(i, t, a, b) for i, (t, a, b) in enumerate(cases)],
        "id long, t array<string>, wa string, wb string",
    )
    got = {
        r.id: r.m
        for r in df.selectExpr("id", f"{_bpe_fold_spark()} AS m").collect()
    }
    for i, (t, a, b) in enumerate(cases):
        assert got[i] == merge_word(t, a, b), (t, a, b, got[i])


def test_pq_codes_literal_and_broadcast_paths_identical(spark):
    """embedding_pq_codes' two codebook carriages (plan literals below
    PQ_LITERAL_MAX, broadcast data row above) must produce the
    IDENTICAL table — same folds, same array_min tie-break."""
    lit_rows = sorted(
        map(tuple, S.embedding_pq_codes(spark, SF_SMALL).collect())
    )
    orig = S.PQ_LITERAL_MAX
    try:
        S.PQ_LITERAL_MAX = 0  # force the broadcast-array path
        arr_rows = sorted(
            map(tuple, S.embedding_pq_codes(spark, SF_SMALL).collect())
        )
    finally:
        S.PQ_LITERAL_MAX = orig
    assert lit_rows == arr_rows and len(lit_rows) > 0


def test_ivf_literal_and_broadcast_paths_identical(spark):
    """ann_ivf_topk's two centroid carriages (plan literals below
    IVF_LITERAL_MAX, broadcast data row above) must produce the
    IDENTICAL table — same folds, same array_sort tie-break (the
    embedding_pq_codes two-path contract, applied per r5 verdict #3)."""
    from etl_portfolio_project_spark import caches

    try:
        lit_rows = sorted(
            map(tuple, S.ann_ivf_topk(spark, SF_SMALL).collect())
        )
        orig = S.IVF_LITERAL_MAX
        try:
            S.IVF_LITERAL_MAX = 0  # force the broadcast-array path
            arr_rows = sorted(
                map(tuple, S.ann_ivf_topk(spark, SF_SMALL).collect())
            )
        finally:
            S.IVF_LITERAL_MAX = orig
        assert lit_rows == arr_rows and len(lit_rows) > 0
    finally:
        caches.release_all()


def test_query_subset_is_fixed_size_and_prefix_stable(spark):
    """The query/anchor/centroid sets must be FIXED-SIZE at any corpus
    size (r5 verdict #3: corpus-proportional sample sets are the last
    100 TB scale-killer): the id bound admits at most QUERY_CAP /
    IVF_CAP members no matter how many rows exist, and on a corpus
    that fits under the bound (every harness SF) it admits exactly the
    uncapped mod-sample — so harness results are bit-identical to the
    pre-cap forms."""
    n_big = 10 * S.QUERY_ID_BOUND  # simulate a 10x-beyond-bound corpus
    ids = list(range(n_big))
    q = [i for i in ids if i % S.QUERY_MOD == 0 and i < S.QUERY_ID_BOUND]
    assert len(q) == S.QUERY_CAP  # capped, not n_big / QUERY_MOD
    c = [
        i
        for i in ids
        if i % S.IVF_MOD == S.IVF_OFF and i < S.IVF_ID_BOUND
    ]
    assert len(c) == S.IVF_CAP
    # harness SFs sit under the bound → the cap is a no-op there
    n_harness = 2000  # sf0.1 embeddings row count
    assert n_harness <= S.QUERY_ID_BOUND and n_harness <= S.IVF_ID_BOUND


def test_embedding_covariance_stats_matches_numpy(spark):
    """Independent recompute: quantized per-pair sums and the derived
    covariance must equal a numpy re-derivation over the raw vectors."""
    import numpy as np

    rows = {
        (r.d1, r.d2): r
        for r in S.embedding_covariance_stats(spark, SF_SMALL).collect()
    }
    vecs = np.array(
        [
            [float(x) for x in r.embedding]
            for r in spark.read.parquet(
                f"{SF_SMALL}/embeddings.parquet"
            ).collect()
        ]
    )
    q = np.floor(vecs * S.COV_Q + 0.5).astype(np.int64)
    n, dim = q.shape
    assert len(rows) == dim * (dim + 1) // 2
    for d1, d2 in [(0, 0), (0, 1), (7, 23), (13, 13), (62, 63)]:
        r = rows[(d1, d2)]
        assert r.n_vecs == n
        assert r.q1_sum == int(q[:, d1].sum())
        assert r.q2_sum == int(q[:, d2].sum())
        assert r.qprod_sum == int((q[:, d1] * q[:, d2]).sum())
        exp_cov = (
            r.qprod_sum / n - (r.q1_sum / n) * (r.q2_sum / n)
        ) / (S.COV_Q * S.COV_Q)
        assert r.cov == exp_cov
    # sanity: diagonal entries are variances (non-negative)
    for d in range(dim):
        r = rows[(d, d)]
        assert r.cov >= -1e-12


def test_embedding_matryoshka_recall_matches_numpy(spark):
    """Independent recompute: full-dim and prefix-dim exact top-K
    overlap per query, with the operator's (cos desc, vec_id) ties."""
    import numpy as np

    got = {
        r.query_id: (r.n_overlap, r.recall_at_k)
        for r in S.embedding_matryoshka_recall(spark, SF_SMALL).collect()
    }
    recs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in recs])
    vecs = np.array([[float(x) for x in r.embedding] for r in recs])

    def topk(qi, d):
        v = vecs[:, :d]
        nr = v / np.linalg.norm(v, axis=1, keepdims=True)
        cos = nr @ nr[qi]
        cand = [
            (-cos[x], int(ids[x])) for x in range(len(ids)) if x != qi
        ]
        cand.sort()
        return {vid for _, vid in cand[: S.TOP_K]}

    qids = [
        i
        for i in range(len(ids))
        if ids[i] % S.QUERY_MOD == 0 and ids[i] < S.QUERY_ID_BOUND
    ]
    assert set(got) == {int(ids[i]) for i in qids}
    for qi in qids:
        full = topk(qi, vecs.shape[1])
        trunc = topk(qi, S.MRL_DIM)
        overlap = len(full & trunc)
        n_ov, rec = got[int(ids[qi])]
        assert n_ov == overlap and rec == overlap / S.TOP_K


def test_ann_ivfpq_matches_ivf_route_plus_adc(spark):
    """Composition check: IVF-PQ's result per query must equal
    'restrict ADC scoring to the IVF-probed cells' recomputed with
    numpy (cells by exact cosine argmax, codes by exact subspace
    argmin — the same rules the two graded sources implement)."""
    import numpy as np

    from etl_portfolio_project_spark import caches

    try:
        got = {
            (r.query_id, r.rank): (r.vec_id, r.adc_dist)
            for r in S.ann_ivfpq_topk(spark, SF_SMALL).collect()
        }
    finally:
        caches.release_all()
    recs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in recs])
    vecs = np.array([[float(x) for x in r.embedding] for r in recs])
    nr = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cent_mask = (ids % S.IVF_MOD == S.IVF_OFF) & (ids < S.IVF_ID_BOUND)
    cids, cvecs = ids[cent_mask], nr[cent_mask]
    sims = nr @ cvecs.T  # cosine to each cell centroid
    order = np.lexsort((cids[None, :].repeat(len(ids), 0), -sims), axis=1)
    assigned = cids[order[:, 0]]
    pq_mask = (ids % S.PQ_MOD == S.PQ_OFF) & (ids < S.PQ_ID_BOUND)
    pqids, pqvecs = ids[pq_mask], vecs[pq_mask]
    m_codes = []
    for m in range(S.PQ_M):
        sl = slice(m * S.PQ_SUB, (m + 1) * S.PQ_SUB)
        d = ((vecs[:, None, sl] - pqvecs[None, :, sl]) ** 2).sum(axis=2)
        o = np.lexsort((pqids[None, :].repeat(len(ids), 0), d), axis=1)
        m_codes.append(pqids[o[:, 0]])
    expected = {}
    for qi in range(len(ids)):
        if not (ids[qi] % S.QUERY_MOD == 0 and ids[qi] < S.QUERY_ID_BOUND):
            continue
        probed = set(cids[order[qi, : S.IVF_NPROBE]])
        lut = {}
        for m in range(S.PQ_M):
            sl = slice(m * S.PQ_SUB, (m + 1) * S.PQ_SUB)
            for ci, cid in enumerate(pqids):
                lut[(m, cid)] = float(
                    ((vecs[qi, sl] - pqvecs[ci, sl]) ** 2).sum()
                )
        cand = []
        for xi in range(len(ids)):
            if ids[xi] == ids[qi] or assigned[xi] not in probed:
                continue
            dist = sum(lut[(m, m_codes[m][xi])] for m in range(S.PQ_M))
            cand.append((dist, int(ids[xi])))
        cand.sort()
        for rank, (dist, vid) in enumerate(cand[: S.TOP_K], 1):
            expected[(int(ids[qi]), rank)] = vid
    assert {k: v[0] for k, v in got.items()} == expected


def test_kmeans_lloyd_loop_descends(spark):
    """Lloyd's convergence signature: across the counted iterations,
    quantized inertia is non-increasing and n_changed non-increasing;
    iteration 1 must equal an independent numpy Lloyd step from the
    label seed (same quantized order-free centroids, same (d2, label)
    ties)."""
    import numpy as np

    from etl_portfolio_project_spark import caches

    try:
        rows = sorted(
            S.kmeans_lloyd_loop(spark, SF_SMALL).collect(),
            key=lambda r: r.iter,
        )
    finally:
        caches.release_all()
    assert [r.iter for r in rows] == list(range(1, S.KM_ITERS + 1))
    for a, b in zip(rows, rows[1:]):
        assert b.inertia_q <= a.inertia_q
        assert b.n_changed <= a.n_changed
    for r in rows:
        assert r.inertia == r.inertia_q / S.KM_INERTIA_Q

    recs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in recs])
    order = np.argsort(ids)
    vecs = np.array([[float(x) for x in r.embedding] for r in recs])[order]
    labs = np.array([r.label for r in recs])[order]
    cents = {}
    for lb in np.unique(labs):
        m = vecs[labs == lb]
        # r10 quantized order-free centroid: int sums ÷ 1e6 ÷ n
        q = np.floor(m * S.CENTROID_Q + 0.5).astype(np.int64)
        cents[int(lb)] = (
            q.sum(axis=0).astype(np.float64) / S.CENTROID_Q
        ) / len(m)
    n_changed = 0
    inertia_q = 0
    for xi in range(len(ids)):
        best = min(
            (float(((vecs[xi] - c) ** 2).sum()), lb)
            for lb, c in sorted(cents.items())
        )
        d2, new_lb = best
        n_changed += int(new_lb != labs[xi])
        inertia_q += int(np.floor(d2 * S.KM_INERTIA_Q + 0.5))
    assert rows[0].n_changed == n_changed
    assert rows[0].inertia_q == inertia_q


def test_entity_resolution_threshold_gates_both_ways(spark):
    """The verify threshold must gate in BOTH directions on the
    synthesized noise rotation: single/double-typo and exact entries
    match their own source name with the designed edit distance; every
    first-word-drop entry stays UNMATCHED; no match exceeds the
    threshold; each entry resolves at most once."""
    from etl_portfolio_project_spark.operators import fuzzy as FZ

    rows = FZ.entity_resolution_parts(spark, SF_SMALL).collect()
    assert rows
    assert len({r.entry_id for r in rows}) == len(rows)  # top-1 per entry
    src = {
        r.p_partkey: r.p_name
        for r in spark.read.parquet(f"{SF_SMALL}/part.parquet").collect()
    }
    for r in rows:
        key = r.entry_id - FZ.ER_ID_OFFSET
        assert r.edit_distance <= FZ.ER_MAX_ED
        assert key % 4 != 2, "word-drop entry must stay unmatched"
        if key % 4 == 3:  # exact copies resolve at distance 0 to their name
            assert r.edit_distance == 0
            assert r.canonical_name == src[key]
    # independent recount of the unmatched class
    drop_keys = {
        k for k in src if k % 8 < FZ.ER_DIRTY_MOD and k % 4 == 2
    }
    matched_keys = {r.entry_id - FZ.ER_ID_OFFSET for r in rows}
    assert not (drop_keys & matched_keys) and drop_keys


# --- r7 additions ------------------------------------------------------------


def test_boilerplate_ngram_fraction_brute_force(spark):
    """Differential: recompute cross-doc 3-gram document frequencies
    and per-doc duplicated fractions with a Python Counter."""
    from collections import Counter

    from etl_portfolio_project_spark.operators import text as T

    docs = {
        r.doc_id: str(r.text).strip().split()
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    grams = {
        d: [" ".join(t[i:i + T.BOILER_N])
            for i in range(len(t) - T.BOILER_N + 1)]
        for d, t in docs.items()
    }
    df_docs = Counter(g for gs in grams.values() for g in set(gs))
    rows = X.boilerplate_ngram_fraction(spark, SF_SMALL).collect()
    assert {r.doc_id for r in rows} == {
        d for d, gs in grams.items() if gs
    }
    for r in rows:
        gs = grams[r.doc_id]
        dup = sum(1 for g in gs if df_docs[g] >= T.BOILER_DF)
        assert r.n_grams == len(gs)
        assert r.n_dup_grams == dup
        assert r.dup_frac == dup / len(gs)
        assert r.boiler_flag == (dup * T.BOILER_FLAG_MUL > len(gs))
    # the signal must actually fire at harness SFs
    assert any(r.n_dup_grams > 0 for r in rows)


def test_mojibake_audit_counts_planted_artifacts(spark):
    """The corpus is clean ASCII, so every artifact found must come
    from the planted corrupted copies — recompute the per-source
    totals from the plant rule directly."""
    from collections import defaultdict

    from etl_portfolio_project_spark.operators import text as T

    base = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    exp = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, flag, repl, l1, w1252
    for r in base:
        exp[r.source][0] += 1
        if r.doc_id % T.MOJI_PLANT_MOD == 3:
            exp[r.source][0] += 1  # the planted copy
            exp[r.source][1] += 1  # it is flagged
            exp[r.source][2] += 1  # one replacement char
            exp[r.source][3] += 1  # one 'Ã©'
            exp[r.source][4] += r.doc_id % 3  # repeated 'â€™'
    rows = X.mojibake_encoding_audit(spark, SF_SMALL).collect()
    assert {r.source for r in rows} == set(exp)
    for r in rows:
        docs, flag, repl, l1, w12 = exp[r.source]
        assert (r.n_docs, r.n_flagged) == (docs, flag)
        assert (r.repl_total, r.latin1_total, r.win1252_total) == (
            repl, l1, w12,
        )
        assert r.clean_ratio == (docs - flag) / docs
    assert any(r.n_flagged > 0 for r in rows)  # positive path exercised


def test_source_lexical_stats_brute_force(spark):
    from collections import Counter, defaultdict

    per_source = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("source", "text")
        .collect()
    ):
        toks = str(r.text).strip().split()
        per_source[r.source].extend(toks if toks else [""])
    rows = X.source_lexical_stats(spark, SF_SMALL).collect()
    assert {r.source for r in rows} == set(per_source)
    for r in rows:
        cnt = Counter(per_source[r.source])
        n_tokens = sum(cnt.values())
        hapax = sum(1 for v in cnt.values() if v == 1)
        char_sum = sum(len(w) * v for w, v in cnt.items())
        assert r.n_types == len(cnt)
        assert r.n_tokens == n_tokens
        assert r.n_hapax == hapax
        assert r.char_sum == char_sum
        assert r.ttr == len(cnt) / n_tokens
        assert r.hapax_ratio == hapax / len(cnt)
        assert r.mean_word_len == char_sum / n_tokens


def test_multivector_maxsim_matches_numpy(spark):
    """Differential: numpy MaxSim (sum over query sub-vectors of the
    best sub-cosine) reproduces the top-k sets and ranks; scores match
    to float tolerance (numpy's dot order differs from the engines'
    shared left-to-right fold, so bitwise equality is not expected
    here — the ORACLE check covers bit-exactness)."""
    import math

    import numpy as np

    from etl_portfolio_project_spark.operators import similarity as S

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    sub = S.PQ_SUB

    def subs(v):
        return [v[m * sub:(m + 1) * sub] for m in range(S.MAXSIM_M)]

    def maxsim(q, d):
        qs, ds = subs(q), subs(d)
        return sum(
            max(
                float(np.dot(a, b))
                / (math.sqrt(float(np.dot(a, a)))
                   * math.sqrt(float(np.dot(b, b))))
                for b in ds
            )
            for a in qs
        )

    rows = S.multivector_maxsim_topk(spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    qids = [
        v for v in vecs
        if v % S.QUERY_MOD == 0 and v < S.QUERY_ID_BOUND
    ]
    assert set(by_q) == set(qids)
    for qid in qids:
        scored = sorted(
            ((maxsim(vecs[qid], v), vid) for vid, v in vecs.items()
             if vid != qid),
            key=lambda t: (-t[0], t[1]),
        )[: S.TOP_K]
        got = sorted(by_q[qid], key=lambda r: r.rank)
        assert [r.vec_id for r in got] == [vid for _, vid in scored]
        for r, (s, _) in zip(got, scored):
            assert math.isclose(r.maxsim, s, rel_tol=1e-12)


def test_ann_maxsim_rescored_matches_numpy(spark):
    """Differential for the IVF-routed MaxSim rescorer: an independent
    numpy pipeline reproduces the routing (argmax centroid cosine,
    ties -> smaller cid; NPROBE nearest lists per query) and the
    candidate-only MaxSim top-k sets/ranks; scores to float tolerance
    (the ORACLE check covers bit-exactness)."""
    import math

    import numpy as np

    from etl_portfolio_project_spark.operators import similarity as S

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    cents = {
        vid: v for vid, v in vecs.items()
        if vid % S.IVF_MOD == S.IVF_OFF and vid < S.IVF_ID_BOUND
    }

    def cos(a, b):
        return float(np.dot(a, b)) / (
            math.sqrt(float(np.dot(a, a)))
            * math.sqrt(float(np.dot(b, b)))
        )

    def nearest_lists(v, n):
        return [
            cid for _, cid in sorted(
                ((-cos(v, c), cid) for cid, c in cents.items())
            )[:n]
        ]

    assigned = {vid: nearest_lists(v, 1)[0] for vid, v in vecs.items()}
    sub = S.PQ_SUB

    def subs(v):
        return [v[m * sub:(m + 1) * sub] for m in range(S.MAXSIM_M)]

    def maxsim(q, d):
        qs, ds = subs(q), subs(d)
        return sum(
            max(
                float(np.dot(a, b))
                / (math.sqrt(float(np.dot(a, a)))
                   * math.sqrt(float(np.dot(b, b))))
                for b in ds
            )
            for a in qs
        )

    rows = S.ann_maxsim_rescored_topk(spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    qids = [
        v for v in vecs
        if v % S.QUERY_MOD == 0 and v < S.QUERY_ID_BOUND
    ]
    assert set(by_q) <= set(qids)
    for qid in qids:
        probe = set(nearest_lists(vecs[qid], S.IVF_NPROBE))
        cand = [
            vid for vid, lst in assigned.items()
            if lst in probe and vid != qid
        ]
        scored = sorted(
            ((maxsim(vecs[qid], vecs[vid]), vid) for vid in cand),
            key=lambda t: (-t[0], t[1]),
        )[: S.TOP_K]
        got = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert [r.vec_id for r in got] == [vid for _, vid in scored]
        for r, (s, _) in zip(got, scored):
            assert math.isclose(r.maxsim, s, rel_tol=1e-12)


def test_bpe_apply_encode_matches_python_bpe(spark):
    """Differential: train 3 BPE merges with an independent Python
    implementation (greedy left-to-right application, argmax pair with
    lexicographic tie-break) and re-encode every doc."""
    from collections import Counter

    from etl_portfolio_project_spark.operators import text as T

    docs = {
        (r.doc_id, r.source): [
            w for w in str(r.text).strip().split() if len(w) >= 1
        ]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    }
    word_counts = Counter(w for t in docs.values() for w in t)
    enc = {w: list(w) + [T.BPE_EOW] for w in word_counts}

    def merge(seq, wa, wb):
        out = []
        for s in seq:
            if out and out[-1] == wa and s == wb:
                out[-1] = wa + wb
            else:
                out.append(s)
        return out

    for _ in range(T.BPE_MERGE_STEPS):
        pairs = Counter()
        for w, n in word_counts.items():
            t = enc[w]
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] += n
        (wa, wb), _n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        enc = {w: merge(t, wa, wb) for w, t in enc.items()}

    rows = X.bpe_apply_encode(spark, SF_SMALL).collect()
    assert {(r.doc_id, r.source) for r in rows} == {
        k for k, t in docs.items() if t
    }
    for r in rows:
        toks = docs[(r.doc_id, r.source)]
        raw = sum(len(w) + 1 for w in toks)
        bpe = sum(len(enc[w]) for w in toks)
        assert r.n_words == len(toks)
        assert r.n_symbols_raw == raw
        assert r.n_tokens_bpe == bpe
        assert r.compression == raw / bpe
        assert r.n_tokens_bpe < r.n_symbols_raw  # the merges bought length


def test_bpe_apply_consistent_with_merge_loop(spark):
    """Cross-operator invariant: the corpus-weighted encoded length
    implied by bpe_apply_encode must equal bpe_merge_loop's final
    n_symbols_after — the two ops share one learning chain, so a
    drifted merge table or fold would break this identity."""
    from pyspark.sql import functions as F

    loop = {r.step: r for r in X.bpe_merge_loop(spark, SF_SMALL).collect()}
    total_from_apply = (
        X.bpe_apply_encode(spark, SF_SMALL)
        .agg(F.sum("n_tokens_bpe").alias("t"))
        .collect()[0]["t"]
    )
    assert total_from_apply == loop[X.BPE_MERGE_STEPS].n_symbols_after


def test_shared_index_keys_isolate_sf_dirs(spark):
    """The shared tier memoizes per (index, sf_dir): verifying sf0.001
    then building at another SF must NOT probe the first SF's index —
    AND (ADVICE r7) must not accumulate both SFs' persisted indexes:
    inserting an index scoped to a new sf_dir evicts the other SF's
    entries, bounding residency to one SF at a time."""
    from etl_portfolio_project_spark import caches
    from etl_portfolio_project_spark.operators import similarity as S

    caches.release_shared_all()
    small = S.ann_ivf_topk(spark, SF_SMALL).count()
    n1 = caches.shared_live_count()
    assert n1 >= 1 and all(SF_SMALL in k for k in caches._SHARED)
    bigger = S.ann_ivf_topk(spark, "/root/testdata/sf0.01").count()
    assert small > 0 and bigger > 0
    keys = set(caches._SHARED)
    assert any("/root/testdata/sf0.01" in k for k in keys)
    # one-scope residency: the sf0.001 entries were evicted on insert
    assert not any(SF_SMALL in k for k in keys)
    assert caches.shared_live_count() <= n1
    caches.release_all()
    caches.release_shared_all()


def test_bitext_margin_mining_matches_python(spark):
    """Differential: forward/backward top-k neighborhoods, rank-order
    mean folds, and the ratio margin recomputed in plain Python with
    the engine's exact left-to-right float fold order."""
    from etl_portfolio_project_spark.operators import similarity as S

    rows = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {}
    for r in rows:
        v = r.embedding
        if v is None or len(v) != S.DIM or any(x is None for x in v):
            continue
        vecs[r.vec_id] = ([float(x) for x in v], r.label)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    norm = {i: math.sqrt(dot(v, v)) for i, (v, _) in vecs.items()}
    a_ids = sorted(i for i, (_, l) in vecs.items() if l % 2 == 0)
    b_ids = sorted(i for i, (_, l) in vecs.items() if l % 2 == 1)
    q_ids = [
        i for i in a_ids
        if i % S.QUERY_MOD == 0 and i < S.QUERY_ID_BOUND
    ]

    def topk(qid, cand_ids):
        qv, qn = vecs[qid][0], norm[qid]
        scored = [
            (dot(qv, vecs[c][0]) / (qn * norm[c]), c) for c in cand_ids
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        return scored[: S.MARGIN_K]

    fwd = {q: topk(q, b_ids) for q in q_ids}

    def rank_avg(lst):
        acc = 0.0
        for cos, _ in lst:
            acc = acc + cos
        return acc / float(len(lst))

    fwd_avg = {q: rank_avg(l) for q, l in fwd.items()}
    cands = sorted({c for l in fwd.values() for _, c in l})
    bwd_avg = {c: rank_avg(topk(c, a_ids)) for c in cands}

    exp = {}
    for q, l in fwd.items():
        best = min(
            l,
            key=lambda t: (
                -(t[0] / ((fwd_avg[q] + bwd_avg[t[1]]) / 2.0)),
                t[1],
            ),
        )
        margin = best[0] / ((fwd_avg[q] + bwd_avg[best[1]]) / 2.0)
        exp[q] = (best[1], best[0], margin)

    got = {
        r.query_id: (r.best_id, r.cosine, r.margin, r.mined)
        for r in S.bitext_margin_mining(spark, SF_SMALL).collect()
    }
    from etl_portfolio_project_spark import caches

    caches.release_all()
    assert set(got) == set(exp)
    for q, (bid, cos, margin) in exp.items():
        gbid, gcos, gmargin, gmined = got[q]
        assert (gbid, gcos, gmargin) == (bid, cos, margin)
        assert gmined == (
            margin * S.MARGIN_TAU_DEN > float(S.MARGIN_TAU_NUM)
        )


def test_retrieval_quality_eval_matches_python(spark):
    """Differential: MRR/precision/recall recomputed in plain Python
    from an independently-derived exact ranking."""
    import math

    from etl_portfolio_project_spark.operators import similarity as S

    rows = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    vecs = {r.vec_id: ([float(x) for x in r.embedding], r.label)
            for r in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    norm = {i: math.sqrt(dot(v, v)) for i, (v, _) in vecs.items()}
    q_ids = [i for i in vecs
             if i % S.QUERY_MOD == 0 and i < S.QUERY_ID_BOUND]
    from collections import Counter

    lbl_n = Counter(l for _, l in vecs.values())
    exp = {}
    for q in q_ids:
        qv, qn, ql = vecs[q][0], norm[q], vecs[q][1]
        scored = sorted(
            ((dot(qv, vecs[c][0]) / (qn * norm[c]), c)
             for c in vecs if c != q),
            key=lambda t: (-t[0], t[1]),
        )[: S.TOP_K]
        rel = [i + 1 for i, (_, c) in enumerate(scored)
               if vecs[c][1] == ql]
        frr = rel[0] if rel else 0
        exp[q] = (
            ql, len(rel), frr,
            0.0 if frr == 0 else 1.0 / float(frr),
            len(rel) / float(S.TOP_K),
            lbl_n[ql] - 1,
            0.0 if lbl_n[ql] - 1 == 0
            else len(rel) / float(lbl_n[ql] - 1),
        )

    got = {
        r.query_id: (
            r.label, r.n_rel_topk, r.first_rel_rank, r.mrr_at_k,
            r.precision_at_k, r.n_rel_total, r.recall_at_k,
        )
        for r in S.retrieval_quality_eval(spark, SF_SMALL).collect()
    }
    assert got == exp


def test_multimodal_malformed_audit_quarantines_every_class(spark):
    """Every planted corruption class must surface with its precise
    status and NULL features; surviving decodes must match the clean
    bmp_decode geometry (same width/sum_r for shared docs). The load-
    bearing property: no payload crashes a worker — the query
    completing at all proves the guarded routing."""
    from etl_portfolio_project_spark.operators import multimodal as MM

    rows = {
        r.doc_id: r
        for r in MM.multimodal_malformed_audit(spark, SF_SMALL).collect()
    }
    expected = {
        MM.MM_MAL_EMPTY: "empty",
        MM.MM_MAL_HDR: "truncated_header",
        MM.MM_MAL_MAGIC: "bad_magic",
        MM.MM_MAL_PIX: "truncated_pixels",
    }
    seen = set()
    for did, r in rows.items():
        want = expected.get(did % MM.MM_MAL_MOD, "ok")
        assert r.status == want, (did, r)
        if want == "ok":
            assert r.width == 16 + did % 8 and r.height == MM.BMP_H
            assert r.sum_r is not None
        else:
            assert (r.width, r.height, r.sum_r) == (None, None, None)
            seen.add(want)
    assert seen == set(expected.values())  # every class actually planted
    clean = {
        r.doc_id: r
        for r in MM.multimodal_bmp_decode(spark, SF_SMALL).collect()
    }
    for did, r in rows.items():
        if r.status == "ok":
            assert (clean[did].width, clean[did].sum_r) == (
                r.width, r.sum_r,
            ), did
