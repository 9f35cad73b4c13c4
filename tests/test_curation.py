"""Property tests for the r9 curation family (operators/curation.py).

Oracle differentials are covered by tools/verify_local.py; these tests
pin the SEMANTIC properties each operator exists to provide —
re-identification flags, pair distinctness, sweep monotonicity,
order-free fingerprints, quota caps, and mask determinism — against
independent Python re-implementations where the property is
computable.
"""

from __future__ import annotations

import hashlib

from etl_portfolio_project_spark.operators import curation as CU

from .conftest import SF_SMALL


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_k_anonymity_flags_and_totals(spark):
    rows = CU.k_anonymity_audit(spark, SF_SMALL).collect()
    n_customers = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert sum(r.k for r in rows) == n_customers
    for r in rows:
        assert r.k >= 1
        assert r.at_risk == (r.k < CU.K_ANON)


def test_preference_pairs_distinct_and_ordered(spark):
    rows = CU.preference_pair_mining(spark, SF_SMALL).collect()
    assert rows, "harness corpus must yield at least one group"
    for r in rows:
        assert r.n_docs >= 2
        # the (q, -id) struct tie-breaks guarantee distinct docs even
        # when every score in the group is identical
        assert r.chosen_id != r.rejected_id
        assert r.chosen_score >= r.rejected_score
        assert r.margin == r.chosen_score - r.rejected_score


def test_threshold_sweep_monotone(spark):
    rows = {
        (r.min_tokens, r.min_distinct_pct): r
        for r in CU.filter_threshold_sweep(spark, SF_SMALL).collect()
    }
    assert set(rows) == set(CU.SWEEP_GRID)
    # tightening either threshold can only shrink survival
    for mt, dp in CU.SWEEP_GRID:
        r = rows[(mt, dp)]
        assert 0 <= r.n_surviving <= r.n_total
        assert 0 <= r.retained_tokens <= r.total_tokens
        for mt2, dp2 in CU.SWEEP_GRID:
            if mt2 >= mt and dp2 >= dp:
                assert rows[(mt2, dp2)].n_surviving <= r.n_surviving
                assert rows[(mt2, dp2)].retained_tokens <= r.retained_tokens


def test_release_manifest_fingerprint_is_order_free(spark):
    """The content fingerprint must be a pure function of the row SET
    — recomputing it from a reversed-order pandas copy matches."""
    out = {
        (r.lang, r.source): r
        for r in CU.dataset_release_manifest(spark, SF_SMALL).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("lang", "source", "doc_id", "text")
        .collect()
    )
    expect: dict[tuple, int] = {}
    for r in reversed(docs):  # reversed: order independence
        t = "<NULL>" if r.text is None else r.text
        h = _h60(f"{r.doc_id}:{t}") % CU.FP_MOD
        k = (r.lang, r.source)
        expect[k] = (expect.get(k, 0) + h) % CU.FP_MOD
    assert {k: r.content_fp for k, r in out.items()} == expect


def test_domain_quota_cap_and_membership(spark):
    out = {r.domain: r for r in CU.domain_quota_sample(spark, SF_SMALL).collect()}
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    )
    by_domain: dict[str, list[int]] = {}
    for r in docs:
        dom = (
            "unsourced.example.com"
            if r.source is None
            else f"{r.source}.example.com"
        )
        by_domain.setdefault(dom, []).append(r.doc_id)
    assert set(out) == set(by_domain)
    for dom, ids in by_domain.items():
        r = out[dom]
        assert r.n_docs == len(ids)
        assert r.n_kept == min(len(ids), CU.DOMAIN_QUOTA_CAP)
        hashed = sorted(
            (_h60(f"{CU.QUOTA_SALT}{i}"), i) for i in ids
        )[: CU.DOMAIN_QUOTA_CAP]
        fp = sum(h % CU.FP_MOD for h, _ in hashed) % CU.FP_MOD
        assert r.kept_fp == fp, dom


def test_span_masks_match_python(spark):
    """Independent re-implementation of the span selection rule —
    exact n_masked/n_spans/fingerprint per doc."""
    out = {r.doc_id: r for r in CU.span_corruption_masks(spark, SF_SMALL).collect()}
    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    for r in docs:
        got = out[r.doc_id]
        if r.text is None or r.text.strip() == "":
            assert got.status == "no_text" and got.mask_fp == -1
            continue
        toks = r.text.strip().split()
        ms = [
            p
            for p in range(len(toks))
            if _h60(f"{CU.SPAN_SALT}{r.doc_id}:{p // CU.SPAN_W}")
            % CU.SPAN_MOD
            < CU.SPAN_HIT
        ]
        assert got.status == "masked"
        assert got.n_tokens == len(toks)
        assert got.n_masked == len(ms)
        assert got.n_spans == len({p // CU.SPAN_W for p in ms})
        assert got.mask_fp == _h60(",".join(str(p) for p in ms))


def test_span_mask_rate_targets_density(spark):
    """Aggregate masking rate should track SPAN_HIT/SPAN_MOD = 15%
    (deterministic hash ≈ uniform) — a rule regression that masks the
    wrong granularity (token-level vs span-level) shifts this."""
    rows = [
        r
        for r in CU.span_corruption_masks(spark, SF_SMALL).collect()
        if r.status == "masked"
    ]
    total = sum(r.n_tokens for r in rows)
    masked = sum(r.n_masked for r in rows)
    rate = masked / total
    assert 0.10 < rate < 0.20, rate
