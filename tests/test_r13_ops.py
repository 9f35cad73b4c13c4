"""Property/differential tests for the r13 operators, independent of
the DuckDB oracles: a pure-Python interval-union reference for the
exact-substring rewrite, and a Python recomputation of the v2 release
rollup from its two graded inputs (persisted v1 manifest + line-dedup
rewrite)."""

from __future__ import annotations

import hashlib

from etl_portfolio_project_spark.operators import curation as CU
from etl_portfolio_project_spark.operators import dedup as D
from etl_portfolio_project_spark.operators import text as T
from etl_portfolio_project_spark.sources.registry import load_table

from .conftest import SF_SMALL


def _hm_py(doc_id, text) -> int:
    """Python twin of curation._manifest_hm_of (md5-60 recipe)."""
    s = f"{doc_id}:{'<NULL>' if text is None else text}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % CU.FP_MOD


def test_exact_substring_rewrite_matches_python_reference(spark):
    """Recompute the whole deletion step in plain Python from the
    graded spans output: per doc, removed positions are the union of
    its id2-side [start2, start2+span_tokens-1] intervals; kept
    tokens re-joined in order are the cleaned text. Pins the
    generated HOF mask exactly (not just structurally)."""
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    spans = D.exact_substring_spans(spark, SF_SMALL).collect()
    removed: dict[int, set[int]] = {}
    for s in spans:
        pos = removed.setdefault(s.id2, set())
        pos.update(range(s.start2, s.start2 + s.span_tokens))
    out = {
        r.doc_id: r
        for r in D.exact_substring_rewrite(spark, SF_SMALL).collect()
    }
    assert set(out) == set(docs)
    for did, text in docs.items():
        r = out[did]
        if text is None:
            assert r.n_tokens == 0 and r.n_removed == 0
            assert r.cleaned_text is None and r.cleaned_chars is None
            continue
        toks = text.strip().lower().split()
        toks = toks if toks else [""]
        gone = removed.get(did, set())
        kept = [t for i, t in enumerate(toks, start=1) if i not in gone]
        assert r.n_tokens == len(toks), (did, r)
        assert r.n_removed == len(toks) - len(kept), (did, r)
        assert r.cleaned_text == " ".join(kept), (did, r)
        assert r.cleaned_chars == len(r.cleaned_text)


def test_exact_substring_rewrite_keep_first_policy(spark):
    """Every span's id1 (earlier-doc) occurrence survives: the id1
    doc never loses positions that only appear as a span's start1
    side — deletion is strictly id2-side, so at least one copy of
    every duplicated run remains in the corpus."""
    spans = D.exact_substring_spans(spark, SF_SMALL).collect()
    id2_removed: dict[int, set[int]] = {}
    for s in spans:
        id2_removed.setdefault(s.id2, set()).update(
            range(s.start2, s.start2 + s.span_tokens)
        )
    out = {
        r.doc_id: r
        for r in D.exact_substring_rewrite(spark, SF_SMALL).collect()
    }
    # removal accounting matches the id2-side union exactly; docs
    # never appearing as id2 are untouched
    for did, r in out.items():
        assert r.n_removed == len(id2_removed.get(did, set())), (did, r)


def test_exact_substring_rewrite_planted_duplicate(spark, tmp_path):
    """End-to-end on a synthetic corpus with a PLANTED shared run:
    doc 1 and doc 2 share an exact 12-token run (≥ ES_K +
    ES_MIN_GRAMS − 1 = 10 tokens, so the span machinery must find
    it); doc 3 is unrelated. Keep-first: doc 1 (lower id) keeps its
    copy verbatim, doc 2 loses exactly the planted tokens, doc 3 is
    untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = " ".join(f"dup{i}" for i in range(12))
    docs = {
        1: f"alpha beta {shared} gamma",
        2: f"omega {shared} psi chi",
        3: "unrelated words only here " * 3,
    }
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["src0"] * 3, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in docs.values()], pa.int64()
                ),
            }
        ),
        sf / "documents.parquet",
    )
    out = {
        r.doc_id: r
        for r in D.exact_substring_rewrite(spark, str(sf)).collect()
    }
    assert out[1].n_removed == 0
    assert out[1].cleaned_text == docs[1].lower()
    assert out[2].n_removed == 12
    assert out[2].cleaned_text == "omega psi chi"
    assert out[3].n_removed == 0
    assert out[3].cleaned_text == docs[3].strip().lower()


def test_line_dedup_rewrite_shuffle_fallback_matches_broadcast(
    spark, monkeypatch
):
    """The ADVICE r12 size gate's FALLBACK path (hot set above
    LINE_HOT_BROADCAST_MAX → plain shuffle hash join) must be
    value-identical to the graded broadcast path — exercised here by
    forcing the ceiling to 0, since harness corpora never trip it."""
    base = sorted(
        T.line_dedup_rewrite(spark, SF_SMALL).collect(),
        key=lambda r: r.doc_id,
    )
    monkeypatch.setattr(T, "LINE_HOT_BROADCAST_MAX", 0)
    fb = sorted(
        T.line_dedup_rewrite(spark, SF_SMALL).collect(),
        key=lambda r: r.doc_id,
    )
    assert fb == base


def test_persisted_v1_release_memo_invalidates_on_source_change(
    spark, tmp_path, monkeypatch
):
    """The ADVICE r12 fingerprint: regenerating testdata under sf_dir
    mid-process must invalidate the persisted v1 artifact (a stale
    reuse would silently diverge from the inline-recomputing oracle).
    Simulated on a private copy of sf0.001 by bumping the source
    parquet's mtime."""
    import os
    import shutil

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("documents",):
        shutil.copyfile(
            f"{SF_SMALL}/{t}.parquet", sf / f"{t}.parquet"
        )
    CU.persisted_v1_release(spark, str(sf)).count()
    key1 = [k for k in CU._V1_RELEASE_PATHS if k.startswith(str(sf))]
    assert len(key1) == 1
    path1 = CU._V1_RELEASE_PATHS[key1[0]]
    # unchanged source → same artifact (memo hit)
    CU.persisted_v1_release(spark, str(sf)).count()
    assert CU._V1_RELEASE_PATHS[key1[0]] == path1
    # bump the source mtime → new memo key, artifact rebuilt
    p = sf / "documents.parquet"
    st = os.stat(p)
    os.utime(p, (st.st_atime + 5, st.st_mtime + 5))
    CU.persisted_v1_release(spark, str(sf)).count()
    key2 = [k for k in CU._V1_RELEASE_PATHS if k.startswith(str(sf))]
    assert sorted(key2) != sorted(key1) or CU._V1_RELEASE_PATHS[
        key2[0]
    ] != path1


def test_release_pipeline_v2_matches_python_rollup(spark):
    """Recompute the v2 release table in Python from its two graded
    inputs and require exact equality — partition counts, char
    totals, both fingerprints, and the status rule."""
    v1 = CU.persisted_v1_release(spark, SF_SMALL).collect()
    rw = {
        r.doc_id: r for r in T.line_dedup_rewrite(spark, SF_SMALL).collect()
    }
    got = {
        (r.split, r.lang, r.source): r
        for r in CU.corpus_release_pipeline_v2(spark, SF_SMALL).collect()
    }
    agg: dict[tuple, dict] = {}
    for row in v1:
        w = rw[row.doc_id]
        a = agg.setdefault(
            (row.split, row.lang, row.source),
            {
                "n_docs": 0,
                "n_rewritten": 0,
                "chars_v1": 0,
                "chars_v2": 0,
                "fp1": 0,
                "fp2": 0,
            },
        )
        a["n_docs"] += 1
        a["n_rewritten"] += 1 if w.n_removed > 0 else 0
        a["chars_v1"] += row.n_chars
        a["chars_v2"] += w.cleaned_chars
        a["fp1"] += row.hm
        a["fp2"] += _hm_py(row.doc_id, w.cleaned_text)
    assert set(got) == set(agg)
    for k, a in agg.items():
        r = got[k]
        assert r.n_docs == a["n_docs"], (k, r)
        assert r.n_rewritten == a["n_rewritten"], (k, r)
        assert r.chars_v1 == a["chars_v1"], (k, r)
        assert r.chars_v2 == a["chars_v2"], (k, r)
        assert r.content_fp_v1 == a["fp1"] % CU.FP_MOD, (k, r)
        assert r.content_fp_v2 == a["fp2"] % CU.FP_MOD, (k, r)
        assert r.status == (
            "rewritten" if r.content_fp_v1 != r.content_fp_v2 else "unchanged"
        )
