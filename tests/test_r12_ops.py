"""Property/differential tests for the r12 operators, independent of
the DuckDB oracles (which share SQL-dialect blind spots with the
builders by construction): a pure-Python reference for the unigram-EM
DP, structural invariants for the line-dedup rewrite, and
arrival-order invariants for the streaming embedding index."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_portfolio_project_spark.operators import similarity as S
from etl_portfolio_project_spark.operators import text as T
from etl_portfolio_project_spark.sources.registry import load_table

from .conftest import SF_SMALL


def test_line_dedup_rewrite_structural_invariants(spark):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    out = {r.doc_id: r for r in T.line_dedup_rewrite(spark, SF_SMALL).collect()}
    assert set(out) == set(docs)
    k = T.LINE_SEG_TOKENS
    for did, text in docs.items():
        r = out[did]
        if text is None:
            # NULL-text docs pass through explicitly, never dropped
            assert r.n_segs == 0 and r.n_removed == 0
            assert r.cleaned_text is None and r.cleaned_chars is None
            continue
        toks = text.strip().lower().split()
        toks = toks if toks else [""]
        n_segs = math.ceil(len(toks) / k)
        assert r.n_segs == n_segs, (did, r)
        assert 0 <= r.n_removed <= r.n_segs
        # the cleaned text is a subsequence of the original segments,
        # in order, with removed segments deleted whole
        segs = [
            " ".join(toks[i * k : (i + 1) * k]) for i in range(n_segs)
        ]
        # reconstructable: kept tokens regrouped must match some
        # subset of segs in order
        joined = r.cleaned_text
        probe = []
        for s in segs:
            if joined.startswith(s) and (
                len(joined) == len(s) or joined[len(s)] == " "
            ):
                probe.append(s)
                joined = joined[len(s) :].lstrip()
        assert joined == "", (did, r.cleaned_text, segs)
        assert len(probe) == r.n_segs - r.n_removed, (did, r)
        assert r.cleaned_chars == len(r.cleaned_text)
        assert (r.n_removed == r.n_segs) == (r.cleaned_text == "")


def test_unigram_em_matches_python_reference(spark):
    """Recompute the whole E->M round in plain Python — vocabulary,
    DP segmentation (fewest pieces, then greatest count sum, then
    smallest width), backtrack, weighted recount — and require the
    operator's c_em to match exactly. Pins the generated Spark fold
    AND (via oracle parity elsewhere) the recursive-CTE backtrack
    that works around the DuckDB 1.0 list_reduce row-crossing bug."""
    words = {
        r.word: r.n_w
        for r in T._bpe_words_spark(
            load_table(spark, SF_SMALL, "documents")
        ).collect()
    }
    out = {r.piece: r for r in T.unigram_lm_em_step(spark, SF_SMALL).collect()}
    # python reference vocabulary: keep=true multi-char pieces come
    # from the operator's own prune output (graded elsewhere); chars
    # recomputed independently
    prune = {
        r.piece: r
        for r in T.unigram_lm_piece_prune(spark, SF_SMALL).collect()
    }
    vocab: dict[str, int] = {}
    for p, r in prune.items():
        if r.keep and len(p) >= 2:
            vocab[p] = r.n_occ
    # independent char counts (every char of every word is a vocab
    # key; the loop below inserts them all with their true counts)
    chars: dict[str, int] = {}
    for w, n in words.items():
        for ch in w:
            chars[ch] = chars.get(ch, 0) + n
    for ch, c in chars.items():
        vocab[ch] = c
    assert set(out) == set(vocab)
    for p, r in out.items():
        assert r.c_seed == vocab[p], (p, r.c_seed, vocab[p])

    def segment(word: str) -> list[str]:
        dp = [(0, 0, 0)]
        for i in range(1, len(word) + 1):
            best = None
            for kk in range(1, min(T.ULM_MAXP, i) + 1):
                piece = word[i - kk : i]
                if piece not in vocab:
                    continue
                m, neg, _ = dp[i - kk]
                cand = (m + 1, neg - vocab[piece], kk)
                if best is None or cand < best:
                    best = cand
            dp.append(best)
        pieces, pos = [], len(word)
        while pos > 0:
            kk = dp[pos][2]
            pieces.append(word[pos - kk : pos])
            pos -= kk
        return pieces

    c_em: dict[str, int] = {}
    for w, n in words.items():
        for p in segment(w):
            c_em[p] = c_em.get(p, 0) + n
    for p, r in out.items():
        assert r.c_em == c_em.get(p, 0), (p, r.c_em, c_em.get(p, 0))
        assert r.used == (r.c_em > 0)


def test_stream_embedding_index_arrival_order_invariants(spark):
    vecs = {
        r.vec_id: r
        for r in S.stream_embedding_index_ingest(spark, SF_SMALL).collect()
    }
    src = {
        r.vec_id: r.embedding
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    assert set(vecs) == set(src)  # every vector decided exactly once
    for vid, r in vecs.items():
        assert r.batch_id == vid % S.SE_NBATCH
        emb = src[vid]
        valid = (
            emb is not None
            and len(emb) == S.DIM
            and all(x is not None for x in emb)
        )
        assert r.is_valid == valid, (vid, r)
        if not valid:
            assert r.n_candidates == 0 and not r.is_novel
            assert r.nearest_id is None
            continue
        assert 0 <= r.n_sim <= r.n_candidates
        assert r.is_novel == (r.n_sim == 0)
        if r.batch_id == 0:
            # the index is empty when batch 0 arrives
            assert r.n_candidates == 0 and r.is_novel
        if r.nearest_id is not None:
            # neighbors only ever come from STRICTLY earlier batches
            assert vecs[r.nearest_id].batch_id < r.batch_id
            assert vecs[r.nearest_id].is_valid
