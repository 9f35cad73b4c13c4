"""Property test for the prefix-filter completeness guarantee.

`operators/dedup._prefix_filtered_jaccard_pairs` prunes candidate
generation to each doc's (n − ⌈τ·n⌉ + 1) globally-rarest items and
RELIES on the SSJoin/PPJoin prefix-filter theorem: any pair with
J ≥ τ shares at least one prefix item. An off-by-one in the prefix
length (or a wrong ceil) silently DROPS true pairs — values would
still "look right" on data without boundary cases, so this is
exactly the kind of bug a differential test can miss and a property
test catches.

The property is checked on a pure-Python mirror of the same
selection rule (same global order: ascending df, ties by item; same
integer-exact prefix length) over hypothesis-generated universes.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

TAU_NUM, TAU_DEN = 9, 10  # τ = 0.9, as in dedup.JACCARD_TAU


def _prefix(items: frozenset[int], dfreq: Counter, tau_num: int, tau_den: int):
    n = len(items)
    # ceil(tau*n) in exact integer arithmetic — mirrors the Spark expr
    p = n - (tau_num * n + tau_num) // tau_den + 1
    ranked = sorted(items, key=lambda t: (dfreq[t], t))
    return set(ranked[:p])


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.frozensets(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
        min_size=2,
        max_size=12,
    )
)
def test_high_jaccard_pairs_always_share_a_prefix_item(docs):
    dfreq: Counter = Counter()
    for d in docs:
        dfreq.update(d)
    prefixes = [_prefix(d, dfreq, TAU_NUM, TAU_DEN) for d in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            union = len(docs[i] | docs[j])
            if union and inter * TAU_DEN >= TAU_NUM * union:  # J >= tau, exact
                assert prefixes[i] & prefixes[j], (
                    f"prefix filter dropped a true pair: "
                    f"J={inter}/{union} docs={docs[i]} {docs[j]} "
                    f"prefixes={prefixes[i]} {prefixes[j]}"
                )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.frozensets(st.integers(min_value=0, max_value=15), min_size=1, max_size=12),
        min_size=2,
        max_size=10,
    )
)
def test_prefix_theorem_at_tau_08(docs):
    """Same property at a second ratio (4/5) to guard the integer-
    ceiling arithmetic in `_prefix` away from the 9/10 production
    value (no current caller uses τ=0.8)."""
    dfreq: Counter = Counter()
    for d in docs:
        dfreq.update(d)
    prefixes = [_prefix(d, dfreq, 4, 5) for d in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(docs[i] & docs[j])
            union = len(docs[i] | docs[j])
            if union and inter * 5 >= 4 * union:
                assert prefixes[i] & prefixes[j]
