"""bench.py output contract: the driver parses ONE bounded-tail JSON
line, so the compact summary must stay small no matter how large the
registry grows (the round-2 bench artifact was lost to a ~4 KB line)."""

from __future__ import annotations

import json

import bench
from etl_portfolio_project_spark import api


def test_compact_line_stays_small_at_full_registry_size():
    # worst case: every registered query (longest plausible names) with
    # large timing values, plus errors
    timings = {name: 123.456 for name in api.REGISTRY}
    errors = {"some_query": "trace"}
    line = json.dumps(
        bench.compact_line(timings, errors, sum(timings.values()), 0.1)
    )
    assert len(line) < 1500, f"{len(line)} bytes — driver tail may truncate"
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_wall_seconds"
    assert len(parsed["queries"]) <= 10
    assert parsed["n_queries"] == len(api.REGISTRY)


def test_compact_line_orders_by_slowest():
    t = {"a": 1.0, "b": 9.0, "c": 5.0}
    out = bench.compact_line(t, {}, 15.0, 0.01)
    assert list(out["queries"]) == ["b", "c", "a"]


def test_streaming_marker_matches_actual_streaming_builders():
    """api.STREAMING_QUERIES (the canonical marker bench.py's
    batch/stream split reads — ADVICE r10) must equal the set of
    builders that actually execute Structured Streaming micro-batches,
    detected by a docstring-stripped source scan for streaming entry
    points. A future streaming query that misses the `stream_` prefix
    (or a prefixed query that never streams) fails here instead of
    silently skewing the floor-free batch total the perf gate reads."""
    import ast
    import inspect
    import re
    import textwrap

    import importlib

    pat = re.compile(
        r"readStream|writeStream|foreachBatch|_run_to_table"
        r"|run_bounded|read_events_stream"
    )

    def stripped_src(fn) -> str:
        try:
            tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
        except (OSError, TypeError, SyntaxError):
            return ""
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Module)
            ):
                body = getattr(node, "body", [])
                if (
                    body
                    and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)
                ):
                    node.body = body[1:] or [ast.Pass()]
        return ast.unparse(tree)

    detected = set()
    for name, spec in api.REGISTRY.items():
        fn = spec.raw or spec.builder
        src = stripped_src(fn)
        if not src:
            continue
        # one-hop expansion: builders may delegate the streaming run
        # to a same-module helper (e.g. _sid_run_stream)
        mod = importlib.import_module(spec.module) if spec.module else None
        for called in set(re.findall(r"\b(_?[a-z][a-z0-9_]*)\s*\(", src)):
            helper = getattr(mod, called, None)
            if callable(helper) and getattr(
                helper, "__module__", ""
            ) == spec.module:
                src += "\n" + stripped_src(helper)
        if pat.search(src):
            detected.add(name)
    assert detected == set(api.STREAMING_QUERIES)
    # the prefix CONVENTION must also hold (grading tooling and the
    # shuffle-budget exemption key off it)
    assert set(api.STREAMING_QUERIES) == {
        n for n in api.REGISTRY if n.startswith("stream_")
    }


def test_canary_lists_are_registered_queries():
    """Both canary lists must stay subsets of the live registry
    (ADVICE r11): heavy_canary_total sums `timings.get(n, 0.0)`, so a
    renamed/removed query would silently contribute 0.0 and deflate
    the decomposition baseline the perf gate reads — the same drift
    class the streaming-marker test above pins."""
    assert set(bench.CANARY_QUERIES) <= set(api.REGISTRY)
    assert set(bench.HEAVY_CANARY_QUERIES) <= set(api.REGISTRY)
    # and they must stay disjoint tiers — a query in both would be
    # double-decomposed
    assert not set(bench.CANARY_QUERIES) & set(bench.HEAVY_CANARY_QUERIES)
