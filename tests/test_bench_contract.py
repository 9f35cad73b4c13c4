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
