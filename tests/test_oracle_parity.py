"""Differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 gate (SURVEY.md §5.1) at sf0.001 — exact value
equality including bit-identical doubles.
"""

from __future__ import annotations

import pytest

from etl_portfolio_project_spark import api
from tools.verify_local import compare, duck_con

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_SMALL)


def _names():
    return sorted(api.REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, con, name):
    spec = api.REGISTRY[name]
    sdf = spec.builder(spark, SF_SMALL).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check (driver does the same)
        return
    odf = con.execute(spec.oracle).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems)
    assert len(sdf) > 0, f"{name}: empty result — degenerate test"
