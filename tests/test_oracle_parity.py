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
def test_oracle_no_hugeint(con, name):
    """DuckDB SUM(BIGINT) yields HUGEINT (int128), which the driver's
    value hash stringifies differently than Spark's BIGINT — a silent
    hash-fail on bit-exact values (round-1 verdict #2). Every oracle
    must CAST such sums back to BIGINT."""
    spec = api.REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("rows-only query")
    types = con.execute(f"DESCRIBE ({spec.oracle})").df()
    bad = [
        (r.column_name, r.column_type)
        for r in types.itertuples()
        if "HUGEINT" in str(r.column_type).upper()
    ]
    assert not bad, f"{name}: HUGEINT output columns {bad} — CAST to BIGINT"


@pytest.mark.parametrize("name", _names())
def test_oracle_no_wide_decimal(con, name):
    """DECIMAL(precision>18) graded outputs are the r5/r6 driver-red
    class: DuckDB backs them with HUGEINT, whose pandas/Arrow
    conversion diverges from Spark's decimal.Decimal under the
    driver's hash canonicalization (q_sumsq lost bits past 2^53) even
    when both engines agree on the VALUE. Exact wide-decimal
    accumulation is fine as an INTERMEDIATE — fold the final graded
    column into BIGINT (outer % 1e9+7, exact in both engines) or emit
    STRING. Spark-side twin lives in tools/dtype_check.py."""
    spec = api.REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("rows-only query")
    types = con.execute(f"DESCRIBE ({spec.oracle})").df()
    bad = [
        (r.column_name, r.column_type)
        for r in types.itertuples()
        if str(r.column_type).upper().startswith("DECIMAL(")
        and int(str(r.column_type).split("(")[1].split(",")[0]) > 18
    ]
    assert not bad, (
        f"{name}: graded DECIMAL(>18) columns {bad} — fold into BIGINT "
        "via an outer %% 1000000007 (see CLAUDE.md numeric rules)"
    )


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
