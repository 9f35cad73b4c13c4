"""Unit tests for the driver-plausible canonicalization verify mode
(`tools/verify_local.py --driver-canon`).

The mode exists because `normalize()`'s cross-side rescue casts kept
verify_local green across r5/r6 while the grading driver red-graded
the three DECIMAL(38,0) queries: DuckDB `.df()` converts every
DECIMAL to float64 (lossy past 2^53) while Spark `toPandas()` yields
exact `decimal.Decimal`, so the two sides stringify differently. These
tests pin the reproduction (pre-fix shape → red, post-fix shape →
green) and the benign tolerances (money decimals, DATE vs midnight
timestamp, int widths) so the mode neither misses the class nor
false-positives the rest of the registry.
"""

from __future__ import annotations

import datetime
import decimal

import pandas as pd

from tools.verify_local import _canon_cell, driver_canon_compare


def test_prefix_wide_decimal_shape_is_red():
    """The exact r5/r6 red: Spark emits Decimal('60000000000000016')
    (exact), DuckDB's pandas conversion delivers float64 that lost the
    low bits past 2^53. Plain compare()'s float rescue would call these
    equal-ish; driver canon must flag."""
    spark_side = pd.DataFrame(
        {"q_sumsq": [decimal.Decimal("60000000000000016")]}
    )
    duck_side = pd.DataFrame({"q_sumsq": [6.000000000000002e16]})
    problems = driver_canon_compare("pre_fix", spark_side, duck_side)
    assert problems and "q_sumsq" in problems[0]


def test_postfix_bigint_shape_is_green():
    spark_side = pd.DataFrame({"q_sumsq_mod": [123456789]})
    duck_side = pd.DataFrame({"q_sumsq_mod": [123456789]})
    assert driver_canon_compare("post_fix", spark_side, duck_side) == []


def test_money_decimal_vs_float_is_green():
    """DECIMAL(18,4) money sums arrive as Decimal('123.4500') on the
    Spark side and float64 123.45 on the DuckDB side — the driver
    grades these green, so canon must too."""
    spark_side = pd.DataFrame(
        {"total": [decimal.Decimal("123.4500"), decimal.Decimal("0.1000")]}
    )
    duck_side = pd.DataFrame({"total": [123.45, 0.1]})
    assert driver_canon_compare("money", spark_side, duck_side) == []


def test_date_vs_midnight_timestamp_is_green():
    spark_side = pd.DataFrame({"d": [datetime.date(2020, 1, 1)]})
    duck_side = pd.DataFrame({"d": [pd.Timestamp("2020-01-01 00:00:00")]})
    assert driver_canon_compare("dates", spark_side, duck_side) == []


def test_int_width_and_integral_float_are_green():
    spark_side = pd.DataFrame({"n": pd.array([7], dtype="int32")})
    duck_side = pd.DataFrame({"n": [7.0]})
    assert driver_canon_compare("widths", spark_side, duck_side) == []


def test_true_value_diff_is_red():
    spark_side = pd.DataFrame({"x": [1.5]})
    duck_side = pd.DataFrame({"x": [1.25]})
    assert driver_canon_compare("diff", spark_side, duck_side)


def test_canon_cell_nulls_and_arrays():
    import numpy as np

    assert _canon_cell(None) == "<null>"
    assert _canon_cell(float("nan")) == "<null>"
    assert _canon_cell(np.array([1, 2])) == "[1,2]"
    assert _canon_cell([1.5, 2]) == "[1.5,2]"
    assert _canon_cell(True) == "True"
