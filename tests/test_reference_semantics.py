"""Golden tests of the loan operators against the executable reference
spec (tests/reference_model.py) on the FIXTURES.md edge-case fixture,
pinned as_of 2026-08-13.

Covers: zero/negative durations (M3 guard, empty schedule), left-join
NaN propagation (§2.11), overpayment (M6 unclamped / M9), EOM
`add_months` vs `pd.DateOffset` clamping, future/matured clamps (M4),
both divergent bucket label schemes (M11 vs T4).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import types as T

from etl_portfolio_project_spark.operators.metrics import with_loan_metrics
from etl_portfolio_project_spark.operators.schedule import monthly_schedule

from . import reference_model as ref

FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("loan_id", T.LongType()),
        T.StructField("disbursement_amount", T.DoubleType()),
        T.StructField("disbursement_date", T.DateType()),
        T.StructField("due_date", T.DateType()),
        T.StructField("interest_rate", T.DoubleType()),
        T.StructField("emi_collected", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def loan_sdf(spark):
    pdf = ref.fixture_df()
    rows = [
        tuple(None if isinstance(v, float) and math.isnan(v) else v for v in r)
        for r in pdf.itertuples(index=False)
    ]
    return spark.createDataFrame(rows, FIXTURE_SCHEMA)


def test_metrics_match_reference_model(spark, loan_sdf):
    got = (
        with_loan_metrics(loan_sdf, ref.AS_OF_FIXTURE)
        .toPandas()
        .set_index("loan_id")
        .sort_index()
    )
    for row in ref.fixture_df().to_dict("records"):
        exp = ref.loan_metrics_row(row, ref.AS_OF_FIXTURE)
        g = got.loc[row["loan_id"]]
        for k, v in exp.items():
            gv = g[k]
            if isinstance(v, float) and math.isnan(v):
                assert pd.isna(gv), f"loan {row['loan_id']} {k}: {gv} != NaN"
            elif isinstance(v, float):
                assert gv == v, f"loan {row['loan_id']} {k}: {gv} != {v}"
            else:
                assert gv == v, f"loan {row['loan_id']} {k}: {gv!r} != {v!r}"


def test_schedule_matches_reference_model(spark, loan_sdf):
    got = monthly_schedule(loan_sdf, ref.AS_OF_FIXTURE).toPandas()
    exp_rows = []
    for row in ref.fixture_df().to_dict("records"):
        exp_rows.extend(ref.monthly_schedule_rows(row, ref.AS_OF_FIXTURE))
    exp = pd.DataFrame(exp_rows)

    # zero/negative duration loans emit no rows (main.py:159)
    assert set(got["loan_id"]) == set(exp["loan_id"])
    assert len(got) == len(exp)

    got = got.sort_values(["loan_id", "month"]).reset_index(drop=True)
    exp = exp.sort_values(["loan_id", "month"]).reset_index(drop=True)

    for col in ["month", "emi_due_date", "dpd_days", "dpd_bucket"]:
        assert got[col].tolist() == exp[col].tolist(), col
    # Rounded money columns: engine rounds floor(x*100+.5)/100, the
    # reference rounds Python-banker's — equal except within 1 ulp of a
    # .xx5 tie, so compare to 1 cent.
    for col in ["emi_amount", "emi_collected", "total_demand_till_month", "arrear"]:
        g, e = got[col].astype(float), exp[col].astype(float)
        both_nan = g.isna() & e.isna()
        close = (g - e).abs() <= 0.01
        assert (both_nan | close).all(), (
            col,
            got.loc[~(both_nan | close), ["loan_id", "month", col]],
        )


def test_null_extension_propagation(spark, loan_sdf):
    """SURVEY.md §2.11 — the highest-risk trap: NULL emi_collected."""
    got = (
        with_loan_metrics(loan_sdf, ref.AS_OF_FIXTURE)
        .where("loan_id = 6")  # matured loan with no extension row
        .toPandas()
        .iloc[0]
    )
    assert got["arrear"] == 0.0  # max(0, nan) == 0
    assert got["target_amount"] == 0.0
    assert got["amount_to_be_returned"] == 0.0
    assert got["dpd_days"] == 0
    assert got["dpd_bucket"] == "Current"
    assert pd.isna(got["total_to_be_collected"])  # finite - NaN


def test_bucket_label_schemes_differ(spark, loan_sdf):
    """M11 labels have ' DPD' suffix; T4 labels do not (main.py:122-131
    vs 167-176)."""
    final = with_loan_metrics(loan_sdf, ref.AS_OF_FIXTURE).toPandas()
    sched = monthly_schedule(loan_sdf, ref.AS_OF_FIXTURE).toPandas()
    assert set(final["dpd_bucket"]) <= {
        "Current",
        "1–30 DPD",
        "31–60 DPD",
        "61–90 DPD",
        "90+ DPD",
    }
    assert set(sched["dpd_bucket"]) <= {"Current", "0–30", "30–60", "60–90", "90+"}
    assert "90+ DPD" in set(final["dpd_bucket"])  # matured fixture loans
    assert "90+" in set(sched["dpd_bucket"])
