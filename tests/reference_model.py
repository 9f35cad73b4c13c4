"""Independent pandas re-statement of the reference semantics.

Used ONLY as a test oracle for the engine's loan operators. Each
formula cites the reference line it restates
(/root/reference/main.py); this is a clean-room reimplementation of
the documented behavior (SURVEY.md §2.5/§2.6), not a copy — it exists
so the Spark operators are tested against an executable spec with the
reference's exact NaN/rounding quirks.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd


def loan_metrics_row(row: dict, as_of: dt.date) -> dict:
    P = row["disbursement_amount"]
    R = row["interest_rate"] / 100  # main.py:84
    disb = pd.to_datetime(row["disbursement_date"])
    due = pd.to_datetime(row["due_date"])
    ec = row.get("emi_collected", 0) or 0  # main.py:87 (NaN stays NaN)

    dur = (due.year - disb.year) * 12 + (due.month - disb.month)  # main.py:90
    T = dur / 12
    interest = P * R * T  # main.py:94
    total_payable = P + interest
    emi = total_payable / dur if dur > 0 else 0  # main.py:96
    md = (as_of.year - disb.year) * 12 + (as_of.month - disb.month)  # main.py:99
    md = max(0, min(md, dur))  # main.py:100
    total_demand = emi * md  # main.py:103
    total_to_be_collected = total_payable - ec  # main.py:106
    arrear = max(0, total_demand - ec)  # main.py:111
    target = max(0, arrear + emi - ec)  # main.py:114
    returned = max(0, -1 * (arrear + emi - ec))  # main.py:115
    today = pd.Timestamp(as_of)
    due_at_md = disb + pd.DateOffset(months=md)  # main.py:118
    dpd = max(0, (today - due_at_md).days) if arrear > 0 else 0  # main.py:119
    if dpd == 0:  # main.py:122-131
        bucket = "Current"
    elif dpd <= 30:
        bucket = "1–30 DPD"
    elif dpd <= 60:
        bucket = "31–60 DPD"
    elif dpd <= 90:
        bucket = "61–90 DPD"
    else:
        bucket = "90+ DPD"
    return {
        "emi_amount": float(emi),
        "total_demand": float(total_demand),
        "arrear": float(arrear),
        "target_amount": float(target),
        "amount_to_be_returned": float(returned),
        "months_due": int(md),
        "dpd_days": int(dpd),
        "dpd_bucket": bucket,
        "total_to_be_collected": float(total_to_be_collected),
    }


def monthly_schedule_rows(row: dict, as_of: dt.date) -> list[dict]:
    P = row["disbursement_amount"]
    R = row["interest_rate"] / 100  # main.py:149
    disb = pd.to_datetime(row["disbursement_date"])
    due = pd.to_datetime(row["due_date"])
    ec = row.get("emi_collected", 0) or 0  # main.py:152

    dur = (due.year - disb.year) * 12 + (due.month - disb.month)  # main.py:154
    total_payable = P * (1 + R * (dur / 12))  # main.py:155
    emi = total_payable / dur if dur > 0 else 0  # main.py:156

    today = pd.Timestamp(as_of)
    out = []
    total_collected = 0.0
    for m in range(1, dur + 1):  # main.py:159 (empty when dur < 1)
        due_m = disb + pd.DateOffset(months=m)  # main.py:160
        demand = emi * m
        collected = ec if due_m <= today else 0  # main.py:162
        total_collected += collected
        arrear = max(0, demand - total_collected)  # main.py:164
        dpd = max(0, (today - due_m).days) if arrear > 0 else 0  # main.py:165
        if dpd == 0:  # main.py:167-176
            bucket = "Current"
        elif dpd <= 30:
            bucket = "0–30"
        elif dpd <= 60:
            bucket = "30–60"
        elif dpd <= 90:
            bucket = "60–90"
        else:
            bucket = "90+"
        out.append(
            {
                "loan_id": row["loan_id"],
                "month": m,
                "emi_due_date": due_m.strftime("%d-%b-%Y"),  # main.py:181
                "emi_amount": round(emi, 2),  # main.py:182-185
                "emi_collected": round(collected, 2)
                if not (isinstance(collected, float) and math.isnan(collected))
                else float("nan"),
                "total_demand_till_month": round(demand, 2),
                "arrear": round(arrear, 2),
                "dpd_days": dpd,
                "dpd_bucket": bucket,
            }
        )
    return out


#: Loan fixture with every FIXTURES.md §A2/§A3 edge case, pinned
#: as_of 2026-08-13. emi_collected None ≡ left-join miss (NaN).
AS_OF_FIXTURE = dt.date(2026, 8, 13)

LOAN_FIXTURE = [
    # loan_id, amount, disb, due, rate, emi_collected
    (1, 100000.0, "2024-01-15", "2026-01-15", 10.0, 24000.0),  # matured-ish
    (2, 50000.0, "2026-03-10", "2026-03-25", 8.0, 0.0),  # zero duration
    (3, 75000.0, "2026-05-01", "2025-05-01", 9.0, 100.0),  # negative duration
    (4, 200000.0, "2025-01-31", "2027-01-31", 12.0, 5000.0),  # EOM clamping
    (5, 60000.0, "2027-02-01", "2029-02-01", 7.5, 0.0),  # fully future
    (6, 80000.0, "2020-06-15", "2022-06-15", 11.0, None),  # no extension (NaN)
    (7, 40000.0, "2024-11-30", "2025-11-30", 6.0, 90000.0),  # overpaid
    (8, 120000.0, "2025-12-31", "2026-02-28", 9.5, 1000.0),  # short, EOM
    (9, 55000.0, "2023-08-31", "2026-08-31", 8.5, 30000.0),  # in-flight EOM
    (10, 1000.0, "2026-07-20", "2026-09-20", 5.0, None),  # future-ish, no ext
]


def fixture_df() -> pd.DataFrame:
    df = pd.DataFrame(
        LOAN_FIXTURE,
        columns=[
            "loan_id",
            "disbursement_amount",
            "disbursement_date",
            "due_date",
            "interest_rate",
            "emi_collected",
        ],
    )
    df["disbursement_date"] = pd.to_datetime(df["disbursement_date"]).dt.date
    df["due_date"] = pd.to_datetime(df["due_date"]).dt.date
    # None → NaN (float column): reproduces the left-join-miss NaN the
    # reference sees (NaN is truthy, so `or 0` does NOT coalesce it).
    df["emi_collected"] = df["emi_collected"].astype("float64")
    return df
