"""Property tests for the fuzzy region cleanup (F1, SURVEY.md §5.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_portfolio_project_spark.operators.fuzzy import (
    clean_region_via_distinct,
    with_region_cleaned,
)
from etl_portfolio_project_spark.sources.views import VALID_CITIES

DIRTY = [
    "Bangalore",
    "Mumbai",
    "Delhi",
    "Kolkata",
    "Bengaluru",
    "Mumbay",
    "delhi",
    "KOLKATA ",
    "Chennai",  # unrelated — still maps somewhere (no cutoff, main.py:72)
    "bombay",
    "",
    None,
]


@pytest.fixture(scope="module")
def dirty_df(spark):
    return spark.createDataFrame([(i, v) for i, v in enumerate(DIRTY)], "id long, region string")


def test_output_in_candidate_set_or_null(spark, dirty_df):
    out = with_region_cleaned(dirty_df).toPandas()
    for _, r in out.iterrows():
        if r["region"] is None:
            assert r["region_cleaned"] is None  # NULL passthrough main.py:70-71
        else:
            assert r["region_cleaned"] in VALID_CITIES


def test_idempotent_on_clean_values(spark, dirty_df):
    clean = dirty_df.where(F.col("region").isin(VALID_CITIES))
    out = with_region_cleaned(clean).toPandas()
    assert (out["region"] == out["region_cleaned"]).all()


def test_obvious_typos_map_correctly(spark, dirty_df):
    out = (
        with_region_cleaned(dirty_df)
        .toPandas()
        .set_index("region")["region_cleaned"]
        .to_dict()
    )
    assert out["Bengaluru"] == "Bangalore"
    assert out["Mumbay"] == "Mumbai"
    assert out["delhi"] == "Delhi"
    assert out["KOLKATA "] == "Kolkata"


def test_distinct_broadcast_variant_equivalent(spark, dirty_df):
    a = with_region_cleaned(dirty_df).toPandas().sort_values("id").reset_index(drop=True)
    b = (
        clean_region_via_distinct(dirty_df)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert a["region_cleaned"].where(a["region_cleaned"].notna(), None).tolist() == b[
        "region_cleaned"
    ].where(b["region_cleaned"].notna(), None).tolist()


def test_rapidfuzz_variant_if_available(spark, dirty_df):
    pytest.importorskip("rapidfuzz")
    out = with_region_cleaned(dirty_df, use_rapidfuzz=True).toPandas()
    for _, r in out.iterrows():
        if r["region"] is None:
            assert r["region_cleaned"] is None
        else:
            assert r["region_cleaned"] in VALID_CITIES
