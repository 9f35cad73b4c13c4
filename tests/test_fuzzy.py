"""Property tests for the fuzzy region cleanup (F1, SURVEY.md §5.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_portfolio_project_spark.operators.fuzzy import (
    clean_region_via_distinct,
    clean_region_wratio_via_distinct,
    make_wratio_scorer,
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


def test_wratio_variant_runs_without_rapidfuzz(spark, dirty_df):
    """The WRatio pandas-UDF path must work in this container (no
    rapidfuzz): the pure-Python fallback closure ships to workers by
    value (CLAUDE.md self-contained-closure rule)."""
    out = with_region_cleaned(dirty_df, use_rapidfuzz=True).toPandas()
    for _, r in out.iterrows():
        if r["region"] is None:
            assert r["region_cleaned"] is None
        else:
            assert r["region_cleaned"] in VALID_CITIES


def test_wratio_distinct_variant_equivalent_to_per_row(spark, dirty_df):
    a = (
        with_region_cleaned(dirty_df, use_rapidfuzz=True)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    b = (
        clean_region_wratio_via_distinct(dirty_df)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert a["region_cleaned"].where(a["region_cleaned"].notna(), None).tolist() == b[
        "region_cleaned"
    ].where(b["region_cleaned"].notna(), None).tolist()


def test_wratio_scorer_known_values():
    """Published weighted-ratio fixtures (fuzzywuzzy/rapidfuzz docs)."""
    wratio, extract_one = make_wratio_scorer()
    # normalized InDel ratio: 200·14/(14+15)
    assert round(wratio("this is a test", "this is a test"), 2) == 100.0
    # token-sort invariance under word order (len_ratio < 1.5 branch)
    assert wratio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 95.0
    # token-set containment → 100, scaled by 0.95 in WRatio
    assert wratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 95.0
    # substring match through partial_ratio, 0.9 scale (1.5 ≤ lr < 8)
    assert wratio("Delhi", "South Delhi Municipal Corporation") == 90.0
    # empty / null-ish
    assert wratio("", "Delhi") == 0.0
    best, score = extract_one("Bengaluru", list(VALID_CITIES))
    assert best == "Bangalore"


def test_wratio_diverges_from_levenshtein_argmin(spark):
    """Documented divergence fixture: repeated-substring inputs rank
    differently under WRatio (partial/token paths) than under the
    engine-default Levenshtein-argmin."""
    _, extract_one = make_wratio_scorer()
    adversarial = "DELHI DELHI DELHI KOLKATA"
    # WRatio: both 'Delhi'→(case-sensitive partial ~) and 'Kolkata'
    # (exact substring → 90.0) score high; Kolkata's exact-case
    # substring wins outright
    wr_best, _ = extract_one(adversarial, list(VALID_CITIES))
    df = spark.createDataFrame([(1, adversarial)], "id long, region string")
    lev_best = with_region_cleaned(df).toPandas()["region_cleaned"][0]
    assert wr_best != lev_best  # the two scorers genuinely disagree


def test_wratio_registered_query_runs(spark):
    """region_clean_wratio (rows-only registry entry) end-to-end at
    sf0.001: output column in candidate set, row count = loans count."""
    from etl_portfolio_project_spark import api

    df = api.REGISTRY["region_clean_wratio"].builder(
        spark, "/root/testdata/sf0.001"
    )
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"loan_id", "region", "region_cleaned"}
    assert pdf["region_cleaned"].dropna().isin(VALID_CITIES).all()


def test_wratio_scorer_properties_hypothesis():
    """Property-based bounds for the pure WRatio implementation:
    scores in [0, 100], self-similarity 100 for nonempty strings,
    extract_one always returns a candidate list member."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    wratio, extract_one = make_wratio_scorer()
    alphabet = st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs"))

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet, max_size=40), st.text(alphabet, max_size=40))
    def check(a, b):
        s = wratio(a, b)
        assert 0.0 <= s <= 100.0
        if a and a == b:
            assert s == 100.0
        best, score = extract_one(a, list(VALID_CITIES))
        assert best in VALID_CITIES
        assert 0.0 <= score <= 100.0

    check()
