from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from etl_portfolio_project_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=4, driver_memory="4g")
    yield spark
