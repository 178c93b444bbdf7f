from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from better_cdc_spark.session import get_spark

    spark = get_spark("tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    from tools.check import duck_connect

    return duck_connect(SF_SMOKE)
