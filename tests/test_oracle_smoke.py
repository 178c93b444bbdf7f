"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same compare the driver's correctness gate performs, run at the
smallest scale factor so the full suite stays fast.
"""

from __future__ import annotations

import pytest

from better_cdc_spark.queries import load_all
from tests.conftest import SF_SMOKE
from tools.check import compare

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_SMOKE)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract: runs and is stable
        return
    duck_pdf = duck.execute(spec.oracle).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
