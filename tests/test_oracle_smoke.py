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

# Default-tier slice (r16): the driver's correctness gate hashes the
# SHOWCASE_ORDER prefix and the bench times HEADLINE — those oracle pins
# must run on every default `pytest tests/`. The remaining ~430 registry
# oracles stay in the suite under the `slow` marker (run via
# `make test-full`; the sf0.01 equivalent sweep is `make check-full`).
from bench import HEADLINE  # noqa: E402
from better_cdc_spark.queries import SHOWCASE_ORDER  # noqa: E402

_FAST = set(SHOWCASE_ORDER) | set(HEADLINE)
_PARAMS = [
    name if name in _FAST else pytest.param(name, marks=pytest.mark.slow)
    for name in sorted(REGISTRY)
]


@pytest.mark.parametrize("name", _PARAMS)
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


def test_lsh_recall_coupled_oracles_declare_their_probed_scales():
    """Every full-oracle query whose exactness rests on LSH banding
    recall == 1.0 (a SCALE-COUPLED property, probed not proven) must
    declare oracle_scales so harnesses report mismatches at unprobed
    scales as expected recall<1, never as a spurious correctness diff
    (round-8 advice). Guards future sketch additions from forgetting."""
    from better_cdc_spark.queries import load_all

    reg = load_all()
    coupled = [
        "q96_minhash_lsh",
        "q96g_one_perm_minhash",
        "q94d_curation_pipeline_lsh",
        "q95aa_incremental_minhash_lsh",
        "qm05_streaming_lsh_dedup",
        # round-10 promotions: probed-exact at the pinned scales
        "q95k_bloom_decontaminate",  # bloom FP count probed 0
        "q97_ann_lsh",  # sign-bucket fp boundary guard
        "q97_ann_ivf",  # centroid-mean summation-order guard
        "q97f_ivf_index_persist",  # same model as q97_ann_ivf
        # round-11 promotion: probed-exact at the pinned scales
        "q97_ann_pq",  # subspace centroid means + ADC shortlist boundary
        # round-11 session-2: same quantizer-retrain pin as q97_ann_ivf
        "q97z_cluster_quality",  # k-means mirror + micro-unit rounding
    ]
    for name in coupled:
        spec = reg[name]
        assert spec.oracle is not None, name
        assert spec.oracle_scales, f"{name} lacks oracle_scales"
        assert set(spec.oracle_scales) == {"0.001", "0.01", "0.1"}, name
    # and nothing else declares scales it doesn't need
    others = [
        n for n, s in reg.items()
        if s.oracle_scales is not None and n not in coupled
    ]
    assert others == [], f"unexpected scale-coupled oracles: {others}"
