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


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from better_cdc_spark.queries import (  # noqa: F401
        relational,
        tpch,
        cdc_queries,
        llm,
        streaming_q,
        udf,
    )

    return REGISTRY
