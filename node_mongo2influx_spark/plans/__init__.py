"""Query library: every operator from SURVEY.md §2 as a named query.

Each :class:`QueryDef` pairs a PySpark implementation ``fn(spark, sf_dir) ->
DataFrame`` with the ANSI-SQL oracle DuckDB runs on the same parquet tables
(the driver's t2 correctness gate). Column names are aliased identically on
both sides — the comparator sorts columns by name before hashing values.

Queries without a SQL-expressible equivalent (LSH internals, streaming) set
``oracle=None`` and get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: Optional[str] = None, description: str = ""):
    """Register a query under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def load_registry() -> dict[str, QueryDef]:
    """Import all plan modules (side effect: REGISTRY population)."""
    from node_mongo2influx_spark.plans import (  # noqa: F401
        llm_ops,
        pipeline,
        relational,
        timeseries,
    )

    return REGISTRY
