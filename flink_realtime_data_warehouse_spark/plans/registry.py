"""Central registry of (query, DuckDB-oracle) pairs.

Every operator we claim in SURVEY.md §2 registers a named query here:
``QUERIES[name](spark, sf_dir) -> DataFrame`` plus, when the semantics
are SQL-expressible, ``ORACLES[name]`` — an ANSI-SQL equivalent DuckDB
runs on the same parquet tables. The driver hash-compares both sides,
so every computed column is aliased identically in query and oracle,
and float outputs are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
