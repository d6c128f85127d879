"""Operator registry.

Each operator from SURVEY.md §2 registers a (spark_fn, oracle_sql)
pair. ``spark_fn(spark, sf_dir) -> DataFrame`` is the Spark-first
implementation; ``oracle_sql`` is the equivalent ANSI SQL DuckDB runs
on the same parquet tables (views: region nation customer supplier
part orders lineitem events documents embeddings). ``oracle_sql is
None`` marks a non-SQL-expressible op (driver does a rows-only
check).

Column names and float rounding must match between the two sides —
the driver hash-compares values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: SparkFn
    sql: str | None  # DuckDB oracle; None → rows-only check


_REGISTRY: dict[str, Op] = {}


def register(name: str, sql: str | None = None) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate op {name!r}")
        _REGISTRY[name] = Op(name, fn, sql)
        return fn

    return deco


def all_ops() -> dict[str, Op]:
    """Import every op module and return the full registry."""
    # Imports deferred so `import registry` stays cheap and cycle-free.
    from kinesis_to_firehose_spark.operators import (  # noqa: F401
        analytics,
        curation,
        dedup,
        logpipe,
        mining,
        multimodal,
        similarity,
        skew,
        streaming_ops,
        textops,
        timeseries,
    )

    return dict(_REGISTRY)
