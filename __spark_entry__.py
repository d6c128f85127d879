"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
for the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kinesis_to_firehose_spark.registry import all_ops  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q1_pricing_summary) on /root/testdata/sf0.001."""
    ops = all_ops()
    return ops["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: op.fn for name, op in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible op."""
    return {name: op.sql for name, op in all_ops().items() if op.sql is not None}
