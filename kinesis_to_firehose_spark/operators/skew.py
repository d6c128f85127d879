"""Skew-mitigation utilities (SURVEY.md §6).

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) covers sort-merge joins; these helpers cover the cases AQE
doesn't: hot-key aggregation with expensive per-key state (two-stage
salted aggregate) and broadcast-averse skewed joins (salt + replicate).

At 100 TB a single hot key (one huge customer, one viral document)
otherwise pins a whole stage on one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy (key, salt) first so a hot key
    spreads over n_salts tasks, then re-aggregate per key.

    `aggs` maps output column name → first-stage aggregate expression.
    Second stage re-combines with the matching combiner (sum→sum,
    count→sum, min→min, max→max) — callers pass F.count/F.sum/F.min/
    F.max expressions; algebraic combiners only.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    stage1 = salted.groupBy(key, "_salt").agg(
        *[expr.alias(f"_s1_{name}") for name, expr in aggs.items()]
    )
    recombine = []
    for name, expr in aggs.items():
        fn = expr._jc.toString().split("(")[0].lower()
        col = F.col(f"_s1_{name}")
        if fn.startswith("count") or fn.startswith("sum"):
            recombine.append(F.sum(col).alias(name))
        elif fn.startswith("min"):
            recombine.append(F.min(col).alias(name))
        elif fn.startswith("max"):
            recombine.append(F.max(col).alias(name))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    return stage1.groupBy(key).agg(*recombine)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    across all salts, join on (key, salt). Use when the dim side is too
    big to broadcast and the fact side has hot keys."""
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = fact.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    replicated_dim = dim.crossJoin(salts)
    return (
        salted_fact.join(replicated_dim, [key, "_salt"])
        .drop("_salt")
    )
