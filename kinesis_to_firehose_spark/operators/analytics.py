"""Analytical query set (SURVEY.md §2.2) — TPC-H-adapted to the
driver's schema.

Design notes (100 TB posture):
- Dimensions (region/nation/customer/supplier/part) are broadcast —
  no shuffle on the fact side for star joins.
- Aggregates are expressed with native ``F.*`` so Catalyst keeps
  whole-stage codegen and map-side partial aggregation.
- Every float output is rounded at the query edge (ROUND_DP) so the
  DuckDB oracle hash-matches despite summation-order differences.
- Top-N queries always carry a unique tiebreaker in the sort so both
  engines cut the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesis_to_firehose_spark.registry import register
from kinesis_to_firehose_spark.sources.tables import load

ROUND_DP = 2


def _r(col, dp: int = ROUND_DP):
    return F.round(col, dp)


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 adapted (reference has no SQL surface; this
# is the engine-breadth suite mandated by SURVEY §2.2).
# --------------------------------------------------------------------------
Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(AVG(l_quantity), 2)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 2)                                   AS avg_price,
  ROUND(AVG(l_discount), 4)                                        AS avg_disc,
  COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(disc_price)).alias("sum_disc_price"),
            _r(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
