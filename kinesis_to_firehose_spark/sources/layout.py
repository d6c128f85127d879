"""Multi-dimensional file layout (Z-order clustering).

A 100 TB table queried by 2-D box predicates (user × time, key ×
value band) cannot serve both dimensions from a single-column sort:
files sorted by time have every user in every file, so a user filter
prunes nothing. Interleaving the bit patterns of both dimension
buckets into one Morton key (operators/analytics.py:zorder_value) and
range-partitioning the write on that key gives every file a small
min/max box in BOTH dimensions — parquet row-group stats then prune
box queries on either or both. This is the OPTIMIZE ZORDER pattern
from lakehouse table formats, expressed as plain Spark writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 8 bits per dimension: 256 buckets each, 16-bit Morton key
_ZBITS = 8


def _bucket_expr(col: str, mn: float, mx: float):
    """Linear min/max scaling of `col` into 0..255. Rank-based edges
    (approx percentiles) would equalize bucket population under skew —
    same downstream interleave; linear keeps the test deterministic."""
    span = (mx - mn) or 1.0
    return F.least(
        F.lit((1 << _ZBITS) - 1),
        F.floor((F.col(col) - mn) / span * (1 << _ZBITS)).cast("long"),
    )


def _interleave(xb: str, yb: str):
    terms = None
    for i in range(_ZBITS):
        for c, off in ((xb, 0), (yb, 1)):
            t = (F.shiftright(F.col(c), i).bitwiseAND(1)) * (1 << (2 * i + off))
            terms = t if terms is None else terms + t
    return terms


def _rank_bucket_expr(df: DataFrame, col: str):
    """Equi-depth bucketization: 255 approx-percentile edges (a
    sketch, one pass, driver gets only the edge list) and the bucket
    is how many edges lie at or below the value — under skew, linear
    min/max scaling collapses most rows into a few buckets and the
    interleave loses its pruning power in that dimension."""
    edges = df.approxQuantile(
        col, [i / (1 << _ZBITS) for i in range(1, 1 << _ZBITS)], 0.001
    )
    arr = "array(" + ", ".join(f"CAST({e} AS DOUBLE)" for e in edges) + ")"
    return F.expr(
        f"CAST(size(filter({arr}, e -> e <= CAST({col} AS DOUBLE))) AS BIGINT)"
    )


def write_zorder(
    df: DataFrame,
    x: str,
    y: str,
    path: str,
    n_files: int = 16,
    rank_based: bool = False,
) -> None:
    """Write `df` clustered by the Morton interleave of (x, y): one
    range-partition shuffle on zval + a within-file sort, then the
    helper columns are dropped. Reads need no special API — the
    pruning lives in the parquet stats. rank_based=True buckets each
    dimension by equi-depth percentile edges instead of linear
    min/max scaling (use for skewed dimensions)."""
    if rank_based:
        xb, yb = _rank_bucket_expr(df, x), _rank_bucket_expr(df, y)
    else:
        # ONE stats pass for both dimensions (two separate min/max
        # jobs would scan the full input twice before the write pass)
        st = df.agg(
            F.min(x).alias("x_mn"), F.max(x).alias("x_mx"),
            F.min(y).alias("y_mn"), F.max(y).alias("y_mx"),
        ).collect()[0]
        xb = _bucket_expr(x, float(st["x_mn"]), float(st["x_mx"]))
        yb = _bucket_expr(y, float(st["y_mn"]), float(st["y_mx"]))
    (
        df.withColumn("_xb", xb)
        .withColumn("_yb", yb)
        .withColumn("_z", _interleave("_xb", "_yb"))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_xb", "_yb", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files_for_box(
    spark: SparkSession, path: str, x: str, y: str, box
) -> tuple[int, int]:
    """(files overlapping the box, total files) by per-file min/max —
    exactly the stats a parquet reader consults before opening a row
    group. The pruning-ratio assertion in tests uses this."""
    x_lo, x_hi, y_lo, y_hi = box
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min(x).alias("x_mn"), F.max(x).alias("x_mx"),
            F.min(y).alias("y_mn"), F.max(y).alias("y_mx"),
        )
    )
    total = per_file.count()
    hit = per_file.filter(
        (F.col("x_mx") >= x_lo) & (F.col("x_mn") <= x_hi)
        & (F.col("y_mx") >= y_lo) & (F.col("y_mn") <= y_hi)
    ).count()
    return hit, total
