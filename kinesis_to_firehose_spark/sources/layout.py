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


def _interleave(*cols: str):
    """Morton bit-interleave of 2 or 3 bucket columns: bit i of
    column j lands at position len(cols)*i + j, so the high bits of
    every dimension dominate the sort key equally — that equal say is
    what gives each output file a small min/max box in ALL dims."""
    n = len(cols)
    terms = None
    for i in range(_ZBITS):
        for off, c in enumerate(cols):
            t = (F.shiftright(F.col(c), i).bitwiseAND(1)) * (1 << (n * i + off))
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
    z: str | None = None,
) -> None:
    """Write `df` clustered by the Morton interleave of (x, y[, z]):
    one range-partition shuffle on zval + a within-file sort, then the
    helper columns are dropped. Reads need no special API — the
    pruning lives in the parquet stats. rank_based=True buckets each
    dimension by equi-depth percentile edges instead of linear
    min/max scaling (use for skewed dimensions). A third dimension
    trades per-dim pruning power (the n_files key prefix splits
    across 3 dims instead of 2) for nonzero pruning on all three —
    the right call when queries band-filter (key, time, value)
    together."""
    dims = [x, y] + ([z] if z is not None else [])
    if rank_based:
        buckets = [_rank_bucket_expr(df, c) for c in dims]
    else:
        # ONE stats pass for all dimensions (separate min/max jobs
        # would scan the full input once per dim before the write)
        aggs = []
        for c in dims:
            aggs += [F.min(c).alias(f"{c}__mn"), F.max(c).alias(f"{c}__mx")]
        st = df.agg(*aggs).collect()[0]
        buckets = [
            _bucket_expr(c, float(st[f"{c}__mn"]), float(st[f"{c}__mx"]))
            for c in dims
        ]
    helper = [f"_b{i}" for i in range(len(dims))]
    out = df
    for h, b in zip(helper, buckets):
        out = out.withColumn(h, b)
    (
        out.withColumn("_z", _interleave(*helper))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop(*helper, "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files_for_preds(
    spark: SparkSession, path: str, preds: dict[str, tuple]
) -> tuple[int, int]:
    """(files overlapping every [lo, hi] band, total files) by
    per-file min/max — exactly the stats a parquet reader consults
    before opening a row group. The pruning-ratio assertions in tests
    use this. `preds` maps column -> (lo, hi); any number of dims."""
    aggs = []
    for c in preds:
        aggs += [F.min(c).alias(f"{c}__mn"), F.max(c).alias(f"{c}__mx")]
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(*aggs)
    )
    total = per_file.count()
    cond = F.lit(True)
    for c, (lo, hi) in preds.items():
        cond = cond & (F.col(f"{c}__mx") >= lo) & (F.col(f"{c}__mn") <= hi)
    return per_file.filter(cond).count(), total


def candidate_files_for_box(
    spark: SparkSession, path: str, x: str, y: str, box
) -> tuple[int, int]:
    """2-D convenience wrapper over candidate_files_for_preds."""
    x_lo, x_hi, y_lo, y_hi = box
    return candidate_files_for_preds(
        spark, path, {x: (x_lo, x_hi), y: (y_lo, y_hi)}
    )


def zorder_scan(
    spark: SparkSession, path: str, preds: dict[str, tuple]
) -> DataFrame:
    """Driver-side file skipping over a z-ordered directory: read each
    file's [min, max] for the predicate columns straight from its
    parquet FOOTER (no data read, no Spark job — the same
    `_file_stats` the manifest snapshot store uses), drop files
    provably disjoint from every band, and plan the scan over the
    survivors only. Parquet row-group stats would prune the same rows
    eventually, but only after a task is scheduled per file — at 100 TB
    and a selective box that is millions of no-op tasks; skipping at
    the driver never schedules them. The residual band filter still
    applies (file-level stats are necessary, not sufficient)."""
    import os

    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.sources.bucketed import _file_stats

    cols = tuple(preds)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    kept = []
    for f in files:
        st = _file_stats(f, cols)
        drop = False
        for c, (lo, hi) in preds.items():
            rng = st.get(c)
            if rng is not None and (rng[1] < lo or rng[0] > hi):
                drop = True
                break
        if not drop:
            kept.append(f)
    cond = F.lit(True)
    for c, (lo, hi) in preds.items():
        cond = cond & (F.col(c) >= lo) & (F.col(c) <= hi)
    if not kept:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*kept).filter(cond)


def _hilbert_d(df: DataFrame, bx: str, by: str) -> DataFrame:
    """Append `_hd`, the Hilbert d-index of the (bx, by) bucket pair
    (0..255 each): the xy2d walk unrolled into 8 successive narrow
    projections — pure integer CASE arithmetic, no UDF (same
    expressions as operators/analytics.hilbert_value)."""
    n1 = (1 << _ZBITS) - 1
    out = df.withColumn("_hx", F.col(bx)).withColumn(
        "_hy", F.col(by)
    ).withColumn("_hd", F.lit(0).cast("long"))
    for b in reversed(range(_ZBITS)):
        s = 1 << b
        rx = f"(shiftright(_hx, {b}) & 1)"
        ry = f"(shiftright(_hy, {b}) & 1)"
        quad = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
        keep = [c for c in out.columns if c not in ("_hx", "_hy", "_hd")]
        out = out.select(
            *keep,
            F.expr(
                f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                f"THEN {n1} - _hy ELSE _hy END) ELSE _hx END"
            ).alias("_hx"),
            F.expr(
                f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                f"THEN {n1} - _hx ELSE _hx END) ELSE _hy END"
            ).alias("_hy"),
            F.expr(f"_hd + {s * s} * {quad}").alias("_hd"),
        )
    return out.drop("_hx", "_hy")


def write_hilbert(
    df: DataFrame,
    x: str,
    y: str,
    path: str,
    n_files: int = 16,
    rank_based: bool = False,
) -> None:
    """write_zorder's contract with the Hilbert d-index as the sort
    key: unit-step adjacency means a range of the key is ONE
    contiguous blob of the (x, y) plane, so each output file covers a
    tighter min/max box than Morton's quadrant jumps give — strictly
    better file-level pruning for 2-D band queries (asserted in
    tests). Same cost shape: one stats pass, one range-partition
    shuffle, a within-file sort."""
    dims = [x, y]
    if rank_based:
        buckets = [_rank_bucket_expr(df, c) for c in dims]
    else:
        aggs = []
        for c in dims:
            aggs += [F.min(c).alias(f"{c}__mn"), F.max(c).alias(f"{c}__mx")]
        st = df.agg(*aggs).collect()[0]
        buckets = [
            _bucket_expr(c, float(st[f"{c}__mn"]), float(st[f"{c}__mx"]))
            for c in dims
        ]
    out = df.withColumn("_b0", buckets[0]).withColumn("_b1", buckets[1])
    (
        _hilbert_d(out, "_b0", "_b1")
        .repartitionByRange(n_files, "_hd")
        .sortWithinPartitions("_hd")
        .drop("_b0", "_b1", "_hd")
        .write.mode("overwrite")
        .parquet(path)
    )
