"""Time-series operators over ``events`` (SURVEY.md §2.2 extension):
gap-filled resampling, winsorization, and equi-depth histograms.

Design notes (100 TB posture):
- ``resample_gapfill`` generates each key's calendar grid with
  ``sequence()`` + ``explode`` — the grid is born distributed, sized
  by that key's own span, and never leaves the key's partition; the
  forward fill is one window over (user, day), i.e. the same shuffle
  the daily aggregate already paid. No driver-side calendars.
- ``value_winsorize`` / ``equidepth_histogram`` reduce the fact table
  to a tiny exact-percentile aggregate (one row, or one per group)
  that is broadcast back — never a global sort and never NTILE over a
  single partition, which is the classic equi-depth scale trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesis_to_firehose_spark.registry import register
from kinesis_to_firehose_spark.sources.tables import load

# --------------------------------------------------------------------------
# resample_gapfill — hypertable-style resample: daily grid per user
# between that user's first and last active day, day-value = rounded
# daily sum, gaps forward-filled from the last observed day. The
# rounding happens BEFORE the fill so both engines propagate an
# identical double.
# --------------------------------------------------------------------------
RESAMPLE_SQL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2)::DOUBLE AS day_value
  FROM events
  GROUP BY user_id, date_trunc('day', ts)
), grid AS (
  SELECT user_id,
         unnest(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY)) AS day
  FROM daily
  GROUP BY user_id
)
SELECT g.user_id, g.day,
       last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value,
       CAST(d.day_value IS NULL AS BOOLEAN) AS is_gap
FROM grid g
LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
ORDER BY g.user_id, g.day
"""


@register("resample_gapfill", RESAMPLE_SQL)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("day_value")
    )
    grid = (
        daily.groupBy("user_id")
        .agg(
            F.sequence(
                F.min("day"), F.max("day"), F.expr("INTERVAL 1 DAY")
            ).alias("days")
        )
        .select("user_id", F.explode("days").alias("day"))
    )
    joined = grid.alias("g").join(
        daily.alias("d"),
        (F.col("g.user_id") == F.col("d.user_id"))
        & (F.col("g.day") == F.col("d.day")),
        "left",
    )
    w = (
        W.partitionBy("g.user_id")
        .orderBy("g.day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        joined.select(
            F.col("g.user_id").alias("user_id"),
            F.col("g.day").alias("day"),
            F.last("d.day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("d.day_value").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "day")
    )


# --------------------------------------------------------------------------
# value_winsorize — robust-mean preprocessing: clip value to the
# [p05, p95] of its event_type, report raw vs winsorized mean and the
# clipped-row count. Exact percentiles: Spark `percentile` ==
# DuckDB `quantile_cont` (same linear interpolation).
# --------------------------------------------------------------------------
# Winsorized mean in EXACT integer arithmetic end-to-end. Two sf1
# parity forks are closed here: (1) each engine's continuous-quantile
# interpolation (`quantile_cont` vs `percentile`) computes the same
# bound a few ulps apart, which flips the classification of the
# (many, because values are 2 dp-quantized) rows TIED at the
# boundary — so the 5%/95% bounds are derived from ORDER STATS in
# cents with rational interpolation: p·(n−1) = k/20 exactly, so the
# bound scaled by 20 is the integer v_k·(20−m) + v_{k+1}·m and the
# clip test is an integer comparison (c·20 vs bound). (2) the
# clamped-mean AVG over doubles is fold-order dependent — in-range
# values sum as exact cents, tails contribute count·bound from the
# same integers, so the pre-ROUND value is bit-identical; the
# no-clipping branch is a pure integer ratio and uses exact half-up
# integer rounding. The per-type window sort is how exact quantiles
# are priced anyway (parallel across types; the equi-depth op keeps
# the sort-free approximate path).
WINSORIZE_SQL = """
WITH vc AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
  FROM events
),
ranked AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM vc
),
bounds AS (
  SELECT event_type,
         MAX(n) AS n,
         MAX(CASE WHEN rn - 1 = (n - 1) // 20 THEN c END) AS lo_lo,
         MAX(CASE WHEN rn - 1 = (n - 1) // 20 + 1 THEN c END) AS lo_up,
         MAX(CASE WHEN rn - 1 = (19 * (n - 1)) // 20 THEN c END) AS hi_lo,
         MAX(CASE WHEN rn - 1 = (19 * (n - 1)) // 20 + 1 THEN c END) AS hi_up
  FROM ranked GROUP BY event_type
),
q AS (
  SELECT event_type, n,
         lo_lo * (20 - (n - 1) % 20)
           + COALESCE(lo_up, lo_lo) * ((n - 1) % 20) AS los,
         hi_lo * (20 - (19 * (n - 1)) % 20)
           + COALESCE(hi_up, hi_lo) * ((19 * (n - 1)) % 20) AS his
  FROM bounds
),
per AS (
  SELECT v.event_type,
         MAX(q.n) AS n, MAX(q.los) AS los, MAX(q.his) AS his,
         SUM(v.c) AS cents_all,
         SUM(CASE WHEN v.c * 20 >= q.los AND v.c * 20 <= q.his
                  THEN v.c ELSE 0 END) AS cents_mid,
         CAST(SUM(CASE WHEN v.c * 20 < q.los THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lo,
         CAST(SUM(CASE WHEN v.c * 20 > q.his THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi
  FROM vc v JOIN q ON v.event_type = q.event_type
  GROUP BY v.event_type
)
SELECT event_type,
       CAST((CAST(cents_all AS BIGINT) * 200 + n) // (n * 2) AS DOUBLE)
         / 10000.0 AS avg_raw,
       CASE WHEN n_lo + n_hi = 0
            THEN CAST((CAST(cents_mid AS BIGINT) * 200 + n) // (n * 2)
                      AS DOUBLE) / 10000.0
            ELSE ROUND((CAST(cents_mid AS DOUBLE) / 100.0
                        + n_lo * (CAST(los AS DOUBLE) / 2000.0)
                        + n_hi * (CAST(his AS DOUBLE) / 2000.0)) / n, 4) END
         AS avg_winsorized,
       n_lo + n_hi AS n_clipped
FROM per
ORDER BY event_type
"""


@register("value_winsorize", WINSORIZE_SQL)
def value_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    vc = e.select(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("c"),
    )
    wt = W.partitionBy("event_type")
    ranked = vc.select(
        "event_type",
        "c",
        F.row_number().over(wt.orderBy("c")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(F.expr("CASE WHEN rn - 1 = (n - 1) DIV 20 THEN c END")).alias(
            "lo_lo"
        ),
        F.max(
            F.expr("CASE WHEN rn - 1 = (n - 1) DIV 20 + 1 THEN c END")
        ).alias("lo_up"),
        F.max(
            F.expr("CASE WHEN rn - 1 = (19 * (n - 1)) DIV 20 THEN c END")
        ).alias("hi_lo"),
        F.max(
            F.expr("CASE WHEN rn - 1 = (19 * (n - 1)) DIV 20 + 1 THEN c END")
        ).alias("hi_up"),
    )
    q = bounds.select(
        F.col("event_type").alias("q_type"),
        "n",
        F.expr(
            "lo_lo * (20 - (n - 1) % 20)"
            " + COALESCE(lo_up, lo_lo) * ((n - 1) % 20)"
        ).alias("los"),
        F.expr(
            "hi_lo * (20 - (19 * (n - 1)) % 20)"
            " + COALESCE(hi_up, hi_lo) * ((19 * (n - 1)) % 20)"
        ).alias("his"),
    )
    per = (
        vc.join(F.broadcast(q), vc["event_type"] == q["q_type"])
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("los").alias("los"),
            F.max("his").alias("his"),
            F.sum("c").alias("cents_all"),
            F.sum(
                F.expr(
                    "CASE WHEN c * 20 >= los AND c * 20 <= his"
                    " THEN c ELSE 0 END"
                )
            ).alias("cents_mid"),
            F.sum(F.expr("CASE WHEN c * 20 < los THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_lo"),
            F.sum(F.expr("CASE WHEN c * 20 > his THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_hi"),
        )
    )
    return per.select(
        "event_type",
        F.expr(
            "CAST((CAST(cents_all AS BIGINT) * 200 + n) DIV (n * 2)"
            " AS DOUBLE) / 10000.0"
        ).alias("avg_raw"),
        F.expr(
            "CASE WHEN n_lo + n_hi = 0"
            " THEN CAST((CAST(cents_mid AS BIGINT) * 200 + n) DIV (n * 2)"
            "      AS DOUBLE) / 10000.0"
            " ELSE ROUND((CAST(cents_mid AS DOUBLE) / 100.0"
            "             + n_lo * (CAST(los AS DOUBLE) / 2000.0)"
            "             + n_hi * (CAST(his AS DOUBLE) / 2000.0)) / n, 4)"
            " END"
        ).alias("avg_winsorized"),
        (F.col("n_lo") + F.col("n_hi")).cast("bigint").alias("n_clipped"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# equidepth_histogram — 10 equal-population bins over `value` WITHOUT
# a global sort: exact decile edges come from one tiny percentile
# aggregate (broadcast back), and bin assignment is a narrow
# comparison map. NTILE over a single partition — the naive plan —
# would serialize the whole table through one task at 100 TB.
# --------------------------------------------------------------------------
_EDGE_PS = [i / 10 for i in range(1, 10)]  # 0.1 .. 0.9

EQUIDEPTH_SQL = f"""
WITH edges AS (
  SELECT {', '.join(f'quantile_cont(value, {p}) AS e{i}'
                    for i, p in enumerate(_EDGE_PS, 1))}
  FROM events
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(value), 4) AS lo, ROUND(MAX(value), 4) AS hi
FROM (
  SELECT value,
         1 {' '.join(f'+ CASE WHEN value > e{i} THEN 1 ELSE 0 END'
                     for i in range(1, 10))} AS bin
  FROM events, edges
)
GROUP BY bin
ORDER BY bin
"""


@register("equidepth_histogram", EQUIDEPTH_SQL)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    edges = e.agg(
        *[
            F.expr(f"percentile(value, {p})").alias(f"e{i}")
            for i, p in enumerate(_EDGE_PS, 1)
        ]
    )
    bin_col = F.lit(1)
    for i in range(1, 10):
        bin_col = bin_col + (F.col("value") > F.col(f"e{i}")).cast("int")
    return (
        e.join(F.broadcast(edges))
        .select("value", bin_col.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# ewma_smooth — exponentially-weighted moving average of `value` per
# event_type series (ordered by ts, event_id), truncated at 4 lags
# with α = 1/2. The α choice is deliberate: 1/2^k coefficients are
# exact binary fractions, and the weighted sum is an EXPLICIT
# left-to-right arithmetic tree over lag() columns — no SUM() over a
# frame, no pow() — so both engines produce bit-identical doubles.
# Early rows renormalize over the lags that exist (missing lag ⇒ its
# coefficient drops from the denominator).
#
# Plan shape at 100 TB: one shuffle on the series key, then four
# narrow lag() reads inside a single window stage. With few, hot
# series (5 event types here) a real deployment range-partitions each
# series by time bucket and stitches the 4-row boundary overlap —
# noted rather than built because the stitch is testdata-invisible.
# --------------------------------------------------------------------------
_EWMA_LAGS = 4  # value + 4 lags, coefficients 1, 1/2, 1/4, 1/8, 1/16


def _ewma_terms(val: str, lags: list[str]) -> tuple[str, str]:
    """(numerator, denominator) SQL with per-row renormalization."""
    num = [val]
    den = ["1.0"]
    for i, lg in enumerate(lags, start=1):
        c = f"{1.0 / (1 << i)!r}"
        num.append(f"CASE WHEN {lg} IS NULL THEN 0.0 ELSE {lg} * {c} END")
        den.append(f"CASE WHEN {lg} IS NULL THEN 0.0 ELSE {c} END")
    return " + ".join(num), " + ".join(den)


EWMA_SQL = f"""
WITH lagged AS (
  SELECT event_id, event_type, ts, value,
         {", ".join(
             f"lag(value, {i}) OVER (PARTITION BY event_type "
             f"ORDER BY ts, event_id) AS l{i}"
             for i in range(1, _EWMA_LAGS + 1)
         )}
  FROM events
)
SELECT event_id, event_type, ts, value,
       ROUND(({_ewma_terms("value", [f"l{i}" for i in range(1, _EWMA_LAGS + 1)])[0]})
             / ({_ewma_terms("value", [f"l{i}" for i in range(1, _EWMA_LAGS + 1)])[1]}),
             6) AS ewma
FROM lagged
ORDER BY event_type, ts, event_id
"""


@register("ewma_smooth", EWMA_SQL)
def ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = e.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        *[
            F.lag("value", i).over(w).alias(f"l{i}")
            for i in range(1, _EWMA_LAGS + 1)
        ],
    )
    num, den = _ewma_terms(
        "value", [f"l{i}" for i in range(1, _EWMA_LAGS + 1)]
    )
    return lagged.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.round(F.expr(f"({num}) / ({den})"), 6).alias("ewma"),
    ).orderBy("event_type", "ts", "event_id")


# --------------------------------------------------------------------------
# anomaly_mad — robust outlier detection per series: median absolute
# deviation instead of z-scores (value_outliers), so a few extreme
# points can't inflate the threshold that is supposed to catch them
# (the classic z-score masking failure). Flag |x - median| >
# K·MAD, K = 3·1.4826 (the Gaussian consistency constant). Two tiny
# per-type aggregates (median, then MAD on the residual) broadcast
# back; the flagging pass is narrow. Medians are exact percentiles
# rounded to 4dp before the residual so both engines branch on
# identical doubles.
# --------------------------------------------------------------------------
_MAD_K = "4.4478"  # 3 * 1.4826, fixed-text literal → same double both engines

ANOMALY_MAD_SQL = f"""
WITH med AS (
  SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type,
         ROUND(quantile_cont(ABS(e.value - m.med), 0.5), 4) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
       ROUND(ABS(e.value - m.med), 4) AS abs_dev
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE ABS(e.value - m.med) > CAST({_MAD_K} AS DOUBLE) * d.mad
ORDER BY e.event_id
"""


@register("anomaly_mad", ANOMALY_MAD_SQL)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    med = e.groupBy(F.col("event_type").alias("m_type")).agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("med")
    )
    # materialized: both the MAD aggregate and the flagging pass
    # consume this join — without a cut each replays the events scan
    with_med = (
        e.join(F.broadcast(med), F.col("event_type") == F.col("m_type"))
        .drop("m_type")
        .localCheckpoint(eager=True)
    )
    mad = with_med.groupBy(F.col("event_type").alias("d_type")).agg(
        F.round(
            F.expr("percentile(ABS(value - med), 0.5)"), 4
        ).alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), F.col("event_type") == F.col("d_type"))
        .filter(
            F.abs(F.col("value") - F.col("med"))
            > F.expr(f"CAST({_MAD_K} AS DOUBLE)") * F.col("mad")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            "med",
            "mad",
            F.round(F.abs(F.col("value") - F.col("med")), 4).alias("abs_dev"),
        )
        .orderBy("event_id")
    )
