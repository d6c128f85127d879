"""Log-pipeline parity ops (SURVEY.md §2.1) — the reference's record
path re-expressed as batch queries over `events`.

Reference semantics being mirrored:
- decode+enhance: firehose_sender.go:62-76 (ProcessMessage →
  decode.ParseAndEnhance → json.Marshal + '\n')
- allowlist / drop: batchconsumer tag routing (dropped records skip
  delivery)
- oversize dead-letter: Firehose 1000 KiB record cap (scaled down for
  the testdata)
- batch planning: main.go:50-53 (BatchCount=500, BatchSize=4 MiB per
  output stream, arrival order)
- drop stats: sender/stats/stats.go (1-minute tumbling counts of
  dropped records by app/level)

Scale notes: decode/serialize/filter are narrow (no shuffle).
batch_planner needs arrival order *per stream* only, so it window-
partitions by stream — at 100 TB this is a range-partition per key
group, never a global sort. drop_stats/throughput are partial-agg
(map-side combine) with tiny results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesis_to_firehose_spark.functions.decode import (
    DECODED_SQL,
    JSONL_SQL,
    MAX_RECORD_BYTES,
    decode_enhance,
    jsonl_line,
)
from kinesis_to_firehose_spark.registry import register
from kinesis_to_firehose_spark.sources.tables import load

ALLOWED_TYPES = ("click", "view", "purchase", "signup")

BATCH_COUNT = 500  # main.go:51 BatchCount


def _decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_enhance(load(spark, "events", sf_dir))


# --------------------------------------------------------------------------
DECODE_SQL = f"""
WITH decoded AS ({DECODED_SQL})
SELECT event_id, ts, user_id, event_type, value, rawlog, prop_k, env,
       hostname, container_app, level
FROM decoded
"""


@register("decode_parse_enhance", DECODE_SQL)
def decode_parse_enhance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _decoded(spark, sf_dir)


# --------------------------------------------------------------------------
SERIALIZE_SQL = f"""
WITH decoded AS ({DECODED_SQL})
SELECT event_id, {JSONL_SQL} AS line, LENGTH({JSONL_SQL}) + 1 AS line_bytes
FROM decoded
"""


@register("serialize_jsonl", SERIALIZE_SQL)
def serialize_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _decoded(spark, sf_dir)
    line = jsonl_line(d)
    # +1: the reference appends '\n' per record (firehose_sender.go:73)
    return d.select(
        "event_id",
        line.alias("line"),
        (F.length(line) + 1).cast("bigint").alias("line_bytes"),
    )


# --------------------------------------------------------------------------
FILTER_SQL = """
SELECT event_id, ts, user_id, event_type
FROM events
WHERE event_type IN ('click', 'view', 'purchase', 'signup')
"""


@register("filter_allowlist", FILTER_SQL)
def filter_allowlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, "events", sf_dir)
    return e.filter(F.col("event_type").isin(*ALLOWED_TYPES)).select(
        "event_id", "ts", "user_id", "event_type"
    )


# --------------------------------------------------------------------------
DEAD_LETTER_SQL = f"""
WITH decoded AS ({DECODED_SQL}),
serialized AS (
  SELECT event_id, event_type, LENGTH({JSONL_SQL}) + 1 AS line_bytes
  FROM decoded
)
SELECT event_id, event_type, line_bytes
FROM serialized
WHERE line_bytes > {MAX_RECORD_BYTES}
"""


@register("decode_dead_letter", DEAD_LETTER_SQL)
def decode_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oversize records → dead-letter set (Firehose record cap analogue)."""
    d = _decoded(spark, sf_dir)
    line_bytes = (F.length(jsonl_line(d)) + 1).cast("bigint").alias("line_bytes")
    return (
        d.select("event_id", "event_type", line_bytes)
        .filter(F.col("line_bytes") > MAX_RECORD_BYTES)
    )


# --------------------------------------------------------------------------
BATCH_PLAN_SQL = f"""
WITH decoded AS ({DECODED_SQL}),
serialized AS (
  SELECT event_id, event_type AS stream, ts,
         LENGTH({JSONL_SQL}) + 1 AS line_bytes
  FROM decoded
),
numbered AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY stream ORDER BY ts, event_id) AS rn
  FROM serialized
)
SELECT stream,
       CAST(FLOOR((rn - 1) / {BATCH_COUNT}) AS BIGINT) AS batch_idx,
       COUNT(*) AS n_records,
       CAST(SUM(line_bytes) AS BIGINT) AS batch_bytes,
       MIN(event_id) AS first_event_id,
       MAX(event_id) AS last_event_id
FROM numbered
GROUP BY stream, batch_idx
ORDER BY stream, batch_idx
"""


@register("batch_planner", BATCH_PLAN_SQL)
def batch_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign records to ≤500-count delivery batches per stream, in
    arrival order, and report per-batch size (main.go:50-53)."""
    d = _decoded(spark, sf_dir)
    line_bytes = (F.length(jsonl_line(d)) + 1).cast("bigint").alias("line_bytes")
    s = d.select("event_id", F.col("event_type").alias("stream"), "ts", line_bytes)
    w = W.partitionBy("stream").orderBy("ts", "event_id")
    numbered = s.withColumn("rn", F.row_number().over(w))
    return (
        numbered.withColumn(
            "batch_idx", F.floor((F.col("rn") - 1) / BATCH_COUNT).cast("bigint")
        )
        .groupBy("stream", "batch_idx")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("line_bytes").alias("batch_bytes"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
        .orderBy("stream", "batch_idx")
    )


# --------------------------------------------------------------------------
DROP_STATS_SQL = """
SELECT date_trunc('minute', ts) AS minute,
       event_type AS container_app,
       CASE WHEN value < 50 THEN 'warning' ELSE 'critical' END AS level,
       COUNT(*) AS n_dropped
FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
GROUP BY minute, container_app, level
ORDER BY minute, container_app, level
"""


@register("drop_stats", DROP_STATS_SQL)
def drop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute tumbling counts of dropped records (stats.go analogue)."""
    e = load(spark, "events", sf_dir)
    dropped = e.filter(~F.col("event_type").isin(*ALLOWED_TYPES))
    level = F.when(F.col("value") < 50, F.lit("warning")).otherwise(
        F.lit("critical")
    )
    return (
        dropped.select(
            F.date_trunc("minute", "ts").alias("minute"),
            F.col("event_type").alias("container_app"),
            level.alias("level"),
        )
        .groupBy("minute", "container_app", "level")
        .agg(F.count("*").alias("n_dropped"))
        .orderBy("minute", "container_app", "level")
    )


# --------------------------------------------------------------------------
THROUGHPUT_SQL = """
SELECT user_id AS shard,
       date_trunc('minute', ts) AS minute,
       COUNT(*) AS n_records,
       ROUND(COUNT(*) / 60.0, 4) AS records_per_sec
FROM events
GROUP BY shard, minute
"""


@register("throughput_rate", THROUGHPUT_SQL)
def throughput_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard per-minute read rate (READ_RATE_LIMIT observability)."""
    e = load(spark, "events", sf_dir)
    return (
        e.groupBy(
            F.col("user_id").alias("shard"),
            F.date_trunc("minute", "ts").alias("minute"),
        )
        .agg(
            F.count("*").alias("n_records"),
            F.round(F.count("*") / 60.0, 4).alias("records_per_sec"),
        )
    )
