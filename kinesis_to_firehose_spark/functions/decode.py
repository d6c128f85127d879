"""Record decode/enhance + canonical serialization (reference parity).

Models `decode.ParseAndEnhance` as used by the reference consumer
(/root/reference/sender/firehose_sender.go:62-76): parse the payload,
enhance with deploy-env + container metadata, keep the raw log; then
serialize to one canonical JSON line per record (firehose_sender.go:68-74
appends '\n' after json.Marshal).

Everything here is native Spark `F.*` — narrow ops, no shuffle, fully
inside whole-stage codegen, so decode keeps scan-speed at 100 TB.

The `events` table stands in for the Kinesis stream: `props` is the
kayvee-style JSON payload, `event_type` the container app/level
routing key, `user_id` the shard key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPLOY_ENV = "production"

# Firehose caps records at 1000 KiB; the testdata analogue that keeps a
# realistic (~5%) oversize/dead-letter rate is 135 chars.
MAX_RECORD_BYTES = 135


def decode_enhance(events: DataFrame) -> DataFrame:
    """ParseAndEnhance analogue: payload parse + metadata enhancement."""
    level = F.when(F.col("event_type") == "error", F.lit("error")).otherwise(
        F.lit("info")
    )
    return events.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
        F.col("props").alias("rawlog"),
        # try_cast, not cast: under ANSI mode (Spark 4 default) a
        # single non-numeric payload field would fail the whole job;
        # the reference fails per record (ProcessMessage error), so a
        # bad field must degrade to NULL for that record only.
        F.get_json_object("props", "$.k").try_cast("int").alias("prop_k"),
        F.lit(DEPLOY_ENV).alias("env"),
        F.concat(F.lit("ip-10-0-0-"), F.col("user_id").cast("string")).alias(
            "hostname"
        ),
        F.col("event_type").alias("container_app"),
        level.alias("level"),
    )


def jsonl_line(df: DataFrame) -> Column:
    """Canonical JSON line (sorted keys, fixed formats) for a decoded df.

    Deterministic across engines: timestamps at micro precision,
    doubles via %.2f, so the DuckDB oracle reproduces it byte-for-byte.
    """
    return F.concat(
        F.lit('{"env":"production","event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"event_type":"'),
        F.col("event_type"),
        F.lit('","k":'),
        F.coalesce(F.col("prop_k").cast("string"), F.lit("null")),
        F.lit(',"level":"'),
        F.col("level"),
        F.lit('","ts":"'),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit('","user_id":'),
        F.col("user_id").cast("string"),
        F.lit(',"value":'),
        F.format_string("%.2f", F.col("value")),
        F.lit("}"),
    )


# SQL fragment mirroring jsonl_line for the DuckDB oracles (applied on
# top of the decoded projection below).
JSONL_SQL = (
    "'{\"env\":\"production\",\"event_id\":' || CAST(event_id AS VARCHAR)"
    " || ',\"event_type\":\"' || event_type"
    " || '\",\"k\":' || COALESCE(CAST(prop_k AS VARCHAR), 'null')"
    " || ',\"level\":\"' || level"
    " || '\",\"ts\":\"' || strftime(ts, '%Y-%m-%d %H:%M:%S.%f')"
    " || '\",\"user_id\":' || CAST(user_id AS VARCHAR)"
    " || ',\"value\":' || printf('%.2f', value)"
    " || '}'"
)

# Decoded-events CTE for the DuckDB oracles (column parity with
# decode_enhance()).
DECODED_SQL = """
SELECT
  event_id,
  ts,
  user_id,
  event_type,
  value,
  props AS rawlog,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
  'production' AS env,
  'ip-10-0-0-' || CAST(user_id AS VARCHAR) AS hostname,
  event_type AS container_app,
  CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END AS level
FROM events
"""
