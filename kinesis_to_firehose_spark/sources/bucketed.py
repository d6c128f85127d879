"""Bucketed-table co-located joins (SURVEY.md §6 / round-2 plan).

At 100 TB the recurring fact-fact join (lineitem ⋈ orders on orderkey)
pays a full shuffle of both sides EVERY query. Writing both tables
bucketed by the join key (`bucketBy(n, key).sortBy(key)`) moves that
shuffle to write time, once: Spark's scan then reports the bucket
partitioning, and a join of two tables bucketed on the same key with
the same bucket count needs NO Exchange on either side — the
SortMergeJoin reads co-located buckets directly. That is the batch
analogue of Kinesis shard co-partitioning the reference gets for free
from KCL.

Bucket-count sizing: buckets are the join parallelism AND the per-task
memory unit; pick n so a bucket of the LARGER table fits an executor
core's working set (~128-256 MiB of lineitem at 100 TB ⇒ thousands of
buckets; at test scale a handful). Both tables MUST use the same n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_to_firehose_spark.sources.tables import load


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    n_buckets: int,
    database: str = "bucketed",
) -> str:
    """Write a testdata table as a bucketed+sorted managed table and
    return its qualified name. Requires a warehouse dir on the session
    (any local dir works; cluster deployments use the catalog)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    qualified = f"{database}.{table}"
    spark.sql(f"DROP TABLE IF EXISTS {qualified}")
    # DROP leaves the location behind if a previous write died midway;
    # a stale dir fails the next saveAsTable outright.
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{database}.db/{table}", ignore_errors=True)
    (
        load(spark, table, sf_dir)
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(qualified)
    )
    return qualified


def cobucketed_join(
    spark: SparkSession, left: str, right: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. With matching
    bucket counts the plan has zero Exchanges — assert via
    plans.explain in tests."""
    l = spark.table(left)
    r = spark.table(right)
    return l.join(r, l[key_l] == r[key_r])


def write_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    path: str,
    key: str = "user_id",
    n_key_files: int = 8,
) -> None:
    """Persist a current-state snapshot (latest_per_key/merge_upsert
    output) laid out for point lookups: repartitioned BY THE KEY into
    a fixed file count and sorted within files, so every key lives in
    exactly one file and a key-equality scan prunes to it via the
    parquet min/max row-group stats. This is the serve-side half of
    the CDC pattern: the stream maintains the snapshot, the batch
    writer lays it out for reads.

    At 100 TB: n_key_files scales with snapshot size (one file ≈ one
    128-256 MiB working set); the repartition is the single shuffle
    the write pays, and readers pay none."""
    (
        snapshot.repartition(n_key_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def snapshot_lookup(spark: SparkSession, path: str, key: str, values) -> DataFrame:
    """Point lookup against a written snapshot: an IN filter on the
    layout key. Catalyst pushes it to the parquet scan, and the
    sorted-by-key file layout means row-group stats skip everything
    but the files holding those keys (assert PushedFilters in tests)."""
    df = spark.read.parquet(path)
    return df.filter(df[key].isin(list(values)))
