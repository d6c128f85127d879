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
