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


def _pid_expr(key: str, n_key_files: int):
    from pyspark.sql import functions as F

    return F.pmod(F.hash(F.col(key)), F.lit(n_key_files))


def write_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    path: str,
    key: str = "user_id",
    n_key_files: int = 8,
) -> None:
    """Persist a current-state snapshot (latest_per_key/merge_upsert
    output) laid out for point lookups: Hive-style partition dirs
    `_pid=<pmod(murmur3(key), n)>`, one sorted file per dir. Every key
    lives in exactly one partition DIRECTORY (a pure function of the
    key), so lookups prune at PLANNING time on _pid and targeted
    merges can swap whole dirs. Directory naming — unlike output-file
    task numbering — survives AQE coalescing of the pre-write
    shuffle. This is the serve-side half of the CDC pattern: the
    stream maintains the snapshot, the batch writer lays it out for
    reads.

    At 100 TB: n_key_files scales with snapshot size (one dir ≈ one
    128-256 MiB working set); the repartition is the single shuffle
    the write pays, and readers pay none."""
    import json
    import os

    (
        snapshot.withColumn("_pid", _pid_expr(key, n_key_files))
        .repartition(n_key_files, "_pid")
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .partitionBy("_pid")
        .parquet(path)
    )
    # layout params travel with the store: readers and mergers must
    # use the SAME (key, n) or they prune/target the wrong dirs
    with open(os.path.join(path, "_snapshot_meta.json"), "w") as f:
        json.dump({"key": key, "n_key_files": n_key_files}, f)


def _read_meta(path: str) -> dict | None:
    import json
    import os

    meta_path = os.path.join(path, "_snapshot_meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


def snapshot_lookup(
    spark: SparkSession,
    path: str,
    key: str,
    values,
    n_key_files: int | None = None,
) -> DataFrame:
    """Point lookup against a written snapshot. The key IN-filter is
    pushed to the parquet scan (PushedFilters), and because _pid is a
    pure function of the key, the lookup also names its partition
    dirs up front — PartitionFilters prune every other dir at
    planning time, before any file is opened."""
    from pyspark.sql import functions as F

    meta = _read_meta(path)
    if n_key_files is None:
        if meta is None:
            # guessing a modulus silently prunes the WRONG dirs and
            # returns empty results for keys that exist — refuse
            raise ValueError(
                f"snapshot at {path!r} has no _snapshot_meta.json; pass "
                "n_key_files explicitly (it must match the written layout)"
            )
        n_key_files = meta["n_key_files"]
    values = list(values)
    df = spark.read.parquet(path)
    if not values:
        return df.filter(F.lit(False))
    pids = sorted(
        r["p"]
        for r in spark.createDataFrame([(v,) for v in values], [key])
        .select(_pid_expr(key, n_key_files).alias("p"))
        .distinct()
        .collect()
    )
    return df.filter(df[key].isin(values) & F.col("_pid").isin(pids))


def snapshot_merge_targeted(
    spark: SparkSession,
    snapshot_dir: str,
    changes: DataFrame,
    key: str = "user_id",
    n_key_files: int = 8,
) -> list[int]:
    """MERGE an epoch's changed rows into the snapshot store touching
    ONLY the partition dirs that contain changed keys: the changed
    keys name their `_pid=` dirs (pure function of the key), those
    dirs alone are read, merged with the changes (newest wins), and
    swapped in with a directory rename — unaffected dirs are never
    read or written. Returns the rewritten partition ids.

    At 100 TB this is the difference between an epoch costing
    O(changed partitions) and O(snapshot). The per-dir swap is
    rename-based (a reader races either the old or the new dir, and
    never sees a half-written one because the tmp dir is fully
    written first); cross-dir atomicity would take a version
    manifest, noted in SURVEY round-4 candidates."""
    import os
    import shutil

    meta = _read_meta(snapshot_dir)
    if meta:
        key, n_key_files = meta["key"], meta["n_key_files"]

    def dir_for(p: int) -> str:
        return os.path.join(snapshot_dir, f"_pid={p}")

    has_store = os.path.isdir(snapshot_dir) and any(
        f.startswith("_pid=") for f in os.listdir(snapshot_dir)
    )
    if not has_store:
        write_snapshot(spark, changes, snapshot_dir, key, n_key_files)
        return sorted(
            int(f.split("=", 1)[1])
            for f in os.listdir(snapshot_dir)
            if f.startswith("_pid=")
        )

    changed_pids = sorted(
        r["p"]
        for r in changes.select(_pid_expr(key, n_key_files).alias("p"))
        .distinct()
        .collect()
    )
    affected = [dir_for(p) for p in changed_pids if os.path.isdir(dir_for(p))]
    if affected:
        current = spark.read.parquet(*affected)  # no _pid col: recomputed
        merged = current.join(
            changes.select(key), key, "left_anti"
        ).unionByName(changes)
    else:
        merged = changes
    tmp = snapshot_dir.rstrip("/") + ".tmp-epoch"
    shutil.rmtree(tmp, ignore_errors=True)
    write_snapshot(spark, merged, tmp, key, n_key_files)
    for p in changed_pids:
        src = os.path.join(tmp, f"_pid={p}")
        if not os.path.isdir(src):
            continue  # all of p's keys deleted upstream — not our case
        dst = dir_for(p)
        shutil.rmtree(dst, ignore_errors=True)
        os.rename(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return changed_pids
