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


def _chaos_hook(stage: str) -> None:
    """Fault-injection point for crash-atomicity tests. No-op in
    production; tests monkeypatch it to raise at a chosen stage and
    then assert readers never observe a half-written store."""


def _write_version_data(
    snapshot: DataFrame, version_dir: str, key: str, n_key_files: int
) -> None:
    (
        snapshot.withColumn("_pid", _pid_expr(key, n_key_files))
        .repartition(n_key_files, "_pid")
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .partitionBy("_pid")
        .parquet(version_dir)
    )


def _commit_meta(path: str, meta: dict) -> None:
    """Single-file atomic commit: the meta json names the current
    version; os.replace makes the flip all-or-nothing, so a reader
    resolves either the old complete version or the new complete
    version, never a partial build."""
    import json
    import os

    tmp = os.path.join(path, "_snapshot_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, "_snapshot_meta.json"))


def _gc_versions(path: str, keep_version: int) -> None:
    """Drop version dirs other than the committed one plus any dead
    build/tmp dirs. Safe to run any time: only the meta-named version
    is ever read."""
    import os
    import shutil

    if not os.path.isdir(path):
        return
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.startswith("v=") and d != f"v={keep_version}":
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith(".build-") or d == "_snapshot_meta.json.tmp":
            shutil.rmtree(full, ignore_errors=True) if os.path.isdir(
                full
            ) else os.remove(full)


def snapshot_data_root(path: str) -> str:
    """Resolve the directory readers should scan: the committed
    version dir when the store is versioned, the path itself for
    legacy flat layouts."""
    import os

    meta = _read_meta(path)
    if meta and "version" in meta:
        return os.path.join(path, f"v={meta['version']}")
    return path


def write_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    path: str,
    key: str = "user_id",
    n_key_files: int = 8,
) -> None:
    """Persist a current-state snapshot (latest_per_key/merge_upsert
    output) laid out for point lookups: an epoch-versioned store
    `path/v=N/` of Hive-style partition dirs
    `_pid=<pmod(murmur3(key), n)>`, one sorted file per dir. Every key
    lives in exactly one partition DIRECTORY (a pure function of the
    key), so lookups prune at PLANNING time on _pid and targeted
    merges rebuild only changed dirs. Directory naming — unlike
    output-file task numbering — survives AQE coalescing of the
    pre-write shuffle. This is the serve-side half of the CDC pattern:
    the stream maintains the snapshot, the batch writer lays it out
    for reads.

    Crash atomicity: data is fully written under the NEW `v=N` dir
    first, then `_snapshot_meta.json` (which names the current
    version) is flipped with an atomic rename. A process killed at
    any point leaves either the old committed version or the new one
    readable — never a partial store; dead build dirs are
    garbage-collected by the next write.

    At 100 TB: n_key_files scales with snapshot size (one dir ≈ one
    128-256 MiB working set); the repartition is the single shuffle
    the write pays, and readers pay none."""
    import os

    meta = _read_meta(path)
    version = (meta["version"] + 1) if meta and "version" in meta else 1
    _chaos_hook("pre-build")
    _write_version_data(
        snapshot, os.path.join(path, f"v={version}"), key, n_key_files
    )
    _chaos_hook("pre-commit")
    # layout params travel with the store: readers and mergers must
    # use the SAME (key, n) or they prune/target the wrong dirs
    _commit_meta(
        path, {"key": key, "n_key_files": n_key_files, "version": version}
    )
    _chaos_hook("post-commit")
    _gc_versions(path, version)


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
    df = spark.read.parquet(snapshot_data_root(path))
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
    O(changed partitions) and O(snapshot). Crash atomicity comes from
    epoch versioning: the next version dir `v=N+1` is assembled fully
    off to the side — unchanged partition dirs carried over as hard
    links (zero data copy, O(partitions) metadata ops), merged dirs
    written fresh — and only then does the atomic meta flip publish
    it. A process killed at ANY point leaves readers on the complete
    old version; the dead build is garbage-collected by the next
    merge. At extreme partition counts (~millions of dirs) the
    per-epoch link pass itself becomes the bottleneck and the
    dir-per-partition carry-over swaps for a manifest listing current
    files per partition (the Iceberg/Delta design); the commit
    protocol — build immutable, flip one pointer — is the same."""
    import os
    import shutil

    meta = _read_meta(snapshot_dir)
    if meta:
        key, n_key_files = meta["key"], meta["n_key_files"]

    if meta is None or "version" not in meta:
        # no committed store yet (or a legacy flat layout): full write
        write_snapshot(spark, changes, snapshot_dir, key, n_key_files)
        root = snapshot_data_root(snapshot_dir)
        return sorted(
            int(f.split("=", 1)[1])
            for f in os.listdir(root)
            if f.startswith("_pid=")
        )

    old_version = meta["version"]
    old_root = os.path.join(snapshot_dir, f"v={old_version}")
    # clean any dead build from a previous crash before starting ours
    _gc_versions(snapshot_dir, old_version)

    changed_pids = sorted(
        r["p"]
        for r in changes.select(_pid_expr(key, n_key_files).alias("p"))
        .distinct()
        .collect()
    )
    affected = [
        os.path.join(old_root, f"_pid={p}")
        for p in changed_pids
        if os.path.isdir(os.path.join(old_root, f"_pid={p}"))
    ]
    if affected:
        current = spark.read.parquet(*affected)  # no _pid col: recomputed
        merged = current.join(
            changes.select(key), key, "left_anti"
        ).unionByName(changes)
    else:
        merged = changes

    _chaos_hook("pre-build")
    build = os.path.join(snapshot_dir, f".build-v={old_version + 1}")
    shutil.rmtree(build, ignore_errors=True)
    # merged rows all belong to changed pids, so this writes exactly
    # the changed partition dirs
    _write_version_data(merged, build, key, n_key_files)
    _chaos_hook("post-build")
    changed_set = {f"_pid={p}" for p in changed_pids}
    for d in os.listdir(old_root):
        if not d.startswith("_pid=") or d in changed_set:
            continue
        src_dir, dst_dir = os.path.join(old_root, d), os.path.join(build, d)
        os.makedirs(dst_dir, exist_ok=True)
        for f in os.listdir(src_dir):
            src, dst = os.path.join(src_dir, f), os.path.join(dst_dir, f)
            try:
                os.link(src, dst)  # immutable files: sharing is safe
            except OSError:
                shutil.copy2(src, dst)
    new_root = os.path.join(snapshot_dir, f"v={old_version + 1}")
    os.rename(build, new_root)
    _chaos_hook("pre-commit")
    _commit_meta(
        snapshot_dir,
        {"key": key, "n_key_files": n_key_files, "version": old_version + 1},
    )
    _chaos_hook("post-commit")
    _gc_versions(snapshot_dir, old_version + 1)
    return changed_pids
