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


def _gc_versions(path: str, keep_version: int, keep_n: int = 1) -> None:
    """Drop version dirs outside the retention window (the committed
    version and its keep_n-1 predecessors) plus any dead build/tmp
    dirs. Safe to run any time: only meta-named or retained versions
    are ever read."""
    import os
    import shutil

    if not os.path.isdir(path):
        return
    kept = {
        f"v={v}" for v in range(keep_version - keep_n + 1, keep_version + 1)
    }
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if d.startswith("v=") and d not in kept:
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith(".build-") or d == "_snapshot_meta.json.tmp":
            shutil.rmtree(full, ignore_errors=True) if os.path.isdir(
                full
            ) else os.remove(full)


def snapshot_data_root(path: str) -> str:
    """Resolve the directory readers should scan: the committed
    version dir when the store is versioned, the path itself for
    legacy flat layouts. (dirs layout only — manifest-layout readers
    go through snapshot_read / snapshot_lookup, which resolve FILES.)"""
    import os

    meta = _read_meta(path)
    if meta and "version" in meta:
        return os.path.join(path, f"v={meta['version']}")
    return path


# ---------------------------------------------------------------------
# manifest layout: immutable data files under path/data/_pid=p/, a
# per-version manifest json listing the current file set per
# partition, and the same atomic meta flip. Carrying unchanged
# partitions across an epoch is a MANIFEST ENTRY COPY (O(changed)
# work + one small json write) instead of the dirs layout's
# per-partition hard-link pass (O(all partitions) metadata ops) —
# the Iceberg/Delta commit design. At millions of partitions the
# manifest itself would shard; the pointer-flip protocol is unchanged.
# ---------------------------------------------------------------------


def _manifest_file(path: str, version: int) -> str:
    import os

    return os.path.join(path, f"manifest-v{version}.json")


def _read_manifest(path: str, version: int) -> dict:
    """Load a manifest doc, normalized to
    ``{"entries": {pid: [relpath]}, "stats": {relpath: {col: [mn, mx]}}}``
    (early manifests were the bare entries dict)."""
    import json

    with open(_manifest_file(path, version)) as f:
        doc = json.load(f)
    if "entries" not in doc:
        doc = {"entries": doc, "stats": {}}
    doc.setdefault("stats", {})
    return doc


def _file_stats(full_path: str, cols: tuple[str, ...]) -> dict:
    """Per-file [min, max] for `cols` straight from the parquet footer
    (row-group statistics; no data read, no Spark job). Columns whose
    stats are absent are omitted — readers must treat a missing entry
    as 'cannot skip'."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(full_path).metadata
    name_to_idx = {
        md.schema.column(i).name: i for i in range(md.num_columns)
    }
    out = {}
    for c in cols:
        if c not in name_to_idx:
            continue
        mins, maxs = [], []
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(name_to_idx[c]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mins.append(st.min)
            maxs.append(st.max)
        if ok and mins:
            out[c] = [min(mins), max(maxs)]
    return out


def _write_manifest(path: str, version: int, manifest: dict) -> None:
    import json
    import os

    tmp = _manifest_file(path, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_file(path, version))


def _adopt_build_files(
    path: str, build: str, version: int, stats_cols: tuple[str, ...] = ()
) -> tuple[dict[str, list[str]], dict[str, dict]]:
    """Move the spark build output's part files into the immutable
    data/ tree with version-prefixed names; return manifest entries
    {pid: [relpath]} plus per-file footer stats for `stats_cols`.
    Files are invisible to readers until a manifest+meta commit
    references them, so a crash mid-move only leaves unreferenced
    files for GC."""
    import os

    entries: dict[str, list[str]] = {}
    stats: dict[str, dict] = {}
    for d in sorted(os.listdir(build)):
        if not d.startswith("_pid="):
            continue
        pid = d.split("=", 1)[1]
        dst_dir = os.path.join(path, "data", d)
        os.makedirs(dst_dir, exist_ok=True)
        rels = []
        for f in sorted(os.listdir(os.path.join(build, d))):
            if not f.endswith(".parquet"):
                continue
            rel = os.path.join(d, f"v{version}-{f}")
            full = os.path.join(path, "data", rel)
            os.rename(os.path.join(build, d, f), full)
            rels.append(rel)
            if stats_cols:
                s = _file_stats(full, stats_cols)
                if s:
                    stats[rel] = s
        entries[pid] = rels
    return entries, stats


def _gc_manifest_store(path: str, keep_version: int, keep_n: int = 1) -> None:
    """Drop data files not referenced by any RETAINED manifest (the
    committed one and its keep_n-1 predecessors), manifests outside
    the retention window, and dead build dirs. Safe any time: readers
    only resolve files through retained manifests, and retained
    manifests' file sets are untouched."""
    import os
    import shutil

    kept_versions = [
        v
        for v in range(keep_version - keep_n + 1, keep_version + 1)
        if os.path.isfile(_manifest_file(path, v))
    ]
    referenced = {
        rel
        for v in kept_versions
        for rels in _read_manifest(path, v)["entries"].values()
        for rel in rels
    }
    kept_names = {f"manifest-v{v}.json" for v in kept_versions}
    data = os.path.join(path, "data")
    if os.path.isdir(data):
        for d in os.listdir(data):
            full = os.path.join(data, d)
            if not os.path.isdir(full):
                continue
            for f in os.listdir(full):
                if os.path.join(d, f) not in referenced:
                    os.remove(os.path.join(full, f))
    for f in os.listdir(path):
        full = os.path.join(path, f)
        if f.startswith("manifest-v") and f not in kept_names:
            os.remove(full)
        elif f.startswith(".build-"):
            shutil.rmtree(full, ignore_errors=True)


def _gc_store(path: str, meta: dict) -> None:
    keep_n = meta.get("keep_versions", 1)
    if meta.get("layout") == "manifest":
        _gc_manifest_store(path, meta["version"], keep_n)
    else:
        _gc_versions(path, meta["version"], keep_n)


def _resolve_version(path: str, version: int | None) -> tuple[dict, int]:
    """Resolve a read's (meta, version): the committed version when
    `version` is None, else that exact retained version. Raises on a
    version outside the retention window — a GC'd version read must
    fail loudly, never silently fall back to different data."""
    import os

    meta = _read_meta(path)
    if version is None:
        return meta, (meta or {}).get("version")
    if not meta or "version" not in meta:
        raise ValueError(
            f"snapshot at {path!r} is not versioned; cannot time-travel"
        )
    committed = meta["version"]
    keep_n = meta.get("keep_versions", 1)
    artifact = (
        _manifest_file(path, version)
        if meta.get("layout") == "manifest"
        else os.path.join(path, f"v={version}")
    )
    if (
        version > committed
        or version <= committed - keep_n
        or not os.path.exists(artifact)
    ):
        raise ValueError(
            f"version {version} not retained at {path!r} (committed "
            f"{committed}, keep_versions {keep_n})"
        )
    return meta, version


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Full-store read for either layout (with the `_pid` partition
    column present, as a raw dirs-layout read would surface it).
    `version` time-travels to a retained older epoch (written with
    keep_versions > 1): dirs layout reads that version's dir, manifest
    layout resolves that version's file set — retained data files are
    immutable and shared, so an old read sees exactly the old commit.
    A version outside the retention window raises."""
    import os

    meta, v = _resolve_version(path, version)
    if meta and meta.get("layout") == "manifest":
        manifest = _read_manifest(path, v)
        files = [
            os.path.join(path, "data", rel)
            for rels in manifest["entries"].values()
            for rel in rels
        ]
        base = os.path.join(path, "data")
        return (
            spark.read.option("basePath", base)
            .option("mergeSchema", "true")
            .parquet(*files)
        )
    if version is not None:
        return spark.read.option("mergeSchema", "true").parquet(
            os.path.join(path, f"v={v}")
        )
    return spark.read.option("mergeSchema", "true").parquet(
        snapshot_data_root(path)
    )


def snapshot_scan(
    spark: SparkSession, path: str, col: str, lo, hi,
    version: int | None = None,
) -> DataFrame:
    """Band scan `lo <= col <= hi` over the store. On a manifest
    layout with footer stats for `col`, files whose [min, max] range
    misses the band are skipped at the DRIVER — never opened, never
    planned (the Iceberg file-skipping pattern; `col` need not be the
    partition key). Files without recorded stats are always read.
    Falls back to a plain filtered read elsewhere."""
    import os

    from pyspark.sql import functions as F

    pred = (F.col(col) >= lo) & (F.col(col) <= hi)
    meta, v = _resolve_version(path, version)
    if not meta or meta.get("layout") != "manifest":
        return snapshot_read(spark, path, version).filter(pred)
    manifest = _read_manifest(path, v)
    stats = manifest["stats"]
    files = []
    for rels in manifest["entries"].values():
        for rel in rels:
            rng = stats.get(rel, {}).get(col)
            if rng is not None and (rng[1] < lo or rng[0] > hi):
                continue  # provably disjoint: skip without opening
            files.append(os.path.join(path, "data", rel))
    if not files:
        return snapshot_read(spark, path, version).filter(F.lit(False))
    df = (
        spark.read.option("basePath", os.path.join(path, "data"))
        .option("mergeSchema", "true")
        .parquet(*files)
    )
    return df.filter(pred)


def write_snapshot(
    spark: SparkSession,
    snapshot: DataFrame,
    path: str,
    key: str = "user_id",
    n_key_files: int = 8,
    layout: str = "dirs",
    stats_cols: tuple[str, ...] = (),
    keep_versions: int = 1,
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
    the write pays, and readers pay none.

    layout="manifest" stores immutable files under path/data/ with a
    per-version manifest json instead of version DIRECTORIES — same
    commit protocol, but epoch merges carry unchanged partitions by
    copying manifest entries rather than hard-linking dirs."""
    import os
    import shutil

    if layout not in ("dirs", "manifest"):
        raise ValueError(f"layout must be dirs|manifest, got {layout!r}")
    meta = _read_meta(path)
    if meta and "version" in meta:
        version = meta["version"] + 1
        layout = meta.get("layout", "dirs")  # the store's layout wins
        stats_cols = tuple(meta.get("stats_cols", stats_cols))
        keep_versions = meta.get("keep_versions", keep_versions)
    else:
        version = 1
    cols = [c for c in snapshot.columns if c != "_pid"]
    history = dict((meta or {}).get("schema_history", {}))
    history[str(version)] = cols
    buckets = dict((meta or {}).get("bucket_history", {}))
    buckets[str(version)] = n_key_files
    new_meta = {
        "key": key,
        # recorded so empty reads (e.g. an empty snapshot_diff) can
        # reconstruct the key's exact type without probing a footer
        "key_type": snapshot.schema[key].dataType.simpleString(),
        "n_key_files": n_key_files,
        "version": version,
        "layout": layout,
        "stats_cols": list(stats_cols),
        "keep_versions": keep_versions,
        "schema_history": history,
        "bucket_history": buckets,
    }
    _chaos_hook("pre-build")
    if layout == "manifest":
        build = os.path.join(path, f".build-v={version}")
        shutil.rmtree(build, ignore_errors=True)
        _write_version_data(snapshot, build, key, n_key_files)
        entries, stats = _adopt_build_files(path, build, version, stats_cols)
        shutil.rmtree(build, ignore_errors=True)
        _write_manifest(path, version, {"entries": entries, "stats": stats})
    else:
        _write_version_data(
            snapshot, os.path.join(path, f"v={version}"), key, n_key_files
        )
    _chaos_hook("pre-commit")
    # layout params travel with the store: readers and mergers must
    # use the SAME (key, n) or they prune/target the wrong dirs
    _commit_meta(path, new_meta)
    _chaos_hook("post-commit")
    _gc_store(path, new_meta)


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
    version: int | None = None,
) -> DataFrame:
    """Point lookup against a written snapshot. The key IN-filter is
    pushed to the parquet scan (PushedFilters), and because _pid is a
    pure function of the key, the lookup also names its partition
    dirs up front — PartitionFilters prune every other dir at
    planning time, before any file is opened."""
    from pyspark.sql import functions as F

    meta, v = _resolve_version(path, version)
    if version is not None and meta is not None:
        # an older version may predate a rebucket — prune with the
        # bucket count IT was written with, or the lookup names the
        # wrong dirs and silently returns empty results
        n_key_files = int(
            meta.get("bucket_history", {}).get(str(v), meta["n_key_files"])
        )
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
    if not values:
        return snapshot_read(spark, path, version).filter(F.lit(False))
    pids = sorted(
        r["p"]
        for r in spark.createDataFrame([(v,) for v in values], [key])
        .select(_pid_expr(key, n_key_files).alias("p"))
        .distinct()
        .collect()
    )
    if meta and meta.get("layout") == "manifest":
        # manifest layout prunes at the DRIVER: only the named
        # partitions' files enter the read at all
        import os

        manifest = _read_manifest(path, v)
        files = [
            os.path.join(path, "data", rel)
            for p in pids
            for rel in manifest["entries"].get(str(p), [])
        ]
        if not files:
            return snapshot_read(spark, path, version).filter(F.lit(False))
        df = (
            spark.read.option("basePath", os.path.join(path, "data"))
            .option("mergeSchema", "true")
            .parquet(*files)
        )
        return df.filter(df[key].isin(values))
    if version is not None:
        import os as _os

        df = spark.read.option("mergeSchema", "true").parquet(
            _os.path.join(path, f"v={v}")
        )
    else:
        df = spark.read.option("mergeSchema", "true").parquet(
            snapshot_data_root(path)
        )
    return df.filter(df[key].isin(values) & F.col("_pid").isin(pids))


def snapshot_merge_targeted(
    spark: SparkSession,
    snapshot_dir: str,
    changes: DataFrame,
    key: str = "user_id",
    n_key_files: int = 8,
    layout: str = "dirs",
    keep_versions: int = 1,
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
        write_snapshot(
            spark, changes, snapshot_dir, key, n_key_files, layout=layout,
            keep_versions=keep_versions,
        )
        meta = _read_meta(snapshot_dir)
        if meta.get("layout") == "manifest":
            return sorted(
                int(p)
                for p in _read_manifest(snapshot_dir, meta["version"])[
                    "entries"
                ]
            )
        root = snapshot_data_root(snapshot_dir)
        return sorted(
            int(f.split("=", 1)[1])
            for f in os.listdir(root)
            if f.startswith("_pid=")
        )

    old_version = meta["version"]
    store_layout = meta.get("layout", "dirs")
    old_root = os.path.join(snapshot_dir, f"v={old_version}")
    # clean any dead build from a previous crash before starting ours
    _gc_store(snapshot_dir, meta)

    changed_pids = sorted(
        r["p"]
        for r in changes.select(_pid_expr(key, n_key_files).alias("p"))
        .distinct()
        .collect()
    )
    if store_layout == "manifest":
        old_manifest = _read_manifest(snapshot_dir, old_version)
        affected = [
            os.path.join(snapshot_dir, "data", rel)
            for p in changed_pids
            for rel in old_manifest["entries"].get(str(p), [])
        ]
    else:
        affected = [
            os.path.join(old_root, f"_pid={p}")
            for p in changed_pids
            if os.path.isdir(os.path.join(old_root, f"_pid={p}"))
        ]
    if affected:
        # mergeSchema: files from earlier epochs may predate columns
        # added since (schema evolution); allowMissingColumns fills
        # NULLs when either side lacks the other's columns
        current = spark.read.option("mergeSchema", "true").parquet(
            *affected
        )  # no _pid col: recomputed
        merged = current.join(
            changes.select(key), key, "left_anti"
        ).unionByName(changes, allowMissingColumns=True)
    else:
        merged = changes

    _chaos_hook("pre-build")
    build = os.path.join(snapshot_dir, f".build-v={old_version + 1}")
    shutil.rmtree(build, ignore_errors=True)
    # merged rows all belong to changed pids, so this writes exactly
    # the changed partition dirs
    _write_version_data(merged, build, key, n_key_files)
    _chaos_hook("post-build")
    history = dict(meta.get("schema_history", {}))
    history[str(old_version + 1)] = [
        c for c in merged.columns if c != "_pid"
    ]
    buckets = dict(meta.get("bucket_history", {}))
    buckets[str(old_version + 1)] = n_key_files
    new_meta = {
        "key": key,
        "n_key_files": n_key_files,
        "version": old_version + 1,
        "layout": store_layout,
        "stats_cols": meta.get("stats_cols", []),
        "keep_versions": meta.get("keep_versions", 1),
        "schema_history": history,
        "bucket_history": buckets,
    }
    if store_layout == "manifest":
        # unchanged partitions carry over as manifest-entry copies —
        # O(changed) file moves + one small json, no per-dir link pass
        entries, stats = _adopt_build_files(
            snapshot_dir, build, old_version + 1,
            tuple(meta.get("stats_cols", [])),
        )
        shutil.rmtree(build, ignore_errors=True)
        new_entries = dict(old_manifest["entries"])
        dropped = set()
        for p in changed_pids:
            dropped.update(new_entries.pop(str(p), []))
        new_entries.update(entries)
        new_stats = {
            rel: s
            for rel, s in old_manifest["stats"].items()
            if rel not in dropped
        }
        new_stats.update(stats)
        _write_manifest(
            snapshot_dir,
            old_version + 1,
            {"entries": new_entries, "stats": new_stats},
        )
    else:
        changed_set = {f"_pid={p}" for p in changed_pids}
        for d in os.listdir(old_root):
            if not d.startswith("_pid=") or d in changed_set:
                continue
            src_dir = os.path.join(old_root, d)
            dst_dir = os.path.join(build, d)
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
    _commit_meta(snapshot_dir, new_meta)
    _chaos_hook("post-commit")
    _gc_store(snapshot_dir, new_meta)
    return changed_pids


def snapshot_rebucket(
    spark: SparkSession, path: str, new_n_key_files: int
) -> None:
    """Re-bucket a store that outgrew its partition count: rewrite the
    CURRENT content as the next version under `new_n_key_files`, with
    the same atomic meta flip every other writer uses. Old retained
    versions keep their own bucket count (meta.bucket_history), so
    versioned lookups against them still prune the right dirs.
    Cost is one full rewrite — the operation is exactly one shuffle of
    the snapshot (same as its original write); subsequent targeted
    merges prune with the new count. The layout, schema history,
    retention, and stats config all carry over."""
    meta = _read_meta(path)
    if not meta or "version" not in meta:
        raise ValueError(f"snapshot at {path!r} is not a versioned store")
    current = snapshot_read(spark, path).drop("_pid")
    write_snapshot(
        spark,
        current,
        path,
        key=meta["key"],
        n_key_files=new_n_key_files,
    )


def _diff_pid_files(
    path: str, meta: dict, v_old: int, v_new: int
) -> dict[int, tuple[list[str], list[str]]]:
    """Per-partition file sets that can DIFFER between two retained
    versions — pids proven identical are excluded without opening any
    data file. Manifest layout: a pid whose manifest entry lists the
    same immutable files in both versions is unchanged by
    construction (targeted merges carry unchanged pids as entry
    copies). Dirs layout: a pid dir carried across versions as hard
    links holds the same inodes (os.path.samefile), so equal file
    sets by inode are unchanged."""
    import os

    out: dict[int, tuple[list[str], list[str]]] = {}
    if meta.get("layout") == "manifest":
        mo = _read_manifest(path, v_old)["entries"]
        mn = _read_manifest(path, v_new)["entries"]
        data = os.path.join(path, "data")
        for pid in sorted(set(mo) | set(mn), key=int):
            old_rels, new_rels = mo.get(pid, []), mn.get(pid, [])
            if sorted(old_rels) == sorted(new_rels):
                continue  # identical immutable files: provably unchanged
            out[int(pid)] = (
                [os.path.join(data, r) for r in old_rels],
                [os.path.join(data, r) for r in new_rels],
            )
        return out

    def pid_files(v: int) -> dict[int, list[str]]:
        root = os.path.join(path, f"v={v}")
        files: dict[int, list[str]] = {}
        for d in os.listdir(root):
            if not d.startswith("_pid="):
                continue
            full = os.path.join(root, d)
            files[int(d.split("=", 1)[1])] = sorted(
                os.path.join(full, f)
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
        return files

    fo, fn = pid_files(v_old), pid_files(v_new)
    for pid in sorted(set(fo) | set(fn)):
        old_fs, new_fs = fo.get(pid, []), fn.get(pid, [])
        if len(old_fs) == len(new_fs) and all(
            os.path.samefile(a, b) for a, b in zip(old_fs, new_fs)
        ):
            continue  # hard-linked carry-over: same inodes, unchanged
        out[pid] = (old_fs, new_fs)
    return out


def snapshot_diff(
    spark: SparkSession, path: str, v_old: int, v_new: int | None = None
) -> DataFrame:
    """Version-to-version change set: (key, change) with change ∈
    {'added', 'deleted', 'updated'} between two RETAINED versions of
    the store (keep_versions ≥ the span). The table-format trick that
    makes this O(changed) instead of O(store): both layouts share
    unchanged partitions' IMMUTABLE files across versions (manifest
    entry copies / hard-linked dirs), so a partition whose file
    identity is equal in both versions is skipped at the driver —
    never read, never planned. Only differing partitions are loaded
    and full-outer joined on the key; equal rows (by md5 of the
    common non-key columns) drop out.

    At 100 TB an epoch touches a bounded set of partitions, so the
    diff reads exactly the data the epoch wrote plus its old
    versions — the audit query ("what changed between v3 and v7")
    stays proportional to the change, not the snapshot."""
    from pyspark.sql import functions as F

    import os

    meta, vn = _resolve_version(path, v_new)
    _, vo = _resolve_version(path, v_old)
    key = meta["key"]
    changed = _diff_pid_files(path, meta, vo, vn)
    if not changed:
        # empty diff must still carry the store's REAL key type (the
        # key column is whatever write_snapshot was given, not
        # necessarily a bigint) so unions across version pairs line up
        from pyspark.sql.types import (
            StringType,
            StructField,
            StructType,
            _parse_datatype_string,
        )

        if meta.get("key_type"):
            # recorded at write time: no probe needed, works even for
            # a store whose committed version holds zero part files
            return spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField(
                            key, _parse_datatype_string(meta["key_type"])
                        ),
                        StructField("change", StringType()),
                    ]
                ),
            )
        if meta.get("layout") == "manifest":
            rels = [
                r
                for rl in _read_manifest(path, vn)["entries"].values()
                for r in rl
            ]
            probe = (
                os.path.join(path, "data", rels[0]) if rels else None
            )
        else:
            root = os.path.join(path, f"v={vn}")
            probe = None
            for d in sorted(os.listdir(root)):
                full = os.path.join(root, d)
                if d.startswith("_pid=") and os.path.isdir(full):
                    fs = [f for f in os.listdir(full) if f.endswith(".parquet")]
                    if fs:
                        probe = os.path.join(full, sorted(fs)[0])
                        break
        from pyspark.sql.types import StringType, StructField, StructType

        if probe is None:
            key_field = StructField(key, StringType())
        else:
            # schema-only footer read; no data scan
            key_field = next(
                f for f in spark.read.parquet(probe).schema.fields
                if f.name == key
            )
        return spark.createDataFrame(
            [],
            StructType([key_field, StructField("change", StringType())]),
        )
    old_files = [f for o, _ in changed.values() for f in o]
    new_files = [f for _, n in changed.values() for f in n]

    def side(files: list[str], tag: str) -> DataFrame:
        if not files:
            return None
        df = spark.read.option("mergeSchema", "true").parquet(*files)
        cols = sorted(c for c in df.columns if c not in (key, "_pid"))
        return df.select(
            F.col(key),
            F.md5(F.to_json(F.struct(*cols))).alias(f"{tag}_h"),
        )

    old = side(old_files, "o")
    new = side(new_files, "n")
    if old is None:
        return new.select(key, F.lit("added").alias("change")).orderBy(key)
    if new is None:
        return old.select(key, F.lit("deleted").alias("change")).orderBy(key)
    j = old.join(new, key, "full_outer")
    change = (
        F.when(F.col("o_h").isNull(), "added")
        .when(F.col("n_h").isNull(), "deleted")
        .when(F.col("o_h") != F.col("n_h"), "updated")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(key, "change")
        .orderBy(key)
    )
