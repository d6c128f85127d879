"""Parquet table registry over the driver testdata layout.

One parquet file per table under an sf dir (TESTDATA.md). At cluster
scale the same API points at partitioned parquet/iceberg roots; the
reads below are plain `spark.read.parquet` so Catalyst keeps column
pruning + predicate pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor —
# TPC-H fixes them at 5/25 rows. customer/supplier/part grow linearly
# with SF, so their join strategy is left to AQE + the
# autoBroadcastJoinThreshold size estimate, never a forced hint.
BROADCAST_DIMS = frozenset({"region", "nation"})


# (sf_dir, name) -> cached DataFrame, managed by `materialized()`
_MATERIALIZED: dict[tuple[str, str], DataFrame] = {}


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    hit = _MATERIALIZED.get((sf_dir, name))
    if hit is not None:
        return hit
    if name == "events":
        # Runtime-set so sessions built OUTSIDE session.py (the driver
        # passes its own SparkSession) can still read the NANOS
        # timestamps in events.parquet.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # Older testdata stores ts as TIMESTAMP(NANOS); Spark reads
            # it as long (nanosAsLong). Truncate to micros — same as
            # DuckDB's nanos→micros conversion — so oracle timestamps
            # match. Integer DIV, not float division: DuckDB truncates
            # nanos and a double round-trip would round ...999ns up a
            # whole microsecond.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # Newer testdata is timestamp[us] without timezone; all
            # downstream ops (and the session tz, pinned UTC) were
            # written against TIMESTAMP_LTZ, so cast — a value no-op
            # under UTC, and DuckDB's naive TIMESTAMP matches.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


from contextlib import contextmanager  # noqa: E402


@contextmanager
def materialized(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = ("lineitem",)
):
    """Multi-query scan sharing: cache the named tables once
    (memory-and-disk) so every load() inside the context reuses the
    materialization instead of re-scanning parquet — the right call
    when a QUERY SET collectively touches most columns of a hot table
    (the TPC-H sweep reads lineitem in 16 of 22 queries).

    The tradeoff is explicit: a cached full table forfeits per-query
    column pruning and predicate pushdown, so this only pays when the
    set amortizes the one full scan AND the table fits the cluster's
    storage memory. At 100 TB that means caching a shared pruned
    PROJECTION (pass a pre-projected df through this pattern), or
    relying on cluster-level parquet page caching instead. Measured
    at sf0.1 (local[32]): the 22-query TPC-H sweep drops ~19% wall
    (15.8 s → 12.7 s) with lineitem+orders materialized (SURVEY §6)."""
    from pyspark import StorageLevel

    handles = []
    try:
        for n in names:
            df = load(spark, n, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
            df.count()  # eager: later queries share, never race, the build
            _MATERIALIZED[(sf_dir, n)] = df
            handles.append((n, df))
        yield
    finally:
        for n, df in handles:
            _MATERIALIZED.pop((sf_dir, n), None)
            df.unpersist()


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so users can drive the
    engine through plain `spark.sql(...)` — the same names the DuckDB
    oracles use, so any oracle_sql() string that sticks to
    Spark-compatible syntax runs verbatim. Views are lazy references
    to the parquet reads (column pruning + pushdown intact); calling
    again re-points the names at a different sf_dir. Pair with
    `unregister_views` in shared sessions.
    """
    for t in TABLES:
        load(spark, t, sf_dir).createOrReplaceTempView(t)


def unregister_views(spark: SparkSession) -> None:
    """Drop the temp views register_views created (shared-session
    hygiene: a later consumer must not silently resolve these names)."""
    for t in TABLES:
        spark.catalog.dropTempView(t)
