"""Format round-trip surface: parquet (primary), CSV, JSON-lines, ORC.

The reference only ever reads Kinesis and writes Firehose (JSON
lines); an engine replacing it at 100 TB also needs durable columnar
storage and interchange formats. Writers partition by a column when
asked (`partition_by`) so downstream scans prune; readers take an
explicit schema (never inferSchema in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: StructType | None = None
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    return r.format(fmt).load(path)


def read_table_evolved(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a table whose files were written under EVOLVING schemas
    (columns added over time — the normal life of a 100 TB ingest
    root). mergeSchema unions the per-file parquet/orc footers so old
    files surface the new columns as NULL; per-file column pruning
    still applies, so a projection that skips the new column never
    reads any footer-missing file twice.

    CSV/JSON have no footer schema to merge — callers pass an explicit
    target schema through read_table for those."""
    if fmt not in ("parquet", "orc"):
        raise ValueError(
            f"schema merge needs a self-describing format, not {fmt!r}"
        )
    return spark.read.option("mergeSchema", "true").format(fmt).load(path)


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename columns per `mapping` (old → new). A pure projection —
    no shuffle, codegen-transparent — used for round-tripping data
    between producers that disagree on column naming."""
    missing = [c for c in mapping if c not in df.columns]
    if missing:
        raise ValueError(f"cannot rename absent columns: {missing}")
    surviving = [c for c in df.columns if c not in mapping]
    targets = list(mapping.values())
    collisions = sorted(
        {t for t in targets if t in surviving or targets.count(t) > 1}
    )
    if collisions:
        # a silent duplicate column surfaces much later as an
        # AMBIGUOUS_REFERENCE (or wrong parquet data) — fail here
        raise ValueError(f"rename would duplicate columns: {collisions}")
    return df.withColumnsRenamed(mapping)


def compact_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction: rewrite `src_path` into files of
    ~`target_file_bytes` each and return the output file count.

    Streaming sinks and fine-grained ingests leave thousands of tiny
    files per partition; at 100 TB that inflates the NameNode/listing
    cost and makes every scan open-file-bound. The file count is sized
    from the ACTUAL on-disk bytes of the source (not a row-count
    guess), and the rewrite is a single repartition — one shuffle,
    no collect. Rows are round-robin'd across output files, which
    keeps them uniformly sized regardless of input skew.
    """
    sc = spark.sparkContext
    hadoop_path = sc._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hadoop_path.getFileSystem(sc._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil div
    df = read_table(spark, src_path, fmt)
    df.repartition(int(n_files)).write.mode("overwrite").format(fmt).save(dst_path)
    out = [
        f
        for f in fs.listStatus(sc._jvm.org.apache.hadoop.fs.Path(dst_path))
        if f.getPath().getName().endswith(f".{fmt}")
        or f.getPath().getName().startswith("part-")
    ]
    return len([f for f in out if f.getPath().getName().startswith("part-")])
