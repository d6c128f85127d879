"""Persisted dedup index — the minhash band keys and exact-text
fingerprints of the corpus written once as parquet tables, so
continuous ingest pays only O(new batch) signature compute plus two
equi-joins against the store. This is the "persisted index table
updated per ingest" the dedup_incremental docstring promises
(operators/dedup.py): build once over the existing corpus, probe each
arriving batch, append the accepted batch — the index grows with the
corpus, but no ingest ever re-signatures old documents.

Layout (plain parquet, deliberately minimal):
  path/fp     (doc_id, h)                  repartitioned on h
  path/bands  (doc_id, band_idx, band_key) repartitioned on band_key

At 100 TB: the build is one signature pass over the corpus (the same
explode → min-hash aggregate every dedup op already pays ONCE, here
amortized across every future ingest); appends add files without
rewriting; probes shuffle only the day's batch to the index's key
distribution. A bucketed-table write (sources/bucketed.py) would
make the band join entirely shuffle-free on the stored side — plain
repartitioned parquet keeps this module dependency-light while
preserving the join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def build_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Write (mode="overwrite") or extend (mode="append") the index
    with `docs` (a documents-shaped DataFrame: doc_id, text)."""
    from kinesis_to_firehose_spark.operators.dedup import (
        doc_band_keys,
        doc_fingerprints,
    )

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    doc_fingerprints(docs).repartition("h").write.mode(mode).parquet(
        f"{path}/fp"
    )
    doc_band_keys(docs).repartition("band_key").write.mode(mode).parquet(
        f"{path}/bands"
    )


def probe_dedup_index(
    spark: SparkSession, new_docs: DataFrame, path: str
) -> DataFrame:
    """Verdicts for a new batch against the stored index: (doc_id,
    is_exact_dup, n_near_candidates, verdict) — the dedup_incremental
    output contract, with the old side read from parquet instead of
    recomputed."""
    from kinesis_to_firehose_spark.operators.dedup import (
        doc_band_keys,
        doc_fingerprints,
        incremental_verdicts,
    )

    old_fp = spark.read.parquet(f"{path}/fp")
    old_bands = spark.read.parquet(f"{path}/bands")
    return incremental_verdicts(
        doc_fingerprints(new_docs),
        doc_band_keys(new_docs),
        old_fp,
        old_bands,
    )
