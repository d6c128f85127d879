"""Persisted knn edge-list store — the banded-LSH candidate join +
exact cosine rescore + per-vector top-k computed ONCE per corpus and
written as parquet, so the whole graph family (knn_graph,
semantic_clusters, graph_pagerank, graph_triangle_count,
label_knn_accuracy, mutual_knn, contrastive_pairs) probes a store
scan instead of each re-running the band join in-plan.

Same serving shape as sources/ann_index.py and sources/dedup_index.py:
build amortizes the one expensive corpus pass; every downstream
operator's plan starts at a parquet scan of (src, neighbor, cosine,
rank). At 100 TB the edge list is the only thing the graph ops ever
shuffle, and it is corpus-size × k, not corpus².

The store is content-keyed via sources/store_cache.py (digest of the
embeddings part-file listing + KNN_K + version), so it is warm ACROSS
processes, a data change rebuilds, and concurrent builders are safe
(tempdir + atomic rename). The build is deterministic (the rescore
kernel's IEEE arithmetic and the row_number tiebreak are both
stable), so a rebuild is value-identical — persisting results is
indistinguishable from recomputing them, which keeps every family
oracle unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's knn graph (src, neighbor, cosine, rank ≤ KNN_K),
    served from the persisted store; first call per corpus builds it."""
    from kinesis_to_firehose_spark.operators.similarity import (
        KNN_K,
        build_knn_graph,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path("knn_edges", sf_dir, "embeddings", f"{KNN_K}|knn-edges-v1")

    def _build(tmp: str) -> None:
        # repartition by src so family joins on src read co-located
        # row groups; tiny relative to the corpus (n × k rows)
        build_knn_graph(spark, sf_dir).repartition("src").write.mode(
            "overwrite"
        ).parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))
