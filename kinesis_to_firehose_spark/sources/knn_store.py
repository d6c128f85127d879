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

The store is process-cached per sf_dir: testdata is immutable, and
the build is deterministic (the rescore kernel's IEEE arithmetic and
the row_number tiebreak are both stable), so a rebuild in a fresh
process is value-identical — persisting results is indistinguishable
from recomputing them, which keeps every family oracle unchanged.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

# {abspath(sf_dir): store path} — one build per process per corpus
_BUILT: dict[str, str] = {}


def knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's knn graph (src, neighbor, cosine, rank ≤ KNN_K),
    served from the persisted store; first call per process builds it."""
    key = os.path.abspath(sf_dir)
    if key not in _BUILT:
        from kinesis_to_firehose_spark.operators.similarity import (
            build_knn_graph,
        )

        path = tempfile.mkdtemp(prefix="spark_graft_knn_store_")
        # repartition by src so family joins on src read co-located
        # row groups; tiny relative to the corpus (n × k rows)
        build_knn_graph(spark, sf_dir).repartition("src").write.mode(
            "overwrite"
        ).parquet(path)
        _BUILT[key] = path
    return spark.read.parquet(_BUILT[key])
