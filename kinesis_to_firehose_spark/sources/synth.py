"""Deterministic adversarial-skew corpus generators.

Stress inputs for the dedup/LSH family: real-world corpora contain
boilerplate templates and spam farms that put a large fraction of
documents into ONE LSH band bucket, turning the candidate self-join's
output quadratic. These generators build such corpora entirely with
Spark expressions (md5-derived words, no driver data, no RNG) so
skew behavior is reproducible across runs and engines.

Used by tests/test_dedup_properties.py to prove the gated hot-bucket
path (operators/dedup.minhash_lsh_pairs_gated) bounds candidate
cardinality while preserving cluster connectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def skewed_corpus(
    spark: SparkSession, n_docs: int = 400, hot_frac: float = 0.5
) -> DataFrame:
    """(doc_id, text): `hot_frac` of docs share ONE exact template
    (every band collides → one corpus-scale bucket per band); the rest
    are pairwise-distinct word sequences derived from md5(doc_id), so
    their buckets are singletons with overwhelming probability.

    Deterministic: text is a pure function of doc_id.
    """
    n_hot = int(n_docs * hot_frac)
    template = (
        "the quick brown fox jumps over the lazy dog again and again "
        "boilerplate footer terms of service apply contact us today"
    )
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # 8 md5-derived pseudo-words per unique doc; word i is a function
    # of (doc_id, i) so no two docs share a word bigram.
    uniq_words = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat_ws("|", F.col("doc_id"), F.lit(i))), 1, 10
            )
            for i in range(8)
        ],
    )
    return ids.select(
        "doc_id",
        F.when(F.col("doc_id") < n_hot, F.lit(template))
        .otherwise(uniq_words)
        .alias("text"),
    )
