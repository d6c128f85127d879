"""Persisted dedup index — the minhash band keys and exact-text
fingerprints of the corpus written once as parquet tables, so
continuous ingest pays only O(new batch) signature compute plus two
equi-joins against the store. This is the "persisted index table
updated per ingest" the dedup_incremental docstring promises
(operators/dedup.py): build once over the existing corpus, probe each
arriving batch, append the accepted batch — the index grows with the
corpus, but no ingest ever re-signatures old documents.

Two layouts, chosen at first write and then fixed per store:

  flat   path/fp     (doc_id, h)                  mode=overwrite/append
         path/bands  (doc_id, band_idx, band_key)
  epoch  path/fp/epoch=N/…, path/bands/epoch=N/…  (pass epoch=N)

The epoch layout exists for STREAMING ingest: each micro-batch lands
in its own Hive partition dir, and a replayed epoch OVERWRITES its
own dirs instead of appending duplicates — the idempotent-sink trick
the firehose sink already uses, applied to index maintenance. Probes
against an epoch store can pin `max_epoch` so a retry that already
appended its epoch still scores against the pre-epoch view (the
filter is on the partition column — pruned at planning, dead epochs'
files are never read).

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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Version strings are CHAINED: a downstream store's cache key embeds
# its upstream's version+params, so bumping e.g. the shingle
# definition reroutes every derived store too — a stale derivation
# can't silently serve arrays built from the old definition
# (ADVICE r9).
_SHINGLES_VERSION = "shingles-v1"


def _rarity_params() -> str:
    from kinesis_to_firehose_spark.operators.dedup import MAX_SHINGLE_DF

    return f"rarity-docs-v1|up={_SHINGLES_VERSION}|cap={MAX_SHINGLE_DF}"


def corpus_shingle_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted distinct word-bigram shingles of the documents table
    (doc_id, lang, len_bucket, source, shingle) — the tokenize →
    lead-window → distinct pass every shingle-family op starts from,
    paid once per corpus. Carry columns are per-doc constants, so any
    projection of this superset grain is exactly the distinct rows
    the in-plan path computes for that carry. Clustered by shingle so
    the inverted-index self-joins scan co-located files."""
    from kinesis_to_firehose_spark.operators.dedup import (
        shingles_from_docs,
    )
    from kinesis_to_firehose_spark.sources.tables import load

    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path("shingles", sf_dir, "documents", _SHINGLES_VERSION)

    def _build(tmp: str) -> None:
        shingles_from_docs(
            load(spark, "documents", sf_dir),
            carry=("lang", "len_bucket", "source"),
        ).repartition("shingle").write.mode("overwrite").parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))


def corpus_minhash_store(spark: SparkSession, sf_dir: str) -> str:
    """Full minhash SIGNATURES (doc_id, h0..h{N_PERMS-1}) plus derived
    band keys for the documents table, persisted once per corpus —
    the build/probe split for the batch LSH family. The flat fp/bands
    store above serves incremental ingest verdicts; pair-emitting ops
    (dedup_minhash_lsh and its five consumers) additionally need the
    signature vectors for est_jaccard, so this store keeps both. Keyed
    by (corpus path, documents file mtime+size, perms/bands, version):
    a data or parameter change rebuilds, a warm store is provably for
    THIS corpus. Bands are written band_key-clustered so the pair
    self-join's scan is bucket-local files."""
    from kinesis_to_firehose_spark.operators.dedup import (
        N_BANDS,
        N_PERMS,
        _band_keys_spark,
        _sig_agg_spark,
        _V_SPARK,
        exploded_shingles,
    )

    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "minhash",
        sf_dir,
        "documents",
        f"{N_PERMS}|{N_BANDS}|minhash-store-v1",
    )

    def _build(tmp: str) -> None:
        ex = exploded_shingles(spark, sf_dir).select("doc_id", "shingle")
        hashed_v = ex.select("doc_id", F.expr(_V_SPARK).alias("v"))
        sigs = hashed_v.groupBy("doc_id").agg(
            *[F.expr(e) for e in _sig_agg_spark(N_PERMS)]
        )
        sigs.write.mode("overwrite").parquet(f"{tmp}/sigs")
        # derive bands from the WRITTEN sigs — the signature chain
        # runs exactly once per corpus, ever
        band_keys = _band_keys_spark(N_PERMS, N_BANDS)
        (
            spark.read.parquet(f"{tmp}/sigs")
            .select(
                "doc_id",
                F.posexplode(F.expr(f"array({band_keys})")).alias(
                    "band_idx0", "band_key"
                ),
            )
            .select(
                "doc_id",
                (F.col("band_idx0") + 1).alias("band_idx"),
                "band_key",
            )
            .repartition("band_key")
            .write.mode("overwrite")
            .parquet(f"{tmp}/bands")
        )

    return ensure_store(path, _build, success_rel="bands/_SUCCESS")


def corpus_simhash_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, simhash) fingerprints of the documents
    table — the simhash op's token-explode → 60 vote-sum aggregate is
    a BUILD step paid once per corpus, not once per query (round-7
    verdict task 5). Rows are the exact integer computation of
    operators/dedup.py::simhash_table, so the oracle (which recomputes
    from scratch) and every consumer see identical values (pytest
    asserts store == in-plan)."""
    from kinesis_to_firehose_spark.operators.dedup import (
        SIMHASH_BITS,
        SIMHASH_CHUNKS,
        simhash_table,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "simhash",
        sf_dir,
        "documents",
        f"{SIMHASH_BITS}|{SIMHASH_CHUNKS}|simhash-store-v1",
    )

    def _build(tmp: str) -> None:
        simhash_table(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))


def corpus_phash_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (media_id, phash) perceptual fingerprints of the
    synthetic media corpus — the blob-decode → 60 slice-mass pass paid
    once per corpus (round-7 verdict task 5), probed by
    mm_phash_dedup. Values are bit-identical to
    operators/multimodal.py::phash_table (pytest-asserted)."""
    from kinesis_to_firehose_spark.operators.multimodal import (
        PHASH_SLICES,
        phash_table,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "phash",
        sf_dir,
        "documents",  # synthetic_media derives from the documents table
        f"{PHASH_SLICES}|phash-store-v1",
    )

    def _build(tmp: str) -> None:
        phash_table(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))


def build_dedup_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    mode: str = "overwrite",
    epoch: int | None = None,
) -> None:
    """Write (mode="overwrite") or extend (mode="append") the index
    with `docs` (a documents-shaped DataFrame: doc_id, text). With
    `epoch=N` the batch lands in its own `epoch=N` partition dirs
    (overwrite — replay-idempotent); don't mix the two layouts in one
    store."""
    from kinesis_to_firehose_spark.operators.dedup import (
        doc_band_keys,
        doc_fingerprints,
    )

    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    fp_dir, band_dir = f"{path}/fp", f"{path}/bands"
    if epoch is not None:
        mode = "overwrite"
        fp_dir, band_dir = (
            f"{fp_dir}/epoch={epoch}",
            f"{band_dir}/epoch={epoch}",
        )
    doc_fingerprints(docs).repartition("h").write.mode(mode).parquet(fp_dir)
    doc_band_keys(docs).repartition("band_key").write.mode(mode).parquet(
        band_dir
    )


def probe_dedup_index(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    max_epoch: int | None = None,
) -> DataFrame:
    """Verdicts for a new batch against the stored index: (doc_id,
    is_exact_dup, n_near_candidates, verdict) — the dedup_incremental
    output contract, with the old side read from parquet instead of
    recomputed. `max_epoch` (epoch-layout stores only) pins the probe
    to index state as of that epoch — partition-pruned, so later
    epochs' files are never opened."""
    from kinesis_to_firehose_spark.operators.dedup import (
        doc_band_keys,
        doc_fingerprints,
        incremental_verdicts,
    )

    old_fp = spark.read.parquet(f"{path}/fp")
    old_bands = spark.read.parquet(f"{path}/bands")
    if max_epoch is not None:
        if "epoch" not in old_fp.columns:
            raise ValueError(f"{path} is a flat store; max_epoch invalid")
        old_fp = old_fp.filter(F.col("epoch") <= max_epoch)
        old_bands = old_bands.filter(F.col("epoch") <= max_epoch)
    return incremental_verdicts(
        doc_fingerprints(new_docs),
        doc_band_keys(new_docs),
        old_fp.select("doc_id", "h"),
        old_bands.select("doc_id", "band_idx", "band_key"),
    )


def run_dedup_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Streaming continuous-ingest dedup: a file-stream of document
    batches (parquet: doc_id, text) is probed per micro-batch against
    the epoch-layout index — verdicts land in `out_dir/epoch=B/`,
    then the batch appends itself as index epoch B+1 (epoch 0 is the
    pre-stream base corpus). Both writes are epoch-dir overwrites and
    the probe pins max_epoch=B, so a replayed micro-batch rewrites
    identical dirs and scores against the same pre-epoch index view —
    idempotent end to end."""

    def handle(df: DataFrame, epoch_id: int) -> None:
        docs = df.select("doc_id", "text")
        verdicts = probe_dedup_index(
            spark, docs, index_path, max_epoch=int(epoch_id)
        )
        verdicts.write.mode("overwrite").parquet(
            f"{out_dir}/epoch={epoch_id}"
        )
        build_dedup_index(spark, docs, index_path, epoch=int(epoch_id) + 1)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle)
        .start()
    )


# ---------------------------------------------------------------------
# Bloom sidecar + compaction — the operational half of the index.
#
# The sidecar is the fingerprint table's Bloom filter (functions/
# bloom.py words), stored as _bloom.json next to the data. Blooms are
# UNION-MERGEABLE BY BITWISE OR, so an append ORs its batch's words
# into the sidecar without rescanning the store — the same property
# that makes per-file blooms work in Iceberg/Delta manifests. Probes
# apply the bloom as a scan predicate on the NEW batch's fingerprints:
# rows failing it are definitive non-members (no false negatives) and
# skip the membership join entirely; false positives are removed by
# the exact join that follows, so verdicts are bit-identical.
#
# compact_dedup_index solves the small-files problem a thousand
# streaming epochs create: it rewrites the epoch-partition store as a
# flat store with one file set, preserving content (probe parity
# asserted in tests). Single-writer maintenance op — run it when the
# stream is paused, like any store compaction.
# ---------------------------------------------------------------------
_BLOOM_SIDE = "_bloom.json"


def _bloom_path(path: str) -> str:
    return f"{path}/{_BLOOM_SIDE}"


def _write_bloom(path: str, words: list[int], m_bits: int, k: int) -> None:
    import json
    import os

    tmp = _bloom_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"m_bits": m_bits, "k": k, "words": words}, f)
    os.replace(tmp, _bloom_path(path))


def read_bloom(path: str) -> dict | None:
    import json
    import os

    if not os.path.exists(_bloom_path(path)):
        return None
    with open(_bloom_path(path)) as f:
        return json.load(f)


def attach_bloom(spark: SparkSession, docs: DataFrame, path: str) -> None:
    """Build (or OR-merge into) the fingerprint bloom sidecar from a
    batch's fingerprints — call alongside every build/append."""
    from kinesis_to_firehose_spark.functions.bloom import (
        K_HASHES,
        M_BITS,
        bloom_build,
    )
    from kinesis_to_firehose_spark.operators.dedup import doc_fingerprints

    words = bloom_build(doc_fingerprints(docs).select("h"), "h")
    existing = read_bloom(path)
    if existing is not None:
        words = [a | b for a, b in zip(existing["words"], words)]
    _write_bloom(path, words, M_BITS, K_HASHES)


def probe_dedup_index_bloomed(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    max_epoch: int | None = None,
) -> DataFrame:
    """probe_dedup_index with the sidecar applied: new fingerprints
    failing the bloom skip the membership join (is_exact_dup = 0 by
    no-false-negatives); passing rows go through the exact join, so
    the output equals the plain probe bit-for-bit."""
    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.functions.bloom import bloom_probe
    from kinesis_to_firehose_spark.operators.dedup import (
        doc_band_keys,
        doc_fingerprints,
        incremental_verdicts,
    )

    side = read_bloom(path)
    if side is None:
        return probe_dedup_index(spark, new_docs, path, max_epoch)
    old_fp = spark.read.parquet(f"{path}/fp")
    old_bands = spark.read.parquet(f"{path}/bands")
    if max_epoch is not None:
        old_fp = old_fp.filter(F.col("epoch") <= max_epoch)
        old_bands = old_bands.filter(F.col("epoch") <= max_epoch)
    new_fp = doc_fingerprints(new_docs)
    pred = bloom_probe("h", side["words"], side["m_bits"], side["k"])
    maybe = new_fp.filter(pred)
    definitely_not = new_fp.filter(~pred)
    # run the shared verdict assembly on the maybe-side only, then
    # splice the definite non-members back as is_exact_dup = 0 rows
    # with their own near-candidate counts (bands are bloom-agnostic)
    all_bands = doc_band_keys(new_docs)
    verdicts_maybe = incremental_verdicts(
        maybe,
        all_bands.join(maybe.select("doc_id"), "doc_id", "left_semi"),
        old_fp.select("doc_id", "h"),
        old_bands.select("doc_id", "band_idx", "band_key"),
    )
    verdicts_no = incremental_verdicts(
        definitely_not,
        all_bands.join(
            definitely_not.select("doc_id"), "doc_id", "left_semi"
        ),
        old_fp.select("doc_id", "h").limit(0),
        old_bands.select("doc_id", "band_idx", "band_key"),
    )
    return verdicts_maybe.unionByName(verdicts_no).orderBy("doc_id")


def compact_dedup_index(spark: SparkSession, path: str) -> None:
    """Rewrite an epoch-partition store as a flat store (one file set
    per table) — the small-files maintenance op after many streaming
    epochs. Content-preserving; single-writer."""
    import shutil

    from pyspark.sql import functions as F  # noqa: F401

    for sub, key in (("fp", "h"), ("bands", "band_key")):
        df = spark.read.parquet(f"{path}/{sub}")
        cols = [c for c in df.columns if c != "epoch"]
        tmp = f"{path}/{sub}__compact"
        df.select(*cols).repartition(key).write.mode("overwrite").parquet(
            tmp
        )
        shutil.rmtree(f"{path}/{sub}")
        shutil.move(tmp, f"{path}/{sub}")


def corpus_rarity_docs_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-grain rarity-sorted shingle arrays for the documents table:
    (doc_id, lang, len_bucket, n_sh, sh) with `sh` the doc's df-capped
    shingles sorted by (block document-frequency, shingle) ascending —
    the global rarity order the AllPairs prefix filter slices, AND the
    exact-verification payload, persisted once per corpus (round-9:
    the df-count + join + doc rollup was rebuilt inside every
    dedup_ngram_jaccard/dedup_minhash_eval call and dominated the op).
    The df cap AND the upstream shingle-store version ride the cache
    key (see `_rarity_params`) so a MAX_SHINGLE_DF or shingle-
    definition change rebuilds."""
    from kinesis_to_firehose_spark.operators.dedup import MAX_SHINGLE_DF
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path("raritydocs", sf_dir, "documents", _rarity_params())

    def _build(tmp: str) -> None:
        ex = corpus_shingle_store(spark, sf_dir).select(
            "doc_id", "lang", "len_bucket", "shingle"
        )
        df_tab = (
            ex.groupBy("lang", "len_bucket", "shingle")
            .agg(F.count("*").alias("df_cnt"))
            .filter(F.col("df_cnt") <= MAX_SHINGLE_DF)
        )
        (
            ex.join(df_tab, ["lang", "len_bucket", "shingle"])
            .groupBy("doc_id", "lang", "len_bucket")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("df_cnt", "shingle"))
                ).alias("ss")
            )
            .select(
                "doc_id",
                "lang",
                "len_bucket",
                F.expr("transform(ss, x -> x.shingle)").alias("sh"),
                F.size("ss").alias("n_sh"),
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )

    return spark.read.parquet(ensure_store(path, _build))


def corpus_jaccard_pairs_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact τ-Jaccard pair list (doc_id_1, doc_id_2, jaccard) for the
    documents table, persisted once per corpus (round-10, verdict
    task 4): the AllPairs/PPJoin plan is the BUILD step; consumers —
    dedup_ngram_jaccard itself and dedup_minhash_eval's truth side,
    the most expensive sf0.1 op of round 9 — pay a parquet scan
    instead of re-running candidate generation + verification per
    invocation. Key chains the rarity store's params plus the τ
    fraction, so a shingle/cap/threshold change rebuilds."""
    from kinesis_to_firehose_spark.operators.dedup import (
        TAU_P,
        TAU_Q,
        ngram_jaccard_plan,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "jacpairs",
        sf_dir,
        "documents",
        f"jaccard-pairs-v1|up={_rarity_params()}|tau={TAU_P}/{TAU_Q}",
    )

    def _build(tmp: str) -> None:
        ngram_jaccard_plan(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))


def corpus_containment_pairs_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact τ-containment pair list (doc_id_1, doc_id_2, containment,
    jaccard), persisted once per corpus (round-11, verdict task 1):
    the asymmetric prefix-filtered join is the BUILD step — its
    candidate mass grows with the corpus' duplication density (the
    Σdf² ramp behind the sf3→sf10 time-α 1.50), which is a property
    of the DATA, paid once per content version, never per query. Key
    chains the upstream shingle-store version + df cap + the τ
    fraction, so a shingle/cap/threshold change rebuilds. NOTE: the
    containment plan is lang-blocked (no len_bucket — excerpt pairs
    have very different lengths), so it keys on the same upstream
    params as the rarity store but its own plan version."""
    from kinesis_to_firehose_spark.operators.dedup import (
        TAU_C_P,
        TAU_C_Q,
        containment_plan,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "containpairs",
        sf_dir,
        "documents",
        f"containment-pairs-v1|up={_rarity_params()}"
        f"|tau={TAU_C_P}/{TAU_C_Q}",
    )

    def _build(tmp: str) -> None:
        containment_plan(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))


def corpus_substring_stats_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-doc duplicated-span stats (doc_id, n_windows, dup_windows,
    dup_frac, keep), persisted once per corpus (round-11, verdict
    task 2): the k-word-window gram aggregate and the gram-df join
    ride the same df ramp as the containment join (sf3→sf10 α 1.14),
    and the result is one fixed-schema row per document — a corpus
    property with no query parameters, the textbook store shape. Key
    chains the window width k and the shared tokenizer version via
    the shingle-store param string."""
    from kinesis_to_firehose_spark.operators.dedup import (
        SUBSTR_K,
        substring_plan,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "substrstats",
        sf_dir,
        "documents",
        f"substring-stats-v1|up={_SHINGLES_VERSION}|k={SUBSTR_K}",
    )

    def _build(tmp: str) -> None:
        substring_plan(spark, sf_dir).write.mode("overwrite").parquet(tmp)

    return spark.read.parquet(ensure_store(path, _build))


def corpus_edit_pairs_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """τ-Levenshtein pair list (doc_id_1, doc_id_2, edit_dist),
    persisted once per corpus (round-11): the PassJoin segment join is
    the BUILD step — its candidate mass is a property of the corpus'
    prefix-collision structure, parameter-free per query. Key chains
    the normalization/prefix/τ constants, so any matching-rule change
    rebuilds."""
    from kinesis_to_firehose_spark.operators.dedup import (
        EDIT_TAU,
        _PREFIX,
        edit_distance_plan,
    )
    from kinesis_to_firehose_spark.sources.store_cache import (
        ensure_store,
        store_path,
    )

    path = store_path(
        "editpairs",
        sf_dir,
        "documents",
        f"edit-pairs-v1|prefix={_PREFIX}|tau={EDIT_TAU}",
    )

    def _build(tmp: str) -> None:
        edit_distance_plan(spark, sf_dir).write.mode("overwrite").parquet(
            tmp
        )

    return spark.read.parquet(ensure_store(path, _build))
