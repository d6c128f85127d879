"""`kinesis_replay` Python Data Source contract (SURVEY §2.1):
shard-parallel batch reads, micro-batch streaming with per-shard
sequence-number offsets, and checkpointed resume with no re-delivery
— the Spark-4-native connector surface for the reference's KCL
consumer (main.go:49-56), minus only the AWS transport.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kinesis_to_firehose_spark.sources.kinesis_datasource import (
    register_replay_source,
    shard_for_key,
    write_replay_slices,
)

N_SHARDS = 4


def _records(lo, hi):
    return [(f"key-{i}", f"payload-{i}") for i in range(lo, hi)]


def _drain(q):
    q.processAllAvailable()


def test_batch_read_is_shard_parallel(spark, tmp_path):
    """All records come back; reader parallelism == shard count; the
    sequence numbers are per-shard contiguous from 0."""
    d = str(tmp_path / "stream")
    write_replay_slices(d, _records(0, 200), n_shards=N_SHARDS)
    register_replay_source(spark)
    df = spark.read.format("kinesis_replay").option("path", d).load()
    rows = df.collect()
    assert len(rows) == 200
    assert {r["data"] for r in rows} == {f"payload-{i}" for i in range(200)}
    # routing matches the producer's md5 routing
    for r in rows:
        assert r["shard_id"] == f"shard-{shard_for_key(r['partition_key'], N_SHARDS)}"
    # per-shard sequence numbers contiguous from 0
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for seqs in by_shard.values():
        assert sorted(seqs) == list(range(len(seqs)))
    # one task per shard
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == N_SHARDS


def test_stream_delivers_increments_and_resumes(spark, tmp_path):
    """New appends arrive in later micro-batches; a restart from the
    checkpoint re-delivers nothing (per-shard offsets are the
    KCL-checkpoint analogue)."""
    d = str(tmp_path / "stream")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    write_replay_slices(d, _records(0, 50), n_shards=N_SHARDS)
    register_replay_source(spark)

    def start():
        return (
            spark.readStream.format("kinesis_replay")
            .option("path", d)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    try:
        _drain(q)
        got = spark.read.parquet(out)
        assert got.count() == 50
        # append → next micro-batch picks up exactly the delta
        write_replay_slices(d, _records(50, 80), n_shards=N_SHARDS)
        _drain(q)
        assert spark.read.parquet(out).count() == 80
    finally:
        q.stop()
        q.awaitTermination()

    # restart with NO new data: nothing re-delivered
    q = start()
    try:
        _drain(q)
        assert spark.read.parquet(out).count() == 80
        # append after restart: only the delta arrives
        write_replay_slices(d, _records(80, 100), n_shards=N_SHARDS)
        _drain(q)
        final = spark.read.parquet(out)
        assert final.count() == 100
        assert final.select("data").distinct().count() == 100
    finally:
        q.stop()
        q.awaitTermination()


def test_full_pipeline_through_replay_connector(spark, tmp_path):
    """The reference pipeline fronted by the connector: events →
    replay shards → format("kinesis_replay") stream → decode/enhance →
    Firehose sink; per-stream delivered counts equal the batch
    ground truth, and a checkpointed restart re-delivers nothing."""
    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.sources.tables import load
    from kinesis_to_firehose_spark.streaming.firehose import read_delivered
    from kinesis_to_firehose_spark.streaming.pipeline import (
        run_pipeline_replay,
    )

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "stream")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ev = load(spark, "events", sf).select(
        "user_id",
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
        ).alias("data"),
    )
    write_replay_slices(
        d, [(str(r["user_id"]), r["data"]) for r in ev.collect()], n_shards=N_SHARDS
    )
    expected = {
        r["event_type"]: r["n"]
        for r in load(spark, "events", sf)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    q = run_pipeline_replay(spark, d, out, ck)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = {s: len(read_delivered(out, s)) for s in expected}
    assert got == expected

    # restart from the checkpoint with no new data: exactly-once
    q2 = run_pipeline_replay(spark, d, out, ck)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    got2 = {s: len(read_delivered(out, s)) for s in expected}
    assert got2 == expected


def test_torn_tail_line_is_deferred_until_terminated(spark, tmp_path):
    """A producer caught mid-append (no trailing newline) must not
    surface the torn record; once the newline lands, the record
    arrives whole in the next batch."""
    import json
    import os

    d = str(tmp_path / "stream")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    write_replay_slices(d, [("k1", "complete-1")], n_shards=1)
    # simulate a mid-append flush: half a JSON line, no newline
    torn = json.dumps({"pk": "k2", "data": "torn-record"})
    fp = os.path.join(d, "shard-0.jsonl")
    with open(fp, "a") as f:
        f.write(torn[: len(torn) // 2])
    register_replay_source(spark)
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        _drain(q)
        got = {r["data"] for r in spark.read.parquet(out).collect()}
        assert got == {"complete-1"}  # torn record withheld, no crash
        # producer finishes the append
        with open(fp, "a") as f:
            f.write(torn[len(torn) // 2 :] + "\n")
        _drain(q)
        got = {r["data"] for r in spark.read.parquet(out).collect()}
        assert got == {"complete-1", "torn-record"}
    finally:
        q.stop()
        q.awaitTermination()


def test_consumer_first_stream_idles_until_shards_appear(spark, tmp_path):
    """A stream started before the producer creates the directory must
    idle (not fail) and pick up records once shards appear."""
    d = str(tmp_path / "not-yet")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    register_replay_source(spark)
    q = (
        spark.readStream.format("kinesis_replay")
        .option("path", d)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        _drain(q)  # no dir at all: idles, no exception
        assert q.isActive
        write_replay_slices(d, _records(0, 20), n_shards=2)
        _drain(q)
        assert spark.read.parquet(out).count() == 20
    finally:
        q.stop()
        q.awaitTermination()


def test_stream_reader_accepts_legacy_int_offsets(spark, tmp_path):
    """Pre-byte-offset checkpoints stored bare line counts; the
    upgraded reader must resume them (coercing the legacy form to a
    [line, byte] slice) rather than failing on unpack."""
    from kinesis_to_firehose_spark.sources.kinesis_datasource import (
        KinesisReplayStreamReader,
    )

    d = str(tmp_path / "stream")
    write_replay_slices(d, [(f"k", f"p{i}") for i in range(10)], n_shards=1)
    r = KinesisReplayStreamReader({"path": d})
    latest = r.latestOffset()
    parts = r.partitions({"shard-0": 4}, latest)  # legacy int start
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(row[1] for row in rows) == list(range(4, 10))
    # legacy int END offsets (an uncommitted replayed batch) coerce too
    parts = r.partitions({"shard-0": 0}, {"shard-0": 7})
    rows = [row for p in parts for row in r.read(p)]
    assert sorted(row[1] for row in rows) == list(range(0, 7))
