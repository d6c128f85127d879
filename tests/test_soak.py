"""sf0.1 streaming soak (round-7 verdict task 8) — CI-optional.

Run with `python -m pytest -m soak tests/test_soak.py`; the default
suite skips it (conftest gates on the -m expression). One test drives
the three long-lived streaming surfaces over the sf0.1 events —
several hundred micro-batches in total — with chaos (transient
per-record transport failures, a mid-run crash, and checkpoint
restarts), asserting exactly-once delivery everywhere:

  phase 1: kinesis_replay → decode/enhance → firehose_sink, admission
           cap 125 records/shard/trigger → ~200 triggers over 100k
           records, flaky transport + one crash + resume;
  phase 2: dedup_ingest_stream — 60 document micro-batches through the
           persisted epoch index, with a stop/restart at the midpoint;
  phase 3: snapshot_sink — 60-slice change feed into the point-lookup
           store with a mid-feed restart; store == batch latest_per_key.
"""

from __future__ import annotations

import json
import os

import pytest

SF = "/root/testdata/sf0.1"

pytestmark = pytest.mark.soak


def test_soak_three_streams_exactly_once(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from kinesis_to_firehose_spark.sources.kinesis_datasource import (
        write_replay_slices_distributed,
    )
    from kinesis_to_firehose_spark.sources.tables import load
    from kinesis_to_firehose_spark.streaming.firehose import (
        LocalDirTransport,
        read_delivered,
    )
    from kinesis_to_firehose_spark.streaming.pipeline import (
        KinesisSourceConfig,
        run_pipeline_replay,
    )

    # ---------------- phase 1: firehose_sink under chaos, ~200 triggers
    d = str(tmp_path / "stream")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    dl = str(tmp_path / "dl")
    crash_marker = str(tmp_path / "crashed-once")

    ev = load(spark, "events", SF)
    n_events = ev.count()
    feed = ev.select(
        F.col("user_id").cast("string").alias("pk"),
        F.to_json(
            F.struct(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            )
        ).alias("data"),
    )
    write_replay_slices_distributed(
        spark, feed, d, n_shards=4, order_cols=("ts", "event_id")
    )

    class ChaosTransport:
        """Every 11th record (content hash) fails its first attempt;
        one global crash mid-run, marker-gated so the resumed run is
        crash-free."""

        def __init__(self, epoch_id: int):
            self.epoch = epoch_id
            self._inner = None
            self._failed_once: set[bytes] = set()

        def __call__(self, records, stream):
            from pyspark import TaskContext

            if self._inner is None:
                tc = TaskContext.get()
                tid = (
                    f"p{tc.partitionId():05d}" if tc is not None else "p00000"
                )
                self._inner = LocalDirTransport(out, self.epoch, task_id=tid)
            failed = [
                i
                for i, r in enumerate(records)
                if hash(r) % 11 == 0 and r not in self._failed_once
            ]
            self._failed_once.update(records[i] for i in failed)
            ok = [r for i, r in enumerate(records) if i not in set(failed)]
            self._inner(ok, stream)
            # crash once, mid-run (after ~1/4 of the feed delivered)
            if self.epoch > 40 and not os.path.exists(crash_marker):
                with open(crash_marker, "w") as f:
                    f.write("1")
                raise ConnectionError("chaos: transport died mid-epoch")
            return failed

    cfg = KinesisSourceConfig(
        stream_name="soak",
        initial_position="TRIM_HORIZON",
        read_rate_limit=125,  # × 1s cadence → 125 records/shard/trigger
    )

    def start():
        return run_pipeline_replay(
            spark, d, out, ck, dead_letter_dir=dl,
            transport_factory=ChaosTransport, source_config=cfg,
        )

    q = start()
    with pytest.raises(StreamingQueryException, match="chaos"):
        q.processAllAvailable()
        q.awaitTermination()
    assert os.path.exists(crash_marker), "the chaos crash never fired"

    q = start()
    try:
        q.processAllAvailable()
        progress = q.lastProgress
        n_batches_p1 = progress["batchId"]
    finally:
        q.stop()
        q.awaitTermination()
    assert n_batches_p1 >= 150, f"only {n_batches_p1} triggers in phase 1"

    expected: dict[str, set] = {}
    for r in feed.collect():
        rec = json.loads(r["data"])
        expected.setdefault(rec["event_type"], set()).add(rec["event_id"])
    total_delivered = 0
    for stream_tag, ids in expected.items():
        got = read_delivered(out, stream_tag)
        assert len(got) == len(ids), (
            f"{stream_tag}: delivered {len(got)} != expected {len(ids)}"
        )
        assert {g["event_id"] for g in got} == ids
        total_delivered += len(got)
    assert total_delivered == n_events
    assert not os.path.isdir(dl) or not os.listdir(dl), "dead letters"

    # ---------------- phase 2: dedup_ingest_stream, 60 epochs + restart
    from kinesis_to_firehose_spark.sources.dedup_index import (
        build_dedup_index,
        run_dedup_ingest_stream,
    )

    docs = load(spark, "documents", SF).select("doc_id", "text")
    n_docs = docs.count()
    base = docs.filter(F.col("doc_id") % 5 == 0)
    arriving = docs.filter(F.col("doc_id") % 5 != 0)
    n_arriving = arriving.count()

    index = str(tmp_path / "index")
    src2 = str(tmp_path / "src2")
    out2 = str(tmp_path / "out2")
    ck2 = str(tmp_path / "ck2")
    build_dedup_index(spark, base, index, epoch=0)

    n_files = 60
    # 60 single-file micro-batches, disjoint by hash — write the first
    # half, drain, STOP, write the rest, RESTART from the checkpoint
    arriving = arriving.withColumn(
        "slice", F.pmod(F.hash("doc_id"), F.lit(n_files))
    )
    def write_half(lo, hi):
        for i in range(lo, hi):
            (
                arriving.filter(F.col("slice") == i)
                .drop("slice")
                .repartition(1)
                .write.mode("append")
                .parquet(src2)
            )

    write_half(0, 30)
    q2 = run_dedup_ingest_stream(spark, src2, index, out2, ck2)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()
    write_half(30, 60)
    q2 = run_dedup_ingest_stream(spark, src2, index, out2, ck2)
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()

    verdicts = spark.read.parquet(out2)
    assert verdicts.count() == n_arriving  # every arriving doc scored once
    assert verdicts.select("doc_id").distinct().count() == n_arriving
    epochs = {
        int(e.split("=")[1])
        for e in os.listdir(out2)
        if e.startswith("epoch=")
    }
    assert len(epochs) >= 55, f"only {len(epochs)} ingest epochs ran"
    # the index grew by exactly the arriving docs, once each
    fp = spark.read.parquet(f"{index}/fp")
    assert fp.count() == n_docs
    assert fp.select("doc_id").distinct().count() == n_docs

    # ---------------- phase 3: snapshot_sink, 60 slices + restart
    from kinesis_to_firehose_spark.registry import all_ops
    from kinesis_to_firehose_spark.sources.bucketed import snapshot_read
    from kinesis_to_firehose_spark.streaming.pipeline import (
        snapshot_sink,
        write_source_slice,
    )

    src3 = str(tmp_path / "src3")
    snap = str(tmp_path / "snap")
    ck3 = str(tmp_path / "ck3")
    write_source_slice(spark, SF, src3, n_files=60)

    q3 = snapshot_sink(
        spark, src3, snap, ck3,
        watermark="400 days", max_files_per_trigger=1,
    )
    # drain roughly a third, then stop mid-feed and resume
    import time

    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        p = q3.lastProgress
        if p and p["batchId"] >= 20:
            break
        time.sleep(0.5)
    q3.stop()
    q3.awaitTermination()
    q3 = snapshot_sink(
        spark, src3, snap, ck3,
        watermark="400 days", max_files_per_trigger=1,
    )
    q3.processAllAvailable()
    n_batches_p3 = q3.lastProgress["batchId"]
    q3.stop()
    q3.awaitTermination()
    assert n_batches_p3 >= 40, f"only {n_batches_p3} triggers in phase 3"

    stored = {
        r["user_id"]: (r["event_id"], round(r["value"], 2))
        for r in snapshot_read(spark, snap).collect()
    }
    want = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in all_ops()["latest_per_key"].fn(spark, SF).collect()
    }
    assert stored == want
