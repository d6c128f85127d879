"""`kinesis_replay` — a Spark 4 Python Data Source (pyspark.sql.
datasource API) exposing the Kinesis-shaped record log as a REAL
`.format(...)` connector, batch and streaming.

This is the piece the reference's KCL consumer (main.go:49-56 via
amazon-kinesis-client-go) maps to that a plain file stream cannot
express: a stream with NAMED SHARDS, per-shard monotonically
increasing sequence numbers, and checkpointable per-shard offsets.
The AWS transport stays out (no boto3/jars in this environment —
the on-disk "stream" is a directory of per-shard JSONL logs that a
producer appends to), but everything Spark-side is the true
connector contract:

- one `InputPartition` per shard → shard-parallel reads on
  EXECUTORS (the scale shape of the real connector: reader
  parallelism == shard count, like one KCL record-processor per
  shard);
- the stream reader's offsets are `{shard_id: next_sequence_number}`
  dicts, JSON-checkpointed by Structured Streaming exactly like
  Kinesis sequence-number checkpoints in the KCL lease table — a
  restart resumes from the committed offset with no re-delivery;
- `latestOffset` scans only file SIZES/line counts on the driver;
  record bytes are read only in `read()` on executors.

Layout: `<path>/shard-<i>.jsonl`, one record per line; the line
number IS the sequence number. `write_replay_slices` is the producer
half (partition_key → shard via md5, mirroring Kinesis's
hash-key-range routing).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "kinesis_replay"

# record surface mirrors what GetRecords hands the KCL processor
REPLAY_SCHEMA = (
    "shard_id string, sequence_number bigint, partition_key string, "
    "data string"
)


def shard_for_key(partition_key: str, n_shards: int) -> int:
    """Kinesis routes by md5 of the partition key over the hash-key
    range; mod over the md5 prefix is the same stable routing."""
    h = int(hashlib.md5(partition_key.encode()).hexdigest()[:8], 16)
    return h % n_shards


def write_replay_slices(
    path: str,
    records: Sequence[tuple[str, str]],
    n_shards: int = 4,
) -> None:
    """Producer half: append (partition_key, data) records to their
    shards' JSONL logs. Append-only — repeated calls extend the
    stream, which is what the stream reader's offsets track."""
    os.makedirs(path, exist_ok=True)
    by_shard: dict[int, list[tuple[str, str]]] = {}
    for pk, data in records:
        by_shard.setdefault(shard_for_key(pk, n_shards), []).append((pk, data))
    for shard, recs in by_shard.items():
        with open(os.path.join(path, f"shard-{shard}.jsonl"), "a") as f:
            for pk, data in recs:
                f.write(json.dumps({"pk": pk, "data": data}) + "\n")
    # shards with no records yet still need their log to exist so the
    # reader's shard discovery is stable from the first batch
    for shard in range(n_shards):
        p = os.path.join(path, f"shard-{shard}.jsonl")
        if not os.path.exists(p):
            open(p, "a").close()


def _shard_files(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path)
        if f.startswith("shard-") and f.endswith(".jsonl")
    )


def _line_count(fp: str) -> int:
    n = 0
    with open(fp) as f:
        for _ in f:
            n += 1
    return n


def _read_lines(
    fp: str, shard_id: str, start: int, end: int
) -> Iterator[tuple]:
    with open(fp) as f:
        for seq, line in enumerate(f):
            if seq >= end:
                break
            if seq >= start:
                rec = json.loads(line)
                yield (shard_id, seq, rec["pk"], rec["data"])


@dataclass
class ShardSlice(InputPartition):
    """One shard's [start, end) sequence range — the unit of executor
    parallelism for both batch and stream reads."""

    file_path: str
    shard_id: str
    start: int
    end: int


class KinesisReplayBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]

    def partitions(self) -> list[ShardSlice]:
        return [
            ShardSlice(
                os.path.join(self.path, f),
                f[: -len(".jsonl")],
                0,
                _line_count(os.path.join(self.path, f)),
            )
            for f in _shard_files(self.path)
        ]

    def read(self, partition: ShardSlice) -> Iterator[tuple]:
        yield from _read_lines(
            partition.file_path,
            partition.shard_id,
            partition.start,
            partition.end,
        )


class KinesisReplayStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offsets are {shard_id: next_seq} dicts —
    the Spark-checkpoint analogue of KCL's per-shard sequence-number
    checkpoints. latestOffset() touches only line counts; record
    parsing happens in read() on executors."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {f[: -len(".jsonl")]: 0 for f in _shard_files(self.path)}

    def latestOffset(self) -> dict:
        return {
            f[: -len(".jsonl")]: _line_count(os.path.join(self.path, f))
            for f in _shard_files(self.path)
        }

    def partitions(self, start: dict, end: dict) -> list[ShardSlice]:
        out = []
        for shard, hi in end.items():
            lo = start.get(shard, 0)
            if hi > lo:
                out.append(
                    ShardSlice(
                        os.path.join(self.path, f"{shard}.jsonl"),
                        shard,
                        lo,
                        hi,
                    )
                )
        # Spark requires ≥1 partition per batch; an empty batch still
        # planned (no new data on any shard) gets one empty slice
        if not out:
            any_shard = next(iter(end), None)
            if any_shard is None:
                raise ValueError(f"no shard logs under {self.path}")
            out.append(
                ShardSlice(
                    os.path.join(self.path, f"{any_shard}.jsonl"),
                    any_shard,
                    0,
                    0,
                )
            )
        return out

    def read(self, partition: ShardSlice) -> Iterator[tuple]:
        yield from _read_lines(
            partition.file_path,
            partition.shard_id,
            partition.start,
            partition.end,
        )

    def commit(self, end: dict) -> None:
        # KCL would checkpoint the lease table here; Spark's own
        # checkpoint log already persisted `end`, so nothing to do.
        pass


class KinesisReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return REPLAY_SCHEMA

    def reader(self, schema: StructType) -> KinesisReplayBatchReader:
        return KinesisReplayBatchReader(self.options)

    def streamReader(self, schema: StructType) -> KinesisReplayStreamReader:
        return KinesisReplayStreamReader(self.options)


def register_replay_source(spark) -> None:
    """Make `.format("kinesis_replay")` resolvable on this session."""
    spark.dataSource.register(KinesisReplayDataSource)
