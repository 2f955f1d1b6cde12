"""Spark 4 Python Data Source: a deterministic synthetic transcript
generator registered as ``trek_transcripts``.

The input contract of the whole pipeline is an Iceberg/parquet table of
conversation turns ``(conv_id, turn_idx, role, text, tool, ts)``; this
source manufactures that table at any requested scale WITHOUT driver-side
materialization — each input partition generates its conversation range
directly on the executor from a pure function of ``(conv_index,
turn_idx)``, so a 10¹²-turn load test is just ``conversations=10⁹`` and
more partitions, and a re-read is bit-identical (no RNG state anywhere;
all variety derives from md5 of the coordinates).

Two read paths over the same generator, so batch and streaming tests see
the SAME rows:

* batch (``spark.read.format("trek_transcripts")``) —
  ``DataSourceReader.partitions`` splits the conversation range evenly;
  rows stream out of a generator (never a per-partition list).
* micro-batch streaming (``spark.readStream.format(...)``) — a
  ``SimpleDataSourceStreamReader`` advances a conversation-index offset
  ``convs_per_batch`` per batch up to ``conversations``; the start
  offset always comes from Spark's checkpoint, so the reader is
  stateless and restart-exact, and tests get a finite, replayable
  firehose without writing staging files.

Reference scope: none (the reference is a per-document library); this is
the Spark-4-native synthetic-source surface for harnesses and scale
rehearsals.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EPOCH = dt.datetime(2024, 1, 1)
_ROLES = ("user", "assistant", "system", "tool")
_TOOLS = ("search", "browser", "python", "bash")

SCHEMA = ("conv_id string, turn_idx int, role string, text string, "
          "tool string, ts timestamp")


def _h(*parts: object) -> int:
    """Deterministic 32-bit tick from md5 of the coordinate tuple."""
    key = ":".join(str(p) for p in parts).encode()
    return int(hashlib.md5(key).hexdigest()[:8], 16)


def _turns_in_conv(conv: int) -> int:
    return 3 + _h("len", conv) % 6  # 3..8 turns


def _row(conv: int, turn: int) -> tuple:
    """Pure function (conv_index, turn_idx) -> transcript row."""
    conv_id = f"synth-{conv:08d}"
    role = _ROLES[_h("role", conv, turn) % 4] if turn else "user"
    tool = _TOOLS[_h("tool", conv, turn) % 4] if role == "tool" else None
    words = " ".join(
        f"w{_h('w', conv, turn, i) % 997}"
        for i in range(4 + _h("n", conv, turn) % 9))
    text = (f"<p>turn {turn} of {conv_id}: {words}</p>"
            if role != "tool" else f'{{"result": "{words}"}}')
    ts = _EPOCH + dt.timedelta(hours=conv % 8760, minutes=turn)
    return (conv_id, turn, role, text, tool, ts)


def _gen(conv_start: int, conv_end: int) -> Iterator[tuple]:
    for conv in range(conv_start, conv_end):
        for turn in range(_turns_in_conv(conv)):
            yield _row(conv, turn)


class _ConvRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.conversations = int(options.get("conversations", 100))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        n, p = self.conversations, max(1, self.num_partitions)
        step = max(1, (n + p - 1) // p)
        return [_ConvRange(i, min(i + step, n)) for i in range(0, n, step)]

    def read(self, partition: _ConvRange):
        return _gen(partition.start, partition.end)


class _StreamReader(SimpleDataSourceStreamReader):
    """Conversation-index offsets: {"conv": N} means conversations
    [0, N) are committed. The SIMPLE stream-reader contract is chosen
    deliberately: Spark hands the checkpointed start offset INTO
    ``read(start)``, so the reader holds no state of its own and a
    checkpoint restart resumes exactly (the stateful
    ``DataSourceStreamReader.latestOffset`` variant would need its
    cursor re-seeded after recovery). Replay of a committed batch goes
    through ``readBetweenOffsets``, a pure function of the range."""

    def __init__(self, options: dict):
        self.conversations = int(options.get("conversations", 100))
        self.per_batch = int(options.get("convs_per_batch", 25))

    def initialOffset(self):
        return {"conv": 0}

    def read(self, start: dict):
        # iter() over a materialized list: the prefetch wrapper drains
        # the result with next() (so a bare list fails) and pickles the
        # drained rows to executors (so a generator fails too). Batches
        # are convs_per_batch-bounded; the partition-parallel batch
        # reader is the unbounded-scale path.
        lo = start["conv"]
        hi = min(lo + self.per_batch, self.conversations)
        return iter(list(_gen(lo, hi))), {"conv": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen(start["conv"], end["conv"])))

    def commit(self, end: dict):
        pass


class TranscriptDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "trek_transcripts"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(TranscriptDataSource)
