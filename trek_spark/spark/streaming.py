"""Structured Streaming surface for the extraction pipeline.

The reference is a per-document library with no streaming story; at
transcript-firehose scale the same fused extraction runs unchanged as a
stateless Structured Streaming stage:

* ``stream_extract_turns`` — ``readStream`` over a transcript directory →
  the SAME salted ``mapInPandas`` plan as the batch job (``extract_turns``
  is stateless per row, so it is streaming-safe as-is) → parquet sink with
  a checkpoint location. End-to-end exactly-once: the file source records
  consumed files and the file sink commits atomically per micro-batch, so
  a crashed micro-batch replays without duplication — the streaming
  counterpart of the batch job's wave-committed resume.
* ``stream_turn_rate`` — watermarked sliding-window throughput metrics
  (late turns beyond the watermark are dropped, state is bounded), the
  standard monitoring side-channel for a long-running ingest.

Both are driven by ``trigger(availableNow=True)`` in tests (process all
available input, then stop) and by the default micro-batch trigger in a
deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .corpus import TRANSCRIPT_SCHEMA
from .job import extract_turns


def read_transcript_stream(spark: SparkSession, input_dir: str,
                           max_files_per_trigger: int | None = None
                           ) -> DataFrame:
    """File-source stream of transcript turns (explicit schema — streaming
    sources never infer)."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract_turns(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    num_partitions: int = 8,
    salt_buckets: int = 16,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream → salted mapInPandas extraction → parquet sink.

    The extraction stage is stateless (one row in → one row out), so the
    batch plan applies verbatim; the salt still defuses long-conversation
    skew inside each micro-batch. Restart with the same checkpoint_dir
    resumes from the last committed micro-batch."""
    stream = read_transcript_stream(spark, input_dir)
    extracted = extract_turns(stream, num_partitions=num_partitions,
                              salt_buckets=salt_buckets)
    writer = (extracted.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_turn_rate(stream: DataFrame, window: str = "1 minute",
                     slide: str | None = None,
                     watermark: str = "2 minutes") -> DataFrame:
    """Watermarked windowed turn counts per role — bounded-state
    monitoring aggregation (late rows past the watermark are dropped)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(w, "role")
            .agg(F.count("*").alias("turns"),
                 F.sum(F.length("text")).alias("bytes_in")))
