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
    dedup: bool = False,
    dedup_ttl_ms: int | None = None,
) -> StreamingQuery:
    """readStream → [stateful exact dedup →] salted mapInPandas
    extraction → parquet sink.

    The extraction stage is stateless (one row in → one row out), so the
    batch plan applies verbatim; the salt still defuses long-conversation
    skew inside each micro-batch. Restart with the same checkpoint_dir
    resumes from the last committed micro-batch.

    ``dedup=True`` inserts :func:`stream_dedup_exact` BEFORE extraction —
    re-delivered pages are dropped before they cost Python CPU. For a
    continuous deployment set ``dedup_ttl_ms`` (bounds state) and
    configure the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``RocksDBStateStoreProvider``) so hash-marker state lives off-heap
    and spills to disk; leave ``dedup_ttl_ms`` None for availableNow
    drains (a pending processing-time timeout prevents drain
    termination)."""
    stream = read_transcript_stream(spark, input_dir)
    if dedup:
        stream = stream_dedup_exact(stream, state_ttl_ms=dedup_ttl_ms) \
            .drop("content_hash")
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


def stream_dedup_exact(stream: DataFrame,
                       state_ttl_ms: int | None = None) -> DataFrame:
    """Stateful in-stream exact dedup via ``applyInPandasWithState``: only
    the FIRST turn with a given content hash passes; later duplicates —
    in the same micro-batch or any later one — are dropped. The streaming
    counterpart of ``dedup_exact``: a crawl firehose re-delivers the same
    page endlessly, and dropping dupes before the (expensive, Python-CPU)
    extraction stage is where the savings are.

    State is keyed by the 128-bit content hash with a single marker row
    per key. ``state_ttl_ms`` bounds state for a LONG-RUNNING continuous
    stream (size ∝ unique-content arrival rate × TTL, not stream
    history) via ``ProcessingTimeTimeout`` eviction. The default is NO
    timeout, and that is deliberate: with a pending processing-time
    timeout, ``trigger(availableNow=True)`` never considers the stream
    drained — the engine keeps scheduling no-data micro-batches to
    re-evaluate timeouts and ``awaitTermination`` never returns (found
    when the round-5 review flagged the previously-unchecked
    ``awaitTermination(timeout)`` result: the drain tests had been
    passing on already-committed output while leaking a live query).
    Set a TTL only for continuous deployments; leave it None for
    availableNow drains.

    Within a batch the earliest (ts, conv_id, turn_idx) row wins, so
    output is deterministic for a deterministic input order."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = stream.withColumn(
        "content_hash", F.md5(F.coalesce(F.col("text"), F.lit(""))))
    out_fields = ("conv_id string, turn_idx int, role string, text string,"
                  " tool string, ts timestamp, url string,"
                  " content_hash string")

    def dedup(key: tuple, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if state.exists or pdf.empty:
                continue  # already seen in an earlier batch: drop all
            pdf = pdf.sort_values(["ts", "conv_id", "turn_idx"])
            cand = pdf.iloc[[0]]
            if first is None or tuple(cand.iloc[0][
                    ["ts", "conv_id", "turn_idx"]]) < tuple(first.iloc[0][
                    ["ts", "conv_id", "turn_idx"]]):
                first = cand
        if first is not None and not state.exists:
            state.update((1,))
            yield first
        if state_ttl_ms is not None and state.exists:
            # refresh TTL; a timeout can only be set while state exists
            state.setTimeoutDuration(state_ttl_ms)

    timeout_conf = (GroupStateTimeout.NoTimeout if state_ttl_ms is None
                    else GroupStateTimeout.ProcessingTimeTimeout)
    return hashed.groupBy("content_hash").applyInPandasWithState(
        dedup,
        outputStructType=out_fields,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=timeout_conf)


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


def stream_sessionize(stream: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 minutes") -> DataFrame:
    """Streaming sessionization via ``session_window`` — the
    DYNAMIC-window analogue of the batch op (ops.py events_sessionize):
    per conv_id, a session extends while turns keep arriving within
    ``gap`` of the previous one and closes after a quiet period.

    Why this exists next to the batch op: the batch lag/running-sum
    formulation needs the whole history of a key in one sort — fine for
    a bounded table, impossible for an unbounded stream. session_window
    keeps ONE [start, end) interval per open session as state, merges
    intervals when a late-but-in-watermark turn bridges two of them,
    and the watermark gives the eviction bound (a session whose
    end + gap is older than the watermark can never grow again, so its
    state is finalized and dropped — bounded state at any arrival
    rate). Output carries the computed session bounds plus per-session
    turn/byte counts."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap), F.col("conv_id"))
            .agg(F.count("*").alias("turns"),
                 F.sum(F.length("text")).alias("bytes_in")))


def stream_join_tool_results(turns: DataFrame, results: DataFrame,
                             watermark: str = "2 minutes",
                             max_lag: str = "5 minutes") -> DataFrame:
    """Watermarked STREAM-STREAM interval join: each streaming turn is
    enriched with the tool result that arrives for the same conv_id
    within ``[turn.ts, turn.ts + max_lag]`` — the streaming analogue of
    the batch AS-OF join (ops.py events_asof_join).

    State-boundedness at 100 TB/day rates: BOTH sides carry a watermark
    and the join condition is an equi-key PLUS a closed time interval,
    which is exactly what Structured Streaming needs to compute a state
    eviction bound for each side (turns older than watermark+lag and
    results older than watermark are dropped from state; without the
    interval the state would grow forever). Inner join → a turn with no
    result inside the window simply doesn't emit, which is the
    deterministic, replayable semantics (left-outer would emit nulls
    only after watermark passage)."""
    t = turns.withWatermark("ts", watermark).alias("t")
    r = results.withWatermark("res_ts", watermark).alias("r")
    return t.join(
        r,
        F.expr(f"""
            t.conv_id = r.conv_id AND
            r.res_ts >= t.ts AND
            r.res_ts <= t.ts + interval {max_lag}
        """),
        "inner",
    ).select(
        F.col("t.conv_id").alias("conv_id"),
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.ts").alias("ts"),
        F.col("r.tool").alias("tool"),
        F.col("r.res_ts").alias("res_ts"),
        F.col("r.payload").alias("payload"),
    )
