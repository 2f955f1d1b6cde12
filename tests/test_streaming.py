"""Structured Streaming extraction tests: file source → fused extraction →
parquet sink with checkpoint; watermarked windowed metrics."""

import os

import pytest
from pyspark.sql import functions as F

from trek_spark.spark.corpus import build_transcripts
from trek_spark.spark.session import get_spark
from trek_spark.spark.streaming import (
    read_transcript_stream, stream_extract_turns, stream_turn_rate,
)


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-streaming", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    # two files so the source has more than one split to track
    t = build_transcripts(spark).limit(24)
    t.filter(F.col("turn_idx") % 2 == 0).write.mode("append").parquet(d)
    t.filter(F.col("turn_idx") % 2 == 1).write.mode("append").parquet(d)
    return d


def test_stream_extract_end_to_end(spark, input_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    q = stream_extract_turns(spark, input_dir, out, ckpt, num_partitions=4)
    q.awaitTermination(300)
    n_in = spark.read.parquet(input_dir).count()
    result = spark.read.parquet(out)
    assert result.count() == n_in
    assert result.filter(F.col("error").isNotNull()).count() == 0
    # streaming output matches the batch plan on the same input
    row = (result.filter(F.col("extracted_text").isNotNull())
           .orderBy("conv_id", "turn_idx").select("extracted_text").first())
    assert row is not None and len(row.extracted_text) > 0

    # restart with the same checkpoint: nothing new to process, nothing
    # duplicated (exactly-once across restarts)
    q2 = stream_extract_turns(spark, input_dir, out, ckpt, num_partitions=4)
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n_in


def test_stream_turn_rate_windows(spark, input_dir, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("rate_ckpt"))
    stream = read_transcript_stream(spark, input_dir)
    rate = stream_turn_rate(stream, window="10 minutes",
                            watermark="5 minutes")
    q = (rate.writeStream.format("memory").queryName("turn_rate")
         .outputMode("complete")
         .trigger(availableNow=True).option("checkpointLocation", ckpt)
         .start())
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT role, sum(turns) AS turns FROM turn_rate GROUP BY role"
    ).collect()
    assert sum(r.turns for r in rows) == spark.read.parquet(input_dir).count()
    assert {r.role for r in rows} <= {"user", "assistant", "system", "tool"}


def test_stream_pdf_turns_dispatch(spark, tmp_path_factory):
    """tool == 'pdf' turns dispatch to the PDF layout branch through the
    STREAMING surface too — the same fused UDF runs under readStream, so
    the schema must carry the tool column through."""
    import datetime as dt

    from trek_spark.extract.pdf_text import make_simple_pdf

    d = str(tmp_path_factory.mktemp("stream_pdf_in"))
    payload = make_simple_pdf(["Streamed report", "With body text"],
                              compress=True).decode("latin-1")
    rows = [
        ("sc1", 0, "user",
         "<html><body><p>please check the attached report for anything "
         "unusual today</p></body></html>", None,
         dt.datetime(2024, 1, 1), "https://ex.example/a"),
        ("sc1", 1, "tool", payload, "pdf", dt.datetime(2024, 1, 1), None),
    ]
    from trek_spark.spark.corpus import TRANSCRIPT_SCHEMA
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .write.mode("append").parquet(d)

    out = str(tmp_path_factory.mktemp("stream_pdf_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_pdf_ckpt"))
    q = stream_extract_turns(spark, d, out, ckpt, num_partitions=4)
    q.awaitTermination(300)
    got = {r.turn_idx: r for r in spark.read.parquet(out).collect()}
    assert got[1].extractor_type == "pdf-layout"
    assert got[1].extracted_text == "Streamed report\nWith body text"
    assert "attached report" in got[0].extracted_text


def test_stream_dedup_exact_stateful(spark, tmp_path_factory):
    """applyInPandasWithState in-stream dedup: the first turn per content
    hash passes; duplicates are dropped BOTH within a micro-batch and
    across micro-batches (state persists between batches); unique content
    always passes."""
    import datetime as dt

    from trek_spark.spark.corpus import TRANSCRIPT_SCHEMA
    from trek_spark.spark.streaming import stream_dedup_exact

    d = str(tmp_path_factory.mktemp("dedup_in"))
    out = str(tmp_path_factory.mktemp("dedup_out"))
    ckpt = str(tmp_path_factory.mktemp("dedup_ckpt"))

    def rows(batch):
        t0 = dt.datetime(2024, 1, 1)
        return [(c, i, "user", txt, None, t0 + dt.timedelta(minutes=m), None)
                for c, i, txt, m in batch]

    # batch file 1: "AAA" twice (different convs), "BBB" once
    spark.createDataFrame(rows([("c1", 0, "AAA", 0), ("c2", 0, "AAA", 5),
                                ("c1", 1, "BBB", 1)]),
                          TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(d)
    # batch file 2: "AAA" again (cross-batch dup) + new "CCC"
    spark.createDataFrame(rows([("c3", 0, "AAA", 9), ("c3", 1, "CCC", 10)]),
                          TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(d)

    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (stream_dedup_exact(stream).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300)  # False = still running (timed out)

    got = spark.read.parquet(out).collect()
    by_text = {}
    for r in got:
        by_text.setdefault(r.text, []).append((r.conv_id, r.turn_idx))
    assert sorted(by_text) == ["AAA", "BBB", "CCC"]
    assert all(len(v) == 1 for v in by_text.values())
    # the earliest-ts AAA won (c1 turn 0 at t+0)
    assert by_text["AAA"] == [("c1", 0)]


def test_stream_extract_with_dedup_stage(spark, tmp_path_factory):
    """dedup=True drops re-delivered duplicate turns BEFORE the extraction
    stage: the sink holds one extracted row per distinct content."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trek_spark.spark.corpus import TRANSCRIPT_SCHEMA
    from trek_spark.spark.streaming import stream_extract_turns

    d = str(tmp_path_factory.mktemp("sx_in"))
    out = str(tmp_path_factory.mktemp("sx_out"))
    ckpt = str(tmp_path_factory.mktemp("sx_ckpt"))
    t0 = dt.datetime(2024, 1, 1)
    html = "<html><body><article><p>Dedup stage body text.</p></article></body></html>"
    rows = [("c1", 0, "user", html, None, t0, None),
            ("c2", 0, "user", html, None, t0, None),      # exact dup
            ("c1", 1, "user", html + " ", None, t0, None)]  # distinct
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(d)
    q = stream_extract_turns(spark, d, out, ckpt, num_partitions=4,
                             dedup=True)
    assert q.awaitTermination(300)
    got = spark.read.parquet(out).select("conv_id", "turn_idx").collect()
    assert {(r.conv_id, r.turn_idx) for r in got} == {("c1", 0), ("c1", 1)}


def test_stream_stream_interval_join(spark, tmp_path_factory):
    """Watermarked stream-stream interval join: a turn is enriched by
    the tool result arriving on the same conv_id within [ts, ts+5min];
    a result outside the window (or on another conv) must not match.
    Both sides are real file streams drained with availableNow."""
    import datetime as dt

    from trek_spark.spark.streaming import stream_join_tool_results

    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    turns_dir = str(tmp_path_factory.mktemp("ss_turns"))
    res_dir = str(tmp_path_factory.mktemp("ss_results"))
    out = str(tmp_path_factory.mktemp("ss_out"))
    ckpt = str(tmp_path_factory.mktemp("ss_ckpt"))

    turn_schema = "conv_id string, turn_idx int, role string, ts timestamp"
    res_schema = "conv_id string, tool string, res_ts timestamp, " \
                 "payload string"
    spark.createDataFrame(
        [("c1", 0, "user", base),
         ("c1", 1, "assistant", base + dt.timedelta(minutes=1)),
         ("c2", 0, "user", base)],
        turn_schema).coalesce(1).write.mode("append").parquet(turns_dir)
    spark.createDataFrame(
        [("c1", "search", base + dt.timedelta(minutes=2), "hits=3"),
         # too late for c1 turn 0 (lag > 5 min) but joins turn 1
         ("c1", "fetch", base + dt.timedelta(minutes=5, seconds=30), "ok"),
         # different conv: must never appear against c1/c2 turns
         ("c9", "search", base + dt.timedelta(minutes=1), "orphan")],
        res_schema).coalesce(1).write.mode("append").parquet(res_dir)

    turns = (spark.readStream.schema(turn_schema).parquet(turns_dir))
    results = (spark.readStream.schema(res_schema).parquet(res_dir))
    joined = stream_join_tool_results(turns, results)
    q = (joined.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(300)

    got = {(r.conv_id, r.turn_idx, r.tool)
           for r in spark.read.parquet(out).collect()}
    assert got == {("c1", 0, "search"),    # 2 min lag: in window
                   ("c1", 1, "search"),    # 1 min lag: in window
                   ("c1", 1, "fetch")}     # 4.5 min lag from turn 1
    # the orphan conv and the >5-min pairing never emitted


def test_stream_sessionize_dynamic_windows(spark, tmp_path_factory):
    """session_window semantics pinned on crafted timestamps: turns
    within the 30-min gap chain into one session (end = last turn +
    gap), a 50-min quiet period splits a conversation into two
    sessions, and conversations never merge across conv_id."""
    from datetime import datetime

    from trek_spark.spark.streaming import stream_sessionize

    d = str(tmp_path_factory.mktemp("sess_in"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))

    def t(h, m):
        return datetime(2026, 3, 1, h, m, 0)

    rows = [
        ("A", 0, "user", "hi", None, t(10, 0), None),
        ("A", 1, "assistant", "hello", None, t(10, 10), None),
        ("A", 2, "user", "back after lunch", None, t(11, 0), None),
        ("B", 0, "user", "solo", None, t(10, 5), None),
    ]
    from trek_spark.spark.corpus import TRANSCRIPT_SCHEMA
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .write.mode("append").parquet(d)

    stream = read_transcript_stream(spark, d)
    sess = stream_sessionize(stream, gap="30 minutes",
                             watermark="5 minutes")
    q = (sess.writeStream.format("memory").queryName("sessions")
         .outputMode("complete")
         .trigger(availableNow=True).option("checkpointLocation", ckpt)
         .start())
    q.awaitTermination(300)
    got = {(r.conv_id, r.start.strftime("%H:%M"), r.end.strftime("%H:%M"),
            r.turns)
           for r in spark.sql(
               "SELECT conv_id, session_window.start AS start, "
               "session_window.end AS end, turns FROM sessions"
           ).collect()}
    assert got == {
        ("A", "10:00", "10:40", 2),   # chained: end = 10:10 + 30 min
        ("A", "11:00", "11:30", 1),   # split by the 50-min quiet gap
        ("B", "10:05", "10:35", 1),   # keys never merge
    }


def test_stream_late_data_dropped_after_checkpoint_restore(spark):
    """The watermark must survive a checkpoint restore and drop a row
    replayed into an already-closed window: exactly one emitted row for
    window [0,60) with turns=1 (the late row did NOT leak in or
    resurrect closed state), and the engine's numRowsDroppedByWatermark
    records exactly the one drop."""
    import importlib.util as u

    spec = u.spec_from_file_location("entry_late", "__spark_entry__.py")
    mod = u.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = mod._stream_late_data_audit(spark, "unused").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["role"], r["turns"], r["dropped_late"]) == ("user", 1, 1)


def test_stream_dedup_within_watermark_suppresses_replays(spark):
    """dropDuplicatesWithinWatermark (the engine-native TTL dedup) must
    suppress BOTH the in-batch duplicate and the cross-batch replay of
    (c1, 0) while letting the fresh key through — exactly 3 rows, each
    keeping its FIRST-seen text."""
    import importlib.util as u

    spec = u.spec_from_file_location("entry_ddww", "__spark_entry__.py")
    mod = u.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rows = [(r["conv_id"], r["turn_idx"], r["text"]) for r in
            mod._stream_dedup_within_watermark(spark, "unused").collect()]
    assert rows == [("c1", 0, "first"), ("c1", 1, "reply"),
                    ("c2", 0, "fresh")]
