"""Spark-level integration tests: corpus → salted extraction → per-turn
equality, checkpoint resume, metrics (north-rule surface)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from trek_spark.spark.corpus import build_golden, build_transcripts
from trek_spark.spark.job import extract_turns, run_extraction_job
from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-trek", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def extracted(spark):
    transcripts = build_transcripts(spark)
    return extract_turns(transcripts, num_partitions=8).persist()


def test_corpus_shape(spark):
    t = build_transcripts(spark)
    assert t.count() >= 180
    assert set(t.columns) == {"conv_id", "turn_idx", "role", "text", "tool",
                              "ts", "url"}
    # stable ordering key is unique
    assert t.select("conv_id", "turn_idx").distinct().count() == t.count()


def test_per_turn_equality_green_subset(spark, extracted):
    """North-rule gate: per-turn text equality vs golden outputs under
    stable (conv_id, turn_idx) ordering, for the ratcheted green set."""
    with open(os.path.join(os.path.dirname(__file__),
                           "markdown_green.json")) as f:
        green = set(json.load(f))
    golden = build_golden(spark)
    joined = (
        extracted.join(golden, ["conv_id", "turn_idx"])
        .filter(F.col("fixture").isin(list(green)))
        .select("fixture", "extracted_text", "expected_markdown")
        .collect()
    )
    assert len(joined) == len(green)
    mismatches = [
        r.fixture for r in joined
        if (r.extracted_text or "").strip() != (r.expected_markdown or "").strip()
    ]
    assert not mismatches, f"per-turn mismatches: {mismatches[:5]}"


def test_extraction_no_failures(extracted):
    assert extracted.filter(F.col("error").isNotNull()).count() == 0


def test_metrics_columns_populated(extracted):
    row = extracted.select(F.sum("doc_bytes").alias("d"),
                           F.max("wall_ms").alias("w")).collect()[0]
    assert row.d > 0 and row.w >= 0


def test_metrics_not_inflated(spark, extracted, tmp_path_factory):
    """Round-1 ADVICE: batch metrics stamped per row must not multiply —
    docs_in summed over the metrics table equals the actual row count."""
    out = str(tmp_path_factory.mktemp("metrics"))
    transcripts = build_transcripts(spark).limit(30)
    r = run_extraction_job(spark, transcripts, out, num_partitions=8,
                           part_buckets=8)
    metrics = spark.read.parquet(os.path.join(out, "metrics"))
    total_docs = metrics.agg(F.sum("docs_in")).collect()[0][0]
    assert total_docs == 30 == r["rows"]
    # resume run must not duplicate metrics rows (dynamic overwrite)
    run_extraction_job(spark, transcripts, out, num_partitions=8,
                       part_buckets=8)
    total_docs2 = (spark.read.parquet(os.path.join(out, "metrics"))
                   .agg(F.sum("docs_in")).collect()[0][0])
    assert total_docs2 == 30


def test_checkpoint_resume(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("job"))
    transcripts = build_transcripts(spark).limit(40)
    r1 = run_extraction_job(spark, transcripts, out, num_partitions=8,
                            part_buckets=8)
    assert r1["rows"] == 40 and r1["failures"] == 0
    ledger = json.load(open(os.path.join(out, "ledger.json")))
    assert ledger["completed_buckets"]
    # second run resumes: everything already in the ledger → no new rows
    r2 = run_extraction_job(spark, transcripts, out, num_partitions=8,
                            part_buckets=8)
    assert r2["rows"] == 0
    # output readable and complete
    turns = spark.read.parquet(os.path.join(out, "turns"))
    assert turns.count() == 40


def test_salting_spreads_conversations(spark):
    from trek_spark.spark.job import salted
    t = build_transcripts(spark)
    df = salted(t, 8, salt_buckets=16)
    parts = df.withColumn("pid", F.spark_partition_id()) \
        .groupBy("pid").count().collect()
    assert len(parts) > 1  # one conversation cannot pin a single partition
