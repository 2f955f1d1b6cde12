"""The extraction job: scan → salt/repartition → extract → write, with
per-partition metrics and an idempotent checkpoint ledger.

Physical plan (SURVEY.md §3.4):

* One shuffle total — ``repartition(N, conv_id, salt)`` where
  ``salt = pmod(hash(conv_id, turn_idx), S)``. The salt defuses
  long-conversation skew the optimizer can't see (cost is Python CPU per
  document, not bytes, so AQE's byte-based skew split won't trigger);
  including turn_idx in the salt hash spreads a single giant conversation
  across S partitions while keeping placement deterministic.
* Extraction runs in ``mapInPandas`` (narrow, post-shuffle): Arrow batches
  in, result+metrics columns out. No further shuffle — the write is
  partition-local.
* Resume: output is written partitioned by ``part_bucket`` (a stable hash
  bucket of conv_id, NOT the physical partition id). A ledger of completed
  buckets allows an idempotent restart: completed buckets are anti-joined
  away, and re-writes use dynamic partition overwrite so a re-run of a
  half-finished bucket replaces rather than duplicates.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .udf import METRICS_SCHEMA, RESULT_SCHEMA, extract_map_in_pandas

RESULT_COLS = [f.name for f in RESULT_SCHEMA.fields]
METRIC_COLS = ["part_id", "batch_idx", "docs_in", "failures", "bytes_in",
               "wall_ms"]


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
    extracted turns with result + metrics columns.

    AQE partition coalescing is disabled for this stage: it merges
    post-shuffle partitions by BYTES, but extraction cost is Python CPU per
    document — byte-based coalescing was measured to halve effective
    parallelism on local[32]. Partition count defaults to 4× parallelism so
    the large-document tail doesn't straggle."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 4
    base_cols = [c for c in df.columns]
    out_schema = ", ".join(
        [f"{c} {_spark_type(df, c)}" for c in base_cols if c != "text"]
        + [f"{f.name} {f.dataType.simpleString()}" for f in RESULT_SCHEMA.fields]
        + ["part_id int", "batch_idx int", "docs_in long", "failures long",
           "bytes_in long", "wall_ms long"]
    )
    salted_df = salted(df, num_partitions, salt_buckets)
    return salted_df.drop("salt").withColumn(
        "text", F.col("text")
    ).mapInPandas(extract_map_in_pandas, schema=out_schema)


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
      turns/        parquet partitioned by part_bucket (the output table)
      metrics/      per-batch metrics parquet
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

    remaining = df  # lazily planned; empty → nothing to do
    extracted = extract_turns(remaining, num_partitions, salt_buckets)
    extracted = extracted.persist()

    rows_out = extracted.count()
    if rows_out:
        (extracted.drop(*METRIC_COLS)
         .write.mode("overwrite").partitionBy("part_bucket").parquet(turns_dir))
        (extracted.select("part_bucket", *METRIC_COLS)
         .groupBy("part_bucket", "part_id")
         .agg(F.sum("docs_in").alias("docs_in"),
              F.sum("failures").alias("failures"),
              F.sum("bytes_in").alias("bytes_in"),
              F.sum("wall_ms").alias("wall_ms"),
              F.count("*").alias("batches"))
         .write.mode("append").parquet(metrics_dir))

        finished = [r.part_bucket for r in
                    extracted.select("part_bucket").distinct().collect()]
        done.update(finished)
        os.makedirs(output_dir, exist_ok=True)
        with open(ledger_path, "w") as f:
            json.dump({"completed_buckets": sorted(done),
                       "updated_at": time.time()}, f)
    extracted.unpersist()

    wall = time.time() - t0
    failures = 0
    if rows_out:
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
