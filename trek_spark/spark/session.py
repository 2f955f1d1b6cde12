"""SparkSession factory tuned for the extraction workload.

Defaults encode the scale decisions from SURVEY.md §4: Arrow-batched Python
exchange with bounded batch sizes (HTML payloads are large — a 10k-row Arrow
batch of 500KB docs would be 5GB), AQE for runtime re-planning including skew
joins, and an explicit shuffle-partition count sized for the local harness
(override via spark.sql.shuffle.partitions on a real cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "trek-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") \
        or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # HTML payloads are large; keep Arrow batches ~tens of MB, not GB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # 256 rows of multi-MB documents can still exceed Arrow's 2 GiB
        # 32-bit string-offset limit — use 64-bit (large) var types.
        .config("spark.sql.execution.arrow.useLargeVarTypes", "true")
        # zstd over snappy: ~30% smaller tables at equal read speed — at
        # 100 TB of extracted text that is tens of TB of storage/IO.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
