"""spark-submit entry point for the STREAMING extraction pipeline.

    spark-submit --py-files dist/trek_spark.zip jobs/stream_job.py \
        --input  /path/to/transcript-dir \
        --output /path/to/out \
        --checkpoint /path/to/ckpt \
        [--partitions N] [--continuous] [--dedup [--dedup-ttl-ms MS]]

File-source stream of transcript turns -> the same fused salted extraction
as the batch job -> checkpointed parquet sink (exactly-once across
restarts). Default is trigger(availableNow=True): drain what's there and
exit (the cron-batch deployment shape); --continuous keeps the query
running on the default micro-batch trigger.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--dedup", action="store_true",
                    help="drop exact-duplicate turns (stateful, "
                         "first-seen-wins) before extraction")
    ap.add_argument("--dedup-ttl-ms", type=int, default=None,
                    help="state TTL for --dedup in continuous mode; "
                         "leave unset for availableNow drains")
    args = ap.parse_args()

    from trek_spark.spark.session import get_spark
    from trek_spark.spark.streaming import stream_extract_turns

    spark = get_spark("trek-extract-stream")
    try:
        q = stream_extract_turns(
            spark, args.input, args.output, args.checkpoint,
            num_partitions=args.partitions,
            salt_buckets=args.salt_buckets,
            available_now=not args.continuous,
            dedup=args.dedup,
            dedup_ttl_ms=args.dedup_ttl_ms,
        )
        q.awaitTermination()
        print(json.dumps({"status": "drained" if not args.continuous
                          else "stopped",
                          "output": args.output}))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
