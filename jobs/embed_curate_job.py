"""spark-submit entry point for the embedding-space curation pipeline.

Composes the embedding-curation operators into the pipeline a training
team runs over a labeled vector corpus: trained-centroid cell
assignment → SemDeDup-style semantic dedup (keep each cell's
nearest-to-centroid representative, drop members above the cosine
threshold to it) → optional kNN label-noise gate → the survivor set
written PARTITIONED BY CELL — the on-disk layout that IS the IVF
index (an ANN probe of cell c is a partition-pruned read of cell=c/,
never a scan).

Usage:

    spark-submit --py-files dist/trek_spark.zip jobs/embed_curate_job.py \
        --input  /path/with/embeddings.parquet  \
        --output /path/to/curated               \
        [--skip-semdedup] [--drop-flagged-labels]

Plan shape at 10⁹ vectors: assignment is a zero-shuffle literal-
centroid map; semantic dedup adds one window on cell + a k-row
broadcast join; the label gate is the in-cell equi-join probe shape
(work ∝ cell population — grow k so cells stay bounded, the same knob
as the IVF ops). Stage counts ride the single write action as
Observation metrics (the curate_job pattern): no extra corpus passes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001")
    ap.add_argument("--output", required=True)
    ap.add_argument("--skip-semdedup", action="store_true")
    ap.add_argument("--drop-flagged-labels", action="store_true",
                    help="drop vectors whose 3 nearest same-cell "
                         "neighbors all disagree on label (default: "
                         "audit counts only)")
    args = ap.parse_args()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from trek_spark.spark import ops as O
    from trek_spark.spark.session import get_spark

    spark = get_spark("trek-embed-curate")
    t0 = time.time()
    try:
        ledger = {}
        boundaries: list[tuple[str, Observation]] = []

        def observe(df, name):
            ob = Observation(f"embcur_{name}")
            boundaries.append((name, ob))
            return df.observe(ob, F.count(F.lit(1)).alias("n"))

        curated = observe(
            O._ivf_assigned_with_dist(spark, args.input), "in")

        if not args.skip_semdedup:
            # the dropped set is the join-back of the audit table — tiny
            # relative to the corpus (only above-threshold members), so
            # the corpus anti-joins without shuffling itself
            dropped = (O.q_semantic_dedup_medoid(spark, args.input)
                       .filter(F.col("dropped") == 1)
                       .select("vec_id"))
            curated = observe(
                curated.join(dropped, "vec_id", "left_anti"), "semdedup")

        flagged = (O.q_embedding_label_noise(spark, args.input)
                   .filter(F.col("flagged") == 1)
                   .select("vec_id"))
        if args.drop_flagged_labels:
            curated = observe(
                curated.join(flagged, "vec_id", "left_anti"),
                "label_noise")
        else:
            # audit-only: count the flags with a cheap bounded action on
            # the flag set (not a corpus pass) and ship everything
            ledger["label_flagged"] = flagged.count()

        # cell partitioning = the IVF index layout: each cell is a
        # directory, a probe is a partition-pruned read
        (curated.drop("d_own")
         .write.mode("overwrite").partitionBy("cell")
         .parquet(f"{args.output}/embeddings"))

        counts = [(name, ob.get["n"]) for name, ob in boundaries]
        ledger["vecs_in"] = counts[0][1]
        for (_p, prev_n), (name, n) in zip(counts, counts[1:]):
            ledger[f"{name}_dropped"] = prev_n - n
        out = spark.read.parquet(f"{args.output}/embeddings")
        by_cell = {int(r.cell): r.n for r in
                   out.groupBy("cell").agg(F.count("*").alias("n"))
                   .collect()}
        ledger["vecs_out"] = sum(by_cell.values())
        ledger["out_by_cell"] = dict(sorted(by_cell.items()))
        ledger["wall_sec"] = round(time.time() - t0, 2)
        print(json.dumps(ledger))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
