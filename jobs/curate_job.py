"""spark-submit entry point for the training-data curation pipeline.

Composes the corpus-curation operators into the pipeline a pretraining
data team actually ships: quality gates (intra-doc repetition; optional
composite Gopher rule set via --gopher-gate) → near-dup collapse (keep
one canonical doc per cluster) → deterministic stratified sampling
and/or temperature mixing → benchmark decontamination → curated parquet
+ a one-line JSON stage ledger.

Usage:

    spark-submit --py-files dist/trek_spark.zip jobs/curate_job.py \
        --input  /path/with/documents.parquet    \
        --output /path/to/curated                \
        [--max-repetition-e4 N] [--skip-quality] [--gopher-gate] \
        [--skip-dedup] [--domain-cap N] [--skip-sample] \
        [--skip-decontaminate]

Plan shape (the part that matters at 100 TB): ONE scan of documents with
a codegen'd sample filter plus two BROADCAST anti-joins — the dropped
near-dup ids and the contaminated ids are both tiny relative to the
corpus (only docs with a near-dup edge / benchmark overlap appear), so
the corpus itself never shuffles (except the opt-in --domain-cap rank
window). The stage ledger rides the SAME single write action as
Observation metrics (CollectMetrics at each stage boundary), so every
`<stage>_dropped` delta is exact and costs zero extra corpus passes —
the whole job is one corpus-wide action plus the small CC side jobs.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.001",
                    help="directory containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--max-repetition-e4", type=int, default=6000,
                    help="drop docs whose duplicate-3-gram fraction "
                         "exceeds this (×10⁻⁴); Gopher-style repetition "
                         "gate, default 0.60")
    ap.add_argument("--gopher-gate", action="store_true",
                    help="ALSO drop docs failing the composite Gopher "
                         "rule set (word-count/word-length bounds, "
                         "symbol/bullet/alpha ratios) — the cheap "
                         "length-and-shape filter that runs before any "
                         "shuffle-bearing stage")
    ap.add_argument("--dup-ngram-max-permille", type=int, default=0,
                    help="drop docs whose CROSS-document duplicate "
                         "5-gram share exceeds this (permille); 0 "
                         "disables. The RefinedWeb repetition gate "
                         "measured against the whole corpus — "
                         "complements the intra-doc --max-repetition-e4")
    ap.add_argument("--ppl-keep", default="",
                    help="comma-set of CCNet perplexity buckets to keep "
                         "('head' or 'head,middle'); empty disables. "
                         "Buckets are the corpus's OWN char-trigram "
                         "perplexity terciles — no external model")
    ap.add_argument("--skip-dedup", action="store_true")
    ap.add_argument("--dedup-keep", choices=("min-id", "best-quality"),
                    default="min-id",
                    help="which member of each near-dup cluster ships: "
                         "the smallest doc_id (default, cheapest) or "
                         "the best learned-quality-classifier score "
                         "(production curation keeps the best copy of "
                         "a boilerplate family, not an arbitrary one)")
    ap.add_argument("--skip-sample", action="store_true")
    ap.add_argument("--domain-cap", type=int, default=0,
                    help="keep at most N docs per source (md5-tick "
                         "lottery, RefinedWeb-style anti-domination "
                         "cap); 0 disables. Runs after dedup so the "
                         "cap budget is spent on survivors, not "
                         "duplicates")
    ap.add_argument("--mix-sample", action="store_true",
                    help="temperature-scaled (alpha=0.5) SOURCE mixing "
                         "instead of / in addition to the lang-stratified "
                         "sample: quotas are computed from the surviving "
                         "post-dedup counts, keep decisions are a pure "
                         "hash of doc_id (typically used with "
                         "--skip-sample)")
    ap.add_argument("--split", action="store_true",
                    help="assign the deterministic md5-tick 80/10/10 "
                         "train/val/test split (pure function of "
                         "doc_id — reproducible across reruns and "
                         "cluster shapes) and PARTITION the output by "
                         "it, so downstream training reads its split "
                         "by directory without a filter scan")
    ap.add_argument("--pii-redact", action="store_true",
                    help="scrub emails/IPv4s/phone numbers from the "
                         "shipped text (fixed email->ip->phone "
                         "placeholder order; ledger counts docs whose "
                         "text changed)")
    ap.add_argument("--skip-decontaminate", action="store_true")
    ap.add_argument("--fuzzy-decontaminate", action="store_true",
                    help="ALSO drop docs within 10%% edit distance of a "
                         "benchmark doc over a 200-char prefix (catches "
                         "near-verbatim leakage the exact shingle "
                         "overlap misses)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from trek_spark.spark import ops as O
    from trek_spark.spark.session import get_spark

    from pyspark.sql import Observation

    spark = get_spark("trek-curate")
    t0 = time.time()
    try:
        docs = spark.read.parquet(f"{args.input}/documents.parquet")
        ledger = {}

        # Stage counts ride the final write as Observation metrics
        # (CollectMetrics nodes at each stage boundary): every
        # `<stage>_dropped` number is a real between-stage delta and the
        # whole ledger costs ZERO extra corpus actions — previously each
        # stage paid its own .count() pass (6 extra scans of a 100 TB
        # corpus). The only remaining pre-write action is --mix-sample's
        # quota plan, which genuinely needs survivor counts BEFORE the
        # keep filter can be constructed.
        boundaries: list[tuple[str, Observation]] = []

        def observe(df, name):
            ob = Observation(f"curate_{name}")
            boundaries.append((name, ob))
            return df.observe(ob, F.count(F.lit(1)).alias("n"))

        curated = observe(docs, "in")
        if not args.skip_quality:
            # repetition gate runs FIRST so template spam never reaches
            # the (pricier) shingle/dedup stages; the flagged set is the
            # small side (healthy corpora repeat rarely), so the corpus
            # again anti-joins without shuffling itself
            flagged_rep = (O.q_docs_repetition_ratio(spark, args.input)
                           .filter(F.col("repetition_e4")
                                   > args.max_repetition_e4)
                           .select("doc_id"))
            curated = observe(
                curated.join(flagged_rep, "doc_id", "left_anti"),
                "repetition")

        if args.gopher_gate:
            # per-row column expressions only — the gate itself costs one
            # scan; like the repetition gate, the FAILING set is the anti-
            # join side so the corpus still never shuffles
            failed = (O.q_gopher_quality_rules(spark, args.input)
                      .filter(~F.col("pass_all")).select("doc_id"))
            curated = observe(
                curated.join(failed, "doc_id", "left_anti"), "gopher")

        if args.dup_ngram_max_permille > 0:
            # cross-document repetition gate: like the intra-doc gate,
            # the FLAGGED set is the anti-join side (healthy corpora
            # sit far below the ceiling), so the corpus never shuffles;
            # the op itself pays its two bounded gram-hash shuffles on
            # a projected (doc_id, hash) stream, not on the full rows
            flagged_dng = (
                O.q_docs_duplicate_ngram_fraction(spark, args.input)
                .filter(F.col("dup_permille")
                        > args.dup_ngram_max_permille)
                .select("doc_id"))
            curated = observe(
                curated.join(flagged_dng, "doc_id", "left_anti"),
                "dup_ngram")

        if args.ppl_keep:
            # CCNet bucket gate. The DROPPED side can be a large
            # fraction of the corpus (keeping 'head' drops ~2/3), so —
            # exactly like the dedup anti-join — no broadcast hint: AQE
            # broadcasts the id set only when it is actually small and
            # falls back to a shuffled anti-join otherwise
            keep_buckets = [b.strip() for b in args.ppl_keep.split(",")
                            if b.strip()]
            unknown = set(keep_buckets) - {"head", "middle", "tail"}
            if unknown:
                # fail fast (r8 ADVICE, low): a typo'd bucket name made
                # isin() keep nothing and silently dropped every
                # perplexity-scored doc from the corpus
                raise SystemExit(
                    f"--ppl-keep: unknown bucket(s) {sorted(unknown)}; "
                    "valid buckets are head,middle,tail")
            dropped_ppl = (
                O.q_ccnet_perplexity_buckets(spark, args.input)
                .filter(~F.col("ppl_bucket").isin(keep_buckets))
                .select("doc_id"))
            curated = observe(
                curated.join(dropped_ppl, "doc_id", "left_anti"),
                "ppl_bucket")

        if not args.skip_dedup:
            labels, _rounds, converged = O._min_label_cc(
                O._cluster_edges(spark, args.input))
            if not converged:
                raise RuntimeError("near-dup clustering did not converge")
            if args.dedup_keep == "best-quality":
                # drop every cluster member EXCEPT the classifier-score
                # winner (q_dedup_keep_best_quality's selection rule):
                # same anti-join shape, the winner set is one row per
                # cluster so the dropped side is identical in size to
                # the min-id rule's. The job's OWN labels feed the
                # winner selection (r8 ADVICE: the public op re-ran the
                # whole iterative clustering a second time here)
                winners = (O._keep_best_quality_from_labels(
                               spark, args.input, labels)
                           .select(F.col("kept_doc").alias("doc_id")))
                dropped = (labels.select("doc_id")
                           .join(winners, "doc_id", "left_anti"))
            else:
                dropped = labels.filter(
                    F.col("doc_id") != F.col("cluster_id")) \
                    .select("doc_id")
            # no forced broadcast: the dropped set scales with the corpus
            # duplicate rate; AQE broadcasts it only when actually small
            curated = observe(
                curated.join(dropped, "doc_id", "left_anti"), "dedup")

        if args.domain_cap > 0:
            # the one stage that shuffles the corpus (rank window on
            # source) — deliberately after dedup so the per-domain
            # budget is spent on survivors, not on duplicates that were
            # about to be dropped anyway
            curated = observe(
                O.domain_cap_filter(curated, args.domain_cap),
                "domain_cap")

        if not args.skip_sample:
            curated = observe(
                curated.filter(O.sample_keep_cond()), "sample")

        if args.mix_sample:
            # quotas from the CURRENT survivor mix (post-gate/dedup),
            # not the raw table — rebalancing what actually ships; the
            # |sources|-row plan broadcasts back as a codegen'd filter.
            # r7 ADVICE closed: the quota aggregate is a corpus-wide
            # action BEFORE the write, so without a materialization
            # barrier the gates, dedup anti-join and domain-cap window
            # would all execute twice (once for the plan, again for the
            # final write). localCheckpoint pins the survivor set once
            # (MEMORY_AND_DISK, spill-safe); the upstream Observation
            # metrics ride this materialization instead of the write's,
            # which reads them identically after the job completes.
            curated = curated.localCheckpoint(eager=True)
            plan = O.mix_plan(curated)
            ledger["mix_budget"] = plan.agg(
                F.sum("quota")).collect()[0][0]
            curated = observe(
                curated
                .join(F.broadcast(plan), "source")
                .filter(F.expr(O.MIX_KEEP_COND))
                .drop("n_docs", "quota", "alpha_share_bp"), "mix")

        if not args.skip_decontaminate:
            flagged = O.q_benchmark_contamination(
                spark, args.input).select("doc_id")
            if args.fuzzy_decontaminate:
                flagged = flagged.unionAll(
                    O.q_benchmark_contamination_fuzzy(spark, args.input)
                    .select("doc_id")).distinct()
            curated = curated.join(flagged, "doc_id", "left_anti")
            # the benchmark documents THEMSELVES must never ship in the
            # training output — the contamination op only flags corpus
            # docs (doc_id >= _CONTAM_BENCH_MAX), so without this filter
            # the held-out set would leak into the curated set verbatim
            curated = observe(curated.filter(
                F.col("doc_id") >= O._CONTAM_BENCH_MAX), "decontaminate")

        pii_ob = None
        if args.pii_redact:
            # last stage before write: scrub what actually ships (a
            # redaction before dedup would waste work on rows about to
            # be dropped). Per-row JVM regexp chain, zero shuffle; the
            # changed-doc count rides the write as one more Observation
            # metric — no extra corpus action
            pii_ob = Observation("curate_pii")
            curated = (
                curated
                .withColumn("_redacted", O.pii_redact_col(F.col("text")))
                .observe(pii_ob, F.sum(
                    (F.col("_redacted")
                     != F.coalesce(F.col("text"), F.lit("")))
                    .cast("long")).alias("n_changed"))
                .withColumn("text", F.col("_redacted"))
                .drop("_redacted"))

        if args.split:
            # pure per-row expression (no shuffle); partitionBy routes
            # rows to split directories at write time, so training jobs
            # read train/ val/ test/ via partition pruning, never a scan
            curated = curated.withColumn("split", F.expr(O.SPLIT_EXPR))
            (curated.write.mode("overwrite").partitionBy("split")
             .parquet(f"{args.output}/documents"))
        else:
            curated.write.mode("overwrite").parquet(
                f"{args.output}/documents")

        if pii_ob is not None:
            ledger["pii_docs_redacted"] = int(
                pii_ob.get["n_changed"] or 0)
        counts = [(name, ob.get["n"]) for name, ob in boundaries]
        ledger["docs_in"] = counts[0][1]
        for (_prev_name, prev_n), (name, n) in zip(counts, counts[1:]):
            ledger[f"{name}_dropped"] = prev_n - n
        out = spark.read.parquet(f"{args.output}/documents")
        # one read-back pass serves both numbers: docs_out is the
        # by_lang sum (a second .count() scan of the output would be
        # exactly the redundant corpus action the Observation ledger
        # exists to avoid), and reading the written files — rather than
        # reusing the final boundary observation — keeps docs_out an
        # independent verification of what actually landed on disk
        by_lang = {r.lang: r.n for r in
                   out.groupBy("lang").agg(F.count("*").alias("n"))
                   .collect()}
        ledger["docs_out"] = sum(by_lang.values())
        ledger["out_by_lang"] = dict(sorted(by_lang.items()))
        if args.split:
            by_split = {r.split: r.n for r in
                        out.groupBy("split")
                        .agg(F.count("*").alias("n")).collect()}
            ledger["out_by_split"] = dict(sorted(by_split.items()))
        ledger["wall_sec"] = round(time.time() - t0, 2)
        print(json.dumps(ledger))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
