"""End-to-end tests for jobs/train_export_job.py (r7 verdict #4): the
training-export tail — split → pack → manifest — with the sequence
boundary semantics and split purity pinned."""

import hashlib
import json
import sys
from unittest import mock

import pytest
from pyspark.sql import functions as F

from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-texp", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _tick(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def _split_of(doc_id: int) -> str:
    t = _tick(doc_id)
    return "train" if t < 80 else ("val" if t < 90 else "test")


def _run_job(spark, input_dir, out, extra=()):
    from jobs import train_export_job
    argv = ["train_export_job.py", "--input", input_dir,
            "--output", out, *extra]
    printed = []
    with mock.patch.object(sys, "argv", argv), \
            mock.patch("builtins.print",
                       side_effect=lambda *a, **k: printed.append(a)):
        with mock.patch.object(spark, "stop"):
            train_export_job.main()
    return json.loads(printed[-1][0])


def test_boundary_semantics_and_assembly(spark, tmp_path):
    """5 docs x 1000 tokens at capacity 2048, one (split,lang,shard)
    stream: a doc is assigned to the sequence where it STARTS, so the
    seq ids are {0,0,0,1,1}; text assembles in doc_id order."""
    # pick 5 same-split ('train') doc ids inside one shard
    ids = [d for d in range(1, 400) if _split_of(d) == "train"][:5]
    rows = [(d, " ".join([f"w{d}_{j}" for j in range(1000)]), "en", "s0",
             0) for d in ids]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").coalesce(1).write.parquet(
        f"{src}/documents.parquet")
    out = str(tmp_path / "out")
    ledger = _run_job(spark, src, out, ("--capacity", "2048"))
    assert ledger["docs_in"] == 5 and ledger["docs_packed"] == 5
    assert ledger["n_sequences"] == 2
    assert ledger["seqs_by_split"] == {"train": 2}
    seqs = (spark.read.parquet(f"{out}/sequences")
            .orderBy("seq_id").collect())
    assert [r.seq_id for r in seqs] == [0, 1]
    assert [r.n_docs for r in seqs] == [3, 2]
    assert [r.seq_tokens for r in seqs] == [3000, 2000]
    assert (seqs[0].first_doc, seqs[0].last_doc) == (ids[0], ids[2])
    assert (seqs[1].first_doc, seqs[1].last_doc) == (ids[3], ids[4])
    # assembly order: doc_id-ascending, blank-line separated
    assert seqs[0].text.split("\n\n") == [
        " ".join([f"w{d}_{j}" for j in range(1000)]) for d in ids[:3]]
    # manifest agrees with the written files
    man = spark.read.parquet(f"{out}/manifest").collect()
    assert len(man) == 1
    assert (man[0].n_seqs, man[0].n_docs, man[0].n_tokens) == (2, 5, 5000)
    assert (man[0].first_doc, man[0].last_doc) == (ids[0], ids[-1])


def test_split_purity_and_partition_layout(spark, tmp_path):
    """Every written row's split directory matches the pure md5-tick
    function of doc-ids it packed (join-free reproducibility), and the
    output is physically partitioned by split."""
    out = str(tmp_path / "out")
    ledger = _run_job(spark, "/root/testdata/sf0.001", out)
    assert ledger["docs_packed"] == ledger["docs_in"] > 0
    seqs = spark.read.parquet(f"{out}/sequences")
    # physical layout: split is a partition column
    assert any((tmp_path / "out" / "sequences" / f"split={s}").exists()
               for s in ("train", "val", "test"))
    for r in seqs.select("split", "first_doc", "last_doc").collect():
        assert _split_of(r.first_doc) == r.split
        assert _split_of(r.last_doc) == r.split
    # a sequence never mixes splits: total docs across seqs == docs_in
    total = seqs.agg(F.sum("n_docs")).first()[0]
    assert total == ledger["docs_in"]


def test_pii_redaction_reaches_packed_text(spark, tmp_path):
    """--pii-redact scrubs before packing: a planted email never ships
    in a sequence, and the ledger counts the changed doc."""
    ids = [d for d in range(1, 400) if _split_of(d) == "train"][:2]
    rows = [(ids[0], "contact me at alice@example.com for details",
             "en", "s0", 0),
            (ids[1], "clean text with no identifiers at all",
             "en", "s0", 0)]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").coalesce(1).write.parquet(
        f"{src}/documents.parquet")
    out = str(tmp_path / "out")
    ledger = _run_job(spark, src, out, ("--pii-redact",))
    assert ledger["pii_docs_redacted"] == 1
    texts = [r.text for r in
             spark.read.parquet(f"{out}/sequences").collect()]
    assert all("alice@example.com" not in t for t in texts)
    assert any("clean text" in t for t in texts)


def test_manifest_op_matches_job_output(spark, tmp_path):
    """The oracle-checked ops.train_export_manifest equals the manifest
    the job actually writes — the record-window entry certifies the
    shipped job's derivation, not a lookalike."""
    from trek_spark.spark.ops import OPS

    out = str(tmp_path / "out")
    _run_job(spark, "/root/testdata/sf0.001", out)
    op = (OPS["train_export_manifest"][0](spark, "/root/testdata/sf0.001")
          .toPandas())
    job = spark.read.parquet(f"{out}/manifest").toPandas()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1).astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    assert canon(op).equals(canon(job))


def test_sft_manifest_op_matches_job_output(spark, tmp_path):
    """The oracle-checked ops.sft_export_manifest equals the manifest
    the --sft job actually writes — same certification as the document
    path, at conversation granularity with mask totals."""
    from trek_spark.spark.ops import OPS

    out = str(tmp_path / "out")
    _run_job(spark, "/root/testdata/sf0.001", out, ("--sft",))
    op = (OPS["sft_export_manifest"][0](spark, "/root/testdata/sf0.001")
          .toPandas())
    job = spark.read.parquet(f"{out}/manifest").toPandas()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1).astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    assert canon(op).equals(canon(job))
