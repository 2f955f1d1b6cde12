"""Known-answer + cross-engine tests for the round-7 corpus-statistics
op batch (parked for the r8 record window): Good–Turing
frequency-of-frequencies, Heaps-law vocabulary growth, and banded
stable-id assignment.

Each op has a DuckDB oracle in OPS (proven green at sf0.001+sf0.01);
these tests pin SEMANTICS on crafted inputs with hand-computed answers.
"""

import duckdb
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-corpus-stats", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _write_docs(spark, path, rows):
    """rows: (doc_id, text). n_chars derived; lang/source constant."""
    full = [(i, t, "en", "web", len(t)) for (i, t) in rows]
    (spark.createDataFrame(
        full, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.mode("overwrite").parquet(f"{path}/documents.parquet"))


def _write_docs_chars(spark, path, rows):
    """rows: (doc_id, n_chars) with synthetic text of that length."""
    full = [(i, "x" * n, "en", "web", n) for (i, n) in rows]
    (spark.createDataFrame(
        full, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.mode("overwrite").parquet(f"{path}/documents.parquet"))


def _cross_check(spark, path, name):
    fn, sql = O.OPS[name]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"'{path}/documents.parquet/*.parquet'")
    a = fn(spark, str(path)).toPandas()
    b = con.sql(sql).df()
    a = a.reindex(sorted(a.columns), axis=1).astype(str)
    b = b.reindex(sorted(b.columns), axis=1).astype(str)
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    assert a.equals(b), f"{name}: Spark vs DuckDB mismatch\n{a}\n{b}"
    return a


# ----------------------------------------------------- terms_freq_of_freqs

def test_freq_of_freqs_known_histogram(spark, tmp_path):
    """Terms: aa x3, bb x2, cc x2, dd x1 (plus a 1-char token and a
    digit run that must NOT count) -> histogram {1:1, 2:2, 3:1}."""
    rows = [(0, "aa bb AA cc x 42"), (1, "aa bb cc dd")]
    _write_docs(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "terms_freq_of_freqs")
    got = dict(zip(out["freq"], out["n_terms"]))
    assert got == {"1": "1", "2": "2", "3": "1"}


def test_freq_of_freqs_case_folds_before_counting(spark, tmp_path):
    """'The' and 'the' are one term (fold-then-count, not
    count-then-fold): one doc with both -> a single freq-2 entry."""
    _write_docs(spark, tmp_path, [(0, "The the")])
    out = _cross_check(spark, tmp_path, "terms_freq_of_freqs")
    assert dict(zip(out["freq"], out["n_terms"])) == {"2": "1"}


# ------------------------------------------------------------ vocab_growth

def test_vocab_growth_curve(spark, tmp_path):
    """Terms alpha+beta enter at doc 0, gamma at doc 10, delta at doc
    20. Checkpoint 16 sees 2 docs / 3 terms; every later checkpoint
    sees all 3 docs / 4 terms. A re-used term (alpha at doc 10) must
    not inflate the curve — first_doc is a min, not a count."""
    rows = [(0, "alpha beta"), (10, "alpha gamma"), (20, "delta")]
    _write_docs(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "vocab_growth")
    got = {r["cp"]: (r["n_docs"], r["vocab"]) for _, r in out.iterrows()}
    assert got["16"] == ("2", "3")
    for cp in ("64", "256", "1024", "4096", "16384", "65536"):
        assert got[cp] == ("3", "4")
    assert len(got) == 7


def test_vocab_growth_empty_prefix_checkpoint(spark, tmp_path):
    """A corpus whose doc_ids all exceed the first checkpoint: cp=16
    has n_docs=0 and must be ABSENT (the n_docs>0 guard), while the
    next checkpoint reports the terms."""
    rows = [(20, "omega"), (30, "omega psi")]
    _write_docs(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "vocab_growth")
    got = {r["cp"]: (r["n_docs"], r["vocab"]) for _, r in out.iterrows()}
    assert "16" not in got
    assert got["64"] == ("2", "2")


# --------------------------------------------------------- docs_stable_ids

def test_stable_ids_total_order_with_band_boundaries(spark, tmp_path):
    """n_chars 200,200,150,64,63,10 across band edges (64 and 63 land
    in different DIV-64 bands): ids follow (n_chars DESC, doc_id ASC)
    globally — the banded decomposition must splice exactly, and the
    200-char tie breaks by doc_id."""
    rows = [(5, 200), (2, 200), (9, 150), (1, 64), (8, 63), (3, 10)]
    _write_docs_chars(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "docs_stable_ids")
    got = dict(zip(out["doc_id"], out["stable_id"]))
    assert got == {"2": "1", "5": "2", "9": "3",
                   "1": "4", "8": "5", "3": "6"}


def test_stable_ids_partitioning_invariance(spark, tmp_path):
    """Contiguity and order survive a different shuffle width — the
    banded offsets must not depend on task arrival order."""
    rows = [(i, (i * 37) % 256) for i in range(100)]
    _write_docs_chars(spark, tmp_path, rows)
    fn = O.OPS["docs_stable_ids"][0]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = fn(spark, str(tmp_path)).toPandas().sort_values("doc_id")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = fn(spark, str(tmp_path)).toPandas().sort_values("doc_id")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    ids = sorted(a["stable_id"])
    assert ids == list(range(1, 101))  # dense, contiguous, 1-based
