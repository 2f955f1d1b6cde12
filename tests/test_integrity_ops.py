"""Known-answer + cross-engine tests for batch 21: Markov matrix
squaring, the inverted-index build, and order-independent table
fingerprints (permutation invariance + single-row sensitivity).
"""

import datetime as dt

import duckdb
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-integrity", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _write(spark, path, table, schema, rows):
    (spark.createDataFrame(rows, schema)
     .write.mode("overwrite").parquet(f"{path}/{table}.parquet"))


def _cross_check(spark, path, name, tables):
    fn, sql = O.OPS[name]
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{path}/{t}.parquet/*.parquet'")
    a = fn(spark, str(path)).toPandas()
    b = con.sql(sql).df()
    a = a.reindex(sorted(a.columns), axis=1).astype(str)
    b = b.reindex(sorted(b.columns), axis=1).astype(str)
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    assert a.equals(b), f"{name}: Spark vs DuckDB mismatch\n{a}\n{b}"
    return a


def test_two_step_matrix_square(spark, tmp_path):
    """User sequence a,b,a,b → C = {(a,b):2, (b,a):1} → C² =
    {(a,a): 2·1, (b,b): 1·2} and nothing else."""
    rows = [(i, dt.datetime(2024, 1, 1, 0, i), 1, t, 1.0)
            for i, t in enumerate(["a", "b", "a", "b"])]
    _write(spark, tmp_path, "events",
           "event_id long, ts timestamp, user_id long, "
           "event_type string, value double", rows)
    out = _cross_check(spark, tmp_path, "events_two_step_transitions",
                       ["events"])
    got = {(r["a"], r["c"]): int(r["paths2"]) for _, r in out.iterrows()}
    assert got == {("a", "a"): 2, ("b", "b"): 2}


def test_inverted_index_bounds_and_postings(spark, tmp_path):
    """'xx' appears in docs 1,2,3 with tf 2,1,1 → df 3, max_tf 2,
    postings '1,2,3'; 'yy' (df 1) falls under the df>=3 gate."""
    docs = [(1, "xx yy xx", "en", "s", 8),
            (2, "xx zz", "en", "s", 5),
            (3, "xx", "en", "s", 2),
            (4, "zz qq", "en", "s", 5),
            (5, "zz", "en", "s", 2)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars int", docs)
    out = _cross_check(spark, tmp_path, "docs_inverted_index",
                       ["documents"])
    got = {r["term"]: (int(r["df"]), int(r["max_tf"]), r["posting_head"])
           for _, r in out.iterrows()}
    assert got == {"xx": (3, 2, "1,2,3"), "zz": (3, 1, "2,4,5")}


_ORD = ("o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string")
_ROWS = [(1, 7, "O", 100.50, dt.datetime(1996, 1, 1), "HIGH"),
         (2, 8, "F", 200.25, dt.datetime(1996, 2, 1), "LOW"),
         (3, 9, "O", 300.75, dt.datetime(1996, 3, 1), "MED")]
_CUST = [(7, 1, 10.0, "AUTO"), (8, 1, 20.0, "AUTO"), (9, 2, 30.0, "BLD")]
_NAT = [(1, "NATION_1", 1), (2, "NATION_2", 1)]


def _fp_all(spark, path):
    out = O.OPS["tables_fingerprint"][0](spark, str(path)).collect()
    return {r.tbl: (r.n_rows, r.fingerprint) for r in out}


def test_fingerprint_permutation_invariant_and_sensitive(spark, tmp_path):
    """The same rows written in a different order give the SAME
    fingerprint (XOR order-independence); flipping one cent in one row
    changes it while the row count stays equal — exactly the failure a
    count-only check misses. Also cross-checked vs DuckDB."""
    a = tmp_path / "a"
    _write(spark, a, "orders", _ORD, _ROWS)
    _write(spark, a, "customer",
           "c_custkey long, c_nationkey long, c_acctbal double, "
           "c_mktsegment string", _CUST)
    _write(spark, a, "nation",
           "n_nationkey long, n_name string, n_regionkey long", _NAT)
    _cross_check(spark, a, "tables_fingerprint",
                 ["orders", "customer", "nation"])
    fa = _fp_all(spark, a)

    b = tmp_path / "b"
    _write(spark, b, "orders", _ORD, list(reversed(_ROWS)))
    _write(spark, b, "customer",
           "c_custkey long, c_nationkey long, c_acctbal double, "
           "c_mktsegment string", _CUST)
    _write(spark, b, "nation",
           "n_nationkey long, n_name string, n_regionkey long", _NAT)
    assert _fp_all(spark, b) == fa

    c = tmp_path / "c"
    mutated = [_ROWS[0], (2, 8, "F", 200.26, dt.datetime(1996, 2, 1),
                          "LOW"), _ROWS[2]]
    _write(spark, c, "orders", _ORD, mutated)
    _write(spark, c, "customer",
           "c_custkey long, c_nationkey long, c_acctbal double, "
           "c_mktsegment string", _CUST)
    _write(spark, c, "nation",
           "n_nationkey long, n_name string, n_regionkey long", _NAT)
    fc = _fp_all(spark, c)
    assert fc["orders"][0] == fa["orders"][0]          # same count
    assert fc["orders"][1] != fa["orders"][1]          # different hash
    assert fc["customer"] == fa["customer"]
