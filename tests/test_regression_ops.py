"""Hand-computed known-answer + cross-engine tests for the exact
regression ops (integer-log2 Zipf slope, exact-rational OLS with the
regr_slope agreement flag).
"""

import datetime as dt

import duckdb
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-regr", master="local[4]", shuffle_partitions=8)
    yield s


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


def test_zipf_slope_hand_computed(spark, tmp_path):
    """Frequencies 8,4,2,1 at ranks 1..4 → integer-log2 points
    (0,3),(1,2),(1,1),(2,0): n=4, Σx=4, Σy=6, Σxy=3, Σx²=6 →
    slope = (12−24)/(24−16) = −12/8 = −1.5 (a steeper-than-Zipf toy
    spectrum, sign and exact pair pinned)."""
    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    (spark.createDataFrame(
        [(0, text, "en", "src", len(text))],
        "doc_id long, text string, lang string, source string, "
        "n_chars int")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    out = _cross_check(spark, tmp_path, "terms_zipf_slope", ["documents"])
    r = out.iloc[0]
    assert (int(r["n"]), int(r["slope_num"]), int(r["slope_den"])) == (
        4, -12, 8)


def test_linreg_exact_on_perfect_line(spark, tmp_path):
    """Three points exactly on y = 200·x + c (cents): the rational
    slope must be exactly 200 = num/den and the built-in regr_slope
    must agree within the bound."""
    rows = [(1, dt.datetime(1995, 1, 2), 1, "click", 3.0),    # x=1, y=300
            (2, dt.datetime(1995, 1, 3), 1, "click", 5.0),    # x=2, y=500
            (3, dt.datetime(1995, 1, 5), 1, "click", 9.0)]    # x=4, y=900
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
     .write.mode("overwrite").parquet(f"{tmp_path}/events.parquet"))
    out = _cross_check(spark, tmp_path, "events_linreg_exact", ["events"])
    r = out.iloc[0]
    num, den = int(r["slope_num"]), int(r["slope_den"])
    assert den > 0 and num == 200 * den
    assert int(r["builtin_agrees"]) == 1
