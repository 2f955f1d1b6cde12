"""Known-answer + cross-engine tests for the round-7 time-series op
batch (parked for the r8 record window): last-observation-carried-
forward gap fill, interval union/coverage merge, and daily-grid
resampling with forward fill.

Each op has a DuckDB oracle in OPS (proven green at sf0.001+sf0.01);
these tests pin SEMANTICS on crafted inputs with hand-computed answers —
the oracle proves engine agreement, not that both engines are right.
"""

import datetime as dt

import duckdb
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark

_T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-timeseries", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _write_events(spark, path, rows):
    """rows: (event_id, user_id, offset_seconds, event_type, value)."""
    full = [(e, _T0 + dt.timedelta(seconds=s), u, t, v, None)
            for (e, u, s, t, v) in rows]
    (spark.createDataFrame(
        full, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .write.mode("overwrite").parquet(f"{path}/events.parquet"))


def _cross_check(spark, path, name):
    fn, sql = O.OPS[name]
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"'{path}/events.parquet/*.parquet'")
    a = fn(spark, str(path)).toPandas()
    b = con.sql(sql).df()
    a = a.reindex(sorted(a.columns), axis=1).astype(str)
    b = b.reindex(sorted(b.columns), axis=1).astype(str)
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    assert a.equals(b), f"{name}: Spark vs DuckDB mismatch\n{a}\n{b}"
    return a


# ------------------------------------------------------------ events_locf

def test_locf_fills_forward_and_seeds_minus_one(spark, tmp_path):
    """One user, readings only on purchases: click, purchase 12.34,
    click, purchase 5.00, view -> filled -1, 1234, 1234, 500, 500.
    event_ids are multiples of 5 so every row survives the output
    decimation (which must run AFTER the fill, not before)."""
    rows = [(0, 7, 0, "click", 99.0),
            (5, 7, 10, "purchase", 12.34),
            (10, 7, 20, "click", 3.0),
            (15, 7, 30, "purchase", 5.00),
            (20, 7, 40, "view", 1.0)]
    _write_events(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "events_locf")
    got = dict(zip(out["event_id"], out["filled"]))
    assert got == {"0": "-1", "5": "1234", "10": "1234",
                   "15": "500", "20": "500"}


def test_locf_decimation_does_not_starve_fill(spark, tmp_path):
    """The only purchase has event_id % 5 != 0, so it is DROPPED from
    the output — but its reading must still flow into the kept rows.
    A pre-window filter would return -1 here."""
    rows = [(5, 3, 0, "click", 1.0),
            (7, 3, 10, "purchase", 2.00),   # dropped from output
            (10, 3, 20, "view", 1.0)]
    _write_events(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "events_locf")
    got = dict(zip(out["event_id"], out["filled"]))
    assert got == {"5": "-1", "10": "200"}


# -------------------------------------------------- events_interval_merge

def test_interval_merge_islands_and_touching_edge(spark, tmp_path):
    """User 1: events at s=0,100,1000 -> [0,300)+[100,400) merge into
    [0,400) (2 events), [1000,1300) stands alone. User 2: events at
    s=0 and s=300 TOUCH (new start == previous max end) and merge —
    the strict-> comparison treats adjacency as continuity."""
    rows = [(1, 1, 0, "click", 0.0), (2, 1, 100, "click", 0.0),
            (3, 1, 1000, "click", 0.0),
            (4, 2, 0, "click", 0.0), (5, 2, 300, "click", 0.0)]
    _write_events(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "events_interval_merge")
    got = {(r["user_id"], r["start_s"]): (r["end_s"], r["n_events"],
                                          r["span_s"])
           for _, r in out.iterrows()}
    base = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert got == {
        ("1", str(base)): (str(base + 400), "2", "400"),
        ("1", str(base + 1000)): (str(base + 1300), "1", "300"),
        ("2", str(base)): (str(base + 600), "2", "600")}


def test_interval_merge_nested_interval_absorbed(spark, tmp_path):
    """An interval fully inside an earlier one must not split the
    island even when a LATER event starts after the nested one ends:
    s=0,10,200 -> one island [0,500). The running max (not lag of the
    previous end) is what makes this correct."""
    rows = [(1, 9, 0, "click", 0.0), (2, 9, 10, "click", 0.0),
            (3, 9, 200, "click", 0.0)]
    _write_events(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "events_interval_merge")
    assert len(out) == 1
    assert (out.iloc[0]["n_events"], out.iloc[0]["span_s"]) == ("3", "500")


# -------------------------------------------------- events_resample_daily

def test_resample_daily_grid_and_fill(spark, tmp_path):
    """User 3 (passes the %3 scan filter): two purchases on day 0
    (later one wins: 2.00), nothing on days 1-2, a 7.00 event on day
    3 -> grid rows day0..day3 filled 200,200,200,700 with observed
    flags 1,0,0,1."""
    day = 86400
    rows = [(1, 3, 100, "purchase", 1.00),
            (2, 3, 200, "purchase", 2.00),
            (3, 3, 3 * day + 50, "purchase", 7.00)]
    _write_events(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "events_resample_daily")
    assert len(out) == 4
    got = {r["day"]: (r["filled"], r["observed"])
           for _, r in out.iterrows()}
    d0 = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp()) // day
    assert got == {str(d0): ("200", "1"), str(d0 + 1): ("200", "0"),
                   str(d0 + 2): ("200", "0"), str(d0 + 3): ("700", "1")}


def test_resample_daily_same_day_tiebreak(spark, tmp_path):
    """Two events in the same second on the same day: the higher
    event_id wins the daily-last slot (the deterministic tiebreak both
    engines share)."""
    rows = [(10, 6, 500, "purchase", 1.00),
            (11, 6, 500, "purchase", 9.00)]
    _write_events(spark, tmp_path, rows)
    out = _cross_check(spark, tmp_path, "events_resample_daily")
    assert len(out) == 1
    assert out.iloc[0]["filled"] == "900"
