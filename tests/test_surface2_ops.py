"""Known-answer + cross-engine tests for the second Spark-4 surface
batch: native batch session_window (exact-gap boundary pinned),
from_xml round-trip, and the HLL sketch→union two-phase shape.
"""

import datetime as dt

import duckdb
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-surface2", master="local[4]",
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


_EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def _ev(eid, ts, uid=1, t="click", v=1.0):
    return (eid, ts, uid, t, v)


# ------------------------------------------- events_session_window_native

def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Spark's session_window merges on diff <= gap: the event at
    EXACTLY +30:00 from the previous one still EXTENDS the session
    (discovered by this test — the strict-< guess fails against the
    engine); a 2h-later event starts a new one. Session end is
    last-event + gap."""
    rows = [
        _ev(1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        _ev(2, dt.datetime(2024, 1, 1, 0, 29, 59)),
        _ev(3, dt.datetime(2024, 1, 1, 0, 59, 59)),   # +30:00 exactly: IN
        _ev(4, dt.datetime(2024, 1, 1, 3, 0, 0)),
        _ev(5, dt.datetime(2024, 1, 2, 0, 0, 0), uid=2),
    ]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, tmp_path, "events_session_window_native",
                       ["events"])
    sess = sorted(
        (int(r["user_id"]), int(r["session_start_s"]),
         int(r["session_end_s"]), int(r["n_events"]))
        for _, r in out.iterrows())
    u1 = [s for s in sess if s[0] == 1]
    assert len(u1) == 2                          # u1: 2 sessions
    s1, s2 = u1
    assert s1[3] == 3                            # boundary event merged in
    assert s1[2] - s1[1] == 3599 + 1800          # end = last(+30:00) + gap
    assert s2[3] == 1
    assert s2[1] - s1[1] == 3 * 3600             # the 03:00 event
    assert len([s for s in sess if s[0] == 2]) == 1


# --------------------------------------------------------- events_xml_parse

def test_xml_roundtrip_aggregates(spark, tmp_path):
    rows = [_ev(1, dt.datetime(2024, 1, 1), t="a", v=1.25),
            _ev(2, dt.datetime(2024, 1, 1), t="a", v=2.50),
            _ev(3, dt.datetime(2024, 1, 1), t="b", v=0.10)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, tmp_path, "events_xml_parse", ["events"])
    got = {r["event_type"]: (int(r["n"]), int(r["sum_value_c"]))
           for _, r in out.iterrows()}
    assert got == {"a": (2, 375), "b": (1, 10)}


# --------------------------------------------------------- events_hll_merge

def test_hll_union_matches_exact_on_small_corpus(spark, tmp_path):
    """At small cardinality the HLL sketch is exact (sparse mode), so
    the union estimate must equal the exact distinct count and the
    bound flag must hold; users shared across types must not double-
    count through the union."""
    rows = [_ev(1, dt.datetime(2024, 1, 1), uid=10, t="a"),
            _ev(2, dt.datetime(2024, 1, 1), uid=11, t="a"),
            _ev(3, dt.datetime(2024, 1, 1), uid=10, t="b"),   # shared user
            _ev(4, dt.datetime(2024, 1, 1), uid=12, t="b")]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, tmp_path, "events_hll_merge", ["events"])
    r = out.iloc[0]
    assert (int(r["n_sketches"]), int(r["exact_users"]),
            r["union_within_5pct"].lower()) == (2, 3, "true")
