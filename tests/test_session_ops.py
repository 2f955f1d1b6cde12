"""Known-answer + cross-engine tests for the round-7 third op batch
(parked for the r8 record window): running COUNT(DISTINCT) windows,
deterministic dataset splits, SCD2 interval construction, and
time-weighted value aggregation.

Each op has a DuckDB oracle in OPS (proven green at sf0.001+sf0.01);
these tests pin SEMANTICS on crafted inputs with hand-computed answers —
the oracle proves engine agreement, not that both engines are right.
"""

import datetime as dt

import duckdb
import pytest

from trek_spark.spark.session import get_spark
from trek_spark.spark import ops as O


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-session-ops", master="local[4]",
                  shuffle_partitions=8)
    yield s


def _write(spark, path, table, schema, rows):
    (spark.createDataFrame(rows, schema)
     .write.mode("overwrite").parquet(f"{path}/{table}.parquet"))


def _duck(path, *tables):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{path}/{t}.parquet/*.parquet'")
    return con


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _cross_check(spark, con, path, name):
    fn, sql = O.OPS[name]
    a = _canon(fn(spark, str(path)).toPandas())
    b = _canon(con.sql(sql).df())
    assert a.equals(b), f"{name}: Spark vs DuckDB mismatch\n{a}\n{b}"
    return a


_T0 = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return _T0 + dt.timedelta(seconds=seconds)


_EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


# ------------------------------------------------------ events_window_distinct

def test_window_distinct_running_curve(spark, tmp_path):
    """Users [10,10,20,10,30] arriving in ts order: the running distinct
    count is [1,1,2,2,3]. event_ids are all multiples of 7 so the
    post-window decimation keeps every row."""
    users = [10, 10, 20, 10, 30]
    rows = [(7 * (i + 1), _ts(60 * i), u, "click", 1.0)
            for i, u in enumerate(users)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_window_distinct")
    got = {int(r["event_id"]): int(r["distinct_users_so_far"])
           for _, r in out.iterrows()}
    assert got == {7: 1, 14: 1, 21: 2, 28: 2, 35: 3}


def test_window_distinct_partitions_by_type(spark, tmp_path):
    """The same user in two event types counts once per type — the
    window partitions by event_type, not globally."""
    rows = [(7, _ts(0), 1, "a", 1.0), (14, _ts(60), 1, "b", 1.0),
            (21, _ts(120), 2, "a", 1.0)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_window_distinct")
    got = {(r["event_type"], int(r["event_id"])):
           int(r["distinct_users_so_far"]) for _, r in out.iterrows()}
    assert got == {("a", 7): 1, ("b", 14): 1, ("a", 21): 2}


# --------------------------------------------------------------- dataset_split

def test_dataset_split_partitions_and_proportions(spark, tmp_path):
    """1000 docs in one source: every doc lands in exactly one split
    (counts sum to 1000) and the md5 tick is uniform enough that train
    holds 75-85% and each holdout 5-15%."""
    rows = [(i, "web", 100) for i in range(1000)]
    _write(spark, tmp_path, "documents",
           "doc_id long, source string, n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "dataset_split")
    counts = {r["split"]: int(r["n_docs"]) for _, r in out.iterrows()}
    assert sum(counts.values()) == 1000
    assert 750 <= counts["train"] <= 850
    assert 50 <= counts["val"] <= 150
    assert 50 <= counts["test"] <= 150
    # chars follow docs exactly (100 chars each)
    chars = {r["split"]: int(r["sum_chars"]) for _, r in out.iterrows()}
    assert chars == {k: v * 100 for k, v in counts.items()}


def test_dataset_split_is_deterministic(spark, tmp_path):
    """Split membership is a pure function of doc_id: two runs (and a
    run over a re-shuffled copy of the table) produce identical
    per-split counts."""
    rows = [(i, f"s{i % 3}", i % 7) for i in range(300)]
    _write(spark, tmp_path, "documents",
           "doc_id long, source string, n_chars long", rows)
    fn, _ = O.OPS["dataset_split"]
    a = _canon(fn(spark, str(tmp_path)).toPandas())
    b = _canon(fn(spark, str(tmp_path)).toPandas())
    assert a.equals(b)


# ------------------------------------------------------- events_scd2_intervals

def test_scd2_opens_interval_per_band_change(spark, tmp_path):
    """Bands [0,1,2,0] over four events: four intervals, each closing
    where the next opens, the last open (-1). user_id=13 passes the
    mod-13 decimation."""
    vals = [1.0, 25.0, 45.0, 5.0]  # cents DIV 2000 -> bands 0,1,2,0
    rows = [(i, _ts(100 * i), 13, "a", v) for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_scd2_intervals")
    epoch0 = int(_T0.replace(tzinfo=dt.timezone.utc).timestamp())
    ivals = sorted((int(r["valid_from_s"]) - epoch0,
                    int(r["valid_to_s"]) - epoch0
                    if int(r["valid_to_s"]) != -1 else -1,
                    int(r["band"])) for _, r in out.iterrows())
    assert ivals == [(0, 100, 0), (100, 200, 1), (200, 300, 2),
                     (300, -1, 0)]


def test_scd2_merges_unchanged_bands(spark, tmp_path):
    """Repeated values in the same band do NOT open new intervals: five
    events in band 0 then one in band 1 yield exactly two intervals."""
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 25.0]
    rows = [(i, _ts(10 * i), 13, "a", v) for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_scd2_intervals")
    assert len(out) == 2
    assert sorted(int(r["band"]) for _, r in out.iterrows()) == [0, 1]


# -------------------------------------------------------- events_time_weighted

def test_time_weighted_hand_computed(spark, tmp_path):
    """Events at t=0s ($1.00), t=10s ($3.00), t=40s ($5.00): the first
    holds 10s (100c*10), the second 30s (300c*30), the last is open and
    contributes nothing. wsum=10000, tsum=40, n_intervals=2."""
    rows = [(0, _ts(0), 11, "a", 1.0), (1, _ts(10), 11, "a", 3.0),
            (2, _ts(40), 11, "a", 5.0)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_time_weighted")
    assert len(out) == 1
    row = out.iloc[0]
    assert (int(row["n_intervals"]), int(row["wsum"]),
            int(row["tsum"])) == (2, 10000, 40)


def test_time_weighted_single_event_user_drops(spark, tmp_path):
    """A user with one event has no interval and no output row."""
    rows = [(0, _ts(0), 11, "a", 1.0), (1, _ts(0), 22, "a", 2.0),
            (2, _ts(50), 22, "a", 4.0)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_time_weighted")
    assert [int(r["user_id"]) for _, r in out.iterrows()] == [22]
