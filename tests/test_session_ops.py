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


# ----------------------------------------------------- events_bitmap_distinct

def test_bitmap_distinct_word_boundary(spark, tmp_path):
    """Users 61,62,63 straddle the 62-bit word boundary (61 is the last
    bit of word 0; 62,63 are bits 0,1 of word 1): 3 distinct users over
    2 words, duplicates collapse."""
    rows = [(i, _ts(i), u, "a", 1.0)
            for i, u in enumerate([61, 62, 63, 61, 62])]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_bitmap_distinct")
    assert len(out) == 1
    row = out.iloc[0]
    assert (int(row["n_words"]), int(row["n_distinct"])) == (2, 3)


def test_bitmap_distinct_equals_count_distinct(spark, tmp_path):
    """The bitmap fold is EXACT: it equals count(DISTINCT) on a spread
    of ids including repeats and multiple types."""
    users = [u * 37 % 500 for u in range(200)] + [3, 3, 3]
    rows = [(i, _ts(i), u, "t" + str(u % 2), 1.0)
            for i, u in enumerate(users)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_bitmap_distinct")
    expect = {}
    for u in users:
        expect.setdefault("t" + str(u % 2), set()).add(u)
    got = {r["event_type"]: int(r["n_distinct"]) for _, r in out.iterrows()}
    assert got == {k: len(v) for k, v in expect.items()}


# ------------------------------------------------------- events_type_sequence

def test_type_sequence_orders_by_ts_and_flags_funnel(spark, tmp_path):
    """Rows arrive shuffled; the path follows (ts, event_id). User 3
    hits view>click>purchase in order; user 6 has the same multiset but
    purchase BEFORE click, so the ordered flag stays 0."""
    rows = [
        (2, _ts(30), 3, "purchase", 1.0),
        (0, _ts(10), 3, "view", 1.0),
        (1, _ts(20), 3, "click", 1.0),
        (5, _ts(30), 6, "click", 1.0),
        (3, _ts(10), 6, "view", 1.0),
        (4, _ts(20), 6, "purchase", 1.0),
    ]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_type_sequence")
    got = {int(r["user_id"]): (r["path"], int(r["hit_funnel"]))
           for _, r in out.iterrows()}
    assert got == {3: ("view>click>purchase", 1),
                   6: ("view>purchase>click", 0)}


def test_type_sequence_event_id_breaks_ties(spark, tmp_path):
    """Two events on the same second order by event_id."""
    rows = [(9, _ts(0), 3, "b", 1.0), (1, _ts(0), 3, "a", 1.0)]
    _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_type_sequence")
    assert out.iloc[0]["path"] == "a>b"


# -------------------------------------------------------- source_lang_entropy

def test_lang_entropy_known_values(spark, tmp_path):
    """Single-language source: H = 0 exactly. Two equal langs over 4
    docs: flog(4)=2000, flog(2)=1000 -> H_total = 4*2000 - 2*(2*1000)
    = 4000 millibits, 1000/doc (one bit, as Shannon says)."""
    rows = ([(i, "pure", "en") for i in range(5)]
            + [(10 + i, "mixed", ["en", "de"][i % 2]) for i in range(4)])
    _write(spark, tmp_path, "documents",
           "doc_id long, source string, lang string", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "source_lang_entropy")
    got = {r["source"]: (int(r["n_docs"]), int(r["n_langs"]),
                         int(r["h_millibits_total"]),
                         int(r["h_mb_per_doc"]))
           for _, r in out.iterrows()}
    assert got == {"pure": (5, 1, 0, 0), "mixed": (4, 2, 4000, 1000)}


# ------------------------------------------------------ dedup_shingle_novelty

def test_shingle_novelty_copy_vs_fresh(spark, tmp_path):
    """doc 0 is first-seen (10000 bp novel), doc 7 is its exact copy
    (every shingle first seen at 0 -> 0 bp), doc 14 is fresh text
    (10000 bp). Short docs (<8 words) drop out in both engines."""
    base = " ".join(f"alpha{i} beta{i}" for i in range(6))
    fresh = " ".join(f"gamma{i} delta{i}" for i in range(6))
    rows = [(0, base), (7, base), (14, fresh), (21, "too short text")]
    _write(spark, tmp_path, "documents", "doc_id long, text string", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "dedup_shingle_novelty")
    got = {int(r["doc_id"]): int(r["novel_bp"]) for _, r in out.iterrows()}
    assert got == {0: 10000, 7: 0, 14: 10000}
