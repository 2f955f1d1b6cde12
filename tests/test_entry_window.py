"""Driver record-window contract for __spark_entry__ (SURVEY §11/§12).

The driver records AT MOST 50 queries() entries per round (empirical:
r5 recorded 50 of 54, r6 recorded 50 of 63 — a count cap, not a time
budget). Round-8 policy (r7 verdict #1): the window is EXACTLY the 50
oldest never-recorded parked ops, in _PARKED_FOR_R8 order, job-wired
gates first. Everything else (overflow, rows-only candidates,
previously-recorded staples) stays in OPS for bench/pytest/oracle
coverage and waits for the r9/r10 windows.
"""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from trek_spark.spark.ops import OPS


def test_queries_fit_driver_record_cap():
    q = E.queries()
    assert len(q) <= E._DRIVER_RECORD_CAP


def test_window_is_the_50_oldest_parked_ops_in_order():
    names = list(E.queries())
    assert names == E._PARKED_FOR_R8[:E._DRIVER_RECORD_CAP]
    assert names[0] == "pii_redact"  # job-wired gates lead (verdict #1)


def test_window_ops_all_registered_with_oracles():
    o = E.oracle_sql()
    for name in E.queries():
        assert name in OPS and OPS[name][1] is not None
        assert name in o


def test_out_of_window_ops_still_registered_and_oracled():
    """Rotation removes ops from the DRIVER window only — r7-recorded
    ops, staples and the r9 overflow must stay in OPS with oracles."""
    q = E.queries()
    for name in E._ROTATED_OUT_R7 + E._NEVER_RECORDED_R7 + E._NEW_R7:
        assert name in OPS and OPS[name][1] is not None
        assert name not in q
    for name in E._PARKED_FOR_R9:
        assert name in OPS and OPS[name][1] is not None
        assert name not in q


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    for name in q:
        if name in OPS and OPS[name][1] is not None:
            assert name in o
        else:
            assert name not in o


def test_rows_only_entries_kept_importable_for_r10():
    for name, fn in E._ROWS_ONLY_RECORDED.items():
        assert callable(fn), name
    for name, fn in E._R8_ROWS_ONLY.items():
        assert callable(fn), name
