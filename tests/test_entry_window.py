"""Driver record-window contract for __spark_entry__ (SURVEY §11).

The driver records AT MOST 50 queries() entries per round (empirical:
r5 recorded 50 of 54, r6 recorded 50 of 63 — a count cap, not a time
budget). These tests pin the policy the r6 verdict prescribed: never
expose more than 50 entries, lead with never-recorded / previously-red
ops, and keep every exposed oracle entry backed by SQL with matching
registration.
"""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from trek_spark.spark.ops import OPS


def test_queries_fit_driver_record_cap():
    q = E.queries()
    assert len(q) <= E._DRIVER_RECORD_CAP


def test_never_recorded_entries_lead_the_window():
    names = list(E.queries())
    lead = names[:len(E._NEVER_RECORDED_R7)]
    assert lead == E._NEVER_RECORDED_R7
    assert names[0] == "source_mix_weights"  # r5's red row goes first


def test_new_ops_precede_backlog():
    names = list(E.queries())
    for new in E._NEW_R7:
        assert names.index(new) < 20


def test_rotated_out_ops_still_registered_and_oracled():
    """Rotation removes ops from the DRIVER window only — they must stay
    in OPS (bench/pytest coverage) with their oracles intact."""
    q = E.queries()
    for name in E._ROTATED_OUT_R7:
        assert name in OPS and OPS[name][1] is not None
        assert name not in q


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    # every exposed OPS entry with SQL is oracled; rows-only are not
    for name in q:
        if name in OPS and OPS[name][1] is not None:
            assert name in o
        else:
            assert name not in o
