"""Known-answer + cross-engine tests for the adapted canonical TPC-H
batch (Q7/Q8/Q15/Q17/Q18/Q19/Q21/Q22 shapes — parked for the r8 record
window). Each test plants the semantic corner the op exists to get
right: strict thresholds, tie handling, double-correlation exclusion
rules, and rounded-integer-division shares.
"""

import datetime as dt

import duckdb
import pytest

from trek_spark.spark import ops as O
from trek_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-tpch", master="local[4]", shuffle_partitions=8)
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


_LI_SCHEMA = ("l_orderkey long, l_partkey long, l_suppkey long, "
              "l_quantity double, l_extendedprice double, "
              "l_discount double, l_returnflag string, "
              "l_shipdate timestamp")


def _li(ok, pk, sk, qty, price, disc=0.0, rf="N", ship=dt.datetime(1996, 6, 1)):
    return (ok, pk, sk, float(qty), float(price), float(disc), rf, ship)


# ------------------------------------------------- tpch_volume_shipping (Q7)

def test_volume_shipping_directions_and_internal_trade(spark, tmp_path):
    """N3→N2 and N2→N3 are separate output rows; N3→N3 internal trade
    and out-of-window shipments are excluded."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 30, 1, 100.0),                       # N3 supp → N2 cust
        _li(2, 1, 20, 1, 200.0),                       # N2 supp → N3 cust
        _li(3, 1, 30, 1, 400.0),                       # N3 → N3: internal
        _li(4, 1, 30, 1, 800.0, ship=dt.datetime(1999, 1, 1)),  # window
    ])
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long",
           [(1, 2), (2, 3), (3, 3), (4, 2)])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_nationkey long", [(30, 3), (20, 2)])
    _write(spark, tmp_path, "customer",
           "c_custkey long, c_nationkey long", [(2, 2), (3, 3)])
    _write(spark, tmp_path, "nation",
           "n_nationkey long, n_name string",
           [(2, "NATION_2"), (3, "NATION_3")])
    out = _cross_check(spark, tmp_path, "tpch_volume_shipping",
                       ["lineitem", "orders", "supplier", "customer",
                        "nation"])
    got = {(r["supp_nation"], r["cust_nation"]): int(r["revenue_e4"])
           for _, r in out.iterrows()}
    assert got == {("NATION_3", "NATION_2"): 100 * 100 * 100,
                   ("NATION_2", "NATION_3"): 200 * 100 * 100}


# --------------------------------------------------- tpch_market_share (Q8)

def test_market_share_rounding_and_nation_split(spark, tmp_path):
    """NATION_3 supplier contributes 100 of 300 total → share_bp
    3333 (rounded integer division, .33̅ truncating the half-adjust)."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 30, 1, 100.0),      # NATION_3 supplier
        _li(2, 1, 20, 1, 200.0),      # NATION_2 supplier
    ])
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long, o_orderdate timestamp",
           [(1, 9, dt.datetime(1996, 3, 1)), (2, 9, dt.datetime(1996, 9, 1))])
    _write(spark, tmp_path, "customer",
           "c_custkey long, c_nationkey long", [(9, 7)])
    _write(spark, tmp_path, "nation",
           "n_nationkey long, n_name string, n_regionkey long",
           [(7, "NATION_7", 1), (3, "NATION_3", 2), (2, "NATION_2", 2)])
    _write(spark, tmp_path, "region",
           "r_regionkey long, r_name string", [(1, "ASIA")])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_nationkey long", [(30, 3), (20, 2)])
    _write(spark, tmp_path, "part",
           "p_partkey long, p_type string", [(1, "ECONOMY")])
    out = _cross_check(spark, tmp_path, "tpch_market_share",
                       ["lineitem", "orders", "customer", "nation",
                        "region", "supplier", "part"])
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["nation_rev_e4"]) == 100 * 100 * 100
    assert int(r["total_rev_e4"]) == 300 * 100 * 100
    assert int(r["share_bp"]) == 3333


# --------------------------------------------------- tpch_top_supplier (Q15)

def test_top_supplier_tie_returns_both(spark, tmp_path):
    """Two suppliers tied at max revenue both appear (Q15's 'the'
    top supplier is really an arg-max SET); the cheaper one doesn't."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 10, 1, 500.0, ship=dt.datetime(1997, 2, 1)),
        _li(2, 1, 20, 1, 500.0, ship=dt.datetime(1997, 3, 1)),
        _li(3, 1, 30, 1, 400.0, ship=dt.datetime(1997, 2, 15)),
        _li(4, 1, 10, 1, 900.0, ship=dt.datetime(1997, 6, 1)),  # window
    ])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_name string",
           [(10, "Supplier#A"), (20, "Supplier#B"), (30, "Supplier#C")])
    out = _cross_check(spark, tmp_path, "tpch_top_supplier",
                       ["lineitem", "supplier"])
    assert sorted(out["s_name"]) == ["Supplier#A", "Supplier#B"]


# --------------------------------------------- tpch_small_qty_revenue (Q17)

def test_small_qty_strict_threshold(spark, tmp_path):
    """Part avg qty = 25 (lines 1, 5, 69): 20% of avg = 5. qty 1
    qualifies (5·1·3=15 < 75); qty 5 is EXACTLY the boundary
    (5·5·3=75 < 75 false) and must be excluded — strict inequality,
    the corner that round-tripped floats get wrong."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 9, 1, 10.0),
        _li(2, 1, 9, 5, 20.0),
        _li(3, 1, 9, 69, 40.0),
    ])
    _write(spark, tmp_path, "part",
           "p_partkey long, p_brand string", [(1, "Brand#13")])
    out = _cross_check(spark, tmp_path, "tpch_small_qty_revenue",
                       ["lineitem", "part"])
    r = out.iloc[0]
    assert int(r["n_lines"]) == 1
    assert int(r["small_qty_revenue_c"]) == 1000


# ------------------------------------------------- tpch_large_orders (Q18)

def test_large_orders_boundary(spark, tmp_path):
    """Order with sum_qty exactly 250 is excluded (strict >); 251
    included with its customer attached."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 9, 125, 10.0), _li(1, 2, 9, 125, 10.0),   # 250: out
        _li(2, 1, 9, 126, 10.0), _li(2, 2, 9, 125, 10.0),   # 251: in
    ])
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long, o_orderdate timestamp, "
           "o_totalprice double",
           [(1, 7, dt.datetime(1996, 1, 1), 2500.0),
            (2, 7, dt.datetime(1996, 2, 1), 2510.5)])
    _write(spark, tmp_path, "customer",
           "c_custkey long, c_name string", [(7, "Customer#7")])
    out = _cross_check(spark, tmp_path, "tpch_large_orders",
                       ["lineitem", "orders", "customer"])
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["o_orderkey"]), int(r["sum_qty"]),
            int(r["o_totalprice_c"])) == (2, 251, 251050)


# --------------------------------------------- tpch_disjunctive_join (Q19)

def test_disjunctive_clauses_do_not_cross(spark, tmp_path):
    """A line matching clause-1's brand but clause-2's quantity range
    matches NO clause (the AND inside each disjunct must bind); a
    clean clause-2 match is counted."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 9, 15, 100.0),    # Brand#12 but qty 15 ∉ [1,11]: out
        _li(2, 2, 9, 15, 200.0),    # Brand#23, size 20, qty 15: clause 2
    ])
    _write(spark, tmp_path, "part",
           "p_partkey long, p_brand string, p_size integer",
           [(1, "Brand#12", 5), (2, "Brand#23", 20)])
    out = _cross_check(spark, tmp_path, "tpch_disjunctive_join",
                       ["lineitem", "part"])
    r = out.iloc[0]
    assert int(r["n_lines"]) == 1
    assert int(r["revenue_e4"]) == 200 * 100 * 100


# ------------------------------------- tpch_sole_failure_suppliers (Q21)

def test_sole_failure_double_correlation(spark, tmp_path):
    """Order 1: supplier 10 returned, supplier 20 didn't → 10 counted.
    Order 2: both returned → NOT-EXISTS kills both. Order 3: only
    supplier 10 on the order → EXISTS kills it (no co-supplier).
    Multi-line returns on one order count once (DISTINCT grain)."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 10, 1, 10.0, rf="R"),
        _li(1, 2, 10, 1, 10.0, rf="R"),      # second returned line, same pair
        _li(1, 3, 20, 1, 10.0, rf="N"),
        _li(2, 1, 10, 1, 10.0, rf="R"),
        _li(2, 2, 20, 1, 10.0, rf="R"),
        _li(3, 1, 10, 1, 10.0, rf="R"),
    ])
    _write(spark, tmp_path, "supplier",
           "s_suppkey long, s_name string",
           [(10, "Supplier#X"), (20, "Supplier#Y")])
    out = _cross_check(spark, tmp_path, "tpch_sole_failure_suppliers",
                       ["lineitem", "supplier"])
    got = {r["s_name"]: int(r["numwait"]) for _, r in out.iterrows()}
    assert got == {"Supplier#X": 1}


# ------------------------------- tpch_inactive_premium_customers (Q22)

def test_inactive_premium_strict_avg_and_recency(spark, tmp_path):
    """Positive-balance avg = (100+300)/2 = 200. Customer at exactly
    200.00 is excluded (strict >); the 300.00 customer qualifies only
    if they have no order since 1999 — one has a 1998 order (ok), one
    a 2000 order (excluded). Negative balances don't drag the avg."""
    _write(spark, tmp_path, "customer",
           "c_custkey long, c_nationkey long, c_acctbal double",
           [(1, 5, 100.0), (2, 5, 300.0), (3, 5, 200.0),
            (4, 6, 300.0), (5, 6, -500.0)])
    _write(spark, tmp_path, "orders",
           "o_custkey long, o_orderdate timestamp",
           [(2, dt.datetime(1998, 6, 1)),     # old order: still inactive
            (4, dt.datetime(2000, 6, 1))])    # recent: excluded
    out = _cross_check(spark, tmp_path, "tpch_inactive_premium_customers",
                       ["customer", "orders"])
    got = {int(r["c_nationkey"]): (int(r["n_customers"]),
                                   int(r["total_bal_c"]))
           for _, r in out.iterrows()}
    assert got == {5: (1, 30000)}


# ------------------------------------------- tpch_customer_distribution (Q13)

def test_customer_distribution_zero_bucket(spark, tmp_path):
    """Q13's point is the LEFT join: a customer with no orders lands in
    the k=0 bucket instead of vanishing (an inner join drops them)."""
    _write(spark, tmp_path, "customer",
           "c_custkey long, c_name string",
           [(1, "a"), (2, "b"), (3, "c")])
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long",
           [(10, 1), (11, 1), (12, 2)])
    out = _cross_check(spark, tmp_path, "tpch_customer_distribution",
                       ["customer", "orders"])
    got = {int(r["c_count"]): int(r["custdist"])
           for _, r in out.iterrows()}
    assert got == {2: 1, 1: 1, 0: 1}


# ------------------------------------------------ tpch_forecast_revenue (Q6)

def test_forecast_revenue_boundaries(spark, tmp_path):
    """Discount endpoints 0.05/0.07 are INCLUSIVE, quantity 24 is
    EXCLUSIVE (strict <), and revenue multiplies BY the discount."""
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 9, 10, 100.0, disc=0.05, ship=dt.datetime(1997, 2, 1)),
        _li(2, 1, 9, 23, 200.0, disc=0.07, ship=dt.datetime(1997, 3, 1)),
        _li(3, 1, 9, 24, 300.0, disc=0.06, ship=dt.datetime(1997, 4, 1)),
        _li(4, 1, 9, 10, 400.0, disc=0.04, ship=dt.datetime(1997, 5, 1)),
        _li(5, 1, 9, 10, 500.0, disc=0.06, ship=dt.datetime(1998, 2, 1)),
    ])
    out = _cross_check(spark, tmp_path, "tpch_forecast_revenue",
                       ["lineitem"])
    r = out.iloc[0]
    assert int(r["n_lines"]) == 2
    assert int(r["revenue_e4"]) == 10000 * 5 + 20000 * 7


# --------------------------------------------- tpch_order_priority_check (Q4)

def test_order_priority_semi_join_no_double_count(spark, tmp_path):
    """An order with THREE returned lines counts once (semi-join, not
    inner); an order with none doesn't count; out-of-quarter orders
    are excluded before the join."""
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
           [(1, dt.datetime(1997, 2, 1), "HIGH"),
            (2, dt.datetime(1997, 2, 2), "HIGH"),
            (3, dt.datetime(1996, 2, 1), "HIGH")])
    _write(spark, tmp_path, "lineitem", _LI_SCHEMA, [
        _li(1, 1, 9, 1, 10.0, rf="R"), _li(1, 2, 9, 1, 10.0, rf="R"),
        _li(1, 3, 9, 1, 10.0, rf="R"),
        _li(2, 1, 9, 1, 10.0, rf="N"),
        _li(3, 1, 9, 1, 10.0, rf="R"),
    ])
    out = _cross_check(spark, tmp_path, "tpch_order_priority_check",
                       ["orders", "lineitem"])
    got = {r["o_orderpriority"]: int(r["order_count"])
           for _, r in out.iterrows()}
    assert got == {"HIGH": 1}
