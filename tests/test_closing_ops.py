"""Known-answer + cross-engine tests for the second closing-session op
batch of round 7 (parked for the r8 record window): BPE pair counting,
percent_rank/cume_dist windows, the per-domain frequency cap, the
approx-quantile rank-bound twin, and the Spark-4 recursive-CTE
reachability walk.

Each op has a DuckDB oracle in OPS (proven green at sf0.001+sf0.01);
these tests pin SEMANTICS on crafted inputs with hand-computed answers —
the oracle proves engine agreement, not that both engines are right.
"""

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from trek_spark.spark.session import get_spark
from trek_spark.spark import ops as O


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-closing", master="local[4]", shuffle_partitions=8)
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


# ----------------------------------------------------------- bpe_pair_counts

def test_bpe_pair_counts_brute_force(spark, tmp_path):
    """Pair counts equal a pure-Python brute force of the same spec:
    ASCII-letter words, lowercased, len>=2, adjacent char pairs weighted
    by word frequency — and non-ASCII letters never leak into pairs."""
    rows = [(0, "Hello hello world", "en", "web", 17),
            (1, "low low low lo l", "en", "web", 16),
            (2, "nüoße 中文 mix", "de", "web", 11),
            (3, None, "en", "web", 0)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)

    import re
    words = Counter()
    for _id, text, *_ in rows:
        for w in re.findall(r"[A-Za-z]+", text or ""):
            w = w.lower()
            if len(w) >= 2:
                words[w] += 1
    expect = Counter()
    for w, n in words.items():
        for i in range(len(w) - 1):
            expect[w[i:i + 2]] += n

    out = (O.OPS["bpe_pair_counts"][0](spark, str(tmp_path))
           .toPandas())
    got = dict(zip(out["pair"], out["pair_count"]))
    assert got == dict(expect)  # < 32 distinct pairs, so no truncation
    # rank ordering: count desc then pair asc
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(out.sort_values("rank")["pair"]) == [p for p, _ in ranked]
    # the umlaut/sharp-s/CJK word contributes no pair with a non-ASCII char
    assert all(p.isascii() and p.islower() for p in got)
    _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                 "bpe_pair_counts")


# -------------------------------------------------- events_value_percentiles

def test_events_value_percentiles_known_answers(spark, tmp_path):
    """5 events in one type with a value tie: hand-computed percent_rank
    ((rank-1)/(n-1)) and cume_dist over the (value, event_id) window.
    Because event_id is IN the order key, the tied values are not peers
    — every row is its own peer group, so cume_dist degenerates to
    rank/n (this determinism is exactly why the op orders on the
    tiebreak: peer-group cume_dist over a double column would hang
    cross-engine equality on float tie behavior)."""
    rows = [(0, "a", 10.0), (97, "a", 20.0), (194, "a", 20.0),
            (291, "a", 30.0), (388, "a", 40.0)]
    _write(spark, tmp_path, "events",
           "event_id long, event_type string, value double", rows)
    out = {r["event_id"]: r for _, r in
           (O.OPS["events_value_percentiles"][0](spark, str(tmp_path))
            .toPandas().iterrows())}
    assert len(out) == 5  # all ids are multiples of 97 -> all survive
    # ranks by (value, event_id): 0,97,194,291,388 -> 1..5
    assert [out[i]["pr_bp"] for i in (0, 97, 194, 291, 388)] == \
        [0, 2500, 5000, 7500, 10000]
    # tiebreak in the order key -> no peers -> cume_dist = rank/n
    assert [out[i]["cd_bp"] for i in (0, 97, 194, 291, 388)] == \
        [2000, 4000, 6000, 8000, 10000]


def test_events_value_percentiles_needs_event_type(spark, tmp_path):
    """With an event_type column the window partitions per type."""
    rows = [(0, "a", 1.0), (97, "a", 2.0), (194, "b", 5.0)]
    _write(spark, tmp_path, "events",
           "event_id long, event_type string, value double", rows)
    out = {(r["event_id"]): r for _, r in
           (O.OPS["events_value_percentiles"][0](spark, str(tmp_path))
            .toPandas().iterrows())}
    assert out[194]["pr_bp"] == 0  # sole row of type b: (1-1)/max(n-1,?) = 0
    assert out[194]["cd_bp"] == 10000
    _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                 "events_value_percentiles")


# ------------------------------------------------------------ domain_doc_cap

def test_domain_doc_cap_engages(spark, tmp_path):
    """A 70-doc source must drop exactly 70-cap docs; a small source
    keeps everything. Cross-checks the conv()/0x numeric-tick pairing on
    a corpus where the cap actually fires."""
    cap = O._DOMAIN_CAP
    rows = [(i, f"doc {i}", "en", "big.example", 10)
            for i in range(cap + 10)]
    rows += [(1000 + i, f"doc {i}", "en", "small.example", 10)
             for i in range(5)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = {r["source"]: r for _, r in
           _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                        "domain_doc_cap").iterrows()}
    assert (out["big.example"]["n_kept"], out["big.example"]["n_dropped"]) \
        == (str(cap), "10")
    assert (out["small.example"]["n_kept"],
            out["small.example"]["n_dropped"]) == ("5", "0")


# ------------------------------------------- lineitem_quantiles_approx

def test_lineitem_quantiles_approx_bound_holds(spark, tmp_path):
    """Quantities 1..200 in one flag: percentile_approx at accuracy 10^4
    is rank-exact here, so every probe's true rank sits inside the
    +-0.5% gate and all 3 rank_ok flags are true with n=200."""
    rows = [("N", float(q % 200 + 1)) for q in range(200)]
    _write(spark, tmp_path, "lineitem",
           "l_returnflag string, l_quantity double", rows)
    out = O.OPS["lineitem_quantiles_approx"][0](spark, str(tmp_path)) \
        .toPandas()
    assert len(out) == 3 and set(out["q_pm"]) == {250, 500, 750}
    assert out["rank_ok"].all() and (out["n"] == 200).all()
    _cross_check(spark, _duck(tmp_path, "lineitem"), tmp_path,
                 "lineitem_quantiles_approx")


def test_quantile_rank_gate_rejects_drift(spark, tmp_path):
    """The gate itself must be falsifiable: a probe value whose true
    rank is off by more than 0.5% must flip rank_ok. Simulated by
    checking the integer arithmetic directly on a skewed distribution
    where the 25th percentile of a WRONG sketch (value=200) would sit at
    rank 1.0."""
    # 1000 copies of value 1 and one value 200: p25 must be 1; a sketch
    # claiming 200 has lt_cnt=1000 -> 1000*1000 <= 255*1001 is False.
    n, lt_cnt = 1001, 1000
    assert not (lt_cnt * 1000 <= (250 + 5) * n)


# ------------------------------------------------------------ dedup_lsh_eval

def test_dedup_lsh_eval_identical_docs(spark, tmp_path):
    """Two byte-identical docs (J=1, identical minhash signatures) must
    be both an exact pair and an LSH candidate: tp=1, nothing missed,
    recall 10000 bp. A third unrelated doc adds no pair."""
    dup = ("the quick brown fox jumps over the lazy dog and then "
           "runs far away into the deep dark woods tonight again")
    other = ("completely different content about databases indexes "
             "and query planners with no shared phrasing at all here")
    rows = [(1, dup, "en", "web", len(dup)),
            (2, dup, "en", "web", len(dup)),
            (3, other, "en", "web", len(other))]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "dedup_lsh_eval")
    row = out.iloc[0]
    assert (row["n_exact"], row["tp"], row["lsh_missed"]) \
        == ("1", "1", "0")
    assert row["recall_bp"] == "10000"


# -------------------------------------------------- transcript_tool_runs

def test_transcript_tool_runs_islands(spark, tmp_path):
    """conv 3 (doc_id % 50 == 3) with turn order by doc_id: roles from
    doc_id % 4 give tool,tool,tool,user,tool,tool -> two islands of
    lengths 3 and 2."""
    ids = [3, 103, 203, 253, 303, 403]  # %4: 3,3,3,1,3,3
    rows = [(i, f"turn {i}", "en", "web", 8) for i in ids]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "transcript_tool_runs")
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["conv_id"], row["n_tool_turns"], row["n_runs"],
            row["max_run"]) == ("3", "5", "2", "3")


# ------------------------------------------------- events_variant_buckets

def test_events_variant_buckets_malformed_and_null(spark, tmp_path):
    """Every non-integer axis nulls out instead of failing the job or
    silently coercing: malformed JSON, missing key, null props, a
    string k (plain variant_get throws INVALID_VARIANT_CAST on it),
    and FRACTIONAL k values — the review-found divergence where
    Spark's variant-int truncates 12.7 to 12 but DuckDB's cast rounds
    it to 13, hidden by the bucket aggregate until a value near a
    bucket boundary. Buckets are k DIV 10 with exact min/max."""
    rows = [(1, "a", '{"k": 7}'), (2, "a", '{"k": 12}'),
            (3, "a", '{"k": 19}'), (4, "a", "not json"),
            (5, "a", None), (6, "b", '{"j": 3}'),
            (7, "a", '{"k": "abc"}'), (8, "a", '{"k": 12.5}'),
            (9, "a", '{"k": 12.7}'), (10, "a", '{"k": 19.7}')]
    _write(spark, tmp_path, "events",
           "event_id long, event_type string, props string", rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_variant_buckets")
    got = {(r["event_type"], r["k_bucket"]):
           (r["cnt"], r["k_min"], r["k_max"]) for _, r in out.iterrows()}
    assert got == {("a", "0"): ("1", "7", "7"),
                   ("a", "1"): ("2", "12", "19")}  # 4-10 all null out


# ------------------------------------------------------- dedup_containment

def test_dedup_containment_asymmetric_pair(spark, tmp_path):
    """A short doc quoted wholesale inside a long one: containment = 1
    while Jaccard stays under the 0.5 gate — the pair the symmetric op
    must NOT emit and the containment op MUST."""
    short = "alpha beta gamma delta epsilon zeta"  # 4 shingles
    long_ = short + " " + " ".join(f"w{i}" for i in range(30))
    rows = [(1, short, "en", "web", len(short)),
            (2, long_, "en", "web", len(long_)),
            (3, "unrelated text about other things entirely here now",
             "en", "web", 50)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "dedup_containment")
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["contained_id"], row["container_id"]) == ("1", "2")
    assert row["containment_e4"] == "10000"  # all 4 shingles shared
    # the symmetric jaccard op does not see this pair (J = 4/36 < 0.5)
    jac = O.OPS["dedup_ngram_jaccard"][0](spark, str(tmp_path)).toPandas()
    assert len(jac) == 0


# ------------------------------------------------------------ graph_kcore

def test_kcore_peels_chain_keeps_triangle(spark):
    """Chain 1-2-3-4 dissolves under 2-core peeling (ends have degree 1,
    removing them exposes the next layer — the multi-round effect a
    single degree filter misses); triangle 10-11-12 survives with
    core_deg 2; pendant 13 hanging off the triangle is peeled without
    harming it."""
    pairs = [(1, 2), (2, 3), (3, 4),
             (10, 11), (11, 12), (10, 12), (10, 13)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "id_a long, id_b long")
    out = {r["doc_id"]: r["core_deg"] for _, r in
           O._kcore(edges).toPandas().iterrows()}
    assert out == {10: 2, 11: 2, 12: 2}


# ------------------------------------------------------- orders_range_frame

def test_range_frame_value_bounds_and_peers(spark, tmp_path):
    """Days 0, 10, 10, 35, 50 for one customer: the 30-day RANGE frame
    includes same-day orders as peers (both day-10 rows see both
    prices), day 35 reaches back to day 10 but not day 0, day 50
    reaches 35 but not 10."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    mk = lambda d: base + dt.timedelta(days=d)
    rows = [(13, 1, mk(0), 1.00), (26, 1, mk(10), 2.00),
            (39, 1, mk(10), 4.00), (52, 1, mk(35), 8.00),
            (65, 1, mk(50), 16.00)]
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long, o_orderdate timestamp, "
           "o_totalprice double", rows)
    out = {r["o_orderkey"]: r["trailing_30d_c"] for _, r in
           (O.OPS["orders_range_frame"][0](spark, str(tmp_path))
            .toPandas().iterrows())}
    assert out == {13: 100, 26: 700, 39: 700, 52: 1400, 65: 2400}
    _cross_check(spark, _duck(tmp_path, "orders"), tmp_path,
                 "orders_range_frame")


# ------------------------------------------------- transcript_context_trim

def test_context_trim_keeps_longest_suffix(spark, tmp_path):
    """Turns of 300/300/100/50 tokens against the 512 budget: the
    suffix 300+100+50 = 450 fits, adding the first turn (750) does not
    -> keep the last three whole turns."""
    toks = [300, 300, 100, 50]
    ids = [7, 57, 107, 157]  # all conv 7, turn order by doc_id
    rows = [(i, " ".join(["w"] * n), "en", "web", n)
            for i, n in zip(ids, toks)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "transcript_context_trim")
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["n_turns"], row["n_kept"], row["tokens_kept"],
            row["first_kept_idx"]) == ("4", "3", "450", "2")


# --------------------------------------------- embedding_power_iteration

def test_power_iteration_finds_dominant_axis(spark, tmp_path):
    """Vectors clustered along dimension 0 (with small dim-1 noise):
    the integer power iteration must return ±1000 ticks on dim 0 and
    near-zero everywhere past dim 1."""
    def vec(a, b):
        v = [0.0] * 64
        v[0], v[1] = a, b
        return v
    rows = [(1, vec(8.0, 0.0), "x"), (2, vec(9.0, 1.0), "x"),
            (3, vec(7.0, -1.0), "x")]
    _write(spark, tmp_path, "embeddings",
           "vec_id long, embedding array<float>, label string", rows)
    out = _cross_check(spark, _duck(tmp_path, "embeddings"), tmp_path,
                       "embedding_power_iteration")
    ticks = {int(r["dim_idx"]): int(r["v_tick"]) for _, r in
             out.iterrows()}
    assert len(ticks) == 64
    assert ticks[0] == 1000  # dominant axis at full tick magnitude
    assert all(abs(ticks[j]) <= 100 for j in range(2, 64))


# --------------------------------------------- transcript_role_transitions

def test_role_transitions_counts(spark, tmp_path):
    """conv 3 (ids stepping by 100 keep role 'tool', one +50 step flips
    to 'assistant'): transitions tool->tool x2, tool->assistant x1,
    assistant->tool x1."""
    ids = [3, 103, 203, 253, 303]  # roles: tool,tool,tool,assistant,tool
    rows = [(i, f"t {i}", "en", "web", 5) for i in ids]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = {(r["prev_role"], r["role"]): r["n_transitions"] for _, r in
           _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                        "transcript_role_transitions").iterrows()}
    assert out == {("tool", "tool"): "2", ("tool", "assistant"): "1",
                   ("assistant", "tool"): "1"}


# ------------------------------------------------------- docs_readability

def test_docs_readability_known_score(spark, tmp_path):
    """'The cat sat. The dog ran.' -> 6 words, 2 sentences, 6 vowel
    runs: flesch*100 = 20683500/100 - 1015*6*100/(2*100) - 846*6*100
    /(6*100) ... computed by hand below; null doc excluded."""
    rows = [(1, "The cat sat. The dog ran.", "en", "web", 25),
            (2, None, "en", "web", 0)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "docs_readability")
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["n_words"], row["n_sents"], row["n_sylls"]) \
        == ("6", "2", "6")
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.190 -> 11919
    assert row["flesch_e2"] == "11919"


# --------------------------------------------------- events_value_zscores

def test_zscores_flag_planted_outlier(spark, tmp_path):
    """100 values at 10.00 plus one at 1000.00: the spike is >3 sigma
    (sigma ~= 98.5), everything else is within; exact mean/sigma checked
    against a numpy recompute of the integer formulas."""
    rows = [(i, "a", 10.0) for i in range(100)] + [(100, "a", 1000.0)]
    _write(spark, tmp_path, "events",
           "event_id long, event_type string, value double", rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_value_zscores")
    assert len(out) == 1
    row = out.iloc[0]
    import math
    n, s1, s2 = 101, 100 * 1000 + 100000, 100 * 1000**2 + 100000**2
    assert row["n"] == "101"
    assert row["mean_c"] == str((2 * s1 + n) // (2 * n))
    # python floats replay the engines' identical IEEE expression tree
    sigma = math.sqrt(s2 / n - (s1 / n) * (s1 / n))
    assert row["sigma_tick_e4"] == str(math.floor(sigma * 10000))
    assert row["n_outliers"] == "1"


def test_zscores_survive_large_values(spark, tmp_path):
    """Overflow regression: 1,000 rows at $300k put n*s2 at ~9e20 —
    the original all-integer gate squared n-scaled sums and died with
    ARITHMETIC_OVERFLOW here; the double-formulated gate must run and
    still flag the planted spike."""
    rows = [(i, "a", 300000.0) for i in range(1000)] + \
        [(1000, "a", 600000.0)]
    _write(spark, tmp_path, "events",
           "event_id long, event_type string, value double", rows)
    out = _cross_check(spark, _duck(tmp_path, "events"), tmp_path,
                       "events_value_zscores")
    assert out.iloc[0]["n_outliers"] == "1"


# --------------------------------------------------- terms_topk_approx

def test_terms_topk_verifies_against_exact(spark, tmp_path):
    """Corpus with >K distinct terms and a tie ACROSS the K-boundary:
    whatever tie choice the sketch makes, every returned term's exact
    count reaches the band threshold (=1 here), so the verification
    row is exactly (K, K, 1)."""
    import string
    k = O._TOPK_K
    # k-1 heavy LETTER-ONLY terms (freq i+2 — digits would be stripped
    # by the [A-Za-z]+ tokenizer and collapse the vocabulary), then 5
    # singleton terms fighting for the last band slot
    parts = []
    for i in range(k - 1):
        parts += [f"term{string.ascii_lowercase[i]}x"] * (i + 2)
    parts += [f"tie{string.ascii_lowercase[j]}" for j in range(5)]
    rows = [(1, " ".join(parts), "en", "web", 10)]
    _write(spark, tmp_path, "documents",
           "doc_id long, text string, lang string, source string, "
           "n_chars long", rows)
    out = _cross_check(spark, _duck(tmp_path, "documents"), tmp_path,
                       "terms_topk_approx")
    row = out.iloc[0]
    assert (row["k_returned"], row["k_in_band"], row["band_threshold"]) \
        == (str(k), str(k), "1")


# ------------------------------------------------ customer_lateral_top2

def test_lateral_top2_per_customer(spark, tmp_path):
    """Customer 0 has 3 orders, customer 59 has 1, customer 5 (not on
    the modulo-59 record grid) has 2: the lateral returns exactly the
    top-2 per kept customer (prices in cents, desc) — 2 rows for 0,
    1 row for 59, none for 5."""
    _write(spark, tmp_path, "customer", "c_custkey long",
           [(0,), (5,), (59,)])
    _write(spark, tmp_path, "orders",
           "o_orderkey long, o_custkey long, o_totalprice double",
           [(1, 0, 10.00), (2, 0, 30.00), (3, 0, 20.00),
            (4, 59, 5.00), (5, 5, 1.00), (6, 5, 2.00)])
    out = _cross_check(spark,
                       _duck(tmp_path, "customer", "orders"),
                       tmp_path, "customer_lateral_top2")
    rows = sorted((int(r["c_custkey"]), int(r["o_orderkey"]),
                   int(r["price_c"])) for _, r in out.iterrows())
    assert rows == [(0, 2, 3000), (0, 3, 2000), (59, 4, 500)]


# ------------------------------------------------ partitioning invariance

@pytest.mark.parametrize("name", [
    "bpe_pair_counts",
    "events_value_zscores",
    "embedding_power_iteration",
    "dedup_containment",
    "domain_doc_cap",
])
def test_partitioning_invariance(spark, name):
    """The cross-engine portability claims rest on order-independence
    (integer sums, deterministic ticks, total-order windows). Changing
    the shuffle width changes aggregation grouping and arrival order —
    a result that shifts under shuffle=1 vs shuffle=7 would eventually
    flip a driver hash on a real cluster even if both SF sweeps pass."""
    fn = O.OPS[name][0]
    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = _canon(fn(spark, sf).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = _canon(fn(spark, sf).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a.equals(b), f"{name} shifted under a different shuffle width"


# ------------------------------------------------------------ dedup_reach_hops

def test_reach_hops_path_and_cycle(spark):
    """Hand graph: path 1-2-3-4-5-6 plus triangle 10-11-12. min-hop
    distances within the 4-hop cap; the 5-hop pair (1,6) is absent; the
    cycle terminates under the depth guard and yields hops=1 pairs."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
             (10, 11), (11, 12), (10, 12)]
    sym = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym, "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): r["hops"] for _, r in
           O._reach_hops(spark, edges).toPandas().iterrows()}
    # path distances
    for (a, b), d in {(1, 2): 1, (1, 3): 2, (1, 4): 3, (1, 5): 4,
                      (2, 6): 4, (3, 5): 2}.items():
        assert out[(a, b)] == d, (a, b, out.get((a, b)))
    assert (1, 6) not in out  # 5 hops > cap
    # triangle: every pair direct
    assert out[(10, 11)] == out[(10, 12)] == out[(11, 12)] == 1
    # no self pairs, no reversed duplicates
    assert all(a < b for a, b in out)
