"""Known-answer + cross-engine tests for the corpus-curation operator
batch added late in round 7 (parked for the r8 record window): PII
redaction, boilerplate-line removal, token-budget packing, DSIR
importance weights, PageRank over the near-dup graph.

Each op already has a DuckDB oracle wired in OPS; these tests pin the
SEMANTICS on crafted corpora with hand-computed answers (the oracle can
only prove the two engines agree — not that both are right).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from trek_spark.spark.session import get_spark
from trek_spark.spark import ops as O


@pytest.fixture(scope="module")
def spark():
    s = get_spark("pytest-curation", master="local[4]", shuffle_partitions=8)
    yield s


def _write_documents(spark, path, rows):
    """rows: (doc_id, text, lang, source, n_chars) matching TESTDATA."""
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .write.mode("overwrite").parquet(f"{path}/documents.parquet"))


def _duck(path):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{path}/documents.parquet/*.parquet'")
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


# ---------------------------------------------------------------- pii_redact

def test_pii_redact_known_answers(spark, tmp_path):
    """doc 0 (doc_id % 25 == 0) gets the deterministic injection —
    exactly one email, one IPv4, one phone; doc 1 carries its own PII in
    the raw text and is NOT injected; doc 2 is clean; doc 3 is null."""
    rows = [(0, "plain words here", "en", "web", 16),
            (1, "mail a@b.co and c@d.org ip 1.2.3.4 tel +12345678",
             "en", "web", 48),
            (2, "nothing sensitive", "en", "web", 17),
            (3, None, "en", "web", 0)]
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for _, r in
           O.OPS["pii_redact"][0](spark, str(tmp_path))
           .toPandas().iterrows()}
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) \
        == (1, 1, 1)
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) \
        == (2, 1, 1)
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) \
        == (0, 0, 0)
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) \
        == (0, 0, 0)
    # the redaction itself: doc 1's scrubbed text contains no raw PII
    red = (spark.read.parquet(f"{tmp_path}/documents.parquet")
           .filter(F.col("doc_id") == 1)
           .select(F.regexp_replace(F.regexp_replace(F.regexp_replace(
               "text", O._PII_EMAIL, "<EMAIL>"), O._PII_IPV4, "<IP>"),
               O._PII_PHONE, "<PHONE>").alias("r"))
           .first()["r"])
    assert red == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"
    _cross_check(spark, _duck(tmp_path), tmp_path, "pii_redact")


# ------------------------------------------------- dedup_boilerplate_lines

def test_boilerplate_lines_threshold_boundary(spark, tmp_path):
    """60 docs, each 'unique words N' + a shared line (df=60, removed).
    The op's own injection adds a header on doc_id%3 (df=20 — exactly AT
    the >= 20 threshold, removed) and a footer on doc_id%4 (df=15 —
    UNDER it, kept): both sides of the boundary are pinned."""
    import hashlib
    rows = [(i, f"unique words {i}\ncommon shared line", "en", "web",
             20) for i in range(60)]
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for _, r in
           O.OPS["dedup_boilerplate_lines"][0](spark, str(tmp_path))
           .toPandas().iterrows()}

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    # doc 1: no injection — 2 lines, shared line removed
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (2, 1)
    assert out[1]["cleaned_hash"] == h("unique words 1")
    # doc 0: header (removed, df=20) + footer (kept, df=15)
    assert (out[0]["n_lines"], out[0]["n_removed"]) == (4, 2)
    assert out[0]["cleaned_hash"] == h(
        "unique words 0\ncopyright footer all rights reserved")
    # doc 3: header only — removed
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (3, 2)
    assert out[3]["cleaned_hash"] == h("unique words 3")
    _cross_check(spark, _duck(tmp_path), tmp_path,
                 "dedup_boilerplate_lines")


# --------------------------------------------------- pack_token_budget

def test_pack_token_budget_known_answers(spark, tmp_path):
    """5 docs × 1000 tokens, capacity 2048: docs start at offsets
    0/1000/2000/3000/4000 → sequences {0,0,0,1,1} (a doc belongs to the
    sequence where it STARTS; seq 0 overflows to 3000 tokens — the
    GPT-style concatenate-then-chunk boundary semantics)."""
    body = ("tok " * 1000).strip()
    rows = [(i, body, "en", "web", len(body)) for i in range(5)]
    _write_documents(spark, tmp_path, rows)
    out = (O.OPS["pack_token_budget"][0](spark, str(tmp_path))
           .toPandas().sort_values("seq_id").reset_index(drop=True))
    assert list(out["seq_id"]) == [0, 1]
    assert list(out["n_docs"]) == [3, 2]
    assert list(out["seq_tokens"]) == [3000, 2000]
    assert list(out["first_doc"]) == [0, 3]
    assert list(out["last_doc"]) == [2, 4]
    _cross_check(spark, _duck(tmp_path), tmp_path, "pack_token_budget")


# ----------------------------------------------------- dsir_importance

def test_dsir_scores_target_like_docs_higher(spark, tmp_path):
    """Target slice (en) is full of 'alpha beta'; the raw-only slice of
    'gamma delta'. Two probe docs of EQUAL length in the non-target
    lang: the one whose bigrams look like the target must outscore the
    other — the DSIR selection property the op exists for."""
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta " * 10, "en", "web", 110))
    for i in range(30, 60):
        rows.append((i, "gamma delta " * 10, "de", "web", 120))
    rows.append((100, "alpha beta " * 10, "de", "web", 110))   # target-like
    rows.append((101, "gamma delta " * 10, "de", "web", 120))  # raw-like
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for _, r in
           O.OPS["dsir_importance"][0](spark, str(tmp_path))
           .toPandas().iterrows()}
    assert out[100]["n_bigrams"] == out[101]["n_bigrams"] == 19
    assert out[100]["dsir_score"] > out[101]["dsir_score"]
    _cross_check(spark, _duck(tmp_path), tmp_path, "dsir_importance")


# ------------------------------------------------------ graph_pagerank

def test_pagerank_star_graph_exact_ticks(spark):
    """4-leaf star, hand-unrolled 3 integer-tick iterations:
    r1(h)=150000+4·(1e6·17)//20 = 3,550,000 … r3(h)=3,224,872,
    r3(leaf)=443,781. Pins the exact arithmetic the oracle mirrors."""
    pairs = [("h", f"l{i}") for i in range(4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "id_a string, id_b string")
    out = {r["doc_id"]: r for _, r in
           O._pagerank(edges).toPandas().iterrows()}
    assert (out["h"]["deg"], out["h"]["pr_tick"]) == (4, 3_224_872)
    for i in range(4):
        assert (out[f"l{i}"]["deg"], out[f"l{i}"]["pr_tick"]) \
            == (1, 443_781)


# ------------------------------------------------- within_doc_dedup_lines

def test_within_doc_dedup_keeps_first_occurrence(spark, tmp_path):
    """'a\\nb\\na\\nc' → 4 lines, 1 dupe removed, cleaned text 'a\\nb\\nc'
    (keep-first is ORDINAL — 'a' stays at position 1, not re-sorted).
    Empty text splits to [''] → 1 line, 0 dupes."""
    import hashlib
    rows = [(0, "a\nb\na\nc", "en", "web", 7),
            (1, "x\nx\nx\nx", "en", "web", 7),
            (2, "", "en", "web", 0)]
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for _, r in
           O.OPS["within_doc_dedup_lines"][0](spark, str(tmp_path))
           .toPandas().iterrows()}
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert (out[0]["n_lines"], out[0]["n_dupes"]) == (4, 1)
    assert out[0]["cleaned_hash"] == h("a\nb\nc")
    assert (out[1]["n_lines"], out[1]["n_dupes"]) == (4, 3)
    assert out[1]["cleaned_hash"] == h("x")
    assert (out[2]["n_lines"], out[2]["n_dupes"]) == (1, 0)
    assert out[2]["cleaned_hash"] == h("")
    _cross_check(spark, _duck(tmp_path), tmp_path,
                 "within_doc_dedup_lines")


# ------------------------------------------------ lang_consistency_chunks

def test_lang_consistency_flags_code_switching(spark, tmp_path):
    """doc 0 flips en→de exactly at the 256-char chunk boundary → two
    chunks voting differently, is_mixed, top_lang en (1-1 tie breaks by
    the en>de cascade). doc 1 is uniform English → not mixed. doc 2 is
    CJK → zh chunk vote."""
    en_chunk = ("the and of a to in " * 15)[:256]          # pure en votes
    de_chunk = ("der die und das ist ein " * 11)[:256]     # pure de votes
    assert len(en_chunk) == len(de_chunk) == 256
    rows = [(0, en_chunk + de_chunk, "en", "web", 512),
            (1, en_chunk * 3, "en", "web", 768),
            (2, "这是一个中文文档的内容测试", "zh", "web", 13)]
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for _, r in
           O.OPS["lang_consistency_chunks"][0](spark, str(tmp_path))
           .toPandas().iterrows()}
    assert (out[0]["n_chunks"], out[0]["c_en"], out[0]["c_de"]) == (2, 1, 1)
    assert bool(out[0]["is_mixed"]) and out[0]["top_lang"] == "en"
    assert (out[1]["n_chunks"], out[1]["c_en"]) == (3, 3)
    assert not bool(out[1]["is_mixed"]) and out[1]["top_lang"] == "en"
    assert (out[2]["c_zh"], out[2]["top_lang"]) == (1, "zh")
    _cross_check(spark, _duck(tmp_path), tmp_path,
                 "lang_consistency_chunks")


# ----------------------------------------------- char_trigram_perplexity

def test_perplexity_ranks_gibberish_above_common_text(spark, tmp_path):
    """30 docs of the same common phrase + 1 gibberish doc of rare
    characters: the gibberish doc's trigrams hit low-count buckets, so
    its avg surprisal tick must be strictly higher. Trigram counts are
    exact: a doc of length L <= 2048 has L-2 trigrams."""
    common = "the cat sat on the mat and the dog ran off " * 10
    gibberish = "zqxjkvwpyg bfhmzqxjkvw pygbfhmzqx jkvwpygbfh"
    rows = [(i, common, "en", "web", len(common)) for i in range(30)]
    rows.append((100, gibberish, "en", "web", len(gibberish)))
    _write_documents(spark, tmp_path, rows)
    out = {r["doc_id"]: r for _, r in
           O.OPS["char_trigram_perplexity"][0](spark, str(tmp_path))
           .toPandas().iterrows()}
    assert out[0]["n_trigrams"] == len(common) - 2
    assert out[100]["n_trigrams"] == len(gibberish) - 2
    assert out[100]["ppl_tick"] > out[0]["ppl_tick"]
    _cross_check(spark, _duck(tmp_path), tmp_path,
                 "char_trigram_perplexity")
