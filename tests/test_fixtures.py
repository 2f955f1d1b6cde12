"""Golden-fixture parity suite (per-turn text equality — the north-rule gate).

Tiers mirror the reference harness (tests/fixtures_test.rs):
  1. corpus sanity (>= 180 fixtures);
  2. fuzzy metadata pass with a known-gap allowlist;
  3. byte-exact markdown on the ratcheted green list
     (tests/markdown_green.json) — fixtures once exact must stay exact.
"""

import json
import os

import pytest

from trek_spark.extract.pipeline import trek_parse
from trek_spark.fixtures import load_fixtures, metadata_field_ok

# Fixtures whose metadata needs site-specific extractors the reference also
# lacks or gates (reference allowlist tests/fixtures_test.rs:72-94) plus the
# extractor-dependent gaps still open in this port.
KNOWN_METADATA_GAPS = {
    ("extractor--bbcode-data", "published"),
}

_GREEN_PATH = os.path.join(os.path.dirname(__file__), "markdown_green.json")


@pytest.fixture(scope="module")
def corpus():
    fixtures = load_fixtures()
    results = {}
    for fx in fixtures:
        results[fx.name] = (fx, trek_parse(fx.html, fx.url))
    return results


def test_corpus_sanity():
    assert len(load_fixtures()) >= 180


def test_metadata_fuzzy_tier(corpus):
    failures = []
    for name, (fx, r) in corpus.items():
        if fx.expected_meta is None:
            continue
        for field in ("title", "author", "site", "published"):
            if (name, field) in KNOWN_METADATA_GAPS:
                continue
            exp = fx.expected_meta.get(field, "") or ""
            act = r.get(field, "") or ""
            if not metadata_field_ok(act, exp):
                failures.append(f"{name}.{field}: expected={exp!r} got={act!r}")
    assert not failures, "\n".join(failures)


def test_markdown_exact_green_list(corpus):
    with open(_GREEN_PATH) as f:
        green = json.load(f)
    regressions = []
    for name in green:
        fx, r = corpus[name]
        act = (r["content_markdown"] or "").strip()
        if act != (fx.expected_markdown or "").strip():
            regressions.append(name)
    assert not regressions, f"markdown regressions: {regressions}"


def test_markdown_exact_count_floor(corpus):
    exact = 0
    for name, (fx, r) in corpus.items():
        if fx.expected_markdown is None:
            continue
        if (r["content_markdown"] or "").strip() == fx.expected_markdown.strip():
            exact += 1
    assert exact >= 155, f"byte-exact markdown count dropped to {exact}"
