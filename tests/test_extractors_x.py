"""Twitter/X-family extractor + recursion-guard tests, mirroring the
reference's embedded suites (`src/extractors/twitter.rs:235-280`,
`src/extractors/x_oembed.rs:84-118`, `src/extractor.rs:112-170`)."""

import pytest

from trek_spark.extract.conversations import (
    twitter_can, twitter_extract, x_oembed_can, x_oembed_extract,
)
from trek_spark.extract.pipeline import (
    RecursionLimitError, trek_parse,
)

TWEET_HTML = """
<html><body>
<article data-testid="tweet">
  <div data-testid="User-Name">
    <a href="/jane">Jane Doe</a><a href="/jane">@jane</a>
  </div>
  <div data-testid="tweetText">Hello world, this is the main tweet.</div>
  <time datetime="2026-02-13T10:00:00Z">Feb 13</time>
</article>
<article data-testid="tweet">
  <div data-testid="User-Name">
    <a href="/bob">Bob</a><a href="/bob">@bob</a>
  </div>
  <div data-testid="tweetText">A reply from someone else.</div>
  <time datetime="2026-02-13T11:00:00Z">Feb 13</time>
</article>
<article data-testid="tweet">
  <div data-testid="User-Name">
    <a href="/jane">Jane Doe</a><a href="/jane">@jane</a>
  </div>
  <div data-testid="tweetText">Thread continuation by the author.</div>
</article>
</body></html>
"""


def test_twitter_matches_status_urls():
    for u in ("https://x.com/jane/status/123",
              "https://twitter.com/jane/status/123",
              "https://www.x.com/jane/status/123",
              "https://mobile.twitter.com/jane/status/123"):
        assert twitter_can(u, ""), u


def test_twitter_skips_article_and_foreign_urls():
    for u in ("https://x.com/i/article/12345",
              "https://x.com/jane/article/12345",
              "https://twitter.com/i/article/999",
              "https://example.com/jane/status/1"):
        assert not twitter_can(u, ""), u


def test_twitter_extract_thread_shape():
    out = twitter_extract(TWEET_HTML, "https://x.com/jane/status/1",
                          None, {})
    assert out is not None
    html, overrides = out
    assert "Hello world, this is the main tweet." in html
    assert "A reply from someone else." in html
    assert overrides["title"] == "@jane on X"
    assert overrides["author"] == "@jane"
    assert overrides["site"] == "X (Twitter)"
    assert overrides["published"] == "2026-02-13"
    # reply by another author nests one blockquote deep; the author's own
    # thread continuation stays at depth 0
    assert "<blockquote>" in html


def test_twitter_no_tweets_falls_through():
    assert twitter_extract("<html><body><p>nothing</p></body></html>",
                           "https://x.com/jane/status/1", None, {}) is None


def test_twitter_via_pipeline():
    r = trek_parse(TWEET_HTML, "https://x.com/jane/status/1")
    assert r["extractor_type"] == "twitter"
    assert "Hello world" in r["content_markdown"]
    assert r["title"] == "@jane on X"


def test_x_oembed_url_gate():
    assert x_oembed_can("https://x.com/jane/status/12345", "")
    assert x_oembed_can("https://twitter.com/jane/article/9", "")
    assert not x_oembed_can("https://example.com/jane/status/1", "")


def test_x_oembed_sync_always_falls_through():
    assert x_oembed_extract("<html></html>",
                            "https://x.com/jane/status/1", None, {}) is None


def test_recursion_guard_depth_limit():
    import trek_spark.extract.pipeline as pl

    calls = {"n": 0, "max_seen": 0}
    doc = "<html><body><p>Some prose content for the parser to chew on, " \
          "long enough to extract.</p></body></html>"

    # re-entrant extractor: each parse triggers another parse
    def recursive_can(url, html):
        return True

    def recursive_extract(html, url, collected, metadata):
        calls["n"] += 1
        calls["max_seen"] = max(calls["max_seen"], pl._parse_depth)
        trek_parse(doc, "https://recurse.example/x")  # re-enter
        return None

    from trek_spark.extract import extractors as reg
    reg._bootstrap()
    reg._REGISTRY.insert(0, ("recursive", recursive_can, recursive_extract))
    try:
        # outer call succeeds: the RecursionLimitError raised deep inside is
        # caught by the registry fallback at each level, and depth never
        # exceeds the cap
        r = trek_parse(doc, "https://recurse.example/x")
        assert r is not None
        # at most _RECURSION_MAX live parses (the enter that would exceed
        # the cap raises — reference RecursionDepth DEFAULT_MAX=3)
        assert calls["max_seen"] <= pl._RECURSION_MAX
        assert calls["n"] <= pl._RECURSION_MAX
    finally:
        reg._REGISTRY.pop(0)
    assert pl._parse_depth == 0


def test_recursion_guard_raises_beyond_cap():
    import trek_spark.extract.pipeline as pl
    # an enter AT the cap must fail (depth==MAX means MAX parses are
    # already live; this would be the MAX+1th)
    pl._parse_depth = pl._RECURSION_MAX
    try:
        with pytest.raises(RecursionLimitError):
            trek_parse("<p>x</p>")
    finally:
        pl._parse_depth = 0
    # and the last allowed depth still succeeds
    pl._parse_depth = pl._RECURSION_MAX - 1
    try:
        assert trek_parse("<p>x</p>") is not None
    finally:
        pl._parse_depth = 0
