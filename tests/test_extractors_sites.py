"""News/knowledge extractor tests mirroring the reference embedded suites
(`src/extractors/{wikipedia,medium,leetcode,lwn,nytimes,c2_wiki}.rs`)."""

from types import SimpleNamespace

from trek_spark.extract.sites import (
    _c2_split_camel, _lwn_author, _lwn_date, c2_wiki_can, leetcode_can,
    leetcode_extract, lwn_can, lwn_extract, medium_can, medium_extract,
    nytimes_can, nytimes_extract, wikipedia_can, wikipedia_extract,
)


def fake_collected(meta=()):
    return SimpleNamespace(meta_tags=[
        {"property": k, "name": None, "content": v} for k, v in meta])


# ---------------------------------------------------------------- wikipedia

def test_wikipedia_can():
    assert wikipedia_can("https://en.wikipedia.org/wiki/Foo", "")
    assert wikipedia_can("https://wikipedia.org/wiki/Foo", "")
    assert not wikipedia_can("https://example.com", "")


def test_wikipedia_extracts_body_and_strips_clutter():
    html = """<html><body>
    <div id="mw-content-text"><div class="mw-parser-output">
    <p>Body</p>
    <div class="toc">TOCMARKER</div>
    <div class="navbox">NAVMARKER</div>
    </div></div></body></html>"""
    out = wikipedia_extract(
        html, "https://en.wikipedia.org/wiki/Foo",
        fake_collected([("og:title", "Foo - Wikipedia")]), {})
    assert out is not None
    content, overrides = out
    assert overrides["title"] == "Foo"
    assert overrides["site"] == "Wikipedia"
    assert "Body" in content
    assert "TOCMARKER" not in content
    assert "NAVMARKER" not in content


# ------------------------------------------------------------------- medium

def test_medium_can():
    assert medium_can("https://medium.com/@user/some-post", "")
    assert medium_can("https://towardsdatascience.medium.com/x", "")
    assert not medium_can("https://example.com", "")


def test_medium_extracts_article_body():
    html = """<html><body><article class="meteredContent">
    <h1>My Story</h1><p>Body content here.</p></article></body></html>"""
    out = medium_extract(html, "https://medium.com/x",
                         fake_collected([("og:site_name", "Medium")]), {})
    assert out is not None
    content, overrides = out
    assert overrides["title"] == "My Story"
    assert overrides["site"] == "Medium"
    assert "Body content here." in content


def test_medium_rejects_non_medium_page():
    html = "<html><body><article><p>x</p></article></body></html>"
    assert medium_extract(html, "https://medium.com/x",
                          fake_collected(), {}) is None


# ----------------------------------------------------------------- leetcode

def test_leetcode():
    assert leetcode_can("https://leetcode.com/problems/two-sum/", "")
    assert not leetcode_can("https://example.com", "")
    html = """<html><body><div data-track-load="description_content">
    <p>Given an array...</p></div></body></html>"""
    out = leetcode_extract(
        html, "https://leetcode.com/problems/two-sum",
        fake_collected([("og:title", "Two Sum - LeetCode")]), {})
    content, overrides = out
    assert overrides["title"] == "Two Sum"
    assert overrides["site"] == "LeetCode"
    assert "Given an array" in content


# ---------------------------------------------------------------------- lwn

def test_lwn_byline_parsing():
    assert _lwn_author("by alice on something") == "alice"
    assert _lwn_date("Posted Mar 12, 2025") == "2025-03-12"


def test_lwn_extract_article_and_comments():
    html = """<html><body>
    <div class="PageHeadline"><h1>X</h1></div>
    <div class="Byline">by alice Posted Mar 12, 2025</div>
    <div class="ArticleText"><main><p>Body</p>
    <details class="CommentBox"><summary>c</summary>
      <div class="CommentPoster">bob Posted Mar 13, 2025</div>
      <div class="FormattedComment"><p>Nice article.</p></div>
    </details>
    </main></div></body></html>"""
    assert lwn_can("https://lwn.net/Articles/123/", "")
    out = lwn_extract(html, "https://lwn.net/Articles/123/",
                      fake_collected(), {})
    content, overrides = out
    assert overrides["title"] == "X"
    assert overrides["author"] == "alice"
    assert overrides["published"] == "2025-03-12"
    assert overrides["site"] == "LWN.net"
    assert "Body" in content
    assert "<h2>Comments</h2>" in content
    assert "Nice article." in content
    assert "<strong>bob</strong>" in content


# ------------------------------------------------------------------ nytimes

def test_nytimes_extract_preload():
    html = ("<html><body><script>window.__preloadedData = "
            '{"initialData":{"data":{"article":{"headline":{"default":"T"},'
            '"summary":"S","firstPublished":"2025-01-01",'
            '"bylines":[{"creators":[{"displayName":"Jane Roe"}]}],'
            '"sprinkledBody":{"content":['
            '{"__typename":"Heading2Block","content":'
            '[{"__typename":"Inline","text":"Hi"}]},'
            '{"__typename":"ParagraphBlock","content":'
            '[{"__typename":"Inline","text":"Hello"}]}]}}}}};'
            "</script></body></html>")
    assert nytimes_can("https://www.nytimes.com/2024/01/01/us/foo.html", "")
    out = nytimes_extract(html, "https://nytimes.com/x",
                          fake_collected(), {})
    content, overrides = out
    assert overrides["title"] == "T"
    assert overrides["author"] == "Jane Roe"
    assert overrides["published"] == "2025-01-01"
    assert overrides["description"] == "S"
    assert "<h2>Hi</h2>" in content
    assert "<p>Hello</p>" in content


def test_nytimes_no_preload_falls_through():
    assert nytimes_extract("<html><body><p>x</p></body></html>",
                           "https://nytimes.com/x", fake_collected(),
                           {}) is None


# ------------------------------------------------------------------ c2 wiki

def test_c2_wiki_sync_path_never_claims():
    # async-only in the reference; the sync registry must never select it
    assert not c2_wiki_can("https://wiki.c2.com/?WelcomeVisitors", "")
    assert _c2_split_camel("WelcomeVisitors") == "Welcome Visitors"
    assert _c2_split_camel("SomeWikiPage") == "Some Wiki Page"


def test_registry_priority_order_matches_reference():
    """First-match-wins dispatch requires the exact reference order
    (src/extractors/mod.rs:50-93); a drifted order can route a document
    claimed by two extractors differently."""
    from trek_spark.extract import extractors as ex
    ex._bootstrap()
    assert [n for n, _, _ in ex._REGISTRY] == ex.PRIORITY_ORDER
    assert ex.PRIORITY_ORDER[0] == "x-article"
    assert ex.PRIORITY_ORDER[-1] == "bbcode-data"
    assert ex.PRIORITY_ORDER.index("mastodon") == 19  # after news/knowledge
