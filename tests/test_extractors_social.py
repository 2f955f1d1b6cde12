"""Grok / LinkedIn / Threads / Bluesky / Discourse / YouTube extractor
tests mirroring the reference embedded suites."""

from types import SimpleNamespace

from trek_spark.extract.conversations import (
    bluesky_can, bluesky_extract, discourse_can, discourse_extract,
    grok_can, grok_extract, linkedin_can, linkedin_extract, threads_can,
    threads_extract,
)
from trek_spark.extract.youtube import (
    extract_video_id, is_youtube_watch_url, parse_caption_xml,
    parse_transcript_response, youtube_can, youtube_extract_sync,
)


def fake_collected(meta=()):
    return SimpleNamespace(meta_tags=[
        {"property": k, "name": None, "content": v} for k, v in meta])


# -------------------------------------------------------------------- grok

def test_grok_can():
    assert grok_can("https://grok.com/chat/abc", "")
    assert grok_can("https://x.com/i/grok", "")
    assert grok_can("https://x.com/i/grok/share/xyz", "")
    assert not grok_can("https://x.com/jack/status/123", "")
    assert not grok_can("https://example.com", "")


def test_grok_extracts_synthetic_dom():
    html = """<html><body>
        <div class="relative group flex flex-col justify-center w-full items-end">
            <div class="message-bubble">Why is the sky blue?</div>
        </div>
        <div class="relative group flex flex-col justify-center w-full items-start">
            <div class="message-bubble"><p>Rayleigh scattering.</p></div>
        </div>
    </body></html>"""
    out = grok_extract(html, "https://grok.com/chat/test", None, {})
    content, overrides = out
    assert overrides["site"] == "Grok"
    assert "sky blue" in content
    assert "Rayleigh" in content
    assert "You" in content and "Grok" in content


# ---------------------------------------------------------------- linkedin

def test_linkedin_can():
    for u in ("https://www.linkedin.com/posts/jane",
              "https://linkedin.com/in/jane",
              "https://uk.linkedin.com/posts/jane"):
        assert linkedin_can(u, ""), u
    assert not linkedin_can("https://example.com/posts/jane", "")


def test_linkedin_extract():
    html = """<html><body>
    <div role="article" class="feed-shared-update-v2">
      <div class="update-components-actor__title">Jane Roe
        <span class="visually-hidden">View profile</span></div>
      <div class="update-components-text">Shipping a new thing today.</div>
    </div></body></html>"""
    out = linkedin_extract(html, "https://www.linkedin.com/posts/jane",
                           None, {})
    content, overrides = out
    assert overrides["author"] == "Jane Roe"
    assert overrides["title"] == "Jane Roe on LinkedIn"
    assert "Shipping a new thing today." in content
    assert "View profile" not in content  # visually-hidden stripped


def test_linkedin_no_article_falls_through():
    assert linkedin_extract("<html><body><p>no article</p></body></html>",
                            "https://www.linkedin.com/posts/jane",
                            None, {}) is None


# ----------------------------------------------------------------- threads

def test_threads_can():
    assert threads_can("https://threads.net/@u/post/123", "")
    assert threads_can("https://www.threads.com/@u/post/456", "")
    assert not threads_can("https://example.com/@u/post/1", "")


def test_threads_extract_posts():
    html = """<html><body><div data-pagelet="threads_post_page_0">
    <div data-pressable-container="true">
      <a href="/@alice">alice</a>
      <time datetime="2026-01-05T00:00:00Z">Jan 5</time>
      <span dir="auto">First post body</span>
    </div>
    <div data-pressable-container="true">
      <a href="/@bob">bob</a>
      <span dir="auto">A reply body</span>
    </div>
    </div></body></html>"""
    out = threads_extract(html, "https://threads.net/@alice/post/1",
                          None, {})
    content, overrides = out
    assert overrides["title"] == "@alice on Threads"
    assert overrides["published"] == "2026-01-05T00:00:00Z"
    assert "First post body" in content
    assert "A reply body" in content


def test_threads_without_containers_falls_through():
    assert threads_extract("<html><body></body></html>",
                           "https://threads.net/@u/post/1", None, {}) is None


# ----------------------------------------------------------------- bluesky

def test_bluesky_can():
    assert bluesky_can("https://bsky.app/profile/foo/post/1", "")
    assert not bluesky_can("https://example.com/profile/foo/post/1", "")


def test_bluesky_extract_thread():
    html = """<html><body><div data-testid="postThreadScreen">
    <div data-testid="postThreadItem-by-alice.bsky.social">
      <div data-word-wrap="1">Original post text</div>
    </div>
    <div data-testid="postThreadItem-by-bob.bsky.social">
      <div><div style="width: 2px; background-color: rgb(1,2,3)"></div></div>
      <div data-word-wrap="1">Reply text</div>
    </div>
    </div></body></html>"""
    out = bluesky_extract(html, "https://bsky.app/profile/alice/post/1",
                          None, {})
    content, overrides = out
    assert overrides["title"] == "@alice.bsky.social on Bluesky"
    assert "Original post text" in content
    assert "Reply text" in content
    assert "<blockquote>" in content  # reply nested


def test_bluesky_no_thread_screen_falls_through():
    assert bluesky_extract("<html><body><p>no thread</p></body></html>",
                           "https://bsky.app/x/post/1", None, {}) is None


# --------------------------------------------------------------- discourse

def test_discourse_url_hint():
    assert discourse_can("https://forum.example.org/t/topic-slug/12345", "")
    assert not discourse_can("https://forum.example.org/wiki/page", "")


def test_discourse_extract():
    html = """<html><head>
    <meta name="generator" content="Discourse 3.2.0"></head><body>
    <h1 data-topic-id="1"><span class="fancy-title">How to frobnicate</span></h1>
    <div class="topic-post topic-owner">
      <div class="names"><a data-user-card="alice">alice</a></div>
      <div class="cooked">You frobnicate carefully.</div>
    </div>
    <div class="topic-post">
      <div class="names"><a data-user-card="bob">bob</a></div>
      <div class="cooked">Thanks, that worked.</div>
    </div></body></html>"""
    out = discourse_extract(html, "https://forum.example.org/t/x/1",
                            fake_collected([("og:site_name", "Example Forum")]),
                            {})
    content, overrides = out
    assert overrides["title"] == "How to frobnicate"
    assert overrides["site"] == "Example Forum"
    assert overrides["author"] == "alice"
    assert "You frobnicate carefully." in content
    assert "Thanks, that worked." in content


def test_discourse_non_discourse_falls_through():
    assert discourse_extract("<html><body><p>x</p></body></html>",
                             "https://forum.example.org/t/x/1",
                             fake_collected(), {}) is None


# ----------------------------------------------------------------- youtube

def test_youtube_sync_registry_never_selects():
    # prefers_async parity: sync registry must skip it
    assert not youtube_can("https://www.youtube.com/watch?v=abc123", "")


def test_youtube_url_helpers():
    assert is_youtube_watch_url("https://youtu.be/abc")
    assert is_youtube_watch_url("https://www.youtube.com/watch?v=abc")
    assert is_youtube_watch_url("https://youtube.com/shorts/xyz")
    assert not is_youtube_watch_url("https://example.com/watch?v=abc")
    assert extract_video_id("https://youtu.be/abc?t=5") == "abc"
    assert extract_video_id("https://www.youtube.com/watch?v=dQw4") == "dQw4"
    assert extract_video_id("https://youtube.com/shorts/xyz/extra") == "xyz"
    assert extract_video_id("https://youtube.com/playlist?list=1") is None


def test_youtube_sync_extract():
    html = """<html><head>
    <meta name="title" content="My Video">
    <meta name="description" content="A description.">
    <link itemprop="name" content="My Channel">
    </head><body></body></html>"""
    out = youtube_extract_sync(
        html, "https://www.youtube.com/watch?v=abc123", None, {})
    content, overrides = out
    assert overrides["title"] == "My Video"
    assert overrides["author"] == "My Channel"
    assert overrides["site"] == "YouTube"
    assert "youtube.com/embed/abc123" in content
    assert "A description." in content


def test_youtube_caption_xml():
    xml = ('<timedtext><body><p t="0" d="1">Hello <b>world</b></p>'
           '<p t="1" d="1">Second &amp; line</p></body></timedtext>')
    out = parse_caption_xml(xml)
    assert out is not None
    assert "<p>Hello world</p>" in out
    assert "Second &amp; line" in out
    assert parse_caption_xml("<x/>") is None


def test_youtube_transcript_response():
    body = ('{"captions":{"playerCaptionsTracklistRenderer":{"captionTracks":'
            '[{"languageCode":"en","baseUrl":"http://x"}]}},'
            '"transcript":"line one\\nline two"}')
    out = parse_transcript_response(body)
    assert out is not None
    assert "<p>line one</p>" in out and "<p>line two</p>" in out
    assert parse_transcript_response("{}") is None
