"""Conversation-shaped site extractors (ChatGPT / Claude / Gemini / Grok).

The transcript-shaped core of the reference's extractor registry
(`src/extractor.rs:456-532`, `src/extractors/{chatgpt,claude,gemini,grok}.rs`):
walk role-tagged message containers, collect (author, html, depth) messages,
render as `<article class="conversation">` with depth-nested blockquotes and
author paragraphs, title from the first user message (≤80 chars).
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass
from typing import Optional
from urllib.parse import urlsplit

from ..dom.node import ELEMENT, Node, inner_html
from ..dom.parser import body_of, parse_html
from .utils import strip_html_tags


@dataclass
class ConversationMessage:
    author: Optional[str] = None
    timestamp: Optional[str] = None
    html: str = ""
    depth: int = 0

    def render_html(self) -> str:
        out = ["<blockquote>" * self.depth,
               '<div class="conversation-message">']
        if self.author:
            out.append('<p class="conversation-author"><strong>'
                       + _html.escape(self.author) + "</strong></p>")
        if self.timestamp:
            out.append('<p class="conversation-timestamp"><em>'
                       + _html.escape(self.timestamp) + "</em></p>")
        out.append(self.html)
        out.append("</div>")
        out.append("</blockquote>" * self.depth)
        return "".join(out)


def render_conversation(messages: list[ConversationMessage]) -> str:
    return ('<article class="conversation">'
            + "".join(m.render_html() for m in messages)
            + "</article>")


def _host(url: str) -> str:
    try:
        h = urlsplit(url).hostname or ""
    except ValueError:
        return ""
    return h[4:] if h.startswith("www.") else h


def _find_with_class(node: Node, classes) -> Optional[Node]:
    for d in node.iter_elements():
        toks = d.classes()
        if any(c in toks for c in classes):
            return d
    return None


def _find_tag(node: Node, tag: str) -> Optional[Node]:
    return node.find_first(tag)


def title_from_first_user_message(messages) -> Optional[str]:
    first = next((m for m in messages
                  if (m.author or "").lower() in ("you", "user")), None)
    if first is None:
        return None
    text = strip_html_tags(first.html)
    line = text.split("\n")[0].strip()
    if not line:
        return None
    return line if len(line) <= 80 else line[:77].rstrip() + "..."


def _capitalize(s: str) -> str:
    return s[:1].upper() + s[1:] if s else s


# --------------------------------------------------------------- extractors

def chatgpt_can(url: str, html: str) -> bool:
    return _host(url) in ("chatgpt.com", "chat.openai.com") \
        and "data-message-author-role" in html


def chatgpt_extract(html: str, url, collected, metadata):
    body = body_of(parse_html(html))
    messages = []
    for node in body.descendants_snapshot():
        role = node.get("data-message-author-role")
        if role is None:
            continue
        content = _find_with_class(node, ("markdown", "whitespace-pre-wrap")) \
            or node
        h = inner_html(content).replace("​", "").strip()
        if not h:
            continue
        author = {"user": "You", "assistant": "ChatGPT",
                  "system": "System"}.get(role) or (
            _capitalize(role) if role else None)
        messages.append(ConversationMessage(author=author, html=h))
    if not messages:
        return None
    overrides = {"site": "ChatGPT"}
    title = title_from_first_user_message(messages)
    if title:
        overrides["title"] = title
    return render_conversation(messages), overrides


def claude_can(url: str, html: str) -> bool:
    return _host(url) == "claude.ai" and (
        "data-testid" in html or "font-claude-response" in html)


def claude_extract(html: str, url, collected, metadata):
    body = body_of(parse_html(html))
    messages = []
    for node in body.descendants_snapshot():
        if node.parent is None:
            continue
        testid = node.get("data-testid")
        cls = node.classes()
        author = None
        content = None
        if node.tag == "div" and testid == "user-message":
            author, content = "You", node
        elif node.tag == "div" and testid == "assistant-message":
            author = "Claude"
            content = _find_with_class(node, ("standard-markdown",)) or node
        elif "font-claude-response" in cls or "font-claude-message" in cls:
            author = "Claude"
            content = _find_with_class(node, ("standard-markdown",)) or node
        if author is None or content is None:
            continue
        h = inner_html(content).replace("​", "").strip()
        if h:
            messages.append(ConversationMessage(author=author, html=h))
    if not messages:
        return None
    overrides = {"site": "Claude"}
    title = title_from_first_user_message(messages)
    if title:
        overrides["title"] = title
    return render_conversation(messages), overrides


def gemini_can(url: str, html: str) -> bool:
    return _host(url) in ("gemini.google.com", "bard.google.com")


def gemini_extract(html: str, url, collected, metadata):
    body = body_of(parse_html(html))
    messages = []
    for container in [n for n in body.iter_elements()
                      if n.tag == "div"
                      and "conversation-container" in n.classes()]:
        uq = _find_tag(container, "user-query")
        if uq is not None:
            qt = _find_with_class(uq, ("query-text",))
            if qt is not None:
                h = inner_html(qt).strip()
                if h:
                    messages.append(ConversationMessage(author="You", html=h))
        mr = _find_tag(container, "model-response")
        if mr is not None:
            content = None
            for d in mr.iter_elements():
                if d.get("id") == "extended-response-markdown-content":
                    content = d
                    break
            if content is None:
                content = _find_with_class(mr, ("markdown",))
            if content is not None:
                h = inner_html(content).strip()
                if h:
                    messages.append(
                        ConversationMessage(author="Gemini", html=h))
    if not messages:
        return None
    overrides = {"site": "Gemini"}
    title = title_from_first_user_message(messages)
    if title:
        overrides["title"] = title
    return render_conversation(messages), overrides


def register_all() -> None:
    """AI chat + social timelines, reference order
    (`src/extractors/mod.rs:64-77`): chatgpt > claude > grok > gemini,
    then linkedin, threads, bluesky."""
    from .extractors import register
    register("chatgpt", chatgpt_can, chatgpt_extract)
    register("claude", claude_can, claude_extract)
    register("grok", grok_can, grok_extract)
    register("gemini", gemini_can, gemini_extract)
    register("linkedin", linkedin_can, linkedin_extract)
    register("threads", threads_can, threads_extract)
    register("bluesky", bluesky_can, bluesky_extract)
    # generator-meta-matched (`src/extractors/mod.rs:86-88`)
    register("discourse", discourse_can, discourse_extract)


def register_x_family() -> None:
    """X/Twitter family minus x-article (which lives in sites.py);
    reference priority: x-article > twitter > x-oembed
    (`src/extractors/mod.rs:49-52`)."""
    from .extractors import register
    register("twitter", twitter_can, twitter_extract)
    register("x-oembed", x_oembed_can, x_oembed_extract)


# ------------------------------------------------------------ twitter / X

_TW_STATUS_RE = re.compile(
    r"(?i)^https?://(?:www\.|mobile\.)?(?:x|twitter)\.com/"
    r"[A-Za-z0-9_]{1,15}/status/\d+")
_TW_ARTICLE_RE = re.compile(
    r"(?i)^https?://(?:www\.|mobile\.)?(?:x|twitter)\.com/"
    r"(?:[A-Za-z0-9_]{1,15}|i)/article/\d+")
_TW_HANDLE_RE = re.compile(r"/([A-Za-z0-9_]{1,15})/status/\d+")


def _find_testid_all(root: Node, testid: str) -> list[Node]:
    return [d for d in root.iter_elements()
            if d.get("data-testid") == testid]


def _find_testid_first(root: Node, testid: str) -> Optional[Node]:
    for d in root.iter_elements():
        if d.get("data-testid") == testid:
            return d
    return None


def twitter_can(url: str, html: str) -> bool:
    """Status URLs only — Article URLs are claimed by the X-Article
    extractor registered before this one (`src/extractors/twitter.rs:46-52`)."""
    u = url or ""
    if _TW_ARTICLE_RE.match(u):
        return False
    return bool(_TW_STATUS_RE.match(u))


def _tweet_text(article: Node) -> str:
    t = _find_testid_first(article, "tweetText")
    if t is None:
        return ""
    return " ".join(t.text_content().replace("\n", " ")
                    .replace("\r", " ").split())


def _tweet_handle(article: Node) -> str:
    """Second anchor in the User-Name block is the `@handle`
    (`src/extractors/twitter.rs:94-110`)."""
    block = _find_testid_first(article, "User-Name")
    if block is None:
        return ""
    anchors = [d for d in block.iter_elements() if d.tag == "a"]
    if len(anchors) < 2:
        return ""
    return anchors[1].text_content().strip()


def _tweet_datetime(article: Node) -> Optional[str]:
    t = article.find_first("time")
    if t is None:
        return None
    dt = t.get("datetime")
    return dt.split("T")[0] if dt else None


def twitter_extract(html: str, url, collected, metadata):
    """Tweet thread → conversation (`src/extractors/twitter.rs:126-232`):
    every `article[data-testid=tweet]`, first-author posts stay depth 0
    (self-reply threads), other authors nest one level deeper per switch."""
    root = body_of(parse_html(html))
    articles = [d for d in root.iter_elements()
                if d.tag == "article" and d.get("data-testid") == "tweet"]
    messages = []
    first_handle = None
    depth = 0
    for article in articles:
        handle = _tweet_handle(article)
        text = _tweet_text(article)
        ts = _tweet_datetime(article)
        if first_handle is None:
            first_handle = handle
            depth = 0
        elif handle == first_handle:
            depth = 0
        else:
            depth += 1
        messages.append(ConversationMessage(
            author=handle or None, timestamp=ts,
            html="<p>" + _html.escape(text) + "</p>", depth=depth))
    if not messages:
        return None  # no tweet article in DOM -> generic fallback

    main_handle = messages[0].author
    if not main_handle:
        m = _TW_HANDLE_RE.search(url or "")
        main_handle = f"@{m.group(1)}" if m else "Unknown"
    overrides = {
        "title": f"{main_handle} on X",
        "author": main_handle,
        "site": "X (Twitter)",
        "description": messages[0].html[:140],
    }
    if messages[0].timestamp:
        overrides["published"] = messages[0].timestamp
    return render_conversation(messages), overrides


# ------------------------------------------------------------- x-oembed

_X_OEMBED_RE = re.compile(
    r"(?i)^https?://(?:www\.|mobile\.)?(?:x|twitter)\.com/"
    r"[A-Za-z0-9_]{1,15}/(?:status|article)/\d+")


def x_oembed_can(url: str, html: str) -> bool:
    """Async-only FxTwitter/publish.twitter.com oEmbed fallback
    (`src/extractors/x_oembed.rs`). The URL gate mirrors the reference."""
    return bool(_X_OEMBED_RE.match(url or ""))


def x_oembed_extract(html: str, url, collected, metadata):
    """Sync path has no fetcher — always falls through to generic
    extraction, exactly like the reference's
    `ExtractError::Failed("x-oembed", "no fetcher available")`
    (`src/extractors/x_oembed.rs:66-81`). A batch Spark pipeline never
    performs per-document network fetches, so this stays a declared stub."""
    return None


# ----------------------------------------------------------------- grok

def grok_can(url: str, html: str) -> bool:
    """grok.com, or x.com//twitter.com under /i/grok
    (`src/extractors/grok.rs:34-50`)."""
    h = _host(url or "")
    if h == "grok.com":
        return True
    if h in ("x.com", "twitter.com"):
        try:
            return urlsplit(url).path.startswith("/i/grok")
        except ValueError:
            return False
    return False


def grok_extract(html: str, url, collected, metadata):
    """Utility-class soup DOM (`src/extractors/grok.rs:79-135`):
    `.relative.group.flex.flex-col.justify-center.w-full` containers,
    `items-end` = user / `items-start` = Grok, body in `.message-bubble`."""
    root = body_of(parse_html(html))
    need = {"relative", "group", "flex", "flex-col", "justify-center",
            "w-full"}
    messages = []
    for node in root.iter_elements():
        toks = set(node.classes())
        if not need <= toks:
            continue
        is_user = "items-end" in toks
        is_grok = "items-start" in toks
        if not (is_user or is_grok):
            continue
        bubble = _find_with_class(node, ("message-bubble",))
        if bubble is None:
            continue
        if is_user:
            text = bubble.text_content().strip()
            if not text:
                continue
            messages.append(ConversationMessage(
                author="You", html=_html.escape(text)))
        else:
            h = inner_html(bubble).strip()
            if not h:
                continue
            messages.append(ConversationMessage(author="Grok", html=h))
    if not messages:
        return None
    overrides = {"site": "Grok"}
    title = title_from_first_user_message(messages)
    if title:
        overrides["title"] = title
    return render_conversation(messages), overrides


# ------------------------------------------------------------- linkedin

_LINKEDIN_URL_RE = re.compile(r"(?i)^https?://(?:[a-z]+\.)?linkedin\.com/")


def _visible_text(node: Node) -> str:
    """Text content minus `.visually-hidden` screen-reader subtrees
    (`src/extractors/linkedin.rs:38-58`)."""
    parts = []

    def walk(n: Node) -> None:
        for c in n.children:
            if c.type == ELEMENT:
                if "visually-hidden" in c.classes():
                    continue
                walk(c)
            elif c.type == 3:  # TEXT
                parts.append(c.text)

    walk(node)
    return " ".join("".join(parts).split())


def linkedin_can(url: str, html: str) -> bool:
    return bool(_LINKEDIN_URL_RE.match(url or ""))


def linkedin_extract(html: str, url, collected, metadata):
    """`src/extractors/linkedin.rs:76-152`: post article
    `[role=article].feed-shared-update-v2`, author from
    `.update-components-actor__title`, commentary from the first
    `.update-components-text` outside a quoted-repost wrapper."""
    root = body_of(parse_html(html))
    article = None
    for d in root.iter_elements():
        if d.get("role") == "article" \
                and "feed-shared-update-v2" in d.classes():
            article = d
            break
    if article is None:
        return None
    author = ""
    for d in article.iter_elements():
        if "update-components-actor__title" in d.classes():
            author = _visible_text(d)
            break
    body_text = ""
    for d in article.iter_elements():
        if "update-components-text" not in d.classes():
            continue
        in_quote = any(
            a.type == ELEMENT and
            "feed-shared-update-v2__update-content-wrapper"
            in (a.get("class") or "")
            for a in d.ancestors())
        if in_quote:
            continue
        body_text = _visible_text(d)
        break
    content = ['<article class="linkedin-post">']
    if body_text:
        content.append("<p>" + _html.escape(body_text) + "</p>")
    content.append("</article>")
    title = f"{author} on LinkedIn" if author else "LinkedIn post"
    overrides = {"site": "LinkedIn", "title": title,
                 "description": body_text[:140]}
    if author:
        overrides["author"] = author
    return "".join(content), overrides


# -------------------------------------------------------------- threads

_THREADS_URL_RE = re.compile(
    r"(?i)^https?://(?:www\.)?threads\.(?:net|com)/")
_THREADS_HREF_RE = re.compile(r"/@([^/]+)")


def threads_can(url: str, html: str) -> bool:
    return bool(_THREADS_URL_RE.match(url or ""))


def _threads_username(container: Node) -> str:
    links = [d for d in container.iter_elements()
             if d.tag == "a" and (d.get("href") or "").startswith("/@")]
    for link in links:
        text = link.text_content().strip()
        if text and "profile picture" not in text:
            return text
    for link in links:
        m = _THREADS_HREF_RE.search(link.get("href") or "")
        if m:
            return m.group(1)
    return ""


def threads_extract(html: str, url, collected, metadata):
    """`src/extractors/threads.rs:88-205`: pagelet or region-fallback
    probe, then every non-nested `[data-pressable-container]` is a post;
    first `/@user` link = author, first `span[dir=auto]` = body."""
    root = body_of(parse_html(html))
    has_pagelet = any((d.get("data-pagelet") or "")
                      .startswith("threads_post_page_")
                      for d in root.iter_elements())
    has_region = False
    for d in root.iter_elements():
        if d.get("role") == "region":
            has_region = any(
                x.tag == "a" and (x.get("href") or "").startswith("/@")
                for x in d.iter_elements())
            if has_region:
                break
    if not has_pagelet and not has_region:
        return None

    messages = []
    first_author = None
    depth = 0
    for container in root.iter_elements():
        if container.get("data-pressable-container") is None:
            continue
        if any(a.type == ELEMENT
               and a.get("data-pressable-container") is not None
               for a in container.ancestors()):
            continue  # quoted post nested in another pressable
        username = _threads_username(container)
        if not username:
            continue
        if first_author is None:
            first_author = username
            depth = 0
        elif username == first_author:
            depth = 0
        else:
            depth += 1
        ts = None
        t = container.find_first("time")
        if t is not None:
            ts = t.get("datetime")
        body_text = ""
        for d in container.iter_elements():
            if d.tag == "span" and d.get("dir") == "auto":
                body_text = d.text_content().strip()
                break
        messages.append(ConversationMessage(
            author=username, timestamp=ts,
            html="<p>" + _html.escape(body_text) + "</p>", depth=depth))
    if not messages:
        return None
    main = messages[0].author or ""
    overrides = {
        "site": "Threads",
        "author": f"@{main}",
        "title": f"@{main} on Threads",
        "description": messages[0].html[:140],
    }
    if messages[0].timestamp:
        overrides["published"] = messages[0].timestamp
    return render_conversation(messages), overrides


# -------------------------------------------------------------- bluesky

_BSKY_URL_RE = re.compile(r"(?i)^https?://(?:www\.)?bsky\.app/")


def bluesky_can(url: str, html: str) -> bool:
    return bool(_BSKY_URL_RE.match(url or ""))


def _bsky_has_top_connector(item: Node) -> bool:
    """Reply connector-line heuristic (`src/extractors/bluesky.rs:52-69`):
    a 2px-wide colored div inside the item's first child."""
    first = next((c for c in item.children if c.type == ELEMENT), None)
    if first is None:
        return False
    for d in first.iter_elements():
        style = d.get("style") or ""
        if d.tag == "div" and "width: 2px" in style \
                and "background-color" in style:
            return True
    return False


def bluesky_extract(html: str, url, collected, metadata):
    """`src/extractors/bluesky.rs:86-183`: `postThreadScreen` container,
    `postThreadItem-by-<handle>` items; same-author posts depth 0,
    connector-lined replies nest one deeper."""
    root = body_of(parse_html(html))
    if not any(d.get("data-testid") == "postThreadScreen"
               for d in root.iter_elements()):
        return None
    messages = []
    first_author = None
    depth = 0
    for item in root.iter_elements():
        testid = item.get("data-testid") or ""
        if not testid.startswith("postThreadItem-by-"):
            continue
        handle = testid[len("postThreadItem-by-"):]
        if not handle:
            continue
        if first_author is None:
            first_author = handle
            depth = 0
        elif handle == first_author:
            depth = 0
        elif _bsky_has_top_connector(item):
            depth += 1
        else:
            depth = 0
        body_text = ""
        for d in item.iter_elements():
            if d.tag == "div" and d.get("data-word-wrap") == "1":
                body_text = d.text_content().strip()
                break
        messages.append(ConversationMessage(
            author=handle,
            html="<p>" + _html.escape(body_text) + "</p>", depth=depth))
    if not messages:
        return None
    main = messages[0].author or ""
    overrides = {
        "site": "Bluesky",
        "author": f"@{main}",
        "title": f"@{main} on Bluesky",
        "description": messages[0].html[:140],
    }
    return render_conversation(messages), overrides


# ------------------------------------------------------------- discourse

_DISCOURSE_TOPIC_RE = re.compile(r"/t/[^/]+/\d+")


def discourse_can(url: str, html: str) -> bool:
    """URL hint only — `/t/<slug>/<id>` paths; the generator meta probe in
    extract() is authoritative (`src/extractors/discourse.rs:91-106`)."""
    return bool(_DISCOURSE_TOPIC_RE.search(url or ""))


def discourse_extract(html: str, url, collected, metadata):
    """`src/extractors/discourse.rs:108-185`: generator meta starting
    "Discourse", `.topic-post` posts with `.names a[data-user-card]`
    author and `.cooked` body, rendered flat (depth 0)."""
    doc = parse_html(html)
    root = body_of(doc)
    # generator meta lives in <head> — probe the whole document
    is_discourse = False
    for d in doc.iter_elements():
        if d.tag == "meta" and d.get("name") == "generator" \
                and (d.get("content") or "").startswith("Discourse"):
            is_discourse = True
            break
    if not is_discourse:
        return None
    posts = [d for d in root.iter_elements() if "topic-post" in d.classes()]
    if not posts:
        return None

    title = ""
    for d in root.iter_elements():
        if "fancy-title" in d.classes():
            title = d.text_content().strip()
            break
    if not title:
        for d in root.iter_elements():
            if d.tag == "h1" and d.get("data-topic-id") is not None:
                title = d.text_content().strip()
                break
    site = ""
    if collected is not None:
        for t in collected.meta_tags:
            if t.get("property") == "og:site_name":
                site = t.get("content") or ""
                break

    messages = []
    for post in posts:
        author = None
        for d in post.iter_elements():
            if d.tag == "a" and d.get("data-user-card") is not None \
                    and any("names" in (a.get("class") or "")
                            for a in d.ancestors() if a.type == ELEMENT):
                author = d.get("data-user-card") or \
                    d.text_content().strip() or None
                break
        body = ""
        for d in post.iter_elements():
            if "cooked" in d.classes():
                body = d.text_content().strip()
                break
        messages.append(ConversationMessage(
            author=author, html="<p>" + _html.escape(body) + "</p>"))
    overrides = {"site": site or "Discourse"}
    if title:
        overrides["title"] = title
    if messages and messages[0].author:
        overrides["author"] = messages[0].author
    overrides["description"] = "".join(
        c for c in messages[0].html if c not in "<>")[:140] if messages else ""
    return render_conversation(messages), overrides
