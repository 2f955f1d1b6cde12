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
    from .extractors import register
    register("chatgpt", chatgpt_can, chatgpt_extract)
    register("claude", claude_can, claude_extract)
    register("gemini", gemini_can, gemini_extract)


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
