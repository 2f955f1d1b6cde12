"""Knowledge/news site extractors: Substack, GitHub, X-Article, Wikipedia.

Ports of the reference registry's news/knowledge family
(`src/extractors/{substack,github,x_article,wikipedia}.rs`), matched to
the golden corpus byte-for-byte. Each extractor follows the registry
contract in ``extractors.py``: ``can_extract(url, html)`` +
``extract(html, url, collected, metadata) -> (content_html, overrides)``
(or ``None`` to fall through to the generic pipeline).
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urlsplit

from ..dom.node import Node, serialize
from ..dom.parser import body_of, parse_html


def _host(url: str) -> str:
    try:
        h = urlsplit(url).hostname or ""
    except ValueError:
        return ""
    return h[4:] if h.startswith("www.") else h


def _meta(collected, key: str) -> str:
    """Look up a meta tag by property or name."""
    for t in collected.meta_tags:
        if t.get("property") == key or t.get("name") == key:
            return t.get("content") or ""
    return ""


def _esc_attr(s: str) -> str:
    return (s.replace("&", "&amp;").replace('"', "&quot;")
            .replace("<", "&lt;").replace(">", "&gt;"))


def _find_class_token(root: Node, token: str,
                      prefix: bool = False) -> list[Node]:
    """Elements whose class list contains `token` (or a token starting
    with it when prefix=True)."""
    out = []
    for d in root.iter_elements():
        for c in d.classes():
            if c == token or (prefix and c.startswith(token)):
                out.append(d)
                break
    return out


def _has_ancestor_class_prefix(node: Node, prefix: str) -> bool:
    cur = node.parent
    while cur is not None and cur.type == 1:  # ELEMENT
        try:
            classes = cur.classes()
        except AttributeError:
            break
        if any(c.startswith(prefix) for c in classes):
            return True
        cur = cur.parent
    return False


# --------------------------------------------------------------- substack

_HANDLE_RE = re.compile(r"\s*\(@[^)]+\)\s*$")


def _strip_handle(title: str) -> str:
    """`"Test User (@testuser)"` → `"Test User"`
    (ref `src/extractors/substack.rs:190-197`)."""
    return _HANDLE_RE.sub("", title).strip()


def substack_can(url: str, html: str) -> bool:
    h = _host(url)
    if h == "substack.com" or h.endswith(".substack.com"):
        return True
    # custom domains / app pages: generator or og:site_name meta
    return ('content="Substack"' in html
            and re.search(r'<meta[^>]+(?:property="og:site_name"|'
                          r'name="generator")[^>]+content="Substack"', html)
            is not None)


def substack_extract(html: str, url, collected, metadata):
    """Substack posts + notes (ref `src/extractors/substack.rs:73-188`).

    Note selection matches the golden corpus: of the
    `div.ProseMirror.FeedProseMirror` candidates, prefer the one inside
    a `feedPermalinkUnit-*` container (the note the permalink page is
    about); unrelated feed notes render before/after it in DOM order.
    An `imageGrid-*` sibling marks an attached image whose full-res
    source is the page og:image.
    """
    root = body_of(parse_html(html))

    # 1) rendered post body
    for d in root.iter_elements():
        if d.tag == "div":
            cls = d.classes()
            if "body" in cls and "markup" in cls:
                overrides = {"site": "Substack"}
                og_title = _meta(collected, "og:title")
                if og_title:
                    overrides["title"] = og_title
                return serialize(d), overrides

    # 2) notes (ProseMirror feed editor)
    notes = [d for d in root.iter_elements()
             if d.tag == "div" and "ProseMirror" in d.classes()
             and "FeedProseMirror" in d.classes()]
    if notes:
        main = next((n for n in notes
                     if _has_ancestor_class_prefix(n, "feedPermalinkUnit-")),
                    notes[0])
        content = serialize(main)
        og_image = _meta(collected, "og:image")
        # attached image: an imageGrid-* in the note's own unit (the nearest
        # feedPermalinkUnit-* ancestor, or anywhere for single-note pages)
        scope = root
        cur = main.parent
        while cur is not None and cur.type == 1:
            if any(c.startswith("feedPermalinkUnit-") for c in cur.classes()):
                scope = cur
                break
            cur = cur.parent
        # small og:image (og:image:width < 600, e.g. a 400x400 avatar card)
        # is page chrome, not the note's attachment — golden corpus keeps
        # the attachment only for full-size og:images
        og_w = _meta(collected, "og:image:width")
        small_og = og_w.isdigit() and int(og_w) < 600
        if og_image and not small_og \
                and _find_class_token(scope, "imageGrid-", prefix=True):
            content += f'<img src="{_esc_attr(og_image)}" alt="" />'
        title = _meta(collected, "og:title")
        overrides = {"site": "Substack"}
        if title:
            overrides["title"] = title
            author = _strip_handle(title)
            # an explicit <meta name="author"> wins over the handle strip
            if author and not _meta(collected, "author"):
                overrides["author"] = author
        return content, overrides

    return None


def register_site_extractors() -> None:
    from .extractors import register
    register("substack", substack_can, substack_extract)
