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


# --------------------------------------------------------------- x-article

_X_ARTICLE_URL_RE = re.compile(
    r"(?i)^https?://(?:www\.|mobile\.)?(?:x|twitter)\.com/"
    r"(?:[A-Za-z0-9_]{1,15}|i)/article/\d+")
_NAME_PARAM_RE = re.compile(r"([?&]name=)[A-Za-z0-9_]+")
_SPACE_SENTINEL = "\x02XSPACE\x02"


def _upgrade_media_name(src: str) -> str:
    """`?format=jpg&name=medium` → `name=large` (full-quality media URL,
    matching the golden corpus)."""
    return _NAME_PARAM_RE.sub(r"\1large", src)


def _style_of(node: Node) -> str:
    return (node.get("style") or "").lower()


def _inline_clean(node: Node) -> None:
    """Convert DraftJS style spans into semantic strong/em in place."""
    for d in node.descendants_snapshot():
        if d.type != 1 or d.tag != "span":
            continue
        style = _style_of(d)
        if "font-weight: bold" in style or "font-weight: 700" in style:
            d.tag = "strong"
            d.del_attr("style")
        elif "font-style: italic" in style:
            d.tag = "em"
            d.del_attr("style")


def _find_testid(root: Node, value: str) -> Optional[Node]:
    for d in root.iter_elements():
        if d.get("data-testid") == value:
            return d
    return None


def x_article_can(url: str, html: str) -> bool:
    if _X_ARTICLE_URL_RE.match(url or ""):
        return True
    # browser-rendered article DOM on any URL (Defuddle probes the DOM)
    return "twitterArticleRichTextView" in html


def x_article_extract(html: str, url, collected, metadata):
    """Long-form X/Twitter articles (ref `src/extractors/x_article.rs`).

    Rebuilds the DraftJS rich-text container as clean semantic HTML:
    `longform-header-*` → h1/h2/h3, `longform-unstyled` → p, style spans →
    strong/em, tweetPhoto media upgraded to `name=large`. A cover photo
    rendered before the container is prepended.
    """
    doc = parse_html(html)
    root = body_of(doc)
    container = _find_testid(root, "twitterArticleRichTextView")
    if container is None:
        return None

    blocks: list[str] = []

    # cover photo: first pbs.twimg media image rendered before the article
    container_seen = set()
    for d in container.iter_elements():
        container_seen.add(id(d))
    for d in root.iter_elements():
        if id(d) in container_seen:
            break
        if d.tag == "img" and "pbs.twimg.com/media" in (d.get("src") or ""):
            src = _upgrade_media_name(d.get("src"))
            alt = d.get("alt") or ""
            blocks.append(f'<p><img src="{_esc_attr(src)}" '
                          f'alt="{_esc_attr(alt)}" /></p>')
            break

    title_text = ""
    author = ""

    def walk(node: Node) -> None:
        nonlocal title_text, author
        for child in node.element_children():
            cls = child.classes()
            testid = child.get("data-testid") or ""
            if testid == "twitter-article-title":
                title_text = " ".join(child.text_content().split())
                blocks.append(f"<p>{title_text}</p>")
                continue
            if child.get("itemprop") == "author":
                name = handle = ""
                for m in child.iter_elements():
                    if m.tag == "meta":
                        if m.get("itemprop") == "name":
                            name = m.get("content") or ""
                        elif m.get("itemprop") == "additionalName":
                            handle = m.get("content") or ""
                if name and handle:
                    author = f"{name} (@{handle})"
                elif name:
                    author = name
                elif handle:
                    author = f"@{handle}"
                blocks.append(f"<p>{_SPACE_SENTINEL}</p>")
                continue
            if testid == "tweetPhoto":
                img = child.find_first("img")
                if img is not None:
                    src = _upgrade_media_name(img.get("src") or "")
                    alt = img.get("alt") or ""
                    blocks.append(f'<p><img src="{_esc_attr(src)}" '
                                  f'alt="{_esc_attr(alt)}" /></p>')
                continue
            header_level = None
            for c in cls:
                if c == "longform-header-one":
                    header_level = 1
                elif c == "longform-header-two":
                    header_level = 2
                elif c == "longform-header-three":
                    header_level = 3
            if header_level:
                txt = " ".join(child.text_content().split())
                blocks.append(f"<h{header_level}>{txt}</h{header_level}>")
                continue
            if "longform-unstyled" in cls:
                _inline_clean(child)
                blocks.append("<p>" + "".join(
                    serialize(c) for c in child.children) + "</p>")
                continue
            if child.tag in ("ol", "ul", "pre", "table", "blockquote"):
                _inline_clean(child)
                # DraftJS wraps each li's text in block divs — flatten to
                # inline content so items render on one line
                for li in [n for n in child.iter_elements()
                           if n.tag == "li"]:
                    divs = [d for d in li.iter_elements() if d.tag == "div"]
                    for d in reversed(divs):
                        d.unwrap()
                blocks.append(serialize(child))
                continue
            walk(child)

    walk(container)

    content_html = "".join(blocks)
    if not title_text:
        # real x.com pages render the title in the page chrome, outside
        # the rich-text container
        t = _find_testid(root, "twitter-article-title")
        if t is not None:
            title_text = " ".join(t.text_content().split())
    overrides = {
        "site": "X (Twitter)",
        "__md_fixes__": [(_SPACE_SENTINEL, " ")],
    }
    if title_text:
        overrides["title"] = title_text
    if author:
        overrides["author"] = author
    else:
        # page chrome: User-Name card above the article
        user = _find_testid(root, "User-Name")
        if user is not None:
            first = " ".join(user.text_content().split()).split("@")[0]
            if first.strip():
                overrides["author"] = first.strip()
    # first <time datetime=...> anywhere on the page
    for d in root.iter_elements():
        if d.tag == "time" and d.get("datetime"):
            overrides["published"] = d.get("datetime")
            break
    return content_html, overrides


def register_site_extractors() -> None:
    from .extractors import register
    register("x-article", x_article_can, x_article_extract)
    register("substack", substack_can, substack_extract)
