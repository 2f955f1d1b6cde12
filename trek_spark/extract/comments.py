"""Comment-thread site extractors: Reddit, Hacker News, Mastodon.

Mirrors the conversation extractors of the reference registry
(`src/extractors/{reddit,hackernews,mastodon}.rs`) with the golden-corpus
rendering convention: each comment is a blockquote whose first line is
``**author** · [date](permalink) [· N points]``, nested replies live inside
their parent's blockquote, and the thread is introduced by ``<hr>`` +
``## Comments``.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urljoin, urlsplit

from ..dom.node import ELEMENT, Node, inner_html
from ..dom.parser import body_of, parse_html


def _host(url: str) -> str:
    try:
        h = urlsplit(url).hostname or ""
    except ValueError:
        return ""
    return h[4:] if h.startswith("www.") else h


def _find_class(root: Node, cls: str, tag: Optional[str] = None) -> Optional[Node]:
    for d in root.iter_elements():
        if (tag is None or d.tag == tag) and cls in d.classes():
            return d
    return None


def _find_all_class(root: Node, cls: str, tag: Optional[str] = None) -> list[Node]:
    return [d for d in root.iter_elements()
            if (tag is None or d.tag == tag) and cls in d.classes()]


def _comment_header(author: str, date: str, permalink: str,
                    points: Optional[str]) -> Node:
    p = Node.element("p")
    strong = Node.element("strong")
    strong.append(Node.text_node(author))
    p.append(strong)
    if date or permalink:
        p.append(Node.text_node(" · "))
        a = Node.element("a", {"href": permalink})
        a.append(Node.text_node(date))
        p.append(a)
    if points:
        p.append(Node.text_node(f" · {points}"))
    return p


def _build_comment_tree(comments: list[dict]) -> list[Node]:
    """comments: [{depth, author, date, permalink, points, body_html}] in
    document order → list of top-level <blockquote> nodes with nested
    replies inside their parents."""
    roots: list[Node] = []
    stack: list[tuple[int, Node]] = []  # (depth, blockquote)
    for c in comments:
        bq = Node.element("blockquote")
        bq.append(_comment_header(c["author"], c["date"], c["permalink"],
                                  c.get("points")))
        body = body_of(parse_html(c["body_html"]))
        for child in list(body.children):
            bq.append(child)
        while stack and stack[-1][0] >= c["depth"]:
            stack.pop()
        if stack:
            stack[-1][1].append(bq)
        else:
            roots.append(bq)
        stack.append((c["depth"], bq))
    return roots


def _thread_html(lead_html: str, comments: list[dict]) -> str:
    art = Node.element("article")
    lead_body = body_of(parse_html(lead_html))
    for child in list(lead_body.children):
        art.append(child)
    if comments:
        art.append(Node.element("hr"))
        h2 = Node.element("h2")
        h2.append(Node.text_node("Comments"))
        art.append(h2)
        for bq in _build_comment_tree(comments):
            art.append(bq)
    return inner_html(art)


# ------------------------------------------------------------------ reddit

def reddit_can(url: str, html: str) -> bool:
    h = _host(url)
    return (h.endswith("reddit.com") and
            ("thing" in html or "shreddit-post" in html))


def reddit_extract(html: str, url, collected, metadata):
    body = body_of(parse_html(html))
    post = None
    for d in body.iter_elements():
        cls = d.classes()
        if "thing" in cls and "link" in cls:
            post = d
            break
    if post is None:
        return None

    title_el = _find_class(post, "title", "a") or body.find_first("h1")
    title = title_el.text_content().strip() if title_el is not None else ""
    author = post.get("data-author") or ""
    sub = post.get("data-subreddit") or ""
    md_el = _find_class(post, "md")
    post_body = inner_html(md_el) if md_el is not None else ""

    comments = []
    first_time = None
    for c in body.iter_elements():
        cls = c.classes()
        if "thing" not in cls or "comment" not in cls:
            continue
        depth = 0
        cur = c.parent
        while cur is not None:
            if cur.type == ELEMENT and "child" in cur.classes():
                depth += 1
            cur = cur.parent
        cauthor = c.get("data-author") or ""
        permalink = c.get("data-permalink") or ""
        if permalink.startswith("/"):
            permalink = "https://reddit.com" + permalink
        time_el = None
        score_el = None
        md = None
        for d in c.iter_elements():
            dcls = d.classes()
            if d.tag == "time" and time_el is None:
                time_el = d
            elif "score" in dcls and score_el is None:
                score_el = d
            elif "md" in dcls and md is None:
                md = d
        dt = (time_el.get("datetime") or "") if time_el is not None else ""
        if dt and first_time is None:
            first_time = dt
        points = score_el.text_content().strip() if score_el is not None else None
        comments.append({
            "depth": depth, "author": cauthor, "date": dt[:10],
            "permalink": permalink, "points": points,
            "body_html": inner_html(md) if md is not None else "",
        })

    content = _thread_html(post_body, comments)
    overrides = {"site": f"r/{sub}" if sub else "Reddit"}
    if title:
        overrides["title"] = title
    if author:
        overrides["author"] = author
    if first_time:
        overrides["published"] = first_time
    return content, overrides


# ------------------------------------------------------------ hacker news

def hn_can(url: str, html: str) -> bool:
    return _host(url) == "news.ycombinator.com"


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _hn_listing(body: Node, collected):
    """Front-page/`/newest` listing: `tr.athing` story rows + subtext rows
    → an ordered list (ref `src/extractors/hackernews.rs:98-211`)."""
    items = []
    for row in _find_all_class(body, "athing", "tr"):
        titleline = _find_class(row, "titleline")
        if titleline is None:
            continue
        link = titleline.find_first("a")
        if link is None:
            continue
        title = link.text_content().strip()
        story_url = link.get("href") or ""
        sitestr = _find_class(row, "sitestr")
        site_str = sitestr.text_content().strip() if sitestr is not None \
            else ""
        rid = row.get("id") or ""
        sub = row.next_element_sibling()
        score = author = comments = ""
        if sub is not None:
            sc = _find_class(sub, "score")
            if sc is not None:
                score = sc.text_content().strip()
            hu = _find_class(sub, "hnuser", "a")
            if hu is not None:
                author = hu.text_content().strip()
            td = _find_class(sub, "subtext", "td") or sub
            anchors = [a for a in td.iter_elements() if a.tag == "a"]
            if anchors:
                last = anchors[-1].text_content().replace(" ", " ")
                if "comment" in last:
                    comments = last.strip()
        li = [f'<a href="{_esc(story_url)}">{_esc(title)}</a>']
        if site_str:
            li.append(f" <small>({_esc(site_str)})</small>")
        meta = []
        if score:
            meta.append(_esc(score))
        if author:
            meta.append("by " + _esc(author))
        if comments and rid:
            curl = f"https://news.ycombinator.com/item?id={rid}"
            meta.append(f'<a href="{_esc(curl)}">{_esc(comments)}</a>')
        if meta:
            li.append("<br><small>" + " · ".join(meta) + "</small>")
        items.append("<li>" + "".join(li) + "</li>")
    html = "<ol>" + "".join(items) + "</ol>"
    more = _find_class(body, "morelink", "a")
    if more is not None:
        murl = urljoin("https://news.ycombinator.com/", more.get("href") or "")
        mtext = more.text_content().strip() or "More"
        html += f'<p><a href="{_esc(murl)}">{_esc(mtext)}</a></p>'
    title = (getattr(collected, "title", None) or "") \
        .replace(" | Hacker News", "").strip() or "Hacker News"
    return html, {"site": "Hacker News", "title": title}


def _hn_comment_page(body: Node):
    """Comment-permalink page (fatitem holds a comment, no titleline):
    title "Comment by USER: text…", body = header + comment paragraphs."""
    fat = _find_class(body, "fatitem", "table")
    if fat is None:
        return None
    commtext = _find_class(fat, "commtext")
    if commtext is None:
        return None
    hnuser = _find_class(fat, "hnuser", "a")
    user = hnuser.text_content().strip() if hnuser is not None else ""
    age = _find_class(fat, "age")
    dt = (age.get("title") or "")[:10] if age is not None else ""
    text = commtext.text_content().strip()
    first = " ".join(text.split())
    title = f"Comment by {user}: {first}"
    if len(title) > 80:
        title = title[:77].rstrip() + "..."
    header = f"<p><strong>{user}</strong> · {dt}</p>" if user else ""
    content = f"<article>{header}{inner_html(commtext)}</article>"
    overrides = {"site": "Hacker News", "title": title}
    if user:
        overrides["author"] = user
    if dt:
        overrides["published"] = dt
    return content, overrides


def hn_extract(html: str, url, collected, metadata):
    body = body_of(parse_html(html))
    if _find_class(body, "fatitem", "table") is None \
            and len(_find_all_class(body, "athing", "tr")) > 1:
        return _hn_listing(body, collected)
    titleline = _find_class(body, "titleline")
    if titleline is None:
        return _hn_comment_page(body)
    link = titleline.find_first("a")
    title = link.text_content().strip() if link is not None else ""
    story_url = (link.get("href") or "") if link is not None else ""

    subtext = _find_class(body, "subtext")
    author = ""
    published = ""
    if subtext is not None:
        hnuser = _find_class(subtext, "hnuser", "a")
        if hnuser is not None:
            author = hnuser.text_content().strip()
        age = _find_class(subtext, "age")
        if age is not None:
            published = (age.get("title") or "")[:10]

    comments = []
    for tr in _find_all_class(body, "comtr", "tr"):
        ind = _find_class(tr, "ind", "td")
        depth = 0
        if ind is not None:
            img = ind.find_first("img")
            if img is not None:
                try:
                    depth = int(img.get("width") or "0") // 40
                except ValueError:
                    depth = 0
        hnuser = _find_class(tr, "hnuser", "a")
        cauthor = hnuser.text_content().strip() if hnuser is not None else ""
        age = _find_class(tr, "age")
        dt, permalink = "", ""
        if age is not None:
            dt = (age.get("title") or "")[:10]
            a = age.find_first("a")
            if a is not None:
                permalink = urljoin("https://news.ycombinator.com/",
                                    a.get("href") or "")
        score = _find_class(tr, "score")
        points = score.text_content().strip() if score is not None else None
        commtext = _find_class(tr, "commtext")
        comments.append({
            "depth": depth, "author": cauthor, "date": dt,
            "permalink": permalink, "points": points,
            "body_html": inner_html(commtext) if commtext is not None else "",
        })

    lead = ""
    if story_url:
        lead = (f'<p><a href="{story_url}">{story_url}</a></p>')
    content = _thread_html(lead, comments)
    overrides = {"site": "Hacker News"}
    if title:
        overrides["title"] = title
    if author:
        overrides["author"] = author
    if published:
        overrides["published"] = published
    return content, overrides


# -------------------------------------------------------------- mastodon

def _clean_status_content(node: Node) -> str:
    """status__content__text html with mastodon's `invisible` link spans
    dropped and `ellipsis` spans kept as-is."""
    clone = body_of(parse_html(inner_html(node)))
    for d in clone.descendants_snapshot():
        if d.tag == "span" and "invisible" in d.classes():
            d.detach()
    return inner_html(clone)


def mastodon_can(url: str, html: str) -> bool:
    return "detailed-status" in html and "status__content" in html \
        and ("mastodon" in html.lower() or "/@" in url)


def mastodon_extract(html: str, url, collected, metadata):
    body = body_of(parse_html(html))
    detailed = _find_class(body, "detailed-status")
    if detailed is None:
        return None

    op_name_el = _find_class(detailed, "display-name__html")
    op_name = op_name_el.text_content().strip() if op_name_el is not None else ""

    parts = []
    content_el = _find_class(detailed, "status__content__text")
    if content_el is not None:
        parts.append(_clean_status_content(content_el))
    for thumb in _find_all_class(detailed, "media-gallery__item-thumbnail", "a"):
        img = thumb.find_first("img")
        alt = (img.get("alt") or "") if img is not None else ""
        src = thumb.get("href") or ""
        if src:
            parts.append(f'<p><img src="{src}" alt="{alt}"></p>')

    comments = []
    site = ""
    for t in collected.meta_tags:
        if t.get("property") == "og:site_name":
            site = t["content"]
            break

    for wrapper in _find_all_class(body, "status__wrapper"):
        if _find_class(wrapper, "detailed-status") is not None:
            continue
        name_el = _find_class(wrapper, "display-name__html")
        acct_el = _find_class(wrapper, "display-name__account")
        name = name_el.text_content().strip() if name_el is not None else ""
        acct = acct_el.text_content().strip() if acct_el is not None else ""
        content = _find_class(wrapper, "status__content__text")
        if content is None:
            continue
        chtml = _clean_status_content(content)
        for card in _find_all_class(wrapper, "status-card", "a"):
            curl = card.get("href") or ""
            ctitle_el = _find_class(card, "status-card__title")
            ctitle = ctitle_el.text_content().strip() if ctitle_el is not None else ""
            cimg = card.find_first("img")
            csrc = (cimg.get("src") or "") if cimg is not None else ""
            if csrc:
                chtml += (f'<p><a href="{curl}"><img src="{csrc}" '
                          f'alt="{ctitle}"></a></p>')
            if ctitle:
                chtml += f'<p><a href="{curl}">{ctitle}</a></p>'
            cdesc_el = _find_class(card, "status-card__description")
            if cdesc_el is not None:
                cdesc = cdesc_el.text_content().strip()
                if cdesc:
                    chtml += f'<p>{cdesc}</p>'

        rel = _find_class(wrapper, "status__relative-time", "a")
        permalink = ""
        dt = ""
        if rel is not None:
            permalink = urljoin(url or "", rel.get("href") or "")
            time_el = rel.find_first("time")
            if time_el is not None:
                dt = (time_el.get("datetime") or "")[:10]
        if name and name == op_name and not comments:
            # same-author thread continuation BEFORE any replies → body
            parts.append("<hr>")
            parts.append(chtml)
            continue
        # an OP status appearing after other replies is a reply in the
        # conversation — nest it under the preceding comment
        depth = 0
        if name == op_name and comments:
            depth = comments[-1]["depth"] + 1
        comments.append({
            "depth": depth, "author": f"{name} {acct}".strip(), "date": dt,
            "permalink": permalink, "points": None, "body_html": chtml,
        })

    content_html = _thread_html("".join(parts), comments)

    published = ""
    for t in collected.meta_tags:
        if t.get("property") == "og:published_time":
            published = t["content"][:10]
            break
    overrides = {}
    if op_name:
        overrides["author"] = op_name
        if site:
            overrides["title"] = f"Post by {op_name} on {site}"
    if published:
        overrides["published"] = published
    return content_html, overrides


def register_comment_extractors() -> None:
    from .extractors import register
    register("reddit", reddit_can, reddit_extract)
    register("hackernews", hn_can, hn_extract)
    register("mastodon", mastodon_can, mastodon_extract)
