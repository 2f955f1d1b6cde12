"""Phase 0 — single streaming pass collecting head signals.

Equivalent of the reference's lol_html streaming collection
(``src/lib.rs:390-523``): meta tags, canonical link, favicon, <title>,
``fc:frame`` mini-app embed, and ``application/ld+json`` schema.org blocks
(with ``@graph`` flattening). One pass over the raw HTML with a tag-only
stdlib parser — no tree is built for metadata, matching the reference's
"never load full DOM for the head" design (``docs/architecture.md:171-176``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Optional


@dataclass
class CollectedData:
    meta_tags: list = field(default_factory=list)  # dicts {name, property, content}
    schema_org_data: list = field(default_factory=list)  # parsed JSON values
    title: Optional[str] = None
    favicon: Optional[str] = None
    mini_app_embed: Optional[str] = None
    canonical: Optional[str] = None


class _HeadCollector(HTMLParser):
    """Records only meta/link/title/ld+json; never builds a tree."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.data = CollectedData()
        self._in_title = False
        self._title_buf: list[str] = []
        self._in_ldjson = False
        self._script_buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "meta":
            a = dict(attrs)
            content = a.get("content")
            if content is None:
                return
            name = a.get("name")
            prop = a.get("property")
            if name is None and prop is None:
                return
            if name == "fc:frame":
                self.data.mini_app_embed = content
            self.data.meta_tags.append(
                {"name": name, "property": prop, "content": content}
            )
        elif tag == "link":
            a = dict(attrs)
            rel = a.get("rel") or ""
            href = a.get("href")
            if not href:
                return
            rel_tokens = rel.split()
            if rel == "canonical":
                if self.data.canonical is None:
                    self.data.canonical = href
            if "icon" in rel_tokens or "shortcut" in rel_tokens:
                # prefer rel="icon" exactly over shortcut variants
                if self.data.favicon is None or rel == "icon":
                    self.data.favicon = href
        elif tag == "title":
            self._in_title = True
            self._title_buf = []
        elif tag == "script":
            a = dict(attrs)
            if (a.get("type") or "").strip().lower() == "application/ld+json":
                self._in_ldjson = True
                self._script_buf = []

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            self.data.title = "".join(self._title_buf).strip()
        elif tag == "script" and self._in_ldjson:
            self._in_ldjson = False
            raw = "".join(self._script_buf)
            try:
                val = json.loads(raw)
            except (ValueError, RecursionError):
                return
            graph = val.get("@graph") if isinstance(val, dict) else None
            if isinstance(graph, list):
                self.data.schema_org_data.extend(graph)
            else:
                self.data.schema_org_data.append(val)

    def handle_data(self, data):
        if self._in_title:
            self._title_buf.append(data)
        elif self._in_ldjson:
            self._script_buf.append(data)


def collect_initial_data(html: str) -> CollectedData:
    c = _HeadCollector()
    try:
        c.feed(html)
        c.close()
    except Exception:
        pass
    return c.data


def collect_from_dom(doc) -> CollectedData:
    """Tree-walk equivalent of the streaming collector, for callers that
    already hold the parsed document (the pipeline's single-parse path).
    Verified byte-identical to ``collect_initial_data`` across the whole
    golden corpus — both ride the same stdlib tokenizer, so the same meta/
    link/title/ld+json elements exist in both views. Semantics preserved:
    LAST <title> wins, FIRST canonical wins, rel="icon" beats shortcut
    variants, @graph flattens."""
    import json as _json
    d = CollectedData()
    for n in doc.iter_elements():
        tag = n.tag
        if tag == "meta":
            a = n.attrs or {}
            content = a.get("content")
            if content is None:
                continue
            name = a.get("name")
            prop = a.get("property")
            if name is None and prop is None:
                continue
            if name == "fc:frame":
                d.mini_app_embed = content
            d.meta_tags.append(
                {"name": name, "property": prop, "content": content})
        elif tag == "link":
            a = n.attrs or {}
            rel = a.get("rel") or ""
            href = a.get("href")
            if not href:
                continue
            rel_tokens = rel.split()
            if rel == "canonical" and d.canonical is None:
                d.canonical = href
            if "icon" in rel_tokens or "shortcut" in rel_tokens:
                if d.favicon is None or rel == "icon":
                    d.favicon = href
        elif tag == "title":
            d.title = n.text_content().strip()
        elif tag == "script":
            if (n.get("type") or "").strip().lower() == "application/ld+json":
                raw = n.text_content()
                try:
                    val = _json.loads(raw)
                except (ValueError, RecursionError):
                    continue
                graph = val.get("@graph") if isinstance(val, dict) else None
                if isinstance(graph, list):
                    d.schema_org_data.extend(graph)
                else:
                    d.schema_org_data.append(val)
    return d
