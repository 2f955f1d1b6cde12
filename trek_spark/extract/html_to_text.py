"""HTML → readable plain text, preserving coarse structure.

Port of the reference's plain-text renderer (`src/html_to_text.rs:22-156`),
part of its public module surface (`src/lib.rs:29`). The reference streams
through lol_html handlers; the effective semantics are a document-order walk
emitting text chunks plus structural newlines, so a pre-order DOM walk over
our Node tree is exactly equivalent:

* ``<script>/<style>/<noscript>`` subtrees are skipped
  (`src/html_to_text.rs:8-18`).
* ``<br>`` → newline (`:37-42`).
* ``<p>/<div>/<article>/<section>/<blockquote>`` → newline before (when the
  buffer doesn't already end with one) and a newline after the subtree
  (`:44-55`).
* headings → newline before, TWO newlines after (`:57-66`).
* ``<li>`` → newline before + ``"• "`` marker, newline after (`:68-78`).
* ``<img alt=...>`` → `` [Image: alt] `` when alt is non-empty (`:80-90`).
* ``<hr>`` → ``\n---\n`` (`:92-95`).
* all other text verbatim, then ``clean_text`` normalizes: per-line
  whitespace collapse, runs of blank lines collapsed to one, leading and
  trailing blank lines stripped (`:120-156`).
"""

from __future__ import annotations

from ..dom.node import ELEMENT, TEXT, Node
from ..dom.parser import parse_html

_SKIP_TAGS = frozenset(("script", "style", "noscript"))
_BLOCK_TAGS = frozenset(("p", "div", "article", "section", "blockquote"))
_HEADING_TAGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))


def _needs_leading_nl(parts: list[str]) -> bool:
    for p in reversed(parts):
        if p:
            return not p.endswith("\n")
    return False


def _walk(node: Node, parts: list[str]) -> None:
    for c in node.children:
        if c.type == TEXT:
            if c.text:
                parts.append(c.text)
            continue
        if c.type != ELEMENT:
            continue
        tag = c.tag
        if tag in _SKIP_TAGS:
            continue
        if tag == "br":
            parts.append("\n")
            continue
        if tag == "hr":
            parts.append("\n---\n")
            continue
        if tag == "img":
            alt = (c.get("alt") or "").strip()
            if alt:
                parts.append(f" [Image: {alt}] ")
            continue
        if tag in _BLOCK_TAGS:
            if _needs_leading_nl(parts):
                parts.append("\n")
            _walk(c, parts)
            parts.append("\n")
            continue
        if tag in _HEADING_TAGS:
            if _needs_leading_nl(parts):
                parts.append("\n")
            _walk(c, parts)
            parts.append("\n\n")
            continue
        if tag == "li":
            if _needs_leading_nl(parts):
                parts.append("\n")
            parts.append("• ")
            _walk(c, parts)
            parts.append("\n")
            continue
        _walk(c, parts)


def clean_text(text: str) -> str:
    """Whitespace normalization mirroring `src/html_to_text.rs:120-156`."""
    normalized = [" ".join(line.split()) for line in text.split("\n")]
    result: list[str] = []
    prev_empty = False
    for line in normalized:
        if not line:
            if not prev_empty and result:
                result.append("")
            prev_empty = True
        else:
            result.append(line)
            prev_empty = False
    while result and not result[0]:
        result.pop(0)
    while result and not result[-1]:
        result.pop()
    return "\n".join(result)


def _unescape_sentinels(s: str) -> str:
    from .markdown import SPACE_SENTINEL
    if SPACE_SENTINEL in s:
        s = s.replace(SPACE_SENTINEL, " ")
    return s


def node_to_text(node: Node) -> str:
    """Render an already-parsed (sub)tree — lets the pipeline reuse the
    final cleaned DOM instead of re-parsing ``content_html``."""
    parts: list[str] = []
    _walk(node, parts)
    return clean_text(_unescape_sentinels("".join(parts)))


def html_to_text(html: str) -> str:
    """One HTML string → structured plain text. Deep-recursion-safe: the
    walk is recursive over element depth only, and our parser caps element
    nesting well under CPython's limit."""
    if not html:
        return ""
    doc = parse_html(html)
    parts: list[str] = []
    _walk(doc, parts)
    return clean_text(_unescape_sentinels("".join(parts)))
