"""Small CSS selector engine covering the subset Trek's spec lists use.

The reference applies its selector lists via kuchikiki's selectors crate
(e.g. ``src/removals/selectors.rs:88-142``). The lists (EXACT_SELECTORS etc.)
only use: tag, ``.class``, ``#id``, ``[attr]``, ``[attr=v]`` with ``^= $= *=
~=`` operators and the ``i`` case-insensitivity flag, ``:not(<simple>)``,
compound selectors, and a single descendant combinator. Selectors are compiled
once at import and cached.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Optional

from .node import ELEMENT, Node

_ATTR_RE = re.compile(
    r"\[\s*([-\w]+)\s*(?:([~^$*|]?=)\s*(\"[^\"]*\"|'[^']*'|[^\]\s]+))?\s*( i)?\s*\]",
    re.I,
)
_TOKEN_RE = re.compile(
    r"""
    (?P<tag>\*|[-\w]+)
  | \.(?P<cls>[-\w]+)
  | \#(?P<id>[-\w]+)
  | (?P<attr>\[[^\]]*\])
  | :not\(\s*(?P<not>[^)]*)\s*\)
    """,
    re.X,
)


class SimpleSelector:
    __slots__ = ("tag", "classes", "ids", "attrs", "nots")

    def __init__(self):
        self.tag: Optional[str] = None
        self.classes: list[str] = []
        self.ids: list[str] = []
        # (name, op, value, ci) — op '' means presence-only
        self.attrs: list[tuple] = []
        self.nots: list["SimpleSelector"] = []

    def matches(self, node: Node) -> bool:
        if node.type != ELEMENT:
            return False
        if self.tag is not None and self.tag != "*" and node.tag != self.tag:
            return False
        if self.classes:
            ncls = node.classes()
            for c in self.classes:
                if c not in ncls:
                    return False
        if self.ids:
            nid = node.id()
            for i in self.ids:
                if nid != i:
                    return False
        for name, op, value, ci in self.attrs:
            actual = node.get(name)
            if actual is None:
                return False
            if op == "":
                continue
            a, v = (actual.lower(), value.lower()) if ci else (actual, value)
            if op == "=":
                if a != v:
                    return False
            elif op == "^=":
                if not v or not a.startswith(v):
                    return False
            elif op == "$=":
                if not v or not a.endswith(v):
                    return False
            elif op == "*=":
                if not v or v not in a:
                    return False
            elif op == "~=":
                if v not in a.split():
                    return False
            elif op == "|=":
                if not (a == v or a.startswith(v + "-")):
                    return False
        for sub in self.nots:
            if sub.matches(node):
                return False
        return True


class Selector:
    """A descendant-combinator chain of SimpleSelectors (rightmost matches
    the candidate node; earlier parts must match some ancestor in order)."""

    __slots__ = ("parts",)

    def __init__(self, parts: list[SimpleSelector]):
        self.parts = parts

    def matches(self, node: Node) -> bool:
        parts = self.parts
        if not parts[-1].matches(node):
            return False
        if len(parts) == 1:
            return True
        idx = len(parts) - 2
        anc = node.parent
        while anc is not None and idx >= 0:
            if anc.type == ELEMENT and parts[idx].matches(anc):
                idx -= 1
            anc = anc.parent
        return idx < 0


def _parse_simple(text: str) -> SimpleSelector:
    sel = SimpleSelector()
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            pos += 1
            continue
        pos = m.end()
        if m.group("tag"):
            sel.tag = m.group("tag").lower()
        elif m.group("cls"):
            sel.classes.append(m.group("cls"))
        elif m.group("id"):
            sel.ids.append(m.group("id"))
        elif m.group("attr"):
            am = _ATTR_RE.match(m.group("attr"))
            if am:
                name = am.group(1).lower()
                op = am.group(2) or ""
                raw = am.group(3)
                if raw is None:
                    value = ""
                elif raw[:1] in "\"'":
                    value = raw[1:-1]
                else:
                    value = raw
                ci = bool(am.group(4))
                sel.attrs.append((name, op, value, ci))
        elif m.group("not") is not None:
            sel.nots.append(_parse_simple(m.group("not")))
    return sel


def _split_descendants(text: str) -> list[str]:
    """Split on whitespace combinators, but not inside [] or ()."""
    parts, buf, depth = [], [], 0
    for ch in text:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if ch.isspace() and depth == 0:
            if buf:
                parts.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


@lru_cache(maxsize=4096)
def compile_selector(text: str) -> Selector:
    parts = _split_descendants(text.strip())
    if not parts:
        parts = ["*"]
    return Selector([_parse_simple(p) for p in parts])


def matches(node: Node, selector: str) -> bool:
    return compile_selector(selector).matches(node)


def matches_any(node: Node, selectors) -> bool:
    for s in selectors:
        if compile_selector(s).matches(node):
            return True
    return False


def select(root: Node, selector: str) -> list[Node]:
    sel = compile_selector(selector)
    return [n for n in root.iter() if n.type == ELEMENT and sel.matches(n)]


def select_first(root: Node, selector: str) -> Optional[Node]:
    sel = compile_selector(selector)
    for n in root.iter():
        if n.type == ELEMENT and sel.matches(n):
            return n
    return None
