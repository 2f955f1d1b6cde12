"""Scalar text helpers (word counting, tag stripping, entity decoding).

Semantics mirror reference ``src/utils.rs:55-88``.
"""

from __future__ import annotations

import html as _html
import re

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def strip_html_tags(html: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip()


def count_words(html: str) -> int:
    text = strip_html_tags(html)
    return sum(1 for w in text.split() if w)


def decode_html_entities(text: str) -> str:
    if "&" not in text:
        return text
    return _html.unescape(text)
