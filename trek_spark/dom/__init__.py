from .node import (
    COMMENT,
    DOCUMENT,
    ELEMENT,
    TEXT,
    VOID_ELEMENTS,
    Node,
    inner_html,
    serialize,
)
from .parser import body_of, parse_html
from .select import compile_selector, matches, matches_any, select, select_first

__all__ = [
    "COMMENT",
    "DOCUMENT",
    "ELEMENT",
    "TEXT",
    "VOID_ELEMENTS",
    "Node",
    "inner_html",
    "serialize",
    "parse_html",
    "body_of",
    "compile_selector",
    "matches",
    "matches_any",
    "select",
    "select_first",
]
