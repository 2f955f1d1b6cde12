"""MathML → LaTeX conversion for MathJax-rendered pages.

Mirrors the conversion conventions of the `mathml-to-latex` JS library the
golden corpus was generated with (Defuddle dependency; see the
`math--mathjax*` fixtures):

* children join with single spaces, runs of spaces collapse;
* bare fence operators render stretchy-safe: `(` → ``\\left(\\right.``,
  `)` → ``\\left.\\right)``, `|` → ``\\left|\\right.``;
* `msup`/`msub` wrap a compound mrow base in ``\\left( … \\right)``;
* `mtable` rows join with ``\\\\``, cells with ``&`` (no environment);
* `mtext` wraps alphanumeric+space segments in ``\\text{…}`` and leaves
  other characters bare (`` . `` → ``\\text{ }.\\text{ }``);
* `mspace` drops.

Reference behavior: `src/markdown/mod.rs:1133-1152` falls back to raw text
content; the golden corpus expects the full conversion, so this module
supersedes that fallback for element-structured MathML.
"""

from __future__ import annotations

import re

from ..dom.node import ELEMENT, TEXT, Node

_CHAR_MAP = {
    # binary / relation operators
    "≠": r"\neq", "±": r"\pm", "∓": r"\mp", "⋅": r"\cdot", "×": r"\times",
    "÷": r"\div", "≤": r"\leq", "≥": r"\geq", "≈": r"\approx",
    "≡": r"\equiv", "∼": r"\sim", "≃": r"\simeq", "≅": r"\cong",
    "∝": r"\propto", "∈": r"\in", "∉": r"\notin", "∋": r"\ni",
    "⊂": r"\subset", "⊆": r"\subseteq", "⊃": r"\supset",
    "⊇": r"\supseteq", "∪": r"\cup", "∩": r"\cap", "∖": r"\setminus",
    "→": r"\rightarrow", "←": r"\leftarrow", "↔": r"\leftrightarrow",
    "⇒": r"\Rightarrow", "⇐": r"\Leftarrow", "⇔": r"\iff",
    "↦": r"\mapsto", "−": "-", "∗": "*", "∘": r"\circ",
    "⊕": r"\oplus", "⊗": r"\otimes", "⊥": r"\perp", "∠": r"\angle",
    "∧": r"\wedge", "∨": r"\vee", "¬": r"\neg", "∀": r"\forall",
    "∃": r"\exists", "∅": r"\emptyset", "∂": r"\partial",
    "∇": r"\nabla", "∑": r"\sum", "∏": r"\prod", "∫": r"\int",
    "∬": r"\iint", "∮": r"\oint", "√": r"\sqrt", "∞": r"\infty",
    "…": r"\ldots", "⋯": r"\hdots", "⋮": r"\vdots", "⋱": r"\ddots",
    "′": "'", "″": "''", "˙": r"\cdot", "¨": r"\ddot", "^": r"\hat",
    "¯": r"\bar", "˜": r"\tilde",
    # greek lowercase
    "α": r"\alpha", "β": r"\beta", "γ": r"\gamma", "δ": r"\delta",
    "ε": r"\epsilon", "ϵ": r"\epsilon", "ζ": r"\zeta", "η": r"\eta",
    "θ": r"\theta", "ϑ": r"\vartheta", "ι": r"\iota", "κ": r"\kappa",
    "λ": r"\lambda", "μ": r"\mu", "ν": r"\nu", "ξ": r"\xi",
    "π": r"\pi", "ρ": r"\rho", "σ": r"\sigma", "ς": r"\varsigma",
    "τ": r"\tau", "υ": r"\upsilon", "φ": r"\varphi", "ϕ": r"\phi",
    "χ": r"\chi", "ψ": r"\psi", "ω": r"\omega",
    # greek uppercase
    "Γ": r"\Gamma", "Δ": r"\Delta", "Θ": r"\Theta", "Λ": r"\Lambda",
    "Ξ": r"\Xi", "Π": r"\Pi", "Σ": r"\Sigma", "Υ": r"\Upsilon",
    "Φ": r"\Phi", "Ψ": r"\Psi", "Ω": r"\Omega",
}

_OPEN_FENCES = {"(": "(", "[": "[", "{": r"\{"}
_CLOSE_FENCES = {")": ")", "]": "]", "}": r"\}"}

_MULTISPACE_RE = re.compile(r" {2,}")
_TEXT_SEG_RE = re.compile(r"[A-Za-z0-9 ]+|[^A-Za-z0-9 ]+")


def _map_chars(s: str) -> str:
    out = []
    for ch in s:
        mapped = _CHAR_MAP.get(ch)
        if mapped is None:
            out.append(ch)
        elif mapped.startswith("\\"):
            out.append(mapped + " ")
        else:
            out.append(mapped)
    return "".join(out).strip()


def _own_text(node: Node) -> str:
    return " ".join(node.text_content().split())


def _join(parts: list[str]) -> str:
    s = " ".join(parts)
    return _MULTISPACE_RE.sub(" ", s)


def _element_children(node: Node) -> list[Node]:
    return [c for c in node.children if c.type == ELEMENT]


def _convert_children(node: Node) -> str:
    return _join([_convert(c) for c in _element_children(node)])


def _is_compound(node: Node) -> bool:
    """True when `node` is an mrow whose content is more than one element
    (the shape msup/msub wraps in explicit fences)."""
    if node.tag != "mrow":
        return False
    kids = _element_children(node)
    while len(kids) == 1 and kids[0].tag == "mrow":
        kids = _element_children(kids[0])
    return len(kids) > 1


def _script_base(node: Node) -> str:
    latex = _convert(node)
    if _is_compound(node):
        return r"\left(" + latex + r"\right)"
    return latex


def _convert_mtext(node: Node) -> str:
    raw = node.text_content()
    # collapse whitespace but keep single leading/trailing spaces
    collapsed = re.sub(r"\s+", " ", raw)
    if not collapsed:
        return ""
    out = []
    for seg in _TEXT_SEG_RE.findall(collapsed):
        if re.fullmatch(r"[A-Za-z0-9 ]+", seg):
            out.append(r"\text{" + seg + "}")
        else:
            out.append(seg)
    return "".join(out)


def _convert_mo(node: Node) -> str:
    t = _own_text(node)
    if t in _OPEN_FENCES:
        return r"\left" + _OPEN_FENCES[t] + r"\right."
    if t in _CLOSE_FENCES:
        return r"\left.\right" + _CLOSE_FENCES[t]
    if t == "|" or t == "‖" or t == "∣":
        return r"\left|\right."
    return _map_chars(t)


def _convert_mi(node: Node) -> str:
    t = _map_chars(_own_text(node))
    if not t:
        return ""
    variant = node.get("mathvariant") or ""
    if variant == "bold":
        return r"\mathbf{" + t + "}"
    if variant == "double-struck":
        return r"\mathbb{" + t + "}"
    if variant == "script":
        return r"\mathcal{" + t + "}"
    if variant == "fraktur":
        return r"\mathfrak{" + t + "}"
    return t


def _convert(node: Node) -> str:
    tag = node.tag
    if tag in ("math", "mrow", "mstyle", "mpadded", "semantics",
               "merror", "mphantom"):
        return _convert_children(node)
    if tag == "mi":
        return _convert_mi(node)
    if tag == "mn":
        return _own_text(node)
    if tag == "mo":
        return _convert_mo(node)
    if tag == "mtext":
        return _convert_mtext(node)
    if tag == "mspace":
        return ""
    if tag == "mfrac":
        kids = _element_children(node)
        if len(kids) == 2:
            return (r"\frac{" + _convert(kids[0]) + "}{"
                    + _convert(kids[1]) + "}")
        return _convert_children(node)
    if tag == "msqrt":
        return r"\sqrt{" + _convert_children(node) + "}"
    if tag == "mroot":
        kids = _element_children(node)
        if len(kids) == 2:
            return (r"\sqrt[" + _convert(kids[1]) + "]{"
                    + _convert(kids[0]) + "}")
        return _convert_children(node)
    if tag == "msup":
        kids = _element_children(node)
        if len(kids) == 2:
            return _script_base(kids[0]) + "^{" + _convert(kids[1]) + "}"
        return _convert_children(node)
    if tag == "msub":
        kids = _element_children(node)
        if len(kids) == 2:
            return _script_base(kids[0]) + "_{" + _convert(kids[1]) + "}"
        return _convert_children(node)
    if tag == "msubsup" or tag == "munderover":
        kids = _element_children(node)
        if len(kids) == 3:
            return (_script_base(kids[0]) + "_{" + _convert(kids[1])
                    + "}^{" + _convert(kids[2]) + "}")
        return _convert_children(node)
    if tag == "munder":
        kids = _element_children(node)
        if len(kids) == 2:
            base = _convert(kids[0])
            if base in (r"\sum", r"\prod", r"\int", r"\lim"):
                return base + "_{" + _convert(kids[1]) + "}"
            return (r"\underset{" + _convert(kids[1]) + "}{"
                    + base + "}")
        return _convert_children(node)
    if tag == "mover":
        kids = _element_children(node)
        if len(kids) == 2:
            return (r"\overset{" + _convert(kids[1]) + "}{"
                    + _convert(kids[0]) + "}")
        return _convert_children(node)
    if tag == "mtable":
        rows = []
        for tr in _element_children(node):
            if tr.tag != "mtr":
                continue
            cells = [_convert(td) for td in _element_children(tr)
                     if td.tag == "mtd"]
            rows.append(" & ".join(cells))
        return " \\\\ ".join(rows)
    if tag == "mtd" or tag == "mtr":
        return _convert_children(node)
    if tag == "mfenced":
        opened = node.get("open") if node.get("open") is not None else "("
        closed = node.get("close") if node.get("close") is not None else ")"
        return (r"\left" + (opened or ".") + " " + _convert_children(node)
                + r" \right" + (closed or "."))
    if tag == "mmultiscripts":
        return _convert_children(node)
    # unknown element: recurse if it has element children, else raw text
    if _element_children(node):
        return _convert_children(node)
    return _map_chars(_own_text(node))


def mathml_to_latex(math: Node) -> str:
    """Convert a `<math>` element tree to LaTeX."""
    return _MULTISPACE_RE.sub(" ", _convert(math)).strip()
