"""Element normalization passes (callouts, images, code, headings, footnotes).

Semantics follow the reference's element handlers (``src/elements/*.rs`` in
officialunofficial/trek): callouts from five sources are rewritten to one
canonical ``data-callout`` shape (`callouts.rs:7-14`); lazy images promoted
and tracking pixels dropped (`images.rs`); highlighter markup collapsed to
``<pre><code class="language-X">`` (`code.rs`); permalink anchors and section
numbers stripped from headings (`headings.rs`).
"""

from __future__ import annotations

import re
from typing import Optional

from ..dom.node import ELEMENT, TEXT, Node
from ..dom.select import compile_selector

_HEADING_TAGS = ("h1", "h2", "h3", "h4", "h5", "h6")

_GH_BLOCKQUOTE_RE = re.compile(
    r"^\s*\[!\s*(NOTE|TIP|IMPORTANT|WARNING|CAUTION|DANGER)\s*\]\s*(.*)$", re.I)
_DISPLAY_NONE_RE = re.compile(r"display\s*:\s*none\s*;?", re.I)

ADMONITION_TYPES = frozenset((
    "info", "warning", "note", "tip", "danger", "caution", "important",
    "abstract", "success", "question", "failure", "bug", "example", "quote",
))


def _select(root: Node, sel: str) -> list[Node]:
    s = compile_selector(sel)
    return [n for n in root.iter() if n.type == ELEMENT and s.matches(n)]


def _select_first(root: Node, sel: str) -> Optional[Node]:
    s = compile_selector(sel)
    for n in root.iter():
        if n.type == ELEMENT and s.matches(n):
            return n
    return None


def _capitalize(s: str) -> str:
    return s[:1].upper() + s[1:] if s else ""


# ------------------------------------------------------------------ callouts

def _build_callout(kind: str, title: str, body_source: Node) -> Node:
    outer = Node.element("div", {"data-callout": kind, "class": "callout"})
    title_div = Node.element("div", {"class": "callout-title"})
    title_inner = Node.element("div", {"class": "callout-title-inner"})
    title_inner.append(Node.text_node(title))
    title_div.append(title_inner)
    outer.append(title_div)
    content_div = Node.element("div", {"class": "callout-content"})
    for c in list(body_source.children):
        content_div.append(c)
    outer.append(content_div)
    return outer


def _strip_alert_marker(root: Node) -> None:
    for node in root.iter():
        if node.type != TEXT:
            continue
        raw = node.text
        trimmed = raw.lstrip()
        if not trimmed:
            continue
        m = _GH_BLOCKQUOTE_RE.match(trimmed)
        if m:
            leading = raw[: len(raw) - len(trimmed)]
            node.text = leading + (m.group(2) or "").lstrip()
        return


def normalize_callouts(root: Node) -> None:
    # Single traversal classifying candidates (the reference runs ~10
    # selector scans here; one pass is equivalent and ~10× cheaper on the
    # hot path since this normalizer runs three times per document).
    obsidian, gh_alerts, blockquotes, asides, admonitions, alerts = \
        [], [], [], [], [], []
    for n in root.iter():
        if n.type != ELEMENT:
            continue
        cls = n.classes()
        if "callout" in cls and ("is-collapsed" in cls or "is-collapsible" in cls):
            obsidian.append(n)
        if "markdown-alert" in cls:
            gh_alerts.append(n)
        if n.tag == "blockquote":
            blockquotes.append(n)
        if n.tag == "aside" and any("callout" in c for c in cls):
            asides.append(n)
        if "admonition" in cls:
            admonitions.append(n)
        if "alert" in cls:
            alerts.append(n)
    if not (obsidian or gh_alerts or blockquotes or asides
            or admonitions or alerts):
        return

    # 1. Obsidian collapsed/collapsible markers
    for el in obsidian:
        cls = el.classes()
        collapsed = "is-collapsed" in cls
        new_classes = [c for c in cls if c not in ("is-collapsed", "is-collapsible")]
        if new_classes:
            el.set("class", " ".join(new_classes))
        else:
            el.del_attr("class")
        if el.get("data-callout-fold") is None:
            el.set("data-callout-fold", "-" if collapsed else "+")
        fold = _select_first(el, ".callout-fold")
        if fold is not None:
            fold.detach()
        content = _select_first(el, ".callout-content")
        if content is not None:
            style = content.get("style")
            if style:
                cleaned = _DISPLAY_NONE_RE.sub("", style).strip()
                if cleaned:
                    content.set("style", cleaned)
                else:
                    content.del_attr("style")

    # 2a. GitHub markdown alerts
    for el in gh_alerts:
        if el.parent is None:
            continue
        kind = "note"
        for c in el.classes():
            if c.startswith("markdown-alert-") and c != "markdown-alert":
                kind = c[len("markdown-alert-"):].lower()
                break
        t = _select_first(el, ".markdown-alert-title")
        if t is not None:
            t.detach()
        new = _build_callout(kind, _capitalize(kind), el)
        el.replace_with(new)

    # 2b. GitHub blockquote alerts
    for bq in blockquotes:
        if bq.parent is None or bq.get("data-callout") is not None:
            continue
        text = bq.text_content()
        first_line = next((ln for ln in text.split("\n") if ln.strip()), "")
        m = _GH_BLOCKQUOTE_RE.match(first_line.strip())
        if not m:
            continue
        kind = m.group(1).lower()
        _strip_alert_marker(bq)
        new = _build_callout(kind, _capitalize(kind), bq)
        bq.replace_with(new)

    # 3. Aside callouts
    for el in asides:
        if el.parent is None or el.tag != "aside":
            continue
        if el.get("data-callout") is not None:
            continue
        type_class = next((c for c in el.classes() if c.startswith("callout-")), None)
        if type_class is None:
            continue
        kind = type_class[len("callout-"):].lower()
        body_source = _select_first(el, ".callout-content") or el
        new = _build_callout(kind, _capitalize(kind), body_source)
        el.replace_with(new)

    # 4. Admonitions
    for el in admonitions:
        if el.parent is None or el.get("data-callout") is not None:
            continue
        kind = None
        for c in el.classes():
            if c in ADMONITION_TYPES:
                kind = c
                break
            if c.startswith("admonition-") and c[len("admonition-"):] in ADMONITION_TYPES:
                kind = c[len("admonition-"):]
                break
        kind = kind or "note"
        title_el = _select_first(el, ".admonition-title")
        title_text = ""
        if title_el is not None:
            title_text = title_el.text_content().strip()
            title_el.detach()
        if not title_text:
            title_text = _capitalize(kind)
        body_source = (_select_first(el, ".admonition-content")
                       or _select_first(el, ".details-content") or el)
        new = _build_callout(kind, title_text, body_source)
        el.replace_with(new)

    # 5. Bootstrap alerts
    for el in alerts:
        if el.parent is None or el.get("data-callout") is not None:
            continue
        cls = el.classes()
        if "alert" not in cls:
            continue
        type_class = next(
            (c for c in cls if c.startswith("alert-") and c != "alert-dismissible"),
            None)
        if type_class is None:
            continue
        kind = type_class[len("alert-"):].lower()
        title_el = _select_first(el, ".alert-heading") or _select_first(el, ".alert-title")
        title_text = ""
        if title_el is not None:
            title_text = title_el.text_content().strip()
            title_el.detach()
        if not title_text:
            title_text = _capitalize(kind)
        new = _build_callout(kind, title_text, el)
        el.replace_with(new)


# ------------------------------------------------------------------- images

def _is_base64_placeholder(src: str) -> bool:
    return src.startswith("data:") and len(src) <= 200


def _split_srcset_entries(s: str) -> list[str]:
    out = []
    cur: list[str] = []
    in_url = True
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if in_url:
            if c.isspace():
                in_url = False
            cur.append(c)
        else:
            if c == ",":
                next_is_ws = i + 1 >= n or s[i + 1].isspace()
                if next_is_ws:
                    e = "".join(cur).strip()
                    if e:
                        out.append(e)
                    cur = []
                    in_url = True
                    i += 1
                    while i < n and s[i].isspace():
                        i += 1
                    continue
            cur.append(c)
        i += 1
    e = "".join(cur).strip()
    if e:
        out.append(e)
    return out


def _descriptor_weight(d: str) -> int:
    d = d.strip()
    if not d:
        return 0
    if d.endswith("w"):
        try:
            return int(d[:-1].strip())
        except ValueError:
            return 0
    if d.endswith("x"):
        try:
            return int(float(d[:-1].strip()) * 1000)
        except ValueError:
            return 0
    return 0


def pick_best_from_srcset(srcset: str) -> Optional[str]:
    best_w = -1
    best_url = None
    for entry in _split_srcset_entries(srcset):
        parts = entry.split(None, 1)
        if not parts:
            continue
        url = parts[0].strip()
        desc = parts[1].strip() if len(parts) > 1 else ""
        w = _descriptor_weight(desc)
        if not url:
            continue
        if best_url is None or w > best_w:
            best_w = w
            best_url = url
    return best_url


def _is_tracking_pixel(img: Node) -> bool:
    def as_int(a):
        v = img.get(a)
        try:
            return int(v) if v else None
        except ValueError:
            return None
    if as_int("width") == 1 and as_int("height") == 1:
        return True
    src = (img.get("src") or "").lower()
    return "/pixel." in src or "tracking" in src or "/1x1." in src


def normalize_images(root: Node) -> None:
    for img in [n for n in root.iter_elements() if n.tag == "img"]:
        if img.parent is None:
            continue
        src = img.get("src") or ""
        if not src or _is_base64_placeholder(src):
            for key in ("data-src", "data-original", "data-lazy-src"):
                v = img.get(key)
                if v:
                    img.set("src", v)
                    break
        if img.get("srcset") is None:
            for key in ("data-srcset", "data-lazy-srcset"):
                v = img.get(key)
                if v:
                    img.set("srcset", v)
                    break
        for key in ("data-src", "data-original", "data-lazy-src",
                    "data-srcset", "data-lazy-srcset", "loading"):
            img.del_attr(key)

        if _is_tracking_pixel(img):
            img.detach()
            continue

        src = img.get("src") or ""
        if not src or _is_base64_placeholder(src):
            ss = img.get("srcset")
            if ss:
                best = pick_best_from_srcset(ss)
                if best:
                    img.set("src", best)


# --------------------------------------------------------------------- code

_COPY_BUTTON_SELECTORS = (
    "button.copy",
    'button[aria-label="Copy"]',
    'button[aria-label="Copy code"]',
    'button[class*="codeblock-button"]',
    "button[data-copy]",
    '[aria-label="Copy"]',
    '[class*="copy-button"]',
)

_LANG_PREFIXES = ("language-", "lang-")


def _lang_from_classes(node: Node) -> Optional[str]:
    for c in node.classes():
        for p in _LANG_PREFIXES:
            if c.startswith(p) and len(c) > len(p):
                return c[len(p):].lower()
    return None


def detect_code_language(node: Node) -> str:
    lang = _lang_from_classes(node)
    if lang:
        return lang
    code = node.find_first("code")
    if code is not None and code is not node:
        lang = _lang_from_classes(code)
        if lang:
            return lang
    cands = [node] + [n for n in node.iter_elements() if n.tag == "code"]
    for cand in cands:
        for key in ("data-language", "data-lang", "language"):
            v = cand.get(key)
            if v and v.strip():
                return v.strip().lower()
    parent = node.parent
    if parent is not None and parent.type == ELEMENT:
        for child in parent.element_children():
            if child is node:
                continue
            if (child.tag == "header" or child.has_class("hljs-header")
                    or child.has_class("code-block-header")
                    or child.has_class("code-header")):
                token = (child.text_content().split() or [""])[0].lower()
                if token and all(c.isalnum() or c in "+#-" for c in token):
                    return token
    return ""


def _strip_one_lntable(table: Node) -> None:
    for td in _select(table, "td.lntd"):
        spans = [n for n in td.iter_elements() if n.tag == "span"]
        lnt = [n for n in spans if n.has_class("lnt")]
        if lnt and len(lnt) == len(spans):
            td.detach()
    inner_pre = table.find_first("pre")
    if inner_pre is not None:
        table.insert_before(inner_pre)
        table.detach()


def _coalesce_line_spans(node: Node) -> None:
    sel_data_line = compile_selector("span[data-line]")
    sel_cm = compile_selector(".cm-line")
    lines = [n for n in node.iter() if n.type == ELEMENT
             and (sel_data_line.matches(n) or sel_cm.matches(n))]
    if not lines:
        return
    parent = lines[0].parent
    if parent is None:
        return
    for ln in lines:
        if ln.parent is not parent:
            return
    joined = "\n".join(ln.text_content() for ln in lines)
    for ln in lines:
        ln.detach()
    parent.append(Node.text_node(joined))


def _clean_code_text(s: str) -> str:
    s = s.replace("\t", "    ").replace(" ", " ")
    while "\n\n\n" in s:
        s = s.replace("\n\n\n", "\n\n")
    return s.rstrip("\n ")


def _is_canonical_pre_code(node: Node, lang: str) -> bool:
    if node.tag != "pre":
        return False
    found = False
    target = f"language-{lang}"
    for child in node.children:
        if child.type != ELEMENT:
            continue
        if found:
            return False
        if child.tag != "code":
            return False
        if target not in (child.get("class") or "").split():
            return False
        found = True
    return found


def _is_copy_button(n: Node) -> bool:
    cls = n.get("class") or ""
    aria = n.get("aria-label")
    if n.tag == "button":
        if "copy" in n.classes() or n.get("data-copy") is not None \
                or "codeblock-button" in cls:
            return True
        if aria in ("Copy", "Copy code"):
            return True
    return aria == "Copy" or "copy-button" in cls


def normalize_code_blocks(root: Node) -> None:
    # single traversal: copy buttons + lntables + pre/highlighter candidates
    copy_buttons, lntables, candidates = [], [], []
    for d in root.iter_elements():
        if _is_copy_button(d):
            copy_buttons.append(d)
            continue
        if d.tag == "table" and d.has_class("lntable"):
            lntables.append(d)
        elif d.tag == "pre":
            candidates.append(d)
        elif d.tag == "div":
            cls = d.classes()
            if any(c == "highlight" or c == "syntaxhighlighter"
                   or c == "highlight-source" or c.startswith("language-")
                   or c == "wp-block-code" or c.startswith("prismjs")
                   for c in cls):
                candidates.append(d)
    for n in copy_buttons:
        if n.parent is not None:
            n.detach()
    for table in lntables:
        _strip_one_lntable(table)

    for node in candidates:
        if node.parent is None:
            continue
        lang = detect_code_language(node)
        for n in _select(node, "td.lineno") + _select(node, "td.linenos") \
                + _select(node, "span.lineno"):
            n.detach()
        for n in _select(node, ".cm-gutter") + _select(node, ".cm-gutters"):
            n.detach()
        _coalesce_line_spans(node)
        if not lang:
            continue
        if _is_canonical_pre_code(node, lang):
            continue
        target = node.find_first("code") or node
        cleaned = _clean_code_text(target.text_content())
        if not cleaned:
            continue
        code_el = Node.element("code", {"class": f"language-{lang}"})
        code_el.append(Node.text_node(cleaned))
        pre_el = Node.element("pre")
        pre_el.append(code_el)
        node.insert_before(pre_el)
        node.detach()


def code_blocks(root: Node) -> None:
    """standardize::code_blocks stage — currently shares the element-level
    normalizer (the reference's two passes overlap heavily; the canonical
    rewrite happens in normalize_code_blocks below in pipeline order)."""
    # Intentionally minimal: the heavy lifting is in normalize_code_blocks,
    # which runs later in the chain; running the rewrite twice is idempotent.


# ----------------------------------------------------------------- headings

_PERMALINK_GLYPHS = frozenset(("#", "¶", "§", "🔗", "﻿"))


def _is_permalink_anchor(node: Node) -> bool:
    if node.tag != "a":
        return False
    if any(node.has_class(c) for c in
           ("anchor", "permalink", "anchor-link", "heading-anchor",
            "header-anchor")):
        return True
    t = node.get("title")
    if t and "permalink" in t.lower():
        return True
    label = node.get("aria-label")
    if label:
        ll = label.lower()
        if "permalink" in ll or "anchor link" in ll:
            return True
    text = node.text_content().strip()
    if text and text in _PERMALINK_GLYPHS:
        return True
    return False


def normalize_headings(root: Node) -> None:
    for h in [n for n in root.iter_elements() if n.tag in _HEADING_TAGS]:
        for a in [n for n in h.iter_elements() if n.tag == "a"
                  and _is_permalink_anchor(n)]:
            a.detach()
        for n in [x for x in h.iter_elements()
                  if x.has_class("section-number")
                  or x.has_class("header-section-number")]:
            n.detach()
        for b in [x for x in h.iter_elements() if x.tag == "button"]:
            b.detach()

    def norm(s: str) -> str:
        return " ".join(s.replace(" ", " ").split()).lower()

    to_drop = []
    for h in [n for n in root.iter_elements() if n.tag in _HEADING_TAGS]:
        nxt = h.next_element_sibling()
        if nxt is None or nxt.tag not in _HEADING_TAGS:
            continue
        a = norm(h.text_content())
        if a and a == norm(nxt.text_content()):
            to_drop.append(nxt)
    for d in to_drop:
        if d.parent is not None:
            d.detach()


# ---------------------------------------------------------------- footnotes

def normalize_footnotes(root: Node) -> None:
    """Canonicalize common footnote shapes. The markdown renderer already
    recognizes `<sup><a href="#fn...">` refs and footnote `<ol>` lists; this
    pass handles the `<div class="footnote"><ol>` (Sphinx/Python-Markdown)
    and `<section class="footnotes">` shapes by tagging the list so the
    renderer's `_is_footnote_list` fires (`src/elements/footnotes.rs`)."""
    for sel in ("div.footnote ol", "div.footnotes ol", "section.footnotes ol"):
        for ol in _select(root, sel):
            if not ol.has_class("footnotes-list"):
                cls = ol.get("class")
                ol.set("class", (cls + " footnotes-list") if cls else "footnotes-list")


# --------------------------------------------------------------------- math

_MATH_IMG_HOSTS = ("codecogs.com", "latex.php", "mimetex", "mathtex")


def normalize_math_base(root: Node) -> None:
    """Minimal math-base pass: LaTeX-image promotion and data-math spans →
    `<math>` elements the renderer understands (`src/elements/math/base.rs`)."""
    for img in [n for n in root.iter_elements() if n.tag == "img"]:
        if img.parent is None:
            continue
        src = (img.get("src") or "").lower()
        alt = img.get("alt") or ""
        if alt and any(h in src for h in _MATH_IMG_HOSTS):
            math = Node.element("math", {"data-latex": alt})
            img.replace_with(math)
    for span in [n for n in root.iter_elements()
                 if n.tag == "span" and n.get("data-math") is not None]:
        if span.parent is None:
            continue
        math = Node.element("math", {"data-latex": span.get("data-math") or ""})
        span.replace_with(math)


def normalize_all(root: Node) -> None:
    """`src/elements/mod.rs:31-39` order: callouts → math → images → code →
    headings → footnotes."""
    normalize_callouts(root)
    normalize_math_base(root)
    normalize_images(root)
    normalize_code_blocks(root)
    normalize_headings(root)
    normalize_footnotes(root)
