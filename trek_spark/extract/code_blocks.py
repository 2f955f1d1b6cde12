"""Code-block canonicalization — every highlighter shape →
``<pre><code class="language-X">text</code></pre>``.

Port of the reference's standardize pass (`src/standardize/code_blocks.rs`):
language detection from class/data-attrs/ancestors, line-number gutter and
chrome class lists, inline line-number heuristics, line-container-aware text
extraction (including ``<br>`` lines), sibling label/copy-button removal,
hexo figures, lean-verso ``code.block``, dedent + trim. Adds a ChatGPT
CodeMirror header heuristic (language label as bare text inside the sticky
select-none toolbar).
"""

from __future__ import annotations

import re
from typing import Optional

from ..dom.node import ELEMENT, TEXT, Node

_NON_LANGS = ("none", "plaintext", "text")

_LINENO_TOKENS = frozenset((
    "lineno", "linenos", "line-numbers", "line-number", "linenumber",
    "react-syntax-highlighter-line-number", "ln", "lnt", "rouge-gutter",
    "code-line-numbers", "code-block-line-numbers", "gutter",
    "cm-gutters", "codemirror-linenumber", "codemirror-gutters",
))

_CHROME_TOKENS = frozenset((
    "code__header", "code-header", "codeheader", "hljs-header",
    "code-block-header", "code__copy-button", "code-copy-button",
    "copy-button", "copy_button", "copybutton", "code-copy",
    "rehype-pretty-copy", "language-label", "code-toolbar", "code__toolbar",
    "filename", "ec-meta", "expressive-code__header", "code-block__header",
    "shiki-twoslash__header", "codeblock-header", "codeblock-filename",
))

_LINE_CONTAINER_TOKENS = frozenset((
    "line", "cm-line", "ec-line", "code-line", "hljs-line",
    "react-syntax-highlighter-line", "highlight-line", "react-code-line",
    "v-line",
))

# languages a bare ChatGPT-style header label may name
_KNOWN_LANGS = frozenset("""
python javascript typescript java c cpp c++ csharp c# go rust ruby php swift
kotlin scala haskell lua perl r julia dart elixir erlang clojure bash shell
sh zsh sql html css json yaml toml xml markdown dockerfile makefile
""".split())


def _tokens(cls: Optional[str]) -> list[str]:
    return cls.split() if cls else []


def _is_lineno_class(cls: str) -> bool:
    for tok in cls.lower().split():
        if tok in _LINENO_TOKENS or tok.startswith("cm-gutter"):
            return True
    return False


def _is_chrome_class(cls: str) -> bool:
    return any(tok in _CHROME_TOKENS for tok in cls.lower().split())


def _is_line_container_class(cls: str) -> bool:
    return any(tok in _LINE_CONTAINER_TOKENS for tok in cls.lower().split())


def detect_lang_from_class(cls: str) -> Optional[str]:
    tokens = cls.split()
    for tok in tokens:
        for prefix in ("language-", "lang-"):
            if tok.startswith(prefix):
                rest = tok[len(prefix):]
                if rest and rest not in _NON_LANGS:
                    return rest
        if tok.startswith("highlight-source-") and tok[len("highlight-source-"):]:
            return tok[len("highlight-source-"):]
    if "hl" in tokens and "block" in tokens:
        for t in tokens:
            if t in ("hl", "block", "token"):
                continue
            if all(c.isalnum() or c in "+-#" for c in t):
                return t
    return None


def _first_descendant_lang(node: Node) -> Optional[str]:
    for d in node.iter_elements():
        if d.tag != "code":
            continue
        for a in ("data-language", "data-lang"):
            v = d.get(a)
            if v:
                return v
        v = d.get("language")
        if v and v not in _NON_LANGS:
            return v
        cls = d.get("class")
        if cls:
            lang = detect_lang_from_class(cls)
            if lang:
                return lang
    for a in ("data-language", "data-lang"):
        v = node.get(a)
        if v:
            return v
    v = node.get("language")
    if v and v not in _NON_LANGS:
        return v
    cls = node.get("class")
    if cls:
        lang = detect_lang_from_class(cls)
        if lang:
            return lang
    for d in node.iter_elements():
        for a in ("data-language", "data-lang"):
            v = d.get(a)
            if v and v not in _NON_LANGS:
                return v
        cls = d.get("class")
        if cls:
            lang = detect_lang_from_class(cls)
            if lang:
                return lang
    return None


def _ancestor_lang(node: Node) -> Optional[str]:
    cur = node.parent
    hops = 0
    while cur is not None and hops < 6:
        hops += 1
        if cur.type == ELEMENT:
            for a in ("data-language", "data-lang"):
                v = cur.get(a)
                if v:
                    return v
            cls = cur.get("class")
            if cls:
                lang = detect_lang_from_class(cls)
                if lang:
                    return lang
            # `lang` on html/body is a BCP-47 natural-language tag
            # (<html lang="en">), never a code language
            if cur.tag not in ("html", "body"):
                v = cur.get("lang")
                if v and all(c.isalnum() or c in "+-#" for c in v):
                    return v
        cur = cur.parent
    return None


def _chatgpt_header_lang(pre: Node) -> Optional[str]:
    """ChatGPT CodeMirror: sticky select-none toolbar div holds a bare
    language label ("Python") next to Copy/Run buttons."""
    if pre.find_first("code") is not None:
        return None
    has_cm = any("cm-editor" in _tokens(d.get("class"))
                 or "cm-content" in _tokens(d.get("class"))
                 for d in pre.iter_elements())
    if not has_cm:
        return None
    for d in pre.iter_elements():
        toks = _tokens(d.get("class"))
        if "select-none" in toks or "sticky" in toks:
            # inspect individual text nodes (labels/buttons are adjacent
            # without whitespace: "PythonRun")
            for t in d.iter():
                if t.type == TEXT:
                    word = t.text.strip()
                    if word.lower() in _KNOWN_LANGS:
                        return word.lower()
    return None


def _looks_like_inline_lineno(node: Node) -> bool:
    if node.tag != "span":
        return False
    prev = node.prev_sibling()
    while prev is not None:
        if prev.type == TEXT and not prev.text.strip():
            prev = prev.prev_sibling()
            continue
        return False
    text = node.text_content().strip()
    if not text or len(text) > 4 or not text.isdigit():
        return False
    style = (node.get("style") or "").lower()
    style_hint = ("user-select:none" in style or "user-select: none" in style
                  or "white-space:pre" in style)
    cls = node.get("class") or ""
    class_hint = _is_lineno_class(cls) or "ln" in cls.lower()
    parent_cls = ((node.parent.get("class") or "")
                  if node.parent is not None and node.parent.type == ELEMENT
                  else "").lower()
    parent_hint = any(t in ("flex-row", "ec-line", "line", "cl")
                      for t in parent_cls.split()) \
        and node.next_sibling() is not None
    return style_hint or class_hint or parent_hint


def extract_text_with_lines(node: Node) -> str:
    """Concatenate descendant text preserving line structure: <br> breaks,
    line containers, block elements (`code_blocks.rs:325-456`)."""
    out: list[str] = []
    total = [0]

    def ends_nl() -> bool:
        return bool(out) and out[-1].endswith("\n")

    def visit(n: Node, state: list) -> None:
        # state[0]: 0 = mid-line, 1 = newline from <br>, 2 = newline from a
        # line container/block. <br> after a container-newline is a doubled
        # separator (skip); <br> after a br-newline is a real blank line.
        for c in n.children:
            if c.type == ELEMENT:
                tag = c.tag
                if tag == "br":
                    if state[0] != 2:
                        out.append("\n")
                        total[0] += 1
                    state[0] = 1
                    continue
                if tag in ("button", "style", "script", "svg"):
                    continue
                if (c.get("data-floating-buttons") is not None
                        or c.get("data-fade-overlay") is not None
                        or c.get("data-copy-button") is not None):
                    continue
                if c.get("aria-hidden") == "true" and tag in ("div", "span"):
                    continue
                cls = c.get("class") or ""
                if _is_lineno_class(cls):
                    state[0] = 0
                    continue
                if _is_chrome_class(cls):
                    continue
                if "hover-info" in cls.split():
                    continue  # Verso hover metadata: hidden tooltip content
                if _looks_like_inline_lineno(c):
                    continue
                is_line = _is_line_container_class(cls)
                block_like = tag in ("p", "div", "li", "tr") or is_line
                before = total[0]
                child_state = [0]
                visit(c, child_state)
                produced = total[0] > before
                if block_like and produced and not ends_nl():
                    out.append("\n")
                    total[0] += 1
                    state[0] = 2
                elif block_like and produced and ends_nl():
                    state[0] = 2
                elif is_line and not produced:
                    state[0] = 0
                elif produced:
                    state[0] = 2 if ends_nl() else 0
            elif c.type == TEXT:
                s = c.text
                if not s:
                    continue
                if state[0] and "\n" in s and not s.strip():
                    continue
                if not s.strip() and "\n" in s:
                    # whitespace formatting around BLOCK siblings is layout,
                    # not code (indentation before <table>/<pre>/<div>);
                    # whitespace between inline spans/text is real code
                    if n.type == ELEMENT and n.tag in (
                            "table", "tbody", "thead", "tr", "td",
                            "figure", "ol", "ul"):
                        continue
                    nxt = c.next_sibling()
                    while nxt is not None and nxt.type == TEXT \
                            and not nxt.text.strip():
                        nxt = nxt.next_sibling()
                    # only table-layout siblings mark layout whitespace —
                    # div/span siblings may be line containers (real code)
                    if nxt is not None and nxt.type == ELEMENT and nxt.tag in (
                            "table", "tbody", "tr", "td", "figure"):
                        continue
                    # indentation before the <pre> itself — or before a
                    # chrome header that gets skipped — is markup layout
                    if nxt is not None and nxt.type == ELEMENT and (
                            nxt.tag == "pre"
                            or nxt.find_first("pre") is not None
                            or _is_chrome_class(nxt.get("class") or "")):
                        continue
                out.append(s)
                total[0] += len(s)
                state[0] = 2 if s.endswith("\n") else 0

    visit(node, [False])
    return "".join(out)


def dedent(s: str) -> str:
    lines = s.split("\n")
    sig = [ln for ln in lines if ln.strip()]
    if not sig:
        return s
    common = min(len(ln) - len(ln.lstrip(" \t")) for ln in sig)
    if common == 0:
        return s
    return "\n".join(ln[common:] if len(ln) >= common else ln for ln in lines)


def trim_lines(s: str) -> str:
    lines = s.split("\n")
    while lines and not lines[-1].strip():
        lines.pop()
    start = 0
    while start < len(lines) and not lines[start].strip():
        start += 1
    kept = lines[start:]
    out = []
    prev_blank = 0
    for ln in kept:
        if not ln.strip():
            prev_blank += 1
            if prev_blank > 1:
                continue
        else:
            prev_blank = 0
        out.append(ln)
    return "\n".join(out)


def build_canonical_pre(text: str, lang: Optional[str]) -> Node:
    pre = Node.element("pre")
    code = Node.element("code",
                        {"class": f"language-{lang}"} if lang else None)
    code.append(Node.text_node(text))
    pre.append(code)
    return pre


def _looks_like_chroma_or_highlight(n: Node) -> bool:
    cls = (n.get("class") or "").lower()
    for tok in cls.split():
        if tok in ("chroma", "highlight", "expressive-code", "code-block",
                   "codeblock"):
            return True
        if tok.startswith("language-") or tok.startswith("highlight-source-"):
            return True
    return False


def _looks_like_codemirror(n: Node) -> bool:
    cls = (n.get("class") or "").lower()
    return any(t in ("cm-editor", "codemirror", "cm-content")
               for t in cls.split())


def _nearby_code_block(node: Node) -> bool:
    """True when node sits in a small code-block wrapper that also holds a
    <pre>. Stops before body/article/main — a page-level container with a
    pre somewhere must not mark every button in the document as chrome."""
    cur = node.parent
    hops = 0
    while cur is not None and hops < 3:
        if cur.type == ELEMENT and cur.tag in ("body", "article", "main",
                                               "section"):
            return False
        hops += 1
        for d in cur.iter_elements():
            if d is not node and d.tag == "pre":
                return True
        cur = cur.parent
    return False


def _post_order(root: Node) -> list[Node]:
    # shared tick-memoized element post-order (see dom.node)
    from ..dom.node import post_order_elements
    return post_order_elements(root)


def _merge_verso_fragments(root: Node) -> None:
    """Lean/Verso alternating command (`code.hl.block`) and output
    (`pre.hl.lean-output`) fragments merge into ONE canonical fenced block;
    fragment texts keep their internal newlines and join with a single
    newline (empty fragments become blank lines)."""
    def is_verso(n: Node) -> bool:
        if n.tag not in ("code", "pre"):
            return False
        return "hl" in _tokens(n.attrs.get("class"))

    processed = set()
    for container in root.descendants_snapshot():
        runs = []
        cur_run = []
        for c in container.children:
            if c.type == ELEMENT and is_verso(c) and id(c) not in processed:
                cur_run.append(c)
                continue
            if c.type == TEXT and not c.text.strip() and cur_run:
                continue
            if len(cur_run) >= 2:
                runs.append(cur_run)
            cur_run = []
        if len(cur_run) >= 2:
            runs.append(cur_run)
        for run in runs:
            for frag in run:
                processed.add(id(frag))
            lang = None
            for frag in run:
                lang = detect_lang_from_class(frag.get("class") or "")
                if lang:
                    break
            texts = []
            for f in run:
                t = extract_text_with_lines(f)
                stripped = t.rstrip("\n")
                if stripped and t.endswith("\n"):
                    # keep ONE trailing newline — an intentional section gap
                    stripped += "\n"
                texts.append(stripped)
            merged = trim_lines("\n".join(texts))
            if not merged.strip():
                continue
            canonical = build_canonical_pre(merged, lang)
            run[0].insert_before(canonical)
            for frag in run:
                frag.detach()


def normalize_code_blocks_std(root: Node) -> None:
    """standardize::code_blocks — full pass chain A/A2/A3/B/B2/C/C1/C2/D."""
    _merge_verso_fragments(root)
    # Pass A0: text-only highlighter divs with an explicit language attr
    # (Writerside `<div class="code-block" data-lang="http">…raw text…</div>`)
    for node in _post_order(root):
        if node.tag != "div" or node.parent is None:
            continue
        lang = node.get("data-lang") or node.get("data-language")
        if not lang or "code-block" not in node.classes():
            continue
        if node.find_first("pre", "code") is not None:
            continue
        text = node.text_content().strip("\n")
        if text.strip():
            node.replace_with(build_canonical_pre(text, lang.lower()))
    # Pass A: bare block <code> outside <pre> → wrap in <pre>
    for node in _post_order(root):
        if node.tag != "code" or node.parent is None:
            continue
        if node.has_ancestor_tag("pre"):
            continue
        style = (node.get("style") or "").lower()
        cls = (node.get("class") or "").lower()
        is_block = ("block" in cls.split()
                    or "display:block" in style
                    or "white-space:pre" in style.replace(" ", ""))
        if is_block:
            pre = Node.element("pre")
            node.insert_before(pre)
            node.detach()
            pre.append(node)

    # Pass A2: hexo <figure class="highlight LANG">
    for fig in [n for n in root.descendants_snapshot()
                if n.tag == "figure" and "highlight" in _tokens(n.get("class"))]:
        if fig.parent is None:
            continue
        text = ""
        for td in fig.iter_elements():
            if td.tag == "td" and "code" in _tokens(td.get("class")):
                text = extract_text_with_lines(td)
                break
        if not text:
            text = extract_text_with_lines(fig)
        lang = None
        toks = [t for t in _tokens(fig.get("class")) if t != "highlight"]
        if toks and all(c.isalnum() or c in "+-#" for c in toks[0]) \
                and toks[0] not in _NON_LANGS:
            lang = toks[0]
        cleaned = trim_lines(text)
        if not cleaned.strip():
            continue
        fig.insert_before(build_canonical_pre(cleaned, lang))
        fig.detach()

    # Pass A3: preceding-sibling label/button cleanup around every <pre>
    for pre in [n for n in root.descendants_snapshot() if n.tag == "pre"]:
        victims = []
        anchor = pre
        hops = 0
        while hops < 4 and anchor.parent is not None:
            hops += 1
            parent = anchor.parent
            sib = anchor.prev_sibling()
            while sib is not None:
                if sib.type == ELEMENT:
                    t = sib.tag
                    if t in ("pre", "p", "h1", "h2", "h3", "h4", "h5", "h6",
                             "ul", "ol", "table", "blockquote"):
                        break
                    if t == "button":
                        btxt = sib.text_content().strip()
                        if not sib.has_ancestor_tag("p", "li") and (
                                not btxt
                                or (len(btxt) <= 16 and " " not in btxt)
                                or btxt.lower() in ("copy", "run",
                                                    "copy code")):
                            victims.append(sib)
                        sib = sib.prev_sibling()
                        continue
                    if t in ("span", "div"):
                        txt = sib.text_content().strip()
                        if (not txt
                                or (len(txt) <= 16 and " " not in txt
                                    and all(c.isalnum() or c in "+-#"
                                            for c in txt))
                                or txt.lower() in ("copy", "run", "copy code")):
                            victims.append(sib)
                            sib = sib.prev_sibling()
                            continue
                break
            anchor = parent
            if anchor.type != ELEMENT:
                break
        for v in victims:
            if v.parent is not None:
                v.detach()

    # Pass B: normalize decorated pre / highlighter divs
    candidates = []
    for d in root.descendants_snapshot():
        if d.tag == "pre":
            candidates.append(d)
        elif d.tag == "div" and (_looks_like_chroma_or_highlight(d)
                                 or _looks_like_codemirror(d)):
            candidates.append(d)
    for cand in candidates:
        if cand.parent is None:
            continue
        if cand.tag == "pre":
            cls = cand.get("class")
            if cls and _is_lineno_class(cls):
                cand.detach()
                continue
        if cand.tag == "pre":
            needs = False
            has_br = False
            for d in cand.iter_elements():
                if d is cand:
                    continue
                if d.tag in ("table", "button"):
                    needs = True
                    break
                if d.tag == "br":
                    has_br = True
                dcls = d.get("class")
                if dcls and (_is_lineno_class(dcls) or _is_chrome_class(dcls)
                             or _is_line_container_class(dcls)):
                    needs = True
                    break
                if dcls and "chroma" in dcls.lower() and (
                        "line" in dcls.lower() or "ln" in dcls.lower()):
                    needs = True
                    break
                if _looks_like_inline_lineno(d):
                    needs = True
                    break
            if has_br:
                needs = True
            if not needs:
                # div directly under pre or under pre>code
                for c in cand.children:
                    if c.type == ELEMENT and c.tag == "div":
                        needs = True
                        break
                if not needs:
                    for c in cand.children:
                        if c.type == ELEMENT and c.tag == "code":
                            if any(cc.type == ELEMENT and cc.tag == "div"
                                   for cc in c.children):
                                needs = True
                                break
            if not needs:
                continue
        lang = (_chatgpt_header_lang(cand) if cand.tag == "pre" else None) \
            or _first_descendant_lang(cand) or _ancestor_lang(cand)
        raw = extract_text_with_lines(cand)
        cleaned = trim_lines(raw)
        if not cleaned.strip():
            continue
        # drop a leading bare language-label line (ChatGPT header text)
        first_line, _, rest = cleaned.partition("\n")
        fl = first_line.strip().lower()
        if lang and rest and (fl == lang or fl in _KNOWN_LANGS) \
                and fl.replace("+", "").replace("#", "").isalnum():
            cleaned = trim_lines(rest)
        cand.insert_before(build_canonical_pre(cleaned, lang))
        cand.detach()

    # Pass B2: buttons near code + sibling language-label spans.
    # Only chrome-looking buttons (empty/short single-token/copy-run text) —
    # content buttons inside paragraphs keep their inner text.
    for b in [n for n in root.descendants_snapshot() if n.tag == "button"]:
        if b.parent is None or not _nearby_code_block(b):
            continue
        if b.has_ancestor_tag("p", "li"):
            continue  # inline keyword buttons inside prose are content
        btxt = b.text_content().strip()
        if not btxt or (len(btxt) <= 16 and " " not in btxt) \
                or btxt.lower() in ("copy", "run", "copy code"):
            b.detach()
    for s in [n for n in root.descendants_snapshot() if n.tag == "span"]:
        if s.parent is None:
            continue
        txt = s.text_content().strip()
        if not txt or len(txt) > 16 or " " in txt:
            continue
        if not all(c.isalnum() or c in "+#-" for c in txt):
            continue
        parent = s.parent
        if parent.type != ELEMENT or parent.tag == "pre":
            continue
        if parent.find_first("pre") is None:
            continue
        prev = s.prev_sibling()
        leftmost = True
        while prev is not None:
            if prev.type == TEXT and not prev.text.strip():
                prev = prev.prev_sibling()
                continue
            leftmost = False
            break
        if leftmost:
            s.detach()

    # Pass C: hljs header/toolbar chrome in code context
    for node in _post_order(root):
        if node.tag not in ("div", "button", "span") or node.parent is None:
            continue
        cls = (node.get("class") or "").lower()
        if not cls:
            continue
        if (("hljs" in cls and ("header" in cls or "toolbar" in cls))
                or "copy-button" in cls or "code-toolbar" in cls):
            cur = node.parent
            in_code = False
            while cur is not None:
                if cur.type == ELEMENT:
                    if cur.tag in ("pre", "figure"):
                        in_code = True
                        break
                    ccls = (cur.get("class") or "").lower()
                    if "code" in ccls or "highlight" in ccls:
                        in_code = True
                        break
                cur = cur.parent
            if in_code:
                node.detach()

    # Pass C1: lean-verso pre > code.block
    for code in [n for n in root.descendants_snapshot()
                 if n.tag == "code" and "block" in _tokens(n.get("class"))
                 and n.parent is not None and n.parent.type == ELEMENT
                 and n.parent.tag == "pre"]:
        pre = code.parent
        if pre.parent is None:
            continue
        raw = extract_text_with_lines(code)
        cleaned = trim_lines(dedent(raw))
        if not cleaned.strip():
            continue
        lang = _first_descendant_lang(code) or _ancestor_lang(pre)
        pre.insert_before(build_canonical_pre(cleaned, lang))
        pre.detach()

    # Pass C2: rewrite non-canonical language classes on <code>
    for node in _post_order(root):
        if node.tag != "code":
            continue
        cls = node.get("class")
        if not cls:
            continue
        if any(t.startswith("language-") or t.startswith("lang-")
               for t in cls.split()):
            continue
        lang = detect_lang_from_class(cls)
        if lang:
            node.set("class", f"language-{lang}")
            continue
        v = node.get("data-language")
        if v and v not in _NON_LANGS:
            node.set("class", f"language-{v}")

    # Pass C9: medium-style bare pre (single styled span, one line, no
    # code element, no language anywhere) gets a guessed language — the
    # keywordless fallback is "c" (elements--lazy-image corpus behavior)
    for pre in [n for n in root.descendants_snapshot() if n.tag == "pre"]:
        if pre.parent is None or pre.find_first("code") is not None:
            continue
        if detect_lang_from_class(pre.get("class") or ""):
            continue
        kids = pre.element_children()
        if len(kids) != 1 or kids[0].tag != "span" \
                or kids[0].element_children():
            continue
        text = pre.text_content().strip()
        if not text or "\n" in text or len(text) > 120:
            continue
        guess = "c"
        tl = text.lower()
        if re.search(r"\b(?:def |import |print\()", tl):
            guess = "python"
        elif re.search(r"\b(?:const |=>|function |console\.)", tl):
            guess = "javascript"
        pre.set("data-language", guess)

    # Pass D: every <pre> gets a single <code> child
    for node in _post_order(root):
        if node.tag != "pre":
            continue
        if any(k.type == ELEMENT and k.tag == "code" for k in node.children):
            continue
        text = node.text_content()
        if not text.strip():
            continue
        lang = _first_descendant_lang(node)
        node.clear_children()
        code = Node.element("code",
                            {"class": f"language-{lang}"} if lang else None)
        code.append(Node.text_node(text))
        node.append(code)
