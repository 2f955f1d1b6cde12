"""Phase 1 — metadata extraction from collected head signals.

Priority chains and cleaning rules match the reference's
``MetadataExtractor`` (``src/metadata.rs:41-802``), itself Defuddle-parity:
title/author/site/published/description/image resolved from meta tags,
schema.org JSON-LD, and the document title, with placeholder rejection,
site-suffix title cleaning, and author-string cleanup.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import urlsplit

from .head_scan import CollectedData
from .utils import decode_html_entities

MONTHS = {
    "january": "01", "february": "02", "march": "03", "april": "04",
    "may": "05", "june": "06", "july": "07", "august": "08",
    "september": "09", "october": "10", "november": "11", "december": "12",
}

_SEPARATORS = r"[|\-–—/·]"
_SEP_POS_RE = re.compile(r"\s+[|\-–—/·]\s+")
_STRONG_SEP_RE = re.compile(r"\s+([|/·])\s+")
_DASH_SEP_RE = re.compile(r"\s+[-–—]\s+")
_URL_RE = re.compile(r"\(?\s*https?://\S+\s*\)?", re.I)
_AND_RE = re.compile(r",?\s+and\s+", re.I)
_TRAILING_SEP_RE = re.compile(r"\s*[-–—|]\s*$")
_DAY_FIRST_RE = re.compile(
    r"\b(\d{1,2})\s+(January|February|March|April|May|June|July|August|"
    r"September|October|November|December)\s+(\d{4})\b", re.I)
_MONTH_FIRST_RE = re.compile(
    r"\b(January|February|March|April|May|June|July|August|September|"
    r"October|November|December)\s+(\d{1,2}),?\s+(\d{4})\b", re.I)


def _host_of(url: str) -> str:
    try:
        host = urlsplit(url).hostname or ""
    except ValueError:
        return ""
    return host[4:] if host.startswith("www.") else host


def _word_count(s: str) -> int:
    return len(s.split())


def is_placeholder(s: str) -> bool:
    """Unresolved templates / no-alphanumeric strings (ref `src/metadata.rs:178-199`)."""
    if "{" in s or "}" in s:
        return True
    if len(s) >= 2 and s[0] == "#" and s[1].isascii() and s[1].isalpha():
        return True
    return not any(c.isalnum() for c in s)


def _first_valid(candidates) -> str:
    for get in candidates:
        v = get()
        if v and not is_placeholder(v):
            return v
    return ""


def meta_name(meta_tags: list, name: str) -> Optional[str]:
    lname = name.lower()
    for t in meta_tags:
        n = t.get("name")
        if n is not None and n.lower() == lname:
            v = t["content"].strip()
            if v:
                return v
    return None


def meta_property(meta_tags: list, prop: str) -> Optional[str]:
    lprop = prop.lower()
    for t in meta_tags:
        p = t.get("property")
        if p is not None and p.lower() == lprop:
            v = t["content"].strip()
            if v:
                return v
    return None


def meta_names(meta_tags: list, name: str) -> list[str]:
    lname = name.lower()
    out = []
    for t in meta_tags:
        n = t.get("name")
        if n is not None and n.lower() == lname:
            v = t["content"].strip()
            if v:
                out.append(v)
    return out


def meta_properties(meta_tags: list, prop: str) -> list[str]:
    lprop = prop.lower()
    out = []
    for t in meta_tags:
        p = t.get("property")
        if p is not None and p.lower() == lprop:
            v = t["content"].strip()
            if v:
                out.append(v)
    return out


def schema_property(data: list, path: str) -> Optional[str]:
    """Dotted-path walk over schema.org JSON, exact pass then fuzzy descent,
    ``[N]`` array indexing, results joined with ", " (ref `src/metadata.rs:263-339`)."""
    parts = path.split(".")

    def walk(node, props, exact, out):
        if not props:
            if isinstance(node, str):
                out.append(node)
            elif isinstance(node, dict):
                name = node.get("name")
                if isinstance(name, str):
                    out.append(name)
            return
        if isinstance(node, list):
            cur = props[0]
            if cur.startswith("[") and cur.endswith("]"):
                inner = cur[1:-1]
                if inner.isdigit():
                    idx = int(inner)
                    if 0 <= idx < len(node):
                        walk(node[idx], props[1:], exact, out)
                return
            for item in node:
                walk(item, props, exact, out)
        elif isinstance(node, dict):
            cur = props[0]
            if cur in node:
                walk(node[cur], props[1:], True, out)
            elif not exact:
                for v in node.values():
                    if isinstance(v, (dict, list)):
                        walk(v, props, False, out)

    results: list[str] = []
    for item in data:
        walk(item, parts, True, results)
    if not results:
        for item in data:
            walk(item, parts, False, results)
    seen = set()
    uniq = []
    for s in results:
        if s.strip() and s not in seen:
            seen.add(s)
            uniq.append(s)
    return ", ".join(uniq) if uniq else None


def get_site_name(schema_org_data: list, meta_tags: list) -> str:
    candidate = _first_valid([
        lambda: schema_property(schema_org_data, "publisher.name") or "",
        lambda: meta_property(meta_tags, "og:site_name") or "",
        lambda: meta_name(meta_tags, "og:site_name") or "",
        lambda: schema_property(schema_org_data, "WebSite.name") or "",
        lambda: schema_property(schema_org_data, "sourceOrganization.name") or "",
        lambda: meta_name(meta_tags, "copyright") or "",
        lambda: schema_property(schema_org_data, "copyrightHolder.name") or "",
        lambda: schema_property(schema_org_data, "isPartOf.name") or "",
        lambda: meta_name(meta_tags, "application-name") or "",
    ])
    if not candidate or _word_count(candidate) > 6:
        return ""
    return candidate


def _is_site_identifier(candidate: str, author_norm: str, site_norm: str,
                        domain_norm: str) -> bool:
    norm = candidate.strip().lower()
    if author_norm and norm == author_norm:
        return True
    if site_norm and norm == site_norm:
        return True
    if domain_norm:
        cand = "".join(c for c in norm if c.isascii() and c.isalnum())
        if cand == domain_norm:
            return True
    return False


def get_best_title(doc_title: Optional[str], schema_org_data: list,
                   meta_tags: list, domain: str, site_name: str) -> str:
    candidates: list[str] = []
    for c in (
        meta_property(meta_tags, "og:title"),
        meta_name(meta_tags, "twitter:title"),
        schema_property(schema_org_data, "headline"),
        meta_name(meta_tags, "title"),
        meta_name(meta_tags, "sailthru.title"),
        doc_title,
    ):
        if c:
            s = c.strip()
            if s and not is_placeholder(s):
                candidates.append(s)
    if not candidates:
        return ""

    author_meta = meta_property(meta_tags, "author") or meta_name(meta_tags, "author") or ""
    author_norm = author_meta.strip().lower()
    site_norm = site_name.strip().lower()
    if domain:
        dot = domain.rfind(".")
        stripped = (domain[:dot] if dot >= 0 else domain).lower()
        domain_norm = "".join(c for c in stripped if c.isascii() and c.isalnum())
    else:
        domain_norm = ""

    for c in candidates:
        if not _is_site_identifier(c, author_norm, site_norm, domain_norm):
            return c
    return candidates[0]


def _separator_positions(title: str, pattern: re.Pattern) -> list[tuple[int, int]]:
    return [(m.start(), m.end() - m.start()) for m in pattern.finditer(title)]


def _try_separator_split(title: str, pattern: re.Pattern, suffix_only: bool,
                         guard) -> Optional[tuple[str, str]]:
    positions = _separator_positions(title, pattern)
    if not positions:
        return None
    last = positions[-1]
    suffix_title = title[: last[0]].strip()
    suffix_site = title[last[0] + last[1]:].strip()
    if guard(_word_count(suffix_title), _word_count(suffix_site)):
        return suffix_title, suffix_site
    if not suffix_only:
        first = positions[0]
        prefix_site = title[: first[0]].strip()
        prefix_title = title[first[0] + first[1]:].strip()
        if guard(_word_count(prefix_title), _word_count(prefix_site)):
            return prefix_title, prefix_site
    return None


def clean_title(title: str, site_name: str) -> tuple[str, str]:
    """Strip site suffix/prefix from a title; returns (title, detected_site).
    Ref `src/metadata.rs:465-548`."""
    if not title:
        return title, ""

    if site_name and site_name.lower() != title.lower() and _word_count(site_name) <= 6:
        site_lower = site_name.lower()
        escaped = re.escape(site_name)
        suffix_re = re.compile(rf"\s*{_SEPARATORS}\s*{escaped}\s*$", re.I)
        if suffix_re.search(title):
            return suffix_re.sub("", title).strip(), site_name
        prefix_re = re.compile(rf"^\s*{escaped}\s*{_SEPARATORS}\s*", re.I)
        if prefix_re.search(title):
            return prefix_re.sub("", title).strip(), site_name

        positions = _separator_positions(title, _SEP_POS_RE)
        if positions:
            last = positions[-1]
            last_seg = title[last[0] + last[1]:].strip().lower()
            if last_seg and last_seg in site_lower:
                cut = last[0]
                for i in range(len(positions) - 2, -1, -1):
                    p = positions[i]
                    seg = title[p[0] + p[1]: cut].strip()
                    if _word_count(seg) > 3:
                        break
                    cut = p[0]
                return title[:cut].strip(), site_name
            first = positions[0]
            prefix_seg = title[: first[0]].strip().lower()
            if prefix_seg and prefix_seg in site_lower:
                cut = first[0] + first[1]
                for i in range(1, len(positions)):
                    p = positions[i]
                    seg = title[cut: p[0]].strip()
                    if _word_count(seg) > 3:
                        break
                    cut = p[0] + p[1]
                return title[cut:].strip(), site_name

    out = _try_separator_split(title, _STRONG_SEP_RE, False,
                               lambda t, s: s <= 3 and t >= 2 and t >= s * 2)
    if out is not None:
        return out
    out = _try_separator_split(title, _DASH_SEP_RE, True,
                               lambda t, s: s <= 2 and t >= 2 and t > s)
    if out is not None:
        return out
    return title.strip(), ""


def clean_author_string(s: str) -> str:
    if s[:3].lower() == "by ":
        s = s[3:]
    s = _URL_RE.sub("", s)
    s = _AND_RE.sub(", ", s)
    s = _TRAILING_SEP_RE.sub("", s)
    return s.strip()


def get_author(schema_org_data: list, meta_tags: list) -> str:
    single = _first_valid([
        lambda: meta_name(meta_tags, "sailthru.author") or "",
        lambda: meta_property(meta_tags, "article:author") or "",
        lambda: meta_property(meta_tags, "author") or "",
        lambda: meta_name(meta_tags, "author") or "",
        lambda: meta_name(meta_tags, "byl") or "",
        lambda: meta_name(meta_tags, "authorList") or "",
    ])
    if single:
        cleaned = clean_author_string(single)
        if cleaned:
            return cleaned

    citation = [s for s in meta_names(meta_tags, "citation_author") if not is_placeholder(s)]
    if not citation:
        citation = [s for s in meta_properties(meta_tags, "dc.creator") if not is_placeholder(s)]
    if citation:
        parts = []
        for s in citation:
            if "," not in s:
                parts.append(s.strip())
            else:
                last, _, first = s.partition(",")
                parts.append(f"{first.strip()} {last.strip()}")
        return ", ".join(parts)

    authors = schema_property(schema_org_data, "author.name") or \
        schema_property(schema_org_data, "author.[].name")
    if authors:
        parts = [p.strip().rstrip(",").strip() for p in authors.split(",")]
        parts = [p for p in parts if p and not is_placeholder(p)]
        if parts:
            seen = set()
            uniq = [p for p in parts if not (p in seen or seen.add(p))]
            return ", ".join(uniq[:10])
    return ""


def get_description(schema_org_data: list, meta_tags: list) -> str:
    return _first_valid([
        lambda: meta_name(meta_tags, "description") or "",
        lambda: meta_property(meta_tags, "description") or "",
        lambda: meta_property(meta_tags, "og:description") or "",
        lambda: schema_property(schema_org_data, "description") or "",
        lambda: meta_name(meta_tags, "twitter:description") or "",
        lambda: meta_name(meta_tags, "sailthru.description") or "",
    ])


def extract_image(schema_org_data: list, meta_tags: list) -> str:
    v = meta_property(meta_tags, "og:image")
    if v:
        return v
    v = meta_name(meta_tags, "twitter:image")
    if v:
        return v
    v = schema_property(schema_org_data, "image.url")
    if v:
        return v
    for item in schema_org_data:
        if not isinstance(item, dict):
            continue
        image = item.get("image")
        if image is None:
            continue
        if isinstance(image, str):
            return image
        if isinstance(image, dict):
            url = image.get("url")
            if isinstance(url, str):
                return url
        if isinstance(image, list) and image:
            first = image[0]
            if isinstance(first, str):
                return first
            if isinstance(first, dict):
                url = first.get("url")
                if isinstance(url, str):
                    return url
    return meta_name(meta_tags, "sailthru.image.full") or ""


def get_published(schema_org_data: list, meta_tags: list) -> str:
    return _first_valid([
        lambda: schema_property(schema_org_data, "datePublished") or "",
        lambda: meta_name(meta_tags, "publishDate") or "",
        lambda: meta_property(meta_tags, "article:published_time") or "",
        lambda: meta_name(meta_tags, "sailthru.date") or "",
        lambda: meta_name(meta_tags, "publish_date") or "",
    ])


def parse_date_text(text: str) -> Optional[str]:
    m = _DAY_FIRST_RE.search(text)
    if m:
        day = m.group(1).zfill(2)
        month = MONTHS[m.group(2).lower()]
        return f"{m.group(3)}-{month}-{day}T00:00:00+00:00"
    m = _MONTH_FIRST_RE.search(text)
    if m:
        month = MONTHS[m.group(1).lower()]
        day = m.group(2).zfill(2)
        return f"{m.group(3)}-{month}-{day}T00:00:00+00:00"
    return None


def extract_metadata(data: CollectedData, url: Optional[str]) -> dict:
    """CollectedData → metadata dict (ref `src/metadata.rs:41-166`)."""
    md = {
        "title": "", "description": "", "domain": "", "favicon": "",
        "image": "", "published": "", "author": "", "site": "",
        "word_count": 0, "schema_org_data": data.schema_org_data,
        "mini_app_embed": data.mini_app_embed,
    }
    if url:
        md["domain"] = _host_of(url)

    cand = (meta_property(data.meta_tags, "og:url")
            or meta_property(data.meta_tags, "twitter:url")
            or schema_property(data.schema_org_data, "url")
            or data.canonical)
    document_domain = _host_of(cand) if cand else ""

    site_name = get_site_name(data.schema_org_data, data.meta_tags)

    doc_title = decode_html_entities(data.title) if data.title is not None else None
    best_title = get_best_title(doc_title, data.schema_org_data, data.meta_tags,
                                md["domain"], site_name)
    cleaned_title, detected_site = clean_title(best_title, site_name)
    md["title"] = cleaned_title

    author = get_author(data.schema_org_data, data.meta_tags)
    md["author"] = author
    author_as_site = author if (author and "," not in author) else ""
    md["site"] = site_name or detected_site or author_as_site or document_domain or ""

    md["description"] = get_description(data.schema_org_data, data.meta_tags)
    md["published"] = get_published(data.schema_org_data, data.meta_tags)
    md["image"] = extract_image(data.schema_org_data, data.meta_tags)
    if data.favicon:
        md["favicon"] = data.favicon
    return md
