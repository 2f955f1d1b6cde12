"""YouTube watch-page extractor (`src/extractors/youtube.rs`).

The reference marks YouTube ``prefers_async = true`` — its sync registry
NEVER selects it (`src/extractor.rs:619-630` skips async-preferred
extractors), because the valuable output (the transcript) needs a network
fetch the sync pipeline doesn't have. We mirror that exactly:
``youtube_can`` returns False so the batch registry falls through to
generic extraction, while the full sync extraction path + the
transcript/caption parsing helpers are implemented and unit-tested here,
ready for a fetch-enabled deployment (the batch Spark pipeline never does
per-document network fetches, so on-cluster this stays unselected).
"""

from __future__ import annotations

import html as _html
import json
import re
from typing import Optional

from ..dom.node import Node
from ..dom.parser import parse_html


def is_youtube_watch_url(url: str) -> bool:
    lower = (url or "").lower()
    return ("youtu.be/" in lower or "youtube.com/watch" in lower
            or "youtube.com/shorts/" in lower
            or "m.youtube.com/watch" in lower)


def extract_video_id(url: str) -> Optional[str]:
    """`src/extractors/youtube.rs:146-182`: youtu.be/<id>, /shorts/<id>,
    or ?v=<id>."""
    for marker in ("youtu.be/", "/shorts/"):
        idx = url.find(marker)
        if idx >= 0:
            rest = url[idx + len(marker):]
            vid = re.split(r"[?&/#]", rest, 1)[0]
            if vid:
                return vid
    if "?" in url:
        for pair in url.split("?", 1)[1].split("&"):
            if pair.startswith("v="):
                vid = pair[2:].split("#")[0]
                if vid:
                    return vid
    return None


def _meta_content(root: Node, attr: str, value: str) -> Optional[str]:
    for d in root.iter_elements():
        if d.tag == "meta" and d.get(attr) == value:
            v = (d.get("content") or "").strip()
            if v:
                return v
    return None


def _extract_title(root: Node) -> Optional[str]:
    t = _meta_content(root, "name", "title") \
        or _meta_content(root, "property", "og:title")
    if t:
        return t
    el = root.find_first("title")
    if el is not None:
        text = el.text_content().strip()
        if text:
            return text
    return None


def _extract_author(root: Node) -> Optional[str]:
    for d in root.iter_elements():
        if d.tag == "link" and d.get("itemprop") == "name":
            v = (d.get("content") or "").strip()
            if v:
                return v
    # owner/channel anchors (`src/extractors/youtube.rs:214-227`)
    for d in root.iter_elements():
        if d.tag == "a" and (d.get("href") or "").startswith("/@"):
            text = d.text_content().strip()
            if text:
                return text
    return None


def _extract_chapters(root: Node) -> list[str]:
    out = []
    for d in root.iter_elements():
        if d.tag == "timeline-chapter-view-model":
            h3 = d.find_first("h3")
            if h3 is not None:
                title = h3.text_content().strip()
                if title:
                    out.append(title)
    return out


def youtube_can(url: str, html: str) -> bool:
    """Always False on the sync/batch path — mirrors the reference's
    `prefers_async = true` + sync-registry skip (`src/extractor.rs:621`)."""
    return False


def youtube_extract_sync(html: str, url, collected, metadata):
    """Description-only sync output (`src/extractors/youtube.rs:54-125`):
    embedded player iframe + meta description + visible chapters."""
    if not is_youtube_watch_url(url or ""):
        return None
    root = parse_html(html)
    video_id = extract_video_id(url or "") or ""
    title = _extract_title(root)
    author = _extract_author(root)
    description = _meta_content(root, "name", "description") \
        or _meta_content(root, "property", "og:description")
    chapters = _extract_chapters(root)

    parts = []
    if video_id:
        parts.append(
            f'<iframe width="560" height="315" '
            f'src="https://www.youtube.com/embed/{video_id}" '
            f'title="YouTube video player" frameborder="0" '
            f'allow="accelerometer; autoplay; clipboard-write; '
            f'encrypted-media; gyroscope; picture-in-picture; web-share" '
            f'referrerpolicy="strict-origin-when-cross-origin" '
            f'allowfullscreen></iframe>')
    if description:
        # escape BEFORE inserting <br>: the entity-decoded attribute text is
        # untrusted page content and must not inject markup
        parts.append("<p>" + _html.escape(description).replace("\n", "<br>")
                     + "</p>")
    if chapters:
        parts.append("<h2>Chapters</h2><ul>" + "".join(
            "<li>" + _html.escape(c) + "</li>" for c in chapters) + "</ul>")
    overrides = {"site": "YouTube"}
    if title:
        overrides["title"] = title
    if author:
        overrides["author"] = author
    if description:
        overrides["description"] = description
    return "".join(parts), overrides


def youtube_extract(html: str, url, collected, metadata):
    """Registry entry point: never selected sync (can=False), kept for
    direct callers."""
    return youtube_extract_sync(html, url, collected, metadata)


# ------------------------------------------------------ transcript parsing

_P_RE = re.compile(r"(?s)<p\s+[^>]*>(.*?)</p>")
_TEXT_RE = re.compile(r"(?s)<text\s+[^>]*>(.*?)</text>")
_TAG_RE = re.compile(r"<[^>]+>")


def parse_transcript_response(json_body: str) -> Optional[str]:
    """InnerTube player response → transcript div
    (`src/extractors/youtube.rs:299-327`)."""
    try:
        v = json.loads(json_body)
    except ValueError:
        return None
    tracks = (((v.get("captions") or {})
               .get("playerCaptionsTracklistRenderer") or {})
              .get("captionTracks"))
    if not isinstance(tracks, list) or not tracks:
        return None
    track = next((t for t in tracks if t.get("languageCode") == "en"),
                 tracks[0])
    if not track.get("baseUrl"):
        return None
    text = v.get("transcript")
    if isinstance(text, str):
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        return ('<div class="transcript">'
                + "".join("<p>" + _html.escape(ln) + "</p>" for ln in lines)
                + "</div>")
    return None


def parse_caption_xml(xml: str) -> Optional[str]:
    """YouTube srv3 / timed-text XML → transcript HTML
    (`src/extractors/youtube.rs:330-372`)."""
    lines = []
    for m in _P_RE.finditer(xml):
        cleaned = _html.unescape(_TAG_RE.sub("", m.group(1))).strip()
        if cleaned:
            lines.append(cleaned)
    if not lines:
        for m in _TEXT_RE.finditer(xml):
            cleaned = _html.unescape(_TAG_RE.sub("", m.group(1))).strip()
            if cleaned:
                lines.append(cleaned)
    if not lines:
        return None
    return ('<div class="transcript">'
            + "".join("<p>" + _html.escape(ln) + "</p>" for ln in lines)
            + "</div>")
