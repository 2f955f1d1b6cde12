"""Site-specific extractor registry.

Mirrors the reference's ``ExtractorRegistry`` (`src/extractor.rs:619-646`,
registry order `src/extractors/mod.rs:46-96`): first matching extractor in
priority order wins; an extractor failure falls through to the generic path.

Extractors are ported incrementally — the conversation-shaped ones
(ChatGPT/Claude-style transcripts) matter most for the transcript graft.
Returns ``None`` when no extractor claims the document.
"""

from __future__ import annotations

from typing import Callable, Optional

# Each extractor: (name, can_extract(url, html) -> bool,
#                  extract(html, url, collected, metadata)
#                  -> (content_html, overrides) or None)
_REGISTRY: list[tuple[str, Callable, Callable]] = []


def register(name: str, can_extract: Callable, extract: Callable) -> None:
    _REGISTRY.append((name, can_extract, extract))


_BOOTSTRAPPED = False

# EXACT reference priority order (`src/extractors/mod.rs:50-93`). Dispatch is
# first-match-wins, so this list — not the per-module registration order — is
# behavioral: a document claimed by two extractors must dispatch to the one
# the reference would pick (e.g. mastodon's generator-meta match sits AFTER
# the news/knowledge family, at position 20).
PRIORITY_ORDER = [
    "x-article", "twitter", "x-oembed",          # X/Twitter family
    "reddit",
    "youtube",                                   # prefers_async placeholder
    "hackernews",
    "chatgpt", "claude", "grok", "gemini",       # AI chat assistants
    "github", "linkedin",                        # dev / code-hosting
    "threads", "bluesky",                        # other social timelines
    "medium", "c2_wiki", "substack", "nytimes", "wikipedia",  # news/knowledge
    "mastodon", "discourse",                     # generator-meta-matched
    "leetcode", "lwn",                           # long-tail dev/publishing
    "bbcode-data",                               # catch-all, LAST
]


def _bootstrap() -> None:
    global _BOOTSTRAPPED, _REGISTRY
    if _BOOTSTRAPPED:
        return
    _BOOTSTRAPPED = True
    from .sites import register_x_article
    register_x_article()
    from .conversations import register_x_family
    register_x_family()
    from .comments import register_comment_extractors
    register_comment_extractors()
    # youtube: prefers_async in the reference -> sync registry never
    # selects it (can_extract always False); registered for parity
    from .youtube import youtube_can, youtube_extract
    register("youtube", youtube_can, youtube_extract)
    from .conversations import register_all
    register_all()
    from .sites import register_site_extractors
    register_site_extractors()
    from .sites import bbcode_can, bbcode_extract
    register("bbcode-data", bbcode_can, bbcode_extract)
    # normalize to the reference order regardless of module import layout
    by_name = {name: entry for entry in _REGISTRY for name in [entry[0]]}
    missing = set(by_name) ^ set(PRIORITY_ORDER)
    if missing:  # a rename/addition must update PRIORITY_ORDER explicitly
        raise RuntimeError(f"extractor registry out of sync: {missing}")
    _REGISTRY[:] = [by_name[n] for n in PRIORITY_ORDER]


def try_extractors(html: str, url: Optional[str], collected, metadata):
    _bootstrap()
    for name, can_extract, extract in _REGISTRY:
        try:
            if not can_extract(url or "", html):
                continue
            result = extract(html, url, collected, metadata)
            if result is not None:
                content_html, overrides = result
                return content_html, name, overrides
        except Exception:
            # extractor failure ⇒ generic fallback (`src/lib.rs:183-193`)
            continue
    return None
