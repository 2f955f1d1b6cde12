"""Vectorized extraction UDFs.

The whole per-document pipeline (SURVEY.md §2.1-§2.8) is fused into ONE
Arrow-batched pandas UDF: Spark sees ``string → struct`` with zero per-row
Python dispatch at the Spark level — batches cross the JVM↔Python boundary
once as Arrow record batches, and the Python loop inside the batch is
amortized (the reference's per-doc cost dominates; Arrow overhead is noise).

``trek_extract_udf`` is the scalar form for ``withColumn``;
``extract_map_in_pandas`` is the ``mapInPandas`` form that additionally emits
per-batch lineage/metrics columns (docs in/out, bytes, wall ms, failures) for
the metrics side-table required by the north rule.
"""

from __future__ import annotations

import time
import traceback
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..extract.pipeline import trek_parse

# Arrow-safe result struct (SURVEY.md §1.2 mapping of TrekResponse,
# reference src/types.rs:120-138). schema_org stays JSON-encoded string —
# deeply nested MapTypes are Arrow-hostile.
RESULT_SCHEMA = StructType([
    StructField("extracted_text", StringType()),    # markdown (primary)
    StructField("content_html", StringType()),
    StructField("plain_text", StringType()),        # src/html_to_text.rs
    StructField("title", StringType()),
    StructField("author", StringType()),
    StructField("site", StringType()),
    StructField("published", StringType()),
    StructField("description", StringType()),
    StructField("domain", StringType()),
    StructField("image", StringType()),
    StructField("favicon", StringType()),
    StructField("word_count", IntegerType()),
    StructField("extractor_type", StringType()),
    StructField("parse_time_ms", IntegerType()),
    StructField("error", StringType()),
    StructField("content_spans", ArrayType(StructType([
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
        StructField("kind", StringType()),
    ]))),
    StructField("meta_tags", ArrayType(StructType([
        StructField("name", StringType()),
        StructField("property", StringType()),
        StructField("content", StringType()),
    ]))),
])

_EMPTY = {f.name: None for f in RESULT_SCHEMA.fields}


_SPAN_TRIM = "#>-*`_ \t"


def compute_content_spans(source: str, markdown: str) -> list[dict]:
    """Best-effort offsets of retained content in the source text.

    For each markdown block, locate its leading text fragment in the source
    to get ``start``, then its trailing fragment (searched after the lead)
    to get ``end`` — both offsets are positions IN THE SOURCE, never
    markdown lengths (markdown length has no meaning as a source offset).
    Invariants, enforced structurally and pytest-checked over the corpus:

    * ``0 <= start < end <= len(source)`` for every span;
    * spans are non-overlapping and strictly monotonic — the cursor
      advances to each span's ``end``, so span *i+1* starts at or after
      span *i* ends.

    Blocks whose text can't be located (rewritten by normalization) are
    skipped; when only the lead matches, the span conservatively covers
    just the matched lead. This gives the per-turn span offsets the north
    star asks for without a full source-map through ~30 DOM passes.
    """
    return _spans_with_attempts(source, markdown)[0]


def _spans_with_attempts(source: str,
                         markdown: str) -> tuple[list[dict], int]:
    """(spans, attempted): ``attempted`` counts the markdown blocks whose
    probe was long enough to search for — the denominator of the span
    COVERAGE metric (spans silently skip blocks rewritten beyond
    recognition by normalization; coverage makes that skip rate an
    observable number instead of an assumption — see ``span_coverage``)."""
    spans: list[dict] = []
    attempted = 0
    cursor = 0
    if not source or not markdown:
        return spans, attempted
    n = len(source)
    for block in markdown.split("\n\n"):
        stripped = block.strip()
        probe = stripped.lstrip(_SPAN_TRIM)[:40]
        if len(probe) < 8:
            continue
        attempted += 1
        idx = source.find(probe, cursor)
        matched = len(probe)
        if idx < 0:
            # entity/escape differences — try a shorter probe
            probe = probe[:16]
            matched = len(probe)
            idx = source.find(probe, cursor)
            if idx < 0:
                continue
        # end: locate the block's trailing text fragment after the lead
        end = idx + matched
        tail = stripped.rstrip(_SPAN_TRIM + ".)]")[-40:].lstrip(_SPAN_TRIM)
        if len(tail) >= 8:
            for t in (tail, tail[-16:]):
                tidx = source.find(t, idx)
                if tidx >= 0:
                    end = max(end, tidx + len(t))
                    break
        end = min(end, n)
        if end <= idx:
            continue
        spans.append({"start": idx, "end": end, "kind": "block"})
        cursor = end  # non-overlap: next span starts at or after this end
    return spans, attempted


def span_coverage(docs) -> dict:
    """Corpus span-coverage stats over ``(source, markdown)`` pairs:
    ``blocks`` attempted, ``spanned`` located, ``coverage`` ratio.
    Tracked in bench (``span_coverage``) and floored in pytest so span
    quality is measured, not assumed."""
    blocks = 0
    spanned = 0
    for source, markdown in docs:
        spans, attempted = _spans_with_attempts(source or "", markdown or "")
        blocks += attempted
        spanned += len(spans)
    return {"blocks": blocks, "spanned": spanned,
            "coverage": round(spanned / blocks, 4) if blocks else None}


def extract_one(text: Optional[str], url: Optional[str] = None,
                with_spans: bool = True) -> dict:
    """One document → result dict matching RESULT_SCHEMA. Never raises."""
    if text is None or not text.strip():
        out = dict(_EMPTY)
        out["error"] = "empty_input"
        return out
    try:
        r = trek_parse(text, url or None)
        md = r["content_markdown"] or ""
        return {
            "extracted_text": md,
            "content_html": r["content_html"],
            "plain_text": r.get("content_text"),
            "title": r["title"], "author": r["author"], "site": r["site"],
            "published": r["published"], "description": r["description"],
            "domain": r["domain"], "image": r["image"],
            "favicon": r["favicon"],
            "word_count": int(r["word_count"] or 0),
            "extractor_type": r["extractor_type"],
            "parse_time_ms": int(r["parse_time_ms"] or 0),
            "error": None,
            "content_spans": compute_content_spans(text, md) if with_spans else [],
            "meta_tags": [
                {"name": t.get("name"), "property": t.get("property"),
                 "content": t.get("content")}
                for t in (r["meta_tags"] or [])
            ],
        }
    except Exception:
        out = dict(_EMPTY)
        out["error"] = traceback.format_exc(limit=3)
        return out


def extract_pdf_one(text: Optional[str]) -> dict:
    """PDF-branch result for a ``tool == 'pdf'`` turn (north-star "embedded
    PDFs via layout parse"; the reference has no PDF path — SURVEY §2 note).
    The string payload is the PDF bytes as Latin-1 (binary-safe in a string
    column) or base64. Never raises."""
    import base64
    import binascii

    from ..extract.pdf_text import looks_like_pdf, pdf_to_text
    from ..extract.utils import count_words

    if text is None or not text.strip():
        out = dict(_EMPTY)
        out["error"] = "empty_input"
        return out
    try:
        data = text.encode("latin-1", errors="replace")
        if not looks_like_pdf(data):
            try:
                decoded = base64.b64decode(text, validate=True)
            except (binascii.Error, ValueError):
                decoded = b""
            if looks_like_pdf(decoded):
                data = decoded
        t0 = time.time()
        plain = pdf_to_text(data) if looks_like_pdf(data) else ""
        out = dict(_EMPTY)
        out.update({
            "extracted_text": plain,
            "content_html": "",
            "plain_text": plain,
            "title": "", "author": "", "site": "", "published": "",
            "description": "", "domain": "", "image": "", "favicon": "",
            "word_count": count_words(plain),
            "extractor_type": "pdf-layout",
            "parse_time_ms": int((time.time() - t0) * 1000),
            "error": None if looks_like_pdf(data) else "not_a_pdf",
            "content_spans": [],
            "meta_tags": [],
        })
        return out
    except Exception:
        out = dict(_EMPTY)
        out["error"] = traceback.format_exc(limit=3)
        return out


def _extract_series(texts: pd.Series, urls: Optional[pd.Series],
                    tools: Optional[pd.Series] = None) -> pd.DataFrame:
    rows = []
    url_list = (list(urls) if urls is not None else [None] * len(texts))
    tool_list = (list(tools) if tools is not None else [None] * len(texts))
    for t, u, tool in zip(texts, url_list, tool_list):
        if tool == "pdf":
            rows.append(extract_pdf_one(t))
        else:
            rows.append(extract_one(t, u if isinstance(u, str) else None))
    return pd.DataFrame(rows, columns=[f.name for f in RESULT_SCHEMA.fields])


def make_trek_extract_udf():
    """Scalar pandas UDF: (text[, url]) → RESULT_SCHEMA struct."""

    @F.pandas_udf(RESULT_SCHEMA)
    def trek_extract(text: pd.Series, url: pd.Series) -> pd.DataFrame:
        return _extract_series(text, url)

    return trek_extract


METRICS_SCHEMA = StructType([
    StructField("part_id", IntegerType()),
    StructField("batch_idx", IntegerType()),
    StructField("doc_bytes", LongType()),
    StructField("wall_ms", LongType()),
])


def extract_map_in_pandas(iterator: Iterator[pd.DataFrame]
                          ) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: passes through key columns, adds result columns
    plus per-row lineage columns.

    Lineage is per-ROW (doc_bytes = this document's input size) except
    wall_ms, which is the wall time of the Arrow batch the row traveled in
    (stamped on each of its rows; aggregate with first() per
    (part_id, batch_idx)). Row-level counts (docs, failures) are derived by
    the job from count(*)/error — stamping batch totals on every row made
    the sums quadratic in batch size (round-1 ADVICE)."""
    import gc

    from pyspark import TaskContext
    ctx = TaskContext.get()
    part_id = ctx.partitionId() if ctx is not None else -1
    for batch_idx, pdf in enumerate(iterator):
        t0 = time.time()
        urls = pdf["url"] if "url" in pdf.columns else None
        tools = pdf["tool"] if "tool" in pdf.columns else None
        # DOM trees are parent<->child reference cycles: the cycle collector
        # pays bandwidth mid-parse for garbage we can free in one sweep at
        # batch end. One collect per batch, zero during.
        gc.disable()
        try:
            res = _extract_series(pdf["text"], urls, tools)
        finally:
            gc.enable()
            gc.collect()
        out = pd.concat(
            [pdf.drop(columns=["text"]).reset_index(drop=True), res], axis=1)
        out["part_id"] = part_id
        out["batch_idx"] = batch_idx
        out["doc_bytes"] = pdf["text"].str.len().fillna(0).astype("int64").values
        out["wall_ms"] = int((time.time() - t0) * 1000)
        yield out
