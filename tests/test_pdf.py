"""PDF layout-parse branch (north star: "embedded PDFs via layout parse";
the reference has no PDF path, so the contract here is our own: stdlib-only
content parsing, layout-ordered text, never-raises through the UDF)."""

import base64

import pytest

from trek_spark.extract import pdf_text as P
from trek_spark.spark.udf import extract_pdf_one


def test_simple_pdf_roundtrip():
    pdf = P.make_simple_pdf(["Hello PDF world", "Second line of text"])
    assert P.looks_like_pdf(pdf)
    assert P.pdf_to_text(pdf) == "Hello PDF world\nSecond line of text"


def test_flate_compressed_stream():
    pdf = P.make_simple_pdf(["Compressed content line", "Another one"],
                            compress=True)
    assert P.pdf_to_text(pdf) == "Compressed content line\nAnother one"


def test_string_escapes_and_octal():
    pdf = P.make_simple_pdf(["Parens (and) \\ backslash"])
    assert P.pdf_to_text(pdf) == "Parens (and) \\ backslash"
    assert P._decode_pdf_string(r"A\101\12B") == "AA\nB"
    assert P._decode_pdf_string(r"tab\there") == "tab\there"


def test_layout_order_is_top_down_not_stream_order():
    """Runs emitted bottom-up in the stream must come out top-down."""
    content = (b"BT /F1 12 Tf\n"
               b"1 0 0 1 72 100 Tm (bottom line) Tj\n"
               b"1 0 0 1 72 700 Tm (top line) Tj\n"
               b"ET")
    runs = P._stream_text_runs(content)
    assert runs == [(100.0, "bottom line"), (700.0, "top line")]
    # full pipeline orders by descending y
    pdf = P.make_simple_pdf(["x"])  # shape only; test grouping directly
    lines = {}
    for y, s in runs:
        lines.setdefault(y, []).append(s)
    ordered = [lines[k][0] for k in sorted(lines, reverse=True)]
    assert ordered == ["top line", "bottom line"]


def test_tj_kerning_becomes_space():
    content = b"BT 1 0 0 1 72 700 Tm [(Hel) -40 (lo) -300 (world)] TJ ET"
    assert P._stream_text_runs(content) == [(700.0, "Hello world")]


def test_hex_string_and_tstar():
    content = (b"BT 14 TL 1 0 0 1 72 700 Tm <48656C6C6F> Tj T* (next) Tj ET")
    assert P._stream_text_runs(content) == [(700.0, "Hello"),
                                            (686.0, "next")]


def test_garbage_never_raises():
    assert P.pdf_to_text(b"") == ""
    assert P.pdf_to_text(b"%PDF-1.4 truncated") == ""
    assert P.pdf_to_text(b"\x00\xff" * 100) == ""
    # corrupt flate body is skipped, not fatal
    bad = b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 4 >>\n" \
          b"stream\n\x00\x01\x02\x03\nendstream\nendobj\n"
    assert P.pdf_to_text(bad) == ""


def test_extract_pdf_one_latin1_payload():
    pdf = P.make_simple_pdf(["Report title", "Body of the report text"])
    r = extract_pdf_one(pdf.decode("latin-1"))
    assert r["error"] is None
    assert r["extracted_text"] == "Report title\nBody of the report text"
    assert r["extractor_type"] == "pdf-layout"
    assert r["word_count"] == 7


def test_extract_pdf_one_base64_payload():
    pdf = P.make_simple_pdf(["Base64 delivered content"])
    r = extract_pdf_one(base64.b64encode(pdf).decode("ascii"))
    assert r["error"] is None
    assert r["extracted_text"] == "Base64 delivered content"


def test_extract_pdf_one_not_a_pdf():
    r = extract_pdf_one("<p>this is html not a pdf</p>")
    assert r["error"] == "not_a_pdf"
    assert r["extracted_text"] == ""


@pytest.mark.parametrize("compress", [False, True])
def test_pdf_turns_through_spark_job(compress, tmp_path_factory):
    """tool == 'pdf' turns dispatch to the PDF branch inside the fused
    mapInPandas stage; HTML turns are unaffected."""
    import os

    from pyspark.sql import functions as F

    from trek_spark.spark.job import run_extraction_job
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-pdf", master="local[4]", shuffle_partitions=8)
    pdf_payload = P.make_simple_pdf(
        ["Quarterly report", "Revenue went up"],
        compress=compress).decode("latin-1")
    rows = [
        ("c1", 0, "user", "<html><body><p>please summarize the attached "
                          "report for me now</p></body></html>", None,
         "2024-01-01T00:00:00", "https://ex.example/a"),
        ("c1", 1, "tool", pdf_payload, "pdf",
         "2024-01-01T00:00:01", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string, url string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = str(tmp_path_factory.mktemp("pdfjob"))
    r = run_extraction_job(spark, df, out, num_partitions=4, part_buckets=4)
    assert r["rows"] == 2 and r["failures"] == 0
    got = {row.turn_idx: row for row in
           spark.read.parquet(os.path.join(out, "turns")).collect()}
    assert got[1].extractor_type == "pdf-layout"
    assert got[1].extracted_text == "Quarterly report\nRevenue went up"
    assert "summarize the attached" in got[0].extracted_text


def test_pdf_fuzz_never_raises():
    """Random PDF-shaped garbage (headers, stream markers, flate-ish
    bodies, truncations) must never raise — crawled PDFs are routinely
    malformed."""
    import random
    import zlib

    random.seed(7)
    pieces = [b"%PDF-1.4\n", b"stream\n", b"endstream", b"obj", b"endobj",
              b"<< /Filter /FlateDecode >>", b"<< /Length 99 >>",
              b"BT ", b"ET", b"(text) Tj", b"[(a) -300 (b)] TJ",
              b"1 0 0 1 72 700 Tm", b"T*", b"xref", b"%%EOF",
              zlib.compress(b"BT (z) Tj ET"), bytes(range(256))]
    for _ in range(500):
        n = random.randint(1, 12)
        doc = b"".join(random.choice(pieces) for _ in range(n))
        if random.random() < 0.5:
            doc = b"%PDF-" + doc
        if random.random() < 0.3:
            doc = doc[:random.randint(0, len(doc))]
        out = P.pdf_to_text(doc)
        assert isinstance(out, str)
        r = extract_pdf_one(doc.decode("latin-1"))
        assert r["error"] in (None, "not_a_pdf", "empty_input") \
            or "Traceback" not in (r["error"] or "")


def test_nested_dict_in_stream_dict_still_inflates():
    """/DecodeParms << ... >> nests a dictionary inside the stream dict;
    the balanced-dict backward scan must still see the OUTER dict's
    /FlateDecode (round-4 advice: the lazy `<<(.*?)>>` capture truncated
    at the nested dict's `>>` and silently skipped inflation)."""
    import zlib

    content = b"BT\n/F1 12 Tf\n1 0 0 1 72 760 Tm\n(Nested parms line) Tj\nET"
    body = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
           + b" /DecodeParms << /Predictor 1 /Columns 4 >>"
           b" /Filter /FlateDecode >>\nstream\n" + body
           + b"\nendstream\nendobj\n%%EOF\n")
    assert P.pdf_to_text(pdf) == "Nested parms line"
    # and an uncompressed stream with a nested dict still decodes as-is
    plain = (b"%PDF-1.4\n1 0 obj\n<< /Resources << /Font << /F1 5 0 R >>"
             b" >> /Length 40 >>\nstream\nBT (Plain nested) Tj ET"
             b"\nendstream\nendobj\n")
    assert P.pdf_to_text(plain) == "Plain nested"


def test_flate_bomb_is_skipped_not_inflated():
    """A KB-sized stream inflating past the 64 MiB cap is skipped whole
    (bomb defense) — and must not take executor-scale memory to decide."""
    import zlib

    bomb = zlib.compress(b"\x00" * (80 * 1024 * 1024), 9)  # ~80 MiB -> tiny
    ok = b"BT (Survivor text) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Length " + str(len(bomb)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + bomb
           + b"\nendstream\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(ok)).encode()
           + b" >>\nstream\n" + ok + b"\nendstream\nendobj\n")
    assert P.pdf_to_text(pdf) == "Survivor text"


def test_hex_string_adjacent_to_dict_close_still_inflates():
    """A hex string butted against the closing ``>>`` (``/ID<CDEF>>>``)
    makes a 3-'>' run; offset-by-offset pair scanning miscounted depth
    there and silently skipped the FlateDecode, emitting raw deflate
    bytes. Run-aligned tokenization must keep decoding (reference:
    stream dict parsing per PDF 32000-1 §7.3; trek has no PDF branch —
    north-star addition)."""
    import zlib

    content = b"BT (Hex id line) Tj ET"
    body = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(body)).encode()
           + b" /Filter /FlateDecode /ID<CDEF>>>stream\n" + body
           + b"\nendstream\nendobj\n%%EOF\n")
    assert P.pdf_to_text(pdf) == "Hex id line"
    # hex string at the very start of the dict too (run on the open side)
    pdf2 = (b"%PDF-1.4\n1 0 obj\n<</ID<AABB> /Length "
            + str(len(body)).encode()
            + b" /Filter /FlateDecode>>stream\n" + body
            + b"\nendstream\nendobj\n%%EOF\n")
    assert P.pdf_to_text(pdf2) == "Hex id line"
