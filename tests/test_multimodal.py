"""Multimodal plumbing tests: binary payload columns, Arrow batch decode
stubs, deterministic fake metadata."""

import pytest

from trek_spark.spark.multimodal import decode_stub, feature_stub


def test_decode_stub_deterministic():
    a = decode_stub(b"payload-bytes", "image")
    b = decode_stub(b"payload-bytes", "image")
    assert a == b
    assert a["n_bytes"] == 13
    assert a["width"] is not None and a["height"] is not None
    assert a["duration_ms"] is None  # images carry no duration


def test_decode_stub_media_types():
    audio = decode_stub(b"x", "audio")
    assert audio["mime"] == "audio/wav"
    assert audio["width"] is None and audio["duration_ms"] is not None


def test_feature_stub_unit_norm():
    v = feature_stub(b"abc", dim=16)
    assert len(v) == 16
    assert abs(sum(x * x for x in v) - 1.0) < 1e-6
    assert v == feature_stub(b"abc", dim=16)


@pytest.mark.usefixtures()
def test_attach_media_meta_spark():
    from trek_spark.spark.multimodal import (
        attach_media_meta,
        media_corpus_from_documents,
    )
    from trek_spark.spark.session import get_spark

    spark = get_spark("mm-pytest", master="local[2]", shuffle_partitions=2)
    try:
        media = media_corpus_from_documents(spark, "/root/testdata/sf0.001")
        out = attach_media_meta(media.limit(30))
        rows = out.collect()
        assert len(rows) == 30
        assert all(r.n_bytes > 0 and len(r.content_hash) == 16 for r in rows)
        types = {r.media_type for r in rows}
        assert types <= {"image", "audio", "video"}
    finally:
        spark.stop()
