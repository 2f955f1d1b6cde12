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


def test_decode_headers_real_formats():
    """Header decode is real, not a fake: hand-built payloads of each
    format parse to their exact declared dimensions/durations."""
    import struct
    from trek_spark.spark.multimodal import (
        decode_headers, synth_bmp, synth_wav,
    )
    # PNG
    png = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00")
    assert decode_headers(png) == {"mime": "image/png", "width": 640,
                                   "height": 480, "duration_ms": None}
    # GIF
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert decode_headers(gif)["width"] == 320
    assert decode_headers(gif)["mime"] == "image/gif"
    # BMP (via the synthesizer)
    bmp = synth_bmp(100, 50, b"pixels")
    out = decode_headers(bmp)
    assert (out["mime"], out["width"], out["height"]) == ("image/bmp", 100, 50)
    # JPEG with SOF0
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 15) + b"JFIF\x00" + b"\x00" * 8
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 768, 1024) + b"\x03" + b"\x00" * 9
            + b"\xff\xd9")
    out = decode_headers(jpeg)
    assert (out["mime"], out["width"], out["height"]) == ("image/jpeg", 1024, 768)
    # WAV (via the synthesizer)
    wav = synth_wav(duration_ms=1500, byte_rate=8000)
    out = decode_headers(wav)
    assert out["mime"] == "audio/wav"
    assert out["duration_ms"] == 1500
    # unrecognized bytes -> None (stub fallback path)
    assert decode_headers(b"not a media file") is None


def test_media_corpus_exercises_real_decoder():
    from pyspark.sql import functions as F
    from trek_spark.spark.multimodal import (
        attach_media_meta, media_corpus_from_documents,
    )
    from trek_spark.spark.session import get_spark
    spark = get_spark("pytest-mm", master="local[4]", shuffle_partitions=8)
    try:
        media = media_corpus_from_documents(spark, "/root/testdata/sf0.001")
        meta = attach_media_meta(media)
        rows = meta.groupBy("media_type", "mime").count().collect()
        by_type = {(r.media_type, r.mime) for r in rows}
        assert ("image", "image/bmp") in by_type   # real BMP header decode
        assert ("audio", "audio/wav") in by_type   # real WAV header decode
        # image dims come from the header, derived from doc_id
        img = meta.filter(F.col("media_type") == "image") \
            .select("media_id", "width", "height").first()
        assert img.width == 16 + img.media_id % 64
        assert img.height == 16 + img.media_id % 48
        # audio duration from the RIFF data chunk
        aud = meta.filter(F.col("media_type") == "audio").first()
        assert aud.duration_ms is not None and aud.duration_ms >= 100
    finally:
        spark.stop()


def test_resize_and_frame_sample_plumbing():
    from pyspark.sql import functions as F
    from trek_spark.spark.multimodal import (
        decode_headers, media_corpus_from_documents, resize_images,
        sample_video_frames,
    )
    from trek_spark.spark.session import get_spark
    spark = get_spark("pytest-mm2", master="local[4]", shuffle_partitions=8)
    try:
        # deterministic slice by KEY, not limit(): the r9 scale-adaptive
        # widening in media_corpus_from_documents permutes row placement,
        # so limit()/first() picked an arbitrary subset/row
        media = media_corpus_from_documents(spark, "/root/testdata/sf0.001") \
            .filter(F.col("media_id") < 60)
        resized = resize_images(media, 224, 224)
        img = resized.filter(F.col("media_type") == "image") \
            .orderBy("media_id").select("resized").first()
        meta = decode_headers(bytes(img.resized))
        assert (meta["width"], meta["height"]) == (224, 224)
        # non-images pass through with resized = null
        assert resized.filter((F.col("media_type") != "image")
                              & F.col("resized").isNotNull()).count() == 0

        frames = sample_video_frames(media, n_frames=3)
        n_videos = media.filter(F.col("media_type") == "video").count()
        assert frames.count() == 3 * n_videos
        # media_id 2: kind==2 with (2//3)%2==0 -> the raw-bytes stub
        # video path, whose sampled frames surface as image/bmp fakes
        fr = frames.filter(F.col("media_id") == 2) \
            .orderBy("frame_idx").first()
        fm = decode_headers(bytes(fr.frame))
        assert fm is not None and fm["mime"] == "image/bmp"
    finally:
        spark.stop()


def test_real_bmp_resize_and_features():
    """Pixel-level ops are REAL for 24-bit BMP: nearest-neighbor resize
    produces a decodable image of the target size whose pixels come from
    the source (uniform image stays uniform), and features reflect actual
    content (uniform white vs uniform black differ deterministically)."""
    from trek_spark.spark.multimodal import (
        bmp_features, decode_headers, resize_bmp, synth_bmp_pixels,
    )
    white = synth_bmp_pixels(32, 24, b"\xff")
    black = synth_bmp_pixels(32, 24, b"\x00")
    r = resize_bmp(white, 10, 8)
    assert decode_headers(r) == {"mime": "image/bmp", "width": 10,
                                 "height": 8, "duration_ms": None}
    # resized white image is still all-white in its pixel rows
    fw = bmp_features(r)
    assert fw[:3] == [1.0, 1.0, 1.0]       # mean B,G,R
    assert fw[-1] == 1.0                   # all pixels in the top lum bin
    fb = bmp_features(black)
    assert fb[:3] == [0.0, 0.0, 0.0]
    assert fb[3] == 1.0                    # all pixels in the bottom bin


def test_real_wav_clip_and_features():
    """PCM WAV ops are REAL: clipping halves the duration on block
    boundaries and re-decodes; RMS features separate silence from signal."""
    from trek_spark.spark.multimodal import (
        clip_wav, decode_headers, synth_wav, wav_features,
    )
    loud = synth_wav(1000, samples=bytes(range(0, 256, 8)))
    quiet = synth_wav(1000)  # PCM-8 silence (0x80)
    c = clip_wav(loud, 0, 500)
    assert decode_headers(c)["duration_ms"] == 500
    rms_loud = wav_features(loud)
    rms_quiet = wav_features(quiet)
    assert all(v == 0.0 for v in rms_quiet)
    assert all(v > 0.1 for v in rms_loud)


def test_attach_features_and_clip_audio_spark():
    """DataFrame-level feature/clip stages run Arrow-batched over the
    synthetic corpus; image/audio rows get REAL content features."""
    from pyspark.sql import functions as F

    from trek_spark.spark.multimodal import (
        attach_features, clip_audio, media_corpus_from_documents,
    )
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-mm-feat", master="local[4]",
                      shuffle_partitions=8)
    media = media_corpus_from_documents(spark, "/root/testdata/sf0.001")
    feats = attach_features(media)
    rows = feats.select("media_id", "media_type",
                        F.size("features").alias("d")).collect()
    assert rows and all(r.d == 16 for r in rows)

    clipped = clip_audio(media, 0, 50)
    got = clipped.select("media_type", "clipped").collect()
    for r in got:
        if r.media_type == "audio":
            assert r.clipped is not None and r.clipped[:4] == b"RIFF"
        else:
            assert r.clipped is None


def test_png_roundtrip_paeth():
    """synth_png Paeth-filters EVERY row; decode must invert it exactly —
    byte-identical pixel recovery for both RGB and RGBA."""
    from trek_spark.spark.multimodal import png_decode_pixels, synth_png

    seed = bytes(range(256))
    for alpha in (False, True):
        ch = 4 if alpha else 3
        png = synth_png(13, 7, seed, alpha=alpha)
        w, h, got_ch, px = png_decode_pixels(png)
        assert (w, h, got_ch) == (13, 7, ch)
        stride = 13 * ch
        expect = (seed * (stride * 7 // len(seed) + 1))[:stride * 7]
        assert px == expect


def test_png_decode_all_filter_types():
    """Hand-encode one PNG whose five rows use filters 0..4; the decoder
    must reconstruct the original pixels for every filter type."""
    import struct
    import zlib

    from trek_spark.spark.multimodal import (
        _paeth_predict, png_decode_pixels,
    )

    w, h, ch = 5, 5, 3
    stride = w * ch
    pixels = bytes((y * stride + x) * 37 % 256
                   for y in range(h) for x in range(stride))
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        row = pixels[y * stride:(y + 1) * stride]
        f = y  # row y gets filter type y
        raw.append(f)
        for x in range(stride):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - left) & 0xFF
            elif f == 2:
                v = (row[x] - up) & 0xFF
            elif f == 3:
                v = (row[x] - ((left + up) >> 1)) & 0xFF
            else:
                v = (row[x] - _paeth_predict(left, up, ul)) & 0xFF
            raw.append(v)
        prev = bytearray(row)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    got = png_decode_pixels(png)
    assert got is not None and got[3] == pixels


def test_png_features_and_resize():
    from trek_spark.spark.multimodal import (
        decode_headers, png_decode_pixels, png_features, resize_png,
        synth_png,
    )

    white = synth_png(32, 24, b"\xff")
    f = png_features(white)
    assert len(f) == 16
    assert f[0] == f[1] == f[2] == 1.0       # mean B/G/R saturated
    assert f[-1] == 1.0                       # all pixels in top lum bin

    r = resize_png(synth_png(32, 24, bytes(range(96))), 10, 8)
    assert decode_headers(r) == {"mime": "image/png", "width": 10,
                                 "height": 8, "duration_ms": None}
    w, h, ch, px = png_decode_pixels(r)
    assert (w, h, ch) == (10, 8, 3) and len(px) == 10 * 8 * 3


def test_png_decode_rejects_unsupported():
    """Interlaced / paletted / corrupt-IDAT PNGs return None (stub path),
    never garbage pixels."""
    import struct
    import zlib

    from trek_spark.spark.multimodal import png_decode_pixels, synth_png

    good = synth_png(8, 8, b"\x42")
    assert png_decode_pixels(good) is not None
    # corrupt the IDAT payload
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    assert png_decode_pixels(bytes(bad)) is None

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    # palette color type (3) is unsupported → None
    pal = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00" * 20))
           + chunk(b"IEND", b""))
    assert png_decode_pixels(pal) is None


def test_media_corpus_emits_pngs():
    """Round-5: image rows alternate BMP/PNG containers; BOTH real pixel
    decoders run on corpus data and PNG rows get REAL (non-stub) features
    — a white-seeded check distinguishes real stats from the hash fake."""
    from pyspark.sql import functions as F

    from trek_spark.spark.multimodal import (
        attach_media_meta, media_corpus_from_documents, png_features,
    )
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-mm-png", master="local[4]",
                      shuffle_partitions=8)
    try:
        media = media_corpus_from_documents(spark, "/root/testdata/sf0.001")
        meta = attach_media_meta(media)
        by_type = {(r.media_type, r.mime)
                   for r in meta.groupBy("media_type", "mime").count()
                   .collect()}
        assert ("image", "image/png") in by_type
        assert ("image", "image/bmp") in by_type
        png_row = meta.filter(F.col("mime") == "image/png") \
            .select("media_id", "payload", "width", "height").first()
        assert png_row.width == 16 + png_row.media_id % 64
        assert png_features(bytes(png_row.payload)) is not None
    finally:
        spark.stop()


def test_png_roundtrip_property():
    """Property: for arbitrary dimensions and seed bytes, synth_png →
    png_decode_pixels recovers the exact pixel bytes (Paeth filtering on
    every row is lossless), and resize preserves decodability."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trek_spark.spark.multimodal import png_decode_pixels, synth_png

    @settings(max_examples=60, deadline=None)
    @given(w=st.integers(1, 40), h=st.integers(1, 40),
           seed=st.binary(min_size=1, max_size=64),
           alpha=st.booleans())
    def prop(w, h, seed, alpha):
        ch = 4 if alpha else 3
        png = synth_png(w, h, seed, alpha=alpha)
        dec = png_decode_pixels(png)
        assert dec is not None
        gw, gh, gch, px = dec
        assert (gw, gh, gch) == (w, h, ch)
        stride = w * ch
        expect = (seed * (stride * h // len(seed) + 1))[:stride * h]
        assert px == expect

    prop()


def test_png_idat_bomb_capped():
    """A PNG declaring 4x4 whose IDAT inflates to 100 MB must cost at
    most the declared pixel-array size, and decode (pixels beyond the
    declared size are never materialized)."""
    import struct
    import zlib

    from trek_spark.spark.multimodal import png_decode_pixels

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    w = h = 4
    stride = w * 3
    legit = bytearray()
    for _y in range(h):
        legit.append(0)
        legit += b"\x7f" * stride
    raw = bytes(legit) + b"\x00" * (100 * 1024 * 1024)  # bomb tail
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 9))
           + chunk(b"IEND", b""))
    dec = png_decode_pixels(png)
    assert dec is not None
    gw, gh, ch, px = dec
    assert (gw, gh, ch) == (4, 4, 3) and px == b"\x7f" * (stride * h)


def test_jpeg_roundtrip_property():
    """Property: synth_jpeg → jpeg_decode_pixels recovers the pixels
    within a small per-pixel tolerance for arbitrary dimensions and
    seeds: the all-ones quant rounds 63 AC coefficients by ≤0.5 each,
    which the (orthonormal) IDCT can concentrate to a few counts on one
    pixel — observed max 2, asserted ≤3. Same honesty standard as the
    PNG property test; JPEG is lossy by design, so the bound is
    tight-tolerance, not byte-exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trek_spark.spark.multimodal import jpeg_decode_pixels, synth_jpeg

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 33), h=st.integers(1, 33),
           seed=st.binary(min_size=1, max_size=64))
    def prop(w, h, seed):
        jp = synth_jpeg(w, h, seed)
        dec = jpeg_decode_pixels(jp)
        assert dec is not None
        gw, gh, gch, px = dec
        assert (gw, gh, gch) == (w, h, 1)
        expect = (seed * (w * h // len(seed) + 1))[:w * h]
        assert max(abs(a - b) for a, b in zip(px, expect)) <= 3

    prop()


def test_jpeg_decode_rejects_out_of_scope():
    """Color/progressive/DRI/truncated streams return None (stub path),
    never raise; the SOF pixel ceiling caps attacker-declared sizes."""
    import struct as _s

    from trek_spark.spark.multimodal import (
        _JPEG_MAX_PIXELS,
        jpeg_decode_pixels,
        synth_jpeg,
    )

    good = synth_jpeg(16, 16, b"seed")
    assert jpeg_decode_pixels(good) is not None
    assert jpeg_decode_pixels(b"not a jpeg") is None
    assert jpeg_decode_pixels(good[:40]) is None
    # rewrite SOF0 to declare 3 components (color): out of scope
    i = good.find(b"\xff\xc0")
    body = bytearray(good)
    body[i + 9] = 3
    assert jpeg_decode_pixels(bytes(body)) is None
    # progressive SOF2 marker: out of scope
    body = bytearray(good)
    body[i + 1] = 0xC2
    assert jpeg_decode_pixels(bytes(body)) is None
    # attacker-declared giant dimensions must be capped before any
    # allocation (the entropy data cannot be that big anyway)
    body = bytearray(good)
    body[i + 5:i + 9] = _s.pack(">HH", 30000, 30000)
    assert 30000 * 30000 > _JPEG_MAX_PIXELS
    assert jpeg_decode_pixels(bytes(body)) is None


def test_jpeg_features_resize_and_corpus():
    """attach_features computes REAL pixel features for JPEG payloads
    (shared feature space: grayscale ⇒ equal channel means + luminance
    histogram), resize re-encodes decodably, and the synthetic corpus
    emits at least one JPEG image row."""
    from trek_spark.spark.multimodal import (
        feature_stub,
        jpeg_decode_pixels,
        jpeg_features,
        resize_stub,
        synth_jpeg,
    )

    jp = synth_jpeg(24, 18, b"\x10\x80\xf0corpus")
    f = jpeg_features(jp)
    assert f is not None and len(f) == 16
    assert f[0] == f[1] == f[2]  # grayscale channel means equal
    assert abs(sum(f[3:]) - 1.0) < 1e-6  # histogram is a distribution
    assert feature_stub(jp) == f  # the real path wins over the stub
    rz = resize_stub(jp, 12, 10)
    dec = jpeg_decode_pixels(rz)
    assert dec is not None and (dec[0], dec[1]) == (12, 10)


def test_media_corpus_emits_jpegs(tmp_path):
    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        media_corpus_from_documents,
    )
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-mm-jpeg", master="local[2]",
                      shuffle_partitions=4)
    rows = [(i, f"document number {i} body text for media synth") for i
            in range(24)]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    media = media_corpus_from_documents(spark, str(tmp_path)).collect()
    jpegs = [r for r in media
             if r.media_type == "image" and bytes(r.payload[:2]) == b"\xff\xd8"]
    assert jpegs, "corpus rotation must emit JPEG images"
    assert all(jpeg_decode_pixels(bytes(r.payload)) is not None
               for r in jpegs)


def test_jpeg_color_roundtrip_property():
    """Property: 4:4:4 color encode → decode recovers RGB within ±3 per
    channel (all-ones quant: YCbCr round-trip costs ~2 from the two
    integer roundings, DCT coefficient rounding up to ~2-3 more —
    observed max 3, asserted ≤5)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        synth_jpeg_color,
    )

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 20), h=st.integers(1, 20),
           seed=st.binary(min_size=3, max_size=64))
    def prop(w, h, seed):
        need = w * h * 3
        expect = (seed * (need // len(seed) + 1))[:need]
        dec = jpeg_decode_pixels(synth_jpeg_color(w, h, seed, (1, 1)))
        assert dec is not None
        gw, gh, gch, px = dec
        assert (gw, gh, gch) == (w, h, 3)
        assert max(abs(a - b) for a, b in zip(px, expect)) <= 5

    prop()


def test_jpeg_subsampled_color_known_answer():
    """4:2:0 and 4:2:2 with a flat color: box-average chroma
    downsampling is exact on constant input, so the decode must match
    the color within the transform tolerance everywhere."""
    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        synth_jpeg_color,
    )

    flat = bytes([200, 64, 30]) * (32 * 24)
    for samp in ((2, 2), (2, 1), (1, 2)):
        dec = jpeg_decode_pixels(synth_jpeg_color(32, 24, flat, samp))
        assert dec is not None and dec[:3] == (32, 24, 3)
        px = dec[3]
        err = max(max(abs(px[i * 3] - 200), abs(px[i * 3 + 1] - 64),
                      abs(px[i * 3 + 2] - 30)) for i in range(32 * 24))
        assert err <= 3, (samp, err)


def test_jpeg_color_features_and_corpus_rotation(tmp_path):
    """Color JPEGs produce real (non-equal-channel) features; the media
    corpus emits both grayscale and color JPEG rows."""
    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        jpeg_features,
        media_corpus_from_documents,
        synth_jpeg_color,
    )
    from trek_spark.spark.session import get_spark

    f = jpeg_features(synth_jpeg_color(24, 18, b"\x10\x80\xf0col", (2, 2)))
    assert f is not None and len(f) == 16
    assert not (f[0] == f[1] == f[2])  # chroma survives decode

    spark = get_spark("pytest-mm-jpegc", master="local[2]",
                      shuffle_partitions=4)
    rows = [(i, f"document number {i} body text for media synth") for i
            in range(60)]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    media = media_corpus_from_documents(spark, str(tmp_path)).collect()
    jpegs = [bytes(r.payload) for r in media
             if r.media_type == "image" and bytes(r.payload[:2]) == b"\xff\xd8"]
    chans = {jpeg_decode_pixels(p)[2] for p in jpegs}
    assert chans == {1, 3}, chans  # both rotations present and decodable


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn streams (ubiquitous in crawled JPEGs): byte realign +
    predictor reset at every restart, RSTn number cycling past 8
    markers, both grayscale and subsampled color; a wrong RSTn number
    is rejected (None), never misdecoded."""
    import hashlib

    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        synth_jpeg,
        synth_jpeg_color,
    )

    seed = hashlib.sha256(b"dri-test").digest()
    w, h = 40, 24  # 15 MCUs -> ri=1 emits 14 restarts (full RSTn cycle)
    pat = (seed * (w * h // len(seed) + 1))[:w * h]
    for ri in (1, 2, 7):
        dec = jpeg_decode_pixels(synth_jpeg(w, h, seed,
                                            restart_interval=ri))
        assert dec is not None and dec[:3] == (w, h, 1)
        assert max(abs(a - b) for a, b in zip(dec[3], pat)) <= 3
    flat = bytes([10, 200, 90]) * (48 * 32)
    dec = jpeg_decode_pixels(
        synth_jpeg_color(48, 32, flat, (2, 2), restart_interval=2))
    assert dec is not None and dec[:3] == (48, 32, 3)
    px = dec[3]
    assert max(max(abs(px[i * 3] - 10), abs(px[i * 3 + 1] - 200),
                   abs(px[i * 3 + 2] - 90)) for i in range(48 * 32)) <= 5
    bad = bytearray(synth_jpeg(w, h, seed, restart_interval=2))
    i = bad.find(b"\xff\xd0")
    assert i >= 0
    bad[i + 1] = 0xD5  # out-of-sequence restart number
    assert jpeg_decode_pixels(bytes(bad)) is None


def test_jpeg_progressive_roundtrip():
    """SOF2 progressive (spectral selection + successive approximation,
    the script real encoders emit): DC first at Al=1 → DC refine →
    per-component AC first → AC refine. Gray ≤3, 4:4:4 color ≤5 —
    same bounds as baseline."""
    import hashlib

    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        synth_jpeg_progressive,
    )

    seed = hashlib.sha256(b"progressive-test").digest()
    for (w, h) in [(8, 8), (24, 17), (13, 9), (1, 1)]:
        pat = (seed * (w * h // len(seed) + 1))[:w * h]
        dec = jpeg_decode_pixels(synth_jpeg_progressive(w, h, seed))
        assert dec is not None and dec[:3] == (w, h, 1)
        assert max(abs(a - b) for a, b in zip(dec[3], pat)) <= 3
    need = 16 * 12 * 3
    pat = (seed * (need // len(seed) + 1))[:need]
    dec = jpeg_decode_pixels(
        synth_jpeg_progressive(16, 12, seed, color=True))
    assert dec is not None and dec[:3] == (16, 12, 3)
    assert max(abs(a - b) for a, b in zip(dec[3], pat)) <= 5


def test_jpeg_progressive_ac_protocol_coefficient_level():
    """The AC refinement correction-bit protocol (G.1.2.3) round-trips
    EXACTLY at the coefficient level — including the paths a natural
    image rarely hits: ZRL inside a refinement scan (>15 zero-history
    gap before a newly-significant ±1), correction bits queued across
    ZRL, interleaved significant/new coefficients, dense and random
    bands."""
    import random

    from trek_spark.spark import multimodal as M

    ac_codes = M._huff_codes(M._AC_LUM_BITS, M._AC_LUM_VALS)
    ac_dec = M._huff_decode_table(M._AC_LUM_BITS, M._AC_LUM_VALS)

    def roundtrip(zz):
        bw = M._BitWriter()
        M._encode_ac_first_block(bw, zz, 1, ac_codes)
        br = M._BitReader(bw.flush() + b"\xff\xd9", 0)
        got = [0] * 64
        M._ac_first(br, ac_dec, got, 1, 63, 1, 0)
        bw2 = M._BitWriter()
        M._encode_ac_refine_block(bw2, zz, 0, ac_codes)
        br2 = M._BitReader(bw2.flush() + b"\xff\xd9", 0)
        M._ac_refine(br2, ac_dec, got, 1, 63, 0, 0)
        got[0] = 0
        want = zz[:]
        want[0] = 0
        return got, want

    cases = []
    z = [0] * 64; z[0] = 100; z[2] = 5; z[40] = 1; cases.append(z)
    z = [0] * 64; z[0] = -7; z[1] = -4; z[35] = -1; z[63] = 1
    cases.append(z)
    z = [0] * 64; z[0] = 3; z[3] = 1; z[25] = -1; z[60] = 1
    cases.append(z)
    z = [0] * 64; z[0] = 50; z[5] = 9; z[30] = -3; z[50] = 1
    cases.append(z)
    z = [0] * 64; z[0] = 50; z[2] = 8; z[3] = -9; z[45] = 1; z[46] = 2
    cases.append(z)
    z = [0] * 64; z[0] = 12; cases.append(z)          # empty band
    z = [0] * 64
    for k in range(1, 64):
        z[k] = ((k * 7) % 11) - 5                      # dense band
    cases.append(z)
    rng = random.Random(42)
    for _ in range(150):
        z = [0] * 64
        for k in range(1, 64):
            r = rng.random()
            z[k] = 0 if r < 0.7 else (rng.choice([-1, 1]) if r < 0.85
                                      else rng.randint(-9, 9))
        cases.append(z)
    for idx, z in enumerate(cases):
        got, want = roundtrip(z)
        assert got == want, (idx, got[:8], want[:8])


def test_media_corpus_cycles_all_jpeg_flavors(tmp_path):
    """The corpus JPEG rotation emits baseline grayscale, 4:2:0 color,
    AND progressive payloads — every decoder flavor runs end-to-end."""
    from trek_spark.spark.multimodal import (
        jpeg_decode_pixels,
        media_corpus_from_documents,
    )
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-mm-jprog", master="local[2]",
                      shuffle_partitions=4)
    rows = [(i, f"doc {i} text for flavors") for i in range(90)]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    media = media_corpus_from_documents(spark, str(tmp_path)).collect()
    jpegs = [bytes(r.payload) for r in media
             if r.media_type == "image" and bytes(r.payload[:2]) == b"\xff\xd8"]
    kinds = set()
    for p in jpegs:
        dec = jpeg_decode_pixels(p)
        assert dec is not None
        kinds.add(("prog" if b"\xff\xc2" in p[:200] else "base", dec[2]))
    assert ("base", 1) in kinds and ("base", 3) in kinds \
        and ("prog", 1) in kinds, kinds


def test_gif_roundtrip_property():
    """Property: the GIF palette-index round-trip is BYTE-EXACT (LZW is
    lossless) for arbitrary dimensions/seeds, interlaced and
    sequential — exercising code-width growth and (on low-entropy
    inputs) clear-code dictionary resets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trek_spark.spark.multimodal import gif_decode_pixels, synth_gif

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 40), h=st.integers(1, 40),
           seed=st.binary(min_size=1, max_size=64),
           interlaced=st.booleans())
    def prop(w, h, seed, interlaced):
        total = w * h
        idx = (seed * (total // len(seed) + 1))[:total]
        expect = b"".join(bytes([c, 255 - c, (c * 3) % 256])
                          for c in idx)
        dec = gif_decode_pixels(synth_gif(w, h, seed,
                                          interlaced=interlaced))
        assert dec is not None
        assert dec[:3] == (w, h, 3)
        assert dec[3] == expect

    prop()


def test_gif_overflow_resize_and_chains():
    """Dictionary-overflow/clear path on a large low-entropy image;
    palette-domain resize is exact nearest-neighbor; the feature/resize
    stub chains route GIFs to the real implementations."""
    from trek_spark.spark.multimodal import (
        feature_stub,
        gif_decode_pixels,
        gif_features,
        resize_gif,
        resize_stub,
        synth_gif,
    )

    big = synth_gif(300, 200, bytes(range(256)) * 4)
    assert gif_decode_pixels(big)[:3] == (300, 200, 3)

    g = synth_gif(32, 24, b"\x07\x80\xf3gif")
    src = gif_decode_pixels(g)
    r = resize_gif(g, 16, 10)
    dr = gif_decode_pixels(r)
    assert dr[:3] == (16, 10, 3)
    for y in range(10):
        for x in range(16):
            sy, sx = y * 24 // 10, x * 32 // 16
            assert dr[3][(y * 16 + x) * 3:(y * 16 + x) * 3 + 3] == \
                src[3][(sy * 32 + sx) * 3:(sy * 32 + sx) * 3 + 3]
    assert feature_stub(g) == gif_features(g)
    assert resize_stub(g, 8, 8)[:6] == b"GIF89a"
    assert gif_decode_pixels(b"GIF89a" + b"\x00" * 20) is None
    assert gif_decode_pixels(synth_gif(16, 16, b"x")[:30]) is None


def test_media_corpus_emits_gifs(tmp_path):
    from trek_spark.spark.multimodal import (
        gif_decode_pixels,
        media_corpus_from_documents,
    )
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-mm-gif", master="local[2]",
                      shuffle_partitions=4)
    rows = [(i, f"doc {i} body for gif rotation") for i in range(60)]
    (spark.createDataFrame(rows, "doc_id long, text string")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    media = media_corpus_from_documents(spark, str(tmp_path)).collect()
    gifs = [bytes(r.payload) for r in media
            if r.media_type == "image" and bytes(r.payload[:6]) == b"GIF89a"]
    assert gifs, "corpus rotation must emit GIF images"
    assert all(gif_decode_pixels(p) is not None for p in gifs)


def test_gif_animation_frames_and_sampling():
    """Animated GIF: sub-rectangle frames composite onto the logical
    screen; GCE transparency leaves canvas pixels; frame sampling picks
    evenly-spaced frames re-encoded as standalone decodable GIFs; the
    frame_sample chain routes GIFs to the real path and true video
    bytes to the declared stub."""
    from trek_spark.spark import multimodal as M

    anim = M.synth_gif_animated(24, 16, [b"\x10", b"\x40", b"\x90"])
    dec = M.gif_decode_frames(anim)
    assert dec is not None
    sw, sh, _ct, frames = dec
    assert (sw, sh) == (24, 16) and len(frames) == 3
    f0, f1 = frames[0], frames[1]
    assert set(f0) == {0x10}
    cx0, cy0 = (24 - 12) // 2, (16 - 8) // 2
    assert f1[0] == 0x10                      # border untouched
    assert f1[cy0 * 24 + cx0] == 0x40         # center overwritten

    fs = M.gif_frame_sample(anim, 2)
    assert fs is not None and len(fs) == 2
    for fr in fs:
        d = M.gif_decode_pixels(fr)
        assert d is not None and d[:2] == (24, 16)
    assert M.frame_sample_stub(anim, 2) == fs
    fake = M.frame_sample_stub(b"\x00\x01true-video-bytes", 2)
    assert len(fake) == 2 and fake[0][:2] == b"BM"  # stub path intact

    # transparent pixels leave the previous canvas visible
    anim2 = bytearray(M.synth_gif_animated(8, 8, [b"\x05", b"\x07"]))
    i = anim2.find(bytes([0x21, 0xF9, 4, 0x00, 10, 0, 0, 0]),
                   13 + 768 + 8)
    anim2[i + 3] = 0x01
    anim2[i + 6] = 0x07  # frame 2's only index is transparent
    dec2 = M.gif_decode_frames(bytes(anim2))
    assert dec2 is not None and set(dec2[3][1]) == {0x05}


def test_avi_mjpeg_roundtrip():
    """RIFF/AVI MJPEG: synth encoder → decoder round-trip — header
    fields, frame count, per-frame dimensions, and pixel bounds against
    the grayscale generator (same ≤3/≤5 DCT tolerance as the bare JPEG
    round-trip tests)."""
    import hashlib

    from trek_spark.spark import multimodal as M

    seeds = [hashlib.sha256(bytes([i])).digest() for i in range(5)]
    avi = M.synth_avi_mjpeg(24, 16, seeds, fps=8)
    hdr = M.avi_header_info(avi)
    assert hdr == {"mime": "video/x-msvideo", "width": 24, "height": 16,
                   "duration_ms": 625}  # 5 frames × 125 ms
    w, h, usec, frames = M.avi_decode_frames(avi)
    assert (w, h, usec) == (24, 16, 125_000)
    assert len(frames) == 5
    # frame 2 (i % 3 == 2) is 4:2:0 color, the rest grayscale
    assert [f[2] for f in frames] == [1, 1, 3, 1, 1]
    for i, (fw, fh, nc, px) in enumerate(frames):
        assert (fw, fh) == (24, 16)
        assert len(px) == fw * fh * nc
    # grayscale frames match the synth generator within DCT tolerance
    for i in (0, 1, 3, 4):
        ref = M.jpeg_decode_pixels(M.synth_jpeg(24, 16, seeds[i]))
        assert frames[i][3] == ref[3]  # identical stream → identical decode


def test_avi_frame_sample_real_and_bounds():
    """Frame sampling picks evenly spaced decodable JPEG chunks;
    malformed / truncated / non-AVI payloads return None (and the stub
    chain falls through to the deterministic fake)."""
    import hashlib

    from trek_spark.spark import multimodal as M

    seeds = [hashlib.sha256(bytes([i])).digest() for i in range(7)]
    avi = M.synth_avi_mjpeg(20, 14, seeds, fps=5)
    fs = M.avi_frame_sample(avi, 3)
    assert fs is not None and len(fs) == 3
    for fr in fs:
        d = M.jpeg_decode_pixels(fr)
        assert d is not None and d[:2] == (20, 14)
    # evenly spaced picks: chunk 0, 2, 4 of 7
    _, chunks, _, _ = M._avi_walk(avi)
    assert fs == [chunks[0], chunks[2], chunks[4]]
    # frame_sample_stub routes AVI to the real path
    assert M.frame_sample_stub(avi, 3) == fs
    # features come from the first decodable frame's image space
    feats = M.avi_features(avi)
    assert feats is not None and len(feats) == 16

    assert M.avi_frame_sample(avi[:40], 3) is None
    assert M.avi_frame_sample(b"RIFF\x00\x00\x00\x00AVI junkjunk", 3) is None
    assert M.avi_frame_sample(b"not an avi at all", 3) is None
    # corrupt every frame chunk: sampler must refuse, not emit garbage
    bad = bytearray(avi)
    for i in range(len(bad) - 4):
        if bad[i:i + 2] == b"\xff\xd8":
            bad[i] = 0x00
    assert M.avi_frame_sample(bytes(bad), 3) is None


def test_avi_walk_hostile_sizes_bounded():
    """Attacker-controlled size fields: oversize chunk lengths, deep
    LIST nesting, and chunk floods must return None (or a bounded
    parse), never hang or raise."""
    import struct

    from trek_spark.spark import multimodal as M

    # oversize declared chunk length
    avi = bytearray(M.synth_avi_mjpeg(8, 8, [b"x", b"y"]))
    i = avi.find(b"00dc")
    avi[i + 4:i + 8] = struct.pack("<I", 2 ** 31)
    assert M._avi_walk(bytes(avi)) is None

    # LIST nesting bomb: hdrl containing itself past the depth cap
    inner = b"LIST" + struct.pack("<I", 4) + b"hdrl"
    for _ in range(8):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"hdrl" + inner
    bomb = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    assert M._avi_walk(bomb) is None

    # chunk flood with no header anywhere: reject (nothing parseable)
    flood_body = (b"00dc" + struct.pack("<I", 0)) * (M._AVI_MAX_CHUNKS + 10)
    movi = b"LIST" + struct.pack("<I", 4 + len(flood_body)) + b"movi" + flood_body
    flood = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    assert M._avi_walk(flood) is None  # no avih, no frames → refusal

    # LONG video (> _AVI_MAX_CHUNKS frame chunks, header up front): the
    # budget must TRUNCATE the walk, not fail the container — a real
    # 3-minute MJPEG AVI has >4096 chunks and its header lives in the
    # first KB
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 100_000, 0, 0, 0, 5000, 0, 1, 0, 32, 24, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    long_body = (b"00dc" + struct.pack("<I", 4) + b"fake") * (
        M._AVI_MAX_CHUNKS + 100)
    lmovi = (b"LIST" + struct.pack("<I", 4 + len(long_body)) + b"movi"
             + long_body)
    long_avi = (b"RIFF" + struct.pack("<I", 8 + len(hdrl) + len(lmovi))
                + b"AVI " + hdrl + lmovi)
    parsed = M._avi_walk(long_avi)
    assert parsed is not None
    hdr, frames, nframes, truncated = parsed
    assert hdr["width"] == 32 and hdr["total_frames"] == 5000
    assert 0 < nframes <= M._AVI_MAX_CHUNKS  # truncated, bounded
    assert truncated  # the budget hit is SURFACED, not silent (r7 ADVICE)
    # header-only mode: same header, zero frame-byte copies
    hdr2, frames2, nf2, trunc2 = M._avi_walk(long_avi, collect_frames=False)
    assert hdr2 == hdr and frames2 == [] and nf2 == nframes and trunc2
    info = M.avi_header_info(long_avi)
    assert info == {"mime": "video/x-msvideo", "width": 32, "height": 24,
                    "duration_ms": 500_000,  # 5000 frames × 100 ms: past
                    # the chunk budget the clamped header claim stands
                    "truncated": True}


def test_avi_header_info_hostile_header_clamped():
    """r7 ADVICE: a hostile avih claiming 0xFFFFFFFF frames at
    0xFFFFFFFF us/frame must not yield a ~1.8e13 ms duration. The walk
    completes (2 real chunks), so the COUNTED chunks are the truth and
    usec_per_frame is clamped to the plausible band."""
    import struct

    from trek_spark.spark import multimodal as M
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 0xFFFFFFFF, 0, 0, 0, 0xFFFFFFFF, 0, 1, 0, 32, 24,
        0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    body = (b"00dc" + struct.pack("<I", 4) + b"fake") * 2
    movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + body
    avi = (b"RIFF" + struct.pack("<I", 8 + len(hdrl) + len(movi))
           + b"AVI " + hdrl + movi)
    info = M.avi_header_info(avi)
    # 2 counted frames × 10s/frame ceiling = 20_000 ms, no truncation
    assert info == {"mime": "video/x-msvideo", "width": 32, "height": 24,
                    "duration_ms": 20_000}


def test_media_corpus_emits_avis(tmp_path):
    """Corpus rotation: 'video' rows alternate real MJPEG AVIs (decoded
    end-to-end: video/x-msvideo mime, real JPEG frames) with raw bytes
    (declared stub → BMP fakes)."""
    from trek_spark.spark import multimodal as M
    from trek_spark.spark.session import get_spark

    spark = get_spark("pytest-avi-corpus", master="local[2]",
                      shuffle_partitions=4)
    rows = [(str(i), f"video body text {i} " * 8) for i in range(2, 60, 3)]
    (spark.createDataFrame(rows, "doc_id string, text string")
     .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet"))
    media = M.media_corpus_from_documents(spark, str(tmp_path)).collect()
    vids = {int(r["media_id"]): bytes(r["payload"]) for r in media
            if r["media_type"] == "video"}
    assert vids
    real = {k: v for k, v in vids.items() if v[:4] == b"RIFF"}
    raw = {k: v for k, v in vids.items() if v[:4] != b"RIFF"}
    assert real and raw, "rotation must emit both AVI and raw video rows"
    for k, v in real.items():
        hdr = M.decode_headers(v)
        assert hdr["mime"] == "video/x-msvideo"
        nf = 2 + k % 3
        dec = M.avi_decode_frames(v)
        assert dec is not None and len(dec[3]) == nf


def test_avi_roundtrip_property():
    """Property: synth_avi_mjpeg → _avi_walk/avi_decode_frames recovers
    frame count, per-frame dimensions and component counts for arbitrary
    dimensions, frame counts, fps and seeds; avi_frame_sample returns
    min(n, k) decodable JPEG payloads for any requested n; header
    duration is exact integer math from fps and frame count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trek_spark.spark import multimodal as M

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 24), h=st.integers(1, 20),
           nf=st.integers(1, 6), fps=st.integers(1, 30),
           seed=st.binary(min_size=1, max_size=32),
           n_req=st.integers(1, 8))
    def prop(w, h, nf, fps, seed, n_req):
        seeds = [seed + bytes([i]) for i in range(nf)]
        avi = M.synth_avi_mjpeg(w, h, seeds, fps=fps)
        hdr = M.avi_header_info(avi)
        usec = 1_000_000 // fps
        assert hdr == {"mime": "video/x-msvideo", "width": w, "height": h,
                       "duration_ms": int(nf * usec / 1000)}
        gw, gh, gusec, frames = M.avi_decode_frames(avi)
        assert (gw, gh, gusec) == (w, h, usec)
        assert len(frames) == nf
        for i, (fw, fh, nc, px) in enumerate(frames):
            assert (fw, fh) == (w, h)
            assert nc == (3 if i % 3 == 2 else 1)
            assert len(px) == w * h * nc
        fs = M.avi_frame_sample(avi, n_req)
        assert fs is not None and len(fs) == min(n_req, nf)
        for fr in fs:
            d = M.jpeg_decode_pixels(fr)
            assert d is not None and d[:2] == (w, h)

    prop()


def test_avi_resize_and_clip():
    """Format-preserving video transforms: resize re-encodes every frame
    at the new dims (container still decodes, frame count and timing
    kept); clip keeps exactly the frames inside [start, end) ms and
    re-emits a valid AVI; the Spark-level clip_video op applies clipping
    to video rows only."""
    import hashlib

    from trek_spark.spark import multimodal as M
    from trek_spark.spark.session import get_spark

    seeds = [hashlib.sha256(bytes([i])).digest() for i in range(6)]
    avi = M.synth_avi_mjpeg(24, 16, seeds, fps=10)  # 100 ms per frame

    rz = M.resize_avi(avi, 12, 8)
    assert rz is not None
    w, h, usec, frames = M.avi_decode_frames(rz)
    assert (w, h, usec) == (12, 8, 100_000)
    assert len(frames) == 6
    assert all(f[:2] == (12, 8) for f in frames)
    # resize_stub routes video payloads through the real AVI path
    assert M.resize_stub(avi, 12, 8) == rz

    cl = M.clip_avi(avi, 200, 500)  # frames at 200,300,400 ms
    assert cl is not None
    _, _, cusec, cframes = M.avi_decode_frames(cl)
    assert cusec == 100_000 and len(cframes) == 3
    # frame payloads are preserved verbatim (clip never re-encodes)
    _, orig_chunks, _, _ = M._avi_walk(avi)
    _, clip_chunks, _, _ = M._avi_walk(cl)
    assert clip_chunks == orig_chunks[2:5]

    assert M.clip_avi(avi, 900, 1200) is None   # past the last frame
    assert M.clip_avi(avi, 300, 300) is None    # empty range
    assert M.clip_avi(b"not avi", 0, 100) is None

    spark = get_spark("pytest-avi-clip", master="local[2]",
                      shuffle_partitions=4)
    df = spark.createDataFrame(
        [(1, bytearray(avi), "video"), (2, bytearray(b"raw"), "video"),
         (3, bytearray(M.synth_bmp(8, 8, b"x")), "image")],
        "media_id long, payload binary, media_type string")
    rows = {r.media_id: r.clipped
            for r in M.clip_video(df, 0, 250).collect()}
    assert rows[2] is None and rows[3] is None
    got = M.avi_decode_frames(bytes(rows[1]))
    assert got is not None and len(got[3]) == 3  # frames at 0,100,200 ms


def test_avi_exact_budget_walk_is_not_truncated():
    """Off-by-one guard: an AVI whose chunk count exactly exhausts the
    walk budget was still FULLY walked — truncated must stay False and
    the counted chunks (not a hostile header claim) give the duration."""
    import struct

    from trek_spark.spark import multimodal as M
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<14I", 100_000, 0, 0, 0, 9_999_999, 0, 1, 0, 32, 24,
        0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    # budget decrements: LIST hdrl + avih + LIST movi + N frames
    n = M._AVI_MAX_CHUNKS - 3
    body = (b"00dc" + struct.pack("<I", 4) + b"fake") * n
    movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + body
    avi = (b"RIFF" + struct.pack("<I", 8 + len(hdrl) + len(movi))
           + b"AVI " + hdrl + movi)
    hdr, _, nframes, truncated = M._avi_walk(avi, collect_frames=False)
    assert nframes == n and not truncated
    info = M.avi_header_info(avi)
    assert "truncated" not in info
    assert info["duration_ms"] == n * 100  # counted, not the 9,999,999
