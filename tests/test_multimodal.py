"""Multimodal plumbing tests: binary payload round-trip through Arrow,
mapInPandas fan-out shape, deterministic stub decode, schema contracts."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from zipkin_dependencies_spark.llm.multimodal import media_from_documents

    rows = [
        (0, "a" * 250),
        (1, "b" * 99),   # shorter than one frame
        (2, "hello world " * 30),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return media_from_documents(docs, frame_bytes=100)


def test_media_schema_and_payload_roundtrip(media):
    from zipkin_dependencies_spark.llm.multimodal import MEDIA_SCHEMA

    # same names/types (nullability differs between derivation and contract)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in media.collect()}
    assert bytes(rows[0]["payload"]) == b"a" * 250  # binary survives Arrow
    assert rows[0]["kind"] == "image"
    assert rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video"
    assert rows[0]["meta"]["n_frames"] == 2
    assert rows[1]["meta"]["n_frames"] == 0


def test_sample_frames_fanout(media):
    from zipkin_dependencies_spark.llm.multimodal import sample_frames

    frames = sample_frames(media, frame_bytes=100).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media.get(0, [])) == 2  # 250 bytes → 2 full frames
    assert 1 not in by_media  # sub-frame payload yields nothing
    assert len(by_media[2]) == 3  # 360 bytes → 3 frames
    f0 = sorted(by_media[0], key=lambda r: r["frame_idx"])[0]
    assert f0["frame_digest"] == hashlib.md5(b"a" * 100).hexdigest()
    assert f0["n_bytes"] == 100


def test_extract_features_deterministic(media):
    from zipkin_dependencies_spark.llm.multimodal import extract_features

    out = {r["media_id"]: r["embedding"] for r in extract_features(media, dim=8).collect()}
    assert all(len(v) == 8 for v in out.values())
    assert all(0.0 <= x <= 1.0 for v in out.values() for x in v)
    expected0 = int(hashlib.md5(("0:" + "a" * 250).encode()).hexdigest()[:2], 16) / 255.0
    assert out[0][0] == pytest.approx(expected0, abs=1e-7)
    # re-run identical (stable stub)
    again = {r["media_id"]: r["embedding"] for r in extract_features(media, dim=8).collect()}
    assert out == again


def test_media_stats(media):
    from zipkin_dependencies_spark.llm.multimodal import media_stats

    rows = {r["media_id"]: r for r in media_stats(media).collect()}
    assert rows[0]["n_bytes"] == 250
    assert rows[0]["digest"] == hashlib.md5(b"a" * 250).hexdigest()
    assert rows[0]["width"] == 250 % 640 and rows[0]["height"] == 250 % 480


def test_documents_fixture_is_ascii(spark):
    """The media_frames oracle slices TEXT by character while the Spark stub
    slices by byte — valid only while the fixture is pure ASCII. Guard it."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_non_ascii = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert n_non_ascii == 0

# --- real decode (stdlib PNG/WAV; PIL optional) ------------------------------

def _make_png(width=4, height=3, color=(10, 200, 30)):
    """Minimal valid RGB PNG via stdlib only (filter 0 scanlines)."""
    import struct
    import zlib

    def chunk(ctype, data):
        c = ctype + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(color) * width for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_wav(n_frames=160, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(struct.pack("<h", (i * 37) % 4096 - 2048) for i in range(n_frames))
        )
    return buf.getvalue()


def test_decode_media_real_png_and_wav(spark):
    """REAL decode end to end: a synthesized PNG round-trips through the
    stdlib inflate+unfilter path (dimensions + pixel digest), a synthesized
    WAV through the wave reader (rate, frames, PCM digest), and an
    undecodable payload lands in decode_error instead of failing the batch."""
    import hashlib

    from zipkin_dependencies_spark.llm.multimodal import decode_media

    png = _make_png(width=4, height=3, color=(10, 200, 30))
    wav = _make_wav(n_frames=160, rate=8000)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "audio", bytearray(wav)),
         (3, "video", bytearray(b"not-decodable"))],
        "media_id long, kind string, payload binary",
    )
    out = {r.media_id: r for r in decode_media(media).collect()}

    img = out[1]
    assert (img.width, img.height, img.channels) == (4, 3, 3)
    assert img.decode_error is None
    assert img.content_digest == hashlib.md5(bytes((10, 200, 30)) * 4 * 3).hexdigest()

    aud = out[2]
    assert (aud.sample_rate, aud.n_frames, aud.channels) == (8000, 160, 1)
    assert aud.decode_error is None

    vid = out[3]
    assert vid.content_digest is None and "NotImplementedError" in vid.decode_error


def test_decode_png_all_filters():
    """The unfilter path (Sub/Up/Average/Paeth) reproduces pixels exactly:
    encode the same image once per filter type and assert identical decoded
    bytes. Pure Python — no Spark session needed."""
    import struct
    import zlib

    from zipkin_dependencies_spark.llm.multimodal import _decode_png, _paeth

    width, height, ch = 5, 4, 3
    pixels = bytes((x * 23 + y * 57 + c * 11) % 256
                   for y in range(height) for x in range(width) for c in range(ch))
    stride = width * ch

    def encode_with_filter(filt):
        rows = []
        prev = bytes(stride)
        for y in range(height):
            line = pixels[y * stride:(y + 1) * stride]
            if filt == 0:
                enc = line
            elif filt == 1:
                enc = bytes((line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                            for i in range(stride))
            elif filt == 2:
                enc = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
            elif filt == 3:
                enc = bytes((line[i] - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1)) & 0xFF
                            for i in range(stride))
            else:
                enc = bytes((line[i] - _paeth(line[i - ch] if i >= ch else 0,
                                              prev[i],
                                              prev[i - ch] if i >= ch else 0)) & 0xFF
                            for i in range(stride))
            rows.append(bytes([filt]) + enc)
            prev = line

        def chunk(ctype, data):
            c = ctype + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c) & 0xFFFFFFFF
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(rows))) + chunk(b"IEND", b""))

    for filt in range(5):
        w, h, c, decoded = _decode_png(encode_with_filter(filt))
        assert (w, h, c) == (width, height, ch)
        assert decoded == pixels, f"filter {filt} mismatch"


def test_decode_image_with_pil_if_present():
    import pytest as _pytest

    _pytest.importorskip("PIL")
    from zipkin_dependencies_spark.llm.multimodal import decode_image

    w, h, c, px = decode_image(_make_png(2, 2, (1, 2, 3)))
    assert (w, h, c) == (2, 2, 3) and px == bytes((1, 2, 3)) * 4


def test_resize_images_nearest_neighbor(spark):
    """Real resize end to end: a 4x2 two-tone PNG downsamples to 2x1 with
    exact nearest-neighbor pixels; bad payloads carry resize_error."""
    from zipkin_dependencies_spark.llm.multimodal import resize_images

    # left half red, right half blue, 4 wide x 2 tall
    import zlib

    def chunk(tag, data):
        import struct

        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    import struct

    w, h = 4, 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    row = bytes((255, 0, 0)) * 2 + bytes((0, 0, 255)) * 2
    raw = b"".join(b"\x00" + row for _ in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )

    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_images(media, 2, 1).collect()}
    ok = out[1]
    assert (ok.src_width, ok.src_height, ok.width, ok.height) == (4, 2, 2, 1)
    # NN with floor(i*src/target): x indices 0 and 2 -> red, blue
    assert bytes(ok.pixels) == bytes((255, 0, 0)) + bytes((0, 0, 255))
    assert ok.resize_error is None
    bad = out[2]
    assert bad.pixels is None and bad.resize_error
