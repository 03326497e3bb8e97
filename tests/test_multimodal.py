"""Multimodal binary plumbing: real PNG/WAV/JPEG/mp4 container build +
parse (dependency-free), the decode_real dispatch, and the Spark
round-trip through synthesize_real_media → extract_metadata."""

from __future__ import annotations

import pytest

from local_search_engine_spark.operators.multimodal import (
    build_jpeg,
    build_mp4,
    build_png,
    build_wav,
    decode_real,
    parse_jpeg_header,
    parse_mp4_header,
    parse_png_header,
    parse_wav_header,
    synthesize_real_media,
    extract_metadata,
)

# a handcrafted (NOT builder-produced) 1x1 grayscale PNG header —
# independent fixture so parse and build cannot share a bug
_PNG_1x1_PREFIX = (
    b"\x89PNG\r\n\x1a\n"            # signature
    b"\x00\x00\x00\x0dIHDR"          # IHDR length 13 + tag
    b"\x00\x00\x00\x01\x00\x00\x00\x01"  # width=1, height=1 (big-endian)
    b"\x08\x00\x00\x00\x00"          # bit depth 8, grayscale
)


def test_parse_png_header_on_handcrafted_bytes():
    assert parse_png_header(_PNG_1x1_PREFIX + b"\x00" * 8) == (1, 1)
    with pytest.raises(ValueError):
        parse_png_header(b"JFIF not a png at all....")


def test_png_build_parse_roundtrip_and_validity():
    import struct
    import zlib

    for w, h in [(1, 1), (7, 3), (64, 64)]:
        payload = build_png(w, h)
        assert parse_png_header(payload) == (w, h)
        assert decode_real(payload, "image") == (w, h, 1)
        # the file is SPEC-VALID, not just header-shaped: CRCs check out
        # and the IDAT inflates to (1 + width) * height filter+pixel bytes
        pos = 8
        chunks = {}
        while pos < len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF, tag
            chunks[tag] = data
            pos += 12 + length
        assert set(chunks) == {b"IHDR", b"IDAT", b"IEND"}
        assert len(zlib.decompress(chunks[b"IDAT"])) == (1 + w) * h


def test_wav_build_parse_roundtrip():
    for rate, ch, n in [(8000, 1, 1), (8700, 2, 16), (44100, 2, 5)]:
        payload = build_wav(rate, ch, n)
        assert parse_wav_header(payload) == (rate, ch, n)
        assert decode_real(payload, "audio") == (rate, ch, n)
    with pytest.raises(ValueError):
        parse_wav_header(b"RIFFxxxxNOPE")


def test_jpeg_build_parse_roundtrip_and_validity():
    import struct

    for w, h in [(1, 1), (7, 3), (64, 64)]:
        payload = build_jpeg(w, h)
        assert parse_jpeg_header(payload) == (w, h)
        assert decode_real(payload, "image") == (w, h, 1)
        # spec shape: SOI first, EOI last, every non-entropy segment's
        # declared length lands exactly on the next 0xFF marker
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        pos = 2
        while True:
            assert payload[pos] == 0xFF
            marker = payload[pos + 1]
            (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if marker == 0xDA:  # scan data follows; stop structural walk
                break
            pos += 2 + length
    with pytest.raises(ValueError):
        parse_jpeg_header(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_mp4_build_parse_roundtrip():
    for w, h, n in [(16, 16, 1), (320, 240, 16), (1024, 64, 7)]:
        payload = build_mp4(w, h, n)
        assert parse_mp4_header(payload) == (w, h, n)
        assert decode_real(payload, "video") == (w, h, n)
    with pytest.raises(ValueError):
        parse_mp4_header(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises(ValueError):
        # ftyp present but no moov/tkhd/stsz anywhere
        parse_mp4_header(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00")


def test_decode_real_unknown_container_is_the_seam():
    # GIF is deliberately NOT parsed — the production seam stays honest
    with pytest.raises(NotImplementedError):
        decode_real(b"GIF89a" + b"\x00" * 16, "image")


def test_spark_real_media_roundtrip(spark):
    """End-to-end through the engine: synthesize real containers from a
    text table (doc_id % 4 cycles png/wav/jpeg/mp4), decode them back
    with decode_real inside mapInPandas — recovered metadata must equal
    the synthesis parameters, and size_bytes the actual container size."""
    import hashlib

    rows = [(i, f"text for doc {i} with some length") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = synthesize_real_media(docs, "text", "doc_id")
    got = {
        r["id"]: r
        for r in extract_metadata(media, decoder=decode_real).collect()
    }
    assert len(got) == 12
    for i, text in rows:
        b = hashlib.md5(text.encode()).digest()
        r = got[i]
        kind = i % 4
        if kind == 0:
            assert r["media_type"] == "png"
            expect_meta = (1 + b[0] % 64, 1 + b[1] % 64, 1)
            expect_payload = build_png(1 + b[0] % 64, 1 + b[1] % 64)
        elif kind == 1:
            assert r["media_type"] == "wav"
            expect_meta = (8000 + 100 * (b[0] % 8), 1 + b[1] % 2, 1 + b[2] % 16)
            expect_payload = build_wav(*expect_meta)
        elif kind == 2:
            assert r["media_type"] == "jpeg"
            expect_meta = (1 + b[0] % 64, 1 + b[1] % 64, 1)
            expect_payload = build_jpeg(1 + b[0] % 64, 1 + b[1] % 64)
        else:
            assert r["media_type"] == "mp4"
            expect_meta = (
                16 * (1 + b[0] % 64), 16 * (1 + b[1] % 64), 1 + b[2] % 16,
            )
            expect_payload = build_mp4(*expect_meta)
        assert (r["width"], r["height"], r["n_frames"]) == expect_meta
        assert r["size_bytes"] == len(expect_payload)
        assert bytes(r["payload"]) == expect_payload
