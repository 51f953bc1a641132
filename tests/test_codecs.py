"""Pure-stdlib PNG/WAV codecs: round-trips, every PNG row filter,
malformed-input error paths, and the real-decode Arrow stage."""

import struct
import zlib

import pytest

from jsonld_js_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png_gray,
    encode_wav_pcm16,
)


def test_png_roundtrip_exact():
    p = encode_png_gray(12, 7, 77)
    d = decode_png(p)
    assert (d["width"], d["height"], d["channels"]) == (12, 7, 1)
    assert d["pixel_sum"] == 12 * 7 * 77
    assert d["n_pixels"] == 84


def _png_with_filters(width, height, channels, rows_with_filters):
    """Hand-build a PNG whose rows use explicit filter bytes —
    exercises the decoder's unfiltering, which our encoder (filter 0
    only) does not."""
    color_type = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(row)
                   for f, row in rows_with_filters)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    return (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_all_filters_decode():
    """One row per filter type over known pixel values; expected sums
    computed from the spec's unfiltering rules by hand."""
    w, ch = 4, 1
    # target pixel rows (post-unfilter) all equal [10, 20, 30, 40]
    target = [10, 20, 30, 40]
    rows = []
    # f0 None: literal
    rows.append((0, target))
    # f1 Sub: raw[i] = x[i] - x[i-1]
    rows.append((1, [10, 10, 10, 10]))
    # f2 Up: raw[i] = x[i] - prev[i] (prev == target)
    rows.append((2, [0, 0, 0, 0]))
    # f3 Average: raw[i] = x[i] - floor((left + up)/2)
    rows.append((3, [10 - (0 + 10) // 2, 20 - (10 + 20) // 2,
                     30 - (20 + 30) // 2, 40 - (30 + 40) // 2]))
    # f4 Paeth: with left/up/ul all known, predictor = nearest of them
    rows.append((4, [10 - 10, 20 - 20, 30 - 30, 40 - 40]))
    p = _png_with_filters(w, len(rows), ch, rows)
    d = decode_png(p)
    assert d["pixel_sum"] == sum(target) * len(rows)
    assert d["n_pixels"] == w * len(rows)


def test_png_rgb_channels():
    p = _png_with_filters(2, 1, 3, [(0, [1, 2, 3, 4, 5, 6])])
    d = decode_png(p)
    assert d["channels"] == 3 and d["pixel_sum"] == 21


def test_png_error_paths():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    p = bytearray(encode_png_gray(4, 4, 9))
    with pytest.raises(ValueError):
        decode_png(bytes(p[:30]))  # truncated chunk
    # 16-bit depth -> honest NotImplementedError, not garbage
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    deep = sig + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(deep)


def test_wav_roundtrip_exact():
    samples = [250 if i % 2 == 0 else -250 for i in range(90)]
    w = encode_wav_pcm16(12000, samples)
    d = decode_wav(w)
    assert d["sample_rate"] == 12000
    assert d["n_samples"] == 90
    assert d["abs_sum"] == 250 * 90


def test_wav_error_path():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage")
    with pytest.raises(ValueError):
        decode_wav(b"\x00" * 16)


def test_extract_media_features_stage(spark):
    """The Arrow decode stage end-to-end on mixed real payloads."""
    from jsonld_js_spark.operators.multimodal import (
        extract_media_features, synthesize_media_payloads)

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in
           extract_media_features(synthesize_media_payloads(docs)).collect()}
    assert len(out) == 20
    for i in range(20):
        r = out[i]
        if i % 2 == 0:
            assert r["kind"] == "image"
            assert r["width"] == 8 + i % 16
            assert r["height"] == 8 + (3 * i) % 16
            assert r["value_sum"] == r["width"] * r["height"] * (i % 256)
        else:
            assert r["kind"] == "audio"
            assert r["sample_rate"] == 8000 + (i % 3) * 4000
            assert r["value_sum"] == (64 + i % 32) * (1 + i % 1000)


def test_numpy_unfilter_matches_spec_reference():
    """r5: the unfiltering is numpy-vectorized — check it against a
    straight-from-spec scalar implementation on random images with
    random per-row filters (all 5), several channel counts."""
    import random

    from jsonld_js_spark.operators.codecs import _paeth, decode_png

    rng = random.Random(5005)
    for trial in range(25):
        channels = rng.choice([1, 3, 4])
        w, h = rng.randrange(1, 9), rng.randrange(1, 7)
        stride = w * channels
        rows_wf = [(rng.randrange(5), [rng.randrange(256) for _ in range(stride)])
                   for _ in range(h)]
        # spec-scalar unfilter
        prev = [0] * stride
        expect = 0
        for f, rdata in rows_wf:
            row = list(rdata)
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                if f == 1:
                    row[i] = (row[i] + left) & 0xFF
                elif f == 2:
                    row[i] = (row[i] + prev[i]) & 0xFF
                elif f == 3:
                    row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
                elif f == 4:
                    row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
            expect += sum(row)
            prev = row
        color_type = {1: 0, 3: 2, 4: 6}[channels]
        d = decode_png(_png_with_filters(w, h, channels, rows_wf))
        assert d["pixel_sum"] == expect, (trial, w, h, channels)
        assert d["n_pixels"] == w * h
