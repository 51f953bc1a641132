"""Pure-stdlib media codecs: real PNG and WAV decode, no native deps.

The container has no PIL/libvips/ffmpeg, but PNG is zlib + per-row
filters (both stdlib) and WAV is RIFF framing over raw PCM (stdlib
``wave``), so these two formats get REAL decoders; formats that
genuinely require native codecs (JPEG, MP3, H.264, ...) stay behind
NotImplementedError in operators/multimodal.py.

Encoders exist so tests and the driver query can synthesize valid
payloads deterministically — the decode side never assumes an
encoder-shaped input (all five PNG row filters are implemented).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png_gray(width: int, height: int, value: int) -> bytes:
    """Minimal valid grayscale PNG: every pixel = ``value`` (0-255)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([value]) * width for _ in range(height))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, channels: int):
    """Unfilter all rows into a (height, stride) uint8-valued matrix.

    Vectorized where the filter's data dependency allows (r5: the
    per-byte interpreted loops were the one scale nit left on the
    decoder): None is a copy, Up is one vectorized add, Sub is a
    per-channel-lane cumsum (mod 256 is a ring hom, so masking once
    after the cumsum is exact). Average and Paeth have a strict
    left-to-right OUTPUT dependency; tiny-vector numpy stepping was
    measured 10x SLOWER than a plain byte loop at real row widths, so
    those rows keep the scalar loop (they only appear in adversarial
    or foreign-encoder inputs — our encoder and most simple encoders
    emit None/Up/Sub)."""
    data = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = data[:, 0]
    bad = filters[filters > 4]
    if bad.size:
        raise ValueError(f"bad PNG filter byte {int(bad[0])}")
    rows = data[:, 1:].astype(np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    width = stride // channels
    for r in range(height):
        f = int(filters[r])
        row = rows[r]
        if f == 1:    # Sub: out[i] = (in[i] + out[i-ch]) & 0xFF
            lane = row.reshape(width, channels)
            np.cumsum(lane, axis=0, out=lane)
        elif f == 2:  # Up
            row += prev
        elif f in (3, 4):  # Average / Paeth: scalar (see docstring)
            rl, pl = row.tolist(), prev.tolist()
            for i in range(stride):
                left = rl[i - channels] if i >= channels else 0
                if f == 3:
                    rl[i] = (rl[i] + ((left + pl[i]) >> 1)) & 0xFF
                else:
                    ul = pl[i - channels] if i >= channels else 0
                    rl[i] = (rl[i] + _paeth(left, pl[i], ul)) & 0xFF
            row[:] = rl
        row &= 0xFF
        prev = row
    return rows


def decode_png(payload: bytes) -> dict:
    """Parse critical chunks, inflate, unfilter (all 5 row filters).

    Returns {width, height, channels, bit_depth, pixel_sum, n_pixels}
    — pixel_sum over ALL channel samples, so mean = pixel_sum /
    (n_pixels * channels). Raises ValueError on malformed input,
    NotImplementedError for interlaced / non-8-bit images.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    height = bit_depth = color_type = interlace = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} not supported (8-bit non-interlaced "
            f"gray/RGB/GA/RGBA only)")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(idat)
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    pixels = _unfilter(raw, height, stride, channels)
    return {"width": width, "height": height, "channels": channels,
            "bit_depth": bit_depth, "pixel_sum": int(pixels.sum()),
            "n_pixels": width * height}


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Mono 16-bit PCM WAV from integer samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """RIFF/WAVE decode via stdlib ``wave``: header + real PCM stats.

    Returns {sample_rate, n_channels, n_frames, sample_width,
    abs_sum, n_samples} — mean absolute amplitude = abs_sum /
    n_samples. Raises ValueError on malformed input, NotImplementedError
    for non-16-bit PCM.
    """
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate, nch = w.getframerate(), w.getnchannels()
            n_frames, width = w.getnframes(), w.getsampwidth()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    if width != 2:
        raise NotImplementedError(f"{8 * width}-bit WAV not supported "
                                  "(16-bit PCM only)")
    n_samples = len(frames) // 2
    vals = np.frombuffer(frames[:n_samples * 2], dtype="<i2")
    abs_sum = int(np.abs(vals.astype(np.int64)).sum())
    return {"sample_rate": rate, "n_channels": nch, "n_frames": n_frames,
            "sample_width": width, "abs_sum": abs_sum,
            "n_samples": n_samples}
