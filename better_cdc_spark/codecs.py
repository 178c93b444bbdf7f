"""Pure-stdlib container codecs: PNG, WAV, PPM — real decode, no C libs.

The multimodal surface (q99*) treats payloads as opaque binary; the
general image/audio/video decoders (llmops.decode_image & co.) stay
deploy-time seams because codec libraries aren't in this container. These
codecs close the gap for three self-describing formats the standard
library (zlib/struct/wave) can genuinely parse, so the decode path of the
multimodal pipeline EXECUTES here instead of stubbing:

- PNG: chunk walk, IHDR metadata, zlib-inflated IDAT, full five-filter
  (None/Sub/Up/Average/Paeth) scanline reconstruction for 8-bit
  grayscale/RGB/RGBA — enough to decode anything this repo synthesizes
  and any uncompressed-palette-free PNG.
- WAV: stdlib `wave` (PCM): channels, sample width, frame rate, frames.
- PPM (P6): ASCII header + raw pixel block.

Everything is deterministic and byte-exact, so decoded metadata
(width/height/duration/checksums) is oracle-checkable in SQL.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype → samples per pixel


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0 scanlines)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> dict:
    """PNG → {width, height, bit_depth, color_type, pixels: bytes}.

    Real scanline reconstruction (all five standard filters), 8-bit
    depth, non-interlaced, color types 0/2/4/6.
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    off = 8
    meta: dict = {}
    idat = b""
    while off < len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + ln]
        off += 12 + ln  # len + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            meta = {"width": w, "height": h, "bit_depth": depth, "color_type": ctype}
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if not meta:
        raise ValueError("missing IHDR")
    bpp = _CHANNELS[meta["color_type"]]
    stride = meta["width"] * bpp
    raw = zlib.decompress(idat)
    out = bytearray()
    prev = bytes(stride)
    for y in range(meta["height"]):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        line = bytearray(raw[row_off + 1 : row_off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out += line
        prev = bytes(line)
    meta["pixels"] = bytes(out)
    return meta


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def encode_wav(
    samples: bytes, *, framerate: int = 8000, channels: int = 1, sampwidth: int = 1
) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """WAV → {channels, sampwidth, framerate, n_frames, duration_us, frames}."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        rate = w.getframerate()
        return {
            "channels": w.getnchannels(),
            "sampwidth": w.getsampwidth(),
            "framerate": rate,
            "n_frames": n,
            "duration_us": n * 1_000_000 // rate,
            "frames": w.readframes(n),
        }


# ---------------------------------------------------------------------------
# PPM (P6 binary)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_ppm(payload: bytes) -> dict:
    """P6 PPM → {width, height, maxval, pixels}."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated, then
    # exactly one whitespace byte before the raster
    fields: list[bytes] = []
    off = 2
    while len(fields) < 3:
        while off < len(payload) and payload[off : off + 1].isspace():
            off += 1
        if payload[off : off + 1] == b"#":  # comment line
            off = payload.index(b"\n", off) + 1
            continue
        end = off
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        fields.append(payload[off:end])
        off = end
    off += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    pixels = payload[off : off + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return {"width": w, "height": h, "maxval": maxval, "pixels": pixels}
