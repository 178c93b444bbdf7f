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


# ---------------------------------------------------------------------------
# JPEG (baseline JFIF, grayscale) — pure Python/numpy, no C codec libs
# ---------------------------------------------------------------------------
#
# Closes the round-4 "compressed codec" seam for the one compressed image
# format a pure-Python decoder can own end-to-end: baseline sequential
# DCT, 8-bit, single component. The DECODER is general (parses DQT/SOF0/
# DHT/SOS from the stream, huffman-decodes any baseline grayscale scan,
# byte-unstuffing, DC prediction, zigzag, dequant, float IDCT); the
# ENCODER exists to synthesize real fixtures and for round-trip property
# tests. Color (YCbCr 4:2:0) remains a deploy-time seam — subsampled
# chroma adds MCU interleaving but no new decode machinery.
#
# Exact-oracle trick used by q99f: an 8x8 block with ONE constant value c
# has a single nonzero DCT coefficient, DC = 8*(c-128); with the DC quant
# step set to 8 the quantized DC is exactly c-128, so decode returns c
# EXACTLY — lossy JPEG becomes lossless on blockwise-constant images and
# the decoded raster is closed-form computable in SQL. The entropy coding
# exercised (huffman tables, DC difference categories incl. negatives,
# EOB, byte stuffing) is the same machinery any baseline scan uses.

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: default quant table: DC step 8 (exact for blockwise-constant rasters,
#: see module note), AC step 16 everywhere (any nonzero AC quantizes
#: normally; the table is carried in DQT so the decoder never assumes it)
DEFAULT_QUANT = np.full(64, 16, dtype=np.int64)
DEFAULT_QUANT[0] = 8

# custom canonical huffman tables, carried in DHT (a decoder must build
# from the stream, which keeps it honest for any table): DC = 12 category
# symbols at code length 4; AC = EOB + ZRL + 160 run/size symbols at code
# length 8. Single-length canonical tables are valid JPEG (no code is the
# all-ones pattern: 11 < 15 and 175 < 255).
DC_BITS = [0] * 16
DC_BITS[3] = 12  # 12 codes of length 4 (bits list is 1-indexed lengths)
DC_VALS = list(range(12))
AC_BITS = [0] * 16
AC_BITS[7] = 176  # 176 codes of length 8 (appending keeps prior codes)
AC_VALS = (
    [0x00, 0xF0]
    + [r * 16 + s for r in range(16) for s in range(1, 11)]
    # EOBn symbols (r<<4, r=1..14) — progressive AC scans' EOB runs;
    # appended LAST so canonical assignment of the baseline symbols
    # (and therefore every baseline stream) is unchanged
    + [r << 4 for r in range(1, 15)]
)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman assignment (JPEG Annex C): symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for i, n in enumerate(bits):
        length = i + 1
        for _ in range(n):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DCT_BASIS = None


def _dct_basis() -> np.ndarray:
    global _DCT_BASIS
    if _DCT_BASIS is None:
        x = np.arange(8)
        u = x.reshape(-1, 1)
        m = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
        m[0] *= 1 / np.sqrt(2)
        _DCT_BASIS = m
    return _DCT_BASIS


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)

    def restart_marker(self, counter: int) -> None:
        """Byte-align (1-bit padding) and emit RSTn — raw, never
        byte-stuffed (markers are the one legal unstuffed 0xFF)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (counter % 8)])


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    w: "_BitWriter",
    block: np.ndarray,
    q2d: np.ndarray,
    m: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """Forward-DCT, quantize, and entropy-code one level-shifted 8×8
    block; returns the new DC predictor. Shared by the grayscale and
    4:2:0 color encoders (identical per-data-unit coding, spec F.1.2)."""
    coef = m @ block @ m.T
    qz = np.round(coef / q2d).astype(np.int64).reshape(64)[ZIGZAG]
    diff = int(qz[0]) - prev_dc
    new_dc = int(qz[0])
    s = _category(diff)
    w.put(*dc_codes[s])
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(qz[1:])[0]
    for i in nz:
        run = int(i) - (int(nz[nz < i][-1]) + 1 if (nz < i).any() else 0)
        while run >= 16:
            w.put(*ac_codes[0xF0])
            run -= 16
        v = int(qz[1 + i])
        s = _category(v)
        w.put(*ac_codes[run * 16 + s])
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
    if len(nz) == 0 or nz[-1] != 62:
        w.put(*ac_codes[0x00])  # EOB
    return new_dc


def encode_jpeg_gray(width: int, height: int, pixels: bytes,
                     quant: np.ndarray = DEFAULT_QUANT) -> bytes:
    """Baseline JFIF grayscale encoder (dimensions must be multiples of 8)."""
    if width % 8 or height % 8:
        raise ValueError("encoder fixture requires multiple-of-8 dimensions")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.float64)
    q2d = quant[ZIGZAG.argsort()].reshape(8, 8)  # natural order (quant is zigzag)
    m = _dct_basis()
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, height, 8):
        for bx in range(0, width, 8):
            prev_dc = _encode_block(
                w, img[by:by + 8, bx:bx + 8] - 128.0, q2d, m,
                dc_codes, ac_codes, prev_dc,
            )
    ecs = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, b"\x00" + bytes(int(v) for v in quant))  # DQT, table 0
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")  # SOF0
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC 0
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC 0
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += ecs
    out += b"\xff\xd9"  # EOI
    return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # 0xFF00 is a stuffed literal; any other marker pauses the
                # bit stream NON-destructively (restart markers resume it
                # via sync_restart; anything else ends the scan)
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    self.pos -= 1  # leave the marker in place
                    break
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def sync_restart(self, counter: int) -> None:
        """Byte-align and consume the expected RSTn marker (spec E.2.4):
        discard the previous interval's padding bits, require the marker
        sequence number to match counter mod 8 (a mismatch means a
        corrupted or mis-counted stream)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            if (self.data[self.pos + 1] & 7) != counter % 8:
                raise ValueError(
                    f"restart marker out of sequence at byte {self.pos}"
                )
            self.pos += 2
            return
        raise ValueError(f"missing restart marker at byte {self.pos}")

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            raise ValueError("truncated entropy-coded segment")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit JPEG magnitude value (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_data_unit(
    r: "_BitReader", dct: dict, act: dict, prev_dc: int
) -> tuple[np.ndarray, int]:
    """Huffman-decode one data unit: returns (zigzag-order int64
    coefficients, new DC predictor). Shared by the grayscale and color
    decoders — per-data-unit decoding is component-independent; only
    the table/predictor SELECTION differs (spec F.2.2)."""
    qz = np.zeros(64, dtype=np.int64)
    s = r.huffman(dct)
    diff = _extend(r.bits(s), s) if s else 0
    prev_dc += diff
    qz[0] = prev_dc
    k = 1
    while k < 64:
        sym = r.huffman(act)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        qz[k] = _extend(r.bits(size), size)
        k += 1
    return qz, prev_dc


def decode_jpeg_gray(payload: bytes) -> dict:
    """Baseline JFIF grayscale decoder: full marker parse, stream-defined
    huffman/quant tables, DC prediction, zigzag, dequant, float IDCT.

    Returns {width, height, pixels: bytes}. Raises on progressive,
    multi-component, or non-8-bit streams (honest capability boundary)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    dc_id = ac_id = 0
    sof_quant_id = None
    ecs_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(np.int64)
                off += 65
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xC0:  # SOF0
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component supported")
            if body[7] != 0x11:
                raise ValueError("subsampled components unsupported")
            sof_quant_id = body[8]
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {(ln_, code): sym for sym, (code, ln_) in codes.items()}
                off += 17 + nvals
        elif marker == 0xDA:  # SOS
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            ecs_start = pos
            break
    if ecs_start is None:
        raise ValueError("no scan found")
    if sof_quant_id is None:
        raise ValueError("SOS without a preceding SOF0 frame header")
    eoi = payload.rfind(b"\xff\xd9")
    r = _BitReader(payload[ecs_start : eoi if eoi > 0 else len(payload)])
    q2d = quant[sof_quant_id][ZIGZAG.argsort()].reshape(8, 8).astype(np.float64)
    m = _dct_basis()
    bw, bh = (width + 7) // 8, (height + 7) // 8
    img = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    prev_dc = 0
    dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
    for by in range(bh):
        for bx in range(bw):
            qz, prev_dc = _decode_data_unit(r, dct, act, prev_dc)
            coef = np.zeros(64, dtype=np.float64)
            coef[ZIGZAG] = qz
            block = m.T @ (coef.reshape(8, 8) * q2d) @ m
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    out = np.clip(np.round(img + 128.0), 0, 255).astype(np.uint8)
    return {
        "width": int(width),
        "height": int(height),
        "pixels": out[:height, :width].tobytes(),
    }


# ---------------------------------------------------------------------------
# JPEG color — YCbCr 4:2:0 chroma subsampling (what real web images are)
# ---------------------------------------------------------------------------
#
# Extends the baseline machinery with the two things color adds and
# nothing else reuses: MCU-interleaved scans (per 16×16 MCU: four Y data
# units then Cb then Cr, each component with its OWN quant table and DC
# predictor) and chroma upsampling + YCbCr→RGB at the end. Per-data-unit
# coding is the shared _encode_block/_decode_data_unit.
#
# Rounding discipline (cross-engine determinism): every plane is
# quantized to INTEGER uint8 (floor(x+0.5), the half-up convention this
# repo standardizes on — Python round() is banker's, DuckDB ROUND is
# half-away) BEFORE color conversion, and the RGB conversion itself is
# floor(x+0.5). Integer plane inputs make 1.402*(cr-128) etc. the SAME
# IEEE double in numpy and any SQL engine, so a closed-form oracle can
# reproduce decoded pixels bit-for-bit (q99h); fp noise from the float
# IDCT (~1e-13) is absorbed by the plane quantization, never reaching a
# floor() boundary.
#
# Exact-oracle trick, color edition: a 16×16 MCU with CONSTANT INTEGER
# (Y, Cb, Cr) survives the whole pipeline exactly — 2×2 chroma averaging
# of a constant is that constant, each plane block has only a DC
# coefficient, and the DC quant step of 8 makes quantization lossless
# (see grayscale note) — so upsampling and the color transform are the
# only remaining arithmetic, both closed-form.

#: ITU-R BT.601 / JFIF full-range color transform coefficients
_YCBCR_FROM_RGB = (
    (0.299, 0.587, 0.114),
    (-0.168736, -0.331264, 0.5),
    (0.5, -0.418688, -0.081312),
)


def _half_up_u8(x: np.ndarray) -> np.ndarray:
    """floor(x+0.5) clipped to uint8 — the deterministic half-up round."""
    return np.clip(np.floor(x + 0.5), 0, 255).astype(np.uint8)


def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 RGB → integer uint8 Y, Cb, Cr planes (JFIF)."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    (ky, kcb, kcr) = _YCBCR_FROM_RGB
    y = ky[0] * r + ky[1] * g + ky[2] * b
    cb = 128.0 + kcb[0] * r + kcb[1] * g + kcb[2] * b
    cr = 128.0 + kcr[0] * r + kcr[1] * g + kcr[2] * b
    return _half_up_u8(y), _half_up_u8(cb), _half_up_u8(cr)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Integer planes → (h, w, 3) uint8 RGB, floor(x+0.5) per channel."""
    yf = y.astype(np.float64)
    d_b = cb.astype(np.float64) - 128.0
    d_r = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * d_r
    g = yf - 0.344136 * d_b - 0.714136 * d_r
    b = yf + 1.772 * d_b
    return np.stack([_half_up_u8(r), _half_up_u8(g), _half_up_u8(b)], axis=-1)


def encode_jpeg_ycbcr(
    width: int,
    height: int,
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    h: int = 2,
    v: int = 2,
    quant_luma: np.ndarray = DEFAULT_QUANT,
    quant_chroma: np.ndarray = DEFAULT_QUANT,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF color encoder from ALREADY-SUBSAMPLED planes, with
    configurable luma sampling (h, v) ∈ {1, 2}²: (2,2) is 4:2:0, (2,1)
    is 4:2:2, (1,2) is 4:4:0, (1,1) is 4:4:4. Chroma is always one 8×8
    data unit per MCU; plane shapes are y (height, width) and cb/cr
    (height/v, width/h); dimensions must be multiples of the MCU size
    (8h × 8v — fixture constraint, like the grayscale encoder).
    Components: Y id 1 quant 0 tables (0,0); Cb/Cr ids 2/3 quant 1
    tables (1,1) — the ubiquitous web-JPEG layout."""
    if h not in (1, 2) or v not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")
    mcu_w, mcu_h = 8 * h, 8 * v
    if width % mcu_w or height % mcu_h:
        raise ValueError(f"encoder fixture requires multiple-of-{mcu_w}x{mcu_h} dimensions")
    sub = (height // v, width // h)
    if y.shape != (height, width) or cb.shape != sub or cr.shape != sub:
        raise ValueError("plane shapes do not match the sampling layout")
    qly = quant_luma[ZIGZAG.argsort()].reshape(8, 8)
    qlc = quant_chroma[ZIGZAG.argsort()].reshape(8, 8)
    m = _dct_basis()
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    yf = y.astype(np.float64) - 128.0
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    dc = {"y": 0, "cb": 0, "cr": 0}
    mcu_n = rst = 0
    for my in range(0, height, mcu_h):
        for mx in range(0, width, mcu_w):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                # byte-align + RSTn, then reset every DC predictor (E.2.4)
                w.restart_marker(rst)
                rst += 1
                dc = {"y": 0, "cb": 0, "cr": 0}
            mcu_n += 1
            for dy in range(0, mcu_h, 8):  # v×h Y data units, raster order
                for dx in range(0, mcu_w, 8):
                    dc["y"] = _encode_block(
                        w, yf[my + dy : my + dy + 8, mx + dx : mx + dx + 8],
                        qly, m, dc_codes, ac_codes, dc["y"],
                    )
            cy, cx = my // v, mx // h
            dc["cb"] = _encode_block(
                w, cbf[cy : cy + 8, cx : cx + 8], qlc, m, dc_codes, ac_codes, dc["cb"]
            )
            dc["cr"] = _encode_block(
                w, crf[cy : cy + 8, cx : cx + 8], qlc, m, dc_codes, ac_codes, dc["cr"]
            )
    ecs = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(v_) for v_ in quant_luma))
    out += seg(0xDB, b"\x01" + bytes(int(v_) for v_ in quant_chroma))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes((0x01, (h << 4) | v, 0x00))  # Y: h×v, quant 0
        + b"\x02\x11\x01"  # Cb: 1x1, quant 1
        + b"\x03\x11\x01",  # Cr: 1x1, quant 1
    )
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))  # DC 0
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # AC 0
    out += seg(0xC4, b"\x01" + bytes(DC_BITS) + bytes(DC_VALS))  # DC 1
    out += seg(0xC4, b"\x11" + bytes(AC_BITS) + bytes(AC_VALS))  # AC 1
    out += seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += ecs
    out += b"\xff\xd9"
    return out


def encode_jpeg_ycbcr_420(
    width: int,
    height: int,
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    quant_luma: np.ndarray = DEFAULT_QUANT,
    quant_chroma: np.ndarray = DEFAULT_QUANT,
) -> bytes:
    """4:2:0 convenience wrapper over encode_jpeg_ycbcr (h=2, v=2)."""
    return encode_jpeg_ycbcr(
        width, height, y, cb, cr, h=2, v=2,
        quant_luma=quant_luma, quant_chroma=quant_chroma,
    )


def encode_jpeg_color_420(width: int, height: int, rgb: bytes) -> bytes:
    """RGB → 4:2:0 JFIF: color transform, integer plane quantization,
    2×2 chroma box-average, then encode_jpeg_ycbcr_420."""
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    y, cb, cr = rgb_to_ycbcr(img)

    def box2(p: np.ndarray) -> np.ndarray:
        f = p.astype(np.float64)
        avg = (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4.0
        return _half_up_u8(avg)

    return encode_jpeg_ycbcr_420(width, height, y, box2(cb), box2(cr))


def decode_jpeg_color(payload: bytes) -> dict:
    """Baseline JFIF color decoder: full marker parse, per-
    component quant/huffman table selection, MCU-interleaved huffman
    decode with per-component DC prediction, dequant + float IDCT per
    plane, integer plane quantization, 2× nearest-neighbor chroma
    upsampling, YCbCr→RGB.

    Returns {width, height, pixels: interleaved RGB bytes}. Handles any
    per-component sampling factors in {1, 2} — 4:2:0 (2×2/1×1/1×1),
    4:2:2 (2×1), 4:4:0 (1×2), 4:4:4 (1×1) — with spec A.2.3 MCU
    geometry (v_i × h_i data units per component per MCU, raster order)
    and per-component nearest-neighbor upsampling to the luma grid.
    Raises on progressive, restart intervals, and factors > 2 (honest
    capability boundary). Closes the round-5 seam note "4:2:0
    chroma-subsampled JPEG (what real web images are)"."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    restart_interval = 0
    comps: list[tuple[int, int, int]] = []  # (component id, hv, quant id)
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id -> (dc id, ac id)
    ecs_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                off += 65
        elif marker == 0xC2:
            return decode_jpeg_progressive(payload)  # SOF2 → multi-scan path
        elif marker in (0xC1, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xC0:
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp != 3:
                raise ValueError("color decoder expects 8-bit 3-component")
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                for i in range(3)
            ]
            for _cid, hv, _tq in comps:
                if (hv >> 4) not in (1, 2) or (hv & 0x0F) not in (1, 2):
                    raise ValueError(
                        f"sampling factor {hv >> 4}x{hv & 0x0F} unsupported"
                        " (1 or 2 per axis)"
                    )
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {(l_, c): s for s, (c, l_) in codes.items()}
                off += 17 + nvals
        elif marker == 0xDA:
            ns = body[0]
            if ns != 3:
                raise ValueError("expected a 3-component interleaved scan")
            for i in range(ns):
                cid = body[1 + 2 * i]
                scan_tables[cid] = (body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
            ecs_start = pos
            break
    if ecs_start is None:
        raise ValueError("no scan found")
    if not comps:
        raise ValueError("SOS without a preceding SOF0 frame header")
    eoi = payload.rfind(b"\xff\xd9")
    r = _BitReader(payload[ecs_start : eoi if eoi > 0 else len(payload)])
    m = _dct_basis()
    names = ["y", "cb", "cr"]
    hs = {n: (hv >> 4) for n, (_c, hv, _t) in zip(names, comps)}
    vs = {n: (hv & 0x0F) for n, (_c, hv, _t) in zip(names, comps)}
    hmax, vmax = max(hs.values()), max(vs.values())
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcx = (width + mcu_w - 1) // mcu_w
    mcy = (height + mcu_h - 1) // mcu_h
    planes = {
        n: np.zeros((mcy * 8 * vs[n], mcx * 8 * hs[n]), dtype=np.float64)
        for n in names
    }
    q2d = {}
    tables = {}
    prev = {"y": 0, "cb": 0, "cr": 0}
    for name, (cid, _hv, tq) in zip(names, comps):
        q2d[name] = quant[tq][ZIGZAG.argsort()].reshape(8, 8).astype(np.float64)
        dc_id, ac_id = scan_tables[cid]
        tables[name] = (huff[(0, dc_id)], huff[(1, ac_id)])

    def one_block(name: str, py: int, px: int) -> None:
        dct, act = tables[name]
        qz, prev[name] = _decode_data_unit(r, dct, act, prev[name])
        coef = np.zeros(64, dtype=np.float64)
        coef[ZIGZAG] = qz
        planes[name][py : py + 8, px : px + 8] = m.T @ (
            coef.reshape(8, 8) * q2d[name]
        ) @ m

    # MCU geometry per spec A.2.3: each component contributes v_i × h_i
    # data units per MCU, raster order, components in scan order; with a
    # DRI interval, every boundary consumes an RSTn and resets the DC
    # predictors (what real encoders emit for error resilience)
    mcu_n = rst = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                r.sync_restart(rst)
                rst += 1
                for n in names:
                    prev[n] = 0
            mcu_n += 1
            for n in names:
                for dy in range(vs[n]):
                    for dx in range(hs[n]):
                        one_block(
                            n, (my * vs[n] + dy) * 8, (mx * hs[n] + dx) * 8
                        )
    # integer plane quantization BEFORE color conversion (see module
    # note — absorbs IDCT fp noise, makes the color math bit-exact),
    # then per-component nearest-neighbor upsampling to the luma grid
    def up_to_full(name: str) -> np.ndarray:
        p = _half_up_u8(planes[name] + 128.0)
        ry, rx = vmax // vs[name], hmax // hs[name]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        return p[:height, :width]

    rgb = ycbcr_to_rgb(up_to_full("y"), up_to_full("cb"), up_to_full("cr"))
    return {
        "width": int(width),
        "height": int(height),
        "pixels": rgb.tobytes(),
    }


# ---------------------------------------------------------------------------
# GIF (87a/89a, single frame) — pure Python, LZW dictionary coding
# ---------------------------------------------------------------------------
#
# Third compression family beside DEFLATE (PNG) and DCT+Huffman (JPEG):
# dictionary coding. The DECODER implements full GIF-LZW — variable code
# width (mcs+1 → 12 bits), clear/EOI codes, dictionary growth with the
# cScSc special case, little-endian bit packing, sub-block framing — so
# it reads real single-frame GIFs. The ENCODER uses the spec-unambiguous
# "uncompressed GIF" technique: literal codes only, with a CLEAR emitted
# before the dictionary would ever grow, so the stream's meaning never
# depends on the early-vs-deferred code-width-change ambiguity that
# plagued historical encoders; every conformant decoder (including ours)
# reads it identically. GIF is lossless, so decode oracles are exact.

GIF_HEADER = b"GIF89a"


class _LSBBitWriter:
    """GIF packs code bits least-significant-bit first."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def encode_gif(width: int, height: int, indices: bytes, palette: list) -> bytes:
    """Single-frame GIF89a with a global color table.

    `indices` are palette indexes (one byte per pixel, row-major);
    `palette` is a list of (r, g, b) tuples, max 256."""
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    if not 0 < len(palette) <= 256:
        raise ValueError("palette must hold 1..256 entries")
    nbits = max(1, (len(palette) - 1).bit_length())
    table_size = 1 << nbits
    mcs = max(2, nbits)  # LZW min code size (>= 2 per spec)
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    code_width = mcs + 1
    max_literals = (1 << code_width) - eoi - 2  # growth headroom per CLEAR

    w = _LSBBitWriter()
    w.put(clear, code_width)
    run = 0
    for px in indices:
        if px >= len(palette):
            raise ValueError(f"index {px} outside palette")
        if run == max_literals:
            w.put(clear, code_width)  # reset before the table could grow
            run = 0
        w.put(px, code_width)
        run += 1
    w.put(eoi, code_width)
    lzw = w.flush()

    out = bytearray(GIF_HEADER)
    out += struct.pack("<HHBBB", width, height, 0x80 | ((nbits - 1) & 7), 0, 0)
    for i in range(table_size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Full GIF-LZW decode of the first image in an 87a/89a stream.

    Skips extension blocks; rejects interlace and local color tables
    (honest capability boundary — both are plumbing, not new decode
    machinery). Returns {width, height, indices, palette}."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or malformed GIF: {exc}") from exc


def _decode_gif_body(payload: bytes) -> dict:
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = []
    if packed & 0x80:
        n = 2 << (packed & 7)
        for i in range(n):
            palette.append(tuple(payload[pos + 3 * i : pos + 3 * i + 3]))
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            break
        elif b == 0x3B:
            raise ValueError("no image data before trailer")
        else:
            raise ValueError(f"unexpected block 0x{b:02x}")
    _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
    if ipacked & 0x40:
        raise ValueError("interlaced GIFs unsupported")
    if ipacked & 0x80:
        raise ValueError("local color tables unsupported")
    pos += 10
    mcs = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        n = payload[pos]
        data += payload[pos + 1 : pos + 1 + n]
        pos += 1 + n

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = {i: bytes([i]) for i in range(1 << mcs)}
    table = dict(base)
    next_code = eoi + 1
    code_width = mcs + 1
    acc = nbits = idx = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < code_width:
            if idx >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[idx] << nbits
            nbits += 8
            idx += 1
        code = acc & ((1 << code_width) - 1)
        acc >>= code_width
        nbits -= code_width
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            code_width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the cScSc case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_width) and code_width < 12:
                code_width += 1
        prev = entry
    if len(out) != iw * ih:
        raise ValueError(f"decoded {len(out)} pixels, expected {iw * ih}")
    return {"width": int(iw), "height": int(ih), "indices": bytes(out),
            "palette": palette}


# ---------------------------------------------------------------------------
# AVI (RIFF) container with MJPEG frames — the video seam, closed
# ---------------------------------------------------------------------------
#
# Motion-JPEG is the one video format a pure-Python stack can own end to
# end now that the 4:2:0 color JPEG decoder exists: an AVI is a RIFF
# chunk tree (fourcc + u32 size + payload, word-aligned) whose 'movi'
# list carries one '00dc' chunk per frame, each holding a complete JPEG.
# "Decode video" therefore decomposes into real container machinery
# (fourcc walk, LIST recursion, even-byte padding, avih/strh/strf stream
# headers, idx1 index) plus the per-frame JPEG path already proven by
# q99f/q99h. Inter-frame-predicted codecs (H.264 etc.) remain the
# deploy-time seam — they need bitstream machinery of a different order.
#
# The ENCODER emits a minimal spec-valid single-stream AVI (RIFF/AVI,
# hdrl with avih + one vids/MJPG strl, movi, idx1); the DECODER is
# general for single-video-stream MJPEG AVIs from any muxer: it walks
# the chunk tree, validates the MJPG fourcc, and extracts '00dc'/'00db'
# frame payloads in stream order.

AVI_US_PER_FRAME_DEFAULT = 33_333  # ~30 fps


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # chunks are word-aligned
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _riff_list(list_type: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    us_per_frame: int = AVI_US_PER_FRAME_DEFAULT,
) -> bytes:
    """Single-stream MJPEG AVI from per-frame JPEG payloads."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        us_per_frame, max_frame * 1_000_000 // max(us_per_frame, 1), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_frame, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, us_per_frame, 1_000_000,
                      0, len(frames), max_frame, 0xFFFFFFFF, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_riff_chunk(b"00dc", f) for f in frames)
    movi = _riff_list(b"movi", movi_payload)
    # idx1: one entry per frame — offset is from the start of 'movi'+4
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return _riff_chunk(b"RIFF", riff_payload)


def decode_avi_mjpeg(payload: bytes) -> dict:
    """Walk the RIFF tree of a single-video-stream MJPEG AVI.

    Returns {width, height, n_frames, frames: [jpeg bytes, ...]} with
    frames still JPEG-encoded (sampling decides which to decode — the
    point of frame sampling is NOT paying decode for dropped frames).
    Raises on non-AVI RIFF, non-MJPG video streams, and truncated
    chunks (honest boundaries)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF signature)")
    width = height = 0
    handler_ok = False
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, handler_ok
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                walk(buf, body_start + 4, body_end)
            elif fourcc == b"strh":
                if buf[body_start : body_start + 4] == b"vids":
                    handler = buf[body_start + 4 : body_start + 8]
                    if handler not in (b"MJPG", b"mjpg"):
                        raise ValueError(f"unsupported video codec {handler!r}")
                    handler_ok = True
            elif fourcc == b"avih":
                width, height = struct.unpack_from("<II", buf, body_start + 32)
            elif fourcc in (b"00dc", b"00db"):
                frames.append(buf[body_start:body_end])
            pos = body_end + (size % 2)  # word alignment

    walk(payload, 12, len(payload))
    if not handler_ok:
        raise ValueError("no MJPG video stream header found")
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": len(frames),
        "frames": frames,
    }


def sample_avi_frames(payload: bytes, every_n: int = 2) -> list[dict]:
    """Container walk + decode every Nth frame (JPEG decode only for
    sampled frames). Returns [{frame_idx, width, height, pixels}]."""
    avi = decode_avi_mjpeg(payload)
    out = []
    for i in range(0, avi["n_frames"], max(every_n, 1)):
        d = decode_jpeg_color(avi["frames"][i])
        out.append({"frame_idx": i, **d})
    return out


# ---------------------------------------------------------------------------
# IMA ADPCM in WAV (format tag 0x11) — compressed audio, executing
# ---------------------------------------------------------------------------
#
# Fourth compression family (after DEFLATE, DCT+Huffman, LZW):
# differential PCM with adaptive quantization. The DECODER implements
# the full IMA/DVI spec — per-block headers (initial predictor + step
# index), low-nibble-first 4-bit packing, the 89-entry step table,
# sign-magnitude diff reconstruction, predictor clamping, step-index
# adaptation — so it reads any mono IMA-WAV. The ENCODER mirrors the
# decoder's state transition exactly (the standard ADPCM property:
# encoder tracks its own reconstruction), which gives the roundtrip
# test its exact-equality form.
#
# Exact-oracle trick, ADPCM edition: at step index 0 (step = 7) the
# representable diffs are exactly {0, ±1, ±3, ±4} (nibbles 0-3/8-11,
# whose index adjustments are all -1 → index stays clamped at 0), so a
# waveform whose per-sample deltas stay in that set reconstructs
# EXACTLY and its decode is a closed-form cumulative sum — SQL-checkable
# (q99j). General signals (index motion, clamping) are property-tested
# via encoder-reconstruction equality. MP3 and other perceptual codecs
# remain the deploy-time seam — different machinery entirely.

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_reconstruct(predictor: int, step: int, nibble: int) -> int:
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    return max(-32768, min(32767, predictor))


def ima_adpcm_encode_block(samples: list[int], index: int = 0) -> tuple[bytes, int]:
    """One mono IMA block: 4-byte header (predictor, index) + packed
    nibbles for samples[1:]. Returns (block bytes, final index). The
    encoder follows ITS OWN reconstruction, never the input, so decode
    reproduces the encoder's tracked signal exactly."""
    clamp16 = lambda v: max(-32768, min(32767, int(v)))  # noqa: E731
    predictor = clamp16(samples[0])
    out = bytearray(struct.pack("<hBB", predictor, index, 0))
    nibbles = []
    for s in samples[1:]:
        step = IMA_STEP_TABLE[index]
        diff = clamp16(s) - predictor
        nibble = 0
        if diff < 0:
            nibble = 8
            diff = -diff
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= step >> 1:
            nibble |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nibble |= 1
        predictor = _ima_reconstruct(predictor, step, nibble)
        index = max(0, min(88, index + IMA_INDEX_TABLE[nibble]))
        nibbles.append(nibble)
    for i in range(0, len(nibbles), 2):
        lo = nibbles[i]
        hi = nibbles[i + 1] if i + 1 < len(nibbles) else 0
        out.append(lo | (hi << 4))  # low nibble first
    return bytes(out), index


def encode_wav_ima_adpcm(
    samples, framerate: int = 8000, block_align: int = 256
) -> bytes:
    """Mono IMA-ADPCM WAV (format 0x11): fmt with wSamplesPerBlock,
    fact with the sample count, data as fixed-size blocks (each with a
    fresh header carrying the running predictor; index restarts at 0
    per block — legal, slightly suboptimal, exactness-friendly)."""
    samples = [int(s) for s in samples]
    spb = 1 + (block_align - 4) * 2  # samples per block
    blocks = []
    for off in range(0, len(samples), spb):
        chunk = samples[off : off + spb]
        if len(chunk) < spb:  # pad the tail block by holding the last value
            chunk = chunk + [chunk[-1]] * (spb - len(chunk))
        blk, _ = ima_adpcm_encode_block(chunk, index=0)
        blocks.append(blk)
    data = b"".join(blocks)
    n_blocks = len(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, framerate,
        framerate * block_align // spb, block_align, 4, 2, spb,
    )
    fact = struct.pack("<I", n_blocks * spb)
    riff = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmt)
        + _riff_chunk(b"fact", fact)
        + _riff_chunk(b"data", data)
    )
    return _riff_chunk(b"RIFF", riff)


def decode_wav_ima_adpcm(payload: bytes) -> dict:
    """Mono IMA-ADPCM WAV → {framerate, n_samples, samples: list[int]}.

    Full spec decode: block headers re-seed predictor AND step index,
    low-nibble-first unpacking, adaptive step walk, int16 clamping.
    Raises on stereo, non-0x11 formats, and truncated blocks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF signature)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"fmt ":
            fmt = body
        elif fourcc == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, framerate, _abps, block_align = struct.unpack_from("<HHIIH", fmt, 0)
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (format tag 0x{tag:x})")
    if channels != 1:
        raise ValueError("only mono IMA ADPCM supported")
    spb = struct.unpack_from("<H", fmt, 18)[0] if len(fmt) >= 20 else (
        1 + (block_align - 4) * 2
    )
    samples: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block")
        predictor, index, _rsv = struct.unpack_from("<hBB", block, 0)
        index = max(0, min(88, index))
        samples.append(predictor)
        produced = 1
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):  # low nibble first
                if produced >= spb:
                    break
                step = IMA_STEP_TABLE[index]
                predictor = _ima_reconstruct(predictor, step, nibble)
                index = max(0, min(88, index + IMA_INDEX_TABLE[nibble]))
                samples.append(predictor)
                produced += 1
    return {"framerate": int(framerate), "n_samples": len(samples), "samples": samples}


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) — spectral selection + successive approximation
# ---------------------------------------------------------------------------
#
# The most common web-JPEG variant after baseline. A progressive stream
# carries the SAME quantized DCT coefficients as a sequential one, split
# across multiple scans: DC first (interleaved, optionally bit-truncated
# by the point transform Al) then refined one bit at a time; AC bands
# (non-interleaved, one component per scan) first-passed at precision Al
# with EOB-run coding, then refined via the G.1.2.3 correction-bit
# algorithm. Decode = accumulate coefficients scan by scan, IDCT once at
# the end — so a progressive stream must decode BIT-IDENTICALLY to the
# baseline stream carrying the same coefficients, which is exactly what
# the tests pin (same fixtures, two codings, equal pixels).
#
# The WRITER emits a libjpeg-style scan script (DC w/ successive
# approximation + per-component AC bands + refinement passes) from the
# coefficient planes the sequential encoder computes — real multi-scan
# streams, not a toy single-scan reshuffle. Point-transform semantics
# follow the spec/libjpeg: DC uses arithmetic shifts (floor), AC uses
# sign-magnitude truncation toward zero.

def _plane_coefs(plane: np.ndarray, q2d: np.ndarray) -> np.ndarray:
    """(h/8, w/8, 64) quantized coefficients in ZIGZAG order."""
    m = _dct_basis()
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((by, bx, 64), dtype=np.int64)
    f = plane.astype(np.float64) - 128.0
    for y in range(by):
        for x in range(bx):
            coef = m @ f[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] @ m.T
            out[y, x] = np.round(coef / q2d).astype(np.int64).reshape(64)[ZIGZAG]
    return out


DEFAULT_PROGRESSIVE_SCRIPT = (
    # (component indices, Ss, Se, Ah, Al) — libjpeg's default shape
    ((0, 1, 2), 0, 0, 0, 1),   # DC first, approx bit 1
    ((0,), 1, 5, 0, 2),        # luma low band
    ((1,), 1, 63, 0, 1),       # chroma full band
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),       # luma high band
    ((0,), 1, 63, 2, 1),       # luma AC refinement 2→1
    ((0, 1, 2), 0, 0, 1, 0),   # DC refinement
    ((0,), 1, 63, 1, 0),       # final AC refinements
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


def _ac_point(v: int, al: int) -> int:
    """AC point transform: sign-magnitude truncation toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def _write_dc_scan(w, comps, coefs, al: int, first: bool, dc_codes, mcu_order):
    prev = {c: 0 for c in comps}
    for ci, by, bx in mcu_order:
        if ci not in prev:
            continue
        full = int(coefs[ci][by, bx, 0])
        if first:
            val = full >> al  # arithmetic shift (floor), spec G.1.2.1
            diff = val - prev[ci]
            prev[ci] = val
            s = _category(diff)
            w.put(*dc_codes[s])
            if s:
                w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:
            w.put((full >> al) & 1, 1)  # one refinement bit per block


def _write_ac_first(w, blocks, ss, se, al, ac_codes):
    """AC first scan for one component's block list, EOB-run coded."""
    eobrun = 0

    def flush_eob():
        # one EOBn symbol encodes the whole run: EOBn covers lengths
        # [2^r, 2^(r+1)-1] via r extra bits; eobrun is capped at 0x7FFF
        # (r <= 14) by the callers
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            w.put(*ac_codes[r << 4])
            if r:
                w.put(eobrun - (1 << r), r)
            eobrun = 0

    for blk in blocks:
        band = [(k, _ac_point(int(blk[k]), al)) for k in range(ss, se + 1)]
        nz = [(k, v) for k, v in band if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last_k = ss - 1
        for k, v in nz:
            run = k - last_k - 1
            while run >= 16:
                w.put(*ac_codes[0xF0])
                run -= 16
            s = _category(v)
            w.put(*ac_codes[run * 16 + s])
            w.put(v if v >= 0 else v + (1 << s) - 1, s)
            last_k = k
        if last_k < se:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _write_ac_refine(w, blocks, ss, se, al, ac_codes):
    """AC refinement scan (G.1.2.3 mirror): newly-significant coefs are
    run-length coded over ZERO-HISTORY positions only; every already-
    nonzero position passed over emits one correction bit."""
    eobrun = 0
    pending: list[int] = []  # correction bits owed once a symbol is emitted

    def emit_pending():
        for b in pending:
            w.put(b, 1)
        pending.clear()

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            r = min(eobrun.bit_length() - 1, 14)
            n = 1 << r
            w.put(*ac_codes[r << 4])
            if r:
                w.put(eobrun - n, r)
            emit_pending()
            eobrun = 0

    for blk in blocks:
        newly = []
        for k in range(ss, se + 1):
            full = int(blk[k])
            now = _ac_point(full, al)
            before = _ac_point(full, al + 1)
            if before == 0 and now != 0:
                newly.append((k, now))  # becomes significant this pass
        corr = {
            k: (abs(_ac_point(int(blk[k]), al)) & 1)
            for k in range(ss, se + 1)
            if _ac_point(int(blk[k]), al + 1) != 0
        }
        if not newly:
            # block contributes only correction bits → extend the EOB run
            eobrun += 1
            pending.extend(corr[k] for k in sorted(corr))
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        last_k = ss - 1
        for k, now in newly:
            # POSITION-ORDERED walk mirroring the decoder: the zero-run
            # counts only zero-HISTORY positions; a history position's
            # correction bit rides with the symbol whose run it falls
            # inside (a ZRL's bits are exactly those passed before its
            # 16th zero-history position — G.1.2.3)
            run = 0
            bits_buf = []
            for j in range(last_k + 1, k):
                if j in corr:
                    bits_buf.append(corr[j])
                else:
                    run += 1
                    if run == 16:
                        w.put(*ac_codes[0xF0])
                        for b in bits_buf:
                            w.put(b, 1)
                        bits_buf = []
                        run = 0
            assert now in (-1, 1)  # newly significant at this precision
            w.put(*ac_codes[run * 16 + 1])
            w.put(1 if now > 0 else 0, 1)
            for b in bits_buf:
                w.put(b, 1)
            last_k = k
        # tail: remaining history corrections to Se ride the next symbol
        tail = [corr[j] for j in range(last_k + 1, se + 1) if j in corr]
        if any(j not in corr and _ac_point(int(blk[j]), al) != 0
               for j in range(last_k + 1, se + 1)):
            raise AssertionError("unreached: nonzero zero-history past last")
        if tail or last_k < se:
            eobrun += 1
            pending.extend(tail)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    width: int,
    height: int,
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    h: int = 2,
    v: int = 2,
    quant_luma: np.ndarray = DEFAULT_QUANT,
    quant_chroma: np.ndarray = DEFAULT_QUANT,
    script=DEFAULT_PROGRESSIVE_SCRIPT,
) -> bytes:
    """Progressive JFIF (SOF2) from already-subsampled planes, same
    layout contract as encode_jpeg_ycbcr; coefficients identical to the
    sequential encoding, split across `script`'s scans."""
    if h not in (1, 2) or v not in (1, 2):
        raise ValueError("sampling factors must be 1 or 2")
    mcu_w, mcu_h = 8 * h, 8 * v
    if width % mcu_w or height % mcu_h:
        raise ValueError(f"encoder fixture requires multiple-of-{mcu_w}x{mcu_h} dimensions")
    qly = quant_luma[ZIGZAG.argsort()].reshape(8, 8)
    qlc = quant_chroma[ZIGZAG.argsort()].reshape(8, 8)
    coefs = [
        _plane_coefs(y, qly),
        _plane_coefs(cb, qlc),
        _plane_coefs(cr, qlc),
    ]
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)

    # interleaved MCU order for DC scans: v×h luma units then chroma
    mcu_order = []
    for my in range(height // mcu_h):
        for mx in range(width // mcu_w):
            for dy in range(v):
                for dx in range(h):
                    mcu_order.append((0, my * v + dy, mx * h + dx))
            mcu_order.append((1, my, mx))
            mcu_order.append((2, my, mx))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(q) for q in quant_luma))
    out += seg(0xDB, b"\x01" + bytes(int(q) for q in quant_chroma))
    out += seg(
        0xC2,  # SOF2: progressive DCT
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes((0x01, (h << 4) | v, 0x00))
        + b"\x02\x11\x01"
        + b"\x03\x11\x01",
    )
    out += seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xC4, b"\x01" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xC4, b"\x11" + bytes(AC_BITS) + bytes(AC_VALS))

    comp_ids = (1, 2, 3)
    for comps, ss, se, ah, al in script:
        w = _BitWriter()
        if ss == 0:  # DC scan (interleaved over all listed components)
            if se != 0:
                raise ValueError("DC scans must have Se=0")
            _write_dc_scan(w, set(comps), coefs, al, ah == 0, dc_codes, mcu_order)
        else:
            if len(comps) != 1:
                raise ValueError("AC scans are single-component")
            ci = comps[0]
            blocks = [
                coefs[ci][by, bx]
                for by in range(coefs[ci].shape[0])
                for bx in range(coefs[ci].shape[1])
            ]
            if ah == 0:
                _write_ac_first(w, blocks, ss, se, al, ac_codes)
            else:
                if ah != al + 1:
                    raise ValueError("refinement must step one bit (Ah=Al+1)")
                _write_ac_refine(w, blocks, ss, se, al, ac_codes)
        hdr = bytes([len(comps)])
        for ci in comps:
            table = 0 if ci == 0 else 1
            hdr += bytes([comp_ids[ci], (table << 4) | table])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, hdr)
        out += w.flush()
    out += b"\xff\xd9"
    return out


def decode_jpeg_progressive(payload: bytes) -> dict:
    """Progressive JFIF (SOF2) color decoder: multi-scan coefficient
    accumulation — interleaved/non-interleaved DC first + refinement,
    AC band first scans with EOB-run decoding, AC refinement via the
    G.1.2.3 correction-bit walk — then one dequant + IDCT per plane and
    the shared color path (integer plane quantization, upsampling,
    YCbCr→RGB). Same sampling-factor support as decode_jpeg_color
    ({1,2} per axis); returns the same dict. A progressive stream
    carrying baseline-equal coefficients decodes bit-identically to the
    baseline stream (pinned in tests)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    width = height = 0
    comps: list[tuple[int, int, int]] = []
    coefs: dict[int, np.ndarray] = {}  # comp index -> (by, bx, 64) zigzag
    names_by_cid: dict[int, int] = {}
    hs: list[int] = []
    vs: list[int] = []
    mcx = mcy = 0

    def next_marker_pos(p: int) -> int:
        """First true marker at/after p (skips entropy bytes, stuffed
        FF00 and restart markers)."""
        while p + 1 < len(payload):
            if payload[p] == 0xFF and payload[p + 1] not in (0x00,) and not (
                0xD0 <= payload[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return len(payload)

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                codes = _build_codes(bits, vals)
                huff[(tc, th)] = {(l_, c): s for s, (c, l_) in codes.items()}
                off += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("decode_jpeg_progressive expects SOF2")
        elif marker == 0xDD:
            if struct.unpack_from(">H", body, 0)[0]:
                raise ValueError("restart intervals unsupported in progressive")
        elif marker == 0xC2:
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp != 3:
                raise ValueError("progressive decoder expects 8-bit 3-component")
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i])
                for i in range(3)
            ]
            for i, (cid, hv, _tq) in enumerate(comps):
                names_by_cid[cid] = i
                if (hv >> 4) not in (1, 2) or (hv & 0x0F) not in (1, 2):
                    raise ValueError("sampling factors must be 1 or 2")
                hs.append(hv >> 4)
                vs.append(hv & 0x0F)
            hmax, vmax = max(hs), max(vs)
            mcx = (width + 8 * hmax - 1) // (8 * hmax)
            mcy = (height + 8 * vmax - 1) // (8 * vmax)
            for i in range(3):
                coefs[i] = np.zeros(
                    (mcy * vs[i], mcx * hs[i], 64), dtype=np.int64
                )
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scomps = []  # (comp index, dc table id, ac table id)
            for i in range(ns):
                cid = body[1 + 2 * i]
                scomps.append(
                    (names_by_cid[cid], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            end = next_marker_pos(pos)
            r = _BitReader(payload[pos:end])
            _decode_progressive_scan(
                r, coefs, scomps, ss, se, ah, al, huff, hs, vs, mcx, mcy
            )
            pos = end
    if not comps:
        raise ValueError("no SOF2 frame found")
    # reconstruct planes: dequant + IDCT per block, then the shared path
    m = _dct_basis()
    planes = []
    for i, (_cid, _hv, tq) in enumerate(comps):
        q2d = quant[tq][ZIGZAG.argsort()].reshape(8, 8).astype(np.float64)
        by, bx, _ = coefs[i].shape
        plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
        for yy in range(by):
            for xx in range(bx):
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = coefs[i][yy, xx]
                plane[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8] = (
                    m.T @ (coef.reshape(8, 8) * q2d) @ m
                )
        planes.append(_half_up_u8(plane + 128.0))
    hmax, vmax = max(hs), max(vs)

    def up_to_full(i: int) -> np.ndarray:
        p = planes[i]
        ry, rx = vmax // vs[i], hmax // hs[i]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        return p[:height, :width]

    rgb = ycbcr_to_rgb(up_to_full(0), up_to_full(1), up_to_full(2))
    return {"width": int(width), "height": int(height), "pixels": rgb.tobytes()}


def _decode_progressive_scan(
    r, coefs, scomps, ss, se, ah, al, huff, hs, vs, mcx, mcy
) -> None:
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        prev = {ci: 0 for ci, _d, _a in scomps}
        tables = {ci: huff[(0, d)] for ci, d, _a in scomps}
        if len(scomps) > 1:  # interleaved MCU order
            order = []
            for my in range(mcy):
                for mx in range(mcx):
                    for ci, _d, _a in scomps:
                        for dy in range(vs[ci]):
                            for dx in range(hs[ci]):
                                order.append((ci, my * vs[ci] + dy, mx * hs[ci] + dx))
        else:
            ci = scomps[0][0]
            by, bx, _ = coefs[ci].shape
            order = [(ci, yy, xx) for yy in range(by) for xx in range(bx)]
        for ci, yy, xx in order:
            if ah == 0:
                s = r.huffman(tables[ci])
                diff = _extend(r.bits(s), s) if s else 0
                prev[ci] += diff
                coefs[ci][yy, xx, 0] = prev[ci] << al
            else:
                if r.bits(1):
                    coefs[ci][yy, xx, 0] |= 1 << al
        return
    # AC scan: single component, raster block order
    if len(scomps) != 1:
        raise ValueError("progressive AC scans are single-component")
    ci, _dcid, acid = scomps[0]
    act = huff[(1, acid)]
    by, bx, _ = coefs[ci].shape
    eobrun = 0
    for yy in range(by):
        for xx in range(bx):
            blk = coefs[ci][yy, xx]
            if ah == 0:
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = r.huffman(act)
                    rr, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if rr < 15:
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        k += 16  # ZRL
                        continue
                    k += rr
                    if k > se:
                        raise ValueError("AC run past band end")
                    blk[k] = _extend(r.bits(s), s) << al
                    k += 1
            else:  # refinement (G.1.2.3)
                p1, m1 = 1 << al, -1 << al
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = r.huffman(act)
                        rr, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if rr < 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.bits(rr)
                                break
                            val = 0  # ZRL: rr = 15 → skip 16 zero-history
                        else:
                            if s != 1:
                                raise ValueError("refinement size must be 1")
                            val = p1 if r.bits(1) else m1
                        while k <= se:
                            if blk[k] != 0:
                                if r.bits(1):
                                    blk[k] += p1 if blk[k] > 0 else m1
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if val and k <= se:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            if r.bits(1):
                                blk[k] += p1 if blk[k] > 0 else m1
                        k += 1
                    eobrun -= 1


# ---------------------------------------------------------------------------
# G.711 companding (μ-law / A-law) — telephony PCM, exactly invertible
# ---------------------------------------------------------------------------
#
# The logarithmic 8-bit companding codecs every PSTN/VoIP stack speaks.
# Unlike the DCT/LZW families these are closed-form per-sample integer
# maps, so decode is oracle-checkable on ARBITRARY audio: the μ-law
# expansion is ((2m+33) << e) - 33 over the 4-bit mantissa/3-bit
# exponent split (sign-magnitude, bits stored inverted on the wire),
# A-law the piecewise-linear variant with even-bit inversion (0x55).
# Encoders implement the standard segment search; encode∘decode is
# pinned idempotent (companding is a projection onto 256 levels).

MULAW_BIAS = 33  # 0x21, the spec's linearization bias


def mulaw_encode(sample: int) -> int:
    """int16 → 8-bit μ-law byte (G.711, bit-inverted on the wire)."""
    s = max(-32768, min(32767, int(sample)))
    # G.711: sign bit (after the trailing ~inversion) SET means NEGATIVE —
    # Sun g711.c pins mulaw_encode(0)==0xFF and mulaw_decode(0x00)==-32124.
    sign = 0x00 if s >= 0 else 0x80
    mag = min((s if s >= 0 else -s - 1) // 4 + MULAW_BIAS, 0x1FFF)  # 13-bit domain
    exp = mag.bit_length() - 6  # segment: highest set bit above the mantissa
    exp = max(0, min(7, exp))
    mant = (mag >> (exp + 1)) & 0x0F
    return (~(sign | (exp << 4) | mant)) & 0xFF


def mulaw_decode(byte: int) -> int:
    """8-bit μ-law byte → int16 (exact closed-form expansion)."""
    b = (~int(byte)) & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((2 * mant + MULAW_BIAS) << exp) - MULAW_BIAS) * 4
    return mag if sign == 0 else -mag


def alaw_encode(sample: int) -> int:
    """int16 → 8-bit A-law byte (G.711, even bits inverted: XOR 0x55)."""
    s = max(-32768, min(32767, int(sample)))
    sign = 0x80 if s >= 0 else 0x00
    mag = (s if s >= 0 else -s - 1) >> 3  # 13-bit A-law domain
    if mag < 32:  # segment 0: linear, step 2 in the 13-bit domain
        exp, mant = 0, mag >> 1
    else:  # segment exp covers [2^(exp+4), 2^(exp+5))
        exp = min(7, mag.bit_length() - 5)
        mant = (mag >> exp) & 0x0F
    return (sign | (exp << 4) | mant) ^ 0x55


def alaw_decode(byte: int) -> int:
    """8-bit A-law byte → int16 (exact closed-form expansion)."""
    b = int(byte) ^ 0x55
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    if exp == 0:
        mag = (mant * 2 + 1) * 8
    else:
        mag = ((mant * 2 + 33) << (exp - 1)) * 8
    return mag if sign else -mag


def g711_decode_block(data: bytes, law: str = "mulaw") -> list[int]:
    fn = mulaw_decode if law == "mulaw" else alaw_decode
    return [fn(b) for b in data]


def encode_wav_g711(data: bytes, law: str = "mulaw", framerate: int = 8000) -> bytes:
    """Mono G.711 WAV: format tag 7 (μ-law) / 6 (A-law), 8 bits/sample."""
    tag = 7 if law == "mulaw" else 6
    fmt = struct.pack("<HHIIHHH", tag, 1, framerate, framerate, 1, 8, 0)
    riff = (
        b"WAVE"
        + _riff_chunk(b"fmt ", fmt)
        + _riff_chunk(b"fact", struct.pack("<I", len(data)))
        + _riff_chunk(b"data", data)
    )
    return _riff_chunk(b"RIFF", riff)


def decode_wav_g711(payload: bytes) -> dict:
    """Mono G.711 WAV → {framerate, law, n_samples, samples}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF signature)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"fmt ":
            fmt = body
        elif fourcc == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, framerate = struct.unpack_from("<HHI", fmt, 0)
    if tag not in (6, 7):
        raise ValueError(f"not G.711 (format tag 0x{tag:x})")
    if channels != 1:
        raise ValueError("only mono G.711 supported")
    law = "mulaw" if tag == 7 else "alaw"
    return {
        "framerate": int(framerate),
        "law": law,
        "n_samples": len(data),
        "samples": g711_decode_block(data, law),
    }


# ---------------------------------------------------------------------------
# FLAC — free lossless audio codec (subset: 16-bit, fixed-prediction
# subframes). Lossless means the oracle is exact on ARBITRARY signals —
# no fixture class needed, unlike the DCT family. Implements the real
# stream format: fLaC marker + STREAMINFO, frame headers with sync code,
# UTF-8-coded frame numbers and CRC-8, constant/verbatim/fixed(0-4)
# subframes, Rice-coded residuals with 4- and 5-bit parameters and
# partition orders, and the frame-footer CRC-16.
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    """CRC-8 poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0 — FLAC frame-footer CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _MSBBitWriter:
    """Plain MSB-first bit writer (no JPEG byte stuffing)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _MSBBitReader:
    """Plain MSB-first bit reader over a byte window."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte_pos = pos
        self.bit_pos = 0

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte_pos >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            bit = (self.data[self.byte_pos] >> (7 - self.bit_pos)) & 1
            v = (v << 1) | bit
            self.bit_pos += 1
            if self.bit_pos == 8:
                self.bit_pos = 0
                self.byte_pos += 1
        return v

    def signed_bits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit_pos:
            self.bit_pos = 0
            self.byte_pos += 1


#: fixed-predictor residual rules, order -> coefficients on s[i-1..i-order]
_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_coded_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (RFC 2279 pattern)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits_left = n.bit_length()
    # capacity of an n_bytes coding = (7 - n_bytes) lead bits +
    # 6*(n_bytes - 1) continuation bits = 5*n_bytes + 1; grow only past
    # that so boundary values (e.g. 16-bit frame numbers at n_bytes=3)
    # stay minimal — strict decoders reject overlong codings
    n_bytes = 2
    while bits_left > 5 * n_bytes + 1:
        n_bytes += 1
    lead_mask = (0xFF << (8 - n_bytes)) & 0xFF
    shift = 6 * (n_bytes - 1)
    out.append(lead_mask | (n >> shift))
    for i in range(n_bytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_coded_number(r: _MSBBitReader) -> int:
    b0 = r.bits(8)
    if b0 < 0x80:
        return b0
    n_bytes = 0
    mask = 0x80
    while b0 & mask:
        n_bytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_bytes - 1):
        cont = r.bits(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation byte")
        v = (v << 6) | (cont & 0x3F)
    return v


def _best_rice_param(resid: list[int]) -> int:
    us = [2 * x if x >= 0 else -2 * x - 1 for x in resid]
    best_k, best_cost = 0, None
    for k in range(15):
        cost = sum((u >> k) + 1 + k for u in us)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _write_residual(
    w: _MSBBitWriter, resid: list[int], block_size: int, order: int,
    partition_order: int,
) -> None:
    w.put(0, 2)  # residual method 0: 4-bit rice params
    w.put(partition_order, 4)
    n_part = 1 << partition_order
    assert block_size % n_part == 0
    idx = 0
    for p in range(n_part):
        count = block_size // n_part - (order if p == 0 else 0)
        chunk = resid[idx : idx + count]
        idx += count
        k = _best_rice_param(chunk)
        w.put(k, 4)
        for x in chunk:
            u = 2 * x if x >= 0 else -2 * x - 1
            w.put_unary(u >> k)
            if k:
                w.put(u & ((1 << k) - 1), k)


def _read_residual(
    r: _MSBBitReader, block_size: int, order: int
) -> list[int]:
    method = r.bits(2)
    if method not in (0, 1):
        raise ValueError(f"FLAC: reserved residual method {method}")
    param_bits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    partition_order = r.bits(4)
    n_part = 1 << partition_order
    if block_size % n_part:
        raise ValueError("FLAC: partition count does not divide block size")
    out = []
    for p in range(n_part):
        count = block_size // n_part - (order if p == 0 else 0)
        k = r.bits(param_bits)
        if k == escape:  # raw residuals, fixed bit width
            width = r.bits(5)
            out.extend(r.signed_bits(width) for _ in range(count))
            continue
        for _ in range(count):
            u = (r.unary() << k) | (r.bits(k) if k else 0)
            out.append(u >> 1 if u % 2 == 0 else -(u >> 1) - 1)
    return out


def _encode_subframe(
    w: _MSBBitWriter, samples: list[int], bps: int, order: int,
    partition_order: int,
) -> None:
    n = len(samples)
    w.put(0, 1)  # pad
    if all(s == samples[0] for s in samples):
        w.put(0b000000, 6)
        w.put(0, 1)  # no wasted bits
        w.put(samples[0] & ((1 << bps) - 1), bps)
        return
    w.put(0b001000 | order, 6)  # FIXED, given order
    w.put(0, 1)
    for s in samples[:order]:  # warmup, raw
        w.put(s & ((1 << bps) - 1), bps)
    coefs = _FLAC_FIXED_COEFS[order]
    resid = [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, n)
    ]
    _write_residual(w, resid, n, order, partition_order)


def encode_flac(
    samples: list[int] | list[list[int]],
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 256,
    order: int = 2,
    partition_order: int = 0,
) -> bytes:
    """Mono or independent-stereo FLAC with FIXED-prediction subframes.

    Lossless by construction: decode_flac(encode_flac(s)) == s for any
    int16 signal — the property the oracle exactness rests on."""
    chans = samples if isinstance(samples[0], list) else [samples]
    n_samples = len(chans[0])
    assert all(len(c) == n_samples for c in chans)
    n_ch = len(chans)
    # STREAMINFO (34 bytes)
    si = _MSBBitWriter()
    si.put(block_size, 16)
    si.put(block_size, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(n_ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n_samples, 36)
    for _ in range(16):
        si.put(0, 8)  # md5 unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes()  # last block
    for frame_no, start in enumerate(range(0, n_samples, block_size)):
        blk = [c[start : start + block_size] for c in chans]
        bs = len(blk[0])
        h = _MSBBitWriter()
        h.put(0b11111111111110, 14)
        h.put(0, 1)
        h.put(0, 1)  # fixed blocking
        h.put(0b0111, 4)  # blocksize-1 follows as 16 bits
        h.put(0b0000, 4)  # sample rate from STREAMINFO
        h.put(n_ch - 1, 4)  # independent channels
        h.put(0b100, 3)  # 16 bits per sample
        h.put(0, 1)
        header = h.bytes() + _utf8_coded_number(frame_no) + (bs - 1).to_bytes(2, "big")
        header += bytes([_crc8(header)])
        body = _MSBBitWriter()
        for c in blk:
            eff_order = min(order, max(0, len(c) - 1))
            _encode_subframe(body, c, bps, eff_order,
                             partition_order if len(c) == block_size else 0)
        body.align()
        frame = header + body.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def decode_flac(payload: bytes) -> dict:
    """FLAC → {sample_rate, bps, channels, n_samples, samples} with both
    CRCs verified. Supports constant/verbatim/fixed subframes, 4- and
    5-bit Rice methods, any partition order, mono/independent stereo."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad marker)")
    pos = 4
    info = None
    while True:  # metadata blocks
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if btype == 0:
            r = _MSBBitReader(payload, pos + 4)
            r.bits(16), r.bits(16), r.bits(24), r.bits(24)
            info = {
                "sample_rate": r.bits(20),
                "channels": r.bits(3) + 1,
                "bps": r.bits(5) + 1,
                "n_samples": r.bits(36),
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    chans = [[] for _ in range(info["channels"])]
    while pos < len(payload):
        r = _MSBBitReader(payload, pos)
        if r.bits(14) != 0b11111111111110:
            raise ValueError("FLAC: lost frame sync")
        r.bits(1)
        r.bits(1)
        bs_code = r.bits(4)
        sr_code = r.bits(4)
        ch_assign = r.bits(4)
        ss_code = r.bits(3)
        r.bits(1)
        _read_coded_number(r)
        if bs_code == 0b0110:
            bs = r.bits(8) + 1
        elif bs_code == 0b0111:
            bs = r.bits(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("FLAC: reserved blocksize code")
        if sr_code in (0b1100, 0b1101, 0b1110):  # explicit rates in header
            r.bits(8 if sr_code == 0b1100 else 16)
        bps = {0b100: 16, 0b001: 8, 0b010: 12, 0b101: 20, 0b110: 24}.get(
            ss_code, info["bps"]
        )
        if ch_assign > 1:
            raise ValueError("FLAC: only independent channels supported")
        r.align()
        header_len = r.byte_pos - pos  # CRC-8 byte itself not yet consumed
        if _crc8(payload[pos : pos + header_len]) != payload[pos + header_len]:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        r.byte_pos += 1  # consume the CRC-8 byte
        for ch in range(ch_assign + 1 if ch_assign <= 1 else 2):
            if r.bits(1):
                raise ValueError("FLAC: bad subframe padding bit")
            stype = r.bits(6)
            wasted = 0
            if r.bits(1):  # wasted-bits flag: unary count - 1 follows
                wasted = r.unary() + 1
            eff_bps = bps - wasted
            if stype == 0:
                v = r.signed_bits(eff_bps)
                vals = [v] * bs
            elif stype == 1:
                vals = [r.signed_bits(eff_bps) for _ in range(bs)]
            elif 0b001000 <= stype <= 0b001100:
                o = stype & 0x7
                vals = [r.signed_bits(eff_bps) for _ in range(o)]
                resid = _read_residual(r, bs, o)
                coefs = _FLAC_FIXED_COEFS[o]
                for x in resid:
                    vals.append(
                        x + sum(c * vals[len(vals) - 1 - j]
                                for j, c in enumerate(coefs))
                    )
            else:
                raise ValueError(f"FLAC: unsupported subframe type {stype:06b}")
            chans[ch].extend(v << wasted for v in vals)
        r.align()
        frame_len = r.byte_pos - pos
        footer = int.from_bytes(payload[r.byte_pos : r.byte_pos + 2], "big")
        if _crc16(payload[pos : pos + frame_len]) != footer:
            raise ValueError("FLAC: frame footer CRC-16 mismatch")
        pos = r.byte_pos + 2
    n = info["n_samples"] or len(chans[0])
    return {
        "sample_rate": info["sample_rate"],
        "bps": info["bps"],
        "channels": info["channels"],
        "n_samples": n,
        "samples": chans[0][:n] if info["channels"] == 1
        else [c[:n] for c in chans],
    }


# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame-header scan. Full Layer III *decode* (hybrid
# filterbank + Huffman) stays a deploy-time seam (llmops.decode_audio),
# but the header walk is pure table lookups — and it is what a 100 TB
# audio-curation pass actually needs first: duration/bitrate/samplerate
# stats and corrupt-stream detection WITHOUT paying for decode.
# Reference parity: the reference treats media payloads as opaque bytes
# with typed metadata; this extracts that metadata from the real
# container framing (ISO/IEC 11172-3 frame headers, ID3v2.3 prefix).
# ---------------------------------------------------------------------------

_MPEG1_L3_BITRATES = (  # kbps, index 1..14 (0=free, 15=bad)
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None,
)
_MPEG1_SAMPLE_RATES = (44100, 48000, 32000, None)


def _syncsafe(n: int) -> bytes:
    """ID3v2 syncsafe 28-bit size: 4 bytes, 7 bits each, MSB clear."""
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def build_mp3_stream(
    n_frames: int,
    bitrate_idx: int,
    sr_idx: int,
    pad_phase: int = 0,
    id3_payload: int = 0,
) -> bytes:
    """Spec-correct CBR MPEG-1 Layer III stream: optional ID3v2.3 tag,
    then `n_frames` frames with real 4-byte headers and filler bodies
    (0xAA — never a false 0xFF sync). Frame i's padding bit is
    (pad_phase + i) % 2, exercising the +1-byte padded frame length."""
    out = bytearray()
    if id3_payload > 0:
        out += b"ID3" + bytes((3, 0, 0)) + _syncsafe(id3_payload)
        out += b"\x00" * id3_payload
    bitrate = _MPEG1_L3_BITRATES[bitrate_idx]
    sr = _MPEG1_SAMPLE_RATES[sr_idx]
    for i in range(n_frames):
        padding = (pad_phase + i) & 1
        # sync=0x7FF, MPEG1 (11), Layer III (01), no CRC (1) -> 0xFF 0xFB
        hdr = bytes(
            (0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1), 0xC0)
        )
        frame_len = 144_000 * bitrate // sr + padding
        out += hdr + b"\xaa" * (frame_len - 4)
    return bytes(out)


def scan_mpeg_frames(payload: bytes) -> dict:
    """Walk an MPEG-1 Layer III stream by frame headers only (no decode).

    Skips an ID3v2 prefix via its syncsafe size, then validates each
    frame's 11-bit sync / version / layer bits, resolves bitrate and
    sample rate through the ISO tables, and advances by the computed
    frame length (144 * bitrate / sample_rate + padding). Returns
    per-stream metadata: frame count, CBR bitrate (kbps), sample rate,
    exact duration in microseconds (1152 samples per Layer III frame,
    floor division), audio byte span, and ID3 bytes skipped. Raises
    ValueError on sync loss, reserved table indexes, a bitrate change
    mid-stream (VBR is out of scope for the CBR scanner), or a
    truncated trailing frame — corrupt streams fail loudly rather than
    yield silently wrong durations.
    """
    pos, id3_bytes = 0, 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("ID3v2 size byte has MSB set (not syncsafe)")
            size = (size << 7) | b
        id3_bytes = 10 + size
        pos = id3_bytes
    n_frames, bitrate_kbps, sample_rate, audio_bytes = 0, None, None, 0
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError(f"truncated frame header at byte {pos}")
        b0, b1, b2, _ = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        if (b1 >> 3) & 0x03 != 0x03 or (b1 >> 1) & 0x03 != 0x01:
            raise ValueError("not MPEG-1 Layer III")
        br = _MPEG1_L3_BITRATES[b2 >> 4]
        sr = _MPEG1_SAMPLE_RATES[(b2 >> 2) & 0x03]
        if br is None or sr is None:
            raise ValueError("reserved bitrate/samplerate index")
        if bitrate_kbps is None:
            bitrate_kbps, sample_rate = br, sr
        elif br != bitrate_kbps:
            raise ValueError("bitrate change mid-stream (VBR not supported)")
        frame_len = 144_000 * br // sr + ((b2 >> 1) & 1)
        if pos + frame_len > len(payload):
            raise ValueError(f"truncated frame at byte {pos}")
        pos += frame_len
        audio_bytes += frame_len
        n_frames += 1
    if n_frames == 0:
        raise ValueError("no MPEG frames found")
    return {
        "n_frames": n_frames,
        "bitrate_kbps": bitrate_kbps,
        "sample_rate": sample_rate,
        "duration_us": n_frames * 1152 * 1_000_000 // sample_rate,
        "audio_bytes": audio_bytes,
        "id3_bytes": id3_bytes,
    }


# ---------------------------------------------------------------------------
# Ogg container page scan (Opus streams). Like the MP3 header walk:
# full Opus *decode* (CELT/SILK) stays a deploy-time seam, but the Ogg
# page layer — magic, lacing, granule positions, and the spec's own
# non-reflected CRC-32 — is exactly what duration/integrity stats need,
# reading headers instead of decoding audio. RFC 3533 (Ogg) + RFC 7845
# (Opus-in-Ogg: OpusHead, 48 kHz granules, pre-skip).
# ---------------------------------------------------------------------------

_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7 if _r & 0x80000000 else _r << 1) & 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    """Ogg's CRC-32: polynomial 0x04C11DB7, NOT bit-reflected, init 0,
    no final xor — deliberately different from zlib.crc32."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ b]
    return crc


def _ogg_page(
    serial: int, seq: int, granule: int, payload: bytes, header_type: int = 0
) -> bytes:
    import struct

    segs = []
    n = len(payload)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)  # final short (possibly 0) lacing value
    hdr = struct.pack(
        "<4sBBqIIIB",
        b"OggS", 0, header_type, granule, serial, seq, 0, len(segs),
    ) + bytes(segs)
    page = hdr + payload
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def encode_ogg_opus(
    serial: int, pre_skip: int, packet_sizes: list, samples_per_packet: int = 960
) -> bytes:
    """Minimal Ogg-Opus stream: BOS page with a real OpusHead (RFC
    7845), an OpusTags comment page, then one audio page per packet
    with 48 kHz granule positions accumulating samples_per_packet,
    EOS flag on the last."""
    import struct

    head = struct.pack("<8sBBHIhB", b"OpusHead", 1, 1, pre_skip, 48000, 0, 0)
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    out = bytearray()
    out += _ogg_page(serial, 0, 0, head, header_type=0x02)  # BOS
    out += _ogg_page(serial, 1, 0, tags)
    granule = pre_skip
    for i, size in enumerate(packet_sizes):
        granule += samples_per_packet
        eos = 0x04 if i == len(packet_sizes) - 1 else 0
        payload = bytes((serial * 11 + i * 7 + j * 3) % 256 for j in range(size))
        out += _ogg_page(serial, 2 + i, granule, payload, header_type=eos)
    return bytes(out)


def scan_ogg_opus(payload: bytes) -> dict:
    """Walk Ogg pages verifying magic, version, and the spec CRC-32 of
    every page; parse OpusHead off the BOS page; track granule
    positions and page sequence continuity. Returns stream metadata:
    page/packet-page counts, pre-skip, exact duration in microseconds
    ((last_granule - pre_skip) * 1e6 // 48000 per RFC 7845), and audio
    payload bytes. Raises ValueError on bad magic, CRC mismatch, a
    sequence gap, a missing OpusHead, or a stream without EOS —
    truncated or corrupt files fail loudly.
    """
    import struct

    pos, n_pages, n_audio_pages, audio_bytes = 0, 0, 0, 0
    pre_skip = serial0 = None
    last_granule, expect_seq, saw_eos = 0, 0, False
    while pos < len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad page magic at byte {pos}")
        if pos + 27 > len(payload):
            raise ValueError("truncated page header")
        (version, htype, granule, serial, seq, crc, nsegs) = struct.unpack(
            "<BBqIIIB", payload[pos + 4 : pos + 27]
        )
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        seg_table = payload[pos + 27 : pos + 27 + nsegs]
        body_len = sum(seg_table)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(payload):
            raise ValueError(f"truncated page body at byte {pos}")
        page = bytearray(payload[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"CRC mismatch on page {seq}")
        if seq != expect_seq:
            raise ValueError(f"page sequence gap: got {seq}, want {expect_seq}")
        expect_seq += 1
        body = payload[pos + 27 + nsegs : page_end]
        if htype & 0x02:  # BOS
            if body[:8] != b"OpusHead":
                raise ValueError("BOS page is not OpusHead")
            pre_skip = struct.unpack("<H", body[10:12])[0]
            serial0 = serial
        elif not body.startswith(b"OpusTags"):
            n_audio_pages += 1
            audio_bytes += body_len
            last_granule = granule
        if htype & 0x04:
            saw_eos = True
        n_pages += 1
        pos = page_end
    if pre_skip is None:
        raise ValueError("no OpusHead found")
    if not saw_eos:
        raise ValueError("stream has no EOS page")
    return {
        "n_pages": n_pages,
        "n_audio_pages": n_audio_pages,
        "serial": serial0,
        "pre_skip": pre_skip,
        "duration_us": (last_granule - pre_skip) * 1_000_000 // 48000,
        "audio_bytes": audio_bytes,
    }


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) — subset. Real bitstream machinery per the public
# VP8L specification: RIFF/WEBP/VP8L container, LSB-first bit packing,
# 14-bit dimensions, canonical prefix codes (DEFLATE-style assignment)
# transmitted via the 19-symbol code-length code in kCodeLengthOrder,
# simple (1-2 symbol) code variant, and per-pixel G-R-B-A literal
# decoding. Subset boundaries (honest seams, raised loudly): no
# transforms, no color cache, no meta-prefix groups, and LZ77 backrefs
# are decoded as NotImplementedError (the encoder emits literals only).
# Lossless ⇒ decode(encode(x)) == x for ARBITRARY rasters, which is the
# oracle contract; there is no reference libwebp in this container, so
# (like GIF) validation is structural + round-trip, not cross-decoder.
# ---------------------------------------------------------------------------

_VP8L_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8,
                           9, 10, 11, 12, 13, 14, 15, 16)
_VP8L_GREEN_ALPHABET = 256 + 24  # literals + length codes (no color cache)


class _VP8LBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Prefix codes pack MSB-of-code first (DEFLATE convention)."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


class _VP8LBitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            if self.pos >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


def _canonical_codes(lengths: list) -> dict:
    """DEFLATE/VP8L canonical assignment: increasing length, then symbol."""
    pairs = sorted(
        (ln, sym) for sym, ln in enumerate(lengths) if ln > 0
    )
    codes, code, prev_len = {}, 0, 0
    for ln, sym in pairs:
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
    return codes


class _PrefixDecoder:
    def __init__(self, lengths: list):
        self.by_code = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(lengths).items()
        }
        used = [ln for ln in lengths if ln > 0]
        self.max_len = max(used) if used else 0
        if len(used) == 1:  # degenerate: zero bits per symbol
            self.single = next(s for s, l in enumerate(lengths) if l > 0)
        else:
            self.single = None

    def decode(self, r: _VP8LBitReader) -> int:
        if self.single is not None:
            return self.single
        code, ln = 0, 0
        while ln <= self.max_len:
            code = (code << 1) | r.read(1)
            ln += 1
            sym = self.by_code.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _build_lengths(freqs: dict, alphabet: int, max_len: int = 15) -> list:
    """Heap Huffman over observed symbols, depth-limited by rebalancing
    (halve frequency spread until the tree fits max_len)."""
    import heapq
    import itertools

    if not freqs:
        return [0] * alphabet
    if len(freqs) == 1:
        lengths = [0] * alphabet
        lengths[next(iter(freqs))] = 1
        return lengths
    f = dict(freqs)
    counter = itertools.count()
    while True:
        heap = [(w, next(counter), sym, None, None) for sym, w in f.items()]
        heapq.heapify(heap)
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            heapq.heappush(heap, (a[0] + b[0], next(counter), None, a, b))
        lengths = [0] * alphabet

        def walk(node, depth):
            if node[2] is not None:
                lengths[node[2]] = max(depth, 1)
                return depth
            return max(walk(node[3], depth + 1), walk(node[4], depth + 1))

        if walk(heap[0], 0) <= max_len:
            return lengths
        f = {s: max(1, w // 2) for s, w in f.items()}  # flatten and retry


def _write_prefix_code(w: _VP8LBitWriter, lengths: list) -> None:
    used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s, _ in used):
        w.write(1, 1)  # simple code
        w.write(len(used) - 1, 1)
        first = used[0][0]
        if first <= 1:
            w.write(0, 1)  # first symbol in 1 bit
            w.write(first, 1)
        else:
            w.write(1, 1)
            w.write(first, 8)
        if len(used) == 2:
            w.write(used[1][0], 8)
        return
    w.write(0, 1)  # normal code
    # code-length code: huffman over the length symbols (0..15 only)
    clc_freqs: dict = {}
    for ln in lengths:
        clc_freqs[ln] = clc_freqs.get(ln, 0) + 1
    clc_lengths = _build_lengths(clc_freqs, 19, max_len=7)
    w.write(19 - 4, 4)  # transmit all 19 slots
    for sym in _VP8L_CODE_LENGTH_ORDER:
        w.write(clc_lengths[sym], 3)
    w.write(0, 1)  # no explicit max_symbol
    clc = _canonical_codes(clc_lengths)
    single = len([l for l in clc_lengths if l > 0]) == 1
    for ln in lengths:
        if not single:
            code, nb = clc[ln]
            w.write_code(code, nb)
        # degenerate single-symbol code-length code: zero bits per symbol


def _read_prefix_code(r: _VP8LBitReader, alphabet: int) -> _PrefixDecoder:
    if r.read(1):  # simple
        nsym = r.read(1) + 1
        lengths = [0] * alphabet
        if r.read(1):
            first = r.read(8)
        else:
            first = r.read(1)
        lengths[first] = 1
        if nsym == 2:
            lengths[r.read(8)] = 1
        return _PrefixDecoder(lengths)
    num_cl = r.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_cl):
        clc_lengths[_VP8L_CODE_LENGTH_ORDER[i]] = r.read(3)
    if r.read(1):  # explicit max_symbol
        bits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(bits)
    else:
        max_symbol = alphabet
    clc = _PrefixDecoder(clc_lengths)
    lengths = [0] * alphabet
    sym, prev = 0, 8
    while sym < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = clc.decode(r)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + r.read(2)):
                lengths[sym] = prev
                sym += 1
        elif s == 17:
            sym += 3 + r.read(3)
        else:
            sym += 11 + r.read(7)
    return _PrefixDecoder(lengths)


def encode_webp_lossless(width: int, height: int, argb: bytes) -> bytes:
    """VP8L-subset encoder: no transforms / cache / backrefs — per-pixel
    G,R,B,A literals under canonical per-channel prefix codes."""
    if len(argb) != width * height * 4:
        raise ValueError("argb must be width*height*4 bytes (A,R,G,B order)")
    w = _VP8LBitWriter()
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta prefix groups
    px = [
        (argb[i], argb[i + 1], argb[i + 2], argb[i + 3])
        for i in range(0, len(argb), 4)
    ]
    chans = {  # green first per spec, then red, blue, alpha, distance
        "g": [p[2] for p in px], "r": [p[1] for p in px],
        "b": [p[3] for p in px], "a": [p[0] for p in px],
    }

    def hist(vals):
        h: dict = {}
        for v in vals:
            h[v] = h.get(v, 0) + 1
        return h

    lg = _build_lengths(hist(chans["g"]), _VP8L_GREEN_ALPHABET)
    lr = _build_lengths(hist(chans["r"]), 256)
    lb = _build_lengths(hist(chans["b"]), 256)
    la = _build_lengths(hist(chans["a"]), 256)
    ld = _build_lengths({0: 1}, 40)  # distance code: unused single symbol
    for lengths in (lg, lr, lb, la, ld):
        _write_prefix_code(w, lengths)
    cg, cr, cb, ca = (_canonical_codes(x) for x in (lg, lr, lb, la))

    def emit(codes, sym):
        if len(codes) == 1:
            return  # zero-bit degenerate code
        code, nb = codes[sym]
        w.write_code(code, nb)

    for a, r_, g, b in px:
        emit(cg, g)
        emit(cr, r_)
        emit(cb, b)
        emit(ca, a)
    payload = b"\x2f" + w.done()
    if len(payload) % 2:
        payload += b"\x00"
    vp8l = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    riff = b"WEBP" + vp8l
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def decode_webp_lossless(payload: bytes) -> dict:
    """VP8L-subset decoder → {width, height, argb}. Handles simple and
    normal prefix codes (incl. 16/17/18 repeats and explicit
    max_symbol); transforms, color cache, meta groups, and LZ77
    backrefs raise (subset seams)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (bad RIFF header)")
    if payload[12:16] != b"VP8L":
        raise ValueError("not a lossless WebP (no VP8L chunk)")
    size = int.from_bytes(payload[16:20], "little")
    data = payload[20 : 20 + size]
    if data[:1] != b"\x2f":
        raise ValueError("bad VP8L signature byte")
    r = _VP8LBitReader(data[1:])
    width = r.read(14) + 1
    height = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if r.read(1):
        raise ValueError("VP8L transforms not supported (subset)")
    if r.read(1):
        raise ValueError("VP8L color cache not supported (subset)")
    if r.read(1):
        raise ValueError("VP8L meta prefix groups not supported (subset)")
    dg = _read_prefix_code(r, _VP8L_GREEN_ALPHABET)
    dr = _read_prefix_code(r, 256)
    db = _read_prefix_code(r, 256)
    da = _read_prefix_code(r, 256)
    _read_prefix_code(r, 40)  # distance code (unused by literals)
    out = bytearray()
    for _ in range(width * height):
        g = dg.decode(r)
        if g >= 256:
            raise NotImplementedError("VP8L backreferences not supported (subset)")
        red = dr.decode(r)
        blue = db.decode(r)
        alpha = da.decode(r)
        out += bytes((alpha, red, g, blue))
    return {"width": width, "height": height, "argb": bytes(out)}


def build_animated_gif(
    width: int,
    height: int,
    frames: list,
    palette: list,
    loop_count: int = 0,
) -> bytes:
    """Animated GIF89a: NETSCAPE2.0 loop extension, then per frame a
    graphic-control extension (delay in centiseconds) + image descriptor
    + literal-LZW data. `frames` is a list of (indices, delay_cs)."""
    nbits = max(1, (len(palette) - 1).bit_length())
    table_size = 1 << nbits
    mcs = max(2, nbits)
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    code_width = mcs + 1
    max_literals = (1 << code_width) - eoi - 2

    out = bytearray(GIF_HEADER)
    out += struct.pack("<HHBBB", width, height, 0x80 | ((nbits - 1) & 7), 0, 0)
    for i in range(table_size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    # NETSCAPE2.0 application extension: animation loop count
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
    out += struct.pack("<H", loop_count) + b"\x00"
    for indices, delay_cs in frames:
        if len(indices) != width * height:
            raise ValueError("frame size mismatch")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        w = _LSBBitWriter()
        w.put(clear, code_width)
        run = 0
        for px in indices:
            if run == max_literals:
                w.put(clear, code_width)
                run = 0
            w.put(px, code_width)
            run += 1
        w.put(eoi, code_width)
        lzw = w.flush()
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            block = lzw[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def scan_gif_animation(payload: bytes) -> dict:
    """Animation metadata WITHOUT decoding pixels: walks the block
    structure (extensions, image descriptors, LZW data sub-blocks
    skipped by their length prefixes), collecting frame count, per-GCE
    delays (centiseconds -> total duration ms), NETSCAPE loop count,
    and pixel-data byte volume. Raises on truncation, a missing
    trailer, or an unknown block introducer — corrupt animations fail
    loudly. The q99_frame_sampling economics at container level: a
    sampler decides WHICH frames to decode from this walk alone."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height, flags, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (1 << ((flags & 7) + 1))
    n_frames, duration_cs, loop_count, data_bytes = 0, 0, None, 0
    pending_delay = 0

    def skip_subblocks(p):
        nonlocal data_bytes
        while True:
            if p >= len(payload):
                raise ValueError("truncated sub-block chain")
            n = payload[p]
            p += 1
            if n == 0:
                return p
            data_bytes += n
            p += n

    while pos < len(payload):
        introducer = payload[pos]
        if introducer == 0x3B:  # trailer
            return {
                "width": width,
                "height": height,
                "n_frames": n_frames,
                "duration_ms": duration_cs * 10,
                "loop_count": loop_count,
                "data_bytes": data_bytes,
            }
        if introducer == 0x21:  # extension
            label = payload[pos + 1]
            if label == 0xF9:  # graphic control
                pending_delay = struct.unpack_from("<H", payload, pos + 4)[0]
                pos = skip_subblocks(pos + 2)
            elif label == 0xFF and payload[pos + 3 : pos + 14] == b"NETSCAPE2.0":
                loop_count = struct.unpack_from("<H", payload, pos + 16)[0]
                pos = skip_subblocks(pos + 2)
            else:
                pos = skip_subblocks(pos + 2)
        elif introducer == 0x2C:  # image descriptor
            lflags = payload[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (1 << ((lflags & 7) + 1))
            pos += 1  # LZW min code size
            pos = skip_subblocks(pos)
            n_frames += 1
            duration_cs += pending_delay
            pending_delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{introducer:02x} at {pos}")
    raise ValueError("GIF stream ended without trailer")


# ---------------------------------------------------------------------------
# BMP (Windows DIB, 24bpp BI_RGB)
# ---------------------------------------------------------------------------
# Provenance: public BITMAPFILEHEADER/BITMAPINFOHEADER layout (Windows GDI
# documentation). 24bpp uncompressed only; rows are BGR, padded to 4-byte
# stride, stored bottom-up when biHeight > 0 and top-down when negative.


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB raster → 24bpp bottom-up BI_RGB BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    stride = (width * 3 + 3) & ~3
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        for x in range(width):
            r, g, b = rgb[(y * width + x) * 3 : (y * width + x) * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        raster += row
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return file_header + info + bytes(raster)


def decode_bmp(payload: bytes) -> dict:
    """24bpp BI_RGB BMP → {width, height, pixels} (top-down RGB bytes).

    Handles both bottom-up (biHeight > 0) and top-down (negative) row
    order. Palettized/compressed/other-depth DIBs raise: this engine's
    honest-seam convention (like the VP8L subset) — an unsupported
    variant is a loud error, never a garbage raster.
    """
    if payload[:2] != b"BM":
        raise ValueError("not a BMP (no BM magic)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    (
        bi_size, width, height, _planes, bitcount, compression,
    ) = struct.unpack_from("<IiiHHI", payload, 14)
    if bi_size < 40:
        raise ValueError(f"unsupported DIB header size {bi_size}")
    if bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bitcount={bitcount},"
            f" compression={compression}): 24bpp BI_RGB only"
        )
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for row in range(height):
        y = row if top_down else height - 1 - row
        base = data_off + row * stride
        line = payload[base : base + width * 3]
        if len(line) != width * 3:
            raise ValueError("truncated BMP raster")
        for x in range(width):
            b, g, r = line[x * 3 : x * 3 + 3]
            out[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes((r, g, b))
    return {"width": width, "height": height, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# QOI — the "Quite OK Image" format (qoiformat.org, public domain spec).
# Byte-oriented run/index/diff coding: the simplest real lossless image
# codec, and a good stress of stateful per-pixel decode (running index
# array + previous-pixel state) that can't be expressed relationally.
# ---------------------------------------------------------------------------


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """RGB(A) raster → QOI. Greedy reference-encoder op choice: RUN while
    the pixel repeats, else INDEX on a seen-table hit, else DIFF/LUMA
    when the delta fits, else a literal RGB/RGBA chunk."""
    if channels not in (3, 4):
        raise ValueError("QOI channels must be 3 or 4")
    if len(pixels) != width * height * channels:
        raise ValueError("raster size mismatch")
    out = bytearray(b"qoif")
    out += struct.pack(">IIBB", width, height, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for p in range(width * height):
        off = p * channels
        r, g, b = pixels[off], pixels[off + 1], pixels[off + 2]
        a = pixels[off + 3] if channels == 4 else pa
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
        else:
            if run:
                out.append(0xC0 | (run - 1))
                run = 0
            h = _qoi_hash(r, g, b, a)
            if index[h] == (r, g, b, a):
                out.append(h)
            else:
                index[h] = (r, g, b, a)
                if a == pa:
                    dr = (r - pr + 128) % 256 - 128
                    dg = (g - pg + 128) % 256 - 128
                    db = (b - pb + 128) % 256 - 128
                    if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                        out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                    elif (
                        -32 <= dg <= 31
                        and -8 <= dr - dg <= 7
                        and -8 <= db - dg <= 7
                    ):
                        out.append(0x80 | (dg + 32))
                        out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                    else:
                        out += bytes((0xFE, r, g, b))
                else:
                    out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(payload: bytes) -> dict:
    """QOI → {width, height, channels, pixels} (pixels = RGB or RGBA bytes
    per the header's channel count). Full op set: RGB, RGBA, INDEX,
    DIFF, LUMA, RUN, with the 64-slot running index and wraparound
    deltas; the end marker is verified."""
    if payload[:4] != b"qoif":
        raise ValueError("not a QOI stream")
    width, height, channels, _cs = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"QOI channels {channels} unsupported")
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    out = bytearray()
    pos = 14
    npx = width * height
    emitted = 0
    while emitted < npx:
        if pos >= len(payload) - 8:
            raise ValueError("truncated QOI stream")
        byte = payload[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = payload[pos], payload[pos + 1], payload[pos + 2], payload[pos + 3]
            pos += 4
        elif byte >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = index[byte]
        elif byte >> 6 == 1:  # QOI_OP_DIFF (bias 2, wraparound)
            r = (r + ((byte >> 4) & 3) - 2) % 256
            g = (g + ((byte >> 2) & 3) - 2) % 256
            b = (b + (byte & 3) - 2) % 256
        elif byte >> 6 == 2:  # QOI_OP_LUMA (dg bias 32; dr/db rel. dg, bias 8)
            dg = (byte & 0x3F) - 32
            nxt = payload[pos]
            pos += 1
            r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (nxt & 0x0F) - 8) % 256
        else:  # QOI_OP_RUN (bias -1; 63/64 are the RGB/RGBA tags above)
            run = (byte & 0x3F) + 1
            px = bytes((r, g, b, a)[:channels])
            out += px * run
            emitted += run
            index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
            continue
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        out += bytes((r, g, b, a)[:channels])
        emitted += 1
    if emitted != npx:
        raise ValueError("QOI run overshoots the raster")
    if payload[pos : pos + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


# ---------------------------------------------------------------------------
# Avro Object Container Files (the public Avro 1.x spec) — the row-major
# sibling of parquet and the wire format of half the Kafka world. Subset:
# record schemas over {long, int, string, double, boolean, bytes} with
# null/deflate block codecs — enough to ingest real data files; unions,
# nesting, and other codecs raise (the honest-seam convention).
# ---------------------------------------------------------------------------

_AVRO_MAGIC = b"Obj\x01"


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _avro_write_value(v, typ: str) -> bytes:
    if typ in ("long", "int"):
        return _zigzag_encode(int(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        return _zigzag_encode(len(v)) + bytes(v)
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"unsupported Avro type {typ!r}")


def _avro_read_value(buf: bytes, pos: int, typ: str):
    if typ in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported Avro type {typ!r}")


def encode_avro(
    records: list[dict],
    fields: list[tuple[str, str]],
    codec: str = "deflate",
    rows_per_block: int = 1000,
    name: str = "row",
) -> bytes:
    """Records → Avro Object Container File (header, metadata map,
    deflate/null-coded blocks, 16-byte sync markers). Deterministic:
    the sync marker derives from the schema so identical inputs give
    identical bytes."""
    import hashlib
    import json as _json

    schema = {
        "type": "record",
        "name": name,
        "fields": [{"name": n, "type": t} for n, t in fields],
    }
    schema_json = _json.dumps(schema, separators=(",", ":")).encode()
    sync = hashlib.md5(b"bcs-avro:" + schema_json).digest()
    meta = {"avro.schema": schema_json, "avro.codec": codec.encode()}
    out = bytearray(_AVRO_MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kk = k.encode()
        out += _zigzag_encode(len(kk)) + kk + _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)  # end of metadata map
    out += sync
    for i in range(0, len(records), rows_per_block):
        block = records[i : i + rows_per_block]
        body = bytearray()
        for r in block:
            for n, t in fields:
                body += _avro_write_value(r[n], t)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate per spec
            body = comp.compress(bytes(body)) + comp.flush()
        elif codec == "snappy":
            # Avro snappy blocks append a big-endian CRC32 of the
            # UNCOMPRESSED data (the one codec with an integrity suffix)
            crc = zlib.crc32(bytes(body)) & 0xFFFFFFFF
            body = snappy_compress(bytes(body)) + struct.pack(">I", crc)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        out += _zigzag_encode(len(block))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    return bytes(out)


def decode_avro(payload: bytes) -> dict:
    """Avro OCF → {fields, codec, records}. Validates magic, per-block
    sync markers, and exact block row counts; unsupported schema shapes
    or codecs raise."""
    import json as _json

    if payload[:4] != _AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(payload, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            _, pos = _zigzag_decode(payload, pos)
        for _ in range(n):
            kl, pos = _zigzag_decode(payload, pos)
            k = payload[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(payload, pos)
            meta[k] = payload[pos : pos + vl]
            pos += vl
    schema = _json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise ValueError("only record schemas supported")
    fields = []
    for f in schema["fields"]:
        t = f["type"]
        if not isinstance(t, str):
            raise ValueError("unions/nested Avro types unsupported")
        fields.append((f["name"], t))
    sync = payload[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(payload):
        nrec, pos = _zigzag_decode(payload, pos)
        blen, pos = _zigzag_decode(payload, pos)
        body = payload[pos : pos + blen]
        pos += blen
        if codec == "deflate":
            body = zlib.decompress(body, wbits=-15)
        elif codec == "snappy":
            (crc,) = struct.unpack(">I", body[-4:])
            body = snappy_decompress(body[:-4])
            if zlib.crc32(body) & 0xFFFFFFFF != crc:
                raise ValueError("Avro snappy block CRC mismatch")
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        bpos = 0
        for _ in range(nrec):
            rec = {}
            for n, t in fields:
                rec[n], bpos = _avro_read_value(body, bpos, t)
            records.append(rec)
        if bpos != len(body):
            raise ValueError("Avro block row count does not exhaust block")
        if payload[pos : pos + 16] != sync:
            raise ValueError("Avro sync marker mismatch (torn block)")
        pos += 16
    return {"fields": fields, "codec": codec, "records": records}


# ---------------------------------------------------------------------------
# Protocol Buffers wire format (the public proto3 encoding spec) — the
# other serialization half of the Kafka/CDC world next to Avro. Schema-
# driven flat-message subset: varint (incl. zigzag sint), fixed64/32,
# and length-delimited string/bytes fields; nested messages, packed
# repeats, and groups raise (honest-seam convention).
# ---------------------------------------------------------------------------


def _pb_varint_encode(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_varint_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint exceeds 64 bits")


#: field type -> (wire type, encoder, decoder)
_PB_TYPES = {
    "uint64": (0, lambda v: _pb_varint_encode(int(v)),
               lambda b, p: _pb_varint_decode(b, p)),
    "sint64": (0, lambda v: _pb_varint_encode((int(v) << 1) ^ (int(v) >> 63)),
               lambda b, p: (lambda u, q: ((u >> 1) ^ -(u & 1), q))(*_pb_varint_decode(b, p))),
    "bool":   (0, lambda v: b"\x01" if v else b"\x00",
               lambda b, p: (b[p] == 1, p + 1)),
    "fixed64": (1, lambda v: struct.pack("<Q", int(v)),
                lambda b, p: (struct.unpack_from("<Q", b, p)[0], p + 8)),
    "double": (1, lambda v: struct.pack("<d", float(v)),
               lambda b, p: (struct.unpack_from("<d", b, p)[0], p + 8)),
    "string": (2, lambda v: (lambda r: _pb_varint_encode(len(r)) + r)(str(v).encode()),
               None),
    "bytes":  (2, lambda v: _pb_varint_encode(len(v)) + bytes(v),
               None),
    "fixed32": (5, lambda v: struct.pack("<I", int(v)),
                lambda b, p: (struct.unpack_from("<I", b, p)[0], p + 4)),
}


def encode_protobuf(msg: dict, schema: list[tuple[int, str, str]]) -> bytes:
    """Message dict → proto3 wire bytes. schema = [(field_no, name, type)].
    proto3 default-value elision: zero/empty values are NOT written."""
    out = bytearray()
    for fno, name, typ in schema:
        v = msg.get(name)
        if v in (None, 0, 0.0, "", b"", False):
            continue  # proto3: defaults are absent on the wire
        wt, enc, _ = _PB_TYPES[typ]
        out += _pb_varint_encode((fno << 3) | wt)
        out += enc(v)
    return bytes(out)


def decode_protobuf(payload: bytes, schema: list[tuple[int, str, str]]) -> dict:
    """proto3 wire bytes → dict with every schema field present (absent
    fields take proto3 defaults). Unknown fields are SKIPPED by wire
    type — the forward-compatibility rule the spec mandates; a wire
    type that contradicts the schema raises."""
    by_no = {fno: (name, typ) for fno, name, typ in schema}
    defaults = {"uint64": 0, "sint64": 0, "bool": False, "fixed64": 0,
                "double": 0.0, "string": "", "bytes": b"", "fixed32": 0}
    out = {name: defaults[typ] for _, name, typ in schema}
    pos = 0
    while pos < len(payload):
        key, pos = _pb_varint_decode(payload, pos)
        fno, wt = key >> 3, key & 7
        if fno in by_no:
            name, typ = by_no[fno]
            expect_wt, _, dec = _PB_TYPES[typ]
            if wt != expect_wt:
                raise ValueError(
                    f"field {fno} ({name}): wire type {wt}, schema says {expect_wt}"
                )
            if wt == 2:
                n, pos = _pb_varint_decode(payload, pos)
                raw = payload[pos : pos + n]
                pos += n
                out[name] = raw.decode("utf-8") if typ == "string" else bytes(raw)
            else:
                out[name], pos = dec(payload, pos)
        else:  # unknown field: skip by wire type (forward compatibility)
            if wt == 0:
                _, pos = _pb_varint_decode(payload, pos)
            elif wt == 1:
                pos += 8
            elif wt == 2:
                n, pos = _pb_varint_decode(payload, pos)
                pos += n
            elif wt == 5:
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt} (groups/reserved)")
    return out


# ---------------------------------------------------------------------------
# Gorilla time-series compression (Pelkonen et al., VLDB 2015 — the public
# Facebook paper behind every modern TSDB block format). Timestamps as
# delta-of-delta prefix codes, values as XOR with leading/trailing-zero
# windows. Lossless over (int64 ms, int64 milli-value) points.
# ---------------------------------------------------------------------------


class _GorillaBitWriter:
    """MSB-first bit writer (distinct from the GIF-LZW and VP8L bit IO —
    same-name shadowing broke GIF once; see the codec-history note)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _GorillaBitReader:
    def __init__(self, payload: bytes) -> None:
        self.buf = payload
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        out = 0
        for _ in range(nbits):
            byte = self.buf[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _signed(u: int, nbits: int) -> int:
    return u - (1 << nbits) if u >= 1 << (nbits - 1) else u


def encode_gorilla(points: list[tuple[int, int]]) -> bytes:
    """[(ts_ms, value_int)] → Gorilla block. Header: n (u32), first ts
    (i64), first value (i64). Then per point: delta-of-delta prefix
    codes ('0' | '10'+7 | '110'+9 | '1110'+12 | '1111'+64) and
    XOR-coded values ('0' identical | '10' reuse window | '11' + 6-bit
    leading + 6-bit length + meaningful bits)."""
    if not points:
        return struct.pack(">I", 0)
    w = _GorillaBitWriter()
    t0, v0 = points[0]
    out = struct.pack(">Iqq", len(points), t0, v0)
    prev_t, prev_v = t0, v0
    prev_delta = 0
    prev_lead, prev_len = -1, 0
    for t, v in points[1:]:
        # -- timestamp: delta of delta
        delta = t - prev_t
        dod = delta - prev_delta
        if dod == 0:
            w.write(0, 1)
        elif -64 <= dod <= 63:
            w.write(0b10, 2)
            w.write(dod & 0x7F, 7)
        elif -256 <= dod <= 255:
            w.write(0b110, 3)
            w.write(dod & 0x1FF, 9)
        elif -2048 <= dod <= 2047:
            w.write(0b1110, 4)
            w.write(dod & 0xFFF, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
        prev_delta, prev_t = delta, t
        # -- value: XOR against previous
        x = (v ^ prev_v) & ((1 << 64) - 1)
        if x == 0:
            w.write(0, 1)
        else:
            lead = 64 - x.bit_length()
            trail = (x & -x).bit_length() - 1
            if (
                prev_lead >= 0
                and lead >= prev_lead
                and trail >= 64 - prev_lead - prev_len
            ):
                w.write(0b10, 2)
                w.write(x >> (64 - prev_lead - prev_len), prev_len)
            else:
                lead = min(lead, 63)
                mlen = 64 - lead - trail
                w.write(0b11, 2)
                w.write(lead, 6)
                w.write(mlen & 0x3F, 6)  # 64 encodes as 0
                w.write(x >> trail, mlen)
                prev_lead, prev_len = lead, mlen
        prev_v = v
    return out + w.bytes()


def decode_gorilla(payload: bytes) -> list[tuple[int, int]]:
    """Gorilla block → [(ts_ms, value_int)] — exact inverse of
    encode_gorilla."""
    (n,) = struct.unpack_from(">I", payload, 0)
    if n == 0:
        return []
    t, v = struct.unpack_from(">qq", payload, 4)
    points = [(t, v)]
    r = _GorillaBitReader(payload[20:])
    delta = 0
    lead, mlen = -1, 0
    for _ in range(n - 1):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _signed(r.read(7), 7)
        elif r.read(1) == 0:
            dod = _signed(r.read(9), 9)
        elif r.read(1) == 0:
            dod = _signed(r.read(12), 12)
        else:
            dod = _signed(r.read(64), 64)
        delta += dod
        t += delta
        if r.read(1) == 1:
            if r.read(1) == 0:  # reuse window
                if lead < 0:
                    raise ValueError("window reuse before any window was set")
                x = r.read(mlen) << (64 - lead - mlen)
            else:
                lead = r.read(6)
                mlen = r.read(6) or 64
                trail = 64 - lead - mlen
                x = r.read(mlen) << trail
            u = (v ^ x) & ((1 << 64) - 1)  # XOR in the 64-bit pattern domain
            v = u - (1 << 64) if u >= 1 << 63 else u  # back to signed
        points.append((t, v))
    return points


# ---------------------------------------------------------------------------
# Snappy block format (the public google/snappy format description) —
# the default block codec of half the Avro/Kafka/parquet world. Decoder
# covers the full tag set (literals + copies with 1/2/4-byte offsets);
# the encoder emits greedy hash-match copies like the reference C++
# (correctness does not depend on match quality — any tag stream that
# decodes to the input is valid snappy).
# ---------------------------------------------------------------------------


def snappy_decompress(payload: bytes) -> bytes:
    ulen, pos = _pb_varint_decode(payload, 0)  # same varint as protobuf
    out = bytearray()
    while pos < len(payload):
        tag = payload[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            n = tag >> 2
            if n >= 60:
                nb = n - 59
                n = int.from_bytes(payload[pos : pos + nb], "little")
                pos += nb
            n += 1
            out += payload[pos : pos + n]
            pos += n
            continue
        if t == 1:  # copy, 1-byte offset, len 4..11
            length = ((tag >> 2) & 7) + 4
            offset = ((tag >> 5) << 8) | payload[pos]
            pos += 1
        elif t == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range")
        # overlapping copies are legal and REQUIRED (RLE spelled as
        # offset < length): copy byte-at-a-time semantics
        start = len(out) - offset
        for i in range(length):
            out.append(out[start + i])
    if len(out) != ulen:
        raise ValueError(f"snappy length mismatch: {len(out)} != {ulen}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Greedy 4-byte hash matcher — small but real compression; any
    output is checked only by decoding back to the input."""
    out = bytearray(_pb_varint_encode(len(data)))

    def emit_literal(chunk: bytes) -> None:
        i = 0
        while i < len(chunk):
            part = chunk[i : i + 65536]
            n = len(part) - 1
            if n < 60:
                out.append(n << 2)
            else:
                nb = (n.bit_length() + 7) // 8
                out.append((59 + nb) << 2)
                out.extend(n.to_bytes(nb, "little"))
            out.extend(part)
            i += len(part)

    table: dict[bytes, int] = {}
    i = lit_start = 0
    n = len(data)
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 65535:
            length = 4
            while i + length < n and length < 64 and data[j + length] == data[i + length]:
                length += 1
            emit_literal(data[lit_start:i])
            offset = i - j
            if 4 <= length <= 11 and offset < 2048:
                out.append(1 | ((length - 4) << 2) | ((offset >> 8) << 5))
                out.append(offset & 0xFF)
            else:
                out.append(2 | ((length - 1) << 2))
                out += offset.to_bytes(2, "little")
            i += length
            lit_start = i
        else:
            i += 1
    emit_literal(data[lit_start:])
    return bytes(out)


# ---------------------------------------------------------------------------
# EXIF (TIFF-IFD) metadata — the public TIFF 6.0 / EXIF structure every
# camera writes into JPEG APP1: byte-order header, 12-byte IFD entries
# (tag, type, count, value-or-offset), a pointer tag to the Exif sub-IFD.
# Orientation is the tag that silently transposes a training corpus.
# ---------------------------------------------------------------------------

_EXIF_TYPES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # type -> byte size per item


def encode_exif_app1(
    tags: dict[int, object], exif_tags: dict[int, object] | None = None,
    byte_order: str = "<",
) -> bytes:
    """Build a real APP1 EXIF segment (for fixtures and tests). Values:
    int -> SHORT/LONG, str -> ASCII, (num, den) -> RATIONAL."""
    bo = byte_order
    mark = b"II" if bo == "<" else b"MM"

    def entry_and_extra(tag, val, extra_base):
        extra = b""
        if isinstance(val, str):
            raw = val.encode() + b"\x00"
            typ, cnt = 2, len(raw)
            if cnt <= 4:
                payload = raw.ljust(4, b"\x00")
            else:
                payload = struct.pack(bo + "I", extra_base)
                extra = raw
        elif isinstance(val, tuple):
            typ, cnt = 5, 1
            payload = struct.pack(bo + "I", extra_base)
            extra = struct.pack(bo + "II", val[0], val[1])
        elif isinstance(val, int) and val <= 0xFFFF:
            typ, cnt = 3, 1
            payload = struct.pack(bo + "H", val) + b"\x00\x00"
        else:
            typ, cnt = 4, 1
            payload = struct.pack(bo + "I", val)
        return struct.pack(bo + "HHI", tag, typ, cnt) + payload, extra

    def build_ifd(entries: dict[int, object], base: int, next_off: int = 0):
        n = len(entries)
        extra_base = base + 2 + 12 * n + 4
        body, extras = b"", b""
        for tag in sorted(entries):
            e, x = entry_and_extra(tag, entries[tag], extra_base + len(extras))
            body += e
            extras += x
        return (
            struct.pack(bo + "H", n) + body + struct.pack(bo + "I", next_off)
            + extras
        )

    tiff_tags = dict(tags)
    ifd0_base = 8
    if exif_tags:
        # reserve the pointer entry; the sub-IFD lands after IFD0
        probe = build_ifd({**tiff_tags, 0x8769: 0}, ifd0_base)
        sub_base = ifd0_base + len(probe)
        tiff_tags[0x8769] = sub_base
    tiff = mark + struct.pack(bo + "HI", 42, ifd0_base)
    tiff += build_ifd(tiff_tags, ifd0_base)
    if exif_tags:
        tiff += build_ifd(exif_tags, len(tiff))
    seg = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def decode_exif(payload: bytes) -> dict:
    """JPEG APP1 EXIF (or bare TIFF) → {tag: value} with Exif sub-IFD
    tags merged in. Handles both byte orders, inline and offset values,
    ASCII / SHORT / LONG / RATIONAL types. Missing EXIF raises."""
    if payload[:2] == b"\xff\xd8":  # walk JPEG markers for APP1
        pos = 2
        tiff = None
        while pos + 4 <= len(payload) and payload[pos] == 0xFF:
            marker, ln = payload[pos + 1], int.from_bytes(payload[pos + 2 : pos + 4], "big")
            if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
                tiff = payload[pos + 10 : pos + 2 + ln]
                break
            if marker == 0xDA:  # start of scan: no APP1 came
                break
            pos += 2 + ln
        if tiff is None:
            raise ValueError("no EXIF APP1 segment")
    else:
        tiff = payload
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")

    out: dict[int, object] = {}

    def read_ifd(off: int) -> None:
        (n,) = struct.unpack_from(bo + "H", tiff, off)
        for i in range(n):
            tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, off + 2 + 12 * i)
            vpos = off + 2 + 12 * i + 8
            size = _EXIF_TYPES.get(typ)
            if size is None:
                continue  # unknown type: skip, per TIFF reader rules
            total = size * cnt
            if total > 4:
                (vpos,) = struct.unpack_from(bo + "I", tiff, vpos)
            if typ == 2:
                val = tiff[vpos : vpos + cnt].split(b"\x00")[0].decode("ascii")
            elif typ == 5:
                num, den = struct.unpack_from(bo + "II", tiff, vpos)
                val = (num, den)
            elif typ == 3:
                val = struct.unpack_from(bo + "H", tiff, vpos)[0]
            elif typ == 4:
                val = struct.unpack_from(bo + "I", tiff, vpos)[0]
            else:
                val = tiff[vpos]
            if tag == 0x8769:  # Exif sub-IFD pointer
                read_ifd(val)
            else:
                out[tag] = val

    read_ifd(ifd_off)
    return out


# ---------------------------------------------------------------------------
# TGA — Truevision TARGA (24bpp true-color, types 2 uncompressed and 10
# RLE). The textbook byte-oriented RLE: packets with a count byte whose
# high bit selects run-vs-raw — the scanline analog of QOI's RUN op, and
# the format legacy game/graphics corpora actually carry. TGA has no
# leading magic; the v2 footer signature "TRUEVISION-XFILE." is the
# sniffable anchor (per the published TGA 2.0 spec).
# ---------------------------------------------------------------------------

_TGA_FOOTER = b"\x00\x00\x00\x00\x00\x00\x00\x00TRUEVISION-XFILE.\x00"


def encode_tga(width: int, height: int, rgb: bytes, rle: bool = True) -> bytes:
    """Top-down RGB raster → 24bpp TGA (type 10 RLE by default, type 2
    raw otherwise), top-down storage (descriptor bit 5), v2 footer."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    header = struct.pack(
        "<BBBHHBHHHHBB",
        0, 0, 10 if rle else 2,
        0, 0, 0,       # no color map
        0, 0, width, height, 24, 0x20,  # top-down
    )
    pixels = [
        bytes((rgb[i * 3 + 2], rgb[i * 3 + 1], rgb[i * 3]))  # BGR
        for i in range(width * height)
    ]
    if not rle:
        return header + b"".join(pixels) + _TGA_FOOTER
    body = bytearray()
    i, n = 0, len(pixels)
    while i < n:
        # greedy: measure the run at i (capped at 128)
        run = 1
        while i + run < n and run < 128 and pixels[i + run] == pixels[i]:
            run += 1
        if run >= 2:
            body += bytes((0x80 | (run - 1),)) + pixels[i]
            i += run
            continue
        # literal stretch: until the next >=2 run starts (capped at 128)
        j = i + 1
        while (
            j < n and j - i < 128
            and not (j + 1 < n and pixels[j + 1] == pixels[j])
        ):
            j += 1
        body += bytes((j - i - 1,)) + b"".join(pixels[i:j])
        i = j
    return header + bytes(body) + _TGA_FOOTER


def decode_tga(payload: bytes) -> dict:
    """24bpp TGA (types 2 and 10) → {width, height, pixels} (top-down
    RGB). Validates the v2 footer signature; color-mapped/other-depth
    variants raise (the honest-seam convention)."""
    if payload[-18:] != _TGA_FOOTER[-18:]:
        raise ValueError("not a TGA v2 (no TRUEVISION-XFILE footer)")
    (
        id_len, cmap_type, image_type,
        _cm_first, _cm_len, _cm_bpp,
        _x0, _y0, width, height, bpp, desc,
    ) = struct.unpack_from("<BBBHHBHHHHBB", payload, 0)
    if cmap_type != 0 or image_type not in (2, 10) or bpp != 24:
        raise ValueError(
            f"unsupported TGA variant (cmap={cmap_type},"
            f" type={image_type}, bpp={bpp}): 24bpp true-color only"
        )
    pos = 18 + id_len
    npix = width * height
    pix = bytearray()
    if image_type == 2:
        need = npix * 3
        pix += payload[pos : pos + need]
        if len(pix) != need:
            raise ValueError("truncated TGA raster")
    else:
        end = len(payload) - len(_TGA_FOOTER)  # raster data stops at the footer
        while len(pix) < npix * 3:
            if pos >= end:
                raise ValueError("truncated TGA RLE stream")
            hdr = payload[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                if pos + 3 > end:
                    raise ValueError("truncated TGA RLE stream")
                pix += payload[pos : pos + 3] * count
                pos += 3
            else:  # raw packet: count literal pixels
                if pos + count * 3 > end:
                    raise ValueError("truncated TGA RLE stream")
                pix += payload[pos : pos + count * 3]
                pos += count * 3
        if len(pix) != npix * 3:
            raise ValueError("TGA RLE stream overruns the raster")
    top_down = bool(desc & 0x20)
    out = bytearray(npix * 3)
    for row in range(height):
        y = row if top_down else height - 1 - row
        line = pix[row * width * 3 : (row + 1) * width * 3]
        for x in range(width):
            b, g, r = line[x * 3 : x * 3 + 3]
            out[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes((r, g, b))
    return {"width": width, "height": height, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# PCX — ZSoft Paintbrush (24bpp, 3 color PLANES per scanline, RLE with
# the top-two-bits run marker). The planar layout is the distinctive
# decode hazard TGA/BMP don't have: each row arrives as R-plane bytes,
# then G, then B, each independently RLE'd across the row (runs may
# cross plane boundaries per the spec — encoder here never emits that,
# decoder handles the plane-concatenated stream uniformly).
# ---------------------------------------------------------------------------


def encode_pcx(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB raster → 24bpp PCX (version 5, 8 bits/plane,
    3 planes, RLE)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    bpl = width + (width & 1)  # bytes per plane line, even per spec
    header = struct.pack(
        "<BBBBHHHHHH48sBBHH58s",
        0x0A, 5, 1, 8,
        0, 0, width - 1, height - 1,
        72, 72, b"\x00" * 48, 0, 3, bpl, 1, b"\x00" * 58,
    )
    body = bytearray()
    for y in range(height):
        for plane in range(3):
            line = bytes(
                rgb[(y * width + x) * 3 + plane] for x in range(width)
            ) + b"\x00" * (bpl - width)
            i = 0
            while i < len(line):
                run = 1
                while (
                    i + run < len(line) and run < 63
                    and line[i + run] == line[i]
                ):
                    run += 1
                v = line[i]
                if run > 1 or (v & 0xC0) == 0xC0:
                    body += bytes((0xC0 | run, v))
                else:
                    body += bytes((v,))
                i += run
    return header + bytes(body)


def decode_pcx(payload: bytes) -> dict:
    """24bpp 3-plane RLE PCX → {width, height, pixels} (top-down RGB).
    Non-24bpp / unversioned variants raise (honest-seam convention)."""
    if payload[0] != 0x0A:
        raise ValueError("not a PCX (no 0x0A manufacturer byte)")
    (
        _mfg, version, encoding, bits,
        x0, y0, x1, y1, _hdpi, _vdpi,
    ) = struct.unpack_from("<BBBBHHHHHH", payload, 0)
    nplanes = payload[65]
    bpl = struct.unpack_from("<H", payload, 66)[0]
    if version != 5 or encoding != 1 or bits != 8 or nplanes != 3:
        raise ValueError(
            f"unsupported PCX variant (v={version}, enc={encoding},"
            f" bits={bits}, planes={nplanes}): 24bpp RLE only"
        )
    width, height = x1 - x0 + 1, y1 - y0 + 1
    need = bpl * 3 * height
    flat = bytearray()
    pos = 128
    while len(flat) < need:
        b = payload[pos]
        pos += 1
        if (b & 0xC0) == 0xC0:
            flat += bytes((payload[pos],)) * (b & 0x3F)
            pos += 1
        else:
            flat += bytes((b,))
    if len(flat) != need:
        raise ValueError("PCX RLE stream overruns the raster")
    out = bytearray(width * height * 3)
    for y in range(height):
        base = y * bpl * 3
        for plane in range(3):
            line = flat[base + plane * bpl : base + plane * bpl + width]
            for x in range(width):
                out[(y * width + x) * 3 + plane] = line[x]
    return {"width": width, "height": height, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# AIFF — Apple/EA IFF audio (FORM/COMM/SSND chunks, BIG-endian PCM).
# The distinctive parse hazard: COMM stores the sample rate as an
# 80-bit IEEE 754 EXTENDED float (1 sign + 15 exponent + 64 explicit-
# integer-bit mantissa) — no Python struct code exists for it, so both
# sides of the pair implement the textbook conversion by hand.
# ---------------------------------------------------------------------------


def _f80_encode(rate: int) -> bytes:
    """Positive integer sample rate → 80-bit extended float bytes."""
    if rate <= 0:
        raise ValueError("rate must be positive")
    m = rate
    e = 0
    while m < (1 << 63):
        m <<= 1
        e -= 1
    while m >= (1 << 64):
        m >>= 1
        e += 1
    exponent = 16383 + 63 + e
    return struct.pack(">HQ", exponent, m)


def _f80_decode(b: bytes) -> int:
    """80-bit extended float bytes → integer sample rate."""
    exponent, mantissa = struct.unpack(">HQ", b[:10])
    if exponent & 0x8000:
        raise ValueError("negative AIFF sample rate")
    e = exponent - 16383 - 63
    return mantissa << e if e >= 0 else mantissa >> -e


def encode_aiff(
    samples: bytes, *, framerate: int = 8000, channels: int = 1,
    sampwidth: int = 2,
) -> bytes:
    """Little-endian PCM sample bytes → AIFF (big-endian samples,
    80-bit-float rate in COMM). ``samples`` arrive in the machine's
    usual little-endian order; the encoder byte-swaps per frame word."""
    if len(samples) % (channels * sampwidth):
        raise ValueError("sample bytes not a whole number of frames")
    n_frames = len(samples) // (channels * sampwidth)
    if sampwidth == 1:
        big = samples
    else:
        big = bytearray()
        for i in range(0, len(samples), sampwidth):
            big += samples[i : i + sampwidth][::-1]
        big = bytes(big)
    comm = struct.pack(">hLh", channels, n_frames, sampwidth * 8) + _f80_encode(
        framerate
    )
    ssnd = struct.pack(">LL", 0, 0) + big
    chunks = b"COMM" + struct.pack(">L", len(comm)) + comm
    chunks += b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    if len(ssnd) % 2:
        chunks += b"\x00"  # IFF chunks pad to even length
    return b"FORM" + struct.pack(">L", 4 + len(chunks)) + b"AIFF" + chunks


def decode_aiff(payload: bytes) -> dict:
    """AIFF → {channels, sampwidth, framerate, n_frames, duration_us,
    frames} with frames byte-swapped back to little-endian (the
    decode_wav shape, so downstream audio stages are container-
    agnostic). Compressed AIFC raises (honest-seam convention)."""
    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        raise ValueError("not an AIFF (no FORM/AIFF header)")
    pos, end = 12, 8 + struct.unpack(">L", payload[4:8])[0]
    comm = ssnd = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        clen = struct.unpack(">L", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + clen + (clen & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    channels, n_frames, bits = struct.unpack(">hLh", comm[:8])
    rate = _f80_decode(comm[8:18])
    sampwidth = bits // 8
    offset = struct.unpack(">L", ssnd[:4])[0]
    big = ssnd[8 + offset : 8 + offset + n_frames * channels * sampwidth]
    if len(big) != n_frames * channels * sampwidth:
        raise ValueError("truncated AIFF sample data")
    if sampwidth == 1:
        frames = bytes(big)
    else:
        out = bytearray()
        for i in range(0, len(big), sampwidth):
            out += big[i : i + sampwidth][::-1]
        frames = bytes(out)
    return {
        "channels": channels,
        "sampwidth": sampwidth,
        "framerate": rate,
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // rate,
        "frames": frames,
    }


# ---------------------------------------------------------------------------
# ICO — Windows icon container (favicon.ico): an ICONDIR directory over
# embedded BMP DIBs stored WITHOUT the BITMAPFILEHEADER, with doubled
# biHeight covering the appended 1-bit AND transparency mask. The
# container every web crawl actually collects millions of.
# ---------------------------------------------------------------------------


def encode_ico(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB raster → single-image 24bpp ICO (opaque AND mask)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    if width > 255 or height > 255:
        raise ValueError("ICO images are at most 255x255")
    stride = (width * 3 + 3) & ~3
    xor = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up, like BMP
        row = bytearray()
        for x in range(width):
            r, g, b = rgb[(y * width + x) * 3 : (y * width + x) * 3 + 3]
            row += bytes((b, g, r))
        row += b"\x00" * (stride - len(row))
        xor += row
    mask_stride = ((width + 31) // 32) * 4
    and_mask = b"\x00" * (mask_stride * height)  # fully opaque
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height * 2, 1, 24, 0,
        len(xor) + len(and_mask), 0, 0, 0, 0,
    )
    image = dib + bytes(xor) + and_mask
    header = struct.pack("<HHH", 0, 1, 1)
    entry = struct.pack(
        "<BBBBHHII", width % 256, height % 256, 0, 0, 1, 24,
        len(image), 6 + 16,
    )
    return header + entry + image


def decode_ico(payload: bytes) -> dict:
    """Single-image 24bpp ICO → {width, height, pixels} (top-down RGB).

    Parses the ICONDIR, follows the first entry's offset, reads the
    doubled-height DIB, reconstructs the XOR raster, and skips the AND
    mask. PNG-embedded and palettized entries raise (honest-seam)."""
    if payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO (bad ICONDIR reserved/type)")
    count = struct.unpack_from("<H", payload, 4)[0]
    if count < 1:
        raise ValueError("empty ICO directory")
    size, off = struct.unpack_from("<II", payload, 6 + 8)
    body = payload[off : off + size]
    if body[:8] == b"\x89PNG\r\n\x1a\n":
        raise ValueError("PNG-embedded ICO entry: route to decode_png")
    (
        bi_size, width, height2, _planes, bitcount, compression,
    ) = struct.unpack_from("<IiiHHI", body, 0)
    if bi_size != 40 or bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported ICO DIB (size={bi_size}, bpp={bitcount},"
            f" comp={compression}): 24bpp BI_RGB only"
        )
    height = height2 // 2
    stride = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for row in range(height):
        y = height - 1 - row  # bottom-up
        base = 40 + row * stride
        line = body[base : base + width * 3]
        if len(line) != width * 3:
            raise ValueError("truncated ICO XOR raster")
        for x in range(width):
            b, g, r = line[x * 3 : x * 3 + 3]
            out[(y * width + x) * 3 : (y * width + x) * 3 + 3] = bytes((r, g, b))
    return {"width": width, "height": height, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# AU — Sun/NeXT ".snd" audio (the ORIGINAL network audio container,
# still what telephony archives carry): 24-byte big-endian header,
# variable data offset (annotation field), and the G.711 mu-law
# encoding this module already speaks — AU composes container parse
# with companding rather than adding a new codec.
# ---------------------------------------------------------------------------

_AU_MULAW, _AU_PCM16 = 1, 3


def encode_au(
    samples: list[int] | bytes, *, framerate: int = 8000,
    encoding: int = _AU_MULAW, annotation: bytes = b"",
) -> bytes:
    """int16 samples → .au (mu-law 8-bit or big-endian PCM16 mono)."""
    ann = annotation + b"\x00" * ((4 - len(annotation) % 4) % 4)
    if encoding == _AU_MULAW:
        body = bytes(mulaw_encode(s) for s in samples)
    elif encoding == _AU_PCM16:
        body = b"".join(
            struct.pack(">h", max(-32768, min(32767, int(s))))
            for s in samples
        )
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    offset = 24 + len(ann)
    header = struct.pack(
        ">4sIIIII", b".snd", offset, len(body), encoding, framerate, 1
    )
    return header + ann + body


def decode_au(payload: bytes) -> dict:
    """.au → {framerate, encoding, n_samples, duration_us, samples}
    (int16 list; mu-law expanded through the shared G.711 table).
    Unknown encodings raise (honest-seam convention)."""
    if payload[:4] != b".snd":
        raise ValueError("not an AU file (no .snd magic)")
    (_magic, offset, size, encoding, rate, channels) = struct.unpack(
        ">4sIIIII", payload[:24]
    )
    if channels != 1 or encoding not in (_AU_MULAW, _AU_PCM16):
        raise ValueError(
            f"unsupported AU variant (enc={encoding}, ch={channels}):"
            " mono mu-law/PCM16 only"
        )
    body = payload[offset : offset + size]
    if len(body) != size:
        raise ValueError("truncated AU data")
    if encoding == _AU_MULAW:
        samples = [mulaw_decode(b) for b in body]
    else:
        if size % 2:
            raise ValueError("odd PCM16 AU data size")
        samples = [
            struct.unpack_from(">h", body, i)[0] for i in range(0, size, 2)
        ]
    n = len(samples)
    return {
        "framerate": rate,
        "encoding": encoding,
        "n_samples": n,
        "duration_us": n * 1_000_000 // rate,
        "samples": samples,
    }
