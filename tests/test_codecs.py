"""Pure-stdlib codec tests: PNG five-filter reconstruction, WAV, PPM.

The q99c oracle pins the filter-0 path end-to-end; these tests pin the
decoder against scanlines filtered with Sub/Up/Average/Paeth (which our
minimal encoder never emits) so the decoder is a real PNG reader, not a
mirror of its own writer.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from better_cdc_spark import codecs


def test_png_roundtrip():
    w, h = 13, 7
    px = bytes((i * 37 + 5) % 256 for i in range(w * h))
    meta = codecs.decode_png(codecs.encode_png(w, h, px))
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["pixels"] == px


def _png_with_filters(width, height, pixels, ftypes):
    """Build a grayscale PNG applying a given filter type per scanline
    (forward-filtering per the PNG spec), exercising decode reconstruction."""

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b""
    prev = bytes(width)
    for y in range(height):
        line = pixels[y * width : (y + 1) * width]
        ft = ftypes[y % len(ftypes)]
        out = bytearray()
        for i in range(width):
            x = line[i]
            a = line[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if ft == 0:
                out.append(x)
            elif ft == 1:
                out.append((x - a) & 0xFF)
            elif ft == 2:
                out.append((x - b) & 0xFF)
            elif ft == 3:
                out.append((x - (a + b) // 2) & 0xFF)
            else:  # Paeth
                out.append((x - codecs._paeth(a, b, c)) & 0xFF)
        raw += bytes([ft]) + bytes(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        codecs.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decodes_all_standard_filters(ftypes):
    w, h = 9, 10
    px = bytes((i * 91 + 17) % 256 for i in range(w * h))
    meta = codecs.decode_png(_png_with_filters(w, h, px, ftypes))
    assert meta["pixels"] == px


def test_png_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_png(b"JFIF not a png")


def test_wav_roundtrip():
    samples = bytes((i * 3) % 256 for i in range(1600))
    meta = codecs.decode_wav(codecs.encode_wav(samples, framerate=8000))
    assert meta["n_frames"] == 1600
    assert meta["framerate"] == 8000
    assert meta["duration_us"] == 200_000
    assert meta["frames"] == samples


def test_ppm_roundtrip_and_comment_header():
    w, h = 4, 3
    rgb = bytes(range(w * h * 3))
    meta = codecs.decode_ppm(codecs.encode_ppm(w, h, rgb))
    assert (meta["width"], meta["height"], meta["pixels"]) == (w, h, rgb)
    commented = b"P6\n# a comment\n4 3\n255\n" + rgb
    assert codecs.decode_ppm(commented)["pixels"] == rgb


def test_ppm_truncated_raster_raises():
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_ppm(b"P6\n4 3\n255\n" + b"\x00" * 5)


# -- JPEG (baseline grayscale) ------------------------------------------------


def _dct_reference(img, quant):
    """Independent fdct->quant->dequant->idct reconstruction in numpy —
    a separate code path from the decoder's huffman walk, so a marker /
    entropy-coding bug cannot cancel out."""
    import numpy as np

    h, w = img.shape
    x = np.arange(8)
    m = np.cos((2 * x + 1) * x.reshape(-1, 1) * np.pi / 16) * 0.5
    m[0] *= 1 / np.sqrt(2)
    q2d = quant[codecs.ZIGZAG.argsort()].reshape(8, 8)
    ref = np.zeros_like(img, dtype=np.float64)
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            b = img[by:by + 8, bx:bx + 8].astype(np.float64) - 128
            qc = np.round((m @ b @ m.T) / q2d) * q2d
            ref[by:by + 8, bx:bx + 8] = m.T @ qc @ m
    return np.clip(np.round(ref + 128), 0, 255).astype("uint8")


def test_jpeg_constant_blocks_decode_exactly():
    import numpy as np

    rng = np.random.RandomState(3)
    for _ in range(4):
        bw, bh = int(rng.randint(1, 5)), int(rng.randint(1, 4))
        vals = rng.randint(0, 256, (bh, bw))
        img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        d = codecs.decode_jpeg_gray(
            codecs.encode_jpeg_gray(bw * 8, bh * 8, img.tobytes())
        )
        assert (d["width"], d["height"]) == (bw * 8, bh * 8)
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(bh * 8, bw * 8)
        assert (got == img).all()


def test_jpeg_general_image_matches_quantized_reconstruction():
    import numpy as np

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    d = codecs.decode_jpeg_gray(codecs.encode_jpeg_gray(32, 24, img.tobytes()))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(24, 32)
    assert (got == _dct_reference(img, codecs.DEFAULT_QUANT)).all()


def test_jpeg_byte_stuffing_roundtrip():
    import numpy as np

    # gradient images reliably produce 0xFF bytes in the entropy stream
    # across seeds; assert stuffing occurred AND decodes transparently
    img = (np.arange(64 * 64) * 7 % 256).reshape(64, 64).astype(np.uint8)
    payload = codecs.encode_jpeg_gray(64, 64, img.tobytes())
    d = codecs.decode_jpeg_gray(payload)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(64, 64)
    assert (got == _dct_reference(img, codecs.DEFAULT_QUANT)).all()


def test_jpeg_rejects_non_baseline_and_garbage():
    import numpy as np

    img = np.full((8, 8), 100, dtype=np.uint8)
    payload = bytearray(codecs.encode_jpeg_gray(8, 8, img.tobytes()))
    with pytest.raises(ValueError, match="SOI"):
        codecs.decode_jpeg_gray(b"\x00\x01\x02")
    # flip SOF0 -> SOF2 (progressive): honest capability boundary
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        codecs.decode_jpeg_gray(bytes(payload))


def test_jpeg_truncated_scan_raises():
    import numpy as np

    img = np.full((8, 8), 77, dtype=np.uint8)
    payload = codecs.encode_jpeg_gray(8, 8, img.tobytes())
    with pytest.raises(ValueError):
        codecs.decode_jpeg_gray(payload[: len(payload) - 4] )


def test_jpeg_sos_without_sof_raises_valueerror():
    import numpy as np

    img = np.full((8, 8), 10, dtype=np.uint8)
    payload = codecs.encode_jpeg_gray(8, 8, img.tobytes())
    sof = payload.find(b"\xff\xc0")
    ln = int.from_bytes(payload[sof + 2 : sof + 4], "big")
    gutted = payload[:sof] + payload[sof + 2 + ln :]  # drop the SOF0 segment
    with pytest.raises(ValueError, match="SOF0"):
        codecs.decode_jpeg_gray(gutted)


# -- GIF (LZW) ----------------------------------------------------------------


def test_gif_roundtrip_various_palettes():
    import random

    rng = random.Random(5)
    for _ in range(6):
        w, h = rng.randint(1, 40), rng.randint(1, 30)
        npal = rng.choice([2, 4, 16, 256])
        pal = [(i % 256, (i * 7) % 256, (i * 13) % 256) for i in range(npal)]
        px = bytes(rng.randrange(npal) for _ in range(w * h))
        d = codecs.decode_gif(codecs.encode_gif(w, h, px, pal))
        assert (d["width"], d["height"]) == (w, h)
        assert d["indices"] == px
        assert d["palette"][:npal] == pal


def test_gif_decoder_handles_dictionary_growth_and_cscsc():
    """Hand-built LZW stream with dictionary growth the uncompressed
    encoder never emits: codes [CLEAR,1,1,6,2,EOI] at mcs=2 must decode
    to pixels [1,1,1,1,2], with the width bump to 4 bits after code 7 is
    added, and code 6 arriving one step after its own definition."""
    import struct

    mcs = 2
    w = codecs._LSBBitWriter()
    for code, width in [(4, 3), (1, 3), (1, 3), (6, 3), (2, 4), (5, 4)]:
        w.put(code, width)
    lzw = w.flush()
    pal = [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)]
    out = bytearray(b"GIF89a") + struct.pack("<HHBBB", 5, 1, 0x80 | 1, 0, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 5, 1, 0) + bytes([mcs])
    out += bytes([len(lzw)]) + lzw + b"\x00\x3b"
    d = codecs.decode_gif(bytes(out))
    assert d["indices"] == bytes([1, 1, 1, 1, 2])


def test_gif_skips_extensions_and_rejects_garbage():
    pal = [(0, 0, 0), (255, 255, 255)]
    payload = bytearray(codecs.encode_gif(3, 2, bytes([0, 1, 0, 1, 1, 0]), pal))
    # splice a graphic-control extension before the image descriptor
    img_at = payload.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(payload[:img_at]) + gce + bytes(payload[img_at:])
    d = codecs.decode_gif(patched)
    assert d["indices"] == bytes([0, 1, 0, 1, 1, 0])
    with pytest.raises(ValueError, match="signature"):
        codecs.decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        codecs.decode_gif(patched[:20])  # truncated


def _color_recon(img, quant):
    """Independent numpy reconstruction of the full 4:2:0 pipeline:
    color transform, integer planes, 2x2 box average, per-block
    quantized DCT roundtrip, plane re-quantization, 2x nearest
    upsample, YCbCr->RGB — shares NO code with decode_jpeg_color's
    marker/huffman/MCU path."""
    import numpy as np

    y, cb, cr = codecs.rgb_to_ycbcr(img)

    def box2(p):
        f = p.astype(np.float64)
        return codecs._half_up_u8(
            (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4.0
        )

    m = codecs._dct_basis()

    def plane_roundtrip(plane):
        q2d = quant[codecs.ZIGZAG.argsort()].reshape(8, 8)
        out = np.zeros(plane.shape)
        for by in range(0, plane.shape[0], 8):
            for bx in range(0, plane.shape[1], 8):
                b = plane[by:by + 8, bx:bx + 8].astype(np.float64) - 128
                qc = np.round((m @ b @ m.T) / q2d) * q2d
                out[by:by + 8, bx:bx + 8] = m.T @ qc @ m
        return codecs._half_up_u8(out + 128)

    up = lambda p: np.repeat(np.repeat(p, 2, 0), 2, 1)  # noqa: E731
    return codecs.ycbcr_to_rgb(
        plane_roundtrip(y),
        up(plane_roundtrip(box2(cb))),
        up(plane_roundtrip(box2(cr))),
    )


def test_jpeg_420_constant_mcus_roundtrip_exactly():
    """A 16x16 MCU with constant integer (Y, Cb, Cr) survives encode ->
    decode exactly: constant chroma makes 2x2 averaging and upsampling
    lossless, and the DC quant step of 8 makes quantization exact — the
    q99h closed-form-oracle contract."""
    import numpy as np

    rng = np.random.RandomState(5)
    for _ in range(3):
        wb, hb = int(rng.randint(1, 4)), int(rng.randint(1, 3))
        yv = rng.randint(0, 256, (hb, wb))
        cbv = rng.randint(0, 256, (hb, wb))
        crv = rng.randint(0, 256, (hb, wb))
        y = np.kron(yv, np.ones((16, 16), dtype=np.int64)).astype(np.uint8)
        cb = np.kron(cbv, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        cr = np.kron(crv, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        d = codecs.decode_jpeg_color(
            codecs.encode_jpeg_ycbcr_420(wb * 16, hb * 16, y, cb, cr)
        )
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(hb * 16, wb * 16, 3)
        up = lambda p: np.repeat(np.repeat(p, 2, 0), 2, 1)  # noqa: E731
        assert (got == codecs.ycbcr_to_rgb(y, up(cb), up(cr))).all()


def test_jpeg_420_general_image_matches_independent_reconstruction():
    import numpy as np

    rng = np.random.RandomState(13)
    for shape in ((32, 48), (16, 16), (48, 32)):
        img = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        d = codecs.decode_jpeg_color(
            codecs.encode_jpeg_color_420(shape[1], shape[0], img.tobytes())
        )
        assert (d["width"], d["height"]) == (shape[1], shape[0])
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(*shape, 3)
        assert (got == _color_recon(img, codecs.DEFAULT_QUANT)).all()


def test_jpeg_420_gradient_exercises_byte_stuffing_and_ac():
    import numpy as np

    # smooth gradients produce nonzero AC coefficients and 0xFF bytes
    h, w = 32, 64
    gy, gx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(gx * 7) % 256, (gy * 11) % 256, ((gx + gy) * 5) % 256], axis=-1
    ).astype(np.uint8)
    payload = codecs.encode_jpeg_color_420(w, h, img.tobytes())
    d = codecs.decode_jpeg_color(payload)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
    assert (got == _color_recon(img, codecs.DEFAULT_QUANT)).all()


def test_jpeg_420_rejects_other_layouts_and_features():
    import numpy as np

    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    payload = bytearray(codecs.encode_jpeg_color_420(16, 16, img.tobytes()))
    # grayscale decoder refuses color streams, color refuses grayscale
    with pytest.raises(ValueError, match="single-component"):
        codecs.decode_jpeg_gray(bytes(payload))
    gray = codecs.encode_jpeg_gray(8, 8, np.full((8, 8), 5, np.uint8).tobytes())
    with pytest.raises(ValueError, match="3-component"):
        codecs.decode_jpeg_color(gray)
    # sampling factors above 2: honest capability boundary
    sof = payload.find(b"\xff\xc0")
    p4x = bytearray(payload)
    p4x[sof + 4 + 7] = 0x41  # comp 0 h=4
    with pytest.raises(ValueError, match="sampling factor"):
        codecs.decode_jpeg_color(bytes(p4x))
    # a baseline-coded stream whose SOF byte is flipped to SOF2 routes
    # to the progressive decoder and fails its scan-header validation
    pprog = bytearray(payload)
    pprog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        codecs.decode_jpeg_color(bytes(pprog))


def _const_420_frame(yv, cbv, crv, wb=2, hb=1):
    import numpy as np

    y = np.full((hb * 16, wb * 16), yv, np.uint8)
    cb = np.full((hb * 8, wb * 8), cbv, np.uint8)
    cr = np.full((hb * 8, wb * 8), crv, np.uint8)
    return codecs.encode_jpeg_ycbcr_420(wb * 16, hb * 16, y, cb, cr)


def test_avi_mjpeg_container_roundtrip_bytes_exact():
    frames = [_const_420_frame(40 + 7 * i, 90, 180) for i in range(6)]
    avi = codecs.encode_avi_mjpeg(32, 16, frames)
    d = codecs.decode_avi_mjpeg(avi)
    assert (d["width"], d["height"], d["n_frames"]) == (32, 16, 6)
    assert d["frames"] == frames  # frame payloads survive byte-exactly
    # odd-sized frame exercises the word-alignment padding path
    odd = frames[0] + b"\x00" if len(frames[0]) % 2 == 0 else frames[0]
    avi2 = codecs.encode_avi_mjpeg(32, 16, [odd, frames[1]])
    assert codecs.decode_avi_mjpeg(avi2)["frames"] == [odd, frames[1]]


def test_avi_frame_sampling_decodes_only_sampled_frames():
    import numpy as np

    frames = [_const_420_frame(20 * i, 100, 200) for i in range(5)]
    out = codecs.sample_avi_frames(codecs.encode_avi_mjpeg(32, 16, frames), every_n=2)
    assert [f["frame_idx"] for f in out] == [0, 2, 4]
    for f in out:
        got = np.frombuffer(f["pixels"], dtype=np.uint8).reshape(16, 32, 3)
        yv = np.full((16, 32), 20 * f["frame_idx"], np.uint8)
        up = lambda p: np.repeat(np.repeat(p, 2, 0), 2, 1)  # noqa: E731
        exp = codecs.ycbcr_to_rgb(
            yv, up(np.full((8, 16), 100, np.uint8)), up(np.full((8, 16), 200, np.uint8))
        )
        assert (got == exp).all()


def test_avi_rejects_non_mjpeg_and_truncation():
    frames = [_const_420_frame(99, 128, 128)]
    avi = bytearray(codecs.encode_avi_mjpeg(32, 16, frames))
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_avi_mjpeg(b"RIFX" + bytes(avi[4:]))
    h = avi.find(b"vids") + 4
    other = bytearray(avi)
    other[h : h + 4] = b"H264"  # inter-frame codec: honest boundary
    with pytest.raises(ValueError, match="unsupported video codec"):
        codecs.decode_avi_mjpeg(bytes(other))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_avi_mjpeg(bytes(avi[:-10]))


def test_ima_adpcm_exact_on_representable_delta_class():
    """At step index 0 the representable diffs are exactly {0, ±1, ±3,
    ±4} and their index adjustments keep the index clamped at 0, so a
    waveform restricted to those deltas reconstructs EXACTLY — the q99j
    closed-form-oracle contract."""
    choices = [0, 1, -1, 3, -3, 4, -4]
    deltas = [choices[(11 * j) % 7] for j in range(1009)]
    sig = [0]
    for d in deltas:
        sig.append(sig[-1] + d)
    wav = codecs.encode_wav_ima_adpcm(sig, block_align=256)
    d = codecs.decode_wav_ima_adpcm(wav)
    assert d["samples"][: len(sig)] == sig
    # tail padding holds the last value (encoder pads the final block)
    assert set(d["samples"][len(sig):]) <= {sig[-1]}


def test_ima_adpcm_decode_equals_encoder_reconstruction():
    """The fundamental ADPCM property: the decoder reproduces the
    ENCODER'S tracked reconstruction bit-for-bit on arbitrary signals —
    including step-index motion up and down the full table and int16
    clamping at the rails."""
    import numpy as np

    rng = np.random.RandomState(9)
    sig = np.clip(
        np.cumsum(rng.randint(-9000, 9000, 2000)), -40000, 40000
    ).tolist()  # forces clamping and wide index swings
    wav = codecs.encode_wav_ima_adpcm(sig, block_align=128)
    got = codecs.decode_wav_ima_adpcm(wav)["samples"]

    spb = 1 + (128 - 4) * 2
    recon = []
    for off in range(0, len(sig), spb):
        chunk = sig[off : off + spb]
        if len(chunk) < spb:
            chunk = chunk + [chunk[-1]] * (spb - len(chunk))
        c16 = lambda v: max(-32768, min(32767, int(v)))  # noqa: E731
        pred, idx = c16(chunk[0]), 0
        recon.append(pred)
        for s in chunk[1:]:
            step = codecs.IMA_STEP_TABLE[idx]
            diff = c16(s) - pred
            nib = 0
            if diff < 0:
                nib, diff = 8, -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            pred = codecs._ima_reconstruct(pred, step, nib)
            idx = max(0, min(88, idx + codecs.IMA_INDEX_TABLE[nib]))
            recon.append(pred)
    assert got == recon


def test_ima_adpcm_rejects_stereo_pcm_and_truncation():
    sig = list(range(0, 500, 1))
    wav = bytearray(codecs.encode_wav_ima_adpcm(sig))
    with pytest.raises(ValueError, match="RIFF"):
        codecs.decode_wav_ima_adpcm(b"RIFX" + bytes(wav[4:]))
    fmt_off = bytes(wav).find(b"fmt ") + 8
    pcm = bytearray(wav)
    pcm[fmt_off] = 0x01  # PCM tag
    with pytest.raises(ValueError, match="format tag"):
        codecs.decode_wav_ima_adpcm(bytes(pcm))
    stereo = bytearray(wav)
    stereo[fmt_off + 2] = 2
    with pytest.raises(ValueError, match="mono"):
        codecs.decode_wav_ima_adpcm(bytes(stereo))


def test_decode_audio_dispatches_pcm_and_adpcm():
    from better_cdc_spark import llmops

    pcm = codecs.encode_wav(bytes(range(64)), framerate=8000)
    assert llmops.decode_audio(pcm)["n_frames"] == 64
    adpcm = codecs.encode_wav_ima_adpcm([0, 1, 2, 3] * 200)
    assert llmops.decode_audio(adpcm)["n_samples"] >= 800
    with pytest.raises(NotImplementedError):
        llmops.decode_audio(b"ID3\x04mp3data")


def test_decode_audio_dispatches_au_and_aiff():
    """AU and AIFF route through decode_audio and return the RAW decoder
    dict (samples/frames + framerate), identical to calling the codec
    directly — not a sniff_media-style summary (round-11 advisory: the
    dispatch branches were only ever tested via the codecs directly)."""
    from better_cdc_spark import llmops

    au = codecs.encode_au([0, 100, -100, 5000], encoding=codecs._AU_PCM16)
    via_dispatch = llmops.decode_audio(au)
    assert via_dispatch == codecs.decode_au(au)
    assert via_dispatch["samples"] == [0, 100, -100, 5000]
    assert via_dispatch["framerate"] == 8000

    pcm = struct.pack("<8h", *range(8))
    aiff = codecs.encode_aiff(pcm, framerate=22050, channels=1, sampwidth=2)
    via_dispatch = llmops.decode_audio(aiff)
    assert via_dispatch == codecs.decode_aiff(aiff)
    assert via_dispatch["frames"] == pcm
    assert via_dispatch["n_frames"] == 8


@pytest.mark.parametrize("h,v", [(2, 1), (1, 2), (1, 1)])
def test_jpeg_422_440_444_constant_mcus_roundtrip_exactly(h, v):
    """The generic MCU geometry (spec A.2.3): 4:2:2 (2x1), 4:4:0 (1x2)
    and 4:4:4 (1x1) layouts all decode MCU-constant integer YCbCr
    exactly, with per-component upsampling to the luma grid."""
    import numpy as np

    rng = np.random.RandomState(21)
    mcu_w, mcu_h = 8 * h, 8 * v
    wb, hb = 3, 2  # 3x2 MCUs
    W_, H_ = wb * mcu_w, hb * mcu_h
    yv = rng.randint(0, 256, (hb, wb))
    cbv = rng.randint(0, 256, (hb, wb))
    crv = rng.randint(0, 256, (hb, wb))
    y = np.kron(yv, np.ones((mcu_h, mcu_w), np.int64)).astype(np.uint8)
    cb = np.kron(cbv, np.ones((8, 8), np.int64)).astype(np.uint8)
    cr = np.kron(crv, np.ones((8, 8), np.int64)).astype(np.uint8)
    payload = codecs.encode_jpeg_ycbcr(W_, H_, y, cb, cr, h=h, v=v)
    d = codecs.decode_jpeg_color(payload)
    assert (d["width"], d["height"]) == (W_, H_)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(H_, W_, 3)
    up = lambda p: np.repeat(np.repeat(p, v, 0), h, 1)  # noqa: E731
    exp = codecs.ycbcr_to_rgb(y, up(cb), up(cr))
    assert (got == exp).all()


def test_jpeg_422_general_image_matches_independent_reconstruction():
    """4:2:2 with nonzero AC: decode equals an independent numpy
    reconstruction (per-plane quantized DCT roundtrip + horizontal-only
    chroma upsample + the shared color transform)."""
    import numpy as np

    rng = np.random.RandomState(31)
    H_, W_ = 16, 48
    img = rng.randint(0, 256, (H_, W_, 3)).astype(np.uint8)
    y, cb, cr = codecs.rgb_to_ycbcr(img)
    # horizontal 2:1 box average for 4:2:2 chroma
    box_h = lambda p: codecs._half_up_u8(  # noqa: E731
        (p[:, 0::2].astype(np.float64) + p[:, 1::2].astype(np.float64)) / 2.0
    )
    cb2, cr2 = box_h(cb), box_h(cr)
    payload = codecs.encode_jpeg_ycbcr(W_, H_, y, cb2, cr2, h=2, v=1)
    got = np.frombuffer(
        codecs.decode_jpeg_color(payload)["pixels"], dtype=np.uint8
    ).reshape(H_, W_, 3)

    m = codecs._dct_basis()

    def plane_roundtrip(plane):
        q2d = codecs.DEFAULT_QUANT[codecs.ZIGZAG.argsort()].reshape(8, 8)
        out = np.zeros(plane.shape)
        for by in range(0, plane.shape[0], 8):
            for bx in range(0, plane.shape[1], 8):
                b = plane[by:by + 8, bx:bx + 8].astype(np.float64) - 128
                qc = np.round((m @ b @ m.T) / q2d) * q2d
                out[by:by + 8, bx:bx + 8] = m.T @ qc @ m
        return codecs._half_up_u8(out + 128)

    exp = codecs.ycbcr_to_rgb(
        plane_roundtrip(y),
        np.repeat(plane_roundtrip(cb2), 2, axis=1),
        np.repeat(plane_roundtrip(cr2), 2, axis=1),
    )
    assert (got == exp).all()


def test_jpeg_restart_intervals_decode_identically_and_out_of_sync_raises():
    """DRI/RSTn (spec E.2.4) — what real encoders emit for error
    resilience: byte-aligned restart markers every N MCUs with DC
    predictor resets. A restart stream must decode bit-identically to
    its marker-free sibling; a marker out of sequence must raise."""
    import numpy as np

    rng = np.random.RandomState(41)
    H_, W_ = 32, 64
    img = rng.randint(0, 256, (H_, W_, 3)).astype(np.uint8)
    y, cb, cr = codecs.rgb_to_ycbcr(img)

    def box2(p):
        f = p.astype(np.float64)
        return codecs._half_up_u8(
            (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4.0
        )

    plain = codecs.encode_jpeg_ycbcr(W_, H_, y, box2(cb), box2(cr))
    rst = codecs.encode_jpeg_ycbcr(
        W_, H_, y, box2(cb), box2(cr), restart_interval=2
    )
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert (
        codecs.decode_jpeg_color(rst)["pixels"]
        == codecs.decode_jpeg_color(plain)["pixels"]
    )
    # corrupt the first restart marker's sequence number
    bad = bytearray(rst)
    i = bad.index(b"\xff\xd0", bad.index(b"\xff\xda"))
    bad[i + 1] = 0xD5
    with pytest.raises(ValueError, match="restart marker"):
        codecs.decode_jpeg_color(bytes(bad))


def _boxa(p, rh, rv):
    import numpy as np

    f = p.astype(np.float64)
    out = f.reshape(p.shape[0] // rv, rv, p.shape[1] // rh, rh).mean(axis=(1, 3))
    return codecs._half_up_u8(out)


@pytest.mark.parametrize("h,v,W_,H_", [(2, 2, 32, 32), (2, 1, 48, 16), (1, 1, 24, 24)])
def test_progressive_decodes_identically_to_baseline(h, v, W_, H_):
    """A progressive stream carries the same quantized coefficients as
    the sequential one — multi-scan accumulation (DC approximation +
    refinement, AC bands with EOB runs, AC refinement correction walk)
    must reproduce them exactly, so decoded pixels are bit-identical."""
    import numpy as np

    rng = np.random.RandomState(61 + h * 10 + v)
    img = rng.randint(0, 256, (H_, W_, 3)).astype(np.uint8)
    y, cb, cr = codecs.rgb_to_ycbcr(img)
    cb2, cr2 = _boxa(cb, h, v), _boxa(cr, h, v)
    base = codecs.decode_jpeg_color(
        codecs.encode_jpeg_ycbcr(W_, H_, y, cb2, cr2, h=h, v=v)
    )["pixels"]
    prog = codecs.encode_jpeg_progressive(W_, H_, y, cb2, cr2, h=h, v=v)
    assert prog.count(b"\xff\xda") >= 10  # genuinely multi-scan
    assert codecs.decode_jpeg_progressive(prog)["pixels"] == base
    # the color entry point routes SOF2 itself
    assert codecs.decode_jpeg_color(prog)["pixels"] == base


def test_progressive_alternative_scan_scripts():
    """Spectral-selection-only and deep successive-approximation scripts
    both reconstruct exactly — the scan script is presentation order,
    never information."""
    import numpy as np

    rng = np.random.RandomState(77)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    y, cb, cr = codecs.rgb_to_ycbcr(img)
    cb2, cr2 = _boxa(cb, 2, 2), _boxa(cr, 2, 2)
    base = codecs.decode_jpeg_color(
        codecs.encode_jpeg_ycbcr(32, 32, y, cb2, cr2)
    )["pixels"]
    spectral = (((0, 1, 2), 0, 0, 0, 0), ((0,), 1, 9, 0, 0), ((0,), 10, 63, 0, 0),
                ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0))
    deep = tuple(
        s for a in (3, 2, 1) for s in (
            ((0, 1, 2), 0, 0, a + 1 if a < 3 else 0, a),
            ((0,), 1, 63, a + 1 if a < 3 else 0, a),
            ((1,), 1, 63, a + 1 if a < 3 else 0, a),
            ((2,), 1, 63, a + 1 if a < 3 else 0, a),
        )
    ) + (((0, 1, 2), 0, 0, 1, 0), ((0,), 1, 63, 1, 0),
         ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0))
    for script in (spectral, deep):
        p = codecs.encode_jpeg_progressive(32, 32, y, cb2, cr2, script=script)
        assert codecs.decode_jpeg_progressive(p)["pixels"] == base


def test_progressive_eob_run_and_gradient_stress():
    import numpy as np

    # near-constant image: EOB-run-dominated AC scans
    img = np.full((32, 32, 3), 77, np.uint8)
    img[0, 0] = [200, 10, 10]
    y, cb, cr = codecs.rgb_to_ycbcr(img)
    cb2, cr2 = _boxa(cb, 2, 2), _boxa(cr, 2, 2)
    base = codecs.decode_jpeg_color(codecs.encode_jpeg_ycbcr(32, 32, y, cb2, cr2))["pixels"]
    assert codecs.decode_jpeg_progressive(
        codecs.encode_jpeg_progressive(32, 32, y, cb2, cr2)
    )["pixels"] == base
    # smooth gradient: long zero runs, ZRL + refinement interplay
    gy, gx = np.mgrid[0:64, 0:64]
    img = np.stack([(gx * 3) % 256, (gy * 5) % 256, ((gx + gy) * 2) % 256], -1).astype(np.uint8)
    y, cb, cr = codecs.rgb_to_ycbcr(img)
    cb2, cr2 = _boxa(cb, 2, 2), _boxa(cr, 2, 2)
    base = codecs.decode_jpeg_color(codecs.encode_jpeg_ycbcr(64, 64, y, cb2, cr2))["pixels"]
    assert codecs.decode_jpeg_progressive(
        codecs.encode_jpeg_progressive(64, 64, y, cb2, cr2)
    )["pixels"] == base


def test_g711_value_level_projection_and_known_points():
    """Companding is a projection onto 256 levels: decode∘encode∘decode
    == decode for EVERY byte (value-level — μ-law's two zero codes 0x7F
    and 0xFF both decode to 0, so byte-level idempotence holds for all
    of A-law and all μ-law bytes except the negative zero)."""
    for b in range(256):
        v = codecs.mulaw_decode(b)
        assert codecs.mulaw_decode(codecs.mulaw_encode(v)) == v
        v = codecs.alaw_decode(b)
        assert codecs.alaw_encode(v) == b  # A-law: byte-level projection
    assert codecs.mulaw_decode(0x7F) == 0 and codecs.mulaw_decode(0xFF) == 0
    # spec known points (Sun g711.c): 0xFF is positive zero, 0x00 is the
    # largest-magnitude NEGATIVE sample; sign bit set (post-inversion) = neg
    assert codecs.mulaw_encode(0) == 0xFF and codecs.mulaw_encode(-1) == 0x7F
    assert codecs.mulaw_decode(0x00) == -32124 and codecs.mulaw_decode(0x80) == 32124
    assert codecs.mulaw_encode(-32768) == 0x00 and codecs.mulaw_encode(32767) == 0x80
    assert codecs.alaw_decode(0x55) == -8 and codecs.alaw_decode(0xD5) == 8
    # quantization error is bounded by the segment step everywhere
    import numpy as np

    xs = np.random.RandomState(5).randint(-32768, 32768, 20000)
    for enc, dec in (
        (codecs.mulaw_encode, codecs.mulaw_decode),
        (codecs.alaw_encode, codecs.alaw_decode),
    ):
        for x in xs[:2000]:
            y = dec(enc(int(x)))
            assert abs(y - int(x)) <= max(64, abs(int(x)) / 16 + 64)


def test_g711_wav_roundtrip_and_dispatch():
    from better_cdc_spark import llmops

    data = bytes((i * 7 + 3) % 256 for i in range(512))
    for law in ("mulaw", "alaw"):
        wav = codecs.encode_wav_g711(data, law=law)
        d = llmops.decode_audio(wav)
        assert d["law"] == law and d["n_samples"] == 512
        fn = codecs.mulaw_decode if law == "mulaw" else codecs.alaw_decode
        assert d["samples"] == [fn(b) for b in data]
    with pytest.raises(ValueError, match="G.711"):
        codecs.decode_wav_g711(codecs.encode_wav(bytes(64)))


class TestMpegFrameScan:
    def test_scan_matches_build_parameters(self):
        for d in range(23):
            n, br_idx, sr_idx = 20 + d % 30, 1 + d % 14, d % 3
            payload = codecs.build_mp3_stream(
                n, br_idx, sr_idx, pad_phase=d % 2,
                id3_payload=(d % 5) * 17 if d % 5 else 0,
            )
            m = codecs.scan_mpeg_frames(payload)
            assert m["n_frames"] == n
            assert m["bitrate_kbps"] == codecs._MPEG1_L3_BITRATES[br_idx]
            assert m["sample_rate"] == codecs._MPEG1_SAMPLE_RATES[sr_idx]
            # scanner accounts for every byte in the stream
            assert m["audio_bytes"] + m["id3_bytes"] == len(payload)
            assert m["duration_us"] == n * 1152 * 1_000_000 // m["sample_rate"]

    def test_padding_bit_changes_frame_length(self):
        a = codecs.scan_mpeg_frames(codecs.build_mp3_stream(10, 9, 0, pad_phase=0))
        b = codecs.scan_mpeg_frames(codecs.build_mp3_stream(10, 9, 0, pad_phase=1))
        assert a["audio_bytes"] == b["audio_bytes"]  # 5 padded frames each
        c = codecs.scan_mpeg_frames(codecs.build_mp3_stream(11, 9, 0, pad_phase=1))
        assert c["audio_bytes"] == a["audio_bytes"] + (a["audio_bytes"] // 10) + 1

    @pytest.mark.parametrize(
        "mutate,msg",
        [
            (lambda b: b"\x00" + b[1:], "lost frame sync"),
            (lambda b: b[:-3], "truncated frame"),
            (lambda b: b[:2] + bytes([0xF0 | b[2] & 0x0F]) + b[3:], "reserved"),
        ],
    )
    def test_corruption_raises(self, mutate, msg):
        payload = codecs.build_mp3_stream(5, 9, 0)
        with pytest.raises(ValueError, match=msg):
            codecs.scan_mpeg_frames(mutate(payload))

    def test_id3_skip_and_empty_stream(self):
        with_tag = codecs.build_mp3_stream(3, 5, 1, id3_payload=99)
        assert codecs.scan_mpeg_frames(with_tag)["id3_bytes"] == 109
        with pytest.raises(ValueError, match="no MPEG frames"):
            codecs.scan_mpeg_frames(b"ID3" + bytes((3, 0, 0)) + codecs._syncsafe(0))


class TestOggOpusScan:
    def test_scan_matches_build_parameters(self):
        for d in range(17):
            n = 2 + d % 4
            sizes = [40 + (d + i) % 300 for i in range(n)]
            m = codecs.scan_ogg_opus(codecs.encode_ogg_opus(d, 312 + d % 100, sizes))
            assert m["n_audio_pages"] == n and m["serial"] == d
            assert m["pre_skip"] == 312 + d % 100
            assert m["duration_us"] == n * 960 * 1_000_000 // 48000
            assert m["audio_bytes"] == sum(sizes)

    def test_ogg_crc_is_not_zlib(self):
        import zlib

        blob = bytes(range(256))
        assert codecs._ogg_crc(blob) != zlib.crc32(blob)
        assert codecs._ogg_crc(b"") == 0

    def test_long_packet_uses_255_lacing(self):
        # a 600-byte packet needs lacing [255, 255, 90]
        m = codecs.scan_ogg_opus(codecs.encode_ogg_opus(3, 312, [600]))
        assert m["audio_bytes"] == 600

    @pytest.mark.parametrize(
        "mutate,msg",
        [
            (lambda b: b[:80] + bytes([b[80] ^ 1]) + b[81:], "CRC mismatch"),
            (lambda b: b[:-4], "truncated"),
            (lambda b: b"XggS" + b[4:], "bad page magic"),
        ],
    )
    def test_corruption_raises(self, mutate, msg):
        payload = codecs.encode_ogg_opus(5, 400, [100, 120, 140])
        with pytest.raises(ValueError, match=msg):
            codecs.scan_ogg_opus(mutate(payload))

    def test_missing_eos_raises(self):
        # drop the final page: stream ends without EOS
        payload = codecs.encode_ogg_opus(5, 400, [100, 120])
        last_page = payload.rfind(b"OggS")
        with pytest.raises(ValueError, match="EOS"):
            codecs.scan_ogg_opus(payload[:last_page])


class TestMediaSniff:
    def test_sniffs_every_container(self):
        from better_cdc_spark import llmops

        cases = [
            (codecs.encode_png(4, 2, bytes(8)), "image/png"),
            (codecs.encode_wav(bytes(80)), "audio/wav"),
            (codecs.encode_ppm(2, 2, bytes(12)), "image/ppm"),
            (codecs.encode_jpeg_gray(8, 8, bytes([77] * 64)), "image/jpeg"),
            (
                codecs.encode_gif(2, 2, bytes(4), [(i, i, i) for i in range(4)]),
                "image/gif",
            ),
            (codecs.encode_flac([1, 2, 3, 4] * 30), "audio/flac"),
            (codecs.encode_webp_lossless(2, 2, bytes(range(16))), "image/webp"),
            (codecs.build_mp3_stream(5, 9, 0), "audio/mpeg"),
            (codecs.build_mp3_stream(5, 9, 0, id3_payload=20), "audio/mpeg"),
            (codecs.encode_ogg_opus(1, 312, [40]), "audio/ogg"),
        ]
        for payload, mime in cases:
            assert llmops.sniff_media(payload)["mime"] == mime

    def test_unroutable_raises(self):
        from better_cdc_spark import llmops

        with pytest.raises(ValueError, match="unroutable"):
            llmops.sniff_media(b"\x00\x01\x02garbage")


class TestGifAnimation:
    def test_scan_matches_build(self):
        pal = [(i, i, i) for i in range(4)]
        for d in range(9):
            nf = 2 + d % 4
            frames = [
                (bytes((d + f + i) % 4 for i in range(24)), 5 + (d + f) % 10)
                for f in range(nf)
            ]
            m = codecs.scan_gif_animation(
                codecs.build_animated_gif(6, 4, frames, pal, loop_count=d % 3)
            )
            assert m["n_frames"] == nf and m["loop_count"] == d % 3
            assert m["duration_ms"] == sum(
                10 * (5 + (d + f) % 10) for f in range(nf)
            )

    def test_static_gif_scans_as_single_frame_no_loop(self):
        pal = [(i, i, i) for i in range(4)]
        gif = codecs.encode_gif(4, 2, bytes(8), pal)
        m = codecs.scan_gif_animation(gif)
        assert m["n_frames"] == 1 and m["loop_count"] is None
        assert m["duration_ms"] == 0

    def test_truncation_and_unknown_block_raise(self):
        pal = [(i, i, i) for i in range(4)]
        gif = codecs.build_animated_gif(4, 2, [(bytes(8), 5)], pal)
        with pytest.raises(ValueError, match="without trailer"):
            codecs.scan_gif_animation(gif[:-1])
        with pytest.raises(ValueError, match="unknown GIF block"):
            codecs.scan_gif_animation(gif[:13] + b"\x12" + gif[13:])


class TestBmp:
    def test_roundtrip_padded_and_unpadded_strides(self):
        for w, h in [(3, 2), (4, 3), (5, 1), (1, 4)]:
            rgb = bytes((i * 13 + 7) % 256 for i in range(w * h * 3))
            d = codecs.decode_bmp(codecs.encode_bmp(w, h, rgb))
            assert (d["width"], d["height"], d["pixels"]) == (w, h, rgb)

    def test_topdown_negative_height_decodes(self):
        rgb = bytes(range(4 * 2 * 3))
        p = bytearray(codecs.encode_bmp(4, 2, rgb))
        import struct as _s
        # flip to top-down: negate biHeight and reverse stored row order
        _s.pack_into("<i", p, 22, -2)
        stride = 12
        rows = [bytes(p[54 + i * stride : 54 + (i + 1) * stride]) for i in range(2)]
        p[54:] = rows[1] + rows[0]
        assert codecs.decode_bmp(bytes(p))["pixels"] == rgb

    def test_unsupported_variants_raise(self):
        p = bytearray(codecs.encode_bmp(2, 2, bytes(12)))
        import struct as _s
        bad_depth = bytearray(p); _s.pack_into("<H", bad_depth, 28, 8)
        with pytest.raises(ValueError, match="24bpp BI_RGB only"):
            codecs.decode_bmp(bytes(bad_depth))
        bad_comp = bytearray(p); _s.pack_into("<I", bad_comp, 30, 1)
        with pytest.raises(ValueError, match="24bpp BI_RGB only"):
            codecs.decode_bmp(bytes(bad_comp))
        with pytest.raises(ValueError, match="no BM magic"):
            codecs.decode_bmp(b"XX" + bytes(p[2:]))
        with pytest.raises(ValueError, match="truncated"):
            codecs.decode_bmp(bytes(p[:-8]))


# ---------------------------------------------------------------------------
# QOI (q99ab)
# ---------------------------------------------------------------------------


def test_qoi_roundtrip_all_op_classes():
    """Encoder/decoder round-trip over rasters engineered to exercise
    every op: noise (literal RGB/RGBA), flat (RUN incl. 62-px split),
    gradients (DIFF/LUMA), small palettes (INDEX)."""
    import numpy as np

    from better_cdc_spark.codecs import decode_qoi, encode_qoi

    rng = np.random.default_rng(7)
    for ch in (3, 4):
        for trial in range(16):
            w, h = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            kind = trial % 4
            if kind == 0:
                px = rng.integers(0, 256, size=w * h * ch)
            elif kind == 1:
                px = np.tile(rng.integers(0, 256, size=ch), w * h)
            elif kind == 2:
                px = np.arange(w * h * ch) // ch % 256
            else:
                pal = rng.integers(0, 256, size=(4, ch))
                px = pal[rng.integers(0, 4, size=w * h)].ravel()
            px = px.astype(np.uint8).tobytes()
            dec = decode_qoi(encode_qoi(px, w, h, ch))
            assert dec["pixels"] == px
            assert (dec["width"], dec["height"], dec["channels"]) == (w, h, ch)


def test_qoi_long_run_and_known_stream():
    """A 200-px flat raster must split runs at 62 (0xC0|61 chunks), and a
    hand-assembled spec stream (RGB + RUN + INDEX + DIFF + LUMA) decodes
    to the exact pixel list."""
    from better_cdc_spark.codecs import decode_qoi, encode_qoi

    flat = bytes([10, 20, 30]) * 200
    enc = encode_qoi(flat, 200, 1, 3)
    # literal first pixel, then runs of 62+62+62+13
    assert enc.count(bytes([0xC0 | 61])) == 3
    assert decode_qoi(enc)["pixels"] == flat

    import struct

    stream = bytearray(b"qoif" + struct.pack(">IIBB", 6, 1, 3, 0))
    stream += bytes((0xFE, 100, 150, 200))       # RGB literal
    stream += bytes((0xC0 | 0,))                 # RUN 1 -> repeat
    stream += bytes((0x40 | (3 << 4) | (2 << 2) | 1,))  # DIFF +1,0,-1
    h = (100 * 3 + 150 * 5 + 200 * 7 + 255 * 11) % 64
    stream += bytes((h,))                        # INDEX back to first color
    stream += bytes((0x80 | (10 + 32), ((3 + 8) << 4) | (0 + 8)))  # LUMA dg=10,dr=13,db=10
    stream += bytes((0xC0 | 0,))                 # RUN 1
    stream += b"\x00" * 7 + b"\x01"
    px = decode_qoi(bytes(stream))["pixels"]
    expect = [
        (100, 150, 200), (100, 150, 200), (101, 150, 199),
        (100, 150, 200), (113, 160, 210), (113, 160, 210),
    ]
    assert px == b"".join(bytes(t) for t in expect)


def test_qoi_error_paths_and_sniff():
    """Bad magic / truncation / missing end marker raise; sniff_media
    routes qoif and reports dimensions."""
    import pytest as _pytest

    from better_cdc_spark.codecs import decode_qoi, encode_qoi
    from better_cdc_spark.llmops import sniff_media

    enc = encode_qoi(bytes([1, 2, 3] * 4), 4, 1, 3)
    with _pytest.raises(ValueError):
        decode_qoi(b"nope" + enc[4:])
    with _pytest.raises(ValueError):
        decode_qoi(enc[:-9])  # truncated before the last op
    with _pytest.raises(ValueError):
        decode_qoi(enc[:-8] + b"\x00" * 7 + b"\x02")  # bad end marker
    m = sniff_media(enc)
    assert m["mime"] == "image/qoi" and (m["width"], m["height"]) == (4, 1)


# ---------------------------------------------------------------------------
# Avro Object Container Files (q01e)
# ---------------------------------------------------------------------------


def test_avro_roundtrip_both_codecs():
    """All supported primitives round-trip under deflate and null block
    codecs, across block boundaries, incl. negative longs (zigzag sign),
    unicode strings, and raw bytes."""
    from better_cdc_spark.codecs import decode_avro, encode_avro

    recs = [
        {"id": i, "neg": -i * 7919, "name": f"row-{i}-é", "score": i / 3.0,
         "ok": i % 2 == 0, "blob": bytes([i % 256, (i * 3) % 256])}
        for i in range(2500)
    ]
    fields = [("id", "long"), ("neg", "long"), ("name", "string"),
              ("score", "double"), ("ok", "boolean"), ("blob", "bytes")]
    for codec in ("deflate", "null"):
        dec = decode_avro(encode_avro(recs, fields, codec=codec, rows_per_block=700))
        assert dec["codec"] == codec
        assert dec["fields"] == fields
        assert dec["records"] == recs


def test_avro_zigzag_edge_values():
    """Zigzag varint boundaries: 0, ±1, ±2^31, ±(2^63-1)."""
    from better_cdc_spark.codecs import decode_avro, encode_avro

    vals = [0, 1, -1, 2**31, -(2**31), 2**63 - 1, -(2**63 - 1)]
    recs = [{"v": v} for v in vals]
    dec = decode_avro(encode_avro(recs, [("v", "long")], codec="null"))
    assert [r["v"] for r in dec["records"]] == vals


def test_avro_error_paths():
    """Bad magic, torn sync marker, unsupported codec/schema all raise."""
    import json
    import pytest as _pytest

    from better_cdc_spark.codecs import decode_avro, encode_avro

    enc = encode_avro([{"v": 1}], [("v", "long")])
    with _pytest.raises(ValueError, match="not an Avro"):
        decode_avro(b"Obj\x02" + enc[4:])
    torn = bytearray(enc)
    torn[-1] ^= 0xFF  # corrupt the final sync marker
    with _pytest.raises(ValueError, match="sync marker"):
        decode_avro(bytes(torn))
    with _pytest.raises(ValueError, match="codec"):
        encode_avro([{"v": 1}], [("v", "long")], codec="zstandard")
    # a non-record schema must be refused, not garbled (same-length byte
    # patch so the metadata length prefixes stay valid)
    del json  # patch is byte-level; json import kept the intent visible
    bad = encode_avro([{"v": 1}], [("v", "long")])
    nonrec = bad.replace(b'"type":"record"', b'"type":"recorx"', 1)
    with _pytest.raises(ValueError, match="record schemas"):
        decode_avro(nonrec)


# ---------------------------------------------------------------------------
# Protocol Buffers wire format (qc27)
# ---------------------------------------------------------------------------


def test_protobuf_roundtrip_all_types_and_defaults():
    """All eight wire-typed primitives round-trip; proto3 default-valued
    fields are elided on the wire and restored on decode."""
    from better_cdc_spark.codecs import decode_protobuf, encode_protobuf

    schema = [(1, "id", "uint64"), (2, "delta", "sint64"), (3, "name", "string"),
              (4, "score", "double"), (5, "ok", "bool"), (6, "raw", "bytes"),
              (7, "ts32", "fixed32"), (8, "ts64", "fixed64")]
    for i in range(500):
        msg = {"id": i, "delta": (-1) ** i * i * 7919,
               "name": f"m{i}-é" if i % 3 else "", "score": i / 7.0,
               "ok": i % 2 == 0, "raw": bytes([i % 256]) if i % 5 else b"",
               "ts32": i * 13 % 2**32, "ts64": i * 10**15}
        enc = encode_protobuf(msg, schema)
        assert decode_protobuf(enc, schema) == msg
    # a fully-default message is zero bytes on the wire
    zero = {"id": 0, "delta": 0, "name": "", "score": 0.0, "ok": False,
            "raw": b"", "ts32": 0, "ts64": 0}
    assert encode_protobuf(zero, schema) == b""
    assert decode_protobuf(b"", schema) == zero


def test_protobuf_unknown_field_skipping_and_errors():
    """A reader with a reduced schema skips unknown fields by wire type
    (forward compatibility); a wire-type/schema contradiction raises."""
    import pytest as _pytest

    from better_cdc_spark.codecs import decode_protobuf, encode_protobuf

    writer = [(1, "id", "uint64"), (2, "name", "string"),
              (3, "score", "double"), (9, "blob", "bytes")]
    enc = encode_protobuf(
        {"id": 7, "name": "x", "score": 2.5, "blob": b"zz"}, writer
    )
    reader = [(1, "id", "uint64")]
    assert decode_protobuf(enc, reader) == {"id": 7}
    # declare field 2 as uint64 (wire type 0) though the wire says 2
    with _pytest.raises(ValueError, match="wire type"):
        decode_protobuf(enc, [(2, "name", "uint64")])
    with _pytest.raises(ValueError, match="varint exceeds"):
        decode_protobuf(b"\x08" + b"\xff" * 10 + b"\x01", [(1, "id", "uint64")])


# ---------------------------------------------------------------------------
# Gorilla time-series blocks (q42g)
# ---------------------------------------------------------------------------


def test_gorilla_roundtrip_fuzz():
    """Lossless over irregular deltas, constant runs, window reuse, sign
    flips, 64-bit dod escapes, and empty/singleton series."""
    import random

    from better_cdc_spark.codecs import decode_gorilla, encode_gorilla

    rng = random.Random(9)
    assert decode_gorilla(encode_gorilla([])) == []
    assert decode_gorilla(encode_gorilla([(5, -7)])) == [(5, -7)]
    for trial in range(25):
        n = rng.randint(2, 400)
        t = rng.randint(-10**12, 10**12)
        v = rng.randint(-10**9, 10**9)
        pts = []
        for _ in range(n):
            kind = rng.random()
            t += 1000 if kind < 0.6 else rng.randint(-5000, 500000)
            if kind >= 0.2:
                v = v + rng.randint(-100, 100) if kind < 0.8 else rng.randint(
                    -10**12, 10**12
                )
            pts.append((t, v))
        assert decode_gorilla(encode_gorilla(pts)) == pts, trial


def test_gorilla_compression_ratio_on_regular_series():
    """Regular 1s cadence + small value jitter — the telemetry shape the
    format was designed for — must compress at least 10x (measured ~21x);
    a prefix-code regression shows up as a ratio collapse."""
    from better_cdc_spark.codecs import decode_gorilla, encode_gorilla

    pts = [(1000 * i, 500000 + (i % 7)) for i in range(10000)]
    enc = encode_gorilla(pts)
    assert decode_gorilla(enc) == pts
    assert 16 * len(pts) / len(enc) > 10, f"ratio {16 * len(pts) / len(enc):.1f}"


def test_gorilla_window_reuse_and_escape_paths():
    """Force each value branch: identical (bit '0'), in-window reuse
    ('10'), new window ('11'), and the 64-bit dod escape."""
    from better_cdc_spark.codecs import decode_gorilla, encode_gorilla

    pts = [
        (0, 100), (1000, 100),            # identical value
        (2000, 101), (3000, 102),         # new window then reuse
        (4000, 1 << 40),                  # window change (big jump)
        (4001 + (1 << 40), 1 << 40),      # huge dod -> 64-bit escape
        (4002 + (1 << 40), -5),           # sign flip through XOR
    ]
    assert decode_gorilla(encode_gorilla(pts)) == pts


# ---------------------------------------------------------------------------
# Snappy blocks (Avro's third codec; q01e odd shards)
# ---------------------------------------------------------------------------


def test_snappy_roundtrip_fuzz_and_hand_streams():
    """Round-trip across noise/flat/periodic/text inputs; hand-assembled
    streams pin the 4-byte-offset copy tag and the overlapping (RLE)
    copy the format requires byte-at-a-time semantics for."""
    import random

    from better_cdc_spark.codecs import snappy_compress, snappy_decompress

    rng = random.Random(3)
    for trial in range(40):
        kind = trial % 4
        n = rng.randint(0, 5000)
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes([rng.randrange(4)]) * n
        elif kind == 2:
            data = bytes(rng.randrange(256) for _ in range(max(1, n // 50))) * 50
        else:
            data = ("the quick brown fox " * (n // 10)).encode()[:n]
        assert snappy_decompress(snappy_compress(data)) == data, (trial, kind)
    hand = (bytes([10]) + bytes([3 << 2]) + b"abcd"
            + bytes([3 | ((6 - 1) << 2)]) + (4).to_bytes(4, "little"))
    assert snappy_decompress(hand) == b"abcdabcdab"
    rle = (bytes([9]) + bytes([0 << 2]) + b"x"
           + bytes([2 | ((8 - 1) << 2)]) + (1).to_bytes(2, "little"))
    assert snappy_decompress(rle) == b"x" * 9
    import pytest as _pytest

    with _pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([4]) + bytes([2 | (3 << 2)]) + (9).to_bytes(2, "little"))


def test_avro_snappy_codec_and_crc():
    """Avro snappy blocks carry a big-endian CRC32 of the uncompressed
    data; round trip + corruption detection."""
    import pytest as _pytest

    from better_cdc_spark.codecs import decode_avro, encode_avro

    recs = [{"id": i, "name": f"r{i}"} for i in range(3000)]
    fields = [("id", "long"), ("name", "string")]
    enc = encode_avro(recs, fields, codec="snappy", rows_per_block=800)
    dec = decode_avro(enc)
    assert dec["codec"] == "snappy" and dec["records"] == recs
    bad = bytearray(enc)
    bad[len(enc) // 2] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_avro(bytes(bad))


# ---------------------------------------------------------------------------
# EXIF / TIFF-IFD (q99ae)
# ---------------------------------------------------------------------------


def test_exif_roundtrip_both_byte_orders_and_in_jpeg():
    import numpy as np

    from better_cdc_spark.codecs import (
        decode_exif, encode_exif_app1, encode_jpeg_gray,
    )

    for bo in ("<", ">"):
        app1 = encode_exif_app1(
            {0x0112: 6, 0x0100: 640, 0x0101: 480, 0x010F: "bcs-camera"},
            {0x9003: "2024:05:01 12:00:00", 0x829A: (1, 125)},
            byte_order=bo,
        )
        tags = decode_exif(app1[10:])  # bare TIFF
        assert tags[0x0112] == 6 and (tags[0x0100], tags[0x0101]) == (640, 480)
        assert tags[0x010F] == "bcs-camera"
        assert tags[0x9003] == "2024:05:01 12:00:00"
        assert tags[0x829A] == (1, 125)
        img = np.full((8, 8), 99, dtype=np.uint8)
        jpg = encode_jpeg_gray(8, 8, img.tobytes())
        assert decode_exif(jpg[:2] + app1 + jpg[2:]) == tags


def test_exif_hand_assembled_spec_stream_and_errors():
    """A byte-literal big-endian TIFF (not produced by our encoder) with
    one SHORT inline and one ASCII via offset; plus error paths."""
    import struct

    import pytest as _pytest

    from better_cdc_spark.codecs import decode_exif

    # header: MM, 42, IFD at 8; 2 entries; ASCII 'abcde\0' (6 bytes) at offset
    ifd_entries = (
        struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\x00\x00"
        + struct.pack(">HHI", 0x010F, 2, 6) + struct.pack(">I", 38)
    )
    tiff = (b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 2) + ifd_entries + struct.pack(">I", 0)
            + b"abcde\x00")
    tags = decode_exif(tiff)
    assert tags == {0x0112: 8, 0x010F: "abcde"}
    with _pytest.raises(ValueError, match="byte-order"):
        decode_exif(b"XX" + tiff[2:])
    with _pytest.raises(ValueError, match="no EXIF"):
        decode_exif(b"\xff\xd8\xff\xda\x00\x02")


class TestAdviceR7Regressions:
    """Round-7 advice items: sniff_media JPEG dispatch parity and FLAC
    coded-number minimality."""

    def test_sniff_media_routes_color_and_progressive_jpeg(self):
        import numpy as np

        from better_cdc_spark import llmops

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        color = codecs.encode_jpeg_color_420(16, 16, img.tobytes())
        m = llmops.sniff_media(color)
        assert (m["mime"], m["width"], m["height"]) == ("image/jpeg", 16, 16)
        # cross-check against decode_image's dispatch (the contract: sniff
        # classifies everything decode_image decodes)
        d = llmops.decode_image(color)
        assert m["detail"] == sum(d["pixels"])

        y = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        cb = rng.randint(0, 256, (8, 8)).astype(np.uint8)
        cr = rng.randint(0, 256, (8, 8)).astype(np.uint8)
        prog = codecs.encode_jpeg_progressive(16, 16, y, cb, cr)
        m = llmops.sniff_media(prog)
        assert (m["mime"], m["width"], m["height"]) == ("image/jpeg", 16, 16)
        assert m["detail"] == sum(llmops.decode_image(prog)["pixels"])

    def test_flac_coded_number_is_minimal_at_capacity_boundaries(self):
        # capacity of an n-byte coding is 5n+1 bits; values at exact
        # capacity must NOT spill into an overlong (n+1)-byte coding
        assert len(codecs._utf8_coded_number(0x7F)) == 1
        assert len(codecs._utf8_coded_number(0x80)) == 2
        assert len(codecs._utf8_coded_number(0x7FF)) == 2      # 11 bits
        assert len(codecs._utf8_coded_number(0x800)) == 3
        assert len(codecs._utf8_coded_number(0xFFFF)) == 3     # 16 bits
        assert len(codecs._utf8_coded_number(0x10000)) == 4
        assert len(codecs._utf8_coded_number((1 << 21) - 1)) == 4  # 21 bits
        # round-trip through the reader at every boundary
        for n in (0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
                  (1 << 21) - 1, 1 << 21):
            r = codecs._MSBBitReader(codecs._utf8_coded_number(n))
            assert codecs._read_coded_number(r) == n


def test_tga_roundtrip_rle_raw_and_row_orders():
    """TGA codec paths the registered query doesn't exercise: type-2
    raw, the bottom-up (descriptor bit 5 clear) row order, and the
    honest-seam rejections (bad footer, unsupported depth)."""
    import struct

    import pytest

    from better_cdc_spark.codecs import decode_tga, encode_tga

    for w, h in [(4, 3), (7, 5), (1, 1), (8, 2)]:
        rgb = bytes(
            ((w * h + (q // 3) * 17 + c * 11) % 256)
            for q in range(w * h)
            for c in range(3)
        )
        for rle in (True, False):
            d = decode_tga(encode_tga(w, h, rgb, rle=rle))
            assert (d["width"], d["height"]) == (w, h)
            assert d["pixels"] == rgb

    # bottom-up: flip the descriptor and reorder rows; the decoded
    # image must be identical
    p = bytearray(encode_tga(4, 3, bytes(range(36)), rle=False))
    p[17] = 0x00
    raster = p[18 : 18 + 36]
    rows = [raster[i * 12 : (i + 1) * 12] for i in range(3)]
    p[18 : 18 + 36] = b"".join(reversed(rows))
    assert decode_tga(bytes(p))["pixels"] == bytes(range(36))

    with pytest.raises(ValueError, match="footer"):
        decode_tga(b"\x00" * 64)
    good = bytearray(encode_tga(2, 2, bytes(12), rle=False))
    good[16] = 32  # claim 32bpp
    with pytest.raises(ValueError, match="unsupported TGA"):
        decode_tga(bytes(good))

    # truncated type-10 RLE stream: the codec error contract is
    # ValueError everywhere (sniff_media quarantines on it), never a
    # raw IndexError escaping the packet reader (round-11 advisory)
    from better_cdc_spark.codecs import _TGA_FOOTER

    full = encode_tga(8, 8, bytes(8 * 8 * 3), rle=True)
    body_len = len(full) - len(_TGA_FOOTER)
    for cut in (body_len - 1, 19, 18):  # mid-packet, after 1 byte, empty
        truncated = full[:cut] + _TGA_FOOTER
        with pytest.raises(ValueError, match="truncated TGA RLE"):
            decode_tga(truncated)


def test_pcx_roundtrip_padding_and_rejections():
    """PCX paths beyond the registered query: odd-width even-byte
    padding, the 0xC0-range literal escaped as a run of one, and the
    honest-seam rejections."""
    import pytest

    from better_cdc_spark.codecs import decode_pcx, encode_pcx

    for w, h in [(3, 2), (4, 3), (1, 1), (7, 4)]:
        rgb = bytes(
            ((w * 13 + (q // 2) * 29 + c * 7) % 256)
            for q in range(w * h)
            for c in range(3)
        )
        d = decode_pcx(encode_pcx(w, h, rgb))
        assert (d["width"], d["height"], d["pixels"]) == (w, h, rgb)

    assert decode_pcx(encode_pcx(1, 1, b"\xc5\xc5\xc5"))["pixels"] == b"\xc5\xc5\xc5"

    with pytest.raises(ValueError, match="manufacturer"):
        decode_pcx(b"\x00" * 200)
    bad = bytearray(encode_pcx(2, 2, bytes(12)))
    bad[65] = 1  # claim 1 plane
    with pytest.raises(ValueError, match="unsupported PCX"):
        decode_pcx(bytes(bad))


def test_aiff_f80_rates_and_rejections():
    """AIFF paths beyond the registered query: exotic-but-exact f80
    rates, 8-bit samples (no swap), stereo, and the loud rejections."""
    import pytest

    from better_cdc_spark.codecs import (
        _f80_decode, _f80_encode, decode_aiff, encode_aiff,
    )

    for rate in (1, 7, 8000, 11025, 22050, 44100, 48000, 192000):
        assert _f80_decode(_f80_encode(rate)) == rate

    samples = bytes((i * 13 + 1) % 256 for i in range(34))
    d = decode_aiff(encode_aiff(samples, framerate=22050, channels=1,
                                sampwidth=1))
    assert d["frames"] == samples and d["sampwidth"] == 1

    stereo = bytes(range(40))
    d2 = decode_aiff(encode_aiff(stereo, framerate=44100, channels=2,
                                 sampwidth=2))
    assert d2["frames"] == stereo and d2["channels"] == 2
    assert d2["n_frames"] == 10

    with pytest.raises(ValueError, match="FORM/AIFF"):
        decode_aiff(b"RIFF" + b"\x00" * 40)


def test_ico_roundtrip_and_rejections():
    """ICO paths beyond the registered query: odd mask strides, the
    PNG-embedded-entry seam, and the header rejections."""
    import pytest

    from better_cdc_spark.codecs import PNG_SIG, decode_ico, encode_ico

    for w, h in [(4, 3), (16, 16), (5, 7), (1, 1), (33, 2)]:
        rgb = bytes(
            ((w * h + q * 7 + c * 3) % 256)
            for q in range(w * h)
            for c in range(3)
        )
        d = decode_ico(encode_ico(w, h, rgb))
        assert (d["width"], d["height"], d["pixels"]) == (w, h, rgb)

    with pytest.raises(ValueError, match="ICONDIR"):
        decode_ico(b"\x01\x00\x01\x00" + b"\x00" * 40)

    # a PNG-embedded entry must route loudly, never mis-parse as a DIB
    import struct

    png_body = PNG_SIG + b"\x00" * 32
    header = struct.pack("<HHH", 0, 1, 1)
    entry = struct.pack("<BBBBHHII", 16, 16, 0, 0, 1, 32,
                        len(png_body), 22)
    with pytest.raises(ValueError, match="PNG-embedded"):
        decode_ico(header + entry + png_body)


def test_au_roundtrips_and_rejections():
    """AU paths beyond the registered query: PCM16 exactness,
    annotation-shifted data offsets, and the loud rejections."""
    import pytest

    from better_cdc_spark.codecs import decode_au, encode_au

    sam = [((i * 997 + 13) % 65536) - 32768 for i in range(50)]
    for ann in (b"", b"x", b"meta"):
        d = decode_au(encode_au(sam, encoding=3, framerate=11025,
                                annotation=ann))
        assert d["samples"] == sam and d["framerate"] == 11025

    with pytest.raises(ValueError, match="magic"):
        decode_au(b"RIFF" + b"\x00" * 40)
    import struct

    bad = struct.pack(">4sIIIII", b".snd", 24, 4, 27, 8000, 1) + b"\x00" * 4
    with pytest.raises(ValueError, match="unsupported AU"):
        decode_au(bad)
