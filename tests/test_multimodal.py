"""Real multimodal decode (round 3): PPM/BMP image decode, WAV audio
decode and header-sniffed metadata run with ZERO codec libraries —
the declared stub now only covers formats that genuinely need one
(jpeg/png pixels, compressed audio). Reference parity: the vision
matcher's feature extraction surface (`src/models/vision_matcher.py:
33-58`), re-expressed as Arrow-batched UDFs over binary columns."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from ember_spark.functions.codecs import (
    audio_features,
    block_mean_resize,
    decode_image_gray,
    decode_wav,
    make_bmp,
    make_png,
    make_ppm,
    make_wav,
    sniff_image_meta,
)
from ember_spark.operators.multimodal import (
    extract_audio_features,
    extract_image_features,
    extract_image_meta,
    sample_frames,
)


def _pixels(h=12, w=16, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------- pure codecs
def test_ppm_and_bmp_decode_same_pixels():
    px = _pixels()
    g_ppm = decode_image_gray(make_ppm(px))
    g_bmp = decode_image_gray(make_bmp(px))
    assert g_ppm.shape == (12, 16) == g_bmp.shape
    # both grayscales are the channel mean of the SAME rgb content
    assert np.allclose(g_ppm, px.astype(np.float64).mean(axis=2))
    assert np.allclose(g_ppm, g_bmp)


def test_ppm_header_with_comment():
    px = _pixels(3, 2)
    b = b"P6\n# a comment\n# another\n2 3\n255\n" + px.tobytes()
    assert decode_image_gray(b).shape == (3, 2)


def test_ppm_16bit_maxval_decodes_2byte_samples():
    """maxval > 255 means 2 bytes/sample MSB-first (netpbm spec); a
    1-byte read here would silently produce garbage pixels."""
    vals = np.array([[0, 16384], [32768, 65535]], dtype=">u2")  # 2x2 gray
    b = b"P5\n2 2\n65535\n" + vals.tobytes()
    g = decode_image_gray(b)
    assert np.allclose(g, vals.astype(np.float64) * (255.0 / 65535.0))


def test_ppm_crlf_header_raster_not_shifted():
    """CRLF-terminated header: the extra '\\n' must not be consumed as
    the first pixel byte (disambiguated by raster size)."""
    px = _pixels(3, 2)
    crlf = b"P6\r\n2 3\r\n255\r\n" + px.tobytes()
    assert np.allclose(decode_image_gray(crlf), px.astype(np.float64).mean(axis=2))
    # a raster legitimately STARTING with 0x0A after a single-'\r'
    # separator still decodes (size disambiguation keeps the byte)
    px2 = px.copy()
    px2[0, 0] = (0x0A, 5, 7)
    single = b"P6\n2 3\n255\r" + px2.tobytes()
    assert np.allclose(decode_image_gray(single), px2.astype(np.float64).mean(axis=2))


def test_block_mean_resize_constant_regions():
    arr = np.zeros((8, 8))
    arr[:, 4:] = 100.0  # left half 0, right half 100
    out = block_mean_resize(arr, 2)
    assert np.allclose(out[:, 0], 0.0) and np.allclose(out[:, 1], 100.0)


def test_sniff_meta_all_formats():
    px = _pixels(5, 9)
    assert sniff_image_meta(make_ppm(px)) == (9, 5, "ppm")
    assert sniff_image_meta(make_bmp(px)) == (9, 5, "bmp")
    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
    )
    assert sniff_image_meta(png) == (640, 480, "png")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    assert sniff_image_meta(gif) == (320, 200, "gif")
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 9
    )
    assert sniff_image_meta(jpeg) == (640, 480, "jpeg")
    assert sniff_image_meta(b"not an image at all") == (None, None, None)
    assert sniff_image_meta(None) == (None, None, None)


def test_png_decode_roundtrip_all_filters():
    """8-bit non-interlaced PNG decodes in pure stdlib — the encoder
    cycles the row filter through 0..4 so every unfilter path
    (None/Sub/Up/Average/Paeth) is exercised, gray and RGB."""
    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    g = decode_image_gray(make_png(gray, filters="mixed"))
    assert g.shape == (9, 13)
    assert np.array_equal(g, gray.astype(np.float64))
    rgb = _pixels(7, 5, seed=3)
    g2 = decode_image_gray(make_png(rgb, filters="mixed"))
    assert np.allclose(g2, rgb.astype(np.float64).mean(axis=2))
    # filter choice must not change decoded pixels
    assert np.array_equal(
        decode_image_gray(make_png(rgb, filters="none")), g2
    )


def test_png_16bit_roundtrip():
    """16-bit samples filter on their byte halves (bpp=2/6 offsets) and
    scale to the [0, 255] gray contract exactly."""
    rng = np.random.RandomState(17)
    g16 = rng.randint(0, 65536, size=(11, 6), dtype=np.uint16)
    g = decode_image_gray(make_png(g16, filters="mixed", depth=16))
    assert np.allclose(g, g16.astype(np.float64) * 255.0 / 65535.0)
    rgb16 = rng.randint(0, 65536, size=(5, 9, 3), dtype=np.uint16)
    g2 = decode_image_gray(make_png(rgb16, filters="mixed", depth=16))
    assert np.allclose(
        g2, rgb16.astype(np.float64).mean(axis=2) * 255.0 / 65535.0
    )


def test_png_palette_roundtrip():
    """Palette (color type 3) indices map through PLTE back to the
    exact source colors."""
    rng = np.random.RandomState(23)
    pal = rng.randint(0, 256, size=(200, 3), dtype=np.uint8)
    idx = rng.randint(0, 200, size=(13, 7))
    rgb = pal[idx]
    g = decode_image_gray(make_png(rgb, filters="mixed", palette=True))
    assert np.allclose(g, rgb.astype(np.float64).mean(axis=2))
    # a palette image whose PLTE chunk is missing is corrupt, not a stub
    b = make_png(rgb, palette=True)
    plte_at = b.find(b"PLTE") - 4
    plte_len = struct.unpack_from(">I", b, plte_at)[0]
    broken = b[:plte_at] + b[plte_at + 12 + plte_len :]
    with pytest.raises(ValueError):
        decode_image_gray(broken)


def test_png_adam7_matches_sequential():
    """Adam7-interlaced decode reassembles the same pixels the
    sequential encoding of the same image yields — all five filters,
    8- and 16-bit, including dims not divisible by 8 (empty passes)."""
    rng = np.random.RandomState(29)
    for shape, depth, dtype in [
        ((9, 13), 8, np.uint8),
        ((16, 16, 3), 8, np.uint8),
        ((7, 3), 16, np.uint16),
        ((1, 1), 8, np.uint8),  # only pass 1 is non-empty
    ]:
        px = rng.randint(0, 2 ** (depth * 2), size=shape).astype(dtype)
        seq = decode_image_gray(make_png(px, filters="mixed", depth=depth))
        adam = decode_image_gray(
            make_png(px, filters="mixed", depth=depth, interlace=1)
        )
        assert np.array_equal(seq, adam), (shape, depth)
    # truncated interlaced stream is corrupt data, not a stub
    full = make_png(rng.randint(0, 256, (12, 12), np.uint8), interlace=1)
    idat_at = full.find(b"IDAT") - 4
    idat_len = struct.unpack_from(">I", full, idat_at)[0]
    payload = zlib.decompress(full[idat_at + 8 : idat_at + 8 + idat_len])
    short = zlib.compress(payload[: len(payload) // 2])
    broken = (
        full[:idat_at]
        + struct.pack(">I", len(short))
        + b"IDAT"
        + short
        + struct.pack(">I", zlib.crc32(b"IDAT" + short) & 0xFFFFFFFF)
        + full[idat_at + 12 + idat_len :]
    )
    with pytest.raises(ValueError):
        decode_image_gray(broken)


def test_gif_lzw_roundtrip_exact():
    """GIF LZW decode is exact (lossless format): plain, interlaced,
    and extension-prefixed streams all reproduce mean-of-palette-RGB,
    including an image large enough to push the code width through
    several increments."""
    from ember_spark.functions.codecs import make_gif

    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (200, 3), np.uint8)
    rgb = pal[rng.randint(0, 200, (31, 23))]
    want = rgb.astype(np.float64).mean(axis=2)
    for interlace in (False, True):
        for ext in (False, True):
            b = make_gif(rgb, interlace=interlace, with_extension=ext)
            assert np.array_equal(decode_image_gray(b), want), (interlace, ext)
    assert sniff_image_meta(make_gif(rgb)) == (23, 31, "gif")
    # dictionary growth through multiple width bumps (and, at this
    # size, the 4096-entry clear/restart path)
    big = pal[rng.randint(0, 200, (120, 150))]
    assert np.array_equal(
        decode_image_gray(make_gif(big)), big.astype(np.float64).mean(axis=2)
    )
    # 2-color palette: min code size clamps to 2 per the spec
    two = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)[
        rng.randint(0, 2, (9, 5))
    ]
    assert np.array_equal(
        decode_image_gray(make_gif(two, interlace=True)),
        two.astype(np.float64).mean(axis=2),
    )


def test_gif_truncation_is_corrupt_not_stub():
    from ember_spark.functions.codecs import make_gif

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    b = make_gif(pal[rng.randint(0, 16, (20, 20))])
    with pytest.raises(ValueError):
        decode_image_gray(b[: int(len(b) * 0.5)])


def test_jpeg_solid_block_decodes_to_analytic_dc():
    """A solid 8x8 image has ONLY a DC coefficient: the decoded value
    is computed here from the spec formulas (level shift, S00 = 8*(v -
    128), quantize, dequantize, IDCT constant = S00/8 + 128), NOT by
    running the encoder's transform — so a compensating encoder/decoder
    bug (e.g. a shared wrong zigzag) cannot cancel out."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    for v, quality in [(200, 1), (37, 9), (128, 5), (255, 7), (0, 3)]:
        img = np.full((8, 8), v, np.uint8)
        q00 = 1  # the ramp's DC step is 1 at every quality
        expected = np.clip(round(8 * (v - 128) / q00) * q00 / 8 + 128, 0, 255)
        d = decode_jpeg_gray(make_jpeg(img, quality=quality))
        assert d.shape == (8, 8)
        assert np.allclose(d, expected), (v, quality)


def test_jpeg_single_basis_function_roundtrip():
    """A pixel pattern proportional to one DCT basis function excites
    exactly one AC coefficient — exercising the run-length/EOB path
    with an analytically simple target."""
    from ember_spark.functions.jpeg import _A, decode_jpeg_gray, make_jpeg

    basis = np.outer(_A[3], _A[5])  # (v=3, u=5)
    img = np.clip(128 + 400 * basis, 0, 255).astype(np.uint8)
    d = decode_jpeg_gray(make_jpeg(img, quality=1))
    assert np.abs(d - img).max() <= 2.0


def test_jpeg_roundtrip_gray_and_color():
    """quality=1 quantizes every coefficient at step 1, so round-trip
    error is bounded by DCT rounding alone (~1 gray level) — for
    arbitrary images, including dims not divisible by 8/16. Color
    decode targets the LUMA plane (= ITU-R 601 gray)."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (24, 17), np.uint8)
    d = decode_jpeg_gray(make_jpeg(g, quality=1))
    assert d.shape == (24, 17)
    assert np.abs(d - g).max() <= 2.0
    rgb = rng.randint(0, 256, (13, 21, 3), np.uint8)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    d444 = decode_jpeg_gray(make_jpeg(rgb, quality=1))
    assert np.abs(d444 - y).max() <= 2.0
    # 4:2:0: chroma blocks interleave differently in the MCU — the luma
    # result must be unchanged, proving the bitstream stays in sync
    d420 = decode_jpeg_gray(make_jpeg(rgb, quality=1, subsampling="420"))
    assert np.abs(d420 - y).max() <= 2.0
    # coarser quantization still reconstructs a smooth image closely
    grad = np.clip(
        np.add.outer(np.arange(32) * 4, np.arange(32) * 3), 0, 255
    ).astype(np.uint8)
    dq = decode_jpeg_gray(make_jpeg(grad, quality=9))
    assert np.sqrt(np.mean((dq - grad) ** 2)) < 6.0


def test_jpeg_restart_intervals_and_dispatch():
    """DRI/RSTn streams decode identically to unsegmented ones (DC
    predictors reset per interval on both sides), and decode_image_gray
    dispatches jpeg without the PIL opt-in."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    rng = np.random.RandomState(11)
    g = rng.randint(0, 256, (40, 33), np.uint8)
    plain = decode_jpeg_gray(make_jpeg(g, quality=2))
    with_rst = make_jpeg(g, quality=2, restart=3)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    assert np.array_equal(plain, decode_jpeg_gray(with_rst))
    assert np.array_equal(plain, decode_image_gray(make_jpeg(g, quality=2)))
    assert sniff_image_meta(with_rst) == (33, 40, "jpeg")


def test_jpeg_single_component_scan_is_non_interleaved():
    """A single-component scan is non-interleaved per ISO 10918-1
    A.2.2: blocks walk ceil(dim/8) raster order with NO MCU-multiple
    padding, whatever the SOF sampling factors say. A gray JPEG's
    entropy stream is identical for factors 1x1 and 2x2, so patching
    the SOF sampling byte must not change the decode (it used to raise
    'truncated entropy-coded stream' or scramble blocks)."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    rng = np.random.RandomState(21)
    for shape in [(16, 24), (16, 32), (9, 13)]:
        g = rng.randint(0, 256, shape, np.uint8)
        b = make_jpeg(g, quality=1)
        sof = b.find(b"\xff\xc0")
        hv_at = sof + 11  # marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1)
        assert b[hv_at] == 0x11
        patched = b[:hv_at] + b"\x22" + b[hv_at + 1 :]
        assert np.array_equal(decode_jpeg_gray(patched), decode_jpeg_gray(b)), shape


def test_jpeg_dqt_entries_clamped_to_8bit():
    """Baseline DQT entries are 8-bit; the quality ramp must clamp at
    255 so the table quantizing the coefficients IS the table written
    to the stream (an unclamped ramp silently wrapped in the uint8
    emit and reconstructed high frequencies ~24x too small)."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    grad = np.clip(
        np.add.outer(np.arange(24) * 6, np.arange(24) * 4), 0, 255
    ).astype(np.uint8)
    d = decode_jpeg_gray(make_jpeg(grad, quality=40))
    assert np.sqrt(np.mean((d - grad) ** 2)) < 20.0


def test_gif_frame_offset_composites_onto_logical_screen():
    """A first frame smaller than the logical screen, with a left/top
    offset, decodes onto a background-filled canvas whose shape matches
    sniff_image_meta's screen dims (they used to disagree)."""
    from ember_spark.functions.codecs import make_gif

    rng = np.random.RandomState(31)
    pal = rng.randint(0, 256, (8, 3), np.uint8)
    frame = pal[rng.randint(0, 8, (4, 6))]
    b = make_gif(frame, offset=(3, 2), screen=(10, 9))
    assert sniff_image_meta(b) == (10, 9, "gif")
    g = decode_image_gray(b)
    assert g.shape == (9, 10)
    # background = the encoded GIF's palette entry 0 (the encoder
    # palette is np.unique order, not the test's pal order)
    flat = frame.reshape(-1, 3)
    enc_pal = np.unique(flat.view([("", np.uint8)] * 3)).view(np.uint8).reshape(-1, 3)
    bg = enc_pal[0].astype(np.float64).mean()
    want = np.full((9, 10), bg)
    want[2:6, 3:9] = frame.astype(np.float64).mean(axis=2)
    assert np.array_equal(g, want)


def test_jpeg_progressive_and_truncation_boundaries():
    """Progressive (SOF2) stays the declared NotImplementedError
    boundary; a truncated entropy stream is corrupt data
    (ValueError), not a stub."""
    from ember_spark.functions.jpeg import decode_jpeg_gray, make_jpeg

    b = make_jpeg(np.full((8, 8), 90, np.uint8))
    sof_at = b.find(b"\xff\xc0")
    prog = b[:sof_at] + b"\xff\xc2" + b[sof_at + 2 :]
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(prog)
    rng = np.random.RandomState(3)
    full = make_jpeg(rng.randint(0, 256, (32, 32), np.uint8), quality=1)
    with pytest.raises(ValueError):
        decode_jpeg_gray(full[: int(len(full) * 0.6)])


def test_png_subbyte_depths_roundtrip():
    """1/2/4-bit gray and sub-byte palette PNGs decode exactly — bit
    unpacking, row padding, per-depth scaling, and the bpp=1 filter
    offset, sequential and Adam7."""
    rng = np.random.RandomState(37)
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        g = rng.randint(0, maxv + 1, (9, 13)).astype(np.uint8)
        want = g.astype(np.float64) * 255.0 / maxv
        for interlace in (0, 1):
            got = decode_image_gray(
                make_png(g, filters="mixed", depth=depth, interlace=interlace)
            )
            assert np.allclose(got, want), (depth, interlace)
    # 4-bit palette: indices pack two per byte, map through PLTE
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    rgb = pal[rng.randint(0, 16, (7, 11))]
    got = decode_image_gray(make_png(rgb, filters="mixed", depth=4, palette=True))
    assert np.allclose(got, rgb.astype(np.float64).mean(axis=2))


def test_png_spec_invalid_combinations_raise():
    """Combinations the PNG spec forbids (16-bit palette, sub-byte
    RGB, depth 3) stay NotImplementedError, not a wrong decode."""
    px = _pixels(4, 4)
    b = bytearray(make_png(px, palette=True))
    b[24] = 16  # palette + 16-bit: invalid
    with pytest.raises(NotImplementedError):
        decode_image_gray(bytes(b))
    b = bytearray(make_png(px))  # RGB
    b[24] = 4  # RGB + sub-byte: invalid
    with pytest.raises(NotImplementedError):
        decode_image_gray(bytes(b))
    b = bytearray(make_png(px))
    b[24] = 3  # depth 3 does not exist
    with pytest.raises(NotImplementedError):
        decode_image_gray(bytes(b))


def test_jpeg_sniff_skips_fill_bytes_and_stops_at_sos():
    """JPEG permits 0xFF fill bytes before a marker; a padded stream
    must still find SOF0, and a stream whose scan starts before any SOF
    must return None dims rather than garbage."""
    padded = (
        b"\xff\xd8"
        + b"\xff\xff\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 120, 300) + b"\x03" + b"\x00" * 9
    )
    assert sniff_image_meta(padded) == (300, 120, "jpeg")
    # SOS before any SOF: stop walking, no bogus dims from entropy data
    truncated = (
        b"\xff\xd8"
        + b"\xff\xda" + struct.pack(">H", 8) + b"\x00" * 6
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 9, 9) + b"\x03" + b"\x00" * 9
    )
    assert sniff_image_meta(truncated) == (None, None, "jpeg")


def test_wav_roundtrip_and_features():
    t = np.arange(4000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate, x = decode_wav(make_wav(sig, rate=8000))
    assert rate == 8000
    assert len(x) == 4000
    assert np.max(np.abs(x - sig)) < 1e-3  # PCM16 quantization only
    v = audio_features(x, dim=16)
    assert v.shape == (16,)
    assert np.linalg.norm(v) == pytest.approx(1.0)
    # energy frames of a constant-amplitude sine are ~equal; zcr > 0
    assert np.std(v[:15]) < 0.05 * np.mean(v[:15])
    assert v[15] > 0
    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03mp3-ish bytes")


def _g711_wav_bytes(codes: bytes, fmt_code: int, nch: int = 1, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_code, nch, rate, rate * nch, nch, 8)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(codes)) + codes
    if len(codes) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_g711_mulaw_alaw_decode():
    """G.711 mu-law (fmt 7) / A-law (fmt 6) WAVs decode via the
    expansion tables; stdlib audioop (present through 3.12) is the
    independent all-256-codes oracle, with published endpoint values
    pinned directly so the test still bites where audioop is gone."""
    from ember_spark.functions.codecs import _ALAW, _MULAW

    # published endpoints of the canonical tables
    assert _MULAW[0x80] == 32124 and _MULAW[0x00] == -32124
    assert _MULAW[0xFF] == 0 and _MULAW[0x7F] == 0
    assert _ALAW[0xD5] == 8 and _ALAW[0x55] == -8  # A-law has no true 0
    assert _ALAW[0xAA] == 32256 and _ALAW[0x2A] == -32256
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        audioop = None
    codes = bytes(range(256))
    if audioop is not None:
        assert np.array_equal(
            _MULAW, np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
        )
        assert np.array_equal(
            _ALAW, np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
        )
    for fmt_code, lut in ((7, _MULAW), (6, _ALAW)):
        rate, x = decode_wav(_g711_wav_bytes(codes, fmt_code, rate=6000))
        assert rate == 6000
        assert np.array_equal(x, lut.astype(np.float64) / 32768.0)
    # stereo G.711 mixes down like the PCM path
    stereo = bytes(v for pair in zip(codes, codes[::-1]) for v in pair)
    _, xs = decode_wav(_g711_wav_bytes(stereo, 7, nch=2))
    mono = _MULAW.astype(np.float64) / 32768.0
    assert np.allclose(xs, (mono + mono[::-1]) / 2.0)
    # ADPCM (fmt 2) stays the declared boundary
    with pytest.raises(NotImplementedError):
        decode_wav(_g711_wav_bytes(codes, 2))


def test_gif_animation_compositing():
    """Animated GIF frames composite per the spec canvas model: frame
    offsets paint over the prior canvas, transparent-index pixels leave
    it visible, disposal 2 restores background in the frame rect, and
    disposal 3 restores the previous canvas."""
    from ember_spark.functions.codecs import make_gif_anim, parse_gif_frames

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 255, (12, 3), np.uint8)
    f0 = pal[rng.randint(0, 12, (8, 10))]
    f1 = pal[rng.randint(0, 12, (4, 5))]

    fps, frames = parse_gif_frames(make_gif_anim([f0, f0[::-1]], [5, 10]))
    assert fps == pytest.approx(100 / 7.5)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f0) and np.array_equal(frames[1], f0[::-1])

    # offset patch persists (disposal 0)
    _, frames = parse_gif_frames(
        make_gif_anim([f0, f1], [4, 4], offsets=[(0, 0), (2, 3)])
    )
    want = f0.copy()
    want[3:7, 2:7] = f1
    assert np.array_equal(frames[1], want)

    # transparency: transparent-color pixels leave the canvas visible
    tc = (255, 255, 255)
    patch = np.tile(np.array(tc, np.uint8), (4, 5, 1))
    patch[1:3, 1:4] = pal[0]
    _, frames = parse_gif_frames(
        make_gif_anim(
            [f0, patch],
            [4, 4],
            offsets=[(0, 0), (2, 3)],
            transparent_colors=[None, tc],
        )
    )
    want = f0.copy()
    want[4:6, 3:6] = pal[0]
    assert np.array_equal(frames[1], want)

    # disposal 2: the NEXT frame sees background restored in the rect;
    # disposal 3: the next frame sees the canvas from BEFORE this one
    # pin colors so the encoder's palette[0] (the background: the
    # lexicographically smallest color) is black, not solid_b's color
    solid_a = np.tile(np.array([0, 0, 0], np.uint8), (8, 10, 1))
    solid_b = np.tile(np.array([200, 50, 50], np.uint8), (2, 2, 1))
    _, frames = parse_gif_frames(
        make_gif_anim(
            [solid_a, solid_b, solid_b],
            [4, 4, 4],
            offsets=[(0, 0), (1, 1), (5, 5)],
            disposals=[0, 2, 3],
        )
    )
    # frame 1 painted solid_b at (1,1); disposal 2 then restores the
    # background color there, so frame 2's canvas shows background in
    # that rect, not solid_b
    bg = frames[2][1:3, 1:3]
    assert not np.array_equal(bg, solid_b)
    assert (bg == bg[0, 0]).all()  # a flat background fill
    assert np.array_equal(frames[2][5:7, 5:7], solid_b)  # its own paint


def test_avi_mjpeg_container_roundtrip():
    """The RIFF walk recovers the exact frame bytes and fps; non-MJPG
    handlers are the declared boundary; a frameless AVI is corrupt."""
    from ember_spark.functions.codecs import make_avi_mjpeg, parse_avi_mjpeg
    from ember_spark.functions.jpeg import make_jpeg

    frames = [
        make_jpeg(np.full((8, 8), 40 * i + 20, np.uint8), quality=1)
        for i in range(5)
    ]
    avi = make_avi_mjpeg(frames, fps=12.0)
    fps, out = parse_avi_mjpeg(avi)
    assert abs(fps - 12.0) < 0.01
    assert out == frames
    with pytest.raises(NotImplementedError):
        parse_avi_mjpeg(avi.replace(b"vidsMJPG", b"vidsH264"))
    with pytest.raises(NotImplementedError):
        parse_avi_mjpeg(b"\x00\x01mp4-ish bytes" * 4)
    with pytest.raises(ValueError):
        parse_avi_mjpeg(b"RIFF" + struct.pack("<I", 4) + b"AVI ")


# ----------------------------------------------------------- spark surface
def test_extract_video_features_full_dataflow(spark):
    """MJPEG-AVI through the whole Spark dataflow: one Python pass
    splits the container, the JVM keeps every k-th frame, each kept
    frame embeds through the real jpeg decode, a groupBy mean pools
    per video. The pooled vector must equal the hand-computed mean of
    the kept frames' image features — and a junk payload pools NULL."""
    from ember_spark.functions.codecs import make_avi_mjpeg
    from ember_spark.functions.jpeg import make_jpeg
    from ember_spark.operators.multimodal import extract_video_features

    rng = np.random.RandomState(13)
    frames = [
        make_jpeg(rng.randint(0, 256, (16, 16), np.uint8), quality=1)
        for _ in range(6)
    ]
    rows = [
        (0, bytearray(make_avi_mjpeg(frames, fps=10.0))),
        (1, bytearray(b"not a container")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {
        r["id"]: r["video_features"]
        for r in extract_video_features(df, dim=8, every_k=2).collect()
    }
    # expected: frames 0, 2, 4 through the image extractor, averaged
    sub = spark.createDataFrame(
        [(i, bytearray(f)) for i, f in enumerate(frames[::2])],
        "id long, content binary",
    )
    feats = np.stack(
        [
            np.array(r["img_features"])
            for r in extract_image_features(sub, dim=8).collect()
        ]
    )
    assert np.allclose(np.array(got[0]), feats.mean(axis=0), atol=1e-6)
    assert got[1] is None and got[2] is None


def test_video_dataflow_survives_junk_and_undecodable_frames(spark):
    """The NULL-for-junk contract holds for payloads that raise beyond
    ValueError (truncated GIF -> struct.error, corrupt AVI LIST ->
    struct.error), and a parsed container whose frames cannot decode
    (uncompressed-DIB '00db' chunks under a null handler) pools NULL
    instead of failing the stage; foreign-stream '01dc' chunks are
    not collected as frames."""
    from ember_spark.functions.codecs import make_avi_mjpeg, parse_avi_mjpeg
    from ember_spark.functions.jpeg import make_jpeg
    from ember_spark.operators.multimodal import extract_video_features

    rng = np.random.RandomState(41)
    frames = [make_jpeg(rng.randint(0, 256, (8, 8), np.uint8), quality=1)]
    good = make_avi_mjpeg(frames, fps=5.0)
    # a null-handler AVI whose frames are raw DIB pixel bytes parses
    # fine (parse_avi_mjpeg accepts a null handler) but no frame can
    # decode — the pool must skip them all and yield NULL
    dib = make_avi_mjpeg([b"\x12\x34" * 40], fps=5.0).replace(
        b"MJPG", b"\x00\x00\x00\x00"
    )
    rows = [
        (0, bytearray(good)),
        (1, bytearray(b"GIF89a")),  # truncated: struct.error inside
        (2, bytearray(b"RIFF\xff\xff\xff\x7fAVI LIST\xff\xff\xff\x7f")),
        (3, bytearray(dib)),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {
        r["id"]: r["video_features"]
        for r in extract_video_features(df, dim=8, every_k=1).collect()
    }
    assert got[0] is not None
    assert got[1] is None and got[2] is None and got[3] is None
    # multi-stream: frames of stream 01 are not collected. Insert a
    # foreign '01dc' chunk right after the movi fourcc and grow the
    # LIST and RIFF sizes accordingly.
    extra = b"01dc" + struct.pack("<I", 6) + b"foobar"
    movi_at = good.find(b"movi")
    lst_len_at = movi_at - 4
    (old_len,) = struct.unpack_from("<I", good, lst_len_at)
    patched = (
        good[:lst_len_at]
        + struct.pack("<I", old_len + len(extra))
        + good[lst_len_at + 4 : movi_at + 4]
        + extra
        + good[movi_at + 4 :]
    )
    (rl,) = struct.unpack_from("<I", patched, 4)
    patched = patched[:4] + struct.pack("<I", rl + len(extra)) + patched[8:]
    _, out = parse_avi_mjpeg(patched)
    assert out == frames  # the foreign '01dc' chunk is ignored


def test_extract_video_features_from_animated_gif(spark):
    """An animated GIF rides the same video dataflow: the splitter
    re-serializes composited canvases as PPM frames, so the pooled
    vector equals the image features of those canvases averaged."""
    from ember_spark.functions.codecs import make_gif_anim, make_ppm, parse_gif_frames
    from ember_spark.operators.multimodal import extract_video_features

    rng = np.random.RandomState(17)
    pal = rng.randint(0, 256, (10, 3), np.uint8)
    gif = make_gif_anim(
        [pal[rng.randint(0, 10, (12, 12))] for _ in range(4)], [5] * 4
    )
    df = spark.createDataFrame([(0, bytearray(gif))], "id long, content binary")
    got = extract_video_features(df, dim=8, every_k=2).collect()[0]["video_features"]
    canvases = parse_gif_frames(gif)[1][::2]
    sub = spark.createDataFrame(
        [(i, bytearray(make_ppm(c))) for i, c in enumerate(canvases)],
        "id long, content binary",
    )
    feats = np.stack(
        [
            np.array(r["img_features"])
            for r in extract_image_features(sub, dim=8).collect()
        ]
    )
    assert np.allclose(np.array(got), feats.mean(axis=0), atol=1e-6)


def test_extract_image_features_real_decode(spark):
    """Identical RGB content serialized as ppm and bmp must embed to the
    SAME feature vector through the full Spark path — proof the decode
    is real, not a hash of the container bytes."""
    px = _pixels(24, 24, seed=3)
    px2 = _pixels(24, 24, seed=4)
    rows = [
        (0, bytearray(make_ppm(px))),
        (1, bytearray(make_bmp(px))),
        (2, bytearray(make_ppm(px2))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {
        r["id"]: np.array(r["img_features"])
        for r in extract_image_features(df, dim=16).collect()
    }
    assert np.allclose(got[0], got[1], atol=1e-6)  # same pixels, two codecs
    assert not np.allclose(got[0], got[2], atol=1e-2)  # different pixels
    assert np.linalg.norm(got[0]) == pytest.approx(1.0, abs=1e-5)
    assert np.all(got[3] == 0.0)  # null payload -> zero vector


def test_extract_image_meta_spark(spark):
    px = _pixels(6, 8)
    rows = [(0, bytearray(make_ppm(px))), (1, bytearray(b"junk" * 5)), (2, None)]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: (r["width"], r["height"], r["format"])
           for r in extract_image_meta(df).collect()}
    assert got[0] == (8, 6, "ppm")
    assert got[1] == (None, None, None)
    assert got[2] == (None, None, None)


def test_extract_audio_features_spark(spark):
    t = np.arange(2000) / 8000.0
    quiet = 0.1 * np.sin(2 * np.pi * 220 * t)
    loud_half = np.concatenate([np.zeros(1000), 0.9 * np.sin(2 * np.pi * 220 * t[:1000])])
    rows = [(0, bytearray(make_wav(quiet))), (1, bytearray(make_wav(loud_half)))]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r["id"]: np.array(r["audio_features"])
           for r in extract_audio_features(df, dim=8).collect()}
    # driver-side mirror == spark result (determinism through Arrow)
    assert np.allclose(got[0], audio_features(decode_wav(make_wav(quiet))[1], 8), atol=1e-6)
    # the silent-then-loud clip has rising frame energies; the steady one doesn't
    assert got[1][0] < got[1][-2]
    # non-wav bytes raise (stub boundary) without allow_fake
    bad = spark.createDataFrame([(0, bytearray(b"OggS fake"))], "id long, content binary")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_audio_features(bad, dim=8).collect()


def test_sample_frames_jvm_side(spark):
    frames = [bytearray([i]) for i in range(10)]
    df = spark.createDataFrame([(0, frames)], "id long, frames array<binary>")
    out = df.select(sample_frames("frames", 3).alias("kept")).first()["kept"]
    assert [bytes(b)[0] for b in out] == [0, 3, 6, 9]
    # no python evaluator in the plan: pure expression
    plan = df.select(sample_frames("frames", 3))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
