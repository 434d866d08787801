"""Pure-stdlib media codecs for the multimodal columns (SURVEY.md §2.8
vision path; task-brief multimodal requirement).

The container has no PIL/ffmpeg, but several formats need no codec
library at all, so for them the decode step is REAL, not stubbed:

- PPM/PGM (P5/P6 binary): header + raw samples — decoded by hand.
- BMP (uncompressed 24/32-bit bottom-up): fixed header layout.
- PNG (COMPLETE: 1/2/4/8/16-bit gray, 8/16-bit RGB/GA/RGBA,
  1/2/4/8-bit palette, sequential or Adam7-interlaced — every
  spec-valid baseline combination): stdlib zlib + the five per-row
  filters (None/Sub/Up/Average/Paeth) unfiltered by hand.
- JPEG (baseline sequential, any sampling, restart intervals): the
  pure-numpy Huffman + IDCT decoder in `functions/jpeg.py`; only
  progressive/arithmetic/12-bit streams remain stubbed.
- GIF (87a/89a, animated): hand-rolled LZW (variable-width codes,
  clear/EOI, KwKwK), global/local palettes, 4-pass interlace, frame
  compositing (offsets, transparency, disposal methods).
- WAV: PCM via stdlib `wave`; G.711 mu-law/A-law via the canonical
  expansion tables (audioop-verified); ADPCM etc. remain stubbed.

Everything returns numpy so the Arrow-batched UDFs in
`operators/multimodal.py` stay vectorized per batch. Formats beyond
these still raise NotImplementedError at the decode step (declared
stub), with the Spark-side plumbing unchanged.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np


# --------------------------------------------------------------- sniffing
def sniff_image_meta(b: bytes | None) -> tuple[int | None, int | None, str | None]:
    """(width, height, format) from the header only — no pixel decode.

    Supports ppm/pgm, bmp, png, gif, jpeg; (None, None, None) for
    null/unknown payloads instead of raising (metadata extraction runs
    over crawled blobs where junk is normal).
    """
    if not b or len(b) < 10:
        return (None, None, None)
    try:
        if b[:2] in (b"P5", b"P6"):
            w, h, _ = _ppm_header(b)[0:3]
            return (w, h, "ppm")
        if b[:2] == b"BM":
            w, h = struct.unpack_from("<ii", b, 18)
            return (w, abs(h), "bmp")
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack_from(">II", b, 16)
            return (w, h, "png")
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", b, 6)
            return (w, h, "gif")
        if b[:2] == b"\xff\xd8":
            return _jpeg_size(b)
    except Exception:
        return (None, None, None)
    return (None, None, None)


def _jpeg_size(b: bytes) -> tuple[int | None, int | None, str | None]:
    """Walk JPEG segment markers to the first SOF frame header."""
    i = 2
    n = len(b)
    while i + 9 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        # JPEG permits any number of 0xFF fill bytes before a marker:
        # skip them, or the marker byte itself reads as 0xFF and the
        # "segment length" is garbage -> bogus width/height returned as
        # valid metadata
        j = i + 1
        while j < n and b[j] == 0xFF:
            j += 1
        if j + 8 >= n:
            break
        marker = b[j]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i = j + 1  # standalone markers carry no length field
            continue
        if marker in (0xD9, 0xDA):
            # EOI / start-of-scan: entropy-coded data follows, no SOF
            # header can legally appear after — stop walking
            break
        seglen = struct.unpack_from(">H", b, j + 1)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", b, j + 4)
            return (w, h, "jpeg")
        i = j + 1 + seglen
    return (None, None, "jpeg")


# ------------------------------------------------------------ image decode
def _ppm_header(b: bytes) -> tuple[int, int, int, int, int]:
    """(width, height, maxval, data_offset, channels) of a binary
    P5 (gray) / P6 (rgb) netpbm payload. Handles comments/whitespace."""
    channels = 3 if b[:2] == b"P6" else 1
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":  # comment to EOL
            while i < len(b) and b[i] not in (10, 13):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if not (0 < maxval < 65536):
        raise ValueError(f"netpbm maxval {maxval} out of range")
    # CRLF-tolerant: the spec allows exactly ONE whitespace byte before
    # the raster, but CRLF writers emit two. A raster may legitimately
    # START with 0x0A, so disambiguate by size: consume the extra '\n'
    # only when the remaining bytes still cover the full raster.
    expected = w * h * channels * (2 if maxval > 255 else 1)
    if (
        b[i - 1 : i] == b"\r"
        and b[i : i + 1] == b"\n"
        and len(b) - (i + 1) >= expected
    ):
        i += 1
    return (w, h, maxval, i, channels)


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_unfilter(
    data: bytes, pos: int, h: int, stride: int, bpp: int
) -> tuple[np.ndarray, int]:
    """Undo the five PNG row filters for `h` scanlines of `stride`
    bytes starting at data[pos]; the left-neighbor offset is `bpp`
    BYTES per the spec (so 16-bit samples filter on their byte halves).
    Returns ((h, stride) int32 array, position after the last line)."""
    if pos + (stride + 1) * h > len(data):
        raise ValueError("png: truncated IDAT stream")
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        flt = data[pos]
        rec = np.frombuffer(data, np.uint8, stride, pos + 1).astype(np.int32)
        pos += stride + 1
        if flt == 1:  # Sub: + left (bpp bytes back)
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif flt == 2:  # Up (vectorized: no intra-row dependency)
            rec = (rec + prev) & 0xFF
        elif flt == 3:  # Average
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif flt == 4:  # Paeth
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[i] = (rec[i] + pred) & 0xFF
        elif flt != 0:
            raise ValueError(f"png: unknown row filter {flt}")
        out[y] = rec
        prev = rec
    return out, pos


def _png_row_stride(w: int, ch: int, depth: int) -> int:
    """Bytes per scanline (sub-byte rows pad to a byte boundary)."""
    return (w * ch * depth + 7) // 8


def _png_rows_to_samples(
    rows: np.ndarray, w: int, ch: int, depth: int
) -> np.ndarray:
    """(h, stride) filtered bytes -> (h, w, ch) int32 samples."""
    h = rows.shape[0]
    if depth == 8:
        return rows.reshape(h, w, ch)
    if depth == 16:  # big-endian byte pairs per sample
        return ((rows[:, 0::2] << 8) | rows[:, 1::2]).reshape(h, w, ch)
    # sub-byte: unpack MSB-first bits, regroup into depth-bit samples,
    # drop the row-padding bits past w*ch samples
    bits = np.unpackbits(rows.astype(np.uint8), axis=1)[:, : w * ch * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(h, w * ch, depth) * weights).sum(axis=2)
    return vals.astype(np.int32).reshape(h, w, ch)


def _png_gray(b: bytes) -> np.ndarray:
    """Stdlib PNG decode to float64 grayscale in [0, 255]: zlib-inflate
    the IDAT stream, undo the five per-row filters, map palette
    indices through PLTE, de-interlace Adam7, average color channels.
    Covers 8- and 16-bit gray / RGB / gray+alpha / RGBA (color types
    0/2/4/6) at depths 8/16, gray additionally at 1/2/4, palette
    (type 3) at 1/2/4/8, sequential or Adam7 — every spec-valid
    baseline combination; NotImplementedError only for spec-invalid
    ones."""
    w, h, depth, color_type = struct.unpack_from(">IIBB", b, 16)
    interlace = b[28]
    # spec-valid combinations: sub-byte depths exist only for gray (0)
    # and palette (3); 16-bit exists for everything except palette
    valid = (
        interlace in (0, 1)
        and (
            (color_type in (0, 3) and depth in (1, 2, 4, 8))
            or (color_type in (0, 2, 4, 6) and depth in (8, 16))
        )
    )
    if not valid:
        raise NotImplementedError(
            f"png depth={depth} color_type={color_type} interlace={interlace}: "
            "not a spec-valid baseline combination"
        )
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, ch * depth // 8)  # filter offset: >= 1 byte per spec
    # chunk walk: length(4) type(4) data payload crc(4)
    idat = []
    plte = None
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        if ctype == b"IDAT":
            idat.append(b[i + 8 : i + 8 + length])
        elif ctype == b"PLTE":
            plte = b[i + 8 : i + 8 + length]
        elif ctype == b"IEND":
            break
        i += 12 + length
    data = zlib.decompress(b"".join(idat))
    if interlace == 0:
        rows, _ = _png_unfilter(data, 0, h, _png_row_stride(w, ch, depth), bpp)
        px = _png_rows_to_samples(rows, w, ch, depth)
    else:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, ch), dtype=np.int32)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines at all
            rows, pos = _png_unfilter(
                data, pos, ph, _png_row_stride(pw, ch, depth), bpp
            )
            px[y0::dy, x0::dx] = _png_rows_to_samples(rows, pw, ch, depth)
    if color_type == 3:
        if plte is None or len(plte) % 3 or not len(plte):
            raise ValueError("png: palette image without a valid PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3).astype(np.int32)
        if px.max(initial=0) >= pal.shape[0]:
            raise ValueError("png: palette index out of range")
        px = pal[px[:, :, 0]]  # (h, w, 3), already 8-bit scale
        color_type, depth = 2, 8
    scale = 255.0 / float((1 << depth) - 1)
    fpx = px.astype(np.float64) * scale
    if color_type in (0, 4):  # gray / gray+alpha: gray channel only
        return fpx[:, :, 0]
    return fpx[:, :, :3].mean(axis=2)  # RGB(A): average color channels


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF-variant LZW: variable 3..12-bit codes, LSB-first packing,
    clear/EOI codes, the KwKwK case. Returns `expected` palette
    indices as uint8."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0
    # bit reader state (LSB-first across the whole data stream)
    acc = 0
    nbits = 0
    pos = 0

    def reset_dict():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset_dict()
    prev: bytes | None = None
    while n_out < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset_dict()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("gif: corrupt LZW code")
        take = min(len(entry), expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if n_out < expected:
        raise ValueError("gif: LZW stream ended before the raster was full")
    return out


def _gif_iter_frames(b: bytes):
    """Yield (delay_centiseconds, (sh, sw, 3) uint8 canvas) per frame
    of a GIF87a/89a, composited per the spec's canvas model: frames
    paint at their left/top offset, graphic-control transparency skips
    pixels of the transparent index, and disposal methods restore the
    background rect (2) or the previous canvas (3) before the next
    frame."""
    sw, sh, flags = struct.unpack_from("<HHB", b, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    background = np.zeros(3, dtype=np.uint8)
    if gct is not None and b[11] < gct.shape[0]:
        background = gct[b[11]]
    canvas = np.broadcast_to(background, (sh, sw, 3)).copy()
    delay, transparent, disposal = 0, None, 0
    saw_frame = False
    while i < len(b):
        blk = b[i]
        if blk == 0x21:  # extension: label + sub-blocks
            label = b[i + 1] if i + 1 < len(b) else 0
            j = i + 2
            first = b[j + 1 : j + 1 + b[j]] if j < len(b) and b[j] else b""
            if label == 0xF9 and len(first) >= 4:  # graphic control
                packed, lo, hi, tidx = first[0], first[1], first[2], first[3]
                delay = lo | (hi << 8)
                transparent = tidx if packed & 1 else None
                disposal = (packed >> 2) & 7
            while j < len(b) and b[j]:
                j += 1 + b[j]
            i = j + 1
        elif blk == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", b, i + 1)
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(b, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            if pal is None:
                raise ValueError("gif: no color table for image")
            min_code = b[i]
            i += 1
            parts = []
            while i < len(b) and b[i]:
                parts.append(b[i + 1 : i + 1 + b[i]])
                i += 1 + b[i]
            i += 1  # block terminator
            idx = _gif_lzw_decode(b"".join(parts), min_code, w * h)
            if idx.max(initial=0) >= pal.shape[0]:
                raise ValueError("gif: palette index out of range")
            rows = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                ordering = np.concatenate(
                    [np.arange(o, h, s) for o, s in ((0, 8), (4, 8), (2, 4), (1, 2))]
                )
                deinter = np.empty_like(rows)
                deinter[ordering] = rows
                rows = deinter
            y1, x1 = min(top + h, sh), min(left + w, sw)
            shown = canvas.copy()
            if top < sh and left < sw:
                clip = rows[: y1 - top, : x1 - left]
                rgb = pal[clip]
                if transparent is not None:
                    keep = clip != transparent
                    region = shown[top:y1, left:x1]
                    region[keep] = rgb[keep]
                else:
                    shown[top:y1, left:x1] = rgb
            saw_frame = True
            yield (delay, shown)
            if disposal == 2:  # restore background in the frame rect
                canvas = shown.copy()
                canvas[top:y1, left:x1] = background
            elif disposal != 3:  # 0/1: frame persists; 3: keep previous
                canvas = shown
            delay, transparent, disposal = 0, None, 0
        elif blk == 0x3B:
            break
        else:
            raise ValueError(f"gif: unexpected block 0x{blk:02x}")
    if not saw_frame:
        raise ValueError("gif: no image frame found")


def parse_gif_frames(b: bytes) -> tuple[float, list[np.ndarray]]:
    """(fps, [composited (sh, sw, 3) uint8 frames]) of an animated (or
    single-frame) GIF; fps from the mean graphic-control delay, 0.0
    when no delay is present."""
    delays = []
    frames = []
    for delay, canvas in _gif_iter_frames(b):
        delays.append(delay)
        frames.append(canvas)
    mean_cs = float(np.mean(delays)) if delays else 0.0
    return (100.0 / mean_cs if mean_cs else 0.0, frames)


def _gif_gray(b: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to float64 gray (mean of
    the palette RGB, matching the PNG-palette convention), composited
    at its left/top offset onto the logical-screen canvas (background-
    color filled) so the result's shape always matches
    sniff_image_meta's screen dims."""
    for _delay, canvas in _gif_iter_frames(b):
        return canvas.astype(np.float64).mean(axis=2)
    raise ValueError("gif: no image frame found")


def decode_image_gray(b: bytes) -> np.ndarray:
    """Decode a PPM/PGM/BMP/PNG/JPEG payload to a float64 grayscale
    (h, w) array in [0, 255]. JPEG decodes to the luma plane (what
    ITU-R 601 gray conversion yields for YCbCr input) via the pure-
    numpy baseline decoder in functions/jpeg.py; GIF first frames via
    hand-rolled LZW. Raises NotImplementedError for the remaining
    declared boundaries (progressive/arithmetic jpeg)."""
    if b[:2] in (b"P5", b"P6"):
        w, h, maxval, off, ch = _ppm_header(b)
        # maxval > 255 means 2 bytes per sample, most significant first
        # (netpbm spec) — decode for real rather than misread 1 byte
        dtype = ">u2" if maxval > 255 else np.uint8
        raw = np.frombuffer(b, dtype=dtype, count=w * h * ch, offset=off)
        arr = raw.reshape(h, w, ch).astype(np.float64) * (255.0 / maxval)
        return arr.mean(axis=2) if ch == 3 else arr[:, :, 0]
    if b[:2] == b"BM":
        data_off = struct.unpack_from("<I", b, 10)[0]
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        compression = struct.unpack_from("<I", b, 30)[0]
        if bpp not in (24, 32) or compression != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        nch = bpp // 8
        stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
        px = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        gray = px[:, :, :3].astype(np.float64).mean(axis=2)  # BGR -> gray
        return gray[::-1] if flip else gray
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_gray(b)
    if b[:2] == b"\xff\xd8":
        from ember_spark.functions.jpeg import decode_jpeg_gray

        return decode_jpeg_gray(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_gray(b)
    raise NotImplementedError(
        "image decode for this format requires codec libs not present "
        "in this container (stdlib path covers ppm/pgm/bmp/png/jpeg/gif)"
    )


def block_mean_resize(arr: np.ndarray, side: int) -> np.ndarray:
    """Resize (h, w) -> (side, side) by block averaging — the
    deterministic, dependency-free stand-in for PIL's resize. Uses a
    nearest-neighbor index grid so any input size maps cleanly."""
    h, w = arr.shape
    yi = (np.arange(side * 4) * h) // (side * 4)
    xi = (np.arange(side * 4) * w) // (side * 4)
    up = arr[np.ix_(yi, xi)]  # (4*side, 4*side) supersample
    return up.reshape(side, 4, side, 4).mean(axis=(1, 3))


# ------------------------------------------------------------ video decode
def parse_avi_mjpeg(b: bytes) -> tuple[float, list[bytes]]:
    """(fps, [jpeg frame bytes, ...]) of an MJPEG AVI container — a
    pure RIFF chunk walk, no codec library. Each returned frame is a
    standalone JPEG that `decode_jpeg_gray` (or PIL) decodes. Raises
    NotImplementedError for non-AVI payloads and for AVI video streams
    whose handler is not MJPG (a compressed codec needs libs this
    container does not have); raises ValueError for a structurally
    broken AVI."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "video decode for this format requires codec libs not present "
            "in this container (stdlib path covers MJPEG AVI)"
        )
    fps = 0.0
    frames: list[bytes] = []
    handler_ok = None

    def walk(start: int, end: int) -> None:
        nonlocal fps, handler_ok
        i = start
        while i + 8 <= end:
            cid = b[i : i + 4]
            (clen,) = struct.unpack_from("<I", b, i + 4)
            body = i + 8
            if cid == b"LIST":
                walk(body + 4, body + clen)  # skip the list type fourcc
            elif cid == b"avih" and clen >= 4:
                (us_per_frame,) = struct.unpack_from("<I", b, body)
                fps = 1e6 / us_per_frame if us_per_frame else 0.0
            elif cid == b"strh" and clen >= 8:
                # gate on the FIRST video stream's handler (stream 00,
                # whose '00dc'/'00db' chunks are the ones collected): a
                # later-stream strh must not overwrite the verdict
                if handler_ok is None and b[body : body + 4] == b"vids":
                    handler_ok = b[body + 4 : body + 8].lower() in (
                        b"mjpg",
                        b"\x00\x00\x00\x00",
                    )
            elif cid[:2] == b"00" and cid[2:4] in (b"dc", b"db"):
                # stream 00 only: a multi-stream AVI's other streams
                # ('01dc', ...) may carry a different codec entirely
                frames.append(b[body : body + clen])
            i = body + clen + (clen & 1)  # chunks are word-aligned

    walk(12, min(struct.unpack_from("<I", b, 4)[0] + 8, len(b)))
    if handler_ok is False:
        raise NotImplementedError(
            "AVI video stream uses a compressed codec handler; stdlib "
            "path covers MJPG only"
        )
    if not frames:
        raise ValueError("avi: no video frames found")
    return (fps, frames)


# ------------------------------------------------------------ audio decode
# G.711 expansion tables, computed once from the canonical formulas:
# mu-law  x = ((mantissa<<3) + 0x84) << exponent, minus bias, signed
# A-law   t = (mantissa<<4) + 8; seg>0: (t + 0x100) << (seg-1), signed
_c = np.arange(256)
_u = (~_c) & 0xFF
_MULAW = (
    ((((_u & 0x0F) << 3) + 0x84) << ((_u >> 4) & 7)) - 0x84
) * np.where(_u & 0x80, -1, 1)
_a = _c ^ 0x55
_t = ((_a & 0x0F) << 4) + 8
_seg = (_a >> 4) & 7
_ALAW = np.where(_seg, (_t + 0x100) << np.maximum(_seg - 1, 0), _t) * np.where(
    _a & 0x80, 1, -1
)
del _c, _u, _a, _t, _seg


def _g711_wav(b: bytes) -> tuple[int, np.ndarray] | None:
    """Manual RIFF walk for G.711 mu-law (fmt 7) / A-law (fmt 6) WAVs —
    stdlib `wave` refuses them. Returns None for other format codes."""
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack_from("<I", b, i + 4)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", b, i + 8)
        elif cid == b"data":
            data = b[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None or fmt[0] not in (6, 7):
        return None
    code, nch, rate = fmt[0], fmt[1], fmt[2]
    lut = _MULAW if code == 7 else _ALAW
    x = lut[np.frombuffer(data, np.uint8)].astype(np.float64) / 32768.0
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return (rate, x)


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, mono float64 samples in [-1, 1]) of a PCM WAV
    payload via stdlib `wave`, or a G.711 mu-law/A-law WAV via the
    expansion tables above. Raises NotImplementedError for other
    encodings (ADPCM, mp3-in-RIFF, ... — the stub boundary)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio decode for this format requires codec libs not present "
            "in this container (stdlib path covers PCM/G.711 wav)"
        )
    try:
        with wave.open(io.BytesIO(b)) as f:
            rate = f.getframerate()
            nch = f.getnchannels()
            width = f.getsampwidth()
            raw = f.readframes(f.getnframes())
    except wave.Error as ex:
        # stdlib wave refuses compressed RIFF/WAVE payloads: G.711
        # expands here; anything else re-raises at the DECLARED stub
        # boundary — a bare wave.Error would be swallowed by feature
        # extractors' generic fallback and silently become zeros
        g711 = _g711_wav(b)
        if g711 is not None:
            return g711
        raise NotImplementedError(
            f"audio decode for this wav encoding needs codec libs not"
            f" present in this container (stdlib wave: {ex})"
        ) from ex
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"wav sample width {width}")
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return (rate, x)


def audio_features(x: np.ndarray, dim: int) -> np.ndarray:
    """Fixed-dim descriptor of a mono signal: `dim - 1` frame RMS
    energies (equal-width frames across the clip) + global
    zero-crossing rate, L2-normalized. Deterministic, numpy-only."""
    nf = max(dim - 1, 1)
    if len(x) == 0:
        return np.zeros(dim)
    edges = (np.arange(nf + 1) * len(x)) // nf
    rms = np.array(
        [
            np.sqrt(np.mean(x[edges[i] : max(edges[i + 1], edges[i] + 1)] ** 2))
            for i in range(nf)
        ]
    )
    zcr = np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))) if len(x) > 1 else 0.0
    v = np.concatenate([rms, [zcr]])[:dim]
    n = np.linalg.norm(v)
    return v / n if n else v


# ------------------------------------------------------------ test payloads
def make_ppm(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 array as binary P6 — the test-side
    generator for real decode coverage."""
    h, w = pixels.shape[:2]
    return b"P6\n# ember test\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def make_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed
    24-bit bottom-up BMP."""
    h, w = pixels.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in pixels[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR
        line += b"\x00" * (stride - len(line))
        raster += line
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return bytes(header) + bytes(raster)


def _png_filter_rows(byte_rows: np.ndarray, bpp: int, filters: str) -> bytearray:
    """Apply PNG row filters to (h, stride) byte values; 'mixed' cycles
    0..4 per row, 'none' emits filter 0 only. The left-neighbor offset
    is `bpp` BYTES (spec), so this serves 8- and 16-bit rasters alike.
    The filter history resets per call — callers emit one call per
    Adam7 pass, matching the decoder's per-pass `prev` reset."""
    h, stride = byte_rows.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        rec = byte_rows[y]
        f = (y % 5) if filters == "mixed" else 0
        enc = rec.copy()
        if f == 1:
            enc[bpp:] = (rec[bpp:] - rec[:-bpp]) & 0xFF
        elif f == 2:
            enc = (rec - prev) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                enc[i] = (rec[i] - ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                enc[i] = (rec[i] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = rec
    return raw


def make_png(
    pixels: np.ndarray,
    filters: str = "mixed",
    depth: int = 8,
    palette: bool = False,
    interlace: int = 0,
) -> bytes:
    """Serialize an (h, w) gray or (h, w, 3) RGB array as a PNG — the
    test-side generator for real decode coverage.

    depth=8 takes uint8 samples, depth=16 uint16 (big-endian on the
    wire); palette=True indexes an (h, w, 3) uint8 image through a PLTE
    built from its unique colors (<= 256 required); interlace=1 emits
    Adam7 passes (each pass filtered independently, like real
    encoders). filters='mixed' cycles the row filter through 0..4 so a
    decoder round-trip exercises every unfilter path."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if palette:
        if gray:
            raise ValueError("palette PNG needs an (h, w, 3) uint8 image")
        flat = pixels.reshape(-1, 3).astype(np.uint8)
        colors, inv = np.unique(
            flat.view([("", np.uint8)] * 3), return_inverse=True
        )
        pal = colors.view(np.uint8).reshape(-1, 3)
        if pal.shape[0] > (1 << depth):
            raise ValueError(
                f"palette PNG at depth {depth} holds {1 << depth} colors, "
                f"got {pal.shape[0]}"
            )
        samples = inv.reshape(h, w, 1).astype(np.int32)
        color_type, ch = 3, 1
    else:
        ch = 1 if gray else 3
        color_type = 0 if gray else 2
        samples = pixels.reshape(h, w, ch).astype(np.int32)
        if depth < 8 and samples.max(initial=0) >= (1 << depth):
            raise ValueError(f"gray samples exceed depth-{depth} range")
    bpp = max(1, ch * depth // 8)

    def pass_bytes(sub: np.ndarray) -> bytearray:
        ph, pw = sub.shape[:2]
        arr = sub.reshape(ph, pw * ch)
        if depth == 16:
            rows = np.empty((ph, pw * ch * 2), dtype=np.int32)
            rows[:, 0::2] = (arr >> 8) & 0xFF
            rows[:, 1::2] = arr & 0xFF
        elif depth < 8:  # pack depth-bit samples MSB-first, pad rows
            bits = ((arr[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(
                ph, -1
            )
            pad = (-bits.shape[1]) % 8
            if pad:
                bits = np.pad(bits, ((0, 0), (0, pad)))
            rows = np.packbits(bits.astype(np.uint8), axis=1).astype(np.int32)
        else:
            rows = arr & 0xFF
        return _png_filter_rows(rows, bpp, filters)

    raw = bytearray()
    if interlace == 0:
        raw += pass_bytes(samples)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += pass_bytes(sub)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette:
        out += chunk(b"PLTE", pal.tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def _gif_palette(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """(palette (n,3) uint8, flat indices, depth) for RGB rows."""
    colors, inv = np.unique(flat.view([("", np.uint8)] * 3), return_inverse=True)
    pal = colors.view(np.uint8).reshape(-1, 3)
    if pal.shape[0] > 256:
        raise ValueError(f"gif limited to 256 colors, got {pal.shape[0]}")
    depth = max((pal.shape[0] - 1).bit_length(), 1)
    return pal, inv.astype(np.uint8), depth


def _gif_lzw_encode(raster: bytes, min_code: int) -> bytes:
    """Spec GIF-LZW compressor (variable code width, clear at
    dictionary capacity) — independent of the decoder's table walk."""
    clear = 1 << min_code
    eoi = clear + 1
    out_codes: list[tuple[int, int]] = []  # (code, width)
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_codes.append((clear, width))
    cur = b""
    for byte in raster:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        out_codes.append((table[cur], width))
        if next_code < 4096:
            table[nxt] = next_code
            # widen when the just-assigned entry is the first that no
            # longer fits the current width: the decoder appends this
            # entry one code later, so its len(table) == 1<<width check
            # fires for exactly the same following code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: clear and restart
            out_codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = bytes([byte])
    if cur:
        out_codes.append((table[cur], width))
    out_codes.append((eoi, width))
    acc = 0
    nbits = 0
    stream = bytearray()
    for code, cw in out_codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def _gif_image_block(
    idx: np.ndarray, min_code: int, left: int, top: int, interlace: bool
) -> bytes:
    """Image descriptor + LZW-coded sub-blocks for an index raster."""
    h, w = idx.shape
    if interlace:
        order = np.concatenate(
            [np.arange(o, h, s) for o, s in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        raster = idx[order].reshape(-1)
    else:
        raster = idx.reshape(-1)
    stream = _gif_lzw_encode(raster.tobytes(), min_code)
    out = bytearray(
        b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
    )
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def make_gif(
    pixels: np.ndarray,
    interlace: bool = False,
    with_extension: bool = False,
    offset: tuple[int, int] = (0, 0),
    screen: tuple[int, int] | None = None,
) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array (<= 256 unique colors) as
    a GIF89a — the test-side generator for real decode coverage.
    interlace=True writes rows in the 4-pass order; with_extension=True
    prepends a no-op graphic-control extension the decoder must skip;
    offset/screen place the frame on a larger logical screen."""
    h, w = pixels.shape[:2]
    pal, inv, depth = _gif_palette(pixels.reshape(-1, 3).astype(np.uint8))
    idx = inv.reshape(h, w)
    padded = np.zeros((1 << depth, 3), np.uint8)
    padded[: pal.shape[0]] = pal
    min_code = max(depth, 2)
    left, top = offset
    sw, sh = screen if screen is not None else (left + w, top + h)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), 0, 0)
    out += padded.tobytes()
    if with_extension:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    out += _gif_image_block(idx, min_code, left, top, interlace)
    out += b"\x3b"
    return bytes(out)


def make_gif_anim(
    frames: list[np.ndarray],
    delays_cs: list[int],
    offsets: list[tuple[int, int]] | None = None,
    disposals: list[int] | None = None,
    transparent_colors: list[tuple[int, int, int] | None] | None = None,
    screen: tuple[int, int] | None = None,
) -> bytes:
    """Serialize (h_i, w_i, 3) uint8 frames as an animated GIF89a with
    one shared global palette (union of all frames' colors, <= 256),
    per-frame graphic-control extensions (delay, disposal method,
    optional transparent color), and per-frame offsets — the test-side
    generator for the animated decode/compositing coverage."""
    n = len(frames)
    offsets = offsets or [(0, 0)] * n
    disposals = disposals or [0] * n
    transparent_colors = transparent_colors or [None] * n
    all_rgb = np.concatenate(
        [f.reshape(-1, 3).astype(np.uint8) for f in frames]
        + [
            np.array([c], np.uint8)
            for c in transparent_colors
            if c is not None
        ]
    )
    pal, _, depth = _gif_palette(all_rgb)
    lut = {tuple(c): i for i, c in enumerate(pal)}
    padded = np.zeros((1 << depth, 3), np.uint8)
    padded[: pal.shape[0]] = pal
    min_code = max(depth, 2)
    if screen is None:
        sw = max(o[0] + f.shape[1] for o, f in zip(offsets, frames))
        sh = max(o[1] + f.shape[0] for o, f in zip(offsets, frames))
    else:
        sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), 0, 0)
    out += padded.tobytes()
    for f, delay, (left, top), disp, tc in zip(
        frames, delays_cs, offsets, disposals, transparent_colors
    ):
        h, w = f.shape[:2]
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3).astype(np.uint8)],
            np.uint8,
        ).reshape(h, w)
        packed = (disp & 7) << 2
        tidx = 0
        if tc is not None:
            packed |= 1
            tidx = lut[tc]
        out += b"\x21\xf9\x04" + bytes(
            [packed, delay & 0xFF, delay >> 8, tidx]
        ) + b"\x00"
        out += _gif_image_block(idx, min_code, left, top, False)
    out += b"\x3b"
    return bytes(out)


def make_avi_mjpeg(frames: list[bytes], fps: float = 25.0) -> bytes:
    """Serialize JPEG frames as a minimal spec-shaped MJPEG AVI (hdrl
    with avih/strh/strf, movi with 00dc chunks, idx1) — the test-side
    generator for real container-parse coverage."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us = int(round(1e6 / fps)) if fps else 0
    avih = struct.pack("<14I", us, 0, 0, 0, len(frames), 0, 1, 0, 0, 0, 0, 0, 0, 0)
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, int(round(fps)), 0, len(frames), 0, 0, -1)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 0, 0, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    payload = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize mono float samples in [-1, 1] as PCM16 WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()
