"""Pure-stdlib/numpy baseline JPEG codec (SURVEY.md §2.8 vision path).

Decodes baseline sequential-DCT JPEG (SOF0/SOF1, Huffman-coded, 8-bit
precision, any sampling factors, restart intervals) to the LUMA plane —
the gray projection native to JPEG's YCbCr color space, and exactly
what ITU-R 601 "convert to L" yields for a JPEG input (Y is defined as
0.299R + 0.587G + 0.114B). Chroma blocks are entropy-decoded to keep
the bitstream in sync but never dequantized/IDCT'd — gray extraction
does not need them.

This closes the codec boundary the vision matcher parity target needs
(reference `src/models/vision_matcher.py:33-43` decodes with PIL):
jpeg header sniffing AND pixel decode are now both real without any
codec library. Progressive (SOF2), hierarchical, arithmetic-coded, and
12-bit streams remain the declared NotImplementedError boundary; the
`use_pil` opt-in in operators/multimodal.py stays the production fast
path — this decoder is a per-coefficient Python loop, correct and
deterministic, not libjpeg-fast.

`make_jpeg` is the test-side generator (like make_png/make_ppm): a
baseline encoder with self-built Huffman tables (fixed-length canonical
codes derived from the symbols actually emitted — any spec-valid table
is legal JPEG, and NOT reusing the decoder's table constants keeps the
round-trip an independent check) and a parametric quantization ramp.
"""

from __future__ import annotations

import struct

import numpy as np

# scan order index -> raster index, generated (not typed) to avoid
# constant-transcription errors: diagonal s=row+col walks down-left on
# odd diagonals, up-right on even ones.
_ZIGZAG: list[int] = []
for _s in range(15):
    _pts = [(_s - _j, _j) for _j in range(_s + 1)]  # (row, col) (s,0)->(0,s)
    if _s % 2:
        _pts = _pts[::-1]
    _ZIGZAG.extend(r * 8 + c for r, c in _pts if r < 8 and c < 8)
_UNZIGZAG = np.argsort(np.array(_ZIGZAG))  # raster index -> scan index

# orthonormal DCT-II basis A[u, x] = c_u/2 * cos((2x+1) u pi / 16):
# forward S = A @ s @ A.T, inverse s = A.T @ S @ A — an exact pair.
_A = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2
_A[0] /= np.sqrt(2.0)


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy-coded chunk."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("jpeg: truncated entropy-coded stream")
        v = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(bits: list[int], vals: bytes):
    """Canonical (mincode, maxcode, valptr, vals) per Annex C/F."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        valptr[length] = k
        mincode[length] = code
        code += bits[length - 1]
        k += bits[length - 1]
        maxcode[length] = code - 1 if bits[length - 1] else -1
        code <<= 1
    return (mincode, maxcode, valptr, vals)


def _decode_sym(br: _BitReader, tbl) -> int:
    mincode, maxcode, valptr, vals = tbl
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if code <= maxcode[length]:
            return vals[valptr[length] + code - mincode[length]]
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (spec EXTEND)."""
    if t and v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def _decode_block(br: _BitReader, dc_tbl, ac_tbl, pred: int):
    """One 8x8 block -> (zigzag-order int32[64] coefficients, new DC)."""
    t = _decode_sym(br, dc_tbl)
    dc = pred + (_extend(br.receive(t), t) if t else 0)
    coef = np.zeros(64, dtype=np.int32)
    coef[0] = dc
    k = 1
    while k < 64:
        rs = _decode_sym(br, ac_tbl)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC coefficient index out of range")
        coef[k] = _extend(br.receive(s), s)
        k += 1
    return coef, dc


def _entropy_chunks(b: bytes, start: int) -> list[bytes]:
    """Unstuff the entropy-coded data after SOS; split at RST markers.

    0xFF00 -> literal 0xFF; 0xFF D0-D7 -> chunk boundary; 0xFF D9 (EOI)
    or any other marker ends the scan. Consecutive 0xFF bytes before
    the classifying byte are FILL bytes (ISO 10918-1 B.1.1.2 allows any
    number of them ahead of a marker, and some encoders' bit padding
    emits them before RSTn) — skip to the last one instead of treating
    0xFFFF as end-of-scan, mirroring the fill-byte handling of the main
    marker loop."""
    chunks: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        j = i + 1
        while j < n and b[j] == 0xFF:  # fill bytes
            j += 1
        if j >= n:
            break
        m = b[j]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 1
        elif 0xD0 <= m <= 0xD7:
            chunks.append(bytes(cur))
            cur = bytearray()
            i = j + 1
        else:  # EOI or a stray marker: scan is over
            break
    chunks.append(bytes(cur))
    return chunks


def decode_jpeg_gray(b: bytes) -> np.ndarray:
    """Baseline-JPEG luma decode to float64 (h, w) in [0, 255]."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], object] = {}  # (class 0=DC/1=AC, id)
    restart = 0
    frame = None  # (h, w, [(comp_id, hf, vf, tq), ...])
    scan = None  # ([(comp_index, dc_id, ac_id), ...], data_start)
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        j = i + 1
        while j < n and b[j] == 0xFF:  # fill bytes
            j += 1
        if j + 2 > n:
            break
        marker = b[j]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i = j + 1
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", b, j + 1)
        seg = b[j + 3 : j + 1 + seglen]
        if marker in (0xC0, 0xC1):  # SOF0/1: baseline / extended sequential
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"jpeg precision {prec}: only 8-bit")
            comps = []
            for c in range(nc):  # layout: prec(1) h(2) w(2) nc(1) then 3/comp
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + c * 3)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: progressive/lossless/hierarchical/arithmetic streams "
                "are the declared boundary (baseline sequential only)"
            )
        elif marker == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:  # 16-bit entries
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                qtables[tq] = q  # zigzag order, as stored
        elif marker == 0xC4:  # DHT: one or more tables
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                htables[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            sel = []
            cid_to_idx = {c[0]: k for k, c in enumerate(frame[2])}
            for c in range(ns):
                cs, td_ta = seg[1 + c * 2], seg[2 + c * 2]
                if cs not in cid_to_idx:
                    raise ValueError("jpeg: scan selects unknown component")
                sel.append((cid_to_idx[cs], td_ta >> 4, td_ta & 15))
            scan = (sel, j + 1 + seglen)
            break
        i = j + 1 + seglen
    if frame is None or scan is None:
        raise ValueError("jpeg: no frame/scan found")
    fh, fw, comps = frame
    sel, data_start = scan
    if len(sel) != len(comps):
        raise NotImplementedError("jpeg: multi-scan files (baseline is one scan)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    # luma = the scan's first component; collect only its coefficients
    y_idx = sel[0][0]
    _, yh_f, yv_f, ytq = comps[y_idx]
    # comp plane dims at the component's own resolution (pre-padding)
    yw = -(-fw * yh_f // hmax)
    yhh = -(-fh * yv_f // vmax)
    if len(sel) == 1:
        # a single-component scan is NON-interleaved per ISO 10918-1
        # A.2.2: the MCU is ONE data unit and blocks walk the
        # component's own raster (ceil(plane_dim/8), no MCU-multiple
        # padding) regardless of its sampling factors
        mcux = -(-yw // 8)
        mcuy = -(-yhh // 8)
        yh = yv = 1
        scan_factors = {sel[0][0]: (1, 1)}
    else:
        mcux = -(-fw // (8 * hmax))
        mcuy = -(-fh // (8 * vmax))
        yh, yv = yh_f, yv_f
        scan_factors = {ci: (comps[ci][1], comps[ci][2]) for ci, _, _ in sel}
    chunks = _entropy_chunks(b, data_start)
    br = _BitReader(chunks[0])
    chunk_i = 0
    preds = [0] * len(comps)
    yblocks = np.zeros((mcuy * yv, mcux * yh, 64), dtype=np.int32)
    done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and done and done % restart == 0:
                chunk_i += 1  # RST boundary: byte-align, reset predictors
                if chunk_i >= len(chunks):
                    raise ValueError("jpeg: missing restart interval data")
                br = _BitReader(chunks[chunk_i])
                preds = [0] * len(comps)
            for ci, dc_id, ac_id in sel:
                chf, cvf = scan_factors[ci]
                try:
                    dc_tbl = htables[(0, dc_id)]
                    ac_tbl = htables[(1, ac_id)]
                except KeyError:
                    raise ValueError("jpeg: scan references missing huffman table")
                for by in range(cvf):
                    for bx in range(chf):
                        coef, preds[ci] = _decode_block(br, dc_tbl, ac_tbl, preds[ci])
                        if ci == y_idx:
                            yblocks[my * yv + by, mx * yh + bx] = coef
            done += 1
    if ytq not in qtables:
        raise ValueError("jpeg: luma quantization table missing")
    # dequantize (zigzag order), inverse-zigzag, batch IDCT, assemble
    flat = yblocks.reshape(-1, 64) * qtables[ytq][None, :]
    raster = flat[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
    spatial = np.einsum("vy,nvu,ux->nyx", _A, raster, _A) + 128.0
    by, bx = mcuy * yv, mcux * yh
    plane = (
        spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    )
    plane = np.clip(plane, 0.0, 255.0)
    # crop MCU padding to the plane dims; upsample if luma subsampled
    plane = plane[:yhh, :yw]
    if yh_f != hmax or yv_f != vmax:
        plane = np.repeat(np.repeat(plane, vmax // yv_f, 0), hmax // yh_f, 1)[
            :fh, :fw
        ]
    return plane


# ------------------------------------------------------------ test encoder
class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
        self.acc &= (1 << self.nbits) - 1  # keep the int small

    def flush(self) -> None:
        if self.nbits:
            self.write(0xFF, 8 - self.nbits)  # pad with 1-bits


def _magnitude(x: int) -> tuple[int, int]:
    """(category t, t-bit code) for a DC diff / AC value per spec."""
    t = int(abs(x)).bit_length()
    return (t, x if x >= 0 else x + (1 << t) - 1)


def _fixed_length_table(symbols: set[int]) -> tuple[list[int], bytes]:
    """A valid canonical table giving every used symbol the same code
    length, with the all-ones code left unused (spec requirement)."""
    vals = bytes(sorted(symbols)) or b"\x00"
    length = max((len(vals) + 1 - 1).bit_length(), 1)  # codes 0..n-1, n < 2^L
    bits = [0] * 16
    bits[length - 1] = len(vals)
    return bits, vals


def _encode_codes(vals: bytes, length: int) -> dict[int, tuple[int, int]]:
    return {v: (i, length) for i, v in enumerate(vals)}


def _block_symbols(coef: np.ndarray, pred: int):
    """Zigzag-order quantized block -> [(dc_sym, (t, code))], AC ops."""
    diff = int(coef[0]) - pred
    t, code = _magnitude(diff)
    ops = [("dc", t, code, t)]
    run = 0
    last = 63
    while last > 0 and coef[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ops.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        s, code = _magnitude(v)
        ops.append(("ac", (run << 4) | s, code, s))
        run = 0
    if last < 63:
        ops.append(("ac", 0x00, 0, 0))  # EOB
    return ops, int(coef[0])


def make_jpeg(
    pixels: np.ndarray,
    quality: int = 3,
    subsampling: str = "444",
    restart: int = 0,
) -> bytes:
    """Serialize an (h, w) uint8 gray or (h, w, 3) uint8 RGB array as a
    baseline JPEG — the test-side generator for real decode coverage.

    `quality` is the quantization ramp slope: q[v,u] = 1 + (u+v)*
    (quality-1)//2, so quality=1 quantizes every coefficient at step 1
    (round-trip error bounded by DCT rounding only) and larger values
    coarsen high frequencies like real tables do. subsampling: '444'
    or '420' (RGB only). `restart`>0 emits DRI + RSTn every that many
    MCUs. Huffman tables are built from the emitted symbols, not copied
    from the decoder or Annex K."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    px = pixels.astype(np.float64)
    if gray:
        planes = [px]
        factors = [(1, 1)]
    else:
        r, g, bl = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        if subsampling == "420":
            factors = [(2, 2), (1, 1), (1, 1)]

            def half(p: np.ndarray) -> np.ndarray:
                if p.shape[0] % 2:
                    p = np.vstack([p, p[-1:]])
                if p.shape[1] % 2:
                    p = np.hstack([p, p[:, -1:]])
                return (
                    p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
                ) / 4.0

            planes = [y, half(cb), half(cr)]
        elif subsampling == "444":
            factors = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        else:
            raise ValueError(f"subsampling {subsampling!r}: '444' or '420'")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    step = max(int(quality) - 1, 0) // 2
    uv = np.arange(8)
    # baseline DQT entries are 8-bit: clamp so the table used for
    # quantization IS the table written to the stream (an unclamped
    # ramp above 255 would silently wrap in the uint8 emit and desync
    # encoder and decoder)
    qramp = np.minimum(
        1 + (uv[None, :] + uv[:, None]) * step, 255
    ).astype(np.int32)
    qzz = qramp.reshape(-1)[_ZIGZAG]  # zigzag order, as DQT stores it

    # quantized zigzag coefficient blocks per component
    comp_blocks = []
    for p, (hf, vf) in zip(planes, factors):
        rows, cols = mcuy * vf * 8, mcux * hf * 8
        pad = np.pad(p, ((0, rows - p.shape[0]), (0, cols - p.shape[1])), "edge")
        blocks = (
            pad.reshape(rows // 8, 8, cols // 8, 8).transpose(0, 2, 1, 3) - 128.0
        )
        # coefs' last axes are raster (v, u): quantize with the
        # raster-order ramp, zigzag at emission time
        coefs = np.einsum("vy,rcyx,ux->rcvu", _A, blocks, _A)
        q = np.rint(coefs.reshape(rows // 8, cols // 8, 64) / qramp.reshape(64))
        comp_blocks.append(q.astype(np.int32))
    zz = np.array(_ZIGZAG)

    def mcu_ops():
        """Yield per-MCU lists of (table_key, symbol, code, nbits),
        resetting DC predictors at restart boundaries like the decoder
        will."""
        preds = [0] * len(planes)
        mi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mi and mi % restart == 0:
                    preds = [0] * len(planes)
                mi += 1
                ops = []
                for ci, (hf, vf) in enumerate(factors):
                    tkey = 0 if ci == 0 else 1
                    for by in range(vf):
                        for bx in range(hf):
                            raster = comp_blocks[ci][my * vf + by, mx * hf + bx]
                            coef = raster[zz]  # raster -> zigzag order
                            bops, preds[ci] = _block_symbols(coef, preds[ci])
                            for kind, sym, code, nb in bops:
                                ops.append(((kind, tkey), sym, code, nb))
                yield ops

    # pass 1: collect symbol alphabets per (dc/ac, luma/chroma) table
    alphabets: dict[tuple[str, int], set[int]] = {}
    for ops in mcu_ops():
        for tk, sym, _code, _nb in ops:
            alphabets.setdefault(tk, set()).add(sym)
    tables = {}
    for tk, syms in alphabets.items():
        bits, vals = _fixed_length_table(syms)
        length = next(i + 1 for i, c in enumerate(bits) if c)
        tables[tk] = (bits, vals, _encode_codes(vals, length), length)

    # pass 2: emit
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    ncomp = len(planes)
    ntab = 1 if ncomp == 1 else 2
    for t in range(ntab):
        seg(0xDB, bytes([t]) + qzz.astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (hf, vf) in enumerate(factors):
        sof += bytes([ci + 1, (hf << 4) | vf, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    for (kind, tk), (bits, vals, _codes, _ln) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        seg(0xC4, bytes([(tc << 4) | tk]) + bytes(bits) + vals)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tk = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tk << 4) | tk])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    bw = _BitWriter()
    rst = 0
    for mi, ops in enumerate(mcu_ops()):
        if restart and mi and mi % restart == 0:
            bw.flush()
            out.extend(bw.buf)
            bw = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + rst % 8]))
            rst += 1
        for (kind, tk), sym, code, nb in ops:
            c, ln = tables[(kind, tk)][2][sym]
            bw.write(c, ln)
            if nb:
                bw.write(code, nb)
    bw.flush()
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)
