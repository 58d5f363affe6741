"""JPEG entropy decode — zero dependencies (stdlib + numpy).

Closes the last big multimodal stub (multimodal.py previously parsed
only SOF dimensions): full Huffman DCT decode per ITU-T.81 —
DQT/DHT/SOF/SOS/DRI marker parse, bit-unstuffed entropy decode
(DC diff + AC run/length with ZRL and EOB), dequantize, un-zigzag,
exact float IDCT-II (8×8 basis matmul), sampling-factor block
reassembly, nearest-neighbor chroma upsample, JFIF YCbCr→RGB.
BASELINE (SOF0/1) decodes scan-at-once; PROGRESSIVE (SOF2) accumulates
coefficients across every scan — spectral selection, successive
approximation (DC bit-append, AC ±1<<Al newcomers with interleaved
correction bits, EOB runs; T.81 §G.2) — then transforms once.

Scope is the honest production envelope for a feature-extraction
pipeline: 8-bit DCT (Huffman AND arithmetic entropy coding — SOF9/
SOF10 dispatch to operators/jpeg_arith.py's T.81 Annex D QM-coder),
grayscale or YCbCr with standard sampling factors, restart markers
supported. 12-bit and lossless/hierarchical modes return None — a
real codec's job.
``jpeg_decode_pixels`` never raises on malformed input (executors must
not die on a crafted payload); it returns None.

Spark never sees this module directly — multimodal.decode_features
calls it per payload inside the same Arrow-batched mapInPandas pass as
the PNG path.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# IDCT-II basis: block = A.T @ coef @ A with A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; restart markers are handled by the caller
    re-instantiating at the post-marker offset."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.bit = buf, pos, 0

    def read(self) -> int:
        b = self.buf
        if self.pos >= len(b):
            raise EOFError
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
            if nxt != 0x00:  # a real marker — entropy data ended
                raise EOFError
        v = (byte >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if byte == 0xFF else 0)  # skip the stuffed 0x00
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for restart intervals); returns the
        marker code byte and leaves pos after it."""
        if self.bit:
            self.bit = 0
            self.pos += 1
        b = self.buf
        while self.pos + 1 < len(b):
            if b[self.pos] == 0xFF and b[self.pos + 1] != 0x00:
                code = b[self.pos + 1]
                self.pos += 2
                return code
            self.pos += 1
        raise EOFError


def _extend(v: int, n: int) -> int:
    """T.81 F.2.1.1 sign extension: an n-bit magnitude whose MSB is 0
    encodes a negative value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


class _Huff:
    """Canonical JPEG Huffman table as a (code, length) → symbol map,
    decoded bit-by-bit (tables are ≤ 16 levels deep; payload decode is
    bounded CPU per block, which is all the guard we need)."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.map: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, bits: _Bits) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | bits.read()
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def jpeg_decode_pixels(b: bytes | None, max_pixels: int = 4 << 20):
    """Decode a baseline or progressive JPEG to (h, w, 3) RGB (or
    (h, w, 1) grayscale) uint8, or None for anything outside the
    Huffman-DCT envelope / malformed / over the ``max_pixels`` bomb
    guard."""
    if b is None:
        return None
    b = bytes(b)
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode(b, max_pixels)
    except Exception:  # noqa: BLE001 — malformed payloads yield None, never raise
        return None


def jpeg_decode_coefficients(b: bytes | None, max_pixels: int = 4 << 20):
    """Quantized DCT coefficients of an ARITHMETIC-coded JPEG (SOF9/
    SOF10): {component_index: (block_h, block_w, 64) int32, natural
    order} — the IDCT-independent surface the arithmetic decoder is
    verified on (integer-exact against an independent codec's
    coefficient dump; see tests/fixtures_arith_jpeg.py). None for
    Huffman streams (verified at pixel level instead) or malformed
    input."""
    if b is None:
        return None
    b = bytes(b)
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    try:
        return _decode(b, max_pixels, want="coefs")
    except Exception:  # noqa: BLE001 — malformed payloads yield None, never raise
        return None


def _decode(b: bytes, max_pixels: int, want: str = "pixels"):
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    dac: dict = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        code = b[i + 1]
        if code == 0xD9:  # EOI before SOS
            return None
        if code == 0x01 or 0xD0 <= code <= 0xD7:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
        seg = b[i + 4 : i + 2 + seg_len]
        if code == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:  # 16-bit tables: not baseline
                    return None
                qt[tid] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                p += 65
        elif code == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = seg[p + 1 : p + 17]
                n = sum(counts)
                table = _Huff(counts, seg[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                p += 17 + n
        elif code in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 Huffman sequential, SOF2 Huffman progressive,
            # SOF9/SOF10 the arithmetic twins (operators/jpeg_arith.py)
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8 or h == 0 or w == 0 or ncomp not in (1, 3):
                return None
            if h * w > max_pixels:
                return None
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "q": qid})
            frame = {
                "h": h,
                "w": w,
                "comps": comps,
                "progressive": code in (0xC2, 0xCA),
                "arith": code in (0xC9, 0xCA),
            }
        elif code == 0xCC:  # DAC: arithmetic conditioning
            from laygo_python_spark.operators.jpeg_arith import _parse_dac

            _parse_dac(seg, dac)
        elif 0xC3 <= code <= 0xCF and code != 0xC8:
            return None  # lossless/hierarchical/12-bit — out of scope
        elif code == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif code == 0xDA:  # SOS
            if frame is None:
                return None
            if want == "coefs" and not frame["arith"]:
                return None  # coefficient API is the arith-verification surface
            if frame["arith"]:
                from laygo_python_spark.operators import jpeg_arith

                if frame["progressive"]:
                    return jpeg_arith.decode_progressive(
                        b, i, qt, frame, dac, restart_interval, want
                    )
                ns = seg[0]
                sel = {}
                for c in range(ns):
                    cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                    sel[cid] = (tabs >> 4, tabs & 0xF)
                return jpeg_arith.decode_sequential(
                    b, i + 2 + seg_len, frame, sel, qt, dac, restart_interval, want
                )
            if frame["progressive"]:
                return _progressive(b, i, qt, huff_dc, huff_ac, frame, restart_interval)
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0xF)
            return _scan(
                b, i + 2 + seg_len, frame, sel, qt, huff_dc, huff_ac, restart_interval
            )
        i += 2 + seg_len
    return None


def _ac_first(blk, ac, bits, ss, se, al, eobrun):
    """One block of an AC first scan (T.81 G.1.2.2): run/size pairs with
    EOBn codes encoding runs of end-of-band blocks. Returns the EOB-run
    REMAINING after this block."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac.decode(bits)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += bits.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC coefficient index past band end")
        blk[k] = _extend(bits.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(blk, ac, bits, ss, se, al, eobrun):
    """One block of an AC refinement scan (T.81 G.2 / the classic
    decode_mcu_AC_refine shape): newly-nonzero coefficients arrive as
    ±1<<Al placed after skipping ``r`` zero-HISTORY positions, while
    every nonzero-history coefficient passed on the way (and the whole
    band tail under an EOB run) absorbs one correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac.decode(bits)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += bits.receive(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                val = p1 if bits.read() else m1
            while k <= se:
                if blk[k] != 0:
                    if bits.read() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0 and bits.read() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(b, pos):
    """(code, pos_after) of the next real marker at/after ``pos`` —
    skips entropy bytes, stuffed 0xFF00 and fill 0xFFs."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF and b[pos + 1] not in (0x00, 0xFF):
            return b[pos + 1], pos + 2
        pos += 1
    raise EOFError


def _progressive(b, i, qt, huff_dc, huff_ac, frame, restart_interval):
    """Progressive (SOF2) decode: loop over every scan, accumulating
    DCT coefficients per component (zigzag order) through spectral
    selection and successive approximation, then dequantize + IDCT +
    assemble once at the end. ``i`` points at the first SOS's 0xFF."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if any(c["hs"] == 0 or c["vs"] == 0 for c in comps):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int32) for c in comps
    ]
    # Non-interleaved scans cover only the component's true block grid
    # (§A.2.2), which can be smaller than the MCU-padded store.
    nbw = [-(-(-(-w * c["hs"] // hmax)) // 8) for c in comps]
    nbh = [-(-(-(-h * c["vs"] // vmax)) // 8) for c in comps]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}

    code = 0xDA  # we are AT the first SOS
    pos = i + 2
    while code != 0xD9:  # EOI
        if code in (0xD0 + j for j in range(8)):
            return None  # stray restart outside a scan
        (seg_len,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + seg_len]
        data_pos = pos + seg_len
        if code == 0xDB:
            p = 0
            while p < len(seg):
                if seg[p] >> 4 != 0:
                    return None
                qt[seg[p] & 0xF] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                p += 65
        elif code == 0xC4:
            p = 0
            while p + 17 <= len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                n = sum(seg[p + 1 : p + 17])
                table = _Huff(seg[p + 1 : p + 17], seg[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = table
                p += 17 + n
        elif code == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif code == 0xDA:
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                if cid not in by_id:
                    return None
                scomps.append((by_id[cid], tabs >> 4, tabs & 0xF))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            data_pos = _progressive_scan(
                b, data_pos, comps, coefs, scomps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval, mcux, mcuy, nbw, nbh,
            )
        code, pos = _next_marker(b, data_pos)
        if 0xD0 <= code <= 0xD7:  # leftover restart at scan end
            code, pos = _next_marker(b, pos)

    # Dequantize + IDCT every block, assemble planes (coefficients are
    # stored in zigzag order; _ZIGZAG maps them to natural positions).
    planes = []
    for ci, c in enumerate(comps):
        if c["q"] not in qt:
            return None
        q = qt[c["q"]]
        byc, bxc = coefs[ci].shape[:2]
        plane = np.zeros((byc * 8, bxc * 8), dtype=np.float64)
        for by in range(byc):
            for bx in range(bxc):
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZIGZAG] = coefs[ci][by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ coef.reshape(8, 8) @ _A + 128.0
                )
        planes.append(plane)
    return _assemble(planes, comps, hmax, vmax, h, w)


def _progressive_scan(
    b, pos, comps, coefs, scomps, ss, se, ah, al,
    huff_dc, huff_ac, restart_interval, mcux, mcuy, nbw, nbh,
):
    """Entropy-decode one progressive scan; returns the offset where the
    scan's entropy data ended."""
    bits = _Bits(b, pos)
    preds = [0] * len(scomps)
    eobrun = 0
    if ss == 0:  # DC scan (interleaved when ns > 1)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        units = mcux * mcuy if len(scomps) > 1 else nbw[scomps[0][0]] * nbh[scomps[0][0]]
    else:
        if len(scomps) != 1:
            raise ValueError("AC scan must be single-component")
        units = nbw[scomps[0][0]] * nbh[scomps[0][0]]
    rst = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            code = bits.align_to_marker()
            if code != 0xD0 + (rst % 8):
                raise ValueError("bad restart marker")
            rst += 1
            bits = _Bits(bits.buf, bits.pos)
            preds = [0] * len(scomps)
            eobrun = 0
        if ss == 0 and len(scomps) > 1:
            my, mx = divmod(u, mcux)
            for si, (ci, dct, _act) in enumerate(scomps):
                c = comps[ci]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = coefs[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                        if ah == 0:
                            t = huff_dc[dct].decode(bits)
                            preds[si] += _extend(bits.receive(t), t)
                            blk[0] = preds[si] << al
                        elif bits.read():
                            blk[0] |= 1 << al
        else:
            ci, dct, act = scomps[0]
            blk = coefs[ci][u // nbw[ci], u % nbw[ci]]
            if ss == 0:
                if ah == 0:
                    t = huff_dc[dct].decode(bits)
                    preds[0] += _extend(bits.receive(t), t)
                    blk[0] = preds[0] << al
                elif bits.read():
                    blk[0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first(blk, huff_ac[act], bits, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(blk, huff_ac[act], bits, ss, se, al, eobrun)
    if bits.bit:
        bits.pos += 1
    return bits.pos


def _scan(b, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        if c["hs"] == 0 or c["vs"] == 0 or c["q"] not in qt:
            return None
        planes.append(np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8), dtype=np.float64))

    bits = _Bits(b, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            code = bits.align_to_marker()
            if not (0xD0 <= code <= 0xD7):
                return None
            bits = _Bits(bits.buf, bits.pos)
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            dc_t, ac_t = sel[c["id"]]
            if dc_t not in huff_dc or ac_t not in huff_ac:
                return None
            q = qt[c["q"]]
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = huff_dc[dc_t].decode(bits)
                    diff = _extend(bits.receive(t), t)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = huff_ac[ac_t].decode(bits)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            return None
                        zz[k] = _extend(bits.receive(s), s)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = zz * q
                    block = _A.T @ coef.reshape(8, 8) @ _A + 128.0
                    y0, x0 = (my * c["vs"] + by) * 8, (mx * c["hs"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # Upsample each component to full MCU-grid resolution, crop to (h, w).
    return _assemble(planes, comps, hmax, vmax, h, w)


def _assemble(planes, comps, hmax, vmax, h, w):
    """Shared decode tail: nearest-neighbor chroma upsample, crop to the
    frame, JFIF YCbCr→RGB (or grayscale passthrough)."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if hmax % c["hs"] or vmax % c["vs"]:
            return None
        p = np.repeat(np.repeat(p, hmax // c["hs"], axis=1), vmax // c["vs"], axis=0)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- Encoder (the write half; promoted from the round-trip test
# harness so MJPG video frames can be produced in-package) ------------


def _flat_huff(symbols: list[int], length: int) -> tuple[bytes, bytes, dict[int, tuple[int, int]]]:
    """Canonical Huffman table giving every symbol the same code
    length — legal per T.81 (the decoder honors whatever DHT ships in
    the file) and trivially collision-free."""
    assert len(symbols) < (1 << length)
    counts = bytearray(16)
    counts[length - 1] = len(symbols)
    enc = {s: (length, i) for i, s in enumerate(symbols)}
    return bytes(counts), bytes(symbols), enc


class _BitW:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 §B.1.1.5)."""

    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def put(self, val: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def pad(self):
        while self.n:
            self.put(1, 1)


_DC_SYMS = list(range(12))
_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]  # incl. EOB(0x00), ZRL(0xF0)


def jpeg_encode(px: np.ndarray, subsample: bool = False, restart: int = 0) -> bytes:
    """Baseline JPEG encoder: grayscale (h,w,1) or RGB (h,w,3); 4:4:4
    or 4:2:0 when ``subsample``; optional DRI restart interval (in
    MCUs). ALL-ONES quantization tables, so the only loss is
    DCT-coefficient rounding — tightly boundable, which is what makes
    the decode round trip assertable (tests/test_jpeg.py) and makes
    UNIFORM frames round-trip exactly (DC-only blocks — the MJPG
    cross-engine gate relies on this). Deterministic output."""
    h, w, nc = px.shape
    dc_counts, dc_syms, dc_enc = _flat_huff(_DC_SYMS, 8)
    ac_counts, ac_syms, ac_enc = _flat_huff(_AC_SYMS, 9)

    if nc == 3:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 + (rgb[:, :, 2] - y) / 1.772
        cr = 128.0 + (rgb[:, :, 0] - y) / 1.402
        chans = [y, cb, cr]
    else:
        chans = [px[:, :, 0].astype(np.float64)]

    if subsample and nc == 3:
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    planes = []
    for ci, ch in enumerate(chans):
        hs, vs = samp[ci]
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        if (hs, vs) != (hmax, vmax):  # box-filter downsample
            fy, fx = vmax // vs, hmax // hs
            ch = ch[: (ch.shape[0] // fy) * fy, : (ch.shape[1] // fx) * fx]
            ch = ch.reshape(ch.shape[0] // fy, fy, ch.shape[1] // fx, fx).mean(axis=(1, 3))
        p = np.zeros((ph, pw))
        p[: ch.shape[0], : ch.shape[1]] = ch
        p[ch.shape[0] :, :] = p[max(ch.shape[0] - 1, 0), :][None, :]
        p[:, ch.shape[1] :] = p[:, max(ch.shape[1] - 1, 0)][:, None]
        planes.append(p)

    def seg(code, payload):
        return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # DQT id 0, all ones
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + dc_counts + dc_syms)
    out += seg(0xC4, bytes([0x10]) + ac_counts + ac_syms)
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitW()
    pred = [0] * nc
    rst = 0

    def _cat(v: int) -> int:
        return 0 if v == 0 else int(v).bit_length()

    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if restart and mcu and mcu % restart == 0:
            bw.pad()
            out += bw.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitW()
            pred = [0] * nc
        my, mx = divmod(mcu, mcux)
        for ci in range(nc):
            hs, vs = samp[ci]
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    block = planes[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coef = _A @ block @ _A.T
                    zz = np.round(coef.reshape(-1)[_ZIGZAG]).astype(np.int64)
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    t = _cat(abs(diff))
                    ln, code = dc_enc[t]
                    bw.put(code, ln)
                    if t:
                        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_enc[0xF0]
                            bw.put(code, ln)
                            run -= 16
                        s = _cat(abs(v))
                        ln, code = ac_enc[(run << 4) | s]
                        bw.put(code, ln)
                        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        ln, code = ac_enc[0x00]
                        bw.put(code, ln)
    bw.pad()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
