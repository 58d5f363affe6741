"""Arithmetic-coded JPEG entropy decode (ITU-T T.81 Annex D QM-coder +
Annex F conditioning) — closes the last image-codec stub in
operators/jpeg.py (its module docstring previously scoped arithmetic
modes out): SOF9 (extended sequential) and SOF10 (progressive) streams
now decode end-to-end with zero dependencies.

Implementation is from the public T.81 flowcharts:

* ``_ArithDecoder`` — the QM-coder decode side (D.2): DECODE with
  conditional MPS/LPS exchange (Figures D.17-D.19), RENORM_D (D.20),
  INITDEC/BYTEIN (D.24-D.25) with 0xFF00 byte unstuffing and
  1-bit padding past the terminating marker.
* ``_QE`` — Table D.3 (Qe, NMPS, NLPS, SWITCH), 113 adaptive states
  plus the stationary state 113 (Qe≈0.5, self-looping) used as the
  non-adaptive AC sign bin. Values are the standard's; cross-checked
  against the system libjpeg's exported ``jpeg_aritab``.
* DC/AC statistical models (F.1.4.4.1/F.1.4.4.2 decode direction):
  49-bin DC area (5 conditioning classes from the previous diff vs
  the DAC L/U bounds x {S0,SS,SP,SN}, magnitude-category ladder at
  bin 20, magnitude bits at +14) and 245-bin AC area (3 bins per
  coefficient index {SE,S0,X1}, shared ladders at 189/217 split by
  the DAC Kx), statistics reset per scan and per restart.
* Progressive (G.1/G.2 arithmetic variants): DC-first with point
  transform, DC-refinement via the fixed bin, AC-first with per-index
  EOB decisions, AC-refinement with the previous-stage end-of-band
  (EOBx) cut-over — correctness pinned coefficient-EXACT against
  streams encoded AND coefficient-dumped by the system libjpeg-turbo
  (tests/fixtures_arith_jpeg.py, an independent producer).

Spark never sees this module directly — operators/jpeg.py dispatches
SOF9/SOF10 here inside the same Arrow-batched mapInPandas pass as the
Huffman paths.
"""

from __future__ import annotations

# Table D.3 of ITU-T T.81 (public standard): one row per QM-coder state,
# (Qe hex value, next-MPS state, next-LPS state, MPS-switch flag).
# Row 113 is the stationary ~0.5 state (self-looping) for fixed bins.
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]


class _ArithDecoder:
    """QM-coder decoder (T.81 D.2 software conventions). ``pos`` starts
    at the first entropy byte; the decoder never consumes the
    terminating marker — ``self.pos`` points at its 0xFF after the
    stream runs out, and 1-bits are supplied from then on (D.25)."""

    __slots__ = ("buf", "pos", "a", "c", "ct", "marker_hit")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.marker_hit = False
        # INITDEC: the first two entropy bytes land in the comparison
        # field (Cx = C >> 16 reads them verbatim); A opens at the full
        # interval 0x10000 (one bit wider than the [0x8000, 0xFFFF]
        # renormalized range) with no bits pre-consumed. Convention
        # validated decision-exact against libjpeg-encoded streams.
        self.c = ((self._next_byte() << 8 | self._next_byte()) << 16) & 0xFFFFFFFF
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        if not self.marker_hit:
            buf = self.buf
            if self.pos < len(buf):
                b = buf[self.pos]
                if b != 0xFF:
                    self.pos += 1
                    return b
                nxt = buf[self.pos + 1] if self.pos + 1 < len(buf) else 0xD9
                if nxt == 0x00:  # stuffed: data byte is 0xFF
                    self.pos += 2
                    return 0xFF
            self.marker_hit = True  # marker (or EOF): stop consuming
        # Pad with ZERO bytes past the marker: the libjpeg encoder's
        # flush discards trailing bits on the assumption the decoder
        # supplies zeros, and the committed fixtures pin the tail
        # decisions — 0xFF padding mis-decodes the final coefficients
        # of small streams (measured on SEQ_GRAY_Q95).
        return 0x00

    def decode(self, idx: bytearray, mps: bytearray, i: int) -> int:
        """One binary decision in context bin ``i`` of the (idx, mps)
        statistics area (Figures D.17-D.20)."""
        qe, nmps, nlps, sw = _QE[idx[i]]
        self.a -= qe
        # QM convention: the MPS sub-interval is the LOWER [0, A-Qe)
        # band, the LPS the UPPER Qe-wide band — compare the code
        # against the reduced A and subtract it on the LPS path (the
        # MQ-coder of T.88 inverts this assignment; the two are not
        # interchangeable).
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return mps[i]
            # MPS path with conditional exchange (Figure D.18)
            if self.a < qe:
                d = mps[i] ^ 1
                if sw:
                    mps[i] ^= 1
                idx[i] = nlps
            else:
                d = mps[i]
                idx[i] = nmps
        else:
            self.c = (self.c - (self.a << 16)) & 0xFFFFFFFF
            # LPS path with conditional exchange (Figure D.19)
            if self.a < qe:
                d = mps[i]
                idx[i] = nmps
            else:
                d = mps[i] ^ 1
                if sw:
                    mps[i] ^= 1
                idx[i] = nlps
            self.a = qe
        # RENORM_D (Figure D.20)
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                c = (c + (self._next_byte() << 8)) & 0xFFFFFFFF
                ct = 8
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct
        return d


class _Stats:
    """One statistics area: per-bin adaptive state index + MPS sense.
    DC areas have 49 live bins (allocated 64), AC 245 (allocated 256);
    re-initialized at scan start and at every restart (F.1.4.4)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = bytearray(n)
        self.mps = bytearray(n)

    def reset(self) -> None:
        for i in range(len(self.idx)):
            self.idx[i] = 0
            self.mps[i] = 0


# The fixed ~0.5 sign bin: state 113 self-loops, so adaptation is a
# no-op by construction — one shared instance is safe.
_FIXED = _Stats(1)
_FIXED.idx[0] = 113


def _decode_dc_diff(dec: _ArithDecoder, st: _Stats, ctx: int, ll: int, uu: int):
    """One DC difference (F.2.4.2): returns (diff, next_context_base).
    ``ctx`` is the conditioning base (0/4/8/12/16) picked from the
    PREVIOUS diff of the same component; L/U are the DAC bounds."""
    if not dec.decode(st.idx, st.mps, ctx):
        return 0, 0
    sign = dec.decode(st.idx, st.mps, ctx + 1)
    m = dec.decode(st.idx, st.mps, ctx + 2 + sign)
    b = ctx + 2 + sign
    if m:
        b = 20  # magnitude-category ladder X1.. (Table F.4 layout)
        while dec.decode(st.idx, st.mps, b):
            m <<= 1
            if m == 0x8000:
                raise ValueError("DC magnitude overflow")
            b += 1
    # conditioning class for the NEXT block, from the category (F.1.4.4.1.2)
    if m < ((1 << ll) >> 1):
        nxt = 0
    elif m > ((1 << uu) >> 1):
        nxt = 12 + 4 * sign
    else:
        nxt = 4 + 4 * sign
    v = m
    b += 14  # magnitude bits area
    m >>= 1
    while m:
        if dec.decode(st.idx, st.mps, b):
            v |= m
        m >>= 1
    v += 1
    return (-v if sign else v), nxt


def _decode_ac_band(dec: _ArithDecoder, st: _Stats, zz, ss: int, se: int, kx: int, al: int = 0):
    """AC coefficients of one block over zigzag band [ss, se]
    (F.2.4.3): per-index {SE EOB, S0 zero-run, magnitude} decisions;
    the sign uses the fixed bin; ladders split at Kx."""
    k = ss
    while k <= se:
        b = 3 * (k - 1)
        if dec.decode(st.idx, st.mps, b):  # SE: end of block
            return
        while not dec.decode(st.idx, st.mps, b + 1):  # S0: zero, advance
            k += 1
            b += 3
            if k > se:
                raise ValueError("AC run past band end")
        sign = dec.decode(_FIXED.idx, _FIXED.mps, 0)
        m = dec.decode(st.idx, st.mps, b + 2)
        if m:
            if dec.decode(st.idx, st.mps, b + 2):  # X1 shares the bin
                m = 2
                base = 189 if k <= kx else 217
                while dec.decode(st.idx, st.mps, base):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("AC magnitude overflow")
                    base += 1
                bb = base + 14
            else:
                bb = b + 2 + 14
        else:
            bb = b + 2 + 14
        v = m
        m >>= 1
        while m:
            if dec.decode(st.idx, st.mps, bb):
                v |= m
            m >>= 1
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine_band(dec, st, zz, ss, se, al):
    """AC refinement scan, one block (G.2 arithmetic variant): indices
    past the previous stage's end-of-band (kex) get an EOB decision;
    nonzero-history coefficients get one correction bit (bin +2);
    newly-nonzero arrive as ±1<<al with the fixed sign bin."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex >= ss and zz[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        b3 = 3 * (k - 1)
        if k > kex and dec.decode(st.idx, st.mps, b3):
            break  # end of block
        while True:
            if zz[k] != 0:
                if dec.decode(st.idx, st.mps, b3 + 2):
                    zz[k] += m1 if zz[k] < 0 else p1
                break
            if dec.decode(st.idx, st.mps, b3 + 1):
                sign = dec.decode(_FIXED.idx, _FIXED.mps, 0)
                zz[k] = m1 if sign else p1
                break
            k += 1
            b3 += 3
            if k > se:
                raise ValueError("AC refine run past band end")
        k += 1


def _parse_dac(seg: bytes, dac: dict) -> None:
    """DAC segment (B.2.4.3): conditioning per table — DC: (L, U)
    packed low/high nibble; AC: Kx."""
    p = 0
    while p + 2 <= len(seg):
        tc, tb, cs = seg[p] >> 4, seg[p] & 0xF, seg[p + 1]
        if tc == 0:
            dac[("dc", tb)] = (cs & 0xF, cs >> 4)
        else:
            dac[("ac", tb)] = cs
        p += 2


def _new_stats(sel_or_scomps, dc_key, ac_key):
    dc = {}
    ac = {}
    for entry in sel_or_scomps:
        dc.setdefault(dc_key(entry), _Stats(64))
        ac.setdefault(ac_key(entry), _Stats(256))
    return dc, ac


def _reset_all(*stat_dicts):
    for d in stat_dicts:
        for st in d.values():
            st.reset()


def decode_sequential(b, pos, frame, sel, qt, dac, restart_interval, want="pixels"):
    """SOF9 extended-sequential arithmetic scan (the _scan shape of
    operators/jpeg.py with the entropy decoder swapped): interleaved
    MCU walk, per-component DC conditioning contexts, restart markers
    re-init the decoder AND the statistics. ``want="coefs"`` returns
    {ci: (block_h, block_w, 64) int32 natural-order arrays} before any
    IDCT — the exact cross-codec comparison surface."""
    import numpy as np

    from laygo_python_spark.operators.jpeg import _A, _ZIGZAG, _assemble, _next_marker

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax == 0 or vmax == 0 or any(c["hs"] == 0 or c["vs"] == 0 for c in comps):
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [
        np.zeros((mcuy * c["vs"], mcux * c["hs"], 64), dtype=np.int32) for c in comps
    ]
    tabs = [sel[c["id"]] for c in comps]  # (dc_tbl, ac_tbl) per component
    dc_stats, ac_stats = _new_stats(tabs, lambda t: t[0], lambda t: t[1])
    dec = _ArithDecoder(b, pos)
    last_dc = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            code, p2 = _next_marker(b, dec.pos)
            if not (0xD0 <= code <= 0xD7):
                raise ValueError("bad restart marker")
            dec = _ArithDecoder(b, p2)
            _reset_all(dc_stats, ac_stats)
            last_dc = [0] * len(comps)
            dc_ctx = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            dct, act = tabs[ci]
            ll, uu = dac.get(("dc", dct), (0, 1))
            kx = dac.get(("ac", act), 5)
            for by in range(c["vs"]):
                for bx in range(c["hs"]):
                    zz = coefs[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                    diff, dc_ctx[ci] = _decode_dc_diff(
                        dec, dc_stats[dct], dc_ctx[ci], ll, uu
                    )
                    last_dc[ci] += diff
                    zz[0] = last_dc[ci]
                    _decode_ac_band(dec, ac_stats[act], zz, 1, 63, kx)
    return _finish(coefs, comps, qt, hmax, vmax, h, w, want, np, _A, _ZIGZAG, _assemble)


def _finish(coefs, comps, qt, hmax, vmax, h, w, want, np, _A, _ZIGZAG, _assemble):
    if want == "coefs":
        out = {}
        for ci in range(len(comps)):
            nat = np.zeros_like(coefs[ci])
            nat[:, :, _ZIGZAG] = coefs[ci]
            out[ci] = nat
        return out
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


def decode_progressive(b, i, qt, frame, dac, restart_interval, want="pixels"):
    """SOF10 progressive arithmetic decode (the _progressive shape of
    operators/jpeg.py): walk every scan accumulating zigzag-order
    coefficients — DC first/refine, AC first/refine per G.1/G.2
    arithmetic variants — then dequantize + IDCT once. ``i`` points at
    the first SOS's 0xFF."""
    import struct

    import numpy as np

    from laygo_python_spark.operators.jpeg import _A, _ZIGZAG, _assemble, _next_marker

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
    nbw = [-(-(-(-w * c["hs"] // hmax)) // 8) for c in comps]
    nbh = [-(-(-(-h * c["vs"] // vmax)) // 8) for c in comps]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    last_dc = [0] * len(comps)
    dc_ctx = [0] * len(comps)

    code = 0xDA
    pos = i + 2
    while code != 0xD9:
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
        elif code == 0xCC:
            _parse_dac(seg, dac)
        elif code == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif code == 0xDA:
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                if cid not in by_id:
                    return None
                scomps.append((by_id[cid], tsel >> 4, tsel & 0xF))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            data_pos = _progressive_arith_scan(
                b, data_pos, comps, coefs, scomps, ss, se, ah, al,
                dac, restart_interval, mcux, mcuy, nbw, nbh, last_dc, dc_ctx,
            )
        code, pos = _next_marker(b, data_pos)
        while 0xD0 <= code <= 0xD7:  # leftover restart at scan end
            code, pos = _next_marker(b, pos)
    return _finish(coefs, comps, qt, hmax, vmax, h, w, want, np, _A, _ZIGZAG, _assemble)


def _progressive_arith_scan(
    b, pos, comps, coefs, scomps, ss, se, ah, al,
    dac, restart_interval, mcux, mcuy, nbw, nbh, last_dc, dc_ctx,
):
    """One arithmetic progressive scan; returns the entropy-end offset.
    DC statistics/conditioning RESET at scan start (each scan is a
    fresh statistics area per F.1.4.4); last_dc persists only within
    the scan (DC appears in exactly one first scan per component)."""
    from laygo_python_spark.operators.jpeg import _next_marker

    dc_stats, ac_stats = _new_stats(scomps, lambda s: s[1], lambda s: s[2])
    dec = _ArithDecoder(b, pos)
    for ci, _, _ in scomps:
        last_dc[ci] = 0
        dc_ctx[ci] = 0
    if ss == 0:
        units = mcux * mcuy if len(scomps) > 1 else nbh[scomps[0][0]] * nbw[scomps[0][0]]
        if se != 0:
            raise ValueError("DC scan with Se != 0")
    else:
        if len(scomps) != 1:
            raise ValueError("AC scan must be single-component")
        units = nbw[scomps[0][0]] * nbh[scomps[0][0]]
    rst = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            code, p2 = _next_marker(b, dec.pos)
            if code != 0xD0 + (rst % 8):
                raise ValueError("bad restart marker")
            rst += 1
            dec = _ArithDecoder(b, p2)
            _reset_all(dc_stats, ac_stats)
            for ci, _, _ in scomps:
                last_dc[ci] = 0
                dc_ctx[ci] = 0
        if ss == 0 and len(scomps) > 1:
            my, mx = divmod(u, mcux)
            for ci, dct, _act in scomps:
                c = comps[ci]
                ll, uu = dac.get(("dc", dct), (0, 1))
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        blk = coefs[ci][my * c["vs"] + by, mx * c["hs"] + bx]
                        if ah == 0:
                            diff, dc_ctx[ci] = _decode_dc_diff(
                                dec, dc_stats[dct], dc_ctx[ci], ll, uu
                            )
                            last_dc[ci] += diff
                            blk[0] = last_dc[ci] << al
                        elif dec.decode(_FIXED.idx, _FIXED.mps, 0):
                            blk[0] |= 1 << al
        else:
            ci, dct, act = scomps[0]
            blk = coefs[ci][u // nbw[ci], u % nbw[ci]]
            if ss == 0:
                ll, uu = dac.get(("dc", dct), (0, 1))
                if ah == 0:
                    diff, dc_ctx[ci] = _decode_dc_diff(
                        dec, dc_stats[dct], dc_ctx[ci], ll, uu
                    )
                    last_dc[ci] += diff
                    blk[0] = last_dc[ci] << al
                elif dec.decode(_FIXED.idx, _FIXED.mps, 0):
                    blk[0] |= 1 << al
            elif ah == 0:
                kx = dac.get(("ac", act), 5)
                _decode_ac_band(dec, ac_stats[act], blk, ss, se, kx, al)
            else:
                _decode_ac_refine_band(dec, ac_stats[act], blk, ss, se, al)
    code, p2 = _next_marker(b, dec.pos)
    return p2 - 2
