"""ITU-T T.81 Annex D arithmetic (QM) coder for JPEG entropy data.

Implements the adaptive binary arithmetic DECODER (Annex D.2: INITDEC,
DECODE with conditional MPS/LPS exchange, RENORMD) and ENCODER (Annex
D.1: CODE, RENORME, BYTEOUT with byte stuffing, FLUSH), plus the Annex
F.1.4/F.2 statistical models for sequential DCT coefficients — DC
difference conditioning categories (F.1.4.4.1), AC end-of-block /
run / magnitude decision trees (F.1.4.4.2), and the non-adaptive
0.5-probability bin used for AC sign decisions.

The probability state machine is Table D.3 (113 adaptive rows + the
fixed row 113).  The table below was read out of the system
libjpeg-turbo's exported ``jpeg_aritab`` symbol — the reference
implementation's copy of the same public standard table — rather than
typed from the spec, to rule out transcription slips; the coder
procedures themselves are written from the T.81 flowcharts.  The test
suite (tests/test_jpeg_arith.py) validates BOTH directions against the
real libjpeg as a subprocess oracle: libjpeg-encoded arithmetic scans
must decode here to bit-identical quantized coefficients, and scans
encoded here must decode identically under libjpeg.

Everything here is pure Python over ``bytes`` — the production decode
path (operators/multimodal.py ``jpeg``) stays dependency-free; the
libjpeg shim is a TEST-ONLY ground-truth, never imported at runtime.

Entropy-stream framing: T.81 arithmetic scans use the same byte
stuffing as Huffman scans (0xFF followed by a stuffed 0x00 data byte,
D.1.6), so the caller hands this module DESTUFFED restart intervals
(multimodal's ``_clean_scan`` output); past the end of an interval the
decoder feeds zero bytes (D.2.7: a marker terminates the interval).
"""

from __future__ import annotations

# Table D.3: (Qe, next-index-MPS, next-index-LPS, switch-MPS) per
# state.  Row 113 is the non-adapting ~0.5 bin (AC sign decisions).
QE_TABLE = (
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
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0),
    (0x415E, 99, 103, 0), (0x5627, 106, 105, 1),
    (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0),
    (0x5A10, 111, 110, 1), (0x5522, 109, 112, 0),
    (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

_MPS = 0x80  # state bytes pack (MPS sense << 7) | table index


class QMDecoder:
    """Annex D.2 decoder over ONE destuffed restart interval.

    ``decode(stats, i)`` returns the next binary decision under the
    adaptive probability state ``stats[i]`` (a bytearray cell holding
    ``MPS<<7 | state_index``), updating the state on renormalization
    per the Table D.3 transitions with conditional MPS/LPS exchange.
    """

    __slots__ = ("_data", "_pos", "_c", "_a", "_ct")

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0
        # INITDEC: the compare window (bits 16..31) holds the first 16
        # fraction bits of the coded value; the interval starts at full
        # scale (the spec's 16-bit A register starts at 0 ≡ 0x10000 —
        # unambiguous here in wide arithmetic).  CT=0 makes the first
        # renormalization fetch the third byte into bits 8..15, from
        # where the window slides over it one bit per shift.  Verified
        # bit-exact against libjpeg-turbo's decoder on randomized
        # corpora (tests/test_jpeg_arith.py).
        self._c = (self._next() << 24) | (self._next() << 16)
        self._ct = 0
        self._a = 0x10000

    def _next(self) -> int:
        # zero-fed past the interval end (D.2.7)
        p = self._pos
        d = self._data
        if p < len(d):
            self._pos = p + 1
            return d[p]
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        sv = stats[i]
        qe, nmps, nlps, sw = QE_TABLE[sv & 0x7F]
        a = self._a - qe
        c = self._c
        if (c >> 16) < a:
            # lower subinterval: MPS unless sizes inverted
            if a & 0x8000:
                self._a = a
                return sv >> 7
            if a < qe:  # conditional exchange
                bit = (sv >> 7) ^ 1
                stats[i] = ((sv ^ _MPS) if sw else sv) & _MPS | nlps
            else:
                bit = sv >> 7
                stats[i] = (sv & _MPS) | nmps
        else:
            c -= a << 16
            # upper subinterval (size Qe): LPS unless sizes inverted
            if a < qe:  # conditional exchange
                bit = sv >> 7
                stats[i] = (sv & _MPS) | nmps
            else:
                bit = (sv >> 7) ^ 1
                stats[i] = ((sv ^ _MPS) if sw else sv) & _MPS | nlps
            a = qe
        # RENORMD
        ct = self._ct
        while a < 0x8000:
            if ct == 0:
                c += self._next() << 8
                ct = 8
            a <<= 1
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
        self._a = a
        self._c = c
        self._ct = ct
        return bit


class QMEncoder:
    """Annex D.1 encoder.  Emits the STUFFED byte stream (0xFF is
    followed by a 0x00 stuff byte, D.1.6) so ``bytes(enc.finish())``
    can be placed directly after an SOS header."""

    __slots__ = ("_a", "_c", "_ct", "_pending", "_nff", "_out")

    def __init__(self):
        self._a = 0x10000
        self._c = 0
        self._ct = 11
        self._pending = -1  # no byte emitted yet
        self._nff = 0  # run of 0xFF bytes awaiting carry resolution
        self._out = bytearray()

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, sw = QE_TABLE[sv & 0x7F]
        a = self._a - qe
        if bit == (sv >> 7):
            if a & 0x8000:
                self._a = a
                return
            if a < qe:  # conditional exchange: MPS takes the Qe part
                self._c += a
                a = qe
            stats[i] = (sv & _MPS) | nmps
        else:
            if a < qe:  # conditional exchange: LPS keeps the low part
                pass
            else:
                self._c += a
                a = qe
            stats[i] = ((sv ^ _MPS) if sw else sv) & _MPS | nlps
        # RENORME
        c, ct = self._c, self._ct
        while a < 0x8000:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                c = self._byteout(c)
                ct = 8
        self._a, self._c, self._ct = a, c, ct

    def _emit(self, byte: int) -> None:
        self._out.append(byte)
        if byte == 0xFF:
            self._out.append(0x00)

    def _byteout(self, c: int) -> int:
        t = c >> 19
        if t > 0xFF:
            # carry ripples into the pending byte; stacked 0xFFs roll
            # over to 0x00 on the way.  A ripple past the stream start
            # (pending still unset) cannot occur — the code value stays
            # below the unit interval — but degrade defensively rather
            # than overflow the byte.
            self._emit(self._pending + 1 if self._pending >= 0 else 1)
            for _ in range(self._nff):
                self._emit(0x00)
            self._nff = 0
            self._pending = t & 0xFF
        elif t == 0xFF:
            # 0xFF is never held as the pending byte (a later carry
            # would bump it past 0xFF); it always joins the stack,
            # even as the very first output byte
            self._nff += 1
        else:
            if self._pending >= 0:
                self._emit(self._pending)
            for _ in range(self._nff):
                self._emit(0xFF)
            self._nff = 0
            self._pending = t
        return c & 0x7FFFF

    def finish(self) -> bytes:
        # FLUSH (D.1.8.2): pick the value in [C, C+A) with the most
        # trailing zeros, then drain the register
        t = (self._c + self._a - 1) & 0xFFFF0000
        if t < self._c:
            t += 0x8000
        c = (t << self._ct) & 0xFFFFFFFF
        c = self._byteout(c)
        c = (c << 8) & 0xFFFFFFFF
        self._byteout(c)
        if self._pending >= 0:
            self._emit(self._pending)
        for _ in range(self._nff):
            self._emit(0xFF)
        self._pending = -1
        self._nff = 0
        return bytes(self._out)


def new_dc_stats() -> bytearray:
    """One DC conditioning table's statistics area (F.1.4.4.1.3:
    49 bins — 5 conditioning categories x {S0,SS,SP,SN} + X1..X15 at
    offset 20 + the magnitude-bit bins at +14)."""
    return bytearray(64)


def new_ac_stats() -> bytearray:
    """One AC conditioning table's statistics area (F.1.4.4.2:
    3 bins {SE,S0,SP} per K in 1..63, the low/high X2.. chains at 189
    and 217, magnitude-bit bins at +14)."""
    return bytearray(256)


def new_fixed_bin() -> bytearray:
    """The non-adapting ~0.5 bin (state 113) for AC signs."""
    return bytearray([113])


def decode_dc_diff(dec: QMDecoder, stats: bytearray, ctx: int,
                   lo: int, hi: int) -> tuple[int, int]:
    """Decode one DC difference (F.2.4.1 / Figures F.19-F.24) under
    conditioning category ``ctx`` (0/4/8/12/16); returns
    ``(diff, next_ctx)`` where next_ctx classifies THIS diff for the
    following block via the (L, U) conditioning bounds."""
    st = ctx
    if dec.decode(stats, st) == 0:
        return 0, 0
    sign = dec.decode(stats, st + 1)
    st += 2 + sign
    m = 0
    if dec.decode(stats, st):
        m = 1
        st = 20  # X1
        while dec.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            st += 1
    if m < (1 << lo) >> 1:
        nctx = 0
    elif m > (1 << hi) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    v = m
    st += 14
    mm = m >> 1
    while mm:
        if dec.decode(stats, st):
            v |= mm
        mm >>= 1
    v += 1
    return (-v if sign else v), nctx


def decode_ac_block(dec: QMDecoder, stats: bytearray,
                    fixed: bytearray, kx: int, block,
                    k_first: int = 1, k_last: int = 63,
                    al: int = 0) -> None:
    """Decode the AC coefficients of one block (F.2.4.2 / Figure
    F.20) into ``block`` (zigzag-order indexable), under AC
    conditioning parameter ``kx``.  ``al`` is the successive-
    approximation point transform of a progressive first pass (G.2):
    decoded values are stored scaled by 2^al; 0 for sequential."""
    k = k_first
    while k <= k_last:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            st += 3
            k += 1
            if k > k_last:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = 0
        if dec.decode(stats, st):
            m = 1
            if dec.decode(stats, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arithmetic AC magnitude overflow"
                        )
                    st += 1
        v = m
        st += 14
        mm = m >> 1
        while mm:
            if dec.decode(stats, st):
                v |= mm
            mm >>= 1
        v += 1
        block[k] = (-v if sign else v) << al
        k += 1


def decode_ac_refine(dec: QMDecoder, stats: bytearray,
                     fixed: bytearray, block,
                     k_first: int, k_last: int, al: int) -> None:
    """Decode one AC successive-approximation REFINEMENT pass (T.81
    G.2, progressive Ah > 0) into ``block``: correction bits for
    coefficients already nonzero from earlier passes, newly-nonzero
    ±2^al plantings (sign via the fixed bin), and a per-block EOB
    decision once past the previous pass's last nonzero index."""
    p1 = 1 << al
    m1 = -p1
    kex = k_last
    while kex >= k_first and block[kex] == 0:
        kex -= 1
    k = k_first
    while k <= k_last:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            return  # EOB
        while True:
            v = int(block[k])
            if v:
                if dec.decode(stats, st + 2):
                    block[k] = v + (p1 if v >= 0 else m1)
                break
            if dec.decode(stats, st + 1):
                block[k] = m1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > k_last:
                raise ValueError(
                    "arithmetic AC refinement past band end"
                )
        k += 1


def encode_dc_diff(enc: QMEncoder, stats: bytearray, ctx: int,
                   lo: int, hi: int, diff: int) -> int:
    """Encode one DC difference (F.1.4.1/F.1.4.4.1); returns the next
    conditioning category.  Mirror of ``decode_dc_diff``."""
    st = ctx
    if diff == 0:
        enc.encode(stats, st, 0)
        return 0
    enc.encode(stats, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, st + 1, sign)
    st += 2 + sign
    v = -diff if sign else diff
    m = 0
    v1 = v - 1
    if v1:
        enc.encode(stats, st, 1)
        m = 1
        st = 20
        v2 = v1
        while v2 >> 1:
            v2 >>= 1
            enc.encode(stats, st, 1)
            m <<= 1
            st += 1
    enc.encode(stats, st, 0)
    if m < (1 << lo) >> 1:
        nctx = 0
    elif m > (1 << hi) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    st += 14
    mm = m >> 1
    while mm:
        enc.encode(stats, st, 1 if (v1 & mm) else 0)
        mm >>= 1
    return nctx


def encode_ac_block(enc: QMEncoder, stats: bytearray,
                    fixed: bytearray, kx: int, block,
                    k_first: int = 1, k_last: int = 63) -> None:
    """Encode the AC coefficients of one block; mirror of
    ``decode_ac_block``."""
    ke = k_last
    while ke >= k_first and block[ke] == 0:
        ke -= 1
    k = k_first
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB yet
        while block[k] == 0:
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(stats, st + 1, 1)
        v = block[k]
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        if sign:
            v = -v
        st += 2
        m = 0
        v1 = v - 1
        if v1:
            enc.encode(stats, st, 1)
            m = 1
            if v1 >> 1:
                enc.encode(stats, st, 1)
                m = 2
                st = 189 if k <= kx else 217
                v2 = v1 >> 1
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(stats, st, 0)
        st += 14
        mm = m >> 1
        while mm:
            enc.encode(stats, st, 1 if (v1 & mm) else 0)
            mm >>= 1
        k += 1
    if k <= k_last:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB
