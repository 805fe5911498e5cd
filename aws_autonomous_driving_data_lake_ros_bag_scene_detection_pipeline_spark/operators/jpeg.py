"""Builtin baseline + progressive JPEG codec (r8, progressive r10) —
closes the last multimodal dependency gap: ``decode_image``
previously required Pillow for JPEG payloads (an honest
``NotImplementedError`` guard); this module decodes JFIF/JPEG with
numpy only, so the most common image format in any web-scraped
corpus decodes on a stock executor.

Scope (documented, guarded):

- **Decoder**: baseline sequential DCT (SOF0/SOF1) AND progressive
  DCT (SOF2, r10 — spectral selection + successive approximation per
  ITU-T T.81 G.2: multi-scan coefficient accumulation, EOB runs,
  DC/AC refinement passes), 8-bit samples, 1 or 3 components, any
  sampling factors up to 2x2 (covers 4:4:4, 4:2:2, 4:2:0), restart
  markers, multi-table DQT/DHT segments (tables may be redefined
  between scans), byte stuffing. Hierarchical/lossless/arithmetic
  variants raise ``NotImplementedError`` naming the variant — same
  honesty contract as the other codec guards.
- **Encoder** (round-trip testing + thumbnail writing): baseline
  SOF0, quality-scaled Annex-K quantization matrices, 4:4:4 or 4:2:0,
  optional restart interval (baseline AND progressive);
  ``progressive=True`` (r10) writes an SOF2 stream with the classic
  script — DC first at Al=1, two AC spectral bands per component at
  Al=1, then the matching DC/AC refinement scans — exercising every
  decoder path, including per-scan restart segments. Huffman tables
  are built PER SCAN as fixed-length canonical codes and written into
  the stream's DHT segments — JPEG tables are self-describing, so the
  encoder needs no memorized standard code tables and any
  spec-compliant decoder (including this module's, and Pillow where
  present) reads the output. Compression ratio is sacrificed for
  simplicity; the decoder of course handles the optimal tables
  real-world files carry. Progressive coding is LOSSLESS over the
  quantized coefficients, so decoding an image's progressive encode
  equals decoding its baseline encode bit-for-bit (test-pinned).

Everything is plain numpy over one payload — the Spark side stays the
same Arrow-batched ``decode_image`` plumbing; only the codec dispatch
gained a branch. Format knowledge is the public ITU-T T.81 / JFIF
spec."""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "is_progressive_jpeg"]

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63])

#: Annex K base quantization matrices (public spec tables), zigzag
#: order NOT applied (natural row-major 8x8)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: forward = T @ B @ T.T, inverse =
    T.T @ C @ T."""
    T = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return T


_T = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality→scale rule over the Annex K bases."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUM, _Q_CHR):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# -- bit I/O ----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    RST markers are handled by the caller (it resets the reader at
    segment boundaries)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # spec: pad with 1-bits past the end of the segment
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0x00
                if nxt == 0x00:
                    self.pos += 1            # stuffed byte
                else:
                    # marker inside the segment: behave as padding
                    self.pos -= 1
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)    # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            b = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc))
                                                - 1)
            self.out.append(b & 0xFF)
            if (b & 0xFF) == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


# -- huffman ----------------------------------------------------------------


def _decode_table(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> symbol from a DHT's BITS/HUFFVAL lists —
    canonical code assignment per the spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huffman(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code (corrupt stream)")


def _fixed_length_code(symbols: list[int]) -> tuple[list[int],
                                                    list[int], dict]:
    """Encoder-side canonical code: every symbol the same length L
    with 2^L strictly greater than the symbol count, so the all-ones
    code is never assigned. Returns (BITS, HUFFVAL, sym->(code, L))."""
    syms = sorted(set(symbols)) or [0]
    L = 1
    while (1 << L) <= len(syms):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    # canonical assignment: code i at length L for the i-th symbol
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, enc


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for a DC diff / AC coefficient
    — negative values use the ones-complement convention."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


# -- decoder ----------------------------------------------------------------


def _find_entropy_end(data: bytes, start: int) -> int:
    """Position of the first real marker after ``start`` — skipping
    stuffed FF00, restart markers, and T.81 B.1.1.2 FF fill runs."""
    i = start
    while i < len(data) - 1:
        if data[i] == 0xFF:
            m = data[i + 1]
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            if m == 0xFF:                 # fill byte run
                i += 1
                continue
            return i
        i += 1
    return len(data)


def _split_restart_segments(raw: bytes) -> list[bytes]:
    """Split one scan's entropy-coded data at RST markers so each
    interval decodes from a clean bit/predictor state."""
    segments = []
    i = 0
    start = 0
    while i < len(raw) - 1:
        if raw[i] == 0xFF and raw[i + 1] != 0x00:
            m = raw[i + 1]
            if m == 0xFF:
                i += 1
                continue
            if 0xD0 <= m <= 0xD7:
                segments.append(raw[start:i])
                i += 2
                start = i
                continue
            segments.append(raw[start:i])
            start = None
            break
        i += 1
    if start is not None:
        segments.append(raw[start:])
    return segments


def is_progressive_jpeg(data: bytes) -> bool:
    """Light marker walk (no table parsing, stops at the frame
    header): True iff the payload's SOF marker is SOF2. Lets
    dispatchers route progressive payloads to a faster native
    decoder (Pillow) when one is installed — the pure-Python
    multi-scan path is correct but orders of magnitude slower on
    large images."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        return False
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if data[pos + 1] == 0xFF:         # T.81 B.1.1.2 fill byte
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9 or marker == 0xDA:
            return False                  # hit SOS/EOI with no SOF
        if marker == 0xC2:
            return True
        if 0xC0 <= marker <= 0xCF and marker != 0xC4:
            return False                  # some other SOF
        # skip the whole segment (never resync inside APPn/EXIF
        # binary bodies — a stray FF C2 there must not misroute)
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        if seglen < 2:
            return False                  # corrupt length: bail
        pos += seglen
    return False


def _parse_jpeg(data: bytes):
    """Marker walk shared by the baseline and progressive paths:
    returns ``(frame, scans, qt)`` where each scan snapshots the
    huffman tables and restart interval in force at ITS SOS (tables
    may legally be redefined between scans)."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    scans: list[dict] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1                        # T.81 B.1.1.2 fill byte
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                  # EOI
            break
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                  # DQT (possibly several)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                n = 64 * (2 if prec else 1)
                raw = seg[i:i + n]
                if prec:
                    vals = np.frombuffer(raw, ">u2").astype(np.float64)
                else:
                    vals = np.frombuffer(raw, np.uint8) \
                        .astype(np.float64)
                tab = np.zeros(64)
                tab[_ZIGZAG] = vals         # de-zigzag
                qt[tid] = tab.reshape(8, 8)
                i += n
        elif marker == 0xC4:                # DHT (possibly several)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                bits = list(seg[i:i + 16])
                i += 16
                nv = sum(bits)
                values = list(seg[i:i + nv])
                i += nv
                (huff_ac if cls else huff_dc)[tid] = \
                    _decode_table(bits, values)
        elif marker == 0xDD:                # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, 2 prog
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], \
                    seg[8 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4,
                              "v": samp & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG variant SOF{marker - 0xC0} is not supported by "
                f"the builtin decoder (baseline and progressive DCT "
                f"are); install Pillow for full coverage")
        elif marker == 0xDA:                # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append({"id": cid, "td": tabs >> 4,
                               "ta": tabs & 0x0F})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            d0 = pos + seglen
            end = _find_entropy_end(data, d0)
            scans.append({"comps": scomps, "ss": ss, "se": se,
                          "ah": ahal >> 4, "al": ahal & 0x0F,
                          "dc": dict(huff_dc), "ac": dict(huff_ac),
                          "ri": restart_interval,
                          "data": data[d0:end]})
            pos = end
            continue
        pos += seglen
    if frame is None or not scans:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    return frame, scans, qt


def _decode_baseline(frame: dict, scan: dict, qt: dict) -> list:
    """Baseline sequential scan → per-component sample planes (the
    r8 decoder, tables now read from the scan snapshot)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in scan["comps"]}
    huff_dc, huff_ac = scan["dc"], scan["ac"]
    restart_interval = scan["ri"]
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))

    segments = _split_restart_segments(scan["data"])
    reader = _BitReader(segments[0] if segments else b"")
    seg_idx = 0
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("truncated JPEG: missing restart "
                                     "segment")
                reader = _BitReader(segments[seg_idx])
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                sc = by_id[c["id"]]
                dct_tab = huff_dc.get(sc["td"])
                act_tab = huff_ac.get(sc["ta"])
                q = qt.get(c["tq"])
                if dct_tab is None or act_tab is None or q is None:
                    raise ValueError("JPEG scan references a missing "
                                     "huffman/quant table")
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coeffs = np.zeros(64)
                        s = _read_huffman(reader, dct_tab)
                        diff = _extend(reader.read_bits(s), s)
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_huffman(reader, act_tab)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break        # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run past block end "
                                    "(corrupt stream)")
                            coeffs[k] = _extend(reader.read_bits(size),
                                                size)
                            k += 1
                        block = np.zeros(64)
                        block[_ZIGZAG] = coeffs
                        block = block.reshape(8, 8) * q
                        px = _T.T @ block @ _T + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    return planes


# -- progressive decoder (r10) ----------------------------------------------


def _dc_unit(reader, table, coef, ah: int, al: int, state: dict,
             si: int) -> None:
    """One block's DC contribution — first pass decodes the diff at
    reduced precision, a refinement pass appends one raw bit."""
    if ah == 0:
        s = _read_huffman(reader, table)
        diff = _extend(reader.read_bits(s), s)
        state["pred"][si] += diff
        coef[0] = state["pred"][si] << al
    else:
        if reader.read_bit():
            coef[0] |= 1 << al


def _ac_first_unit(reader, table, coef, ss: int, se: int, al: int,
                   state: dict) -> None:
    """T.81 G.1.2.2: first AC pass over a spectral band, with EOB
    runs spanning blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _read_huffman(reader, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16                   # ZRL
                continue
            eob = (1 << r) - 1
            if r:
                eob += reader.read_bits(r)
            state["eobrun"] = eob
            return
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end "
                             "(corrupt stream)")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine_unit(reader, table, coef, ss: int, se: int, al: int,
                    state: dict) -> None:
    """T.81 G.1.2.3: AC refinement — newly-nonzero coefficients carry
    (run, sign) symbols, history coefficients read one correction bit
    each as the walk passes them, EOB runs correct whole blocks."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _read_huffman(reader, table)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eob = 1 << r
                    if r:
                        eob += reader.read_bits(r)
                    state["eobrun"] = eob
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG AC refinement "
                                     "symbol (corrupt stream)")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bit():
                        if (coef[k] & p1) == 0:
                            coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                if reader.read_bit():
                    if (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _baseline_unit(reader, dct_tab, act_tab, coef, state: dict,
                   si: int) -> None:
    """One block of a (possibly multi-scan) BASELINE stream decoded
    into the coefficient accumulator: DC diff + AC runs, zigzag
    order — the per-block core of :func:`_decode_baseline`, reused
    by the multi-scan walk."""
    s = _read_huffman(reader, dct_tab)
    state["pred"][si] += _extend(reader.read_bits(s), s)
    coef[0] = state["pred"][si]
    k = 1
    while k < 64:
        rs = _read_huffman(reader, act_tab)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:
                k += 16                   # ZRL
                continue
            break                         # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end "
                             "(corrupt stream)")
        coef[k] = _extend(reader.read_bits(size), size)
        k += 1


def _decode_progressive(frame: dict, scans: list, qt: dict) -> list:
    """Accumulate every scan's contribution into per-component
    coefficient arrays (zigzag order), then dequantize + IDCT once.
    Spectral selection bands, successive approximation, interleaved
    DC scans, non-interleaved single-component scans, and restart
    intervals are all per T.81 G.2.

    The same walk decodes MULTI-SCAN BASELINE streams (r10:
    ``frame["progressive"]`` False — sequential files whose
    components arrive in separate scans): each scan's blocks decode
    full-band via :func:`_baseline_unit` instead of the
    spectral-band units, sharing the interleave/raster/restart
    machinery and the final vectorized IDCT."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = []
    comp_bw, comp_bh = [], []
    for c in comps:
        coefs.append(np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int32))
        cw = -(-(w * c["h"]) // hmax)     # ceil
        ch = -(-(h * c["v"]) // vmax)
        comp_bw.append(-(-cw // 8))
        comp_bh.append(-(-ch // 8))
    comp_idx = {c["id"]: i for i, c in enumerate(comps)}

    baseline = not frame.get("progressive")
    covered: set = set()
    for scan in scans:
        ss, se = scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        scomps = scan["comps"]
        if not baseline:
            if ss == 0 and se != 0:
                raise ValueError("progressive JPEG: a DC scan must "
                                 "have Se=0 (corrupt scan header)")
            if ss > 0 and len(scomps) != 1:
                raise ValueError("progressive JPEG: AC scans carry "
                                 "one component (corrupt scan "
                                 "header)")
        segments = _split_restart_segments(scan["data"])
        reader = _BitReader(segments[0] if segments else b"")
        seg_idx = 0
        state = {"pred": [0] * len(scomps), "eobrun": 0}
        ri = scan["ri"]

        def _restart():
            nonlocal reader, seg_idx
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated JPEG: missing restart "
                                 "segment")
            reader = _BitReader(segments[seg_idx])
            state["pred"] = [0] * len(scomps)
            state["eobrun"] = 0

        def _tables(sc):
            if ss == 0:
                t = scan["dc"].get(sc["td"]) if ah == 0 else None
                if ah == 0 and t is None:
                    raise ValueError("JPEG scan references a missing "
                                     "huffman table")
                return t
            t = scan["ac"].get(sc["ta"])
            if t is None:
                raise ValueError("JPEG scan references a missing "
                                 "huffman table")
            return t

        def _btabs(sc):
            dct = scan["dc"].get(sc["td"])
            act = scan["ac"].get(sc["ta"])
            if dct is None or act is None:
                raise ValueError("JPEG scan references a missing "
                                 "huffman table")
            return dct, act

        covered.update(sc["id"] for sc in scomps)
        if len(scomps) > 1:               # interleaved scan
            # table resolution hoisted out of the per-block hot loop
            # (review fix: the pure-Python walk is slow enough)
            stabs = ([_btabs(sc) for sc in scomps] if baseline
                     else [_tables(sc) for sc in scomps])
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if ri and unit and unit % ri == 0:
                        _restart()
                    for si, sc in enumerate(scomps):
                        ci = comp_idx[sc["id"]]
                        c = comps[ci]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                coef = coefs[ci][my * c["v"] + v,
                                                 mx * c["h"] + hh]
                                if baseline:
                                    dct, act = stabs[si]
                                    _baseline_unit(reader, dct, act,
                                                   coef, state, si)
                                else:
                                    _dc_unit(reader, stabs[si],
                                             coef, ah, al, state, si)
                    unit += 1
        else:                             # single-component raster
            sc = scomps[0]
            ci = comp_idx[sc["id"]]
            btab = _btabs(sc) if baseline else None
            tab = None if baseline else _tables(sc)
            unit = 0
            for by in range(comp_bh[ci]):
                for bx in range(comp_bw[ci]):
                    if ri and unit and unit % ri == 0:
                        _restart()
                    coef = coefs[ci][by, bx]
                    if baseline:
                        _baseline_unit(reader, btab[0], btab[1],
                                       coef, state, 0)
                    elif ss == 0:
                        _dc_unit(reader, tab, coef, ah, al,
                                 state, 0)
                    elif ah == 0:
                        _ac_first_unit(reader, tab, coef,
                                       ss, se, al, state)
                    else:
                        _ac_refine_unit(reader, tab, coef,
                                        ss, se, al, state)
                    unit += 1

    if baseline:
        # sequential files must cover every component (unlike
        # progressive, where later scans legitimately refine a
        # subset): a truncated multi-scan file would otherwise decode
        # its missing components as silently-flat zeros (review fix)
        missing = [c["id"] for c in comps if c["id"] not in covered]
        if missing:
            raise ValueError(
                f"multi-scan baseline JPEG is missing scans for "
                f"component ids {missing} (truncated file)")

    # dequantize + IDCT, vectorized across each component's blocks
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references a missing "
                             "quant table")
        arr = coefs[ci].astype(np.float64)
        bh_n, bw_n = arr.shape[:2]
        nat = np.zeros_like(arr)
        nat[..., _ZIGZAG] = arr           # de-zigzag
        blocks = nat.reshape(bh_n, bw_n, 8, 8) * q
        px = np.einsum("ab,ijbc,cd->ijad", _T.T, blocks, _T) + 128.0
        planes.append(px.transpose(0, 2, 1, 3)
                      .reshape(bh_n * 8, bw_n * 8))
    return planes


def _fancy_h2v1(p: np.ndarray) -> np.ndarray:
    """libjpeg's h2v1 fancy (triangular) horizontal chroma
    upsampling (jdsample.c semantics, r13): interior output pixels
    weight the near sample 3:1 against the neighbor with the
    bias-alternating +1/+2 rounding; edges replicate. This is what
    every libjpeg-family viewer shows, so the builtin decode now
    matches real decoders to within IDCT rounding."""
    a = p.astype(np.int64)
    hh, cw = a.shape
    out = np.empty((hh, cw * 2), np.int64)
    out[:, 0] = a[:, 0]
    out[:, -1] = a[:, -1]
    out[:, 2:-1:2] = (a[:, 1:] * 3 + a[:, :-1] + 1) >> 2
    out[:, 1:-2:2] = (a[:, :-1] * 3 + a[:, 1:] + 2) >> 2
    return out.astype(np.float64)


def _fancy_h2v2(p: np.ndarray) -> np.ndarray:
    """libjpeg's h2v2 fancy upsampling: vertical 3:1 column sums
    (edge rows replicate), then the horizontal 3:1 pass with the
    /16 rounding constants (+8 even, +7 odd)."""
    a = p.astype(np.int64)
    chh, cw = a.shape
    # colsum for output row r: near = in[r//2], far = in above/below
    near = np.repeat(a, 2, axis=0)
    far_idx = np.arange(chh * 2)
    far_idx = np.where(far_idx % 2 == 0, far_idx // 2 - 1,
                       far_idx // 2 + 1)
    far_idx = np.clip(far_idx, 0, chh - 1)
    far = a[far_idx]
    sums = near * 3 + far
    out = np.empty((chh * 2, cw * 2), np.int64)
    out[:, 0] = (sums[:, 0] * 4 + 8) >> 4
    out[:, -1] = (sums[:, -1] * 4 + 7) >> 4
    out[:, 2:-1:2] = (sums[:, 1:] * 3 + sums[:, :-1] + 8) >> 4
    out[:, 1:-2:2] = (sums[:, :-1] * 3 + sums[:, 1:] + 7) >> 4
    return out.astype(np.float64)


def _fancy_h1v2(p: np.ndarray) -> np.ndarray:
    """libjpeg-turbo's h1v2 fancy vertical upsampling: 3:1 against
    the adjacent row (edge rows replicate), +1/+2 rounding by output
    parity."""
    a = p.astype(np.int64)
    chh, cw = a.shape
    near = np.repeat(a, 2, axis=0)
    far_idx = np.arange(chh * 2)
    far_idx = np.clip(np.where(far_idx % 2 == 0, far_idx // 2 - 1,
                               far_idx // 2 + 1), 0, chh - 1)
    far = a[far_idx]
    rnd = np.where(np.arange(chh * 2) % 2 == 0, 1, 2)[:, None]
    return ((near * 3 + far + rnd) >> 2).astype(np.float64)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG payload to uint8 pixels
    — ``(h, w, 3)`` RGB for color, ``(h, w, 1)`` for grayscale."""
    frame, scans, qt = _parse_jpeg(data)
    if frame["progressive"] or len(scans) > 1:
        # multi-scan BASELINE (non-interleaved sequential) rides the
        # same coefficient-accumulating walk as progressive (r10)
        planes = _decode_progressive(frame, scans, qt)
    else:
        planes = _decode_baseline(frame, scans[0], qt)

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fx, fy = hmax // c["h"], vmax // c["v"]
        if (fx, fy) != (1, 1):
            # crop the padded plane to the component's true
            # downsampled size first — the fancy filters' edge
            # replication must see real edges, not block padding
            cw = -(-w * c["h"] // hmax)
            chh = -(-h * c["v"] // vmax)
            p = p[:chh, :cw]
        # fancy h2v1/h2v2 only when the downsampled width exceeds 2
        # — the exact libjpeg jdsample gate (narrower planes
        # replicate); h1v2 needs no horizontal neighbors, so
        # libjpeg-turbo selects it regardless of width
        fancy = p.shape[1] > 2
        if (fx, fy) == (2, 2) and fancy:
            p = _fancy_h2v2(p)
        elif (fx, fy) == (2, 1) and fancy:
            p = _fancy_h2v1(p)
        elif (fx, fy) == (1, 2):
            p = _fancy_h1v2(p)
        elif (fx, fy) != (1, 1):
            # everything else replicates — exactly libjpeg's
            # int_upsample fallback
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255) \
            .astype(np.uint8)[..., None]
    Y, Cb, Cr = full
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    b = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# -- progressive encoder (r10) ----------------------------------------------
# Each scan is generated as an op stream [(symbol|None, [(bits, n),
# ...]), ...] — symbol None means raw bits with no huffman code (DC
# refinement). Two passes per scan: collect symbols to build the
# scan's self-describing table, then emit. The scripts below mirror
# the classic libjpeg progression (DC first at Al=1 interleaved, AC
# spectral bands per component at Al=1, then the refinement scans).


def _dc_first_ops(blocks_by_comp: list, order: list,
                  al: int) -> list:
    """Interleaved DC first pass: ``order`` is the MCU-interleaved
    (comp_index, by, bx) walk; diffs are coded on the Al-shifted
    values (arithmetic shift, per the spec)."""
    ops = []
    pred = [0] * len(blocks_by_comp)
    for ci, by, bx in order:
        dc = int(blocks_by_comp[ci][by][bx][0]) >> al
        size, bits = _magnitude(dc - pred[ci])
        pred[ci] = dc
        ops.append((size, [(bits, size)] if size else []))
    return ops


def _dc_refine_ops(blocks_by_comp: list, order: list,
                   al: int) -> list:
    """DC refinement: one raw bit per block, no huffman symbols."""
    return [(None, [((int(blocks_by_comp[ci][by][bx][0]) >> al) & 1,
                     1)])
            for ci, by, bx in order]


def _ac_first_ops(blocks: list, ss: int, se: int, al: int) -> list:
    """AC first pass over one component's band: magnitudes of the
    Al-scaled coefficients (truncation toward zero), EOB runs
    spanning blocks."""
    ops = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            ops.append((nbits << 4,
                        [(eobrun & ((1 << nbits) - 1), nbits)]
                        if nbits else []))
            eobrun = 0

    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                ops.append((0xF0, []))
                r -= 16
            if v < 0:
                t = -t
            s, b = _magnitude(t)
            ops.append(((r << 4) | s, [(b, s)]))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops


def _ac_refine_ops(blocks: list, ss: int, se: int, al: int) -> list:
    """AC refinement over one component's band — the correction-bit
    algorithm (T.81 G.1.2.3 encoder side): newly-visible
    coefficients emit (run, sign), history coefficients buffer one
    correction bit each. Bit bookkeeping mirrors the classic two
    buffers: ``br`` holds the current block's bits since the last
    symbol (flushed right AFTER the next ZRL / run-sign symbol —
    that's where the decoder's walk reads them), ``be`` holds the
    bits of EOB-covered block tails (flushed right after the EOB-run
    symbol — the decoder's per-block correction tail reads them).
    ZRLs are emitted at EVERY nonzero while the run exceeds 15, so a
    history bit can never be buffered past the zeros its symbol
    covers."""
    ops = []
    eobrun = 0
    be: list[int] = []                    # EOB-attached bits
    br: list[int] = []                    # since-last-symbol bits

    def flush_eob():
        nonlocal eobrun, be
        if eobrun:
            nbits = eobrun.bit_length() - 1
            extra = ([(eobrun & ((1 << nbits) - 1), nbits)]
                     if nbits else [])
            ops.append((nbits << 4,
                        extra + [(b, 1) for b in be]))
            be = []
            eobrun = 0

    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        # last newly-visible coefficient bounds ZRL emission; runs
        # past it fold into the EOB run
        eobpos = -1
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = i
        r = 0
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush_eob()
                ops.append((0xF0, [(b, 1) for b in br]))
                br = []
                r -= 16
            if a > 1:
                # history coefficient: buffer its correction bit
                br.append(a & 1)
                continue
            # newly-visible coefficient (absv == 1)
            flush_eob()
            sign = 1 if int(zz[ss + i]) > 0 else 0
            ops.append(((r << 4) | 1,
                        [(sign, 1)] + [(b, 1) for b in br]))
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            be += br
            br = []
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops


def _emit_scan(out: bytearray, scomp_specs: list, ss: int, se: int,
               ah: int, al: int, ops: list, table_cls: int) -> None:
    """Write DHT (when the ops carry symbols) + SOS + entropy data
    for one progressive scan. ``ops`` is a list of restart SEGMENTS
    (each an op list; one segment when no restart interval) — RST
    markers separate them. ``scomp_specs`` is [(comp_id,)] — every
    scan uses table id 0 of its class, redefined per scan."""
    syms = [sym for seg in ops for sym, _ in seg if sym is not None]
    enc = None
    if syms:
        bits, values, enc = _fixed_length_code(syms)
        body = bytes([(table_cls << 4) | 0]) + bytes(bits) \
            + bytes(values)
        out += b"\xFF\xC4" + (2 + len(body)).to_bytes(2, "big") + body
    sos = bytearray()
    ns = len(scomp_specs)
    sos += (6 + 2 * ns).to_bytes(2, "big") + bytes([ns])
    for cid in scomp_specs:
        sos += bytes([cid, 0x00])         # DC table 0 / AC table 0
    sos += bytes([ss, se, (ah << 4) | al])
    out += b"\xFF\xDA" + sos
    for i, seg in enumerate(ops):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) & 7)])
        writer = _BitWriter()
        for sym, bitlist in seg:
            if sym is not None:
                code, length = enc[sym]
                writer.write(code, length)
            for val, n in bitlist:
                if n:
                    writer.write(val, n)
        writer.flush()
        out += writer.out


def _chunks(lst: list, n: int) -> list:
    """Restart-interval chunking; ``n == 0`` means one segment."""
    if not n:
        return [lst]
    return [lst[i:i + n] for i in range(0, len(lst), n)]


def _encode_progressive(out: bytearray, h: int, w: int, ncomp: int,
                        hs: list, vs: list, mcux: int, mcuy: int,
                        grids: list, ri: int = 0) -> bytes:
    """SOF2 + the scan script over per-component block grids
    (``grids[ci][by][bx]`` = zigzag int coefficients). ``ri`` emits
    restart markers every ``ri`` MCUs (interleaved DC scans) /
    blocks (non-interleaved AC scans — an MCU is one data unit
    there), with predictor and EOB-run state reset per segment —
    the generators produce each segment with fresh state, so the
    reset falls out of the call structure."""
    hmax, vmax = max(hs), max(vs)
    sof = bytearray()
    sof += (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (hs[ci] << 4) | vs[ci],
                      0 if ci == 0 else 1])
    out += b"\xFF\xC2" + sof

    # interleaved walk, grouped by MCU (the restart unit)
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            one = []
            for ci in range(ncomp):
                for v in range(vs[ci]):
                    for hh in range(hs[ci]):
                        one.append((ci, my * vs[ci] + v,
                                    mx * hs[ci] + hh))
            mcus.append(one)
    all_ids = list(range(1, ncomp + 1))
    # non-interleaved rasters cover exactly the visible blocks
    rasters = []
    for ci in range(ncomp):
        cw = -(-(w * hs[ci]) // hmax)
        ch = -(-(h * vs[ci]) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        rasters.append([grids[ci][by][bx]
                        for by in range(bh) for bx in range(bw)])

    def dc_segments(fn, al):
        return [fn(grids, [u for m in grp for u in m], al)
                for grp in _chunks(mcus, ri)]

    bands = [(1, 5), (6, 63)]
    # 1. DC first, all components, Al=1
    _emit_scan(out, all_ids, 0, 0, 0, 1,
               dc_segments(_dc_first_ops, 1), 0)
    # 2. AC first per component per band, Al=1
    for ci in range(ncomp):
        for (bs, be) in bands:
            _emit_scan(out, [ci + 1], bs, be, 0, 1,
                       [_ac_first_ops(grp, bs, be, 1)
                        for grp in _chunks(rasters[ci], ri)], 1)
    # 3. DC refinement (raw bits)
    _emit_scan(out, all_ids, 0, 0, 1, 0,
               dc_segments(_dc_refine_ops, 0), 0)
    # 4. AC refinement per component per band
    for ci in range(ncomp):
        for (bs, be) in bands:
            _emit_scan(out, [ci + 1], bs, be, 1, 0,
                       [_ac_refine_ops(grp, bs, be, 0)
                        for grp in _chunks(rasters[ci], ri)], 1)
    out += b"\xFF\xD9"
    return bytes(out)


# -- encoder ----------------------------------------------------------------


def _block_symbols(blocks: list[np.ndarray]) -> tuple[list, list, list]:
    """Per-block (dc_size, dc_bits, ac_ops) streams + the symbol
    alphabets, computed once so the self-describing tables cover
    exactly what the stream uses."""
    dc_syms, ac_syms, ops = [], [], []
    prev = 0
    for blk in blocks:
        zz = blk.reshape(64)[_ZIGZAG]
        dc = int(zz[0])
        size, bits = _magnitude(dc - prev)
        prev = dc
        dc_syms.append(size)
        ac_ops = []
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_ops.append((0xF0, 0, 0))          # ZRL
                ac_syms.append(0xF0)
                run -= 16
            s, b = _magnitude(v)
            ac_ops.append(((run << 4) | s, s, b))
            ac_syms.append((run << 4) | s)
            run = 0
        if last_nz < 63:
            ac_ops.append((0x00, 0, 0))              # EOB
            ac_syms.append(0x00)
        ops.append((size, bits, ac_ops))
    return dc_syms, ac_syms, ops


def _grid_from_mcu_blocks(blocks: list, mcux: int, mcuy: int,
                          hs: int, vs: int) -> list:
    """MCU-interleaved block list → 2D raster grid of zigzag int
    coefficient arrays (the progressive scans' addressing)."""
    g = [[None] * (mcux * hs) for _ in range(mcuy * vs)]
    i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for v in range(vs):
                for hh in range(hs):
                    g[my * vs + v][mx * hs + hh] = \
                        blocks[i].reshape(64)[_ZIGZAG].astype(int)
                    i += 1
    return g


def encode_jpeg(arr: np.ndarray, *, quality: int = 90,
                subsampling: str = "4:4:4",
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """Encode uint8 pixels (``(h, w, 3)`` RGB, ``(h, w, 1)`` or
    ``(h, w)`` grayscale) as a JFIF JPEG — baseline SOF0 by default,
    progressive SOF2 with ``progressive=True`` (r10; same quantized
    coefficients, so decoding either encode of an image yields
    identical pixels). See the module docstring for the table
    strategy; ``subsampling`` is ``"4:4:4"`` or ``"4:2:0"``."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[..., None]
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg wants uint8 (h, w, 1|3) pixels")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    h, w, nc = a.shape
    gray = nc == 1
    sub = subsampling == "4:2:0" and not gray
    qlum, qchr = _quality_tables(quality)

    if gray:
        planes = [a[..., 0].astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        R, G, B = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = 128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B
        Cr = 128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B
        planes = [Y, Cb, Cr]

    hs = [2 if sub else 1, 1, 1][:len(planes)]
    vs = [2 if sub else 1, 1, 1][:len(planes)]
    hmax, vmax = max(hs), max(vs)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for ci, p in enumerate(planes):
        if hs[ci] != hmax or vs[ci] != vmax:
            # chroma downsample by box mean over the padded frame
            ph = mcuy * vmax * 8
            pw = mcux * hmax * 8
            fullp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            fy, fx = vmax // vs[ci], hmax // hs[ci]
            p = fullp.reshape(ph // fy, fy, pw // fx, fx).mean((1, 3))
        else:
            ph = mcuy * vs[ci] * 8
            pw = mcux * hs[ci] * 8
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                       mode="edge")
        padded.append(p)

    # forward DCT + quantize every block, in MCU-interleaved order
    comp_blocks: list[list[np.ndarray]] = [[] for _ in planes]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(padded):
                q = qlum if ci == 0 else qchr
                for v in range(vs[ci]):
                    for hh in range(hs[ci]):
                        y0 = (my * vs[ci] + v) * 8
                        x0 = (mx * hs[ci] + hh) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _T @ blk @ _T.T
                        comp_blocks[ci].append(
                            np.round(coef / q.reshape(8, 8)))

    # symbol streams per table class (luma table 0, chroma table 1)
    streams = [_block_symbols(bs) for bs in comp_blocks]
    lum_dc, lum_ac = streams[0][0], streams[0][1]
    chr_dc = [s for st in streams[1:] for s in st[0]]
    chr_ac = [s for st in streams[1:] for s in st[1]]
    tables = {}
    for key, syms in (("dc0", lum_dc), ("ac0", lum_ac),
                      ("dc1", chr_dc), ("ac1", chr_ac)):
        if key.startswith("dc"):
            # restart intervals reset the predictor, changing diff
            # categories vs the collection pass — cover all 12
            syms = list(syms) + list(range(12))
        else:
            syms = list(syms) + [0x00, 0xF0]
        tables[key] = _fixed_length_code(syms)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, tab):
        z = tab.reshape(64)[_ZIGZAG].astype(int)
        return b"\xFF\xDB" + (67).to_bytes(2, "big") \
            + bytes([tid]) + bytes(int(x) for x in z)

    out += dqt(0, qlum)
    if not gray:
        out += dqt(1, qchr)

    if progressive:
        if restart_interval:
            out += b"\xFF\xDD" + (4).to_bytes(2, "big") \
                + int(restart_interval).to_bytes(2, "big")
        grids = [_grid_from_mcu_blocks(comp_blocks[ci], mcux, mcuy,
                                       hs[ci], vs[ci])
                 for ci in range(len(planes))]
        return _encode_progressive(out, h, w, len(planes), hs, vs,
                                   mcux, mcuy, grids,
                                   ri=int(restart_interval))

    ncomp = len(planes)
    sof = bytearray()
    sof += (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (hs[ci] << 4) | vs[ci],
                      0 if ci == 0 else 1])
    out += b"\xFF\xC0" + sof

    def dht(cls, tid, bits, values):
        body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        return b"\xFF\xC4" + (2 + len(body)).to_bytes(2, "big") + body

    out += dht(0, 0, *tables["dc0"][:2])
    out += dht(1, 0, *tables["ac0"][:2])
    if not gray:
        out += dht(0, 1, *tables["dc1"][:2])
        out += dht(1, 1, *tables["ac1"][:2])
    if restart_interval:
        out += b"\xFF\xDD" + (4).to_bytes(2, "big") \
            + int(restart_interval).to_bytes(2, "big")

    sos = bytearray()
    sos += (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3F\x00"
    out += b"\xFF\xDA" + sos

    # entropy-coded data, MCU-interleaved, with restart markers
    writer = _BitWriter()
    enc_dc = [tables["dc0"][2]] + [tables["dc1"][2]] * (ncomp - 1)
    enc_ac = [tables["ac0"][2]] + [tables["ac1"][2]] * (ncomp - 1)
    idx = [0] * ncomp
    pred = [0] * ncomp
    blocks_per_mcu = [hs[ci] * vs[ci] for ci in range(ncomp)]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out += writer.out
            writer = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            pred = [0] * ncomp
        for ci in range(ncomp):
            for _ in range(blocks_per_mcu[ci]):
                blk = comp_blocks[ci][idx[ci]]
                idx[ci] += 1
                zz = blk.reshape(64)[_ZIGZAG]
                dc = int(zz[0])
                size, bits = _magnitude(dc - pred[ci])
                pred[ci] = dc
                code, length = enc_dc[ci][size]
                writer.write(code, length)
                if size:
                    writer.write(bits, size)
                run = 0
                last_nz = 0
                for k in range(1, 64):
                    if zz[k] != 0:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc_ac[ci][0xF0]
                        writer.write(code, length)
                        run -= 16
                    s, b = _magnitude(v)
                    code, length = enc_ac[ci][(run << 4) | s]
                    writer.write(code, length)
                    if s:
                        writer.write(b, s)
                    run = 0
                if last_nz < 63:
                    code, length = enc_ac[ci][0x00]
                    writer.write(code, length)
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)
