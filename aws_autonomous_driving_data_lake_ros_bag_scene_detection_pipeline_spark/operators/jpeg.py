"""Builtin baseline JPEG codec (r8) — closes the last multimodal
dependency gap: ``decode_image`` previously required Pillow for JPEG
payloads (an honest ``NotImplementedError`` guard); this module
decodes baseline JFIF/JPEG with numpy only, so the most common image
format in any web-scraped corpus decodes on a stock executor.

Scope (documented, guarded):

- **Decoder**: baseline sequential DCT (SOF0), 8-bit samples, 1 or 3
  components, any sampling factors up to 2x2 (covers 4:4:4, 4:2:2,
  4:2:0), restart markers, multi-table DQT/DHT segments, byte
  stuffing. Progressive (SOF2) and arithmetic coding raise
  ``NotImplementedError`` naming the variant — same honesty contract
  as the other codec guards.
- **Encoder** (round-trip testing + thumbnail writing): baseline
  SOF0, quality-scaled Annex-K quantization matrices, 4:4:4 or 4:2:0,
  optional restart interval. Huffman tables are built PER IMAGE as
  fixed-length canonical codes and written into the stream's DHT
  segments — JPEG tables are self-describing, so the encoder needs no
  memorized standard code tables and any spec-compliant decoder
  (including this module's, and Pillow where present) reads the
  output. Compression ratio is sacrificed for simplicity; the decoder
  of course handles the optimal tables real-world files carry.

Everything is plain numpy over one payload — the Spark side stays the
same Arrow-batched ``decode_image`` plumbing; only the codec dispatch
gained a branch. Format knowledge is the public ITU-T T.81 / JFIF
spec."""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG payload to uint8 pixels —
    ``(h, w, 3)`` RGB for color, ``(h, w, 1)`` for grayscale."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
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
        elif marker == 0xC0 or marker == 0xC1:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], \
                    seg[8 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4,
                              "v": samp & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else \
                f"SOF{marker - 0xC0}"
            raise NotImplementedError(
                f"JPEG variant {kind} is not supported by the builtin "
                f"baseline decoder; install Pillow for full coverage")
        elif marker == 0xDA:                # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scomps.append({"id": cid, "td": tabs >> 4,
                               "ta": tabs & 0x0F})
            scan = {"comps": scomps, "data_at": pos + seglen}
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in scan["comps"]}
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))

    # split entropy data at restart markers so each interval decodes
    # from a clean bit/predictor state
    raw = data[scan["data_at"]:]
    segments = []
    i = 0
    start = 0
    while i < len(raw) - 1:
        if raw[i] == 0xFF and raw[i + 1] != 0x00:
            m = raw[i + 1]
            if m == 0xFF:
                # T.81 B.1.1.2 permits runs of 0xFF fill bytes before
                # a marker; they are padding, not a marker and not
                # entropy data the reader will consume — skip forward
                # (the run's final 0xFF + marker byte terminate below)
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

    h, w = frame["h"], frame["w"]
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
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


def encode_jpeg(arr: np.ndarray, *, quality: int = 90,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """Encode uint8 pixels (``(h, w, 3)`` RGB, ``(h, w, 1)`` or
    ``(h, w)`` grayscale) as a baseline JFIF JPEG. See the module
    docstring for the table strategy; ``subsampling`` is ``"4:4:4"``
    or ``"4:2:0"``."""
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
