"""Builtin WebP VP8L (lossless) decoder — pure stdlib + numpy (r12).

WebP is the WARC front door's most common modern image format (more
common than GIF on today's web); this implements the public *WebP
Lossless Bitstream Specification* (the VP8L chunk: LSB-first bit
stream, canonical prefix codes with the code-length code, optional
meta-prefix partitioning, LZ77 with the 120-entry 2-D distance
neighborhood, color cache, and the four inverse transforms — predictor
(14 modes), color, subtract-green, color-indexing with pixel
bundling). Lossy VP8 stills decode builtin too since r13
(:mod:`.vp8`, intra keyframes from RFC 6386, byte-exact against
libwebp); this module owns the container walk and dispatches.

Same family discipline as the other builtin codecs (multimodal.py,
jpeg.py, flac.py): spec-built golden files in tests/test_vp8l.py,
hostile-bytes totality (every malformed input raises ``ValueError``
with the offending structure named), and decode_image/media_metadata
integration so the Spark-side plumbing is identical whichever codec
path runs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_vp8l", "decode_webp", "parse_webp_container",
           "parse_webp_frames"]


class _Bits:
    """LSB-first bit reader over the VP8L stream — an accumulator
    window refilled a byte at a time (each read is O(1) int ops, not
    a per-bit loop; the entropy decode below calls this per symbol
    bit, so this is the decoder's hot path)."""

    def __init__(self, data: bytes):
        self.data = data
        self.byte = 0                     # next byte to refill from
        self.acc = 0                      # pending bits, LSB first
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.byte >= len(self.data):
                raise ValueError("VP8L: bit stream truncated")
            self.acc |= self.data[self.byte] << self.nbits
            self.byte += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek8(self) -> int:
        """Up to 8 lookahead bits (zero-padded at EOF) for the
        table-driven prefix decode."""
        while self.nbits < 8 and self.byte < len(self.data):
            self.acc |= self.data[self.byte] << self.nbits
            self.byte += 1
            self.nbits += 8
        return self.acc & 0xFF

    def skip(self, n: int) -> None:
        if self.nbits < n:
            raise ValueError("VP8L: bit stream truncated")
        self.acc >>= n
        self.nbits -= n


class _Prefix:
    """Canonical prefix code: bit-by-bit decode (codes are emitted
    MSB-of-code-first into the LSB-first stream, DEFLATE-style)."""

    def __init__(self, lengths):
        self.single = None
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        # canonical assignment: by length, then symbol order
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        max_len = max(ln for ln, _ in nz)
        count = [0] * (max_len + 1)
        for ln, _ in nz:
            count[ln] += 1
        next_code = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            code = (code + count[ln - 1]) << 1
            next_code[ln] = code
        # first-level LUT: the next 8 stream bits (LSB-first) resolve
        # any code of length <= 8 in one lookup — the common case for
        # every real tree; longer codes fall back to the bit walk
        self.lut: list[tuple[int, int] | None] = [None] * 256
        for ln, sym in sorted(nz):
            code = next_code[ln]
            self.table[(ln, code)] = sym
            next_code[ln] += 1
            if ln <= 8:
                rev = 0
                for i in range(ln):
                    rev |= ((code >> (ln - 1 - i)) & 1) << i
                for j in range(1 << (8 - ln)):
                    self.lut[rev | (j << ln)] = (sym, ln)
        # over-subscribed / incomplete codes are corrupt streams
        kraft = sum(1 << (max_len - ln) for ln, _ in nz)
        if kraft != (1 << max_len):
            raise ValueError("VP8L: invalid (non-canonical) prefix "
                             "code lengths")

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        hit = self.lut[br.peek8()]
        if hit is not None:
            sym, ln = hit
            br.skip(ln)
            return sym
        code, ln = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > 15:
                raise ValueError("VP8L: prefix code read past 15 bits")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
              11, 12, 13, 14, 15]


def _read_prefix_code(br: _Bits, alphabet: int) -> _Prefix:
    """One prefix code: the 'simple' 1-2 symbol form or the full
    code-length-coded form (spec §5.2.2)."""
    if br.read(1):                       # simple
        num = br.read(1) + 1
        if br.read(1):
            first = br.read(8)
        else:
            first = br.read(1)
        lengths = [0] * alphabet
        if first >= alphabet:
            raise ValueError("VP8L: simple code symbol out of range")
        if num == 2:
            second = br.read(8)
            if second >= alphabet or second == first:
                raise ValueError("VP8L: simple code symbol invalid")
            lengths[first] = lengths[second] = 1
        else:
            lengths[first] = 1
        return _Prefix(lengths)
    # code lengths are themselves prefix coded
    num_codes = 4 + br.read(4)
    clc = [0] * 19
    for i in range(num_codes):
        clc[_CLC_ORDER[i]] = br.read(3)
    cl_tree = _Prefix(clc)
    if br.read(1):                       # bounded symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_tree.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i >= alphabet:
                    raise ValueError("VP8L: code-length repeat "
                                     "overruns the alphabet")
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:                            # 18
            i += 11 + br.read(7)
        if i > alphabet:
            raise ValueError("VP8L: code-length repeat overruns the "
                             "alphabet")
    return _Prefix(lengths)


# 2-D neighborhood for distance codes 1..120 (spec §4.2.2), (dx, dy)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _lz77_value(br: _Bits, sym: int) -> int:
    """Length/distance prefix value (spec §4.2.2): 24/40-symbol
    alphabets with extra bits past symbol 3."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


class _Groups:
    """The 5 prefix codes of one meta group."""

    __slots__ = ("g", "r", "b", "a", "d")

    def __init__(self, br, cache_size):
        self.g = _read_prefix_code(br, 256 + 24 + cache_size)
        self.r = _read_prefix_code(br, 256)
        self.b = _read_prefix_code(br, 256)
        self.a = _read_prefix_code(br, 256)
        self.d = _read_prefix_code(br, 40)


def _decode_entropy_coded(br: _Bits, w: int, h: int,
                          level0: bool) -> np.ndarray:
    """The spatially-coded ARGB image (spec §5.2): optional color
    cache, optional meta-prefix partitioning (level-0 only), LZ77 over
    the row-major pixel sequence. Returns uint32 ARGB of shape
    (h, w)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: color cache bits {cache_bits} "
                             f"out of range 1..11")
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read(1):            # meta prefix codes
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_coded(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [_Groups(br, cache_size) for _ in range(n_groups)]
    cache = [0] * cache_size

    out = np.zeros(w * h, dtype=np.uint32)
    n = w * h
    pos = 0

    def push(argb):
        if cache_bits:
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF)
                  >> (32 - cache_bits)] = argb

    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            grp = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            grp = groups[0]
        s = grp.g.read(br)
        if s < 256:                      # literal
            r = grp.r.read(br)
            b = grp.b.read(br)
            a = grp.a.read(br)
            argb = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = argb
            push(argb)
            pos += 1
        elif s < 256 + 24:               # LZ77 backward reference
            length = _lz77_value(br, s - 256)
            dist_code = _lz77_value(br, grp.d.read(br))
            dist = _plane_dist(dist_code, w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before "
                                 "the image start")
            if pos + length > n:
                raise ValueError("VP8L: backward reference past the "
                                 "image end")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                push(argb)
                pos += 1
        else:                            # color cache
            if not cache_bits:
                raise ValueError("VP8L: cache symbol without a color "
                                 "cache")
            idx = s - 256 - 24
            argb = cache[idx]
            out[pos] = argb
            # spec: cache hits re-insert (no-op) — keep push for parity
            push(argb)
            pos += 1
    return out.reshape(h, w)


# ------------------------------------------------------ transforms
def _sub_image(br: _Bits, bits: int, w: int, h: int) -> np.ndarray:
    tw = (w + (1 << bits) - 1) >> bits
    th = (h + (1 << bits) - 1) >> bits
    return _decode_entropy_coded(br, tw, th, False)


def _channels(p):
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF,
            (p >> 8) & 0xFF, p & 0xFF)


def _pack(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) \
        | ((g & 0xFF) << 8) | (b & 0xFF)


def _average2(p, q):
    pa, pr, pg, pb = _channels(p)
    qa, qr, qg, qb = _channels(q)
    return _pack((pa + qa) // 2, (pr + qr) // 2,
                 (pg + qg) // 2, (pb + qb) // 2)


def _select(l, t, tl):  # noqa: E741 — spec names
    la, lr, lg, lb = _channels(l)
    ta, tr, tg, tb = _channels(t)
    xa, xr, xg, xb = _channels(tl)
    # libwebp Select(T, L, TL): T wins when sum|L-TL| <= sum|T-TL|
    # (ties go to T — the r12 review caught the flipped tie-break)
    d_l = (abs(la - xa) + abs(lr - xr) + abs(lg - xg) + abs(lb - xb))
    d_t = (abs(ta - xa) + abs(tr - xr) + abs(tg - xg) + abs(tb - xb))
    return t if d_l <= d_t else l


def _clamp(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def _half_to_zero(d: int) -> int:
    """C integer division by 2 truncates TOWARD ZERO; Python's //
    floors — they differ on odd negatives (-3//2 = -2 vs -1), which
    is exactly the ClampAddSubtractHalf delta term."""
    return d // 2 if d >= 0 else -((-d) // 2)


def _cas_full(l, t, tl):  # noqa: E741
    la, lr, lg, lb = _channels(l)
    ta, tr, tg, tb = _channels(t)
    xa, xr, xg, xb = _channels(tl)
    return _pack(_clamp(la + ta - xa), _clamp(lr + tr - xr),
                 _clamp(lg + tg - xg), _clamp(lb + tb - xb))


def _cas_half(avg, tl):
    aa, ar, ag, ab = _channels(avg)
    xa, xr, xg, xb = _channels(tl)

    def ch(a, x):
        return _clamp(a + _half_to_zero(a - x))
    return _pack(ch(aa, xa), ch(ar, xr), ch(ag, xg), ch(ab, xb))


def _predict(mode: int, argb: np.ndarray, x: int, y: int) -> int:
    w = argb.shape[1]
    L = int(argb[y, x - 1]) if x > 0 else 0      # noqa: N806
    T = int(argb[y - 1, x]) if y > 0 else 0      # noqa: N806
    TL = int(argb[y - 1, x - 1]) if x > 0 and y > 0 else 0  # noqa: N806
    # TR at the last column wraps to the CURRENT row's first pixel
    # (the libwebp row-buffer layout, part of the de-facto format)
    if y > 0:
        TR = int(argb[y - 1, x + 1]) if x + 1 < w \
            else int(argb[y, 0])                 # noqa: N806
    else:
        TR = 0                                   # noqa: N806
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _average2(_average2(L, TR), T)
    if mode == 6:
        return _average2(L, TL)
    if mode == 7:
        return _average2(L, T)
    if mode == 8:
        return _average2(TL, T)
    if mode == 9:
        return _average2(T, TR)
    if mode == 10:
        return _average2(_average2(L, TL), _average2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return _cas_full(L, T, TL)
    if mode == 13:
        return _cas_half(_average2(L, T), TL)
    raise ValueError(f"VP8L: predictor mode {mode} out of range 0..13")


def _inv_predictor(argb: np.ndarray, modes: np.ndarray,
                   bits: int) -> None:
    h, w = argb.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[0, x - 1])       # L
            elif x == 0:
                pred = int(argb[y - 1, 0])       # T
            else:
                mode = (int(modes[y >> bits, x >> bits]) >> 8) & 0xFF
                pred = _predict(mode, argb, x, y)
            cur = int(argb[y, x])
            pa, pr, pg, pb = _channels(pred)
            ca, cr, cg, cb = _channels(cur)
            argb[y, x] = _pack(ca + pa, cr + pr, cg + pg, cb + pb)


def _inv_color_transform(argb: np.ndarray, elems: np.ndarray,
                         bits: int) -> None:
    """Vectorized inverse color transform: unlike the predictor, each
    pixel depends only on itself and its tile's element, so the whole
    plane is elementwise numpy (signed 3.5 fixed multipliers via int8
    views; numpy's >> on int32 is arithmetic, matching the spec's
    signed shift)."""
    h, w = argb.shape
    e = elems[np.ix_(np.arange(h) >> bits, np.arange(w) >> bits)]
    g2r = (e & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
    g2b = ((e >> 8) & 0xFF).astype(np.uint8).astype(np.int8) \
        .astype(np.int32)
    r2b = ((e >> 16) & 0xFF).astype(np.uint8).astype(np.int8) \
        .astype(np.int32)
    a = (argb >> 24) & 0xFF
    r = ((argb >> 16) & 0xFF).astype(np.int32)
    g = (argb >> 8) & 0xFF
    b = (argb & 0xFF).astype(np.int32)
    gs = g.astype(np.uint8).astype(np.int8).astype(np.int32)
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = r.astype(np.uint8).astype(np.int8).astype(np.int32)
    b = (b + ((g2b * gs) >> 5)) & 0xFF
    b = (b + ((r2b * rs) >> 5)) & 0xFF
    argb[...] = ((a.astype(np.uint32) << 24)
                 | (r.astype(np.uint32) << 16)
                 | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inv_subtract_green(argb: np.ndarray) -> None:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    argb[...] = (argb & 0xFF00FF00) | (r << 16) | b


def _inv_color_index(packed: np.ndarray, palette: np.ndarray,
                     w: int) -> np.ndarray:
    """Palette lookup + un-bundling back to full width."""
    size = palette.shape[0]
    if size <= 2:
        wb = 3
    elif size <= 4:
        wb = 2
    elif size <= 16:
        wb = 1
    else:
        wb = 0
    h = packed.shape[0]
    out = np.zeros((h, w), dtype=np.uint32)
    if wb == 0:
        idx = (packed >> 8) & 0xFF
        if int(idx.max(initial=0)) >= size:
            raise ValueError("VP8L: palette index out of range")
        out[...] = palette[idx[:, :w]]
        return out
    bpp = 8 >> wb                         # bits per pixel
    per = 1 << wb                         # pixels per packed byte
    cols = np.arange(w)
    bvals = (packed[:, cols >> wb] >> 8) & 0xFF
    idx = (bvals >> ((cols % per) * bpp)[None, :]) & ((1 << bpp) - 1)
    if int(idx.max(initial=0)) >= size:
        raise ValueError("VP8L: palette index out of range")
    out[...] = palette[idx]
    return out


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk body → uint8 pixel array of shape (h, w, 4) RGBA
    (or (h, w, 3) RGB when the header's alpha hint is unset). Raises
    ``ValueError`` on any malformed structure."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte (want 0x2f)")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L: version {version} (spec pins 0)")
    argb = _decode_vp8l_body(br, w, h)
    a = ((argb >> 24) & 0xFF).astype(np.uint8)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    if has_alpha:
        return np.stack([r, g, b, a], axis=-1)
    return np.stack([r, g, b], axis=-1)


def _decode_vp8l_body(br, w: int, h: int) -> np.ndarray:
    """Transforms + entropy-coded image + inverse transforms for a
    VP8L stream whose dimensions are already known — shared by the
    headered still path and the header-LESS ``ALPH`` alpha-plane
    variant (the container spec reuses the lossless format with
    implicit dims there). Returns the (h, w) uint32 ARGB plane."""
    # transforms, read order = reverse application order
    transforms = []
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError(f"VP8L: transform {ttype} repeated")
        seen.add(ttype)
        if ttype == 0:                   # predictor
            bits = br.read(3) + 2
            transforms.append(("pred", bits,
                               _sub_image(br, bits, xsize, h)))
        elif ttype == 1:                 # color
            bits = br.read(3) + 2
            transforms.append(("color", bits,
                               _sub_image(br, bits, xsize, h)))
        elif ttype == 2:                 # subtract green
            transforms.append(("subg", None, None))
        else:                            # color indexing
            size = br.read(8) + 1
            pal_deltas = _decode_entropy_coded(br, size, 1, False)[0]
            pal = np.zeros(size, dtype=np.uint32)
            acc = 0
            for i in range(size):
                d = int(pal_deltas[i])
                da, dr, dg, db = _channels(d)
                aa, ar, ag, ab = _channels(acc)
                acc = _pack(aa + da, ar + dr, ag + dg, ab + db)
                pal[i] = acc
            transforms.append(("cidx", None, pal))
            if size <= 2:
                xsize = (xsize + 7) >> 3
            elif size <= 4:
                xsize = (xsize + 3) >> 2
            elif size <= 16:
                xsize = (xsize + 1) >> 1

    argb = _decode_entropy_coded(br, xsize, h, True)

    for kind, bits, data in reversed(transforms):
        if kind == "cidx":
            argb = _inv_color_index(argb, data, w)
        elif kind == "subg":
            _inv_subtract_green(argb)
        elif kind == "pred":
            _inv_predictor(argb, data, bits)
        else:
            _inv_color_transform(argb, data, bits)
    return argb


def decode_alpha_chunk(body: bytes, w: int, h: int) -> np.ndarray:
    """``ALPH`` chunk body → (h, w) uint8 alpha plane (the lossy-
    with-alpha companion: VP8 carries RGB, ALPH the alpha). One
    header byte: bits 0-1 compression (0 = raw bytes, 1 = header-less
    VP8L stream with alpha in the GREEN channel), bits 2-3 the
    per-row predictive filter (none/horizontal/vertical/gradient,
    inverted here exactly as libwebp's unfilters: the first pixel of
    a row predicts from the pixel above, the first row from the
    left, all mod-256), bits 4-5 pre-processing (a dithering hint —
    ignored on decode by spec)."""
    if not body:
        raise ValueError("ALPH: empty chunk")
    head = body[0]
    compression = head & 0x03
    filt = (head >> 2) & 0x03
    if compression == 0:
        need = w * h
        if len(body) - 1 < need:
            raise ValueError(
                f"ALPH: raw plane truncated: {len(body) - 1} bytes "
                f"< {need}")
        plane = np.frombuffer(body, np.uint8, count=need,
                              offset=1).reshape(h, w).copy()
    elif compression == 1:
        argb = _decode_vp8l_body(_Bits(body[1:]), w, h)
        plane = ((argb.reshape(h, w) >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"ALPH: reserved compression method "
                         f"{compression}")
    if filt:
        plane = plane.astype(np.int64)
        prev = None
        for y in range(h):
            row = plane[y]
            if prev is None:
                np.cumsum(row, out=row)
                row &= 0xFF
            elif filt == 1:                  # horizontal
                row[0] = (row[0] + prev[0]) & 0xFF
                np.cumsum(row, out=row)
                row &= 0xFF
            elif filt == 2:                  # vertical
                row += prev
                row &= 0xFF
            else:                            # gradient
                left = tl = int(prev[0])
                for x in range(w):
                    top = int(prev[x])
                    g = left + top - tl
                    g = 0 if g < 0 else 255 if g > 255 else g
                    left = (int(row[x]) + g) & 0xFF
                    row[x] = left
                    tl = top
            prev = row
        plane = plane.astype(np.uint8)
    return plane


def parse_webp_container(payload: bytes) -> dict:
    """RIFF/WEBP chunk walk: ``{"codec": 'vp8l'|'vp8'|'vp8x',
    "vp8l": bytes|None, "width", "height", "has_alpha", "n_frames"}``.
    Dims come from the codec payload (VP8L header / VP8 frame tag /
    VP8X canvas); ANMF frames are counted, not decoded."""
    if len(payload) < 16 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos = 12
    out = {"codec": None, "vp8l": None, "vp8": None, "alph": None,
           "width": None, "height": None,
           "has_alpha": False, "n_frames": 0, "animated": False}
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"WEBP: chunk {cid!r} truncated")
        if cid == b"VP8L" and out["vp8l"] is None:
            out["codec"] = out["codec"] or "vp8l"
            out["vp8l"] = body
            if len(body) >= 5 and body[0] == 0x2F:
                bits = int.from_bytes(body[1:5], "little")
                out["width"] = (bits & 0x3FFF) + 1
                out["height"] = ((bits >> 14) & 0x3FFF) + 1
                out["has_alpha"] = bool((bits >> 28) & 1)
            out["n_frames"] = max(out["n_frames"], 1)
        elif cid == b"VP8 ":
            out["codec"] = out["codec"] or "vp8"
            if out.get("vp8") is None:
                out["vp8"] = body
            # lossy frame tag: 3-byte frame header, then the start
            # code 9d 01 2a and 14-bit dims
            if len(body) >= 10 and body[3:6] == b"\x9d\x01\x2a":
                out["width"] = int.from_bytes(body[6:8],
                                              "little") & 0x3FFF
                out["height"] = int.from_bytes(body[8:10],
                                               "little") & 0x3FFF
            out["n_frames"] = max(out["n_frames"], 1)
        elif cid == b"VP8X":
            out["codec"] = "vp8x"
            if size >= 10:
                flags = body[0]
                out["has_alpha"] = bool(flags & 0x10)
                out["animated"] = out["animated"] or bool(flags & 0x02)
                out["width"] = int.from_bytes(body[4:7], "little") + 1
                out["height"] = int.from_bytes(body[7:10],
                                               "little") + 1
        elif cid == b"ALPH" and out.get("alph") is None:
            out["alph"] = body
        elif cid == b"ANMF":
            out["n_frames"] += 1
            out["animated"] = True
        pos += 8 + size + (size & 1)     # chunks are word-aligned
    if out["codec"] is None:
        raise ValueError("WEBP: no VP8/VP8L/VP8X chunk")
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """Whole-file WebP decode: container walk + :func:`decode_vp8l`
    (lossless) or :func:`..operators.vp8.decode_vp8` (lossy keyframe
    — r13, builtin from RFC 6386, byte-exact against libwebp).
    A VP8X file with neither bitstream raises naming what's left
    (e.g. a standalone ALPH-only fragment)."""
    info = parse_webp_container(payload)
    if info["vp8l"] is not None:
        return decode_vp8l(info["vp8l"])
    if info["vp8"] is not None:
        from .vp8 import decode_vp8
        rgb = decode_vp8(info["vp8"])
        if info["alph"] is not None:
            a = decode_alpha_chunk(info["alph"], rgb.shape[1],
                                   rgb.shape[0])
            return np.concatenate([rgb, a[..., None]], axis=-1)
        return rgb
    raise ValueError(
        f"WEBP: {info['codec']} container carries no VP8/VP8L "
        f"bitstream to decode")


def parse_webp_frames(payload: bytes, *,
                      _sample_every: int = 1) -> dict:
    """Animated-WebP face of the video demux contract
    (:func:`..operators.multimodal.parse_gif_frames` twin):
    ``{"width", "height", "us_per_frame", "codec", "frames"}`` with
    every frame a PPM-wrapped RGB payload of the COMPOSED canvas —
    ANMF placement (2-px units), blend/no-blend flags (8-bit alpha
    compositing), dispose-to-background honored; a still VP8L file
    comes back as one frame. Lossless (VP8L) subframes decode
    builtin; a lossy (VP8) subframe raises naming the Pillow seam.
    Decode is sequential (frame k composes onto frame k-1's canvas)
    but with ``_sample_every > 1`` only sampled canvases materialize
    (``"sampled_every"`` reported — the parse_gif_frames split).
    PPM output drops alpha by compositing the final canvas over
    opaque black (PPM has no alpha plane)."""
    from .multimodal import _rgb_to_ppm

    info = parse_webp_container(payload)
    w, h = info["width"], info["height"]
    if w is None or h is None:
        raise ValueError("WEBP: no canvas dimensions")

    def rgba_of(sub: bytes, alph: bytes | None = None) -> np.ndarray:
        if sub[:1] != b"\x2f":
            # lossy (VP8) subframe: every ANMF frame is its own
            # keyframe — decode builtin (r13); alpha from the ALPH
            # sidecar chunk when present, else opaque
            from .vp8 import decode_vp8
            arr = decode_vp8(sub)
        else:
            arr = decode_vp8l(sub)
        if arr.shape[2] == 3:
            if alph is not None:
                a = decode_alpha_chunk(alph, arr.shape[1],
                                       arr.shape[0])
                return np.concatenate([arr, a[..., None]], axis=-1)
            arr = np.concatenate(
                [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)],
                axis=-1)
        return arr

    def to_rgb(canvas: np.ndarray) -> np.ndarray:
        a = canvas[..., 3:4].astype(np.uint16)
        return ((canvas[..., :3].astype(np.uint16) * a) // 255) \
            .astype(np.uint8)

    frames: list[bytes] = []
    first_dur = None
    if not info["animated"]:
        sub = info["vp8l"] if info["vp8l"] is not None \
            else info["vp8"]
        if sub is None:
            raise ValueError(
                f"WEBP: {info['codec']} container carries no "
                f"VP8/VP8L bitstream to decode")
        # still image: one composed frame (lossless or lossy — r13;
        # a lossy still's ALPH plane weights the PPM compositing)
        frames.append(_rgb_to_ppm(to_rgb(rgba_of(sub,
                                                 info["alph"]))))
        out = {"width": w, "height": h, "us_per_frame": None,
               "codec": "webp", "frames": frames}
        return out

    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    n = 0
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid != b"ANMF" or len(body) < 16:
            continue
        fx = int.from_bytes(body[0:3], "little") * 2
        fy = int.from_bytes(body[3:6], "little") * 2
        fw = int.from_bytes(body[6:9], "little") + 1
        fh = int.from_bytes(body[9:12], "little") + 1
        dur = int.from_bytes(body[12:15], "little")
        flags = body[15]
        dispose_bg = bool(flags & 0x01)
        no_blend = bool(flags & 0x02)
        if first_dur is None:
            first_dur = dur
        # nested chunks: find the VP8L bitstream
        sub = sub_alph = None
        sp = 16
        while sp + 8 <= len(body):
            scid = body[sp:sp + 4]
            ssz = int.from_bytes(body[sp + 4:sp + 8], "little")
            if scid in (b"VP8L", b"VP8 "):
                sub = body[sp + 8:sp + 8 + ssz]
                break
            if scid == b"ALPH":
                sub_alph = body[sp + 8:sp + 8 + ssz]
            sp += 8 + ssz + (ssz & 1)
        if sub is None:
            raise ValueError(
                "WEBP: ANMF frame without a VP8/VP8L chunk")
        arr = rgba_of(sub, sub_alph)
        if arr.shape[:2] != (fh, fw):
            raise ValueError(
                f"WEBP: ANMF declares {fw}x{fh} but the subframe "
                f"decodes to {arr.shape[1]}x{arr.shape[0]}")
        if fx + fw > w or fy + fh > h:
            raise ValueError("WEBP: ANMF frame rect outside canvas")
        rect = canvas[fy:fy + fh, fx:fx + fw]
        if no_blend:
            rect[...] = arr
        else:
            sa = arr[..., 3:4].astype(np.uint32)
            da = rect[..., 3:4].astype(np.uint32)
            oa = sa + da * (255 - sa) // 255
            oc = (arr[..., :3].astype(np.uint32) * sa
                  + rect[..., :3].astype(np.uint32) * da
                  * (255 - sa) // 255)
            rect[..., :3] = np.where(oa > 0, oc // np.maximum(oa, 1),
                                     0).astype(np.uint8)
            rect[..., 3:4] = oa.astype(np.uint8)
        if n % _sample_every == 0:
            frames.append(_rgb_to_ppm(to_rgb(canvas)))
        if dispose_bg:
            canvas[fy:fy + fh, fx:fx + fw] = 0
        n += 1
    if not frames:
        raise ValueError("WEBP: animation carries no ANMF frames")
    out = {"width": w, "height": h,
           "us_per_frame": (first_dur * 1000 if first_dur else None),
           "codec": "webp", "frames": frames}
    if _sample_every > 1:
        out["sampled_every"] = _sample_every
    return out
