"""Builtin WebP VP8L decoder (r12): spec-built golden bitstreams.

The tests carry a minimal VP8L *encoder* (LSB-first bit writer +
canonical prefix codes built with a heapq Huffman) so every golden file
is constructed from the public spec independently of the decoder:
literals, LZ77 backward references (2-D distance codes), the color
cache, all four transforms, meta prefix partitioning, the RIFF
container, decode_image/media_metadata integration, and hostile-bytes
totality."""

from __future__ import annotations

import heapq
import itertools
from collections import Counter

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import (
    decode_vp8l, decode_webp, parse_webp_container,
)

# ------------------------------------------------------------ writer


class W:
    """LSB-first bit writer (the VP8L stream order)."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, val: int, n: int) -> None:
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def code(self, code: int, length: int) -> None:
        """Prefix codes go MSB-of-code-first (DEFLATE convention)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Kraft-complete code lengths via the standard Huffman heap."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    tie = itertools.count()
    heap = [(f, next(tie), {s: 0}) for s, f in freqs.items()]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, m1 = heapq.heappop(heap)
        f2, _, m2 = heapq.heappop(heap)
        merged = {s: ln + 1 for s, ln in {**m1, **m2}.items()}
        heapq.heappush(heap, (f1 + f2, next(tie), merged))
    return heap[0][2]


def canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical by (length, symbol)."""
    out = {}
    code = 0
    prev = 0
    for ln, sym in sorted((ln, s) for s, ln in lengths.items()):
        code <<= ln - prev
        prev = ln
        out[sym] = (code, ln)
        code += 1
    return out


def write_prefix(wtr: W, lengths: dict[int, int], alphabet: int):
    """Emit one prefix-code definition; returns the canonical codes.
    Uses the simple form for 1-2 symbols of length<=1, else the full
    code-length-coded form with code 18 runs for zero gaps."""
    syms = sorted(lengths)
    if all(s < 256 for s in syms) and (
            (len(syms) <= 2 and all(lengths[s] == 1 for s in syms))
            or len(syms) == 1):
        wtr.w(1, 1)                       # simple
        wtr.w(len(syms) - 1, 1)
        first = syms[0]
        if first >= 2:
            wtr.w(1, 1)
            wtr.w(first, 8)
        else:
            wtr.w(0, 1)
            wtr.w(first, 1)
        if len(syms) == 2:
            wtr.w(syms[1], 8)
        return canonical({s: 1 for s in syms} if len(syms) == 2
                         else {syms[0]: 0})  # 0 bits for single
    wtr.w(0, 1)                           # full form
    full = [lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros; they are implicit
    while full and full[-1] == 0:
        full.pop()
    # tokens: literal lengths + 18-runs for long zero gaps
    tokens: list[tuple[int, int | None]] = []
    i = 0
    while i < len(full):
        if full[i] == 0:
            j = i
            while j < len(full) and full[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 138)
                tokens.append((18, take - 11))
                run -= take
            for _ in range(run):
                tokens.append((0, None))
            i = j
        else:
            tokens.append((full[i], None))
            i += 1
    clf = Counter(t for t, _ in tokens)
    cl_lengths = huff_lengths(dict(clf))
    cl_codes = canonical(cl_lengths)
    # cover every used cl symbol in the fixed order
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import _CLC_ORDER
    need = max(i for i, s in enumerate(_CLC_ORDER)
               if s in cl_lengths) + 1
    num_codes = max(4, need)
    wtr.w(num_codes - 4, 4)
    for i in range(num_codes):
        wtr.w(cl_lengths.get(_CLC_ORDER[i], 0), 3)
    # bound the token count with max_symbol (trailing zeros are NOT
    # implicit in VP8L: without the bound the decoder keeps consuming
    # tokens until the alphabet is exhausted)
    assert len(tokens) >= 2
    k = 0
    while (1 << (2 + 2 * k)) < len(tokens) - 2 + 1:
        k += 1
    wtr.w(1, 1)
    wtr.w(k, 3)
    wtr.w(len(tokens) - 2, 2 + 2 * k)
    single_cl = len(cl_codes) == 1
    for t, extra in tokens:
        if not single_cl:
            c, ln = cl_codes[t]
            wtr.code(c, ln)
        if t == 18:
            wtr.w(extra, 7)
    return canonical(lengths)


# token stream → spatial image body
def emit_spatial(wtr: W, w: int, tokens, cache_bits=0, level0=True):
    """tokens: ('lit', a, r, g, b) | ('copy', length<=4, dist_code<=4)
    | ('cache', idx). Lengths/distances <= 4 need no extra bits."""
    wtr.w(1 if cache_bits else 0, 1)
    if cache_bits:
        wtr.w(cache_bits, 4)
    if level0:
        wtr.w(0, 1)                       # no meta prefix codes
    cache_size = (1 << cache_bits) if cache_bits else 0
    gf, rf, bf, af, df = (Counter() for _ in range(5))
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            gf[g] += 1
            rf[r] += 1
            bf[b] += 1
            af[a] += 1
        elif t[0] == "copy":
            _, length, dist = t
            assert 1 <= length <= 4 and 1 <= dist <= 4
            gf[256 + length - 1] += 1
            df[dist - 1] += 1
        else:
            gf[256 + 24 + t[1]] += 1
    for f in (rf, bf, af, df):
        if not f:
            f[0] = 1                      # unused tree: 1 symbol
    gcodes = write_prefix(wtr, huff_lengths(dict(gf)),
                          256 + 24 + cache_size)
    rcodes = write_prefix(wtr, huff_lengths(dict(rf)), 256)
    bcodes = write_prefix(wtr, huff_lengths(dict(bf)), 256)
    acodes = write_prefix(wtr, huff_lengths(dict(af)), 256)
    dcodes = write_prefix(wtr, huff_lengths(dict(df)), 40)
    for t in tokens:
        if t[0] == "lit":
            _, a, r, g, b = t
            c, ln = gcodes[g]
            wtr.code(c, ln)
            c, ln = rcodes[r]
            wtr.code(c, ln)
            c, ln = bcodes[b]
            wtr.code(c, ln)
            c, ln = acodes[a]
            wtr.code(c, ln)
        elif t[0] == "copy":
            _, length, dist = t
            c, ln = gcodes[256 + length - 1]
            wtr.code(c, ln)
            c, ln = dcodes[dist - 1]
            wtr.code(c, ln)
        else:
            c, ln = gcodes[256 + 24 + t[1]]
            wtr.code(c, ln)


def vp8l_stream(w: int, h: int, body_fn, alpha=1) -> bytes:
    wtr = W()
    wtr.w(w - 1, 14)
    wtr.w(h - 1, 14)
    wtr.w(alpha, 1)
    wtr.w(0, 3)                           # version
    body_fn(wtr)
    return b"\x2f" + wtr.bytes()


def lits(pixels):
    """[(a, r, g, b), ...] -> literal tokens."""
    return [("lit", a, r, g, b) for a, r, g, b in pixels]


def riff_webp(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
            + b"WEBP" + chunk)


def rgba(*pixels):
    return np.array(pixels, dtype=np.uint8)


# ------------------------------------------------------------- tests


def test_literals_roundtrip():
    """4x2, many distinct values per channel → full code-length-coded
    prefix trees on every channel."""
    px = [(255, i * 11 % 256, i * 29 % 256, i * 53 % 256)
          for i in range(8)]

    def body(wtr):
        wtr.w(0, 1)                       # no transforms
        emit_spatial(wtr, 4, lits(px))

    out = decode_vp8l(vp8l_stream(4, 2, body))
    assert out.shape == (2, 4, 4)
    want = np.array([(r, g, b, a) for a, r, g, b in px],
                    dtype=np.uint8).reshape(2, 4, 4)
    assert (out == want).all()


def test_no_alpha_hint_gives_rgb():
    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 2, lits([(255, 1, 2, 3), (255, 4, 5, 6)]))

    out = decode_vp8l(vp8l_stream(2, 1, body, alpha=0))
    assert out.shape == (1, 2, 3)
    assert out.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_lz77_backward_references():
    """Copy from the left neighbor (dist code 2 = (1,0)) and the pixel
    above (dist code 1 = (0,1)) — the 2-D distance map."""
    toks = (lits([(255, 10, 20, 30), (255, 40, 50, 60)])
            + [("copy", 2, 2)]            # row0: p2=p1? dist map...
            + [("copy", 4, 1)])           # row1 = row0 (dist = width)

    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 4, toks)

    out = decode_vp8l(vp8l_stream(4, 2, body))
    # dist code 2 -> (dx=1, dy=0) -> dist 1: copies repeat the
    # immediately previous pixel twice
    assert (out[0, 1] == out[0, 2]).all() and (out[0, 2] == out[0, 3]).all()
    assert (out[1] == out[0]).all()       # dist code 1 -> one row up
    assert out[0, 0].tolist() == [10, 20, 30, 255]


def test_color_cache():
    """A cache hit must reproduce the earlier pixel; the index is the
    spec hash of the ARGB value."""
    bits = 4
    argb = (0xFF << 24) | (7 << 16) | (9 << 8) | 11
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)
    toks = (lits([(255, 7, 9, 11), (255, 1, 1, 1)])
            + [("cache", idx)])

    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 3, toks, cache_bits=bits)

    out = decode_vp8l(vp8l_stream(3, 1, body))
    assert out[0, 2].tolist() == [7, 9, 11, 255]


def test_subtract_green_transform():
    orig = [(255, 100, 60, 20), (255, 5, 250, 17)]
    stored = [(a, (r - g) % 256, g, (b - g) % 256)
              for a, r, g, b in orig]

    def body(wtr):
        wtr.w(1, 1)
        wtr.w(2, 2)                       # subtract green
        wtr.w(0, 1)                       # no more transforms
        emit_spatial(wtr, 2, lits(stored))

    out = decode_vp8l(vp8l_stream(2, 1, body))
    want = [[r, g, b, a] for a, r, g, b in orig]
    assert out.reshape(2, 4).tolist() == want


def test_predictor_transform_left_mode():
    """One 4x2 image, one predictor tile (bits=3 covers 8x8), mode 1
    (= left). Residuals computed here from the spec rules: (0,0) vs
    opaque black, row 0 vs L, column 0 vs T, the rest vs L."""
    orig = [[(255, 10, 20, 30), (255, 12, 19, 33),
             (255, 11, 22, 29), (255, 13, 21, 31)],
            [(255, 9, 18, 28), (255, 14, 23, 35),
             (255, 12, 20, 30), (255, 10, 24, 33)]]

    def sub(p, q):                        # p - q per channel, mod 256
        return tuple((a - b) % 256 for a, b in zip(p, q))

    resid = [[None] * 4 for _ in range(2)]
    for y in range(2):
        for x in range(4):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = orig[0][x - 1]     # L
            elif x == 0:
                pred = orig[y - 1][0]     # T
            else:
                pred = orig[y][x - 1]     # mode 1 = L
            resid[y][x] = sub(orig[y][x], pred)
    flat = [resid[y][x] for y in range(2) for x in range(4)]

    def body(wtr):
        wtr.w(1, 1)
        wtr.w(0, 2)                       # predictor
        wtr.w(1, 3)                       # size_bits - 2 = 1 -> 8px
        # 1x1 tile image: green channel = mode 1
        emit_spatial(wtr, 1, lits([(0, 0, 1, 0)]), level0=False)
        wtr.w(0, 1)                       # no more transforms
        emit_spatial(wtr, 4, lits(flat))

    out = decode_vp8l(vp8l_stream(4, 2, body))
    want = [[[r, g, b, a] for a, r, g, b in row] for row in orig]
    assert out.tolist() == want


def test_predictor_modes_tl_tr_and_avg():
    """A 2-tile-wide image exercising modes 4 (TL) / 3 (TR) via a
    2x1 mode map with size_bits=2 (4-px tiles) on an 8x2 image, mode
    7 (avg L,T) in the second tile."""
    rng = np.random.default_rng(7)
    orig = rng.integers(0, 256, size=(2, 8, 4), dtype=np.uint8)
    # forward-predict with the decoder's own rules is cheating; use
    # an independent reimplementation of modes 4 and 7 here
    modes = [4, 7]

    def predict(y, x, img):
        if x == 0 and y == 0:
            return np.array([0, 0, 0, 255], np.int32)
        if y == 0:
            return img[0, x - 1].astype(np.int32)
        if x == 0:
            return img[y - 1, 0].astype(np.int32)
        mode = modes[x >> 2]
        L = img[y, x - 1].astype(np.int32)
        T = img[y - 1, x].astype(np.int32)
        if mode == 4:
            return img[y - 1, x - 1].astype(np.int32)
        return (L + T) // 2               # mode 7

    flat = []
    for y in range(2):
        for x in range(8):
            p = predict(y, x, orig)
            r, g, b, a = ((orig[y, x].astype(np.int32) - p) % 256)
            flat.append((int(a), int(r), int(g), int(b)))

    def body(wtr):
        wtr.w(1, 1)
        wtr.w(0, 2)
        wtr.w(0, 3)                       # size_bits = 2 -> 4-px tiles
        emit_spatial(wtr, 2,
                     lits([(0, 0, modes[0], 0), (0, 0, modes[1], 0)]),
                     level0=False)
        wtr.w(0, 1)
        emit_spatial(wtr, 8, lits(flat))

    out = decode_vp8l(vp8l_stream(8, 2, body))
    assert (out == orig).all()


def test_color_transform():
    g2r, g2b, r2b = 0x10, 0xF0, 0x08      # signed 3.5 multipliers
    orig = [(255, 200, 100, 50), (255, 30, 220, 140)]

    def delta(t, c):
        ts = t - 256 if t > 127 else t
        cs = c - 256 if c > 127 else c
        return (ts * cs) >> 5

    stored = []
    for a, r, g, b in orig:
        sr = (r - delta(g2r, g)) % 256
        sb = (b - delta(g2b, g) - delta(r2b, r)) % 256
        stored.append((a, sr, g, sb))

    def body(wtr):
        wtr.w(1, 1)
        wtr.w(1, 2)                       # color transform
        wtr.w(1, 3)                       # 8-px tiles -> 1x1 map
        # element pixel: red=r2b, green=g2b, blue=g2r
        emit_spatial(wtr, 1, lits([(0, r2b, g2b, g2r)]),
                     level0=False)
        wtr.w(0, 1)
        emit_spatial(wtr, 2, lits(stored))

    out = decode_vp8l(vp8l_stream(2, 1, body))
    want = [[r, g, b, a] for a, r, g, b in orig]
    assert out.reshape(2, 4).tolist() == want


def test_color_indexing_with_bundling():
    """4-color palette -> 2 bits/pixel, 4 pixels per packed byte; a
    6-px row packs into 2 greens. Palette entries are delta-coded."""
    palette = [(255, 10, 0, 0), (255, 0, 20, 0),
               (255, 0, 0, 30), (255, 40, 40, 40)]
    idx = [0, 1, 2, 3, 2, 1]
    packed0 = idx[0] | (idx[1] << 2) | (idx[2] << 4) | (idx[3] << 6)
    packed1 = idx[4] | (idx[5] << 2)
    deltas = []
    prev = (0, 0, 0, 0)
    for p in palette:
        deltas.append(tuple((c - q) % 256 for c, q in zip(p, prev)))
        prev = p

    def body(wtr):
        wtr.w(1, 1)
        wtr.w(3, 2)                       # color indexing
        wtr.w(len(palette) - 1, 8)
        emit_spatial(wtr, len(palette), lits(deltas), level0=False)
        wtr.w(0, 1)
        # packed image is 2 wide (ceil(6/4) with 2-bit bundling)
        emit_spatial(wtr, 2, lits([(0, 0, packed0, 0),
                                   (0, 0, packed1, 0)]))

    out = decode_vp8l(vp8l_stream(6, 1, body))
    want = [[palette[i][1], palette[i][2], palette[i][3],
             palette[i][0]] for i in idx]
    assert out.reshape(6, 4).tolist() == want


def test_meta_prefix_two_groups():
    """8x1 with meta_bits=2: tiles of 4 px, two huffman groups with
    disjoint fixed literals — pixels must switch groups at x=4."""
    wtr = W()
    wtr.w(8 - 1, 14)
    wtr.w(1 - 1, 14)
    wtr.w(1, 1)
    wtr.w(0, 3)
    wtr.w(0, 1)                           # no transforms
    wtr.w(0, 1)                           # no color cache
    wtr.w(1, 1)                           # meta prefix codes
    wtr.w(0, 3)                           # meta_bits = 2
    # entropy image 2x1: meta codes 0 and 1 in (r<<8)|g
    emit_spatial(wtr, 2, lits([(0, 0, 0, 0), (0, 0, 1, 0)]),
                 level0=False)
    # group 0: fixed pixel (255, 1, 2, 3); group 1: (255, 9, 8, 7) —
    # all trees single-symbol (0 bits per pixel)
    for g, r, b, a in ((2, 1, 3, 255), (8, 9, 7, 255)):
        write_prefix(wtr, {g: 1}, 280)
        write_prefix(wtr, {r: 1}, 256)
        write_prefix(wtr, {b: 1}, 256)
        write_prefix(wtr, {a: 1}, 256)
        write_prefix(wtr, {0: 1}, 40)
    payload = b"\x2f" + wtr.bytes()
    out = decode_vp8l(payload)
    assert out[0, :4].tolist() == [[1, 2, 3, 255]] * 4
    assert out[0, 4:].tolist() == [[9, 8, 7, 255]] * 4


def test_container_and_decode_webp():
    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 2, lits([(255, 1, 2, 3), (255, 4, 5, 6)]))

    stream = vp8l_stream(2, 1, body)
    payload = riff_webp(stream)
    info = parse_webp_container(payload)
    assert (info["codec"], info["width"], info["height"],
            info["has_alpha"]) == ("vp8l", 2, 1, True)
    out = decode_webp(payload)
    assert out.shape == (1, 2, 4)


def test_decode_image_dispatch_and_media_metadata(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        _HAS_PIL, decode_image, media_metadata, pack_media,
    )

    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 2, lits([(255, 1, 2, 3), (255, 4, 5, 6),
                                   (255, 7, 8, 9), (255, 3, 2, 1)]))

    payload = riff_webp(vp8l_stream(2, 2, body))
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    media = pack_media(df, "payload", fmt="image/webp",
                       width=2, height=2, channels=4)
    info = media_metadata(media, "payload").select(
        "media_info.*").first()
    assert (info["format"], info["codec"], info["width"],
            info["height"], info["channels"], info["n_frames"]) \
        == ("webp", "vp8l", 2, 2, 4, 1)
    assert info["error"] is None
    if not _HAS_PIL:
        got = decode_image(media, "payload").first()
        assert got["codec"] == "vp8l"
        assert got["pixels"][:4] == [1, 2, 3, 255]


def test_lossy_vp8_probe_and_seam():
    # minimal VP8 lossy header: 3-byte frame tag + start code + dims
    tag = b"\x00\x00\x00" + b"\x9d\x01\x2a" \
        + (320).to_bytes(2, "little") + (240).to_bytes(2, "little")
    chunk = b"VP8 " + len(tag).to_bytes(4, "little") + tag
    payload = (b"RIFF" + (4 + len(chunk) + (len(tag) & 1))
               .to_bytes(4, "little") + b"WEBP" + chunk
               + (b"\x00" if len(tag) & 1 else b""))
    info = parse_webp_container(payload)
    assert (info["codec"], info["width"], info["height"]) \
        == ("vp8", 320, 240)
    # lossy stills decode builtin since r13 — this header-only stub
    # is truncated, so the VP8 decoder refuses it loudly instead of
    # the old Pillow-seam guard
    with pytest.raises(ValueError, match="VP8"):
        decode_webp(payload)


def test_hostile_bytes_total():
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x30\x00\x00")
    with pytest.raises(ValueError, match="not a RIFF/WEBP"):
        parse_webp_container(b"RIFX12345678")
    # version != 0
    wtr = W()
    wtr.w(0, 14)
    wtr.w(0, 14)
    wtr.w(0, 1)
    wtr.w(5, 3)
    with pytest.raises(ValueError, match="version"):
        decode_vp8l(b"\x2f" + wtr.bytes())

    # truncated mid-stream
    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 4, lits([(255, i, i, i) for i in range(16)]))

    good = vp8l_stream(4, 4, body)
    with pytest.raises(ValueError, match="truncated"):
        decode_vp8l(good[:8])
    # backward reference before image start
    toks = [("copy", 2, 2)]

    def body2(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, 2, toks)

    with pytest.raises(ValueError, match="before the image start"):
        decode_vp8l(vp8l_stream(2, 1, body2))
    # repeated transform
    wtr = W()
    wtr.w(0, 14)
    wtr.w(0, 14)
    wtr.w(1, 1)
    wtr.w(0, 3)
    wtr.w(1, 1)
    wtr.w(2, 2)
    wtr.w(1, 1)
    wtr.w(2, 2)
    with pytest.raises(ValueError, match="repeated"):
        decode_vp8l(b"\x2f" + wtr.bytes())


# ------------------------------------------- animated WebP (r12)

def _chunk(cid: bytes, body: bytes) -> bytes:
    return (cid + len(body).to_bytes(4, "little") + body
            + (b"\x00" if len(body) & 1 else b""))


def _vp8x(w, h, anim=True, alpha=True):
    flags = (0x02 if anim else 0) | (0x10 if alpha else 0)
    return _chunk(b"VP8X", bytes([flags, 0, 0, 0])
                  + (w - 1).to_bytes(3, "little")
                  + (h - 1).to_bytes(3, "little"))


def _anmf(x, y, fw, fh, dur, vp8l, *, dispose_bg=False,
          no_blend=True):
    head = ((x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little")
            + bytes([(0x01 if dispose_bg else 0)
                     | (0x02 if no_blend else 0)]))
    return _chunk(b"ANMF", head + _chunk(b"VP8L", vp8l))


def _anim_webp(w, h, anmfs):
    body = (b"WEBP" + _vp8x(w, h)
            + _chunk(b"ANIM", b"\x00" * 4 + b"\x00\x00")
            + b"".join(anmfs))
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _solid_vp8l(w, h, a, r, g, b):
    def body(wtr):
        wtr.w(0, 1)
        emit_spatial(wtr, w, lits([(a, r, g, b)] * (w * h)))
    return vp8l_stream(w, h, body)


def test_animated_webp_compose_dispose():
    """Two 2x2 frames on a 4x2 canvas: placement, no-blend replace,
    and dispose-to-background all pinned pixel-exact."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import (
        parse_webp_frames,
    )
    f1 = _solid_vp8l(2, 2, 255, 10, 20, 30)
    f2 = _solid_vp8l(2, 2, 255, 90, 80, 70)
    payload = _anim_webp(4, 2, [
        _anmf(0, 0, 2, 2, 40, f1, dispose_bg=True),
        _anmf(2, 0, 2, 2, 40, f2),
    ])
    info = parse_webp_frames(payload)
    assert (info["width"], info["height"], info["codec"],
            info["us_per_frame"]) == (4, 2, "webp", 40_000)
    assert len(info["frames"]) == 2

    def pixels(ppm):
        hdr_end = ppm.index(b"255\n") + 4
        return np.frombuffer(ppm[hdr_end:], np.uint8).reshape(2, 4, 3)

    c1 = pixels(info["frames"][0])
    assert c1[0, 0].tolist() == [10, 20, 30]
    assert c1[0, 2].tolist() == [0, 0, 0]          # untouched canvas
    c2 = pixels(info["frames"][1])
    # frame 1's rect was disposed to background before frame 2
    assert c2[0, 0].tolist() == [0, 0, 0]
    assert c2[0, 2].tolist() == [90, 80, 70]


def test_animated_webp_alpha_blend():
    """Blend mode: a half-transparent frame over an opaque one —
    8-bit source-over compositing."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import (
        parse_webp_frames,
    )
    base = _solid_vp8l(2, 1, 255, 100, 100, 100)
    over = _solid_vp8l(2, 1, 128, 200, 0, 0)
    payload = _anim_webp(2, 1, [
        _anmf(0, 0, 2, 1, 30, base),
        _anmf(0, 0, 2, 1, 30, over, no_blend=False),
    ])
    info = parse_webp_frames(payload)

    def px(ppm):
        return np.frombuffer(ppm[ppm.index(b"255\n") + 4:],
                             np.uint8).reshape(1, 2, 3)

    # src-over: a=128 over opaque 100 -> c = (200*128 + 100*255*127/255)/255
    got = px(info["frames"][1])[0, 0]
    sa, da = 128, 255
    oa = sa + da * (255 - sa) // 255
    want_r = (200 * sa + 100 * da * (255 - sa) // 255) // oa
    want_g = (0 * sa + 100 * da * (255 - sa) // 255) // oa
    assert abs(int(got[0]) - want_r) <= 1
    assert abs(int(got[1]) - want_g) <= 1


def test_animated_webp_sampling_and_still(spark):
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        pack_media, sample_frames,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import (
        parse_webp_frames,
    )
    frames = [_anmf(0, 0, 2, 1, 25, _solid_vp8l(2, 1, 255, i, i, i))
              for i in (10, 20, 30, 40, 50)]
    payload = _anim_webp(2, 1, frames)
    info = parse_webp_frames(payload, _sample_every=2)
    assert len(info["frames"]) == 3 and info["sampled_every"] == 2
    # still VP8L through the same contract: one frame
    still = riff_webp(_solid_vp8l(2, 1, 255, 5, 6, 7))
    sinfo = parse_webp_frames(still)
    assert len(sinfo["frames"]) == 1
    # Spark operator dispatches on the WEBP magic (demux='webp')
    df = spark.createDataFrame([(1, payload)],
                               "doc_id long, payload binary")
    media = pack_media(df, "payload", fmt="image/webp", width=2,
                       height=1, n_frames=5)
    got = sample_frames(media, "payload", every_n=2) \
        .orderBy("frame_index").collect()
    assert [r["frame_index"] for r in got] == [0, 2, 4]
    assert all(r["demux"] == "webp" for r in got)


def test_animated_webp_hostile():
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import (
        parse_webp_frames,
    )
    # frame rect outside the canvas
    f = _solid_vp8l(2, 2, 255, 1, 2, 3)
    bad = _anim_webp(2, 2, [_anmf(2, 0, 2, 2, 10, f)])
    with pytest.raises(ValueError, match="outside canvas"):
        parse_webp_frames(bad)
    # declared dims disagree with the subframe
    bad2 = _anim_webp(4, 4, [_anmf(0, 0, 3, 3, 10, f)])
    with pytest.raises(ValueError, match="decodes to"):
        parse_webp_frames(bad2)


def test_predictor_mode13_c_truncation_and_mode11_tie():
    """r12 review fixes pinned: ClampAddSubtractHalf divides toward
    zero (C semantics — floor division is off by one on odd negative
    deltas), and Select ties go to T (libwebp's pa_minus_pb <= 0)."""
    rng = np.random.default_rng(13)
    orig = rng.integers(0, 256, size=(2, 8, 4), dtype=np.uint8)
    # force a Select tie at (1,1): T == L (both differ from TL)
    orig[0, 1] = orig[1, 0]
    modes = [13, 11]

    def trunc_half(d):
        return int(d / 2)                 # C truncation toward zero

    def predict(y, x, img):
        if x == 0 and y == 0:
            return np.array([0, 0, 0, 255], np.int64)
        if y == 0:
            return img[0, x - 1].astype(np.int64)
        if x == 0:
            return img[y - 1, 0].astype(np.int64)
        mode = modes[x >> 2]
        L = img[y, x - 1].astype(np.int64)
        T = img[y - 1, x].astype(np.int64)
        TL = img[y - 1, x - 1].astype(np.int64)
        if mode == 13:
            avg = (L + T) // 2
            return np.clip(avg + np.array(
                [trunc_half(int(a - b)) for a, b in zip(avg, TL)]),
                0, 255)
        # mode 11 Select: T when sum|L-TL| <= sum|T-TL|
        return T if np.abs(L - TL).sum() <= np.abs(T - TL).sum() \
            else L

    flat = []
    for y in range(2):
        for x in range(8):
            p = predict(y, x, orig)
            r, g, b, a = ((orig[y, x].astype(np.int64) - p) % 256)
            flat.append((int(a), int(r), int(g), int(b)))

    def body(wtr):
        wtr.w(1, 1)
        wtr.w(0, 2)
        wtr.w(0, 3)                       # 4-px tiles -> 2 tiles
        emit_spatial(wtr, 2,
                     lits([(0, 0, modes[0], 0), (0, 0, modes[1], 0)]),
                     level0=False)
        wtr.w(0, 1)
        emit_spatial(wtr, 8, lits(flat))

    out = decode_vp8l(vp8l_stream(8, 2, body))
    assert (out == orig).all()


def test_lossy_still_demux_names_the_seam():
    """A truncated lossy still through parse_webp_frames raises the
    VP8 decoder's structural error (r13: the lossy path is builtin —
    tests/test_vp8.py owns its correctness), not a misleading 'no
    ANMF frames'; a one-frame ANIMATION still routes to the compose
    loop."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8l import (
        parse_webp_frames,
    )
    tag = b"\x00\x00\x00" + b"\x9d\x01\x2a" \
        + (32).to_bytes(2, "little") + (16).to_bytes(2, "little")
    chunk = b"VP8 " + len(tag).to_bytes(4, "little") + tag \
        + (b"\x00" if len(tag) & 1 else b"")
    payload = (b"RIFF" + (4 + len(chunk)).to_bytes(4, "little")
               + b"WEBP" + chunk)
    with pytest.raises(ValueError, match="VP8"):
        parse_webp_frames(payload)
    one = _anim_webp(2, 1, [_anmf(0, 0, 2, 1, 10,
                                  _solid_vp8l(2, 1, 255, 1, 2, 3))])
    info = parse_webp_frames(one)
    assert len(info["frames"]) == 1 and info["us_per_frame"] == 10_000
