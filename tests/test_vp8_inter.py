"""VP8 inter-frame decoding (vp8.VP8Decoder, r14 — VERDICT r13
item 4).

No reference VP8 *video* codec exists in this container (no
libvpx/ffmpeg), and libwebp's decoder is keyframe-only — pinned here
by ``test_libwebp_refuses_inter_frames``. The verification strategy
therefore is:

1. A from-spec TEST-SIDE encoder (RFC 6386 §7.2 bool encoder + tree /
   literal / MV-component writers over the same public tables) whose
   correctness is established by round-tripping KEYFRAMES through the
   byte-exact-vs-libwebp-pinned keyframe decoder — the encoder is
   validated against an independently verified decoder, then reused
   to build inter-frame bitstreams.
2. Structural identities that hold by construction: an all-skip
   ZEROMV inter frame reproduces its reference byte-exactly;
   golden/altref refresh+copy semantics are observable through frame
   sequences.
3. Motion compensation pinned against an INDEPENDENT numpy
   sixtap/bilinear oracle written in this file (edge extension,
   eighth-pel phases, the two-pass rounding), not the decoder's own
   implementation.
"""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8 import (
    BILINEAR_FILTERS, BMODE_PROB_INTER, COEFF_UPDATE_PROBS,
    DEFAULT_MV_PROBS, MBSPLIT_PROBS, MBSPLIT_TREE, MBSPLITS,
    MODE_CONTEXTS, MV_REF_TREE, MV_UPDATE_PROBS, NEARESTMV, NEARMV,
    NEWMV, SIXTAP_FILTERS, SMALL_MV_TREE, SPLITMV, SUB_MV_REF_PROBS,
    UV_MODE_PROB_DEFAULT, YMODE_PROB_DEFAULT,
    SUB_MV_REF_TREE, UV_MODE_TREE, YMODE_TREE, ZEROMV, B_PRED,
    DC_PRED, KF_UV_MODE_PROB, KF_YMODE_PROB, KF_YMODE_TREE,
    LEFT4X4, ABOVE4X4, ZERO4X4, NEW4X4, VP8Decoder, _MbState,
    decode_vp8, find_near_mvs,
)

# ------------------------------------------------------------------ encoder


class BoolEncoder:
    """RFC 6386 §7.2 boolean encoder (the test-side inverse of the
    decoder's §7.3 BoolDecoder)."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def b(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom = (self.bottom + split) & 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & 0x80000000:
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.b((v >> i) & 1, 128)

    def tree(self, tree, probs, value: int) -> None:
        def walk(i, bits):
            for bit in (0, 1):
                j = tree[i + bit]
                if j < 0:
                    if -j - 1 == value:
                        return bits + [(bit, probs[i >> 1])]
                    continue
                r = walk(j, bits + [(bit, probs[i >> 1])])
                if r is not None:
                    return r
            return None

        path = walk(0, [])
        assert path is not None, (value, tree)
        for bit, p in path:
            self.b(bit, p)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        for _ in range(c >> 3):
            v = (v << 8) & 0xFFFFFFFF
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


MV_PIS_SHORT, MV_SIGN, MV_SHORT, MV_BITS = 0, 1, 2, 9


def encode_mv_component(be: BoolEncoder, probs, x: int) -> None:
    """Inverse of vp8.read_mv_component (quarter-pel units)."""
    a = abs(x)
    if a < 8:
        be.b(0, probs[MV_PIS_SHORT])
        be.tree(SMALL_MV_TREE, probs[MV_SHORT:], a)
    else:
        be.b(1, probs[MV_PIS_SHORT])
        for i in range(3):
            be.b((a >> i) & 1, probs[MV_BITS + i])
        for i in range(9, 3, -1):
            be.b((a >> i) & 1, probs[MV_BITS + i])
        if a & 0xFFF0:                    # bit 3 only when needed
            be.b((a >> 3) & 1, probs[MV_BITS + 3])
        else:
            assert a & 8, "long form requires x >= 8"
    if a:
        be.b(1 if x < 0 else 0, probs[MV_SIGN])


def encode_mv(be: BoolEncoder, mv_probs, mv) -> None:
    """mv in eighth-pel (row, col); coded quarter-pel."""
    assert mv[0] % 2 == 0 and mv[1] % 2 == 0
    encode_mv_component(be, mv_probs[0], mv[0] // 2)
    encode_mv_component(be, mv_probs[1], mv[1] // 2)


def _common_header(be: BoolEncoder, q: int, filter_level: int,
                   keyframe: bool) -> None:
    if keyframe:
        be.b(0, 128)                      # color space
        be.b(0, 128)                      # clamping
    be.b(0, 128)                          # segmentation off
    be.b(0, 128)                          # filter type normal
    be.literal(6, filter_level)
    be.literal(3, 0)                      # sharpness
    be.b(0, 128)                          # lf deltas off
    be.literal(2, 0)                      # 1 token partition
    be.literal(7, q)                      # y_ac_qi
    for _ in range(5):
        be.b(0, 128)                      # no quant deltas


def _no_coeff_updates(be: BoolEncoder) -> None:
    for t in range(4):
        for blk in range(8):
            for c in range(3):
                for i in range(11):
                    be.b(0, COEFF_UPDATE_PROBS[t][blk][c][i])


def _no_mv_updates(be: BoolEncoder) -> None:
    for ctx in range(2):
        for i in range(19):
            be.b(0, MV_UPDATE_PROBS[ctx][i])


def build_keyframe(w: int, h: int, mb_writer, q: int = 0,
                   filter_level: int = 0) -> bytes:
    """Minimal keyframe through the test encoder — validated by the
    libwebp-pinned keyframe decoder."""
    be = BoolEncoder()
    _common_header(be, q, filter_level, keyframe=True)
    be.b(1, 128)                          # refresh entropy
    _no_coeff_updates(be)
    be.b(1, 128)                          # mb_no_skip
    be.literal(8, 128)                    # prob_skip_false
    mb_writer(be)
    part0 = be.flush()
    tag = (0 | (0 << 1) | (1 << 4) | (len(part0) << 5))
    return (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + part0 + b"\x00")


def build_inter_frame(mb_writer, q: int = 0, filter_level: int = 0,
                      refresh_last: int = 1, refresh_golden: int = 0,
                      refresh_alt: int = 0, copy_to_golden: int = 0,
                      copy_to_alt: int = 0, sign_bias_golden: int = 0,
                      sign_bias_alt: int = 0, show: int = 1,
                      prob_intra: int = 128, prob_last: int = 128,
                      prob_gf: int = 128,
                      token_bytes: bytes = b"\x00") -> bytes:
    be = BoolEncoder()
    _common_header(be, q, filter_level, keyframe=False)
    be.b(refresh_golden, 128)
    be.b(refresh_alt, 128)
    if not refresh_golden:
        be.literal(2, copy_to_golden)
    if not refresh_alt:
        be.literal(2, copy_to_alt)
    be.b(sign_bias_golden, 128)
    be.b(sign_bias_alt, 128)
    be.b(1, 128)                          # refresh entropy
    be.b(refresh_last, 128)
    _no_coeff_updates(be)
    be.b(1, 128)                          # mb_no_skip
    be.literal(8, 128)                    # prob_skip_false
    be.literal(8, prob_intra)
    be.literal(8, prob_last)
    be.literal(8, prob_gf)
    be.b(0, 128)                          # no ymode update
    be.b(0, 128)                          # no uv update
    _no_mv_updates(be)
    mb_writer(be)
    part0 = be.flush()
    tag = (1 | (0 << 1) | (show << 4) | (len(part0) << 5))
    return tag.to_bytes(3, "little") + part0 + token_bytes


class _NeighborTracker:
    """Mirror of the decoder's per-MB neighbor state so the encoder
    can compute the same mv-ref contexts."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.above = [_MbState() for _ in range(mb_w)]
        self.left = _MbState()
        self.al = _MbState()
        self.intra = _MbState()

    def contexts(self, mb_x, mb_y, ref, sign_bias):
        above = self.above[mb_x] if mb_y > 0 else self.intra
        left = self.left if mb_x > 0 else self.intra
        al = self.al if (mb_x > 0 and mb_y > 0) else self.intra
        return find_near_mvs(above, left, al, ref, sign_bias,
                             mb_x, mb_y, self.mb_w, self.mb_h)

    def push(self, mb_x, st):
        self.al = self.above[mb_x]
        self.above[mb_x] = st
        self.left = st

    def row_start(self):
        self.left = _MbState()
        self.al = _MbState()


def _write_inter_mb(be, trk, mb_x, mb_y, mode, ref=1, mv=(0, 0),
                    sign_bias=(0, 0, 0, 0), skip=1,
                    prob_intra=128, prob_last=128, prob_gf=128,
                    submv_plan=None):
    """One inter MB: skip bit, inter flag, ref choice, mv-ref tree
    with the live contexts, then the MV payload."""
    best, nearest, near, cnt, _edges = trk.contexts(
        mb_x, mb_y, ref, sign_bias)
    probs = [MODE_CONTEXTS[min(cnt[0], 5)][0],
             MODE_CONTEXTS[min(cnt[1], 5)][1],
             MODE_CONTEXTS[min(cnt[2], 5)][2],
             MODE_CONTEXTS[min(cnt[3], 5)][3]]
    be.b(skip, 128)
    be.b(1, prob_intra)                   # inter
    if ref == 1:
        be.b(0, prob_last)
    else:
        be.b(1, prob_last)
        be.b(1 if ref == 3 else 0, prob_gf)
    be.tree(MV_REF_TREE, probs, mode)
    st = _MbState(ref=ref, mode=mode)
    if mode == ZEROMV:
        st.mv = (0, 0)
    elif mode == NEARESTMV:
        st.mv = nearest
    elif mode == NEARMV:
        st.mv = near
    elif mode == NEWMV:
        encode_mv(be, DEFAULT_MV_PROBS,
                  (mv[0] - best[0], mv[1] - best[1]))
        st.mv = mv
    else:                                 # SPLITMV via submv_plan
        part, subrefs = submv_plan       # partition id + per-part ops
        be.tree(MBSPLIT_TREE, MBSPLIT_PROBS, part)
        fill = MBSPLITS[part]
        submvs = [None] * 16
        for p, (kind, pmv) in enumerate(subrefs):
            bidx = fill.index(p)
            if bidx & 3:
                lmv = submvs[bidx - 1]
            elif mb_x > 0:
                ln = trk.left
                lmv = (ln.submvs[bidx + 3]
                       if ln.submvs is not None else ln.mv)
            else:
                lmv = (0, 0)
            if bidx >= 4:
                amv = submvs[bidx - 4]
            elif mb_y > 0:
                an = trk.above[mb_x]
                amv = (an.submvs[bidx + 12]
                       if an.submvs is not None else an.mv)
            else:
                amv = (0, 0)
            lez, aez = lmv == (0, 0), amv == (0, 0)
            if lmv == amv:
                ctx = 4 if lez else 3
            elif lez:
                ctx = 1
            elif aez:
                ctx = 2
            else:
                ctx = 0
            be.tree(SUB_MV_REF_TREE, SUB_MV_REF_PROBS[ctx], kind)
            if kind == NEW4X4:
                encode_mv(be, DEFAULT_MV_PROBS,
                          (pmv[0] - best[0], pmv[1] - best[1]))
                got = pmv
            elif kind == LEFT4X4:
                got = lmv
            elif kind == ABOVE4X4:
                got = amv
            else:
                got = (0, 0)
            for bb in range(16):
                if fill[bb] == p:
                    submvs[bb] = got
        st.submvs = submvs
        st.mv = submvs[15]
    trk.push(mb_x, st)
    return st


def _write_intra_dc_mb(be, trk, mb_x, prob_intra=128):
    be.b(1, 128)                          # skip
    be.b(0, prob_intra)                   # intra
    be.tree(YMODE_TREE, YMODE_PROB_DEFAULT, DC_PRED)
    be.tree(UV_MODE_TREE, UV_MODE_PROB_DEFAULT, DC_PRED)
    trk.push(mb_x, _MbState())


# --------------------------------------------------------------- reference


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib",
                 "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
        lib.WebPDecodeRGB.restype = ctypes.c_void_p
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp unavailable")


def _webp_vp8_chunk(img: np.ndarray, q: float = 80.0) -> bytes:
    """Real keyframe bitstream: libwebp still → VP8 chunk body."""
    h, w = img.shape[:2]
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeRGB(np.ascontiguousarray(img).tobytes(),
                           w, h, w * 3, q, ctypes.byref(out))
    assert n
    data = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        sz = int.from_bytes(data[pos + 4:pos + 8], "little")
        if cid == b"VP8 ":
            return data[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


def _natural(h, w, rng):
    y, x = np.mgrid[0:h, 0:w]
    f1, f2 = rng.uniform(4, 14, 2)
    img = (np.stack([128 + 90 * np.sin(x / f1 + i)
                     + 70 * np.cos(y / f2 - i) for i in range(3)],
                    -1) + rng.normal(0, 6, (h, w, 3)))
    return np.clip(img, 0, 255).astype(np.uint8)


# independent MC oracle -----------------------------------------------------


def _mc_oracle(plane: np.ndarray, r: int, c: int, hh: int, ww: int,
               mv, filters) -> np.ndarray:
    """Scalar re-implementation of eighth-pel MC: edge-extended
    plane, horizontal then vertical pass, (x+64)>>7 rounding —
    written independently of vp8._predict_block."""
    border = 40
    ext = np.pad(plane, border, mode="edge").astype(np.int64)
    fr, fc = mv[0] & 7, mv[1] & 7
    br, bc = r + (mv[0] >> 3) + border, c + (mv[1] >> 3) + border
    taps = len(filters[0])
    off = 2 if taps == 6 else 0
    out = np.zeros((hh, ww), np.int64)
    for yy in range(hh):
        for xx in range(ww):
            if fr and fc:
                # two-pass: horizontal first over the tap rows,
                # then vertical over the clamped intermediates
                ta = 2 if taps == 6 else 0
                tmp = []
                for dy in range(-ta, -ta + taps):
                    s = 0
                    for k in range(taps):
                        s += filters[fc][k] * ext[br + yy + dy,
                                                  bc + xx - off + k]
                    tmp.append(int(np.clip((s + 64) >> 7, 0, 255)))
                s = 0
                for k in range(taps):
                    s += filters[fr][k] * tmp[k]
                out[yy, xx] = np.clip((s + 64) >> 7, 0, 255)
            elif fc:
                s = 0
                for k in range(taps):
                    s += filters[fc][k] * ext[br + yy,
                                              bc + xx - off + k]
                out[yy, xx] = np.clip((s + 64) >> 7, 0, 255)
            elif fr:
                s = 0
                for k in range(taps):
                    s += filters[fr][k] * ext[br + yy - off + k,
                                              bc + xx]
                out[yy, xx] = np.clip((s + 64) >> 7, 0, 255)
            else:
                out[yy, xx] = ext[br + yy, bc + xx]
    return out


# ------------------------------------------------------------------- tests


@needs_libwebp
def test_libwebp_refuses_inter_frames():
    """Documents WHY no cross-codec oracle exists: the only VP8
    implementation in this container is keyframe-only."""
    frame = build_inter_frame(lambda be: None)
    wi, hi = ctypes.c_int(), ctypes.c_int()
    webp = (b"RIFF" + (len(frame) + 12 + (len(frame) & 1))
            .to_bytes(4, "little") + b"WEBP" + b"VP8 "
            + len(frame).to_bytes(4, "little") + frame
            + (b"\x00" if len(frame) & 1 else b""))
    p = _LIB.WebPDecodeRGB(webp, len(webp), ctypes.byref(wi),
                           ctypes.byref(hi))
    assert not p, "libwebp unexpectedly decoded an inter frame"


def test_keyframe_roundtrip_validates_encoder():
    """The test encoder's keyframes decode through the
    libwebp-pinned keyframe decoder: all-DC 32x32 keyframe with no
    residuals must be the all-127-DC prediction surface."""
    mb_w = mb_h = 2

    def mbs(be):
        for _ in range(mb_w * mb_h):
            be.b(1, 128)                      # skip
            be.tree(KF_YMODE_TREE, KF_YMODE_PROB, DC_PRED)
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)

    rgb = decode_vp8(build_keyframe(32, 32, mbs))
    assert rgb.shape == (32, 32, 3)
    # DC prediction from the synthetic 127/129 borders is uniform;
    # YUV(128-ish) → one flat RGB color everywhere
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == 1


@needs_libwebp
def test_zero_mv_identity():
    """kf + all-skip ZEROMV inter frame == the keyframe, byte-exact
    (the fundamental inter identity)."""
    rng = np.random.default_rng(3)
    img = _natural(48, 64, rng)
    kf = _webp_vp8_chunk(img, 75.0)
    dec = VP8Decoder()
    base = dec.decode_frame(kf)
    mb_w, mb_h = 4, 3
    trk = _NeighborTracker(mb_w, mb_h)

    def mbs(be):
        for y in range(mb_h):
            trk.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk, x, y, ZEROMV)

    out = dec.decode_frame(build_inter_frame(mbs))
    assert np.array_equal(out, base)


@needs_libwebp
def test_fullpel_translation_matches_numpy():
    """All-MB NEWMV with one full-pel MV == numpy shift of the
    edge-extended reference (luma and chroma)."""
    rng = np.random.default_rng(5)
    img = _natural(32, 48, rng)
    kf = _webp_vp8_chunk(img, 90.0)
    dec = VP8Decoder()
    base = dec.decode_frame(kf)
    assert base is not None
    # EVEN pixel shifts: odd luma shifts give fractional chroma
    # phases (the /2 derivation), which filter rather than shift —
    # even ones keep chroma integral so the RGB identity holds
    mv = (2 * 8, -4 * 8)                  # +2 rows, -4 cols (8th-pel)
    mb_w, mb_h = 3, 2
    trk = _NeighborTracker(mb_w, mb_h)

    def mbs(be):
        for y in range(mb_h):
            trk.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk, x, y, NEWMV, mv=mv)

    out = dec.decode_frame(build_inter_frame(mbs))
    # oracle: same shift applied to the decoder's stored reference
    # luma/chroma planes, then the same YUV→RGB path — instead
    # compare in RGB via a second decode of a shifted... simplest:
    # the luma plane relation: out == base shifted with edge
    # replication. Verify on the RGB canvas interior where no
    # border effects reach.
    dr, dc = mv[0] >> 3, mv[1] >> 3
    inner = out[8:-8, 8:-8]
    expect = base[8 + dr:-8 + dr or None,
                  8 + dc:-8 + dc or None]
    assert inner.shape == expect.shape
    assert np.array_equal(inner, expect)


@needs_libwebp
@pytest.mark.parametrize("version,filters", [(0, SIXTAP_FILTERS),
                                             (1, BILINEAR_FILTERS)])
def test_subpixel_mc_matches_independent_oracle(version, filters):
    """Fractional-MV NEWMV against the scalar numpy MC oracle, on
    the luma plane, for both the sixtap (v0) and bilinear (v1)
    reconstruction filters."""
    rng = np.random.default_rng(7)
    img = _natural(32, 32, rng)
    kf = _webp_vp8_chunk(img, 92.0)
    dec = VP8Decoder()
    dec.decode_frame(kf)
    ref_y = dec.refs[1][0]
    border = 32                           # vp8._REF_BORDER
    plane = ref_y[border:-border, border:-border]
    mv = (2 * 3 + 0, 2 * 5 + 0)           # wait: see below
    mv = (6, 10)                          # 6/8 row, 10/8 col phases
    mb_w, mb_h = 2, 2
    trk = _NeighborTracker(mb_w, mb_h)

    def mbs(be):
        for y in range(mb_h):
            trk.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk, x, y, NEWMV, mv=mv)

    frame = build_inter_frame(mbs)
    if version == 1:
        tag = int.from_bytes(frame[:3], "little")
        tag |= 1 << 1                     # version 1 → bilinear
        frame = tag.to_bytes(3, "little") + frame[3:]
    out = dec.decode_frame(frame)
    assert out is not None
    # recover the decoded luma from the NEW last reference buffer
    got_y = dec.refs[1][0][border:-border, border:-border]
    want = _mc_oracle(plane, 0, 0, 32, 32, mv, filters)
    assert np.array_equal(got_y, want.astype(np.uint8))


@needs_libwebp
def test_golden_refresh_and_reference_switch():
    """Frame 2 moves content and refreshes GOLDEN; frame 3 decodes
    from golden with ZEROMV and must equal frame 2. Then a
    copy_to_golden=1 frame re-points golden at last."""
    rng = np.random.default_rng(11)
    img = _natural(32, 32, rng)
    dec = VP8Decoder()
    dec.decode_frame(_webp_vp8_chunk(img, 85.0))
    mb_w = mb_h = 2
    mv = (8, 8)

    trk = _NeighborTracker(mb_w, mb_h)

    def mbs2(be):
        for y in range(mb_h):
            trk.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk, x, y, NEWMV, mv=mv)

    f2 = dec.decode_frame(build_inter_frame(mbs2, refresh_golden=1))

    trk3 = _NeighborTracker(mb_w, mb_h)

    def mbs3(be):
        for y in range(mb_h):
            trk3.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk3, x, y, ZEROMV, ref=2)

    f3 = dec.decode_frame(build_inter_frame(mbs3, refresh_last=0))
    assert np.array_equal(f3, f2)
    # golden now re-pointed at last (which still holds frame 2):
    # copy flag semantics — decode another golden-ZEROMV frame
    trk4 = _NeighborTracker(mb_w, mb_h)

    def mbs4(be):
        for y in range(mb_h):
            trk4.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk4, x, y, ZEROMV, ref=2)

    f4 = dec.decode_frame(build_inter_frame(
        mbs4, refresh_last=0, copy_to_golden=1))
    assert np.array_equal(f4, f2)


@needs_libwebp
def test_nearestmv_and_splitmv_compose():
    """MB 0 carries a NEWMV; MB 1 codes NEARESTMV (must inherit MB
    0's clamped MV); MB 2 is a SPLITMV 8x8 with mixed
    LEFT4X4/ZERO4X4/NEW4X4 sub-vectors — all against the numpy
    oracle per 4x4 block."""
    rng = np.random.default_rng(13)
    img = _natural(16, 64, rng)
    dec = VP8Decoder()
    dec.decode_frame(_webp_vp8_chunk(img, 88.0))
    border = 32
    plane = dec.refs[1][0][border:-border, border:-border].copy()
    mb_w, mb_h = 4, 1
    mv = (0, 16)                          # 2 px right
    sub_new = (8, 0)
    trk = _NeighborTracker(mb_w, mb_h)
    states = []

    def mbs(be):
        trk.row_start()
        states.append(_write_inter_mb(be, trk, 0, 0, NEWMV, mv=mv))
        states.append(_write_inter_mb(be, trk, 1, 0, NEARESTMV))
        plan = (2, [(LEFT4X4, None), (ZERO4X4, None),
                    (NEW4X4, sub_new), (ZERO4X4, None)])
        states.append(_write_inter_mb(be, trk, 2, 0, SPLITMV,
                                      submv_plan=plan))
        states.append(_write_inter_mb(be, trk, 3, 0, ZEROMV))

    out = dec.decode_frame(build_inter_frame(mbs))
    assert out is not None
    got_y = dec.refs[1][0][border:-border, border:-border]
    assert states[1].mv == mv             # NEARESTMV inherited
    # oracle per MB
    for x, st in enumerate(states):
        for sy in range(4):
            for sx in range(4):
                smv = (st.submvs[4 * sy + sx]
                       if st.submvs is not None else st.mv)
                want = _mc_oracle(plane, 4 * sy, 16 * x + 4 * sx,
                                  4, 4, smv, SIXTAP_FILTERS)
                got = got_y[4 * sy:4 * sy + 4,
                            16 * x + 4 * sx:16 * x + 4 * sx + 4]
                assert np.array_equal(got, want.astype(np.uint8)), \
                    (x, sy, sx, smv)


@needs_libwebp
def test_intra_mb_in_inter_frame():
    """All-intra-DC inter frame: prediction surfaces come from the
    synthetic borders exactly as a keyframe's would."""
    rng = np.random.default_rng(17)
    dec = VP8Decoder()
    dec.decode_frame(_webp_vp8_chunk(_natural(32, 32, rng), 80.0))
    mb_w = mb_h = 2
    trk = _NeighborTracker(mb_w, mb_h)

    def mbs(be):
        for y in range(mb_h):
            trk.row_start()
            for x in range(mb_w):
                _write_intra_dc_mb(be, trk, x)

    out = dec.decode_frame(build_inter_frame(mbs))
    assert out is not None
    # compare with the same surface decoded as a KEYFRAME via the
    # pinned keyframe path
    def kmbs(be):
        for _ in range(mb_w * mb_h):
            be.b(1, 128)
            be.tree(KF_YMODE_TREE, KF_YMODE_PROB, DC_PRED)
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)

    want = decode_vp8(build_keyframe(32, 32, kmbs))
    assert np.array_equal(out, want)


@needs_libwebp
def test_invisible_altref_update():
    """show=0 frame returns None but refreshes altref; the next
    frame can reference it."""
    rng = np.random.default_rng(19)
    dec = VP8Decoder()
    base = dec.decode_frame(_webp_vp8_chunk(_natural(32, 32, rng),
                                            85.0))
    mb_w = mb_h = 2
    mv = (16, 0)
    trk = _NeighborTracker(mb_w, mb_h)

    def mbs(be):
        for y in range(mb_h):
            trk.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk, x, y, NEWMV, mv=mv)

    hidden = dec.decode_frame(build_inter_frame(
        mbs, refresh_last=0, refresh_alt=1, show=0))
    assert hidden is None
    trk2 = _NeighborTracker(mb_w, mb_h)

    def mbs2(be):
        for y in range(mb_h):
            trk2.row_start()
            for x in range(mb_w):
                _write_inter_mb(be, trk2, x, y, ZEROMV, ref=3)

    out = dec.decode_frame(build_inter_frame(mbs2, refresh_last=0))
    inner = out[4:-4, 4:-4]
    want = base[6:-2, 4:-4]               # mv = 2 rows down
    assert np.array_equal(inner, want)


def test_inter_before_keyframe_and_truncation_raise():
    dec = VP8Decoder()
    with pytest.raises(ValueError, match="keyframe"):
        dec.decode_frame(build_inter_frame(lambda be: None))
    rng = np.random.default_rng(23)
    if _LIB is not None:
        dec = VP8Decoder()
        dec.decode_frame(_webp_vp8_chunk(_natural(32, 32, rng), 80))
        mb = _NeighborTracker(2, 2)

        def mbs(be):
            for y in range(2):
                mb.row_start()
                for x in range(2):
                    _write_inter_mb(be, mb, x, y, ZEROMV)

        frame = build_inter_frame(mbs)
        for cut in range(0, len(frame), 3):
            try:
                dec.decode_frame(frame[:cut])
            except ValueError:
                pass


@needs_libwebp
def test_ivf_demux_end_to_end():
    """IVF container: kf + 2 inter frames decode builtin through
    sample_frames' demux contract; keyframes_only skips inter
    reconstruction."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        parse_ivf,
    )
    rng = np.random.default_rng(29)
    img = _natural(32, 32, rng)
    kf = _webp_vp8_chunk(img, 85.0)
    dec = VP8Decoder()
    base = dec.decode_frame(kf)
    mb_w = mb_h = 2
    frames = [kf]
    for _ in range(2):
        trk = _NeighborTracker(mb_w, mb_h)

        def mbs(be, trk=trk):
            for y in range(mb_h):
                trk.row_start()
                for x in range(mb_w):
                    _write_inter_mb(be, trk, x, y, ZEROMV)

        frames.append(build_inter_frame(mbs))

    hdr = (b"DKIF" + (0).to_bytes(2, "little")
           + (32).to_bytes(2, "little") + b"VP80"
           + (32).to_bytes(2, "little") + (32).to_bytes(2, "little")
           + (30).to_bytes(4, "little") + (1).to_bytes(4, "little")
           + len(frames).to_bytes(4, "little") + bytes(4))
    body = b"".join(len(f).to_bytes(4, "little")
                    + i.to_bytes(8, "little") + f
                    for i, f in enumerate(frames))
    ivf = hdr + body
    info = parse_ivf(ivf)
    assert (info["width"], info["height"], info["codec"]) \
        == (32, 32, "vp8")
    assert len(info["frames"]) == 3
    # every decoded frame equals the keyframe (ZEROMV chain)
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        _decode_ppm,
    )
    for f in info["frames"]:
        assert np.array_equal(_decode_ppm(f), base)
    only_kf = parse_ivf(ivf, keyframes_only=True)
    assert only_kf["indexes"] == [0]
    assert len(only_kf["frames"]) == 1


@needs_libwebp
def test_inter_residual_tokens_on_splitmv():
    """A non-skip SPLITMV MB (all-ZERO4X4) with a REAL coefficient
    token stream: Y block 0 carries one +1 DC coefficient; all other
    blocks end immediately. Output = motion-compensated reference
    plus the dequantized DC residual through the pinned IDCT — the
    token machinery runs end-to-end on the inter path with the
    correct nz contexts."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8 import (
        COEFF_BANDS, DC_QLOOKUP, DEFAULT_COEFF_PROBS, _idct4x4,
    )
    rng = np.random.default_rng(31)
    dec = VP8Decoder()
    dec.decode_frame(_webp_vp8_chunk(_natural(16, 16, rng), 90.0))
    border = 32
    ref_y = dec.refs[1][0][border:-border, border:-border].copy()
    trk = _NeighborTracker(1, 1)

    def mbs(be):
        trk.row_start()
        plan = (3, [(ZERO4X4, None)] * 16)
        _write_inter_mb(be, trk, 0, 0, SPLITMV, skip=0,
                        submv_plan=plan)

    te = BoolEncoder()
    probs = DEFAULT_COEFF_PROBS[3]        # ytype 3: no Y2

    def encode_block(ctx, dc_value):
        """Mirror of _get_coeffs for [dc_value, EOB]."""
        p = probs[COEFF_BANDS[0]][ctx]
        if dc_value == 0:
            te.b(0, p[0])                 # EOB at once
            return 0
        te.b(1, p[0])                     # not EOB
        te.b(1, p[1])                     # nonzero
        te.b(0, p[2])                     # value 1 (nctx 1)
        te.b(0, 128)                      # sign +
        p = probs[COEFF_BANDS[1]][1]
        te.b(0, p[0])                     # EOB
        return 1

    # Y blocks with decoder-faithful nz context propagation
    above = [0, 0, 0, 0]
    for sy in range(4):
        lnz = 0
        for sx in range(4):
            ctx = lnz + above[sx]
            nz = encode_block(ctx, 1 if (sy, sx) == (0, 0) else 0)
            lnz = nz
            above[sx] = nz
    # chroma: 2x2 U then V, all empty
    uvp = DEFAULT_COEFF_PROBS[2]
    au = [0, 0]
    for _pl in range(2):
        for sy in range(2):
            lnz = 0
            for sx in range(2):
                te.b(0, uvp[COEFF_BANDS[0]][lnz + au[sx]][0])
                lnz = 0
                au[sx] = 0
    tokens = te.flush()

    out = dec.decode_frame(build_inter_frame(mbs,
                                             token_bytes=tokens))
    assert out is not None
    got_y = dec.refs[1][0][border:-border, border:-border]
    coeffs = np.zeros(16, np.int64)
    coeffs[0] = DC_QLOOKUP[0]             # q index 0, +1 DC
    want = ref_y.astype(np.int64)
    want[0:4, 0:4] += _idct4x4(coeffs)
    want = np.clip(want, 0, 255).astype(np.uint8)
    assert np.array_equal(got_y, want)


def _st(ref=0, mode=DC_PRED, mv=(0, 0), submvs=None):
    return _MbState(ref=ref, mode=mode, mv=mv, submvs=submvs)


def test_find_near_mvs_semantics_direct():
    """The §16.3 survey's intricate rules, unit-tested in isolation:
    weights, top-entry dedupe, near/nearest swap, third-distinct
    strengthening, sign-bias negation, best-mv election, and the
    16-px border clamp."""
    sb = [0, 0, 0, 0]
    mid = dict(mb_x=4, mb_y=4, mb_w=16, mb_h=16)

    # dedupe: left repeats above's MV -> one candidate with weight 4
    best, nearest, near, cnt, _ = find_near_mvs(
        _st(ref=1, mv=(2, 4)), _st(ref=1, mv=(2, 4)), _st(), 1, sb,
        **mid)
    assert nearest == (2, 4) and near == (0, 0)
    assert cnt[1] == 4 and cnt[2] == 0

    # swap: left+aboveleft agree on B (weight 3) > above's A (2)
    best, nearest, near, cnt, _ = find_near_mvs(
        _st(ref=1, mv=(2, 4)), _st(ref=1, mv=(-6, 8)),
        _st(ref=1, mv=(-6, 8)), 1, sb, **mid)
    assert nearest == (-6, 8) and near == (2, 4)
    assert cnt[1] == 3 and cnt[2] == 2

    # third distinct equal to nearest strengthens it (the slot-3
    # aliasing rule): above A, left B, aboveleft A (vs top B ->
    # appended third) -> cnt[nearest] gets +1
    best, nearest, near, cnt, _ = find_near_mvs(
        _st(ref=1, mv=(2, 4)), _st(ref=1, mv=(-6, 8)),
        _st(ref=1, mv=(2, 4)), 1, sb, **mid)
    assert nearest == (2, 4) and cnt[1] == 3

    # zero-MV inter neighbors count toward the intra/zero bucket
    best, nearest, near, cnt, _ = find_near_mvs(
        _st(ref=1, mv=(0, 0)), _st(ref=1, mv=(0, 0)), _st(), 1, sb,
        **mid)
    assert cnt[0] == 4 and nearest == (0, 0)

    # best-mv election: cnt[nearest] >= cnt[zero] -> best = nearest
    best, nearest, _, cnt, _ = find_near_mvs(
        _st(ref=1, mv=(0, 0)), _st(ref=1, mv=(4, 4)), _st(), 1, sb,
        **mid)
    assert cnt[0] == 2 and cnt[1] == 2 and best == (4, 4)
    # ... and stays zero when the zero bucket dominates
    best, _, _, cnt, _ = find_near_mvs(
        _st(ref=1, mv=(0, 0)), _st(ref=1, mv=(4, 4)),
        _st(ref=1, mv=(0, 0)), 1, sb, **mid)
    assert cnt[0] == 3 and cnt[1] == 2 and best == (0, 0)

    # sign bias: golden-referenced neighbor flips for a last-frame
    # target when the biases differ
    sb_g = [0, 0, 1, 0]
    _, nearest, _, _, _ = find_near_mvs(
        _st(ref=2, mv=(2, 4)), _st(), _st(), 1, sb_g, **mid)
    assert nearest == (-2, -4)
    # ... and does NOT flip when the target shares the bias
    _, nearest, _, _, _ = find_near_mvs(
        _st(ref=2, mv=(2, 4)), _st(), _st(), 2, sb_g, **mid)
    assert nearest == (2, 4)

    # SPLITMV neighbors feed cnt[3] (2/2/1 weighting)
    _, _, _, cnt, _ = find_near_mvs(
        _st(ref=1, mode=SPLITMV, mv=(2, 0)),
        _st(ref=1, mode=SPLITMV, mv=(2, 0)),
        _st(ref=1, mode=SPLITMV, mv=(2, 0)), 1, sb, **mid)
    assert cnt[3] == 5

    # border clamp: a huge MV at the top-left corner clamps to the
    # 16-px margin beyond the frame edge
    _, nearest, _, _, _ = find_near_mvs(
        _st(ref=1, mv=(-4000, -4000)), _st(), _st(), 1, sb,
        mb_x=0, mb_y=0, mb_w=4, mb_h=4)
    assert nearest == (-(16 << 3), -(16 << 3))


@needs_libwebp
def test_splitmv_left_inheritance_across_mbs():
    """LEFT4X4 on MB 1's left-column subblocks must inherit MB 0's
    RIGHT-column sub-vectors (b+3), not its macroblock MV."""
    rng = np.random.default_rng(37)
    dec = VP8Decoder()
    dec.decode_frame(_webp_vp8_chunk(_natural(16, 32, rng), 90.0))
    border = 32
    plane = dec.refs[1][0][border:-border, border:-border].copy()
    trk = _NeighborTracker(2, 1)
    states = []

    def mbs(be):
        trk.row_start()
        # MB 0: 4x4 split, right column carries a distinct MV
        ops = []
        for b in range(16):
            if b % 4 == 3:
                ops.append((NEW4X4, (8, 16)))
            else:
                ops.append((ZERO4X4, None))
        states.append(_write_inter_mb(be, trk, 0, 0, SPLITMV,
                                      submv_plan=(3, ops)))
        # MB 1: left column inherits via LEFT4X4
        ops1 = [(LEFT4X4, None) if b % 4 == 0 else (ZERO4X4, None)
                for b in range(16)]
        states.append(_write_inter_mb(be, trk, 1, 0, SPLITMV,
                                      submv_plan=(3, ops1)))

    out = dec.decode_frame(build_inter_frame(mbs))
    assert out is not None
    # the left-column subblocks of MB 1 carry MB 0's right-column MV
    for b in (0, 4, 8, 12):
        assert states[1].submvs[b] == (8, 16), b
    got_y = dec.refs[1][0][border:-border, border:-border]
    for x, st in enumerate(states):
        for sy in range(4):
            for sx in range(4):
                smv = st.submvs[4 * sy + sx]
                want = _mc_oracle(plane, 4 * sy, 16 * x + 4 * sx,
                                  4, 4, smv, SIXTAP_FILTERS)
                got = got_y[4 * sy:4 * sy + 4,
                            16 * x + 4 * sx:16 * x + 4 * sx + 4]
                assert np.array_equal(got, want.astype(np.uint8)), \
                    (x, sy, sx, smv)


def _seg_header_bits(be, seg):
    """Segmentation header: None = off, 'keep' = enabled with no
    updates (state persists from the sequence), dict = full
    (absolute quants + coded map)."""
    if seg is None:
        be.b(0, 128)
        return
    be.b(1, 128)                          # segmentation_enabled
    if seg == "keep":
        be.b(0, 128)                      # no map update
        be.b(0, 128)                      # no feature update
        return
    be.b(1, 128)                          # update_mb_seg_map
    be.b(1, 128)                          # update_segment_feature_data
    be.b(1, 128)                          # absolute values
    for qv in seg["quants"]:
        if qv:
            be.b(1, 128)
            be.literal(7, abs(qv))
            be.b(1 if qv < 0 else 0, 128)
        else:
            be.b(0, 128)
    for _ in range(4):                    # no LF deltas
        be.b(0, 128)
    for _ in range(3):                    # tree probs: default 255
        be.b(0, 128)


@needs_libwebp
def test_keyframe_segment_state_persists_into_inter_frames():
    """A video keyframe codes a segment map + absolute segment
    quants; a following inter frame keeps segmentation ON without
    re-coding either — its residuals must dequantize with the
    INHERITED per-MB quants (r14: VP8Decoder persists keyframe
    segment state, not just inter-frame state)."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.vp8 import (
        COEFF_BANDS, DC_QLOOKUP, DEFAULT_COEFF_PROBS,
        MB_SEGMENT_TREE, _idct4x4,
    )
    dec = VP8Decoder()
    seg = {"quants": [0, 80, 0, 0]}
    seg_ids = [0, 1]                      # MB0 -> seg0, MB1 -> seg1

    # keyframe: 2 MBs, all-DC intra, segmentation with the map
    be = BoolEncoder()
    be.b(0, 128)                          # color space
    be.b(0, 128)                          # clamping
    _seg_header_bits(be, seg)
    be.b(0, 128)                          # filter type
    be.literal(6, 0)
    be.literal(3, 0)
    be.b(0, 128)                          # lf deltas off
    be.literal(2, 0)                      # 1 partition
    be.literal(7, 0)                      # y_ac_qi = 0
    for _ in range(5):
        be.b(0, 128)
    be.b(1, 128)                          # refresh entropy
    _no_coeff_updates(be)
    be.b(1, 128)
    be.literal(8, 128)                    # prob_skip_false
    for s in seg_ids:
        be.tree(MB_SEGMENT_TREE, [255, 255, 255], s)
        be.b(1, 128)                      # skip
        be.tree(KF_YMODE_TREE, KF_YMODE_PROB, DC_PRED)
        be.tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)
    part0 = be.flush()
    tag = (0 | (1 << 4) | (len(part0) << 5))
    kf = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
          + (32).to_bytes(2, "little") + (16).to_bytes(2, "little")
          + part0 + b"\x00")
    base = dec.decode_frame(kf)
    assert base is not None
    assert dec.seg_map == seg_ids
    assert dec.seg_quant[1] == 80 and dec.seg_abs == 1

    border = 32
    ref_y = dec.refs[1][0][border:-border, border:-border].copy()

    # inter frame: segmentation KEPT (no map, no data), one SPLITMV
    # all-ZERO4X4 MB per position with a +1 DC residual on Y block 0
    trk = _NeighborTracker(2, 1)

    def mbs(be2):
        trk.row_start()
        for x in range(2):
            _write_inter_mb(be2, trk, x, 0, SPLITMV, skip=0,
                            submv_plan=(3, [(ZERO4X4, None)] * 16))

    be2 = BoolEncoder()
    _seg_header_bits(be2, "keep")
    be2.b(0, 128)                         # filter type
    be2.literal(6, 0)
    be2.literal(3, 0)
    be2.b(0, 128)
    be2.literal(2, 0)
    be2.literal(7, 0)
    for _ in range(5):
        be2.b(0, 128)
    be2.b(0, 128)                         # refresh golden
    be2.b(0, 128)                         # refresh alt
    be2.literal(2, 0)
    be2.literal(2, 0)
    be2.b(0, 128)
    be2.b(0, 128)
    be2.b(1, 128)                         # refresh entropy
    be2.b(1, 128)                         # refresh last
    _no_coeff_updates(be2)
    be2.b(1, 128)
    be2.literal(8, 128)
    be2.literal(8, 128)                   # prob_intra
    be2.literal(8, 128)                   # prob_last
    be2.literal(8, 128)                   # prob_gf
    be2.b(0, 128)
    be2.b(0, 128)
    _no_mv_updates(be2)
    mbs(be2)
    part0 = be2.flush()

    te = BoolEncoder()
    probs = DEFAULT_COEFF_PROBS[3]

    def one_mb_tokens(dc_on_block0):
        above = [0, 0, 0, 0]
        for sy in range(4):
            lnz = 0
            for sx in range(4):
                ctx = lnz + above[sx]
                p = probs[COEFF_BANDS[0]][ctx]
                if dc_on_block0 and (sy, sx) == (0, 0):
                    te.b(1, p[0])
                    te.b(1, p[1])
                    te.b(0, p[2])
                    te.b(0, 128)
                    te.b(0, probs[COEFF_BANDS[1]][1][0])
                    lnz = 1
                else:
                    te.b(0, p[0])
                    lnz = 0
                above[sx] = lnz
        uvp = DEFAULT_COEFF_PROBS[2]
        for _pl in range(2):
            for sy in range(2):
                for sx in range(2):
                    te.b(0, uvp[COEFF_BANDS[0]][0][0])

    one_mb_tokens(True)
    one_mb_tokens(True)
    tag2 = (1 | (1 << 4) | (len(part0) << 5))
    frame = tag2.to_bytes(3, "little") + part0 + te.flush()

    out = dec.decode_frame(frame)
    assert out is not None
    got_y = dec.refs[1][0][border:-border, border:-border]
    # MB0 dequantizes with seg0 (q=0 -> DC step 4), MB1 with seg1
    # (abs q=80) — the INHERITED map decides
    for x, q in ((0, 0), (1, 80)):
        coeffs = np.zeros(16, np.int64)
        coeffs[0] = DC_QLOOKUP[q]
        want = ref_y[:, 16 * x:16 * x + 16].astype(np.int64)
        want[0:4, 0:4] += _idct4x4(coeffs)
        want = np.clip(want, 0, 255).astype(np.uint8)
        assert np.array_equal(got_y[:, 16 * x:16 * x + 16], want), x
