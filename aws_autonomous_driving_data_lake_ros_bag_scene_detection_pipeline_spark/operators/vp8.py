"""Builtin lossy VP8 decoder — keyframes (r13, VERDICT r12 item 5)
plus full inter-frame video decoding (r14, VERDICT r13 item 4:
:class:`VP8Decoder`, reference buffers, motion compensation).

A lossy WebP still is EXACTLY one VP8 keyframe (RFC 6386 bitstream
inside a RIFF chunk), and lossy is the dominant in-the-wild WebP —
the WARC front door's main image format. Raw VP8 *video* (IVF /
``multimodal.parse_ivf``) additionally carries inter frames that
motion-compensate against the last/golden/altref buffers. This
module decodes both from the public spec, pure numpy + Python (no
Pillow, no libwebp), total on hostile bytes (malformed input raises
``ValueError`` naming the defect; nothing loops unbounded or indexes
past buffers):

- boolean (arithmetic) decoder, RFC 6386 §7;
- keyframe header: segmentation, loop-filter params & deltas, token
  partitions, quantizer indices, coefficient-probability updates,
  RFC 6386 §9;
- per-macroblock intra modes over the keyframe trees/contexts
  (16x16 DC/V/H/TM, per-subblock B modes with the
  above/left-conditioned kf probability table, chroma modes),
  RFC 6386 §11;
- DCT/WHT coefficient tokens (bands, tri-state contexts, category
  extra bits) and dequantization, RFC 6386 §13;
- inverse WHT (Y2 DC distribution) and the exact integer inverse
  DCT (20091/35468 multiplier form), RFC 6386 §14;
- intra prediction + reconstruction, RFC 6386 §12;
- the in-loop deblocking filter, both normal and simple, with
  per-segment/per-mode level adjustment, RFC 6386 §15;
- YUV 4:2:0 → RGB with the libwebp fixed-point BT.601 conversion
  and the libwebp "fancy" (bilinear) chroma upsampler, so output
  bytes match what the rest of the world shows for the same file.

Entry point: :func:`decode_vp8` — bytes of a ``VP8 `` chunk body →
``(height, width, 3)`` uint8 RGB. The WebP container dispatch lives
in :mod:`.vp8l` (``decode_webp`` routes ``VP8 `` chunks here).

Correctness strategy: the decisive oracle is the SYSTEM libwebp
driven over ctypes in tests/test_vp8.py (gated on the library's
presence) — real encodes across sizes, qualities, content families,
multi-partition/simple-filter/sharpness/segmentation variants, and
alpha must decode BYTE-EXACT, which pins every probability table,
the token contexts, both transforms, all predictors, the deblocking
filter, and the upsampling against the reference implementation.
The big constant tables were extracted digit-exact from the public
libwebp binary's static data (they are RFC 6386 constants).
Library-free tests pin the arithmetic coder against an independent
spec-based bool encoder, the transforms against a float DCT, and
hostile-bytes totality.

Inter frames (golden/altref references, motion compensation) are out
of scope and raise loudly — a WebP still never contains them.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_vp8", "BoolDecoder", "VP8Decoder"]


# ----------------------------------------------------------------- tables
# All constant tables below are the published RFC 6386 defaults.

DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15,
    16, 17, 17, 18, 19, 20, 20, 21, 21, 22, 22, 23, 23,
    24, 25, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46,
    47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59,
    60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72,
    73, 74, 75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84,
    85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100, 101, 102,
    104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126, 128, 130,
    132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]
AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
    56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78,
    80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104,
    106, 108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137,
    140, 143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177,
    181, 185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229,
    234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]
assert len(DC_QLOOKUP) == 128 and len(AC_QLOOKUP) == 128

# 16x16 / chroma prediction modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 subblock modes — the bitstream numbering (this order keys the
# kf_bmode context table rows/cols AND the tree leaves; empirically
# pinned byte-exact against libwebp: RD/VR sit BEFORE LD)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_RD_PRED, B_VR_PRED,
 B_LD_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# trees are flat arrays: positive = internal-node index, negative-ish
# encoding via (-(leaf)-1) avoids the -0 ambiguity of the C form
def _t(v):                      # leaf marker
    return -v - 1


KF_YMODE_TREE = [_t(B_PRED), 2, 4, 6, _t(DC_PRED), _t(V_PRED),
                 _t(H_PRED), _t(TM_PRED)]
KF_YMODE_PROB = [145, 156, 163, 128]

BMODE_TREE = [
    _t(B_DC_PRED), 2,
    _t(B_TM_PRED), 4,
    _t(B_VE_PRED), 6,
    8, 12,
    _t(B_HE_PRED), 10,
    _t(B_RD_PRED), _t(B_VR_PRED),
    _t(B_LD_PRED), 14,
    _t(B_VL_PRED), 16,
    _t(B_HD_PRED), _t(B_HU_PRED),
]

UV_MODE_TREE = [_t(DC_PRED), 2, _t(V_PRED), 4, _t(H_PRED),
                _t(TM_PRED)]
KF_UV_MODE_PROB = [142, 114, 183]

MB_SEGMENT_TREE = [2, 4, _t(0), _t(1), _t(2), _t(3)]

# coefficient token alphabet
(DCT_0, DCT_1, DCT_2, DCT_3, DCT_4, DCT_CAT1, DCT_CAT2, DCT_CAT3,
 DCT_CAT4, DCT_CAT5, DCT_CAT6, DCT_EOB) = range(12)

COEFF_TOKEN_TREE = [
    _t(DCT_EOB), 2,
    _t(DCT_0), 4,
    _t(DCT_1), 6,
    8, 12,
    _t(DCT_2), 10,
    _t(DCT_3), _t(DCT_4),
    14, 16,
    _t(DCT_CAT1), _t(DCT_CAT2),
    18, 20,
    _t(DCT_CAT3), _t(DCT_CAT4),
    _t(DCT_CAT5), _t(DCT_CAT6),
]

CAT_PROBS = {
    DCT_CAT1: [159],
    DCT_CAT2: [165, 145],
    DCT_CAT3: [173, 148, 140],
    DCT_CAT4: [176, 155, 140, 135],
    DCT_CAT5: [180, 157, 141, 134, 130],
    DCT_CAT6: [254, 254, 243, 230, 196, 177, 153, 140, 133, 130,
               129],
}
CAT_BASE = {DCT_CAT1: 5, DCT_CAT2: 7, DCT_CAT3: 11, DCT_CAT4: 19,
            DCT_CAT5: 35, DCT_CAT6: 67}

COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]


# default DCT coefficient-token probabilities
# [block type][band][tri-state context][entropy node] — RFC 6386 §13.5
DEFAULT_COEFF_PROBS = [
    [   # block type 0
        [   # band 0
            [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
            [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
            [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
        [   # band 1
            [253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
            [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
            [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128],
        ],
        [   # band 2
            [1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128],
            [181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128],
            [78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128],
        ],
        [   # band 3
            [1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128],
            [184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128],
            [77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128],
        ],
        [   # band 4
            [1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128],
            [170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128],
            [37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128],
        ],
        [   # band 5
            [1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128],
            [207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128],
            [102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128],
        ],
        [   # band 6
            [1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128],
            [177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128],
            [80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128],
        ],
        [   # band 7
            [1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
            [246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
            [255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
    ],
    [   # block type 1
        [   # band 0
            [198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62],
            [131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1],
            [68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128],
        ],
        [   # band 1
            [1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128],
            [184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128],
            [81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128],
        ],
        [   # band 2
            [1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128],
            [99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128],
            [23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128],
        ],
        [   # band 3
            [1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128],
            [109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128],
            [44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128],
        ],
        [   # band 4
            [1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128],
            [94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128],
            [22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128],
        ],
        [   # band 5
            [1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128],
            [124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128],
            [35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128],
        ],
        [   # band 6
            [1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128],
            [121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128],
            [45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128],
        ],
        [   # band 7
            [1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128],
            [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
            [137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128],
        ],
    ],
    [   # block type 2
        [   # band 0
            [253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128],
            [175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128],
            [73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128],
        ],
        [   # band 1
            [1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128],
            [239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128],
            [155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128],
        ],
        [   # band 2
            [1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128],
            [201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128],
            [69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128],
        ],
        [   # band 3
            [1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128],
            [223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128],
            [141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128],
        ],
        [   # band 4
            [1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128],
            [190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128],
            [149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
        [   # band 5
            [1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128],
            [247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128],
            [240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
        [   # band 6
            [1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128],
            [213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128],
            [55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
        [   # band 7
            [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
            [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
            [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
    ],
    [   # block type 3
        [   # band 0
            [202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255],
            [126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128],
            [61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128],
        ],
        [   # band 1
            [1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128],
            [166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128],
            [39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128],
        ],
        [   # band 2
            [1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128],
            [124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128],
            [24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128],
        ],
        [   # band 3
            [1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128],
            [149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128],
            [28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128],
        ],
        [   # band 4
            [1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128],
            [123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128],
            [20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128],
        ],
        [   # band 5
            [1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128],
            [168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128],
            [47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128],
        ],
        [   # band 6
            [1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128],
            [141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128],
            [42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128],
        ],
        [   # band 7
            [1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
            [244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
            [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
        ],
    ],
]

# probabilities OF a coefficient-probability update in the frame
# header, same indexing — RFC 6386 §13.4
COEFF_UPDATE_PROBS = [
    [   # block type 0
        [   # band 0
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 1
            [176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255],
            [249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 2
            [255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255],
            [234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 3
            [255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 4
            [255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 5
            [255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 6
            [255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255],
            [250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255],
            [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 7
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
    ],
    [   # block type 1
        [   # band 0
            [217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255],
            [234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255],
        ],
        [   # band 1
            [255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 2
            [255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 3
            [255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 4
            [255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 5
            [255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 6
            [255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255],
            [250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 7
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
    ],
    [   # block type 2
        [   # band 0
            [186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255],
            [234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255],
            [251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255],
        ],
        [   # band 1
            [255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 2
            [255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 3
            [255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 4
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 5
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 6
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 7
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
    ],
    [   # block type 3
        [   # band 0
            [248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255],
            [248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 1
            [255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255],
            [246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255],
            [252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 2
            [255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255],
            [248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255],
            [253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 3
            [255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 4
            [255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255],
            [252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 5
            [255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 6
            [255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255],
            [250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
        [   # band 7
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
            [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
        ],
    ],
]

# keyframe subblock-mode probabilities, conditioned on the
# (above, left) subblock modes — RFC 6386 §11.4
KF_BMODE_PROB = [
    [   # above mode 0
        [231, 120, 48, 89, 115, 113, 120, 152, 112],
        [152, 179, 64, 126, 170, 118, 46, 70, 95],
        [175, 69, 143, 80, 85, 82, 72, 155, 103],
        [56, 58, 10, 171, 218, 189, 17, 13, 152],
        [114, 26, 17, 163, 44, 195, 21, 10, 173],
        [121, 24, 80, 195, 26, 62, 44, 64, 85],
        [144, 71, 10, 38, 171, 213, 144, 34, 26],
        [170, 46, 55, 19, 136, 160, 33, 206, 71],
        [63, 20, 8, 114, 114, 208, 12, 9, 226],
        [81, 40, 11, 96, 182, 84, 29, 16, 36],
    ],
    [   # above mode 1
        [134, 183, 89, 137, 98, 101, 106, 165, 148],
        [72, 187, 100, 130, 157, 111, 32, 75, 80],
        [66, 102, 167, 99, 74, 62, 40, 234, 128],
        [41, 53, 9, 178, 241, 141, 26, 8, 107],
        [74, 43, 26, 146, 73, 166, 49, 23, 157],
        [65, 38, 105, 160, 51, 52, 31, 115, 128],
        [104, 79, 12, 27, 217, 255, 87, 17, 7],
        [87, 68, 71, 44, 114, 51, 15, 186, 23],
        [47, 41, 14, 110, 182, 183, 21, 17, 194],
        [66, 45, 25, 102, 197, 189, 23, 18, 22],
    ],
    [   # above mode 2
        [88, 88, 147, 150, 42, 46, 45, 196, 205],
        [43, 97, 183, 117, 85, 38, 35, 179, 61],
        [39, 53, 200, 87, 26, 21, 43, 232, 171],
        [56, 34, 51, 104, 114, 102, 29, 93, 77],
        [39, 28, 85, 171, 58, 165, 90, 98, 64],
        [34, 22, 116, 206, 23, 34, 43, 166, 73],
        [107, 54, 32, 26, 51, 1, 81, 43, 31],
        [68, 25, 106, 22, 64, 171, 36, 225, 114],
        [34, 19, 21, 102, 132, 188, 16, 76, 124],
        [62, 18, 78, 95, 85, 57, 50, 48, 51],
    ],
    [   # above mode 3
        [193, 101, 35, 159, 215, 111, 89, 46, 111],
        [60, 148, 31, 172, 219, 228, 21, 18, 111],
        [112, 113, 77, 85, 179, 255, 38, 120, 114],
        [40, 42, 1, 196, 245, 209, 10, 25, 109],
        [88, 43, 29, 140, 166, 213, 37, 43, 154],
        [61, 63, 30, 155, 67, 45, 68, 1, 209],
        [100, 80, 8, 43, 154, 1, 51, 26, 71],
        [142, 78, 78, 16, 255, 128, 34, 197, 171],
        [41, 40, 5, 102, 211, 183, 4, 1, 221],
        [51, 50, 17, 168, 209, 192, 23, 25, 82],
    ],
    [   # above mode 4
        [138, 31, 36, 171, 27, 166, 38, 44, 229],
        [67, 87, 58, 169, 82, 115, 26, 59, 179],
        [63, 59, 90, 180, 59, 166, 93, 73, 154],
        [40, 40, 21, 116, 143, 209, 34, 39, 175],
        [47, 15, 16, 183, 34, 223, 49, 45, 183],
        [46, 17, 33, 183, 6, 98, 15, 32, 183],
        [57, 46, 22, 24, 128, 1, 54, 17, 37],
        [65, 32, 73, 115, 28, 128, 23, 128, 205],
        [40, 3, 9, 115, 51, 192, 18, 6, 223],
        [87, 37, 9, 115, 59, 77, 64, 21, 47],
    ],
    [   # above mode 5
        [104, 55, 44, 218, 9, 54, 53, 130, 226],
        [64, 90, 70, 205, 40, 41, 23, 26, 57],
        [54, 57, 112, 184, 5, 41, 38, 166, 213],
        [30, 34, 26, 133, 152, 116, 10, 32, 134],
        [39, 19, 53, 221, 26, 114, 32, 73, 255],
        [31, 9, 65, 234, 2, 15, 1, 118, 73],
        [75, 32, 12, 51, 192, 255, 160, 43, 51],
        [88, 31, 35, 67, 102, 85, 55, 186, 85],
        [56, 21, 23, 111, 59, 205, 45, 37, 192],
        [55, 38, 70, 124, 73, 102, 1, 34, 98],
    ],
    [   # above mode 6
        [125, 98, 42, 88, 104, 85, 117, 175, 82],
        [95, 84, 53, 89, 128, 100, 113, 101, 45],
        [75, 79, 123, 47, 51, 128, 81, 171, 1],
        [57, 17, 5, 71, 102, 57, 53, 41, 49],
        [38, 33, 13, 121, 57, 73, 26, 1, 85],
        [41, 10, 67, 138, 77, 110, 90, 47, 114],
        [115, 21, 2, 10, 102, 255, 166, 23, 6],
        [101, 29, 16, 10, 85, 128, 101, 196, 26],
        [57, 18, 10, 102, 102, 213, 34, 20, 43],
        [117, 20, 15, 36, 163, 128, 68, 1, 26],
    ],
    [   # above mode 7
        [102, 61, 71, 37, 34, 53, 31, 243, 192],
        [69, 60, 71, 38, 73, 119, 28, 222, 37],
        [68, 45, 128, 34, 1, 47, 11, 245, 171],
        [62, 17, 19, 70, 146, 85, 55, 62, 70],
        [37, 43, 37, 154, 100, 163, 85, 160, 1],
        [63, 9, 92, 136, 28, 64, 32, 201, 85],
        [75, 15, 9, 9, 64, 255, 184, 119, 16],
        [86, 6, 28, 5, 64, 255, 25, 248, 1],
        [56, 8, 17, 132, 137, 255, 55, 116, 128],
        [58, 15, 20, 82, 135, 57, 26, 121, 40],
    ],
    [   # above mode 8
        [164, 50, 31, 137, 154, 133, 25, 35, 218],
        [51, 103, 44, 131, 131, 123, 31, 6, 158],
        [86, 40, 64, 135, 148, 224, 45, 183, 128],
        [22, 26, 17, 131, 240, 154, 14, 1, 209],
        [45, 16, 21, 91, 64, 222, 7, 1, 197],
        [56, 21, 39, 155, 60, 138, 23, 102, 213],
        [83, 12, 13, 54, 192, 255, 68, 47, 28],
        [85, 26, 85, 85, 128, 128, 32, 146, 171],
        [18, 11, 7, 63, 144, 171, 4, 4, 246],
        [35, 27, 10, 146, 174, 171, 12, 26, 128],
    ],
    [   # above mode 9
        [190, 80, 35, 99, 180, 80, 126, 54, 45],
        [85, 126, 47, 87, 176, 51, 41, 20, 32],
        [101, 75, 128, 139, 118, 146, 116, 128, 85],
        [56, 41, 15, 176, 236, 85, 37, 9, 62],
        [71, 30, 17, 119, 118, 255, 17, 18, 138],
        [101, 38, 60, 138, 55, 70, 43, 26, 142],
        [146, 36, 19, 30, 171, 255, 97, 27, 20],
        [138, 45, 61, 62, 219, 1, 81, 188, 64],
        [32, 41, 20, 117, 151, 142, 20, 21, 163],
        [112, 19, 12, 61, 195, 128, 48, 4, 24],
    ],
]


# ----------------------------------------------------------- bool decoder


class BoolDecoder:
    """RFC 6386 §7.3 boolean (binary arithmetic) decoder. Reads past
    the end of the partition yield zero bits (the spec's behavior for
    well-formed streams whose last bits are implicit); actual
    malformed-stream detection happens at the structural level."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def decode(self, probability: int) -> int:
        split = 1 + (((self.range - 1) * probability) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            ret = 1
            self.range -= split
            self.value -= bigsplit
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        """n raw bits, MSB first (each with probability 128)."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode(128)
        return v

    def signed_literal(self, n: int) -> int:
        """n magnitude bits then a sign bit (RFC §9.3 deltas)."""
        v = self.literal(n)
        return -v if self.decode(128) else v

    def tree(self, tree: list[int], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.decode(probs[i >> 1])]
            if i < 0:
                return -i - 1

    def exhausted(self) -> bool:
        """True once reads have gone meaningfully past the partition
        end — the hostile-input circuit breaker."""
        return self.pos > len(self.data) + 8


# ----------------------------------------------------------- frame header


def _clip_q(v: int, hi: int = 127) -> int:
    return 0 if v < 0 else hi if v > hi else v


class _Header:
    pass


def parse_vp8_frame_header(payload: bytes) -> _Header:
    """Uncompressed frame tag + the bool-coded keyframe header
    (RFC 6386 §9). Returns a header object carrying everything the
    macroblock loop needs, including the positioned BoolDecoder for
    the first partition and one per token partition."""
    if len(payload) < 10:
        raise ValueError("VP8: payload shorter than the frame tag")
    tag = int.from_bytes(payload[0:3], "little")
    keyframe = not (tag & 1)
    version = (tag >> 1) & 7
    show = (tag >> 4) & 1
    part0_size = tag >> 5
    if not keyframe:
        raise ValueError(
            "VP8: inter frame — a WebP still is always a keyframe; "
            "decode video streams through VP8Decoder (r14), which "
            "carries the reference buffers inter frames need")
    if version > 3:
        raise ValueError(f"VP8: reserved version {version}")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w_code = int.from_bytes(payload[6:8], "little")
    h_code = int.from_bytes(payload[8:10], "little")
    h = _Header()
    h.version = version
    h.show = show
    h.width = w_code & 0x3FFF
    h.height = h_code & 0x3FFF
    h.xscale, h.yscale = w_code >> 14, h_code >> 14
    if h.width == 0 or h.height == 0:
        raise ValueError("VP8: zero frame dimension")
    if part0_size == 0:
        raise ValueError("VP8: zero-sized first partition — the "
                         "frame header cannot fit")
    if 10 + part0_size > len(payload):
        raise ValueError(
            f"VP8: first partition ({part0_size} bytes) overruns the "
            f"payload ({len(payload)} bytes)")
    bd = BoolDecoder(payload[10:10 + part0_size])

    h.color_space = bd.decode(128)
    h.clamping_type = bd.decode(128)

    # --- segmentation (§9.3)
    h.segmentation = bd.decode(128)
    h.update_mb_seg_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_mb_seg_map = bd.decode(128)
        update_data = bd.decode(128)
        if update_data:
            h.seg_abs = bd.decode(128)
            for i in range(4):
                if bd.decode(128):
                    h.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.decode(128):
                    h.seg_lf[i] = bd.signed_literal(6)
        if h.update_mb_seg_map:
            for i in range(3):
                h.seg_tree_probs[i] = (bd.literal(8) if bd.decode(128)
                                       else 255)

    # --- loop filter (§9.4)
    h.filter_type = bd.decode(128)       # 0 = normal, 1 = simple
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.decode(128)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.decode(128):               # mode_ref_lf_delta_update
            for i in range(4):
                if bd.decode(128):
                    h.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.decode(128):
                    h.mode_lf_deltas[i] = bd.signed_literal(6)

    # --- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    part_base = 10 + part0_size
    sizes = []
    table = payload[part_base:part_base + 3 * (n_parts - 1)]
    if len(table) < 3 * (n_parts - 1):
        raise ValueError("VP8: truncated token-partition size table")
    data_base = part_base + 3 * (n_parts - 1)
    pos = data_base
    for i in range(n_parts - 1):
        sz = int.from_bytes(table[3 * i:3 * i + 3], "little")
        if pos + sz > len(payload):
            raise ValueError(
                f"VP8: token partition {i} ({sz} bytes) overruns "
                f"the payload")
        sizes.append((pos, sz))
        pos += sz
    sizes.append((pos, len(payload) - pos))
    if sizes[-1][1] < 0:
        raise ValueError("VP8: token partitions overrun the payload")
    h.token_parts = [BoolDecoder(payload[p:p + s]) for p, s in sizes]

    # --- quantizers (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.y2_dc_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.y2_ac_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.uv_dc_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.uv_ac_delta = bd.signed_literal(4) if bd.decode(128) else 0

    # --- refresh entropy (§9.7; stills ignore it, VP8Decoder
    # honors it for sequence entropy persistence)
    h.refresh_entropy = bd.decode(128)

    # --- coefficient probability updates (§13.4)
    probs = [[[list(DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)]
              for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for i in range(11):
                    if bd.decode(upd[i]):
                        row[i] = bd.literal(8)
    h.coeff_probs = probs

    # --- skip flag (§9.10)
    h.mb_no_skip = bd.decode(128)
    h.prob_skip_false = bd.literal(8) if h.mb_no_skip else 0

    if bd.exhausted():
        raise ValueError("VP8: first partition exhausted mid-header")
    h.bd = bd
    return h


# ------------------------------------------------------ coefficient decode

# category extra-bit probability runs for tokens CAT1..CAT6 (§13.2)
_CAT_TABLE = [CAT_PROBS[DCT_CAT1], CAT_PROBS[DCT_CAT2],
              CAT_PROBS[DCT_CAT3], CAT_PROBS[DCT_CAT4],
              CAT_PROBS[DCT_CAT5], CAT_PROBS[DCT_CAT6]]


def _get_coeffs(bd: BoolDecoder, probs, ctx: int, dcq: int, acq: int,
                first: int, out) -> int:
    """One 4x4 block's coefficient tokens → dequantized values in
    ``out`` (natural order), returning the EOB position (libwebp
    GetCoeffs shape of the RFC §13.3 scan: EOB is only tested at the
    start and after nonzero values — never directly after a zero)."""
    n = first
    p = probs[COEFF_BANDS[n]][ctx]
    while n < 16:
        if not bd.decode(p[0]):
            return n                      # EOB
        while not bd.decode(p[1]):        # zero run
            n += 1
            if n == 16:
                return 16
            p = probs[COEFF_BANDS[n]][0]
        # nonzero value
        if not bd.decode(p[2]):
            v = 1
            nctx = 1
        else:
            nctx = 2
            if not bd.decode(p[3]):
                if not bd.decode(p[4]):
                    v = 2
                else:
                    v = 3 + bd.decode(p[5])
            elif not bd.decode(p[6]):
                if not bd.decode(p[7]):
                    v = 5 + bd.decode(159)
                else:
                    v = 7 + 2 * bd.decode(165) + bd.decode(145)
            else:
                bit1 = bd.decode(p[8])
                bit0 = bd.decode(p[9 + bit1])
                cat = 2 * bit1 + bit0     # cat3..cat6
                v = 0
                for cp in _CAT_TABLE[2 + cat]:
                    v += v + bd.decode(cp)
                v += 3 + (8 << cat)
        if bd.decode(128):
            v = -v
        out[ZIGZAG[n]] = v * (dcq if n == 0 else acq)
        n += 1
        if n == 16:
            return 16
        p = probs[COEFF_BANDS[n]][nctx]
    return 16


# ------------------------------------------------------------- transforms


def _iwht4x4(coeffs):
    """Inverse Walsh-Hadamard for the Y2 block (§14.3): returns the
    16 DC values in raster order."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        a2 = a1 + b1
        b2 = c1 + d1
        c2 = a1 - b1
        d2 = d1 - c1
        out[4 * i] = (a2 + 3) >> 3
        out[4 * i + 1] = (b2 + 3) >> 3
        out[4 * i + 2] = (c2 + 3) >> 3
        out[4 * i + 3] = (d2 + 3) >> 3
    return out


_C1, _C2 = 20091, 35468          # cospi8sqrt2-1, sinpi8sqrt2 (<<16)


def _idct4x4(coeffs) -> np.ndarray:
    """Exact integer inverse DCT (§14.3) → (4, 4) int array. Python
    ints keep the intermediate products exact; >> is the arithmetic
    shift the spec requires."""
    ip = list(coeffs)
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), np.int64)
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 2]
        b1 = tmp[4 * i] - tmp[4 * i + 2]
        t1 = (tmp[4 * i + 1] * _C2) >> 16
        t2 = tmp[4 * i + 3] + ((tmp[4 * i + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[4 * i + 1] + ((tmp[4 * i + 1] * _C1) >> 16)
        t2 = (tmp[4 * i + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# ------------------------------------------------------- intra prediction


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred16(plane, r0, c0, size, mode, have_above, have_left):
    """16x16 / 8x8 whole-block prediction (§12.2) into an int array.
    ``plane`` is the padded reconstruction; (r0, c0) the block's
    top-left in padded coordinates."""
    above = plane[r0 - 1, c0:c0 + size].astype(np.int64)
    left = plane[r0:r0 + size, c0 - 1].astype(np.int64)
    p = int(plane[r0 - 1, c0 - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) \
                >> (5 if size == 16 else 4)
        elif have_above:
            dc = (int(above.sum()) + size // 2) \
                >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + size // 2) \
                >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int64)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED: clamp happens at reconstruction add? No — TM clamps here
    out = left[:, None] + above[None, :] - p
    return np.clip(out, 0, 255)


def _pred_b(plane, r0, c0, mode):
    """4x4 subblock prediction (§12.3). (r0, c0) padded coords of the
    subblock. Reads above(4) + above-right(4) + left(4) + corner from
    the padded plane (fixups for the above-right rule are applied by
    the caller per macroblock)."""
    a = [int(v) for v in plane[r0 - 1, c0:c0 + 8]]
    l = [int(v) for v in plane[r0:r0 + 4, c0 - 1]]
    p = int(plane[r0 - 1, c0 - 1])
    x = np.empty((4, 4), np.int64)
    if mode == B_DC_PRED:
        dc = (sum(a[:4]) + sum(l) + 4) >> 3
        x[:] = dc
    elif mode == B_TM_PRED:
        la = np.array(l)[:, None] + np.array(a[:4])[None, :] - p
        x[:] = np.clip(la, 0, 255)
    elif mode == B_VE_PRED:
        e = [p] + a[:5]
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        x[:] = np.array(row)[None, :]
    elif mode == B_HE_PRED:
        e = [p] + l
        col = [_avg3(e[0], e[1], e[2]), _avg3(e[1], e[2], e[3]),
               _avg3(e[2], e[3], e[4]), _avg3(l[2], l[3], l[3])]
        x[:] = np.array(col)[:, None]
    elif mode == B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    x[r, c] = _avg3(a[i], a[i + 1], a[i + 2])
                else:
                    x[r, c] = _avg3(a[6], a[7], a[7])
    elif mode == B_RD_PRED:
        e = [l[3], l[2], l[1], l[0], p, a[0], a[1], a[2], a[3]]
        for r in range(4):
            for c in range(4):
                x[r, c] = _avg3(e[c - r + 3], e[c - r + 4],
                                e[c - r + 5])
    elif mode == B_VR_PRED:
        e = [l[3], l[2], l[1], l[0], p, a[0], a[1], a[2], a[3]]
        x[3, 0] = _avg3(e[1], e[2], e[3])
        x[2, 0] = _avg3(e[2], e[3], e[4])
        x[3, 1] = x[1, 0] = _avg3(e[3], e[4], e[5])
        x[2, 1] = x[0, 0] = _avg2(e[4], e[5])
        x[3, 2] = x[1, 1] = _avg3(e[4], e[5], e[6])
        x[2, 2] = x[0, 1] = _avg2(e[5], e[6])
        x[3, 3] = x[1, 2] = _avg3(e[5], e[6], e[7])
        x[2, 3] = x[0, 2] = _avg2(e[6], e[7])
        x[1, 3] = _avg3(e[6], e[7], e[8])
        x[0, 3] = _avg2(e[7], e[8])
    elif mode == B_VL_PRED:
        x[0, 0] = _avg2(a[0], a[1])
        x[1, 0] = _avg3(a[0], a[1], a[2])
        x[2, 0] = x[0, 1] = _avg2(a[1], a[2])
        x[1, 1] = x[3, 0] = _avg3(a[1], a[2], a[3])
        x[2, 1] = x[0, 2] = _avg2(a[2], a[3])
        x[3, 1] = x[1, 2] = _avg3(a[2], a[3], a[4])
        x[2, 2] = x[0, 3] = _avg2(a[3], a[4])
        x[3, 2] = x[1, 3] = _avg3(a[3], a[4], a[5])
        x[2, 3] = _avg3(a[4], a[5], a[6])
        x[3, 3] = _avg3(a[5], a[6], a[7])
    elif mode == B_HD_PRED:
        e = [l[3], l[2], l[1], l[0], p, a[0], a[1], a[2]]
        x[3, 0] = _avg2(e[0], e[1])
        x[3, 1] = _avg3(e[0], e[1], e[2])
        x[2, 0] = x[3, 2] = _avg2(e[1], e[2])
        x[2, 1] = x[3, 3] = _avg3(e[1], e[2], e[3])
        x[2, 2] = x[1, 0] = _avg2(e[2], e[3])
        x[2, 3] = x[1, 1] = _avg3(e[2], e[3], e[4])
        x[1, 2] = x[0, 0] = _avg2(e[3], e[4])
        x[1, 3] = x[0, 1] = _avg3(e[3], e[4], e[5])
        x[0, 2] = _avg3(e[4], e[5], e[6])
        x[0, 3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HU_PRED:
        x[0, 0] = _avg2(l[0], l[1])
        x[0, 1] = _avg3(l[0], l[1], l[2])
        x[0, 2] = x[1, 0] = _avg2(l[1], l[2])
        x[0, 3] = x[1, 1] = _avg3(l[1], l[2], l[3])
        x[1, 2] = x[2, 0] = _avg2(l[2], l[3])
        x[1, 3] = x[2, 1] = _avg3(l[2], l[3], l[3])
        x[2, 2] = x[2, 3] = x[3, 0] = x[3, 1] = x[3, 2] = x[3, 3] \
            = l[3]
    else:  # pragma: no cover - tree cannot produce other values
        raise ValueError(f"VP8: invalid subblock mode {mode}")
    return x


# -------------------------------------------------------------- loop filter


def _clamp128(v):
    return np.clip(v, -128, 127)


def _lf_params(level: int, sharpness: int, keyframe: bool = True):
    """(interior_limit, hev_threshold) for a macroblock level
    (RFC 6386 §15.1)."""
    interior = level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev = 0
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    return interior, hev


def _gather(plane, r, c, n, axis, count):
    """8 taps p3..q3 around an edge: for a vertical edge (axis=1) at
    column c over rows r..r+n, tap k is column c-4+k; horizontal is
    the transpose. Returns a (8, n) int64 view-copy."""
    if axis == 1:
        return [plane[r:r + n, c - 4 + k].astype(np.int64)
                for k in range(8)]
    return [plane[r - 4 + k, c:c + count].astype(np.int64)
            for k in range(8)]


def _scatter(plane, r, c, n, axis, k, vals):
    if axis == 1:
        plane[r:r + n, c - 4 + k] = vals
    else:
        plane[r - 4 + k, c:c + n] = vals


def _filter_edge(plane, r, c, n, axis, elim, ilim, hev_t, mb_edge,
                 simple):
    """Apply the §15.2-15.4 filter to one edge: vertical (axis=1,
    edge left of column c, rows r..r+n) or horizontal (axis=0, edge
    above row r, cols c..c+n). Vectorized over the n pixels."""
    taps = _gather(plane, r, c, n, axis, n)
    p3, p2, p1, p0, q0, q1, q2, q3 = taps
    mask = (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2) <= elim
    if not simple:
        for a, b in ((p3, p2), (p2, p1), (p1, p0), (q1, q0),
                     (q2, q1), (q3, q2)):
            mask &= np.abs(a - b) <= ilim
    if not mask.any():
        return
    ps1, ps0 = p1 - 128, p0 - 128
    qs0, qs1 = q0 - 128, q1 - 128
    if simple:
        a = _clamp128(_clamp128(ps1 - qs1) + 3 * (qs0 - ps0))
        f1 = _clamp128(a + 4) >> 3
        f2 = _clamp128(a + 3) >> 3
        nq0 = np.clip(qs0 - f1, -128, 127) + 128
        np0 = np.clip(ps0 + f2, -128, 127) + 128
        _scatter(plane, r, c, n, axis, 4,
                 np.where(mask, nq0, q0).astype(plane.dtype))
        _scatter(plane, r, c, n, axis, 3,
                 np.where(mask, np0, p0).astype(plane.dtype))
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    ps2, qs2 = p2 - 128, q2 - 128
    # hev path: common adjust with outer taps, p0/q0 only
    a_h = _clamp128(_clamp128(ps1 - qs1) + 3 * (qs0 - ps0))
    f1_h = _clamp128(a_h + 4) >> 3
    f2_h = _clamp128(a_h + 3) >> 3
    q0_h = np.clip(qs0 - f1_h, -128, 127)
    p0_h = np.clip(ps0 + f2_h, -128, 127)
    if mb_edge:
        # !hev path: 27/18/9 wide filter over p2..q2
        w = _clamp128(_clamp128(ps1 - qs1) + 3 * (qs0 - ps0))
        a = _clamp128((27 * w + 63) >> 7)
        q0_n = np.clip(qs0 - a, -128, 127)
        p0_n = np.clip(ps0 + a, -128, 127)
        a = _clamp128((18 * w + 63) >> 7)
        q1_n = np.clip(qs1 - a, -128, 127)
        p1_n = np.clip(ps1 + a, -128, 127)
        a = _clamp128((9 * w + 63) >> 7)
        q2_n = np.clip(qs2 - a, -128, 127)
        p2_n = np.clip(ps2 + a, -128, 127)
        out = {
            1: np.where(hev, ps2, p2_n), 2: np.where(hev, ps1, p1_n),
            3: np.where(hev, p0_h, p0_n), 4: np.where(hev, q0_h, q0_n),
            5: np.where(hev, qs1, q1_n), 6: np.where(hev, qs2, q2_n),
        }
    else:
        # subblock edge: without hev the outer taps are dropped from
        # the adjustment and p1/q1 get the averaged nudge
        a_n = _clamp128(3 * (qs0 - ps0))
        f1_n = _clamp128(a_n + 4) >> 3
        f2_n = _clamp128(a_n + 3) >> 3
        q0_n = np.clip(qs0 - f1_n, -128, 127)
        p0_n = np.clip(ps0 + f2_n, -128, 127)
        a2 = (f1_n + 1) >> 1
        q1_n = np.clip(qs1 - a2, -128, 127)
        p1_n = np.clip(ps1 + a2, -128, 127)
        out = {
            2: np.where(hev, ps1, p1_n),
            3: np.where(hev, p0_h, p0_n),
            4: np.where(hev, q0_h, q0_n),
            5: np.where(hev, qs1, q1_n),
        }
    for k, sv in out.items():
        orig = taps[k]
        vals = np.where(mask, sv + 128, orig).astype(plane.dtype)
        _scatter(plane, r, c, n, axis, k, vals)


def _loop_filter(h, Y, U, V, mb_info, mb_w, mb_h):
    """Frame deblocking in macroblock raster order (§15): left MB
    edge, inner vertical edges, top MB edge, inner horizontal edges;
    the simple filter touches luma only."""
    simple = h.filter_type == 1
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            lvl, inner = mb_info[mb_y][mb_x]
            if lvl == 0:
                continue
            ilim, hev_t = _lf_params(lvl, h.sharpness)
            mb_e = 2 * (lvl + 2) + ilim
            sb_e = 2 * lvl + ilim
            yr, yc = 1 + 16 * mb_y, 1 + 16 * mb_x
            cr, cc = 1 + 8 * mb_y, 1 + 8 * mb_x
            if mb_x > 0:
                _filter_edge(Y, yr, yc, 16, 1, mb_e, ilim, hev_t,
                             True, simple)
                if not simple:
                    _filter_edge(U, cr, cc, 8, 1, mb_e, ilim, hev_t,
                                 True, False)
                    _filter_edge(V, cr, cc, 8, 1, mb_e, ilim, hev_t,
                                 True, False)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge(Y, yr, yc + dx, 16, 1, sb_e, ilim,
                                 hev_t, False, simple)
                if not simple:
                    _filter_edge(U, cr, cc + 4, 8, 1, sb_e, ilim,
                                 hev_t, False, False)
                    _filter_edge(V, cr, cc + 4, 8, 1, sb_e, ilim,
                                 hev_t, False, False)
            if mb_y > 0:
                _filter_edge(Y, yr, yc, 16, 0, mb_e, ilim, hev_t,
                             True, simple)
                if not simple:
                    _filter_edge(U, cr, cc, 8, 0, mb_e, ilim, hev_t,
                                 True, False)
                    _filter_edge(V, cr, cc, 8, 0, mb_e, ilim, hev_t,
                                 True, False)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge(Y, yr + dy, yc, 16, 0, sb_e, ilim,
                                 hev_t, False, simple)
                if not simple:
                    _filter_edge(U, cr + 4, cc, 8, 0, sb_e, ilim,
                                 hev_t, False, False)
                    _filter_edge(V, cr + 4, cc, 8, 0, sb_e, ilim,
                                 hev_t, False, False)


# ------------------------------------------------------------- frame decode

_IMPLIED_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                  H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}


def _segment_quants(h):
    out = []
    for s in range(4):
        if h.segmentation:
            base = (h.seg_quant[s] if h.seg_abs
                    else h.y_ac_qi + h.seg_quant[s])
        else:
            base = h.y_ac_qi
        q = _clip_q(base)
        out.append((
            DC_QLOOKUP[_clip_q(q + h.y_dc_delta)],
            AC_QLOOKUP[q],
            DC_QLOOKUP[_clip_q(q + h.y2_dc_delta)] * 2,
            max(8, AC_QLOOKUP[_clip_q(q + h.y2_ac_delta)] * 155
                // 100),
            DC_QLOOKUP[_clip_q(q + h.uv_dc_delta, 117)],
            AC_QLOOKUP[_clip_q(q + h.uv_ac_delta)],
        ))
    return out


def _mb_filter_level(h, seg: int, is_bpred: bool) -> int:
    if h.segmentation:
        lvl = (h.seg_lf[seg] if h.seg_abs
               else h.filter_level + h.seg_lf[seg])
    else:
        lvl = h.filter_level
    lvl = min(63, max(0, lvl))
    if h.lf_delta_enabled:
        lvl += h.ref_lf_deltas[0]            # keyframe: intra ref
        if is_bpred:
            lvl += h.mode_lf_deltas[0]       # mode delta 0 = B_PRED
        lvl = min(63, max(0, lvl))
    return lvl


def _decode_frame(h):
    """Macroblock loop: modes (partition 0) + residuals (token
    partitions) + reconstruction, then the loop filter. Returns the
    padded Y/U/V planes."""
    mb_w = (h.width + 15) // 16
    mb_h = (h.height + 15) // 16
    quants = _segment_quants(h)
    Y = np.empty((mb_h * 16 + 1, mb_w * 16 + 5), np.uint8)
    U = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), np.uint8)
    V = np.empty_like(U)
    for pl in (Y, U, V):
        pl[0, :] = 127
        pl[1:, 0] = 129
    bd = h.bd
    above_y_nz = np.zeros((mb_w, 4), np.int64)
    above_u_nz = np.zeros((mb_w, 2), np.int64)
    above_v_nz = np.zeros((mb_w, 2), np.int64)
    above_y2_nz = np.zeros(mb_w, np.int64)
    above_bmode = np.full((mb_w, 4), B_DC_PRED, np.int64)
    mb_info = [[(0, False)] * mb_w for _ in range(mb_h)]
    coeffs = np.zeros((25, 16), np.int64)
    # recorded so VP8Decoder can persist the map across a video
    # sequence (inter frames may keep segmentation without re-coding
    # the map); pure recording — decode behavior is unchanged
    seg_map = [0] * (mb_h * mb_w)
    h.seg_map = seg_map

    for mb_y in range(mb_h):
        td = h.token_parts[mb_y % len(h.token_parts)]
        left_y_nz = [0, 0, 0, 0]
        left_u_nz = [0, 0]
        left_v_nz = [0, 0]
        left_y2 = 0
        left_bmode = [B_DC_PRED] * 4
        for mb_x in range(mb_w):
            if bd.exhausted() or td.exhausted():
                raise ValueError(
                    f"VP8: bitstream exhausted at macroblock "
                    f"({mb_x}, {mb_y}) — truncated or corrupt")
            # ---- modes (partition 0)
            seg = 0
            if h.segmentation and h.update_mb_seg_map:
                seg = bd.tree(MB_SEGMENT_TREE, h.seg_tree_probs)
            seg_map[mb_y * mb_w + mb_x] = seg
            skip = bd.decode(h.prob_skip_false) if h.mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                bmodes = [[0] * 4 for _ in range(4)]
                for sy in range(4):
                    for sx in range(4):
                        am = (above_bmode[mb_x][sx] if sy == 0
                              else bmodes[sy - 1][sx])
                        lm = (left_bmode[sy] if sx == 0
                              else bmodes[sy][sx - 1])
                        bmodes[sy][sx] = bd.tree(
                            BMODE_TREE, KF_BMODE_PROB[am][lm])
            else:
                imp = _IMPLIED_BMODE[ymode]
                bmodes = [[imp] * 4] * 4
            uvmode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            above_bmode[mb_x] = bmodes[3]
            left_bmode = [bmodes[r][3] for r in range(4)]

            # ---- residuals (row's token partition)
            ydc, yac, y2dc, y2ac, uvdc, uvac = quants[seg]
            coeffs[:] = 0
            has_coeffs = False
            has_y2 = ymode != B_PRED
            if skip:
                left_y_nz = [0, 0, 0, 0]
                left_u_nz = [0, 0]
                left_v_nz = [0, 0]
                above_y_nz[mb_x] = 0
                above_u_nz[mb_x] = 0
                above_v_nz[mb_x] = 0
                if has_y2:
                    above_y2_nz[mb_x] = 0
                    left_y2 = 0
            else:
                if has_y2:
                    ctx = int(above_y2_nz[mb_x]) + left_y2
                    eob = _get_coeffs(td, h.coeff_probs[1], ctx,
                                      y2dc, y2ac, 0, coeffs[24])
                    nz = int(eob > 0)
                    above_y2_nz[mb_x] = nz
                    left_y2 = nz
                    has_coeffs = has_coeffs or nz
                    ytype, first = 0, 1
                else:
                    ytype, first = 3, 0
                for sy in range(4):
                    lnz = left_y_nz[sy]
                    for sx in range(4):
                        ctx = lnz + int(above_y_nz[mb_x][sx])
                        eob = _get_coeffs(td, h.coeff_probs[ytype],
                                          ctx, ydc, yac, first,
                                          coeffs[4 * sy + sx])
                        lnz = int(eob > first)
                        above_y_nz[mb_x][sx] = lnz
                        has_coeffs = has_coeffs or lnz
                    left_y_nz[sy] = lnz
                for anz, lnzs, ci0 in ((above_u_nz, left_u_nz, 16),
                                       (above_v_nz, left_v_nz, 20)):
                    for sy in range(2):
                        lnz = lnzs[sy]
                        for sx in range(2):
                            ctx = lnz + int(anz[mb_x][sx])
                            eob = _get_coeffs(
                                td, h.coeff_probs[2], ctx, uvdc,
                                uvac, 0, coeffs[ci0 + 2 * sy + sx])
                            lnz = int(eob > 0)
                            anz[mb_x][sx] = lnz
                            has_coeffs = has_coeffs or lnz
                        lnzs[sy] = lnz

            mb_info[mb_y][mb_x] = (
                _mb_filter_level(h, seg, not has_y2),
                (not has_y2) or has_coeffs)

            # ---- reconstruction
            if has_y2:
                dcs = _iwht4x4(coeffs[24])
                for b in range(16):
                    coeffs[b][0] = dcs[b]
            r0, c0 = 1 + 16 * mb_y, 1 + 16 * mb_x
            if ymode == B_PRED:
                if mb_y > 0 and mb_x == mb_w - 1:
                    # above-right beyond the frame: replicate the
                    # rightmost above pixel (the libwebp convention)
                    Y[r0 - 1, c0 + 16:c0 + 20] = Y[r0 - 1, c0 + 15]
                # right-column subblocks below the MB's top row use
                # the MACROBLOCK's above-right pixels (the pixels to
                # their right are not yet reconstructed): stage them
                # where those predictions read their above-right —
                # the next MB (or nothing) overwrites these cells
                tr4 = Y[r0 - 1, c0 + 16:c0 + 20].copy()
                for dy in (3, 7, 11):
                    Y[r0 + dy, c0 + 16:c0 + 20] = tr4
                for sy in range(4):
                    for sx in range(4):
                        pr = _pred_b(Y, r0 + 4 * sy, c0 + 4 * sx,
                                     bmodes[sy][sx])
                        blk = coeffs[4 * sy + sx]
                        if blk.any():
                            pr = pr + _idct4x4(blk)
                        Y[r0 + 4 * sy:r0 + 4 * sy + 4,
                          c0 + 4 * sx:c0 + 4 * sx + 4] = \
                            np.clip(pr, 0, 255)
            else:
                pr = _pred16(Y, r0, c0, 16, ymode, mb_y > 0,
                             mb_x > 0)
                for sy in range(4):
                    for sx in range(4):
                        blk = coeffs[4 * sy + sx]
                        if blk.any():
                            pr[4 * sy:4 * sy + 4, 4 * sx:4 * sx + 4] \
                                += _idct4x4(blk)
                Y[r0:r0 + 16, c0:c0 + 16] = np.clip(pr, 0, 255)
            r0, c0 = 1 + 8 * mb_y, 1 + 8 * mb_x
            for pl, ci0 in ((U, 16), (V, 20)):
                pr = _pred16(pl, r0, c0, 8, uvmode, mb_y > 0,
                             mb_x > 0)
                for sy in range(2):
                    for sx in range(2):
                        blk = coeffs[ci0 + 2 * sy + sx]
                        if blk.any():
                            pr[4 * sy:4 * sy + 4, 4 * sx:4 * sx + 4] \
                                += _idct4x4(blk)
                pl[r0:r0 + 8, c0:c0 + 8] = np.clip(pr, 0, 255)

    # the version field overrides the loop-filter choice (RFC 6386
    # §9.1): 0 → as coded in filter_type, 1 → simple, 2/3 → none
    # (libwebp only ever emits version 0)
    if h.version < 2 and (h.filter_level > 0 or h.segmentation
                          or h.lf_delta_enabled):
        if h.version == 1:
            h = _SimpleFilterView(h)
        _loop_filter(h, Y, U, V, mb_info, mb_w, mb_h)
    return Y, U, V


class _SimpleFilterView:
    """Header proxy forcing the simple loop filter (version 1)."""

    def __init__(self, h):
        self._h = h
        self.filter_type = 1

    def __getattr__(self, name):
        return getattr(self._h, name)


# ----------------------------------------------------------- YUV -> RGB

# libwebp fixed-point BT.601 full-range constants (dsp/yuv.h)
_YS, _VR, _UG, _VG, _UB = 19077, 26149, 6419, 13320, 33050
_RC, _GC, _BC = 14234, -8708, 17685


def _yuv_to_rgb(y, u, v):
    """Per-pixel fixed-point conversion; y/u/v int64 arrays of one
    shape → (…, 3) uint8."""
    yy = (y * _YS) >> 8
    r = yy + ((v * _VR) >> 8) - _RC
    g = yy - ((u * _UG) >> 8) - ((v * _VG) >> 8) - _GC
    b = yy + ((u * _UB) >> 8) - _BC
    out = np.stack([r, g, b], axis=-1) >> 6
    return np.clip(out, 0, 255).astype(np.uint8)


def _upsample_row(cu_t, cv_t, cu_b, cv_b, w):
    """libwebp fancy upsampler, one output-row pair worth of chroma:
    returns (u_top, v_top, u_bot, v_bot) length-w int64 arrays from
    the two bracketing chroma rows (may be the same row)."""
    outs = []
    for top, cur in ((cu_t, cu_b), (cv_t, cv_b)):
        top = top.astype(np.int64)
        cur = cur.astype(np.int64)
        t_uv, l_uv = top[:-1], cur[:-1]          # tl, l of each pair
        nt, nc = top[1:], cur[1:]                # t, cur
        avg = t_uv + nt + l_uv + nc + 8
        diag_12 = (avg + 2 * (nt + l_uv)) >> 3
        diag_03 = (avg + 2 * (t_uv + nc)) >> 3
        ut = np.empty(w, np.int64)
        ub = np.empty(w, np.int64)
        ut[0] = (3 * top[0] + cur[0] + 2) >> 2
        ub[0] = (3 * cur[0] + top[0] + 2) >> 2
        # the pair loop covers output x in [1, 2*lpp]; an even-width
        # row's last pixel is the replicated special case below
        lpp = (w - 1) >> 1
        odd = np.arange(1, 2 * lpp, 2)
        ut[odd] = ((diag_12 + t_uv) >> 1)[:len(odd)]
        ub[odd] = ((diag_03 + l_uv) >> 1)[:len(odd)]
        even = np.arange(2, 2 * lpp + 1, 2)
        ut[even] = ((diag_03 + nt) >> 1)[:len(even)]
        ub[even] = ((diag_12 + nc) >> 1)[:len(even)]
        if w % 2 == 0:
            ut[w - 1] = (3 * top[-1] + cur[-1] + 2) >> 2
            ub[w - 1] = (3 * cur[-1] + top[-1] + 2) >> 2
        outs.append((ut, ub))
    return outs[0][0], outs[1][0], outs[0][1], outs[1][1]


def _yuv420_to_rgb_fancy(Y, U, V, w, h):
    """The libwebp "fancy" bilinear chroma upsampling + fixed-point
    RGB conversion: chroma samples sit at half-pel centers, so each
    output pixel blends the 4 nearest chroma samples 9:3:3:1 (with
    libwebp's exact two-step rounding); the frame borders replicate."""
    out = np.empty((h, w, 3), np.uint8)
    yv = Y.astype(np.int64)
    # row 0: top==cur==chroma row 0
    ut, vt, _, _ = _upsample_row(U[0], V[0], U[0], V[0], w)
    out[0] = _yuv_to_rgb(yv[0], ut, vt)
    ch = (h + 1) // 2
    for c in range(1, ch):
        ut, vt, ub, vb = _upsample_row(U[c - 1], V[c - 1], U[c],
                                       V[c], w)
        out[2 * c - 1] = _yuv_to_rgb(yv[2 * c - 1], ut, vt)
        if 2 * c < h:
            out[2 * c] = _yuv_to_rgb(yv[2 * c], ub, vb)
    if h % 2 == 0 and h > 1:
        # trailing even row: single-line call with top==cur==last
        ut, vt, _, _ = _upsample_row(U[ch - 1], V[ch - 1], U[ch - 1],
                                     V[ch - 1], w)
        out[h - 1] = _yuv_to_rgb(yv[h - 1], ut, vt)
    return out


def decode_vp8(payload: bytes) -> np.ndarray:
    """Decode one VP8 keyframe (a ``VP8 `` chunk body) to (h, w, 3)
    uint8 RGB — see the module docstring for scope and provenance."""
    h = parse_vp8_frame_header(bytes(payload))
    Y, U, V = _decode_frame(h)
    cw, chh = (h.width + 1) // 2, (h.height + 1) // 2
    return _yuv420_to_rgb_fancy(
        Y[1:1 + h.height, 1:1 + h.width],
        U[1:1 + chh, 1:1 + cw], V[1:1 + chh, 1:1 + cw],
        h.width, h.height)


# ======================================================================
# Inter-frame (P-frame) decoding — r14, VERDICT r13 item 4.
#
# RFC 6386 §16-§18: reference buffers (last / golden / altref with
# refresh+copy semantics and per-reference sign bias), contextual
# near-MV survey, the mv-ref and sub-mv trees, two-context MV
# component coding, and sixtap/bilinear sub-pixel motion
# compensation. A WebP STILL is always a keyframe (libwebp's decoder
# refuses non-keyframes outright), so the consumer surface for this
# machinery is raw VP8 video streams — the IVF container
# (multimodal.parse_ivf) and :class:`VP8Decoder` below. There is no
# reference VP8 *video* codec in this container (no libvpx/ffmpeg;
# libwebp is keyframe-only — pinned by a test), so the verification
# strategy is: (a) a from-spec test-side encoder (bool encoder +
# header/mode/MV writers from the same RFC tables) round-trips
# through this decoder, (b) motion compensation is pinned against an
# independent numpy sixtap/bilinear oracle in the tests, and (c)
# structural identities (zero-MV all-skip inter frame == reference
# frame, byte-exact) hold by construction.

# non-keyframe intra mode trees/probs (§11.2; keyframes use the
# KF_* tables above)
YMODE_TREE = [_t(DC_PRED), 2, 4, 6, _t(V_PRED), _t(H_PRED),
              _t(TM_PRED), _t(B_PRED)]
YMODE_PROB_DEFAULT = [112, 86, 140, 37]
UV_MODE_PROB_DEFAULT = [162, 101, 204]
# inter-frame 4x4 submodes use ONE fixed table (no neighbor context)
BMODE_PROB_INTER = [120, 90, 79, 133, 87, 85, 80, 111, 151]

# inter prediction modes (continuing the intra numbering)
NEARESTMV, NEARMV, ZEROMV, NEWMV, SPLITMV = 5, 6, 7, 8, 9

MV_REF_TREE = [_t(ZEROMV), 2, _t(NEARESTMV), 4, _t(NEARMV), 6,
               _t(NEWMV), _t(SPLITMV)]
# mv-ref probabilities by near-MV survey count (vp8_mode_contexts;
# stored as vp8_prob = uint8, so the >255 entries truncate mod 256
# exactly as the C assignment does)
MODE_CONTEXTS = [
    [7, 1, 1, 143],
    [14, 18, 14, 107],
    [135, 64, 57, 68],
    [60, 56, 128, 65],
    [234, 160, 1, 1],
    [257 & 255, 336 & 255, 1, 2],
]

# SPLITMV partitionings (§16.2)
MBSPLIT_TREE = [_t(3), 2, _t(2), 4, _t(0), _t(1)]
MBSPLIT_PROBS = [110, 111, 150]
MBSPLITS = [
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1],   # 16x8
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1],   # 8x16
    [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3],   # 8x8
    list(range(16)),                                      # 4x4
]
MBSPLIT_COUNT = [2, 2, 4, 16]

LEFT4X4, ABOVE4X4, ZERO4X4, NEW4X4 = 0, 1, 2, 3
SUB_MV_REF_TREE = [_t(LEFT4X4), 2, _t(ABOVE4X4), 4, _t(ZERO4X4),
                   _t(NEW4X4)]
SUB_MV_REF_PROBS = [          # by (left, above) subvector context
    [147, 136, 18],           # normal
    [106, 145, 1],            # left == 0
    [179, 121, 1],            # above == 0
    [223, 1, 34],             # left == above (nonzero)
    [208, 1, 1],              # left == above == 0
]

# MV component coding (§17.2): 19 probs per component —
# [is_short, sign, short_tree x7, long_bits x10]
MV_PIS_SHORT, MV_SIGN, MV_SHORT, MV_BITS = 0, 1, 2, 9
SMALL_MV_TREE = [2, 8, 4, 6, _t(0), _t(1), _t(2), _t(3),
                 10, 12, _t(4), _t(5), _t(6), _t(7)]
DEFAULT_MV_PROBS = [
    [162, 128, 225, 146, 172, 147, 214, 39, 156,
     128, 129, 132, 75, 145, 178, 206, 239, 254, 254],   # row
    [164, 128, 204, 170, 119, 235, 140, 230, 228,
     128, 130, 130, 74, 148, 180, 203, 236, 254, 254],   # col
]
MV_UPDATE_PROBS = [
    [237, 246, 253, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 250, 250, 252, 254, 254],
    [231, 243, 245, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 251, 251, 254, 254, 254],
]

# sub-pixel interpolation (§18.3) — 8 eighth-pel phases
SIXTAP_FILTERS = [
    [0, 0, 128, 0, 0, 0],
    [0, -6, 123, 12, -1, 0],
    [2, -11, 108, 36, -8, 1],
    [0, -9, 93, 50, -6, 0],
    [3, -16, 77, 77, -16, 3],
    [0, -6, 50, 93, -9, 0],
    [1, -8, 36, 108, -11, 2],
    [0, -1, 12, 123, -6, 0],
]
BILINEAR_FILTERS = [
    [128, 0], [112, 16], [96, 32], [80, 48],
    [64, 64], [48, 80], [32, 96], [16, 112],
]

_REF_BORDER = 32                  # reference-plane edge extension


def read_mv_component(bd: BoolDecoder, probs) -> int:
    """One quarter-pel MV component (§17.2): short tree or
    10-bit long form with the bit-3 omission rule."""
    if bd.decode(probs[MV_PIS_SHORT]):
        x = 0
        for i in range(3):
            x += bd.decode(probs[MV_BITS + i]) << i
        for i in range(9, 3, -1):
            x += bd.decode(probs[MV_BITS + i]) << i
        if not (x & 0xFFF0) or bd.decode(probs[MV_BITS + 3]):
            x += 8
    else:
        x = bd.tree(SMALL_MV_TREE, probs[MV_SHORT:])
    if x and bd.decode(probs[MV_SIGN]):
        x = -x
    return x


def read_mv(bd: BoolDecoder, mv_probs) -> tuple[int, int]:
    """(row, col) in EIGHTH-pel units (coded quarter-pel × 2, the
    storage convention motion compensation consumes)."""
    r = read_mv_component(bd, mv_probs[0]) * 2
    c = read_mv_component(bd, mv_probs[1]) * 2
    return r, c


class _MbState:
    """Per-macroblock neighbor context for inter decoding."""

    __slots__ = ("ref", "mode", "mv", "submvs")

    def __init__(self, ref=0, mode=DC_PRED, mv=(0, 0), submvs=None):
        self.ref = ref            # 0 intra, 1 last, 2 golden, 3 arf
        self.mode = mode
        self.mv = mv              # (row, col) eighth-pel
        self.submvs = submvs      # 16 (row, col) when SPLITMV


def _mv_bias(neigh_bias: int, ref_bias: int,
             mv: tuple[int, int]) -> tuple[int, int]:
    if neigh_bias != ref_bias:
        return (-mv[0], -mv[1])
    return mv


def _clamp_val(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


def find_near_mvs(above: _MbState, left: _MbState,
                  aboveleft: _MbState, ref: int, sign_bias,
                  mb_x: int, mb_y: int, mb_w: int, mb_h: int):
    """RFC 6386 §16.3 near-MV survey: returns (best, nearest, near,
    cnt[4]) with best/nearest/near clamped to the 16-px border
    margin. Weights 2/2/1 for above/left/above-left; a neighbor's MV
    is sign-flipped when its reference's sign bias differs from the
    target reference's."""
    mvs = [(0, 0), (0, 0), (0, 0), (0, 0)]
    cnt = [0, 0, 0, 0]
    idx = 0                       # index of the current top entry

    if above.ref != 0:
        if above.mv != (0, 0):
            idx += 1
            mvs[idx] = _mv_bias(sign_bias[above.ref], sign_bias[ref],
                                above.mv)
        cnt[idx] += 2
    if left.ref != 0:
        if left.mv != (0, 0):
            this = _mv_bias(sign_bias[left.ref], sign_bias[ref],
                            left.mv)
            if this != mvs[idx]:
                idx += 1
                mvs[idx] = this
            cnt[idx] += 2
        else:
            cnt[0] += 2
    if aboveleft.ref != 0:
        if aboveleft.mv != (0, 0):
            this = _mv_bias(sign_bias[aboveleft.ref], sign_bias[ref],
                            aboveleft.mv)
            if this != mvs[idx]:
                idx += 1
                mvs[idx] = this
            cnt[idx] += 1
        else:
            cnt[0] += 1

    # a third distinct MV that matches the nearest strengthens it
    if cnt[3] and mvs[idx] == mvs[1]:
        cnt[1] += 1
    cnt[3] = (((above.mode == SPLITMV) + (left.mode == SPLITMV)) * 2
              + (aboveleft.mode == SPLITMV))
    if cnt[2] > cnt[1]:
        cnt[1], cnt[2] = cnt[2], cnt[1]
        mvs[1], mvs[2] = mvs[2], mvs[1]
    if cnt[1] >= cnt[0]:
        mvs[0] = mvs[1]

    to_left = -(mb_x << 7)        # mb edges in eighth-pel
    to_right = (mb_w - 1 - mb_x) << 7
    to_top = -(mb_y << 7)
    to_bottom = (mb_h - 1 - mb_y) << 7
    margin = 16 << 3

    def clamp2(mv):
        return (_clamp_val(mv[0], to_top - margin, to_bottom + margin),
                _clamp_val(mv[1], to_left - margin,
                           to_right + margin))

    return (clamp2(mvs[0]), clamp2(mvs[1]), clamp2(mvs[2]), cnt,
            (to_left, to_right, to_top, to_bottom))


def _clamp_mv_border(mv, edges):
    """clamp_mv_to_umv_border: 19-px detect threshold, clamp to
    16 px (the prediction-time clamp; stored MVs stay raw)."""
    to_left, to_right, to_top, to_bottom = edges
    r, c = mv
    if c < to_left - (19 << 3):
        c = to_left - (16 << 3)
    elif c > to_right + (18 << 3):
        c = to_right + (16 << 3)
    if r < to_top - (19 << 3):
        r = to_top - (16 << 3)
    elif r > to_bottom + (18 << 3):
        r = to_bottom + (16 << 3)
    return r, c


def _needs_clamp(mv, edges) -> bool:
    to_left, to_right, to_top, to_bottom = edges
    margin = 16 << 3
    r, c = mv
    return (c < to_left - margin or c > to_right + margin
            or r < to_top - margin or r > to_bottom + margin)


def _predict_block(ref: np.ndarray, r: int, c: int, h: int, w: int,
                   mv: tuple[int, int], filters) -> np.ndarray:
    """Motion-compensated block from a border-extended reference
    plane (origin at ``_REF_BORDER``): full-pel base + the
    horizontal-then-vertical filter passes, ``(x + 64) >> 7``
    rounding, clamped to uint8."""
    mr, mc = mv
    r0 = r + (mr >> 3) + _REF_BORDER
    c0 = c + (mc >> 3) + _REF_BORDER
    yoff = mr & 7
    xoff = mc & 7
    if not xoff and not yoff:
        return ref[r0:r0 + h, c0:c0 + w].astype(np.int64)
    six = filters is SIXTAP_FILTERS
    ta, tb = (2, 3) if six else (0, 1)    # taps around the sample
    # bounded working window (full plane rows would copy the whole
    # row width per 4x4 subblock)
    src = ref[r0 - ta:r0 + h + tb,
              c0 - ta:c0 + w + tb].astype(np.int64)
    taps = 6 if six else 2
    if xoff:
        fx = filters[xoff]
        acc = np.zeros((src.shape[0], w), np.int64)
        for k in range(taps):
            acc += fx[k] * src[:, k:k + w]
        src = np.clip((acc + 64) >> 7, 0, 255)
        if not yoff:
            return src[ta:ta + h]
    else:
        src = src[:, ta:ta + w]
    fy = filters[yoff]
    acc = np.zeros((h, w), np.int64)
    for k in range(taps):
        acc += fy[k] * src[k:k + h]
    return np.clip((acc + 64) >> 7, 0, 255)


def _extend_plane(plane: np.ndarray) -> np.ndarray:
    """Edge-replicated border extension (the reference-buffer
    convention: MVs may reach 16 px past the frame plus filter
    taps)."""
    return np.pad(plane, _REF_BORDER, mode="edge")


def _parse_inter_header(payload: bytes, dec: "VP8Decoder") -> _Header:
    """Non-keyframe header (RFC 6386 §9): same segmentation / filter /
    partition / quantizer layout as the keyframe (no start code or
    dimensions — those persist from the sequence's keyframe), then
    the reference-buffer controls, coefficient-probability updates
    against the decoder's PERSISTENT entropy state, the
    intra/last/golden branch probabilities, optional intra-mode prob
    updates, and the two-context MV probability updates."""
    tag = int.from_bytes(payload[0:3], "little")
    part0_size = tag >> 5
    if part0_size == 0 or 3 + part0_size > len(payload):
        raise ValueError("VP8: inter frame first partition overruns "
                         "the payload")
    bd = BoolDecoder(payload[3:3 + part0_size])
    h = _Header()
    h.version = (tag >> 1) & 7
    if h.version > 3:
        raise ValueError(f"VP8: reserved version {h.version}")
    h.show = (tag >> 4) & 1
    h.width, h.height = dec.width, dec.height
    h.keyframe = False

    # --- segmentation (§9.3) — identical layout to the keyframe;
    # the segment feature STATE persists across frames (only coded
    # deltas update it), but this engine re-reads what is coded and
    # keeps the previous values when absent
    h.segmentation = bd.decode(128)
    h.update_mb_seg_map = 0
    h.seg_abs = dec.seg_abs
    h.seg_quant = list(dec.seg_quant)
    h.seg_lf = list(dec.seg_lf)
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_mb_seg_map = bd.decode(128)
        if bd.decode(128):                   # update_segment_feature_data
            h.seg_abs = bd.decode(128)
            h.seg_quant = [0, 0, 0, 0]
            h.seg_lf = [0, 0, 0, 0]
            for i in range(4):
                if bd.decode(128):
                    h.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.decode(128):
                    h.seg_lf[i] = bd.signed_literal(6)
        if h.update_mb_seg_map:
            for i in range(3):
                h.seg_tree_probs[i] = (bd.literal(8) if bd.decode(128)
                                       else 255)

    # --- loop filter (§9.4)
    h.filter_type = bd.decode(128)
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.decode(128)
    h.ref_lf_deltas = list(dec.ref_lf_deltas)
    h.mode_lf_deltas = list(dec.mode_lf_deltas)
    if h.lf_delta_enabled:
        if bd.decode(128):
            for i in range(4):
                if bd.decode(128):
                    h.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.decode(128):
                    h.mode_lf_deltas[i] = bd.signed_literal(6)

    # --- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    part_base = 3 + part0_size
    table = payload[part_base:part_base + 3 * (n_parts - 1)]
    if len(table) < 3 * (n_parts - 1):
        raise ValueError("VP8: truncated token-partition size table")
    data_base = part_base + 3 * (n_parts - 1)
    pos = data_base
    sizes = []
    for i in range(n_parts - 1):
        sz = int.from_bytes(table[3 * i:3 * i + 3], "little")
        if pos + sz > len(payload):
            raise ValueError(f"VP8: token partition {i} overruns "
                             f"the payload")
        sizes.append((pos, sz))
        pos += sz
    sizes.append((pos, len(payload) - pos))
    if sizes[-1][1] < 0:
        raise ValueError("VP8: token partitions overrun the payload")
    h.token_parts = [BoolDecoder(payload[p:p + s]) for p, s in sizes]

    # --- quantizers (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.y2_dc_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.y2_ac_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.uv_dc_delta = bd.signed_literal(4) if bd.decode(128) else 0
    h.uv_ac_delta = bd.signed_literal(4) if bd.decode(128) else 0

    # --- reference buffer controls (§9.7)
    h.refresh_golden = bd.decode(128)
    h.refresh_alt = bd.decode(128)
    h.copy_to_golden = 0 if h.refresh_golden else bd.literal(2)
    h.copy_to_alt = 0 if h.refresh_alt else bd.literal(2)
    h.sign_bias_golden = bd.decode(128)
    h.sign_bias_alt = bd.decode(128)
    h.refresh_entropy = bd.decode(128)
    h.refresh_last = bd.decode(128)

    # --- coefficient probability updates (§13.4) against the
    # persistent state
    probs = [[[list(dec.coeff_probs[t][b][c]) for c in range(3)]
              for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for i in range(11):
                    if bd.decode(upd[i]):
                        row[i] = bd.literal(8)
    h.coeff_probs = probs

    # --- skip flag (§9.10)
    h.mb_no_skip = bd.decode(128)
    h.prob_skip_false = bd.literal(8) if h.mb_no_skip else 0

    # --- inter-specific mode probabilities (§9.11)
    h.prob_intra = bd.literal(8)
    h.prob_last = bd.literal(8)
    h.prob_gf = bd.literal(8)
    ymode = list(dec.ymode_probs)
    if bd.decode(128):
        ymode = [bd.literal(8) for _ in range(4)]
    h.ymode_probs = ymode
    uvmode = list(dec.uvmode_probs)
    if bd.decode(128):
        uvmode = [bd.literal(8) for _ in range(3)]
    h.uvmode_probs = uvmode
    mv_probs = [list(dec.mv_probs[0]), list(dec.mv_probs[1])]
    for ctx in range(2):
        for i in range(19):
            if bd.decode(MV_UPDATE_PROBS[ctx][i]):
                v = bd.literal(7)
                mv_probs[ctx][i] = (v << 1) if v else 1
    h.mv_probs = mv_probs

    if bd.exhausted():
        raise ValueError("VP8: first partition exhausted mid-header")
    h.bd = bd
    return h


def _mb_filter_level_inter(h, seg: int, ref: int, mode: int) -> int:
    """Loop-filter level with reference and mode deltas (the libvpx
    mode_lf_lut: B_PRED→0, ZEROMV→1, other inter→2, SPLITMV→3;
    non-B_PRED intra takes no mode delta)."""
    if h.segmentation:
        lvl = (h.seg_lf[seg] if h.seg_abs
               else h.filter_level + h.seg_lf[seg])
    else:
        lvl = h.filter_level
    lvl = min(63, max(0, lvl))
    if h.lf_delta_enabled:
        lvl += h.ref_lf_deltas[ref]
        if ref == 0:
            if mode == B_PRED:
                lvl += h.mode_lf_deltas[0]
        elif mode == ZEROMV:
            lvl += h.mode_lf_deltas[1]
        elif mode == SPLITMV:
            lvl += h.mode_lf_deltas[3]
        else:
            lvl += h.mode_lf_deltas[2]
        lvl = min(63, max(0, lvl))
    return lvl


def _decode_inter_frame(h, dec: "VP8Decoder"):
    """Inter-frame macroblock loop (§16-§18): per-MB intra/inter
    branch, near-MV survey + mv-ref tree, motion compensation from
    the selected reference buffer, shared residual machinery, then
    the loop filter. Returns padded Y/U/V planes (the keyframe
    loop's output contract)."""
    mb_w = (h.width + 15) // 16
    mb_h = (h.height + 15) // 16
    quants = _segment_quants(h)
    filters = (SIXTAP_FILTERS if h.version == 0
               else BILINEAR_FILTERS)
    fullpel_mask = ~7 if h.version == 3 else ~0
    sign_bias = [0, 0, h.sign_bias_golden, h.sign_bias_alt]

    Y = np.empty((mb_h * 16 + 1, mb_w * 16 + 5), np.uint8)
    U = np.empty((mb_h * 8 + 1, mb_w * 8 + 1), np.uint8)
    V = np.empty_like(U)
    for pl in (Y, U, V):
        pl[0, :] = 127
        pl[1:, 0] = 129

    bd = h.bd
    above_y_nz = np.zeros((mb_w, 4), np.int64)
    above_u_nz = np.zeros((mb_w, 2), np.int64)
    above_v_nz = np.zeros((mb_w, 2), np.int64)
    above_y2_nz = np.zeros(mb_w, np.int64)
    mb_info = [[(0, False)] * mb_w for _ in range(mb_h)]
    coeffs = np.zeros((25, 16), np.int64)

    intra_st = _MbState()                 # out-of-frame neighbors
    above_st = [_MbState() for _ in range(mb_w)]
    seg_map = dec.seg_map
    if seg_map is None or len(seg_map) != mb_h * mb_w:
        seg_map = [0] * (mb_h * mb_w)

    for mb_y in range(mb_h):
        td = h.token_parts[mb_y % len(h.token_parts)]
        left_st = _MbState()
        al_st = _MbState()                # above-left neighbor state
        left_y_nz = [0, 0, 0, 0]
        left_u_nz = [0, 0]
        left_v_nz = [0, 0]
        left_y2 = 0
        for mb_x in range(mb_w):
            if bd.exhausted() or td.exhausted():
                raise ValueError(
                    f"VP8: bitstream exhausted at macroblock "
                    f"({mb_x}, {mb_y}) — truncated or corrupt")
            seg = seg_map[mb_y * mb_w + mb_x]
            if h.segmentation and h.update_mb_seg_map:
                seg = bd.tree(MB_SEGMENT_TREE, h.seg_tree_probs)
                seg_map[mb_y * mb_w + mb_x] = seg
            skip = bd.decode(h.prob_skip_false) if h.mb_no_skip else 0

            st = _MbState()
            submv_pred = None             # per-subblock (mv, bmode)
            if bd.decode(h.prob_intra):   # ---- inter MB
                if bd.decode(h.prob_last):
                    ref = 3 if bd.decode(h.prob_gf) else 2
                else:
                    ref = 1
                if dec.refs[ref] is None:
                    raise ValueError(
                        f"VP8: frame references buffer {ref} before "
                        f"any keyframe established it")
                above_n = above_st[mb_x] if mb_y > 0 else intra_st
                al_n = (al_st if (mb_y > 0 and mb_x > 0)
                        else intra_st)
                left_n = left_st if mb_x > 0 else intra_st
                best, nearest, near, cnt, edges = find_near_mvs(
                    above_n, left_n, al_n, ref, sign_bias,
                    mb_x, mb_y, mb_w, mb_h)
                probs = [MODE_CONTEXTS[min(cnt[0], 5)][0],
                         MODE_CONTEXTS[min(cnt[1], 5)][1],
                         MODE_CONTEXTS[min(cnt[2], 5)][2],
                         MODE_CONTEXTS[min(cnt[3], 5)][3]]
                # tree leaves carry the mode numbers directly
                mode = bd.tree(MV_REF_TREE, probs)
                st.ref = ref
                st.mode = mode
                if mode == ZEROMV:
                    st.mv = (0, 0)
                elif mode == NEARESTMV:
                    st.mv = nearest
                elif mode == NEARMV:
                    st.mv = near
                elif mode == NEWMV:
                    dr, dc = read_mv(bd, h.mv_probs)
                    st.mv = (dr + best[0], dc + best[1])
                else:                     # SPLITMV
                    st.mode = SPLITMV
                    part = bd.tree(MBSPLIT_TREE, MBSPLIT_PROBS)
                    fill = MBSPLITS[part]
                    part_mvs = [None] * MBSPLIT_COUNT[part]
                    submvs = [None] * 16
                    for p in range(MBSPLIT_COUNT[part]):
                        b = fill.index(p)     # first subblock of part
                        # left/above subvector context
                        if b & 3:
                            lmv = submvs[b - 1]
                        elif mb_x > 0:
                            ln = left_st
                            lmv = (ln.submvs[b + 3]
                                   if ln.submvs is not None
                                   else ln.mv)
                        else:
                            lmv = (0, 0)
                        if b >= 4:
                            amv = submvs[b - 4]
                        elif mb_y > 0:
                            an = above_st[mb_x]
                            amv = (an.submvs[b + 12]
                                   if an.submvs is not None
                                   else an.mv)
                        else:
                            amv = (0, 0)
                        lez = lmv == (0, 0)
                        aez = amv == (0, 0)
                        if lmv == amv:
                            ctx = 4 if lez else 3
                        elif lez:
                            ctx = 1
                        elif aez:
                            ctx = 2
                        else:
                            ctx = 0
                        sub = bd.tree(SUB_MV_REF_TREE,
                                      SUB_MV_REF_PROBS[ctx])
                        if sub == NEW4X4:
                            dr, dc = read_mv(bd, h.mv_probs)
                            mv = (dr + best[0], dc + best[1])
                        elif sub == LEFT4X4:
                            mv = lmv
                        elif sub == ABOVE4X4:
                            mv = amv
                        else:
                            mv = (0, 0)
                        part_mvs[p] = mv
                        for bb in range(16):
                            if fill[bb] == p:
                                submvs[bb] = mv
                    st.submvs = submvs
                    st.mv = submvs[15]    # the neighbor-context MV
                ymode = None
            else:                         # ---- intra MB
                st.ref = 0
                ymode = bd.tree(YMODE_TREE, h.ymode_probs)
                st.mode = ymode
                if ymode == B_PRED:
                    bmodes = [[bd.tree(BMODE_TREE, BMODE_PROB_INTER)
                               for _ in range(4)] for _ in range(4)]
                else:
                    imp = _IMPLIED_BMODE[ymode]
                    bmodes = [[imp] * 4] * 4
                uvmode = bd.tree(UV_MODE_TREE, h.uvmode_probs)

            # ---- residuals (shared token machinery)
            ydc, yac, y2dc, y2ac, uvdc, uvac = quants[seg]
            coeffs[:] = 0
            has_coeffs = False
            has_y2 = st.mode not in (B_PRED, SPLITMV) \
                if st.ref else (ymode != B_PRED)
            if skip:
                left_y_nz = [0, 0, 0, 0]
                left_u_nz = [0, 0]
                left_v_nz = [0, 0]
                above_y_nz[mb_x] = 0
                above_u_nz[mb_x] = 0
                above_v_nz[mb_x] = 0
                if has_y2:
                    above_y2_nz[mb_x] = 0
                    left_y2 = 0
            else:
                if has_y2:
                    ctx = int(above_y2_nz[mb_x]) + left_y2
                    eob = _get_coeffs(td, h.coeff_probs[1], ctx,
                                      y2dc, y2ac, 0, coeffs[24])
                    nz = int(eob > 0)
                    above_y2_nz[mb_x] = nz
                    left_y2 = nz
                    has_coeffs = has_coeffs or nz
                    ytype, first = 0, 1
                else:
                    ytype, first = 3, 0
                for sy in range(4):
                    lnz = left_y_nz[sy]
                    for sx in range(4):
                        ctx = lnz + int(above_y_nz[mb_x][sx])
                        eob = _get_coeffs(td, h.coeff_probs[ytype],
                                          ctx, ydc, yac, first,
                                          coeffs[4 * sy + sx])
                        lnz = int(eob > first)
                        above_y_nz[mb_x][sx] = lnz
                        has_coeffs = has_coeffs or lnz
                    left_y_nz[sy] = lnz
                for anz, lnzs, ci0 in ((above_u_nz, left_u_nz, 16),
                                       (above_v_nz, left_v_nz, 20)):
                    for sy in range(2):
                        lnz = lnzs[sy]
                        for sx in range(2):
                            ctx = lnz + int(anz[mb_x][sx])
                            eob = _get_coeffs(
                                td, h.coeff_probs[2], ctx, uvdc,
                                uvac, 0, coeffs[ci0 + 2 * sy + sx])
                            lnz = int(eob > 0)
                            anz[mb_x][sx] = lnz
                            has_coeffs = has_coeffs or lnz
                        lnzs[sy] = lnz

            mb_info[mb_y][mb_x] = (
                _mb_filter_level_inter(h, seg, st.ref, st.mode),
                st.mode in (B_PRED, SPLITMV) or has_coeffs)

            # ---- reconstruction
            if has_y2:
                dcs = _iwht4x4(coeffs[24])
                for b in range(16):
                    coeffs[b][0] = dcs[b]
            r0, c0 = 1 + 16 * mb_y, 1 + 16 * mb_x
            if st.ref:                    # inter reconstruction
                ry, ru, rv = dec.refs[st.ref]
                yr, yc = 16 * mb_y, 16 * mb_x
                edges = (-(mb_x << 7), (mb_w - 1 - mb_x) << 7,
                         -(mb_y << 7), (mb_h - 1 - mb_y) << 7)
                if st.mode == SPLITMV:
                    need = any(_needs_clamp(m, edges)
                               for m in st.submvs)
                    pred = np.empty((16, 16), np.int64)
                    for b in range(16):
                        mv = st.submvs[b]
                        if need:
                            mv = _clamp_mv_border(mv, edges)
                        sy, sx = divmod(b, 4)
                        pred[4 * sy:4 * sy + 4, 4 * sx:4 * sx + 4] \
                            = _predict_block(
                                ry, yr + 4 * sy, yc + 4 * sx, 4, 4,
                                mv, filters)
                    # chroma: per-4x4 average of the 2x2 luma group
                    upred = np.empty((8, 8), np.int64)
                    vpred = np.empty((8, 8), np.int64)
                    for i in range(2):
                        for j in range(2):
                            yo = i * 8 + j * 2
                            tr = sum(st.submvs[yo + k][0]
                                     for k in (0, 1, 4, 5))
                            tc = sum(st.submvs[yo + k][1]
                                     for k in (0, 1, 4, 5))
                            tr += 4 if tr >= 0 else -4
                            tc += 4 if tc >= 0 else -4
                            uvmv = ((int(tr / 8)) & fullpel_mask,
                                    (int(tc / 8)) & fullpel_mask)
                            if need:
                                uvmv = _clamp_uvmv(uvmv, edges)
                            blk_u = _predict_block(
                                ru, 8 * mb_y + 4 * i, 8 * mb_x + 4 * j,
                                4, 4, uvmv, filters)
                            blk_v = _predict_block(
                                rv, 8 * mb_y + 4 * i, 8 * mb_x + 4 * j,
                                4, 4, uvmv, filters)
                            upred[4 * i:4 * i + 4, 4 * j:4 * j + 4] \
                                = blk_u
                            vpred[4 * i:4 * i + 4, 4 * j:4 * j + 4] \
                                = blk_v
                else:
                    mv = st.mv
                    if _needs_clamp(mv, edges):
                        mv = _clamp_mv_border(mv, edges)
                    pred = _predict_block(ry, yr, yc, 16, 16, mv,
                                          filters)
                    # chroma mv: /2 rounded away from zero
                    ur = mv[0] + (1 if mv[0] >= 0 else -1)
                    uc = mv[1] + (1 if mv[1] >= 0 else -1)
                    uvmv = (int(ur / 2) & fullpel_mask,
                            int(uc / 2) & fullpel_mask)
                    upred = _predict_block(ru, 8 * mb_y, 8 * mb_x,
                                           8, 8, uvmv, filters)
                    vpred = _predict_block(rv, 8 * mb_y, 8 * mb_x,
                                           8, 8, uvmv, filters)
                for sy in range(4):
                    for sx in range(4):
                        blk = coeffs[4 * sy + sx]
                        if blk.any():
                            pred[4 * sy:4 * sy + 4,
                                 4 * sx:4 * sx + 4] += _idct4x4(blk)
                Y[r0:r0 + 16, c0:c0 + 16] = np.clip(pred, 0, 255)
                ru0, cu0 = 1 + 8 * mb_y, 1 + 8 * mb_x
                for pl, pr_, ci0 in ((U, upred, 16), (V, vpred, 20)):
                    for sy in range(2):
                        for sx in range(2):
                            blk = coeffs[ci0 + 2 * sy + sx]
                            if blk.any():
                                pr_[4 * sy:4 * sy + 4,
                                    4 * sx:4 * sx + 4] += \
                                    _idct4x4(blk)
                    pl[ru0:ru0 + 8, cu0:cu0 + 8] = \
                        np.clip(pr_, 0, 255)
            elif ymode == B_PRED:
                if mb_y > 0 and mb_x == mb_w - 1:
                    Y[r0 - 1, c0 + 16:c0 + 20] = Y[r0 - 1, c0 + 15]
                tr4 = Y[r0 - 1, c0 + 16:c0 + 20].copy()
                for dy in (3, 7, 11):
                    Y[r0 + dy, c0 + 16:c0 + 20] = tr4
                for sy in range(4):
                    for sx in range(4):
                        pr = _pred_b(Y, r0 + 4 * sy, c0 + 4 * sx,
                                     bmodes[sy][sx])
                        blk = coeffs[4 * sy + sx]
                        if blk.any():
                            pr = pr + _idct4x4(blk)
                        Y[r0 + 4 * sy:r0 + 4 * sy + 4,
                          c0 + 4 * sx:c0 + 4 * sx + 4] = \
                            np.clip(pr, 0, 255)
                ru0, cu0 = 1 + 8 * mb_y, 1 + 8 * mb_x
                for pl, ci0 in ((U, 16), (V, 20)):
                    pr = _pred16(pl, ru0, cu0, 8, uvmode, mb_y > 0,
                                 mb_x > 0)
                    for sy in range(2):
                        for sx in range(2):
                            blk = coeffs[ci0 + 2 * sy + sx]
                            if blk.any():
                                pr[4 * sy:4 * sy + 4,
                                   4 * sx:4 * sx + 4] += _idct4x4(blk)
                    pl[ru0:ru0 + 8, cu0:cu0 + 8] = \
                        np.clip(pr, 0, 255)
            else:                         # 16x16 intra
                pr = _pred16(Y, r0, c0, 16, ymode, mb_y > 0,
                             mb_x > 0)
                for sy in range(4):
                    for sx in range(4):
                        blk = coeffs[4 * sy + sx]
                        if blk.any():
                            pr[4 * sy:4 * sy + 4, 4 * sx:4 * sx + 4] \
                                += _idct4x4(blk)
                Y[r0:r0 + 16, c0:c0 + 16] = np.clip(pr, 0, 255)
                ru0, cu0 = 1 + 8 * mb_y, 1 + 8 * mb_x
                for pl, ci0 in ((U, 16), (V, 20)):
                    pr = _pred16(pl, ru0, cu0, 8, uvmode, mb_y > 0,
                                 mb_x > 0)
                    for sy in range(2):
                        for sx in range(2):
                            blk = coeffs[ci0 + 2 * sy + sx]
                            if blk.any():
                                pr[4 * sy:4 * sy + 4,
                                   4 * sx:4 * sx + 4] += _idct4x4(blk)
                    pl[ru0:ru0 + 8, cu0:cu0 + 8] = \
                        np.clip(pr, 0, 255)

            # roll neighbor state
            al_st = above_st[mb_x]
            above_st[mb_x] = st
            left_st = st

    dec.seg_map = seg_map
    if h.version < 2 and (h.filter_level > 0 or h.segmentation
                          or h.lf_delta_enabled):
        hh = _SimpleFilterView(h) if h.version == 1 else h
        _loop_filter(hh, Y, U, V, mb_info, mb_w, mb_h)
    return Y, U, V


def _clamp_uvmv(mv, edges):
    """clamp_uvmv_to_umv_border: chroma MVs compared at 2× against
    the luma-plane bounds, clamped to half the luma clamp."""
    to_left, to_right, to_top, to_bottom = edges
    r, c = mv
    if 2 * c < to_left - (19 << 3):
        c = (to_left - (16 << 3)) >> 1
    elif 2 * c > to_right + (18 << 3):
        c = (to_right + (16 << 3)) >> 1
    if 2 * r < to_top - (19 << 3):
        r = (to_top - (16 << 3)) >> 1
    elif 2 * r > to_bottom + (18 << 3):
        r = (to_bottom + (16 << 3)) >> 1
    return r, c


class VP8Decoder:
    """Stateful VP8 video decoder: keyframes re-arm dimensions,
    entropy defaults, and all three reference buffers; inter frames
    decode against them. ``decode_frame`` returns ``(h, w, 3)``
    uint8 RGB for shown frames and ``None`` for invisible ones
    (altref-update frames), which still refresh their buffers."""

    def __init__(self):
        self.width = self.height = None
        self.refs: dict[int, tuple | None] = {1: None, 2: None,
                                              3: None}
        self.sign_bias_golden = 0
        self.sign_bias_alt = 0
        self.seg_abs = 0
        self.seg_quant = [0, 0, 0, 0]
        self.seg_lf = [0, 0, 0, 0]
        self.ref_lf_deltas = [0, 0, 0, 0]
        self.mode_lf_deltas = [0, 0, 0, 0]
        self.seg_map = None
        self._reset_entropy()

    def _reset_entropy(self) -> None:
        self.coeff_probs = [
            [[list(DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)]
             for b in range(8)] for t in range(4)]
        self.mv_probs = [list(DEFAULT_MV_PROBS[0]),
                         list(DEFAULT_MV_PROBS[1])]
        self.ymode_probs = list(YMODE_PROB_DEFAULT)
        self.uvmode_probs = list(UV_MODE_PROB_DEFAULT)

    def _store_refs(self, h, Y, U, V) -> None:
        mb_w = (self.width + 15) // 16
        mb_h = (self.height + 15) // 16
        new = (_extend_plane(Y[1:1 + mb_h * 16, 1:1 + mb_w * 16]),
               _extend_plane(U[1:1 + mb_h * 8, 1:1 + mb_w * 8]),
               _extend_plane(V[1:1 + mb_h * 8, 1:1 + mb_w * 8]))
        if getattr(h, "keyframe", True):
            self.refs = {1: new, 2: new, 3: new}
            return
        # buffer copies happen BEFORE the refreshes, altref copy
        # first (a golden copy from altref sees the new altref) —
        # the libvpx swap_frame_buffers order
        if h.copy_to_alt == 1:
            self.refs[3] = self.refs[1]
        elif h.copy_to_alt == 2:
            self.refs[3] = self.refs[2]
        if h.copy_to_golden == 1:
            self.refs[2] = self.refs[1]
        elif h.copy_to_golden == 2:
            self.refs[2] = self.refs[3]
        if h.refresh_golden:
            self.refs[2] = new
        if h.refresh_alt:
            self.refs[3] = new
        if h.refresh_last:
            self.refs[1] = new

    def decode_frame(self, payload: bytes) -> np.ndarray | None:
        payload = bytes(payload)
        if len(payload) < 3:
            raise ValueError("VP8: frame shorter than its tag")
        keyframe = not (payload[0] & 1)
        if keyframe:
            h = parse_vp8_frame_header(payload)
            h.keyframe = True
            self.width, self.height = h.width, h.height
            self.sign_bias_golden = self.sign_bias_alt = 0
            self._reset_entropy()
            # keyframe header updates apply against the freshly
            # reset defaults; persistence below mirrors the inter
            # path (refresh_entropy == 0 reverts after the frame)
            saved = self._snapshot_entropy()
            self.coeff_probs = h.coeff_probs
            Y, U, V = _decode_frame(h)
            if not h.refresh_entropy:
                self._restore_entropy(saved)
            # segment state persists into the sequence: inter frames
            # may keep segmentation on without re-coding the map or
            # the feature data
            self.seg_map = h.seg_map if h.segmentation else None
            self.seg_abs = h.seg_abs
            self.seg_quant = list(h.seg_quant)
            self.seg_lf = list(h.seg_lf)
            self.ref_lf_deltas = list(h.ref_lf_deltas)
            self.mode_lf_deltas = list(h.mode_lf_deltas)
        else:
            if self.width is None:
                raise ValueError(
                    "VP8: inter frame before any keyframe — the "
                    "stream must start with a keyframe")
            h = _parse_inter_header(payload, self)
            saved = self._snapshot_entropy()
            self.coeff_probs = h.coeff_probs
            self.mv_probs = h.mv_probs
            self.ymode_probs = h.ymode_probs
            self.uvmode_probs = h.uvmode_probs
            self.sign_bias_golden = h.sign_bias_golden
            self.sign_bias_alt = h.sign_bias_alt
            Y, U, V = _decode_inter_frame(h, self)
            if not h.refresh_entropy:
                self._restore_entropy(saved)
            # loop-filter delta and segment-feature state persist
            self.seg_abs = h.seg_abs
            self.seg_quant = list(h.seg_quant)
            self.seg_lf = list(h.seg_lf)
            self.ref_lf_deltas = list(h.ref_lf_deltas)
            self.mode_lf_deltas = list(h.mode_lf_deltas)
        self._store_refs(h, Y, U, V)
        if not h.show:
            return None
        cw, chh = (self.width + 1) // 2, (self.height + 1) // 2
        return _yuv420_to_rgb_fancy(
            Y[1:1 + self.height, 1:1 + self.width],
            U[1:1 + chh, 1:1 + cw], V[1:1 + chh, 1:1 + cw],
            self.width, self.height)

    def _snapshot_entropy(self):
        return ([[[list(c) for c in b] for b in t]
                 for t in self.coeff_probs],
                [list(self.mv_probs[0]), list(self.mv_probs[1])],
                list(self.ymode_probs), list(self.uvmode_probs))

    def _restore_entropy(self, saved) -> None:
        self.coeff_probs, self.mv_probs, self.ymode_probs, \
            self.uvmode_probs = saved
