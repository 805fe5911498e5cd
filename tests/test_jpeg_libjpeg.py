"""Real-codec cross-check of the builtin JPEG codec (r13).

The container ships gcc + libjpeg(-turbo); a tiny C shim (compiled at
test time, cached per session, skipped where either is absent) drives
the REAL encoder/decoder so the builtin codec is pinned against what
the world actually produces — the first external oracle for jpeg.py
(its r8/r10 tests used spec-built goldens). Bounds: on natural
content the two decoders agree within ±3 per sample (the residue is
libjpeg's fixed-point islow IDCT vs this module's float DCT — the
spec does not pin IDCT bits), across baseline/progressive, all four
sampling modes, restart intervals, odd dims, and grayscale; the
builtin ENCODER's files must decode in libjpeg. The r13 fancy
(triangular) chroma upsamplers — which is what made the ±3 bound
possible at subsampled modes; nearest-neighbor read ±20 — carry
library-free unit tests for the exact libjpeg rounding and the
narrow-plane replication gate.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import (
    _fancy_h1v2, _fancy_h2v1, _fancy_h2v2, decode_jpeg, encode_jpeg,
    is_progressive_jpeg,
)

_SHIM_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <setjmp.h>
#include <jpeglib.h>
struct jerr { struct jpeg_error_mgr mgr; jmp_buf jb; };
static void jerr_exit(j_common_ptr cinfo) {
  struct jerr* e = (struct jerr*)cinfo->err; longjmp(e->jb, 1);
}
long js_encode(const unsigned char* pix, int w, int h, int comps,
               int quality, int progressive, int restart,
               int hsamp, int vsamp, unsigned char** out) {
  struct jpeg_compress_struct c; struct jerr err;
  unsigned char* buf = NULL; unsigned long n = 0;
  c.err = jpeg_std_error(&err.mgr); err.mgr.error_exit = jerr_exit;
  if (setjmp(err.jb)) { jpeg_destroy_compress(&c); return -1; }
  jpeg_create_compress(&c);
  jpeg_mem_dest(&c, &buf, &n);
  c.image_width = w; c.image_height = h;
  c.input_components = comps;
  c.in_color_space = comps == 3 ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  if (comps == 3 && hsamp > 0) {
    c.comp_info[0].h_samp_factor = hsamp;
    c.comp_info[0].v_samp_factor = vsamp;
    c.comp_info[1].h_samp_factor = 1; c.comp_info[1].v_samp_factor = 1;
    c.comp_info[2].h_samp_factor = 1; c.comp_info[2].v_samp_factor = 1;
  }
  if (progressive) jpeg_simple_progression(&c);
  c.restart_interval = restart;
  jpeg_start_compress(&c, TRUE);
  while (c.next_scanline < c.image_height) {
    JSAMPROW row = (JSAMPROW)(pix + (size_t)c.next_scanline * w * comps);
    jpeg_write_scanlines(&c, &row, 1);
  }
  jpeg_finish_compress(&c); jpeg_destroy_compress(&c);
  *out = buf; return (long)n;
}
long js_decode(const unsigned char* data, long n,
               int* w, int* h, int* comps, unsigned char** out) {
  struct jpeg_decompress_struct d; struct jerr err;
  d.err = jpeg_std_error(&err.mgr); err.mgr.error_exit = jerr_exit;
  if (setjmp(err.jb)) { jpeg_destroy_decompress(&d); return -1; }
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, (unsigned char*)data, n);
  jpeg_read_header(&d, TRUE);
  jpeg_start_decompress(&d);
  *w = d.output_width; *h = d.output_height;
  *comps = d.output_components;
  {
    size_t stride = (size_t)d.output_width * d.output_components;
    unsigned char* pix = malloc(stride * d.output_height);
    while (d.output_scanline < d.output_height) {
      JSAMPROW row = pix + stride * d.output_scanline;
      jpeg_read_scanlines(&d, &row, 1);
    }
    jpeg_finish_decompress(&d); jpeg_destroy_decompress(&d);
    *out = pix; return (long)(stride * *h);
  }
}
void js_free(void* p) { free(p); }
"""


def _build_shim():
    if shutil.which("gcc") is None:
        return None
    cache = os.path.join(tempfile.gettempdir(), "jshim_test.so")
    if not os.path.exists(cache):
        with tempfile.NamedTemporaryFile(
                "w", suffix=".c", delete=False) as f:
            f.write(_SHIM_SRC)
            src = f.name
        try:
            r = subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", src, "-o", cache,
                 "-ljpeg"], capture_output=True)
            if r.returncode != 0:
                return None
        finally:
            os.unlink(src)
    try:
        lib = ctypes.CDLL(cache)
    except OSError:
        return None
    lib.js_encode.restype = ctypes.c_long
    lib.js_encode.argtypes = ([ctypes.c_char_p] + [ctypes.c_int] * 8
                              + [ctypes.POINTER(ctypes.c_void_p)])
    lib.js_decode.restype = ctypes.c_long
    lib.js_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_void_p)]
    lib.js_free.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _build_shim()
needs_libjpeg = pytest.mark.skipif(
    _LIB is None, reason="gcc + libjpeg not available for the "
                         "real-codec oracle")


def _enc(img, q=80, prog=0, restart=0, hs=2, vs=2):
    h, w = img.shape[:2]
    comps = img.shape[2]
    out = ctypes.c_void_p()
    n = _LIB.js_encode(np.ascontiguousarray(img).tobytes(), w, h,
                       comps, q, prog, restart, hs, vs,
                       ctypes.byref(out))
    assert n > 0, "libjpeg encode failed"
    d = ctypes.string_at(out, n)
    _LIB.js_free(out)
    return d


def _dec(data):
    w, h, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    out = ctypes.c_void_p()
    n = _LIB.js_decode(data, len(data), ctypes.byref(w),
                       ctypes.byref(h), ctypes.byref(c),
                       ctypes.byref(out))
    assert n > 0, "libjpeg decode failed"
    a = np.frombuffer(ctypes.string_at(out, n), np.uint8) \
        .reshape(h.value, w.value, c.value).copy()
    _LIB.js_free(out)
    return a


def _natural(h, w, rng):
    y, x = np.mgrid[0:h, 0:w]
    f1, f2 = rng.uniform(3, 15, 2)
    img = (np.stack([128 + 90 * np.sin(x / f1 + i)
                     + 70 * np.cos(y / f2 - i) for i in range(3)], -1)
           + rng.normal(0, 8, (h, w, 3)))
    return np.clip(img, 0, 255).astype(np.uint8)


@needs_libjpeg
@pytest.mark.parametrize("hs,vs", [(1, 1), (2, 1), (1, 2), (2, 2)])
@pytest.mark.parametrize("prog", [0, 1])
def test_decode_matches_libjpeg(hs, vs, prog):
    rng = np.random.default_rng(10 * hs + vs + prog)
    for _ in range(4):
        h = int(rng.integers(3, 70))
        w = int(rng.integers(3, 70))
        q = int(rng.integers(40, 98))
        restart = int(rng.integers(0, 3))
        data = _enc(_natural(h, w, rng), q=q, prog=prog,
                    restart=restart, hs=hs, vs=vs)
        assert is_progressive_jpeg(data) == bool(prog)
        d = np.abs(_dec(data).astype(int)
                   - decode_jpeg(data).astype(int))
        assert d.max() <= 3 and d.mean() < 1.0, \
            (h, w, q, hs, vs, prog, restart, d.max())


@needs_libjpeg
def test_decode_grayscale_and_tiny_dims():
    rng = np.random.default_rng(3)
    gray = _natural(25, 31, rng)[..., :1]
    for prog in (0, 1):
        data = _enc(np.ascontiguousarray(gray), q=85, prog=prog)
        d = np.abs(_dec(data).astype(int)
                   - decode_jpeg(data).astype(int))
        assert d.max() <= 1, prog
    # narrow planes take libjpeg's replication gate, not fancy
    for hw in ((1, 33), (33, 1), (33, 2), (3, 3), (2, 40)):
        img = _natural(*hw, rng)
        data = _enc(img, q=90)
        d = np.abs(_dec(data).astype(int)
                   - decode_jpeg(data).astype(int))
        assert d.max() <= 3, hw
    # h1v2 needs no horizontal neighbors: libjpeg-turbo triangular-
    # filters it at ANY width, so width<=2 must NOT fall back to
    # replication (r13 ADVICE — the width gate is h2v1/h2v2-only)
    for hw in ((33, 1), (33, 2), (40, 2)):
        img = _natural(*hw, rng)
        data = _enc(img, q=90, hs=1, vs=2)
        d = np.abs(_dec(data).astype(int)
                   - decode_jpeg(data).astype(int))
        assert d.max() <= 3, ("h1v2-narrow", hw)


@needs_libjpeg
def test_builtin_encoder_reads_in_libjpeg():
    """The builtin encoder's files must be consumable by the real
    codec, baseline and progressive, and the two decoders must agree
    on them."""
    rng = np.random.default_rng(7)
    img = _natural(37, 53, rng)
    for prog in (False, True):
        data = encode_jpeg(img, quality=85, progressive=prog)
        ref = _dec(data)
        mine = decode_jpeg(data)
        assert np.abs(ref.astype(int) - mine.astype(int)).max() <= 3
        # lossy round trip stays in the right neighborhood
        assert np.abs(ref.astype(int)
                      - img.astype(int)).mean() < 12.0


def test_fancy_upsampler_units():
    """Library-free pins of the exact libjpeg rounding: h2v1
    (+1 even / +2 odd, edge replication), h2v2 (vertical 3:1 column
    sums then /16 with +8/+7), h1v2 (vertical 3:1 with +1/+2)."""
    p = np.array([[10.0, 50.0, 90.0]])
    up = _fancy_h2v1(p)[0]
    assert up[0] == 10 and up[-1] == 90
    assert up[1] == (10 * 3 + 50 + 2) >> 2
    assert up[2] == (50 * 3 + 10 + 1) >> 2
    assert up[3] == (50 * 3 + 90 + 2) >> 2
    assert up[4] == (90 * 3 + 50 + 1) >> 2
    p2 = np.array([[10.0, 50.0, 90.0], [30.0, 70.0, 110.0]])
    up2 = _fancy_h2v2(p2)
    s00 = 10 * 3 + 10          # top edge: far row replicates
    s01 = 50 * 3 + 50
    assert up2[0, 0] == (s00 * 4 + 8) >> 4
    assert up2[0, 1] == (s00 * 3 + s01 + 7) >> 4
    s10 = 10 * 3 + 30          # second output row: far = below
    assert up2[1, 0] == (s10 * 4 + 8) >> 4
    up3 = _fancy_h1v2(p2)
    assert up3.shape == (4, 3)
    assert up3[0, 0] == (10 * 3 + 10 + 1) >> 2   # top edge replicate
    assert up3[1, 0] == (10 * 3 + 30 + 2) >> 2
    assert up3[2, 0] == (30 * 3 + 10 + 1) >> 2
    assert up3[3, 0] == (30 * 3 + 30 + 2) >> 2
    # flat planes are invariant under every fancy filter
    flat = np.full((4, 5), 77.0)
    assert (_fancy_h2v1(flat) == 77).all()
    assert (_fancy_h2v2(flat) == 77).all()
    assert (_fancy_h1v2(flat) == 77).all()
