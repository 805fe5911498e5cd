"""Builtin baseline JPEG codec (r8): DCT math, encode→decode round
trips for every supported shape (4:4:4 / 4:2:0 / grayscale / restart
markers), honest guards for unsupported variants, hostile-bytes
totality, and the decode_image integration with codec provenance."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import (
    _T, decode_jpeg, encode_jpeg,
)


def _smooth(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([np.clip(yy * 3, 0, 255),
                     np.clip(xx * 2, 0, 255),
                     np.clip(120 + yy - xx, 0, 255)],
                    -1).astype(np.uint8)


def test_dct_basis_orthonormal():
    assert np.allclose(_T @ _T.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 128, (8, 8))
    assert np.allclose(_T.T @ (_T @ b @ _T.T) @ _T, b, atol=1e-9)


def test_roundtrip_444_high_quality():
    img = _smooth()
    data = encode_jpeg(img, quality=95)
    assert data[:3] == b"\xFF\xD8\xFF" and data[-2:] == b"\xFF\xD9"
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.mean() < 3 and err.max() < 30


def test_roundtrip_420_subsampled():
    img = _smooth(48, 48)
    data420 = encode_jpeg(img, quality=95, subsampling="4:2:0")
    data444 = encode_jpeg(img, quality=95)
    assert len(data420) < len(data444)       # subsampling shrinks
    out = decode_jpeg(data420)
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.mean() < 4 and err.max() < 40


def test_roundtrip_grayscale_and_odd_dims():
    rng = np.random.default_rng(3)
    img = np.clip(rng.normal(128, 20, (37, 29)), 0,
                  255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=97))
    assert out.shape == (37, 29, 1)
    err = np.abs(out[..., 0].astype(float) - img.astype(float))
    assert err.mean() < 6


def test_restart_markers_change_framing_not_pixels():
    img = _smooth(40, 40)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    rst = decode_jpeg(encode_jpeg(img, quality=90,
                                  restart_interval=2))
    assert np.array_equal(plain, rst), \
        "restart markers reframe the stream; coefficients (and so " \
        "pixels) must be identical"


def test_unsupported_variants_raise_honestly():
    img = _smooth(16, 16)
    data = bytearray(encode_jpeg(img, quality=90))
    i = bytes(data).find(b"\xFF\xC0")
    data[i + 1] = 0xC3                       # rewrite SOF0 -> SOF3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(data))
    # a baseline stream relabeled SOF2 is a CORRUPT progressive file
    # (its single scan spans Ss=0..Se=63): loud error, not misparse
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"notajpeg")
    with pytest.raises(ValueError, match="missing SOF"):
        decode_jpeg(b"\xFF\xD8\xFF\xD9")


@settings(max_examples=120, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(blob=st.binary(max_size=300))
def test_decoder_total_on_hostile_bytes(blob):
    """Arbitrary bytes after a JPEG SOI either decode or raise a
    clean ValueError/NotImplementedError — never hang, never crash
    the interpreter."""
    try:
        decode_jpeg(b"\xFF\xD8\xFF\xE0" + blob)
    except (ValueError, NotImplementedError, IndexError):
        pass


def test_decode_image_dispatch_and_provenance(spark):
    """The Spark plumbing: a JPEG payload through decode_image decodes
    for REAL (no Pillow in this container), carries codec='jpeg', and
    matches the direct decoder exactly."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import decode_image, pack_media

    img = _smooth(24, 32)
    payload = encode_jpeg(img, quality=92)
    direct = decode_jpeg(payload)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    packed = pack_media(df, "payload", "jpeg", width=32, height=24,
                        channels=3)
    out = decode_image(packed, "payload").collect()[0]
    assert out["codec"] == "jpeg"
    got = np.array(out["pixels"], dtype=np.int64).reshape(24, 32, 3)
    assert np.array_equal(got, direct.astype(np.int64))
    # lossy but faithful: PSNR vs the source image is high
    mse = float(((got - img.astype(np.int64)) ** 2).mean())
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 30, psnr


@pytest.mark.skipif(not pytest.importorskip("importlib").util
                    .find_spec("PIL"),
                    reason="Pillow not installed")
def test_pillow_cross_decodes_our_output():  # pragma: no cover
    from PIL import Image
    import io
    img = _smooth(32, 32)
    out = np.asarray(Image.open(io.BytesIO(
        encode_jpeg(img, quality=95))).convert("RGB"))
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 4


def test_ff_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 allows runs of 0xFF fill bytes before any marker;
    the entropy-segment splitter must skip them instead of truncating
    the scan (r8 advisor finding). Inject fill before EOI and before
    a restart marker; pixels must match the unpadded stream."""
    img = _smooth(40, 40)
    data = encode_jpeg(img, quality=90, restart_interval=2)
    base = decode_jpeg(data)
    # fill before EOI
    assert data[-2:] == b"\xff\xd9"
    padded = data[:-2] + b"\xff\xff\xff" + data[-2:]
    assert np.array_equal(decode_jpeg(padded), base)
    # fill before the first restart marker
    for m in range(0xD0, 0xD8):
        idx = data.find(bytes([0xFF, m]))
        if idx != -1:
            break
    assert idx != -1, "restart_interval=2 must emit RST markers"
    padded2 = data[:idx] + b"\xff" + data[idx:]
    assert np.array_equal(decode_jpeg(padded2), base)


# ----------------------------------------------- progressive (r10)

def test_progressive_decode_equals_baseline_decode():
    """r9 VERDICT item 7: progressive coding is LOSSLESS over the
    quantized coefficients, so decoding an image's progressive
    encode must equal decoding its baseline encode BIT-FOR-BIT —
    across color/gray, subsampling, odd dimensions, and qualities
    (exercises DC first/refine, AC spectral bands, AC refinement
    with EOB runs, ZRLs, and correction bits)."""
    rng = np.random.default_rng(7)
    cases = [((24, 16, 3), "4:4:4", 85), ((17, 23, 3), "4:2:0", 85),
             ((16, 16, 1), "4:4:4", 95), ((40, 56, 3), "4:2:0", 60),
             ((8, 8, 3), "4:4:4", 30), ((33, 31, 1), "4:4:4", 75)]
    for shape, sub, q in cases:
        base = rng.integers(0, 256, size=(4, 4, shape[2]))
        img = np.kron(base, np.ones((shape[0] // 4 + 1,
                                     shape[1] // 4 + 1, 1)))
        img = img[:shape[0], :shape[1], :]
        img = np.clip(img + np.arange(shape[1])[None, :, None] * 2
                      + rng.integers(-25, 25, size=shape),
                      0, 255).astype(np.uint8)
        b = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        p = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub,
                                    progressive=True))
        assert np.array_equal(b, p), (shape, sub, q)


def test_progressive_noise_image_stress():
    """Full-range noise maximizes coefficient activity (many newly-
    visible AND history coefficients per refinement scan) — the
    hardest case for the correction-bit bookkeeping."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    for q in (35, 75, 95):
        b = decode_jpeg(encode_jpeg(img, quality=q))
        p = decode_jpeg(encode_jpeg(img, quality=q,
                                    progressive=True))
        assert np.array_equal(b, p), q


def test_progressive_sparse_blocks_exercise_eob_runs():
    """A mostly-flat image with a few busy blocks produces long EOB
    runs spanning blocks in both AC passes."""
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    img[20:28, 20:28] = 250
    img[40:48, 8:16, 0] = 10
    for q in (50, 90):
        b = decode_jpeg(encode_jpeg(img, quality=q,
                                    subsampling="4:2:0"))
        p = decode_jpeg(encode_jpeg(img, quality=q,
                                    subsampling="4:2:0",
                                    progressive=True))
        assert np.array_equal(b, p), q


def test_progressive_through_decode_image_plumbing(spark):
    """A progressive payload decodes for REAL through the Arrow
    decode_image path with codec='jpeg' provenance — no Pillow."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import decode_image, pack_media
    img = _smooth(24, 32)
    payload = encode_jpeg(img, quality=92, progressive=True)
    direct = decode_jpeg(payload)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    packed = pack_media(df, "payload", "jpeg", width=32, height=24,
                        channels=3)
    out = decode_image(packed, "payload").collect()[0]
    assert out["codec"] == "jpeg"
    got = np.array(out["pixels"], dtype=np.int64).reshape(24, 32, 3)
    assert np.array_equal(got, direct.astype(np.int64))


def test_progressive_encoder_contracts():
    img = _smooth(16, 16)
    # SOF2 marker actually present
    data = encode_jpeg(img, progressive=True)
    assert b"\xFF\xC2" in data and b"\xFF\xC0" not in data


def test_progressive_restart_intervals_roundtrip():
    """Restart markers in PROGRESSIVE scans (r10): predictor and
    EOB-run state reset per segment in every scan type (interleaved
    DC, per-component AC first/refine) — pixels must equal the
    unrestarted baseline decode exactly, pinning the decoder's
    per-scan restart machinery that the restart-less script never
    exercises."""
    rng = np.random.default_rng(5)
    for shape, sub, ri in [((40, 40, 3), "4:4:4", 2),
                           ((33, 31, 3), "4:2:0", 3),
                           ((24, 24, 1), "4:4:4", 1)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = decode_jpeg(encode_jpeg(img, quality=80,
                                    subsampling=sub))
        data = encode_jpeg(img, quality=80, subsampling=sub,
                           progressive=True, restart_interval=ri)
        assert any(bytes([0xFF, m]) in data
                   for m in range(0xD0, 0xD8)), "RSTs must be real"
        assert np.array_equal(b, decode_jpeg(data)), (shape, sub, ri)


@pytest.mark.skipif(not pytest.importorskip("importlib").util
                    .find_spec("PIL"),
                    reason="Pillow not installed")
def test_pillow_cross_decodes_progressive():  # pragma: no cover
    """r9 VERDICT item 7 done-criterion: Pillow cross-decode
    equality where present — our progressive stream is
    spec-compliant, not merely self-consistent."""
    from PIL import Image
    import io
    img = _smooth(32, 32)
    data = encode_jpeg(img, quality=90, progressive=True)
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ours = decode_jpeg(data)
    assert np.array_equal(ours, theirs)


def test_is_progressive_jpeg_detector():
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import is_progressive_jpeg
    img = _smooth(16, 16)
    assert not is_progressive_jpeg(encode_jpeg(img))
    assert is_progressive_jpeg(encode_jpeg(img, progressive=True))
    assert not is_progressive_jpeg(b"notajpeg")
    assert not is_progressive_jpeg(b"\xFF\xD8\xFF\xD9")


def test_multi_scan_baseline_decodes():
    """r10: multi-scan (non-interleaved sequential) BASELINE files —
    one scan per component, each with its own DHT — decode through
    the coefficient-accumulating walk. The file is hand-muxed from
    the codec's own primitives over the SAME DCT/quant pipeline as
    the single-scan encoder, so pixels must match the interleaved
    4:4:4 encode exactly."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import (
        _ZIGZAG, _BitWriter, _block_symbols, _fixed_length_code,
        _quality_tables,
    )
    rng = np.random.default_rng(9)
    h, w, q = 24, 16, 85
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    qlum, qchr = _quality_tables(q)

    rgb = img.astype(np.float64)
    R, G, B = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [0.299 * R + 0.587 * G + 0.114 * B,
              128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B,
              128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B]
    comp_blocks = []
    for ci, p in enumerate(planes):
        qt = (qlum if ci == 0 else qchr).reshape(8, 8)
        blocks = []
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                blocks.append(np.round((_T @ blk @ _T.T) / qt))
        comp_blocks.append(blocks)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in ((0, qlum), (1, qchr)):
        z = tab.reshape(64)[_ZIGZAG].astype(int)
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") \
            + bytes([tid]) + bytes(int(x) for x in z)
    sof = bytearray()
    sof += (8 + 9).to_bytes(2, "big") + b"\x08"
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xFF\xC0" + sof
    # one NON-INTERLEAVED scan per component, tables redefined each
    for ci in range(3):
        dc_syms, ac_syms, ops = _block_symbols(comp_blocks[ci])
        dcb, dcv, dce = _fixed_length_code(dc_syms)
        acb, acv, ace = _fixed_length_code(ac_syms + [0x00, 0xF0])
        for cls, (bits, vals) in ((0, (dcb, dcv)), (1, (acb, acv))):
            body = bytes([(cls << 4) | 0]) + bytes(bits) + bytes(vals)
            out += b"\xFF\xC4" + (2 + len(body)).to_bytes(2, "big") \
                + body
        out += b"\xFF\xDA" + (8).to_bytes(2, "big") + b"\x01" \
            + bytes([ci + 1, 0x00]) + b"\x00\x3F\x00"
        wtr = _BitWriter()
        for size, bits_v, ac_ops in ops:
            code, length = dce[size]
            wtr.write(code, length)
            if size:
                wtr.write(bits_v, size)
            for sym, s, b in ac_ops:
                code, length = ace[sym]
                wtr.write(code, length)
                if s:
                    wtr.write(b, s)
        wtr.flush()
        out += wtr.out
    out += b"\xFF\xD9"

    got = decode_jpeg(bytes(out))
    want = decode_jpeg(encode_jpeg(img, quality=q))
    assert np.array_equal(got, want)


def test_multi_scan_baseline_missing_component_raises():
    """Review fix (r10): a truncated multi-scan baseline file (EOI
    present but a component's scan missing) must raise, not decode
    the missing component as silently-flat zeros."""
    img = _smooth(16, 16)
    data = encode_jpeg(img, quality=90)
    # split the single interleaved scan off and re-mux only a fake
    # second SOS-less stream? Simpler: graft a second tiny scan so
    # len(scans) > 1 routes the multi-scan walk, with component 2/3
    # never covered. Build from the codec's own primitives:
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import (
        _ZIGZAG, _BitWriter, _block_symbols, _fixed_length_code,
        _quality_tables,
    )
    qlum, qchr = _quality_tables(85)
    h = w = 8
    gray = np.full((8, 8), 100.0)
    blk = np.round((_T @ (gray - 128.0) @ _T.T) / qlum.reshape(8, 8))
    dc_syms, ac_syms, ops = _block_symbols([blk])
    dcb, dcv, dce = _fixed_length_code(dc_syms)
    acb, acv, ace = _fixed_length_code(ac_syms + [0x00, 0xF0])
    out = bytearray(b"\xFF\xD8")
    z = qlum.reshape(64)[_ZIGZAG].astype(int)
    out += b"\xFF\xDB" + (67).to_bytes(2, "big") + b"\x00" \
        + bytes(int(x) for x in z)
    sof = bytearray()
    sof += (8 + 9).to_bytes(2, "big") + b"\x08"
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03"
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xFF\xC0" + sof
    for cls, (bits, vals) in ((0, (dcb, dcv)), (1, (acb, acv))):
        body = bytes([(cls << 4) | 0]) + bytes(bits) + bytes(vals)
        out += b"\xFF\xC4" + (2 + len(body)).to_bytes(2, "big") + body
    # ONLY component 1's scan — components 2 and 3 never arrive
    out += b"\xFF\xDA" + (8).to_bytes(2, "big") + b"\x01" \
        + bytes([1, 0x00]) + b"\x00\x3F\x00"
    wtr = _BitWriter()
    size, bits_v, ac_ops = ops[0]
    code, length = dce[size]
    wtr.write(code, length)
    if size:
        wtr.write(bits_v, size)
    for sym, s, b in ac_ops:
        code, length = ace[sym]
        wtr.write(code, length)
        if s:
            wtr.write(b, s)
    wtr.flush()
    out += wtr.out
    # a second (duplicate) scan of the SAME component keeps
    # len(scans) > 1 without covering 2/3
    out += b"\xFF\xDA" + (8).to_bytes(2, "big") + b"\x01" \
        + bytes([1, 0x00]) + b"\x00\x3F\x00" + wtr.out
    out += b"\xFF\xD9"
    with pytest.raises(ValueError, match="missing scans"):
        decode_jpeg(bytes(out))


def test_is_progressive_detector_fill_bytes_and_appn():
    """Review fix (r10): FF fill bytes before markers must not derail
    the walk, and a stray FF C2 inside an APPn binary body must not
    misclassify a baseline payload."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.jpeg import is_progressive_jpeg
    img = _smooth(16, 16)
    base = encode_jpeg(img, quality=90)
    prog = encode_jpeg(img, quality=90, progressive=True)
    # fill bytes injected before the SOF marker of each
    i = base.find(b"\xFF\xC0")
    assert not is_progressive_jpeg(base[:i] + b"\xFF\xFF" + base[i:])
    j = prog.find(b"\xFF\xC2")
    assert is_progressive_jpeg(prog[:j] + b"\xFF\xFF" + prog[j:])
    # APPn segment whose body contains FF C2: baseline stays baseline
    app = b"\xFF\xE7" + (6).to_bytes(2, "big") + b"\xFF\xC2\x00\x00"
    assert not is_progressive_jpeg(base[:2] + app + base[2:])
