"""Builtin FLAC decoder (r11): spec-built golden streams through an
independent test encoder — constant/verbatim/fixed/LPC subframes,
Rice partitions + escape partitions, wasted bits, all three stereo
decorrelations, multi-frame streams, UTF-8 frame numbers, CRC
enforcement, hostile-bytes totality, and the decode_audio integration
(FLAC == its WAV twin sample-for-sample). The same synthetic-golden
discipline as tests/test_jpeg.py / test_gif.py; format per the public
FLAC spec (RFC 9639)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.flac import decode_flac

# ---------------------------------------------------------------- encoder


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80
                   else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000
                   else crc << 1) & 0xFFFF
    return crc


class _W:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def sgn(self, v: int, n: int) -> None:
        self.w(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        self.bits += [0] * q + [1]

    def bytes_(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        out = bytearray(len(bits) // 8)
        for i, b in enumerate(bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)


def _streaminfo(rate: int, chans: int, bps: int, total: int,
                block: int) -> bytes:
    w = _W()
    w.w(block, 16)
    w.w(block, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(rate, 20)
    w.w(chans - 1, 3)
    w.w(bps - 1, 5)
    w.w(total, 36)
    body = w.bytes_() + b"\x00" * 16           # md5 unset
    assert len(body) == 34
    return b"\x80" + len(body).to_bytes(3, "big") + body


def _utf8(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    assert n < 0x800
    return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _rice(w: _W, residuals: list[int], escape: bool = False) -> None:
    """One-partition residual coding (method 0, 4-bit params);
    residuals too wide for a 4-bit Rice param fall back to the
    escape (raw-bits) partition form."""
    w.w(0, 2)                                   # method: rice 4-bit
    w.w(0, 4)                                   # partition order 0
    zz = [_zigzag(e) for e in residuals]
    param = max(max((z.bit_length() for z in zz), default=1) - 2, 0)
    if escape or param > 14:
        bits = max(max((abs(e).bit_length() + 1 for e in residuals),
                       default=1), 1)
        w.w(15, 4)                              # escape code
        w.w(bits, 5)
        for e in residuals:
            w.sgn(e, bits)
        return
    w.w(param, 4)
    for z in zz:
        w.unary(z >> param)
        if param:
            w.w(z & ((1 << param) - 1), param)


def _sub_constant(w: _W, v: int, eff: int, wasted: int = 0) -> None:
    w.w(0, 1)
    w.w(0, 6)
    _wasted(w, wasted)
    w.sgn(v >> wasted, eff - wasted)


def _wasted(w: _W, wasted: int) -> None:
    if wasted:
        w.w(1, 1)
        w.unary(wasted - 1)
    else:
        w.w(0, 1)


def _sub_verbatim(w: _W, samples: list[int], eff: int,
                  wasted: int = 0) -> None:
    w.w(0, 1)
    w.w(1, 6)
    _wasted(w, wasted)
    for s in samples:
        w.sgn(s >> wasted, eff - wasted)


_FIXED = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1),
          4: (4, -6, 4, -1)}


def _sub_fixed(w: _W, order: int, samples: list[int], eff: int,
               escape: bool = False) -> None:
    w.w(0, 1)
    w.w(8 + order, 6)
    w.w(0, 1)                                   # no wasted bits
    for s in samples[:order]:
        w.sgn(s, eff)
    res = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j]
                   for j, c in enumerate(_FIXED[order]))
        res.append(samples[i] - pred)
    _rice(w, res, escape=escape)


def _sub_lpc(w: _W, order: int, coefs: list[int], shift: int,
             precision: int, samples: list[int], eff: int) -> None:
    w.w(0, 1)
    w.w(32 + order - 1, 6)
    w.w(0, 1)
    for s in samples[:order]:
        w.sgn(s, eff)
    w.w(precision - 1, 4)
    w.sgn(shift, 5)
    for c in coefs:
        w.sgn(c, precision)
    res = []
    for i in range(order, len(samples)):
        acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        res.append(samples[i] - (acc >> shift))
    _rice(w, res)


def _frame(frame_idx: int, block: int, ch_code: int,
           write_subframes, rate: int) -> bytes:
    w = _W()
    w.w(0b11111111111110, 14)
    w.w(0, 1)
    w.w(0, 1)                                   # fixed block size
    w.w(7, 4)                                   # 16-bit block size - 1
    w.w(0, 4)                                   # rate from STREAMINFO
    w.w(ch_code, 4)
    w.w(0, 3)                                   # bps from STREAMINFO
    w.w(0, 1)
    hdr = w.bytes_()
    hdr += _utf8(frame_idx)
    hdr += (block - 1).to_bytes(2, "big")
    hdr += bytes([_crc8(hdr)])
    w2 = _W()
    write_subframes(w2)
    body = w2.bytes_()
    return hdr + body + _crc16(hdr + body).to_bytes(2, "big")


def _flac(rate: int, chans: int, bps: int, frames: list) -> bytes:
    """frames = [(block_size, ch_code, write_subframes)]."""
    total = sum(f[0] for f in frames)
    out = b"fLaC" + _streaminfo(rate, chans, bps, total,
                                frames[0][0])
    for i, (block, ch_code, ws) in enumerate(frames):
        out += _frame(i, block, ch_code, ws, rate)
    return out


def _sine16(n: int, seed: int = 0) -> list[int]:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    v = (8000 * np.sin(t / 3.0) + rng.integers(-50, 50, n)).astype(
        np.int64)
    return [int(x) for x in v]


# -------------------------------------------------------------------- tests


def test_constant_and_verbatim_roundtrip():
    vals = _sine16(32, 1)
    blob = _flac(8000, 1, 16, [
        (16, 0, lambda w: _sub_constant(w, -1234, 16)),
        (32, 0, lambda w: _sub_verbatim(w, vals, 16)),
    ])
    samples, rate = decode_flac(blob)
    assert rate == 8000
    want = [-1234] * 16 + vals
    assert np.allclose(samples, np.array(want) / 32768.0)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    vals = _sine16(64, order + 2)
    blob = _flac(44100, 1, 16, [
        (64, 0, lambda w: _sub_fixed(w, order, vals, 16))])
    samples, rate = decode_flac(blob)
    assert rate == 44100
    assert np.allclose(samples, np.array(vals) / 32768.0)


def test_lpc_subframe_roundtrip():
    vals = _sine16(48, 9)
    # order-2 quantized predictor: s ~ 2*s1 - s2 scaled by shift 4
    blob = _flac(16000, 1, 16, [
        (48, 0, lambda w: _sub_lpc(w, 2, [31, -15], 4, 6, vals, 16))])
    samples, _ = decode_flac(blob)
    assert np.allclose(samples, np.array(vals) / 32768.0)


def test_escape_partition_raw_residuals():
    vals = _sine16(32, 4)
    blob = _flac(8000, 1, 16, [
        (32, 0, lambda w: _sub_fixed(w, 1, vals, 16, escape=True))])
    samples, _ = decode_flac(blob)
    assert np.allclose(samples, np.array(vals) / 32768.0)


def test_wasted_bits_unpack():
    vals = [v & ~0b11 for v in _sine16(24, 5)]   # 2 wasted bits
    blob = _flac(8000, 1, 16, [
        (24, 0, lambda w: _sub_verbatim(w, vals, 16, wasted=2))])
    samples, _ = decode_flac(blob)
    assert np.allclose(samples, np.array(vals) / 32768.0)


def test_stereo_decorrelations_equal_independent():
    left, right = _sine16(40, 6), _sine16(40, 7)
    mid = [(a + b) >> 1 for a, b in zip(left, right)]
    side = [a - b for a, b in zip(left, right)]

    def indep(w):
        _sub_verbatim(w, left, 16)
        _sub_verbatim(w, right, 16)

    def left_side(w):
        _sub_verbatim(w, left, 16)
        _sub_verbatim(w, side, 17)               # side carries +1 bit

    def right_side(w):
        _sub_verbatim(w, side, 17)
        _sub_verbatim(w, right, 16)

    def mid_side(w):
        _sub_verbatim(w, mid, 16)
        _sub_verbatim(w, side, 17)

    base = None
    for ch_code, ws in [(1, indep), (8, left_side),
                        (9, right_side), (10, mid_side)]:
        blob = _flac(48000, 2, 16, [(40, ch_code, ws)])
        samples, rate = decode_flac(blob)
        assert rate == 48000
        if base is None:
            base = samples
        else:
            assert np.array_equal(samples, base), ch_code
    want = np.empty(80, dtype=np.float32)
    want[0::2] = np.array(left) / 32768.0
    want[1::2] = np.array(right) / 32768.0
    assert np.allclose(base, want)


def test_multi_frame_stream_and_utf8_numbers():
    frames = []
    allv = []
    for i in range(130):                         # frame idx > 127
        vals = _sine16(16, 100 + i)
        allv += vals
        frames.append(
            (16, 0,
             (lambda v: lambda w: _sub_verbatim(w, v, 16))(vals)))
    blob = _flac(22050, 1, 16, frames)
    samples, _ = decode_flac(blob)
    assert np.allclose(samples, np.array(allv) / 32768.0)


def test_crc_enforcement():
    vals = _sine16(16, 8)
    blob = bytearray(_flac(8000, 1, 16, [
        (16, 0, lambda w: _sub_verbatim(w, vals, 16))]))
    blob[-1] ^= 0xFF                             # frame CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(blob))
    blob2 = bytearray(_flac(8000, 1, 16, [
        (16, 0, lambda w: _sub_verbatim(w, vals, 16))]))
    # layout: fLaC(4) + STREAMINFO block(38) + frame header =
    # 4 fixed bytes + utf8(1) + blocksize(2), then the CRC-8 byte
    blob2[42 + 4 + 1 + 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(blob2))


def test_guards_loud():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS junk")
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(b"fLaC" + b"\x81\x00\x00\x01\x00")  # padding only
    vals = _sine16(16, 3)
    good = _flac(8000, 1, 16, [
        (16, 0, lambda w: _sub_verbatim(w, vals, 16))])
    with pytest.raises(ValueError, match="sync|mid-field|CRC"):
        decode_flac(good[:-5] + b"\x00\x00\x00\x00\x00")
    # truncation is loud too (which guard fires depends on where the
    # cut lands — any of the FLAC errors is acceptable, silence isn't)
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(good[:len(good) // 2])


@settings(max_examples=120, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(blob=st.binary(max_size=400))
def test_decoder_total_on_hostile_bytes(blob):
    """Arbitrary bytes after the fLaC magic either decode or raise a
    clean ValueError — never hang, never crash the interpreter."""
    try:
        decode_flac(b"fLaC" + blob)
    except (ValueError, IndexError):
        pass


def test_decode_audio_integration(spark):
    """The Spark face: a FLAC payload through decode_audio equals its
    WAV twin sample-for-sample (both real builtin decodes), with no
    codec library in the container."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark import decode_audio, pack_media

    left, right = _sine16(64, 11), _sine16(64, 12)
    inter = np.empty(128, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    wav = (b"RIFF" + (36 + 256).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + (8000).to_bytes(4, "little")
           + (32000).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + (256).to_bytes(4, "little")
           + inter.tobytes())

    def ws(w):
        _sub_verbatim(w, left, 16)
        _sub_verbatim(w, [a - b for a, b in zip(left, right)], 17)

    flac = _flac(8000, 2, 16, [(64, 8, ws)])
    df = pack_media(
        spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(flac))],
            "media_id long, payload binary"),
        "payload", fmt="audio", width=0, height=0)
    rows = {r["media_id"]: np.asarray(r["samples"], dtype=np.float32)
            for r in decode_audio(df, "payload").collect()}
    assert np.array_equal(rows[1], rows[2])


def test_pyav_cross_decode():  # pragma: no cover - gated
    """Where PyAV exists, its FLAC decode of our golden stream equals
    the builtin decoder sample-for-sample."""
    av = pytest.importorskip("av")
    assert av
    import io

    vals = _sine16(64, 13)
    blob = _flac(8000, 1, 16, [
        (64, 0, lambda w: _sub_fixed(w, 2, vals, 16))])
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        _pyav_decode_audio,
    )
    theirs = _pyav_decode_audio(blob)
    ours, _ = decode_flac(blob)
    assert np.allclose(theirs, ours, atol=1e-4)


def test_metadata_streaminfo_and_vorbis_comments():
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.flac import (
        parse_flac_metadata,
    )
    vals = _sine16(16, 20)
    blob = bytearray(_flac(8000, 1, 16, [
        (16, 0, lambda w: _sub_verbatim(w, vals, 16))]))
    # splice a VORBIS_COMMENT block between STREAMINFO and the frame:
    # clear STREAMINFO's last-block flag, insert type-4 block
    blob[4] &= 0x7F
    vendor = b"test-encoder"
    items = [b"ARTIST=sensor rig 7", b"title=drive 0042"]
    body = (len(vendor).to_bytes(4, "little") + vendor
            + len(items).to_bytes(4, "little")
            + b"".join(len(i).to_bytes(4, "little") + i
                       for i in items))
    block = bytes([0x80 | 4]) + len(body).to_bytes(3, "big") + body
    blob = bytes(blob[:42]) + block + bytes(blob[42:])
    meta = parse_flac_metadata(blob)
    assert (meta["rate"], meta["channels"], meta["bps"]) == (8000, 1, 16)
    assert meta["total_samples"] == 16 and meta["duration_s"] == 16 / 8000
    assert meta["vendor"] == "test-encoder"
    assert meta["comments"] == {"ARTIST": "sensor rig 7",
                                "TITLE": "drive 0042"}
    # the audio still decodes with the extra block in the chain
    samples, _ = decode_flac(blob)
    assert np.allclose(samples, np.array(vals) / 32768.0)


@pytest.mark.parametrize("bps,scale", [(8, 128.0), (24, 8388608.0)])
def test_other_bit_depths(bps, scale):
    rng = np.random.default_rng(bps)
    vals = [int(v) for v in
            rng.integers(-int(scale) // 2, int(scale) // 2, 32)]
    blob = _flac(8000, 1, bps, [
        (32, 0, lambda w: _sub_fixed(w, 1, vals, bps))])
    samples, _ = decode_flac(blob)
    assert np.allclose(samples, np.array(vals) / scale)


def test_id3_prefixed_flac_decodes_and_sniffs():
    """Taggers bolt ID3v2 onto FLAC files: the decoder skips the tag
    (syncsafe size, optional footer) and decode_audio's sniffer
    routes the payload builtin; an ID3-prefixed NON-flac stays off
    the builtin path."""
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.flac import (
        parse_flac_metadata,
    )
    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import _is_flac

    vals = _sine16(16, 30)
    flac = _flac(8000, 1, 16, [
        (16, 0, lambda w: _sub_verbatim(w, vals, 16))])
    body = b"\x00" * 200                       # fake tag frames
    n = len(body)
    sync = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])
    tagged = b"ID3\x04\x00\x00" + sync + body + flac
    samples, rate = decode_flac(tagged)
    assert rate == 8000
    assert np.allclose(samples, np.array(vals) / 32768.0)
    assert parse_flac_metadata(tagged)["rate"] == 8000
    assert _is_flac(tagged) and _is_flac(flac)
    assert not _is_flac(b"ID3\x04\x00\x00" + sync + body + b"mp3!")
    # footer flag adds 10 more bytes
    tagged_f = (b"ID3\x04\x00\x10" + sync + body + b"\x00" * 10
                + flac)
    assert np.allclose(decode_flac(tagged_f)[0],
                       np.array(vals) / 32768.0)
