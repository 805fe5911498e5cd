"""Builtin FLAC decoder (r11) — the lossless-audio member of the
codec family (PPM/BMP/PGM/PNG/GIF/JPEG images, WAV audio): AV rigs
archive microphone/telemetry tracks losslessly, and web corpora carry
FLAC alongside WAV, but until now every compressed audio format
required the optional PyAV seam (multimodal._pyav_decode_audio).
This module decodes the FLAC format (public spec, RFC 9639 /
xiph.org) with stdlib + numpy only:

- STREAMINFO metadata (other blocks skipped by length),
- frames: sync + CRC-8-checked headers, UTF-8-coded frame/sample
  numbers, all block-size/sample-rate/sample-size code forms,
- subframes: CONSTANT, VERBATIM, FIXED (orders 0-4), LPC (any order,
  signed quantized coefficients + shift), wasted-bits unpacking,
- residuals: 4-bit and 5-bit Rice partitions (zigzag), escape
  partitions (raw n-bit residuals),
- stereo decorrelation: left/side, right/side, mid/side (side channel
  carries the +1 bit), and 1..8 independent channels,
- frame CRC-16 verification (poly 0x8005), loud on mismatch.

Output contract matches the builtin WAV path
(:func:`~.multimodal._decode_wav`): float32 in [-1, 1],
channel-interleaved, plus the sample rate. Totality: hostile bytes
raise ``ValueError`` — never hang, never crash the interpreter.
"""

from __future__ import annotations

import numpy as np

_SYNC = 0b11111111111110

_RATES = (0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
          32000, 44100, 48000, 96000)
_SIZES = (0, 8, 12, 0, 16, 20, 24, 32)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000
                   else crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader (FLAC packs big-endian)."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.d = data
        self.pos = pos_bytes * 8

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.d) * 8:
            raise ValueError("FLAC: bitstream ended mid-field")
        out = 0
        pos = self.pos
        while n:
            byte = self.d[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            out = (out << take) | ((byte >> (avail - take))
                                   & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("FLAC: runaway unary code")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_number(r: _Bits, max_bytes: int) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    ones = 0
    while ones < 8 and (b0 << ones) & 0x80:
        ones += 1
    if ones < 2 or ones > max_bytes:
        raise ValueError(f"FLAC: bad UTF-8 coded number lead byte "
                         f"0x{b0:02x}")
    v = b0 & (0x7F >> ones)
    for _ in range(ones - 1):
        nxt = r.read(8)
        if nxt & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8 continuation byte")
        v = (v << 6) | (nxt & 0x3F)
    return v


def _strip_id3(payload: bytes) -> bytes:
    """FLAC files in the wild frequently carry an ID3v2 tag ahead of
    the stream (taggers bolt it on even though the spec keeps
    metadata in FLAC blocks): 10-byte header with a syncsafe 28-bit
    size, optional 10-byte footer (flag 0x10). Returns the payload
    from the ``fLaC`` magic on; non-ID3 payloads pass through."""
    if payload[:3] != b"ID3":
        return payload
    if len(payload) < 10:
        raise ValueError("FLAC: truncated ID3v2 header")
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("FLAC: ID3v2 size is not syncsafe")
    size = (payload[6] << 21 | payload[7] << 14
            | payload[8] << 7 | payload[9])
    return payload[10 + size + (10 if payload[5] & 0x10 else 0):]


def _parse_streaminfo(payload: bytes) -> tuple[dict, int]:
    """(streaminfo, offset of the first frame)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata block header")
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if len(body) != length:
            raise ValueError("FLAC: truncated metadata block")
        if btype == 0:
            if length != 34:
                raise ValueError("FLAC: STREAMINFO must be 34 bytes")
            r = _Bits(body)
            info = {
                "min_block": r.read(16), "max_block": r.read(16),
                "min_frame": r.read(24), "max_frame": r.read(24),
                "rate": r.read(20),
                "channels": r.read(3) + 1,
                "bps": r.read(5) + 1,
                "total_samples": r.read(36),
            }
        elif btype == 127:
            raise ValueError("FLAC: invalid metadata block type 127")
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO block")
    if info["rate"] == 0:
        raise ValueError("FLAC: STREAMINFO sample rate is 0")
    return info, pos


def parse_flac_metadata(payload: bytes) -> dict:
    """STREAMINFO + Vorbis-comment tags without decoding any audio —
    the metadata face a corpus table wants (sample rate, channels,
    bit depth, duration, artist/title/... tags). Returns ``{"rate",
    "channels", "bps", "total_samples", "duration_s", "vendor",
    "comments": {KEY: value}}`` (comment keys upper-cased per the
    Vorbis convention; the last occurrence of a repeated key wins).
    Walks metadata blocks only; loud on malformed headers; a leading
    ID3v2 tag (common in the wild) is skipped."""
    payload = _strip_id3(payload)
    info, _ = _parse_streaminfo(payload)
    out = {k: info[k] for k in ("rate", "channels", "bps",
                                "total_samples")}
    out["duration_s"] = (info["total_samples"] / info["rate"]
                         if info["total_samples"] else None)
    out["vendor"] = None
    out["comments"] = {}
    pos = 4
    while True:
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if btype == 4:                      # VORBIS_COMMENT (LE!)
            o = 0
            vn = int.from_bytes(body[o:o + 4], "little")
            o += 4
            out["vendor"] = body[o:o + vn].decode("utf-8", "replace")
            o += vn
            n = int.from_bytes(body[o:o + 4], "little")
            o += 4
            for _ in range(n):
                ln = int.from_bytes(body[o:o + 4], "little")
                o += 4
                item = body[o:o + ln].decode("utf-8", "replace")
                o += ln
                if o > len(body):
                    raise ValueError(
                        "FLAC: truncated Vorbis comment block")
                k, _, v = item.partition("=")
                out["comments"][k.upper()] = v
        pos += 4 + length
        if last:
            break
    return out


def _rice_partition(r: _Bits, n: int, rice2: bool) -> list[int]:
    param = r.read(5 if rice2 else 4)
    escape = 31 if rice2 else 15
    out = []
    if param == escape:
        bits = r.read(5)
        for _ in range(n):
            out.append(r.signed(bits) if bits else 0)
        return out
    for _ in range(n):
        q = r.unary()
        v = (q << param) | (r.read(param) if param else 0)
        out.append((v >> 1) ^ -(v & 1))          # zigzag
    return out


def _residual(r: _Bits, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    po = r.read(4)
    parts = 1 << po
    if block_size % parts or block_size >> po <= order and parts > 1:
        # spec: block_size must divide evenly; first partition must
        # keep a positive sample count after the warmup
        raise ValueError("FLAC: invalid residual partition order")
    out: list[int] = []
    for p in range(parts):
        n = (block_size >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: partition smaller than predictor "
                             "order")
        out += _rice_partition(r, n, rice2=method == 1)
    return out


_FIXED = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _subframe(r: _Bits, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("FLAC: subframe header padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if stype == 0:                                   # CONSTANT
        v = r.signed(eff)
        out = [v] * block_size
    elif stype == 1:                                 # VERBATIM
        out = [r.signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:                           # FIXED order 0-4
        order = stype - 8
        out = [r.signed(eff) for _ in range(order)]
        coefs = _FIXED[order]
        res = _residual(r, block_size, order)
        for e in res:
            v = e
            for j, c in enumerate(coefs):
                v += c * out[-1 - j]
            out.append(v)
    elif stype >= 32:                                # LPC
        order = (stype & 31) + 1
        out = [r.signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision code 15")
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [r.signed(precision) for _ in range(order)]
        res = _residual(r, block_size, order)
        for e in res:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[-1 - j]
            out.append(e + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to ``(samples, sample_rate)`` — float32
    in [-1, 1], channel-interleaved: the builtin WAV contract, so
    :func:`~.multimodal.decode_audio` serves FLAC with zero
    dependencies. Verifies frame header CRC-8 and frame CRC-16 and
    raises on mismatch (a silent bad frame is worse than an error).
    A leading ID3v2 tag (common in the wild) is skipped."""
    payload = _strip_id3(payload)
    info, pos = _parse_streaminfo(payload)
    return _decode_frames(payload, info, pos)


def _decode_frames(payload: bytes, info: dict,
                   pos: int) -> tuple[np.ndarray, int]:
    chans = info["channels"]
    channels_out: list[list[int]] = [[] for _ in range(chans)]
    rate = info["rate"]
    while pos < len(payload):
        r = _Bits(payload, pos)
        if r.read(14) != _SYNC:
            raise ValueError(
                f"FLAC: lost frame sync at byte {pos}")
        if r.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        r.read(1)                          # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        _utf8_number(r, 7)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            frate = info["rate"]
        elif sr_code <= 11:
            frate = _RATES[sr_code]
        elif sr_code == 12:
            frate = r.read(8) * 1000
        elif sr_code == 13:
            frate = r.read(16)
        elif sr_code == 14:
            frate = r.read(16) * 10
        else:
            raise ValueError("FLAC: invalid sample rate code 15")
        rate = frate
        if ch_code < 8:
            n_ch, mode = ch_code + 1, "indep"
        elif ch_code == 8:
            n_ch, mode = 2, "left_side"
        elif ch_code == 9:
            n_ch, mode = 2, "right_side"
        elif ch_code == 10:
            n_ch, mode = 2, "mid_side"
        else:
            raise ValueError(
                f"FLAC: reserved channel assignment {ch_code}")
        if n_ch != chans:
            raise ValueError(
                f"FLAC: frame carries {n_ch} channels, STREAMINFO "
                f"says {chans}")
        bps = info["bps"] if size_code == 0 else _SIZES[size_code]
        if bps == 0:
            raise ValueError(
                f"FLAC: reserved sample size code {size_code}")
        r.align()
        hdr_end = r.pos >> 3
        if _crc8(payload[pos:hdr_end]) != r.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        subs = []
        for c in range(n_ch):
            extra = 1 if (
                (mode == "left_side" and c == 1)
                or (mode == "right_side" and c == 0)
                or (mode == "mid_side" and c == 1)) else 0
            subs.append(_subframe(r, block_size, bps + extra))
        r.align()
        frame_end = r.pos >> 3
        if _crc16(payload[pos:frame_end]) != r.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = r.pos >> 3
        if mode == "left_side":
            left, side = subs
            subs = [left, [a - b for a, b in zip(left, side)]]
        elif mode == "right_side":
            side, right = subs
            subs = [[a + b for a, b in zip(side, right)], right]
        elif mode == "mid_side":
            mid, side = subs
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            subs = [left, right]
        for c in range(chans):
            channels_out[c] += subs[c]
    n = len(channels_out[0])
    if n == 0:
        raise ValueError("FLAC: stream carries no audio frames")
    scale = float(1 << (info["bps"] - 1))
    arr = np.empty(n * chans, dtype=np.float32)
    for c, ch in enumerate(channels_out):
        if len(ch) != n:
            raise ValueError("FLAC: channels decoded unequal lengths")
        arr[c::chans] = np.asarray(ch, dtype=np.float64) / scale
    return arr, rate
