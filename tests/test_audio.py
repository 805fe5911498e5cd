"""Audio conditioning (r12): polyphase resample + mixdown over the
decode_audio output contract. No scipy in this container, so the
oracles are analytic — a pure tone resampled to a new rate must equal
the same tone synthesized AT that rate (interior samples, filter
transient excluded), DC must pass at unit gain, and the identity path
must be bit-exact."""

from __future__ import annotations

import numpy as np
import pytest

from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.audio import (
    design_lowpass, mixdown_audio, resample_audio,
)
from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
    pack_media,
)


def _tone(freq, rate, n, phase=0.0):
    t = np.arange(n, dtype=np.float64)
    return (0.5 * np.sin(2 * np.pi * freq * t / rate + phase)) \
        .astype(np.float32)


def _audio_df(spark, samples, rate, channels=1, doc_id=1):
    df = spark.createDataFrame(
        [(doc_id, [float(v) for v in samples])],
        "doc_id long, samples array<float>")
    return pack_media(df.selectExpr(
        "doc_id", "cast(null as binary) as payload", "samples"),
        "payload", fmt="audio/pcm", sample_rate=rate,
        channels=channels)


def _interior(y, margin):
    return np.asarray(y, dtype=np.float64)[margin:-margin]


def test_identity_passthrough_exact(spark):
    x = _tone(440, 16000, 500)
    df = _audio_df(spark, x, 16000)
    r = resample_audio(df, 16000).first()
    assert np.array_equal(np.asarray(r["samples_resampled"],
                                     dtype=np.float32), x)
    assert r["resampled_rate"] == 16000


@pytest.mark.parametrize("src,dst", [(8000, 16000), (16000, 8000),
                                     (6000, 4000), (4000, 6000)])
def test_tone_resample_matches_analytic(spark, src, dst):
    """A 400 Hz tone resampled src→dst equals the tone synthesized at
    dst (well below both Nyquists, so the low-pass is transparent)."""
    n = 2000
    x = _tone(400, src, n)
    r = resample_audio(_audio_df(spark, x, src), dst).first()
    y = np.asarray(r["samples_resampled"], dtype=np.float64)
    assert len(y) == -(-n * (dst // np.gcd(dst, src))
                       // (src // np.gcd(dst, src)))
    want = _tone(400, dst, len(y)).astype(np.float64)
    margin = 200                          # filter transient region
    err = np.abs(_interior(y, margin) - _interior(want, margin))
    assert err.max() < 5e-3
    assert r["resampled_rate"] == dst


def test_dc_gain_is_unity(spark):
    x = np.full(1000, 0.25, dtype=np.float32)
    r = resample_audio(_audio_df(spark, x, 8000), 12000).first()
    y = np.asarray(r["samples_resampled"], dtype=np.float64)
    # β=5.0 Kaiser passband ripple bounds the deviation (~1e-4 here)
    assert np.abs(_interior(y, 150) - 0.25).max() < 1e-3


def test_downsample_removes_above_new_nyquist(spark):
    """A 7 kHz tone at 16 kHz lands above the 4 kHz Nyquist of the
    8 kHz target: after resampling it must be attenuated to noise."""
    x = _tone(7000, 16000, 4000)
    r = resample_audio(_audio_df(spark, x, 16000), 8000).first()
    y = _interior(np.asarray(r["samples_resampled"]), 300)
    assert np.abs(y).max() < 0.02         # >28 dB down from 0.5


def test_multichannel_resample_interleaved(spark):
    """Stereo interleave: each channel resampled independently — the
    left channel carries a tone, the right silence, and they must not
    bleed."""
    n = 1500
    left = _tone(300, 8000, n)
    inter = np.zeros(2 * n, dtype=np.float32)
    inter[0::2] = left
    df = _audio_df(spark, inter, 8000, channels=2)
    r = resample_audio(df, 16000).first()
    y = np.asarray(r["samples_resampled"], dtype=np.float64)
    assert len(y) == 2 * 2 * n
    assert np.abs(y[1::2]).max() < 1e-9   # silence stays silence
    want = _tone(300, 16000, 2 * n).astype(np.float64)
    err = np.abs(_interior(y[0::2], 200) - _interior(want, 200))
    assert err.max() < 5e-3


def test_resample_errors_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.1]), (2, None)],
        "doc_id long, samples array<float>")
    # no media_meta column at all -> rate unknown -> loud
    with pytest.raises(Exception, match="source rate unknown"):
        resample_audio(df, 16000).collect()
    got = {r["doc_id"]: r for r in
           resample_audio(df, 16000, source_rate=8000).collect()}
    assert got[2]["samples_resampled"] is None
    assert got[2]["resampled_rate"] is None
    assert len(got[1]["samples_resampled"]) == 4
    with pytest.raises(ValueError, match="positive"):
        resample_audio(df, 0)
    # interleave mismatch
    bad = _audio_df(spark, np.zeros(7, np.float32), 8000, channels=2)
    with pytest.raises(Exception, match="divide into 2 channels"):
        resample_audio(bad, 16000).collect()


def test_mixdown_stereo_mean_exact(spark):
    inter = np.array([0.2, 0.4, -0.5, 0.1, 1.0, 0.0],
                     dtype=np.float32)
    df = _audio_df(spark, inter, 8000, channels=2)
    r = mixdown_audio(df).first()
    got = np.asarray(r["samples_mono"], dtype=np.float32)
    want = inter.reshape(-1, 2).mean(axis=1).astype(np.float32)
    assert np.array_equal(got, want)


def test_mixdown_mono_passthrough_and_errors(spark):
    x = _tone(100, 8000, 64)
    df = _audio_df(spark, x, 8000, channels=1)
    r = mixdown_audio(df).first()
    assert np.array_equal(np.asarray(r["samples_mono"],
                                     dtype=np.float32), x)
    df2 = spark.createDataFrame([(1, [0.0, 0.1, 0.2])],
                                "doc_id long, samples array<float>")
    with pytest.raises(Exception, match="channel count unknown"):
        mixdown_audio(df2).collect()
    with pytest.raises(Exception, match="do not divide"):
        mixdown_audio(df2, channels=2).collect()
    got = mixdown_audio(df2, channels=3).first()
    assert got["samples_mono"] == pytest.approx([0.1], abs=1e-7)


def test_kernel_design_properties():
    """The FIR itself: unit DC gain after the up-scale, symmetric
    (linear phase), and the expected resample_poly length."""
    for up, down in ((2, 1), (3, 2), (1, 2)):
        h = design_lowpass(up, down)
        assert len(h) == 2 * 10 * max(up, down) + 1
        assert h.sum() == pytest.approx(up, rel=1e-12)
        assert np.allclose(h, h[::-1])    # symmetric


def test_conditioning_composes_with_real_wav_decode(spark):
    """End to end: a real stereo PCM16 WAV → decode_audio → mixdown →
    resample — the full conditioning pipeline a speech corpus runs."""
    from tests.test_multimodal import _wav_bytes

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.multimodal import (
        decode_audio,
    )
    n = 800
    left = _tone(440, 16000, n)
    inter = np.zeros(2 * n, dtype=np.float32)
    inter[0::2] = left
    inter[1::2] = left                    # identical channels
    wav = _wav_bytes(inter, rate=16000)   # mono-declared bytes are
    # fine: decode_audio returns the interleaved stream as stored
    df = pack_media(
        spark.createDataFrame([(1, bytearray(wav))],
                              "doc_id long, payload binary"),
        "payload", fmt="audio/wav", sample_rate=16000, channels=2)
    dec = decode_audio(df, "payload")
    mono = mixdown_audio(dec)
    # after mixdown the media_meta still describes the ORIGINAL
    # 2-channel payload — override channels for the mono stream
    out = resample_audio(mono, 8000, samples_col="samples_mono",
                         source_rate=16000, channels=1).first()
    y = np.asarray(out["samples_resampled"], dtype=np.float64)
    assert len(y) == n // 2
    want = _tone(440, 8000, n // 2).astype(np.float64)
    err = np.abs(_interior(y, 150) - _interior(want, 150))
    assert err.max() < 6e-3


def test_polyphase_equals_upfirdn_reference():
    """The r13 true-polyphase _resample_1d must equal the textbook
    zero-stuff → full convolve → centered decimate construction
    bit-for-bit (it is the same math, reorganized to never build the
    len(x)·up intermediate)."""
    import math

    from aws_autonomous_driving_data_lake_ros_bag_scene_detection_pipeline_spark.operators.audio import (
        _resample_1d,
    )

    def upfirdn_ref(x, up, down, h):
        n_out = -(-len(x) * up // down)
        if not len(x):
            return np.zeros(0)
        x_up = np.zeros(len(x) * up)
        x_up[::up] = x
        y = np.convolve(x_up, h)
        delay = (len(h) - 1) // 2
        y = y[delay:delay + len(x) * up:down]
        if len(y) < n_out:
            y = np.concatenate([y, np.zeros(n_out - len(y))])
        return y[:n_out]

    rng = np.random.default_rng(3)
    for src, dst in [(44100, 16000), (8000, 16000), (22050, 16000),
                     (3, 7), (7, 3)]:
        g = math.gcd(src, dst)
        up, down = dst // g, src // g
        h = design_lowpass(up, down)
        for n in (0, 1, 2, 37, 500):
            x = rng.standard_normal(n)
            a = _resample_1d(x, up, down, h)
            b = upfirdn_ref(x, up, down, h)
            assert a.shape == b.shape
            assert np.allclose(a, b, atol=1e-12)
