"""dsp/stream.py: overlap-save stream convolution vs naive references.

Every primitive must match the direct 'same' convolution (np.convolve)
to float32 tolerance — the same contract as dsp/apply.fir_same_fft — so
the composed RF/satellite filter paths built on them (frame/rf.py) are
exact restructurings, not approximations.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from color_modem_tpu.dsp.stream import (
    conv_complex_stream,
    conv_decim_stream,
    fir_decim_stream,
    fir_stream,
    pad_taps_center,
    upconv_stream,
    upsample_fir_stream,
)

RNG = np.random.default_rng(7)
R = 4


def _same(x, h):
    lo = (len(h) - 1) // 2
    return np.convolve(x, h)[lo : lo + len(x)]


def _batch_same(x, h):
    return np.stack([_same(row, h) for row in x])


@pytest.fixture(scope="module")
def ctaps():
    t = RNG.standard_normal(1033) + 1j * RNG.standard_normal(1033)
    return pad_taps_center(t, 2 * R)


def test_fir_stream_matches_direct_blocked_path():
    # long enough to force the overlap-save path (> 2 * nblk)
    x = RNG.standard_normal((2, 90_000)).astype(np.float32)
    h = RNG.standard_normal(513)
    got = np.asarray(fir_stream(jnp.asarray(x), h))
    ref = _batch_same(x, h)
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


def test_fir_stream_short_falls_back():
    x = RNG.standard_normal((2, 3_000)).astype(np.float32)
    h = RNG.standard_normal(129)
    got = np.asarray(fir_stream(jnp.asarray(x), h))
    np.testing.assert_allclose(
        got, _batch_same(x, h), atol=2e-4 * np.abs(x).max()
    )


def test_upconv_stream_matches_stuff_then_conv(ctaps):
    x = RNG.standard_normal((2, 30_000)).astype(np.float32)
    got = np.asarray(upconv_stream(jnp.asarray(x), ctaps, R))
    stuffed = np.zeros((2, x.shape[1] * R))
    stuffed[:, ::R] = x
    ref = _batch_same(stuffed, ctaps)
    np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(ref).max())


def test_conv_decim_stream_matches_conv_then_decimate(ctaps):
    x = RNG.standard_normal((2, 120_000)).astype(np.float32)
    got = np.asarray(conv_decim_stream(jnp.asarray(x), ctaps, R))
    ref = _batch_same(x, ctaps)[:, ::R]
    np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(ref).max())


def test_conv_decim_stream_r1(ctaps):
    """r=1 (no rate change) must behave as a plain complex 'same' filter —
    it used to hit the fold's Nyquist-straddle guard at trace time
    (round-4 advisor finding)."""
    x = RNG.standard_normal((2, 90_000)).astype(np.float32)
    got = np.asarray(conv_decim_stream(jnp.asarray(x), ctaps, 1))
    ref = _batch_same(x, ctaps)
    np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(ref).max())
    # and fir_decim's r=1 half-spectrum path
    h = pad_taps_center(RNG.standard_normal(517), 2)
    got_r = np.asarray(fir_decim_stream(jnp.asarray(x), h, 1))
    np.testing.assert_allclose(
        got_r, _batch_same(x, h), atol=3e-4 * np.abs(x).max()
    )


def test_conv_complex_stream_matches_direct(ctaps):
    x = RNG.standard_normal((2, 90_000)).astype(np.float32)
    got = np.asarray(conv_complex_stream(jnp.asarray(x), ctaps))
    ref = _batch_same(x, ctaps)
    np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(ref).max())


def test_upsample_fir_stream_matches_stuff_then_conv():
    h = pad_taps_center(RNG.standard_normal(517), 2 * R)
    x = RNG.standard_normal((2, 30_000)).astype(np.float32)
    got = np.asarray(upsample_fir_stream(jnp.asarray(x), h, R))
    stuffed = np.zeros((2, x.shape[1] * R))
    stuffed[:, ::R] = x
    ref = _batch_same(stuffed, h)
    np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(ref).max())


def test_fir_decim_stream_matches_conv_then_decimate():
    h = pad_taps_center(RNG.standard_normal(517), 2 * R)
    x = RNG.standard_normal((2, 120_000)).astype(np.float32)
    got = np.asarray(fir_decim_stream(jnp.asarray(x), h, R))
    ref = _batch_same(x, h)[:, ::R]
    np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(ref).max())


def test_pad_taps_center_keeps_center():
    h = RNG.standard_normal(515)
    hp = pad_taps_center(h, 8)
    assert (len(hp) - 1) % 8 == 0 and len(hp) % 2 == 1
    x = RNG.standard_normal(4_000)
    np.testing.assert_allclose(_same(x, hp), _same(x, h), atol=1e-12)


def test_misaligned_taps_rejected(ctaps):
    with pytest.raises(ValueError, match="2r = 8 must divide"):
        upconv_stream(jnp.zeros((1, 256)), np.ones(1031), 4)
    with pytest.raises(ValueError, match="odd"):
        fir_stream(jnp.zeros((1, 256)), np.ones(10))
