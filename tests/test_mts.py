"""MTS/BTSC-style stereo sound (frame/mts.py — beyond-reference).

Measured on CPU (2026-08-17): baseband L/R round trip 89-93 dB, stereo
separation 93 dB, through the full intercarrier FM channel 60-69 dB,
pilot level 0.0976 (PILOT_AMP = 0.1).  Thresholds sit well under the
measured values (suite convention).
"""

import numpy as np

import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame.mts import PILOT_AMP, mts_decode, mts_encode
from color_modem_tpu.frame.rf import (
    make_rf_plan,
    rf_demodulate_sound,
    rf_modulate,
)

T_LINES = 64
CROP = 16384  # channel-lowpass transient


def _tones(plan):
    t = np.arange(T_LINES * plan.n_samples) / plan.fs
    left = (0.7 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)[None]
    right = (0.5 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)[None]
    return left, right


def _snr(got, want):
    e = np.asarray(got)[:, CROP:-CROP] - want[:, CROP:-CROP]
    return 10 * np.log10(np.mean(want[:, CROP:-CROP] ** 2) / np.mean(e**2))


def test_mts_baseband_roundtrip_and_separation():
    plan = get_plan("ntsc")
    left, right = _tones(plan)
    l2, r2, pilot = mts_decode(plan, mts_encode(plan, left, right))
    assert _snr(l2, left) >= 80.0
    assert _snr(r2, right) >= 80.0
    assert np.allclose(np.asarray(pilot), PILOT_AMP, atol=0.01)
    # stereo separation: left-only program must stay out of the right ear
    l3, r3, _ = mts_decode(plan, mts_encode(plan, left, np.zeros_like(left)))
    sep = 10 * np.log10(
        np.mean(np.asarray(l3)[:, CROP:-CROP] ** 2)
        / np.mean(np.asarray(r3)[:, CROP:-CROP] ** 2)
    )
    assert sep >= 60.0, f"stereo separation {sep:.1f} dB"


def test_mts_through_rf_sound_channel():
    """The full broadcast chain: MTS multiplex -> intercarrier FM ->
    discriminator -> MTS demux.  Needs the wider audio_bw=50e3 plan (the
    difference sidebands reach ~45 kHz)."""
    plan = get_plan("ntsc")
    left, right = _tones(plan)
    a = mts_encode(plan, left, right)
    rfp = make_rf_plan(plan, audio_bw=50e3)
    comp = np.zeros((1, T_LINES, plan.n_samples), np.float32)
    rf = rf_modulate(rfp, jnp.asarray(comp), 0, a)
    l2, r2, pilot = mts_decode(plan, rf_demodulate_sound(rfp, rf, 0))
    assert _snr(l2, left) >= 50.0
    assert _snr(r2, right) >= 50.0
    assert np.allclose(np.asarray(pilot), PILOT_AMP, atol=0.02)


def test_mts_pilot_distinguishes_mono():
    """Plain mono audio carries no pilot — the stereo presence check reads
    ~0, the authentic receiver decision input."""
    plan = get_plan("ntsc")
    t = np.arange(T_LINES * plan.n_samples) / plan.fs
    mono = (0.7 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)[None]
    _, _, pilot = mts_decode(plan, mono)
    assert abs(float(pilot[0])) < 0.01
    # and a mono signal decodes (near-)identically into both ears: the
    # difference channel carries only the sum's stopband leakage
    l2, r2, _ = mts_decode(plan, mono)
    np.testing.assert_allclose(
        np.asarray(l2)[:, CROP:-CROP], np.asarray(r2)[:, CROP:-CROP],
        atol=1e-3, rtol=0,
    )