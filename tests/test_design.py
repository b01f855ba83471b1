"""Unit tests: FIR designs vs their spec responses (SURVEY.md §4.3 'Unit')."""

import numpy as np
import pytest

from color_modem_tpu.dsp import design

FS = 13.5e6


def test_lowpass_response():
    taps = design.lowpass_taps(FS, 1.3e6)
    f = np.array([0.0, 0.3e6, 0.8e6, 2.5e6, 4.0e6, 6.0e6])
    h = np.abs(design.freqz(taps, FS, f))
    assert h[0] == pytest.approx(1.0, abs=1e-9)       # exact unity DC
    assert np.all(np.abs(h[1:3] - 1.0) < 0.02)        # passband flat
    assert np.all(h[3:] < 0.01)                       # stopband < -40 dB


def test_lowpass_is_zero_phase_after_centering():
    taps = design.lowpass_taps(FS, 1.3e6)
    f = np.linspace(0, 1.0e6, 16)
    h = design.freqz(taps, FS, f)
    assert np.max(np.abs(h.imag)) < 1e-9              # symmetric -> real


def test_bandpass_response():
    fsc = 3.579545e6
    taps = design.bandpass_taps(FS, fsc - 1.3e6, fsc + 1.3e6)
    f = np.array([fsc, fsc - 0.5e6, fsc + 0.5e6, 0.2e6, 6.5e6])
    h = np.abs(design.freqz(taps, FS, f))
    assert h[0] == pytest.approx(1.0, abs=1e-6)       # unity at center
    assert np.all(np.abs(h[1:3] - 1.0) < 0.05)
    assert np.all(h[3:] < 0.01)


def test_preemph_matches_spec_in_band():
    f1 = 85e3
    taps = design.freq_sampled_taps(
        FS, lambda f: design.secam_preemph_response(f, f1), 257
    )
    f = np.linspace(10e3, 1.5e6, 32)
    want = design.secam_preemph_response(f, f1)
    got = design.freqz(taps, FS, f)
    assert np.max(np.abs(got - want)) < 0.02
    # HF asymptote is x3 (A.4)
    hf = np.abs(design.secam_preemph_response(np.array([50e6]), f1))
    assert hf[0] == pytest.approx(3.0, rel=1e-3)


def test_deemph_inverts_preemph():
    f1 = 85e3
    pre = design.freq_sampled_taps(
        FS, lambda f: design.secam_preemph_response(f, f1), 257
    )
    de = design.freq_sampled_taps(
        FS, lambda f: design.secam_deemph_response(f, f1), 257
    )
    f = np.linspace(10e3, 1.3e6, 32)
    prod = design.freqz(pre, FS, f) * design.freqz(de, FS, f)
    assert np.max(np.abs(prod - 1.0)) < 0.03


def test_cloche_anticloche_are_inverse_shapes():
    f0, m0, kn, kd = 4.286e6, 0.115, 16.0, 1.26
    f = np.linspace(f0 - 1.0e6, f0 + 1.0e6, 64)
    g = design.secam_anticloche_response(f, f0, m0, kn, kd)
    c = design.secam_cloche_response(f, f0, m0, kn, kd)
    assert np.allclose(g * c, m0, atol=1e-12)         # G * H = M0 exactly
    # gain at f0 is M0 / 1 respectively
    g0 = design.secam_anticloche_response(np.array([f0]), f0, m0, kn, kd)
    assert abs(g0[0]) == pytest.approx(m0, rel=1e-9)


def test_differentiator_slope():
    taps = design.differentiator_taps(FS, 31)
    f = np.array([0.2e6, 0.5e6, 1.0e6, 2.0e6])
    got = design.freqz(taps, FS, f)
    want = 1j * 2 * np.pi * f / FS
    assert np.max(np.abs(got - want) / np.abs(want)) < 0.01


def test_even_ntaps_rejected():
    with pytest.raises(ValueError):
        design.lowpass_taps(FS, 1e6, 128)
