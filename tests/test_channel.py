"""Channel impairments and the physics each standard was designed around.

These are the system-level property tests: NIIR's reference normalization
cancels differential gain/phase (SURVEY.md A.5); PAL's delay-line averages
phase errors into a small saturation loss while plain NTSC takes a hue hit;
SECAM's FM is amplitude-invariant.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L, N = 48, TEST_SAMPLES


@pytest.fixture(scope="module")
def img():
    return smooth_scene(L, N, seed=9).astype(np.float32)[None]


def _run(name, decoder, img, **impairments):
    plan = get_plan(name)
    enc, dec, _ = make_pipeline(plan, decoder)
    comp = enc(img)
    comp = impair(plan, comp, **impairments)
    return psnr(np.asarray(dec(comp)), img)


def test_clean_channel_is_identity(img):
    plan = get_plan("ntsc")
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(img)
    np.testing.assert_array_equal(np.asarray(impair(plan, comp)), np.asarray(comp))


def test_niir_cancels_differential_gain_and_phase(img):
    """The entire point of NIIR/SECAM-IV (A.5): the reference line makes the
    decoder immune to chroma gain and phase errors."""
    # positive control: the channel really did distort the composite
    plan = get_plan("niir")
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(img))
    bad = impair(plan, comp, chroma_gain=0.7, chroma_phase_deg=25.0)
    assert np.abs(np.asarray(bad) - np.asarray(comp)).max() > 0.01

    clean = _run("niir", "notch", img)
    hit = _run("niir", "notch", img, chroma_gain=0.7, chroma_phase_deg=25.0)
    assert clean - hit < 1.5, (clean, hit)


def test_ntsc_suffers_phase_error_more_than_pal_delayline(img):
    """Differential phase = hue shift on NTSC; PAL-D averages it away."""
    ntsc_clean = _run("ntsc", "notch", img)
    ntsc_hit = _run("ntsc", "notch", img, chroma_phase_deg=25.0)
    pal_clean = _run("pal", "delayline", img)
    pal_hit = _run("pal", "delayline", img, chroma_phase_deg=25.0)
    # measured: NTSC loses ~12.8 dB at 25 deg, PAL-D only ~2.1 dB
    assert ntsc_clean - ntsc_hit > 8.0, (ntsc_clean, ntsc_hit)
    assert pal_clean - pal_hit < 3.0, (pal_clean, pal_hit)


def test_secam_fm_is_amplitude_invariant(img):
    """The limiter/discriminator ignores carrier amplitude (A.4)."""
    # positive control: the impairment must actually alter the composite —
    # otherwise a band-edge regression in impair() passes this vacuously
    plan = get_plan("secam")
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(img))
    bad = impair(plan, comp, chroma_gain=0.6)
    assert np.abs(np.asarray(bad) - np.asarray(comp)).max() > 0.01

    clean = _run("secam", "notch", img)
    hit = _run("secam", "notch", img, chroma_gain=0.6)
    assert clean - hit < 1.0, (clean, hit)


def test_qam_gain_error_shifts_saturation(img):
    """Plain QAM has no defense against differential gain."""
    clean = _run("ntsc", "notch", img)
    hit = _run("ntsc", "notch", img, chroma_gain=0.6)
    assert clean - hit > 2.0, (clean, hit)


def test_noise_degrades_gracefully(img):
    key = jax.random.PRNGKey(0)
    clean = _run("pal", "delayline", img)
    noisy = _run("pal", "delayline", img, noise_sigma=0.02, key=key)
    assert 3.0 < clean - noisy < 25.0, (clean, noisy)


def _tone(plan, f_hz, width=60.0):
    n = TEST_SAMPLES
    m = np.arange(n)
    env = np.exp(-0.5 * ((m - n / 2) / width) ** 2)
    return (env * np.sin(2 * np.pi * f_hz / plan.fs * m)).astype(np.float32)


def test_vhs_playback_signature(img):
    """Color-under model: PSNR drops but stays watchable; chroma keeps
    only ~+-0.4 MHz around fsc; low-frequency luma passes."""
    from color_modem_tpu.frame.channel import vhs_playback

    plan = get_plan("ntsc")
    enc, dec, _ = make_pipeline(plan, "comb3")
    comp = enc(jnp.asarray(img))
    tape = vhs_playback(plan, comp)
    clean = psnr(np.asarray(dec(comp)), img)
    vhs = psnr(np.asarray(dec(tape)), img)
    assert 2.0 < clean - vhs < 25.0, (clean, vhs)

    # deterministic transfer check on isolated tone bursts
    fsc = plan.cfg.chroma.fsc

    def gain(f):
        x = jnp.asarray(_tone(plan, f))[None, None]
        y = np.asarray(vhs_playback(plan, x, chroma_delay_us=0.0))[0, 0]
        return float(np.abs(y).max() / np.abs(_tone(plan, f)).max())

    assert gain(fsc + 0.15e6) > 0.5          # in-band chroma survives
    assert gain(fsc + 0.9e6) < 0.2           # narrowed chroma crushed
    assert gain(1.0e6) > 0.8                 # low-frequency luma passes


def test_vhs_chroma_delay_moves_envelope_not_hue():
    from color_modem_tpu.frame.channel import vhs_playback

    plan = get_plan("ntsc")
    n = TEST_SAMPLES
    tone = _tone(plan, plan.cfg.chroma.fsc, width=40.0)
    comp = jnp.asarray(tone)[None, None]
    d_us = 0.4
    out = np.asarray(vhs_playback(plan, comp, chroma_delay_us=d_us))[0, 0]
    ref = np.asarray(vhs_playback(plan, comp, chroma_delay_us=0.0))[0, 0]
    d = int(round(d_us * 1e-6 * plan.fs))

    def centroid(x):
        p = x.astype(np.float64) ** 2
        return float((np.arange(n) * p).sum() / p.sum())

    # envelope delayed by ~d samples
    assert abs(centroid(out) - centroid(ref) - d) < 1.5, (
        centroid(out), centroid(ref), d)
    # carrier phase re-locked: at the SAME absolute positions the carrier
    # is unrotated (out(m) = cos(wm) env(m-d)), so zero-lag correlation is
    # high — while at lag d it shows the raw delay's ~117 deg rotation
    # (cos 117 = -0.45), proving the envelope moved but the phase didn't
    corr0 = float((out * ref).sum()) / float(
        np.sqrt((out ** 2).sum() * (ref ** 2).sum())
    )
    corrd = float((out[d:] * ref[:-d]).sum()) / float(
        np.sqrt((out[d:] ** 2).sum() * (ref[:-d] ** 2).sum())
    )
    assert corr0 > 0.9, corr0
    assert corrd < 0.0, corrd  # the raw-delay angle, had phase moved too


def test_noise_requires_key(img):
    plan = get_plan("ntsc")
    enc, _, _ = make_pipeline(plan, "notch")
    with pytest.raises(ValueError, match="PRNG key"):
        impair(plan, enc(img), noise_sigma=0.1)


def test_differential_phase_is_why_pal_exists(img):
    """Luma-tracking phase error: NTSC hue follows brightness; the PAL
    V-switch + delay-line averages it into mild saturation loss."""
    ntsc_clean = _run("ntsc", "notch", img)
    ntsc_hit = _run("ntsc", "notch", img, diff_phase_deg=20.0)
    pal_clean = _run("pal", "delayline", img)
    pal_hit = _run("pal", "delayline", img, diff_phase_deg=20.0)
    assert ntsc_clean - ntsc_hit > 5.0, (ntsc_clean, ntsc_hit)
    assert pal_clean - pal_hit < 2.0, (pal_clean, pal_hit)
    # and the NTSC hit grows with luma dependence being real, not static:
    # a gray-ish dark scene must be hurt less than the bright fixture
    dark = (0.25 * img).astype(np.float32)
    d_clean = _run("ntsc", "notch", dark)
    d_hit = _run("ntsc", "notch", dark, diff_phase_deg=20.0)
    assert (d_clean - d_hit) < 0.5 * (ntsc_clean - ntsc_hit), (
        d_clean, d_hit, ntsc_clean, ntsc_hit)


def test_differential_gain_tracks_luma(img):
    clean = _run("ntsc", "notch", img)
    hit = _run("ntsc", "notch", img, diff_gain=-0.4)
    assert clean - hit > 1.0, (clean, hit)
    # SECAM's FM does not care about amplitude, differential or not
    s_clean = _run("secam", "notch", img)
    s_hit = _run("secam", "notch", img, diff_gain=-0.4)
    assert s_clean - s_hit < 1.0, (s_clean, s_hit)


def test_ghost_is_exact_stream_delay():
    """An impulse ghosts d samples later ON THE LINE STREAM — a ghost
    delayed past the line end spills into the next line."""
    plan = get_plan("ntsc")
    comp = jnp.zeros((1, 4, N), jnp.float32).at[0, 2, N - 3].set(1.0)
    delay_us = 10.0 / plan.fs * 1e6  # exactly 10 samples
    out = np.asarray(
        impair(plan, comp, ghost_delay_us=delay_us, ghost_gain=-0.4)
    )
    expect = np.zeros((1, 4, N), np.float32)
    expect[0, 2, N - 3] = 1.0
    expect[0, 3, 7] = -0.4  # (N-3) + 10 == N + 7 -> next line, sample 7
    np.testing.assert_allclose(out, expect, atol=1e-7)


def test_ghost_degrades_roundtrip_but_stays_finite(img):
    clean = _run("ntsc", "comb3", img)
    hit = _run("ntsc", "comb3", img, ghost_delay_us=1.0, ghost_gain=0.25)
    assert np.isfinite(hit)
    assert 2.0 < clean - hit < 30.0, (clean, hit)


def test_ghost_validation():
    plan = get_plan("ntsc")
    comp = jnp.zeros((2, N), jnp.float32)
    with pytest.raises(ValueError, match="ghost_delay_us"):
        impair(plan, comp, ghost_gain=0.3)
    with pytest.raises(ValueError, match="exceeds"):
        impair(plan, comp, ghost_gain=0.3, ghost_delay_us=1e6)
