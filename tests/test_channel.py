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


def test_noise_requires_key(img):
    plan = get_plan("ntsc")
    enc, _, _ = make_pipeline(plan, "notch")
    with pytest.raises(ValueError, match="PRNG key"):
        impair(plan, enc(img), noise_sigma=0.1)
