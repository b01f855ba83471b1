"""GCR channel estimation + equalization (frame/equalize.py).

The equalizer must (a) be ~identity on a clean channel, (b) undo the
channel module's linear impairments — multipath ghost, differential chroma
gain — well enough to recover most of the lost round-trip PSNR, and (c)
invert a known impulse response directly.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.equalize import (
    apply_equalizer,
    design_equalizer,
    gcr_line,
)
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L, N = 48, TEST_SAMPLES


@pytest.fixture(scope="module")
def img():
    return smooth_scene(L, N, seed=13).astype(np.float32)[None]


def _gcr_through(plan, **impairments):
    """The reference line, sent through the same channel as the picture."""
    g = jnp.asarray(gcr_line(plan))[None, None, :]
    return impair(plan, g, **impairments)[0, 0]


def test_gcr_line_is_normalized():
    g = gcr_line(get_plan("ntsc"))
    assert g.shape == (N,) and g.dtype == np.float32
    assert g.min() >= 0.0 and g.max() <= 1.0
    # broadband: energy spread across the video band, not a single tone
    spec = np.abs(np.fft.rfft(g - g.mean()))
    band = spec[int(0.05 * N):int(0.45 * N)]
    assert band.min() > 0.05 * band.max()


def test_clean_channel_gives_identity_taps(img):
    plan = get_plan("ntsc")
    taps = np.asarray(design_equalizer(plan, jnp.asarray(gcr_line(plan))))
    half = len(taps) // 2
    assert abs(taps[half] - 1.0) < 0.02
    off = np.delete(taps, half)
    assert np.abs(off).max() < 0.02
    enc, _, _ = make_pipeline(plan, "comb3")
    comp = enc(jnp.asarray(img))
    eq = apply_equalizer(comp, jnp.asarray(taps))
    assert psnr(np.asarray(eq), np.asarray(comp)) > 45.0


def test_known_impulse_response_is_inverted():
    plan = get_plan("ntsc")
    d, g = 17, -0.35
    rx = _gcr_through(plan, ghost_delay_us=d / plan.fs * 1e6, ghost_gain=g)
    taps = design_equalizer(plan, rx)
    # drive an impulse through channel -> equalizer; residual must be tiny
    imp = jnp.zeros((1, 1, 4 * N), jnp.float32).at[0, 0, 2 * N].set(1.0)
    chan = imp + g * jnp.concatenate(
        [jnp.zeros((1, 1, d)), imp[..., :-d]], axis=-1
    )
    out = np.asarray(apply_equalizer(chan, taps))[0, 0]
    expect = np.zeros(4 * N, np.float32)
    expect[2 * N] = 1.0
    assert np.abs(out - expect).max() < 0.03, np.abs(out - expect).max()


@pytest.mark.parametrize("impairments", [
    {"ghost_delay_us": 1.2, "ghost_gain": 0.3},
    {"chroma_gain": 0.7},
], ids=["ghost", "chroma_gain"])
def test_equalizer_recovers_roundtrip(img, impairments):
    plan = get_plan("ntsc")
    enc, dec, _ = make_pipeline(plan, "comb3")
    rgb = jnp.asarray(img)
    comp = enc(rgb)
    clean = psnr(np.asarray(dec(comp)), img)
    bad_comp = impair(plan, comp, **impairments)
    bad = psnr(np.asarray(dec(bad_comp)), img)
    taps = design_equalizer(plan, _gcr_through(plan, **impairments))
    fixed = psnr(np.asarray(dec(apply_equalizer(bad_comp, taps))), img)
    assert clean - bad > 3.0, (clean, bad)          # the hit was real
    assert clean - fixed < 1.5, (clean, bad, fixed)  # and is undone


def test_even_ntaps_rejected():
    plan = get_plan("ntsc")
    with pytest.raises(ValueError, match="odd"):
        design_equalizer(plan, jnp.asarray(gcr_line(plan)), ntaps=64)


def test_long_delay_ghost_needs_record_and_longer_taps(img):
    """A 10 us ghost (~135 samples): the default 129-tap window cannot
    reach it, and a single-line estimate is edge-biased — the cyclic
    gcr_record + ntaps_for_delay pair cancels it."""
    from color_modem_tpu.frame.equalize import gcr_record, ntaps_for_delay

    plan = get_plan("ntsc")
    enc, dec, _ = make_pipeline(plan, "comb3")
    rgb = jnp.asarray(img)
    comp = enc(rgb)
    clean = psnr(np.asarray(dec(comp)), img)
    imp = {"ghost_delay_us": 10.0, "ghost_gain": 0.25}
    bad_comp = impair(plan, comp, **imp)
    rec = impair(plan, jnp.asarray(gcr_record(plan))[None], **imp)[0]
    short = psnr(np.asarray(dec(apply_equalizer(
        bad_comp, design_equalizer(plan, rec)))), img)
    n = ntaps_for_delay(plan, imp["ghost_delay_us"])
    assert n % 2 == 1 and (n - 1) // 2 >= 3 * 135
    fixed = psnr(np.asarray(dec(apply_equalizer(
        bad_comp, design_equalizer(plan, rec, ntaps=n)))), img)
    # measured 18.1 -> 41.4 dB (clean 43.8); the residual is the block's
    # leading transient — the stream's first d samples never saw the
    # ghost's predecessor, so no equalizer can correct them
    assert clean - fixed < 3.0, (clean, short, fixed)
    assert fixed - short > 15.0, (short, fixed)


def test_cli_equalize_on_clean_channel(tmp_path):
    """Regression: --equalize without any impairment flag must not crash
    (impair was once imported only inside the impairments branch)."""
    from color_modem_tpu.cli import main

    out = str(tmp_path / "o.png")
    assert main(["roundtrip", "--standard", "ntsc", "--decoder", "notch",
                 "--demo", "--lines", "32", "--equalize",
                 "--output", out]) == 0
    assert os.path.exists(out)
