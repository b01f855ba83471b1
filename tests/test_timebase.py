"""Time-base error + correction (frame/timebase.py).

Pins: the fractional shifter against integer rolls, the sync-slicer's
sub-sample accuracy against the known injected profile, and the system
property — a wobble that wrecks QAM decoding is undone by the TBC.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.pipeline import frame_line_index, make_pipeline
from color_modem_tpu.frame.raster import make_raster, strip_raster
from color_modem_tpu.frame.timebase import (
    fractional_shift,
    impair_timebase,
    measure_line_shift,
    tbc_correct,
    timebase_profile,
)
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L, N = 48, TEST_SAMPLES


@pytest.fixture(scope="module")
def img():
    return smooth_scene(L, N, seed=31).astype(np.float32)[None]


def test_fractional_shift_matches_integer_roll():
    rng = np.random.default_rng(0)
    # band-limited rows: circular sinc interpolation is exact there
    spec = np.zeros((4, 720), np.complex128)
    spec[:, :100] = rng.normal(size=(4, 100)) + 1j * rng.normal(size=(4, 100))
    spec[:, 0] = spec[:, 0].real
    x = np.fft.irfft(spec, n=720).astype(np.float32)
    out = np.asarray(fractional_shift(jnp.asarray(x), jnp.full((4,), 3.0)))
    np.testing.assert_allclose(out, np.roll(x, 3, axis=-1), atol=1e-5)


def test_delay_estimator_recovers_injected_profile(img):
    plan = get_plan("ntsc")
    rp = make_raster(plan)
    enc, _, _ = make_pipeline(plan, "comb3", raster=True)
    rastered = enc(jnp.asarray(img), 0)
    g = frame_line_index(plan, 0, 1, L)
    shifted, true_delta = impair_timebase(
        plan, rastered, wobble_us=0.4, flagging_us=0.3,
        jitter_us=0.05, key=jax.random.PRNGKey(3),
    )
    est = measure_line_shift(plan, rp, shifted, g)
    err = np.abs(np.asarray(est) - np.asarray(true_delta))
    assert err.max() < 0.05, err.max()


def test_tbc_restores_qam_decoding(img):
    """0.3 us of wobble is ~1 subcarrier cycle: uncorrected NTSC decode
    collapses; the TBC recovers to within 1 dB of clean."""
    plan = get_plan("ntsc")
    rp = make_raster(plan)
    enc, dec, _ = make_pipeline(plan, "comb3", raster=True)
    rgb = jnp.asarray(img)
    rastered = enc(rgb, 0)
    clean = psnr(np.asarray(dec(rastered, 0)), img)
    g = frame_line_index(plan, 0, 1, L)
    shifted, _ = impair_timebase(plan, rastered, wobble_us=0.3)
    wrecked = psnr(np.asarray(dec(shifted, 0)), img)
    fixed = psnr(np.asarray(dec(tbc_correct(plan, rp, shifted, g), 0)), img)
    assert clean - wrecked > 8.0, (clean, wrecked)
    assert clean - fixed < 1.0, (clean, wrecked, fixed)


def test_profile_validation():
    plan = get_plan("ntsc")
    with pytest.raises(ValueError, match="PRNG key"):
        timebase_profile(plan, 16, jitter_us=0.1)


def test_correctable_reach_is_the_honest_geometric_limit():
    """NTSC at 13.5 MHz: min(front-porch/2, post-burst slack) = 10
    samples (~0.74 us).  Beyond it the estimate silently degrades — which
    is exactly why tbc_correct defaults to this reach and the CLI refuses
    larger requested errors instead of pretending."""
    from color_modem_tpu.frame.timebase import correctable_reach

    rp = make_raster(get_plan("ntsc"))
    reach = correctable_reach(rp)
    assert reach == min(rp.sync_start // 2,
                        rp.n_blank - rp.burst_start - rp.burst_len)
    assert 8 <= reach <= 16, reach


def test_cli_refuses_uncorrectable_tbe(tmp_path):
    from color_modem_tpu.cli import main

    for tbe in ("1.2", "3.0"):  # both beyond the ~0.74 us NTSC reach
        with pytest.raises(SystemExit, match="cannot reach"):
            main(["roundtrip", "--standard", "ntsc", "--decoder", "notch",
                  "--demo", "--lines", "32", "--raster", "--tbe-us", tbe,
                  "--tbc", "--output", str(tmp_path / "x.png")])
