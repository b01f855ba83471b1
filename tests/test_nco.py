"""Unit tests: closed-form NCO phase law (SURVEY.md K1, §4.3)."""

import numpy as np
import jax.numpy as jnp

from color_modem_tpu.dsp import nco
from color_modem_tpu.golden.modems import line_phase0_exact


def test_ntsc_phase_flips_180_per_line():
    g = jnp.arange(8, dtype=jnp.int32)
    phi = np.asarray(nco.line_phase0(455, 2, g))
    assert np.allclose(phi, [0, np.pi] * 4, atol=1e-6)


def test_pal_25hz_offset_phase_law():
    # PAL cpl = 283.7516: after 625 lines (one frame) the phase has advanced
    # by frac(625 * 709379/2500) = 0.75 cycles  (the 25 Hz offset at work)
    g = jnp.asarray([0, 625, 1250], dtype=jnp.int32)
    phi = np.asarray(nco.line_phase0(709379, 2500, g)) / (2 * np.pi)
    assert np.allclose(phi, [0.0, 0.75, 0.5], atol=1e-6)


def test_int32_phase_matches_bigint_for_huge_line_index():
    # float32 would have lost the phase long before g ~ 2e9; the int32
    # modular path must stay exact right up to the int32 limit
    for g in [1, 12345, 10**6, 5 * 10**8, 2 * 10**9]:
        got = float(nco.line_phase0(709379, 2500, jnp.asarray([g], jnp.int32))[0])
        want = line_phase0_exact(709379, 2500, g)
        assert abs(got - want) < 1e-4, g


def test_sample_ramp_float64_accuracy():
    fsc, fs, n = 4433618.75, 13.5e6, 2048
    ramp = nco.sample_phase_ramp(fsc, fs, n)
    want = 2 * np.pi * np.mod(fsc / fs * np.arange(n, dtype=np.float64), 1.0)
    assert np.max(np.abs(ramp - want)) < 1e-9
    assert ramp.max() < 2 * np.pi  # stays range-reduced


def test_global_line_index():
    g = np.asarray(nco.global_line_index(7, 2, 3, 625))
    assert g.shape == (2, 3)
    assert g[0, 0] == 7 * 625 and g[1, 2] == 8 * 625 + 2
