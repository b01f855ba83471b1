"""Real-DFT matmuls (dsp/rdft.py) vs np.fft, including the non-smooth
lengths (858 = 2*3*11*13) that motivated the module."""

import numpy as np
import pytest
import jax.numpy as jnp

from color_modem_tpu.dsp.rdft import irdft, rdft


@pytest.mark.parametrize("n", [138, 720, 858, 864, 1440])
def test_rdft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=(3, n)).astype(np.float32)
    re, im = rdft(jnp.asarray(x))
    ref = np.fft.rfft(x)
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-3 * n)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-3 * n)
    back = np.asarray(irdft(re, im, n))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_rdft_odd_length_roundtrip():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 131)).astype(np.float32)
    re, im = rdft(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(irdft(re, im, 131)), x, atol=1e-4)
