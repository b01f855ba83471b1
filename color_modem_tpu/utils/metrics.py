"""PSNR / SNR metrics (SURVEY.md K14, §5.5).

Used both host-side (golden comparisons in tests) and on-device (bench and
sharded runs, where the reduction ends in a ``psum``/gather).
"""

from __future__ import annotations

import numpy as np


def mse(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.mean((a - b) ** 2))


def psnr(a, b, peak: float = 1.0) -> float:
    """Peak SNR in dB; +inf for identical inputs."""
    m = mse(a, b)
    if m == 0.0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / m))


def psnr_jnp(a, b, peak: float = 1.0):
    """On-device PSNR (traceable; caller wraps the mean in psum if sharded)."""
    import jax.numpy as jnp

    m = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(peak * peak / jnp.maximum(m, 1e-20))
