"""Horizontal resampling: image width <-> composite sample grid (K12, C7).

The reference's image layer "possibly handles horizontal resampling between
image width and composite sample rate" [SURVEY.md C7, MEM-L]; here it is a
first-class on-device op so a W-pixel image row can feed an N-sample line
(and back) without a host/PIL round trip.

TPU-native formulation, consistent with dsp/apply.py: resampling is a
linear map, so it is a host-designed ``(W, N)`` windowed-sinc matrix applied
as one MXU matmul.  Anti-aliasing for decimation is built into the same
matrix (sinc cutoff at the lower of the two rates), so down-then-up at any
ratio is band-limited-exact.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=32)
def resample_matrix(n_in: int, n_out: int, taps_per_output: int = 17) -> np.ndarray:
    """(n_in, n_out) float32 M with ``row @ M`` = windowed-sinc resample.

    Grid convention: sample i covers [i, i+1)/n of the active line (pixel
    centers at (i + 0.5)/n), matching how an image row maps onto the active
    line interval.  Kaiser-windowed sinc, cutoff at min(n_in, n_out)
    (anti-aliasing when decimating); rows are renormalized to unity DC gain
    so flat fields stay exactly flat.
    """
    ratio = n_in / n_out                      # input samples per output sample
    cutoff = min(1.0, 1.0 / ratio)            # in units of the input Nyquist
    half = taps_per_output / 2.0 * max(1.0, ratio)
    mat = np.zeros((n_in, n_out), dtype=np.float64)
    j = np.arange(n_in)
    for o in range(n_out):
        center = (o + 0.5) * ratio - 0.5      # input-sample position
        x = j - center
        keep = np.abs(x) <= half
        xk = x[keep]
        # Kaiser window (beta=8) evaluated at the kept offsets
        w = np.i0(8.0 * np.sqrt(np.maximum(0.0, 1.0 - (xk / half) ** 2)))
        w /= np.i0(8.0)
        kern = cutoff * np.sinc(cutoff * xk) * w
        s = kern.sum()
        mat[keep, o] = kern / (s if abs(s) > 1e-12 else 1.0)
    return mat.astype(np.float32)


def resample_width(x: jax.Array, n_out: int, taps_per_output: int = 17) -> jax.Array:
    """Resample the last (sample) axis of ``x`` to ``n_out`` points.

    One MXU matmul per call; 3-pass precision like every other filter
    (>=100 dB parity against a float64 host reference on band-limited
    inputs — tests/test_resample.py).
    """
    n_in = x.shape[-1]
    if n_in == n_out:
        return x
    mat = jnp.asarray(resample_matrix(n_in, n_out, taps_per_output))
    return jnp.matmul(
        x.astype(jnp.float32), mat, precision=lax.Precision.HIGH
    )
