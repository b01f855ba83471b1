"""On-device FIR application — batched 'same' linear convolution in jnp.

The reference applies SciPy IIR filters per scanline inside a Python loop
(SURVEY.md §3.1 hot loop).  Here one call filters every line of every frame
at once: the input is ``(..., N)`` and the convolution runs along the last
(sample) axis, which the TPU lays out on the 128-lane dimension.

Two equivalent paths (K3):

* ``fir_same`` — direct convolution via ``lax.conv_general_dilated``; XLA
  maps this onto the MXU/VPU and fuses neighboring elementwise ops.
* ``fir_same_fft`` — overlap-free FFT path (lines are short enough that one
  rfft per line beats overlap-save bookkeeping).

Both are exact linear convolutions with zero-padded edges and compensated
group delay; they agree to float tolerance and with the golden oracle's
``np.convolve(mode='same')``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def fir_same(x: jax.Array, taps) -> jax.Array:
    """Linear convolution along the last axis, 'same' length, zero-pad edges.

    ``x``: (..., N) float array.  ``taps``: (T,) with odd T (host-designed).
    Matches ``np.convolve(line, taps, mode='same')`` per line.
    """
    taps = jnp.asarray(taps, dtype=x.dtype)
    (t,) = taps.shape
    lead = x.shape[:-1]
    n = x.shape[-1]
    lhs = x.reshape((-1, 1, n))
    # np.convolve flips the kernel; conv_general_dilated correlates, so flip.
    rhs = taps[::-1].reshape((1, 1, t))
    pad_lo = (t - 1) // 2
    pad_hi = t - 1 - pad_lo
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        # default precision accumulates in bf16 on TPU (~1e-3 error — fails
        # golden parity); HIGHEST keeps true fp32 accumulation
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (n,))


def fir_same_fft(x: jax.Array, taps) -> jax.Array:
    """FFT-based equivalent of :func:`fir_same` (one rfft per line)."""
    taps = np.asarray(taps)
    (t,) = taps.shape
    n = x.shape[-1]
    nfft = int(2 ** np.ceil(np.log2(n + t - 1)))
    # Center-compensated kernel spectrum, precomputed on host.
    kern = np.zeros(nfft)
    kern[:t] = taps
    K = np.fft.rfft(kern)  # delay (t-1)/2 baked in; crop below compensates
    X = jnp.fft.rfft(x, n=nfft, axis=-1)
    y = jnp.fft.irfft(X * jnp.asarray(K), n=nfft, axis=-1)
    lo = (t - 1) // 2
    return y[..., lo : lo + n].astype(x.dtype)
