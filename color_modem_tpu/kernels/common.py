"""Shared Pallas kernel plumbing (SURVEY.md §2.3).

Layout convention for all kernels: scanlines are flattened to a single
``(total_lines, N)`` array — lines on the sublane axis, samples on the
128-lane axis — and the grid walks line blocks.  Per-line scalars (phase,
V-switch sign, rest frequency) ride as ``(lines, 1)`` columns; FIR filters
ride as banded ``(N, N)`` Toeplitz matrices hitting the MXU (see
dsp/apply.py for why matmul is the TPU-native FIR formulation).

Kernels run compiled on TPU and in interpreter mode elsewhere (the
"sanitizer" role, SURVEY.md §5.2); every kernel has a pure-jnp twin in
modem/ against which it is tested (§4.3 'Pallas parity').
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def should_interpret() -> bool:
    """Compiled Mosaic on real TPU; interpreter everywhere else."""
    return jax.default_backend() != "tpu"


def pick_line_block(total: int, target: int = 256) -> int:
    """Largest divisor of ``total`` that is <= target and a multiple of 8."""
    best = 8
    for cand in range(8, min(total, target) + 1, 8):
        if total % cand == 0:
            best = cand
    return best


def _pad_axis(x, axis: int, multiple: int):
    """Zero-pad one axis up to a multiple; returns (padded, orig_size)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), n


def pad_lines(x: np.ndarray | jax.Array, multiple: int = 8):
    """Pad the leading (line) axis to a multiple; returns (padded, orig)."""
    return _pad_axis(x, 0, multiple)


def pad_lanes(x: jax.Array, multiple: int = 128):
    """Zero-pad the last (lane) axis to a multiple; returns (padded, orig_n).

    720-sample lines leave the last 128-lane tile 5/8 masked on the MXU;
    filtering at 768 and cropping back is bit-identical to the 720 'same'
    convolution (zero-padding either way) and measures ~10% faster.
    """
    return _pad_axis(x, x.ndim - 1, multiple)


def lane_mask(n_valid: int, n_total: int):
    """(1, n_total) float32 row: 1.0 on real columns, 0.0 on lane padding.

    Multiply into any dot *input* that was produced by elementwise math
    after a previous dot — the padded columns hold garbage (e.g. sin of an
    unpadded phase ramp) that the next filter matmul would smear into the
    last half-tap of real columns.
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_total), 1)
    return (col < n_valid).astype(jnp.float32)


def compiler_params(*weight_arrays, margin_bytes: int = 32 * 1024 * 1024):
    """CompilerParams with a VMEM cap sized to the resident weights.

    Mosaic's default 16 MB scoped-VMEM budget predates v5e's 128 MB VMEM;
    wide lines (1440 samples -> 1536x1536 matrices) need far more than the
    default but fit the hardware comfortably.  The cap is weights + margin
    (line blocks, intermediates, double buffers).
    """
    from jax.experimental.pallas import tpu as pltpu

    if should_interpret():
        # interpreter mode has no VMEM; don't cap (or reject) anything the
        # CPU sanitizer runs can execute fine
        return pltpu.CompilerParams()
    weights = sum(int(np.prod(w.shape)) * w.dtype.itemsize
                  for w in weight_arrays)
    limit = max(16 * 1024 * 1024, weights + margin_bytes)
    if limit > 120 * 1024 * 1024:
        raise ValueError(
            f"kernel needs ~{limit/2**20:.0f} MB of VMEM "
            f"({weights/2**20:.0f} MB weights + {margin_bytes/2**20:.0f} MB "
            "working margin) — beyond the chip; use the 'xla' backend for "
            "this line width"
        )
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def split_bf16_host(m: np.ndarray):
    """Host-side bf16 hi/lo split of an f32 matrix: m ~= hi + lo.

    Mosaic's HIGHEST dot keeps hi/lo splits of *both* operands live on the
    kernel's VMEM stack, which blows the 16 MB budget when several (N, N)
    weight matrices are involved.  Pre-splitting the weights on the host and
    storing them as bf16 scratch halves the weight footprint AND removes the
    hidden stack allocations; :func:`dot3` then does the 3-pass product
    explicitly (~1e-5 relative error; the omitted lo*lo term is ~2^-32).
    """
    import ml_dtypes

    m32 = np.asarray(m, dtype=np.float32)
    hi = m32.astype(ml_dtypes.bfloat16)
    lo = (m32 - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _bdot(a, b):
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def dot3(x, m_hi, m_lo):
    """3-pass split-precision matmul: x (f32) @ (m_hi + m_lo) (bf16 pair)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return _bdot(xh, m_hi) + _bdot(xh, m_lo) + _bdot(xl, m_hi)
