"""Line-axis shift primitives with reflected edges.

All cross-line dependencies in this framework — comb separation (K5), PAL
delay-line (K6), SECAM/NIIR line pairing (K10) — reduce to "the line p above
/ below me", i.e. shifts along the second-to-last axis.  Edges reflect
(line -1 maps to line +1), matching the golden oracle's `_reflect` /
`_neighbor` rules exactly.

Under line-block sharding the same functions are applied to halo-extended
blocks (parallel/halo.py), so interior block edges see their true neighbors
and only the global frame edges reflect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prev_reflect(x: jax.Array, p: int) -> jax.Array:
    """y[..., l, :] = x[..., l-p, :], reflecting at the top: y[l<p] = x[p-l]."""
    if p < 1:
        raise ValueError("p must be >= 1")
    head = x[..., 1 : p + 1, :][..., ::-1, :]
    return jnp.concatenate([head, x[..., :-p, :]], axis=-2)


def next_reflect(x: jax.Array, p: int) -> jax.Array:
    """y[..., l, :] = x[..., l+p, :], reflecting at the bottom."""
    if p < 1:
        raise ValueError("p must be >= 1")
    n = x.shape[-2]
    tail = x[..., n - p - 1 : n - 1, :][..., ::-1, :]
    return jnp.concatenate([x[..., p:, :], tail], axis=-2)


def prev_reflect_frames(x: jax.Array, p: int) -> jax.Array:
    """Frame-axis (-3) shift: "the frame p before me", phase-safe edges.

    The edge rule differs from the line reflection on purpose: the temporal
    comb needs the substitute frame to sit an odd multiple of ``p`` away so
    its chroma phase is OPPOSITE (that is what the comb cancels against).
    ``x[t+p]`` satisfies that; the index reflection ``x[p-t]`` does not —
    e.g. at p=2 it pairs frame 1 with itself's parity and halves the edge
    frames' chroma.  So missing top frames borrow from ``t+p`` instead.
    """
    if p < 1:
        raise ValueError("p must be >= 1")
    if x.shape[-3] < 2 * p:
        raise ValueError(f"temporal comb needs >= {2*p} frames per block")
    xm = jnp.moveaxis(x, -3, -2)
    out = jnp.concatenate(
        [xm[..., p : 2 * p, :], xm[..., :-p, :]], axis=-2
    )
    return jnp.moveaxis(out, -2, -3)


def next_reflect_frames(x: jax.Array, p: int) -> jax.Array:
    """Frame-axis "the frame p after me"; see :func:`prev_reflect_frames`."""
    if p < 1:
        raise ValueError("p must be >= 1")
    if x.shape[-3] < 2 * p:
        raise ValueError(f"temporal comb needs >= {2*p} frames per block")
    xm = jnp.moveaxis(x, -3, -2)
    n = xm.shape[-2]
    out = jnp.concatenate(
        [xm[..., p:, :], xm[..., n - 2 * p : n - p, :]], axis=-2
    )
    return jnp.moveaxis(out, -2, -3)
