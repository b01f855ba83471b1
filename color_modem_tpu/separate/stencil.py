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
