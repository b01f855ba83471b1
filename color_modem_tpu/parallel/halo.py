"""Halo exchange over the line-block ring (SURVEY.md §5.7/§5.8, K5 sharded).

Every cross-line dependency in the decode path is a stencil of depth <= 2
lines, plus <= 1 line of post-demod averaging/pairing — so a device that owns
a contiguous block of lines needs at most a few neighbor lines ("halo") from
the adjacent blocks.  ``halo_extend`` fetches them with a single neighbor
``ppermute`` in each direction — the ring-attention communication skeleton
without the attention (SURVEY.md §2.4) — and fixes up the two global edges
with the same reflection rule the unsharded stencils use, so sharded and
unsharded pipelines are *bit-identical* (tests/test_sharding.py).

The absolute-line-index array is extended with the same function: at global
edges the reflected indices make halo lines demodulate exactly like the
in-frame lines the unsharded reflection would read (phase law included).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _take_lines(x: jax.Array, sl: slice) -> jax.Array:
    """Slice along the line axis (second-to-last)."""
    return x[..., sl, :]


def _reflect_top(x: jax.Array, h: int) -> jax.Array:
    # lines 1..h reversed — matches separate.stencil.prev_reflect at l < h
    return _take_lines(x, slice(1, h + 1))[..., ::-1, :]


def _reflect_bot(x: jax.Array, h: int) -> jax.Array:
    n = x.shape[-2]
    return _take_lines(x, slice(n - h - 1, n - 1))[..., ::-1, :]


def halo_extend(
    x: jax.Array, h: int, axis_name: str, edge: str = "reflect"
) -> jax.Array:
    """Extend a per-device line block with ``h`` neighbor lines on each side.

    Must be called inside ``shard_map``.  ``x`` is the device-local block
    ``(..., L_blk, N)``; the result is ``(..., L_blk + 2h, N)``.  Interior
    block boundaries receive true neighbor lines via ring ``ppermute``;
    the global top/bottom edges receive ``edge``-rule lines:

    * ``"reflect"`` — lines ``1..h`` reversed, matching the single-stencil
      ``prev_reflect``/``_neighbor`` rule (combs, pairing, delay-line).
    * ``"copy"`` — lines ``0..h-1`` in order.  Required by decoders that
      CHAIN two 1-line prev-stencils (FM/NIIR 'avg': pairing/normalize,
      then neighbor averaging): running the chain block-locally on a
      copy-extended block reproduces the unsharded chain bit-exactly at the
      global top edge (ext[h-1] = x[h-1] is the pos-h neighbor and its own
      chained value uses raw x[h-2], exactly what the unsharded second
      stencil reads), which the reflect rule does not.
    """
    if h < 1:
        raise ValueError("halo must be >= 1")
    if x.shape[-2] < h + 1:
        raise ValueError(
            f"line block of {x.shape[-2]} lines too small for halo {h}"
        )
    if edge == "reflect":
        top_edge, bot_edge = _reflect_top(x, h), _reflect_bot(x, h)
    elif edge == "copy":
        n = x.shape[-2]
        top_edge = _take_lines(x, slice(0, h))
        bot_edge = _take_lines(x, slice(n - h, n))
    else:
        raise ValueError(f"edge must be 'reflect' or 'copy', got {edge!r}")
    n_blk = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n_blk == 1:
        return jnp.concatenate([top_edge, x, bot_edge], axis=-2)

    down = [(i, (i + 1) % n_blk) for i in range(n_blk)]  # send toward larger idx
    up = [(i, (i - 1) % n_blk) for i in range(n_blk)]    # send toward smaller idx
    # my bottom h lines become the NEXT block's top halo
    from_prev = lax.ppermute(_take_lines(x, slice(-h, None)), axis_name, down)
    # my top h lines become the PREVIOUS block's bottom halo
    from_next = lax.ppermute(_take_lines(x, slice(0, h)), axis_name, up)

    top = jnp.where(idx == 0, top_edge, from_prev)
    bot = jnp.where(idx == n_blk - 1, bot_edge, from_next)
    return jnp.concatenate([top, x, bot], axis=-2)


def halo_extend_lines(
    v: jax.Array, h: int, axis_name: str, edge: str = "reflect"
) -> jax.Array:
    """:func:`halo_extend` for per-line (not per-sample) arrays ``(..., L)``."""
    return halo_extend(v[..., None], h, axis_name, edge)[..., 0]


def crop_halo(x: jax.Array, h: int) -> jax.Array:
    """Drop the halo lines after block-local processing."""
    return _take_lines(x, slice(h, x.shape[-2] - h))


# --- frame-axis halos (temporal comb over the DP axis) ---------------------


def _take_frames(x: jax.Array, sl: slice) -> jax.Array:
    return x[..., sl, :, :]


def halo_extend_frames(x: jax.Array, h: int, axis_name: str) -> jax.Array:
    """Extend a per-device FRAME block with ``h`` neighbor frames per side.

    The temporal comb's halo over the data-parallel axis: interior block
    boundaries receive true neighbor frames via ring ``ppermute``; the two
    global edges substitute frames an odd multiple of the comb spacing away
    (``x[t+h]`` / ``x[t-h]``), matching
    ``separate.stencil.prev_reflect_frames`` — an index reflection would
    pair an edge frame with its own chroma parity and halve its chroma.
    """
    if h < 1:
        raise ValueError("halo must be >= 1")
    if x.shape[-3] < 2 * h:
        raise ValueError(
            f"frame block of {x.shape[-3]} frames too small for halo {h}"
        )
    n = x.shape[-3]
    top_edge = _take_frames(x, slice(h, 2 * h))
    bot_edge = _take_frames(x, slice(n - 2 * h, n - h))
    n_blk = lax.axis_size(axis_name)
    if n_blk == 1:
        return jnp.concatenate([top_edge, x, bot_edge], axis=-3)
    idx = lax.axis_index(axis_name)
    down = [(i, (i + 1) % n_blk) for i in range(n_blk)]
    up = [(i, (i - 1) % n_blk) for i in range(n_blk)]
    from_prev = lax.ppermute(_take_frames(x, slice(-h, None)), axis_name, down)
    from_next = lax.ppermute(_take_frames(x, slice(0, h)), axis_name, up)
    top = jnp.where(idx == 0, top_edge, from_prev)
    bot = jnp.where(idx == n_blk - 1, bot_edge, from_next)
    return jnp.concatenate([top, x, bot], axis=-3)


def crop_halo_frames(x: jax.Array, h: int) -> jax.Array:
    """Drop the halo frames after block-local processing."""
    return _take_frames(x, slice(h, x.shape[-3] - h))
