"""True field-rate interlacing and motion-adaptive deinterlacing.

frame/interlace.py models the still-image case: both fields of a frame are
sampled at the same instant, so weaving them back is exact.  Real 2:1
broadcast samples each FIELD at its own time (50/59.94 Hz): weaving adjacent
fields of a moving scene interleaves two instants and produces the familiar
combing teeth.  This module closes that loop:

* :func:`fields_from_framerate` — build the transmitted field sequence from
  frames sampled AT FIELD RATE (2B frames -> 2B half-height fields, top
  field from even-indexed instants, bottom from odd).
* :func:`weave` / :func:`bob` — the two classic display reconstructions
  (inter-field exact-but-combing vs intra-field soft-but-clean).
* :func:`deinterlace` — the TV chip's answer: per-sample blend of the
  weave and bob candidates gated by SAME-PARITY field motion (the only
  phase-consistent temporal comparison two fields allow), producing a
  full-height frame for EVERY field instant.

Everything is display-side RGB processing: it composes with any standard's
interlaced pipeline (encode fields with frame/interlace's line numbering,
decode, then reconstruct here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from color_modem_tpu.frame.nr import box_smooth


def fields_from_framerate(rgb2x: jax.Array) -> jax.Array:
    """(2B, 3, L, N) frames at FIELD rate -> (2B, 3, L/2, N) fields.

    Field ``2i`` carries the even rows of instant ``2i``; field ``2i+1``
    the odd rows of instant ``2i+1`` — each field sees the scene at its
    own time, like a real tube camera."""
    l = rgb2x.shape[-2]
    if rgb2x.shape[0] % 2 != 0 or l % 2 != 0:
        raise ValueError("needs an even number of field-rate frames and rows")
    top = rgb2x[0::2, :, 0::2]
    bot = rgb2x[1::2, :, 1::2]
    pair = jnp.stack([top, bot], axis=1)  # (B, 2, 3, L/2, N)
    return pair.reshape((-1,) + pair.shape[2:])


def weave(fields: jax.Array) -> jax.Array:
    """(2B, 3, L/2, N) fields -> (B, 3, L, N): interleave field pairs.

    Exact for static content; combs on motion (the two fields are 1/50 or
    1/59.94 s apart)."""
    from color_modem_tpu.frame.interlace import weave_fields

    return weave_fields(fields)


def bob(fields: jax.Array) -> jax.Array:
    """(2B, 3, L/2, N) fields -> (2B, 3, L, N): line-double every field at
    its own instant (linear interpolation between its lines, parity-
    correct placement).  No combing, half the vertical resolution."""
    b2, c, lh, n = fields.shape
    up = jnp.zeros((b2, c, 2 * lh, n), fields.dtype)
    parity = jnp.arange(b2) % 2  # 0: rows 0,2,..; 1: rows 1,3,..
    own = fields
    # neighbor average for the missing rows (edge rows clamp)
    prev_line = jnp.concatenate([own[..., :1, :], own[..., :-1, :]], axis=-2)
    next_line = jnp.concatenate([own[..., 1:, :], own[..., -1:, :]], axis=-2)
    # top-field frames: even rows = own, odd row 2k+1 = avg(own k, own k+1)
    fill_down = 0.5 * (own + next_line)
    # bottom-field frames: odd rows = own, even row 2k = avg(own k-1, own k)
    fill_up = 0.5 * (own + prev_line)
    even_rows = jnp.where(parity[:, None, None, None] == 0, own, fill_up)
    odd_rows = jnp.where(parity[:, None, None, None] == 0, fill_down, own)
    up = up.at[..., 0::2, :].set(even_rows)
    up = up.at[..., 1::2, :].set(odd_rows)
    return up


def deinterlace(
    fields: jax.Array, sigma: float = 0.02, spatial_smooth: int = 9
) -> jax.Array:
    """(2B, 3, L/2, N) fields -> (2B, 3, L, N) motion-adaptive frames.

    For each field instant, the missing rows come from the WEAVE candidate
    (the temporal neighbor field's rows — exact if static) where the
    same-parity field difference is noise-sized, and from the BOB
    candidate (vertical interpolation — clean under motion) where it is
    picture-sized.  ``sigma`` is the expected noise level on the decoded
    planes, as in :func:`frame.nr.temporal_nr`.
    """
    b2 = fields.shape[0]
    if b2 % 2 != 0 or b2 < 4:
        raise ValueError(
            "needs a field-sequential batch of >= 4 fields (even count): "
            "the same-parity motion metric compares fields two instants "
            f"apart, got {b2}"
        )
    x = fields.astype(jnp.float32)
    # temporal neighbor (the other parity, previous instant; first field
    # borrows its successor)
    neighbor = jnp.concatenate([x[1:2], x[:-1]], axis=0)
    # same-parity motion metric: fields 2 instants apart share parity and
    # geometry, so their difference is phase- and position-consistent
    same_par_prev = jnp.concatenate([x[2:4], x[:-2]], axis=0)
    d = jnp.mean((x - same_par_prev) ** 2, axis=1, keepdims=True)
    d = box_smooth(box_smooth(d, spatial_smooth, -1), spatial_smooth, -2)
    noise_floor = 4.0 * sigma * sigma
    w_static = (2.0 * noise_floor) / (
        2.0 * noise_floor + jnp.maximum(d - noise_floor, 0.0) + 1e-9
    )
    # fill candidates at HALF height (no full-frame temporaries): bob's
    # vertical interpolation per parity, and the neighbor field's rows
    prev_line = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    next_line = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    parity = (jnp.arange(b2) % 2)[:, None, None, None]
    bob_fill = jnp.where(
        parity == 0, 0.5 * (x + next_line), 0.5 * (x + prev_line)
    )
    blend = w_static * neighbor + (1.0 - w_static) * bob_fill
    # interleave own/filled rows in one reshape (the weave_fields pattern)
    even_rows = jnp.where(parity == 0, x, blend)
    odd_rows = jnp.where(parity == 0, blend, x)
    pair = jnp.stack([even_rows, odd_rows], axis=-2)  # (2B, 3, L/2, 2, N)
    return pair.reshape(pair.shape[:-3] + (-1, pair.shape[-1]))
