"""SECAM FM chroma modem — vectorized (SURVEY.md K7/K8/K9, A.4).

Encode: the FM phase integral is per-line-local (phase restarts each line, as
in the golden oracle and the spec's line-identification behavior), so it is a
``jnp.cumsum`` along the *sample* axis — lines stay independent and the whole
block vectorizes.  Numerical note: the integral is computed as
``host_carrier_ramp + cumsum(f_inst - f_center)`` so the on-device float32
cumsum only sees the ±250 rad deviation term, not the 3e9-magnitude raw
integral (see ModemPlan.fm_carrier_ramp).

Decode: quadrature discriminator instead of the reference's recalled
hilbert->unwrap->diff chain (SURVEY.md §3.4 [MEM-M]) — the instantaneous
frequency is ``fc + (I*dQ - Q*dI) / (2*pi*(I^2+Q^2))``, algebraic and free of
the unwrap sequential dependency (K8).  Dividing by the squared amplitude IS
the hard limiter: amplitude variations cancel exactly.

Line pairing (each line carries only D'R or D'B; the other component comes
from the opposite-parity neighbor, halving vertical chroma resolution) is a
shifted-array select — the 1-line state of the reference turned into a
stencil, which under line-block sharding becomes a 1-line halo (SURVEY.md
§5.7).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.dsp.nco import TWO_PI
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.separate.stencil import prev_reflect
from color_modem_tpu.standards.base import FmParams


def is_r_line(gline: jax.Array) -> jax.Array:
    """Odd absolute lines carry D'R (SURVEY.md A.4)."""
    return (gline % 2) == 1


def _per_line_f0_dev(plan: ModemPlan, gline: jax.Array):
    p: FmParams = plan.cfg.chroma
    r = is_r_line(gline)
    f0 = jnp.where(r, np.float32(p.f0r), np.float32(p.f0b))
    dev = jnp.where(r, np.float32(p.dev_r), np.float32(p.dev_b))
    return f0, dev


def encode(plan: ModemPlan, ycc: jax.Array, gline: jax.Array) -> jax.Array:
    """(..., 3, L, N) (Y, D'R, D'B) + (..., L) -> (..., L, N) composite."""
    y, dr, db = ycc[..., 0, :, :], ycc[..., 1, :, :], ycc[..., 2, :, :]
    r = is_r_line(gline)[..., None]
    d = jnp.where(r, dr, db)
    d = fir_same(d, plan.comp_lpf)
    d = fir_same(d, plan.preemph)
    f0, dev = _per_line_f0_dev(plan, gline)
    # deviation from the band center, in radians/sample — small, cumsum-safe
    df = (f0[..., None] - np.float32(plan.f_center)) + dev[..., None] * d
    dphi = jnp.cumsum(df * np.float32(TWO_PI / plan.fs), axis=-1)
    base = jnp.asarray(plan.fm_carrier_ramp, dtype=jnp.float32)
    carrier = jnp.cos(base + dphi)
    chroma = fir_same(carrier, plan.anticloche)
    return y + chroma


def demodulate_lines(plan: ModemPlan, comp: jax.Array, gline: jax.Array):
    """(..., L, N) composite -> (luma, v) with v = this line's D'R or D'B."""
    takeoff = fir_same(comp, plan.bell_takeoff)
    luma = comp - fir_same(comp, plan.luma_notch)
    mix = jnp.asarray(plan.mix_ramp, dtype=jnp.float32)
    i = fir_same(2.0 * takeoff * jnp.cos(mix), plan.mix_lpf)
    q = fir_same(-2.0 * takeoff * jnp.sin(mix), plan.mix_lpf)
    di = fir_same(i, plan.diff)
    dq = fir_same(q, plan.diff)
    a2 = jnp.maximum(i * i + q * q, 1e-9)  # limiter: amplitude cancels
    f_inst = np.float32(plan.f_center) + (i * dq - q * di) / (
        np.float32(TWO_PI) * a2
    ) * np.float32(plan.fs)
    f0, dev = _per_line_f0_dev(plan, gline)
    d_hat = (f_inst - f0[..., None]) / dev[..., None]
    d_hat = fir_same(d_hat, plan.deemph)
    d_hat = fir_same(d_hat, plan.demod_lpf)
    return luma, d_hat


def pair_components(v: jax.Array, gline: jax.Array):
    """Reassemble (D'R, D'B) from the per-line component stream (A.4).

    ``v_other`` is the opposite-parity partner: the previous line, except the
    first line of the block pairs with the next (matching the golden
    oracle's `_neighbor`).  Under line-block sharding the previous line comes
    from the halo (parallel/halo.py).
    """
    v_other = prev_reflect(v, 1)
    r = is_r_line(gline)[..., None]
    dr = jnp.where(r, v, v_other)
    db = jnp.where(r, v_other, v)
    return dr, db


def decode(plan: ModemPlan, comp: jax.Array, gline: jax.Array) -> jax.Array:
    """Full SECAM decode to (..., 3, L, N) (Y, D'R, D'B) components."""
    luma, v = demodulate_lines(plan, comp, gline)
    dr, db = pair_components(v, gline)
    return jnp.stack([luma, dr, db], axis=-3)
