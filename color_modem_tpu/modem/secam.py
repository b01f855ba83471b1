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

from color_modem_tpu.dsp.apply import fir_same, fir_same_held
from color_modem_tpu.dsp.nco import TWO_PI
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.separate.stencil import next_reflect, prev_reflect
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
    # held edges on every BASEBAND filter (dsp/apply.fir_same_held): the
    # analog line continues through blanking, and zero-padded edges cost
    # ~60 garbage samples per line end through the long-tailed emphasis
    # filters.  The carrier-band filters (anticloche, bell, notch) keep
    # zero edges.
    d = fir_same_held(d, plan.comp_lpf)
    d = fir_same_held(d, plan.preemph)
    f0, dev = _per_line_f0_dev(plan, gline)
    # deviation from the band center, in radians/sample — small, cumsum-safe.
    # MIDPOINT rule (cumsum - df/2): the decoder's symmetric derivative then
    # reads f_inst at exactly sample n (plan.fm_carrier_ramp comment; the
    # rectangle rule cost a half-sample advance = +13.3 deg/MHz phase error)
    df = (f0[..., None] - np.float32(plan.f_center)) + dev[..., None] * d
    dfr = df * np.float32(TWO_PI / plan.fs)
    dphi = jnp.cumsum(dfr, axis=-1) - 0.5 * dfr
    base = jnp.asarray(plan.fm_carrier_ramp, dtype=jnp.float32)
    carrier = jnp.cos(base + dphi)
    chroma = fir_same(carrier, plan.anticloche)
    return y + chroma


def extend_blanking(plan: ModemPlan, comp: jax.Array, gline: jax.Array):
    """(..., L, N) -> (..., L, N + 2M): reconstruct blanking neighborhoods.

    The real SECAM signal continues through blanking — black luma plus the
    undeviated rest carrier — so the decoder rebuilds that neighborhood
    instead of letting its long filters see a hard zero edge (which cost
    ~2.5 dB round-trip; see plan.SECAM_MARGIN).  Both margins carry the
    line's luma pedestal, estimated as the mean of the K edge samples (the
    carrier averages out over ~8.5 cycles); the LEFT margin adds the rest
    carrier, whose phase at sample 0 is a modem convention the decoder
    shares (like f0 itself).  The right edge phase depends on the line's
    whole deviation integral — unknowable at the decoder; a projection
    estimate was measured to add nothing over the plain pedestal.
    """
    m = plan.fm_margin
    k = plan.fm_luma_est
    lum_l = jnp.mean(comp[..., :k], axis=-1, keepdims=True)
    lum_r = jnp.mean(comp[..., -k:], axis=-1, keepdims=True)
    carriers = jnp.asarray(plan.fm_margin_carrier, jnp.float32)  # (2, M)
    sel = is_r_line(gline).astype(jnp.int32)                     # (..., L)
    left = lum_l + carriers[sel]
    right = jnp.broadcast_to(lum_r, comp.shape[:-1] + (m,))
    return jnp.concatenate([left, comp, right], axis=-1)


def demodulate_lines(plan: ModemPlan, comp: jax.Array, gline: jax.Array):
    """(..., L, N) composite -> (luma, v) with v = this line's D'R or D'B."""
    m = plan.fm_margin
    ext = extend_blanking(plan, comp, gline)
    takeoff = fir_same(ext, plan.bell_takeoff)
    luma = ext - fir_same(ext, plan.luma_notch)
    mix = jnp.asarray(plan.mix_ramp_ext, dtype=jnp.float32)
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
    n = comp.shape[-1]
    return luma[..., m : m + n], d_hat[..., m : m + n]


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


def pair_components_interp(v: jax.Array, gline: jax.Array):
    """Interpolated pairing ('interp' decoder) — beyond-reference quality.

    The reference's 1-line memory COPIES the previous line's component; a
    batch decoder has the next line too, so the missing component can be
    the AVERAGE of both adjacent carrier lines — linear interpolation of
    the vertically half-sampled chroma instead of nearest-neighbor hold
    (both neighbors always carry the needed opposite component).  Measured
    +12 dB on the ideal-link pairing floor (37.5 -> 49.9 dB on the smooth
    fixture), ~+1.5 dB end-to-end.  Same 1-line stencil depth as the copy
    pairing; reflected edges.
    """
    o = 0.5 * (prev_reflect(v, 1) + next_reflect(v, 1))
    r = is_r_line(gline)[..., None]
    return jnp.where(r, v, o), jnp.where(r, o, v)


def decode(
    plan: ModemPlan, comp: jax.Array, gline: jax.Array,
    pairing: str = "copy",
) -> jax.Array:
    """Full SECAM decode to (..., 3, L, N) (Y, D'R, D'B) components."""
    luma, v = demodulate_lines(plan, comp, gline)
    pair = pair_components_interp if pairing == "interp" else pair_components
    dr, db = pair(v, gline)
    return jnp.stack([luma, dr, db], axis=-3)
