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


def _instantaneous_frequency(plan: ModemPlan, ext: jax.Array) -> jax.Array:
    """Quadrature discriminator on a blanking-extended block: (..., L,
    N+2M) -> instantaneous frequency in Hz.  Parity-free — nothing here
    depends on which component a line carries."""
    takeoff = fir_same(ext, plan.bell_takeoff)
    mix = jnp.asarray(plan.mix_ramp_ext, dtype=jnp.float32)
    i = fir_same(2.0 * takeoff * jnp.cos(mix), plan.mix_lpf)
    q = fir_same(-2.0 * takeoff * jnp.sin(mix), plan.mix_lpf)
    di = fir_same(i, plan.diff)
    dq = fir_same(q, plan.diff)
    a2 = jnp.maximum(i * i + q * q, 1e-9)  # limiter: amplitude cancels
    return np.float32(plan.f_center) + (i * dq - q * di) / (
        np.float32(TWO_PI) * a2
    ) * np.float32(plan.fs)


def demodulate_lines(plan: ModemPlan, comp: jax.Array, gline: jax.Array):
    """(..., L, N) composite -> (luma, v) with v = this line's D'R or D'B."""
    m = plan.fm_margin
    ext = extend_blanking(plan, comp, gline)
    luma = ext - fir_same(ext, plan.luma_notch)
    f_inst = _instantaneous_frequency(plan, ext)
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


def identify_parity(plan: ModemPlan, comp: jax.Array,
                    gline: jax.Array) -> jax.Array:
    """Blind SECAM line identification: is the assumed Dr/Db parity right?

    A real SECAM receiver cannot trust its line counter for chroma — it
    must IDENTIFY which lines carry D'R (field-ident "bottles" on the
    early VBI lines, or per-line rest-carrier detection).  This is the
    frame-layer equivalent: the per-line mean instantaneous frequency
    estimates each line's rest carrier (the content deviation averages
    toward zero over a line), and the parity hypothesis — as-given vs
    swapped — with the smaller squared residual against the (f0r, f0b)
    line pattern wins.  One decision per frame (the alternation itself is
    structural), reduced over all lines, so a single pathological line
    cannot flip it.

    Returns (...,) int32: 0 = ``gline`` parity is correct, 1 = swapped.
    Limitation (documented): a frame that is one solid, fully saturated
    color on EVERY line pushes the mean frequency by up to ~dev — close
    to the 156 kHz f0 separation — and can weaken the margin; natural
    content identifies with a wide margin (see tests).
    """
    m = plan.fm_margin
    n = comp.shape[-1]
    ext = extend_blanking(plan, comp, gline)
    f = _instantaneous_frequency(plan, ext)
    # central 60%: clear of the margins and the takeoff/mix edge smear
    lo, hi = m + n // 5, m + (4 * n) // 5
    mean_f = jnp.mean(f[..., lo:hi], axis=-1)          # (..., L)
    f0_given, _ = _per_line_f0_dev(plan, gline)
    f0_swap, _ = _per_line_f0_dev(plan, gline + 1)
    s_given = jnp.sum((mean_f - f0_given) ** 2, axis=-1)
    s_swap = jnp.sum((mean_f - f0_swap) ** 2, axis=-1)
    return (s_swap < s_given).astype(jnp.int32)


#: ident-line sawtooth peak, in component units (the real "bottles"
#: sweep toward the positive D'R / negative D'B deviation limits)
_IDENT_PEAK = 1.0


def ident_lines(plan: ModemPlan, gline: jax.Array) -> jax.Array:
    """Content-free identification lines — the SECAM "bottles" (A.4).

    Real SECAM transmitted sawtooth frequency sweeps on the early VBI
    lines of every field: D'R lines ramp UP from rest, D'B lines ramp
    DOWN, so a receiver reads the alternation off a known, content-free
    waveform.  ``gline`` (..., R) selects each row's parity; returns the
    (..., R, N) composite rows (zero luma + the swept FM carrier) to
    place on a frame's top rows.
    """
    n = plan.n_samples
    ramp = jnp.asarray(
        np.linspace(0.0, _IDENT_PEAK, n, dtype=np.float32)
    )
    r = is_r_line(gline)[..., None]
    # D'R sweeps up (positive component), D'B sweeps down: after the
    # per-line dev scaling both move AWAY from the other rest frequency
    d = jnp.where(r, ramp, -ramp)
    y = jnp.zeros_like(d)
    ycc = jnp.stack([y, jnp.where(r, d, y), jnp.where(r, y, d)], axis=-3)
    return encode(plan, ycc, gline)


def identify_from_ident(
    plan: ModemPlan, ident_rows: jax.Array, gline: jax.Array
) -> jax.Array:
    """Read the parity off received ident lines (..., R, N).

    The per-line SLOPE of the instantaneous frequency is + for D'R
    bottles and - for D'B bottles regardless of any parity assumption —
    a content-free decision, robust to noise (the regression spans the
    whole line).  Returns (...,) int32 swap like
    :func:`identify_parity`."""
    m = plan.fm_margin
    n = ident_rows.shape[-1]
    ext = extend_blanking(plan, ident_rows, gline)
    f = _instantaneous_frequency(plan, ext)
    lo, hi = m + n // 5, m + (4 * n) // 5
    fw = f[..., lo:hi]
    t = jnp.arange(hi - lo, dtype=jnp.float32)
    t = t - jnp.mean(t)
    slope = jnp.sum(fw * t, axis=-1)               # ~ regression numerator
    want_up = is_r_line(gline).astype(jnp.float32) * 2.0 - 1.0
    agree = jnp.sum(slope * want_up, axis=-1)      # (+ if parity correct)
    return (agree < 0.0).astype(jnp.int32)


def decode_identified(
    plan: ModemPlan, comp: jax.Array, gline: jax.Array,
    pairing: str = "copy", ident_rows: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """SECAM decode WITHOUT trusting the line parity.

    With ``ident_rows > 0`` the top rows are identification lines
    (:func:`ident_lines`) and the decision is content-free and
    unambiguous; otherwise the blind :func:`identify_parity` estimator
    decides (robust on natural content, see its docstring for the
    solid-saturated-frame limitation).  Returns (components, swap)."""
    if ident_rows > 0:
        swap = identify_from_ident(
            plan, comp[..., :ident_rows, :], gline[..., :ident_rows]
        )
    else:
        swap = identify_parity(plan, comp, gline)
    return decode(plan, comp, gline + swap[..., None], pairing), swap
