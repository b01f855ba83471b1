"""QAM chroma modem — vectorized over lines, frames, anything (SURVEY.md K2).

The reference's ``QamColorModem.modulate/demodulate`` processes one scanline
per Python call (SURVEY.md C1, §3.1/§3.2).  Here the same math is a pure
function of a whole ``(..., L, N)`` block: the per-line quantities (start
phase, V-switch sign, NIIR reference mask) are *arrays indexed by the
absolute line number* — no loop, no state, nothing sequential for XLA to
choke on.  ``vmap``/sharding over frames and line blocks come for free.

Verified against the frozen golden oracle (golden/modems.py) line by line.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.dsp.nco import line_phase0
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.standards.base import QamParams


def carrier_phase(plan: ModemPlan, gline: jax.Array) -> jax.Array:
    """phi[..., l, n] for absolute line indices ``gline`` (..., L)."""
    cfg = plan.cfg
    phi0 = line_phase0(cfg.cpl_num, cfg.cpl_den, gline)  # (..., L)
    ramp = jnp.asarray(plan.ramp, dtype=jnp.float32)      # (N,)
    return phi0[..., None] + ramp + jnp.float32(plan.theta)


def v_sign(plan: ModemPlan, gline: jax.Array) -> jax.Array:
    """PAL V-switch sign per line (+1 everywhere when disabled). K6."""
    p: QamParams = plan.cfg.chroma
    if not p.v_switch:
        return jnp.ones(gline.shape, dtype=jnp.float32)
    even = (gline % 2) == 0
    return jnp.where(even, 1.0, -1.0).astype(jnp.float32)


def reference_line_mask(plan: ModemPlan, gline: jax.Array) -> jax.Array | None:
    """NIIR: True on lines carrying the unmodulated reference carrier (A.5)."""
    p: QamParams = plan.cfg.chroma
    if p.reference_amplitude is None:
        return None
    return (gline % 2) == 1


def encode(plan: ModemPlan, ycc: jax.Array, gline: jax.Array) -> jax.Array:
    """(..., 3, L, N) components + (..., L) line indices -> (..., L, N) composite."""
    p: QamParams = plan.cfg.chroma
    y = ycc[..., 0, :, :]
    c1f = fir_same(ycc[..., 1, :, :], plan.c1_lpf)
    c2f = fir_same(ycc[..., 2, :, :], plan.c2_lpf)
    phi = carrier_phase(plan, gline)
    s = v_sign(plan, gline)[..., None]
    chroma = c1f * jnp.sin(phi) + s * c2f * jnp.cos(phi)
    ref_mask = reference_line_mask(plan, gline)
    if ref_mask is not None:
        ref_carrier = jnp.float32(p.reference_amplitude) * jnp.sin(phi)
        chroma = jnp.where(ref_mask[..., None], ref_carrier, chroma)
    return y + chroma


def separate_notch(plan: ModemPlan, comp: jax.Array):
    """Sample-axis notch separation (K4): luma = comp - BPF(comp)."""
    chroma_band = fir_same(comp, plan.chroma_bpf)
    return comp - chroma_band, chroma_band


def demodulate_carrier(
    plan: ModemPlan, chroma_band: jax.Array, gline: jax.Array
):
    """Product detector: chroma-band signal -> (c1, c2) baseband components."""
    phi = carrier_phase(plan, gline)
    s = v_sign(plan, gline)[..., None]
    c1 = fir_same(2.0 * chroma_band * jnp.sin(phi), plan.c1_lpf)
    c2 = s * fir_same(2.0 * chroma_band * jnp.cos(phi), plan.c2_lpf)
    return c1, c2
