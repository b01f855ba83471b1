"""Transmission-channel impairment simulation (SURVEY.md §3.5 [MEM-L]).

The point of simulating analog color standards is to see how each one
degrades; this module provides the classic impairments between encode and
decode:

* additive white noise,
* **differential chroma gain** (the carrier amplitude error that SECAM's FM
  and NIIR's reference normalization are immune to, and that shifts QAM
  saturation),
* **differential chroma phase** (the hue error PAL's V-switch + delay-line
  averages away and NIIR's reference divide cancels, but that visibly
  shifts NTSC hue),
* **multipath ghost** (a delayed, attenuated copy of the composite — the
  classic reflection "ghost"; shifts ride the continuous line stream, so a
  ghost delayed past a line's start spills in from the previous line's
  tail, as in a real raster).

Phase rotation of the chroma band uses a band-limited Hilbert FIR:
``rot(x, t) = cos(t) x + sin(t) H(x)``, applied to the chroma band only;
luma passes untouched.  Everything is pure jnp and jit/shard-compatible.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp import design
from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.standards.base import FmParams, QamParams


def _chroma_band_edges(plan: ModemPlan) -> tuple[float, float]:
    ch = plan.cfg.chroma
    if isinstance(ch, QamParams):
        return ch.fsc - ch.chroma_band, ch.fsc + ch.chroma_band
    assert isinstance(ch, FmParams)
    from color_modem_tpu.modem.plan import SECAM_TAKEOFF_HALFWIDTH

    return (ch.bell_f0 - SECAM_TAKEOFF_HALFWIDTH,
            ch.bell_f0 + SECAM_TAKEOFF_HALFWIDTH)


def impair(
    plan: ModemPlan,
    comp: jax.Array,
    *,
    noise_sigma: float = 0.0,
    chroma_gain: float = 1.0,
    chroma_phase_deg: float = 0.0,
    ghost_delay_us: float = 0.0,
    ghost_gain: float = 0.0,
    key: jax.Array | None = None,
) -> jax.Array:
    """Apply channel impairments to a ``(..., L, N)`` composite block.

    Order models the physical path: multipath ghost (propagation), then
    differential chroma gain/phase (receiver chroma-path errors), then
    additive noise.
    """
    comp = comp.astype(jnp.float32)
    if ghost_gain != 0.0:
        if ghost_delay_us <= 0.0:
            raise ValueError("ghost_gain needs ghost_delay_us > 0")
        d = max(1, int(round(ghost_delay_us * 1e-6 * plan.fs)))
        lead, (l, n) = comp.shape[:-2], comp.shape[-2:]
        if d >= l * n:
            raise ValueError(
                f"ghost delay {ghost_delay_us} us = {d} samples exceeds the "
                f"block's {l * n}-sample line stream"
            )
        # delay along the concatenated line stream (active-lines time axis);
        # only the block's very first d samples lack a predecessor
        stream = comp.reshape(lead + (l * n,))
        delayed = jnp.concatenate(
            [jnp.zeros(lead + (d,), comp.dtype), stream[..., :-d]], axis=-1
        )
        comp = (stream + jnp.float32(ghost_gain) * delayed).reshape(
            lead + (l, n)
        )
    if chroma_gain != 1.0 or chroma_phase_deg != 0.0:
        f_lo, f_hi = _chroma_band_edges(plan)
        bpf = design.bandpass_taps(plan.fs, f_lo, f_hi, 129)
        cb = fir_same(comp, bpf)
        rest = comp - cb
        if chroma_phase_deg != 0.0:
            hil = design.hilbert_taps(plan.fs, f_lo, f_hi, 129)
            t = np.deg2rad(chroma_phase_deg)
            cb = np.float32(np.cos(t)) * cb + np.float32(np.sin(t)) * fir_same(
                cb, hil
            )
        comp = rest + jnp.float32(chroma_gain) * cb
    if noise_sigma > 0.0:
        if key is None:
            raise ValueError("noise_sigma > 0 requires a PRNG key")
        comp = comp + noise_sigma * jax.random.normal(
            key, comp.shape, dtype=jnp.float32
        )
    return comp
