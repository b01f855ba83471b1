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
* **true DIFFERENTIAL gain/phase** — the textbook nonlinearities the
  static versions approximate: chroma gain/phase varying WITH the
  instantaneous luma level (transmitter amplifiers compress near white).
  Differential phase is the distortion PAL was invented for: the V-switch
  turns it into slight saturation loss where NTSC shows luma-tracking hue
  shifts,
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


def _stream_delay(x: jax.Array, d: int) -> jax.Array:
    """Delay a (..., L, N) block ``d`` samples along the CONCATENATED line
    stream (the active-video time axis): content crosses line boundaries
    like a real raster; only the block's first ``d`` samples lack a
    predecessor (zero-filled)."""
    lead, (l, n) = x.shape[:-2], x.shape[-2:]
    stream = x.reshape(lead + (l * n,))
    return jnp.concatenate(
        [jnp.zeros(lead + (d,), x.dtype), stream[..., :-d]], axis=-1
    ).reshape(lead + (l, n))


def vhs_playback(
    plan: ModemPlan,
    comp: jax.Array,
    *,
    luma_bw: float = 3.0e6,
    chroma_bw: float = 0.4e6,
    chroma_delay_us: float = 0.4,
) -> jax.Array:
    """VHS "color-under" playback signature on a (..., L, N) composite.

    The tape records luma as FM (usable bandwidth ~3 MHz SP / ~2.4 LP) and
    heterodynes chroma down to ~629 kHz with ~±0.4 MHz of bandwidth, then
    back up at playback.  With ideal oscillators the down/up conversion
    composes to a bandwidth narrowing, so the honest composite-domain model
    is: luma low-passed to ``luma_bw``, chroma re-band-limited to
    ``fsc ± chroma_bw`` (the characteristic color smear) and delayed by the
    color-under chain's group delay (``chroma_delay_us`` — the classic
    right-shifted color fringe).  Tape timing jitter is a separate,
    composable effect (:mod:`frame.timebase`); note real color-under makes
    CHROMA phase jitter-immune while luma keeps the wobble.
    """
    comp = comp.astype(jnp.float32)
    f_lo, f_hi = _chroma_band_edges(plan)
    cb = fir_same(comp, design.bandpass_taps(plan.fs, f_lo, f_hi, 129))
    luma = comp - cb
    luma = fir_same(luma, design.lowpass_taps(plan.fs, luma_bw, 129))
    ch = plan.cfg.chroma
    fc = ch.fsc if isinstance(ch, QamParams) else ch.bell_f0
    cb = fir_same(
        cb,
        design.bandpass_taps(plan.fs, fc - chroma_bw, fc + chroma_bw, 193),
    )
    d = int(round(chroma_delay_us * 1e-6 * plan.fs))
    if d:
        cb = _stream_delay(cb, d)
        if isinstance(ch, QamParams):
            # the playback up-converter re-locks carrier phase (burst/
            # crystal), so only the ENVELOPE is delayed: undo the raw
            # delay's carrier phase retard of 2 pi fc d / fs
            theta = 2.0 * np.pi * fc * d / plan.fs
            hil = design.hilbert_taps(
                plan.fs, fc - chroma_bw, fc + chroma_bw, 129
            )
            cb = np.float32(np.cos(theta)) * cb - np.float32(
                np.sin(theta)
            ) * fir_same(cb, hil)
    return luma + cb


def impair(
    plan: ModemPlan,
    comp: jax.Array,
    *,
    noise_sigma: float = 0.0,
    chroma_gain: float = 1.0,
    chroma_phase_deg: float = 0.0,
    diff_gain: float = 0.0,
    diff_phase_deg: float = 0.0,
    ghost_delay_us: float = 0.0,
    ghost_gain: float = 0.0,
    key: jax.Array | None = None,
) -> jax.Array:
    """Apply channel impairments to a ``(..., L, N)`` composite block.

    Order models the physical path: multipath ghost (propagation), then
    chroma-path gain/phase errors — static (``chroma_gain`` /
    ``chroma_phase_deg``) and luma-tracking (``diff_gain`` /
    ``diff_phase_deg``, the full error at 100% luma, scaling linearly
    with the local luma level) — then additive noise.
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
        comp = comp + jnp.float32(ghost_gain) * _stream_delay(comp, d)
    if (chroma_gain != 1.0 or chroma_phase_deg != 0.0
            or diff_gain != 0.0 or diff_phase_deg != 0.0):
        f_lo, f_hi = _chroma_band_edges(plan)
        bpf = design.bandpass_taps(plan.fs, f_lo, f_hi, 129)
        cb = fir_same(comp, bpf)
        rest = comp - cb  # ~ the luma path (plus sync/burst if rastered)
        # per-sample phase/gain: static term + luma-tracking term; the
        # local luma estimate is the chroma-free remainder, smoothed so
        # carrier leakage does not modulate the error at fsc
        if diff_gain != 0.0 or diff_phase_deg != 0.0:
            luma = fir_same(
                rest, design.lowpass_taps(plan.fs, 0.5e6, 63)
            )
            luma = jnp.clip(luma, 0.0, 1.0)
        else:
            luma = 0.0
        t = jnp.float32(np.deg2rad(chroma_phase_deg)) + jnp.float32(
            np.deg2rad(diff_phase_deg)
        ) * luma
        g = jnp.float32(chroma_gain) * (1.0 + jnp.float32(diff_gain) * luma)
        if chroma_phase_deg != 0.0 or diff_phase_deg != 0.0:
            hil = design.hilbert_taps(plan.fs, f_lo, f_hi, 129)
            cb = jnp.cos(t) * cb + jnp.sin(t) * fir_same(cb, hil)
        comp = rest + g * cb
    if noise_sigma > 0.0:
        if key is None:
            raise ValueError("noise_sigma > 0 requires a PRNG key")
        comp = comp + noise_sigma * jax.random.normal(
            key, comp.shape, dtype=jnp.float32
        )
    return comp
