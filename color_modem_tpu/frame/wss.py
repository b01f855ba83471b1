"""Widescreen signalling (WSS, line 23) — biphase group data (A.1+).

625-line broadcasts carried a 14-bit status word on line 23 (ETSI
EN 300 294): aspect-ratio label plus enhanced-service/subtitle/reserved
flags, each bit BIPHASE-coded (a '0' element run then a '1' run, or the
reverse) at a 5 MHz element rate so a cheap slicer can clock it.  This
module is that service for the frame layer, joining the caption
(:mod:`frame.vbi`) and teletext (:mod:`frame.teletext`) data lines.

Reference parity: beyond-reference (the upstream library has no VBI
services; SURVEY.md §2.1, mount empty §0.1).

Authentic structure, documented deviations:

* The aspect-ratio group uses the REAL EN 300 294 code table — 8
  odd-weight 4-bit words (odd parity is built into the codebook, giving
  single-error DETECTION) — and the real group sizes (4+4+3+3 = 14).
* Element rate is exactly ``330 * fh`` (5.156 MHz on 625/50) so element
  edges are closed-form on any sample grid — the real spec's 5.0 MHz
  crystal is not raster-locked; locking to fh is this framework's NCO
  philosophy (dsp/nco.py), and at 2.6 samples/element on the 13.5 MHz
  grid the 6-element biphase cells are still 15.7 samples wide.
* The run-in/start sequence is a raised-sine clock burst + fixed start
  code reusing the proven :mod:`frame.vbi` recovery structure rather
  than the spec's exact 29+24-element preamble bit pattern.

Decoding correlates each bit cell against the ±biphase template after
run-in clock/amplitude recovery — timing- and gain-invariant like the
other data lines, batched over lines.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp import design
from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.modem.plan import ModemPlan

TWO_PI = 2.0 * np.pi

N_BITS = 14
#: bits per group: aspect (A), enhanced services (B), subtitles (C),
#: reserved (D)
GROUPS = (4, 4, 3, 3)

#: EN 300 294 group-A aspect-ratio codebook (b0 first on the wire);
#: every word has odd weight — built-in odd parity.
ASPECT_CODES = {
    "4:3 full": (1, 0, 0, 0),
    "14:9 letterbox centre": (0, 0, 0, 1),
    "14:9 letterbox top": (0, 0, 1, 0),
    "16:9 letterbox centre": (1, 0, 1, 1),
    "16:9 letterbox top": (0, 1, 0, 0),
    ">16:9 letterbox centre": (1, 1, 0, 1),
    "14:9 full (shoot & protect)": (1, 1, 1, 0),
    "16:9 full (anamorphic)": (0, 1, 1, 1),
}
_ASPECT_DECODE = {v: k for k, v in ASPECT_CODES.items()}

#: start code between the clock run-in and the biphase data
_START = (1, 1, 1, 0, 0, 1)

#: elements per bit (biphase cell: 3 elements low/high then 3 inverted)
_EPB = 6

#: clock run-in length in bit periods
_RUN_IN_BITS = 5

#: data level in luma units (EN 300 294: 0.5 V over black)
LEVEL = 0.7


@dataclasses.dataclass(frozen=True)
class WssLayout:
    spe: float        # samples per element
    run_in: float     # run-in length, samples
    start: float      # start-code length, samples
    f_elem: float     # element rate, Hz


def wss_layout(plan: ModemPlan) -> WssLayout:
    f_elem = 330.0 * plan.cfg.fh
    spe = plan.fs / f_elem
    if spe < 2.0:
        raise ValueError(
            f"WSS needs >= 2 samples/element, fs={plan.fs/1e6:.2f} MHz "
            f"gives {spe:.2f}"
        )
    spb = spe * _EPB
    run_in = _RUN_IN_BITS * spb
    start = len(_START) * spe
    total = run_in + start + N_BITS * spb
    if total > plan.n_samples:
        raise ValueError(
            f"WSS needs {total:.0f} samples, line has {plan.n_samples}"
        )
    return WssLayout(spe=spe, run_in=run_in, start=start, f_elem=f_elem)


def wss_word(aspect: str = "4:3 full", enhanced: int = 0,
             subtitles: int = 0, reserved: int = 0) -> jax.Array:
    """Build the 14-bit status word. ``enhanced``/``subtitles``/
    ``reserved`` are raw group values (4/3/3 bits)."""
    if aspect not in ASPECT_CODES:
        raise ValueError(
            f"unknown aspect label {aspect!r}; one of "
            f"{sorted(ASPECT_CODES)}"
        )
    bits = list(ASPECT_CODES[aspect])
    for val, width in ((enhanced, 4), (subtitles, 3), (reserved, 3)):
        if not 0 <= val < (1 << width):
            raise ValueError(f"group value {val} exceeds {width} bits")
        bits.extend((val >> i) & 1 for i in range(width))
    return jnp.asarray(bits, jnp.int32)


def _shaping(plan: ModemPlan, lay: WssLayout) -> np.ndarray:
    # band-limit element edges; keep the run-in tone (at 1/spb) intact
    return design.lowpass_taps(plan.fs, 0.7 * lay.f_elem, 63)


def encode_wss(plan: ModemPlan, bits: jax.Array) -> jax.Array:
    """(..., 14) bits -> (..., N) line-23 waveform in luma units."""
    bits = jnp.asarray(bits)
    if bits.shape[-1] != N_BITS:
        raise ValueError(f"WSS carries {N_BITS} bits, got {bits.shape[-1]}")
    lay = wss_layout(plan)
    spb = lay.spe * _EPB
    m = np.arange(plan.n_samples, dtype=np.float64)
    # clock run-in: raised sine, one cycle per BIT period (the biphase
    # decoder needs bit timing, not element timing)
    in_run = m < lay.run_in
    run_wave = np.where(in_run, 0.5 * (1.0 - np.cos(TWO_PI * m / spb)), 0.0)
    # start code at element granularity
    el = np.floor((m - lay.run_in) / lay.spe).astype(np.int64)
    n_start = len(_START)
    sv = np.asarray(_START, np.float64)
    in_start = (m >= lay.run_in) & (el < n_start)
    start_wave = np.where(in_start, sv[np.clip(el, 0, n_start - 1)], 0.0)
    # biphase data: bit b occupies 6 elements — b b b ~b ~b ~b
    data_el = el - n_start
    bit_idx = data_el // _EPB
    half = (data_el % _EPB) >= (_EPB // 2)
    in_data = (data_el >= 0) & (bit_idx < N_BITS)
    sel = jnp.asarray(np.clip(bit_idx, 0, N_BITS - 1))
    b = bits[..., sel].astype(jnp.float32)
    cell = jnp.where(jnp.asarray(half), 1.0 - b, b)
    data_wave = jnp.where(jnp.asarray(in_data), cell, 0.0)
    fixed = jnp.asarray((run_wave + start_wave).astype(np.float32))
    wave = jnp.float32(LEVEL) * (fixed + data_wave)
    return fir_same(wave, tuple(_shaping(plan, lay)))


def decode_wss(plan: ModemPlan, line: jax.Array):
    """(..., N) received line -> ((..., 14) bits, (...,) margin).

    Clock/amplitude recovery off the run-in (as :mod:`frame.vbi`), then
    each bit correlates against the biphase template [+1]*3 ++ [-1]*3 at
    element granularity — the sign is the bit, |corr| the confidence."""
    lay = wss_layout(plan)
    spb = lay.spe * _EPB
    x = line.astype(jnp.float32)
    m = jnp.arange(plan.n_samples, dtype=jnp.float32)
    w = jnp.asarray(
        ((np.arange(plan.n_samples) >= 0.5 * spb)
         & (np.arange(plan.n_samples) < lay.run_in - 0.5 * spb)),
        jnp.float32,
    )
    ang = TWO_PI / spb * m
    zi = jnp.sum(w * x * -jnp.cos(ang), axis=-1)
    zq = jnp.sum(w * x * jnp.sin(ang), axis=-1)
    tau = -spb / TWO_PI * jnp.arctan2(zq, zi)
    amp = 2.0 * jnp.hypot(zi, zq) / jnp.sum(w)       # = LEVEL/2
    level = 2.0 * amp
    # sample each element's middle; first data element starts after the
    # run-in + start code
    base = lay.run_in + lay.start
    el_centers = (
        base
        + (jnp.arange(N_BITS * _EPB, dtype=jnp.float32) + 0.5) * lay.spe
        + tau[..., None]
    )
    idx = jnp.clip(jnp.round(el_centers).astype(jnp.int32), 0,
                   plan.n_samples - 1)
    xb = jnp.broadcast_to(x[..., None, :],
                          x.shape[:-1] + (N_BITS * _EPB, plan.n_samples))
    vals = jnp.take_along_axis(xb, idx[..., None], axis=-1)[..., 0]
    vals = vals.reshape(vals.shape[:-1] + (N_BITS, _EPB))
    tmpl = jnp.asarray([1.0] * (_EPB // 2) + [-1.0] * (_EPB // 2))
    corr = jnp.sum((vals - 0.5 * level[..., None, None]) * tmpl, axis=-1)
    bits = (corr > 0).astype(jnp.int32)
    margin = jnp.min(jnp.abs(corr), axis=-1) / jnp.maximum(
        _EPB * 0.5 * level, 1e-6
    )
    return bits, margin


def parse_wss(bits: jax.Array | np.ndarray) -> dict:
    """14 decoded bits -> status dict (host-side)."""
    b = [int(v) for v in np.asarray(bits).reshape(-1)]
    a = tuple(b[:4])
    aspect = _ASPECT_DECODE.get(a)
    out = {
        "aspect": aspect if aspect is not None else "invalid",
        "aspect_ok": aspect is not None,   # odd-weight codebook check
        "enhanced": sum(bit << i for i, bit in enumerate(b[4:8])),
        "subtitles": sum(bit << i for i, bit in enumerate(b[8:11])),
        "reserved": sum(bit << i for i, bit in enumerate(b[11:14])),
    }
    return out
