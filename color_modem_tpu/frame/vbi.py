"""Vertical-interval data services: caption-style NRZ data lines (A.1+).

Analog TV carried digital data on blanking-interval lines — EIA-608
closed captions on NTSC line 21 (a sine clock run-in, start bits, then 16
NRZ bits at ~32x the line rate), teletext on PAL/SECAM at higher rates.
This module provides that capability generically: a data-line waveform
generator and a correlating decoder with clock recovery, both pure jnp and
batched over lines (every (..., L) line decodes in parallel — the
reference-era loop over lines does not exist here either).

The frame layer models active lines, so data lines live wherever the user
puts them: replace any row of a composite block with ``encode_data_line``
output (a realistic use drops it into row 0, the first visible line).

Waveform (levels ride luma: 0 = blanking/black, ``level`` = data high):

    [ run-in: ``run_in_cycles`` of a raised sine at f_bit ][ start 001 ]
    [ n_bits NRZ bits, each 1/f_bit ]  ...rest of line at 0

The decoder quadrature-correlates the run-in to recover the bit clock's
phase and amplitude (so it rides through gain errors), then
integrate-and-dumps the middle 60% of each bit period.  Everything is
band-limited by a config-time FIR to fit the luma channel.
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


@dataclasses.dataclass(frozen=True)
class DataLineSpec:
    """Geometry of one data line on the active-sample grid."""

    f_bit: float          # bit rate, Hz (and run-in sine frequency)
    n_bits: int           # payload bits per line
    run_in_cycles: int    # clock run-in length, cycles of the run-in tone
    level: float          # data "1" amplitude in luma units
    start_bits: tuple     # framing pattern between run-in and payload
    #: run-in style.  False = a sine burst AT f_bit (EIA-608's real line-21
    #: run-in, fine at caption rates) — but it needs channel bandwidth
    #: ABOVE the bit rate, which no real channel offers at teletext rates.
    #: True = the alternating 10101010 NRZ run-in real WST transmits: its
    #: fundamental sits at f_bit/2, inside every channel that can carry
    #: the data at all, and one run-in cycle spans TWO bit periods.  The
    #: payload eye then tolerates spec-true (100 % cosine roll-off) pulse
    #: shaping — see _shaping_taps.
    run_in_alt: bool = False

    def samples_per_bit(self, fs: float) -> float:
        return fs / self.f_bit


def cc_pack(text: str) -> jax.Array:
    """Two characters -> the EIA-608 line payload: 16 bits, each byte
    7-bit ASCII + ODD parity, LSB first (the real line-21 framing)."""
    if len(text) != 2:
        raise ValueError(f"a caption line carries exactly 2 chars, got "
                         f"{len(text)}")
    bits = []
    for ch in text:
        v = ord(ch)
        if v > 0x7F:
            raise ValueError(f"EIA-608 is 7-bit: {ch!r}")
        data = [(v >> i) & 1 for i in range(7)]           # LSB first
        parity = 1 - (sum(data) % 2)                       # odd parity
        bits.extend(data + [parity])
    return jnp.asarray(bits, jnp.int32)


def cc_unpack(bits: jax.Array) -> tuple[str, bool]:
    """Inverse of :func:`cc_pack`: 16 decoded bits -> (2 chars, parity_ok).

    Host-side (tiny, called after the device decode); parity failure
    flags a transmission error the caption decoder would discard."""
    b = [int(v) for v in bits]
    chars, ok = [], True
    for k in range(2):
        byte = b[8 * k : 8 * k + 8]
        v = sum(bit << i for i, bit in enumerate(byte[:7]))
        ok = ok and (sum(byte) % 2 == 1)
        chars.append(chr(v))
    return "".join(chars), ok


def cc_spec(plan: ModemPlan, n_bits: int = 16) -> DataLineSpec:
    """EIA-608-style spec: clock at 32x the line rate (~0.503 MHz on NTSC),
    7-cycle run-in, start 001, 16 payload bits, 50-IRE data level."""
    return DataLineSpec(
        f_bit=32.0 * plan.cfg.fh,
        n_bits=n_bits,
        run_in_cycles=7,
        level=0.5,
        start_bits=(0, 0, 1),
    )


def teletext_spec(plan: ModemPlan, n_bits: int = 64) -> DataLineSpec:
    """Teletext-flavored spec at 222x the line rate (~3.5 MHz on PAL —
    half the real WST rate, chosen to keep >=3.8 samples/bit at the
    13.5 MHz studio grid; real WST's 444x fh needs ~27 MHz sampling)."""
    return DataLineSpec(
        f_bit=222.0 * plan.cfg.fh,
        n_bits=n_bits,
        run_in_cycles=8,
        level=0.5,
        start_bits=(1, 1, 0),
    )


def _layout(plan: ModemPlan, spec: DataLineSpec):
    spb = spec.samples_per_bit(plan.fs)
    # an alternating (1010...) run-in cycle spans TWO bit periods
    run_in = spec.run_in_cycles * spb * (2 if spec.run_in_alt else 1)
    start = len(spec.start_bits) * spb
    total = run_in + start + spec.n_bits * spb
    if total > plan.n_samples:
        raise ValueError(
            f"{spec.n_bits} bits at {spec.f_bit/1e6:.2f} MHz need "
            f"{total:.0f} samples, line has {plan.n_samples}"
        )
    if spb < 3.0:
        raise ValueError(
            f"{spec.f_bit/1e6:.2f} MHz is under 3 samples/bit at "
            f"fs={plan.fs/1e6:.2f} MHz — raise the line width"
        )
    return spb, run_in, start


def _shaping_taps(plan: ModemPlan, spec: DataLineSpec) -> np.ndarray:
    if spec.run_in_alt:
        # spec-true 100 % cosine roll-off pulse shaping (ETS 300 706 §6.2
        # transmits WST this way): spectrum cos^2(pi f / 2 f_bit), zero
        # beyond f_bit, -6 dB at the f_bit/2 Nyquist point — zero ISI at
        # the bit centers, and ~all the energy below ~0.7 f_bit, so the
        # line survives the real-world ~5-6 MHz video channels (e.g. the
        # satellite sound multiplex's video low-pass) that annihilate
        # rectangular NRZ at 6.94 Mbit/s
        def rc(f):
            fa = np.minimum(np.abs(np.asarray(f, np.float64)), spec.f_bit)
            return (np.cos(0.5 * np.pi * fa / spec.f_bit) ** 2
                    ).astype(np.complex128)

        return design.freq_sampled_taps(plan.fs, rc, 63)
    # sine-burst run-in (EIA-608 style): the clock tone sits AT f_bit, so
    # the cutoff must stay above it — slicing needs its amplitude intact
    # (a 0.8x cutoff killed clock recovery)
    return design.lowpass_taps(plan.fs, 1.4 * spec.f_bit, 63)


def encode_data_line(
    plan: ModemPlan, spec: DataLineSpec, bits: jax.Array
) -> jax.Array:
    """(..., n_bits) 0/1 -> (..., N) data-line waveform in luma units."""
    bits = jnp.asarray(bits)
    if bits.shape[-1] != spec.n_bits:
        raise ValueError(f"expected {spec.n_bits} bits, got {bits.shape[-1]}")
    spb, run_in, start = _layout(plan, spec)
    m = np.arange(plan.n_samples, dtype=np.float64)
    in_run = m < run_in
    if spec.run_in_alt:
        # the real WST run-in: alternating 1,0,1,0 NRZ bit cells (a square
        # at f_bit/2; the shaping FIR below band-limits it to ~its
        # fundamental, which peaks at the even bits' centers)
        clock = (np.floor(m / spb).astype(np.int64) % 2 == 0).astype(
            np.float64
        )
    else:
        # sine-burst run-in at f_bit, one cycle per bit, peaks at centers
        clock = 0.5 * (1.0 - np.cos(TWO_PI * m / spb))
    run_wave = np.where(in_run, clock, 0.0)
    # start + payload bit cells
    cell = np.floor((m - run_in) / spb).astype(np.int64)
    n_start = len(spec.start_bits)
    start_vals = np.asarray(spec.start_bits, np.float64)
    in_start = (m >= run_in) & (cell < n_start)
    start_wave = np.where(in_start, start_vals[np.clip(cell, 0, n_start - 1)],
                          0.0)
    payload_cell = cell - n_start
    in_pay = (m >= run_in) & (payload_cell >= 0) & (
        payload_cell < spec.n_bits
    )
    sel = jnp.asarray(np.clip(payload_cell, 0, spec.n_bits - 1))
    pay_wave = jnp.where(
        jnp.asarray(in_pay), bits[..., sel].astype(jnp.float32), 0.0
    )
    fixed = jnp.asarray((run_wave + start_wave).astype(np.float32))
    wave = jnp.float32(spec.level) * (fixed + pay_wave)
    return fir_same(wave, tuple(_shaping_taps(plan, spec)))


def decode_data_line(
    plan: ModemPlan, spec: DataLineSpec, line: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(..., N) received line -> ((..., n_bits) bits, (...,) margin).

    Clock recovery: quadrature correlation of the run-in window at
    ``f_bit`` gives the clock phase (sub-sample timing) and amplitude (the
    slicing threshold — so differential gain cannot break slicing).
    ``margin`` is the worst per-bit distance from the threshold in units
    of the data level: 0.5 is a perfect eye, <= 0 means a bit error is
    likely.
    """
    spb, run_in, start = _layout(plan, spec)
    x = line.astype(jnp.float32)
    m = jnp.arange(plan.n_samples, dtype=jnp.float32)
    # guard half a bit at each end of the run-in window: the shaping FIR
    # smears the leading edge and the start bits smear backwards
    w = jnp.asarray(
        ((np.arange(plan.n_samples) >= 0.5 * spb)
         & (np.arange(plan.n_samples) < run_in - 0.5 * spb)),
        jnp.float32,
    )
    if spec.run_in_alt:
        # the 1010... run-in's fundamental is sin(pi m / spb) (period 2
        # bits, peaks at the even bits' centers m = (2k+1/2) spb); a line
        # DELAYED by t correlates to (zi, zq) = C (cos, sin)(pi t / spb).
        # The 2-bit phase ambiguity is harmless: every channel timing
        # error this framework models is well under one bit period.
        ang = np.pi / spb * m
        zi = jnp.sum(w * x * jnp.sin(ang), axis=-1)
        zq = jnp.sum(w * x * -jnp.cos(ang), axis=-1)
        tau = spb / np.pi * jnp.arctan2(zq, zi)  # + = line arrived late
        # |fundamental| of the level/0 square is (2/pi)*level, and the
        # spec's OWN pulse shaping attenuates f_bit/2 by a known factor
        # (the 100% roll-off cosine spectrum is -6 dB there) while data
        # runs ride its unit DC gain — divide the calibration by the
        # design response so the slicing threshold lands mid-eye
        taps = _shaping_taps(plan, spec)
        k = np.arange(len(taps), dtype=np.float64) - (len(taps) - 1) / 2
        h_half = float(np.sum(
            np.asarray(taps, np.float64)
            * np.cos(TWO_PI * (0.5 * spec.f_bit / plan.fs) * k)
        ))
        amp = 2.0 * jnp.hypot(zi, zq) / jnp.sum(w)
        level = (np.pi / 2.0 / max(h_half, 1e-6)) * amp
    else:
        # run-in phase: clock = -cos(2 pi m / spb) around its mean; a line
        # DELAYED by t correlates to (zi, zq) = C (cos, -sin)(2 pi t / spb)
        ang = TWO_PI / spb * m
        zi = jnp.sum(w * x * -jnp.cos(ang), axis=-1)
        zq = jnp.sum(w * x * jnp.sin(ang), axis=-1)
        tau = -spb / TWO_PI * jnp.arctan2(zq, zi)  # + = line arrived late
        amp = 2.0 * jnp.hypot(zi, zq) / jnp.sum(w)  # = level/2
        level = 2.0 * amp
    n_start = len(spec.start_bits)
    centers = (
        run_in
        + (n_start + jnp.arange(spec.n_bits, dtype=jnp.float32) + 0.5) * spb
        + tau[..., None]
    )
    # integrate-and-dump: mean over the middle 60% of each bit period —
    # except for cosine-shaped (run_in_alt) pulses, whose zero-ISI point
    # is the bit CENTER: integrate only the middle 30% there (a wide
    # window reads the neighbor pulses' 0.23-level tails at its edges and
    # measured a 0.10 eye where the narrow window reads 0.24)
    frac = 0.15 if spec.run_in_alt else 0.3
    offs = jnp.arange(
        -np.floor(frac * spb), np.floor(frac * spb) + 1.0, dtype=jnp.float32
    )
    idx = jnp.clip(
        jnp.round(centers[..., None] + offs).astype(jnp.int32),
        0, plan.n_samples - 1,
    )
    xb = jnp.broadcast_to(
        x[..., None, :], x.shape[:-1] + (spec.n_bits, plan.n_samples)
    )
    vals = jnp.mean(jnp.take_along_axis(xb, idx, axis=-1), axis=-1)
    thresh = level[..., None] * 0.5
    bits = (vals > thresh).astype(jnp.int32)
    margin = jnp.min(jnp.abs(vals - thresh), axis=-1) / jnp.maximum(
        level, 1e-6
    )
    return bits, margin
