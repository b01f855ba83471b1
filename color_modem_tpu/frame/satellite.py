"""Satellite FM transmission (beyond-reference): wideband video FM at IF.

Terrestrial analog TV is VSB-AM (frame/rf.py); satellite TV was FM — the
other half of the transmission story, and the channel the MAC family
(modem/mac.py) was actually designed for (D2-MAC on DBS transponders).
SECAM/PAL composites also flew this way (the classic Astra/Gorizont
downlinks).  The chain simulated here is the standard one:

    baseband -> CCIR-405-shaped pre-emphasis -> energy dispersal ->
    wideband FM onto an IF carrier (Carson bandwidth inside a 27-36 MHz
    transponder) -> AWGN channel at some CNR ->
    receiver band-pass -> quadrature FM discriminator -> de-emphasis ->
    (clamp removes dispersal at the next layer: MAC's clamp period or a
    rastered composite's back porch)

The reference has none of this (SURVEY.md §2.1 stops at the composite);
constants are literature-shaped and documented inline.

TPU-first design, mirroring frame/rf.py's conventions:

* The IF carrier is pinned to EXACTLY fs_rf/4: its cos/sin are the
  repeating 4-sample patterns [1,0,-1,0] / [0,1,0,-1] — the mixers are
  exact multiplies with no accumulating phase state, and every line/frame
  starts at the same carrier phase by construction.
* FM phase is the midpoint-rule integral of the deviation only (the
  carrier part is the exact ramp above), per FRAME over the contiguous
  row-major stream: one ``cumsum`` per frame, no cross-frame state —
  frames stay DP-shardable.  Worst-case deviation phase is ~2.4 krad per
  *line* and grows with DC content over the stream; the per-line carry is
  re-wrapped mod 2pi line by line so float32 never sees more than one
  line's unwrapped magnitude (the SECAM trick from modem/plan.py, scaled
  up one level).
* All filters are design-time FIRs applied as pow2-FFT stream
  convolutions (dsp/apply.fir_same_fft) — line-seam-free, one HBM pass,
  FFT lengths always a power of two (backend-safe per CLAUDE.md).
* Discrimination is the symmetric phase difference
  ``angle(z[n+1] conj(z[n-1])) * fs/(4 pi)`` — no unwrap, no Hilbert, and
  the symmetric form reads f_inst at exactly sample n (the same
  half-sample argument as the SECAM decoder).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp import design
from color_modem_tpu.dsp.apply import fir_same_fft

TWO_PI = 2.0 * np.pi


def preemph_response(f, f1: float, f2: float, g0: float):
    """CCIR Rec. 405-shaped video pre-emphasis for FM: attenuate LF,
    boost HF, crossing unity in between.

    |P(f)|^2 = g0^2 (1 + (f/f1)^2) / (1 + (f/f2)^2) with f2 = (1/g0) f1
    gives LF gain g0 and HF gain g0 f2/f1 = 1/g0 — the classic +-~7 dB
    swing at g0 ~ 0.45.  Zero phase (the real 405 network's phase is
    absorbed by its inverse at the receiver; modeling the pair as
    zero-phase keeps each FIR individually delay-free, like SECAM's
    emphasis pair in dsp/design).
    """
    f = np.asarray(f, dtype=np.float64)
    mag = g0 * np.sqrt((1.0 + (f / f1) ** 2) / (1.0 + (f / f2) ** 2))
    return mag.astype(np.complex128)


@dataclasses.dataclass(frozen=True, eq=False)
class SatPlan:
    """Host-side constants for one (baseband geometry) satellite link."""

    base_fs: float            # baseband sample rate (Hz)
    n_base: int               # baseband samples per row
    r: int                    # RF oversampling factor (fs_rf = r * base_fs)
    fs_rf: float
    n_rf: int                 # RF samples per row = r * n_base
    deviation: float          # Hz per video unit
    center: float             # video value mapped to the carrier rest freq
    dispersal: float          # energy-dispersal amplitude, video units (pk)
    total_lines: int          # dispersal period (one frame)
    interp_taps: np.ndarray   # zero-stuff anti-image LPF (RF rate)
    rx_taps: np.ndarray       # receiver transponder band-pass (RF rate)
    iq_taps: np.ndarray       # post-mixer I/Q low-pass (RF rate)
    dec_taps: np.ndarray      # pre-decimation low-pass (RF rate)
    pre_taps: np.ndarray      # pre-emphasis (baseband rate)
    de_taps: np.ndarray       # de-emphasis (baseband rate)


def make_sat_plan(
    base_fs: float,
    n_base: int,
    *,
    r: int = 4,
    deviation: float = 12.0e6,
    center: float = 0.5,
    dispersal: float = 0.0,
    total_lines: int = 625,
    f_emph: float = 1.0e6,
    g_emph: float = 0.45,
) -> SatPlan:
    """Design the satellite link for a given baseband geometry.

    Defaults: r=4 puts the carrier at exactly fs_rf/4 (e.g. 20.25 MHz IF
    over the 20.25 MHz MAC baseband, fs_rf = 81 MHz); deviation 12 MHz per
    video unit = +-6 MHz peak around ``center``, Carson bandwidth
    2*(6 + f_base) — a 27-36 MHz transponder for the video basebands here.
    ``dispersal`` > 0 adds the frame-synchronous triangular energy
    dispersal (in video units; removed by the NEXT layer's clamp — MAC's
    clamp period or a raster's porch — not by this module).
    """
    fs_rf = r * base_fs
    fc = fs_rf / 4.0
    f_base = 0.5 * base_fs
    bw = 2.0 * (deviation * max(center, 1.0 - center) + f_base)  # Carson
    bw = min(bw, 2.0 * fc - 2.0e6)  # keep the band off DC/Nyquist
    ntaps_rf = 4 * design.DEFAULT_NTAPS + 1   # RF-rate filters: same time
    #                                           span as a 129-tap baseband FIR

    interp = design.lowpass_taps(fs_rf, 0.5 * base_fs * 0.96, ntaps_rf)
    rx = design.freq_sampled_taps(
        fs_rf,
        lambda f: design.raised_cosine_bandpass_response(
            f, fc - 0.5 * bw, fc + 0.5 * bw, 1.0e6
        ),
        ntaps_rf,
    )
    iq = design.lowpass_taps(fs_rf, 0.5 * bw, ntaps_rf)
    dec = design.lowpass_taps(fs_rf, 0.5 * base_fs * 0.96, ntaps_rf)
    f1 = f_emph
    f2 = f1 / g_emph
    pre = design.freq_sampled_taps(
        base_fs, lambda f: preemph_response(f, f1, f2, g_emph)
    )
    de = design.freq_sampled_taps(
        base_fs, lambda f: 1.0 / preemph_response(f, f1, f2, g_emph)
    )
    return SatPlan(
        base_fs=base_fs, n_base=n_base, r=r, fs_rf=fs_rf, n_rf=r * n_base,
        deviation=deviation, center=center, dispersal=dispersal,
        total_lines=total_lines,
        interp_taps=interp, rx_taps=rx, iq_taps=iq, dec_taps=dec,
        pre_taps=pre, de_taps=de,
    )


def _carrier_patterns(n: int):
    """cos / sin of the exact fs/4 carrier: repeating [1,0,-1,0] / [0,1,0,-1]."""
    c = jnp.tile(jnp.asarray([1.0, 0.0, -1.0, 0.0], jnp.float32), n // 4)
    s = jnp.tile(jnp.asarray([0.0, 1.0, 0.0, -1.0], jnp.float32), n // 4)
    return c, s


def dispersal_offset(sp: SatPlan, gline: jax.Array) -> jax.Array:
    """Frame-synchronous triangular energy dispersal, video units (..., L).

    The real dispersal is a 25 Hz triangle; per line that is a triangle
    over the ``total_lines`` of each frame — closed form of the absolute
    line index, so chunked video runs stay chunk-size independent.
    """
    if sp.dispersal == 0.0:
        return jnp.zeros(gline.shape, jnp.float32)
    ph = (gline % (2 * sp.total_lines)).astype(jnp.float32) / sp.total_lines
    tri = 1.0 - jnp.abs(1.0 - ph) * 2.0  # -1 -> +1 -> -1 over 2 frames
    return jnp.float32(sp.dispersal) * tri


#: Stream-edge margin at the BASEBAND rate: every stream filter here
#: (pre/de-emphasis 129 taps at base rate, interp/dec 517 taps at 4x =
#: ~65 base samples of half-width) has its warm-up inside 256 samples.
#: Zero edges are not "blanking" in this model — the stream is active
#: video end to end, so an unpadded stream filter visibly clips the first
#: line (measured 0.4+ absolute error on line 0's first samples, i.e. the
#: MAC data burst).  256 * r is a multiple of 4: the fs/4 mixer patterns
#: and the decimation grid stay aligned across the crop.
_EDGE_PAD = 256


def _wrap_pad(s: jax.Array, p: int) -> jax.Array:
    """Circular (wrap-around) edge extension along the stream axis.

    The frame is modulated as ONE PERIOD of a periodic signal (the FM
    phase is closed over the frame in :func:`fm_modulate`, and the fs/4
    carrier wraps exactly because the stream length is a multiple of 4),
    so the true history of sample 0 IS the end of the stream — wrap
    padding gives every stream filter its exact neighborhood instead of a
    reflected approximation.  A real transmission is continuous (line 0
    follows the previous frame's last line); periodicity is this model's
    equivalent, with no privileged cold-start sample anywhere.
    """
    return jnp.concatenate([s[..., -p:], s, s[..., :p]], axis=-1)


def fm_modulate(sp: SatPlan, base: jax.Array, gline=None) -> jax.Array:
    """Baseband (B, L, N) video units -> FM signal (B, L, N*r) at IF.

    Pre-emphasis at the baseband rate, zero-stuff interpolation to the RF
    rate, midpoint-rule deviation integral per frame (line-carry wrapped
    mod 2pi, see module docstring), exact fs/4 carrier.  Stream filters
    run on reflect-padded streams (see ``_EDGE_PAD``).
    """
    b, l, n = base.shape
    if n != sp.n_base:
        raise ValueError(f"rows have {n} samples, plan expects {sp.n_base}")
    pb = _EDGE_PAD
    v = fir_same_fft(
        _wrap_pad(base.astype(jnp.float32).reshape(b, l * n), pb),
        sp.pre_taps,
    )[..., pb : pb + l * n].reshape(b, l, n)
    if gline is not None:
        # dispersal enters at the FM modulator input (after pre-emphasis),
        # matching the real chain; the receiver's de-emphasis scales a
        # per-line DC by g0 * (1/g0) = 1, so the next layer's clamp sees
        # the full dispersal offset and removes it exactly
        v = v + dispersal_offset(sp, gline)[..., None]
    # zero-stuff + anti-image LPF (gain r restores amplitude), one pass;
    # the PADDED baseband is stuffed so the prefix keeps the stuffing grid
    vp = _wrap_pad(v.reshape(b, l * n), pb)
    z = jnp.zeros(vp.shape + (sp.r,), jnp.float32).at[..., 0].set(sp.r * vp)
    v_rf = fir_same_fft(
        z.reshape(b, (l * n + 2 * pb) * sp.r), sp.interp_taps
    )[..., pb * sp.r : pb * sp.r + l * sp.n_rf]
    v_rf = v_rf.reshape(b, l, sp.n_rf)

    # midpoint-rule FM integral of the DEVIATION (carrier = exact ramp):
    # per-line cumsum (<= ~2.4 krad unwrapped) + mod-2pi line carry
    dphi = (TWO_PI * sp.deviation / sp.fs_rf) * (
        v_rf - jnp.float32(sp.center)
    )
    # close the phase over the frame: distribute the (mod-2pi) residual of
    # the total deviation phase across all samples, so the frame is ONE
    # PERIOD of a periodic FM signal and _wrap_pad is exact at both ends.
    # The correction is < pi/n_total rad/sample = a < fs_rf/(2 n_total)
    # ~ 160 Hz carrier bias (vs 12 MHz/unit deviation): ~1e-5 video units,
    # and the downstream clamp removes line DC anyway.
    ls0 = jnp.sum(dphi, axis=-1)                            # (B, L)
    tot = jnp.cumsum(ls0 % TWO_PI, axis=-1)[..., -1:] % TWO_PI  # (B, 1)
    tot = jnp.where(tot > jnp.pi, tot - TWO_PI, tot)
    dphi = dphi - (tot / jnp.float32(l * sp.n_rf))[..., None]
    line_sum = jnp.sum(dphi, axis=-1)                       # (B, L)
    carry = jnp.cumsum(line_sum % TWO_PI, axis=-1) % TWO_PI  # (B, L)
    carry = jnp.concatenate(
        [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1
    )
    phi = jnp.cumsum(dphi, axis=-1) - 0.5 * dphi + carry[..., None]

    cpat, spat = _carrier_patterns(sp.n_rf)
    cpat = jnp.tile(cpat, l).reshape(l, sp.n_rf)
    spat = jnp.tile(spat, l).reshape(l, sp.n_rf)
    # cos(ramp + phi) = cos(ramp) cos(phi) - sin(ramp) sin(phi), with the
    # exact-pattern ramp: each term is a single VPU multiply
    return cpat * jnp.cos(phi) - spat * jnp.sin(phi)


def fm_demodulate(sp: SatPlan, rf: jax.Array) -> jax.Array:
    """FM signal (B, L, N*r) -> baseband (B, L, N) video units.

    Receiver band-pass, exact fs/4 quadrature mixers, I/Q low-pass,
    symmetric phase-difference discriminator, decimation, de-emphasis.
    Dispersal (if transmitted) is still present in the output — the next
    layer's clamp removes it, as in the real receiver.
    """
    b, l, n_rf = rf.shape
    if n_rf != sp.n_rf:
        raise ValueError(f"rows have {n_rf} RF samples, plan expects {sp.n_rf}")
    # Stream-edge treatment: a zero edge means zero CARRIER, and a dead
    # carrier makes the discriminator spray wideband noise that the
    # decimation LPF smears into the first line — line 0's data burst sits
    # exactly there (measured: its sync word is the first casualty under
    # channel noise).  A real receiver is continuously locked and never
    # sees a carrier start.  Two-stage padding, because the two signal
    # domains reflect differently:
    #  * the raw RF stream is reflect-padded only through the band-pass
    #    (a reflected fs/4 carrier is still an in-band carrier) and
    #    cropped before mixing — the mixer needs its exact pattern phase,
    #    which a reflected carrier does not preserve;
    #  * the mixed I/Q BASEBANDS are smooth (bandwidth <= bw/2), so value-
    #    continuous reflection is valid there and warms up the I/Q, dec
    #    and discriminator chain; cropped after.
    # pad % (4*r) == 0 keeps the fs/4 patterns and decimation grid aligned.
    pad = _EDGE_PAD * sp.r

    stream = rf.astype(jnp.float32).reshape(b, l * n_rf)
    x = fir_same_fft(_wrap_pad(stream, pad), sp.rx_taps)
    x = x[..., pad : pad + l * n_rf]

    cpat, spat = _carrier_patterns(l * n_rf)
    i0 = x * (2.0 * cpat)
    q0 = x * (-2.0 * spat)
    i = fir_same_fft(_wrap_pad(i0, pad), sp.iq_taps)
    q = fir_same_fft(_wrap_pad(q0, pad), sp.iq_taps)

    # symmetric discriminator: angle(z[n+1] conj(z[n-1])) * fs / (4 pi),
    # edge-held so row 0 / row L-1 stream ends stay finite
    ip = jnp.concatenate([i[..., 1:], i[..., -1:]], axis=-1)
    im = jnp.concatenate([i[..., :1], i[..., :-1]], axis=-1)
    qp = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
    qm = jnp.concatenate([q[..., :1], q[..., :-1]], axis=-1)
    re = ip * im + qp * qm
    imag = qp * im - ip * qm
    f_dev = jnp.arctan2(imag, re) * jnp.float32(sp.fs_rf / (2.0 * TWO_PI))

    v = f_dev / jnp.float32(sp.deviation) + jnp.float32(sp.center)
    v = fir_same_fft(v, sp.dec_taps)
    v = v[..., pad : pad + l * n_rf][..., :: sp.r]           # crop + decimate
    v = fir_same_fft(_wrap_pad(v, _EDGE_PAD), sp.de_taps)  # de-emphasis
    v = v[..., _EDGE_PAD : _EDGE_PAD + l * sp.n_base]
    return v.reshape(b, l, sp.n_base)


def noise_sigma(sp: SatPlan, cnr_db: float) -> float:
    """White-noise sigma for a given carrier-to-noise ratio.

    CNR is referenced to the noise power inside the receiver band-pass
    (the convention link budgets use): carrier power is 1/2 (unit cos),
    the band-pass passes ~bw/fs_rf of white noise power, so
    sigma^2 = (1/2) / CNR / (bw_fraction).  Host design-time math, so
    callers (e.g. the chunked video runner) can key their own per-frame
    noise realizations.
    """
    H = np.fft.rfft(np.asarray(sp.rx_taps), n=1 << 15)
    bw_frac = float(np.sum(np.abs(H) ** 2) / len(H) / np.max(np.abs(H)) ** 2)
    cnr = 10.0 ** (cnr_db / 10.0)
    return float(np.sqrt(0.5 / cnr / max(bw_frac, 1e-6)))


def awgn(sp: SatPlan, rf: jax.Array, key, cnr_db: float) -> jax.Array:
    """Add channel noise at a given carrier-to-noise ratio."""
    sigma = noise_sigma(sp, cnr_db)
    return rf + sigma * jax.random.normal(key, rf.shape, rf.dtype)


def sat_roundtrip(sp: SatPlan, base: jax.Array, gline=None,
                  key=None, cnr_db: float | None = None) -> jax.Array:
    rf = fm_modulate(sp, base, gline)
    if cnr_db is not None:
        rf = awgn(sp, rf, key, cnr_db)
    return fm_demodulate(sp, rf)
