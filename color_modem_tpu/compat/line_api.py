"""Reference-compatible per-line modem API (SURVEY.md §1 L2, C1-C6).

The reference's central protocol [MEM-H]:

    modem.modulate(frame, line, r, g, b)      # 3x(N,) scanline -> (N,) composite
    modem.demodulate(frame, line, composite)  # (N,) composite -> 3x(N,)

This module provides that exact protocol — ``NtscModem``, ``PalModem``,
``SecamModem``, ``NiirModem`` plus the wrapper classes ``SimpleCombModem``,
``Simple3DCombModem`` and ``ColorAveragingModem`` (recalled upstream names,
SURVEY.md C6 [MEM-M]) — as thin stateful shims over the vectorized block
functions, so a user of the reference can port line-level code unchanged.

Cross-line state (the reference keeps it as instance attributes [MEM-M]) is
streaming/causal here: the first line of a stream pairs with itself, where
the batch pipeline reflects to line 1 — so the first demodulated line can
differ from frame/pipeline.py; all subsequent lines match it exactly
(tests/test_compat.py).  ``Simple3DCombModem`` needs the *next* line
(non-causal, A.6) and therefore carries ``latency = 1``: output n corresponds
to input line n-1.  The batch pipeline has none of these seams — prefer it
for whole frames.

Lines are processed on-device as (1, N) blocks through jitted closures
(compiled once per modem instance); this layer is an API-parity feature, not
the performance path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.dsp.colorimetry import apply_mat3, clamp01
from color_modem_tpu.modem import niir as niir_mod
from color_modem_tpu.modem import qam, secam as secam_mod
from color_modem_tpu.modem.plan import ModemPlan, make_plan
from color_modem_tpu.standards import NIIR, NTSC, PAL, SECAM
from color_modem_tpu.frame.pipeline import encode_block


def _g(plan: ModemPlan, frame: int, line: int) -> int:
    return frame * plan.cfg.total_lines + line


class _LineModemBase:
    """Shared protocol plumbing: jitted single-line closures + colorimetry."""

    latency = 0

    def __init__(self, plan: ModemPlan):
        self.plan = plan
        self._encode = jax.jit(
            lambda rgb, g: encode_block(plan, rgb, g)
        )
        self._to_rgb = jax.jit(
            lambda ycc: clamp01(apply_mat3(plan.ycc_to_rgb, ycc))
        )

    # -- encode: line-local for every standard ------------------------------
    def modulate(self, frame: int, line: int, r, g, b) -> np.ndarray:
        """3x(N,) scanline -> (N,) composite (reference protocol)."""
        rgb = jnp.stack(
            [jnp.asarray(r), jnp.asarray(g), jnp.asarray(b)]
        ).astype(jnp.float32)[None, :, None, :]          # (1, 3, 1, N)
        gl = jnp.asarray([[_g(self.plan, frame, line)]], jnp.int32)
        return np.asarray(self._encode(rgb, gl))[0, 0]

    def demodulate(self, frame: int, line: int, composite) -> tuple:
        y, c1, c2 = self.demodulate_components(frame, line, composite)
        ycc = jnp.stack([jnp.asarray(y), jnp.asarray(c1), jnp.asarray(c2)])
        rgb = np.asarray(self._to_rgb(ycc[None, :, None, :]))[0, :, 0]
        return rgb[0], rgb[1], rgb[2]

    def reset(self) -> None:
        """Drop cross-line streaming state (start of a new image/field)."""


class QamLineModem(_LineModemBase):
    """NTSC/PAL/NIIR per-line modem with the notch separation (C1-C3, C5)."""

    def __init__(self, plan: ModemPlan):
        super().__init__(plan)

        def _sep(comp):
            return qam.separate_notch(plan, comp)

        def _demod(cb, gl):
            return qam.demodulate_carrier(plan, cb, gl)

        self._sep = jax.jit(_sep)
        self._demod = jax.jit(_demod)
        p = plan.cfg.chroma
        self._is_niir = p.reference_amplitude is not None
        self._prev_z = None  # NIIR: previous line's (c1, c2) measurement

    def reset(self) -> None:
        self._prev_z = None

    # hooks reused by the comb/averaging wrappers
    def separate(self, composite):
        comp = jnp.asarray(composite, jnp.float32)[None, None, :]
        luma, cb = self._sep(comp)
        return np.asarray(luma)[0, 0], np.asarray(cb)[0, 0]

    def demodulate_carrier(self, frame: int, line: int, chroma_band):
        gl = jnp.asarray([[_g(self.plan, frame, line)]], jnp.int32)
        cb = jnp.asarray(chroma_band, jnp.float32)[None, None, :]
        c1, c2 = self._demod(cb, gl)
        return np.asarray(c1)[0, 0], np.asarray(c2)[0, 0]

    def demodulate_components(self, frame: int, line: int, composite):
        luma, cb = self.separate(composite)
        c1, c2 = self.demodulate_carrier(frame, line, cb)
        if self._is_niir:
            c1, c2 = self._niir_step(frame, line, c1, c2)
        return luma, c1, c2

    def _niir_step(self, frame: int, line: int, c1, c2):
        """Streaming reference-line normalization (A.5): pair with the
        previous line's measurement (first line: no correction)."""
        a_ref = self.plan.cfg.chroma.reference_amplitude
        z, prev = (c1, c2), self._prev_z
        self._prev_z = z
        if prev is None:
            return (c1, c2) if _g(self.plan, frame, line) % 2 == 0 else (
                np.zeros_like(c1), np.zeros_like(c2))
        if _g(self.plan, frame, line) % 2 == 0:
            zc, zr = z, prev
        else:
            zc, zr = prev, z
        # guard: a vanishing reference measurement falls back to the nominal
        # (A_ref, 0), i.e. no correction — matches modem.niir.normalize and
        # golden._niir_normalize (flooring the denominator instead would
        # blow up the chroma exactly in the degraded-channel regime the
        # normalization exists for)
        zr0, zr1 = zr
        weak = (zr0 ** 2 + zr1 ** 2) < 1e-12
        zr0 = np.where(weak, a_ref, zr0)
        zr1 = np.where(weak, 0.0, zr1)
        den = zr0 ** 2 + zr1 ** 2
        u = a_ref * (zc[0] * zr0 + zc[1] * zr1) / den
        v = a_ref * (zc[1] * zr0 - zc[0] * zr1) / den
        return u, v


def make_line_modem(standard: str, samples: int = 720):
    """Per-line modem for any registered standard, variants included.

    ``make_line_modem('pal_m')`` etc. — the named classes below cover the
    four core standards; variants (ntsc443, pal_m, pal_n, pal60) share
    their machinery and differ only in config.  SECAM routes to its FM
    modem.
    """
    from color_modem_tpu.standards import ALL_STANDARDS

    cfg = ALL_STANDARDS[standard]()
    if cfg.is_fm:  # secam is the only FM standard
        return SecamModem(samples)
    return QamLineModem(make_plan(cfg, samples))


class NtscModem(QamLineModem):
    """NTSC parameterization of the QAM core (SURVEY.md C2, A.2)."""

    def __init__(self, samples: int = 720, **cfg_kw):
        super().__init__(make_plan(NTSC(**cfg_kw), samples))


class PalModem(QamLineModem):
    """PAL-S (simple) decoder; wrap in DelayLinePalModem for PAL-D (C3, A.3)."""

    def __init__(self, samples: int = 720):
        super().__init__(make_plan(PAL(), samples))


class NiirModem(QamLineModem):
    """NIIR / SECAM IV (SURVEY.md C5, A.5)."""

    def __init__(self, samples: int = 720, **cfg_kw):
        super().__init__(make_plan(NIIR(**cfg_kw), samples))


class SecamModem(_LineModemBase):
    """SECAM FM line modem with 1-line component pairing (C4, A.4)."""

    def __init__(self, samples: int = 720):
        super().__init__(make_plan(SECAM(), samples))
        plan = self.plan

        def _demod(comp, gl):
            return secam_mod.demodulate_lines(plan, comp, gl)

        self._demod = jax.jit(_demod)
        self._prev_v = None

    def reset(self) -> None:
        self._prev_v = None

    def demodulate_components(self, frame: int, line: int, composite):
        gl = jnp.asarray([[_g(self.plan, frame, line)]], jnp.int32)
        comp = jnp.asarray(composite, jnp.float32)[None, None, :]
        luma, v = self._demod(comp, gl)
        luma, v = np.asarray(luma)[0, 0], np.asarray(v)[0, 0]
        other = v if self._prev_v is None else self._prev_v
        self._prev_v = v
        if _g(self.plan, frame, line) % 2 == 1:  # D'R line
            return luma, v, other
        return luma, other, v


class SimpleCombModem:
    """2-line comb wrapper (SURVEY.md C6 [MEM-M], A.6): chroma from the
    difference with the previous composite line, luma from the sum."""

    latency = 0

    def __init__(self, base: QamLineModem):
        self.base = base
        self.plan = base.plan
        self._prev = None

    def reset(self):
        self._prev = None
        self.base.reset()

    def modulate(self, frame, line, r, g, b):
        return self.base.modulate(frame, line, r, g, b)

    def demodulate(self, frame, line, composite):
        comp = np.asarray(composite, dtype=np.float32)
        prev = comp if self._prev is None else self._prev
        self._prev = comp
        _, cb = self.base.separate((comp - prev) / 2.0)
        luma = comp - cb
        c1, c2 = self.base.demodulate_carrier(frame, line, cb)
        return _components_to_rgb(self.base, luma, c1, c2)


class Simple3DCombModem:
    """3-line comb wrapper (C6 [MEM-M], A.6) — needs the *next* line, so the
    stream runs one line late: ``latency = 1``; output n is for input n-1.
    Feed one extra (replicated) line at the end of the image to drain."""

    latency = 1

    def __init__(self, base: QamLineModem):
        self.base = base
        self.plan = base.plan
        self._buf = []  # [(frame, line, comp), ...] at most 2

    def reset(self):
        self._buf = []
        self.base.reset()

    def modulate(self, frame, line, r, g, b):
        return self.base.modulate(frame, line, r, g, b)

    def demodulate(self, frame, line, composite):
        comp = np.asarray(composite, dtype=np.float32)
        self._buf.append((frame, line, comp))
        if len(self._buf) == 1:  # prime: first output duplicates via reflect
            self._buf.insert(0, (frame, line, comp))
        if len(self._buf) > 3:
            self._buf.pop(0)
        (f0, l0, prev), (fc, lc, cur) = self._buf[0], self._buf[1]
        nxt = self._buf[2][2] if len(self._buf) > 2 else cur
        _, cb = self.base.separate((2.0 * cur - prev - nxt) / 4.0)
        luma = cur - cb
        c1, c2 = self.base.demodulate_carrier(fc, lc, cb)
        return _components_to_rgb(self.base, luma, c1, c2)


class ColorAveragingModem:
    """Chroma-averaging wrapper (C6 [MEM-M]): averages demodulated chroma
    with the previous line's — the PAL delay-line decoder when wrapped
    around PalModem (A.3), and a vertical-chroma-resolution halver for ANY
    base modem: QAM, SECAM (averages the assembled Dr/Db pair, i.e. each
    component over its two nearest carrier lines) and NIIR (averages the
    reference-normalized chroma) — matching the batch pipeline's 'avg'
    decoder (standards/decoders.py)."""

    latency = 0

    def __init__(self, base):
        self.base = base
        self.plan = base.plan
        self._prev = None

    def reset(self):
        self._prev = None
        self.base.reset()

    def modulate(self, frame, line, r, g, b):
        return self.base.modulate(frame, line, r, g, b)

    def demodulate(self, frame, line, composite):
        y, c1, c2 = self.base.demodulate_components(frame, line, composite)
        prev = (c1, c2) if self._prev is None else self._prev
        self._prev = (c1, c2)
        return _components_to_rgb(
            self.base, y, 0.5 * (c1 + prev[0]), 0.5 * (c2 + prev[1])
        )


def DelayLinePalModem(samples: int = 720) -> ColorAveragingModem:
    """PAL-D: the delay-line decoder (SURVEY.md C3, A.3)."""
    return ColorAveragingModem(PalModem(samples))


def _components_to_rgb(base: _LineModemBase, y, c1, c2):
    ycc = jnp.stack(
        [jnp.asarray(y), jnp.asarray(c1), jnp.asarray(c2)]
    ).astype(jnp.float32)
    rgb = np.asarray(base._to_rgb(ycc[None, :, None, :]))[0, :, 0]
    return rgb[0], rgb[1], rgb[2]


class ImageModem:
    """Reference-style image layer over any line modem (SURVEY.md C7).

    Loops scanlines through the per-line protocol — the authentic reference
    call stack (§3.1).  For throughput, use frame.pipeline instead.
    """

    def __init__(self, modem):
        self.modem = modem

    def modulate_image(self, rgb: np.ndarray, frame: int = 0) -> np.ndarray:
        rgb = np.asarray(rgb, dtype=np.float32)
        _, n_lines, _ = rgb.shape
        self.modem.reset()
        return np.stack(
            [
                self.modem.modulate(frame, l, rgb[0, l], rgb[1, l], rgb[2, l])
                for l in range(n_lines)
            ]
        )

    def demodulate_image(self, comp: np.ndarray, frame: int = 0) -> np.ndarray:
        comp = np.asarray(comp, dtype=np.float32)
        n_lines = comp.shape[0]
        self.modem.reset()
        lat = getattr(self.modem, "latency", 0)
        out = []
        for l in range(n_lines):
            out.append(self.modem.demodulate(frame, l, comp[l]))
        for extra in range(lat):  # drain by replicating the last line
            out.append(self.modem.demodulate(frame, n_lines - 1, comp[-1]))
        rgb = np.stack([np.stack(ch) for ch in zip(*out[lat:])])
        return np.clip(rgb, 0.0, 1.0)
