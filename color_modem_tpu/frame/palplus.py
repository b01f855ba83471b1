"""PALplus: 16:9 letterbox transmission with a vertical-helper signal.

The last analog-TV enhancement (ETS 300 731, broadcast 1994-2007): a 16:9
programme is transmitted as a 4:3-compatible letterbox (the picture
vertically compressed to 3/4 height, black bars above and below), and the
vertical detail lost to that compression — the "helper" — is modulated onto
the colour subcarrier *inside the black bars*, where a conventional
receiver shows (nearly) nothing and a PALplus receiver demodulates it and
reconstructs the full-resolution 16:9 picture.

Reference parity: beyond-reference (the upstream ``kFYatek/color_modem``
library has no enhanced-PAL systems; SURVEY.md §2.1, mount empty §0.1).
Signalled on air by the line-23 WSS word this framework already carries
(:mod:`color_modem_tpu.frame.wss`, EN 300 294 "16:9 letterbox centre").

TPU-native formulation — the whole system is four linear maps plus the
QAM machinery that already exists:

* Vertical 2-band split: the letterbox picture is the anti-aliased
  ``L -> 3L/4`` windowed-sinc resample (one MXU matmul per frame,
  :func:`frame.transcode.resample_lines`); the helper band is the residual
  ``Y - up(down(Y))``, which by construction occupies exactly the top
  quarter of the vertical spectrum ([3/8, 1/2] cycles/line).
* Critical decimation of the helper band: multiplying by ``(-1)^row``
  shifts that band to [0, 1/8] cycles/line, so the anti-aliased resample
  to ``L/4`` lines stores it losslessly — the modulated-decimation
  identity the real system's QMF vertical filter bank implements with
  hardware half-band filters.  The decoder runs the exact adjoint
  (upsample, re-multiply by ``(-1)^row``).
* Helper transport: DSB-SC on the colour subcarrier's U axis over the bar
  rows, using the same closed-form NCO phase law as the picture
  (modem/qam.carrier_phase) — product detection at the receiver is
  phase-exact with no extra state.  Horizontally band-limited so the
  upper sideband clears fs/2 (the real helper is band-limited too).
* Geometry: ``L_pic = 3L/4`` picture rows centered, ``L/8``-row bars on
  each side, ``L/4`` helper lines = exactly the helper band's critical
  rate.  (The real system uses 430 picture + 2x72 helper lines on 574
  usable; the clean power-of-two-friendly 432/72/72 split keeps every
  resample matrix exact and is within 0.5 % of the broadcast geometry.)

Deliberate simplifications, documented: no "Colorplus" motion-adaptive
chroma processing (the picture path is the framework's ordinary PAL
encode/decode at full quality), no film/camera mode switching, and the
helper rides linearly (the real system companded it against noise).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from color_modem_tpu.dsp import design
from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.dsp.colorimetry import apply_mat3, clamp01
from color_modem_tpu.frame.pipeline import (
    decode_block,
    encode_block,
    frame_line_index,
)
from color_modem_tpu.frame.transcode import resample_lines
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.modem.qam import carrier_phase
from color_modem_tpu.standards.base import QamParams

#: helper sidebands must clear both the luma band below and fs/2 above;
#: 2 MHz double-sideband around fsc fits every QAM plan this framework
#: ships (PAL at 13.5 MHz: 4.43 + 2.0 < 6.75)
HELPER_BW_HZ = 2.0e6
#: transmitted helper excursion clip — keeps the bars within the normal
#: chroma excursion range so a conventional receiver's bars stay dark
HELPER_CLIP = 0.5


class PalPlusGeometry:
    """Row layout: ``bar`` rows, ``l_pic`` picture rows, ``bar`` rows."""

    def __init__(self, active_lines: int):
        if active_lines % 8:
            raise ValueError(
                f"PALplus needs active_lines divisible by 8, got {active_lines}"
            )
        self.l_full = active_lines
        self.l_pic = 3 * active_lines // 4
        self.bar = active_lines // 8
        self.l_helper = active_lines // 4  # == 2 * bar


def _check_plan(plan: ModemPlan, n_lines: int) -> PalPlusGeometry:
    if not isinstance(plan.cfg.chroma, QamParams):
        raise ValueError(
            "PALplus helper transport needs a QAM subcarrier; "
            f"{plan.cfg.name} is FM"
        )
    # geometry follows the FRAME actually given (tests use short frames),
    # proportioned like the full raster
    return PalPlusGeometry(n_lines)


def _row_sign(l_full: int) -> np.ndarray:
    """(-1)^row column vector — the vertical-band shift to/from baseband."""
    return np.where(np.arange(l_full) % 2 == 0, 1.0, -1.0).astype(
        np.float32
    )[:, None]


def _helper_taps(plan: ModemPlan) -> np.ndarray:
    p: QamParams = plan.cfg.chroma
    bw = min(HELPER_BW_HZ, 0.95 * (plan.fs / 2.0 - p.fsc), 0.95 * p.fsc)
    return design.lowpass_taps(plan.fs, bw, 129)


def _split_rows(geo: PalPlusGeometry, x: jax.Array):
    """(..., L, N) -> picture rows, bar rows (top then bottom stacked)."""
    pic = x[..., geo.bar : geo.bar + geo.l_pic, :]
    bars = jnp.concatenate(
        [x[..., : geo.bar, :], x[..., geo.bar + geo.l_pic :, :]], axis=-2
    )
    return pic, bars


def _split_g(geo: PalPlusGeometry, g: jax.Array):
    g_pic = g[..., geo.bar : geo.bar + geo.l_pic]
    g_bars = jnp.concatenate(
        [g[..., : geo.bar], g[..., geo.bar + geo.l_pic :]], axis=-1
    )
    return g_pic, g_bars


def helper_encode(geo: PalPlusGeometry, y_full: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full-height luma (..., L, N) -> (letterbox Y (..., 3L/4, N),
    critically-decimated helper (..., L/4, N))."""
    down = resample_lines(y_full, geo.l_pic)
    up = resample_lines(down, geo.l_full)
    residual = y_full - up  # vertical band [3/8, 1/2) cycles/line
    shifted = jnp.asarray(_row_sign(geo.l_full)) * residual
    return down, resample_lines(shifted, geo.l_helper)


def helper_reconstruct(
    geo: PalPlusGeometry, y_pic: jax.Array, helper: jax.Array
) -> jax.Array:
    """Adjoint of :func:`helper_encode`: letterboxed picture luma +
    decoded helper lines -> full-height luma."""
    up = resample_lines(y_pic, geo.l_full)
    shifted = resample_lines(helper, geo.l_full)
    return up + jnp.asarray(_row_sign(geo.l_full)) * shifted


def encode_palplus(
    plan: ModemPlan,
    rgb: jax.Array,
    gline: jax.Array,
    backend: str = "xla",
    helper_gain: float = 1.0,
) -> jax.Array:
    """(..., 3, L, N) full-height 16:9 RGB -> (..., L, N) letterbox
    composite with the helper in the bars.  ``gline`` covers all L rows."""
    geo = _check_plan(plan, rgb.shape[-2])
    rgb = rgb.astype(jnp.float32)
    ycc = apply_mat3(plan.rgb_to_ycc, rgb)
    _, helper = helper_encode(geo, ycc[..., 0, :, :])
    helper = fir_same(helper, _helper_taps(plan))

    rgb_pic = clamp01(resample_lines(rgb, geo.l_pic))
    g_pic, g_bars = _split_g(geo, gline)
    comp_pic = encode_block(plan, rgb_pic, g_pic, backend)

    phi = carrier_phase(plan, g_bars)
    bars = jnp.clip(
        jnp.float32(helper_gain) * helper * jnp.sin(phi),
        -HELPER_CLIP,
        HELPER_CLIP,
    )
    return jnp.concatenate(
        [bars[..., : geo.bar, :], comp_pic, bars[..., geo.bar :, :]],
        axis=-2,
    )


def decode_palplus(
    plan: ModemPlan,
    comp: jax.Array,
    gline: jax.Array,
    decoder: str = "comb3",
    backend: str = "xla",
    helper_gain: float = 1.0,
    use_helper: bool = True,
) -> jax.Array:
    """(..., L, N) letterbox composite -> (..., 3, L, N) reconstructed
    full-height 16:9 RGB.  ``use_helper=False`` is the conventional-TV
    control: upsample the letterbox and ignore the bars (what a 4:3 zoom
    does), isolating exactly what the helper buys."""
    geo = _check_plan(plan, comp.shape[-2])
    comp = comp.astype(jnp.float32)
    pic, bars = _split_rows(geo, comp)
    g_pic, g_bars = _split_g(geo, gline)

    rgb_pic = decode_block(plan, pic, g_pic, decoder, backend)
    up = resample_lines(rgb_pic, geo.l_full)
    if not use_helper:
        return clamp01(up)

    phi = carrier_phase(plan, g_bars)
    helper = fir_same(2.0 * bars * jnp.sin(phi), _helper_taps(plan))
    helper = helper / jnp.float32(helper_gain)

    # resampling and the 3x3 matrices are linear and commute, so adding
    # the reconstructed helper band to the UPSAMPLED luma plane equals
    # helper_reconstruct() on the picture-rows luma
    ycc = apply_mat3(plan.rgb_to_ycc, up)
    y = ycc[..., 0, :, :] + jnp.asarray(
        _row_sign(geo.l_full)
    ) * resample_lines(helper, geo.l_full)
    ycc = jnp.stack([y, ycc[..., 1, :, :], ycc[..., 2, :, :]], axis=-3)
    return clamp01(apply_mat3(plan.ycc_to_rgb, ycc))


def make_palplus_pipeline(
    plan: ModemPlan,
    decoder: str = "comb3",
    backend: str = "xla",
    helper_gain: float = 1.0,
):
    """Jitted ``(encode, decode, roundtrip)`` closures, batch-first like
    :func:`frame.pipeline.make_pipeline`.  Frame height comes from the
    input (must be divisible by 8; geometry proportions like the full
    raster)."""
    _check_plan(plan, plan.cfg.active_lines)

    @jax.jit
    def encode(rgb, frame0=0):
        b, _, l, _ = rgb.shape
        g = frame_line_index(plan, frame0, b, l)
        return encode_palplus(plan, rgb, g, backend, helper_gain)

    @partial(jax.jit, static_argnames=("use_helper",))
    def decode(comp, frame0=0, use_helper=True):
        b, l = comp.shape[0], comp.shape[-2]
        g = frame_line_index(plan, frame0, b, l)
        return decode_palplus(
            plan, comp, g, decoder, backend, helper_gain, use_helper
        )

    @partial(jax.jit, static_argnames=("use_helper",))
    def roundtrip(rgb, frame0=0, use_helper=True):
        b, _, l, _ = rgb.shape
        g = frame_line_index(plan, frame0, b, l)
        comp = encode_palplus(plan, rgb, g, backend, helper_gain)
        return decode_palplus(
            plan, comp, g, decoder, backend, helper_gain, use_helper
        )

    return encode, decode, roundtrip
