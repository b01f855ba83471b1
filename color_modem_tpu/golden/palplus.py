"""GOLDEN ORACLE — naive PALplus letterbox + vertical helper (round 5,
VERDICT r4 item 7).

Frozen per-scanline NumPy float64 model of frame/palplus.py — the largest
non-bit-exact encoder/decoder pair that had no oracle: a regression that
shifted ``helper_encode`` and ``helper_reconstruct`` (or the bar
modulation and its product detector) CONSISTENTLY would pass every
property test in tests/test_palplus.py; with this model, either
direction's parity breaks (tests/test_golden_palplus.py).

Style of golden/transmission.py / golden/sound.py: explicit per-line
loops, ``np.convolve(..., 'same')`` filtering, subcarrier phase from the
exact rational line law (golden/modems.GoldenQamModem) — no vmap, no
precision-split matmuls, no (-1)^row factoring beyond the spec's own
modulated-decimation sign.

Shared-design tradeoff (the golden/sound.py "shared taps" rule, one step
wider): the vertical filter bank IS a windowed-sinc resample matrix, and
both sides must share the same design or parity would measure filter-
design deltas instead of pipeline math — so the matrix comes from the
JAX-free ``dsp.design.resample_matrix`` (the same sharing golden/mac.py
already does), applied here in f64 per COLUMN.  The helper transport FIR
comes from the caller (``frame.palplus._helper_taps(plan)``), like the
RFPlan/SatPlan taps in the other transmission oracles.  The helper-band
system math — residual split, ``(-1)^row`` spectral shift, critical
decimation, DSB-SC transport on the U axis, the adjoint reconstruction —
is all evaluated independently below, from the module contract in
frame/palplus.py's docstring (ETS 300 731's letterbox + helper
architecture; exact constants are this framework's clean power-of-two
geometry, documented there).
"""

from __future__ import annotations

import numpy as np

from color_modem_tpu.dsp.design import resample_matrix
from color_modem_tpu.golden.frame import _reflect
from color_modem_tpu.golden.modems import GoldenQamModem, conv_same

#: duplicated from frame/palplus.py (package rule: no frame/ imports)
HELPER_CLIP = 0.5


def _resample_rows(x: np.ndarray, l_out: int) -> np.ndarray:
    """(..., L, N) -> (..., l_out, N): the vertical windowed-sinc resample,
    shared design matrix, f64 column-by-column (naive form of the MXU
    matmul in dsp/resample.py)."""
    l_in = x.shape[-2]
    if l_in == l_out:
        return np.asarray(x, np.float64)
    mat = np.asarray(resample_matrix(l_in, l_out), np.float64)  # (L, L')
    lead = x.shape[:-2]
    x2 = np.asarray(x, np.float64).reshape((-1,) + x.shape[-2:])
    out = np.empty((x2.shape[0], l_out, x.shape[-1]), np.float64)
    for i in range(x2.shape[0]):
        for col in range(x.shape[-1]):
            out[i, :, col] = mat.T @ x2[i, :, col]
    return out.reshape(lead + (l_out, x.shape[-1]))


def _row_sign(l_full: int) -> np.ndarray:
    return np.where(np.arange(l_full) % 2 == 0, 1.0, -1.0)[:, None]


def _geometry(l_full: int):
    if l_full % 8:
        raise ValueError(f"PALplus needs lines divisible by 8, got {l_full}")
    return 3 * l_full // 4, l_full // 8, l_full // 4  # l_pic, bar, l_helper


def helper_encode(l_full: int, y: np.ndarray):
    """Full-height luma (L, N) -> (letterbox Y (3L/4, N), critically
    decimated helper (L/4, N)): down-resample, residual = y - up(down),
    (-1)^row shift of the [3/8, 1/2) band to baseband, resample to L/4."""
    l_pic, _, l_helper = _geometry(l_full)
    down = _resample_rows(y, l_pic)
    up = _resample_rows(down, l_full)
    shifted = _row_sign(l_full) * (np.asarray(y, np.float64) - up)
    return down, _resample_rows(shifted, l_helper)


def helper_reconstruct(
    l_full: int, y_pic: np.ndarray, helper: np.ndarray
) -> np.ndarray:
    """Adjoint of :func:`helper_encode`: upsample both, re-shift the
    helper band back up the vertical spectrum, add."""
    up = _resample_rows(y_pic, l_full)
    shifted = _resample_rows(helper, l_full)
    return up + _row_sign(l_full) * shifted


def encode_palplus(
    plan,
    rgb: np.ndarray,
    helper_taps: np.ndarray,
    frame: int = 0,
    helper_gain: float = 1.0,
) -> np.ndarray:
    """(3, L, N) full-height RGB -> (L, N) PALplus composite: letterboxed
    picture QAM-encoded line by line at its in-frame line numbers
    (gline = frame*total + bar + k), the band-limited helper DSB-SC on
    the subcarrier's U axis (sin phase) over the bar rows, clipped to
    the chroma excursion."""
    rgb = np.asarray(rgb, np.float64)
    _, l_full, n = rgb.shape
    l_pic, bar, _ = _geometry(l_full)
    cfg = plan.cfg
    modem = GoldenQamModem(plan)

    ycc = np.einsum("dc,cln->dln", plan.rgb_to_ycc, rgb)
    _, helper = helper_encode(l_full, ycc[0])
    helper = np.stack([conv_same(h, helper_taps) for h in helper])

    rgb_pic = np.clip(_resample_rows(rgb, l_pic), 0.0, 1.0)
    ycc_pic = np.einsum("dc,cln->dln", plan.rgb_to_ycc, rgb_pic)

    comp = np.empty((l_full, n), np.float64)
    for k in range(l_pic):
        g = frame * cfg.total_lines + bar + k
        comp[bar + k] = modem.modulate_components(
            g, ycc_pic[0, k], ycc_pic[1, k], ycc_pic[2, k]
        )
    for j in range(2 * bar):
        row = j if j < bar else l_pic + j  # bar row's frame position
        g = frame * cfg.total_lines + row
        comp[row] = np.clip(
            helper_gain * helper[j] * np.sin(modem.carrier_phase(g)),
            -HELPER_CLIP,
            HELPER_CLIP,
        )
    return comp


def encode_palplus_fields(
    plan,
    rgb: np.ndarray,
    helper_taps: np.ndarray,
    frame: int = 0,
    helper_gain: float = 1.0,
) -> np.ndarray:
    """(3, L, N) full-height RGB -> (2, L/2, N) field-sequential PALplus
    composite — the naive mirror of frame/palplus.encode_palplus_fields,
    pinning the TRANSMITTED FORMAT of the 625i service: frame row j goes
    to field j % 2 (so field p's bars carry helper lines p, p+2, ... —
    one helper reference per field), and every transmitted row is keyed
    by its FIELD line number gline = frame*total + p*field_offset + r.
    A consistent field-mapping shift in both the encoder and decoder
    would cancel in every round-trip property test; against this model
    either side's parity breaks."""
    rgb = np.asarray(rgb, np.float64)
    _, l_full, n = rgb.shape
    l_pic, bar, _ = _geometry(l_full)
    if l_full % 16:
        raise ValueError(
            f"interlaced PALplus needs lines divisible by 16, got {l_full}"
        )
    cfg = plan.cfg
    modem = GoldenQamModem(plan)
    off = (cfg.total_lines + 1) // 2          # interlace field offset

    ycc = np.einsum("dc,cln->dln", plan.rgb_to_ycc, rgb)
    _, helper = helper_encode(l_full, ycc[0])
    helper = np.stack([conv_same(h, helper_taps) for h in helper])

    rgb_pic = np.clip(_resample_rows(rgb, l_pic), 0.0, 1.0)
    ycc_pic = np.einsum("dc,cln->dln", plan.rgb_to_ycc, rgb_pic)

    out = np.empty((2, l_full // 2, n), np.float64)
    for p in range(2):
        for r in range(l_full // 2):
            g = frame * cfg.total_lines + p * off + r
            fr = 2 * r + p                    # the frame row this field row is
            if bar <= fr < bar + l_pic:
                k = fr - bar                  # picture row index
                out[p, r] = modem.modulate_components(
                    g, ycc_pic[0, k], ycc_pic[1, k], ycc_pic[2, k]
                )
            else:
                h = fr if fr < bar else fr - l_pic  # helper line index
                out[p, r] = np.clip(
                    helper_gain * helper[h] * np.sin(modem.carrier_phase(g)),
                    -HELPER_CLIP,
                    HELPER_CLIP,
                )
    return out


def decode_palplus(
    plan,
    comp: np.ndarray,
    helper_taps: np.ndarray,
    frame: int = 0,
    decoder: str = "comb3",
    helper_gain: float = 1.0,
    use_helper: bool = True,
) -> np.ndarray:
    """(L, N) PALplus composite -> (3, L, N) reconstructed RGB.

    Picture rows decode line by line (notch, or the 3-line comb with its
    stencil REFLECTED inside the picture — the receiver cannot comb
    helper bars into the picture); the bars product-detect against the
    same U-axis carrier; the helper band adds to the upsampled luma.
    ``use_helper=False`` is the conventional-zoom control."""
    comp = np.asarray(comp, np.float64)
    l_full, n = comp.shape
    l_pic, bar, _ = _geometry(l_full)
    cfg = plan.cfg
    modem = GoldenQamModem(plan)
    if decoder not in ("notch", "comb3"):
        raise ValueError(
            f"the PALplus oracle models notch and comb3, got {decoder!r}"
        )

    from color_modem_tpu.standards.decoders import comb_spacing

    p = comb_spacing(cfg)
    pic = comp[bar : bar + l_pic]
    luma = np.empty((l_pic, n), np.float64)
    c1 = np.empty_like(luma)
    c2 = np.empty_like(luma)
    for k in range(l_pic):
        g = frame * cfg.total_lines + bar + k
        if decoder == "comb3":
            prev = pic[_reflect(k - p, l_pic)]
            nxt = pic[_reflect(k + p, l_pic)]
            chroma_band = conv_same(
                (2.0 * pic[k] - prev - nxt) / 4.0, plan.chroma_bpf
            )
            y = pic[k] - chroma_band
        else:
            y, chroma_band = modem.separate_notch(pic[k])
        luma[k] = y
        c1[k], c2[k] = modem.demodulate_carrier(g, chroma_band)
    rgb_pic = np.clip(
        np.einsum("cd,dln->cln", plan.ycc_to_rgb, np.stack([luma, c1, c2])),
        0.0,
        1.0,
    )

    up = _resample_rows(rgb_pic, l_full)
    if not use_helper:
        return np.clip(up, 0.0, 1.0)

    helper = np.empty((2 * bar, n), np.float64)
    for j in range(2 * bar):
        row = j if j < bar else l_pic + j
        g = frame * cfg.total_lines + row
        det = 2.0 * comp[row] * np.sin(modem.carrier_phase(g))
        helper[j] = conv_same(det, helper_taps) / helper_gain

    ycc = np.einsum("dc,cln->dln", plan.rgb_to_ycc, up)
    y_full = ycc[0] + _row_sign(l_full) * _resample_rows(helper, l_full)
    ycc = np.stack([y_full, ycc[1], ycc[2]])
    return np.clip(np.einsum("cd,dln->cln", plan.ycc_to_rgb, ycc), 0.0, 1.0)
