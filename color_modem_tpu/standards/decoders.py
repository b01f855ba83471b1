"""Decoder registry: which decoders apply to which standard (K13).

Lives in standards/ (not golden/ or separate/) because decoder eligibility
and comb spacing are properties of the *standard* — both the golden oracle
and the JAX pipeline consume them.
"""

from __future__ import annotations

from color_modem_tpu.standards.base import FmParams, StandardConfig

#: 'delayline' is the PAL-D decoder realized as baseband U/V averaging over
#: adjacent lines — equivalent to the hardware subcarrier delay-line trick
#: under ideal demodulation; 'avg' is the reference's chroma-averaging
#: wrapper, the same operation applied to any QAM standard [MEM-M].
QAM_DECODERS = ("notch", "comb2", "comb3", "delayline", "avg")
FM_DECODERS = ("notch",)


def allowed_decoders(cfg: StandardConfig) -> tuple:
    """Decoders meaningful for a standard (SURVEY.md K13, A.6).

    SECAM is FM — only the notch path applies.  NIIR alternates chroma and
    reference-carrier lines, so cross-line combs/averaging would mix the two
    streams (and its fsc gives no 180-deg flip at spacing 2 either): notch
    only.
    """
    if isinstance(cfg.chroma, FmParams):
        return FM_DECODERS
    if cfg.chroma.reference_amplitude is not None:
        return FM_DECODERS
    return QAM_DECODERS


def comb_spacing(cfg: StandardConfig) -> int:
    """Line spacing at which the chroma phase flips ~180 deg (A.6).

    NTSC: frac(cpl)=0.5 -> 1 line.  PAL: frac(2*cpl)=0.5032 -> 2 lines.
    """
    best_p, best_err = 1, 1.0
    for p in (1, 2):
        frac = (p * cfg.cpl_num / cfg.cpl_den) % 1.0
        err = abs(frac - 0.5)
        if err < best_err:
            best_p, best_err = p, err
    return best_p
