"""Independent-filter cross-check (VERDICT r1 'what's weak' item 5).

The golden oracle deliberately shares filter taps with the pipeline
(``golden/modems.py`` header): golden parity verifies the pipeline MATH,
and ``dsp/design.py`` is verified separately against the spec transfer
functions (``tests/test_design.py``).  The residual risk is a design bug
that the freqz checks miss AND that golden parity inherits (both sides use
the same taps, so parity stays perfect).

This module closes that hole with a genuinely second implementation: every
LINEAR-PHASE filter in the plan is re-designed with ``scipy.signal.firwin``
(Hamming window, scipy's own normalization) straight from the spec corner
frequencies in ``standards/`` — no code shared with ``dsp/design.py`` — and
injected via ``dataclasses.replace``.  The full JAX round trip must then
match the stock-taps quality to a fraction of a dB (measured deltas
2026-08-17, CPU float32: NTSC comb3 +0.06, PAL delayline -0.01,
SECAM notch/interp -0.01 dB).  A cutoff-normalization, gain, or centering
bug in ``dsp/design.py`` would open a multi-dB gap here.

Intrinsic-phase filters (SECAM pre/de-emphasis, anti-cloche/bell,
differentiator) cannot be windowed-sinc designed — their complex responses
ARE the spec (`A.4`), so their independent verification remains the
response-vs-spec tests in ``tests/test_design.py`` (inverse-pair and
freqz-magnitude properties), which don't share the frequency-sampling code
path's output with anything: a bug there fails those tests directly.
"""

import dataclasses

import numpy as np
import pytest
import scipy.signal as sig
import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.modem.plan import SECAM_MIX_LPF
from color_modem_tpu.utils.metrics import psnr

#: stock-vs-scipy round-trip PSNR agreement bound, dB.  The two window
#: functions (hanning vs hamming) legitimately differ in stopband shape;
#: measured deltas are <= 0.06 dB, so 0.5 dB catches any real design bug
#: (a 2x cutoff error measures as ~6-15 dB) without flaking on windows.
AGREE_DB = 0.5


def _roundtrip_db(plan, decoder, scene):
    _, _, rt = make_pipeline(plan, decoder)
    return float(psnr(np.asarray(rt(jnp.asarray(scene[None]), 0)),
                      scene[None]))


def _assert_replaced(stock, alt):
    """Guard that the injection actually changed the taps under test."""
    assert stock.shape == alt.shape
    assert not np.allclose(stock, alt)


@pytest.mark.parametrize("name,decoder", [("ntsc", "comb3"),
                                          ("pal", "delayline"),
                                          ("niir", "notch")])
def test_qam_roundtrip_with_independent_taps(name, decoder, scene):
    plan = get_plan(name)
    ch = plan.cfg.chroma
    n = len(plan.c1_lpf)
    alt = dataclasses.replace(
        plan,
        c1_lpf=sig.firwin(n, ch.c1_bandwidth, fs=plan.fs),
        c2_lpf=sig.firwin(n, ch.c2_bandwidth, fs=plan.fs),
        chroma_bpf=sig.firwin(n, [ch.fsc - ch.chroma_band,
                                  ch.fsc + ch.chroma_band],
                              fs=plan.fs, pass_zero=False),
    )
    _assert_replaced(plan.c1_lpf, alt.c1_lpf)
    _assert_replaced(plan.chroma_bpf, alt.chroma_bpf)
    a = _roundtrip_db(plan, decoder, scene)
    b = _roundtrip_db(alt, decoder, scene)
    assert abs(a - b) <= AGREE_DB, (a, b)


@pytest.mark.parametrize("decoder", ["notch", "interp"])
def test_secam_roundtrip_with_independent_taps(decoder, scene):
    plan = get_plan("secam")
    ch = plan.cfg.chroma
    alt = dataclasses.replace(
        plan,
        comp_lpf=sig.firwin(len(plan.comp_lpf), ch.component_bandwidth,
                            fs=plan.fs),
        mix_lpf=sig.firwin(len(plan.mix_lpf), SECAM_MIX_LPF, fs=plan.fs),
        demod_lpf=sig.firwin(len(plan.demod_lpf), ch.demod_lpf, fs=plan.fs),
    )
    _assert_replaced(plan.comp_lpf, alt.comp_lpf)
    _assert_replaced(plan.demod_lpf, alt.demod_lpf)
    a = _roundtrip_db(plan, decoder, scene)
    b = _roundtrip_db(alt, decoder, scene)
    assert abs(a - b) <= AGREE_DB, (a, b)
