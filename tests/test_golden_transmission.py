"""Transmission-layer oracle parity (VERDICT r2 item 7).

The frozen naive-NumPy chains in golden/transmission.py certify the
composed/stream-engine JAX paths in frame/rf.py and frame/satellite.py:
an encoder+decoder co-regression (both sides shifted consistently) would
pass the existing roundtrip property tests but disagree with this model.

Bounds measured 2026-08-19 on the 2x16x720 smooth fixture (CPU; parity is
backend-independent): rf_modulate 59.2 dB, rf_demodulate 47.3, fm_modulate
65.8/66.7, fm_demodulate 124.1/122.4.  Thresholds sit ~5 dB under (suite
convention).  The rf numbers are f32-limited through the 2049-tap composed
complex FIRs; the fm demod chain has no phase integral so it parities at
the conv-reassociation floor.

fm_demodulate re-measured 2026-08-20 after the HALF-RATE demod rework
(satellite._demod_multiplex decimates the complex baseband by 2 inside
the front-end conv; VERDICT r3 item 1): 100.5 dB on this fixture, 107.0
on the audio-subcarrier fixture — the oracle keeps the naive FULL-RATE
chain, so the residual is the half-rate path's designed approximation
(decimating z with the composed filter's ~-60 dB stopband + reading
f_inst on the even grid only), still ~50 dB above every accuracy
threshold in the chain.  Thresholds lowered accordingly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame import rf, satellite as sat
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.golden import transmission as gt
from color_modem_tpu.utils.testimages import smooth_scene

L = 16


def _parity_db(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    err = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(float(np.var(b)) / max(err, 1e-300))


@pytest.fixture(scope="module")
def comp():
    plan = get_plan("ntsc")
    rgb = np.stack(
        [smooth_scene(L, 720, seed=s) for s in (0, 1)]
    ).astype(np.float32)
    enc, _, _ = make_pipeline(plan, "notch")
    return np.asarray(enc(jnp.asarray(rgb), 0))


def test_rf_modulate_matches_golden(comp):
    rfp = rf.make_rf_plan(get_plan("ntsc"))
    j = rf.rf_modulate(rfp, jnp.asarray(comp), 3)
    g = gt.rf_modulate(rfp, comp, 3)
    assert _parity_db(j, g) > 54.0


def test_rf_demodulate_matches_golden(comp):
    rfp = rf.make_rf_plan(get_plan("ntsc"))
    g_rf = gt.rf_modulate(rfp, comp, 3).astype(np.float32)
    j = rf.rf_demodulate(rfp, jnp.asarray(g_rf), 3)
    g = gt.rf_demodulate(rfp, g_rf, 3)
    assert _parity_db(j, g) > 42.0


def test_fm_modulate_matches_golden(comp):
    sp = sat.make_sat_plan(get_plan("ntsc").fs, 720)
    j = sat.fm_modulate(sp, jnp.asarray(comp))
    g = gt.fm_modulate(sp, comp)
    assert _parity_db(j, g) > 60.0


def test_fm_demodulate_matches_golden(comp):
    sp = sat.make_sat_plan(get_plan("ntsc").fs, 720)
    g_fm = gt.fm_modulate(sp, comp).astype(np.float32)
    j = sat.fm_demodulate(sp, jnp.asarray(g_fm))
    g = gt.fm_demodulate(sp, g_fm)
    assert _parity_db(j, g) > 95.0


def test_fm_roundtrip_mux_matches_golden(comp):
    # subcarriers designed: the mux/reject low-passes join both video
    # paths (composed with pre/de-emphasis in the JAX chain, separate
    # circular filters in the oracle)
    sp = sat.make_sat_plan(27e6, 1440, audio_subs=1)
    base = np.concatenate([comp[:, :, :720]] * 2, axis=-1).astype(np.float32)
    j_fm = sat.fm_modulate(sp, jnp.asarray(base))
    g_fm = gt.fm_modulate(sp, base)
    assert _parity_db(j_fm, g_fm) > 60.0
    j_v = sat.fm_demodulate(sp, jnp.asarray(g_fm.astype(np.float32)))
    g_v = gt.fm_demodulate(sp, g_fm.astype(np.float32))
    assert _parity_db(j_v, g_v) > 95.0
