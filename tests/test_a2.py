"""A2 / Zweikanalton two-carrier stereo (frame/a2.py).

The third terrestrial stereo system next to MTS/BTSC (test_mts.py via
test_rf.py) and NICAM-728 (test_nicam.py): a second FM sound carrier
15.5 fh above the first, with the 3.5 fh pilot AM-identified mode.
Thresholds sit ~3-5 dB under the measured values (2026-08-18: L 64.1 /
R 61.8 dB, picture cost 0.0 dB, ident margin ~12:1 each way).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame import a2
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.frame.rf import make_rf_plan, rf_demodulate, rf_modulate
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L = 160  # >= 2.7 ident-tone cycles for the dual/stereo decision
CROP = 8192


@pytest.fixture(scope="module")
def link():
    plan = get_plan("pal")
    rfp = make_rf_plan(plan)
    a2p = a2.make_a2_plan(rfp)
    enc, dec, _ = make_pipeline(plan, "delayline")
    img = jnp.asarray(
        np.stack([smooth_scene(L, TEST_SAMPLES, seed=2)]).astype(np.float32)
    )
    comp = enc(img, 0)
    t = np.arange(L * TEST_SAMPLES) / plan.fs
    left = (0.6 * np.sin(2 * np.pi * 800 * t)
            + 0.2 * np.sin(2 * np.pi * 5000 * t)).astype(np.float32)[None]
    right = (0.5 * np.sin(2 * np.pi * 2300 * t)).astype(np.float32)[None]
    return plan, rfp, a2p, enc, dec, img, comp, left, right


def _snr(ref, got):
    r, g = ref[0][CROP:-CROP], np.asarray(got)[0][CROP:-CROP]
    return 10 * np.log10(np.mean(r ** 2) / np.mean((g - r) ** 2))


def test_a2_geometry(link):
    _, rfp, a2p = link[:3]
    fh = rfp.plan.fs / rfp.row_samples
    # carrier 2 exactly 15.5 fh up, pilot at 3.5 fh, idents fh/133, fh/57
    assert a2p.snd2_num == rfp.snd_num + 31
    assert a2p.snd2_num % 2 == 0  # integer cycles/row: NO (-1)^row law
    assert abs((a2p.f_snd2 - rfp.f_snd) - 15.5 * fh) < 1e-6
    assert abs(a2p.ident_hz("stereo") - fh / 133) < 1e-9
    assert abs(a2p.ident_hz("dual") - fh / 57) < 1e-9
    assert a2p.amp2 == rfp.snd_amp / 2  # the -13/-20 dB split


def test_a2_stereo_roundtrip(link):
    plan, rfp, a2p, enc, dec, img, comp, left, right = link
    rf = rf_modulate(rfp, comp, 0, jnp.asarray(0.5 * (left + right)))
    rf = a2.a2_on_rf(a2p, rf, 0, jnp.asarray(right), "stereo")
    gl, gr, info = a2.a2_decode(a2p, rf, 0)
    assert info["mode"] == ["stereo"]
    # pilot recovered at its transmitted level (2.5k/50k = 0.05)
    assert info["pilot_level"][0] == pytest.approx(0.05, rel=0.3)
    assert _snr(left, gl) >= 58.0
    assert _snr(right, gr) >= 56.0
    # the second carrier must cost the PICTURE nothing (the parity-law
    # regression: a wrongly alternating carrier 2 put an fh spur at
    # -43 dB into the mono channel and ~1.5 dB onto the picture)
    out = rf_demodulate(rfp, rf, 0)
    p_via = float(psnr(dec(out, 0)[:, :, 2:-2], img[:, :, 2:-2]))
    p_dir = float(psnr(dec(comp, 0)[:, :, 2:-2], img[:, :, 2:-2]))
    assert p_via >= p_dir - 0.3, (p_via, p_dir)


def test_a2_mono_compatibility_and_channel_cost(link):
    """A mono receiver (carrier 1 only) hears the same (L+R)/2 whether or
    not carrier 2 is present — the A2 compatibility requirement."""
    plan, rfp, a2p, enc, dec, img, comp, left, right = link
    mono = 0.5 * (left + right)
    rf1 = rf_modulate(rfp, comp, 0, jnp.asarray(mono))
    rf2 = a2.a2_on_rf(a2p, rf1, 0, jnp.asarray(right), "stereo")
    m1, _ = a2._takeoff(a2p, rf1, a2p.bpf1, rfp.snd_ramp, 0)
    m2, _ = a2._takeoff(a2p, rf2, a2p.bpf1, rfp.snd_ramp, 0)
    from color_modem_tpu.dsp.apply import fir_same_fft

    s1 = _snr(mono, fir_same_fft(m1, rfp.aud_lpf))
    s2 = _snr(mono, fir_same_fft(m2, rfp.aud_lpf))
    assert s1 >= 58.0
    assert s2 >= s1 - 1.0, (s1, s2)


def test_a2_dual_and_mono_detection(link):
    plan, rfp, a2p, enc, dec, img, comp, left, right = link
    # dual: two independent programs, no dematrix
    rf = rf_modulate(rfp, comp, 0, jnp.asarray(left))
    rf = a2.a2_on_rf(a2p, rf, 0, jnp.asarray(right), "dual")
    g1, g2, info = a2.a2_decode(a2p, rf, 0)
    assert info["mode"] == ["dual"]
    assert info["ident_power"]["dual"][0] > 3 * info["ident_power"]["stereo"][0]
    assert _snr(left, g1) >= 56.0
    assert _snr(right, g2) >= 56.0
    # mono: no carrier 2 at all -> detected by carrier level, NOT by the
    # (noise-spraying) discriminator; both outputs carry carrier 1
    rfm = rf_modulate(rfp, comp, 0, jnp.asarray(left))
    gl, gr, infom = a2.a2_decode(a2p, rfm, 0)
    assert infom["mode"] == ["mono"]
    assert infom["carrier2_level"][0] < 0.3 * a2p.amp2
    assert _snr(left, gl) >= 58.0
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(gr))


def test_a2_stereo_separation(link):
    """Left-only program: the right output is the dematrix residual,
    >= 35 dB below the left output's power."""
    plan, rfp, a2p, enc, dec, img, comp, left, right = link
    zero = np.zeros_like(left)
    rf = rf_modulate(rfp, comp, 0, jnp.asarray(0.5 * left))
    rf = a2.a2_on_rf(a2p, rf, 0, jnp.asarray(zero), "stereo")
    gl, gr, info = a2.a2_decode(a2p, rf, 0)
    assert info["mode"] == ["stereo"]
    pl = np.mean(np.asarray(gl)[0][CROP:-CROP] ** 2)
    pr = np.mean(np.asarray(gr)[0][CROP:-CROP] ** 2)
    sep = 10 * np.log10(pl / pr)
    assert sep >= 35.0, sep


def test_a2_cli(capsys):
    """CLI surface: --rf-a2 dual reports the detected mode and SNRs."""
    import json

    from color_modem_tpu.cli import main

    rc = main(["roundtrip", "--standard", "pal", "--decoder", "delayline",
               "--demo", "--lines", str(L), "--rf-a2", "dual"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    a2r = rep["rf"]["a2"]
    assert a2r["mode_detected"] == "dual"
    assert a2r["left_snr_db"] > 55.0 and a2r["right_snr_db"] > 55.0
    assert a2r["pilot_level"] == pytest.approx(0.05, rel=0.3)
