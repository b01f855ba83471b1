"""Property tests on the frozen golden oracle (SURVEY.md §4.3 'Property').

These pin the *oracle itself* to the broadcast specs, so the golden model can
be defended independently of the (unreadable) reference — SURVEY.md §7.3
item 5.
"""

import numpy as np
import pytest

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu import golden
from color_modem_tpu.golden.modems import GoldenQamModem, GoldenSecamModem, conv_same
from color_modem_tpu.utils.testimages import BAR_COLORS_75, color_bars, gray_ramp

L = 16


@pytest.mark.parametrize("name", ["ntsc", "pal", "niir"])
def test_gray_ramp_produces_no_chroma(name):
    plan = get_plan(name)
    comp = golden.encode_frame(plan, gray_ramp(L, TEST_SAMPLES))
    # NIIR reference lines carry a deliberate carrier; check chroma lines only
    step = 2 if name == "niir" else 1
    for l in range(0, L, step):
        band = conv_same(comp[l], plan.chroma_bpf)
        assert np.sqrt(np.mean(band[100:-100] ** 2)) < 1e-4


def test_ntsc_colorbar_carrier_amplitude():
    plan = get_plan("ntsc")
    img = color_bars(L, TEST_SAMPLES)
    comp = golden.encode_frame(plan, img)
    # On the red bar (75% red): amplitude of the subcarrier = sqrt(I^2+Q^2)
    m = plan.rgb_to_ycc
    rgb = BAR_COLORS_75[5]  # red
    i_val = sum(m[1][c] * rgb[c] for c in range(3))
    q_val = sum(m[2][c] * rgb[c] for c in range(3))
    want = np.hypot(i_val, q_val)
    # measure carrier envelope mid-bar (bars are 1/8 of the line each)
    n0 = int(TEST_SAMPLES * (5.5 / 8.0))
    seg = conv_same(comp[0], plan.chroma_bpf)[n0 - 30 : n0 + 30]
    got = np.sqrt(2.0 * np.mean(seg**2))  # RMS of a sine = A/sqrt(2)
    assert got == pytest.approx(want, rel=0.05)


def test_pal_vswitch_sign_alternates():
    plan = get_plan("pal")
    gm = GoldenQamModem(plan)
    assert gm.v_sign(0) == 1.0 and gm.v_sign(1) == -1.0 and gm.v_sign(2) == 1.0


def test_secam_rest_frequency_on_unsaturated_input():
    """Gray input: D'R = D'B = 0, so each line's carrier sits at its rest
    frequency and the discriminator must return ~0 (A.4)."""
    plan = get_plan("secam")
    comp = golden.encode_frame(plan, gray_ramp(4, TEST_SAMPLES) * 0.0 + 0.5)
    modem = GoldenSecamModem(plan)
    for l in range(2):
        _, d_hat = modem.demodulate_component(l, comp[l])
        assert np.max(np.abs(d_hat[100:-100])) < 0.02


def test_secam_carrier_amplitude_at_rest_is_m0():
    """At the rest frequencies the anti-cloche gain is near its M0 floor."""
    plan = get_plan("secam")
    comp = golden.encode_frame(plan, gray_ramp(2, TEST_SAMPLES) * 0.0 + 0.5)
    chroma = comp[0] - np.mean(comp[0])  # flat gray luma is constant
    a = np.sqrt(2.0 * np.mean(chroma[100:-100] ** 2))
    p = plan.cfg.chroma
    # f0b is 156 kHz below bell_f0: gain slightly above M0
    assert 0.8 * p.bell_m0 < a < 2.5 * p.bell_m0


def test_niir_reference_line_carries_pure_carrier():
    plan = get_plan("niir")
    img = color_bars(L, TEST_SAMPLES)
    comp = golden.encode_frame(plan, img)
    y = np.einsum("c,cn->n", np.asarray(plan.rgb_to_ycc)[0], img[:, 1, :])
    carrier = comp[1] - y  # gline=1 is a reference line
    a_ref = plan.cfg.chroma.reference_amplitude
    got = np.sqrt(2.0 * np.mean(carrier[100:-100] ** 2))
    assert got == pytest.approx(a_ref, rel=0.02)


def test_decode_output_clamped():
    plan = get_plan("ntsc")
    comp = golden.encode_frame(plan, color_bars(L, TEST_SAMPLES))
    rgb = golden.decode_frame(plan, comp)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
