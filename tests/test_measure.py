"""Broadcast measurement loop (frame/measure.py): the staircase +
vectorscope readout must recover the channel's injected differential
gain/phase, read ~zero on a clean channel, and track the luma span."""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.measure import (
    _STEP_LUMA,
    measure_differential,
    modulated_staircase,
)
from color_modem_tpu.frame.pipeline import frame_line_index, make_pipeline

L, N = 32, TEST_SAMPLES
SPAN = _STEP_LUMA[-1] - _STEP_LUMA[0]


def _comp(name, **impairments):
    plan = get_plan(name)
    rgb = modulated_staircase(plan, L, N)[None]
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(rgb), 0)
    if impairments:
        comp = impair(plan, comp, **impairments)
    g = frame_line_index(plan, 0, 1, L)
    return plan, comp, g


def test_clean_channel_reads_near_zero():
    plan, comp, g = _comp("ntsc")
    rep = measure_differential(plan, comp, g)
    assert rep["dg"] < 0.03, rep["dg"]
    assert rep["dp_deg"] < 2.0, rep["dp_deg"]


@pytest.mark.parametrize("name", ["ntsc", "pal"])
def test_injected_differential_phase_is_recovered(name):
    inject = 20.0
    plan, comp, g = _comp(name, diff_phase_deg=inject)
    rep = measure_differential(plan, comp, g)
    expect = inject * SPAN  # error spans the staircase's luma range
    assert abs(rep["dp_deg"] - expect) < 0.3 * expect, (rep["dp_deg"], expect)
    # error magnitude must grow monotonically with luma (each step
    # brighter; the sign is a demodulation convention)
    steps = np.abs(rep["step_phase_deg"])
    assert np.all(np.diff(steps) > -0.5), steps


def test_injected_differential_gain_is_recovered():
    plan, comp, g = _comp("ntsc", diff_gain=-0.4)
    rep = measure_differential(plan, comp, g)
    expect = 0.4 * SPAN
    assert abs(rep["dg"] - expect) < 0.3 * expect, (rep["dg"], expect)


def test_static_phase_reads_zero_differential():
    """A STATIC phase error rotates every step equally — DP must not see
    it (that is the difference between phase error and differential
    phase)."""
    plan, comp, g = _comp("ntsc", chroma_phase_deg=25.0)
    rep = measure_differential(plan, comp, g)
    assert rep["dp_deg"] < 3.0, rep["dp_deg"]


def test_niir_clean_channel_reads_near_zero():
    """Reference-carrier lines must be excluded from the step vectors —
    averaging them in corrupted the readout (ADVICE r1)."""
    plan, comp, g = _comp("niir")
    rep = measure_differential(plan, comp, g)
    assert rep["dg"] < 0.03, rep["dg"]
    assert rep["dp_deg"] < 2.0, rep["dp_deg"]


def test_niir_normalization_cancels_channel_errors():
    """The vectorscope reads through the decoder's reference-line
    normalization, so channel gain/phase errors (static AND luma-tracking
    — on a staircase every line sees the same luma, reference lines
    included) must read near zero: NIIR's design goal, measured."""
    plan, comp, g = _comp(
        "niir", chroma_gain=0.6, chroma_phase_deg=25.0, diff_phase_deg=20.0
    )
    rep = measure_differential(plan, comp, g)
    assert rep["dg"] < 0.05, rep["dg"]
    assert rep["dp_deg"] < 3.0, rep["dp_deg"]


def test_secam_rejected():
    plan = get_plan("secam")
    with pytest.raises(ValueError, match="immune"):
        measure_differential(
            plan, jnp.zeros((1, 4, N)), frame_line_index(plan, 0, 1, 4)
        )


def test_multiburst_flat_on_clean_composite():
    """Zero chroma -> composite == luma; every packet reads ~unity."""
    from color_modem_tpu.frame.measure import (
        measure_frequency_response,
        multiburst,
    )

    plan = get_plan("ntsc")
    rgb = multiburst(plan, 8)[None]
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(rgb), 0)
    resp = measure_frequency_response(plan, comp)
    for f, gn in resp.items():
        assert abs(gn - 1.0) < 0.05, (f, gn)


def test_multiburst_reads_the_vhs_rolloff():
    from color_modem_tpu.frame.channel import vhs_playback
    from color_modem_tpu.frame.measure import (
        measure_frequency_response,
        multiburst,
    )

    plan = get_plan("ntsc")
    rgb = multiburst(plan, 8)[None]
    enc, _, _ = make_pipeline(plan, "notch")
    tape = vhs_playback(plan, enc(jnp.asarray(rgb), 0))
    resp = measure_frequency_response(plan, tape)
    assert resp[0.5] > 0.85, resp
    assert resp[3.0] < 0.5, resp       # luma FM channel rolloff
    assert resp[4.2] < 0.25, resp      # outside the color-under band
    # 3.58 MHz luma masquerades as chroma and survives the color-under
    # path — the classic VHS cross-color trap
    assert resp[3.58] > 0.5, resp


def test_multiburst_reads_the_notch_decoders_chroma_trap():
    """Decoded luma loses the packet at fsc to the chroma notch — the
    cross-luminance trade measured, not just asserted."""
    from color_modem_tpu.frame.measure import (
        measure_frequency_response,
        multiburst,
    )

    plan = get_plan("ntsc")
    rgb = multiburst(plan, 8)[None]
    enc, dec, _ = make_pipeline(plan, "notch")
    out = dec(enc(jnp.asarray(rgb), 0), 0)
    resp = measure_frequency_response(plan, out[:, 0])  # gray: R == Y
    assert resp[1.0] > 0.85, resp
    assert resp[3.58] < 0.35, resp


def test_cli_measure(capsys):
    import json

    from color_modem_tpu.cli import main

    assert main(["measure", "--standard", "ntsc", "--lines", "16",
                 "--diff-phase", "20"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(rep["dp_deg"] - 15.0) < 4.0, rep
    assert abs(rep["frequency_response"]["1.0MHz"] - 1.0) < 0.05, rep


def test_staircase_clipping_guard():
    plan = get_plan("ntsc")
    with pytest.raises(ValueError, match="clips"):
        modulated_staircase(plan, 8, N, c1=0.5, c2=0.5)


def _scope_setup(standard):
    from color_modem_tpu.utils.testimages import color_bars

    plan = get_plan(standard)
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(color_bars(32, TEST_SAMPLES))[None], 0)
    g = frame_line_index(plan, 0, 1, 32)
    return plan, comp, g


def _green_at(img, plan, target, rmax):
    """Mean green intensity in a small window at a (c1, c2) position."""
    size = img.shape[0]
    x = int(round((target[0] + rmax) / (2 * rmax) * (size - 1)))
    y = int(round((rmax - target[1]) / (2 * rmax) * (size - 1)))
    w = 6
    return float(
        img[max(y - w, 0):y + w, max(x - w, 0):x + w, 1].max()
    )


@pytest.mark.parametrize("standard", ["ntsc", "pal"])
def test_vectorscope_dots_land_in_the_boxes(standard):
    """The phosphor trace of clean 75% bars peaks AT the colorimetry
    targets (every dot in its graticule box), and a 20-degree chroma
    phase error visibly rotates at least one dot out."""
    from color_modem_tpu.frame.measure import bar_vectors, vectorscope_image

    plan, comp, g = _scope_setup(standard)
    img = np.asarray(vectorscope_image(plan, comp, g))
    targets = bar_vectors(plan)
    rmax = 1.35 * float(np.max(np.hypot(targets[:, 0], targets[:, 1])))
    for t in targets:
        assert _green_at(img, plan, t, rmax) > 0.4, t
    # empty corner stays dark (phosphor off, no graticule)
    assert float(img[5:20, 5:20].max()) < 0.05
    # a phase-rotated channel rotates dots out of their boxes — on PAL
    # too: the scope displays the RAW V-switch arms (both rotate); the
    # famous phase-error cancellation happens in the decoder's arm
    # averaging, not on the instrument
    bad = impair(plan, comp, chroma_phase_deg=20.0)
    img_bad = np.asarray(vectorscope_image(plan, bad, g))
    hits_bad = [_green_at(img_bad, plan, t, rmax) for t in targets]
    assert min(hits_bad) < 0.2, hits_bad


def test_vectorscope_rejects_secam():
    from color_modem_tpu.frame.measure import vectorscope_image

    plan = get_plan("secam")
    with pytest.raises(ValueError, match="FM"):
        vectorscope_image(plan, jnp.zeros((1, 8, TEST_SAMPLES)), None)


def test_cli_measure_vectorscope(tmp_path, capsys):
    import json
    import os

    from color_modem_tpu.cli import main

    out = str(tmp_path / "scope.png")
    assert main(["measure", "--standard", "pal", "--lines", "16",
                 "--vectorscope", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["vectorscope"] == out
    assert os.path.getsize(out) > 1000


def test_waveform_monitor_levels():
    """The waveform display shows the raster levels where they belong:
    bright trace at sync tip (-0.4) in the blanking columns, white-bar
    trace at 1.0, nothing above white or below sync."""
    from color_modem_tpu.frame.measure import waveform_image
    from color_modem_tpu.utils.testimages import color_bars

    plan = get_plan("ntsc")
    enc, _, _ = make_pipeline(plan, "notch", raster=True)
    comp = enc(jnp.asarray(color_bars(32, TEST_SAMPLES))[None], 0)
    size, lo, hi = 256, -0.5, 1.2
    img = np.asarray(waveform_image(comp, size=size, lo=lo, hi=hi))

    def row(level):
        return int(round((hi - level) / (hi - lo) * (size - 1)))

    green = img[..., 1]
    # sync tip dwell: a bright spot somewhere on the -0.4 row band
    assert green[row(-0.4) - 2 : row(-0.4) + 3].max() > 0.5
    # white bar dwell on the 1.0 row band
    assert green[row(1.0) - 2 : row(1.0) + 3].max() > 0.5
    # nothing above 1.05 or below -0.45 except the graticule rows
    top = green[: row(1.05)]
    assert float(np.partition(top.ravel(), -50)[-50]) < 0.4


def test_cli_measure_waveform(tmp_path, capsys):
    import json
    import os

    from color_modem_tpu.cli import main

    out = str(tmp_path / "wfm.png")
    assert main(["measure", "--standard", "ntsc", "--lines", "16",
                 "--waveform", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["waveform"] == out
    assert os.path.getsize(out) > 1000


def test_spectrum_shows_frequency_interleave():
    """The spectrum analyzer's reason to exist: on NTSC (fsc = 227.5 fh)
    the chroma energy sits on HALF-INTEGER multiples of the line rate,
    interleaved between the luma teeth at integer multiples — sampling
    the averaged multi-line spectrum at both families around fsc shows
    chroma teeth well above the luma positions there, and the reverse
    far below fsc where luma owns the band."""
    from color_modem_tpu.frame.measure import composite_spectrum
    from color_modem_tpu.utils.testimages import smooth_scene

    plan = get_plan("ntsc")
    # RASTERED rows: the fh-comb lives on the full 858-sample line
    # period; an active-only stream has a different (720-sample)
    # periodicity and scrambles the textbook teeth
    enc, _, _ = make_pipeline(plan, "notch", raster=True)
    comp = enc(jnp.asarray(smooth_scene(64, TEST_SAMPLES, seed=2))[None], 0)
    freqs, db = composite_spectrum(plan, comp)
    fh = plan.cfg.fh
    fsc = plan.cfg.chroma.fsc

    def tooth(f0):  # peak within +-fh/6 of the nominal position
        sel = np.abs(freqs - f0) < fh / 6.0
        return float(db[sel].max())

    ks = np.arange(-6, 7)
    # fsc + k*fh are half-integer fh multiples = chroma teeth
    chroma = np.mean([tooth(fsc + k * fh) for k in ks])
    luma_mid = np.mean([tooth(fsc + (k + 0.5) * fh) for k in ks])
    assert chroma > luma_mid + 8.0, (chroma, luma_mid)
    # far below fsc, luma teeth at k*fh dominate the between-teeth gaps
    k0 = 40
    luma = np.mean([tooth(k * fh) for k in range(k0, k0 + 8)])
    gaps = np.mean([tooth((k + 0.5) * fh) for k in range(k0, k0 + 8)])
    assert luma > gaps + 8.0, (luma, gaps)


def test_spectrum_image_renders(tmp_path, capsys):
    import json
    import os

    from color_modem_tpu.cli import main

    out = str(tmp_path / "spec.png")
    assert main(["measure", "--standard", "ntsc", "--lines", "64",
                 "--spectrum", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["spectrum"] == out
    assert os.path.getsize(out) > 1000


# ---------------------------------------------------------------------------
# pulse-and-bar: 2T K-rating + 20T chroma/luma inequality
# ---------------------------------------------------------------------------

def _pb(name, **impairments):
    from color_modem_tpu.frame.measure import measure_pulse_bar, pulse_and_bar

    plan = get_plan(name)
    rgb = pulse_and_bar(plan, L)[None]
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(rgb), 0)
    if impairments:
        comp = impair(plan, comp, **impairments)
    g = frame_line_index(plan, 0, 1, L)
    return plan, comp, g, measure_pulse_bar


@pytest.mark.parametrize("name", ["ntsc", "pal", "niir"])
def test_pulse_bar_clean_reads_flat(name):
    plan, comp, g, meas = _pb(name)
    rep = meas(plan, comp, g)
    assert rep["k2t_pct"] < 1.0, rep
    assert abs(rep["pulse_bar_ratio"] - 1.0) < 0.02, rep
    assert abs(rep["cl_gain"] - 1.0) < 0.05, rep
    assert abs(rep["cl_delay_ns"]) < 15.0, rep


def test_pulse_bar_rates_a_ghost():
    # a -12 dB echo 1 us after the pulse sits inside the 3T..20T graticule
    # window: the flat-graticule reading is a/4 = 6.25 %, and the echo
    # also rides the bar top, pulling the pulse/bar inequality
    plan, comp, g, meas = _pb("ntsc", ghost_delay_us=1.0, ghost_gain=0.25)
    rep = meas(plan, comp, g)
    assert rep["k2t_pct"] > 4.0, rep
    # clean control
    plan2, comp2, g2, _ = _pb("ntsc")
    assert meas(plan2, comp2, g2)["k2t_pct"] < 1.0


def test_pulse_bar_reads_vhs_chroma_delay():
    # the color-under chain delays the chroma ENVELOPE by ~0.4 us while
    # the up-converter re-locks the carrier phase — exactly what the 20T
    # chroma/luma delay inequality was designed to read
    from color_modem_tpu.frame.channel import vhs_playback
    from color_modem_tpu.frame.measure import measure_pulse_bar

    plan, comp, g, _ = _pb("ntsc")
    rep = measure_pulse_bar(plan, vhs_playback(plan, comp), g)
    assert 250.0 < rep["cl_delay_ns"] < 500.0, rep


def test_pulse_bar_secam_rejected():
    from color_modem_tpu.frame.measure import measure_pulse_bar

    plan = get_plan("secam")
    with pytest.raises(ValueError):
        measure_pulse_bar(plan, jnp.zeros((1, 4, TEST_SAMPLES)),
                          jnp.zeros((1, 4), jnp.int32))


def test_pulse_bar_cli(capsys):
    import json

    from color_modem_tpu.cli import main

    assert main(["measure", "--standard", "pal", "--lines", "32",
                 "--pulse-bar"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    pb = rep["pulse_bar"]
    assert pb["k2t_pct"] < 1.0 and abs(pb["cl_delay_ns"]) < 15.0, pb


def test_cli_measure_secam(capsys):
    """VERDICT r2 item 9: SECAM gets the luma half of the instrument —
    frequency response + 2T K-rating off the DECODED picture (DG/DP
    stays QAM-only).  The response must show the authentic wide carrier
    trap (bell_f0 +- 2 MHz): flat at 1 MHz, dead at 3.58 MHz."""
    import json

    from color_modem_tpu.cli import main

    assert main(["measure", "--standard", "secam", "--lines", "16",
                 "--pulse-bar"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["dg"] is None and rep["dp_deg"] is None
    fr = rep["frequency_response"]
    assert abs(fr["1.0MHz"] - 1.0) < 0.05, fr
    assert fr["3.58MHz"] < 0.05, fr
    # 2T energy reaches the trap, so SECAM's pulse/bar ratio is honestly
    # low and the K-rating high — the instrument must REPORT it, and the
    # bar (whose energy is ~all below 1 MHz) must survive intact
    assert 0.4 < rep["pulse_bar"]["pulse_bar_ratio"] < 1.0, rep
    assert "cl_gain" not in rep["pulse_bar"]


def test_cli_measure_secam_vectorscope_rejected(tmp_path):
    from color_modem_tpu.cli import main

    with pytest.raises(SystemExit, match="QAM instrument"):
        main(["measure", "--standard", "secam",
              "--vectorscope", str(tmp_path / "v.png")])
