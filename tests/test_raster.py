"""Raster (sync + burst) layer: geometry, spec phases, round-trip identity.

SURVEY.md A.1: sync/burst are optional, default off, flag-gated; A.2/A.3 give
the burst angles (NTSC 180 deg on -U; PAL swinging +-135 deg with the
V-switch); SECAM has no burst (A.4 — line identification is by FM).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import TEST_LINES, TEST_SAMPLES, get_plan

from color_modem_tpu.frame.pipeline import frame_line_index, make_pipeline
from color_modem_tpu.frame.raster import (
    BURST_AMP,
    SYNC_LEVEL,
    add_raster,
    make_raster,
    measure_burst_phase,
    strip_raster,
)
from color_modem_tpu.utils.testimages import smooth_scene


def _rastered(name):
    plan = get_plan(name)
    rp = make_raster(plan)
    rgb = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=3)[None])
    g = frame_line_index(plan, 0, 1, TEST_LINES)
    from color_modem_tpu.frame.pipeline import encode_block

    comp = encode_block(plan, rgb, g)
    return plan, rp, comp, add_raster(plan, rp, comp, g), g


@pytest.mark.parametrize("name,total", [("ntsc", 858), ("pal", 864), ("secam", 864)])
def test_geometry_matches_bt470(name, total):
    """fs/fh at 720 active samples gives the BT.601 total line lengths."""
    rp = make_raster(get_plan(name))
    assert rp.n_total == total
    assert rp.n_active == TEST_SAMPLES


@pytest.mark.parametrize("name", ["ntsc", "pal", "secam"])
def test_strip_is_exact_inverse(name):
    _, rp, comp, rastered, _ = _rastered(name)
    assert rastered.shape[-1] == rp.n_total
    np.testing.assert_array_equal(np.asarray(strip_raster(rp, rastered)),
                                  np.asarray(comp))


@pytest.mark.parametrize("name", ["ntsc", "pal", "secam"])
def test_sync_pulse_level_and_quiet_porch(name):
    _, rp, _, rastered, _ = _rastered(name)
    blank = np.asarray(rastered)[..., : rp.n_blank]
    sync = blank[..., rp.sync_start : rp.sync_start + rp.sync_len]
    np.testing.assert_allclose(sync, SYNC_LEVEL, atol=1e-6)
    # front porch (before sync) is at blanking level on every line
    np.testing.assert_allclose(blank[..., : rp.sync_start], 0.0, atol=1e-6)


def test_ntsc_burst_is_180_on_u():
    plan, rp, _, rastered, g = _rastered("ntsc")
    amp, phase = measure_burst_phase(plan, rp, rastered, g)
    np.testing.assert_allclose(np.asarray(amp), BURST_AMP, rtol=0.02)
    # 180 deg -> +-pi (wraps); compare the cosine to be branch-free
    np.testing.assert_allclose(np.cos(np.asarray(phase)), -1.0, atol=1e-3)


def test_pal_burst_swings_135_with_vswitch():
    plan, rp, _, rastered, g = _rastered("pal")
    amp, phase = measure_burst_phase(plan, rp, rastered, g)
    # PAL's 10 burst cycles span 30.47 samples, rounded to 30: the
    # non-integer cycle count leaks ~3% into the quadrature correlation
    np.testing.assert_allclose(np.asarray(amp), BURST_AMP, rtol=0.05)
    expected = np.where(np.asarray(g) % 2 == 0, 0.75 * np.pi, -0.75 * np.pi)
    # fractional-cycle leakage phase rotates with phi0, up to ~1.9 deg
    np.testing.assert_allclose(np.asarray(phase), expected, atol=0.05)


def test_secam_has_sync_but_no_burst():
    plan, rp, _, rastered, g = _rastered("secam")
    assert rp.burst_len == 0
    with pytest.raises(ValueError):
        measure_burst_phase(plan, rp, rastered, g)
    # everything outside sync is at blanking level
    blank = np.array(rastered)[..., : rp.n_blank]
    blank[..., rp.sync_start : rp.sync_start + rp.sync_len] = 0.0
    np.testing.assert_allclose(blank, 0.0, atol=1e-6)


@pytest.mark.parametrize("name", ["ntsc", "pal"])
def test_burst_locked_decode_cancels_channel_phase(name):
    """A 25-deg differential-phase channel shifts hue badly under nominal-
    phase decoding (NTSC loses ~13 dB); the burst-locked decoder measures
    the error off the (equally rotated) burst and cancels it."""
    from color_modem_tpu.frame.channel import impair
    from color_modem_tpu.frame.pipeline import decode_block, encode_block
    from color_modem_tpu.frame.raster import decode_burst_locked
    from color_modem_tpu.utils.metrics import psnr

    plan = get_plan(name)
    rp = make_raster(plan)
    rgb = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=8)[None])
    g = frame_line_index(plan, 0, 1, TEST_LINES)
    rastered = add_raster(plan, rp, encode_block(plan, rgb, g), g)
    bad = impair(plan, rastered, chroma_phase_deg=25.0)

    plain = decode_block(plan, strip_raster(rp, bad), g, "notch")
    locked = decode_burst_locked(plan, rp, bad, g, "notch")
    p_plain = psnr(np.asarray(plain), np.asarray(rgb))
    p_locked = psnr(np.asarray(locked), np.asarray(rgb))
    # clean-channel notch reference is ~39-40 dB on this fixture
    assert p_locked > p_plain + 2.0, (p_plain, p_locked)
    assert p_locked > 35.0, p_locked


@pytest.mark.parametrize("name", ["ntsc", "pal"])
def test_acc_cancels_chroma_gain_error(name):
    """ACC — the gain twin of the burst phase lock: a 0.5x chroma-band
    channel gain halves the burst identically (that co-riding is WHY ACC
    works), so spec-over-measured burst amplitude restores saturation."""
    from color_modem_tpu.frame.channel import impair
    from color_modem_tpu.frame.pipeline import decode_block, encode_block
    from color_modem_tpu.frame.raster import decode_burst_locked
    from color_modem_tpu.utils.metrics import psnr

    plan = get_plan(name)
    rp = make_raster(plan)
    rgb = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=9)[None])
    g = frame_line_index(plan, 0, 1, TEST_LINES)
    rastered = add_raster(plan, rp, encode_block(plan, rgb, g), g)
    bad = impair(plan, rastered, chroma_gain=0.5)

    plain = decode_block(plan, strip_raster(rp, bad), g, "notch")
    acc = decode_burst_locked(plan, rp, bad, g, "notch", acc=True)
    p_plain = psnr(np.asarray(plain), np.asarray(rgb))
    p_acc = psnr(np.asarray(acc), np.asarray(rgb))
    assert p_acc > p_plain + 5.0, (p_plain, p_acc)
    assert p_acc > 33.0, p_acc


def test_color_killer_cleans_monochrome_transmission():
    """A monochrome transmission (no burst, luma-only content) decoded by
    a color receiver shows cross-color confetti: the demodulator reads
    luma detail as chroma.  The killer sees no burst and gates chroma to
    zero — clean B/W."""
    import dataclasses

    from color_modem_tpu.frame.pipeline import decode_block, encode_block
    from color_modem_tpu.frame.raster import decode_burst_locked
    from color_modem_tpu.utils.metrics import psnr

    plan = get_plan("ntsc")
    rp = make_raster(plan)
    # gray scene with fine detail near the subcarrier — the classic
    # confetti trigger (a tweed jacket on a B/W movie)
    y = smooth_scene(TEST_LINES, TEST_SAMPLES, seed=11)[:1]
    x_n = np.arange(TEST_SAMPLES)
    tweed = 0.15 * np.sin(
        2 * np.pi * 0.93 * plan.cfg.chroma.fsc / plan.fs * x_n
    ).astype(np.float32)
    y = np.clip(y + tweed, 0.0, 1.0)
    rgb = jnp.asarray(np.repeat(y, 3, axis=0)[None])  # gray scene
    g = frame_line_index(plan, 0, 1, TEST_LINES)
    comp = encode_block(plan, rgb, g)
    # monochrome TRANSMITTER: sync, no burst (like a 1950s B/W station)
    mono_tx = dataclasses.replace(rp, burst_len=0)
    rastered = add_raster(plan, mono_tx, comp, g)

    color_rx = decode_block(plan, strip_raster(rp, rastered), g, "notch")
    killed = decode_burst_locked(plan, rp, rastered, g, "notch",
                                 color_kill=0.4)
    p_confetti = psnr(np.asarray(color_rx), np.asarray(rgb))
    p_killed = psnr(np.asarray(killed), np.asarray(rgb))
    assert p_killed > p_confetti + 3.0, (p_confetti, p_killed)
    # and the killer must NOT trip on a real color transmission
    rgb_c = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=9)[None])
    rast_c = add_raster(plan, rp, encode_block(plan, rgb_c, g), g)
    live = decode_burst_locked(plan, rp, rast_c, g, "notch", color_kill=0.4)
    p_live = psnr(np.asarray(live), np.asarray(rgb_c))
    assert p_live > 35.0, p_live


@pytest.mark.parametrize("name,decoder", [("ntsc", "comb3"), ("pal", "delayline"),
                                          ("secam", "notch")])
def test_rastered_pipeline_roundtrip_identical(name, decoder):
    """encode(raster)+decode(raster) == plain roundtrip, bit for bit."""
    plan = get_plan(name)
    rgb = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=4)[None])
    enc_r, dec_r, _ = make_pipeline(plan, decoder, raster=True)
    _, _, rt = make_pipeline(plan, decoder)
    out_r = dec_r(enc_r(rgb, 0), 0)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(rt(rgb, 0)))


# ---------------------------------------------------------------------------
# PAL ident: V-switch parity recovery from the swinging burst
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["pal", "pal_m"])
def test_pal_ident_recovers_any_counter_slip(name):
    from color_modem_tpu.frame.channel import impair
    from color_modem_tpu.frame.raster import (
        decode_burst_locked,
        decode_identified,
        identify_vswitch,
    )
    from color_modem_tpu.utils.metrics import psnr

    plan = get_plan(name)
    rp = make_raster(plan)
    rgb = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=3)[None])
    enc, _, _ = make_pipeline(plan, "notch", raster=True)
    g_tx = frame_line_index(plan, 0, 1, TEST_LINES)
    # a static channel phase error must not confuse the ident (the swing's
    # coherence, not the absolute angle, carries the parity)
    rast = impair(plan, enc(rgb, 0), chroma_phase_deg=20.0)
    ref = float(psnr(
        np.asarray(decode_burst_locked(plan, rp, rast, g_tx, "delayline")),
        np.asarray(rgb)))
    for k in (0, 1, 2, 3):
        g_rx = g_tx + k
        slip = int(np.asarray(identify_vswitch(plan, rp, rast, g_rx))[0])
        assert slip == k % 2, (k, slip)
        out, _ = decode_identified(plan, rp, rast, g_rx, "delayline")
        q = float(psnr(np.asarray(out), np.asarray(rgb)))
        assert abs(q - ref) < 0.1, (k, q, ref)
    # control: TRUSTING a 1-line slip wrecks the picture (the V-switch
    # flips), which is exactly why the ident stage exists
    naive = float(psnr(
        np.asarray(decode_burst_locked(plan, rp, rast, g_tx + 1,
                                       "delayline")),
        np.asarray(rgb)))
    assert naive < ref - 10.0, (naive, ref)


def test_pal_ident_rejects_non_swinging():
    from color_modem_tpu.frame.raster import identify_vswitch

    plan = get_plan("ntsc")
    rp = make_raster(plan)
    g = frame_line_index(plan, 0, 1, 4)
    with pytest.raises(ValueError):
        identify_vswitch(plan, rp, jnp.zeros((1, 4, rp.n_total)), g)


def test_pal_ident_cli(capsys):
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder", "delayline",
                 "--demo", "--raster", "--burst-locked", "--pal-ident",
                 "--lines", str(TEST_LINES)]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["pal_ident"]["recovered"] is True
    assert rep["psnr_db"] > 20.0, rep


def test_pal_ident_cli_rejects_ntsc():
    from color_modem_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["roundtrip", "--standard", "ntsc", "--demo", "--raster",
              "--burst-locked", "--pal-ident"])
