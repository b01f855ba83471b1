"""Unit tests: standard configs and colorimetry (SURVEY.md §4.3 'Unit')."""

import numpy as np
import pytest

from color_modem_tpu.standards import NIIR, NTSC, PAL, SECAM

ALL = [NTSC(), PAL(), SECAM(), NIIR()]


@pytest.mark.parametrize("cfg", ALL, ids=lambda c: c.name)
def test_matrix_roundtrip_exact(cfg):
    fwd = cfg.rgb_to_ycc_np()
    inv = cfg.ycc_to_rgb_np()
    assert np.allclose(inv @ fwd, np.eye(3), atol=1e-12)


@pytest.mark.parametrize("cfg", ALL, ids=lambda c: c.name)
def test_luma_row_is_bt470(cfg):
    assert np.allclose(cfg.rgb_to_ycc_np()[0], [0.299, 0.587, 0.114])


def test_ntsc_constants():
    cfg = NTSC()
    # fsc = 315/88 MHz exactly (SURVEY.md A.2)
    fsc = cfg.chroma.fsc
    assert abs(fsc - 315e6 / 88.0) < 1e-3
    assert cfg.cpl_num / cfg.cpl_den == 227.5
    assert cfg.fh * 227.5 == pytest.approx(fsc, rel=1e-12)


def test_pal_constants():
    cfg = PAL()
    # fsc = 4.43361875 MHz exactly, including the +25 Hz offset (A.3)
    assert cfg.chroma.fsc == pytest.approx(4433618.75, abs=1e-6)
    assert cfg.cpl_num / cfg.cpl_den == pytest.approx(1135 / 4 + 1 / 625, rel=1e-15)
    assert cfg.chroma.v_switch


def test_secam_constants():
    cfg = SECAM()
    assert cfg.chroma.f0r == pytest.approx(4.40625e6)
    assert cfg.chroma.f0b == pytest.approx(4.25e6)
    assert cfg.chroma.dev_r == 280e3 and cfg.chroma.dev_b == 230e3
    assert cfg.is_fm


def test_secam_chroma_rows():
    cfg = SECAM()
    m = cfg.rgb_to_ycc_np()
    # D'R = -1.902 (R - Y), D'B = 1.505 (B - Y) (A.4)
    r = np.array([1.0, 0, 0])
    b = np.array([0, 0, 1.0])
    y = m[0]
    assert np.allclose(m[1], -1.902 * (r - y))
    assert np.allclose(m[2], 1.505 * (b - y))


def test_sample_rate_601_convention():
    assert NTSC().sample_rate(720) == pytest.approx(13.5e6)
    assert PAL().sample_rate(1440) == pytest.approx(27e6)


def test_equiband_ntsc():
    cfg = NTSC(equiband=True)
    assert cfg.chroma.c1_bandwidth == cfg.chroma.c2_bandwidth == 0.6e6


def test_configs_hashable():
    # jit-static requirement: frozen + hashable
    assert len({NTSC(), NTSC(), PAL()}) == 2


def test_variant_constants():
    from color_modem_tpu.standards import NTSC443, PAL_M, PAL_N

    v = NTSC443()
    assert v.chroma.fsc == pytest.approx(4.43361875e6, rel=1e-6)
    assert v.total_lines == 525 and not v.chroma.v_switch
    m = PAL_M()
    assert m.chroma.fsc == pytest.approx(227.25 * 4.5e6 / 286.0, rel=1e-12)
    assert m.total_lines == 525 and m.chroma.v_switch
    n = PAL_N()
    assert n.chroma.fsc == pytest.approx(3.58205625e6, abs=1e-6)
    assert n.total_lines == 625


def test_variant_roundtrip():
    import jax.numpy as jnp

    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.modem.plan import make_plan
    from color_modem_tpu.standards import PAL_M
    from color_modem_tpu.utils.metrics import psnr
    from color_modem_tpu.utils.testimages import smooth_scene

    plan = make_plan(PAL_M(), 720)
    img = smooth_scene(32, 720, seed=5).astype(np.float32)[None]
    _, _, rt = make_pipeline(plan, "delayline")
    assert psnr(np.asarray(rt(jnp.asarray(img))), img) > 34


def test_variant_phase_laws_exact():
    """cpl rationals reproduce the documented fsc and stay int32-safe."""
    from color_modem_tpu.standards import NTSC443, PAL_M, PAL_N

    for cfg, fsc_doc in [
        (NTSC443(), 4433618.75),
        (PAL_M(), 227.25 * 4.5e6 / 286.0),
        (PAL_N(), 3582056.25),
    ]:
        # den must keep (num % den) * (g % den) below 2^31 (dsp/nco)
        assert cfg.cpl_den <= 46341, cfg.name
        # phase-law frequency: drift below 1e-9 cycles/line (NTSC-4.43's
        # exact den overflows int32 — its approximant drifts 2 deg/hour)
        cpl_err = abs(cfg.cpl_num / cfg.cpl_den - fsc_doc / cfg.fh)
        assert cpl_err < 1e-9, f"{cfg.name}: {cpl_err}"


def test_variant_decoders_gated_by_phase_law():
    """NTSC-4.43's phase law flips only 158 deg at best — combs corrupt hue
    (measured 7.5 dB worse than notch) and must not be offered."""
    from color_modem_tpu.standards import NTSC443, PAL_M, PAL_N
    from color_modem_tpu.standards.decoders import allowed_decoders

    assert allowed_decoders(NTSC443()) == ("notch", "delayline", "avg")
    assert "comb2" in allowed_decoders(PAL_M())
    assert "comb2" in allowed_decoders(PAL_N())


@pytest.mark.parametrize("name", ["ntsc443", "pal_m", "pal_n", "pal60"])
def test_variant_roundtrip_and_golden_parity(name):
    import jax.numpy as jnp

    from color_modem_tpu import golden
    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.modem.plan import make_plan
    from color_modem_tpu.standards import ALL_STANDARDS
    from color_modem_tpu.utils.metrics import psnr
    from color_modem_tpu.utils.testimages import smooth_scene

    plan = make_plan(ALL_STANDARDS[name](), 720)
    img = smooth_scene(32, 720, seed=6).astype(np.float32)[None]
    enc, dec, rt = make_pipeline(plan, "notch")
    comp = np.asarray(enc(jnp.asarray(img)))
    comp_g = golden.encode_frame(plan, img[0], frame=0)[None]
    assert psnr(comp, comp_g) > 60, "encode parity vs golden"
    out = np.asarray(rt(jnp.asarray(img)))
    assert psnr(out, img) > 28
