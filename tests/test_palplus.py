"""PALplus letterbox + vertical helper (frame/palplus.py).

The system property under test is the helper's whole reason to exist:
vertical detail in the top quarter of the vertical spectrum ([3/8, 1/2)
cycles/line) is destroyed by plain letterboxing and restored by the
helper — while a conventional receiver sees black bars.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from color_modem_tpu.frame.palplus import (
    PalPlusGeometry,
    helper_encode,
    helper_reconstruct,
    make_palplus_pipeline,
)
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import PAL, SECAM
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

PLAN = make_plan(PAL(), 720)
GEO = PalPlusGeometry(576)

#: vertical sinusoid inside the helper band (0.375..0.5 cycles/line)
HELPER_BAND_F = 0.42
INTERIOR = slice(32, -32)  # vertical resample edge ring excluded


def _vertical_detail_scene():
    l = np.arange(576)[:, None]
    base = smooth_scene(576, 720, seed=3)
    vert = 0.25 * np.cos(2 * np.pi * HELPER_BAND_F * l)
    return np.clip(base + vert[None], 0.0, 1.0).astype(np.float32)[None]


def test_helper_band_roundtrip_is_near_exact():
    """helper_encode -> helper_reconstruct restores helper-band content
    (the modulated-decimation identity, no modem involved)."""
    l = np.arange(576)[:, None]
    n = np.arange(720)[None, :]
    y = (
        0.5
        + 0.3
        * np.cos(2 * np.pi * HELPER_BAND_F * l)
        * np.exp(-(((n - 360) / 200.0) ** 2))
    ).astype(np.float32)[None]
    down, helper = helper_encode(GEO, jnp.asarray(y))
    rec = np.asarray(helper_reconstruct(GEO, down, helper))
    assert psnr(rec[:, INTERIOR], y[:, INTERIOR]) > 33.0
    # letterbox-only (drop the helper) must be much worse: the detail
    # lives entirely in the helper band
    from color_modem_tpu.frame.transcode import resample_lines

    lb = np.asarray(resample_lines(down, 576))
    assert psnr(lb[:, INTERIOR], y[:, INTERIOR]) < 20.0


def test_roundtrip_helper_gain():
    """Full composite round trip: the helper buys >=10 dB on helper-band
    vertical detail over the conventional letterbox zoom."""
    rgb = _vertical_detail_scene()
    _, _, rt = make_palplus_pipeline(PLAN, "comb3")
    with_h = np.asarray(rt(jnp.asarray(rgb), 0, use_helper=True))
    without = np.asarray(rt(jnp.asarray(rgb), 0, use_helper=False))
    p_h = psnr(with_h[..., INTERIOR, :], rgb[..., INTERIOR, :])
    p_n = psnr(without[..., INTERIOR, :], rgb[..., INTERIOR, :])
    assert p_h > 28.0, p_h
    assert p_h - p_n > 10.0, (p_h, p_n)


def test_no_regression_on_smooth_content():
    """On content with no helper-band energy the helper path adds
    (near) nothing — and must not hurt."""
    rgb = np.clip(smooth_scene(576, 720, seed=5), 0, 1)[None]
    _, _, rt = make_palplus_pipeline(PLAN, "comb3")
    with_h = np.asarray(rt(jnp.asarray(rgb), 0, use_helper=True))
    without = np.asarray(rt(jnp.asarray(rgb), 0, use_helper=False))
    p_h = psnr(with_h[..., INTERIOR, :], rgb[..., INTERIOR, :])
    p_n = psnr(without[..., INTERIOR, :], rgb[..., INTERIOR, :])
    assert p_h > p_n - 0.2, (p_h, p_n)


def test_bars_look_black_on_conventional_receiver():
    """The helper hides at the subcarrier: bar-row luma after the notch
    is essentially zero, and the excursion stays inside the clip."""
    from color_modem_tpu.modem.qam import separate_notch

    rgb = _vertical_detail_scene()
    enc, _, _ = make_palplus_pipeline(PLAN, "comb3")
    comp = np.asarray(enc(jnp.asarray(rgb), 0))
    bars = np.concatenate(
        [comp[:, : GEO.bar], comp[:, GEO.bar + GEO.l_pic :]], axis=1
    )
    assert np.abs(bars).max() <= 0.5 + 1e-6
    luma_bars, _ = separate_notch(PLAN, jnp.asarray(bars))
    assert np.abs(np.asarray(luma_bars)).mean() < 0.005


def test_compatible_picture_in_the_letterbox():
    """A conventional decode of the PALplus composite shows the letterboxed
    picture at normal quality in the picture rows."""
    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.frame.transcode import resample_lines

    rgb = _vertical_detail_scene()
    enc, _, _ = make_palplus_pipeline(PLAN, "comb3")
    comp = enc(jnp.asarray(rgb), 0)
    _, dec, _ = make_pipeline(PLAN, "comb3")
    full = np.asarray(dec(comp, 0))
    pic = full[..., GEO.bar : GEO.bar + GEO.l_pic, :]
    want = np.clip(
        np.asarray(resample_lines(jnp.asarray(rgb), GEO.l_pic)), 0, 1
    )
    assert psnr(pic[..., INTERIOR, :], want[..., INTERIOR, :]) > 25.0


def test_fm_standards_refused():
    with pytest.raises(ValueError, match="FM"):
        make_palplus_pipeline(make_plan(SECAM(), 720))


def test_line_count_gate():
    with pytest.raises(ValueError, match="divisible by 8"):
        PalPlusGeometry(570)


def test_sharded_palplus_matches_unsharded():
    """DP-sharded PALplus (frames axis) equals unsharded to 1e-6 —
    everything in the pipeline is per-frame, but the large (L, L')
    vertical-resample matmuls pick up shape-dependent fp scheduling at
    the different per-device batch shape, exactly like SECAM's decode
    chain (test_sharding.py header); measured 4.2e-7."""
    from color_modem_tpu.parallel import make_mesh
    from color_modem_tpu.parallel.sharded import make_sharded_palplus_pipeline

    rng = np.random.default_rng(7)
    rgb = rng.random((8, 3, 64, 720)).astype(np.float32)  # 64 lines: %8==0
    _, _, rt = make_palplus_pipeline(PLAN, "comb3")
    _, _, rt_s = make_sharded_palplus_pipeline(
        PLAN, make_mesh(frame=8, lineblk=1), "comb3"
    )
    a = np.asarray(rt(jnp.asarray(rgb), 3))
    b = np.asarray(rt_s(jnp.asarray(rgb), 3))
    assert np.abs(a - b).max() <= 1e-6


def test_sharded_palplus_refuses_line_sharding():
    from color_modem_tpu.parallel import make_mesh
    from color_modem_tpu.parallel.sharded import make_sharded_palplus_pipeline

    with pytest.raises(ValueError, match="frames only"):
        make_sharded_palplus_pipeline(PLAN, make_mesh(frame=2, lineblk=4))


def test_interlaced_roundtrip_helper_gain():
    """The 625i service (VERDICT r4 item 2): field-sequential PALplus with
    the helper lines split across the field pair must still buy the
    helper-band detail back over the conventional zoom.  The absolute
    level sits below the progressive path — the interlaced comb decoder
    combs transmitted-adjacent lines (spatially 2 apart), the authentic
    interlace cost — but the helper GAIN is what the system sells."""
    from color_modem_tpu.frame.palplus import make_interlaced_palplus_pipeline

    rgb = _vertical_detail_scene()
    _, _, rt = make_interlaced_palplus_pipeline(PLAN, "comb3")
    with_h = np.asarray(rt(jnp.asarray(rgb), 0, use_helper=True))
    without = np.asarray(rt(jnp.asarray(rgb), 0, use_helper=False))
    p_h = psnr(with_h[..., INTERIOR, :], rgb[..., INTERIOR, :])
    p_n = psnr(without[..., INTERIOR, :], rgb[..., INTERIOR, :])
    assert p_h > 25.0, p_h
    assert p_h - p_n > 8.0, (p_h, p_n)


def test_interlaced_raster_rf_helper_gain():
    """The full authentic broadcast stack: interlaced PALplus, rastered
    rows (sync/burst on the bars too), VSB RF hop — the helper survives
    every layer (measured: the hop costs < 0.1 dB)."""
    from color_modem_tpu.frame.palplus import make_interlaced_palplus_pipeline
    from color_modem_tpu.frame.raster import make_raster
    from color_modem_tpu.frame.rf import (
        make_rf_plan, rf_demodulate, rf_modulate,
    )

    rgb = _vertical_detail_scene()
    enc, dec, _ = make_interlaced_palplus_pipeline(PLAN, "comb3", raster=True)
    comp = enc(jnp.asarray(rgb), 0)
    rfp = make_rf_plan(PLAN, row_samples=make_raster(PLAN).n_total)
    comp_rx = rf_demodulate(rfp, rf_modulate(rfp, comp, 0), 0)
    with_h = np.asarray(dec(comp_rx, 0, use_helper=True))
    without = np.asarray(dec(comp_rx, 0, use_helper=False))
    p_h = psnr(with_h[..., INTERIOR, :], rgb[..., INTERIOR, :])
    p_n = psnr(without[..., INTERIOR, :], rgb[..., INTERIOR, :])
    assert p_h > 25.0, p_h
    assert p_h - p_n > 8.0, (p_h, p_n)


def test_interlaced_line_count_gate():
    from color_modem_tpu.frame.palplus import encode_palplus_fields

    with pytest.raises(ValueError, match="divisible by 16"):
        encode_palplus_fields(
            PLAN, jnp.zeros((1, 3, 40, 720), jnp.float32), 0
        )


def test_cli_palplus_full_stack(capsys):
    """roundtrip --palplus --interlaced --raster --rf (the VERDICT r4
    item-2 'Done' line) runs green with the helper machinery intact."""
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder", "comb3",
                 "--demo", "--pattern", "scene", "--lines", "64",
                 "--palplus", "--interlaced", "--raster", "--rf"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["palplus"] and rep["interlaced"] and rep["raster"] and rep["rf"]
    assert rep["psnr_db"] > 20.0, rep


def test_cli_palplus(capsys):
    import json

    from color_modem_tpu.cli import main

    assert main(["roundtrip", "--standard", "pal", "--decoder", "comb3",
                 "--demo", "--pattern", "scene", "--lines", "64",
                 "--palplus"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["palplus"] is True
    assert rep["psnr_db"] >= rep["psnr_without_helper_db"] - 0.2, rep
