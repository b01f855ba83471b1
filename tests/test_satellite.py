"""Satellite FM layer tests (frame/satellite.py): the FM physics itself.

The terrestrial RF layer is VSB-AM; the satellite layer is wideband FM.
These tests enforce the properties that make FM FM: the ~+12 dB
post-detection SNR advantage over the channel CNR, emphasis-pair
transparency, exact dispersal removal by the downstream clamp, and
composite/MAC transparency through the hop.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame import satellite as sat
from color_modem_tpu.modem import mac
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L, W = 48, 720


@pytest.fixture(scope="module")
def mac_plan():
    return mac.make_mac_plan(W)


@pytest.fixture(scope="module")
def mac_sig(mac_plan):
    img = jnp.asarray(smooth_scene(L, W, seed=3).astype(np.float32))
    g = jnp.arange(L)
    return img, g, mac.encode(mac_plan, img[None], g[None])


def test_emphasis_pair_is_transparent(mac_plan):
    """pre * de == 1 across the video band (the SECAM-pair property)."""
    from color_modem_tpu.dsp.design import freqz

    sp = sat.make_sat_plan(mac_plan.cfg.fs, mac_plan.cfg.samples_per_line)
    f = np.linspace(0.0, 0.42 * sp.base_fs, 300)
    prod = np.abs(freqz(sp.pre_taps, sp.base_fs, f)) * np.abs(
        freqz(sp.de_taps, sp.base_fs, f)
    )
    assert np.max(np.abs(prod - 1.0)) < 0.01


def test_mac_transparency_and_picture(mac_plan, mac_sig):
    """Noise-free hop: >54 dB baseband transparency, <1.2 dB picture cost.

    Measured 2026-08-18: 56.7 dB transparency; picture 50.2 dB through the
    hop vs 51.0 direct; data burst BER 0 with all line syncs.
    """
    img, g, sig = mac_sig
    sp = sat.make_sat_plan(mac_plan.cfg.fs, mac_plan.cfg.samples_per_line)
    rx = sat.sat_roundtrip(sp, sig)
    assert float(psnr(rx, sig)) >= 54.0
    direct = float(psnr(mac.decode(mac_plan, sig, g[None]), img[None]))
    via = float(psnr(mac.decode(mac_plan, rx, g[None]), img[None]))
    assert via >= direct - 1.2, (via, direct)
    ok, _ = mac.decode_data(mac_plan, rx)
    assert bool(ok.all())


@pytest.mark.parametrize("cnr_db,fm_gain_min", [(25.0, 10.0), (18.0, 10.0)])
def test_fm_advantage_above_threshold(mac_plan, mac_sig, cnr_db, fm_gain_min):
    """Above threshold, post-detection SNR beats the channel CNR by the FM
    improvement (measured ~+12 dB at this modulation index)."""
    _, _, sig = mac_sig
    sp = sat.make_sat_plan(mac_plan.cfg.fs, mac_plan.cfg.samples_per_line)
    rx = sat.sat_roundtrip(sp, sig, key=jax.random.PRNGKey(1), cnr_db=cnr_db)
    snr = float(psnr(rx, sig))
    assert snr >= cnr_db + fm_gain_min, (cnr_db, snr)


def test_data_survives_satellite_noise(mac_plan):
    img = jnp.asarray(smooth_scene(L, W, seed=1).astype(np.float32))
    g = jnp.arange(L)
    payload = jax.random.bernoulli(
        jax.random.PRNGKey(5), 0.5, (1, L, 99)
    ).astype(jnp.int32)
    sig = mac.encode(mac_plan, img[None], g[None], payload)
    sp = sat.make_sat_plan(mac_plan.cfg.fs, mac_plan.cfg.samples_per_line)
    rx = sat.sat_roundtrip(sp, sig, key=jax.random.PRNGKey(2), cnr_db=20.0)
    ok, bits = mac.decode_data(mac_plan, rx)
    assert bool(ok.all())
    assert bool(jnp.all(bits == payload))


def test_dispersal_removed_by_clamp(mac_plan, mac_sig):
    """The frame-synchronous dispersal ramp must cost the picture nothing:
    the MAC clamp period restores each line's DC (measured identical to
    four decimals with/without dispersal)."""
    img, g, sig = mac_sig
    sp0 = sat.make_sat_plan(mac_plan.cfg.fs, mac_plan.cfg.samples_per_line)
    sp1 = sat.make_sat_plan(
        mac_plan.cfg.fs, mac_plan.cfg.samples_per_line, dispersal=0.1
    )
    p0 = float(psnr(
        mac.decode(mac_plan, sat.sat_roundtrip(sp0, sig, gline=g[None]),
                   g[None]), img[None]))
    p1 = float(psnr(
        mac.decode(mac_plan, sat.sat_roundtrip(sp1, sig, gline=g[None]),
                   g[None]), img[None]))
    assert abs(p0 - p1) < 0.1, (p0, p1)
    # and the ramp really was transmitted: the raw baseband differs
    raw0 = sat.sat_roundtrip(sp0, sig, gline=g[None])
    raw1 = sat.sat_roundtrip(sp1, sig, gline=g[None])
    assert float(jnp.max(jnp.abs(raw0 - raw1))) > 0.05


def test_composite_transparency():
    """A SECAM composite (satellite's actual historical payload) decodes
    through the FM hop within 0.5 dB of the direct path."""
    from color_modem_tpu.frame.pipeline import make_pipeline

    plan = get_plan("secam")
    img = jnp.asarray(smooth_scene(L, W, seed=7).astype(np.float32))
    enc, dec, _ = make_pipeline(plan, "interp")
    comp = enc(img[None], 0)
    sp = sat.make_sat_plan(plan.fs, W)
    rx = sat.sat_roundtrip(sp, comp)
    direct = float(psnr(dec(comp, 0), img[None]))
    via = float(psnr(dec(rx, 0), img[None]))
    assert via >= direct - 0.5, (via, direct)
