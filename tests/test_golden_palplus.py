"""PALplus oracle parity (round 5, VERDICT r4 item 7).

The frozen naive-NumPy model in golden/palplus.py certifies the helper
encoder/decoder pair in frame/palplus.py: a CONSISTENT shift of
helper_encode + helper_reconstruct, or of the bar modulation + its
product detector, passes every property test in tests/test_palplus.py
but disagrees with this model in one direction or the other.

Bounds measured 2026-08-20 on the fixture below (CPU; parity is
backend-independent): vertical bank 132.0/139.1 dB, reconstruct 133.4,
full composite encode 135.8, full decode 129.4 (helper) / 126.0 (zoom)
— the f32 HIGH-precision matmul/product-detect chain vs the f64 oracle.
Thresholds sit ~10 dB under (suite convention).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame import palplus as pp
from color_modem_tpu.golden import palplus as gp

L, N = 64, 720


def _parity_db(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    err = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(float(np.var(b)) / max(err, 1e-300))


@pytest.fixture(scope="module")
def plan():
    return get_plan("pal")


@pytest.fixture(scope="module")
def rgb():
    from color_modem_tpu.utils.testimages import smooth_scene

    l = np.arange(L)[:, None]
    vert = 0.25 * np.cos(2 * np.pi * 0.42 * l)  # helper-band detail
    return np.clip(
        smooth_scene(L, N, seed=11) + vert[None], 0.0, 1.0
    ).astype(np.float32)


def test_vertical_bank_parity(rgb):
    """helper_encode / helper_reconstruct vs the f64 oracle."""
    geo = pp.PalPlusGeometry(L)
    y = rgb[0]
    down_j, help_j = pp.helper_encode(geo, jnp.asarray(y))
    down_g, help_g = gp.helper_encode(L, y)
    assert _parity_db(down_j, down_g) > 120.0
    assert _parity_db(help_j, help_g) > 125.0
    rec_j = pp.helper_reconstruct(geo, down_j, help_j)
    rec_g = gp.helper_reconstruct(L, down_g, help_g)
    assert _parity_db(rec_j, rec_g) > 120.0


def test_encode_parity(plan, rgb):
    """Full PALplus composite (picture rows + modulated helper bars)."""
    from color_modem_tpu.frame.pipeline import frame_line_index

    g = frame_line_index(plan, 3, 1, L)
    comp_j = np.asarray(
        pp.encode_palplus(plan, jnp.asarray(rgb)[None], g)
    )[0]
    comp_g = gp.encode_palplus(plan, rgb, pp._helper_taps(plan), frame=3)
    assert _parity_db(comp_j, comp_g) > 120.0


def test_decode_parity(plan, rgb):
    """Full decode (comb3 picture + helper recovery + reconstruction) on
    the ORACLE's composite, helper on and off."""
    from color_modem_tpu.frame.pipeline import frame_line_index

    taps = pp._helper_taps(plan)
    comp_g = gp.encode_palplus(plan, rgb, taps, frame=3)
    g = frame_line_index(plan, 3, 1, L)
    for use_helper in (True, False):
        out_j = np.asarray(
            pp.decode_palplus(
                plan, jnp.asarray(comp_g, jnp.float32)[None], g,
                "comb3", use_helper=use_helper,
            )
        )[0]
        out_g = gp.decode_palplus(
            plan, comp_g, taps, frame=3, decoder="comb3",
            use_helper=use_helper,
        )
        assert _parity_db(out_j, out_g) > 115.0, use_helper


def test_interlaced_encode_parity(plan, rgb):
    """The 625i transmission FORMAT is oracle-pinned: frame row j on
    field j%2, helper lines split alternately across the field pair,
    every row keyed by its field line number.  A consistent field-mapping
    shift in encoder + decoder cancels in every round-trip property test;
    here the encoder alone must match the frozen per-line model — and the
    JAX decoder must recover the ORACLE's composite (inverse consistency
    without a second golden decode)."""
    from color_modem_tpu.utils.metrics import psnr

    taps = pp._helper_taps(plan)
    comp_j = np.asarray(
        pp.encode_palplus_fields(plan, jnp.asarray(rgb)[None], 3)
    )[0::1].reshape(2, L // 2, N)  # (2B=2, L/2, N) with B=1
    comp_g = gp.encode_palplus_fields(plan, rgb, taps, frame=3)
    assert _parity_db(comp_j, comp_g) > 120.0
    out = np.asarray(
        pp.decode_palplus_fields(
            plan, jnp.asarray(comp_g, jnp.float32), 3, "comb3"
        )
    )[0]
    zoom = np.asarray(
        pp.decode_palplus_fields(
            plan, jnp.asarray(comp_g, jnp.float32), 3, "comb3",
            use_helper=False,
        )
    )[0]
    interior = slice(8, -8)
    p_h = psnr(out[..., interior, :], np.asarray(rgb)[..., interior, :])
    p_n = psnr(zoom[..., interior, :], np.asarray(rgb)[..., interior, :])
    assert p_h - p_n > 8.0, (p_h, p_n)


def test_oracle_roundtrip_recovers_helper_band(plan, rgb):
    """Self-check of the oracle (not a parity test): its own round trip
    restores the helper-band detail the zoom path loses — the system
    property, derived independently of the JAX code."""
    from color_modem_tpu.utils.metrics import psnr

    taps = pp._helper_taps(plan)
    comp = gp.encode_palplus(plan, rgb, taps)
    with_h = gp.decode_palplus(plan, comp, taps, use_helper=True)
    without = gp.decode_palplus(plan, comp, taps, use_helper=False)
    interior = slice(8, -8)
    p_h = psnr(with_h[..., interior, :], np.asarray(rgb, np.float64)[..., interior, :])
    p_n = psnr(without[..., interior, :], np.asarray(rgb, np.float64)[..., interior, :])
    assert p_h - p_n > 8.0, (p_h, p_n)
