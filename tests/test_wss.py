"""Widescreen signalling (frame/wss.py).

Codebook properties, clean/impaired round-trips on both 625-line
standards, timing and gain invariance, and the in-composite test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame import wss
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.timebase import fractional_shift


def test_aspect_codebook_is_odd_weight_distance_2():
    codes = list(wss.ASPECT_CODES.values())
    assert len(set(codes)) == 8
    for c in codes:
        assert sum(c) % 2 == 1           # odd parity built in
    for i in range(8):
        for j in range(i + 1, 8):
            d = sum(a != b for a, b in zip(codes[i], codes[j]))
            assert d >= 2


def test_word_layout():
    w = np.asarray(wss.wss_word("16:9 full (anamorphic)", enhanced=0b1010,
                                subtitles=0b101, reserved=0b011))
    assert list(w[:4]) == [0, 1, 1, 1]
    rep = wss.parse_wss(w)
    assert rep["aspect"] == "16:9 full (anamorphic)" and rep["aspect_ok"]
    assert rep["enhanced"] == 0b1010
    assert rep["subtitles"] == 0b101
    assert rep["reserved"] == 0b011


@pytest.mark.parametrize("std", ["pal", "secam"])
@pytest.mark.parametrize("aspect", sorted(wss.ASPECT_CODES))
def test_clean_roundtrip_every_aspect(std, aspect):
    plan = get_plan(std)
    bits = wss.wss_word(aspect, enhanced=3, subtitles=1)
    wave = wss.encode_wss(plan, bits)
    got, margin = wss.decode_wss(plan, wave)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))
    assert float(margin) > 0.4
    assert wss.parse_wss(got)["aspect"] == aspect


def test_timing_and_gain_invariance():
    plan = get_plan("pal")
    bits = wss.wss_word("16:9 letterbox centre")
    wave = wss.encode_wss(plan, bits)
    shifted = 0.8 * fractional_shift(wave[None], jnp.asarray([1.3]))[0]
    got, margin = wss.decode_wss(plan, shifted)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))
    assert float(margin) > 0.3


def test_noise_robustness_batched():
    plan = get_plan("pal")
    bits = jnp.stack([wss.wss_word(a) for a in sorted(wss.ASPECT_CODES)])
    waves = wss.encode_wss(plan, bits)
    noisy = waves + 0.03 * jax.random.normal(
        jax.random.PRNGKey(0), waves.shape
    )
    got, margin = wss.decode_wss(plan, noisy)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))
    assert float(jnp.min(margin)) > 0.15


def test_flagged_when_aspect_code_corrupted():
    plan = get_plan("pal")
    bits = wss.wss_word("4:3 full")
    # single bit error in group A -> not a codeword (odd-weight book)
    bad = np.asarray(bits).copy()
    bad[1] ^= 1
    rep = wss.parse_wss(bad)
    assert not rep["aspect_ok"] and rep["aspect"] == "invalid"


def test_in_composite_through_channel():
    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.utils.metrics import psnr
    from color_modem_tpu.utils.testimages import smooth_scene

    plan = get_plan("pal")
    enc, dec, _ = make_pipeline(plan, "comb3")
    rgb = smooth_scene(32, plan.n_samples, seed=9).astype(np.float32)[None]
    comp = enc(jnp.asarray(rgb), 0)
    bits = wss.wss_word("14:9 letterbox top", subtitles=2)
    comp = comp.at[0, 0].set(wss.encode_wss(plan, bits))
    rx = impair(plan, comp, noise_sigma=0.01, ghost_delay_us=0.3,
                ghost_gain=0.1, key=jax.random.PRNGKey(4))
    got, margin = wss.decode_wss(plan, rx[0, 0])
    rep = wss.parse_wss(got)
    assert rep["aspect"] == "14:9 letterbox top" and rep["subtitles"] == 2
    out = dec(rx, 0)
    assert float(psnr(out[0, :, 2:], rgb[0, :, 2:])) > 22.0
