"""VITC (vertical interval timecode) tests — frame/vitc.py.

The run-in-free sync-pair timing recovery and the x^8+1 CRC are the two
things that distinguish VITC from the other VBI services; both are
exercised here, plus survival through real channel impairments.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import get_plan
from color_modem_tpu.frame import vitc


@pytest.fixture(scope="module")
def plan():
    return get_plan("ntsc")


def test_pack_unpack_roundtrip():
    for n in (0, 1, 29, 30, 1799, 107999):
        h, m, s, f = vitc.timecode_for_frame(n, 30)
        bits = vitc.vitc_pack(h, m, s, f, drop_frame=(n % 2 == 0),
                              field=(n % 3 == 0), user=(9, 8, 7, 6, 5, 4, 3, 2))
        rep = vitc.vitc_unpack(bits)
        assert (rep["hours"], rep["minutes"], rep["seconds"],
                rep["frames"]) == (h, m, s, f)
        assert rep["drop_frame"] == (n % 2 == 0)
        assert rep["field"] == (n % 3 == 0)
        assert rep["user"] == (9, 8, 7, 6, 5, 4, 3, 2)
        assert rep["sync_ok"] and rep["crc_ok"]


def test_crc_detects_corruption():
    bits = vitc.vitc_pack(1, 2, 3, 4)
    for pos in (2, 17, 45, 79):   # payload bits (not sync pairs)
        bad = bits.copy()
        bad[pos] ^= 1
        assert not vitc.vitc_unpack(bad)["crc_ok"], pos
    # sync damage is caught by the sync check even where CRC can't see it
    bad = bits.copy()
    bad[0] ^= 1
    assert not vitc.vitc_unpack(bad)["sync_ok"]


def test_waveform_roundtrip_batched(plan):
    bits = np.stack([
        vitc.vitc_pack(*vitc.timecode_for_frame(n, 30), field=bool(n % 2))
        for n in range(16)
    ])
    wave = vitc.encode_vitc_line(plan, jnp.asarray(bits))
    got, score = vitc.decode_vitc_line(plan, wave)
    assert bool(jnp.all(got == jnp.asarray(bits)))
    assert int(score.min()) == 18


def test_survives_gain_and_noise(plan):
    """The sync-pair midpoint threshold makes slicing gain-invariant;
    measured exact through 0.7-1.2x gain at sigma 0.05."""
    bits = np.stack([
        vitc.vitc_pack(*vitc.timecode_for_frame(n, 25)) for n in range(8)
    ])
    wave = vitc.encode_vitc_line(plan, jnp.asarray(bits))
    for gain, sigma, key in ((0.7, 0.04, 1), (1.2, 0.05, 2)):
        noisy = gain * wave + sigma * jax.random.normal(
            jax.random.PRNGKey(key), wave.shape
        )
        got, _ = vitc.decode_vitc_line(plan, noisy)
        assert bool(jnp.all(got == jnp.asarray(bits))), (gain, sigma)


def test_survives_timing_shift(plan):
    """A fractional-bit time-base shift must be absorbed by the phase
    search (that is what the embedded sync pairs are FOR)."""
    bits = vitc.vitc_pack(23, 59, 59, 24)
    wave = vitc.encode_vitc_line(plan, jnp.asarray(bits))
    shift = 3  # samples ~ 0.4 of a bit period
    shifted = jnp.roll(wave, shift, axis=-1)
    got, score = vitc.decode_vitc_line(plan, shifted)
    assert bool(jnp.all(got == jnp.asarray(bits)))
    assert int(score) == 18


def test_works_on_625(plan):
    p625 = get_plan("pal")
    bits = vitc.vitc_pack(*vitc.timecode_for_frame(12345, 25))
    wave = vitc.encode_vitc_line(p625, jnp.asarray(bits))
    got, _ = vitc.decode_vitc_line(p625, wave)
    assert vitc.vitc_unpack(np.asarray(got))["crc_ok"]
