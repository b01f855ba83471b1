"""Randomized-input robustness sweep.

The rest of the suite pins exact numbers on fixed fixtures; this file
widens the input distribution: random band-limited scenes AND hostile
uniform noise images through every standard's flagship decoders must
stay NaN-free (jax_debug_nans is on in conftest — a NaN fails loudly)
and above a LOOSE per-family floor.  The floors are not quality claims
(tests/test_roundtrip.py owns those); they catch catastrophic breakage
on inputs nobody hand-picked.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import TEST_SAMPLES
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import ALL_STANDARDS

_CACHE = {}


def _plan(name):
    """conftest.get_plan covers the 4 core standards; the fuzz sweep needs
    the variants too."""
    if name not in _CACHE:
        _CACHE[name] = make_plan(ALL_STANDARDS[name](), TEST_SAMPLES)
    return _CACHE[name]
from color_modem_tpu.standards.decoders import allowed_decoders
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L = 32

#: loose floors by decoder family on random SMOOTH scenes (dB).  Derived
#: from the enforced fixture numbers minus a wide scene-variance margin.
SMOOTH_FLOOR = 24.0
#: hostile full-band uniform noise images: unrepresentable detail, the
#: modem legitimately low-passes it — only catastrophic failure is wrong
NOISE_FLOOR = 10.0


def _flagship_cases():
    for name, factory in ALL_STANDARDS.items():
        cfg = factory()
        decs = allowed_decoders(cfg)
        # first (simplest) and the best non-temporal decoder
        pick = {decs[0], "comb3" if "comb3" in decs else decs[-1]}
        for d in sorted(pick):
            if d in ("comb3d", "comb3dA"):
                continue
            yield name, d


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_smooth_scenes_all_standards(seed):
    rng = np.random.default_rng(seed)
    for name, decoder in _flagship_cases():
        plan = _plan(name)
        _, _, rt = make_pipeline(plan, decoder)
        x = np.stack([
            smooth_scene(L, TEST_SAMPLES, seed=int(rng.integers(1 << 30)))
            for _ in range(2)
        ]).astype(np.float32)
        out = np.asarray(rt(jnp.asarray(x), int(rng.integers(64))))
        p = psnr(out, x)
        assert np.isfinite(out).all(), (name, decoder)
        assert p > SMOOTH_FLOOR, f"{name}/{decoder}: {p:.1f} dB"


def test_fuzz_hostile_noise_images():
    rng = np.random.default_rng(7)
    for name in ("ntsc", "pal", "secam"):
        plan = _plan(name)
        _, _, rt = make_pipeline(plan, allowed_decoders(plan.cfg)[0])
        x = rng.random((1, 3, L, TEST_SAMPLES)).astype(np.float32)
        out = np.asarray(rt(jnp.asarray(x), 0))
        assert np.isfinite(out).all(), name
        p = psnr(out, x)
        assert p > NOISE_FLOOR, f"{name}: {p:.1f} dB on noise image"


def test_fuzz_extreme_flat_inputs():
    """All-black, all-white, and saturated-primary flats: every flagship
    decoder returns finite output close to the input (flats have no
    detail to lose; SECAM's FM carries them exactly)."""
    flats = {
        "black": np.zeros((1, 3, L, TEST_SAMPLES), np.float32),
        "white": np.ones((1, 3, L, TEST_SAMPLES), np.float32),
        "red": np.zeros((1, 3, L, TEST_SAMPLES), np.float32),
    }
    flats["red"][:, 0] = 1.0
    for name, decoder in _flagship_cases():
        plan = _plan(name)
        _, _, rt = make_pipeline(plan, decoder)
        for tag, x in flats.items():
            out = np.asarray(rt(jnp.asarray(x), 0))
            assert np.isfinite(out).all(), (name, decoder, tag)
            p = psnr(out[..., 8:-8], x[..., 8:-8])  # edge ringing allowed
            assert p > 20.0, f"{name}/{decoder}/{tag}: {p:.1f} dB"
