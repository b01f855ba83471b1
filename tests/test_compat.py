"""Compat layer: the per-line reference protocol must match the batch
pipeline on interior lines (first/last lines use streaming state instead of
reflection — documented deviation, compat/line_api.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.compat import (
    ColorAveragingModem,
    DelayLinePalModem,
    ImageModem,
    NiirModem,
    NtscModem,
    PalModem,
    SecamModem,
    Simple3DCombModem,
    SimpleCombModem,
)
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.utils.testimages import smooth_scene

L, N = 24, TEST_SAMPLES


@pytest.fixture(scope="module")
def img():
    return smooth_scene(L, N, seed=3).astype(np.float32)


def _batch(name, decoder, img, frame=0):
    plan = get_plan(name)
    enc, dec, _ = make_pipeline(plan, decoder)
    comp = np.asarray(enc(img[None], frame))[0]
    rgb = np.asarray(dec(jnp.asarray(comp[None]), frame))[0]
    return comp, rgb


CASES = [
    ("ntsc", "notch", lambda: NtscModem(N), 0),
    ("ntsc", "comb2", lambda: SimpleCombModem(NtscModem(N)), 1),
    ("ntsc", "comb3", lambda: Simple3DCombModem(NtscModem(N)), 1),
    ("ntsc", "avg", lambda: ColorAveragingModem(NtscModem(N)), 1),
    ("pal", "delayline", lambda: DelayLinePalModem(N), 1),
    ("secam", "notch", lambda: SecamModem(N), 1),
    ("niir", "notch", lambda: NiirModem(N), 1),
    # FM/NIIR chroma averaging chains two 1-line streaming states
    # (pairing/normalize + averaging) -> 2-line seam
    ("secam", "avg", lambda: ColorAveragingModem(SecamModem(N)), 2),
    ("niir", "avg", lambda: ColorAveragingModem(NiirModem(N)), 2),
]


# STABLE ids (name-decoder): `ids=lambda v: str(v)` stringified the lambda
# factories with their memory addresses, so nodeids changed every run and
# tests/_full_tier.txt entries for this file could never match (round-3
# review finding — the tier skip was silently dead here)
@pytest.mark.parametrize(
    "name,decoder,make,skip", CASES,
    ids=[f"{c[0]}-{c[1]}" for c in CASES],
)
def test_line_protocol_matches_batch(name, decoder, make, skip, img):
    comp_b, rgb_b = _batch(name, decoder, img)
    modem = make()
    im = ImageModem(modem)
    comp_c = im.modulate_image(img)
    np.testing.assert_allclose(comp_c, comp_b, atol=2e-5)
    rgb_c = im.demodulate_image(comp_b)
    # interior lines: exact; first `skip` lines (and last, for comb3) differ
    # by the documented streaming-vs-reflection seam
    hi = L - 1 if decoder == "comb3" else L
    np.testing.assert_allclose(
        rgb_c[:, skip:hi], rgb_b[:, skip:hi], atol=2e-5
    )


def test_frame_argument_drives_phase(img):
    modem = NtscModem(N)
    line0_f0 = modem.modulate(0, 0, img[0, 0], img[1, 0], img[2, 0])
    line0_f1 = modem.modulate(1, 0, img[0, 0], img[1, 0], img[2, 0])
    # 525 lines * 227.5 c/l -> odd half-cycle: phase flips between frames
    assert not np.allclose(line0_f0, line0_f1, atol=1e-4)
    comp_b, _ = _batch("ntsc", "notch", img, frame=1)
    np.testing.assert_allclose(line0_f1, comp_b[0], atol=2e-5)


def test_reset_clears_streaming_state(img):
    modem = SecamModem(N)
    _ = modem.demodulate(0, 0, np.zeros(N, np.float32) + 0.5)
    # guard against vacuous pass: demodulate must actually have set state
    assert modem._prev_v is not None
    modem.reset()
    assert modem._prev_v is None
