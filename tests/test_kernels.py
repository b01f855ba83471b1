"""Pallas kernels vs their pure-jnp twins (SURVEY.md §4.3 'Pallas parity').

On the CPU test backend the kernels run in interpreter mode — the Mosaic
"sanitizer" for indexing/memory errors (§5.2); numerical parity with the
modem/ twins is checked tightly (same math, same matrices; only fp
reassociation differs).  The same tests run compiled on TPU via -m tpu.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.pipeline import (
    decode_block,
    encode_block,
    frame_line_index,
    make_pipeline,
)
from color_modem_tpu.utils.testimages import smooth_scene

L, N = 32, TEST_SAMPLES

CASES = [
    ("ntsc", "notch"),
    ("ntsc", "comb3"),
    ("pal", "delayline"),
    ("niir", "notch"),
    ("secam", "notch"),
]


@pytest.fixture(scope="module")
def img():
    return smooth_scene(L, N, seed=7).astype(np.float32)[None]


@pytest.mark.parametrize(
    "name", sorted({n for n, _ in CASES}), ids=str
)
def test_pallas_encode_matches_twin(name, img):
    plan = get_plan(name)
    g = frame_line_index(plan, 0, 1, L)
    ref = np.asarray(encode_block(plan, jnp.asarray(img), g, "xla"))
    got = np.asarray(encode_block(plan, jnp.asarray(img), g, "pallas"))
    # identical matrices; only fp reassociation differs (SECAM cumsum is a
    # triangular matmul in the kernel -> slightly larger tolerance)
    atol = 2e-4 if name == "secam" else 2e-5
    np.testing.assert_allclose(got, ref, atol=atol)


@pytest.mark.parametrize("name,decoder", CASES, ids=str)
def test_pallas_decode_matches_twin(name, decoder, img):
    plan = get_plan(name)
    g = frame_line_index(plan, 0, 1, L)
    comp = encode_block(plan, jnp.asarray(img), g, "xla")
    ref = np.asarray(decode_block(plan, comp, g, decoder, "xla"))
    got = np.asarray(decode_block(plan, comp, g, decoder, "pallas"))
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_pipeline_backend_roundtrip(img):
    plan = get_plan("pal")
    _, _, rt_x = make_pipeline(plan, "delayline", "xla")
    _, _, rt_p = make_pipeline(plan, "delayline", "pallas")
    np.testing.assert_allclose(
        np.asarray(rt_p(img)), np.asarray(rt_x(img)), atol=5e-4
    )


@pytest.mark.parametrize("name,decoder", [("ntsc", "comb3"), ("secam", "notch")])
def test_odd_line_counts_are_padded(name, decoder, img):
    """BL not a multiple of 8 must be handled by the pad/crop path — on
    BOTH sides: the decode crop is a separate code path from encode's."""
    plan = get_plan(name)
    odd = jnp.asarray(img[:, :, :27, :])
    g = frame_line_index(plan, 0, 1, 27)
    ref = np.asarray(encode_block(plan, odd, g, "xla"))
    got = np.asarray(encode_block(plan, odd, g, "pallas"))
    atol = 2e-4 if name == "secam" else 2e-5
    np.testing.assert_allclose(got, ref, atol=atol)
    comp = jnp.asarray(ref)
    ref_d = np.asarray(decode_block(plan, comp, g, decoder, "xla"))
    got_d = np.asarray(decode_block(plan, comp, g, decoder, "pallas"))
    np.testing.assert_allclose(got_d, ref_d, atol=5e-4)
