"""Interlaced-field pipeline (frame/interlace.py).

The layer is a pure re-indexing on top of the golden-tested block functions,
so the tests pin (a) the split/weave permutation exactly, (b) the absolute
line numbering that drives every phase-law effect, and (c) that interlaced
round trips land near their progressive counterparts on smooth content.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_LINES, TEST_SAMPLES, get_plan
from color_modem_tpu.frame.interlace import (
    field_line_index,
    field_offset,
    make_interlaced_pipeline,
    split_fields,
    weave_fields,
)
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L, N = TEST_LINES, TEST_SAMPLES


@pytest.fixture(scope="module")
def img():
    return smooth_scene(L, N, seed=5).astype(np.float32)[None]


def test_split_weave_roundtrip(img):
    rgb = jnp.asarray(np.concatenate([img, img[:, ::-1]], axis=0))
    fields = split_fields(rgb)
    assert fields.shape == (4, 3, L // 2, N)
    np.testing.assert_array_equal(np.asarray(weave_fields(fields)),
                                  np.asarray(rgb))
    # top field first: field block 0 carries the even rows of frame 0
    np.testing.assert_array_equal(np.asarray(fields[0]),
                                  np.asarray(rgb[0, :, 0::2]))
    np.testing.assert_array_equal(np.asarray(fields[1]),
                                  np.asarray(rgb[0, :, 1::2]))


def test_split_rejects_odd_line_count():
    with pytest.raises(ValueError, match="even line count"):
        split_fields(jnp.zeros((1, 3, 5, N)))


def test_field_line_index_values():
    plan = get_plan("ntsc")  # total_lines = 525 -> field offset 263
    assert field_offset(plan) == 263
    g = np.asarray(field_line_index(plan, 2, 2, 4))
    assert g.shape == (4, 4)
    np.testing.assert_array_equal(g[0], 2 * 525 + np.arange(4))      # f2 top
    np.testing.assert_array_equal(g[1], 2 * 525 + 263 + np.arange(4))
    np.testing.assert_array_equal(g[2], 3 * 525 + np.arange(4))      # f3 top
    np.testing.assert_array_equal(g[3], 3 * 525 + 263 + np.arange(4))
    assert field_offset(get_plan("pal")) == 313


def test_ntsc_fields_are_in_carrier_antiphase():
    """Any odd field offset + half-integer cycles/line -> the second field's
    subcarrier starts in antiphase: the physical 4-field sequence."""
    plan = get_plan("ntsc")
    num, den = plan.cfg.cpl_num, plan.cfg.cpl_den
    off = field_offset(plan)
    # exact rational arithmetic: phase advance between field starts, cycles
    frac = (off * num) % den / den
    assert frac == 0.5, frac


@pytest.mark.parametrize("name,decoder", [
    ("ntsc", "comb3"), ("pal", "delayline"), ("secam", "notch"),
])
def test_interlaced_roundtrip_matches_progressive(name, decoder, img):
    plan = get_plan(name)
    _, _, rt_prog = make_pipeline(plan, decoder)
    enc_i, dec_i, rt_int = make_interlaced_pipeline(plan, decoder)
    rgb = jnp.asarray(img)
    p_prog = psnr(np.asarray(rt_prog(rgb, 0)), img)
    p_int = psnr(np.asarray(rt_int(rgb, 0)), img)
    assert p_int > 28.0, (name, decoder, p_int)
    assert abs(p_prog - p_int) < 4.0, (name, decoder, p_prog, p_int)
    # encode/decode compose to the same result as roundtrip
    comp = enc_i(rgb, 0)
    assert comp.shape == (2, L // 2, N)
    np.testing.assert_allclose(
        np.asarray(dec_i(comp, 0)), np.asarray(rt_int(rgb, 0)), atol=1e-6
    )


def test_interlaced_comb3d_combs_same_parity_fields(img):
    """Temporal comb on interlaced video: same-parity fields one frame
    apart are in carrier antiphase, so on static content the parity-major
    comb3d beats the spatial comb3 — the same +dB relationship as
    progressive (tests/test_comb3d.py)."""
    plan = get_plan("ntsc")
    rgb = jnp.asarray(np.broadcast_to(img[0], (4,) + img.shape[1:]))
    _, _, rt_s = make_interlaced_pipeline(plan, "comb3")
    _, _, rt_t = make_interlaced_pipeline(plan, "comb3d")
    p_s = psnr(np.asarray(rt_s(rgb, 0)), np.asarray(rgb))
    p_t = psnr(np.asarray(rt_t(rgb, 0)), np.asarray(rgb))
    assert p_t > p_s + 3.0, (p_s, p_t)
    assert p_t > 40.0, p_t


def test_interlaced_raster_strip_is_exact(img):
    """Sync+burst per field line: encode(raster) -> decode recovers the
    same RGB as the rasterless pipeline (strip(add(x)) == x)."""
    plan = get_plan("ntsc")
    rgb = jnp.asarray(img)
    enc_r, dec_r, _ = make_interlaced_pipeline(plan, "comb3", raster=True)
    _, _, rt = make_interlaced_pipeline(plan, "comb3")
    comp_r = enc_r(rgb, 0)
    assert comp_r.shape[-1] > N  # blanking extends the line
    np.testing.assert_allclose(
        np.asarray(dec_r(comp_r, 0)), np.asarray(rt(rgb, 0)), atol=1e-6
    )


def test_field_blocks_are_contiguous_line_runs(img):
    """Decoding the two field blocks SEPARATELY (as two halves of the batch)
    must equal decoding them together: no hidden cross-field state."""
    plan = get_plan("ntsc")
    enc_i, dec_i, _ = make_interlaced_pipeline(plan, "comb3")
    comp = enc_i(jnp.asarray(img), 0)
    whole = np.asarray(dec_i(comp, 0))
    # decode each field alone through the block path with its own g map
    from color_modem_tpu.frame.interlace import field_line_index as fli
    from color_modem_tpu.frame.pipeline import decode_block

    g = fli(plan, 0, 1, L // 2)
    parts = [
        np.asarray(decode_block(plan, comp[k:k + 1], g[k:k + 1], "comb3"))
        for k in range(2)
    ]
    woven = np.asarray(weave_fields(jnp.concatenate(parts, axis=0)))
    np.testing.assert_allclose(whole, woven, atol=1e-6)
