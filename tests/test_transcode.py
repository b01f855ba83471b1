"""Standards conversion (frame/transcode.py): NTSC<->PAL<->SECAM.

Quality oracle: the converted-and-decoded picture against the vertically
resampled original — the conversion chain's only unavoidable losses are the
two modem round trips plus the resample.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.frame.transcode import (
    best_decoder,
    make_transcoder,
    resample_lines,
)
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

N = TEST_SAMPLES


def _src_lines(name):
    # proportional test geometry: full standards use 480/576; scale to the
    # fixture size while keeping the 5:6 ratio exact
    return 40 if get_plan(name).cfg.active_lines == 480 else 48


@pytest.mark.parametrize("src,dst", [
    ("ntsc", "pal"), ("pal", "ntsc"), ("ntsc", "secam"), ("secam", "pal"),
])
def test_conversion_quality(src, dst):
    plan_s, plan_d = get_plan(src), get_plan(dst)
    l_src = _src_lines(src)
    img = smooth_scene(l_src, N, seed=17).astype(np.float32)[None]
    enc_s, _, _ = make_pipeline(plan_s, "notch")
    comp_s = enc_s(jnp.asarray(img), 0)
    conv = make_transcoder(plan_s, plan_d)
    comp_d = conv(comp_s, 0)
    l_dst = round(l_src * plan_d.cfg.active_lines / plan_s.cfg.active_lines)
    assert comp_d.shape == (1, l_dst, N), comp_d.shape
    _, dec_d, _ = make_pipeline(plan_d, best_decoder(plan_d))
    out = np.asarray(dec_d(comp_d, 0))
    ref = np.asarray(resample_lines(jnp.asarray(img), l_dst))
    p = psnr(out, ref)
    assert p > 26.0, (src, dst, p)


def test_identity_geometry_transcode_is_a_double_roundtrip():
    """pal -> pal: same geometry, so the converter must land within ~2 dB
    of two chained round trips' quality."""
    plan = get_plan("pal")
    img = smooth_scene(48, N, seed=18).astype(np.float32)[None]
    enc, dec, rt = make_pipeline(plan, best_decoder(plan))
    comp = enc(jnp.asarray(img), 0)
    conv = make_transcoder(plan, plan)
    out = np.asarray(dec(conv(comp, 0), 0))
    twice = np.asarray(rt(jnp.asarray(np.asarray(rt(jnp.asarray(img), 0))),
                          0))
    assert abs(psnr(out, img) - psnr(twice, img)) < 2.0


def test_resample_lines_shape_and_dc():
    x = jnp.ones((2, 3, 40, N))
    y = resample_lines(x, 48)
    assert y.shape == (2, 3, 48, N)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-5)


def test_interlaced_conversion():
    """Field-sequential NTSC -> PAL: decode fields, convert the woven
    raster, re-split with PAL field numbering."""
    from color_modem_tpu.frame.interlace import make_interlaced_pipeline
    from color_modem_tpu.frame.transcode import make_interlaced_transcoder

    plan_s, plan_d = get_plan("ntsc"), get_plan("pal")
    img = smooth_scene(40, N, seed=19).astype(np.float32)[None]
    enc_s, _, _ = make_interlaced_pipeline(plan_s, "comb3")
    fields_s = enc_s(jnp.asarray(img), 0)
    conv = make_interlaced_transcoder(plan_s, plan_d)
    fields_d = conv(fields_s, 0)
    assert fields_d.shape == (2, 24, N), fields_d.shape
    _, dec_d, _ = make_interlaced_pipeline(plan_d, best_decoder(plan_d))
    out = np.asarray(dec_d(fields_d, 0))
    ref = np.asarray(resample_lines(jnp.asarray(img), 48))
    p = psnr(out, ref)
    assert p > 26.0, p


def test_best_decoder_choices():
    assert best_decoder(get_plan("ntsc")) == "comb3"
    assert best_decoder(get_plan("pal")) == "comb3"
    assert best_decoder(get_plan("secam")) == "notch"
    assert best_decoder(get_plan("niir")) == "notch"
