"""Temporal (3D) comb decoder (decoders.py 'comb3d').

The chroma phase law inverts not only line-to-line but FRAME-to-frame
(NTSC: 227.5 cycles/line x 525 lines = half-integer cycles/frame; PAL needs
2 frames).  Combing along the batched frame axis therefore separates
chroma/luma perfectly wherever the scene is static — the classic high-end
"3D comb filter", expressible here only because frames are an array axis.

The frozen per-frame golden oracle cannot represent a cross-frame decoder,
so verification is first-principles: the phase-flip law (exact rational
arithmetic), the stencil definition, and the static-scene separation
advantage over the best spatial comb.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan

from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.standards import ALL_STANDARDS
from color_modem_tpu.standards.decoders import (
    allowed_decoders,
    temporal_comb_spacing,
)
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L = 48


def test_temporal_spacing_law():
    """Exact rational arithmetic: NTSC-family flips at 1 frame, PAL at 2."""
    assert temporal_comb_spacing(ALL_STANDARDS["ntsc"]()) == 1
    assert temporal_comb_spacing(ALL_STANDARDS["pal"]()) == 2
    assert temporal_comb_spacing(ALL_STANDARDS["pal_m"]()) == 2
    assert temporal_comb_spacing(ALL_STANDARDS["pal_n"]()) == 2


def test_registry_offers_comb3d_where_the_law_holds():
    assert "comb3d" in allowed_decoders(ALL_STANDARDS["ntsc"]())
    assert "comb3d" in allowed_decoders(ALL_STANDARDS["pal"]())
    assert "comb3d" not in allowed_decoders(ALL_STANDARDS["secam"]())
    assert "comb3d" not in allowed_decoders(ALL_STANDARDS["niir"]())


def test_stencil_matches_definition():
    """comb3d stencil == (2c_t - c_{t-p} - c_{t+p}) / 4 with reflected ends."""
    from color_modem_tpu.separate.comb import stencil_signal

    plan = get_plan("ntsc")
    c = np.random.default_rng(0).random((5, L, TEST_SAMPLES)).astype(np.float32)
    got = np.asarray(stencil_signal(plan, jnp.asarray(c), "comb3d"))
    prev = c[[1, 0, 1, 2, 3]]   # reflect at t=0
    nxt = c[[1, 2, 3, 4, 3]]    # reflect at t=4
    np.testing.assert_allclose(got, (2 * c - prev - nxt) / 4.0, atol=1e-6)


@pytest.mark.parametrize("name,frames", [("ntsc", 4), ("pal", 6)])
def test_static_scene_separates_near_perfectly(name, frames):
    """On identical frames the temporal comb beats the best spatial comb by
    a wide margin: the frame difference cancels ALL luma detail, not just
    vertically-smooth luma.  The fixture shuffles the scene's lines so it is
    vertically busy (exactly where line combs break down) but static."""
    plan = get_plan(name)
    one = smooth_scene(L, TEST_SAMPLES, seed=12).astype(np.float32)
    one = one[:, np.random.default_rng(1).permutation(L), :]
    rgb = jnp.asarray(np.broadcast_to(one, (frames, 3, L, TEST_SAMPLES)))
    spatial_dec = "comb3" if "comb3" in allowed_decoders(plan.cfg) else "notch"
    _, _, rt_sp = make_pipeline(plan, spatial_dec)
    _, _, rt_3d = make_pipeline(plan, "comb3d")
    p_sp = psnr(np.asarray(rt_sp(rgb, 0)), np.asarray(rgb))
    p_3d = psnr(np.asarray(rt_3d(rgb, 0)), np.asarray(rgb))
    # measured: 44.2 / 45.4 dB vs 23.0 for the spatial comb (+21 dB)
    assert p_3d > p_sp + 15.0, (p_sp, p_3d)
    assert p_3d > 43.0, p_3d


def test_panning_scene_still_roundtrips():
    """Temporally-correlated motion (a pan) degrades gracefully."""
    plan = get_plan("ntsc")
    one = smooth_scene(L, TEST_SAMPLES, seed=13).astype(np.float32)
    rgb = jnp.asarray(np.stack(
        [np.roll(one, 2 * t, axis=-1) for t in range(4)]
    ))
    _, _, rt = make_pipeline(plan, "comb3d")
    assert psnr(np.asarray(rt(rgb, 0)), np.asarray(rgb)) > 28.0


def test_chunked_video_comb3d_matches_whole_batch(tmp_path):
    """Chunk-boundary frames must decode with their TRUE temporal neighbors
    (the video runner fetches overlap frames from the random-access source),
    so a chunked run reproduces decoding the whole sequence in one batch."""
    from color_modem_tpu.frame.video import process_video, synthetic_source

    plan = get_plan("ntsc")
    n, chunk = 10, 4  # chunk boundaries at 4 and 8, partial final chunk
    src = synthetic_source(L, TEST_SAMPLES)
    process_video(plan, src, n, str(tmp_path), chunk=chunk,
                  decoder="comb3d", save_outputs=True)
    got = np.concatenate([
        np.load(tmp_path / f"rgb_{s:06d}.npy") for s in range(0, n, chunk)
    ])
    rgb = jnp.asarray(src(0, n))
    _, _, rt = make_pipeline(plan, "comb3d")
    want = np.asarray(rt(rgb, 0))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_motion_adaptive_comb3dA():
    """The motion-adaptive 3D comb must track the better regime per
    content: near-comb3d on static scenes, near-combA under motion, and
    beat BOTH on mixed content (half the frame static, half moving)."""
    plan = get_plan("ntsc")
    rng = np.random.default_rng(2)
    one = smooth_scene(L, TEST_SAMPLES, seed=12).astype(np.float32)
    one = one[:, rng.permutation(L), :]

    def run(dec, rgb):
        _, _, rt = make_pipeline(plan, dec)
        return psnr(np.asarray(rt(rgb, 0)), np.asarray(rgb))

    static = jnp.asarray(np.broadcast_to(one, (4, 3, L, TEST_SAMPLES)))
    s3d, sA, s3dA = (run(d, static) for d in ("comb3d", "combA", "comb3dA"))
    assert s3dA > s3d - 2.0, (s3d, s3dA)      # keeps the static win
    assert s3dA > sA + 5.0, (sA, s3dA)

    moving = jnp.asarray(np.stack(
        [np.roll(one, 11 * t, axis=-1) for t in range(4)]
    ))
    m3d, mA, m3dA = (run(d, moving) for d in ("comb3d", "combA", "comb3dA"))
    assert m3dA > m3d + 2.0, (m3d, m3dA)      # motion: temporal comb fails
    assert m3dA > mA - 2.0, (mA, m3dA)        # falls back to spatial

    half = np.broadcast_to(one, (4, 3, L, TEST_SAMPLES)).copy()
    for t in range(4):
        half[t, :, L // 2:] = np.roll(one[:, L // 2:], 11 * t, axis=-1)
    mixed = jnp.asarray(half)
    x3d, xA, x3dA = (run(d, mixed) for d in ("comb3d", "combA", "comb3dA"))
    assert x3dA > x3d + 1.0 and x3dA > xA + 1.0, (x3d, xA, x3dA)


def test_sharded_comb3dA_equals_unsharded():
    """comb3dA's halos ride BOTH rings (frame + line); sharded must match
    unsharded to float32 tolerance."""
    from color_modem_tpu.parallel import make_mesh, make_sharded_pipeline

    plan = get_plan("ntsc")
    rgb = jnp.asarray(np.stack(
        [smooth_scene(L, TEST_SAMPLES, seed=30 + t) for t in range(8)]
    ).astype(np.float32))
    enc_u, dec_u, _ = make_pipeline(plan, "comb3dA")
    comp = np.asarray(enc_u(rgb, 1))
    rgb_u = np.asarray(dec_u(jnp.asarray(comp), 1))
    for mesh in (make_mesh(2, 4), make_mesh(4, 2)):
        _, dec_s, _ = make_sharded_pipeline(plan, mesh, "comb3dA")
        rgb_s = np.asarray(dec_s(jnp.asarray(comp), 1))
        np.testing.assert_allclose(
            rgb_s, rgb_u, atol=2e-6, err_msg=str(mesh.shape)
        )


@pytest.mark.parametrize("name", ["ntsc", "pal"])
def test_sharded_comb3d_equals_unsharded(name):
    """The temporal comb's halo rides the FRAME (data-parallel) ring: the
    sharded decode must be bit-identical to the unsharded one, including
    the odd-multiple-of-p substitution at the global first/last frames."""
    from color_modem_tpu.parallel import make_mesh, make_sharded_pipeline

    plan = get_plan(name)
    rgb = jnp.asarray(np.stack(
        [smooth_scene(L, TEST_SAMPLES, seed=20 + t) for t in range(8)]
    ).astype(np.float32))
    enc_u, dec_u, _ = make_pipeline(plan, "comb3d")
    comp = np.asarray(enc_u(rgb, 3))
    rgb_u = np.asarray(dec_u(jnp.asarray(comp), 3))
    for mesh in (make_mesh(2, 4), make_mesh(4, 2) if name == "ntsc" else
                 make_mesh(2, 2)):
        _, dec_s, _ = make_sharded_pipeline(plan, mesh, "comb3d")
        rgb_s = np.asarray(dec_s(jnp.asarray(comp), 3))
        np.testing.assert_array_equal(rgb_s, rgb_u, err_msg=str(mesh.shape))
