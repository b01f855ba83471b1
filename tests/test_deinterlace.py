"""Field-rate interlacing + motion-adaptive deinterlacing.

Oracle: the synthetic source can render the FULL frame at every field
instant, so each reconstruction is scored against the truth at its own
time — static content must prefer weave (exact), moving content must
prefer bob (no combing), and the adaptive blend must match or beat both
everywhere, end-to-end through the NTSC modem.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.deinterlace import (
    bob,
    deinterlace,
    fields_from_framerate,
    weave,
)
from color_modem_tpu.frame.interlace import (
    make_interlaced_pipeline,
    split_fields,
)
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L, N = 48, TEST_SAMPLES


def _scene_at(t, motion):
    one = smooth_scene(L, N, seed=44).astype(np.float32)
    return np.roll(one, motion * t, axis=-1)


def _field_rate_frames(n_instants, motion):
    return jnp.asarray(np.stack(
        [_scene_at(t, motion) for t in range(n_instants)]
    ))


def test_fields_from_framerate_geometry():
    rgb2x = _field_rate_frames(4, motion=5)
    fields = fields_from_framerate(rgb2x)
    assert fields.shape == (4, 3, L // 2, N)
    np.testing.assert_array_equal(
        np.asarray(fields[0]), np.asarray(rgb2x[0, :, 0::2]))
    np.testing.assert_array_equal(
        np.asarray(fields[1]), np.asarray(rgb2x[1, :, 1::2]))
    # static degenerate case: identical to the still-image split
    static = jnp.broadcast_to(rgb2x[0], rgb2x.shape)
    np.testing.assert_array_equal(
        np.asarray(fields_from_framerate(static)),
        np.asarray(split_fields(static[0::2])))


def _score(recon_frames, motion, parity_time=1):
    """Mean PSNR of each reconstructed frame vs the truth at its instant."""
    ps = []
    for t in range(recon_frames.shape[0]):
        truth = _scene_at(t * parity_time, motion)
        ps.append(psnr(np.asarray(recon_frames[t]), truth))
    return float(np.mean(ps))


def test_static_weave_is_exact_and_motion_combs():
    static = fields_from_framerate(_field_rate_frames(4, motion=0))
    np.testing.assert_allclose(
        np.asarray(weave(static)[0]), _scene_at(0, 0), atol=1e-6)

    moving = fields_from_framerate(_field_rate_frames(4, motion=9))
    # weave mixes two instants: score each woven frame against BOTH of its
    # source instants and take the better — still clearly degraded
    w = weave(moving)
    p_weave = max(_score(w, 9, parity_time=2),
                  float(np.mean([psnr(np.asarray(w[t]),
                                      _scene_at(2 * t + 1, 9))
                                 for t in range(w.shape[0])])))
    b = bob(moving)
    p_bob = _score(b, 9)
    assert p_bob > p_weave + 3.0, (p_weave, p_bob)


def test_adaptive_tracks_the_better_regime():
    for motion, margin in ((0, 1.0), (9, 1.0)):
        fields = fields_from_framerate(_field_rate_frames(6, motion=motion))
        adap = deinterlace(fields, sigma=0.005)
        p_a = _score(adap, motion)
        p_b = _score(bob(fields), motion)
        assert p_a > p_b - margin, (motion, p_b, p_a)
        if motion == 0:
            # static: must recover the weave advantage over bob
            assert p_a > p_b + 6.0, (p_b, p_a)


def test_end_to_end_through_the_modem():
    """Field-rate scene -> NTSC interlaced encode -> decode -> adaptive
    deinterlace, scored against the truth at each field instant."""
    plan = get_plan("ntsc")
    motion = 7
    rgb2x = _field_rate_frames(8, motion=motion)
    fields_rgb = fields_from_framerate(rgb2x)
    # encode the field sequence with the interlaced line numbering: the
    # pipeline's encode splits FRAMES, so weave the rgb fields back into
    # frame-shaped batches first (each 'frame' = one field pair)
    from color_modem_tpu.frame.interlace import weave_fields

    frames_for_enc = weave_fields(fields_rgb)
    enc, dec, _ = make_interlaced_pipeline(plan, "combA")
    decoded = dec(enc(frames_for_enc, 0), 0)       # (B, 3, L, N) woven
    dec_fields = split_fields(decoded)             # back to fields
    adap = deinterlace(dec_fields, sigma=0.01)
    p_weave = float(np.mean([
        psnr(np.asarray(decoded[t]), _scene_at(2 * t, motion))
        for t in range(decoded.shape[0])
    ]))
    p_adap = _score(adap, motion)
    assert p_adap > p_weave + 2.0, (p_weave, p_adap)
    assert p_adap > 27.0, p_adap


def test_validation():
    with pytest.raises(ValueError, match="even"):
        fields_from_framerate(jnp.zeros((3, 3, L, N)))
    with pytest.raises(ValueError, match="even"):
        deinterlace(jnp.zeros((3, 3, L // 2, N)))
