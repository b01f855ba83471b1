"""VBI data lines (frame/vbi.py): caption/teletext-style NRZ roundtrips.

Exactness on a clean line, clock recovery under fractional timing error,
amplitude-independent slicing under gain error, noise robustness, and the
full-system test: a data line embedded in a composite frame survives the
channel while the picture decodes around it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.frame.timebase import fractional_shift
from color_modem_tpu.frame.vbi import (
    cc_spec,
    decode_data_line,
    encode_data_line,
    teletext_spec,
)
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene


def _bits(n, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 2, size=n), jnp.int32
    )


@pytest.mark.parametrize("mk", [cc_spec, teletext_spec], ids=["cc", "wst"])
def test_clean_roundtrip_is_exact(mk):
    plan = get_plan("ntsc")
    spec = mk(plan)
    bits = _bits(spec.n_bits, seed=1)
    wave = encode_data_line(plan, spec, bits)
    got, margin = decode_data_line(plan, spec, wave)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))
    assert float(margin) > 0.3, float(margin)


def test_batched_lines_decode_in_parallel():
    plan = get_plan("pal")
    spec = cc_spec(plan)
    bits = jnp.stack([_bits(spec.n_bits, seed=s) for s in range(5)])
    wave = encode_data_line(plan, spec, bits)
    assert wave.shape == (5, TEST_SAMPLES)
    got, _ = decode_data_line(plan, spec, wave)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))


def test_clock_recovery_under_timing_error():
    """A fractional-sample line delay (time-base error) must be absorbed
    by the run-in correlation, not flip bits."""
    plan = get_plan("ntsc")
    spec = cc_spec(plan)
    bits = _bits(spec.n_bits, seed=2)
    wave = encode_data_line(plan, spec, bits)[None]
    for d in (-3.3, -0.7, 1.4, 4.8):
        shifted = fractional_shift(wave, jnp.asarray([d]))
        got, margin = decode_data_line(plan, spec, shifted[0])
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(bits), err_msg=f"delay {d}"
        )
        assert float(margin) > 0.25, (d, float(margin))


def test_slicing_is_gain_invariant():
    plan = get_plan("ntsc")
    spec = cc_spec(plan)
    bits = _bits(spec.n_bits, seed=3)
    wave = encode_data_line(plan, spec, bits)
    got, margin = decode_data_line(plan, spec, 0.55 * wave)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))
    assert float(margin) > 0.3  # margin is normalized by recovered level


def test_noise_robustness():
    plan = get_plan("ntsc")
    spec = cc_spec(plan)
    bits = _bits(spec.n_bits, seed=4)
    wave = encode_data_line(plan, spec, bits)[None, None]
    noisy = impair(plan, wave, noise_sigma=0.05, key=jax.random.PRNGKey(0))
    got, _ = decode_data_line(plan, spec, noisy[0, 0])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))


def test_data_line_embedded_in_composite():
    """Row 0 carries captions; the picture decodes around it and the bits
    survive the composite channel (luma band, ghost + equalizer)."""
    from color_modem_tpu.frame.equalize import (
        apply_equalizer,
        design_equalizer,
        gcr_record,
    )

    plan = get_plan("ntsc")
    spec = cc_spec(plan)
    bits = _bits(spec.n_bits, seed=5)
    img = smooth_scene(32, TEST_SAMPLES, seed=41).astype(np.float32)[None]
    enc, dec, _ = make_pipeline(plan, "comb3")
    comp = enc(jnp.asarray(img), 0)
    comp = comp.at[0, 0].set(encode_data_line(plan, spec, bits))
    ghost = {"ghost_delay_us": 1.0, "ghost_gain": 0.25}
    bad = impair(plan, comp, **ghost)
    rec = impair(plan, jnp.asarray(gcr_record(plan))[None], **ghost)[0]
    fixed = apply_equalizer(bad, design_equalizer(plan, rec))
    got, margin = decode_data_line(plan, spec, fixed[0, 0])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(bits))
    assert float(margin) > 0.15, float(margin)
    out = np.asarray(dec(fixed, 0))
    assert psnr(out[0, :, 1:], img[0, :, 1:]) > 30.0  # picture survives too


def test_cc_byte_framing_roundtrip():
    """EIA-608 framing: 7-bit ASCII + odd parity, LSB first, end to end
    through the waveform."""
    from color_modem_tpu.frame.vbi import cc_pack, cc_unpack

    plan = get_plan("ntsc")
    spec = cc_spec(plan)
    bits = cc_pack("Hi")
    wave = encode_data_line(plan, spec, bits)
    got, _ = decode_data_line(plan, spec, wave)
    text, ok = cc_unpack(got)
    assert (text, ok) == ("Hi", True)
    # a flipped bit must trip the parity flag
    corrupted = got.at[3].set(1 - got[3])
    _, ok2 = cc_unpack(corrupted)
    assert not ok2
    with pytest.raises(ValueError, match="2 chars"):
        cc_pack("abc")
    with pytest.raises(ValueError, match="7-bit"):
        cc_pack("é!")


def test_cli_caption_rides_the_channel():
    """roundtrip --caption: the EIA-608 cells ride the impaired channel
    and come back exact (the JSON carries the receiver's parity check)."""
    import contextlib
    import io
    import json

    from color_modem_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["roundtrip", "--standard", "ntsc", "--decoder", "notch",
                   "--demo", "--lines", "64", "--caption", "HI MOM",
                   "--noise", "0.02"])
    assert rc == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["caption"]["exact"] is True
    assert rep["caption"]["parity_ok"] is True
    assert rep["caption"]["received"] == "HI MOM"


def test_too_many_bits_rejected():
    plan = get_plan("ntsc")
    spec = cc_spec(plan, n_bits=400)
    with pytest.raises(ValueError, match="samples"):
        encode_data_line(plan, spec, _bits(400))
