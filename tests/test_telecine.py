"""3:2 pulldown + inverse telecine (frame/telecine.py — beyond-reference)."""

import numpy as np
import pytest

from conftest import TEST_SAMPLES, get_plan
from color_modem_tpu.frame.telecine import (
    detect_pulldown_phase,
    inverse_telecine,
    telecine,
)
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.testimages import smooth_scene

L = 32


def _film(frames=8, lines=L, n=TEST_SAMPLES):
    """Distinct MOVING film frames (rolled scene per index)."""
    one = smooth_scene(lines, n, seed=2)
    return np.stack(
        [np.roll(one, 13 * i, axis=-1) for i in range(frames)]
    ).astype(np.float32)


def test_telecine_cadence_structure():
    film = _film(4)
    fields = np.asarray(telecine(film))
    assert fields.shape == (10, 3, L // 2, TEST_SAMPLES)
    # positions 4 and 9 repeat 2 and 7 exactly (same frame, same parity)
    np.testing.assert_array_equal(fields[4], fields[2])
    np.testing.assert_array_equal(fields[9], fields[7])
    # parity alternates: even positions carry even film rows
    np.testing.assert_array_equal(fields[0], film[0, :, 0::2])
    np.testing.assert_array_equal(fields[1], film[0, :, 1::2])
    np.testing.assert_array_equal(fields[5], film[2, :, 1::2])


@pytest.mark.parametrize("phase", [0, 2, 4, 6, 8])
def test_inverse_telecine_exact_at_every_phase(phase):
    """Clean telecined film recovers EXACTLY (the film-mode advantage
    over any motion-adaptive deinterlacer), at every even cadence start.
    A stream starting at pattern position p is the full stream with the
    first p fields cut."""
    film = _film(12)
    fields = np.asarray(telecine(film))[phase:]
    det, conf = detect_pulldown_phase(fields)
    assert det == phase
    assert conf > 50.0, f"confidence {conf:.1f} too low for clean film"
    out = np.asarray(inverse_telecine(fields, det))
    # trimming drops the partial leading group: recovery resumes at the
    # next full cadence cycle = film frame 4 (or 0 for an aligned stream)
    skip_frames = 0 if phase == 0 else 4
    want = film[skip_frames : skip_frames + out.shape[0]]
    np.testing.assert_array_equal(out, want)


def test_inverse_telecine_detects_under_noise():
    film = _film(12)
    fields = np.asarray(telecine(film))
    rng = np.random.default_rng(0)
    noisy = fields + rng.normal(0, 0.02, fields.shape).astype(np.float32)
    det, conf = detect_pulldown_phase(noisy)
    assert det == 0
    assert conf > 3.0
    out = np.asarray(inverse_telecine(noisy, det))
    assert psnr(out, film[: out.shape[0]]) > 33.0


def test_plain_video_has_no_cadence():
    """Field-rate video (every field a new instant) gives ~uniform residue
    scores: confidence stays near 1, the mono/film decision input."""
    video = np.stack(
        [
            np.roll(smooth_scene(L // 2, TEST_SAMPLES, seed=7), 17 * i, -1)
            for i in range(30)
        ]
    ).astype(np.float32)
    _, conf = detect_pulldown_phase(video)
    assert conf < 2.0, f"spurious cadence confidence {conf:.2f}"


def test_film_through_interlaced_broadcast():
    """The full film chain: telecine -> NTSC interlaced composite
    transmission (field-sequential encode/decode) -> inverse telecine.
    The cadence survives the modem; film frames reconstruct at the
    decoder's round-trip quality with NO deinterlacing artifacts."""
    import jax

    from color_modem_tpu.frame.interlace import (
        field_line_index,
        weave_fields,
    )
    from color_modem_tpu.frame.pipeline import decode_block, encode_block

    plan = get_plan("ntsc")
    film = _film(8, lines=L)
    fields = telecine(film)  # (20, 3, L/2, N)
    # transmit the field sequence with the interlaced line numbering:
    # weave consecutive field pairs into frame-shaped blocks for the
    # pipeline (10 frames of 2 fields each)
    frames = weave_fields(fields)
    b = frames.shape[0]
    g = field_line_index(plan, 0, b, L // 2)

    from color_modem_tpu.frame.interlace import split_fields

    @jax.jit
    def rt(fr):
        comp = encode_block(plan, split_fields(fr), g)
        return decode_block(plan, comp, g, "comb3")

    rx_fields = np.asarray(rt(frames))  # (2b, 3, L/2, N) field-sequential
    det, conf = detect_pulldown_phase(rx_fields)
    assert det == 0 and conf > 5.0
    out = np.asarray(inverse_telecine(rx_fields, det))
    q = psnr(out, film[: out.shape[0]])
    assert q > 33.0, f"film through broadcast: {q:.1f} dB"