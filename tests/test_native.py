"""Native C++ frame codec vs the NumPy fallback — identical behavior."""

import numpy as np
import pytest

from color_modem_tpu import native


@pytest.fixture(scope="module")
def rgb8():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(2, 17, 33, 3), dtype=np.uint8)


def test_native_library_builds():
    # g++ is baked into this image; the codec must actually compile
    assert native.available()


def test_u8_to_f32_matches_numpy(rgb8):
    got = native.rgb8_to_chw_f32(rgb8)
    want = rgb8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
    assert got.shape == (2, 3, 17, 33) and got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_f32_to_u8_roundtrip(rgb8):
    f = native.rgb8_to_chw_f32(rgb8)
    back = native.chw_f32_to_rgb8(f)
    np.testing.assert_array_equal(back, rgb8)


def test_f32_to_u8_clamps():
    x = np.array([[[[-0.5, 0.0, 0.5, 1.0, 2.0]]] * 3], dtype=np.float32)
    out = native.chw_f32_to_rgb8(x)
    np.testing.assert_array_equal(out[0, 0, :, 0], [0, 0, 128, 255, 255])


def test_ppm_roundtrip(tmp_path, rgb8):
    p = str(tmp_path / "x.ppm")
    native.write_ppm(p, rgb8[0])
    back = native.read_ppm(p)
    np.testing.assert_array_equal(back, rgb8[0])


def test_ppm_read_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.ppm")
    with open(p, "wb") as f:
        f.write(b"JUNKJUNKJUNK")
    with pytest.raises((OSError, ValueError)):
        native.read_ppm(p)


def test_numpy_fallback_paths(rgb8, monkeypatch):
    """Force the fallback and check it matches the native path."""
    ref_f = native.rgb8_to_chw_f32(rgb8)
    ref_u = native.chw_f32_to_rgb8(ref_f)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_TRIED", True)
    np.testing.assert_array_equal(native.rgb8_to_chw_f32(rgb8), ref_f)
    np.testing.assert_array_equal(native.chw_f32_to_rgb8(ref_f), ref_u)


def test_out_parameter_reuse(rgb8):
    out = np.empty((2, 3, 17, 33), np.float32)
    r = native.rgb8_to_chw_f32(rgb8, out)
    assert r is out
    np.testing.assert_array_equal(out, native.rgb8_to_chw_f32(rgb8))
    back = np.empty((2, 17, 33, 3), np.uint8)
    r2 = native.chw_f32_to_rgb8(out, back)
    assert r2 is back
    np.testing.assert_array_equal(back, rgb8)


def _y4m_chunk(count=3, h=12, w=16, sv=2, sh=2, seed=1):
    """Synthesize raw planar frames with FRAME markers, like a .y4m body."""
    rng = np.random.default_rng(seed)
    ch, cw = h // sv, w // sh
    marker = len(b"FRAME\n")
    stride = marker + h * w + 2 * ch * cw
    raw = bytearray()
    for _ in range(count):
        raw += b"FRAME\n"
        raw += rng.integers(0, 256, h * w, dtype=np.uint8).tobytes()
        raw += rng.integers(0, 256, 2 * ch * cw, dtype=np.uint8).tobytes()
    return bytes(raw), count, stride, marker, h, w, ch, cw, sv, sh


@pytest.mark.parametrize("sv,sh", [(2, 2), (1, 2), (1, 1)])
def test_y4m_decode_native_matches_fallback(monkeypatch, sv, sh):
    args = _y4m_chunk(sv=sv, sh=sh)
    got = native.y4m_to_rgb(*args)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LIB_TRIED", True)
    want = native.y4m_to_rgb(*args)
    # C++ computes in double for exactly this reason (y4m_body comment)
    np.testing.assert_array_equal(got, want)


def test_y4m_decode_range_and_shape():
    args = _y4m_chunk(count=2, h=8, w=10)
    out = native.y4m_to_rgb(*args)
    assert out.shape == (2, 3, 8, 10) and out.dtype == np.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_prefetch_source_equivalence():
    """The double-buffered loader returns exactly what the source would,
    sequential or not, and keeps working past a seek."""
    from color_modem_tpu.frame.y4m import prefetch_source

    calls = []

    def source(start, count):
        calls.append((start, count))
        return np.arange(start, start + count, dtype=np.float32)

    wrapped = prefetch_source(source, n_frames=10)
    np.testing.assert_array_equal(wrapped(0, 4), [0, 1, 2, 3])
    np.testing.assert_array_equal(wrapped(4, 4), [4, 5, 6, 7])   # prefetched
    np.testing.assert_array_equal(wrapped(8, 2), [8, 9])          # tail
    np.testing.assert_array_equal(wrapped(2, 3), [2, 3, 4])       # random seek
    assert (0, 4) in calls and (4, 4) in calls
