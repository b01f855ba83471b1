"""Native (C++) host-side frame codec with transparent NumPy fallback.

The reference is 100% Python [SURVEY.md §2.3]; this framework's host runtime
keeps the video feeder path native: uint8 HWC <-> float32 CHW conversion and
PPM (de)serialization live in ``frameio.cpp``, compiled on first use with
the system ``g++`` into a cached shared object and bound via ctypes (no
pybind11 in this image).  When no compiler is available the same API falls
back to vectorized NumPy — behavior is identical (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "frameio.cpp")
_LIB = None
_LIB_TRIED = False


def _build_dir() -> str:
    d = os.environ.get(
        "CMT_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "color_modem_tpu_native"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    """Compile (once, content-hashed cache) and dlopen the codec."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f"frameio_{tag}.so")
        if not os.path.exists(so):
            tmp = so + f".build{os.getpid()}"
            subprocess.run(
                # -ffp-contract=off: no FMA fusion — the Y4M decoder's
                # bit-for-bit parity with the NumPy fallback depends on
                # separate multiply-then-add rounding
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-shared", "-fPIC",
                 "-std=c++17", "-pthread", _SRC, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so)  # atomic: concurrent builders race safely
        lib = ctypes.CDLL(so)
        lib.cmt_version.restype = ctypes.c_int
        if lib.cmt_version() != 2:
            return None
        _LIB = lib
    except (OSError, subprocess.CalledProcessError):
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    # container cgroup limits make os.cpu_count() report 1 here while 8
    # worker threads measure 80x faster; trust the env override, else 8
    return int(os.environ.get("CMT_NATIVE_THREADS", "8"))


def rgb8_to_chw_f32(rgb8: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """(F, L, N, 3) uint8 -> (F, 3, L, N) float32 in [0, 1].

    Pass a preallocated ``out`` in steady-state loops: sandboxed kernels
    make first-touch page faults on fresh large allocations dominate the
    conversion by orders of magnitude (measured 370x here).
    """
    rgb8 = np.ascontiguousarray(rgb8, dtype=np.uint8)
    f, l, n, _ = rgb8.shape
    lib = _load()
    if lib is None:
        res = rgb8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        if out is not None:
            out[...] = res
            return out
        return np.ascontiguousarray(res)
    if out is None:
        out = np.empty((f, 3, l, n), dtype=np.float32)
    assert out.shape == (f, 3, l, n) and out.dtype == np.float32
    # the C side writes out as one contiguous run from its base pointer
    assert out.flags["C_CONTIGUOUS"], "out must be C-contiguous"
    lib.cmt_rgb8_hwc_to_chw_f32(
        rgb8.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(f), ctypes.c_int64(l), ctypes.c_int64(n),
        ctypes.c_int(_threads()),
    )
    return out


def chw_f32_to_rgb8(rgb: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """(F, 3, L, N) float32 in [0, 1] -> (F, L, N, 3) uint8 (round + clamp)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.float32)
    f, _, l, n = rgb.shape
    lib = _load()
    if lib is None:
        x = np.clip(rgb.transpose(0, 2, 3, 1) * 255.0 + 0.5, 0.0, 255.0)
        res = x.astype(np.uint8)
        if out is not None:
            out[...] = res
            return out
        return res
    if out is None:
        out = np.empty((f, l, n, 3), dtype=np.uint8)
    assert out.shape == (f, l, n, 3) and out.dtype == np.uint8
    assert out.flags["C_CONTIGUOUS"], "out must be C-contiguous"
    lib.cmt_chw_f32_to_rgb8_hwc(
        rgb.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(f), ctypes.c_int64(l), ctypes.c_int64(n),
        ctypes.c_int(_threads()),
    )
    return out


def write_ppm(path: str, rgb8_hwc: np.ndarray) -> None:
    """(L, N, 3) uint8 -> binary PPM."""
    rgb8_hwc = np.ascontiguousarray(rgb8_hwc, dtype=np.uint8)
    l, n, _ = rgb8_hwc.shape
    lib = _load()
    if lib is None:
        with open(path, "wb") as fh:
            fh.write(b"P6\n%d %d\n255\n" % (n, l))
            fh.write(rgb8_hwc.tobytes())
        return
    rc = lib.cmt_write_ppm(
        path.encode(), rgb8_hwc.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(l), ctypes.c_int64(n),
    )
    if rc != 0:
        raise OSError(f"cmt_write_ppm({path}) failed with code {rc}")


def read_ppm(path: str, max_pixels: int = 64 * 1024 * 1024) -> np.ndarray:
    """Binary PPM -> (L, N, 3) uint8."""
    lib = _load()
    if lib is None:
        with open(path, "rb") as fh:
            magic = fh.readline().strip()
            if magic != b"P6":
                raise ValueError(f"{path}: not a binary PPM")
            dims = fh.readline().split()
            n, l = int(dims[0]), int(dims[1])
            maxval = int(fh.readline().split()[0])
            if maxval != 255:
                # 16-bit samples would be silently misread as 8-bit
                raise ValueError(f"{path}: maxval {maxval} != 255")
            data = fh.read(l * n * 3)
        if len(data) != l * n * 3:
            raise ValueError(f"{path}: truncated pixel data")
        return np.frombuffer(data, np.uint8).reshape(l, n, 3).copy()
    # size the scratch from the file itself (pixel data <= file size): a
    # fixed max_pixels*3 buffer would first-touch ~190 MB of pages per call
    cap = min(max_pixels * 3, os.path.getsize(path))
    buf = np.empty(cap, dtype=np.uint8)
    lines = ctypes.c_int64()
    samples = ctypes.c_int64()
    rc = lib.cmt_read_ppm(
        path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(buf.size), ctypes.byref(lines), ctypes.byref(samples),
    )
    if rc != 0:
        raise OSError(f"cmt_read_ppm({path}) failed with code {rc}")
    l, n = lines.value, samples.value
    return buf[: l * n * 3].reshape(l, n, 3).copy()


#: BT.601 luma weights (the Y4M convention) — shared by the C++ decoder
#: and the NumPy fallback below; keep in sync with frameio.cpp y4m_body.
_KR, _KB = 0.299, 0.114
_KG = 1.0 - _KR - _KB


def y4m_to_rgb(
    raw: bytes | np.ndarray,
    count: int,
    stride: int,
    marker: int,
    h: int,
    w: int,
    ch: int,
    cw: int,
    sv: int,
    sh: int,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Raw planar Y4M frames -> (count, 3, h, w) float32 RGB in [0, 1].

    ``raw`` holds ``count`` frames of ``stride`` bytes each, every frame
    ``marker`` bytes of FRAME line followed by planar Y (h*w), Cb, Cr
    (ch*cw each).  BT.601 studio range, nearest-neighbor chroma upsample —
    the video feeder's per-frame decode loop, threaded in C++ when the
    codec is available, vectorized NumPy otherwise (bit-identical: the
    C++ side mirrors this float32 operation order — NEP 50 keeps python
    scalars weak, so nothing here promotes to double — and the build
    disables FP contraction so no FMA changes the rounding).
    """
    buf = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) \
        else np.ascontiguousarray(raw, dtype=np.uint8)
    if buf.size < count * stride:
        raise ValueError(
            f"y4m_to_rgb: {buf.size} bytes < {count} frames * {stride}"
        )
    lib = _load()
    if lib is not None:
        if out is None:
            out = np.empty((count, 3, h, w), dtype=np.float32)
        assert out.shape == (count, 3, h, w) and out.dtype == np.float32
        assert out.flags["C_CONTIGUOUS"]
        lib.cmt_y4m_to_chw_f32(
            buf.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(count), ctypes.c_int64(stride),
            ctypes.c_int64(marker), ctypes.c_int64(h), ctypes.c_int64(w),
            ctypes.c_int64(ch), ctypes.c_int64(cw),
            ctypes.c_int(sv), ctypes.c_int(sh), ctypes.c_int(_threads()),
        )
        return out
    # NumPy fallback: same math, vectorized per chunk
    res = np.empty((count, 3, h, w), dtype=np.float32)
    frames = buf[: count * stride].reshape(count, stride)
    y8 = frames[:, marker : marker + h * w].reshape(count, h, w)
    cb8 = frames[:, marker + h * w : marker + h * w + ch * cw].reshape(
        count, ch, cw
    )
    cr8 = frames[
        :, marker + h * w + ch * cw : marker + h * w + 2 * ch * cw
    ].reshape(count, ch, cw)
    if (sv, sh) != (1, 1):
        cb8 = np.repeat(np.repeat(cb8, sv, 1), sh, 2)[:, :h, :w]
        cr8 = np.repeat(np.repeat(cr8, sv, 1), sh, 2)[:, :h, :w]
    y = (y8.astype(np.float32) - 16.0) / 219.0
    cb = (cb8.astype(np.float32) - 128.0) / 224.0
    cr = (cr8.astype(np.float32) - 128.0) / 224.0
    r = y + 2.0 * (1.0 - _KR) * cr
    b = y + 2.0 * (1.0 - _KB) * cb
    g = (y - _KR * r - _KB * b) / _KG
    res[:] = np.clip(np.stack([r, g, b], axis=1), 0.0, 1.0)
    if out is not None:
        out[...] = res
        return out
    return res
