"""Synthetic test images (color bars, zone plates, natural-ish textures).

The property tests in SURVEY.md §4.3 need deterministic inputs with known
spectral structure; these generators are shared by tests, bench, and the CLI
demo.  All return channels-first float arrays in [0, 1].
"""

from __future__ import annotations

import numpy as np

#: Classic 75% EBU color bars, left to right.
BAR_COLORS_75 = np.array(
    [
        [0.75, 0.75, 0.75],  # white (75%)
        [0.75, 0.75, 0.00],  # yellow
        [0.00, 0.75, 0.75],  # cyan
        [0.00, 0.75, 0.00],  # green
        [0.75, 0.00, 0.75],  # magenta
        [0.75, 0.00, 0.00],  # red
        [0.00, 0.00, 0.75],  # blue
        [0.00, 0.00, 0.00],  # black
    ],
    dtype=np.float64,
)


def color_bars(n_lines: int, n_samples: int) -> np.ndarray:
    """(3, L, N) 75% color bars."""
    idx = np.minimum((np.arange(n_samples) * 8) // n_samples, 7)
    img = BAR_COLORS_75[idx].T  # (3, N)
    return np.broadcast_to(img[:, None, :], (3, n_lines, n_samples)).copy()


def gray_ramp(n_lines: int, n_samples: int) -> np.ndarray:
    """(3, L, N) horizontal luminance ramp — zero chroma by construction."""
    ramp = np.linspace(0.0, 1.0, n_samples)
    return np.broadcast_to(ramp, (3, n_lines, n_samples)).copy()


def smooth_scene(n_lines: int, n_samples: int, seed: int = 0) -> np.ndarray:
    """(3, L, N) band-limited pseudo-natural scene.

    Random field low-passed well inside the chroma bandwidths, so round-trip
    loss is dominated by the modem, not by unrepresentable detail.
    """
    rng = np.random.default_rng(seed)
    img = rng.random((3, n_lines, n_samples))
    # separable box-ish smoothing via FFT low-pass
    for axis, keep in ((1, max(2, n_lines // 16)), (2, max(2, n_samples // 32))):
        spec = np.fft.rfft(img, axis=axis)
        sl = [slice(None)] * 3
        sl[axis] = slice(keep, None)
        spec[tuple(sl)] = 0.0
        img = np.fft.irfft(spec, n=img.shape[axis], axis=axis)
    img -= img.min()
    img /= max(img.max(), 1e-9)
    return 0.1 + 0.8 * img  # stay away from clamp rails
