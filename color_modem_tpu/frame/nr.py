"""Temporal noise reduction (3D NR) — the TV set's last cleanup stage.

Analog reception leaves white noise on the decoded picture; consumer sets
average successive frames wherever the scene is static (noise is
uncorrelated frame to frame, the picture is not) and gate the averaging by
a motion detector so moving objects don't ghost.  Same shape as the
motion-adaptive comb's temporal half, but in decoded RGB — it composes
with EVERY standard and decoder, including SECAM (whose FM chroma has no
temporal comb to exploit).

    clean = temporal_nr(decoded_frames, sigma=0.02)

Pure jnp over the batched frame axis; the video runner applies it per
chunk when asked (``nr_sigma``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from color_modem_tpu.separate.stencil import (
    next_reflect_frames,
    prev_reflect_frames,
)


def box_smooth(x: jax.Array, width: int, axis: int) -> jax.Array:
    """O(n) cumulative-sum box filter along one axis, edge-held borders
    (no conv lowering involved — see the lax.conv pitfall in equalize.py)."""
    if width % 2 != 1:
        raise ValueError(f"box width must be odd, got {width}")
    pad = width // 2
    xm = jnp.moveaxis(x, axis, -1)
    xp = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(pad, pad)], mode="edge")
    c = jnp.cumsum(
        jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(1, 0)]), axis=-1
    )
    out = (c[..., width:] - c[..., :-width]) / jnp.float32(width)
    return jnp.moveaxis(out, -1, axis)


def temporal_nr(
    rgb: jax.Array, sigma: float | None = None, spatial_smooth: int = 9
) -> jax.Array:
    """(B, 3, L, N) decoded frames -> noise-reduced frames.

    ``sigma`` is the expected per-channel noise standard deviation ON THE
    DECODED PLANES (after a noisy FM/QAM demod it is larger and spatially
    shaped compared to the composite noise).  ``None`` estimates the
    floor from the lower quartile of the motion metric itself — static
    regions dominate it, as in hardware NR noise estimators; NOTE that
    this assumption fails under WHOLE-FRAME motion (a global pan leaves
    no static quartile and the gate stays open — measured -8 dB on a
    rolling synthetic source), so prefer an explicit ``sigma`` whenever
    the noise level is known: a conservative (low) value can only reduce
    the averaging, never ghost.  Where the
    local mean-square frame difference is noise-sized, the three-frame
    average applies (up to ~4.8 dB of noise removal); where it is
    picture-sized (motion), the gate closes continuously and the current
    frame passes through.
    """
    if rgb.ndim < 4:
        raise ValueError("temporal_nr needs a (frames, 3, L, N) batch")
    # the frame stencils shift axis -3; on channels-first RGB that axis is
    # COLOR, so put channels in front: (B, 3, L, N) -> (3, B, L, N)
    x = jnp.swapaxes(rgb.astype(jnp.float32), 0, 1)
    prev = prev_reflect_frames(x, 1)
    nxt = next_reflect_frames(x, 1)
    # AGC/flicker compensation: match each neighbor's GLOBAL mean to the
    # current frame before differencing/averaging — per-frame brightness
    # modulation otherwise reads as full-frame "motion" that both fools
    # the noise-floor estimator and pollutes the average (measured -8 dB
    # on a flickering source before this)
    def _match(nb):
        num = jnp.mean(x, axis=(0, -1, -2), keepdims=True)
        den = jnp.maximum(jnp.mean(nb, axis=(0, -1, -2), keepdims=True),
                          1e-6)
        return nb * (num / den)

    prev = _match(prev)
    nxt = _match(nxt)
    # motion metric: mean-square frame difference over channels, smoothed
    # over a small spatial window (noise averages down, real motion stays)
    d = jnp.mean((x - prev) ** 2 + (x - nxt) ** 2, axis=0, keepdims=True)
    d = box_smooth(box_smooth(d, spatial_smooth, -1), spatial_smooth, -2)
    # two uncorrelated noise differences contribute E[d] = 4 sigma^2; the
    # gate stays open for that and closes as the EXCESS grows picture-sized
    if sigma is None:
        noise_floor = jnp.percentile(d, 25.0)
    else:
        noise_floor = jnp.float32(4.0 * sigma * sigma)
    thr = 2.0 * noise_floor + jnp.float32(1e-9)
    w = thr / (thr + jnp.maximum(d - noise_floor, 0.0))
    out = w * (prev + x + nxt) / 3.0 + (1.0 - w) * x
    return jnp.swapaxes(out, 0, 1)
