"""PAL delay-line decoder / chroma-averaging wrapper (K6, A.3, A.6).

Realized as baseband averaging of the demodulated components over adjacent
lines: with the V-switch already un-switched during demodulation, averaging
U and V across a line pair is equivalent to the hardware 1-line-delay
sum/difference trick under ideal demodulation, and cancels V-axis phase
errors the same way.  The reference's ``ColorAveragingModem`` applies the
same operation to any standard [MEM-M].

The first line pairs with the next line (both neighbors always have the
opposite V-switch phase), matching golden.frame._neighbor.
"""

from __future__ import annotations

import jax

from color_modem_tpu.separate.stencil import prev_reflect


def average_with_neighbor(c: jax.Array) -> jax.Array:
    """c'[..., l, :] = (c[l] + c[neighbor(l)]) / 2 along the line axis."""
    return 0.5 * (c + prev_reflect(c, 1))
