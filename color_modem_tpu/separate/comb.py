"""Chroma/luma separation: notch and line-axis comb stencils (K4, K5).

The comb exploits the standard's line phase law: at spacing ``p`` lines
(1 for NTSC/NIIR, 2 for PAL — see golden.frame.comb_spacing) the subcarrier
is ~180 deg out of phase, so a difference cancels luma and a sum cancels
chroma (SURVEY.md A.6, §3.3).  The reference buffers previous composite lines
as instance state; here the "state" is a shifted array — and under line-block
sharding, a 1-2 line halo exchange.
"""

from __future__ import annotations

import jax

from color_modem_tpu.dsp.apply import fir_same
from color_modem_tpu.standards.decoders import comb_spacing, temporal_comb_spacing
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.separate.stencil import (
    next_reflect,
    next_reflect_frames,
    prev_reflect,
    prev_reflect_frames,
)

SEPARATORS = ("notch", "comb2", "comb3", "comb3d", "combA", "comb3dA")


def stencil_signal(plan: ModemPlan, comp: jax.Array, decoder: str) -> jax.Array:
    """The stencil part of the separation: the signal whose sample-axis BPF
    yields the chroma band.  'notch'/'delayline'/'avg' pass the composite
    through (their averaging happens after demodulation, matching the golden
    oracle); combs take line differences; 'comb3d' takes FRAME differences
    (the temporal comb — the chroma phase also inverts at 1-2 frame spacing,
    so static content separates perfectly; only the batched frame axis makes
    this expressible)."""
    if decoder == "comb3d":
        pt = temporal_comb_spacing(plan.cfg)
        if pt is None:
            raise ValueError(f"{plan.cfg.name}: no temporal comb spacing")
        if comp.ndim < 3:
            raise ValueError(
                "comb3d needs a batched (frames, lines, samples) block — "
                "the frame axis is what it combs along"
            )
        return (
            2.0 * comp
            - prev_reflect_frames(comp, pt)
            - next_reflect_frames(comp, pt)
        ) / 4.0
    p = comb_spacing(plan.cfg)
    if decoder == "comb2":
        return (comp - prev_reflect(comp, p)) / 2.0
    if decoder == "comb3":
        return (2.0 * comp - prev_reflect(comp, p) - next_reflect(comp, p)) / 4.0
    return comp


def separate(plan: ModemPlan, comp: jax.Array, decoder: str):
    """(..., L, N) composite -> (luma, chroma_band)."""
    if decoder == "combA":
        return separate_adaptive(plan, comp)
    if decoder == "comb3dA":
        return separate_adaptive_3d(plan, comp)
    chroma_band = fir_same(stencil_signal(plan, comp, decoder), plan.chroma_bpf)
    return comp - chroma_band, chroma_band


def separate_adaptive(plan: ModemPlan, comp: jax.Array):
    """Soft-switching adaptive comb (K5+, 'combA').

    A fixed comb averages across vertical color transitions and smears
    them; an adaptive comb picks the neighbor that actually matches.  The
    match metric is the COMB COMPLEMENT: the band-limited SUM with a
    neighbor cancels chroma exactly when that neighbor carries the same
    chroma (the phase flips at the comb spacing), so its smoothed energy
    measures mismatch directly.  (The difference's energy — the first
    thing tried — is wrong: across a hue edge the two chromas partially
    cancel in the difference, making the WRONG side look quiet.)  The two
    difference estimates blend with weights inversely proportional to the
    complements' energies — a CONTINUOUS switch (hard selection would be
    fp-fragile at decision boundaries and visibly noisy).  Matches the
    golden oracle's combA float-for-float; plain jnp on every backend.
    """
    from color_modem_tpu.standards.decoders import (
        ADAPTIVE_BIAS,
        ADAPTIVE_EPS,
    )

    p = comb_spacing(plan.cfg)
    prev = prev_reflect(comp, p)
    nxt = next_reflect(comp, p)
    d1 = fir_same((comp - prev) / 2.0, plan.chroma_bpf)
    d2 = fir_same((comp - nxt) / 2.0, plan.chroma_bpf)
    k1 = fir_same((comp + prev) / 2.0, plan.chroma_bpf)
    k2 = fir_same((comp + nxt) / 2.0, plan.chroma_bpf)
    e1 = fir_same(k1 * k1, plan.comb_sel_lpf)
    e2 = fir_same(k2 * k2, plan.comb_sel_lpf)
    # chroma-scale bias: without it, near-zero complements on smooth
    # content let noise swing the weights (standards/decoders.py note)
    bias = ADAPTIVE_BIAS * fir_same(
        d1 * d1 + d2 * d2, plan.comb_sel_lpf
    ) + ADAPTIVE_EPS
    w1 = (e2 + bias) / (e1 + e2 + 2.0 * bias)
    chroma_band = w1 * d1 + (1.0 - w1) * d2
    return comp - chroma_band, chroma_band


def separate_adaptive_3d(plan: ModemPlan, comp: jax.Array):
    """Motion-adaptive 3D comb ('comb3dA') — the high-end TV chip design.

    Four chroma estimates compete per sample: the spatial up/down line
    differences (combA's pair) and the temporal previous/next FRAME
    differences (comb3d's pair, spacing ``temporal_comb_spacing``).  Each
    estimate's comb complement (the band-limited SUM with its neighbor)
    measures mismatch: for the temporal pair that complement is literally
    a motion detector.  Inverse-energy weights with the chroma-scale bias
    blend them — static content converges to the temporal comb (perfect
    separation), moving content to the spatial adaptive comb, per sample,
    with no hard switching artifacts.  Inverse-energy normalization
    reduces exactly to combA's pairwise form at N=2.
    """
    from color_modem_tpu.standards.decoders import (
        ADAPTIVE_BIAS,
        ADAPTIVE_EPS,
    )

    pt = temporal_comb_spacing(plan.cfg)
    if pt is None:
        raise ValueError(f"{plan.cfg.name}: no temporal comb spacing")
    if comp.ndim < 3:
        raise ValueError(
            "comb3dA needs a batched (frames, lines, samples) block — "
            "the frame axis carries its temporal candidates"
        )
    p = comb_spacing(plan.cfg)
    neighbors = [
        prev_reflect(comp, p),
        next_reflect(comp, p),
        prev_reflect_frames(comp, pt),
        next_reflect_frames(comp, pt),
    ]
    ds = [fir_same((comp - nb) / 2.0, plan.chroma_bpf) for nb in neighbors]
    es = [
        fir_same(
            fir_same((comp + nb) / 2.0, plan.chroma_bpf) ** 2,
            plan.comb_sel_lpf,
        )
        for nb in neighbors
    ]
    bias = ADAPTIVE_BIAS * fir_same(
        sum(d * d for d in ds) / 2.0, plan.comb_sel_lpf
    ) + ADAPTIVE_EPS
    # inverse-SQUARED energies: the linear weighting left ~10% of the
    # static estimate to the (luma-contaminated) spatial candidates and
    # cost 5 dB of the temporal comb's static win; squaring makes the
    # contamination quadratic in the energy ratio
    inv = [1.0 / (e + bias) ** 2 for e in es]
    denom = sum(inv)
    chroma_band = sum(w * d for w, d in zip(inv, ds)) / denom
    return comp - chroma_band, chroma_band
