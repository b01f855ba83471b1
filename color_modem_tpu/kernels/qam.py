"""Fused QAM encode/decode Pallas kernels (SURVEY.md §2.3 P1/P2/P4).

One kernel invocation per line block does everything between HBM reads and
writes in VMEM (all filter matmuls are 3-pass split-precision dots on
128-lane-aligned buffers — kernels/common.py):

* encode: chroma LPFs (two dots, or ONE with both components stacked on the
  sublane axis when the taps are shared — PAL/NIIR) + angle-addition NCO mix
  + V-switch + NIIR reference injection + luma add — replaces the
  reference's per-line chroma LPF + carrier math (C1 [MEM-H]) and the
  separate XLA passes of modem/qam.py.
* decode: chroma BPF dot + notch luma + product detector + demod LPF dots
  (one stacked when shared-taps) — the band-split + mix fusion P1/P4 of
  SURVEY.md §2.3.

Cross-line work (comb stencils, delay-line averaging, NIIR normalization,
colorimetry) stays outside the kernel and, when sharded, is the halo
exchange's natural home (parallel/halo.py).  Measured cost of keeping it
out (scripts/p2_stencil_delta.py at 16x480x720, two chip sessions):
comb3 +0.3% / -12.1%, comb2 +25.7% / -8.9% of the roundtrip — the two
sessions disagree in sign, i.e. the out-of-kernel stencil delta is BELOW
the relay's session-to-session execution variance (BASELINE.md measured
0.7-2.0 Gpix/s for the same binary), so fusing it could not be validated
to help and is not attempted.  Numbers live in
results/p2_stencil_delta.json and BASELINE.md "P2 stencil placement".

Twins: modem/qam.py `encode` / `separate_notch`+`demodulate_carrier`
(tested in tests/test_kernels.py, interpret mode off-TPU).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from color_modem_tpu.dsp.apply import toeplitz_same
from color_modem_tpu.dsp.nco import line_phase0
from color_modem_tpu.kernels.common import (
    compiler_params,
    dot3,
    pad_lanes,
    pad_lines,
    pick_line_block,
    should_interpret,
    split_bf16_host,
)
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.standards.base import QamParams


def _phase_cols(plan: ModemPlan, gline: jax.Array):
    """Per-line (phi0 + theta) and V-switch sign as flat (BL, 1) columns."""
    cfg = plan.cfg
    p: QamParams = cfg.chroma
    phi0 = line_phase0(cfg.cpl_num, cfg.cpl_den, gline) + jnp.float32(plan.theta)
    if p.v_switch:
        vs = jnp.where((gline % 2) == 0, 1.0, -1.0).astype(jnp.float32)
    else:
        vs = jnp.ones(gline.shape, jnp.float32)
    if p.reference_amplitude is not None:
        ref = jnp.where((gline % 2) == 1, 1.0, 0.0).astype(jnp.float32)
    else:
        ref = jnp.zeros(gline.shape, jnp.float32)
    flat = lambda a: a.reshape(-1, 1)
    return flat(phi0), flat(vs), flat(ref)


def _carrier(col_phi, rc, rs):
    """sin/cos of (per-line phase + per-sample ramp) by angle addition.

    sin(phi0+r) = sin(phi0)cos(r) + cos(phi0)sin(r): the per-sample cos(r)/
    sin(r) rows are exact f64 host constants, so the kernel does Lb
    transcendentals (one per line) instead of Lb*N — the full-grid sin/cos
    used to rival a filter matmul in VPU time.  The ramp rows are zeroed in
    the lane padding, which also zeroes everything downstream of the mix
    there (no separate mask needed)."""
    s0, c0 = jnp.sin(col_phi), jnp.cos(col_phi)  # (Lb, 1)
    return s0 * rc + c0 * rs, c0 * rc - s0 * rs


def _encode_kernel(a_ref, y_ref, c1_ref, c2_ref, col_ref, rc_ref, rs_ref,
                   m1h_ref, m1l_ref, m2h_ref, m2l_ref, out_ref):
    sin, cos = _carrier(col_ref[:, 0:1], rc_ref[:], rs_ref[:])
    vs = col_ref[:, 1:2]
    refmask = col_ref[:, 2:3]
    c1f = dot3(c1_ref[:], m1h_ref[:], m1l_ref[:])
    c2f = dot3(c2_ref[:], m2h_ref[:], m2l_ref[:])
    chroma = c1f * sin + vs * c2f * cos
    a_ref_amp = a_ref[0, 0]
    chroma = refmask * (a_ref_amp * sin) + (1.0 - refmask) * chroma
    out_ref[:] = y_ref[:] + chroma


def _encode_kernel_shared(a_ref, y_ref, c1_ref, c2_ref, col_ref, rc_ref,
                          rs_ref, mh_ref, ml_ref, out_ref):
    """Shared-taps variant (PAL/NIIR: c1_lpf == c2_lpf): stacking both
    chroma components on the sublane axis does two filter applications in
    one dot."""
    lb = y_ref.shape[0]
    sin, cos = _carrier(col_ref[:, 0:1], rc_ref[:], rs_ref[:])
    vs = col_ref[:, 1:2]
    refmask = col_ref[:, 2:3]
    both = jnp.concatenate([c1_ref[:], c2_ref[:]], axis=0)
    f = dot3(both, mh_ref[:], ml_ref[:])
    chroma = f[:lb] * sin + vs * f[lb:] * cos
    a_ref_amp = a_ref[0, 0]
    chroma = refmask * (a_ref_amp * sin) + (1.0 - refmask) * chroma
    out_ref[:] = y_ref[:] + chroma


def _decode_kernel_shared(sep_ref, comp_ref, col_ref, rc_ref, rs_ref,
                          mbh_ref, mbl_ref, mh_ref, ml_ref,
                          y_ref, c1_ref, c2_ref):
    lb = comp_ref.shape[0]
    sin, cos = _carrier(col_ref[:, 0:1], rc_ref[:], rs_ref[:])
    vs = col_ref[:, 1:2]
    cb = dot3(sep_ref[:], mbh_ref[:], mbl_ref[:])
    y_ref[:] = comp_ref[:] - cb
    mixed = jnp.concatenate([2.0 * cb * sin, 2.0 * cb * cos], axis=0)
    f = dot3(mixed, mh_ref[:], ml_ref[:])
    c1_ref[:] = f[:lb]
    c2_ref[:] = vs * f[lb:]


def _decode_kernel(sep_ref, comp_ref, col_ref, rc_ref, rs_ref,
                   mbh_ref, mbl_ref, m1h_ref, m1l_ref, m2h_ref, m2l_ref,
                   y_ref, c1_ref, c2_ref):
    sin, cos = _carrier(col_ref[:, 0:1], rc_ref[:], rs_ref[:])
    vs = col_ref[:, 1:2]
    cb = dot3(sep_ref[:], mbh_ref[:], mbl_ref[:])
    # luma = composite minus the separated chroma band (sep == comp for the
    # notch decoder; the comb stencil signal for comb decoders)
    y_ref[:] = comp_ref[:] - cb
    c1_ref[:] = dot3(2.0 * cb * sin, m1h_ref[:], m1l_ref[:])
    c2_ref[:] = vs * dot3(2.0 * cb * cos, m2h_ref[:], m2l_ref[:])


def _ramp_rows(ramp, n: int, n_total: int):
    """(1, n_total) f32 cos/sin rows of the per-sample phase ramp, computed
    in f64 on the host and zeroed in the lane padding (see _carrier)."""
    r64 = np.zeros(n_total, np.float64)
    r64[:n] = np.asarray(ramp, np.float64)
    rc = np.cos(r64).astype(np.float32)[None, :]
    rs = np.sin(r64).astype(np.float32)[None, :]
    rc[:, n:] = 0.0
    rs[:, n:] = 0.0
    return rc, rs


def _line_specs(lb: int, n: int, n_mats: int, n_cols: int):
    """BlockSpecs: blocked line arrays, constant matrices/ramp."""
    line = pl.BlockSpec((lb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((lb, n_cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ramp = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return line, col, ramp, [mat] * n_mats


def encode_lines(plan: ModemPlan, ycc_flat: jax.Array, cols: jax.Array) -> jax.Array:
    """(BL, 3, N) components + (BL, 3) [phi0+theta, vsign, refmask] -> (BL, N)."""
    p: QamParams = plan.cfg.chroma
    n = plan.n_samples
    y, c1, c2 = ycc_flat[:, 0], ycc_flat[:, 1], ycc_flat[:, 2]
    (y, total), (c1, _), (c2, _), (cols, _) = (
        pad_lines(y), pad_lines(c1), pad_lines(c2), pad_lines(cols)
    )
    (y, _), (c1, _), (c2, _) = pad_lanes(y), pad_lanes(c1), pad_lanes(c2)
    np_ = y.shape[-1]
    bl = y.shape[0]
    lb = pick_line_block(bl)
    shared = np.array_equal(plan.c1_lpf, plan.c2_lpf)
    n_mats = 2 if shared else 4
    line, col, ramp_spec, mats = _line_specs(lb, np_, n_mats, cols.shape[1])
    a_ref = jnp.full((1, 1), p.reference_amplitude or 0.0, jnp.float32)
    m1h, m1l = split_bf16_host(toeplitz_same(plan.c1_lpf, np_))
    if shared:
        mat_args = (jnp.asarray(m1h), jnp.asarray(m1l))
    else:
        m2h, m2l = split_bf16_host(toeplitz_same(plan.c2_lpf, np_))
        mat_args = (
            jnp.asarray(m1h), jnp.asarray(m1l),
            jnp.asarray(m2h), jnp.asarray(m2l),
        )
    rc, rs = _ramp_rows(plan.ramp, n, np_)
    out = pl.pallas_call(
        _encode_kernel_shared if shared else _encode_kernel,
        grid=(bl // lb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            line, line, line, col, ramp_spec, ramp_spec, *mats,
        ],
        out_specs=line,
        out_shape=jax.ShapeDtypeStruct((bl, np_), jnp.float32),
        compiler_params=compiler_params(*mat_args),
        interpret=should_interpret(),
    )(
        a_ref,
        y, c1, c2, cols,
        jnp.asarray(rc), jnp.asarray(rs),
        *mat_args,
    )
    return out[:total, :n]


def decode_lines(plan: ModemPlan, sep_flat: jax.Array, comp_flat: jax.Array,
                 cols: jax.Array):
    """(BL, N) separated + raw composite -> (y, c1, c2) each (BL, N)."""
    n = plan.n_samples
    (sep, total), (comp, _), (cols, _) = (
        pad_lines(sep_flat), pad_lines(comp_flat), pad_lines(cols)
    )
    (sep, _), (comp, _) = pad_lanes(sep), pad_lanes(comp)
    np_ = sep.shape[-1]
    bl = sep.shape[0]
    lb = pick_line_block(bl)
    shared = np.array_equal(plan.c1_lpf, plan.c2_lpf)
    n_mats = 4 if shared else 6
    line, col, ramp_spec, mats = _line_specs(lb, np_, n_mats, cols.shape[1])
    mbh, mbl = split_bf16_host(toeplitz_same(plan.chroma_bpf, np_))
    m1h, m1l = split_bf16_host(toeplitz_same(plan.c1_lpf, np_))
    mat_args = [jnp.asarray(mbh), jnp.asarray(mbl),
                jnp.asarray(m1h), jnp.asarray(m1l)]
    if not shared:
        m2h, m2l = split_bf16_host(toeplitz_same(plan.c2_lpf, np_))
        mat_args += [jnp.asarray(m2h), jnp.asarray(m2l)]
    kernel = _decode_kernel_shared if shared else _decode_kernel
    rc, rs = _ramp_rows(plan.ramp, n, np_)
    y, c1, c2 = pl.pallas_call(
        kernel,
        grid=(bl // lb,),
        in_specs=[line, line, col, ramp_spec, ramp_spec, *mats],
        out_specs=(line, line, line),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bl, np_), jnp.float32) for _ in range(3)
        ),
        compiler_params=compiler_params(*mat_args),
        interpret=should_interpret(),
    )(
        sep, comp, cols,
        jnp.asarray(rc), jnp.asarray(rs),
        *mat_args,
    )
    return y[:total, :n], c1[:total, :n], c2[:total, :n]


# --- block-level wrappers mirroring modem/qam.py signatures ----------------


def encode(plan: ModemPlan, ycc: jax.Array, gline: jax.Array) -> jax.Array:
    """Pallas twin of modem.qam.encode: (..., 3, L, N) -> (..., L, N)."""
    lead = ycc.shape[:-3]
    l, n = ycc.shape[-2], ycc.shape[-1]
    phi0, vs, ref = _phase_cols(plan, gline)
    cols = jnp.concatenate([phi0, vs, ref], axis=1)
    flat = jnp.moveaxis(ycc, -3, -2).reshape(-1, 3, n)  # (..., L, 3, N) flat
    out = encode_lines(plan, flat, cols)
    return out.reshape(lead + (l, n))


def demodulate_separated(plan: ModemPlan, sep: jax.Array, comp: jax.Array,
                         gline: jax.Array):
    """Pallas twin of separate-notch + demodulate_carrier on a block."""
    lead = comp.shape[:-2]
    l, n = comp.shape[-2], comp.shape[-1]
    phi0, vs, ref = _phase_cols(plan, gline)
    cols = jnp.concatenate([phi0, vs, ref], axis=1)
    y, c1, c2 = decode_lines(
        plan, sep.reshape(-1, n), comp.reshape(-1, n), cols
    )
    shape = lead + (l, n)
    return y.reshape(shape), c1.reshape(shape), c2.reshape(shape)
