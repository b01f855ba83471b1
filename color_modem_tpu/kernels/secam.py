"""Fused SECAM FM Pallas kernels (SURVEY.md §2.3 P3).

Encode kernel, per line block, entirely in VMEM:
  component select -> baseband LPF + LF pre-emphasis (ONE matmul: composing
  two 'same' FIRs is exactly the product of their Toeplitz matrices) ->
  FM phase integral (Kogge-Stone lane scan on the VPU) -> carrier ->
  HF anti-cloche (matmul) -> luma add.

Decode kernel (4 wide dots, everything else elementwise):
  [bell takeoff | luma notch] (one N-concatenated matmul on the composite)
  -> quadrature mix (elementwise with host ramps) -> [mix LPF | mix
  LPF∘differentiator] per arm (compositions exact by associativity) ->
  amplitude-invariant discriminator -> per-line rest frequency/deviation
  removal -> de-emphasis∘demod-LPF (one matmul).  Only the cross-line
  pairing stays outside (it is the sharded path's 1-line halo).

Twins: modem/secam.py `encode` / `demodulate_lines` (the jnp cumsum vs the
lane scan differ only in fp summation order).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from color_modem_tpu.dsp.apply import toeplitz_same, toeplitz_same_held
from color_modem_tpu.dsp.nco import TWO_PI
from color_modem_tpu.kernels.common import (
    compiler_params,
    dot3,
    lane_mask,
    pad_lanes,
    pad_lines,
    pick_line_block,
    should_interpret,
    split_bf16_host,
)
from color_modem_tpu.modem.plan import ModemPlan
from color_modem_tpu.modem.secam import (
    is_r_line,
    pair_components,
    pair_components_interp,
)
from color_modem_tpu.standards.base import FmParams


def _cumsum_lanes(x):
    """Inclusive cumsum along the lane axis: Kogge-Stone log-step scan.

    Mosaic has no cumsum lowering; the reference/golden use np.cumsum.  The
    previous formulation (x @ triu(ones) on the MXU at 6-pass precision) is
    both slower and *less* accurate than log2(N) masked roll-adds on the
    VPU (fp32 adds, log-depth rounding: 5e-7 vs 8e-7 max error on the
    SECAM deviation integral).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    s = 1
    while s < x.shape[-1]:
        xs = pltpu.roll(x, s, x.ndim - 1)
        x = x + jnp.where(col >= s, xs, 0.0)
        s *= 2
    return x


def _compose_same(taps_a, taps_b, n_valid: int, n_total: int) -> np.ndarray:
    """x @ M == fir_same(fir_same(x, a), b) at width n_valid, built at n_total.

    Composing at the padded width alone is NOT equivalent: the first filter's
    spill into the padded columns would feed back into real columns through
    the second filter.  Zeroing the second matrix's padded rows truncates the
    intermediate exactly like the unpadded 'same' convolution does.
    """
    a = toeplitz_same(taps_a, n_total)
    b = np.array(toeplitz_same(taps_b, n_total))  # copy: toeplitz is cached
    b[n_valid:, :] = 0.0
    return a @ b


def _compose_held(taps_a, taps_b, n_valid: int, n_total: int) -> np.ndarray:
    """Held-edge composition: fir_same_held(fir_same_held(x, a), b).

    The held matrices built at ``n_valid`` read/write only the first
    ``n_valid`` columns by construction, so the product needs no row
    zeroing (nothing ever spills into the lane padding)."""
    a = toeplitz_same_held(taps_a, n_total, n_valid)
    b = toeplitz_same_held(taps_b, n_total, n_valid)
    return a @ b


def _isr_col(gline: jax.Array) -> jax.Array:
    return jnp.where(is_r_line(gline), 1.0, 0.0).astype(jnp.float32).reshape(-1, 1)


def encode(plan: ModemPlan, ycc: jax.Array, gline: jax.Array) -> jax.Array:
    """Pallas twin of modem.secam.encode: (..., 3, L, N) -> (..., L, N)."""
    p: FmParams = plan.cfg.chroma
    n = plan.n_samples
    lead = ycc.shape[:-3]
    l = ycc.shape[-2]
    flat = jnp.moveaxis(ycc, -3, -2).reshape(-1, 3, n)
    y, dr, db = flat[:, 0], flat[:, 1], flat[:, 2]
    (y, total), (dr, _), (db, _), (isr, _) = (
        pad_lines(y), pad_lines(dr), pad_lines(db), pad_lines(_isr_col(gline))
    )
    (y, _), (dr, _), (db, _) = pad_lanes(y), pad_lanes(dr), pad_lanes(db)
    np_ = y.shape[-1]
    bl = y.shape[0]
    lb = pick_line_block(bl)
    k = float(TWO_PI / plan.fs)
    f0r_c = (p.f0r - plan.f_center) * k
    f0b_c = (p.f0b - plan.f_center) * k
    devr, devb = p.dev_r * k, p.dev_b * k

    def kernel(y_ref, dr_ref, db_ref, isr_ref, base_ref,
               mcombh_ref, mcombl_ref, mantih_ref, mantil_ref,
               out_ref):
        isr = isr_ref[:, 0:1]
        d = isr * dr_ref[:] + (1.0 - isr) * db_ref[:]
        dpre = dot3(d, mcombh_ref[:], mcombl_ref[:])
        df = (isr * f0r_c + (1.0 - isr) * f0b_c) + (
            isr * devr + (1.0 - isr) * devb
        ) * dpre
        # phase integral: dphi accumulates to ~+-250 rad — the log-depth
        # fp32 scan is the most accurate formulation available (see above).
        # Midpoint rule (scan - df/2), matching modem/secam.py and the
        # half-sample-offset plan.fm_carrier_ramp
        dphi = _cumsum_lanes(df) - 0.5 * df
        # mask lane padding: cos of the unpadded carrier ramp is garbage the
        # anti-cloche filter would smear into the last half-tap of real cols
        carrier = jnp.cos(base_ref[:] + dphi) * lane_mask(n, np_)
        out_ref[:] = y_ref[:] + dot3(carrier, mantih_ref[:], mantil_ref[:])

    line = pl.BlockSpec((lb, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((lb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ramp = pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((np_, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # held-edge baseband chain, matching modem/secam.py and the golden
    # oracle (dsp/apply.fir_same_held rationale)
    m_comb = _compose_held(plan.comp_lpf, plan.preemph, n, np_)
    mch, mcl = split_bf16_host(m_comb)
    mah, mal = split_bf16_host(toeplitz_same(plan.anticloche, np_))
    base = np.zeros(np_, np.float32)
    base[:n] = plan.fm_carrier_ramp
    mats = [jnp.asarray(m) for m in (mch, mcl, mah, mal)]
    out = pl.pallas_call(
        kernel,
        grid=(bl // lb,),
        in_specs=[line, line, line, col, ramp, mat, mat, mat, mat],
        out_specs=line,
        out_shape=jax.ShapeDtypeStruct((bl, np_), jnp.float32),
        compiler_params=compiler_params(*mats),
        interpret=should_interpret(),
    )(
        y, dr, db, isr,
        jnp.asarray(base)[None, :],
        *mats,
    )
    return out[:total, :n].reshape(lead + (l, n))


def demodulate_lines(plan: ModemPlan, comp: jax.Array, gline: jax.Array):
    """Pallas twin of modem.secam.demodulate_lines -> (luma, v).

    The blanking reconstruction (modem/secam.extend_blanking) runs as a
    cheap XLA pass before the kernel; the kernel then works at the
    extended width ``n + 2*fm_margin`` (lane-padded: 816 -> 896 for
    720-sample lines, +36% matmul FLOPs vs the unextended width — the
    price of the +3 dB SECAM accuracy, see plan.SECAM_MARGIN) and the
    wrapper crops the margins off both outputs.
    """
    from color_modem_tpu.modem.secam import extend_blanking

    p: FmParams = plan.cfg.chroma
    n = plan.n_samples
    mg = plan.fm_margin
    n_ext = n + 2 * mg
    lead = comp.shape[:-2]
    l = comp.shape[-2]
    ext = extend_blanking(plan, comp, gline)
    (flat, total) = pad_lines(ext.reshape(-1, n_ext))
    (isr, _) = pad_lines(_isr_col(gline))
    (flat, _) = pad_lanes(flat)
    np_ = flat.shape[-1]
    bl = flat.shape[0]
    lb = pick_line_block(bl, target=64)
    fs, fc = float(plan.fs), float(plan.f_center)
    f0r, f0b = float(p.f0r), float(p.f0b)
    devr, devb = float(p.dev_r), float(p.dev_b)
    inv2pi = float(fs / TWO_PI)

    mix = np.zeros(np_, dtype=np.float64)
    mix[:n_ext] = np.asarray(plan.mix_ramp_ext, dtype=np.float64)
    mixcos = np.cos(mix).astype(np.float32)[None, :]
    mixsin = np.sin(mix).astype(np.float32)[None, :]
    mixcos[:, n_ext:] = 0.0  # mask lane padding out of the demod mix inputs
    mixsin[:, n_ext:] = 0.0
    m_mix = toeplitz_same(plan.mix_lpf, np_)
    m_mixdiff = _compose_same(plan.mix_lpf, plan.diff, n_ext, np_)

    # Weight handling: five (N, N) weight matrices do not fit the 16 MB
    # VMEM budget if Mosaic double-buffers them as f32 blocked operands, and
    # its HIGHEST dot additionally keeps hi/lo operand splits on the kernel
    # stack.  So the weights ship as host-pre-split bf16 hi/lo pairs (half
    # the bytes, no hidden stack splits), stay in HBM, and are DMA'd once
    # into persistent scratch on grid step 0; dot3 does the 3-pass product.
    # The output chain (de-emphasis then demod LPF, composed) and the luma
    # notch are folded in too — keeping them as separate XLA matmuls cost
    # two extra HBM round-trips of the whole block.
    m_out = _compose_same(plan.deemph, plan.demod_lpf, n_ext, np_)
    # same-input dots share one wide matmul: concatenating the weight
    # matrices along N costs identical FLOPs but runs wider (better-tiled)
    # MXU passes — [bell | luma_notch] both filter the composite,
    # [m_mix | m_mixdiff] both filter each quadrature mix arm.
    m_bell_notch = np.concatenate(
        [toeplitz_same(plan.bell_takeoff, np_),
         toeplitz_same(plan.luma_notch, np_)], axis=1
    )
    m_mix2 = np.concatenate([m_mix, m_mixdiff], axis=1)
    weights = [
        split_bf16_host(m_bell_notch),
        split_bf16_host(m_mix2),
        split_bf16_host(m_out),
    ]
    weight_args = [jnp.asarray(w) for pair in weights for w in pair]
    n_w = len(weight_args)

    def kernel(c_ref, isr_ref, cos_ref, sin_ref,
               *rest):
        hbm_refs = rest[:n_w]
        v_ref, luma_ref = rest[n_w], rest[n_w + 1]
        vmem_refs = rest[n_w + 2 : 2 * n_w + 2]
        sems = rest[2 * n_w + 2]

        @pl.when(pl.program_id(0) == 0)
        def _load_weights():
            for k in range(n_w):
                cp = pltpu.make_async_copy(hbm_refs[k], vmem_refs[k], sems.at[k])
                cp.start()
            for k in range(n_w):
                pltpu.make_async_copy(hbm_refs[k], vmem_refs[k], sems.at[k]).wait()

        (bn_hi, bn_lo, mix2_hi, mix2_lo, out_hi, out_lo) = (
            r[:] for r in vmem_refs
        )
        tn = dot3(c_ref[:], bn_hi, bn_lo)           # [takeoff | notch-band]
        takeoff = tn[:, :np_]
        luma_ref[:] = c_ref[:] - tn[:, np_:]
        a = 2.0 * takeoff * cos_ref[:]
        b = -2.0 * takeoff * sin_ref[:]
        fa = dot3(a, mix2_hi, mix2_lo)              # [i | di]
        fb = dot3(b, mix2_hi, mix2_lo)              # [q | dq]
        i, di = fa[:, :np_], fa[:, np_:]
        q, dq = fb[:, :np_], fb[:, np_:]
        a2 = jnp.maximum(i * i + q * q, 1e-9)
        f_inst = fc + (i * dq - q * di) / a2 * inv2pi
        isr = isr_ref[:, 0:1]
        f0 = isr * f0r + (1.0 - isr) * f0b
        dev = isr * devr + (1.0 - isr) * devb
        # mask lane padding out of f_inst garbage before the output filter
        v = (f_inst - f0) / dev * lane_mask(n_ext, np_)
        v_ref[:] = dot3(v, out_hi, out_lo)

    line = pl.BlockSpec((lb, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((lb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ramp = pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    v, luma = pl.pallas_call(
        kernel,
        grid=(bl // lb,),
        in_specs=[line, col, ramp, ramp] + [hbm] * n_w,
        out_specs=(line, line),
        out_shape=(
            jax.ShapeDtypeStruct((bl, np_), jnp.float32),
            jax.ShapeDtypeStruct((bl, np_), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM(w.shape, jnp.bfloat16)
            for pair in weights for w in pair
        ]
        + [pltpu.SemaphoreType.DMA((n_w,))],
        compiler_params=compiler_params(*weight_args),
        interpret=should_interpret(),
    )(
        flat, isr, jnp.asarray(mixcos), jnp.asarray(mixsin),
        *weight_args,
    )
    shape = lead + (l, n)
    return (
        luma[:total, mg : mg + n].reshape(shape),
        v[:total, mg : mg + n].reshape(shape),
    )


def decode(
    plan: ModemPlan, comp: jax.Array, gline: jax.Array,
    pairing: str = "copy",
) -> jax.Array:
    """Full SECAM decode (Pallas core + XLA pairing), twin of secam.decode."""
    luma, v = demodulate_lines(plan, comp, gline)
    pair = pair_components_interp if pairing == "interp" else pair_components
    dr, db = pair(v, gline)
    return jnp.stack([luma, dr, db], axis=-3)
