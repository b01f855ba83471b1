"""Round-4 transmission-hop roofline (VERDICT r3 item 1).

Two jobs, one chip session, results/sat_roofline_r04.json:

1. Re-measure the satellite hop after the HALF-RATE demod rework
   (frame/satellite.py::_demod_multiplex decimates the complex baseband
   by 2 inside the front-end conv) against r03's 351/172/117 Mpix/s.
2. State the stream-engine speed-of-light for BOTH hop rows: time each
   irreducible pipeline stage separately at the chip-matrix shape
   (16, 480, 720), sum them, and report the whole-row measurement as a
   fraction of that bound — the "% of stream roofline" column BASELINE.md
   was missing for the hop rows.  The bound is MEASURED (same session,
   same protocol), not hand-derived from pass counts: the relay's
   overheads and XLA's fusion make per-pass arithmetic unreliable
   (BASELINE.md relay notes).

Relay-honest slope protocol throughout (utils/profiling.measure).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(batch: int = 16, iters: int = 24) -> None:
    from color_modem_tpu.dsp.stream import (
        conv_decim_stream,
        fir_decim_stream,
        fir_stream,
        upconv_stream,
    )
    from color_modem_tpu.frame import satellite as sat
    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.frame.rf import make_rf_plan, rf_demodulate, rf_modulate
    from color_modem_tpu.modem.plan import make_plan
    from color_modem_tpu.standards import ALL_STANDARDS
    from color_modem_tpu.utils.profiling import measure
    from color_modem_tpu.utils.testimages import smooth_scene

    cfg = ALL_STANDARDS["ntsc"]()
    plan = make_plan(cfg, 720)
    lines, n = cfg.active_lines, 720
    one = smooth_scene(lines, n, seed=0)
    rgb = jnp.asarray(np.broadcast_to(one, (batch, 3, lines, n)), jnp.float32)
    enc, _, _ = make_pipeline(plan, "notch", "xla")
    comp = jax.block_until_ready(enc(rgb, 0))
    pixels = batch * lines * n

    sp = sat.make_sat_plan(plan.fs, n)
    rfp = make_rf_plan(plan)
    sat_rf = jax.block_until_ready(sat.fm_modulate(sp, comp))
    rf_sig = jax.block_until_ready(
        jax.jit(lambda c: rf_modulate(rfp, c, 0))(comp))

    cases = {}

    def rec(name, fn, *xs):
        t = measure(fn, *xs, iters=iters)
        s = t.get("seconds_per_call", 0.0)
        cases[name] = {
            "ms_per_call": round(1e3 * s, 3),
            "mpix_per_s": round(pixels / s / 1e6, 1) if s > 0 else None,
            **({"below_timing_resolution": True}
               if t.get("below_timing_resolution") else {}),
        }
        print(name, cases[name], flush=True)
        return s

    # ---- whole satellite rows (the headline re-measure) -----------------
    rec("sat_roundtrip", jax.jit(
        lambda c: sat.fm_demodulate(sp, sat.fm_modulate(sp, c))), comp)
    rec("sat_modulate", jax.jit(lambda c: sat.fm_modulate(sp, c)), comp)
    rec("sat_demodulate", jax.jit(lambda x: sat.fm_demodulate(sp, x)), sat_rf)

    # ---- satellite demod stage budget -----------------------------------
    # padded stream geometry exactly as _demod_multiplex builds it
    pad = sat._EDGE_PAD * sp.r
    stream = jax.block_until_ready(jax.jit(
        lambda x: sat._wrap_pad(x.reshape(batch, -1), pad))(sat_rf))
    h2 = sp.h_demod2_taps()

    def front(x):
        a = conv_decim_stream(x, h2, 2)
        return jnp.real(a), jnp.imag(a)

    s_front = rec("sat_stage_front_convdecim2", jax.jit(front), stream)
    i0, q0 = jax.block_until_ready(jax.jit(front)(stream))

    def disc(i, q):
        ip = jnp.concatenate([i[..., 1:], i[..., -1:]], axis=-1)
        qp = jnp.concatenate([q[..., 1:], q[..., -1:]], axis=-1)
        re = -(ip * i + qp * q)
        im = -(qp * i - ip * q)
        f = jnp.arctan2(im, re)
        f = jnp.concatenate([f[..., :1], f[..., :-1]], axis=-1)
        return f / jnp.float32(sp.deviation) + jnp.float32(sp.center)

    s_disc = rec("sat_stage_discriminator", jax.jit(disc), i0, q0)
    v0 = jax.block_until_ready(jax.jit(disc)(i0, q0))
    s_dec = rec("sat_stage_firdecim", jax.jit(
        lambda v: fir_decim_stream(v, sp.dec_down2_taps(), sp.r // 2)), v0)
    base0 = jax.block_until_ready(
        jnp.zeros((batch, lines * n), jnp.float32) + comp.reshape(batch, -1))
    s_deemph = rec("sat_stage_deemph_wrapfilter", jax.jit(
        lambda v: sat._wrap_filter(v, sp.rx_video_taps())), base0)
    s_demod_bound = s_front + s_disc + s_dec + s_deemph
    # modulate stage budget
    vpad = jax.block_until_ready(jax.jit(
        lambda x: sat._wrap_pad(x.reshape(batch, -1), sat._EDGE_PAD))(comp))
    s_emph = rec("sat_stage_preemph_wrapfilter", jax.jit(
        lambda v: sat._wrap_filter(v, sp.tx_video_taps())), base0)
    s_up = rec("sat_stage_upsample", jax.jit(
        lambda v: sat.upsample_fir_stream(v, sp.interp_up_taps(), sp.r)),
        vpad)

    def fmcore(v_rf):
        dphi = (sat.TWO_PI * sp.deviation / sp.fs_rf) * (
            v_rf - jnp.float32(sp.center))
        tot = jnp.sum(dphi, axis=-1, keepdims=True) % sat.TWO_PI
        tot = jnp.where(tot > jnp.pi, tot - sat.TWO_PI, tot)
        dphi = dphi - tot / v_rf.shape[-1]
        phi = jnp.cumsum(dphi, axis=-1) - 0.5 * dphi
        m = jnp.arange(v_rf.shape[-1]) % 4
        cpat = jnp.asarray([1.0, 0.0, -1.0, 0.0], jnp.float32)[m]
        spat = jnp.asarray([0.0, 1.0, 0.0, -1.0], jnp.float32)[m]
        return cpat * jnp.cos(phi) - spat * jnp.sin(phi)

    rf_stream = jax.block_until_ready(
        sat_rf.reshape(batch, -1))
    s_fm = rec("sat_stage_fm_cumsum_carrier", jax.jit(fmcore), rf_stream)
    s_mod_bound = s_emph + s_up + s_fm

    # ---- RF/VSB hop rows + stage budget ----------------------------------
    rec("rf_roundtrip", jax.jit(
        lambda c: rf_demodulate(rfp, rf_modulate(rfp, c, 0), 0)), comp)
    rec("rf_modulate", jax.jit(lambda c: rf_modulate(rfp, c, 0)), comp)
    rec("rf_demodulate", jax.jit(lambda x: rf_demodulate(rfp, x, 0)), rf_sig)
    comp_flat = jax.block_until_ready(comp.reshape(batch, -1))
    rfstream = jax.block_until_ready(rf_sig.reshape(batch, -1))
    s_rf_up = rec("rf_stage_upconv", jax.jit(
        lambda x: jnp.real(upconv_stream(x, rfp.mod_taps(), rfp.r))),
        comp_flat)
    s_rf_dem = rec("rf_stage_convdecim", jax.jit(
        lambda x: jnp.real(conv_decim_stream(x, rfp.dem_taps(), rfp.r))),
        rfstream)
    # elementwise epilogues (env map, carrier multiply, rotation) measured
    # as the whole minus stages is unreliable; time a representative one
    s_rf_carrier = rec("rf_stage_carrier_mul", jax.jit(
        lambda x: x * jnp.cos(jnp.arange(x.shape[-1], dtype=jnp.float32))),
        rfstream)

    # ---- the unit: one real overlap-save conv at the RF rate -------------
    taps129 = np.hanning(129)
    taps129 /= taps129.sum()
    rec("unit_fir_stream_rf_129taps", jax.jit(
        lambda x: fir_stream(x, taps129)), rfstream)

    summary = {
        "sat_demod_stage_sum_ms": round(1e3 * s_demod_bound, 3),
        "sat_demod_roofline_fraction": round(
            s_demod_bound / max(cases["sat_demodulate"]["ms_per_call"] / 1e3,
                                1e-9), 3),
        "sat_mod_stage_sum_ms": round(1e3 * s_mod_bound, 3),
        "sat_mod_roofline_fraction": round(
            s_mod_bound / max(cases["sat_modulate"]["ms_per_call"] / 1e3,
                              1e-9), 3),
        "rf_mod_stage_ms": round(1e3 * s_rf_up, 3),
        "rf_dem_stage_ms": round(1e3 * s_rf_dem, 3),
        "rf_carrier_ms": round(1e3 * s_rf_carrier, 3),
    }
    out = {"ts": time.time(), "batch": batch, "iters": iters,
           "shape": [batch, lines, n], "r": sp.r,
           "device": jax.default_backend(),
           "cases": cases, "summary": summary}
    os.makedirs("results", exist_ok=True)
    with open("results/sat_roofline_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(a.batch, a.iters)
