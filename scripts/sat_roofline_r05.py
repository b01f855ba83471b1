"""Round-5 post-fold hop roofline (VERDICT r4 item 5).

The r04 fold changed the two dominant hop stages (-32/-38%) but the r04
stage-budget regeneration drew a slow-small-dispatch relay connection
(stage sums 1.5-2x the whole pipeline — unusable fractions, noted in the
artifact), so BASELINE's "0.88-1.05x of bound" certification still
described the PRE-fold engine.  This orchestrator re-states the bound for
the POST-fold engine and DETECTS that failure mode:

* one measurement attempt = one subprocess (fresh relay connection)
  timing every irreducible stage of all four hop directions plus the
  whole rows, r04's protocol;
* an attempt is USABLE only if every direction's stage-sum/whole fraction
  lands in [0.6, 1.3] — outside that band the connection is dispensing
  per-dispatch overheads large against the stages (the r04 failure), so
  the attempt is recorded and RETRIED on a fresh connection (up to 4);
* results/sat_roofline_r05.json keeps every attempt with its verdict,
  and the summary carries the accepted attempt's fractions.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

JSON_PATH = "results/sat_roofline_r05.json"
MAX_ATTEMPTS = 4
FRACTION_BAND = (0.6, 1.3)


def measure_attempt(batch: int, iters: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from color_modem_tpu.dsp.stream import (
        conv_decim_stream, fir_decim_stream, fir_stream, upconv_stream,
    )
    from color_modem_tpu.frame import satellite as sat
    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.frame.rf import (
        make_rf_plan, rf_demodulate, rf_modulate,
    )
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

    # whole rows
    s_sat_rt = rec("sat_roundtrip", jax.jit(
        lambda c: sat.fm_demodulate(sp, sat.fm_modulate(sp, c))), comp)
    s_sat_mod = rec("sat_modulate", jax.jit(lambda c: sat.fm_modulate(sp, c)),
                    comp)
    s_sat_dem = rec("sat_demodulate", jax.jit(
        lambda x: sat.fm_demodulate(sp, x)), sat_rf)
    s_rf_rt = rec("rf_roundtrip", jax.jit(
        lambda c: rf_demodulate(rfp, rf_modulate(rfp, c, 0), 0)), comp)
    s_rf_mod = rec("rf_modulate", jax.jit(lambda c: rf_modulate(rfp, c, 0)),
                   comp)
    s_rf_dem = rec("rf_demodulate", jax.jit(
        lambda x: rf_demodulate(rfp, x, 0)), rf_sig)

    # satellite demod stages (post-fold half-rate engine)
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
    sat_dem_sum = s_front + s_disc + s_dec + s_deemph

    # satellite modulate stages
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

    rf_stream_sat = jax.block_until_ready(sat_rf.reshape(batch, -1))
    s_fm = rec("sat_stage_fm_cumsum_carrier", jax.jit(fmcore), rf_stream_sat)
    sat_mod_sum = s_emph + s_up + s_fm

    # RF hop stages (post-fold)
    comp_flat = jax.block_until_ready(comp.reshape(batch, -1))
    rfstream = jax.block_until_ready(rf_sig.reshape(batch, -1))
    s_rf_up = rec("rf_stage_upconv", jax.jit(
        lambda x: jnp.real(upconv_stream(x, rfp.mod_taps(), rfp.r))),
        comp_flat)
    s_rf_cd = rec("rf_stage_convdecim", jax.jit(
        lambda x: jnp.real(conv_decim_stream(x, rfp.dem_taps(), rfp.r))),
        rfstream)
    s_rf_carrier = rec("rf_stage_carrier_mul", jax.jit(
        lambda x: x * jnp.cos(jnp.arange(x.shape[-1], dtype=jnp.float32))),
        rfstream)

    taps129 = np.hanning(129)
    taps129 /= taps129.sum()
    rec("unit_fir_stream_rf_129taps", jax.jit(
        lambda x: fir_stream(x, taps129)), rfstream)

    def frac(sum_s, whole_s):
        return round(sum_s / max(whole_s, 1e-9), 3)

    summary = {
        "sat_demod_fraction": frac(sat_dem_sum, s_sat_dem),
        "sat_mod_fraction": frac(sat_mod_sum, s_sat_mod),
        "rf_mod_fraction": frac(s_rf_up + s_rf_carrier, s_rf_mod),
        "rf_dem_fraction": frac(s_rf_cd + s_rf_carrier, s_rf_dem),
        "sat_demod_stage_sum_ms": round(1e3 * sat_dem_sum, 3),
        "sat_mod_stage_sum_ms": round(1e3 * sat_mod_sum, 3),
    }
    return {"cases": cases, "summary": summary,
            "shape": [batch, lines, n], "r": sp.r}


def attempt_usable(summary: dict) -> bool:
    lo, hi = FRACTION_BAND
    return all(
        lo <= summary[k] <= hi
        for k in ("sat_demod_fraction", "sat_mod_fraction",
                  "rf_mod_fraction", "rf_dem_fraction")
    )


def main(batch: int, iters: int, cpu: bool) -> None:
    os.makedirs("results", exist_ok=True)
    state = {"ts": time.time(), "batch": batch, "iters": iters,
             "fraction_band": FRACTION_BAND, "attempts": []}
    if os.path.exists(JSON_PATH):
        with open(JSON_PATH) as f:
            prev = json.load(f)
        if prev.get("batch") == batch and prev.get("iters") == iters:
            state = prev
    if any(a.get("usable") for a in state["attempts"]):
        print("already has a usable attempt — done")
        return
    for k in range(len(state["attempts"]), MAX_ATTEMPTS):
        cmd = [sys.executable, os.path.abspath(__file__), "--attempt",
               "--batch", str(batch), "--iters", str(iters)]
        if cpu:
            cmd.append("--cpu")
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=5400)
        except subprocess.TimeoutExpired:
            state["attempts"].append({"error": "timeout"})
            continue
        lines = [ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if p.returncode != 0 or not lines:
            tail = p.stderr.strip().splitlines()[-1:] if p.stderr else []
            state["attempts"].append(
                {"error": f"rc={p.returncode}", "tail": tail})
            with open(JSON_PATH, "w") as f:
                json.dump(state, f, indent=1)
            continue
        att = json.loads(lines[-1])
        att["wall_s"] = round(time.time() - t0, 1)
        att["usable"] = attempt_usable(att["summary"])
        state["attempts"].append(att)
        with open(JSON_PATH, "w") as f:
            json.dump(state, f, indent=1)
        print(f"attempt {k}: usable={att['usable']} "
              f"{json.dumps(att['summary'])}", flush=True)
        if att["usable"]:
            state["summary"] = att["summary"]
            with open(JSON_PATH, "w") as f:
                json.dump(state, f, indent=1)
            print("done: usable post-fold stage budget recorded")
            return
    print(f"NO usable attempt in {MAX_ATTEMPTS} tries — every connection "
          "drew the slow-small-dispatch failure mode; artifact records "
          "all attempts")
    sys.exit(1)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--attempt", action="store_true",
                    help="run ONE measurement attempt in this process")
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if a.attempt:
        out = measure_attempt(a.batch, a.iters)
        print(json.dumps(out), flush=True)
    else:
        main(a.batch, a.iters, a.cpu)
