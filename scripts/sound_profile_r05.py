"""Round-5 sound-chain stage profile: where does rf-hop+sound's time go?

The first chip number for "television WITH SOUND" (chip_matrix_r05's
rf-sound row) reads ~93 Mpix/s against the bare RF hop's ~370 — the
sound layers cost ~3/4 of the row.  This script times each irreducible
sound stage separately (relay-honest slope protocol), so optimization
effort lands where the time actually is:

* sound_on_rf: the ZOH repeat to the RF rate, the deviation cumsum over
  the 22M-sample joined stream (a sequential VPU scan), the carrier
  cos/sin synthesis;
* sound_from_rf: the composed takeoff conv (RF rate), the decimated
  rotation + discriminator, the audio low-pass;
* NICAM: modulate (burst synthesis) and demodulate (matched filter +
  frame alignment search) separately.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(batch: int, iters: int) -> None:
    from color_modem_tpu.frame import nicam as nic
    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.frame.rf import (
        _snd_rotate, make_rf_plan, rf_modulate, sound_from_rf, sound_on_rf,
    )
    from color_modem_tpu.dsp.apply import fir_same_fft
    from color_modem_tpu.dsp.stream import conv_decim_stream
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
    rfp = make_rf_plan(plan)
    rf = jax.block_until_ready(jax.jit(lambda c: rf_modulate(rfp, c, 0))(comp))

    t = np.arange(batch * lines * n) / plan.fs
    audio = jnp.asarray(
        (0.6 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32).reshape(
            batch, lines * n)
    )

    cases = {}

    def rec(name, fn, *xs, it=iters):
        r = measure(fn, *xs, iters=it)
        s = r.get("seconds_per_call", 0.0)
        cases[name] = {
            "ms_per_call": round(1e3 * s, 3),
            "mpix_per_s": round(pixels / s / 1e6, 1) if s > 0 else None,
            **({"below_timing_resolution": True}
               if r.get("below_timing_resolution") else {}),
        }
        print(name, cases[name], flush=True)
        return s

    # --- whole sound layers ----------------------------------------------
    rec("sound_on_rf", jax.jit(
        lambda x, a: sound_on_rf(rfp, x, 0, a, 0.0)), rf, audio)
    rf_s = jax.block_until_ready(jax.jit(
        lambda x, a: sound_on_rf(rfp, x, 0, a, 0.0))(rf, audio))
    rec("sound_from_rf", jax.jit(lambda x: sound_from_rf(rfp, x, 0)), rf_s)

    # --- sound_on_rf stages ----------------------------------------------
    b, l, n_rf = rf.shape

    def zoh(a):
        return jnp.repeat(a.reshape(1, -1), rfp.r, axis=-1)

    a_rf = jax.block_until_ready(jax.jit(zoh)(audio))
    rec("snd_stage_zoh_repeat", jax.jit(zoh), audio)
    rec("snd_stage_cumsum_rf_rate", jax.jit(
        lambda x: jnp.cumsum(x, axis=-1)), a_rf)
    phi = jax.block_until_ready(jax.jit(
        lambda x: jnp.cumsum(x, axis=-1))(a_rf))

    def carrier(p):
        ramp = jnp.asarray(rfp.snd_ramp, jnp.float32)
        pr = p.reshape(b, l, n_rf)
        return jnp.cos(ramp[None, None, :] + pr)

    rec("snd_stage_carrier_cos", jax.jit(carrier), phi)

    # --- sound_from_rf stages --------------------------------------------
    rec("snd_stage_takeoff_convdecim", jax.jit(
        lambda x: conv_decim_stream(
            x.reshape(1, -1), rfp.snd_dem_taps(), rfp.r)), rf_s)
    zc = jax.block_until_ready(jax.jit(
        lambda x: conv_decim_stream(
            x.reshape(1, -1), rfp.snd_dem_taps(), rfp.r
        ).reshape(b, l, n))(rf_s))

    def disc(z):
        i, q = _snd_rotate(rfp, z, 0, 0.0)
        i, q = i.reshape(1, -1), q.reshape(1, -1)
        ip = jnp.concatenate([i[:, :1], i[:, :-1]], axis=-1)
        qp = jnp.concatenate([q[:, :1], q[:, :-1]], axis=-1)
        return jnp.arctan2(ip * q - i * qp, i * ip + q * qp)

    rec("snd_stage_rotate_disc", jax.jit(disc), zc)
    dphi = jax.block_until_ready(jax.jit(disc)(zc))
    rec("snd_stage_aud_lpf", jax.jit(
        lambda x: fir_same_fft(x, rfp.aud_lpf)), dphi)

    # --- NICAM ------------------------------------------------------------
    cap = nic.nicam_capacity(rfp, (batch, lines, n * rfp.r))
    tn = np.arange(32 * cap) / 32000.0
    nl = jnp.asarray(0.5 * np.sin(2 * np.pi * 800.0 * tn), jnp.float32)
    nr_ = jnp.asarray(0.5 * np.sin(2 * np.pi * 2300.0 * tn), jnp.float32)
    rec("nicam_on_rf", jax.jit(
        lambda x: nic.nicam_on_rf(rfp, x, nl, nr_)), rf_s)
    rf_n = jax.block_until_ready(jax.jit(
        lambda x: nic.nicam_on_rf(rfp, x, nl, nr_))(rf_s))
    rec("nicam_from_rf", jax.jit(
        lambda x: nic.nicam_from_rf(rfp, x, cap)[:2]), rf_n,
        it=max(6, iters // 3))

    out = {"ts": time.time(), "batch": batch, "iters": iters,
           "shape": [batch, lines, n], "device": jax.default_backend(),
           "cases": cases}
    os.makedirs("results", exist_ok=True)
    with open("results/sound_profile_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v["ms_per_call"] for k, v in cases.items()}))


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
