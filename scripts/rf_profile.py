"""Stage-level profile of the RF/VSB hop (VERDICT r2 item 3).

Times each stage of frame/rf.py's roundtrip at the chip-matrix shape
(16, 480, 720) with the relay-honest slope protocol, to locate where the
50 Mpix/s goes before optimizing.  Writes results/rf_profile.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(batch: int = 16, iters: int = 30) -> None:
    from color_modem_tpu.dsp.apply import fir_same_fft
    from color_modem_tpu.frame.rf import (
        make_rf_plan, rf_modulate, rf_demodulate, rf_roundtrip,
    )
    from color_modem_tpu.frame.pipeline import make_pipeline
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
    rfp = make_rf_plan(plan)
    r = rfp.r
    rf = jax.block_until_ready(jax.jit(
        lambda c: rf_modulate(rfp, c, 0))(comp))
    pixels = batch * lines * n

    cases = {}

    def rec(name, fn, x, scale_pixels=pixels):
        t = measure(fn, x, iters=iters)
        s = t["seconds_per_call"]
        cases[name] = {
            "ms_per_call": round(1e3 * s, 3),
            "mpix_per_s": round(scale_pixels / s / 1e6, 1),
        }
        print(name, cases[name], flush=True)

    # full hop and its two halves
    rec("roundtrip", jax.jit(lambda c: rf_roundtrip(rfp, c, 0)), comp)
    rec("modulate", jax.jit(lambda c: rf_modulate(rfp, c, 0)), comp)
    rec("demodulate", jax.jit(lambda x: rf_demodulate(rfp, x, 0)), rf)

    # building blocks at the RF rate
    stream = rf.reshape(batch, -1)
    rec("fir_same_fft_rf_1025taps",
        jax.jit(lambda x: fir_same_fft(x, rfp.tx_taps)), stream)
    nfft = 1 << int(np.ceil(np.log2(stream.shape[-1] + 1024)))
    rec("rfft_2e21", jax.jit(lambda x: jnp.fft.rfft(x, n=nfft, axis=-1)),
        stream)

    out = {"ts": time.time(), "batch": batch, "iters": iters,
           "shape": [batch, lines, n], "r": r,
           "device": jax.default_backend(),
           "cases": cases}
    os.makedirs("results", exist_ok=True)
    with open("results/rf_profile.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()
    main(a.batch, a.iters)
