"""P2 evidence run (VERDICT r1 item 4 / SURVEY.md §2.3 P2).

kernels/qam.py keeps the comb stencil OUTSIDE the fused Pallas decode
kernel and claims the separate XLA pass is cheap.  This script measures
that claim directly on the real chip: per-call decode time for the pallas
backend with decoder=notch (stencil is a passthrough — sep IS the
composite) vs comb2/comb3 (one/two extra shifted reads + the weighted sum,
feeding the kernel a distinct sep array).  The comb-minus-notch delta IS
the marginal cost of the out-of-kernel stencil pass; the XLA backend is
measured alongside as context.

Writes results/p2_stencil_delta.json and prints a summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import NTSC
from color_modem_tpu.utils.metrics import psnr
from color_modem_tpu.utils.profiling import measure


def main(batch: int = 16, lines: int = 480, samples: int = 720,
         iters: int = 100) -> None:
    from color_modem_tpu.utils.testimages import smooth_scene

    plan = make_plan(NTSC(), samples)
    one = smooth_scene(lines, samples, seed=0)
    rgb = jnp.asarray(
        np.broadcast_to(one, (batch, 3, lines, samples)), jnp.float32
    )
    # decode-only timing: encode once, decode variants read the SAME comp
    enc, _, _ = make_pipeline(plan, "notch", "xla")
    comp = jax.block_until_ready(enc(rgb, 0))

    report = {"ts": time.time(), "device": jax.default_backend(),
              "shape": [batch, lines, samples], "iters": iters, "cases": {}}
    pixels = batch * lines * samples
    for backend in ("pallas", "xla"):
        for decoder in ("notch", "comb2", "comb3"):
            _, dec, _ = make_pipeline(plan, decoder, backend)
            r = measure(dec, comp, 0, iters=iters)
            key = f"{backend}-{decoder}"
            if r.get("below_timing_resolution"):
                report["cases"][key] = {"below_timing_resolution": True}
                continue
            dt = r["seconds_per_call"]
            report["cases"][key] = {
                "seconds_per_call": round(dt, 6),
                "mpix_per_s": round(pixels / dt / 1e6, 1),
            }
            print(f"{key}: {dt*1e3:.3f} ms/call "
                  f"({pixels / dt / 1e6:.0f} Mpix/s)", flush=True)
    for backend in ("pallas", "xla"):
        base = report["cases"].get(f"{backend}-notch", {})
        for decoder in ("comb2", "comb3"):
            c = report["cases"].get(f"{backend}-{decoder}", {})
            if "seconds_per_call" in base and "seconds_per_call" in c:
                d = c["seconds_per_call"] - base["seconds_per_call"]
                c["stencil_delta_ms"] = round(d * 1e3, 3)
                c["stencil_delta_frac"] = round(
                    d / base["seconds_per_call"], 3
                )
    # health check so a broken decode can't masquerade as a fast one
    _, dec3, _ = make_pipeline(plan, "comb3", "pallas")
    report["comb3_pallas_psnr_db"] = round(
        float(psnr(np.asarray(dec3(comp, 0)), np.asarray(rgb))), 2
    )
    os.makedirs("results", exist_ok=True)
    with open("results/p2_stencil_delta.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report["cases"].items()
                      if "stencil_delta_frac" in v}))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lines", type=int, default=480)
    ap.add_argument("--samples", type=int, default=720)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument(
        "--cpu", action="store_true",
        help="pin the CPU backend (the axon sitecustomize pins "
        "JAX_PLATFORMS, so the env var alone cannot; script validation "
        "while the chip is unavailable)",
    )
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    main(a.batch, a.lines, a.samples, a.iters)
