"""Round-2 chip evidence matrix (VERDICT r1 item 8).

Runs the per-standard benchmark best-of-3 through bench's relay-honest
protocol (each bench call already takes the min of 3 slope-window pairs;
this script additionally repeats each config 3 times and keeps the best,
because the relay routes executables to backend instances of varying speed
— BASELINE.md measured 0.7-2.0 Gpix/s across sessions for the same
binary).  Also records per-config round-trip PSNR on the chip.

Every row runs in its OWN SUBPROCESS: the slope-timing protocol keeps
``iters`` distinct inputs plus their outputs live (CLAUDE.md — the relay
caches same-input executions), which at the widest shapes approaches the
chip's whole HBM; process exit is the only reliable way to return it all
before the next row.  A row that dies (RESOURCE_EXHAUSTED at 16x576x1440
SECAM, first observed 2026-08-18) is retried at half then quarter batch —
throughput is per-pixel, so a smaller batch stays comparable and is
recorded in the row's ``shape``.

Writes results/chip_matrix_r02.json; BASELINE.md's table is refreshed from
it by hand in the same commit.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: standard -> (headline decoder, samples) — the per-standard flagship
#: configurations the README accuracy/perf tables report
CONFIGS = [
    ("ntsc", "comb3", 720),
    ("pal", "delayline", 720),
    ("pal", "comb3", 720),
    ("secam", "interp", 720),
    ("secam", "interp", 1440),   # the quality-qualified SECAM config
    ("secam", "avg", 720),       # FM chroma-averaging (VERDICT r1 item 7)
    ("ntsc", "comb3d", 720),     # temporal comb (frame-axis stencil)
    ("niir", "notch", 720),
    ("ntsc443", "notch", 720),  # no ~180-deg line flip: combs are gated off
    ("pal_m", "comb3", 720),
    ("pal_n", "comb3", 720),
    ("pal60", "delayline", 720),
]
#: appended special rows (transmission layers / second family)
SPECIAL = ["rf-vsb-hop", "d2mac", "satellite-fm-hop"]

REPEATS = 3


def _best(measure, fn, *args, iters):
    best = None
    for _ in range(REPEATS):
        r = measure(fn, *args, iters=iters)
        if r.get("below_timing_resolution"):
            continue
        if best is None or r["seconds_per_call"] < best:
            best = r["seconds_per_call"]
    return best


def run_row(row: int, batch: int, iters: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.modem.plan import make_plan
    from color_modem_tpu.standards import ALL_STANDARDS
    from color_modem_tpu.standards.decoders import allowed_decoders
    from color_modem_tpu.utils.metrics import psnr
    from color_modem_tpu.utils.profiling import measure
    from color_modem_tpu.utils.testimages import smooth_scene

    if row < len(CONFIGS):
        name, decoder, samples = CONFIGS[row]
        cfg = ALL_STANDARDS[name]()
        assert decoder in allowed_decoders(cfg), (name, decoder)
        lines = cfg.active_lines
        plan = make_plan(cfg, samples)
        one = smooth_scene(lines, samples, seed=0)
        rgb = jnp.asarray(
            np.broadcast_to(one, (batch, 3, lines, samples)), jnp.float32
        )
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        _, _, rt = make_pipeline(plan, decoder, backend)
        best = _best(measure, rt, rgb, 0, iters=iters)
        q = float(psnr(np.asarray(rt(rgb, 0)), np.asarray(rgb)))
        pixels = batch * lines * samples
        return {
            "standard": name, "decoder": decoder, "backend": backend,
            "shape": [batch, lines, samples],
            "mpix_per_s": round(pixels / best / 1e6, 1) if best else None,
            "roundtrip_psnr_db": round(q, 2),
        }

    special = SPECIAL[row - len(CONFIGS)]
    cfg = ALL_STANDARDS["ntsc"]()
    plan = make_plan(cfg, 720)
    one = smooth_scene(cfg.active_lines, 720, seed=0)

    if special == "rf-vsb-hop":
        # composite -> RF -> composite; measured separately because the RF
        # hop wraps the composite pipeline rather than being a decoder;
        # throughput counts composite pixels.
        from color_modem_tpu.frame.rf import make_rf_plan, rf_roundtrip

        rgb = jnp.asarray(
            np.broadcast_to(one, (batch, 3, cfg.active_lines, 720)),
            jnp.float32,
        )
        enc, _, _ = make_pipeline(plan, "notch", "xla")
        comp = jax.block_until_ready(enc(rgb, 0))
        rfp = make_rf_plan(plan)
        # jit like every other row: eager dispatch would re-run
        # fir_same_fft's host-side kernel FFTs inside the timed region and
        # pay per-op relay overhead, understating the chip by a lot
        rf_rt = jax.jit(lambda c: rf_roundtrip(rfp, c, 0))
        best = _best(measure, rf_rt, comp, iters=iters)
        q = float(psnr(np.asarray(rf_rt(comp))[:, 2:-2],
                       np.asarray(comp)[:, 2:-2]))
        pixels = batch * cfg.active_lines * 720
        return {
            "standard": "ntsc", "decoder": special, "backend": "xla",
            "shape": [batch, cfg.active_lines, 720],
            "mpix_per_s": round(pixels / best / 1e6, 1) if best else None,
            "roundtrip_psnr_db": round(q, 2),  # composite transparency
        }

    if special == "d2mac":
        from color_modem_tpu.modem import mac as mac_mod

        mplan = mac_mod.make_mac_plan(720)
        lines = 576
        one = smooth_scene(lines, 720, seed=0)
        rgb = jnp.asarray(
            np.broadcast_to(one, (batch, 3, lines, 720)), jnp.float32
        )
        g = (jnp.arange(batch)[:, None] * mplan.cfg.total_lines
             + jnp.arange(lines))
        mac_rt = jax.jit(lambda x: mac_mod.roundtrip(mplan, x, g))
        best = _best(measure, mac_rt, rgb, iters=iters)
        q = float(psnr(np.asarray(mac_rt(rgb)), np.asarray(rgb)))
        pixels = batch * lines * 720
        return {
            "standard": "d2mac", "decoder": "time-multiplex",
            "backend": "xla", "shape": [batch, lines, 720],
            "mpix_per_s": round(pixels / best / 1e6, 1) if best else None,
            "roundtrip_psnr_db": round(q, 2),
        }

    # satellite FM hop: 4x-oversampled FM over the NTSC composite — the
    # heaviest per-pixel transmission layer (pow2 FFT stream filters at
    # the RF rate), so a chip number matters.
    from color_modem_tpu.frame import satellite as sat_mod

    rgb = jnp.asarray(
        np.broadcast_to(one, (batch, 3, cfg.active_lines, 720)), jnp.float32
    )
    enc2, _, _ = make_pipeline(plan, "notch", "xla")
    comp = jax.block_until_ready(enc2(rgb, 0))
    sp = sat_mod.make_sat_plan(plan.fs, 720)
    sat_rt = jax.jit(lambda c: sat_mod.fm_demodulate(
        sp, sat_mod.fm_modulate(sp, c)))
    best = _best(measure, sat_rt, comp, iters=max(10, iters // 4))
    q = float(psnr(np.asarray(sat_rt(comp)), np.asarray(comp)))
    pixels = batch * cfg.active_lines * 720
    return {
        "standard": "ntsc", "decoder": special, "backend": "xla",
        "shape": [batch, cfg.active_lines, 720],
        "mpix_per_s": round(pixels / best / 1e6, 1) if best else None,
        "roundtrip_psnr_db": round(q, 2),  # composite transparency
    }


def main(batch: int, iters: int, cpu: bool) -> None:
    import jax

    n_rows = len(CONFIGS) + len(SPECIAL)
    out = {"ts": time.time(), "batch": batch, "iters": iters,
           "repeats": REPEATS, "rows": []}
    for row in range(n_rows):
        row_json = None
        for b in (batch, batch // 2, batch // 4):
            if b < 1:
                break
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--row", str(row), "--batch", str(b),
                   "--iters", str(iters)]
            if cpu:
                cmd.append("--cpu")
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=2400)
            lines = [ln for ln in p.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if p.returncode == 0 and lines:
                row_json = json.loads(lines[-1])
                if b != batch:
                    row_json["batch_reduced_from"] = batch
                break
            sys.stderr.write(
                f"row {row} failed at batch {b} (rc={p.returncode}); "
                f"tail: {p.stderr.strip().splitlines()[-1:]}\n")
        if row_json is None:
            row_json = {"row": row, "error": "failed at every batch size"}
        out["rows"].append(row_json)
        print(json.dumps(row_json), flush=True)
        if row == 0:
            out["device"] = row_json.get("device", "")
            out["device_kind"] = row_json.get("device_kind", "")

    os.makedirs("results", exist_ok=True)
    with open("results/chip_matrix_r02.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--row", type=int, default=None,
                    help="run ONE row in this process and print its JSON "
                    "(used by the subprocess driver)")
    ap.add_argument(
        "--cpu", action="store_true",
        help="pin the CPU backend (the axon sitecustomize pins "
        "JAX_PLATFORMS, so the env var alone cannot; script validation "
        "while the chip is unavailable — do NOT commit CPU artifacts)",
    )
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if a.row is not None:
        import jax

        row = run_row(a.row, a.batch, a.iters)
        row["device"] = jax.default_backend()
        row["device_kind"] = jax.devices()[0].device_kind
        print(json.dumps(row), flush=True)
    else:
        main(a.batch, a.iters, a.cpu)
