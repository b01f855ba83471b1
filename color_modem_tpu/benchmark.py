"""Single-chip benchmark — prints ONE JSON line (the driver metric).

Metric: encode+decode round-trip throughput in Mpix/s on one chip for the
flagship config (BASELINE.json config 2: NTSC, 2D-comb decoder, batched
720x480 frames).  ``vs_baseline`` is the speedup over the reference's
estimated throughput ceiling of 1 Mpix/s (a per-scanline Python/NumPy loop;
the reference publishes no numbers — BASELINE.md), i.e. value/1.0.

Run either way (same protocol, SURVEY.md §5.6):

    python bench.py [--batch B] [--iters K] [--standard ntsc] [--decoder comb3]
    python -m color_modem_tpu.cli bench [same flags]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def add_bench_args(ap) -> None:
    """Benchmark flags, shared by bench.py and the ``bench`` CLI verb."""
    ap.add_argument("--batch", type=int, default=16)
    # 100 iters ~ 0.4 s of device work: the slope must dominate the tunnel's
    # bursty +-tens-of-ms window jitter (smaller contrasts measured negative)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--standard", default="ntsc")
    ap.add_argument("--decoder", default="comb3")
    ap.add_argument("--lines", type=int, default=0, help="0 = standard active lines")
    ap.add_argument("--samples", type=int, default=720)
    ap.add_argument(
        "--backend", default="auto",
        help="xla | pallas | auto (pallas on TPU, xla elsewhere)",
    )
    ap.add_argument(
        "--roofline", action="store_true",
        help="also report achieved TFLOP/s and HBM GB/s vs chip peaks "
        "(SURVEY.md §5.1 speed-of-light check)",
    )


def run(args) -> None:
    import os

    import jax
    import jax.numpy as jnp

    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.modem.plan import make_plan
    from color_modem_tpu.standards import ALL_STANDARDS
    from color_modem_tpu.utils.metrics import psnr

    cfg = ALL_STANDARDS[args.standard]()
    lines = args.lines or cfg.active_lines
    plan = make_plan(cfg, args.samples)
    from color_modem_tpu.standards.decoders import allowed_decoders

    if args.decoder not in allowed_decoders(cfg):
        import sys

        fallback = allowed_decoders(cfg)[0]
        print(
            f"bench: {cfg.name} does not support decoder "
            f"{args.decoder!r}; benchmarking {fallback!r} instead",
            file=sys.stderr,
        )
        args.decoder = fallback
    from color_modem_tpu.utils.testimages import smooth_scene

    # band-limited scene: makes the reported PSNR a meaningful health check
    # (raw random noise cannot round-trip a band-limited analog channel)
    one = smooth_scene(lines, args.samples, seed=0)
    rgb = jnp.asarray(
        np.broadcast_to(one, (args.batch, 3, lines, args.samples)), jnp.float32
    )

    from color_modem_tpu.utils.profiling import force

    # HONEST timing through the axon relay tunnel (CLAUDE.md; every piece
    # is load-bearing):
    #  * DISTINCT input per dispatch — the relay caches same-input
    #    executions (once inflated this bench 25x).
    #  * A fused scalar READBACK ends each window — block_until_ready can
    #    return before the chip executes (measured 2026-08-16: an unforced
    #    loop reported 3x the physical HBM peak, and a stale run of this
    #    bench recorded 119 Gpix/s, ~100x reality).
    #  * SLOPE timing: each window is run at two sizes and the per-call
    #    time is the slope, cancelling the constant ~0.1 s readback and
    #    dispatch-ramp overheads exactly.  Best of 3 pairs (tunnel latency
    #    is bursty, +-20% run to run).
    # Each dispatch varies only the traced ``frame0`` scalar — a distinct
    # input tuple for the relay's cache at zero extra device work (the
    # frame index genuinely changes the phase law, not the FLOP count).
    # Each output is reduced to one scalar immediately so the device frees
    # output buffers in order instead of holding `count` frames live.
    frame_counter = [0]

    def _measure(backend_name: str):
        _, _, rt = make_pipeline(plan, args.decoder, backend_name)
        out = rt(rgb, 0)
        force(out)  # warmup / compile
        q = psnr(np.asarray(out), np.asarray(rgb))

        def _window(count: int) -> float:
            t0 = time.perf_counter()
            acc = []
            for _ in range(count):
                o = rt(rgb, frame_counter[0])
                frame_counter[0] += 1
                acc.append(o.ravel()[:4].sum())
            force(acc)
            return time.perf_counter() - t0

        small = max(4, args.iters // 10)
        t_small = min(_window(small) for _ in range(3))
        t_big = min(_window(args.iters) for _ in range(3))
        dt = (t_big - t_small) / (args.iters - small)
        if dt <= 0:
            # Same guard as utils/profiling.measure: a latency burst during
            # the small windows can make the slope negative.  Fall back to
            # the whole-window mean — a strict upper bound on per-call time
            # (includes the ~0.1 s readback), so throughput is understated,
            # never absurd.
            import sys

            print(
                "bench: slope timing below resolution (latency burst); "
                "using whole-window upper bound",
                file=sys.stderr,
            )
            dt = t_big / args.iters
        return dt, q, rt

    backend = args.backend
    if backend == "auto" and jax.default_backend() == "tpu":
        # the relay tunnel routes executables to backend instances of
        # varying speed (measured: the same pallas executable 711-1995
        # Mpix/s across sessions while xla held 1670) — measure BOTH
        # formulations and report the better configuration
        dt_p, q_p, rt_p = _measure("pallas")
        dt_x, q_x, rt_x = _measure("xla")
        if dt_p <= dt_x:
            dt, quality, roundtrip, backend = dt_p, q_p, rt_p, "pallas"
        else:
            dt, quality, roundtrip, backend = dt_x, q_x, rt_x, "xla"
    else:
        if backend == "auto":
            backend = "xla"
        dt, quality, roundtrip = _measure(backend)

    pixels = args.batch * lines * args.samples
    mpix_s = pixels / dt / 1e6
    scanlines_s = args.batch * lines / dt

    line = json.dumps(
        {
            "metric": f"{args.standard}-{args.decoder} roundtrip throughput (1 chip, "
            f"{backend}, {args.batch}x{lines}x{args.samples}, "
            f"psnr={quality:.1f}dB, {scanlines_s:,.0f} scanlines/s)",
            "value": round(mpix_s, 1),
            "unit": "Mpix/s",
            "vs_baseline": round(mpix_s / 1.0, 1),
        }
    )
    print(line)

    # structured record for results/ (SURVEY.md §5.5)
    os.makedirs("results", exist_ok=True)
    record = {
        "ts": time.time(),
        "standard": args.standard,
        "decoder": args.decoder,
        "backend": backend,
        "device": jax.default_backend(),
        "shape": [args.batch, lines, args.samples],
        "iters": args.iters,
        "mpix_per_s": round(mpix_s, 1),
        "scanlines_per_s": round(scanlines_s),
        "roundtrip_psnr_db": round(float(quality), 2),
    }
    if args.roofline:
        from color_modem_tpu.utils.profiling import chip_peaks

        peaks = chip_peaks()
        try:
            # lower the XLA-backend twin for the LOGICAL flop count: Pallas
            # custom-calls hide their internal flops from cost_analysis
            _, _, rt_xla = make_pipeline(plan, args.decoder, "xla")
            ca = rt_xla.lower(rgb, 0).compile().cost_analysis()
            flops = float(ca.get("flops", float("nan")))
            ca_b = roundtrip.lower(rgb, 0).compile().cost_analysis()
            byt = float(ca_b.get("bytes accessed", float("nan")))
        except Exception:
            flops = byt = float("nan")
        dt_call = dt  # slope timing above already yields per-call seconds

        def _num(v, nd):
            # NaN (unknown peaks / failed cost analysis) is not valid JSON
            return round(v, nd) if np.isfinite(v) else None

        record["roofline"] = {
            "logical_tflops": _num(flops / dt_call / 1e12, 2),
            "tflops_fraction_of_f32_peak": _num(
                flops / dt_call / 1e12 / peaks["f32_tflops"], 3
            ),
            "hbm_gbps": _num(byt / dt_call / 1e9, 1),
            "hbm_fraction_of_peak": _num(
                byt / dt_call / 1e9 / peaks["hbm_gbps"], 3
            ),
            "binding_constraint": "MXU shape ceiling at (768,768) operands "
            "— see BASELINE.md roofline section",
        }
        print(json.dumps({"roofline": record["roofline"]}))

    path = f"results/bench_{args.standard}_{args.decoder}_{backend}.json"
    with open(path, "w") as f:
        json.dump(record, f, indent=1)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    add_bench_args(ap)
    run(ap.parse_args(argv))


if __name__ == "__main__":
    main()
