"""Tracing / profiling helpers (SURVEY.md §5.1).

``trace(dir)`` wraps ``jax.profiler.trace`` (XLA/Perfetto traces viewable in
TensorBoard or ui.perfetto.dev).  ``measure`` times a jitted callable with
proper warmup + ``block_until_ready`` discipline and reports throughput
against the chip's speed-of-light numbers — the [BASELINE] "HBM-bound" check.
"""

from __future__ import annotations

import contextlib
import time

import jax

#: Peak numbers for the locally attached chip (TPU v5e / v5 lite, public
#: specs): used only for the roofline *report*, not for any computation.
PEAKS = {
    "tpu v5 lite": {"hbm_gbps": 819.0, "bf16_tflops": 197.0, "f32_tflops": 49.0},
}


def chip_peaks() -> dict:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAKS.items():
        if k in kind:
            return v
    return {"hbm_gbps": float("nan"), "bf16_tflops": float("nan"),
            "f32_tflops": float("nan")}


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: `with trace('/tmp/tb'): run()` -> Perfetto trace."""
    with jax.profiler.trace(log_dir):
        yield


def measure(fn, *args, iters: int = 20, bytes_moved: int | None = None,
            flops: int | None = None) -> dict:
    """Warmup once, then time ``iters`` calls of a jitted ``fn``.

    Every timed call gets a UNIQUE first-array argument (a tiny deterministic
    offset): execution relays that cache same-input dispatches (as the axon
    tunnel here does) would otherwise serve replays and report fantasy
    throughput.  ``bytes_moved``/``flops`` are per-call estimates supplied by
    the caller; when given, the report includes achieved HBM GB/s and
    TFLOP/s and their fraction of the chip peak (the speed-of-light ratio).
    """
    import jax.numpy as jnp

    def _args_for(i: int):
        varied = False
        out_args = []
        for a in args:
            if not varied and hasattr(a, "dtype") and jnp.issubdtype(
                getattr(a, "dtype"), jnp.floating
            ):
                # i+1: offset 0 would reproduce the warmup input exactly
                out_args.append(a + jnp.asarray((i + 1) * 1e-6, a.dtype))
                varied = True
            else:
                out_args.append(a)
        return out_args

    per_iter = [
        [jax.block_until_ready(a) if hasattr(a, "dtype") else a
         for a in _args_for(i)]
        for i in range(iters)
    ]
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*ai) for ai in per_iter]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    rep = {"seconds_per_call": dt}
    peaks = chip_peaks()
    if bytes_moved is not None:
        gbps = bytes_moved / dt / 1e9
        rep["hbm_gbps"] = round(gbps, 1)
        rep["hbm_fraction_of_peak"] = round(gbps / peaks["hbm_gbps"], 3)
    if flops is not None:
        tf = flops / dt / 1e12
        rep["tflops"] = round(tf, 2)
        rep["f32_fraction_of_peak"] = round(tf / peaks["f32_tflops"], 3)
    return rep
