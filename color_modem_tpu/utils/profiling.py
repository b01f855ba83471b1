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


def force(outs) -> float:
    """Force REAL execution of ``outs`` (any pytree) via a host readback.

    ``block_until_ready`` is NOT sufficient through the axon relay tunnel:
    it can return once the relay has *accepted* the work, before the chip
    has executed it (measured 2026-08-16: an unforced timing loop reported
    3x the chip's physical HBM peak).  The only reliable barrier is fetching
    a scalar that data-depends on every output.  One fused scalar keeps the
    readback cost to a single ~0.1 s tunnel round trip.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(outs)
              if hasattr(x, "dtype")]
    return float(_fold_leaves(leaves))


@jax.jit
def _fold_leaves(leaves):
    """One real f32 scalar data-depending on every leaf — UNDER JIT, so
    the complex ``real``/``imag`` reads never dispatch eagerly (the relay
    backend cannot run ANY complex op eagerly, CLAUDE.md; round-4 advisor
    finding: the previous eager fold was a latent on-chip crash for
    complex-returning measured functions).  jit caches one trace per leaf
    list structure; the call sites here reuse a handful of structures."""
    import jax.numpy as jnp

    s = jnp.float32(0.0)
    for l in leaves:
        s = s + _leaf_scalar(jnp, l)
    return s


def _leaf_scalar(jnp, l):
    """Fold one output leaf into a real f32 scalar that data-depends on it.

    Complex leaves fold real+imag separately: a bare ``astype(float32)``
    would silently discard the imaginary half of the forcing dependency
    (round-3 advisor finding).
    """
    head = l.ravel()[:4]
    if jnp.issubdtype(l.dtype, jnp.complexfloating):
        return (jnp.sum(jnp.real(head).astype(jnp.float32))
                + jnp.sum(jnp.imag(head).astype(jnp.float32)))
    return jnp.sum(head.astype(jnp.float32))


def measure(fn, *args, iters: int = 20, bytes_moved: int | None = None,
            flops: int | None = None) -> dict:
    """Warmup once, then time ``fn`` honestly through the relay tunnel.

    Protocol (every piece is load-bearing here — see CLAUDE.md):

    * Every timed call gets a UNIQUE first-array argument (a tiny
      deterministic offset): the axon relay caches same-input executions and
      would otherwise serve replays and report fantasy throughput.
    * Each timed window ends with a single fused scalar readback
      (:func:`force`) — ``block_until_ready`` alone does not force execution
      through the relay.
    * SLOPE timing: the window is run at two sizes (``iters`` and a small
      control) and the per-call time is the slope ``(T_big - T_small) /
      (iters - small)``, so the constant window overhead (the ~0.1 s forced
      readback, dispatch ramp) cancels exactly.  Best of 3 window pairs
      (tunnel latency is bursty).

    ``bytes_moved``/``flops`` are per-call estimates supplied by the caller;
    when given, the report includes achieved HBM GB/s and TFLOP/s and their
    fraction of the chip peak (the speed-of-light ratio).
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

    small = max(2, iters // 5)

    def _fold(acc, out):
        # fold every output leaf into one running scalar and DROP the
        # output reference: the window then keeps only (inputs + one
        # in-flight call's buffers) live instead of count full outputs —
        # at (16, 576, 1440) SECAM the old outs-list alone was ~4.8 GB
        # and RESOURCE_EXHAUSTED'd the v5e (r02 chip matrix row 4).  The
        # fold is 1-2 trivial kernels per call, async-dispatched like the
        # calls themselves; the data dependency chain still forces every
        # call when the single end-of-window scalar is read back.
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        return acc + _fold_leaves(leaves)

    def _window(count: int, salt: int) -> float:
        per_iter = [
            [jax.block_until_ready(a) if hasattr(a, "dtype") else a
             for a in _args_for(salt * 10_000 + i)]
            for i in range(count)
        ]
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for ai in per_iter:
            acc = _fold(acc, fn(*ai))
        float(acc)
        return time.perf_counter() - t0

    force(fn(*args))  # warmup / compile
    t_small = min(_window(small, 2 * w) for w in range(3))
    t_big = min(_window(iters, 2 * w + 1) for w in range(3))
    dt = (t_big - t_small) / (iters - small)
    rep = {"seconds_per_call": dt}
    if dt <= 0:
        # per-call work smaller than the tunnel's window jitter: the slope
        # is pure noise — report that instead of a negative throughput
        rep["below_timing_resolution"] = True
        return rep
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
