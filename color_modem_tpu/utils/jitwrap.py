"""jit wrappers for public transmission-layer entry points.

The axon relay cannot dispatch complex ops EAGERLY (c2c fft/ifft, complex
construction/conjugation — all `UNIMPLEMENTED`, every backend sampled
2026-08-19) but compiles them fine under `jax.jit` (CLAUDE.md).  The
frame/rf.py and frame/satellite.py entry points all carry complex
intermediates through dsp/stream.py, so an eager library call on the chip
dies deep inside the relay.  :func:`plan_jit` makes those entry points
self-jitting:

* arg 0 (the host-constant plan dataclass — frozen, ``eq=False`` so it
  hashes by identity) is static, which is required anyway because the
  plans' composed-tap methods are host numpy run at trace time;
* the named ``static`` args are Python scalars that flow into host-side
  tap/phase math (``df``, ``detection``, ...) and must be concrete;
* on the **cpu** backend the wrapper calls the raw function — eager
  complex works there, and the test suite (CPU, many small plans) keeps
  its compile-free eager paths;
* inside an outer trace the nested jit is inlined by XLA, so pipelines
  that already jit whole stages pay nothing.
"""

from __future__ import annotations

import functools
import inspect

import jax


def plan_jit(fn, static: tuple = ()):
    """Wrap a public entry point ``fn(plan, *arrays, **scalars)`` so that
    off-CPU calls route through ``jax.jit`` with arg 0 and the named
    ``static`` args static.  See module docstring."""
    names = list(inspect.signature(fn).parameters)
    nums = tuple([0] + sorted(names.index(s) for s in static))
    jfn = jax.jit(fn, static_argnums=nums)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.default_backend() == "cpu":
            return fn(*args, **kwargs)
        return jfn(*args, **kwargs)

    wrapper.__wrapped__ = fn
    return wrapper
