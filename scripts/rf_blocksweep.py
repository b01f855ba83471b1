"""Pick the overlap-save block size for stream FIRs (VERDICT r2 item 3).

Compares one giant (B, 2^21) rfft+irfft against batched medium blocks
(B*nblocks, nblk) at equal total stream length, on the chip.  The winner
sets dsp/apply's overlap-save geometry.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from color_modem_tpu.utils.profiling import measure

B = 16
T = 480 * 720 * 4            # RF stream per frame
TAPS = 2049                  # composed-filter length budget


def main(iters: int = 30) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)), jnp.float32)
    cases = {}

    def rec(name, fn, arg, work_pts):
        t = measure(fn, arg, iters=iters)
        s = t["seconds_per_call"]
        cases[name] = {
            "ms_per_call": round(1e3 * s, 3),
            "ns_per_stream_sample": round(1e9 * s / (B * T), 3),
        }
        print(name, cases[name], flush=True)

    # baseline: one giant padded rfft+irfft (what fir_same_fft does)
    nfft_big = 1 << int(np.ceil(np.log2(T + TAPS - 1)))
    # host constant: complex64 device->host is UNIMPLEMENTED on this relay
    Kb = np.fft.rfft(
        np.pad(rng.standard_normal(TAPS), (0, nfft_big - TAPS))
    ).astype(np.complex64)

    def big(x):
        X = jnp.fft.rfft(x, n=nfft_big, axis=-1)
        return jnp.fft.irfft(X * Kb, n=nfft_big, axis=-1)[..., :T]

    rec(f"giant_{nfft_big}", jax.jit(big), x, B * nfft_big)

    for nblk in (4096, 8192, 16384, 32768, 65536):
        step = nblk - (TAPS - 1)
        nb = int(np.ceil(T / step))
        K = np.fft.rfft(
            np.pad(rng.standard_normal(TAPS), (0, nblk - TAPS))
        ).astype(np.complex64)

        def osave(x, nblk=nblk, step=step, nb=nb, K=K):
            pad = jnp.pad(x, ((0, 0), (TAPS - 1, nb * step - T)))
            # gather overlapping blocks: (B, nb, nblk)
            idx = (jnp.arange(nb)[:, None] * step
                   + jnp.arange(nblk)[None, :])
            blocks = pad[:, idx]
            Y = jnp.fft.irfft(jnp.fft.rfft(blocks, axis=-1) * K,
                              n=nblk, axis=-1)
            y = Y[:, :, TAPS - 1:].reshape(B, nb * step)
            return y[:, :T]

        rec(f"osave_{nblk}", jax.jit(osave), x, B * nb * nblk)

    out = {"ts": time.time(), "B": B, "T": T, "taps": TAPS,
           "device": jax.default_backend(), "cases": cases}
    os.makedirs("results", exist_ok=True)
    with open("results/rf_blocksweep.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
