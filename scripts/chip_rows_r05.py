"""Round-5 sound-chain chip rows (VERDICT r4 item 6).

The matrix's hop rows were video-only: the README's flagship "television
WITH SOUND" path had no Mpix/s number anywhere in results/.  Two rows fix
that, measured with the same relay-honest best-of-3 slope protocol as
chip_matrix_r02.py (this script is its --row-protocol sibling so the r05
orchestrator can drive both):

* ``rf-sound`` — the RF/VSB hop carrying the joined-stream FM mono sound
  AND a NICAM-728 digital stereo burst (the Scandinavian channel plan the
  full-stack test drives): composite -> rf_modulate -> sound_on_rf ->
  nicam_on_rf -> rf_demodulate + sound_from_rf + nicam_from_rf.  Mpix/s
  counts composite pixels; the row also records FM audio SNR and NICAM
  parity errors (quality evidence that the measured chain is the real
  one, not a stripped variant).
* ``sat-sound`` — the satellite FM hop with two analog audio subcarriers
  (the Astra-style ladder, scaled positions at the 13.5 MHz flagship
  baseband): fm_modulate(audio=) -> fm_demodulate + fm_demodulate_audio,
  with per-subcarrier audio SNR.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def _snr(ref, out):
    """AC-compare: subtract EACH signal's own mean.  Subtracting only the
    ref mean (an earlier version) charged DC-exact chains (NICAM) a false
    error equal to the test tone's non-integer-period mean — the rf-sound
    row's first NICAM-right reading (42.2 dB) was that artifact; the raw
    error is ~3 LSB14 = the ~57-60 dB companding floor."""
    import numpy as np

    ref = np.asarray(ref, np.float64)
    ref = ref - ref.mean()
    out = np.asarray(out, np.float64)
    err = (out - out.mean()) - ref
    return round(10.0 * np.log10(
        np.mean(ref ** 2) / max(np.mean(err ** 2), 1e-30)
    ), 1)


def run_row(special: str, batch: int, iters: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from color_modem_tpu.frame.pipeline import make_pipeline
    from color_modem_tpu.modem.plan import make_plan
    from color_modem_tpu.standards import ALL_STANDARDS
    from color_modem_tpu.utils.metrics import psnr
    from color_modem_tpu.utils.profiling import measure
    from color_modem_tpu.utils.testimages import smooth_scene

    cfg = ALL_STANDARDS["ntsc"]()
    plan = make_plan(cfg, 720)
    lines = cfg.active_lines
    one = smooth_scene(lines, 720, seed=0)
    rgb = jnp.asarray(
        np.broadcast_to(one, (batch, 3, lines, 720)), jnp.float32
    )
    enc, _, _ = make_pipeline(plan, "notch", "xla")
    comp = jax.block_until_ready(enc(rgb, 0))
    pixels = batch * lines * 720

    if special == "rf-sound":
        from color_modem_tpu.frame import nicam as nic
        from color_modem_tpu.frame.rf import (
            make_rf_plan, rf_demodulate, rf_modulate, sound_from_rf,
            sound_on_rf,
        )

        rfp = make_rf_plan(plan)
        t = np.arange(batch * lines * 720) / plan.fs
        audio = jnp.asarray(
            (0.6 * np.sin(2 * np.pi * 1000.0 * t)
             + 0.3 * np.sin(2 * np.pi * 7000.0 * t)).astype(
                np.float32).reshape(batch, lines * 720)
        )
        cap = nic.nicam_capacity(rfp, (batch, lines, 720 * rfp.r))
        tn = np.arange(32 * cap) / 32000.0  # NICAM audio: 32 kHz/channel
        nl = jnp.asarray(0.5 * np.sin(2 * np.pi * 800.0 * tn), jnp.float32)
        nr_ = jnp.asarray(0.5 * np.sin(2 * np.pi * 2300.0 * tn), jnp.float32)

        def hop(c):
            rf = rf_modulate(rfp, c, 0)
            rf = sound_on_rf(rfp, rf, 0, audio, 0.0)
            rf = nic.nicam_on_rf(rfp, rf, nl, nr_)
            out = rf_demodulate(rfp, rf, 0)
            aud = sound_from_rf(rfp, rf, 0)
            l_rx, r_rx, rep, lock = nic.nicam_from_rf(rfp, rf, cap)
            return out, aud, l_rx, r_rx, rep["parity_errors"]

        hop_j = jax.jit(hop)
        best = _best(measure, hop_j, comp, iters=iters)
        out, aud, l_rx, r_rx, perr = hop_j(comp)
        q = float(psnr(np.asarray(out)[:, 2:-2], np.asarray(comp)[:, 2:-2]))
        return {
            "standard": "ntsc", "decoder": "rf-hop+fm-sound+nicam",
            "backend": "xla", "shape": [batch, lines, 720],
            "mpix_per_s": round(pixels / best / 1e6, 1) if best else None,
            "roundtrip_psnr_db": round(q, 2),  # composite transparency
            "fm_audio_snr_db": _snr(
                np.asarray(audio).reshape(-1)[8000:-8000],
                np.asarray(aud).reshape(-1)[8000:-8000]),
            "nicam_frames": int(cap),
            "nicam_parity_errors": int(np.asarray(perr).sum()),
            "nicam_left_snr_db": _snr(np.asarray(nl), np.asarray(l_rx)),
            "nicam_right_snr_db": _snr(np.asarray(nr_), np.asarray(r_rx)),
        }

    if special == "sat-sound":
        from color_modem_tpu.frame import satellite as sat

        sp = sat.make_sat_plan(plan.fs, 720, audio_subs=2)
        n_tot = lines * 720

        def bin_tone(f, amp):
            k = max(1, round(f * n_tot / plan.fs))
            tt = np.arange(n_tot) / plan.fs
            return amp * np.sin(2 * np.pi * (k * plan.fs / n_tot) * tt)

        a = np.broadcast_to(
            np.stack([bin_tone(1000.0, 0.6), bin_tone(3000.0, 0.5)]),
            (batch, 2, n_tot),
        ).astype(np.float32)
        aj = jnp.asarray(a)

        def hop(c):
            rf = sat.fm_modulate(sp, c, audio=aj)
            return sat.fm_demodulate(sp, rf), sat.fm_demodulate_audio(sp, rf)

        hop_j = jax.jit(hop)
        best = _best(measure, hop_j, comp, iters=max(8, iters // 4))
        out, aud = hop_j(comp)
        q = float(psnr(np.asarray(out), np.asarray(comp)))
        aud = np.asarray(aud)
        return {
            "standard": "ntsc", "decoder": "satellite-hop+audio-ladder",
            "backend": "xla", "shape": [batch, lines, 720],
            "subcarriers_mhz": [round(f / 1e6, 2) for f in sp.sub_freqs],
            "mpix_per_s": round(pixels / best / 1e6, 1) if best else None,
            "roundtrip_psnr_db": round(q, 2),  # composite transparency
            "audio_snr_db": [
                _snr(a[0, j], aud[0, j]) for j in range(2)
            ],
        }

    raise SystemExit(f"unknown row {special!r}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--row", required=True, choices=["rf-sound", "sat-sound"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    row = run_row(a.row, a.batch, a.iters)
    row["device"] = jax.default_backend()
    row["device_kind"] = jax.devices()[0].device_kind
    print(json.dumps(row), flush=True)
