"""Backend parity: real-TPU output vs CPU-jax output (SURVEY.md §4.3).

Runs only with ``pytest -m tpu`` on a machine with the chip attached.  The
test process itself is pinned to CPU by conftest, so the TPU half runs in a
fresh subprocess (which inherits the environment's default TPU platform) and
ships its outputs back through a temp file.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import TEST_LINES, TEST_SAMPLES, get_plan

from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.utils.testimages import smooth_scene

CASES = [("ntsc", "comb3", "pallas"), ("ntsc", "comb3", "xla"),
         ("secam", "notch", "pallas"), ("pal", "delayline", "pallas"),
         ("ntsc", "comb3d", "pallas"),
         ("ntsc", "combA", "xla"), ("ntsc", "comb3dA", "xla")]

_SCRIPT = """
import sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import ALL_STANDARDS
assert jax.default_backend() != "cpu", jax.default_backend()
rgb = np.load(sys.argv[1])
outs = {{}}
for name, decoder, backend in {cases!r}:
    plan = make_plan(ALL_STANDARDS[name](), rgb.shape[-1])
    enc, dec, _ = make_pipeline(plan, decoder, backend)
    comp = enc(jnp.asarray(rgb), 0)
    outs[f"{{name}}-{{decoder}}-{{backend}}-comp"] = np.asarray(comp)
    outs[f"{{name}}-{{decoder}}-{{backend}}-rgb"] = np.asarray(dec(comp, 0))
np.savez(sys.argv[2], **outs)
"""


_FEATURE_SCRIPT = """
import sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from color_modem_tpu.frame.pipeline import make_pipeline, frame_line_index
from color_modem_tpu.frame.channel import impair
from color_modem_tpu.frame.equalize import (apply_equalizer,
                                            design_equalizer, gcr_record)
from color_modem_tpu.frame.interlace import make_interlaced_pipeline
from color_modem_tpu.frame.raster import make_raster
from color_modem_tpu.frame.timebase import impair_timebase, tbc_correct
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import NTSC
assert jax.default_backend() != "cpu", jax.default_backend()
rgb = jnp.asarray(np.load(sys.argv[1]))
plan = make_plan(NTSC(), rgb.shape[-1])
outs = {{}}
# ghost -> GCR equalize
enc, dec, _ = make_pipeline(plan, "comb3")
comp = enc(rgb, 0)
ghosted = impair(plan, comp, ghost_delay_us=1.2, ghost_gain=0.3)
rec = impair(plan, jnp.asarray(gcr_record(plan))[None],
             ghost_delay_us=1.2, ghost_gain=0.3)[0]
eq = apply_equalizer(ghosted, design_equalizer(plan, rec))
outs["equalized"] = np.asarray(dec(eq, 0))
# TBE -> TBC
encr, decr, _ = make_pipeline(plan, "comb3", raster=True)
rastered = encr(rgb, 0)
shifted, _ = impair_timebase(plan, rastered, wobble_us=0.3)
g = frame_line_index(plan, 0, rgb.shape[0], rgb.shape[-2])
outs["tbc"] = np.asarray(decr(tbc_correct(plan, make_raster(plan),
                                          shifted, g), 0))
# interlaced temporal comb
_, _, rt = make_interlaced_pipeline(plan, "comb3d")
outs["interlaced3d"] = np.asarray(rt(rgb, 0))
np.savez(sys.argv[2], **outs)
"""



def _tpu_env():
    """Subprocess env for the TPU half: drop conftest's CPU pin and strip
    only its forced-device-count flag, keeping any other XLA_FLAGS, so the
    machine's default TPU platform registers."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform" not in f]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    return env


@pytest.mark.tpu
def test_tpu_receiver_dsp_matches_cpu(tmp_path):
    """New receiver-DSP chains on the chip vs CPU: GCR equalization
    (pow2 stream FFT), TBC (rdft matmuls), interlaced temporal comb."""
    from color_modem_tpu.frame.channel import impair
    from color_modem_tpu.frame.equalize import (
        apply_equalizer,
        design_equalizer,
        gcr_record,
    )
    from color_modem_tpu.frame.interlace import make_interlaced_pipeline
    from color_modem_tpu.frame.pipeline import frame_line_index
    from color_modem_tpu.frame.raster import make_raster
    from color_modem_tpu.frame.timebase import impair_timebase, tbc_correct

    rgb = np.stack([
        smooth_scene(TEST_LINES, TEST_SAMPLES, seed=9),
        smooth_scene(TEST_LINES, TEST_SAMPLES, seed=10),
    ]).astype(np.float32)
    rgb_p, out_p = tmp_path / "rgb.npy", tmp_path / "tpu.npz"
    np.save(rgb_p, rgb)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _tpu_env()
    subprocess.run(
        [sys.executable, "-c", _FEATURE_SCRIPT.format(repo=repo),
         str(rgb_p), str(out_p)],
        check=True, env=env, timeout=1800,
    )
    tpu = np.load(out_p)
    plan = get_plan("ntsc")
    rgb_j = jnp.asarray(rgb)
    enc, dec, _ = make_pipeline(plan, "comb3")
    comp = enc(rgb_j, 0)
    ghosted = impair(plan, comp, ghost_delay_us=1.2, ghost_gain=0.3)
    rec = impair(plan, jnp.asarray(gcr_record(plan))[None],
                 ghost_delay_us=1.2, ghost_gain=0.3)[0]
    eq = apply_equalizer(ghosted, design_equalizer(plan, rec))
    np.testing.assert_allclose(
        tpu["equalized"], np.asarray(dec(eq, 0)), atol=2e-3,
        err_msg="equalized")
    encr, decr, _ = make_pipeline(plan, "comb3", raster=True)
    shifted, _ = impair_timebase(plan, encr(rgb_j, 0), wobble_us=0.3)
    g = frame_line_index(plan, 0, rgb.shape[0], rgb.shape[-2])
    fixed = decr(tbc_correct(plan, make_raster(plan), shifted, g), 0)
    np.testing.assert_allclose(
        tpu["tbc"], np.asarray(fixed), atol=2e-3, err_msg="tbc")
    _, _, rt = make_interlaced_pipeline(plan, "comb3d")
    np.testing.assert_allclose(
        tpu["interlaced3d"], np.asarray(rt(rgb_j, 0)), atol=2e-3,
        err_msg="interlaced3d")


@pytest.mark.tpu
def test_tpu_matches_cpu(tmp_path):
    # two frames: the comb3d case needs a frame axis to comb along
    rgb = np.stack([
        smooth_scene(TEST_LINES, TEST_SAMPLES, seed=9),
        smooth_scene(TEST_LINES, TEST_SAMPLES, seed=10),
    ]).astype(np.float32)
    rgb_p = tmp_path / "rgb.npy"
    out_p = tmp_path / "tpu.npz"
    np.save(rgb_p, rgb)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _tpu_env()
    subprocess.run(
        [sys.executable, "-c",
         _SCRIPT.format(repo=repo, cases=CASES), str(rgb_p), str(out_p)],
        check=True, env=env, timeout=1200,
    )
    tpu = np.load(out_p)
    for name, decoder, backend in CASES:
        plan = get_plan(name)
        enc, dec, _ = make_pipeline(plan, decoder, backend)
        comp = enc(jnp.asarray(rgb), 0)
        np.testing.assert_allclose(
            tpu[f"{name}-{decoder}-{backend}-comp"], np.asarray(comp),
            atol=2e-4, err_msg=f"{name}-{decoder}-{backend} composite",
        )
        err = np.abs(
            tpu[f"{name}-{decoder}-{backend}-rgb"] - np.asarray(dec(comp, 0))
        )
        if decoder in ("combA", "comb3dA"):
            # the adaptive soft switch is fp-sensitive exactly where the
            # complement energies tie: isolated samples may pick slightly
            # different blends on TPU (measured 0.013% of samples, <=0.02)
            frac = float((err > 2e-3).mean())
            assert frac < 1e-3 and err.max() < 0.05, (
                f"{name}-{decoder}-{backend} rgb: {frac:.5f} outliers, "
                f"max {err.max():.4f}")
        else:
            assert err.max() < 2e-3, (
                f"{name}-{decoder}-{backend} rgb: max {err.max():.5f}")


_TRANSMISSION_SCRIPT = """
import sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.frame.rf import make_rf_plan, rf_roundtrip
from color_modem_tpu.frame import satellite as sat
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import NTSC
assert jax.default_backend() != "cpu", jax.default_backend()
rgb = jnp.asarray(np.load(sys.argv[1]))
plan = make_plan(NTSC(), rgb.shape[-1])
enc, _, _ = make_pipeline(plan, "notch")
comp = enc(rgb, 0)
rfp = make_rf_plan(plan)
sp = sat.make_sat_plan(plan.fs, rgb.shape[-1])
outs = {{
    "comp": np.asarray(comp),
    "rf": np.asarray(jax.jit(lambda c: rf_roundtrip(rfp, c, 0))(comp)),
    "sat": np.asarray(jax.jit(
        lambda c: sat.fm_demodulate(sp, sat.fm_modulate(sp, c)))(comp)),
}}
np.savez(sys.argv[2], **outs)
"""


@pytest.mark.tpu
def test_tpu_transmission_matches_cpu(tmp_path):
    """Round-3 transmission layers on the chip vs CPU: the composed
    complex-FIR VSB hop and the satellite FM hop (overlap-save stream
    engine, frequency-domain rate changes).  Bound 4e-3: the TPU FFT's
    twiddle precision differs from CPU's through 2-3 stream transforms
    plus the FM discriminator's phase sensitivity."""
    from color_modem_tpu.frame import satellite as sat
    from color_modem_tpu.frame.rf import make_rf_plan, rf_roundtrip

    rgb = np.stack([
        smooth_scene(TEST_LINES, TEST_SAMPLES, seed=9),
        smooth_scene(TEST_LINES, TEST_SAMPLES, seed=10),
    ]).astype(np.float32)
    rgb_p, out_p = tmp_path / "rgb.npy", tmp_path / "tpu.npz"
    np.save(rgb_p, rgb)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _tpu_env()
    subprocess.run(
        [sys.executable, "-c", _TRANSMISSION_SCRIPT.format(repo=repo),
         str(rgb_p), str(out_p)],
        check=True, env=env, timeout=1800,
    )
    tpu = np.load(out_p)
    plan = get_plan("ntsc")
    enc, _, _ = make_pipeline(plan, "notch")
    comp = enc(jnp.asarray(rgb), 0)
    np.testing.assert_allclose(tpu["comp"], np.asarray(comp), atol=2e-4,
                               err_msg="composite")
    rfp = make_rf_plan(plan)
    want_rf = np.asarray(rf_roundtrip(rfp, comp, 0))
    np.testing.assert_allclose(tpu["rf"], want_rf, atol=4e-3, err_msg="rf")
    sp = sat.make_sat_plan(plan.fs, rgb.shape[-1])
    want_sat = np.asarray(sat.fm_demodulate(sp, sat.fm_modulate(sp, comp)))
    np.testing.assert_allclose(tpu["sat"], want_sat, atol=4e-3,
                               err_msg="satellite")


_SOUND_SCRIPT = """
import sys, numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, {repo!r})
from color_modem_tpu.frame import a2, mts, nicam, rf
from color_modem_tpu.modem.plan import make_plan
from color_modem_tpu.standards import ALL_STANDARDS
assert jax.default_backend() != "cpu", jax.default_backend()
L, W = {lines!r}, {samples!r}
plan = make_plan(ALL_STANDARDS["pal"](), W)
rfp = rf.make_rf_plan(plan)
rf0 = jnp.zeros((1, L, rfp.n_rf), jnp.float32)
cap = nicam.nicam_capacity(rfp, (1, L, rfp.n_rf))
na = nicam.BLOCK * cap
ta = np.arange(na) / 32000.0
nl = (0.6 * np.sin(2 * np.pi * 440 * ta)).astype(np.float32)
nr = (0.5 * np.sin(2 * np.pi * 880 * ta)).astype(np.float32)
sig = nicam.nicam_on_rf(rfp, rf0, nl, nr)
gl, gr, rep, lock = nicam.nicam_from_rf(rfp, sig, cap)
a2p = a2.make_a2_plan(rfp)
t = np.arange(L * W) / plan.fs
audL = (0.6 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)[None]
audR = (0.5 * np.sin(2 * np.pi * 2300 * t)).astype(np.float32)[None]
# carrier 1 must actually transmit (the mono sum on a blanking-level
# picture) — discriminating a DEAD carrier sprays noise by design
comp0 = jnp.zeros((1, L, W), jnp.float32)
base = rf.rf_modulate(rfp, comp0, 3, jnp.asarray(0.5 * (audL + audR)))
sig2 = a2.a2_on_rf(a2p, base, 3, jnp.asarray(audR), "stereo")
l2, r2, info = a2.a2_decode(a2p, sig2, 3)
ml = (0.7 * np.sin(2 * np.pi * 900 * t)).astype(np.float32)[None]
mr = (0.5 * np.sin(2 * np.pi * 2400 * t)).astype(np.float32)[None]
menc = mts.mts_encode(plan, jnp.asarray(ml), jnp.asarray(mr))
dl, dr, pil = mts.mts_decode(plan, menc)
np.savez(
    sys.argv[1],
    nicam_l=np.asarray(gl), nicam_r=np.asarray(gr),
    nicam_parity=np.asarray(rep["parity_errors"]),
    a2_l=np.asarray(l2), a2_r=np.asarray(r2),
    a2_stereo=np.int32(info["mode"][0] == "stereo"),
    mts_enc=np.asarray(menc), mts_l=np.asarray(dl), mts_r=np.asarray(dr),
    mts_pilot=np.asarray(pil),
)
"""


@pytest.mark.tpu
def test_tpu_sound_matches_cpu(tmp_path):
    """Round-4 sound subsystems on the chip vs CPU: NICAM's real-i/q
    DQPSK passband, A2's jitted takeoff/detect core and the MTS
    multiplex — the paths made chip-safe in round 4 (self-jitting
    entry points around the relay's eager-complex limitation).  NICAM
    must be bit-transparent on BOTH backends (audio equal to the shared
    companding floor); the analog audio chains match to the usual
    TPU-vs-CPU FFT-twiddle bound."""
    from color_modem_tpu.frame import a2, mts, nicam, rf

    out_p = tmp_path / "tpu.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, "-c", _SOUND_SCRIPT.format(
            repo=repo, lines=TEST_LINES, samples=TEST_SAMPLES),
         str(out_p)],
        check=True, env=_tpu_env(), timeout=1800,
    )
    tpu = np.load(out_p)
    plan = get_plan("pal")
    rfp = rf.make_rf_plan(plan)
    rf0 = jnp.zeros((1, TEST_LINES, rfp.n_rf), jnp.float32)
    cap = nicam.nicam_capacity(rfp, (1, TEST_LINES, rfp.n_rf))
    na = nicam.BLOCK * cap
    ta = np.arange(na) / 32000.0
    nl = (0.6 * np.sin(2 * np.pi * 440 * ta)).astype(np.float32)
    nr = (0.5 * np.sin(2 * np.pi * 880 * ta)).astype(np.float32)
    sig = nicam.nicam_on_rf(rfp, rf0, nl, nr)
    gl, gr, rep, _ = nicam.nicam_from_rf(rfp, sig, cap)
    assert int(np.asarray(tpu["nicam_parity"]).sum()) == 0
    assert int(np.asarray(rep["parity_errors"]).sum()) == 0
    # bit-transparent on both backends -> decoded audio identical to the
    # (shared) companding quantization, i.e. essentially equal
    np.testing.assert_allclose(tpu["nicam_l"], np.asarray(gl), atol=1e-5)
    np.testing.assert_allclose(tpu["nicam_r"], np.asarray(gr), atol=1e-5)
    a2p = a2.make_a2_plan(rfp)
    t = np.arange(TEST_LINES * TEST_SAMPLES) / plan.fs
    audL = (0.6 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)[None]
    audR = (0.5 * np.sin(2 * np.pi * 2300 * t)).astype(np.float32)[None]
    comp0 = jnp.zeros((1, TEST_LINES, TEST_SAMPLES), jnp.float32)
    base = rf.rf_modulate(rfp, comp0, 3, jnp.asarray(0.5 * (audL + audR)))
    sig2 = a2.a2_on_rf(a2p, base, 3, jnp.asarray(audR), "stereo")
    l2, r2, info = a2.a2_decode(a2p, sig2, 3)
    assert int(tpu["a2_stereo"]) == 1 and info["mode"] == ["stereo"]
    np.testing.assert_allclose(tpu["a2_l"], np.asarray(l2), atol=4e-3,
                               err_msg="a2 left")
    np.testing.assert_allclose(tpu["a2_r"], np.asarray(r2), atol=4e-3,
                               err_msg="a2 right")
    ml = (0.7 * np.sin(2 * np.pi * 900 * t)).astype(np.float32)[None]
    mr = (0.5 * np.sin(2 * np.pi * 2400 * t)).astype(np.float32)[None]
    menc = mts.mts_encode(plan, jnp.asarray(ml), jnp.asarray(mr))
    dl, dr, pil = mts.mts_decode(plan, menc)
    np.testing.assert_allclose(tpu["mts_enc"], np.asarray(menc), atol=2e-4)
    np.testing.assert_allclose(tpu["mts_l"], np.asarray(dl), atol=2e-3)
    np.testing.assert_allclose(tpu["mts_r"], np.asarray(dr), atol=2e-3)
    np.testing.assert_allclose(tpu["mts_pilot"], np.asarray(pil), atol=1e-4)
