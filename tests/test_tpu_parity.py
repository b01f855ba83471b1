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
         ("ntsc", "comb3d", "pallas")]

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
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the machine's default TPU register
    # strip only conftest's forced-device-count flag, keep any other flags
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform" not in f]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
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
        np.testing.assert_allclose(
            tpu[f"{name}-{decoder}-{backend}-rgb"], np.asarray(dec(comp, 0)),
            atol=2e-3, err_msg=f"{name}-{decoder}-{backend} rgb",
        )
