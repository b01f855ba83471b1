"""Test configuration: force CPU with 8 virtual devices (SURVEY.md §4.3).

The driver runs ``python -m pytest tests/ -x -q`` in an environment where the
axon sitecustomize pins JAX_PLATFORMS=axon (one real TPU).  Tests must run on
the fake multi-device CPU instead — both for speed and to exercise pod
semantics without a pod — so we override the platform *before any backend
initializes* and request 8 host devices.

TPU-marked tests (backend parity) run only when the tpu backend is reachable
AND tests are invoked with ``-m tpu`` explicitly; the default run never
touches the chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# §5.2 sanitizer: fail any test whose pipeline produces NaN/Inf, loudly,
# at the op that produced it (the functional analog of a memory sanitizer)
jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from color_modem_tpu.modem.plan import make_plan  # noqa: E402
from color_modem_tpu.standards import ALL_STANDARDS, NIIR, NTSC, PAL, SECAM  # noqa: E402

# Small-but-representative geometry: full 720-sample lines (the filters and
# fs depend on width), reduced line count for speed.
TEST_LINES = 64
TEST_SAMPLES = 720

_FACTORIES = dict(ALL_STANDARDS)
_PLAN_CACHE = {}


def get_plan(name: str):
    if name not in _PLAN_CACHE:
        _PLAN_CACHE[name] = make_plan(_FACTORIES[name](), TEST_SAMPLES)
    return _PLAN_CACHE[name]


@pytest.fixture(scope="session")
def scene():
    from color_modem_tpu.utils.testimages import smooth_scene

    return smooth_scene(TEST_LINES, TEST_SAMPLES, seed=1).astype(np.float32)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs the real TPU chip")
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running (still in default run)"
    )


def pytest_collection_modifyitems(config, items):
    # any mark expression mentioning tpu counts as explicit selection
    # (exact string equality would silently re-skip '-m "tpu and not slow"')
    if "tpu" in (config.getoption("-m", default="") or ""):
        return
    skip = pytest.mark.skip(reason="tpu tests run only with -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
