"""Dev-mode sanitizer hooks (SURVEY.md §5.2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import TEST_LINES, TEST_SAMPLES, get_plan

from color_modem_tpu.frame.pipeline import make_pipeline
from color_modem_tpu.utils.debug import checked
from color_modem_tpu.utils.testimages import smooth_scene


def test_checked_passes_clean_pipeline():
    plan = get_plan("secam")  # the division-heavy discriminator path
    _, _, rt = make_pipeline(plan, "notch")
    rgb = jnp.asarray(smooth_scene(TEST_LINES, TEST_SAMPLES, seed=7)[None])
    out = checked(rt)(rgb, 0)
    assert np.isfinite(np.asarray(out)).all()


def test_checked_catches_float_errors():
    def bad(x):
        return x / (x - x)  # 0/0 -> NaN

    with pytest.raises(Exception, match="nan|division"):
        checked(jax.jit(bad))(jnp.ones((4, 4)))