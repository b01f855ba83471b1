"""DSP layer: config-time FIR design (NumPy) + on-device application (jnp),
closed-form subcarrier NCO, horizontal resampling, colorimetry.
SURVEY.md §1 L1/L0 rebuilt."""

from color_modem_tpu.dsp import (  # noqa: F401
    apply,
    colorimetry,
    design,
    nco,
    resample,
)
