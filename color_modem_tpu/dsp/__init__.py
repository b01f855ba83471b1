"""DSP layer: config-time FIR design (NumPy) + on-device application (jnp),
closed-form subcarrier NCO, colorimetry.  SURVEY.md §1 L1/L0 rebuilt."""

from color_modem_tpu.dsp import apply, colorimetry, design, nco  # noqa: F401
