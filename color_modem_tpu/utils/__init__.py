"""Shared utilities: metrics, test images, result logging."""

from color_modem_tpu.utils.metrics import mse, psnr, psnr_jnp  # noqa: F401
