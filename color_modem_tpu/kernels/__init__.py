"""Pallas TPU kernels for the hot paths (SURVEY.md §2.3 P1-P4).

The reference has zero native components (100% Python/NumPy [MEM-H]); the
TPU-native "native layer" here is Mosaic/Pallas.  Mapping to the survey's
kernel inventory:

* P1 fused band-split FIR  -> qam.encode_lines / qam.decode_lines matmuls
* P2 comb/line-delay stencil -> stencil stays in XLA (one elementwise pass;
  its halo exchange lives in parallel/halo.py), BPF+demod fused here
* P3 SECAM FM mod + discriminator -> secam.encode / secam.demodulate_lines
* P4 QAM mix + matrix epilogue -> fused into the P1 kernels

Every kernel has a pure-jnp twin in modem/ (tested, §4.3) and runs in
interpreter mode off-TPU.
"""

from color_modem_tpu.kernels import qam, secam  # noqa: F401
from color_modem_tpu.kernels.common import should_interpret  # noqa: F401
