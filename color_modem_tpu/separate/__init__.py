"""Chroma/luma separation variants and decoder post-processing (K4/K5/K13).

The reference implements these as stateful wrapper classes
(``SimpleCombModem``, ``Simple3DCombModem``, ``ColorAveragingModem`` — C6
[MEM-M]); here each variant is a pure stencil on the ``(..., L, N)`` block.
"""

from color_modem_tpu.separate.comb import separate  # noqa: F401
from color_modem_tpu.separate.delayline import average_with_neighbor  # noqa: F401
from color_modem_tpu.separate.stencil import next_reflect, prev_reflect  # noqa: F401
