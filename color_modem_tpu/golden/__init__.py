"""FROZEN golden oracle — NumPy per-scanline reference (SURVEY.md §4.2).

Stands in for the unreadable reference repo (empty mount, SURVEY.md §0).
No JAX imports allowed anywhere in this package.
"""

from color_modem_tpu.golden.frame import (  # noqa: F401
    FM_DECODERS,
    QAM_DECODERS,
    allowed_decoders,
    comb_spacing,
    decode_frame,
    decode_sequence,
    encode_frame,
)
from color_modem_tpu.golden.modems import (  # noqa: F401
    GoldenQamModem,
    GoldenSecamModem,
)
