"""Reference-compatible per-line API (SURVEY.md §1 L2/L3/L4 protocol)."""

from color_modem_tpu.compat.line_api import (  # noqa: F401
    ColorAveragingModem,
    DelayLinePalModem,
    ImageModem,
    NiirModem,
    NtscModem,
    PalModem,
    SecamModem,
    Simple3DCombModem,
    SimpleCombModem,
    make_line_modem,
)
