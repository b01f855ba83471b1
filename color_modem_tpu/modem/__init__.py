"""Line modems as pure array functions (SURVEY.md §1 L2 rebuilt)."""

from color_modem_tpu.modem import niir, qam, secam  # noqa: F401
from color_modem_tpu.modem.plan import ModemPlan, make_plan  # noqa: F401
