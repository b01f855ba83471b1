"""Driver benchmark entry — prints ONE JSON line.

The implementation lives in :mod:`color_modem_tpu.benchmark` so the same
protocol is also reachable as ``python -m color_modem_tpu.cli bench``
(SURVEY.md §5.6); this root script is the surface the round driver runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from color_modem_tpu.benchmark import main

if __name__ == "__main__":
    main()
