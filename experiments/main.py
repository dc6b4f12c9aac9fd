#!/usr/bin/env python
"""UCI regression experiment runner — repo-layout shim.

The harness lives in the installable package
(``dgps_with_iwvi_tpu/experiments/main.py``, console script ``dgp-train``);
this file keeps the reference's repo layout (ref:experiments/main.py)
working: ``python experiments/main.py ...``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgps_with_iwvi_tpu.experiments.main import (  # noqa: F401
    main, parse_args, run)

if __name__ == "__main__":
    main()
