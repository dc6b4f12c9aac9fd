#!/usr/bin/env python
"""Batch prediction server/scorer — repo-layout shim.

The implementation lives in the installable package
(``dgps_with_iwvi_tpu/experiments/serve.py``, console script ``dgp-serve``);
this file keeps ``python experiments/serve.py ...`` working.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgps_with_iwvi_tpu.experiments.serve import (  # noqa: F401
    main, parse_args, run)

if __name__ == "__main__":
    main()
