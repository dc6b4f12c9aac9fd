#!/usr/bin/env python
"""Batch experiment driver — repo-layout shim.

The implementation lives in the installable package
(``dgps_with_iwvi_tpu/experiments/run_suite.py``, console script
``dgp-suite``); this file keeps ``python experiments/run_suite.py ...``
working.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgps_with_iwvi_tpu.experiments.run_suite import (  # noqa: F401
    main, parse_args)

if __name__ == "__main__":
    main()
