#!/usr/bin/env python
"""compute_eval_metrics.py for the georic preset (reference surface: see apps/common.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run_compute_eval_metrics

if __name__ == "__main__":
    run_compute_eval_metrics("georic")
