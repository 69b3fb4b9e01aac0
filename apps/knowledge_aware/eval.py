#!/usr/bin/env python
"""eval.py for the k_georic preset (reference surface: see apps/common.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run_eval

if __name__ == "__main__":
    run_eval("k_georic")
