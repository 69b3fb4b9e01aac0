#!/usr/bin/env python
"""serve.py for the k_georic preset (no reference counterpart; see apps/common.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run_serve

if __name__ == "__main__":
    run_serve("k_georic")
