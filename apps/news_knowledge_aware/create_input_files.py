#!/usr/bin/env python
"""create_input_files.py for the nytimes800k preset (reference surface: see apps/common.py)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import run_create_input_files

if __name__ == "__main__":
    run_create_input_files("nytimes800k")
