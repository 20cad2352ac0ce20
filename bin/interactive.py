#!/usr/bin/env python
"""Reference-shaped CLI wrapper (reference bin/interactive.py); the
implementation lives in mpe_tpu.interactive_cli."""

import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from mpe_tpu.interactive_cli import main

if __name__ == "__main__":
    main()
