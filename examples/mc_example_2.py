#!/usr/bin/env python
"""Monte-Carlo sweep WITHOUT the CBF filter
(equivalent of /root/reference/py/mc_example_2.py).

Thin wrapper: mc_example_1 with --no-cbf."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.argv.append("--no-cbf")

from mc_example_1 import main  # noqa: E402

if __name__ == "__main__":
    main()
