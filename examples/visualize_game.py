#!/usr/bin/env python
"""Animate a binary game log (equivalent of
/root/reference/matlab/visualize_game.m, in Python/matplotlib; the logs
are also byte-compatible with the original MATLAB readers).

Usage: python examples/visualize_game.py minimal_game.log [--save out.gif]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from robogame_tpu import SimParams
from robogame_tpu.utils.visualize import animate_log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", nargs="?", default="minimal_game.log")
    ap.add_argument("--save", default=None,
                    help="write .gif (pillow) or .mp4 (ffmpeg)")
    ap.add_argument("--fps", type=float, default=20.0)
    ap.add_argument("--no-show", action="store_true")
    args = ap.parse_args()
    animate_log(args.log, SimParams(), fps=args.fps, save=args.save,
                show=not args.no_show)


if __name__ == "__main__":
    main()
