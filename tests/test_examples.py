"""Smoke tests for the experiment-harness examples (tiny workloads).

The examples are the reference's L6 entry points; these tests protect
their wiring (imports, argument plumbing, log emission) without paying
full-scale compile costs."""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(ROOT, "examples")
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS=os.environ.get("XLA_FLAGS", ""))


def _run(script, *args, timeout=420):
    return subprocess.run(
        [sys.executable, os.path.join(EX, script), *args],
        capture_output=True, text=True, timeout=timeout, env=ENV,
        cwd=ROOT)


def test_run_collisions_demo(tmp_path):
    log = str(tmp_path / "coll.log")
    r = _run("run_collisions.py", "--log", log, "--cpu")
    assert r.returncode == 0, r.stderr[-800:]
    from robogame_tpu.utils.gamelog import read_log
    assert read_log(log).shape == (200, 29)


def test_mc_example_smoke(tmp_path):
    out = str(tmp_path / "mc")
    r = _run("mc_example_1.py", "--runs", "2", "--T", "0.5",
             "--out", out, "--cpu")
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(os.path.join(out, "configuration.txt"))
    assert os.path.exists(os.path.join(out, "mc_run_1.log"))
    assert "aggregate:" in r.stdout


def test_mc_scaling_smoke():
    r = _run("mc_scaling.py", "--virtual", "2", "--games-per-device",
             "8", "--steps", "5")
    assert r.returncode == 0, r.stderr[-800:]
    assert "scaling_eff" in r.stdout
