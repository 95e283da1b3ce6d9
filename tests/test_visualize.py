"""Headless tests for the visualization layer (the MATLAB-equivalent)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from robogame_tpu.config import SimParams
from robogame_tpu.utils.gamelog import GameLogWriter, rows_from_states
from robogame_tpu.utils.visualize import (animate_log, interpret_mc_results,
                                          load_mc_results)


def _write_fake_log(path, n=40):
    t = np.arange(n) * 0.05
    scores = np.zeros((n, 2))
    scores[n // 2:, 0] = 1
    pos = np.zeros((n, 5, 2))
    pos[:, 0, 0] = np.linspace(-4, 4, n)        # puck crosses the arena
    pos[:, 1:, 0] = np.linspace(-2, 2, n)[:, None]
    dmg = np.zeros((n, 4, 4))
    rows = rows_from_states(t, scores, pos, dmg)
    with GameLogWriter(path, native=False) as w:
        w.write_rows(rows)


def test_animate_log_renders_gif(tmp_path):
    log = str(tmp_path / "g.log")
    _write_fake_log(log)
    out = str(tmp_path / "g.gif")
    animate_log(log, SimParams(), fps=10, save=out, show=False)
    assert np.fromfile(out, dtype=np.uint8).size > 1000


def test_interpret_mc_results(tmp_path):
    d = tmp_path / "mc"
    d.mkdir()
    (d / "configuration.txt").write_text(
        "\n".join(str(v) for v in
                  [2, 2.0, 0.05, 3, 0, 0, 0, 0, 0, 0.1, 0.5, 1.0, 0.5]))
    for i in (1, 2):
        _write_fake_log(str(d / f"mc_run_{i}.log"))
    cfg, scores, dmg = interpret_mc_results(
        str(d), save=str(tmp_path / "h.png"), show=False)
    assert cfg["num_runs"] == 2
    assert scores.shape == (2, 2)
    assert (tmp_path / "h.png").exists()


def test_animate_mc_run(tmp_path):
    from robogame_tpu.utils.visualize import animate_mc_run
    d = tmp_path / "mc"
    d.mkdir()
    (d / "configuration.txt").write_text(
        "\n".join(str(v) for v in
                  [1, 2.0, 0.05, 3, 0, 0, 0, 0, 0, 0.1, 0.5, 1.0, 0.5]))
    _write_fake_log(str(d / "mc_run_1.log"))
    out = str(tmp_path / "run1.gif")
    animate_mc_run(str(d), 1, fps=10, save=out, show=False)
    assert np.fromfile(out, dtype=np.uint8).size > 1000
