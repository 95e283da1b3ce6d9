"""End-to-end bounce kick: contact planner -> kick trajectory -> elastic
collision in the sim -> wall bank -> goal.

Reproduces the reference's flagship demonstration
(/root/reference/videos/bounce_kick_up.mp4; ClassicalPlayer.bounce_kick)
including the intentional controller/sim puck-model mismatch (controller
decay 1/tau vs sim 0.2/tau) -- the bank shot still scores because the
mismatch shortens, not redirects, the flight."""

import numpy as np
import pytest

from robogame_tpu import GameSim, SimParams, SimStateView
from robogame_tpu.agents.classical import ClassicalPlayer


@pytest.mark.parametrize("wall", ["up", "down"])
def test_bounce_kick_scores(wall):
    params = SimParams(dt=0.05, winning_score=1, tau_puck=1.0,
                       engine="sweep", dtype="float64")
    sim = GameSim(params)
    vec = sim.reset(dt=0.05, winning_score=1, tau_puck=1.0,
                    x0_ball=[-1.0, 0.0, 0.0, 0.0])
    player = ClassicalPlayer(params, -1, "A", 2)
    assert player.bounce_kick(SimStateView(vec), wall)

    z = np.zeros(2)
    puck_ys = []
    for k in range(120):
        u, _ = player.get_control()
        vec = sim.run(z, u, z, z)
        puck_ys.append(float(vec[3]))
        if vec[0] >= 1:
            break
    assert vec[0] >= 1, f"no goal within 6 s (wall={wall})"
    # the puck actually banked: it reached near the chosen wall
    sgn = 1.0 if wall == "up" else -1.0
    assert max(sgn * y for y in puck_ys) > 1.5, "puck never neared the wall"
