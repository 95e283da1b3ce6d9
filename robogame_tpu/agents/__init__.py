"""Team strategies: classical state machine, centralized MPC team,
decentralized MPC team (the reference's L5 layer,
/root/reference/py/src/{ClassicalPlayer,ClassicalTeam,CentralizedPlayers,
CentralizedTeam,DMPCPlayer,DMPCTeam}.py)."""

from .classical import (ClassicalPlayer, ClassicalTeam, TeamState,
                        initial_team_state, team_policy)
from .centralized import BaselineCentralizedPlayers, CentralizedTeam
from .dmpc_team import DMPCPlayer, DMPCTeam

__all__ = [
    "ClassicalPlayer", "ClassicalTeam", "TeamState",
    "initial_team_state", "team_policy",
    "BaselineCentralizedPlayers", "CentralizedTeam",
    "DMPCPlayer", "DMPCTeam",
]
