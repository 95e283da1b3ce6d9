"""Binary game logs in the reference's exact on-disk format.

The reference Logger appends raw doubles (/root/reference/include/utils.h:45-79),
29 per control step: ``t, scoreA, scoreB`` then positions (2 each) of
puck, A1, A2, B1, B2, then the 4x4 damage matrix as 4 rows
(/root/reference/src/GameSim.cpp:160-170).  Files written here are
byte-compatible, so the reference's MATLAB readers
(/root/reference/matlab/visualize_game.m:22) work unchanged.

Note a reference quirk kept for compatibility: ``logVectors`` emits
``damage.row(k)`` from the raw data pointer of a row expression of a
column-major matrix, which actually writes matrix *columns*
(/root/reference/include/utils.h:72-76).  Damage is symmetric under equal
player masses, and we emit columns likewise (i.e. ``damage.T`` rows).
"""

from __future__ import annotations

import numpy as np

RECORD_FIELDS = 29


class GameLogWriter:
    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write_row(self, row: np.ndarray):
        np.asarray(row, dtype="<f8").reshape(-1).tofile(self._f)

    def write_rows(self, rows: np.ndarray):
        np.asarray(rows, dtype="<f8").tofile(self._f)

    def close(self):
        if not self._f.closed:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_log(path: str, fields: int = RECORD_FIELDS) -> np.ndarray:
    """Read a binary log into an (n_steps, fields) float64 array."""
    data = np.fromfile(path, dtype="<f8")
    n = data.size // fields
    return data[:n * fields].reshape(n, fields)


def rows_from_states(ts, scores, positions, damages) -> np.ndarray:
    """Build (T, 29) rows from trajectory arrays.

    positions: (T, 5, 2) in log order [puck, A1, A2, B1, B2];
    damages: (T, 4, 4).  Damage is transposed to match the reference's
    column-emission quirk.
    """
    T = np.shape(ts)[0]
    out = np.empty((T, RECORD_FIELDS), dtype=np.float64)
    out[:, 0] = np.asarray(ts, dtype=np.float64)
    out[:, 1:3] = np.asarray(scores, dtype=np.float64).reshape(T, 2)
    out[:, 3:13] = np.asarray(positions, dtype=np.float64).reshape(T, 10)
    dm = np.asarray(damages, dtype=np.float64).reshape(T, 4, 4)
    out[:, 13:29] = np.transpose(dm, (0, 2, 1)).reshape(T, 16)
    return out


def write_trajectory_log(path: str, recs) -> None:
    """Write a stacked LogRecord trajectory (from scripted_rollout) to disk."""
    rows = rows_from_states(np.asarray(recs.t), np.asarray(recs.score),
                            np.asarray(recs.positions),
                            np.asarray(recs.damage))
    with GameLogWriter(path) as w:
        w.write_rows(rows)
