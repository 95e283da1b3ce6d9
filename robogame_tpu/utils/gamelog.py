"""Binary game logs in the reference's exact on-disk format.

The reference Logger appends raw doubles (/root/reference/include/utils.h:45-79),
29 per control step: ``t, scoreA, scoreB`` then positions (2 each) of
puck, A1, A2, B1, B2, then the 4x4 damage matrix as 4 rows
(/root/reference/src/GameSim.cpp:160-170).  Files written here are
byte-compatible, so the reference's MATLAB readers
(/root/reference/matlab/visualize_game.m:22) work unchanged.

Note a reference quirk kept for byte-compatibility: ``logVectors`` emits
``damage.row(k)`` via the raw ``.data()`` pointer of a row *block* of a
column-major matrix (/root/reference/include/utils.h:72-76).  ``.data()``
points at ``&damage(k,0)``, so each "row" actually writes the next 4
*contiguous column-major* elements -- a sliding window ``cmflat[k:k+4]``
where ``cmflat`` is the column-major flattening.  The 16 logged damage
fields are therefore cmflat[0:4], [1:5], [2:6], [3:7]: entries cmflat[7:]
never reach the log and early entries repeat.  We replicate this exactly
(verified byte-identical against the compiled reference in
tests/test_parity.py); :func:`rows_from_states_full_damage` offers a
non-lossy 41-field export for new tooling.
"""

from __future__ import annotations

import numpy as np

RECORD_FIELDS = 29


class GameLogWriter:
    """Binary log writer.  Uses the native async C++ logger
    (robogame_tpu/native/logger.cpp) when the toolchain is available so
    host control loops never block on disk; falls back to a synchronous
    numpy writer otherwise.  Pass ``native=False`` to force the fallback."""

    def __init__(self, path: str, native: bool = True):
        self._native = None
        if native:
            try:
                from ..native import NativeLogger, available
                if available():
                    self._native = NativeLogger(path)
            except Exception:
                self._native = None
        self._f = None if self._native else open(path, "wb")

    def write_row(self, row: np.ndarray):
        if self._native:
            self._native.write(row)
        else:
            np.asarray(row, dtype="<f8").reshape(-1).tofile(self._f)

    def write_rows(self, rows: np.ndarray):
        if self._native:
            self._native.write(rows)
        else:
            np.asarray(rows, dtype="<f8").tofile(self._f)

    def close(self):
        if self._native:
            self._native.close()
            self._native = None
        elif self._f is not None and not self._f.closed:
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


# sliding-window gather indices into the column-major damage flattening
# (see module docstring)
DAMAGE_WINDOW_IDX = np.array([0, 1, 2, 3, 1, 2, 3, 4,
                              2, 3, 4, 5, 3, 4, 5, 6])


def damage_log_fields(damage: np.ndarray) -> np.ndarray:
    """(.., 4, 4) damage -> (.., 16) log fields, reference quirk included."""
    dm = np.asarray(damage, dtype=np.float64)
    cm = np.swapaxes(dm, -1, -2).reshape(dm.shape[:-2] + (16,))
    return cm[..., DAMAGE_WINDOW_IDX]


def rows_from_states(ts, scores, positions, damages) -> np.ndarray:
    """Build (T, 29) rows from trajectory arrays.

    positions: (T, 5, 2) in log order [puck, A1, A2, B1, B2];
    damages: (T, 4, 4), emitted through the reference's sliding-window quirk.
    """
    T = np.shape(ts)[0]
    out = np.empty((T, RECORD_FIELDS), dtype=np.float64)
    out[:, 0] = np.asarray(ts, dtype=np.float64)
    out[:, 1:3] = np.asarray(scores, dtype=np.float64).reshape(T, 2)
    out[:, 3:13] = np.asarray(positions, dtype=np.float64).reshape(T, 10)
    out[:, 13:29] = damage_log_fields(damages)
    return out


def rows_from_states_full_damage(ts, scores, positions, damages):
    """Lossless 41-field export: 13 header fields + the full row-major
    damage matrix (new tooling should prefer this)."""
    T = np.shape(ts)[0]
    out = np.empty((T, 13 + 16), dtype=np.float64)
    out[:, 0] = np.asarray(ts, dtype=np.float64)
    out[:, 1:3] = np.asarray(scores, dtype=np.float64).reshape(T, 2)
    out[:, 3:13] = np.asarray(positions, dtype=np.float64).reshape(T, 10)
    out[:, 13:29] = np.asarray(damages, dtype=np.float64).reshape(T, 16)
    return out


def write_trajectory_log(path: str, recs) -> None:
    """Write a stacked LogRecord trajectory (from scripted_rollout) to disk."""
    rows = rows_from_states(np.asarray(recs.t), np.asarray(recs.score),
                            np.asarray(recs.positions),
                            np.asarray(recs.damage))
    with GameLogWriter(path) as w:
        w.write_rows(rows)
