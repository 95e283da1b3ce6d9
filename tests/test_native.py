"""Native C++ async logger: byte-compatibility with the numpy writer."""

import os

import numpy as np
import pytest

from robogame_tpu.native import NativeLogger, available
from robogame_tpu.utils.gamelog import GameLogWriter, read_log

pytestmark = pytest.mark.skipif(not available(),
                                reason="native toolchain unavailable")


def test_native_logger_byte_identical(tmp_path):
    rows = np.random.default_rng(0).normal(size=(37, 29))
    p_native = str(tmp_path / "native.log")
    p_numpy = str(tmp_path / "numpy.log")
    with NativeLogger(p_native) as lg:
        for r in rows:
            lg.write(r)
    with GameLogWriter(p_numpy, native=False) as w:
        w.write_rows(rows)
    a = open(p_native, "rb").read()
    b = open(p_numpy, "rb").read()
    assert a == b
    np.testing.assert_array_equal(read_log(p_native), rows)


def test_game_log_writer_prefers_native(tmp_path):
    p = str(tmp_path / "via_writer.log")
    w = GameLogWriter(p)
    assert w._native is not None      # toolchain present in this image
    w.write_rows(np.arange(58, dtype=np.float64).reshape(2, 29))
    w.close()
    got = read_log(p)
    assert got.shape == (2, 29)
    np.testing.assert_array_equal(got.reshape(-1), np.arange(58))


def test_native_flush_visible_before_close(tmp_path):
    p = str(tmp_path / "flush.log")
    lg = NativeLogger(p)
    lg.write(np.ones(29))
    lg.flush()
    assert os.path.getsize(p) == 29 * 8
    lg.close()
