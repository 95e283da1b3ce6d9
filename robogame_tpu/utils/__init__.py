from .gamelog import GameLogWriter, read_log, write_trajectory_log

__all__ = ["GameLogWriter", "read_log", "write_trajectory_log"]
