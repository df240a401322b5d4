"""Utilities: solver configuration, logging, timers."""

from relp_tpu.utils.config import SolverConfig

__all__ = ["SolverConfig"]
