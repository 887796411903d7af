"""Utilities: phase timing / observability (the rebuild of the reference's
two-stopwatch report, main.cpp:408-410, with per-phase granularity)."""

from .timing import PhaseTimer

__all__ = ["PhaseTimer"]
