"""Auxiliary subsystems (SURVEY.md §5): tracing/profiling hooks, run metrics,
NaN guards."""
from .profiling import profile_trace, Timer, benchmark
from .metrics import SolveMetrics

__all__ = ["profile_trace", "Timer", "benchmark", "SolveMetrics"]
