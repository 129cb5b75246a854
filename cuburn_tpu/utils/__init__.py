"""Utilities: timing/profiling harness (SURVEY.md §5 tracing row)."""

from cuburn_tpu.utils.timing import hard_sync, time_fn

__all__ = ["hard_sync", "time_fn"]
