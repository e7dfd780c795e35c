"""Utilities: runtime setup, logging, profiling hooks."""

from neurondb_tpu.utils.runtime import enable_compilation_cache  # noqa: F401
