"""Utilities: timing/synchronization, structured logging, profiling hooks."""

from stgcn_tpu.utils.timing import device_sync, timeit  # noqa: F401
