"""Utilities: timing/synchronization, structured logging, profiling hooks."""

from stgcn_tpu.utils.profiling import annotate, profile  # noqa: F401
from stgcn_tpu.utils.timing import device_sync, timeit  # noqa: F401
