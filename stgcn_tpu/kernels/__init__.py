"""Pallas TPU kernels (with pure-jnp fallbacks used as correctness oracles
and as the CPU path in tests)."""

from stgcn_tpu.kernels.spmm import bcsr_spmm, bcsr_spmm_vjp  # noqa: F401
from stgcn_tpu.kernels.sddmm import bcsr_sddmm  # noqa: F401
