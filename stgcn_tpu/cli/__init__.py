"""Command-line interface."""

from stgcn_tpu.cli.main import build_trainer, get_parameters, main  # noqa: F401
