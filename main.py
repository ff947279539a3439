#!/usr/bin/env python
"""Entry point: ``python main.py --dataset pemsd7-m ...`` — flag-compatible
with the reference driver (see ``stgcn_tpu/cli/main.py``)."""

from stgcn_tpu.cli.main import main

if __name__ == "__main__":
    main()
