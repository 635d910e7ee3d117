#!/usr/bin/env python
"""Training entry point (ref ``main.py``):
``python main.py --config configs/duts-....yaml``."""
from sod_tpu.cli.train import main

if __name__ == "__main__":
    main()
