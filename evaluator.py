#!/usr/bin/env python
"""Evaluation entry point (ref ``evaluator.py`` CLI):
``python evaluator.py --dataset_name duts --p_state_dict ... --config ...``."""
from sod_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
