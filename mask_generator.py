#!/usr/bin/env python
"""Pseudo-mask generation entry point (ref ``datasets/mask_generator.py``
CLI): ``python mask_generator.py --p_images ... --fp out.json``."""
from sod_tpu.cli.generate_masks import main

if __name__ == "__main__":
    main()
