#!/usr/bin/env python
"""Web app entry point (ref ``python app.py``):
``python serve.py [--port 5000] [--model ckpt] [--config cfg.yaml]``."""
from sod_tpu.serving.app import main

if __name__ == "__main__":
    main()
