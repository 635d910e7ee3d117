#!/usr/bin/env python
"""Measure the worker-pool broker's IPC overhead (serving/pool.py).

The pool proxies ``model_step`` over a unix socket (resized uint8 image
in, uint8 mask + objectness out).  This benchmarks ONLY that hop —
a stub ``model_step`` that returns immediately — so the number is the
per-request tax the pool adds on top of the in-process path.  Pure host
measurement; runs anywhere (no TPU, no model).

Usage: python scripts/bench_pool_overhead.py [--size 224] [--iters 2000]
"""
import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sod_tpu.serving.pool import InferenceBroker, RemoteInference  # noqa: E402


class _StubSvc:
    """Stands in for SelfMaskInference: instant model_step, same wire
    shapes as the real ViT-S serving path."""

    def __init__(self, size: int, n_queries: int = 20):
        from types import SimpleNamespace

        self.cfg = SimpleNamespace(eval_image_size=size, arch="vit_small",
                                   quantize="none", compute_dtype="bfloat16")
        self.mcfg = SimpleNamespace(n_queries=n_queries)
        self.micro_batching = False
        self._mask = np.zeros((size, size), np.uint8)
        self._obj = np.zeros((n_queries,), np.float32)

    def model_step(self, arr):
        return self._mask, self._obj


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()

    svc = _StubSvc(args.size)
    path = str(Path(tempfile.gettempdir()) / f"sod-ovh-{time.time_ns()}.sock")
    broker = InferenceBroker(svc, path)
    try:
        remote = RemoteInference(path)
        img = np.zeros((args.size, args.size, 3), np.uint8)
        # local baseline: the same call without the socket
        for _ in range(50):
            svc.model_step(img)
            remote.model_step(img)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            svc.model_step(img)
        local = (time.perf_counter() - t0) / args.iters
        t0 = time.perf_counter()
        for _ in range(args.iters):
            remote.model_step(img)
        over = (time.perf_counter() - t0) / args.iters
        print(f"image {args.size}px: local model_step {local * 1e6:.1f} us, "
              f"via broker {over * 1e6:.1f} us -> IPC overhead "
              f"{(over - local) * 1e6:.1f} us/request "
              f"({(args.size * args.size * 3 + args.size * args.size) / 1e3:.0f} KB "
              f"on the wire)")
    finally:
        broker.close()


if __name__ == "__main__":
    main()
