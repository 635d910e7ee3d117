#!/usr/bin/env python
"""Concurrent /predict throughput with and without serving micro-batching
(VERDICT r2 item 6: the bar is >= 3x over single-stream B=1 dispatch).

Drives ``SelfMaskInference.predict`` (the exact code path behind the HTTP
route: PIL decode -> resize/normalize -> device dispatch -> LANCZOS +
jet-heatmap + 3x PNG encode) from ``--clients`` threads.  One mode per
subprocess (two large jitted programs in one process degrade tunnel
dispatch ~40x).
"""
import argparse
import io
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def run_mode(micro: bool, clients: int, per_client: int,
             raw: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from sod_tpu.config import Config
    from sod_tpu.serving.inference import SelfMaskInference

    cfg = Config(micro_batch=micro, micro_batch_buckets=(1, 8),
                 micro_batch_wait_ms=3.0)
    svc = SelfMaskInference(cfg=cfg, warmup=True)   # random flagship weights

    pngs = []
    for i in range(clients):
        r = np.random.RandomState(i)
        img = (r.rand(360, 480, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        pngs.append(buf.getvalue())

    # warm the post-processing path once per thread's image
    svc.predict(pngs[0])

    if raw:
        # dispatch-path isolation: preprocessed 224px arrays straight into
        # the batcher/forward, no PIL decode or post-processing — measures
        # exactly what micro-batching accelerates (the device round-trip),
        # independent of this box's single host core
        arrs = [(np.random.RandomState(i).rand(224, 224, 3) * 255)
                .astype(np.uint8) for i in range(clients)]

        def dispatch(i):
            if svc._batcher is not None:
                return svc._batcher.submit(arrs[i])
            m, o = svc._forward(svc.params,
                                svc._prep(jnp.asarray(arrs[i])[None]))
            return np.asarray(m)[0], np.asarray(o)[0]  # fetch == batcher path
        dispatch(0)
    else:
        dispatch = None

    lat: list = []
    lock = threading.Lock()

    def worker(i):
        for _ in range(per_client):
            t0 = time.perf_counter()
            if raw:
                dispatch(i)
            else:
                svc.predict(pngs[i])
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n = clients * per_client
    lat.sort()
    p50 = lat[len(lat) // 2] * 1e3
    p95 = lat[int(len(lat) * 0.95)] * 1e3
    print(f"micro_batch={int(micro)} clients={clients} raw={int(raw)} "
          f"{n / wall:8.1f} req/s  p50={p50:6.1f}ms p95={p95:6.1f}ms",
          flush=True)
    if svc._batcher is not None:
        svc._batcher.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--per-client", type=int, default=8)
    ap.add_argument("--raw", action="store_true",
                    help="dispatch path only (no PIL/PNG post-processing)")
    ap.add_argument("--one", choices=["on", "off"], default=None)
    args = ap.parse_args()

    if args.one is not None:
        run_mode(args.one == "on", args.clients, args.per_client,
                 raw=args.raw)
        return
    for mode in ("off", "on"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", mode,
             "--clients", str(args.clients),
             "--per-client", str(args.per_client)]
            + (["--raw"] if args.raw else []),
            capture_output=True, text=True)
        out = [ln for ln in r.stdout.splitlines() if "req/s" in ln]
        print(out[-1] if out else
              f"{mode} FAILED: {(r.stderr or '').strip().splitlines()[-2:]}",
              flush=True)


if __name__ == "__main__":
    main()
