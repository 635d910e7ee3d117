#!/usr/bin/env python
"""Single-request (B=1) latency distribution + ceiling analysis
(VERDICT r4 item 7).

The reference serves one request at a time through a torch fp32 forward
(``app.py:241-347``).  Our /predict leg is: host preprocess (native
decode+resize) -> uint8 ship -> device normalize + forward (compiled
B=1 bucket) -> uint8 mask fetch -> host restore/heatmap/PNG.  This
script measures, on the real chip:

  1. the tunnel floor: minimal dispatch+fetch round trip (a 1-element
     program) — nothing through this box's axon tunnel can be faster;
  2. the model leg: ``SelfMaskInference.model_step`` (224 uint8 in,
     uint8 mask out) sequential p50/p90/p99;
  3. the full ``predict()`` (bytes in, 3 PNGs out) sequential
     p50/p90/p99;

and prints one JSON line.  The deltas name the ceiling: if (2) - (1) is
small, the leg is tunnel-bound and an AOT/on-device-preprocess rework
cannot help (the measured-ceiling outcome item 7 allows for).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 200


def pcts(xs):
    xs = sorted(xs)
    g = lambda q: xs[min(len(xs) - 1, int(q * len(xs)))]
    return {"p50_ms": round(g(0.50) * 1e3, 2),
            "p90_ms": round(g(0.90) * 1e3, 2),
            "p99_ms": round(g(0.99) * 1e3, 2)}


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_sod_bench"))
    import io

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    # ---- 1. tunnel floor -------------------------------------------------
    tiny = jax.jit(lambda x: jnp.sum(x) + 1.0)
    z = jnp.ones((8,), jnp.float32)
    float(tiny(z))
    floor = []
    for _ in range(N):
        t0 = time.perf_counter()
        float(tiny(z))
        floor.append(time.perf_counter() - t0)

    # ---- 2/3. the real serving pipeline ---------------------------------
    from sod_tpu.serving.inference import SelfMaskInference

    svc = SelfMaskInference(model_path=None)     # random weights: same
                                                 # FLOPs/latency as trained
    arr = (np.random.RandomState(0).rand(224, 224, 3) * 255).astype(np.uint8)
    svc.model_step(arr)                          # compile B=1 bucket
    leg = []
    for _ in range(N):
        t0 = time.perf_counter()
        svc.model_step(arr)
        leg.append(time.perf_counter() - t0)

    img = Image.fromarray(
        (np.random.RandomState(1).rand(360, 480, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    raw = buf.getvalue()
    svc.predict(io.BytesIO(raw))                 # warm the whole path
    full = []
    for _ in range(N):
        t0 = time.perf_counter()
        svc.predict(io.BytesIO(raw))
        full.append(time.perf_counter() - t0)

    rec = {
        "n": N,
        "tunnel_floor": pcts(floor),
        "model_leg_b1": pcts(leg),
        "predict_full": pcts(full),
        "model_minus_floor_p50_ms": round(
            (sorted(leg)[N // 2] - sorted(floor)[N // 2]) * 1e3, 2),
        "host_tail_p50_ms": round(
            (sorted(full)[N // 2] - sorted(leg)[N // 2]) * 1e3, 2),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
