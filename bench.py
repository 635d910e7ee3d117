"""Benchmark: the four product-surface throughputs on one chip.

Headline: images/sec for the flagship SelfMask-nq20 forward (ViT-S/8
encoder, 785 tokens, 6-layer 20-query decoder, einsum mask head) at 224px
in bf16 with the Pallas fused-block kernel — the BASELINE.json "batched
DUTS-TE evaluation" configuration.  The baseline is PyTorch-CPU images/sec
of an equivalent torch model (the reference targets an unspecified GPU and
publishes no throughput; BASELINE.md sets the north star at >= 5x
torch-CPU per chip).  ``vs_baseline`` = tpu_ips / (5 * torch_cpu_ips), so
1.0 == north-star parity.

Prints ONE JSON line.  The headline keys keep the driver's contract
({"metric", "value", "unit", "vs_baseline"}); the other three product
surfaces ride along as extra fields (VERDICT r3 item 3 — the headline
saturated in round 1, so round-over-round progress lives in these):

    inference_int8_images_per_sec  same forward, W8A8 quantized encoder
                                   (ops/fused_block_int8; opt-in path)
    train_images_per_sec        full train step (fwd+loss+bwd+AdamW), B=32
    canvas_eval_images_per_sec  Evaluator 400px canvas step, B=16, fused
    maskgen_images_per_sec      pseudo-mask pipeline (3 backbones x k=2,3,4)

Each metric runs in a FRESH subprocess, sequentially: a second large
jitted program in one process degrades tunnel dispatch ~40x, and only one
process may hold the TPU at a time (docs/PERFORMANCE.md methodology).  A
metric that fails or times out reports null rather than killing the run.

Note: through the axon tunnel ``block_until_ready`` does not actually wait,
so timing fetches a scalar reduction to host to force completion.
"""
import json
import os
import sys
import time

# persistent XLA compile cache — repeat bench runs skip the multi-minute
# tunnel compiles.  Kept as an env var for SUBPROCESSES (--train-only
# inherits it before its interpreter pre-imports jax)...
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_sod_bench"))

BATCH = 64       # sweep (scripts/bench_infer.py): 1641/1814/1835/1845
                 # img/s at B=16/32/48/64
IMG = 224
ITERS = 20
# the PINNED torch-CPU denominator (VERDICT r4 weak item 1: the old
# per-round re-measurement made vs_baseline incomparable across rounds —
# r4's multiplier doubled purely from denominator noise on a contended
# one-core host).  Committed with provenance; never silently re-measured.
_PINNED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BASELINE_TORCH.json")


def make_forward_chain(mcfg, iters: int):
    """The tunnel-safe inference benchmark program: ``iters`` forwards
    chained by a data dependence inside ONE jit, synced by a scalar fetch
    (``block_until_ready`` does not wait through the axon tunnel).  Shared
    with ``scripts/bench_infer.py`` so the sweep measures exactly what
    this headline reports."""
    import jax
    import jax.numpy as jnp

    from sod_tpu.models.maskformer import maskformer_apply

    @jax.jit
    def forward_chain(params, x):
        def body(carry, _):
            out = maskformer_apply(params, carry, mcfg, fused=True)
            # select argmax-objectness query mask (inference semantics,
            # ref app.py:267-277) and feed a same-shaped tensor back to
            # serialize iterations
            obj = out["objectness"][:, -1, :, 0]
            best = jnp.argmax(obj, axis=-1)
            sel = jnp.take_along_axis(
                out["mask_pred"][:, -1], best[:, None, None, None], axis=1)
            m = jnp.mean(sel) * 1e-6
            return carry + m.astype(carry.dtype), jnp.sum(sel)
        final, sums = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(final) + jnp.sum(sums)

    return forward_chain


def measure_tpu_ips(int8: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    # ...but THIS process must set it through jax.config: the box
    # pre-imports jax at interpreter startup, so the env var above lands
    # too late for our own jit calls (CLAUDE.md environment quirks)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from sod_tpu.config import Config
    from sod_tpu.models.maskformer import config_from, maskformer_apply, maskformer_init

    cfg = Config()  # nq20 / ndl6 / ViT-S/8 / flash attention
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    if int8:
        # quantize BEFORE the bf16 cast (f32 scales; Config.quantize="int8")
        from sod_tpu.ops.fused_block_int8 import quantize_vit_blocks

        blocks_q = quantize_vit_blocks(params["encoder"]["blocks"])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    if int8:
        params = dict(params,
                      encoder=dict(params["encoder"], blocks_q=blocks_q))

    forward_chain = make_forward_chain(mcfg, ITERS)
    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16)
    float(forward_chain(params, x))          # compile + warmup
    t = time.perf_counter()
    float(forward_chain(params, x))          # scalar fetch forces sync
    dt = time.perf_counter() - t
    return BATCH * ITERS / dt


def pinned_torch_baseline() -> dict:
    """The committed, provenance-carrying torch-CPU baseline
    (BASELINE_TORCH.json: median of 5 independent >=10 s measurements).
    If the file is somehow absent, one fresh measurement is taken and
    written WITH provenance marking it unpinned — never cached silently.
    """
    try:
        with open(_PINNED) as f:
            d = json.load(f)
        float(d["torch_cpu_ips"])
        return d
    except Exception:
        pass
    print("BASELINE_TORCH.json missing — measuring a fresh (UNPINNED) "
          "torch baseline", file=sys.stderr)
    ips = measure_torch_cpu_ips()
    d = {"version": "unpinned_single_run", "torch_cpu_ips": ips,
         "method": "single >=10s batch-8 measurement (fallback; the "
                   "pinned median-of-5 file was missing)"}
    try:
        with open(_PINNED, "w") as f:
            json.dump(d, f, indent=1)
    except Exception:
        pass
    return d


def measure_torch_cpu_ips() -> float:
    """Equivalent-architecture torch-CPU forward (the reference's runtime is
    torch; built from torch.nn primitives, not copied code): 2 warmup
    passes, then at least 10 s / 5 iterations of batch-8 forwards.

    One raw measurement — the pinned baseline (BASELINE_TORCH.json) is
    the median of 5 of these; see ``pinned_torch_baseline``.
    """
    import torch
    import torch.nn as nn

    D, HEADS, DEPTH, Q, L = 384, 6, 12, 20, 6

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.n1 = nn.LayerNorm(D, eps=1e-6)
            self.qkv = nn.Linear(D, 3 * D)
            self.proj = nn.Linear(D, D)
            self.n2 = nn.LayerNorm(D, eps=1e-6)
            self.mlp = nn.Sequential(nn.Linear(D, 4 * D), nn.GELU(),
                                     nn.Linear(4 * D, D))

        def forward(self, x):
            b, n, _ = x.shape
            h = self.n1(x)
            qkv = self.qkv(h).reshape(b, n, 3, HEADS, D // HEADS)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            a = (q @ k.transpose(-2, -1)) * (D // HEADS) ** -0.5
            a = a.softmax(-1)
            h = (a @ v).transpose(1, 2).reshape(b, n, D)
            x = x + self.proj(h)
            return x + self.mlp(self.n2(x))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch = nn.Conv2d(3, D, 8, 8)
            self.pos = nn.Parameter(torch.zeros(1, 785, D))
            self.cls = nn.Parameter(torch.zeros(1, 1, D))
            self.blocks = nn.ModuleList(Block() for _ in range(DEPTH))
            self.norm = nn.LayerNorm(D, eps=1e-6)
            self.dec = nn.TransformerDecoder(
                nn.TransformerDecoderLayer(D, HEADS, 4 * D, 0.0, "relu"), L)
            self.queries = nn.Parameter(torch.zeros(Q, D))
            self.ffn = nn.Sequential(nn.Linear(D, D), nn.ReLU(),
                                     nn.Linear(D, D), nn.ReLU(),
                                     nn.Linear(D, 1))

        def forward(self, x):
            b = x.shape[0]
            t = self.patch(x).flatten(2).transpose(1, 2)
            t = torch.cat([self.cls.expand(b, -1, -1), t], 1) + self.pos
            for blk in self.blocks:
                t = blk(t)
            t = self.norm(t)[:, 1:]
            mem = t.transpose(0, 1)
            qr = self.dec(self.queries[:, None].expand(-1, b, -1), mem)
            qr = qr.transpose(0, 1)
            up = torch.nn.functional.interpolate(
                t.transpose(1, 2).reshape(b, D, 28, 28), scale_factor=2,
                mode="bilinear")
            masks = torch.sigmoid(torch.einsum("bqd,bdhw->bqhw", qr, up))
            obj = torch.sigmoid(self.ffn(qr))
            return masks, obj

    model = Model().eval()
    b = 8                              # the reference's training batch size
    x = torch.randn(b, 3, IMG, IMG)
    with torch.no_grad():
        model(x)                       # warmup
        model(x)
        t0 = time.perf_counter()
        n_iters = 0
        while True:
            model(x)
            n_iters += 1
            dt = time.perf_counter() - t0
            if dt >= 10.0 and n_iters >= 5:
                break
    return b * n_iters / dt


def measure_train_ips(batch: int = 32) -> float:
    """Full train-step throughput (fwd + criterion + bwd + AdamW in one
    jit), reported via ``--train`` (the driver's contract is ONE JSON line,
    so this is opt-in; measured numbers are recorded in CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sod_tpu.config import Config
    from sod_tpu.models.maskformer import config_from, maskformer_init
    from sod_tpu.train.optim import build_optimizer
    from sod_tpu.train.step import make_train_step

    # measured-best train config on v5e: BOTH block halves Pallas in both
    # directions (use_fused_train: ops/fused_attn + ops/fused_mlp, 449
    # img/s at B=32 after the r4 backward restructure); remat measured
    # ~20% slower (memory lever only)
    cfg = Config(batch_size=batch, use_fused_mlp=True, use_fused_train=True)
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=100)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mcfg)
    rng = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(rng.rand(batch, IMG, IMG, 3), jnp.float32),
        "gt_masks": jnp.asarray(
            (rng.rand(batch, cfg.max_gt_masks, IMG, IMG) > 0.5), jnp.float32),
        "gt_valid": jnp.ones((batch, cfg.max_gt_masks), bool),
        "labels": jnp.asarray(rng.randint(0, 10000, size=(batch,))),
    }

    # Python loop of async dispatches + one trailing scalar fetch —
    # wrapping the step in a lax.scan over steps measures 17x slower than
    # the step itself (see scripts/bench_train.py)
    def run_n(p, o, n):
        for _ in range(n):
            p, o, m = step(p, o, data)
        return p, o, m["loss"]

    p, o, loss = run_n(params, opt_state, 3)
    float(loss)
    t0 = time.perf_counter()
    p, o, loss = run_n(p, o, ITERS)
    float(loss)
    return batch * ITERS / (time.perf_counter() - t0)


def measure_canvas_ips(batch: int = 16, canvas: int = 400,
                       iters: int = 10) -> float:
    """Evaluator canvas step (forward + x4 upsample + ALL metrics on
    device) through the gridded fused pipeline — the per-epoch benchmark
    eval cost (ref Evaluator pyc; `scripts/bench_canvas.py` sweeps)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sod_tpu.config import Config
    from sod_tpu.models.maskformer import config_from, maskformer_init
    from sod_tpu.train.evaluator import Evaluator

    cfg = Config(use_fused_eval=True)
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    with tempfile.TemporaryDirectory() as td:
        duts = os.path.join(td, "DUTS")
        for sub in ("DUTS-TE-Image", "DUTS-TE-Mask"):
            os.makedirs(os.path.join(duts, sub))
        Image.new("RGB", (64, 64)).save(
            os.path.join(duts, "DUTS-TE-Image", "x.jpg"))
        Image.new("L", (64, 64)).save(
            os.path.join(duts, "DUTS-TE-Mask", "x.png"))
        cfg.dir_dataset = td
        step = Evaluator(params, cfg, mcfg)._eval_fn((canvas, canvas), "iou")

    p = mcfg.vit.patch_size
    rng = np.random.RandomState(0)
    image = jnp.asarray((rng.rand(batch, canvas, canvas, 3) * 255)
                        .astype(np.uint8))
    gt = jnp.asarray((rng.rand(batch, canvas, canvas) > 0.7).astype(np.uint8))
    hs = rng.randint(canvas // 2, canvas + 1, size=batch)
    ws = rng.randint(canvas // 2, canvas + 1, size=batch)
    grid = jnp.asarray(np.stack([-(-hs // p), -(-ws // p)], 1), jnp.int32)
    sizes = jnp.asarray(np.stack([hs, ws], 1), jnp.int32)

    out, _ = step(params, image, gt, grid, sizes)      # compile
    float(jnp.sum(out["iou"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _ = step(params, image, gt, grid, sizes)
    float(jnp.sum(out["iou"]))                         # sync via scalar
    return batch * iters / (time.perf_counter() - t0)


def measure_maskgen_ips(n: int = 128, batch: int = 16):
    """End-to-end pseudo-mask generation (decode -> 3-backbone
    extract+cluster on device, host filter/vote/RLE overlapped under the
    next batch's dispatch, JSON write-out) — the reference's offline DUTS
    stage (SURVEY §3.4).

    Protocol (VERDICT r4 weak item 5 — one honest number, labeled): the
    documented end-to-end run of ``scripts/bench_maskgen.py`` — n=128
    images, ``MaskGenerator.dump`` (mask voting + RLE + JSON file write
    included), in THIS fresh process where no other large jitted program
    has run (a prior big program degrades tunnel dispatch ~40x and was
    what made r4's 12.69 'cold' figure incomparable to the bench's 23).
    The one-time compile+warmup is excluded from the rate but reported as
    ``maskgen_compile_s``."""
    import tempfile

    from sod_tpu.data.mask_generator import MaskGenerator

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_maskgen import build_images

    paths = build_images("/tmp/sod_bench_maskgen_imgs", n)
    gen = MaskGenerator(cluster_sizes=[2, 3, 4], cluster_type="spectral",
                        feature_types=["dino", "mocov2", "swav"],
                        patch_size=16, batch_size=batch)
    t0 = time.perf_counter()
    gen.extract_candidate_masks(paths[:batch])         # compile + warmup
    compile_s = time.perf_counter() - t0
    with tempfile.NamedTemporaryFile(suffix=".json") as tf:
        t0 = time.perf_counter()
        gen.dump(paths, tf.name)                       # incl. vote/RLE/write
        dt = time.perf_counter() - t0
        with open(tf.name) as f:
            assert len(json.load(f)) == n
    return {"value": n / dt, "maskgen_compile_s": round(compile_s, 1),
            "maskgen_protocol": f"n={n} end-to-end incl. RLE+JSON write, "
                                f"fresh process, compile excluded"}


_SUBPROCESS_METRICS = {
    # flag -> (measure fn, timeout seconds incl. cold-cache compile)
    "--infer-only": (measure_tpu_ips, 900),
    "--int8-only": (lambda: measure_tpu_ips(int8=True), 900),
    "--train-only": (measure_train_ips, 1800),   # cold-cache compile of
                                                 # the fused-train program
                                                 # can exceed 15 min
                                                 # through the tunnel
    "--canvas-only": (measure_canvas_ips, 1500),
    "--maskgen-only": (measure_maskgen_ips, 1500),
}


def _run_metric_subprocess(flag: str):
    """One metric in a fresh interpreter (one big program + one TPU client
    per process).  Returns the subprocess's JSON dict (value + any extra
    labeled fields), or None on failure/timeout — a broken sub-metric must
    not kill the headline line."""
    import subprocess

    _, timeout = _SUBPROCESS_METRICS[flag]
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), flag],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"bench {flag}: timed out after {timeout}s", file=sys.stderr)
        return None
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if r.returncode != 0 or not lines:
        print(f"bench {flag}: failed rc={r.returncode}\n{r.stderr[-2000:]}",
              file=sys.stderr)
        return None
    try:
        d = json.loads(lines[-1])
        float(d["value"])
        return d
    except Exception as e:
        print(f"bench {flag}: bad output ({e})", file=sys.stderr)
        return None


def main():
    for flag, (fn, _) in _SUBPROCESS_METRICS.items():
        if flag in sys.argv:           # subprocess entry
            out = fn()
            if not isinstance(out, dict):
                out = {"value": out}
            out["value"] = round(float(out["value"]), 2)
            print(json.dumps({"metric": flag.strip("-"), **out}))
            return

    # the parent NEVER touches jax: only one process may hold the TPU, so
    # every chip job runs (and exits) before the next one starts
    def val(d):
        return d["value"] if d else None

    tpu = _run_metric_subprocess("--infer-only")
    tpu_ips = val(tpu)
    try:
        baseline = pinned_torch_baseline()
        cpu_ips = float(baseline["torch_cpu_ips"])
    except Exception as e:  # torch missing etc.
        print(f"torch baseline failed: {e}", file=sys.stderr)
        baseline, cpu_ips = {}, float("nan")
    vs = (tpu_ips / (5.0 * cpu_ips)
          if tpu_ips is not None and cpu_ips == cpu_ips else None)
    int8 = _run_metric_subprocess("--int8-only")
    train = _run_metric_subprocess("--train-only")
    canvas = _run_metric_subprocess("--canvas-only")
    maskgen = _run_metric_subprocess("--maskgen-only")
    line = {
        "metric": "saliency_inference_images_per_sec_per_chip",
        "value": round(tpu_ips, 2) if tpu_ips is not None else None,
        "unit": "images/sec",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "inference_int8_images_per_sec": val(int8),
        "train_images_per_sec": val(train),
        "canvas_eval_images_per_sec": val(canvas),
        "maskgen_images_per_sec": val(maskgen),
        "torch_cpu_baseline_ips": cpu_ips if cpu_ips == cpu_ips else None,
        "baseline_provenance": baseline.get("version"),
    }
    if maskgen:
        line.update({k: v for k, v in maskgen.items()
                     if k not in ("metric", "value")})
    print(json.dumps(line))


if __name__ == "__main__":
    main()
