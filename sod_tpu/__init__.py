"""sod_tpu — a TPU-native JAX/XLA framework for unsupervised salient object
detection, providing the full capabilities of the SelfMask-based stack in
``DaniyalMuneer786/Salient-Object-Detection`` (reference mounted at
``/root/reference``).

Architecture (bottom-up):

- ``sod_tpu.ops``       — functional numeric primitives (attention incl. a
  Pallas TPU flash kernel, layers, resize kernels matching torch semantics,
  Hungarian assignment inside jit, COCO-compatible RLE codec).
- ``sod_tpu.models``    — pure-function models over parameter pytrees:
  ViT-S encoder (DINO variant, ref ``networks/vision_transformer.py``),
  ResNet-50 backbones (ref ``networks/resnet*.py``), and the MaskFormer
  query decoder (ref ``networks/maskformer/``).
- ``sod_tpu.losses``    — the training objective (dice / focal / BCE /
  ranking / classification / InfoNCE, ref ``criterion.py`` bytecode).
- ``sod_tpu.metrics``   — IoU, F-measure (3 variants), S-measure, MAE,
  pixel accuracy, AverageMeter (ref ``metrics/``), fully jit-able.
- ``sod_tpu.data``      — DUTS / DUT-OMRON / ECSSD / custom datasets,
  augmentation pipeline, a prefetching host loader, spectral-cluster-voting
  pseudo-mask generation (ref ``datasets/``, ``datasets/mask_generator``).
- ``sod_tpu.train``     — Trainer / Evaluator orchestration, poly LR
  schedule, orbax checkpointing (ref ``trainer.py`` / ``evaluator.py``).
- ``sod_tpu.parallel``  — ``jax.sharding.Mesh`` + jit sharding helpers for
  data-parallel training/eval over ICI (replaces the reference's dormant
  DistributedSampler path).
- ``sod_tpu.postprocess`` — fast bilateral solver as matrix-free CG on
  device (ref ``bilateral_solver.py``).
- ``sod_tpu.serving``   — the SOD web product: auth, quotas, subscriptions,
  admin analytics, ``/predict`` inference (ref ``app.py``).
- ``sod_tpu.native``    — C++ host-side kernels (RLE codec, Hungarian,
  connected components) with pure-NumPy fallbacks.
"""

__version__ = "0.1.0"

from sod_tpu.config import Config, load_config  # noqa: F401
