"""Configuration system.

The reference loads a single YAML file with ``yaml.safe_load`` and merges it
into a flat argparse ``Namespace`` (ref ``evaluator.py`` pyc module consts;
``app.py:166-169``).  We mirror the exact key names in one flat dataclass so
the reference's YAML configs load unchanged, add type checking, and keep the
``define_experim_name`` encoding used for checkpoint directories (ref
``main.py`` pyc strings ``nq``/``_ndl``/``bc``/``sr``/``pm``/``seed``,
observed result ``nq20_ndl6_bc_sr10100_duts_pm_seed0_contrastive``).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

import yaml


@dataclass
class Config:
    # augmentations (ref configs/...yaml:1-4)
    use_copy_paste: bool = False
    scale_range: Tuple[float, float] = (0.1, 1.0)
    repeat_image: bool = False

    # base directories (ref configs/...yaml:6-8)
    dir_ckpt: str = "ckpt"
    dir_dataset: str = "datasets"

    # clustering (ref configs/...yaml:10-14)
    k: List[int] = field(default_factory=lambda: [2, 3, 4])
    clustering_mode: str = "spectral"
    use_gpu: bool = True  # kept for config parity; ignored on TPU
    scale_factor: int = 2

    # dataset (ref configs/...yaml:16-23)
    dataset_name: str = "duts"
    use_pseudo_masks: bool = True
    train_image_size: int = 224
    eval_image_size: int = 224
    n_percent: int = 100
    n_copy_pastes: Optional[int] = None
    pseudo_masks_fp: Optional[str] = None

    # dataloader (ref configs/...yaml:25-28)
    batch_size: int = 8
    num_workers: int = 4
    pin_memory: bool = True

    # networks (ref configs/...yaml:30-41)
    abs_2d_pe_init: bool = False
    arch: str = "vit_small"
    lateral_connection: bool = False
    learnable_pixel_decoder: bool = False
    use_binary_classifier: bool = True
    n_decoder_layers: int = 6
    n_queries: int = 20
    num_layers: List[int] = field(default_factory=lambda: list(range(12)))
    patch_size: int = 8
    training_method: str = "dino"

    # objective (ref configs/...yaml:43-49)
    loss_every_decoder_layer: bool = True
    weight_dice_loss: float = 1.0
    weight_focal_loss: float = 0.0
    weight_bce_loss: float = 0.0
    weight_contrastive_loss: float = 0.1
    temperature: float = 0.07
    contrastive_feature_dim: int = 128

    # optimizer (ref configs/...yaml:51-57)
    lr: float = 6e-6
    lr_warmup_duration: int = 0
    momentum: float = 0.9
    n_epochs: int = 12
    weight_decay: float = 0.01
    optimizer_type: str = "adamw"

    # validation (ref configs/...yaml:59)
    benchmarks: Optional[List[str]] = None

    # runtime knobs (new, TPU-specific; not present in the reference)
    seed: int = 0
    suffix: str = ""
    debug: bool = False
    compute_dtype: str = "bfloat16"   # matmul/compute dtype on TPU
    param_dtype: str = "float32"      # parameter storage dtype
    use_pallas_attention: bool = True  # fused flash-attention kernel on TPU
    remat: bool = False               # checkpoint encoder blocks in the
                                      # backward (bigger train batches)
    use_fused_mlp: bool = False       # fused LN+MLP Pallas kernel (tanh
                                      # GELU; differentiable; any N)
    use_fused_train: bool = False     # whole-block fused kernel in the
                                      # train forward (bwd = kernel-
                                      # recompute VJP of the unfused block)
    mesh_data_axis: int = 1           # data-parallel mesh size (1 = single chip)
    mesh_model_axis: int = 1          # tensor-parallel mesh size (Megatron-
                                      # style sharding rules, parallel/tp.py;
                                      # requires the XLA compute path)
    mesh_pipe_axis: int = 1           # pipeline-parallel stages (GPipe over
                                      # the ViT block stack, parallel/pp.py;
                                      # depth must divide evenly; XLA path;
                                      # combined with mesh_model_axis > 1
                                      # this builds the 3-D (data, pipe,
                                      # model) mesh — GPipe stages of
                                      # Megatron TP groups, parallel/p3.py)
    mesh_seq_axis: int = 1            # sequence-parallel ring size (ring
                                      # attention over the token axis,
                                      # parallel/sp.py; XLA path; composes
                                      # with mesh_model_axis > 1 via
                                      # parallel/sptp.py; mutually
                                      # exclusive with mesh_pipe_axis > 1)
    async_checkpoint: bool = False    # overlap the per-epoch latest_model
                                      # write (device_get + orbax) with
                                      # the next epoch on a writer thread
                                      # (train/checkpoints.AsyncSaver);
                                      # durability weakens by at most one
                                      # epoch (orbax tmp+rename stays
                                      # kill-atomic), resume contract
                                      # unchanged
    fsdp: str = "none"                # ZeRO/FSDP state sharding over the
                                      # data axis (parallel/fsdp.py):
                                      # "zero1" shards the fp32 AdamW
                                      # moments (works with every compute
                                      # path incl. fused-train; composes
                                      # with TP/PP/SP — moments add "data"
                                      # on top of the params' own layout),
                                      # "full" stores the weights sharded
                                      # too (XLA path, plain data mesh
                                      # only); needs a data mesh axis > 1
    pp_microbatches: int = 0          # GPipe micro-batches per step (0 =
                                      # one per stage; bubble fraction is
                                      # (S-1)/(M+S-1) — raise M to amortise)
    grad_accum_steps: int = 1         # micro-batches per optimizer step
                                      # (batch_size must divide evenly)
    grad_accum_mode: str = "averaged"  # "averaged": each micro loss
                                      # normalised alone, InfoNCE sees only
                                      # micro negatives; "exact":
                                      # GradCache-style full-batch-
                                      # equivalent gradients (one extra
                                      # fwd per micro when the contrastive
                                      # weight is on) — see train/step.py
    max_gt_masks: int = 8             # static padding for ragged pseudo-mask stacks
    micro_batch: Union[bool, str] = "auto"  # serving: batch concurrent
                                      # /predict requests into one device
                                      # dispatch.  True/False force it;
                                      # "auto" (default) probes the
                                      # host<->device link at boot and
                                      # batches only where it wins — on
                                      # this box's axon tunnel one padded
                                      # B=8 upload serializes on the slow
                                      # link and batching INVERTS
                                      # (docs/PERFORMANCE.md), while on a
                                      # locally-attached chip it is 3x
    micro_batch_buckets: Tuple[int, ...] = (1, 8)  # compiled batch sizes
    micro_batch_wait_ms: float = 3.0  # max co-arrival wait per batch
    train_ship_uint8: bool = True     # loader ships augmented images as
                                      # uint8; normalization runs on device
    use_fused_eval: bool = False      # canvas eval through the gridded
                                      # fused pipeline (tanh-GELU; opt-in —
                                      # default keeps bit-exact erf GELU)
    quantize: str = "none"            # "int8": serving/inference runs the
                                      # encoder blocks through the W8A8
                                      # fused kernel (per-channel int8
                                      # weights quantized once at load,
                                      # per-token dynamic activations,
                                      # int32 MXU accumulate — ~1.8x the
                                      # bf16 matmul rate on v5e).  Opt-in:
                                      # accuracy report in
                                      # docs/PERFORMANCE.md; default stays
                                      # the bf16 kernel
    fused_save_acts: bool = False     # fused-train forward streams the
                                      # pre-GELU hidden so the backward
                                      # skips its recompute matmul.
                                      # MEASURED SLOWER on v5e (80.2 vs
                                      # 78.0 ms at B=32: the extra HBM
                                      # stream doesn't hide under the
                                      # kernel) — kept for other chips

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dump_json(self, fp: str) -> None:
        with open(fp, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)


_FIELD_NAMES = {f.name for f in dataclasses.fields(Config)}


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Load a reference-format YAML config, applying CLI-style overrides.

    Unknown YAML keys are ignored with a warning (the reference merges them
    silently into the Namespace; none of the live keys are unknown here).
    """
    raw = {}
    if path is not None:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    if overrides:
        raw.update({k: v for k, v in overrides.items() if v is not None})

    known, unknown = {}, {}
    for key, value in raw.items():
        if key in _FIELD_NAMES:
            if key == "scale_range" and value is not None:
                value = tuple(value)
            known[key] = value
        else:
            unknown[key] = value
    if unknown:
        import warnings

        warnings.warn(f"ignoring unknown config keys: {sorted(unknown)}")
    return Config(**known)


def define_experim_name(cfg: Config) -> str:
    """Encode experiment identity as the reference does (ref main.py pyc;
    the shipped checkpoint dir is ``nq20_ndl6_bc_sr10100_duts_pm_seed0_contrastive``,
    ``app.py:350``)."""
    parts = [f"nq{cfg.n_queries}", f"ndl{cfg.n_decoder_layers}"]
    if cfg.use_binary_classifier:
        parts.append("bc")
    lo, hi = cfg.scale_range
    parts.append(f"sr{round(lo * 100)}{round(hi * 100)}")
    parts.append(cfg.dataset_name)
    if cfg.use_pseudo_masks:
        parts.append("pm")
    parts.append(f"seed{cfg.seed}")
    name = "_".join(parts)
    if cfg.suffix:
        name = f"{name}_{cfg.suffix}"
    return name
