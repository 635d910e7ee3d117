"""Training entry point (ref ``main.py`` bytecode; README.md usage:
``python main.py --config configs/duts-....yaml``).

Flow (main pyc): yaml -> namespace merge, set_seeds, build maskformer,
dataset, AdamW + poly scheduler, criterion, evaluator, experiment name,
config.json dump, wandb init, Trainer(n_epochs).
"""
from __future__ import annotations

import argparse

from sod_tpu.config import define_experim_name, load_config
from sod_tpu.utils.misc import set_seeds


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sod-tpu train")
    p.add_argument("--config", "-c", type=str, required=True)
    p.add_argument("--debug", "-d", action="store_true")
    p.add_argument("--gpu_id", type=int, default=0,
                   help="kept for reference-CLI parity; device selection is "
                        "JAX's")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--suffix", type=str, default=None)
    p.add_argument("--p_state_dict", type=str, default=None,
                   help="optional torch checkpoint to initialise from")
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (Megatron-style weight "
                        "sharding, parallel/tp.py; total devices = "
                        "n_devices x tp; requires the XLA compute path)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (GPipe over the ViT block "
                        "stack, parallel/pp.py; encoder depth must divide "
                        "evenly; total devices = n_devices x pp; XLA path; "
                        "combine with --tp for the 3-D (data, pipe, model) "
                        "mesh — GPipe stages of Megatron TP groups, "
                        "parallel/p3.py)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel ring size (ring attention over "
                        "the token axis, parallel/sp.py; total devices = "
                        "n_devices x sp; XLA path; combine with --tp for "
                        "the (data, seq, model) mesh — ring attention "
                        "inside Megatron TP groups, parallel/sptp.py; "
                        "mutually exclusive with --pp)")
    p.add_argument("--fsdp", type=str, default=None,
                   choices=["zero1", "full"],
                   help="ZeRO/FSDP state sharding over the data axis "
                        "(parallel/fsdp.py): zero1 shards the fp32 AdamW "
                        "moments (any compute path; composes with "
                        "--tp/--pp/--sp — moments add 'data' on top of "
                        "the params' own layout), full stores the "
                        "weights sharded too (XLA path, plain data mesh "
                        "only); needs --n_devices > 1")
    p.add_argument("--resume", action="store_true",
                   help="resume from this experiment's latest_model "
                        "checkpoint (capability the reference lacks)")
    p.add_argument("--async-checkpoint", action="store_true",
                   help="overlap the per-epoch latest_model write with "
                        "the next epoch (train/checkpoints.AsyncSaver; "
                        "durability weakens by at most one epoch, resume "
                        "contract unchanged)")
    return p


def main(argv=None) -> None:
    from sod_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip tunnel recompiles
    args = build_argparser().parse_args(argv)
    overrides = {"debug": args.debug}
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.suffix is not None:
        overrides["suffix"] = args.suffix
    if args.fsdp is not None:
        overrides["fsdp"] = args.fsdp
    if args.async_checkpoint:
        overrides["async_checkpoint"] = True
    cfg = load_config(args.config, overrides)
    set_seeds(cfg.seed)

    params = None
    if args.p_state_dict:
        from sod_tpu.models.convert import convert_maskformer, load_torch_state_dict

        sd = load_torch_state_dict(args.p_state_dict)
        params = convert_maskformer(
            sd, n_decoder_layers=cfg.n_decoder_layers,
            use_binary_classifier=cfg.use_binary_classifier)
        print(f"Pre-trained weights are loaded from {args.p_state_dict}")

    import jax

    from sod_tpu.parallel import make_mesh, make_mesh_2d, make_mesh_pp
    from sod_tpu.train import Trainer

    # --tp/--pp on the command line win; otherwise honor the config's
    # mesh_model_axis/mesh_pipe_axis (the CLI's always-build-a-mesh
    # default would silently preempt Trainer's own cfg fallback)
    tp = args.tp if args.tp > 1 else getattr(cfg, "mesh_model_axis", 1)
    pp = args.pp if args.pp > 1 else getattr(cfg, "mesh_pipe_axis", 1)
    sp = args.sp if args.sp > 1 else getattr(cfg, "mesh_seq_axis", 1)
    if sp > 1 and pp > 1:
        # GPipe microbatching multiplies the ring's per-tick latency by
        # the stage count on exactly the long-token path SP serves —
        # measured rejection in docs/PARALLEL.md
        raise SystemExit("--sp is mutually exclusive with --pp")
    if sp > 1 and tp > 1:
        # (data, seq, model) mesh: ring attention inside Megatron
        # tensor-parallel groups (parallel/sptp.py)
        from sod_tpu.parallel import make_mesh_sptp

        n_dev = args.n_devices or len(jax.devices()) // (sp * tp)
        mesh = make_mesh_sptp(n_dev, sp, tp)
    elif tp > 1 and pp > 1:
        # 3-D (data, pipe, model) mesh: GPipe stages of Megatron
        # tensor-parallel groups (parallel/p3.py)
        from sod_tpu.parallel import make_mesh_3d

        n_dev = args.n_devices or len(jax.devices()) // (tp * pp)
        mesh = make_mesh_3d(n_dev, pp, tp)
    elif tp > 1:
        n_dev = args.n_devices or len(jax.devices()) // tp
        mesh = make_mesh_2d(n_dev, tp)
    elif pp > 1:
        n_dev = args.n_devices or len(jax.devices()) // pp
        mesh = make_mesh_pp(n_dev, pp)
    elif sp > 1:
        from sod_tpu.parallel import make_mesh_sp

        n_dev = args.n_devices or len(jax.devices()) // sp
        mesh = make_mesh_sp(n_dev, sp)
    else:
        n_dev = args.n_devices or len(jax.devices())
        mesh = make_mesh(n_dev) if n_dev > 1 else None

    trainer = Trainer(cfg, params=params, mesh=mesh, debug=cfg.debug)
    print(f"experiment: {define_experim_name(cfg)} -> {trainer.dir_ckpt}")
    start_epoch = 1
    if args.resume:
        start_epoch = trainer.resume()
        print(f"resumed; continuing from epoch {start_epoch}")
    for epoch in range(start_epoch, cfg.n_epochs + 1):
        trainer._train_epoch(epoch)
        trainer._evaluate(epoch)
    trainer.wait_for_checkpoints()   # async mode: last write is durable
                                     # before the CLI reports completion


if __name__ == "__main__":
    main()
