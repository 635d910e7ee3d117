"""Evaluation entry point (ref ``evaluator.py`` CLI, pyc module consts;
README.md:105-108: ``python evaluator.py --dataset_name duts
--p_state_dict ... --config ...``)."""
from __future__ import annotations

import argparse
import json

from sod_tpu.config import define_experim_name, load_config
from sod_tpu.utils.misc import set_seeds


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sod-tpu evaluate")
    p.add_argument("--config", "-c", type=str, required=True)
    p.add_argument("--p_state_dict", type=str, default=None,
                   help="torch checkpoint (selfmask_nq20.pt style) or an "
                        "orbax checkpoint dir saved by the trainer")
    p.add_argument("--dataset_name", "-dn", type=str, default="duts",
                   choices=["dut_omron", "duts", "ecssd"])
    p.add_argument("--use_gpu", type=bool, default=True)  # parity; unused
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dir_root", type=str, default=".")
    p.add_argument("--gpu_id", type=int, default=0)       # parity; unused
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--cost_type", type=str, default="iou",
                   choices=["iou", "f_measure", "f_max", "mae"])
    p.add_argument("--scale_factor", type=int, default=2,
                   help="pixel-decoder upsample factor (ref evaluator pyc "
                        "164 call surface; must divide the patch size — "
                        "{1, 2, 4, 8} at p=8; the shipped value is 2)")
    p.add_argument("--debug", "-d", action="store_true",
                   help="break after one batch (ref evaluator pyc 272)")
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel mesh size (default: single device; "
                        "batch_size must divide evenly)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (parallel/tp.py; "
                        "requires the XLA compute path)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel ring size (ring attention over "
                        "the canvas token axis, parallel/sp.py; XLA path; "
                        "combine with --tp for the (data, seq, model) "
                        "mesh — ring attention inside Megatron TP groups, "
                        "parallel/sptp.py)")
    return p


def main(argv=None) -> None:
    from sod_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip tunnel recompiles
    args = build_argparser().parse_args(argv)
    cfg = load_config(args.config,
                      {"seed": args.seed, "suffix": args.suffix})
    set_seeds(cfg.seed)

    import jax

    from sod_tpu.models.maskformer import config_from, maskformer_init
    from sod_tpu.train.evaluator import Evaluator

    mcfg = config_from(cfg)
    if args.p_state_dict and args.p_state_dict.endswith((".pt", ".pth",
                                                         ".tar")):
        from sod_tpu.models.convert import convert_maskformer, load_torch_state_dict

        sd = load_torch_state_dict(args.p_state_dict)
        params = jax.tree.map(jax.numpy.asarray, convert_maskformer(
            sd, n_decoder_layers=cfg.n_decoder_layers,
            use_binary_classifier=cfg.use_binary_classifier))
        print(f"Pre-trained weights are loaded from {args.p_state_dict}")
    elif args.p_state_dict:
        from sod_tpu.train.checkpoints import restore_checkpoint

        params = restore_checkpoint(args.p_state_dict)["params"]
        print(f"Checkpoint restored from {args.p_state_dict}")
    else:
        print("No weights given — evaluating a randomly initialised model.")
        params = maskformer_init(jax.random.key(cfg.seed), mcfg)

    mesh = None
    if args.tp > 1 and args.sp > 1:
        # (data, seq, model): ring attention inside Megatron TP groups
        from sod_tpu.parallel import make_mesh_sptp

        mesh = make_mesh_sptp(args.n_devices, args.sp, args.tp)
    elif args.tp > 1:
        from sod_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(args.n_devices, args.tp)
    elif args.sp > 1:
        from sod_tpu.parallel import make_mesh_sp

        mesh = make_mesh_sp(args.n_devices, args.sp)
    elif args.n_devices and args.n_devices > 1:
        from sod_tpu.parallel import make_mesh

        mesh = make_mesh(args.n_devices)

    experim = define_experim_name(cfg)
    evaluator = Evaluator(params, cfg, mcfg, batch_size=args.batch_size,
                          debug=args.debug, mesh=mesh)
    metrics = evaluator(dataset_name=args.dataset_name,
                        dir_ckpt=f"{args.dir_root}/eval/{experim}",
                        batch_size=args.batch_size, cost_type=args.cost_type,
                        scale_factor=args.scale_factor)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
