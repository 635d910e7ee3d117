"""End-to-end train/eval smoke over synthetic fixtures (the reference's
``--debug`` 1-batch dry-run workflow, SURVEY §4(e)) + checkpoint/resume."""
import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from sod_tpu.config import Config
from sod_tpu.models.maskformer import MaskFormerConfig, maskformer_init
from sod_tpu.models.vit import ViTConfig
from sod_tpu.ops import rle as rle_codec
from sod_tpu.train import Trainer, restore_checkpoint
from sod_tpu.train.evaluator import Evaluator


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    rng = np.random.RandomState(0)
    duts = root / "data" / "DUTS"
    for sub in ("DUTS-TR-Image", "DUTS-TE-Image", "DUTS-TE-Mask"):
        (duts / sub).mkdir(parents=True)
    pseudo = {}
    for i in range(8):
        name = f"tr_{i:03d}.jpg"
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(duts / "DUTS-TR-Image" / name)
        mask = np.zeros((64, 64), np.uint8)
        mask[10 + i:50, 12:52] = 1
        pseudo[name] = rle_codec.encode(mask)
    for i in range(5):
        img = (rng.rand(56 + 6 * i, 60 + 4 * i, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(duts / "DUTS-TE-Image" / f"te_{i}.jpg")
        gt = np.zeros(img.shape[:2], np.uint8)
        gt[8:40, 9:45] = 255
        Image.fromarray(gt).save(duts / "DUTS-TE-Mask" / f"te_{i}.png")
    fp = root / "pseudo.json"
    with open(fp, "w") as f:
        json.dump(pseudo, f)
    return root


def tiny_setup(root, **over):
    cfg = Config(
        dir_ckpt=str(root / "ckpt"),
        dir_dataset=str(root / "data"),
        pseudo_masks_fp=str(root / "pseudo.json"),
        train_image_size=64,
        eval_image_size=64,
        batch_size=4,
        num_workers=2,
        max_gt_masks=2,
        compute_dtype="float32",
        use_pallas_attention=False,
        benchmarks=["duts"],
        n_epochs=1,
        **over,
    )
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        use_binary_classifier=cfg.use_binary_classifier,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))
    return cfg, mcfg


def test_train_one_epoch_and_eval(workspace):
    cfg, mcfg = tiny_setup(workspace)
    trainer = Trainer(cfg, mcfg=mcfg)
    em = trainer._train_epoch(1)
    assert np.isfinite(em["avg_loss"])
    assert em["avg_dice_loss"] > 0
    assert os.path.isdir(os.path.join(trainer.dir_ckpt, "latest_model"))
    assert os.path.exists(os.path.join(trainer.dir_ckpt, "config.json"))

    bench = trainer._evaluate(1)
    assert "iou (DUTS)" in bench
    assert 0.0 <= bench["iou (DUTS)"] <= 1.0
    assert 0.0 <= bench["s_measure (DUTS)"] <= 1.0
    assert bench["iou_ub (DUTS)"] >= bench["iou (DUTS)"] - 1e-6
    # best-model checkpoint on first improvement
    assert os.path.isdir(os.path.join(trainer.dir_ckpt, "best_model_duts"))
    # CSV written with reference header
    csv = os.path.join(trainer.dir_ckpt, "eval", "duts", "01",
                       "metrics_duts.txt")
    header = open(csv).readline()
    assert header.startswith("iou,pixel_acc,f_score,f_max,f_mean,mae,")


def test_checkpoint_restore_roundtrip(workspace):
    cfg, mcfg = tiny_setup(workspace, suffix="ckpt")
    trainer = Trainer(cfg, mcfg=mcfg)
    trainer._train_epoch(1)
    restored = restore_checkpoint(
        os.path.join(trainer.dir_ckpt, "latest_model"))
    assert restored["epoch"] == 1
    flat_now = jax.tree.leaves(trainer.params)
    flat_saved = jax.tree.leaves(restored["params"])
    assert len(flat_now) == len(flat_saved)
    for a, b in zip(flat_now, flat_saved):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "opt_state" in restored


def test_async_checkpoint_equals_sync_and_resumes(workspace):
    """Config.async_checkpoint overlaps the latest_model write with the
    next epoch on a writer thread: two async epochs leave bit-equal
    params AND a bit-equal durable checkpoint vs the synchronous
    default; a fresh async Trainer resumes from it and continues."""
    params0 = maskformer_init(jax.random.key(3), tiny_setup(workspace)[1])

    cfg_s, mcfg = tiny_setup(workspace, suffix="sync2")
    t_sync = Trainer(cfg_s, mcfg=mcfg, params=params0)
    t_sync._train_epoch(1)
    t_sync._train_epoch(2)

    cfg_a, _ = tiny_setup(workspace, suffix="async2",
                          async_checkpoint=True)
    t_async = Trainer(cfg_a, mcfg=mcfg, params=params0)
    t_async._train_epoch(1)
    t_async._train_epoch(2)          # epoch-1 write still in flight here
    t_async.wait_for_checkpoints()

    for a, b in zip(jax.tree.leaves(t_sync.params),
                    jax.tree.leaves(t_async.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    saved = restore_checkpoint(
        os.path.join(t_async.dir_ckpt, "latest_model"))
    assert saved["epoch"] == 2
    for a, b in zip(jax.tree.leaves(t_async.params),
                    jax.tree.leaves(saved["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t_resume = Trainer(tiny_setup(workspace, suffix="async2",
                                  async_checkpoint=True)[0],
                       mcfg=mcfg, params=params0)
    assert t_resume.resume() == 3
    for a, b in zip(jax.tree.leaves(t_async.params),
                    jax.tree.leaves(t_resume.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_scores_sidecar_survives_kill_window(workspace):
    """The latest_model checkpoint is written BEFORE the epoch's eval, so
    its best_scores trail by one eval; _evaluate writes a post-eval
    sidecar that resume() must prefer — otherwise a kill between the
    epoch-N checkpoint and the epoch-N+1 one makes the resumed run
    clobber a better best_model_* (dress-rehearsal invariant)."""
    cfg, mcfg = tiny_setup(workspace, suffix="sidecar")
    trainer = Trainer(cfg, mcfg=mcfg)
    trainer._train_epoch(1)          # checkpoint: best_scores == {}
    trainer._evaluate(1)             # sidecar: best_scores == epoch-1 eval
    assert trainer.best_scores.get("duts", 0) > 0
    side = os.path.join(trainer.dir_ckpt, "best_scores.json")
    assert os.path.isfile(side)

    # a fresh trainer resuming from latest_model (whose extra carries the
    # PRE-eval tracker) must still see the post-eval scores
    t2 = Trainer(cfg, mcfg=mcfg)
    nxt = t2.resume()
    assert nxt == 2
    assert t2.best_scores == trainer.best_scores

    # max-merge: once a later checkpoint carries the tracker in its
    # extra, a stale/lower sidecar must not win over it
    import json as _json

    best_after_e1 = trainer.best_scores["duts"]
    trainer._train_epoch(2)          # checkpoint extra now has e1 scores
    with open(side, "w") as f:
        _json.dump({"duts": -0.5}, f)
    t3 = Trainer(cfg, mcfg=mcfg)
    assert t3.resume() == 3
    assert t3.best_scores["duts"] == best_after_e1


def test_train_loss_decreases(workspace):
    """A few steps on a fixed batch must reduce the loss (sanity that
    gradients flow through the whole model)."""
    cfg, mcfg = tiny_setup(workspace, suffix="dec")
    cfg = cfg.replace(lr=1e-3)
    from sod_tpu.train.optim import build_optimizer
    from sod_tpu.train.step import make_train_step

    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=1000)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mcfg)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(4, 64, 64, 3).astype(np.float32),
        "gt_masks": (rng.rand(4, 2, 64, 64) > 0.6).astype(np.float32),
        "gt_valid": np.ones((4, 2), bool),
        "labels": np.array([1, 1, 2, 2], np.int32),
    }
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_grad_accumulation_matches_full_batch(workspace):
    """accum_steps=2 over a batch must match the average of per-micro-batch
    grads (same update as computing each half separately and averaging)."""
    import jax.numpy as jnp

    from sod_tpu.train.optim import build_optimizer
    from sod_tpu.train.step import make_train_step

    cfg, mcfg = tiny_setup(workspace, suffix="accum")
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=100)

    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(4, 64, 64, 3).astype(np.float32),
        "gt_masks": (rng.rand(4, 2, 64, 64) > 0.6).astype(np.float32),
        "gt_valid": np.ones((4, 2), bool),
        "labels": np.array([1, 1, 2, 2], np.int32),
    }

    step1 = make_train_step(cfg, tx, mcfg, accum_steps=1)
    step2 = make_train_step(cfg, tx, mcfg, accum_steps=2)

    pa, oa, ma = step2(params, tx.init(params), batch)
    # reference: average the two half-batch grads manually via two
    # accum_steps=1 calls on the halves and optax on the mean
    import optax as _optax

    from sod_tpu.train.step import make_train_step as _mts

    def half(i):
        hb = {k: v[2 * i:2 * i + 2] for k, v in batch.items()}
        from sod_tpu.losses.criterion import criterion_forward
        from sod_tpu.models.maskformer import maskformer_apply

        def loss_fn(p):
            out = maskformer_apply(p, jnp.asarray(hb["image"]), mcfg)
            res = criterion_forward(
                out["mask_pred"].astype(jnp.float32),
                jnp.asarray(hb["gt_masks"]), jnp.asarray(hb["gt_valid"]),
                out.get("objectness"), use_classification_loss=False,
                features=out["features"].astype(jnp.float32),
                feature_labels=jnp.asarray(hb["labels"]),
                weight_contrastive_loss=cfg.weight_contrastive_loss,
                temperature=cfg.temperature)
            return res["loss"]
        return jax.grad(loss_fn)(params)

    g = jax.tree.map(lambda a, b: (a + b) / 2.0, half(0), half(1))
    upd, _ = tx.update(g, tx.init(params), params)
    pb = _optax.apply_updates(params, upd)

    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_exact_grad_accum_matches_accum1_step(workspace):
    """mode="exact" (GradCache two-pass, train/step.py) must reproduce the
    accum_steps=1 update on a batch where the averaged-micro semantics
    genuinely diverge: ragged valid counts across the micro-batches AND a
    non-zero InfoNCE weight (whose negatives span the full batch only in
    exact mode)."""
    from sod_tpu.train.optim import build_optimizer
    from sod_tpu.train.step import make_train_step

    cfg, mcfg = tiny_setup(workspace, suffix="exaccum")
    assert cfg.weight_contrastive_loss != 0.0
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=100)

    rng = np.random.RandomState(1)
    batch = {
        "image": rng.rand(4, 64, 64, 3).astype(np.float32),
        "gt_masks": (rng.rand(4, 2, 64, 64) > 0.6).astype(np.float32),
        # ragged: micro 0 has 3 valid GT rows over 2 images, micro 1 has 1
        # valid image (and one fully-invalid image) -> the micro-local
        # normalisation of averaged mode differs from the global one
        "gt_valid": np.array([[True, True], [True, False],
                              [True, False], [False, False]]),
        "labels": np.array([1, 2, 1, 2], np.int32),
    }

    step1 = make_train_step(cfg, tx, mcfg, accum_steps=1)
    stepx = make_train_step(cfg, tx, mcfg, accum_steps=2, mode="exact")
    stepa = make_train_step(cfg, tx, mcfg, accum_steps=2)  # averaged

    p1, _, m1 = step1(params, tx.init(params), batch)
    px, _, mx = stepx(params, tx.init(params), batch)
    pa, _, ma = stepa(params, tx.init(params), batch)

    # exact == accum_steps=1 (loss and every updated parameter)
    np.testing.assert_allclose(float(mx["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(px), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    # ...and the averaged mode demonstrably does NOT match on this batch
    # (otherwise the assertion above would be vacuous)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(p1))]
    assert max(diffs) > 1e-5, "averaged mode unexpectedly exact here"


def test_exact_accum_no_contrastive_skips_feature_pass(workspace):
    """With weight_contrastive_loss=0 exact mode takes the single-pass
    branch (no feature scan) and still matches accum_steps=1."""
    from sod_tpu.train.optim import build_optimizer
    from sod_tpu.train.step import make_train_step

    cfg, mcfg = tiny_setup(workspace, suffix="exaccum0",
                           weight_contrastive_loss=0.0)
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=100)
    rng = np.random.RandomState(2)
    batch = {
        "image": rng.rand(4, 64, 64, 3).astype(np.float32),
        "gt_masks": (rng.rand(4, 2, 64, 64) > 0.6).astype(np.float32),
        "gt_valid": np.array([[True, True], [True, False],
                              [True, False], [False, False]]),
        "labels": np.array([1, 2, 1, 2], np.int32),
    }
    step1 = make_train_step(cfg, tx, mcfg, accum_steps=1)
    stepx = make_train_step(cfg, tx, mcfg, accum_steps=2, mode="exact")
    p1, _, m1 = step1(params, tx.init(params), batch)
    px, _, mx = stepx(params, tx.init(params), batch)
    np.testing.assert_allclose(float(mx["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(px), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
