"""Spectral-cluster-voting pseudo-mask generation (ref
``datasets/mask_generator.py`` bytecode + missing ``clusterings`` module;
behavioural spec in SURVEY §2.8 / §3.4).

Pipeline per image:

1. extract self-supervised features for every requested backbone
   (``dino`` -> ViT-S layer-12 patch tokens; ``mocov2``/``swav`` ->
   dilated-8 ResNet-50 res5 features);
2. bilinear-upsample the feature grid by ``scale_factor`` (ref
   ``configs/...yaml:14``);
3. for every k in ``cluster_sizes`` (live config [2, 3, 4]): spectral (or
   k-means) clustering of the feature nodes -> per-cluster binary masks,
   nearest-upsampled to the image size;
4. pool candidates from all (feature_type x k) clusterings, drop
   degenerate ones (``filter_masks``: full-edge spans / extreme sizes);
5. VOTE: pairwise IoU table over the surviving candidates; the winner is
   the candidate with the highest total agreement (the paper's "spectral
   cluster voting");
6. COCO-RLE-encode the winner -> ``{filename: rle}`` JSON (consumed by
   ``DUTSDataset``, ref ``datasets/duts.py:39-42``).

TPU mapping: feature extraction and clustering (affinity eigensolve +
k-means) run jitted per batch; filtering/voting/RLE run on host NumPy.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.data.clusterings import kmeans, spectral_cluster_multi
from sod_tpu.data.custom import CustomDataset
from sod_tpu.data.loader import DataLoader
from sod_tpu.ops import rle as rle_codec
from sod_tpu.ops.resize import interpolate_bilinear, interpolate_nearest
from sod_tpu.utils.misc import filter_masks


def vote_mask(candidates: np.ndarray) -> int:
    """Index of the candidate agreeing most with the others (pairwise-IoU
    voting, ref mask_generator pyc ``vote_mask``).

    The pairwise counts come from ONE BLAS gram matmul on the 0/1 masks
    (``inter = F F^T``, ``union = area_i + area_j - inter``) instead of
    materializing the [n, n, P] broadcast — bit-identical (counts are
    integers < 2^24, exact in f32) and ~40x faster at the pipeline's 27
    candidates x 224^2 pixels (184 -> ~4 ms/img host, the maskgen
    end-to-end bound — docs/PERFORMANCE.md round 5)."""
    n = len(candidates)
    if n == 1:
        return 0
    flat = (candidates.reshape(n, -1) != 0).astype(np.float32)
    inter = flat @ flat.T                          # [n, n] exact counts
    area = inter.diagonal()                        # |A_i|
    union = area[:, None] + area[None, :] - inter
    iou = inter / np.maximum(union, 1)
    np.fill_diagonal(iou, 0.0)
    return int(np.argmax(iou.sum(-1)))


class MaskGenerator:
    """ref ``MaskGenerator.__init__(cluster_sizes, cluster_type,
    feature_types, use_gpu, device)`` (mask_generator pyc)."""

    def __init__(
        self,
        cluster_sizes: Sequence[int] = (2, 3, 4),
        cluster_type: str = "spectral",
        feature_types: Sequence[str] = ("mocov2", "swav", "dino"),
        use_gpu: bool = True,
        device=None,
        patch_size: int = 16,
        image_size: int = 224,
        scale_factor: int = 2,
        batch_size: int = 16,
        seed: int = 0,
        params: Optional[Dict[str, dict]] = None,
        mesh=None,
    ):
        """:param mesh: optional ``jax.sharding.Mesh`` — each batch's
        extract+cluster program shards its image axis over the mesh's
        ``data`` axis (params replicated; per-image math is untouched, so
        labels equal the single-device run).  The DUTS 10k pass is
        ~13 min on one chip; a data mesh divides it by the axis size."""
        assert cluster_type in ("spectral", "k-means")
        if mesh is not None and batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by the mesh's "
                f"data axis {mesh.shape['data']} — every shard needs "
                "equal rows")
        self.mesh = mesh
        self.cluster_sizes = list(cluster_sizes)
        self.cluster_type = cluster_type
        self.feature_types = list(feature_types)
        self.patch_size = patch_size
        self.image_size = image_size
        self.scale_factor = scale_factor
        self.batch_size = batch_size
        self.seed = seed
        self._params = params or {}
        self._extractors = {}
        self._cluster_fns = {}

    # ------------------------------------------------------------------
    def _get_params(self, feature_type: str):
        """Backbone params: user-provided (converted checkpoints) or random
        (ref downloads DINO/MoCo/SwAV weights, utils/misc.py:190-246)."""
        if feature_type in self._params:
            return self._params[feature_type]
        rng = jax.random.key(self.seed)
        if feature_type == "dino":
            from sod_tpu.models.vit import vit_init, vit_small

            cfg = vit_small(patch_size=self.patch_size)
            self._params[feature_type] = vit_init(rng, cfg)
        else:
            from sod_tpu.models.resnet import resnet50_init

            self._params[feature_type] = resnet50_init(rng)
        return self._params[feature_type]

    def _extract_cluster_fn(self, feature_type: str):
        """ONE jitted program per backbone: uint8 batch -> {k: labels}.

        Round 3 ran extract and cluster as separate dispatches per
        (feature_type, batch), decoded every JPEG three times (one
        DataLoader pass per backbone) and shipped host-normalized float32
        — then round-tripped the label grids through the device again for
        a nearest upsample.  Now: decode once, ship uint8 once (4x less
        transfer), normalize on device, extract + spectral-cluster in one
        program, and fetch only the tiny [B, G, G] label grids.
        """
        if feature_type in self._extractors:
            return self._extractors[feature_type]
        s = self.scale_factor
        ks = tuple(self.cluster_sizes)
        seed = self.seed
        spectral = self.cluster_type == "spectral"

        from sod_tpu.data.augment import normalize_device

        if feature_type == "dino":
            from sod_tpu.models.vit import vit_apply, vit_small

            cfg = vit_small(patch_size=self.patch_size)
            grid = self.image_size // self.patch_size

            def features(params, x):
                tokens = vit_apply(params, x, cfg, all_layers=False)
                feats = tokens[:, 1:, :]                    # layer12 patches
                b, n, d = feats.shape
                f = feats.reshape(b, grid, grid, d).transpose(0, 3, 1, 2)
                f = interpolate_bilinear(f, grid * s, grid * s)
                return f.transpose(0, 2, 3, 1)              # [B, G', G', D]
        else:
            from sod_tpu.models.resnet import resnet50_apply

            def features(params, x):
                f = resnet50_apply(params, x)["res5"]       # [B, h, w, C]
                f = f.transpose(0, 3, 1, 2)
                f = interpolate_bilinear(f, f.shape[-2] * s, f.shape[-1] * s)
                return f.transpose(0, 2, 3, 1)

        @jax.jit
        def run(params, u8):
            feats = features(params, normalize_device(u8))
            b, gh, gw, d = feats.shape
            flat = feats.reshape(b, gh * gw, d)
            if spectral:
                labels = jax.vmap(
                    lambda f: spectral_cluster_multi(f, ks, seed=seed))(flat)
            else:
                labels = tuple(
                    jax.vmap(lambda f, k=k: kmeans(f, k, seed=seed))(flat)
                    for k in ks)
            return {k: lab.reshape(b, gh, gw).astype(jnp.int32)
                    for k, lab in zip(ks, labels)}

        self._extractors[feature_type] = run
        return run

    def _upsample_labels(self, lab: np.ndarray) -> np.ndarray:
        """Nearest-upsample a [G_h, G_w] label grid to the image size on
        HOST.  For exact integer factors ``np.repeat`` equals torch
        nearest (src index = floor(dst*G/S) = dst // factor), so this is
        bit-identical to the round-3 device round trip; non-integer
        grids fall back to the torch-matrix path."""
        gh, gw = lab.shape
        S = self.image_size
        fh, fw = S // gh, S // gw
        if fh * gh == S and fw * gw == S:
            return np.repeat(np.repeat(lab, fh, axis=0), fw, axis=1)
        return np.asarray(interpolate_nearest(
            jnp.asarray(lab[None, None].astype(np.float32)), S, S)
        )[0, 0].astype(lab.dtype)

    def _iter_candidate_stacks(self, p_images: List[str]):
        """Yield ``(p_img, [n_candidates, H, W] uint8)`` per image, with a
        one-batch device/host pipeline: batch i+1's extract+cluster
        programs for ALL backbones are dispatched (async) before batch
        i's labels are fetched and its host work runs, so voting/RLE
        overlaps device compute."""
        ds = CustomDataset(p_images, image_size=self.image_size,
                           square=True, raw_uint8=True)
        loader = DataLoader(ds, batch_size=self.batch_size,
                            shuffle=False, num_workers=4)
        params = {ft: self._get_params(ft) for ft in self.feature_types}
        fns = {ft: self._extract_cluster_fn(ft)
               for ft in self.feature_types}
        if self.mesh is not None:
            from sod_tpu.parallel import batch_sharding, replicated

            rep = replicated(self.mesh)
            params = {ft: jax.device_put(p, rep) for ft, p in params.items()}
            bsh = batch_sharding(self.mesh)

        def finalize(pending):
            samples, results = pending
            # [:len(samples)] trims the wrap-padding rows added below for
            # mesh divisibility of a ragged final batch
            labels_np = {(ft, k): np.asarray(results[ft][k])[:len(samples)]
                         for ft in self.feature_types
                         for k in self.cluster_sizes}
            for i, smp in enumerate(samples):
                cands: List[np.ndarray] = []
                for ft in self.feature_types:
                    for k in self.cluster_sizes:
                        up = self._upsample_labels(labels_np[(ft, k)][i])
                        cands.extend((up == c).astype(np.uint8)
                                     for c in range(k))
                yield smp["p_img"], np.stack(cands, 0)

        pending = None
        for samples in loader:
            arr = np.stack([s["image_u8"] for s in samples])
            if len(arr) < self.batch_size:
                # wrap-pad the ragged FINAL batch (drop_last=False) back
                # to the full static batch: a new leading dim would force
                # a fresh tunnel compile of every backbone program
                # (30 s–minutes each) just for the tail; this also keeps
                # the data-axis divisible under a mesh.  finalize trims
                # the copies via [:len(samples)]
                pad = self.batch_size - len(arr)
                arr = np.concatenate([arr, arr[-1:].repeat(pad, axis=0)])
            x = jnp.asarray(arr)
            if self.mesh is not None:
                x = jax.device_put(x, bsh)
            # dispatch all backbones for THIS batch (async through the
            # tunnel) before paying the fetch for the previous one
            results = {ft: fns[ft](params[ft], x)
                       for ft in self.feature_types}
            if pending is not None:
                yield from finalize(pending)
            pending = (samples, results)
        if pending is not None:
            yield from finalize(pending)

    # ------------------------------------------------------------------
    def extract_candidate_masks(self, p_images: List[str]) -> Dict[str, np.ndarray]:
        """filename -> [n_candidates, H, W] uint8 candidate stacks.

        Candidates are pooled by FULL path — distinct images sharing a
        basename must not vote across each other (the output JSON is
        keyed by basename like the ref's)."""
        return dict(self._iter_candidate_stacks(p_images))

    # ------------------------------------------------------------------
    def _vote_one(self, stack: np.ndarray) -> np.ndarray:
        filtered, _ = filter_masks(stack, remove_long_masks=True,
                                   remove_small_large_masks=True)
        return filtered[vote_mask(filtered)]

    def __call__(self, p_images: List[str]) -> Dict[str, dict]:
        """Generate ``{filename: COCO-RLE}`` for a list of image paths.
        Host-side filter/vote/RLE runs per image as its batch completes,
        overlapped with the next batch's device work."""
        out = {}
        for path, stack in self._iter_candidate_stacks(p_images):
            out[os.path.basename(path)] = rle_codec.encode(
                self._vote_one(stack).astype(np.uint8))
        return out

    def dump(self, p_images: List[str], fp: str) -> None:
        with open(fp, "w") as f:
            json.dump(self(p_images), f)
