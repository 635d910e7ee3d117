"""Clusterings + pseudo-mask generation (SURVEY §2.8)."""
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sod_tpu.data.clusterings import kmeans, spectral_cluster
from sod_tpu.data.mask_generator import MaskGenerator, vote_mask
from sod_tpu.ops import rle as rle_codec
from sod_tpu.utils.misc import filter_masks, mask_to_bbox, to_one_hot


def test_kmeans_separates_blobs(rng):
    a = rng.randn(30, 4) + np.array([5, 0, 0, 0])
    b = rng.randn(30, 4) - np.array([5, 0, 0, 0])
    x = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    labels = np.asarray(kmeans(x, 2, seed=0))
    assert len(np.unique(labels[:30])) == 1
    assert len(np.unique(labels[30:])) == 1
    assert labels[0] != labels[-1]


def test_spectral_separates_blocks(rng):
    # two groups of mutually-similar features
    f1 = rng.randn(1, 8) + 0.05 * rng.randn(20, 8)
    f2 = -f1[:1] + 0.05 * rng.randn(20, 8)
    x = jnp.asarray(np.concatenate([f1, f2]).astype(np.float32))
    labels = np.asarray(spectral_cluster(x, 2, seed=0))
    assert len(np.unique(labels[:20])) == 1
    assert len(np.unique(labels[20:])) == 1
    assert labels[0] != labels[-1]


def test_vote_mask_picks_consensus():
    a = np.zeros((4, 16, 16), np.uint8)
    a[0, 2:10, 2:10] = 1
    a[1, 2:11, 2:10] = 1       # agrees with 0 and 3
    a[2, 12:15, 12:15] = 1     # outlier
    a[3, 2:10, 2:11] = 1
    assert vote_mask(a) in (0, 1, 3)
    flat = a.reshape(4, -1).astype(bool)
    inter = (flat[:, None] & flat[None, :]).sum(-1)
    union = (flat[:, None] | flat[None, :]).sum(-1)
    iou = inter / np.maximum(union, 1)
    np.fill_diagonal(iou, 0)
    assert vote_mask(a) == int(np.argmax(iou.sum(-1)))


def test_vote_and_bbox_match_naive_oracles():
    """The gram-matmul vote and the any-reduction bbox (round-5 host
    fast paths) equal the naive broadcast/np.where formulations on
    randomized pipeline-shaped stacks, including empty masks."""
    r = np.random.RandomState(7)
    for trial in range(6):
        cands = []
        for g in (14, 28):
            for k in (2, 3, 4):
                lab = r.randint(0, k, (g, g))
                up = np.repeat(np.repeat(lab, 224 // g, 0), 224 // g, 1)
                cands.extend((up == c).astype(np.uint8) for c in range(k))
        cands.append(np.zeros((224, 224), np.uint8))     # empty mask
        st = np.stack(cands, 0)

        flat = st.reshape(len(st), -1).astype(bool)
        inter = (flat[:, None] & flat[None, :]).sum(-1)
        union = (flat[:, None] | flat[None, :]).sum(-1)
        iou = inter / np.maximum(union, 1)
        np.fill_diagonal(iou, 0.0)
        assert vote_mask(st) == int(np.argmax(iou.sum(-1)))

        expect = {}
        for i, m in enumerate(st):
            ys, xs = np.where(m)
            if len(ys):
                expect[i] = (int(ys.min()), int(ys.max()),
                             int(xs.min()), int(xs.max()))
        assert mask_to_bbox(st) == expect


def test_filter_masks_drops_edge_spanning():
    m = np.zeros((3, 10, 10), np.uint8)
    m[0, :, 4:6] = 1            # spans full height -> dropped
    m[1, 2:5, 2:5] = 1          # kept
    m[2, 4:6, :] = 1            # spans full width -> dropped
    out, mapping = filter_masks(m, remove_long_masks=True)
    assert out.shape[0] == 1
    assert mapping == {0: 1}


def test_filter_masks_small_large():
    m = np.zeros((2, 20, 20), np.uint8)
    m[0, 5:7, 5:6] = 1          # 2 px < 5% of 400 -> dropped
    m[1, 2:12, 3:13] = 1
    out, _ = filter_masks(m, remove_long_masks=False,
                          remove_small_large_masks=True)
    assert out.shape[0] == 1


def test_to_one_hot_and_bbox():
    mask = np.array([[0, 1], [2, 1]])
    oh = to_one_hot(mask, 3)
    assert oh.shape == (3, 2, 2)
    assert oh[1, 0, 1] == 1 and oh[1, 1, 1] == 1
    bb = mask_to_bbox((mask == 1).astype(np.uint8))
    assert bb[0] == (0, 1, 1, 1)


def test_mask_generator_end_to_end(tmp_path, rng):
    # synthetic images with a clear bright square on dark background
    paths = []
    for i in range(3):
        img = np.full((64, 80, 3), 30, np.uint8)
        img[16:48, 20:60] = 220
        img += rng.randint(0, 10, img.shape).astype(np.uint8)
        fp = tmp_path / f"img_{i}.jpg"
        Image.fromarray(img).save(fp)
        paths.append(str(fp))

    gen = MaskGenerator(cluster_sizes=[2], cluster_type="k-means",
                        feature_types=["dino"], patch_size=8, image_size=32,
                        scale_factor=2, batch_size=2, seed=0)
    out = gen(paths)
    assert set(out) == {f"img_{i}.jpg" for i in range(3)}
    for filename, enc in out.items():
        mask = rle_codec.decode(enc)
        assert mask.shape == (32, 32)
        assert 0 < mask.sum() < 32 * 32


def test_mask_generator_with_mesh_matches_single_device(tmp_path, rng):
    """A data mesh shards each extract+cluster batch; per-image math is
    untouched, so the RLEs equal the single-device run — including the
    ragged final batch (5 images at batch 4 over 4 devices exercises the
    wrap-padding path)."""
    from sod_tpu.parallel import make_mesh

    paths = []
    for i in range(5):
        img = np.full((64, 80, 3), 30, np.uint8)
        img[16:48, 20:60] = 220
        img += rng.randint(0, 10, img.shape).astype(np.uint8)
        fp = tmp_path / f"img_{i}.jpg"
        Image.fromarray(img).save(fp)
        paths.append(str(fp))

    kw = dict(cluster_sizes=[2, 3], cluster_type="spectral",
              feature_types=["dino"], patch_size=8, image_size=32,
              scale_factor=2, batch_size=4, seed=0)
    single = MaskGenerator(**kw)(paths)
    sharded = MaskGenerator(**kw, mesh=make_mesh(4))(paths)
    assert set(single) == set(sharded)
    for k in single:
        np.testing.assert_array_equal(rle_codec.decode(single[k]),
                                      rle_codec.decode(sharded[k]), err_msg=k)
