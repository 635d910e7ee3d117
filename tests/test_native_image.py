"""Native image kernels (sodimage.cc) vs their PIL/NumPy/scipy oracles.

These kernels carry the host side of both end-to-end products
(VERDICT r4 item 1): /predict's resize + LANCZOS restore + heatmap +
PNG encode (ref app.py:296-334) and the train loader's photometric
augmentation (ref datasets/base_dataset.py:94-102).  Everything except
the blur is BIT-identical to its oracle; the blur's float32 tap order
differs (<= ~1e-4 on [0, 255] data, documented in augment.gaussian_blur).
"""
import io

import numpy as np
import pytest
from PIL import Image

from sod_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _photo(h, w, seed=0):
    r = np.random.RandomState(seed)
    return np.clip(np.cumsum(r.randn(h, w, 3), axis=1) * 4 + 128,
                   0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# PNG encoder
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("filter_sub", [True, False])
@pytest.mark.parametrize("shape", [(1, 1), (2, 3, 3), (30, 41), (30, 41, 3),
                                   (257, 130, 3)])
def test_png_roundtrip_exact(shape, filter_sub, rng):
    a = (rng.rand(*shape) * 255).astype(np.uint8)
    png = native.png_encode(a, filter_sub=filter_sub)
    back = np.asarray(Image.open(io.BytesIO(png)))
    assert np.array_equal(back, a)


def test_png_flat_mask_compresses(rng):
    """Run matching: a flat mask (the /predict mask payload shape) must
    compress far below raw size."""
    m = np.zeros((300, 400), np.uint8)
    m[80:220, 100:300] = 230
    png = native.png_encode(m)
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(png))), m)
    assert len(png) < 300 * 400 // 20


def test_png_photo_roundtrip():
    a = _photo(240, 320)
    png = native.png_encode(a)
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(png))), a)


# ---------------------------------------------------------------------------
# PIL-exact resampling
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("mode,pil_f", [("bilinear", Image.BILINEAR),
                                        ("lanczos", Image.LANCZOS)])
@pytest.mark.parametrize("src,dst", [((332, 400), (224, 224)),
                                     ((224, 224), (300, 400)),
                                     ((7, 9), (224, 224)),
                                     ((224, 224), (224, 224))])
def test_resize_bit_identical_to_pil(src, dst, mode, pil_f, rng):
    a3 = (rng.rand(*src, 3) * 255).astype(np.uint8)
    a1 = (rng.rand(*src) * 255).astype(np.uint8)
    got3 = native.resize_u8(a3, dst, mode)
    ref3 = np.asarray(Image.fromarray(a3).resize(dst[::-1], pil_f))
    assert np.array_equal(got3, ref3)
    got1 = native.resize_u8(a1, dst, mode)
    ref1 = np.asarray(Image.fromarray(a1).resize(dst[::-1], pil_f))
    assert np.array_equal(got1, ref1)


def test_resize_nearest_matches_numpy(rng):
    from sod_tpu.data.augment import resize_mask_nearest

    m = (rng.rand(3, 37, 53) > 0.5).astype(np.uint8)
    got = native.resize_nearest(m, (224, 117))
    h, w = 37, 53
    rows = np.minimum((np.arange(224) * (h / 224)).astype(np.int64), h - 1)
    cols = np.minimum((np.arange(117) * (w / 117)).astype(np.int64), w - 1)
    ref = m[..., rows[:, None], cols[None, :]]
    assert np.array_equal(got, ref)
    # the public wrapper routes through the native path
    assert np.array_equal(resize_mask_nearest(m, (224, 117)), ref)


# ---------------------------------------------------------------------------
# heatmap blend
# ---------------------------------------------------------------------------
def test_jet_blend_bit_identical(rng):
    from sod_tpu.serving.inference import _JET_LUT

    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    mask = (rng.rand(120, 160) * 255).astype(np.uint8)
    ref = ((img.astype(np.uint16) + _JET_LUT[mask]) >> 1).astype(np.uint8)
    assert np.array_equal(native.jet_blend(img, mask, _JET_LUT), ref)


# ---------------------------------------------------------------------------
# blur (scipy twin, documented tolerance)
# ---------------------------------------------------------------------------
def test_blur_matches_scipy(rng):
    from scipy.ndimage import correlate1d

    arr = (rng.rand(64, 80, 3) * 255).astype(np.float32)
    x = np.arange(23) - 11
    k = np.exp(-(x ** 2) / (2 * 1.3 * 1.3)).astype(np.float32)
    k /= k.sum()
    ref = correlate1d(arr, k, axis=0, mode="mirror")
    ref = np.clip(correlate1d(ref, k, axis=1, mode="mirror"), 0, 255)
    got = native.blur_mirror(arr, k)
    np.testing.assert_allclose(got, ref, atol=1e-3)


# ---------------------------------------------------------------------------
# color-jitter ops
# ---------------------------------------------------------------------------
def test_affine_clip_matches_numpy(rng):
    a = (rng.rand(50, 60, 3) * 300 - 20).astype(np.float32)
    b = np.ascontiguousarray(a.copy())
    assert native.affine_clip_(b, 1.3, 7.25)
    ref = np.clip(a * np.float32(1.3) + np.float32(7.25), 0, 255)
    np.testing.assert_array_equal(b, ref)


def test_saturate_clip_matches_numpy(rng):
    a = (rng.rand(50, 60, 3) * 255).astype(np.float32)
    b = np.ascontiguousarray(a.copy())
    assert native.saturate_clip_(b, 0.7)
    gray = (0.299 * a[..., 0] + 0.587 * a[..., 1]
            + 0.114 * a[..., 2])[..., None]
    ref = np.clip(a * np.float32(0.7) + gray * np.float32(0.3), 0, 255)
    np.testing.assert_array_equal(b, ref)


def test_gray_mean_close(rng):
    a = np.ascontiguousarray((rng.rand(50, 60, 3) * 255).astype(np.float32))
    gm = native.gray_mean(a)
    ref = float((0.299 * a[..., 0] + 0.587 * a[..., 1]
                 + 0.114 * a[..., 2]).mean())
    # double vs float32-pairwise accumulation; the consumer round()s
    assert abs(gm - ref) < 1e-3


def test_grayscale3_matches_numpy(rng):
    a = np.ascontiguousarray((rng.rand(50, 60, 3) * 255).astype(np.float32))
    got = native.grayscale3(a)
    g = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    ref = np.repeat(np.round(g)[..., None], 3, axis=-1)
    np.testing.assert_array_equal(got, ref)


def test_quantize_matches_numpy(rng):
    a = np.ascontiguousarray((rng.rand(50, 60, 3) * 300 - 20)
                             .astype(np.float32))
    got = native.quantize_u8(a)
    ref = np.clip(np.round(a), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# hue shift (PIL HSV round-trip, bit-identical)
# ---------------------------------------------------------------------------
def _pil_hue(arr, delta):
    hsv = np.array(Image.fromarray(arr).convert("HSV"))
    hsv[..., 0] = (hsv[..., 0].astype(np.int32) + delta) % 256
    return np.array(Image.fromarray(hsv, "HSV").convert("RGB"))


# pixels that distinguished the candidate formulas while pinning PIL's
# exact arithmetic (sector boundaries, x.4999/x.9999 rounding edges)
_HUE_EDGE_PIXELS = np.array(
    [[0, 0, 22], [0, 2, 85], [0, 4, 85], [1, 2, 3], [10, 200, 30],
     [255, 254, 1], [25, 0, 20], [177, 9, 135], [242, 74, 200],
     [136, 9, 177], [201, 74, 242], [0, 0, 0], [255, 255, 255],
     [85, 85, 85]], np.uint8)


@pytest.mark.parametrize("delta", [0, 13, -37, 51, 127])
def test_hue_shift_bit_identical_to_pil(delta, rng):
    sample = (rng.rand(200, 300, 3) * 255).astype(np.uint8)
    arr = np.concatenate([sample.reshape(-1, 3), _HUE_EDGE_PIXELS]
                         ).reshape(1, -1, 3)
    got = native.hue_shift(arr, delta)
    assert np.array_equal(got, _pil_hue(arr, delta))


def test_hue_shift_f32_matches_u8_path(rng):
    a = np.ascontiguousarray((rng.rand(64, 80, 3) * 255).astype(np.float32))
    got = native.hue_shift_f32(a, 37)
    ref = native.hue_shift(a.astype(np.uint8), 37).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_hue_shift_full_cube_slice(rng):
    """A 1/64 systematic slice of the RGB cube (the full 256^3 cube was
    validated exhaustively during development; this keeps CI honest at
    1/64 the cost)."""
    r8 = np.arange(0, 256, 4, dtype=np.uint8)
    g8 = np.arange(0, 256, 4, dtype=np.uint8)
    b8 = np.arange(0, 256, 4, dtype=np.uint8)
    cube = np.stack(np.meshgrid(r8, g8, b8, indexing="ij"),
                    -1).reshape(512, 512, 3).astype(np.uint8)
    for delta in (0, -37):
        assert np.array_equal(native.hue_shift(cube, delta),
                              _pil_hue(cube, delta))


# ---------------------------------------------------------------------------
# /predict pipeline: fast PNG mode returns the same pixels as PIL mode
# ---------------------------------------------------------------------------
def test_predict_pipeline_fast_png_same_pixels(monkeypatch, rng):
    import base64
    from types import SimpleNamespace

    import sod_tpu.serving.inference as inf

    class Mock(inf.PredictPipeline):
        cfg = SimpleNamespace(eval_image_size=32)

        def model_step(self, arr):
            m = np.zeros((32, 32), np.uint8)
            m[8:24, 8:20] = 230
            return m, np.linspace(0, 1, 5).astype(np.float32)

    img = Image.fromarray((rng.rand(40, 50, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")

    def decode_all(out):
        return {k: np.asarray(Image.open(io.BytesIO(
            base64.b64decode(out[k]))).convert("RGB"))
            for k in ("original", "mask", "heatmap")}

    svc = Mock()
    monkeypatch.setattr(inf, "_PNG_MODE", "fast")
    fast = decode_all(svc.predict(buf.getvalue()))
    monkeypatch.setattr(inf, "_PNG_MODE", "pil")
    pil = decode_all(svc.predict(buf.getvalue()))
    for k in fast:
        np.testing.assert_array_equal(fast[k], pil[k], err_msg=k)
