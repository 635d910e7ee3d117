"""C++ native kernels vs NumPy/scipy references (built on demand; all
tests skip if no toolchain)."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sod_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_rle_native_matches_numpy(rng):
    # force both paths by computing numpy expectations inline
    from sod_tpu.ops import rle as R

    for _ in range(10):
        h, w = rng.randint(1, 60, 2)
        m = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        counts_nat = native.counts_from_mask(m)
        flat = m.flatten(order="F")
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        runs = np.diff(np.concatenate([[0], change, [flat.size]]))
        if flat[0] == 1:
            runs = np.concatenate([[0], runs])
        np.testing.assert_array_equal(counts_nat, runs)

        # roundtrip through string + mask
        s = native.string_from_counts(counts_nat)
        back = native.counts_from_string(s)
        np.testing.assert_array_equal(back, counts_nat)
        m2 = native.mask_from_counts(counts_nat, h, w)
        np.testing.assert_array_equal(m2, m)

        # full codec path (uses native under the hood)
        assert (R.decode(R.encode(m)) == m).all()


def test_hungarian_native_matches_scipy(rng):
    for shape in [(2, 5), (8, 20), (10, 10)]:
        cost = rng.randn(*shape)
        ours = native.hungarian(cost)
        rows, cols = linear_sum_assignment(cost)
        ours_cost = cost[np.arange(shape[0]), ours].sum()
        np.testing.assert_allclose(ours_cost, cost[rows, cols].sum(),
                                   rtol=1e-9)
        assert len(set(ours.tolist())) == shape[0]


def test_label_matches_scipy(rng):
    from scipy import ndimage

    for _ in range(5):
        m = (rng.rand(30, 40) > 0.6).astype(np.uint8)
        ours, n_ours = native.label(m)
        theirs, n_theirs = ndimage.label(m)
        assert n_ours == n_theirs
        # labels may be permuted; compare co-partition
        for lbl in range(1, n_ours + 1):
            region = ours == lbl
            their_vals = np.unique(theirs[region])
            assert len(their_vals) == 1 and their_vals[0] != 0


def test_fill_holes_matches_scipy(rng):
    from scipy import ndimage

    for _ in range(5):
        m = (rng.rand(25, 25) > 0.5)
        ours = native.fill_holes(m.astype(np.uint8))
        theirs = ndimage.binary_fill_holes(m)
        np.testing.assert_array_equal(ours, theirs)


def test_decode_rejects_negative_counts():
    """Crafted counts with negatives summing to h*w must raise, never
    write out of bounds (native + fallback)."""
    import pytest

    from sod_tpu.ops import rle

    bad = {"size": [4, 4], "counts": [21, -5]}
    with pytest.raises(ValueError):
        rle.decode(bad)
