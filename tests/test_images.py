"""Golden tests for the skimage-parity image resize path.

The reference preps images with skimage.transform.resize's defaults
(geo-aware/create_input_files.py:332): uint8 -> float64/255, Gaussian
prefilter sigma=(f-1)/2 per downscaled axis (boundary 'reflect' == ndi
'mirror'), order-1 resampling on the pixel-area grid, clip to input range.
skimage is not installed here; `resize_like_reference` reproduces it and
these tests pin the numerics against hand-derived values and an
independent straight-numpy oracle (explicit Gaussian conv + bilinear
sampling), NOT against the implementation's own dependencies.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # <5-min core lane (CLAUDE.md)

from icek_tpu.data import images


# ---------------------------------------------------------------------------
# independent oracle: explicit separable gaussian + bilinear area-grid sample
# ---------------------------------------------------------------------------

def _gauss_kernel_1d(sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter's discrete kernel (truncate=4.0)."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _mirror_index(i: np.ndarray, n: int) -> np.ndarray:
    """ndi 'mirror' (= np.pad 'reflect'): reflect about edge pixel centers."""
    if n == 1:
        return np.zeros_like(i)
    period = 2 * (n - 1)
    i = np.abs(i) % period
    return np.where(i >= n, period - i, i)


def _conv1d_mirror(x: np.ndarray, k: np.ndarray, axis: int) -> np.ndarray:
    r = (len(k) - 1) // 2
    idx = np.arange(x.shape[axis])
    out = np.zeros_like(x, dtype=np.float64)
    for j, w in enumerate(k):
        src = _mirror_index(idx + (j - r), x.shape[axis])
        out += w * np.take(x, src, axis=axis)
    return out


def _bilinear_area_grid(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Order-1 sampling at (i+0.5)*f-0.5 with mirror boundary (2D + channels)."""
    res = x
    for axis, out_n in ((0, out_h), (1, out_w)):
        n = res.shape[axis]
        f = n / out_n
        coords = (np.arange(out_n) + 0.5) * f - 0.5
        lo = np.floor(coords).astype(int)
        t = coords - lo
        a = np.take(res, _mirror_index(lo, n), axis=axis)
        b = np.take(res, _mirror_index(lo + 1, n), axis=axis)
        shape = [1] * res.ndim
        shape[axis] = out_n
        res = a * (1 - t.reshape(shape)) + b * t.reshape(shape)
    return res


def _oracle(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    x = img.astype(np.float64)
    if img.dtype == np.uint8:
        x = x / 255.0
    fh, fw = x.shape[0] / out_h, x.shape[1] / out_w
    x_f = x
    if fh > 1:
        x_f = _conv1d_mirror(x_f, _gauss_kernel_1d((fh - 1) / 2), axis=0)
    if fw > 1:
        x_f = _conv1d_mirror(x_f, _gauss_kernel_1d((fw - 1) / 2), axis=1)
    lo, hi = x.min(), x.max()
    return np.clip(_bilinear_area_grid(x_f, out_h, out_w), lo, hi)


# ---------------------------------------------------------------------------
# hand-derived cases
# ---------------------------------------------------------------------------

def test_constant_image_is_exact():
    for shape, out in [((8, 8, 3), 4), ((5, 7, 3), 16), ((256, 256, 3), 256)]:
        img = np.full(shape, 137, np.uint8)
        got = images.resize_like_reference(img, out, out)
        np.testing.assert_allclose(got, 137 / 255.0, rtol=0, atol=1e-12)


def test_upscale_bilinear_hand_values():
    # (1,2) ramp [0, 2] -> (1,4): sample coords -0.25, .25, .75, 1.25 with
    # mirror boundary give [0.5, 0.5, 1.5, 1.5].
    img = np.array([[0.0, 2.0]])
    got = images.resize_like_reference(img, 1, 4)
    np.testing.assert_allclose(got, [[0.5, 0.5, 1.5, 1.5]], atol=1e-12)
    # (2,2) -> (4,4) on a separable ramp: outer product of the 1-D case
    img2 = np.array([[0.0, 2.0], [4.0, 6.0]])
    got2 = images.resize_like_reference(img2, 4, 4)
    expect_cols = np.array([0.5, 0.5, 1.5, 1.5])
    expect_rows = np.array([1.0, 1.0, 3.0, 3.0])  # column ramp [0,4] scaled
    expect = expect_rows[:, None] + expect_cols[None, :]
    np.testing.assert_allclose(got2, expect, atol=1e-12)


def test_downscale_matches_independent_oracle():
    rng = np.random.default_rng(0)
    for in_shape, out in [((8, 8), 4), ((12, 20), 5), ((40, 48), 16)]:
        img = rng.integers(0, 256, in_shape + (3,), dtype=np.uint8)
        got = images.resize_like_reference(img, out, out)
        want = _oracle(img, out, out)
        np.testing.assert_allclose(got, want, atol=1e-10)
        assert got.shape == (out, out, 3)


def test_upscale_matches_independent_oracle():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (10, 6, 3), dtype=np.uint8)
    got = images.resize_like_reference(img, 24, 15)
    np.testing.assert_allclose(got, _oracle(img, 24, 15), atol=1e-10)


def test_mixed_scale_anti_aliases_only_downscaled_axis():
    # H downscaled (sigma>0), W upscaled (sigma=0): still matches the oracle,
    # which applies the filter per-axis exactly like skimage.
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 8, 3), dtype=np.uint8)
    got = images.resize_like_reference(img, 8, 16)
    np.testing.assert_allclose(got, _oracle(img, 8, 16), atol=1e-10)


def test_checkerboard_downscale_hand_reasoning():
    # 4x4 0/1 checkerboard -> 2x2 with AA sigma 0.5: by symmetry every
    # output pixel is exactly 0.5 after the (symmetric) blur + 2x2 area
    # sampling at coords {0.5, 2.5}.
    img = np.indices((4, 4)).sum(axis=0) % 2
    got = images.resize_like_reference(img.astype(np.float64), 2, 2)
    np.testing.assert_allclose(got, 0.5, atol=1e-12)


def test_prepare_array_contract():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    out = images.prepare_array(img, size=32)
    assert out.shape == (3, 32, 32)
    assert out.dtype == np.float16
    assert out.min() >= 0.0 and out.max() <= 1.0
    # CHW transpose of the resize output (float16 round-trip)
    want = images.resize_like_reference(img, 32, 32).transpose(2, 0, 1)
    np.testing.assert_allclose(out, want.astype(np.float16), atol=0)


def test_grayscale_read_path(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    p = tmp_path / "gray.png"
    Image.fromarray(arr, mode="L").save(p)
    out = images.read_and_resize(str(p), size=16)
    assert out.shape == (3, 16, 16)
    # gray -> RGB stacking happens BEFORE resize (create_input_files.py:329)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[1], out[2])
    want = images.resize_like_reference(
        np.stack([arr] * 3, axis=-1), 16, 16
    ).transpose(2, 0, 1).astype(np.float16)
    np.testing.assert_array_equal(out, want)


@pytest.mark.skipif(
    not images._have_scipy(), reason="scipy unavailable: PIL fallback in use"
)
def test_scipy_path_is_default():
    assert images._have_scipy()
