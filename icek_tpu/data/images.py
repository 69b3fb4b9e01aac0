"""Image reading / resizing / normalization.

Replicates the reference numeric path (SURVEY.md §7 hard parts):
  * prep: read -> gray->RGB fix -> skimage-style anti-aliased bilinear
    resize to 256x256 float in [0,1] -> CHW float16 into HDF5
    (geo-aware/create_input_files.py:321-338, which calls
    skimage.transform.resize with its defaults);
  * load: /255 AGAIN (a reference quirk kept for checkpoint parity,
    geo-aware/datasets.py:44) -> ImageNet mean/std normalize
    (geo-aware/train.py:139-141).

``resize_like_reference`` reproduces skimage.transform.resize's default
semantics without skimage (not installed here): uint8 -> float64/255
(img_as_float), a Gaussian prefilter with per-axis sigma max(0,(f-1)/2)
on any downscaled axis (anti_aliasing=True default when downscaling),
then order-1 spline (bilinear) resampling on the pixel-AREA grid
(ndi.zoom(grid_mode=True) — output coord i samples input (i+.5)*f-.5),
boundary mode 'reflect' (= ndi 'mirror'), clipped to the input range.
PIL bilinear remains as a fallback when scipy is unavailable.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _have_scipy() -> bool:
    try:
        import scipy.ndimage  # noqa: F401

        return True
    except ImportError:  # pragma: no cover - scipy is in the image
        return False


def resize_like_reference(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """skimage.transform.resize(img, (out_h, out_w)) with default args,
    reproduced with scipy.ndimage (geo-aware/create_input_files.py:332).

    `img` is HWC (or HW) uint8 or float; returns float64 in the input's
    value range scaled by img_as_float semantics (uint8 -> /255).
    """
    import scipy.ndimage as ndi

    x = img.astype(np.float64)
    if img.dtype == np.uint8:
        x = x / 255.0
    factors = [x.shape[0] / out_h, x.shape[1] / out_w] + [1.0] * (x.ndim - 2)
    # anti_aliasing defaults to True iff any axis is downscaled
    if any(f > 1 for f in factors):
        sigma = [max(0.0, (f - 1) / 2) for f in factors]
        filtered = ndi.gaussian_filter(x, sigma, mode="mirror")
    else:
        filtered = x
    out = ndi.zoom(
        filtered, [1.0 / f for f in factors], order=1, mode="mirror",
        grid_mode=True,
    )
    # resize(clip=True): clamp to the input's own value range
    return np.clip(out, x.min(), x.max())


def _resize_pil(img: np.ndarray, size: int) -> np.ndarray:
    """Fallback (round-1 path): PIL bilinear with built-in antialias."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    with Image.fromarray(img) as im:
        im = im.convert("RGB")
        im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.float32) / 255.0


def _use_native_resize() -> bool:
    import os

    if os.environ.get("ICEK_NATIVE_RESIZE", "1") == "0":
        return False
    from icek_tpu import native

    return native.resize_available()


def _prepare(img: np.ndarray, size: int) -> np.ndarray:
    """HWC array -> (3, size, size) float16 in [0, 1], the reference's
    stored-HDF5 numeric contract."""
    if img.ndim == 2:
        # gray -> RGB by channel stacking (create_input_files.py:329-333)
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:  # RGBA: drop alpha (reference would assert-fail)
        img = img[..., :3]
    if img.dtype == np.uint8 and img.shape[0] >= 2 and img.shape[1] >= 2 \
            and _use_native_resize():
        # C++ fused /255 -> resize -> clip -> CHW -> f16 (native/resize.cpp),
        # bit-identical to the scipy path below (tests/test_native.py).
        from icek_tpu import native

        return native.resize_chw_f16(img, size, size)
    if _have_scipy():
        arr = resize_like_reference(img, size, size)
    else:  # pragma: no cover - scipy is in the image
        arr = _resize_pil(img, size)
    return arr.transpose(2, 0, 1).astype(np.float16)


def read_and_resize(path: str, size: int = 256) -> np.ndarray:
    """Read an image file -> (3, size, size) float16 in [0, 1] (CHW)."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode not in ("RGB", "L"):
            im = im.convert("RGB")
        arr = np.asarray(im)
    return _prepare(arr, size)


def prepare_array(img: np.ndarray, size: int = 256) -> np.ndarray:
    """Same as read_and_resize but from an in-memory HWC uint8/float array."""
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return _prepare(img, size)


def normalize_for_model(stored: np.ndarray) -> np.ndarray:
    """HDF5 float16 CHW [0,1] -> model-ready NHWC float32.

    Applies the reference's double /255 then ImageNet normalization, and
    converts CHW->HWC for the NHWC TPU convolutions.
    """
    x = stored.astype(np.float32) / 255.0
    if x.ndim == 3:
        x = x.transpose(1, 2, 0)
        return (x - IMAGENET_MEAN) / IMAGENET_STD
    x = x.transpose(0, 2, 3, 1)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def normalize_in_graph(stored):
    """``normalize_for_model`` as jax ops, for use INSIDE a jitted pipeline.

    Takes the stored HDF5 float16 CHW rows as-is ((B, 3, H, W)); the f16
    upload is 2x smaller than host-normalized f32, and the host skips two
    full-tensor allocation passes per batch (this microVM faults fresh
    pages at 30-100 MB/s — the host normalize was the e2e eval bottleneck).
    XLA fuses the /255, mean/std, and transpose into the first conv's input.
    Within 1 ulp of the host path (XLA strength-reduces the constant
    divides); decoded captions are identical (tests/test_eval_driver.py).
    """
    import jax.numpy as jnp

    x = stored.astype(jnp.float32) / 255.0
    x = jnp.transpose(x, (0, 2, 3, 1))
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
