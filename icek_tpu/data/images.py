"""Image reading / resizing / normalization.

Replicates the reference numeric path (SURVEY.md §7 hard parts):
  * prep: read -> gray->RGB fix -> resize to 256x256 float in [0,1] ->
    CHW float16 into HDF5 (geo-aware/create_input_files.py:321-338);
  * load: /255 AGAIN (a reference quirk kept for checkpoint parity,
    geo-aware/datasets.py:44) -> ImageNet mean/std normalize
    (geo-aware/train.py:139-141).

Resize uses PIL bilinear with its built-in antialias — equivalent in spirit
to skimage.transform.resize's anti-aliased bilinear; files we produce are
self-consistent between train and eval.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def read_and_resize(path: str, size: int = 256) -> np.ndarray:
    """Read an image file -> (3, size, size) float16 in [0, 1] (CHW)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        im = im.resize((size, size), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1).astype(np.float16)


def prepare_array(img: np.ndarray, size: int = 256) -> np.ndarray:
    """Same as read_and_resize but from an in-memory HWC uint8/float array."""
    from PIL import Image

    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    with Image.fromarray(img) as im:
        im = im.convert("RGB")
        im = im.resize((size, size), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1).astype(np.float16)


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
