"""Deterministic content fingerprints for parameter pytrees.

Used to bind derived artifacts to the exact weights that produced them:

  * the eval-side token cache (eval_driver.Evaluator.cache_split_tokens)
    stores the encoder fingerprint with the cached tokens, so a cache
    built under one checkpoint is never silently served under another;
  * int8 PTQ encoder trees (models/resnet_int8.py) record the folded
    encoder's fingerprint at quantization time and verify it at load —
    a stale qtree baked from different weights fails loudly instead of
    serving encodings from a model nobody asked for.

The hash is sha256 over each leaf's dtype, shape, and raw bytes in
``jax.tree_util.tree_flatten`` order (deterministic for a fixed tree
structure), plus any caller-supplied context strings (compute dtype,
pool size, ...).  bfloat16 leaves hash via their ml_dtypes numpy view.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def tree_fingerprint(tree, extra=()) -> str:
    """Hex sha256 of every array leaf's contents + ``extra`` context."""
    h = hashlib.sha256()
    for item in extra:
        h.update(repr(item).encode())
        h.update(b"\x00")
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(repr(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode())
        h.update(repr(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()
