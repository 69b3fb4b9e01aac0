"""Post-training int8 quantization of the folded ResNet-101 encoder.

The bf16 folded encoder (``resnet.resnet_encode_folded``) is HBM-bandwidth
bound at ~80% of the conv-fusion roofline (BASELINE.md, round-3 encode
profile); the only lever left is the arithmetic itself.  On TPU v5e the MXU
runs int8xint8->int32 convolutions at 2x the bf16 rate AND the int8
activations halve the HBM traffic — a 20-conv chain at a representative
ResNet shape measured 1.66x over bf16 end-to-end (round-3 probe).

Scheme (standard symmetric PTQ):

- Weights: per-output-channel symmetric int8 — ``wq[...,c] =
  round(w[...,c]/s_w[c])`` with ``s_w[c] = max|w[...,c]|/127``.  The folded
  conv bias stays f32 and is applied in the epilogue.
- Activations: static per-tensor scales from a calibration pass
  (:func:`calibrate`) that records the running max of every requantization
  point over representative batches.  Post-ReLU tensors are non-negative so
  quantized values live in [0, 127]; the network input uses the full
  symmetric [-127, 127] range.
- Each conv runs ``int8 x int8 -> int32`` (``preferred_element_type``), and
  its epilogue — ``acc * (a_in * s_w) + b``, residual add, ReLU, requantize
  — is f32 elementwise that XLA fuses into the conv, so inter-layer HBM
  traffic is int8.
- The adaptive-average-pool + 1x1 projection tail runs in ``compute_dtype``
  (14x14 spatial — negligible traffic, and pooling f32 keeps the token
  statistics clean).

MaxPool commutes with requantization (positive scale is monotonic), so the
stem pools the already-quantized int8 tensor.

This path changes arithmetic — captions are NOT guaranteed identical to the
bf16 pipeline (unlike BN folding, which is a reassociation).  It is opt-in:
quantize explicitly with :func:`calibrate` + :func:`quantize` (or
:func:`calibrate_and_quantize`) and pass the tree to
``Evaluator(encoder_qtree=...)``.  Calibration data choice is part of the
model artifact; persist the tree (it is a plain pytree) next to checkpoints.

Reference parity note: the reference has no quantized path (encoder built at
geo-aware/models.py:24-46, always fp32); this is a beyond-reference serving
optimization.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp

from icek_tpu.models import resnet


# --------------------------------------------------------------------------
# Quantization helpers
# --------------------------------------------------------------------------

def _weight_scales(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric scales for an HWIO weight."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    return jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)


def _quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    s = _weight_scales(w)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return wq, s


def _requant_relu(y: jnp.ndarray, inv_a: jnp.ndarray) -> jnp.ndarray:
    """ReLU + symmetric requantization to the non-negative int8 range."""
    return jnp.clip(jnp.round(jax.nn.relu(y) * inv_a), 0, 127).astype(jnp.int8)


def _qconv(xq: jnp.ndarray, wq: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """int8 x int8 -> int32 conv, torch-style same-ish padding."""
    kh = wq.shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _scale(x) -> jnp.ndarray:
    """max -> scale, guarding all-zero calibration tensors."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(x > 0, x / 127.0, jnp.float32(1.0))


# --------------------------------------------------------------------------
# Calibration
# --------------------------------------------------------------------------

def observe(folded, images: jnp.ndarray, compute_dtype=jnp.bfloat16,
            per_image: bool = False) -> Dict:
    """One folded forward pass recording the max at every requantization
    point.  Returns a pytree of f32 scalars with the same keying the
    quantized tree uses; jit-safe (call under jit for speed, then take the
    elementwise running max across batches on the host or with jnp.maximum).

    ``per_image=True`` reduces over the spatial/channel axes only, returning
    (B,) per-image maxima per site — the input for percentile calibration
    (:func:`calibrate` mode="percentile").

    Layout: {"a_img", "a_stem", "layer{1..4}": [{"a1","a2","a_out"}, ...]}.
    """
    axes = (1, 2, 3) if per_image else None

    def mx(t):
        return jnp.max(t, axis=axes).astype(jnp.float32)

    obs: Dict = {"a_img": mx(jnp.abs(images))}

    def cb(block, name, y, s=1):
        return resnet.conv(y, block[name], s, compute_dtype) + block[
            name.replace("conv", "b")
        ].astype(compute_dtype)

    x = resnet.conv(images, folded["conv1"], 2, compute_dtype) + folded[
        "b1"
    ].astype(compute_dtype)
    x = jax.nn.relu(x)
    obs["a_stem"] = mx(x)
    x = resnet.max_pool_3x3_s2(x)
    for stage in range(1, 5):
        stage_obs: List[Dict] = []
        for b, block in enumerate(folded[f"layer{stage}"]):
            stride = 2 if (stage > 1 and b == 0) else 1
            o: Dict = {}
            out = jax.nn.relu(cb(block, "conv1", x))
            o["a1"] = mx(out)
            out = jax.nn.relu(cb(block, "conv2", out, stride))
            o["a2"] = mx(out)
            out = cb(block, "conv3", out)
            if "down_conv" in block:
                shortcut = cb(block, "down_conv", x, stride)
            else:
                shortcut = x.astype(out.dtype)
            x = jax.nn.relu(out + shortcut)
            o["a_out"] = mx(x)
            stage_obs.append(o)
        obs[f"layer{stage}"] = stage_obs
    return obs


def calibrate(folded, batches: Iterable[jnp.ndarray],
              compute_dtype=jnp.bfloat16,
              mode: str = "max", percentile: float = 99.5) -> Dict:
    """Activation-scale observation over calibration batches (normalized
    NHWC float images).  Returns the observation pytree.

    mode="max" (default): running elementwise max of :func:`observe`.
    SENSITIVITY: a pure running max has no outlier rejection — a single
    extreme activation anywhere in the calibration stream permanently
    inflates that tensor's per-tensor scale and crushes quantization
    resolution for typical values.  Calibrate on several representative
    batches from the distribution you will serve (and NOT on the split
    whose metrics you report — tools/quantize_encoder.py --split), and
    sanity-check quality (cosine vs the float encoder on held-out images)
    before deploying a tree.

    mode="percentile": per-site ``percentile`` (default 99.5) over the
    PER-IMAGE maxima across all calibration images — one anomalous image
    no longer owns every scale (it is outvoted at the percentile), at the
    cost of clipping the true activation range of the top
    (100-percentile)% images.  Note the rejection unit is the image: an
    extreme single pixel inside an otherwise typical image still sets
    that image's per-image max.  Requires enough calibration images for
    the percentile to bind (with fewer than ~1/(100-percentile)*100
    images it degenerates to the max)."""
    if mode not in ("max", "percentile"):
        raise ValueError(f"mode must be 'max'/'percentile', got {mode!r}")
    per_image = mode == "percentile"
    run = jax.jit(
        lambda imgs: observe(folded, imgs, compute_dtype, per_image=per_image)
    )
    if mode == "max":
        acc = None
        for images in batches:
            o = run(images)
            acc = o if acc is None else jax.tree.map(jnp.maximum, acc, o)
        if acc is None:
            raise ValueError("calibrate() needs at least one batch")
        return jax.device_get(acc)
    collected = [jax.device_get(run(images)) for images in batches]
    if not collected:
        raise ValueError("calibrate() needs at least one batch")
    import numpy as np

    return jax.tree.map(
        lambda *xs: np.float32(
            np.percentile(np.concatenate([np.atleast_1d(x) for x in xs]),
                          percentile)
        ),
        *collected,
    )


# --------------------------------------------------------------------------
# Quantized tree
# --------------------------------------------------------------------------

def quantize(folded, obs: Dict, source_params=None) -> Dict:
    """Folded tree + calibration observations -> int8 inference tree.

    Per conv site: {"wq" int8 HWIO, "es" f32 (Cout,) = a_in * s_w (the
    epilogue dequant scale), "b" f32 bias}.  Per requant point: "inv_*"
    f32 reciprocal scales.  "proj" passes through in float.

    ``source_params`` (the UNFOLDED checkpoint encoder tree ``folded`` was
    derived from) binds the artifact to its weights by content fingerprint
    — :func:`verify_qtree` then rejects a stale/mismatched tree at load
    time.  The raw tree is hashed (not the folded one) so the check is
    backend-independent: the fold's float arithmetic may differ by an ulp
    between CPU and TPU, raw checkpoint bytes never do.
    """
    def site(w, bias, a_in):
        wq, sw = _quantize_weight(w)
        return {"wq": wq, "es": (jnp.float32(a_in) * sw).astype(jnp.float32),
                "b": jnp.asarray(bias, jnp.float32)}

    a_img = _scale(obs["a_img"])
    a_stem = _scale(obs["a_stem"])
    out: Dict = {
        "inv_img": 1.0 / a_img,
        "conv1": site(folded["conv1"], folded["b1"], a_img),
        "inv_stem": 1.0 / a_stem,
    }
    a_x = a_stem
    for stage in range(1, 5):
        blocks = []
        for block, o in zip(folded[f"layer{stage}"], obs[f"layer{stage}"]):
            a1, a2 = _scale(o["a1"]), _scale(o["a2"])
            a_out = _scale(o["a_out"])
            qb = {
                "conv1": site(block["conv1"], block["b1"], a_x),
                "inv_a1": 1.0 / a1,
                "conv2": site(block["conv2"], block["b2"], a1),
                "inv_a2": 1.0 / a2,
                "conv3": site(block["conv3"], block["b3"], a2),
                "a_x": a_x,
                "inv_out": 1.0 / a_out,
            }
            if "down_conv" in block:
                qb["down_conv"] = site(block["down_conv"], block["down_b"], a_x)
            blocks.append(qb)
            a_x = a_out
        out[f"layer{stage}"] = blocks
    out["a_final"] = a_x
    out["proj"] = folded["proj"]
    if source_params is not None:
        # bind the artifact to the weights it was baked from; verify_qtree
        # rejects a stale/mismatched tree (wrong checkpoint) at load time
        out["_fingerprint"] = encoder_fingerprint(source_params)
    return out


def encoder_fingerprint(encoder_params):
    """Content hash of the raw (unfolded) encoder tree, as a uint8 array
    (msgpack-safe leaf for storage inside the qtree)."""
    import numpy as np

    from icek_tpu.utils.fingerprint import tree_fingerprint

    fp = tree_fingerprint(encoder_params, extra=("resnet101-raw",))
    return np.frombuffer(fp.encode(), dtype=np.uint8).copy()


def verify_qtree(qtree: Dict, encoder_params,
                 context: str = "encoder qtree") -> None:
    """Raise if ``qtree`` was quantized from different weights than the
    checkpoint's (unfolded) encoder tree.  Trees predating fingerprint
    recording pass with a loud warning — they cannot be verified."""
    import sys

    import numpy as np

    recorded = qtree.get("_fingerprint")
    if recorded is None:
        print(f"WARNING: {context} predates fingerprint recording — "
              f"cannot verify it matches the checkpoint's encoder "
              f"(re-quantize with tools/quantize_encoder.py to bind it)",
              file=sys.stderr)
        return
    want = encoder_fingerprint(encoder_params)
    if not np.array_equal(np.asarray(recorded), want):
        raise ValueError(
            f"{context} was quantized from DIFFERENT encoder weights than "
            f"this checkpoint (fingerprint mismatch) — its baked-in int8 "
            f"weights would silently serve another model's encodings. "
            f"Re-quantize with tools/quantize_encoder.py."
        )


def calibrate_and_quantize(folded, batches: Iterable[jnp.ndarray],
                           compute_dtype=jnp.bfloat16,
                           source_params=None,
                           mode: str = "max",
                           percentile: float = 99.5) -> Dict:
    return quantize(
        folded,
        calibrate(folded, batches, compute_dtype, mode=mode,
                  percentile=percentile),
        source_params=source_params,
    )


def save_qtree(qtree: Dict, path: str) -> None:
    """Persist a quantized tree (calibration is part of the model artifact
    — ship the tree with the checkpoint, don't recalibrate per host)."""
    from flax import serialization

    blob = serialization.msgpack_serialize(jax.device_get(qtree))
    with open(path, "wb") as f:
        f.write(blob)


def load_qtree(path: str) -> Dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _site_out(site, xq, stride=1):
    """Dequantized f32 conv output: acc * es + b."""
    acc = _qconv(xq, site["wq"], stride)
    return acc.astype(jnp.float32) * site["es"] + site["b"]


def resnet_encode_int8(
    qtree,
    images: jnp.ndarray,             # (B, H, W, 3) normalized NHWC float
    encoded_size: int = 14,
    compute_dtype=jnp.bfloat16,
):
    """int8 ``resnet_encode_folded``: images -> (B, encoded_size**2, D)
    tokens, h-major (reference flatten order, geo models.py:46)."""
    xq = jnp.clip(
        jnp.round(images.astype(jnp.float32) * qtree["inv_img"]), -127, 127
    ).astype(jnp.int8)
    y = _site_out(qtree["conv1"], xq, 2)
    xq = _requant_relu(y, qtree["inv_stem"])
    # int8 maxpool: requantization is monotonic, so pooling the quantized
    # tensor equals quantizing the pooled tensor.  reduce_window needs the
    # int8 identity, not -inf.
    xq = jax.lax.reduce_window(
        xq, jnp.int8(-128), jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage in range(1, 5):
        for b, qb in enumerate(qtree[f"layer{stage}"]):
            stride = 2 if (stage > 1 and b == 0) else 1
            out = _requant_relu(_site_out(qb["conv1"], xq), qb["inv_a1"])
            out = _requant_relu(_site_out(qb["conv2"], out, stride),
                                qb["inv_a2"])
            y = _site_out(qb["conv3"], out)
            if "down_conv" in qb:
                shortcut = _site_out(qb["down_conv"], xq, stride)
            else:
                shortcut = xq.astype(jnp.float32) * qb["a_x"]
            xq = _requant_relu(y + shortcut, qb["inv_out"])
    x = xq.astype(compute_dtype) * qtree["a_final"].astype(compute_dtype)
    x = resnet.adaptive_avg_pool(x, (encoded_size, encoded_size))
    x = resnet.conv(x, qtree["proj"]["w"], 1, compute_dtype) + qtree["proj"][
        "b"
    ].astype(compute_dtype)
    B, H, W, D = x.shape
    return x.reshape(B, H * W, D)
