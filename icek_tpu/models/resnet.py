"""ResNet-101 image encoder, pure JAX/XLA (NHWC).

TPU-native rebuild of the reference Encoder (geo-aware/models.py:9-60):
ResNet-101 minus fc/avgpool, adaptive-average-pool to 14x14, then a 1x1 conv
2048 -> emb_dim, yielding 196 image tokens per image.

* convolutions run NHWC (XLA's preferred TPU layout) in a configurable
  compute dtype (bfloat16 by default on TPU);
* AdaptiveAvgPool2d is implemented exactly (including its upsampling
  behavior for 8x8 -> 14x14 inputs) as two small einsum contractions with
  precomputed averaging matrices;
* batch-norm runs in inference mode (running stats) when the encoder is
  frozen — the reference default (fine_tune_encoder=False, train.py:52) —
  and in batch-stats mode when fine-tuning.

Weights import from a torchvision ``resnet101`` state_dict via
``import_torch_state`` (used by the checkpoint porter).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_COUNTS = (3, 4, 23, 3)          # resnet101
STAGE_WIDTHS = (64, 128, 256, 512)
EXPANSION = 4


# --------------------------------------------------------------------------
# Primitives
# --------------------------------------------------------------------------

def conv(x, w, stride=1, compute_dtype=jnp.float32):
    """NHWC conv with HWIO weights and torch-style 'same-ish' padding."""
    kh = w.shape[0]
    pad = (kh - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(params, x, train: bool = False, momentum: float = 0.1, eps: float = 1e-5):
    """Returns (y, updated_stats_or_None)."""
    if train:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - momentum) * params["mean"] + momentum * mean,
            "var": (1 - momentum) * params["var"] + momentum * unbiased,
        }
    else:
        mean, var = params["mean"], params["var"]
        new_stats = None
    scale = params["scale"] * jax.lax.rsqrt(var + eps)
    bias = params["bias"] - mean * scale
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y, new_stats


def init_bn(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_conv(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = math.sqrt(2.0 / fan_in)  # kaiming normal, relu gain
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic matrix replicating AdaptiveAvgPool2d bins."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool(x, out_hw: Tuple[int, int]):
    """Exact AdaptiveAvgPool2d over NHWC via two einsum contractions."""
    mh = jnp.asarray(adaptive_pool_matrix(x.shape[1], out_hw[0]))
    mw = jnp.asarray(adaptive_pool_matrix(x.shape[2], out_hw[1]))
    x = jnp.einsum("oh,bhwc->bowc", mh.astype(x.dtype), x)
    return jnp.einsum("pw,bowc->bopc", mw.astype(x.dtype), x)


# --------------------------------------------------------------------------
# ResNet-101 body
# --------------------------------------------------------------------------

def init_bottleneck(key, cin, width, stride, with_downsample):
    ks = jax.random.split(key, 4)
    block = {
        "conv1": init_conv(ks[0], 1, 1, cin, width),
        "bn1": init_bn(width),
        "conv2": init_conv(ks[1], 3, 3, width, width),
        "bn2": init_bn(width),
        "conv3": init_conv(ks[2], 1, 1, width, width * EXPANSION),
        "bn3": init_bn(width * EXPANSION),
    }
    if with_downsample:
        block["down_conv"] = init_conv(ks[3], 1, 1, cin, width * EXPANSION)
        block["down_bn"] = init_bn(width * EXPANSION)
    return block


def bottleneck(block, x, stride=1, train=False, compute_dtype=jnp.float32,
               stats_out=None):
    def bn(name, y):
        out, new = batch_norm(block[name], y, train)
        if stats_out is not None and new is not None:
            stats_out[name] = new
        return out

    out = jax.nn.relu(bn("bn1", conv(x, block["conv1"], 1, compute_dtype)))
    out = jax.nn.relu(bn("bn2", conv(out, block["conv2"], stride, compute_dtype)))
    out = bn("bn3", conv(out, block["conv3"], 1, compute_dtype))
    if "down_conv" in block:
        shortcut = bn("down_bn", conv(x, block["down_conv"], stride, compute_dtype))
    else:
        shortcut = x.astype(out.dtype)
    return jax.nn.relu(out + shortcut)


def init_proj(key, emb_dim: int):
    """Fresh 1x1 projection 2048 -> emb_dim (the reference constructs this
    Conv2d anew on top of the pretrained body, geo-aware/models.py:32)."""
    fan_in = STAGE_WIDTHS[-1] * EXPANSION
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return {
        "w": jax.random.uniform(key, (1, 1, fan_in, emb_dim), jnp.float32, -bound, bound),
        "b": jnp.zeros((emb_dim,), jnp.float32),
    }


def init_resnet101(key, emb_dim: int = 300):
    ks = jax.random.split(key, 6)
    params = {
        "conv1": init_conv(ks[0], 7, 7, 3, 64),
        "bn1": init_bn(64),
    }
    cin = 64
    for stage, (count, width) in enumerate(zip(BLOCK_COUNTS, STAGE_WIDTHS), start=1):
        stage_keys = jax.random.split(ks[stage], count)
        blocks = []
        for b in range(count):
            stride = 2 if (stage > 1 and b == 0) else 1
            blocks.append(
                init_bottleneck(stage_keys[b], cin, width, stride, b == 0)
            )
            cin = width * EXPANSION
        params[f"layer{stage}"] = blocks
    params["proj"] = init_proj(ks[5], emb_dim)
    return params


def resnet_encode(
    params,
    images: jnp.ndarray,             # (B, H, W, 3) normalized NHWC float
    encoded_size: int = 14,
    train: bool = False,
    compute_dtype=jnp.float32,
    return_stats: bool = False,
):
    """images -> (B, encoded_size**2, emb_dim) tokens, h-major order
    (matching the reference's view(B, D, -1) flatten, geo models.py:46).

    With ``train=True`` batch-norm normalizes by batch statistics — the
    reference's train() semantics even for the frozen encoder
    (geo-aware/train.py:245 never exempts the encoder).  With
    ``return_stats=True`` additionally returns the params tree with the
    momentum-updated BN running statistics merged in (torch's train-mode
    side effect on the running buffers).
    """
    stats = {} if (return_stats and train) else None
    x = conv(images, params["conv1"], 2, compute_dtype)
    x, new = batch_norm(params["bn1"], x, train)
    if stats is not None and new is not None:
        stats["bn1"] = new
    x = jax.nn.relu(x)
    x = max_pool_3x3_s2(x)
    for stage in range(1, 5):
        stage_stats = [] if stats is not None else None
        for b, block in enumerate(params[f"layer{stage}"]):
            stride = 2 if (stage > 1 and b == 0) else 1
            block_stats = {} if stats is not None else None
            x = bottleneck(block, x, stride, train, compute_dtype,
                           stats_out=block_stats)
            if stage_stats is not None:
                stage_stats.append(block_stats)
        if stats is not None:
            stats[f"layer{stage}"] = stage_stats
    x = adaptive_avg_pool(x, (encoded_size, encoded_size))
    x = conv(x, params["proj"]["w"], 1, compute_dtype) + params["proj"]["b"].astype(
        compute_dtype
    )
    B, H, W, D = x.shape
    tokens = x.reshape(B, H * W, D)
    if return_stats:
        return tokens, merge_bn_stats(params, stats or {})
    return tokens


def merge_bn_stats(params, stats):
    """Params tree with updated BN running stats (from resnet_encode
    train-mode collection) merged over the originals; weights untouched."""
    out = dict(params)
    if "bn1" in stats:
        out["bn1"] = {**params["bn1"], **stats["bn1"]}
    for stage in range(1, 5):
        name = f"layer{stage}"
        if name not in stats:
            continue
        blocks = []
        for block, block_stats in zip(params[name], stats[name]):
            nb = dict(block)
            for bn_name, new in block_stats.items():
                nb[bn_name] = {**block[bn_name], **new}
            blocks.append(nb)
        out[name] = blocks
    return out


# --------------------------------------------------------------------------
# Inference-mode BN folding (frozen-encoder fast path)
# --------------------------------------------------------------------------

def fold_bn_params(params, eps: float = 1e-5):
    """Fold each inference-mode batch-norm affine into its preceding conv.

    For the frozen encoder (the reference default, geo train.py:52) BN is a
    per-channel affine of the running stats: y = x*s + t with
    s = scale*rsqrt(var+eps), t = bias - mean*s.  Scaling the conv's output
    channels by s and carrying t as a bias is numerically the same product
    (up to float reassociation) but removes every standalone BN elementwise
    pass over the big activations — profiled at ~1/3 of the encode time at
    batch 256 (the conv+bias+relu chain fuses into the conv epilogue;
    unfused BN/residual passes stream 100+ MB activations each at VPU
    bandwidth).

    Returns a folded tree for ``resnet_encode_folded``:
    {"conv1", "b1", "layer{1..4}": [{"conv1","b1",...,"down_conv","down_b"}],
     "proj"}.
    """

    def fold(w, bn):
        s = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
        return (
            w * s.astype(w.dtype),                    # HWIO: out chan = last
            (bn["bias"] - bn["mean"] * s).astype(jnp.float32),
        )

    out = {}
    out["conv1"], out["b1"] = fold(params["conv1"], params["bn1"])
    for stage in range(1, 5):
        blocks = []
        for block in params[f"layer{stage}"]:
            fb = {}
            for i in (1, 2, 3):
                fb[f"conv{i}"], fb[f"b{i}"] = fold(
                    block[f"conv{i}"], block[f"bn{i}"]
                )
            if "down_conv" in block:
                fb["down_conv"], fb["down_b"] = fold(
                    block["down_conv"], block["down_bn"]
                )
            blocks.append(fb)
        out[f"layer{stage}"] = blocks
    out["proj"] = params["proj"]
    return out


def _bottleneck_folded(block, x, stride=1, compute_dtype=jnp.float32):
    def cb(name, y, s=1):
        return conv(y, block[name], s, compute_dtype) + block[
            name.replace("conv", "b")
        ].astype(compute_dtype)

    out = jax.nn.relu(cb("conv1", x))
    out = jax.nn.relu(cb("conv2", out, stride))
    out = cb("conv3", out)
    if "down_conv" in block:
        shortcut = conv(x, block["down_conv"], stride, compute_dtype) + block[
            "down_b"
        ].astype(compute_dtype)
    else:
        shortcut = x.astype(out.dtype)
    return jax.nn.relu(out + shortcut)


def resnet_encode_folded(
    folded,
    images: jnp.ndarray,
    encoded_size: int = 14,
    compute_dtype=jnp.float32,
):
    """resnet_encode over a fold_bn_params tree (inference only)."""
    x = conv(images, folded["conv1"], 2, compute_dtype) + folded["b1"].astype(
        compute_dtype
    )
    x = jax.nn.relu(x)
    x = max_pool_3x3_s2(x)
    for stage in range(1, 5):
        for b, block in enumerate(folded[f"layer{stage}"]):
            stride = 2 if (stage > 1 and b == 0) else 1
            x = _bottleneck_folded(block, x, stride, compute_dtype)
    x = adaptive_avg_pool(x, (encoded_size, encoded_size))
    x = conv(x, folded["proj"]["w"], 1, compute_dtype) + folded["proj"][
        "b"
    ].astype(compute_dtype)
    B, H, W, D = x.shape
    return x.reshape(B, H * W, D)


# --------------------------------------------------------------------------
# torch import
# --------------------------------------------------------------------------

def import_torch_state(state: dict, emb_dim: int = 300):
    """Convert a torchvision resnet101 (+ optional 1x1 'conv1' projection)
    state_dict of numpy arrays into this module's params tree.

    Accepts either raw torchvision names (``layer1.0.conv1.weight``) or the
    reference Encoder's ``resnet.<idx>...`` sequential names.
    """

    def get(name):
        arr = state[name]
        # np.array (copy), not np.asarray: on the CPU backend jnp.asarray
        # can alias the numpy view of a live torch tensor, so later
        # in-place torch mutations would silently change the imported tree
        # (see train/port.py::_np).
        return jnp.asarray(np.array(arr))

    def conv_w(name):
        return jnp.transpose(get(name), (2, 3, 1, 0))  # OIHW -> HWIO

    def bn(prefix):
        return {
            "scale": get(prefix + ".weight"),
            "bias": get(prefix + ".bias"),
            "mean": get(prefix + ".running_mean"),
            "var": get(prefix + ".running_var"),
        }

    # Map reference Sequential indices to torchvision stage names.
    if any(k.startswith("resnet.0") for k in state):
        alias = {
            "conv1": "resnet.0", "bn1": "resnet.1",
            "layer1": "resnet.4", "layer2": "resnet.5",
            "layer3": "resnet.6", "layer4": "resnet.7",
        }
    else:
        alias = {k: k for k in ["conv1", "bn1", "layer1", "layer2", "layer3", "layer4"]}

    params = {
        "conv1": conv_w(alias["conv1"] + ".weight"),
        "bn1": bn(alias["bn1"]),
    }
    for stage, count in enumerate(BLOCK_COUNTS, start=1):
        blocks = []
        for b in range(count):
            p = f"{alias[f'layer{stage}']}.{b}"
            block = {
                "conv1": conv_w(p + ".conv1.weight"),
                "bn1": bn(p + ".bn1"),
                "conv2": conv_w(p + ".conv2.weight"),
                "bn2": bn(p + ".bn2"),
                "conv3": conv_w(p + ".conv3.weight"),
                "bn3": bn(p + ".bn3"),
            }
            if p + ".downsample.0.weight" in state:
                block["down_conv"] = conv_w(p + ".downsample.0.weight")
                block["down_bn"] = bn(p + ".downsample.1")
            blocks.append(block)
        params[f"layer{stage}"] = blocks
    if "conv1.weight" in state and "conv1.bias" in state and alias["conv1"] != "conv1":
        # the reference Encoder's own 1x1 projection is named conv1.*
        params["proj"] = {
            "w": conv_w("conv1.weight"),
            "b": get("conv1.bias"),
        }
    elif "proj.weight" in state:
        params["proj"] = {"w": conv_w("proj.weight"), "b": get("proj.bias")}
    else:
        params["proj"] = {
            "w": jnp.zeros((1, 1, STAGE_WIDTHS[-1] * EXPANSION, emb_dim)),
            "b": jnp.zeros((emb_dim,)),
        }
    return params
