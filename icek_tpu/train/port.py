"""Import reference PyTorch checkpoints into icek_tpu parameter trees.

The reference saves whole pickled nn.Modules (geo-aware/utils.py:32-49):
``{epoch, epochs_since_improvement, loss, encoder, decoder, *_optimizer}``.
This module maps their state_dicts onto our pytrees so ported checkpoints
evaluate bit-consistently.  It works from a plain ``{name: ndarray}`` dict so
tests can also feed torch modules directly via ``state_dict()``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from icek_tpu.core.config import ModelConfig
from icek_tpu.models import resnet


def _np(x):
    x = x.detach().cpu().numpy() if hasattr(x, "detach") else x
    # Always copy: on the CPU backend jnp.asarray can ALIAS the numpy view
    # of a live torch tensor, so a later in-place mutation of the source
    # model (e.g. an optimizer step) would silently change the "imported"
    # JAX tree.  Caught by test_training_trajectory_parity, where the torch
    # reference keeps training after the import.
    return np.array(x)


def _linear(state, prefix):
    return {
        "w": jnp.asarray(_np(state[prefix + ".weight"]).T),
        "b": jnp.asarray(_np(state[prefix + ".bias"])),
    }


def _norm(state, prefix):
    return {
        "scale": jnp.asarray(_np(state[prefix + ".weight"])),
        "bias": jnp.asarray(_np(state[prefix + ".bias"])),
    }


def _mha(state, prefix):
    return {
        "qkv_w": jnp.asarray(_np(state[prefix + ".in_proj_weight"]).T),
        "qkv_b": jnp.asarray(_np(state[prefix + ".in_proj_bias"])),
        "out": _linear(state, prefix + ".out_proj"),
    }


def _encoder_stack(state, prefix, num_layers):
    layers = []
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        layers.append(
            {
                "self_attn": _mha(state, p + ".self_attn"),
                "ffn": {
                    "lin1": _linear(state, p + ".linear1"),
                    "lin2": _linear(state, p + ".linear2"),
                },
                "norm1": _norm(state, p + ".norm1"),
                "norm2": _norm(state, p + ".norm2"),
            }
        )
    return {"layers": layers}


def _decoder_stack(state, prefix, num_layers):
    layers = []
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        layers.append(
            {
                "self_attn": _mha(state, p + ".self_attn"),
                "cross_attn": _mha(state, p + ".multihead_attn"),
                "ffn": {
                    "lin1": _linear(state, p + ".linear1"),
                    "lin2": _linear(state, p + ".linear2"),
                },
                "norm1": _norm(state, p + ".norm1"),
                "norm2": _norm(state, p + ".norm2"),
                "norm3": _norm(state, p + ".norm3"),
            }
        )
    return {"layers": layers}


def import_captioner_state(state: Dict[str, "np.ndarray"], cfg: ModelConfig):
    """Map a reference DecoderTransformer state_dict onto our params tree."""
    params = {
        "word_embedding": jnp.asarray(_np(state["word_embedding.weight"])),
        "type_embedding": jnp.asarray(_np(state["entity_encoder.type_embedding.weight"])),
        "ctx_encoder_entities": _encoder_stack(
            state, "transformer_encoder_entities", cfg.num_layers
        ),
        "decoder": _decoder_stack(state, "transformer_decoder", cfg.num_layers),
        "fc_vocab": _linear(state, "fc_vocab"),
        "fc_entity": _linear(state, "fc_entity"),
    }
    if cfg.has_facts:
        params.update(
            {
                "predicate_embedding": jnp.asarray(_np(state["predicate_embedding.weight"])),
                "ctx_encoder_facts": _encoder_stack(
                    state, "transformer_encoder_facts", cfg.num_layers
                ),
                "fc_fact": _linear(state, "fc_fact"),
                "fc_predicate": _linear(state, "fc_predicate"),
            }
        )
    return params


def import_encoder_state(state: Dict[str, "np.ndarray"], emb_dim: int = 300):
    """Map a reference Encoder (resnet + 1x1 conv) state_dict onto ours."""
    return resnet.import_torch_state({k: _np(v) for k, v in state.items()}, emb_dim)


def load_torchvision_encoder(state_or_path, emb_dim: int = 300, seed: int = 0):
    """ImageNet-pretrained torchvision ``resnet101`` weights -> encoder tree.

    The reference initializes its Encoder from the pretrained torchvision
    body plus a FRESH 1x1 projection conv (geo-aware/models.py:14-32,
    constructed for every fresh training run at geo-aware/train.py:90).
    This is the icek_tpu equivalent: the body imports via
    ``resnet.import_torch_state``; when the file carries no projection (a
    plain torchvision state_dict), ``proj`` is freshly initialized from
    ``seed`` exactly like ``resnet.init_resnet101``'s.

    Accepts a path to a torch file — a raw state_dict, a
    ``{"state_dict": ...}`` wrapper, or a pickled module — or an in-memory
    mapping of arrays/tensors (raw torchvision names or the reference
    Encoder's ``resnet.<idx>`` names).
    """
    import os

    if isinstance(state_or_path, (str, os.PathLike)):
        import torch

        obj = torch.load(state_or_path, map_location="cpu", weights_only=False)
    else:
        obj = state_or_path
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if (
        isinstance(obj, dict)
        and "state_dict" in obj
        and hasattr(obj["state_dict"], "items")
    ):
        obj = obj["state_dict"]
    state = {k: _np(v) for k, v in obj.items()}
    params = resnet.import_torch_state(state, emb_dim)
    # import_torch_state zero-fills proj when the state carries none (the
    # torchvision-body case); a trainable encoder needs the reference's
    # fresh random projection there instead.
    has_ref_proj = (
        any(k.startswith("resnet.0") for k in state) and "conv1.bias" in state
    )
    if "proj.weight" not in state and not has_ref_proj:
        import jax

        params["proj"] = resnet.init_proj(jax.random.PRNGKey(seed), emb_dim)
    got = params["proj"]["w"].shape[-1]
    if got != emb_dim:
        raise ValueError(
            f"encoder weights project to emb_dim={got}, model wants {emb_dim}"
        )
    return params


def resolve_encoder_weights(path: str, emb_dim: int = 300, seed: int = 0):
    """Dispatch ``--encoder-weights FILE``: a ported ``.msgpack`` encoder
    tree (tools/port_torchvision_encoder.py), a full icek checkpoint
    ``.msgpack`` (its encoder_params are taken), or a torch ``.pth`` /
    state_dict file (converted on the fly)."""
    if path.endswith(".msgpack"):
        from icek_tpu.train import checkpoint as ckpt

        tree, _ = ckpt.load_encoder_tree(path)
        got = tree["proj"]["w"].shape[-1]
        if got != emb_dim:
            raise ValueError(
                f"encoder weights project to emb_dim={got}, model wants {emb_dim}"
            )
        return tree
    return load_torchvision_encoder(path, emb_dim, seed)


def load_reference_checkpoint(path: str, cfg: ModelConfig):
    """Load a reference ``.pth.tar`` (whole pickled modules) and return
    ``(captioner_params, encoder_params, meta)``.

    Requires torch; the pickled module classes must be importable, so the
    reference subproject directory is temporarily added to ``sys.path``.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    decoder_state = ckpt["decoder"].state_dict()
    encoder_state = ckpt["encoder"].state_dict()
    meta = {
        "epoch": ckpt.get("epoch"),
        "epochs_since_improvement": ckpt.get("epochs_since_improvement"),
        "loss": ckpt.get("loss"),
    }
    return (
        import_captioner_state(decoder_state, cfg),
        import_encoder_state(encoder_state, cfg.emb_dim),
        meta,
    )
