"""Numerical parity of the JAX model against the reference PyTorch modules.

The reference modules (mounted read-only) are the oracle: we build them with
dropout disabled, copy their weights into our pytrees via the checkpoint
porter, and compare forward outputs.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
from torch import nn

from icek_tpu.core.config import ModelConfig
from icek_tpu.models import captioner as cap
from icek_tpu.models import transformer as tfm
from icek_tpu.train import port

from conftest import reference_subproject

D, HEADS, LAYERS, FFN = 20, 2, 2, 32


def small_cfg(variant):
    feat = {"geo": 4, "knowledge": 6, "news": 5}[variant]
    return ModelConfig(
        variant=variant,
        emb_dim=D,
        decoder_ffn_dim=FFN,
        encoder_ffn_dim=FFN,
        num_heads=HEADS,
        num_layers=LAYERS,
        dropout_dec=0.0,
        dropout_enc=0.0,
        dropout_pos=0.0,
        type_vocab=20 if variant == "news" else 50,
        num_entity_feature_dims=feat,
        num_predicates=0 if variant == "geo" else 40,
        entity_name_embedding=variant == "news",
    )


def torch_seed(seed=0):
    torch.manual_seed(seed)


def test_encoder_layer_matches_torch(rng):
    torch_seed()
    layer = nn.TransformerEncoderLayer(D, HEADS, FFN, dropout=0.0).eval()
    x = rng.standard_normal((3, 7, D)).astype(np.float32)
    with torch.no_grad():
        # torch layer is (T, B, D)
        want = layer(torch.tensor(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    state = {k: v for k, v in layer.state_dict().items()}
    params = port._encoder_stack(
        {"l.layers.0." + k: v for k, v in state.items()}, "l", 1
    )["layers"][0]
    got = tfm.encoder_layer(params, jnp.asarray(x), HEADS)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_decoder_layer_matches_torch(rng):
    torch_seed(1)
    layer = nn.TransformerDecoderLayer(D, HEADS, FFN, dropout=0.0).eval()
    x = rng.standard_normal((2, 5, D)).astype(np.float32)
    mem = rng.standard_normal((2, 9, D)).astype(np.float32)
    mask_t = torch.triu(torch.full((5, 5), float("-inf")), diagonal=1)
    with torch.no_grad():
        want = (
            layer(
                torch.tensor(x).permute(1, 0, 2),
                torch.tensor(mem).permute(1, 0, 2),
                tgt_mask=mask_t,
            )
            .permute(1, 0, 2)
            .numpy()
        )
    params = port._decoder_stack(
        {"l.layers.0." + k: v for k, v in layer.state_dict().items()}, "l", 1
    )["layers"][0]
    got, _ = tfm.decoder_layer(
        params, jnp.asarray(x), jnp.asarray(mem), HEADS,
        causal_mask=tfm.causal_mask(5),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def _toy_wordmap(n_words=25):
    words = [f"w{i}" for i in range(n_words)]
    wm = {w: i + 1 for i, w in enumerate(words)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0
    return wm


def _geo_entities(rng, B, E):
    ents = np.zeros((B, E, 5), dtype=np.float32)
    ents[:, :, 0] = np.arange(E)
    ents[:, :, 1] = rng.uniform(0, 1, (B, E))
    ents[:, :, 2] = rng.uniform(-179, 179, (B, E))
    ents[:, :, 3] = rng.uniform(0, 0.1, (B, E))
    ents[:, :, 4] = rng.integers(0, 20, (B, E))
    return ents


def _facts(rng, B, F, E, P):
    facts = np.zeros((B, F, 3), dtype=np.float32)
    facts[:, :, 0] = np.arange(F)
    facts[:, :, 1] = rng.integers(0, E, (B, F))
    facts[:, :, 2] = rng.integers(0, P, (B, F))
    facts[:, -1, 1] = E - 1  # dummy fact points at <unk_ent>
    return facts


def _captions(rng, wm, B, T, E, F=0):
    V = len(wm)
    ids = rng.integers(1, V - 3, (B, T))
    mask = np.zeros((B, T), dtype=np.int64)
    ids[:, 0] = wm["<start>"]
    # sprinkle entity + fact tokens
    for b in range(B):
        ids[b, 2] = V + rng.integers(0, E)
        mask[b, 2] = 1
        if F:
            ids[b, 4] = V + E + rng.integers(0, F)
            mask[b, 4] = 2
    ids[:, -1] = wm["<end>"]
    return ids.astype(np.int64), mask


@pytest.mark.parametrize("variant", ["geo", "knowledge", "news"])
@pytest.mark.quick
def test_captioner_forward_parity(rng, variant):
    subproject = {
        "geo": "geo-aware",
        "knowledge": "knowledge-aware",
        "news": "news-knowledge-aware",
    }[variant]
    ref_models, _ = reference_subproject(subproject)
    torch_seed(2)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg(variant)
    B, T, E, F, P = 3, 9, 7, 6, cfg.num_predicates

    ref = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=D, decoder_dim=FFN, encoder_dim=FFN,
        num_heads=HEADS, num_layers=LAYERS,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    ).eval()
    # shrink the reference's fixed-size tables to the toy config
    ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)
    if variant != "geo":
        ref.num_predicates = P
        ref.predicate_embedding = nn.Embedding(P, D)
        ref.fact_encoder.predicate_embedding = ref.predicate_embedding
        ref.fc_predicate = nn.Linear(P, D)
    ref.eval()

    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = rng.standard_normal((B, 4, D)).astype(np.float32)
    ents = _geo_entities(rng, B, E)
    if variant == "news":
        name_ids = rng.integers(0, V, (B, E, 5)).astype(np.float32)
        ents = np.concatenate([ents, name_ids], axis=-1)
    caps, cap_mask = _captions(rng, wm, B, T, E, F if variant != "geo" else 0)
    lengths = np.array([[T], [T - 1], [T - 2]])  # distinct, descending: sort is identity

    with torch.no_grad():
        if variant == "geo":
            want, _, _ = ref(
                torch.tensor(caps),
                torch.tensor(img).permute(0, 2, 1),
                torch.tensor(cap_mask),
                torch.tensor(lengths),
                torch.tensor(ents),
            )
        else:
            facts = _facts(rng, B, F, E, P)
            # torch>=2 rejects the float fact indices the reference relied on
            # under torch 1.9 — feed the oracle int64 facts (same values).
            want, _, _ = ref(
                torch.tensor(caps),
                torch.tensor(img).permute(0, 2, 1),
                torch.tensor(cap_mask),
                torch.tensor(lengths),
                torch.tensor(ents),
                torch.tensor(facts.astype(np.int64)),
            )
    got = cap.captioner_forward(
        params, cfg, V, wm["<pad>"],
        jnp.asarray(caps), jnp.asarray(cap_mask), jnp.asarray(img),
        jnp.asarray(ents),
        jnp.asarray(facts) if variant != "geo" else None,
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-4)


class TorchBottleneck(nn.Module):
    """torchvision-style bottleneck, built locally for the parity oracle."""

    def __init__(self, cin, width, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(width * 4),
            )

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        shortcut = self.downsample(x) if self.downsample is not None else x
        return torch.relu(out + shortcut)


def test_resnet_primitives_match_torch(rng):
    """conv stem + maxpool + bottleneck + adaptive pool vs a torch oracle."""
    from icek_tpu.models import resnet as rn

    torch_seed(3)
    stem_conv = nn.Conv2d(3, 8, 7, stride=2, padding=3, bias=False)
    stem_bn = nn.BatchNorm2d(8).eval()
    stem_bn.running_mean.normal_()
    stem_bn.running_var.uniform_(0.5, 2.0)
    block = TorchBottleneck(8, 4, 2, downsample=True).eval()
    for bn_mod in [block.bn1, block.bn2, block.bn3, block.downsample[1]]:
        bn_mod.running_mean.normal_()
        bn_mod.running_var.uniform_(0.5, 2.0)

    x = rng.standard_normal((2, 33, 33, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        feats = torch.relu(stem_bn(stem_conv(t)))
        feats = nn.MaxPool2d(3, stride=2, padding=1)(feats)
        feats = block(feats)
        pooled = nn.AdaptiveAvgPool2d((5, 5))(feats)
        want = pooled.permute(0, 2, 3, 1).numpy()

    def t_conv(mod):
        return jnp.asarray(mod.weight.detach().numpy().transpose(2, 3, 1, 0))

    def t_bn(mod):
        return {
            "scale": jnp.asarray(mod.weight.detach().numpy()),
            "bias": jnp.asarray(mod.bias.detach().numpy()),
            "mean": jnp.asarray(mod.running_mean.numpy()),
            "var": jnp.asarray(mod.running_var.numpy()),
        }

    j = rn.conv(jnp.asarray(x), t_conv(stem_conv), stride=2)
    j, _ = rn.batch_norm(t_bn(stem_bn), j)
    j = jax.nn.relu(j)
    j = rn.max_pool_3x3_s2(j)
    block_params = {
        "conv1": t_conv(block.conv1), "bn1": t_bn(block.bn1),
        "conv2": t_conv(block.conv2), "bn2": t_bn(block.bn2),
        "conv3": t_conv(block.conv3), "bn3": t_bn(block.bn3),
        "down_conv": t_conv(block.downsample[0]),
        "down_bn": t_bn(block.downsample[1]),
    }
    j = rn.bottleneck(block_params, j, stride=2)
    j = rn.adaptive_avg_pool(j, (5, 5))
    np.testing.assert_allclose(np.asarray(j), want, atol=1e-4)


@pytest.mark.quick
def test_fold_bn_matches_exact_encode(rng):
    """fold_bn_params + resnet_encode_folded reproduces the exact
    inference-mode encode (BN affine algebraically folded into convs)."""
    from icek_tpu.models import resnet as rn

    params = rn.init_resnet101(jax.random.PRNGKey(5), emb_dim=24)
    # non-trivial running stats everywhere
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x
        + jnp.asarray(
            np.random.default_rng(7).uniform(0.1, 0.9, x.shape).astype(np.float32)
        )
        if any(getattr(p, "key", None) in ("mean", "var", "scale", "bias")
               for p in path)
        else x,
        params,
    )
    images = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    want = rn.resnet_encode(params, images, encoded_size=4)
    folded = rn.fold_bn_params(params)
    got = rn.resnet_encode_folded(folded, images, encoded_size=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )


def test_bn_train_mode_matches_torch(rng):
    """Train-mode batch-norm (the reference's frozen-encoder side effect,
    geo-aware/train.py:245): outputs normalize by batch stats and the
    running buffers take the momentum update, both matching torch."""
    from icek_tpu.models import resnet as rn

    torch_seed(7)
    block = TorchBottleneck(8, 4, 2, downsample=True).train()
    for bn_mod in [block.bn1, block.bn2, block.bn3, block.downsample[1]]:
        bn_mod.running_mean.normal_()
        bn_mod.running_var.uniform_(0.5, 2.0)

    x = rng.standard_normal((4, 17, 17, 8)).astype(np.float32)

    def t_conv(mod):
        return jnp.asarray(mod.weight.detach().numpy().transpose(2, 3, 1, 0))

    def t_bn(mod):
        return {
            "scale": jnp.asarray(mod.weight.detach().numpy()),
            "bias": jnp.asarray(mod.bias.detach().numpy()),
            "mean": jnp.asarray(mod.running_mean.numpy()),
            "var": jnp.asarray(mod.running_var.numpy()),
        }

    block_params = {
        "conv1": t_conv(block.conv1), "bn1": t_bn(block.bn1),
        "conv2": t_conv(block.conv2), "bn2": t_bn(block.bn2),
        "conv3": t_conv(block.conv3), "bn3": t_bn(block.bn3),
        "down_conv": t_conv(block.downsample[0]),
        "down_bn": t_bn(block.downsample[1]),
    }
    stats = {}
    j = rn.bottleneck(block_params, jnp.asarray(x), stride=2, train=True,
                      stats_out=stats)

    with torch.no_grad():
        t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        want = block(t).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(j), want, atol=1e-4)
    # torch mutated its running buffers in that forward; ours must match.
    for name, mod in [("bn1", block.bn1), ("bn2", block.bn2),
                      ("bn3", block.bn3), ("down_bn", block.downsample[1])]:
        np.testing.assert_allclose(
            np.asarray(stats[name]["mean"]), mod.running_mean.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stats[name]["var"]), mod.running_var.numpy(), atol=1e-5
        )
    # merge_bn_stats writes stats (and only stats) back into the tree
    merged_layer = rn.merge_bn_stats(
        {"bn1": t_bn(block.bn1), "layer1": [block_params], "layer2": [],
         "layer3": [], "layer4": []},
        {"layer1": [stats]},
    )
    np.testing.assert_allclose(
        np.asarray(merged_layer["layer1"][0]["bn2"]["mean"]),
        block.bn2.running_mean.numpy(), atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(merged_layer["layer1"][0]["conv1"]),
        np.asarray(block_params["conv1"]),
    )


def build_torch_resnet101_body():
    """torchvision-resnet101-shaped Sequential matching the reference
    Encoder's `resnet.<idx>` naming (geo models.py:24-27)."""
    layers = [
        nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(),
        nn.MaxPool2d(3, stride=2, padding=1),
    ]
    cin = 64
    for stage, (count, width) in enumerate(zip((3, 4, 23, 3), (64, 128, 256, 512))):
        blocks = []
        for b in range(count):
            stride = 2 if (stage > 0 and b == 0) else 1
            blocks.append(TorchBottleneck(cin, width, stride, downsample=b == 0))
            cin = width * 4
        layers.append(nn.Sequential(*blocks))
    return nn.Sequential(*layers)


class TinyEncoder(nn.Module):
    """Module-level reference-shaped torch Encoder (whole pickled modules
    cannot be local classes); resnet body + the 1x1 projection conv."""

    def __init__(self, emb_dim=8):
        super().__init__()
        self.resnet = build_torch_resnet101_body()
        self.adaptive_pool = nn.AdaptiveAvgPool2d((14, 14))
        self.conv1 = nn.Conv2d(2048, emb_dim, 1)

    def forward(self, images):
        out = self.adaptive_pool(self.resnet(images))
        out = self.conv1(out)
        return out.view(out.shape[0], out.shape[1], -1)


def test_reference_pth_tar_checkpoint_port(tmp_path, rng):
    """Full porting path: a reference-style .pth.tar (whole pickled modules,
    geo utils.py:32-49) -> icek_tpu params -> forward parity."""
    import sys

    from conftest import REFERENCE_ROOT

    path = REFERENCE_ROOT / "geo-aware"
    if not path.exists():
        pytest.skip("reference not mounted")
    reference_subproject("geo-aware")  # installs the torchvision stub
    sys.path.insert(0, str(path))
    saved_models = sys.modules.pop("models", None)
    try:
        import importlib

        import models as ref_models

        importlib.reload(ref_models)
        torch_seed(9)
        wm = _toy_wordmap()
        cfg = small_cfg("geo")
        ref = ref_models.DecoderTransformer(
            word_map=wm, emb_dim=D, decoder_dim=FFN, encoder_dim=FFN,
            num_heads=HEADS, num_layers=LAYERS,
            dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
        ).eval()
        ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)

        encoder = TinyEncoder().eval()
        ckpt_path = tmp_path / "checkpoint_4_geo_aware_test.pth.tar"
        torch.save(
            {
                "epoch": 4, "epochs_since_improvement": 1, "loss": 3.21,
                "encoder": encoder, "decoder": ref,
                "encoder_optimizer": None, "decoder_optimizer": None,
            },
            ckpt_path,
        )

        from icek_tpu.train import port

        params, encoder_params, meta = port.load_reference_checkpoint(
            str(ckpt_path), cfg
        )
        assert meta == {"epoch": 4, "epochs_since_improvement": 1, "loss": 3.21}
        assert np.asarray(encoder_params["proj"]["w"]).shape == (1, 1, 2048, 8)

        # full ResNet-101 encoder parity on a small image
        from icek_tpu.models import resnet as rn

        image = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            want_tokens = (
                encoder(torch.tensor(np.transpose(image, (0, 3, 1, 2))))
                .permute(0, 2, 1)
                .numpy()
            )
        got_tokens = np.asarray(
            rn.resnet_encode(encoder_params, jnp.asarray(image), encoded_size=14)
        )
        np.testing.assert_allclose(got_tokens, want_tokens, atol=2e-3)

        V = len(wm)
        B, T, E = 2, 7, 5
        img = rng.standard_normal((B, 4, D)).astype(np.float32)
        ents = _geo_entities(rng, B, E)
        caps, cap_mask = _captions(rng, wm, B, T, E)
        lengths = np.array([[T], [T - 1]])
        with torch.no_grad():
            want, _, _ = ref(
                torch.tensor(caps), torch.tensor(img).permute(0, 2, 1),
                torch.tensor(cap_mask), torch.tensor(lengths), torch.tensor(ents),
            )
        got = cap.captioner_forward(
            params, cfg, V, wm["<pad>"],
            jnp.asarray(caps), jnp.asarray(cap_mask), jnp.asarray(img),
            jnp.asarray(ents),
        )
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-4)
    finally:
        sys.path.pop(0)
        sys.modules.pop("models", None)
        if saved_models is not None:
            sys.modules["models"] = saved_models


# ---------------------------------------------------------------------------
# training parity: gradients and the clip+Adam trajectory vs the reference
# ---------------------------------------------------------------------------


def _build_reference_pair(variant, rng):
    """Reference DecoderTransformer (dropout 0) + imported icek params and a
    synthetic batch — the shared setup of the forward-parity test."""
    subproject = {
        "geo": "geo-aware",
        "knowledge": "knowledge-aware",
        "news": "news-knowledge-aware",
    }[variant]
    ref_models, ref_utils = reference_subproject(subproject)
    torch_seed(7)
    wm = _toy_wordmap()
    V = len(wm)
    cfg = small_cfg(variant)
    B, T, E, F, P = 3, 9, 7, 6, cfg.num_predicates

    ref = ref_models.DecoderTransformer(
        word_map=wm, emb_dim=D, decoder_dim=FFN, encoder_dim=FFN,
        num_heads=HEADS, num_layers=LAYERS,
        dropout_dec=0.0, dropout_enc=0.0, dropout_pos=0.0,
    )
    ref.entity_encoder.type_embedding = nn.Embedding(cfg.type_vocab, cfg.type_emb_dim)
    if variant != "geo":
        ref.num_predicates = P
        ref.predicate_embedding = nn.Embedding(P, D)
        ref.fact_encoder.predicate_embedding = ref.predicate_embedding
        ref.fc_predicate = nn.Linear(P, D)
    params = port.import_captioner_state(ref.state_dict(), cfg)

    img = rng.standard_normal((B, 4, D)).astype(np.float32)
    ents = _geo_entities(rng, B, E)
    if variant == "news":
        name_ids = rng.integers(0, V, (B, E, 5)).astype(np.float32)
        ents = np.concatenate([ents, name_ids], axis=-1)
    caps, cap_mask = _captions(rng, wm, B, T, E, F if variant != "geo" else 0)
    lengths = np.array([T, T - 1, T - 2])  # distinct, descending: sort is identity
    facts = _facts(rng, B, F, E, P) if variant != "geo" else None
    batch = dict(caps=caps, cap_mask=cap_mask, lengths=lengths, img=img,
                 ents=ents, facts=facts)
    return ref, ref_utils, params, cfg, V, wm, batch


def _reference_loss(ref, wm, batch):
    """One reference train-iteration forward+loss (train.py:268-283: forward,
    drop <start>, pack_padded over decode_lengths, CrossEntropyLoss with
    ignore_index=<pad>, train.py:136)."""
    import torch as _torch
    from torch.nn.utils.rnn import pack_padded_sequence

    args = [
        _torch.tensor(batch["caps"]),
        _torch.tensor(batch["img"]).permute(0, 2, 1),
        _torch.tensor(batch["cap_mask"]),
        _torch.tensor(batch["lengths"][:, None]),
        _torch.tensor(batch["ents"]),
    ]
    if batch["facts"] is not None:
        args.append(_torch.tensor(batch["facts"].astype(np.int64)))
    scores, caps_sorted, decode_lengths = ref(*args)
    targets = caps_sorted[:, 1:]
    packed_s = pack_padded_sequence(scores, decode_lengths, batch_first=True).data
    packed_t = pack_padded_sequence(targets, decode_lengths, batch_first=True).data
    return nn.CrossEntropyLoss(ignore_index=wm["<pad>"])(packed_s, packed_t)


@pytest.mark.parametrize("variant", ["geo", "knowledge", "news"])
def test_training_gradient_parity(rng, variant):
    """d(loss)/d(weights) matches torch autograd through the WHOLE model:
    the torch .grad tensors, mapped through the same state_dict importer as
    the weights, must equal jax.grad of our mean caption loss.  This pins
    the backward semantics (including the _token_nll custom VJP and the
    masked loss) against the reference's autodiff, leaf for leaf."""
    from icek_tpu.train.step import caption_loss

    ref, _, params, cfg, V, wm, batch = _build_reference_pair(variant, rng)
    ref.train()

    loss_t = _reference_loss(ref, wm, batch)
    loss_t.backward()
    # map grads by tensor identity so weight-tied state_dict entries (the
    # fact encoder shares predicate_embedding) resolve to the shared grad
    id_to_grad = {
        id(p): (p.grad if p.grad is not None else torch.zeros_like(p))
        for _, p in ref.named_parameters()
    }
    grad_state = {
        k: id_to_grad.get(id(t), torch.zeros_like(t))
        for k, t in ref.state_dict(keep_vars=True).items()
    }
    want = port.import_captioner_state(
        {k: v.detach().numpy() for k, v in grad_state.items()}, cfg
    )

    def loss_fn(p):
        scores = cap.captioner_forward(
            p, cfg, V, wm["<pad>"],
            jnp.asarray(batch["caps"]), jnp.asarray(batch["cap_mask"]),
            jnp.asarray(batch["img"]), jnp.asarray(batch["ents"]),
            jnp.asarray(batch["facts"]) if batch["facts"] is not None else None,
        )
        loss, _ = caption_loss(
            scores, jnp.asarray(batch["caps"]),
            jnp.asarray(batch["lengths"]), wm["<pad>"],
        )
        return loss

    loss_j, got = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    flat_want, tree_want = jax.tree_util.tree_flatten_with_path(want)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    assert tree_want == jax.tree_util.tree_structure(got)
    for path, w in flat_want:
        g = flat_got[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("variant", ["geo", "knowledge"])
def test_training_trajectory_parity(rng, variant):
    """Four full reference train iterations (forward -> mean CE -> backward
    -> clip_gradient clamp (utils.py:75-85) -> Adam(lr) step,
    train.py:268-293) vs four icek train_step calls from the same imported
    weights and batches: the per-step losses must track."""
    import dataclasses

    from icek_tpu.core import config as config_lib
    from icek_tpu.train import step as step_lib

    ref, ref_utils, params, cfg, V, wm, batch0 = _build_reference_pair(variant, rng)
    ref.train()
    lr, clip = 4e-4, 5.0

    # distinct batches per step: fresh captions/images, same shapes
    batches = [batch0]
    for _ in range(3):
        b = dict(batch0)
        B, T, E = 3, 9, 7
        caps, cap_mask = _captions(
            rng, wm, B, T, E, 6 if variant != "geo" else 0
        )
        b["caps"], b["cap_mask"] = caps, cap_mask
        b["img"] = rng.standard_normal((B, 4, D)).astype(np.float32)
        batches.append(b)

    opt_t = torch.optim.Adam(
        filter(lambda p: p.requires_grad, ref.parameters()), lr=lr
    )
    losses_t = []
    for b in batches:
        loss = _reference_loss(ref, wm, b)
        opt_t.zero_grad()
        loss.backward()
        ref_utils.clip_gradient(opt_t, clip)
        opt_t.step()
        losses_t.append(float(loss))

    full = config_lib.georic() if variant == "geo" else config_lib.k_georic()
    full = full.replace(
        model=cfg,
        train=dataclasses.replace(full.train, use_rbg_dropout=False),
    )
    optimizer = step_lib.make_optimizer(lr, clip)
    opt_state = optimizer.init(params)
    train_step, _ = step_lib.make_train_step(
        full, V, wm["<pad>"], optimizer, encode_images=False
    )
    losses_j = []
    for b in batches:
        jb = {
            "caption_ids": jnp.asarray(b["caps"].astype(np.int32)),
            "caption_mask": jnp.asarray(b["cap_mask"].astype(np.int32)),
            "lengths": jnp.asarray(b["lengths"].astype(np.int32)),
            "entity_features": jnp.asarray(b["ents"]),
            "image_tokens": jnp.asarray(b["img"]),
        }
        if b["facts"] is not None:
            jb["fact_features"] = jnp.asarray(b["facts"])
        params, opt_state, loss, _ = train_step(
            params, opt_state, None, jb, jax.random.PRNGKey(0)
        )
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-4)


def test_optimizer_clip_matches_reference_clamp():
    """make_optimizer's clip stage is the reference's PER-ELEMENT clamp
    (utils.py:75-85), not a norm clip: elements beyond +-clip saturate,
    others pass through, before the same Adam update torch takes."""
    from icek_tpu.train.step import make_optimizer

    lr, clip = 1e-2, 5.0
    w = np.array([0.5, -1.0, 2.0], np.float32)
    g = np.array([7.0, -12.0, 3.0], np.float32)  # two elements beyond clip

    p_t = torch.nn.Parameter(torch.tensor(w))
    opt_t = torch.optim.Adam([p_t], lr=lr)
    p_t.grad = torch.tensor(g)
    for group in opt_t.param_groups:  # utils.clip_gradient
        for param in group["params"]:
            param.grad.data.clamp_(-clip, clip)
    opt_t.step()

    optimizer = make_optimizer(lr, clip)
    params = {"w": jnp.asarray(w)}
    state = optimizer.init(params)
    updates, _ = optimizer.update({"w": jnp.asarray(g)}, state, params)
    got = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(got, p_t.detach().numpy(), atol=1e-7)
