"""Pretrained ResNet-101 ingestion for fresh training.

The reference starts every fresh run from the ImageNet-pretrained
torchvision body (geo-aware/models.py:14-16, train.py:90).  These tests
prove the icek_tpu equivalent end-to-end: a torchvision-named resnet101
state_dict round-trips through tools/port_torchvision_encoder.py to
token-identical encodes vs the torch oracle, and train(--encoder-weights)
actually trains from it.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from test_model_parity import TinyEncoder, build_torch_resnet101_body, torch_seed
from test_train_e2e import make_raw_dataset, tiny_cfg

EMB = 20  # tiny_cfg emb_dim; the porter is width-agnostic


def _randomize_bn_buffers(module, seed=3):
    """Default torch BN init (weight=1, bias=0, mean=0, var=1) would make a
    BN-import bug invisible; randomize every buffer so it binds."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(generator=g)
                m.running_mean.normal_(std=0.1, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)


@pytest.fixture(scope="module")
def torch_body():
    torch_seed(11)
    body = build_torch_resnet101_body()
    _randomize_bn_buffers(body)
    return body


def torchvision_state_dict(body):
    """Rename the Sequential's state_dict to raw torchvision names
    (conv1/bn1/layer1..4) and add the classifier head torchvision ships."""
    ren = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
           "6": "layer3", "7": "layer4"}
    out = {}
    for k, v in body.state_dict().items():
        head, rest = k.split(".", 1)
        out[ren[head] + "." + rest] = v
    out["fc.weight"] = torch.zeros(1000, 2048)
    out["fc.bias"] = torch.zeros(1000)
    return out


def test_porter_tool_roundtrip_matches_torch_oracle(tmp_path, torch_body, rng):
    """state_dict .pth -> tool -> .msgpack -> encoder tree whose encodes
    match the torch body + fresh projection bit-for-bit (within f32 conv
    reassociation tolerance)."""
    pth = tmp_path / "resnet101-imagenet.pth"
    torch.save(torchvision_state_dict(torch_body), pth)

    import importlib.util

    from conftest import REPO_ROOT

    spec = importlib.util.spec_from_file_location(
        "port_torchvision_encoder",
        str(REPO_ROOT / "tools" / "port_torchvision_encoder.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    out = tmp_path / "encoder.msgpack"
    tool.main([str(pth), str(out), "--emb-dim", str(EMB), "--seed", "7"])

    from icek_tpu.train import checkpoint as ckpt

    tree, meta = ckpt.load_encoder_tree(str(out))
    assert meta["emb_dim"] == EMB
    assert np.asarray(tree["proj"]["w"]).shape == (1, 1, 2048, EMB)
    # the projection is fresh (never zeros — import_torch_state's body-only
    # placeholder must have been replaced)
    assert np.abs(np.asarray(tree["proj"]["w"])).max() > 0

    # torch oracle: same body + AdaptiveAvgPool + the SAME fresh projection
    oracle = TinyEncoder(emb_dim=EMB).eval()
    oracle.resnet.load_state_dict(torch_body.state_dict())
    with torch.no_grad():
        oracle.conv1.weight.copy_(
            torch.tensor(np.asarray(tree["proj"]["w"]).transpose(3, 2, 0, 1))
        )
        oracle.conv1.bias.copy_(torch.tensor(np.asarray(tree["proj"]["b"])))

    from icek_tpu.models import resnet as rn

    image = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = (
            oracle(torch.tensor(np.transpose(image, (0, 3, 1, 2))))
            .permute(0, 2, 1)
            .numpy()
        )
    got = np.asarray(rn.resnet_encode(tree, jnp.asarray(image), encoded_size=14))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_resolver_accepts_pth_and_full_checkpoint(tmp_path, torch_body):
    """--encoder-weights takes the raw .pth directly (same tree as the
    tool's msgpack) and a full training checkpoint (encoder_params taken)."""
    from icek_tpu.train import checkpoint as ckpt
    from icek_tpu.train import port

    pth = tmp_path / "weights.pth"
    torch.save(torchvision_state_dict(torch_body), pth)
    direct = port.resolve_encoder_weights(str(pth), EMB, seed=7)
    via_tool = port.load_torchvision_encoder(str(pth), EMB, seed=7)
    np.testing.assert_array_equal(
        np.asarray(direct["layer3"][5]["conv2"]),
        np.asarray(via_tool["layer3"][5]["conv2"]),
    )
    np.testing.assert_array_equal(
        np.asarray(direct["proj"]["w"]), np.asarray(via_tool["proj"]["w"])
    )

    # full checkpoint: encoder_params extracted
    full = str(tmp_path / "checkpoint_tiny.msgpack")
    ckpt.save_encoder_tree(full, direct)  # encoder-tree form
    again, _ = ckpt.load_encoder_tree(full)
    np.testing.assert_array_equal(
        np.asarray(again["bn1"]["mean"]), np.asarray(direct["bn1"]["mean"])
    )
    path = ckpt.save_checkpoint(
        str(tmp_path), "ckpt_form", 0, 0, 1.0, {"w": np.zeros(2)}, None, direct
    )
    from_ckpt = port.resolve_encoder_weights(path, EMB)
    np.testing.assert_array_equal(
        np.asarray(from_ckpt["conv1"]), np.asarray(direct["conv1"])
    )

    # a bare body .pth gets a FRESH projection, so any emb_dim works; the
    # mismatch check binds when the file carries one (msgpack tree / ckpt)
    wide = port.resolve_encoder_weights(str(pth), EMB + 1, seed=7)
    assert np.asarray(wide["proj"]["w"]).shape[-1] == EMB + 1
    tree_path = str(tmp_path / "tree.msgpack")
    ckpt.save_encoder_tree(tree_path, direct)
    with pytest.raises(ValueError):
        port.resolve_encoder_weights(tree_path, EMB + 1)
    with pytest.raises(ValueError):
        port.resolve_encoder_weights(path, EMB + 1)


@pytest.mark.slow
def test_train_from_encoder_weights(tmp_path, torch_body):
    """train(encoder_weights=...) starts from the ported tree: the frozen
    encoder in the result IS the ported body, and training runs end-to-end
    on the synthetic dataset (the CLI flag dispatches here verbatim,
    apps/common.py::run_train)."""
    import json

    from icek_tpu.data import input_files
    from icek_tpu.data.codec import Wordmap
    from icek_tpu.train import loop as train_loop
    from icek_tpu.train import port

    pth = tmp_path / "weights.pth"
    torch.save(torchvision_state_dict(torch_body), pth)
    ported = port.load_torchvision_encoder(str(pth), EMB, seed=0)

    raw = make_raw_dataset(tmp_path)
    out_dir = tmp_path / "files"
    cfg = tiny_cfg()
    input_files.InputFileWriter(
        cfg, str(raw / "captions_split.json"), str(raw / "entity_context.pkl"),
        str(raw / "images"), str(out_dir), seed=0,
    ).run()
    with open(out_dir / "WORDMAP_tiny_geo.json") as f:
        wm = Wordmap(json.load(f))

    result = train_loop.train(
        cfg, str(out_dir), len(wm), wm.pad_id,
        checkpoint_dir=str(tmp_path), max_epochs=1, log=lambda s: None,
        encoder_weights=str(pth),
    )
    # frozen encoder: the trained state still carries the ported body
    np.testing.assert_array_equal(
        np.asarray(result.encoder_params["layer1"][0]["conv1"]),
        np.asarray(ported["layer1"][0]["conv1"]),
    )
    np.testing.assert_array_equal(
        np.asarray(result.encoder_params["bn1"]["mean"]),
        np.asarray(ported["bn1"]["mean"]),
    )
    assert [p for p in os.listdir(tmp_path) if p.endswith(".msgpack")]
