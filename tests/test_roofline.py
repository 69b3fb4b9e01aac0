"""Roofline/MFU model (utils/roofline.py): the analytic FLOPs terms must
match independent references — the canonical ResNet-101 MAC count and
XLA's own cost analysis of the jitted graphs (loose agreement: XLA counts
elementwise/softmax flops the MFU convention excludes, and its CPU conv
estimates run a few percent low)."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

pytestmark = pytest.mark.quick  # <5-min core lane (CLAUDE.md)
import jax.numpy as jnp

from icek_tpu.core import config as config_lib
from icek_tpu.models import captioner, resnet
from icek_tpu.utils import roofline


def test_resnet101_flops_matches_canonical_macs():
    """7.80 GMACs at 224x224 — the published ResNet-101 figure."""
    flops = roofline.resnet101_encode_flops(224, 300, tokens=196)
    proj = 2 * 196 * 2048 * 300
    gmacs = (flops - proj) / 2e9
    assert abs(gmacs - 7.80) < 0.05, gmacs


def test_resnet101_flops_vs_xla_cost_analysis():
    emb = 32
    params = resnet.init_resnet101(jax.random.PRNGKey(0), emb)
    img = jnp.zeros((1, 64, 64, 3))
    f = jax.jit(lambda p, x: resnet.resnet_encode(p, x, 2))
    ca = f.lower(params, img).compile().cost_analysis()
    analytic = roofline.resnet101_encode_flops(64, emb, tokens=4)
    assert 0.8 <= ca["flops"] / analytic <= 1.1, (ca["flops"], analytic)


def test_captioner_forward_flops_vs_xla_cost_analysis():
    """GEMM-only analytic forward within the expected band of XLA's count
    (XLA adds elementwise/softmax/layernorm flops on top)."""
    cfg = config_lib.k_georic()
    mcfg = dataclasses.replace(
        cfg.model, emb_dim=32, decoder_ffn_dim=64, encoder_ffn_dim=64,
        num_heads=4, num_layers=2, type_vocab=16, num_predicates=8,
        use_flash_attention=False,
    )
    V, E, F, B, T = 64, 9, 6, 2, 10
    params = captioner.init_captioner_params(jax.random.PRNGKey(1), mcfg, V)
    ents = np.zeros((B, E, 5), np.float32)
    ents[:, :, 0] = np.arange(E)
    facts = np.zeros((B, F, 3), np.float32)
    caps = np.ones((B, T), np.int32)
    mask = np.zeros((B, T), np.int32)
    toks = np.zeros((B, 196, 32), np.float32)
    fwd = jax.jit(lambda p, c, m, t, e, fa: captioner.captioner_forward(
        p, mcfg, V, 0, c, m, t, e, fa, deterministic=True))
    ca = fwd.lower(params, caps, mask, toks, ents, facts).compile(
    ).cost_analysis()
    analytic = B * roofline.captioner_forward_flops(mcfg, V, E, F, T)
    assert 0.8 <= ca["flops"] / analytic <= 1.35, (ca["flops"], analytic)


def test_train_step_is_three_forwards():
    cfg = config_lib.georic().model
    fwd = roofline.captioner_forward_flops(cfg, 10000, 301, 0, 32)
    assert roofline.train_step_flops(cfg, 10000, 301, 0, 32) == 3 * fwd


def test_chip_peaks_and_utilization():
    class FakeDev:
        device_kind = "TPU v5 lite"

    peaks = roofline.chip_peaks(FakeDev())
    assert peaks == (197e12, 819e9)
    u = roofline.utilization(197e12 * 0.5, 1.0, hbm_bytes=819e9 * 0.25,
                             device=FakeDev())
    assert u["mfu_pct"] == 50.0
    assert u["hbm_util_pct"] == 25.0
    assert u["chip"] == "TPU v5 lite"

    class Unknown:
        device_kind = "Quantum Abacus"

    assert roofline.chip_peaks(Unknown()) is None
    assert roofline.utilization(1e12, 1.0, device=Unknown()) == {}
    # this suite runs on CPU: the real default device must also be unknown
    assert roofline.utilization(1e12, 1.0) == {}


def test_eval_pipeline_costs_orders_of_magnitude():
    """The production geo eval shape: encode dominates FLOPs (~20 GFLOPs vs
    a few for beam decode), decode dominates HBM bytes — the BASELINE.md
    floor narrative in numbers."""
    mcfg = config_lib.georic().model
    flops, hbm = roofline.eval_pipeline_costs(
        mcfg, 10000, 301, 0, beam=5, max_len=30
    )
    encode = roofline.resnet101_encode_flops(256, mcfg.emb_dim)
    assert flops > encode > 0.5 * flops          # encode is the majority
    assert hbm > roofline.resnet101_encode_bytes(256)
