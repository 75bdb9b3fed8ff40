"""Numeric parity of flax modules vs torch primitives, through the
checkpoint converter's weight-layout transforms, plus mapping coverage."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from lwdetr_tpu.config import ModelConfig
from lwdetr_tpu.models.projector import ChannelLayerNorm, ConvX
from lwdetr_tpu.models.transformer import MultiheadSelfAttention
from lwdetr_tpu.train import checkpoint as ckpt


def test_conv_stride2_padding_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, 9, 8)).astype(np.float32)
    w = rng.standard_normal((16, 8, 3, 3)).astype(np.float32)  # torch (out,in,kh,kw)

    tc = tnn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
    tc.weight.data = torch.tensor(w)
    ref = tc(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    import flax.linen as nn
    conv = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False)
    out = conv.apply({"params": {"kernel": jnp.asarray(ckpt._t2f(w, "conv_w"))}},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 5, 8)).astype(np.float32)
    w = rng.standard_normal((8, 4, 2, 2)).astype(np.float32)  # torch (in,out,kh,kw)
    b = rng.standard_normal((4,)).astype(np.float32)

    tc = tnn.ConvTranspose2d(8, 4, 2, stride=2)
    tc.weight.data = torch.tensor(w)
    tc.bias.data = torch.tensor(b)
    ref = tc(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()

    import flax.linen as nn
    conv = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    out = conv.apply(
        {"params": {"kernel": jnp.asarray(ckpt._t2f(w, "convT_w")),
                    "bias": jnp.asarray(b)}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_convx_bn_eval_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 7, 7, 8)).astype(np.float32)
    w = rng.standard_normal((8, 8, 3, 3)).astype(np.float32)
    bn_w = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    bn_b = rng.standard_normal(8).astype(np.float32)
    bn_m = rng.standard_normal(8).astype(np.float32)
    bn_v = rng.uniform(0.5, 2.0, 8).astype(np.float32)

    conv = tnn.Conv2d(8, 8, 3, 1, 1, bias=False)
    conv.weight.data = torch.tensor(w)
    bn = tnn.BatchNorm2d(8).eval()
    bn.weight.data = torch.tensor(bn_w)
    bn.bias.data = torch.tensor(bn_b)
    bn.running_mean.data = torch.tensor(bn_m)
    bn.running_var.data = torch.tensor(bn_v)
    ref = F.silu(bn(conv(torch.tensor(x).permute(0, 3, 1, 2))))
    ref = ref.permute(0, 2, 3, 1).detach().numpy()

    mod = ConvX(8, 3, act="silu")
    variables = {
        "params": {"conv": {"kernel": jnp.asarray(ckpt._t2f(w, "conv_w"))},
                   "bn": {"scale": jnp.asarray(bn_w), "bias": jnp.asarray(bn_b)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(bn_m), "var": jnp.asarray(bn_v)}},
    }
    out = mod.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_channel_layernorm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 5, 16)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    ref = (xt - u) / torch.sqrt(s + 1e-6)
    ref = (torch.tensor(w)[:, None, None] * ref + torch.tensor(b)[:, None, None])
    ref = ref.permute(0, 2, 3, 1).numpy()

    out = ChannelLayerNorm().apply(
        {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_self_attention_matches_torch_mha():
    rng = np.random.default_rng(4)
    C, H = 32, 4
    q = rng.standard_normal((2, 6, C)).astype(np.float32)
    v = rng.standard_normal((2, 6, C)).astype(np.float32)
    in_w = rng.standard_normal((3 * C, C)).astype(np.float32) * 0.1
    in_b = rng.standard_normal((3 * C,)).astype(np.float32) * 0.1
    out_w = rng.standard_normal((C, C)).astype(np.float32) * 0.1
    out_b = rng.standard_normal((C,)).astype(np.float32) * 0.1

    ref, _ = F.multi_head_attention_forward(
        torch.tensor(q).transpose(0, 1), torch.tensor(q).transpose(0, 1),
        torch.tensor(v).transpose(0, 1), C, H,
        torch.tensor(in_w), torch.tensor(in_b), None, None, False, 0.0,
        torch.tensor(out_w), torch.tensor(out_b), training=False,
        need_weights=False)
    ref = ref.transpose(0, 1).detach().numpy()

    mod = MultiheadSelfAttention(C, H)
    variables = {"params": {
        "in_proj_kernel": jnp.asarray(in_w.T),
        "in_proj_bias": jnp.asarray(in_b),
        "out_proj": {"kernel": jnp.asarray(out_w.T), "bias": jnp.asarray(out_b)},
    }}
    out = mod.apply(variables, jnp.asarray(q), jnp.asarray(q), jnp.asarray(v),
                    deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_mapping_covers_all_params():
    """Every leaf of the model's param tree must be covered by the converter
    mapping (catches drift between model and bridge)."""
    from lwdetr_tpu.models.lwdetr import build_model

    cfg = ModelConfig(
        encoder="vit_tiny", vit_encoder_num_layers=2,
        window_block_indexes=(0,), out_feature_indexes=(0, 1),
        projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
        sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
        group_detr=2, num_queries=12, num_classes=7,
        two_stage=True, bbox_reparam=True, lite_refpoint_refine=True)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), train=True)

    mapped = {(coll,) + fp for _, coll, fp, _ in ckpt.build_mapping(cfg)}
    leaves = set()
    for coll in ("params", "batch_stats"):
        if coll not in variables:
            continue
        flat = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, _ in flat:
            leaves.add((coll,) + tuple(getattr(k, "key", str(k)) for k in path))
    unmapped = leaves - mapped
    assert not unmapped, f"unmapped leaves: {sorted(unmapped)[:10]}"
    extra = mapped - leaves
    assert not extra, f"mapping references missing leaves: {sorted(extra)[:10]}"


def test_roundtrip_torch_flax_torch():
    from lwdetr_tpu.models.lwdetr import build_model

    cfg = ModelConfig(
        encoder="vit_tiny", vit_encoder_num_layers=2,
        window_block_indexes=(0,), out_feature_indexes=(0, 1),
        projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
        sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
        group_detr=2, num_queries=12, num_classes=7,
        two_stage=True, bbox_reparam=True, lite_refpoint_refine=True)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), train=True)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd = ckpt.flax_to_torch(variables, cfg)
    back = ckpt.torch_to_flax(sd, cfg)

    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b_tree = back
    for path, val in flat_a:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        node = flat_b_tree
        for k in keys:
            node = node[k]
        np.testing.assert_array_equal(np.asarray(val), node, err_msg=str(keys))


def test_load_pretrained_encoder(tmp_path):
    """CAE checkpoint ('encoder.'-prefixed ViT keys, reference
    backbone.py:77-85) loads into the encoder subtree; non-ViT keys and
    shape-mismatched arrays are skipped (strict=False semantics)."""
    from lwdetr_tpu.models.lwdetr import build_model

    cfg = ModelConfig(
        encoder="vit_tiny", vit_encoder_num_layers=2,
        window_block_indexes=(0,), out_feature_indexes=(0, 1),
        projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
        sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
        group_detr=2, num_queries=12, num_classes=7,
        two_stage=True, bbox_reparam=True, lite_refpoint_refine=True)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), train=True)
    variables = jax.tree.map(np.asarray, dict(variables))

    # synthesize a CAE-style checkpoint from the model's own encoder weights
    sd_full = ckpt.flax_to_torch(variables, cfg)
    enc_prefix = "backbone.0.encoder."
    cae_sd = {"encoder." + k[len(enc_prefix):]: torch.from_numpy(
                  np.ascontiguousarray(v * 2.0))
              for k, v in sd_full.items() if k.startswith(enc_prefix)}
    cae_sd["decoder.some_head.weight"] = torch.zeros(3, 3)  # must be ignored
    path = tmp_path / "cae.pth"
    torch.save({"model": cae_sd}, path)

    loaded = ckpt.load_pretrained_encoder(str(path), cfg)
    enc = loaded["params"]["backbone"]["encoder"]
    np.testing.assert_allclose(
        enc["patch_embed"]["kernel"],
        2.0 * variables["params"]["backbone"]["encoder"]["patch_embed"]["kernel"],
        rtol=1e-6)
    np.testing.assert_allclose(
        enc["blocks_1"]["attn"]["qkv_kernel"],
        2.0 * variables["params"]["backbone"]["encoder"]["blocks_1"]["attn"]["qkv_kernel"],
        rtol=1e-6)
    assert "projector" not in loaded["params"].get("backbone", {})

    # non-strict merge skips shape mismatches
    import main as cli
    base = variables["params"]
    bad = {"backbone": {"encoder": {"pos_embed": np.zeros((1, 5, 3), np.float32)}}}
    merged = cli._merge(base, bad)
    assert merged["backbone"]["encoder"]["pos_embed"].shape == \
        base["backbone"]["encoder"]["pos_embed"].shape
