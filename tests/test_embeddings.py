"""Parity tests for sine embeddings vs torch oracles restating the reference math
(/root/reference/models/position_encoding.py:45-70, models/transformer.py:42-68)."""
import math

import numpy as np
import torch

from lwdetr_tpu.ops.embeddings import query_sine_embed, sine_position_embedding


def torch_sine_position(mask, num_pos_feats=128, temperature=10000.0):
    not_mask = ~mask
    y_embed = not_mask.cumsum(1, dtype=torch.float32)
    x_embed = not_mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3)  # (B, H, W, C) channel-last


def torch_query_sine(pos_tensor, dim=128):
    scale = 2 * math.pi
    dim_t = torch.arange(dim, dtype=torch.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / dim)

    def emb(x):
        p = x[:, :, None] * scale / dim_t
        return torch.stack((p[:, :, 0::2].sin(), p[:, :, 1::2].cos()), dim=3).flatten(2)

    pos_x = emb(pos_tensor[:, :, 0])
    pos_y = emb(pos_tensor[:, :, 1])
    if pos_tensor.size(-1) == 2:
        return torch.cat((pos_y, pos_x), dim=2)
    pos_w = emb(pos_tensor[:, :, 2])
    pos_h = emb(pos_tensor[:, :, 3])
    return torch.cat((pos_y, pos_x, pos_w, pos_h), dim=2)


def test_sine_position_embedding_parity():
    mask = np.zeros((2, 7, 9), dtype=bool)
    mask[0, 5:, :] = True  # padded rows
    mask[1, :, 6:] = True  # padded cols
    out = sine_position_embedding(mask, num_pos_feats=64)
    ref = torch_sine_position(torch.tensor(mask), num_pos_feats=64)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=5e-5)
    assert out.shape == (2, 7, 9, 128)


def test_query_sine_embed_parity():
    rng = np.random.default_rng(0)
    for last in (2, 4):
        pos = rng.uniform(0, 1, (3, 11, last)).astype(np.float32)
        out = query_sine_embed(pos, dim=128)
        ref = torch_query_sine(torch.tensor(pos), dim=128)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=5e-5)
