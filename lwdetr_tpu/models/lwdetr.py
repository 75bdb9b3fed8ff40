"""LW-DETR top-level model: backbone -> projector -> decoder -> heads.

TPU-native re-design of /root/reference/models/lwdetr.py:36-215.  Notable
departures from the reference, all behavior-preserving:

* channel-last feature maps end to end;
* the per-level sine position embeddings computed by the reference's Joiner
  (backbone/__init__.py:16-23) are never consumed by the decoder
  (transformer.py:466-517 ignores `pos`), so we skip computing them — the
  sine embedding lives in ops/embeddings.py for API parity;
* inference uses only the first query group (lwdetr.py:141-144) — group
  slicing is static so train/eval compile to separate programs;
* masks are optional: the release `square_resize_div_64` recipe produces
  unpadded square batches, in which case the mask path folds away.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lwdetr_tpu.config import ModelConfig
from lwdetr_tpu.models.projector import MultiScaleProjector
from lwdetr_tpu.models.transformer import MLPHead, Transformer, box_reparam_combine
from lwdetr_tpu.models.vit import ViT
from lwdetr_tpu.ops import box_ops

LEVEL2SCALE = {"P3": 2.0, "P4": 1.0, "P5": 0.5, "P6": 0.25}


class Backbone(nn.Module):
    """Encoder + projector (reference models/backbone/backbone.py:31-171)."""

    cfg: ModelConfig
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        if "vit" in cfg.encoder:
            self.encoder = ViT(
                embed_dim=cfg.embed_dim,
                depth=cfg.vit_encoder_num_layers,
                num_heads=cfg.num_heads,
                window_block_indexes=cfg.window_block_indexes,
                out_feature_indexes=cfg.out_feature_indexes,
                use_cae=True,
                remat=cfg.grad_checkpointing,
                dtype=self.dtype,
                name="encoder",
            )
            in_channels = [cfg.embed_dim] * len(cfg.out_feature_indexes)
        elif "res" in cfg.encoder:
            from lwdetr_tpu.models.presnet import PResNet

            self.encoder = PResNet(
                depth=int("".join(c for c in cfg.encoder if c.isdigit())),
                return_idx=(1, 2, 3),
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
                name="encoder",
            )
            in_channels = self.encoder.out_channels
        else:
            raise NotImplementedError(cfg.encoder)

        scale_factors = [LEVEL2SCALE[l] for l in cfg.projector_scale]
        self.projector = MultiScaleProjector(
            in_channels=in_channels,
            out_channels=cfg.hidden_dim,
            scale_factors=scale_factors,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            name="projector",
        )

    def __call__(self, images, drop_path_rates=None, train: bool = False):
        if "vit" in self.cfg.encoder:
            feats = self.encoder(images, drop_path_rates, deterministic=not train)
        else:
            feats = self.encoder(images, train=train)
        return self.projector(feats, train=train)


class LearnedPositionEncoding(nn.Module):
    """Learned 50x50 row/col position embedding
    (reference models/position_encoding.py:98-128: nn.Embedding(50, C) pairs
    with uniform init; output channels ordered [col(x), row(y)])."""

    num_pos_feats: int

    @nn.compact
    def __call__(self, h: int, w: int):
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (50, self.num_pos_feats), jnp.float32)
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (50, self.num_pos_feats), jnp.float32)
        grid_x = jnp.broadcast_to(col[None, :w, :], (h, w, self.num_pos_feats))
        grid_y = jnp.broadcast_to(row[:h, None, :], (h, w, self.num_pos_feats))
        return jnp.concatenate([grid_x, grid_y], axis=-1)  # (h, w, 2C)


class LWDETR(nn.Module):
    """Group-DETR-v3 detector (reference models/lwdetr.py:36-215)."""

    cfg: ModelConfig
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.backbone = Backbone(cfg, bn_axis_name=self.bn_axis_name,
                                 dtype=self.dtype, name="backbone")
        self.transformer = Transformer(
            d_model=cfg.hidden_dim,
            sa_nheads=cfg.sa_nheads,
            ca_nheads=cfg.ca_nheads,
            num_queries=cfg.num_queries,
            dec_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            group_detr=cfg.group_detr,
            two_stage=cfg.two_stage,
            num_feature_levels=cfg.num_feature_levels,
            dec_n_points=cfg.dec_n_points,
            lite_refpoint_refine=cfg.lite_refpoint_refine,
            bbox_reparam=cfg.bbox_reparam,
            decoder_norm=cfg.decoder_norm,
            num_classes=cfg.num_classes,
            dtype=self.dtype,
            name="transformer",
        )
        prior = -math.log((1 - 0.01) / 0.01)  # focal prior (lwdetr.py:84-87)
        self.class_embed = nn.Dense(
            cfg.num_classes, dtype=self.dtype,
            bias_init=nn.initializers.constant(prior), name="class_embed")
        self.bbox_embed = MLPHead(cfg.hidden_dim, 4, 3, zero_init_last=True,
                                  dtype=self.dtype, name="bbox_embed")
        self.refpoint_embed = self.param(
            "refpoint_embed", nn.initializers.zeros,
            (cfg.num_queries * cfg.group_detr, 4), jnp.float32)
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0),
            (cfg.num_queries * cfg.group_detr, cfg.hidden_dim), jnp.float32)
        if cfg.position_embedding == "learned":
            self.pos_embedding = LearnedPositionEncoding(
                cfg.hidden_dim // 2, name="pos_embedding")

    def __call__(self, images, masks=None, drop_path_rates=None,
                 dropout_rate=0.0, train: bool = False):
        """images (B, H, W, 3) normalized; masks (B, H, W) True=pad or None.

        Returns dict(pred_logits (B, Q, K), pred_boxes (B, Q, 4) cxcywh in [0,1],
        aux_outputs list, enc_outputs dict) — matching lwdetr.py:161-173.
        """
        cfg = self.cfg
        feats = self.backbone(images, drop_path_rates, train=train)

        feat_masks = None
        if masks is not None:
            feat_masks = [_interpolate_mask(masks, f.shape[1:3]) for f in feats]

        # Per-level position embeddings (the reference Joiner's second half,
        # backbone/__init__.py:16-23). The decoder never consumes them
        # (transformer.py:466-517), so XLA dead-code-eliminates this compute
        # under jit — kept for exact module/parameter surface parity.
        pos_embeds = [self._pos_embed(f, m) for f, m in zip(
            feats, feat_masks if feat_masks is not None else [None] * len(feats))]

        group_detr = cfg.group_detr if train else 1
        nq = cfg.num_queries * group_detr
        refpoint_w = self.refpoint_embed[:nq]
        query_w = self.query_feat[:nq]

        hs, ref, hs_enc, ref_enc = self.transformer(
            feats, feat_masks, pos_embeds, refpoint_w, query_w,
            bbox_embed=None if cfg.lite_refpoint_refine else self.bbox_embed,
            dropout_rate=dropout_rate, train=train)

        if cfg.bbox_reparam:
            delta = self.bbox_embed(hs)
            outputs_coord = box_reparam_combine(ref, delta)
        else:
            outputs_coord = jax.nn.sigmoid(self.bbox_embed(hs) + ref)
        outputs_class = self.class_embed(hs)

        out = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
        }
        if cfg.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": outputs_class[i], "pred_boxes": outputs_coord[i]}
                for i in range(cfg.dec_layers - 1)
            ]
        if cfg.two_stage:
            # per-group class scores on the selected proposals (lwdetr.py:165-173)
            cls_enc = []
            for g in range(group_detr):
                sl = hs_enc[:, g * cfg.num_queries:(g + 1) * cfg.num_queries]
                cls_enc.append(self.transformer.enc_out_class_embed[g](sl))
            out["enc_outputs"] = {
                "pred_logits": jnp.concatenate(cls_enc, axis=1),
                "pred_boxes": ref_enc,
            }
        return out

    def _pos_embed(self, feat, feat_mask):
        """One level's position embedding (B, H, W, hidden_dim)."""
        from lwdetr_tpu.ops.embeddings import sine_position_embedding

        B, H, W = feat.shape[0], feat.shape[1], feat.shape[2]
        if self.cfg.position_embedding == "learned":
            grid = self.pos_embedding(H, W)
            return jnp.broadcast_to(grid[None], (B,) + grid.shape)
        mask = feat_mask if feat_mask is not None \
            else jnp.zeros((B, H, W), bool)
        return sine_position_embedding(
            mask, num_pos_feats=self.cfg.hidden_dim // 2)


def _interpolate_mask(masks: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-resize a (B, H, W) bool mask to feature resolution
    (reference backbone.py:155-158 uses F.interpolate on float mask)."""
    from lwdetr_tpu.ops.resize import nearest_resize_index

    hi = jnp.asarray(nearest_resize_index(masks.shape[1], hw[0]))
    wi = jnp.asarray(nearest_resize_index(masks.shape[2], hw[1]))
    return masks[:, hi][:, :, wi]


def _exact_top_k(flat: jnp.ndarray, k: int):
    """Exact top-k via a two-stage tiled reduction.

    Any global top-k element is in its tile's top-k, so per-tile top-k
    followed by top-k over the T*k candidates is exact.  At LW-DETR
    postprocess shapes ((32, 27300) -> 300) the tiled form measures
    0.93 ms vs 1.41 ms for one flat `lax.top_k` on v5e (S ~= 13k per
    tile is the sweet spot; larger tiles re-approach the flat cost,
    smaller ones pay the stage-2 merge)."""
    B, N = flat.shape
    T = max(1, round(N / (13 * k)))
    if T <= 1 or N < 2 * k:
        return jax.lax.top_k(flat, k)
    S = -(-N // T)
    if T * S != N:
        flat_p = jnp.pad(flat, [(0, 0), (0, T * S - N)],
                         constant_values=-jnp.inf)
    else:
        flat_p = flat
    v1, i1 = jax.lax.top_k(flat_p.reshape(B, T, S), min(k, S))
    base = (jnp.arange(T, dtype=i1.dtype) * S)[None, :, None]
    cand_i = (i1 + base).reshape(B, -1)
    v2, i2 = jax.lax.top_k(v1.reshape(B, -1), k)
    return v2, jnp.take_along_axis(cand_i, i2, axis=1)


def post_process(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    target_sizes: jnp.ndarray,
    num_select: int = 300,
):
    """NMS-free top-k decode (reference lwdetr.py:509-544).

    pred_logits (B, Q, K); pred_boxes (B, Q, 4) cxcywh normalized;
    target_sizes (B, 2) as (h, w).
    Returns (scores (B, S), labels (B, S), boxes (B, S, 4) xyxy absolute).

    Selection runs on raw logits (sigmoid is monotonic, applied only to the
    selected k — the reference sigmoids all Q*K scores first, lwdetr.py:525)
    through the exact two-stage tiled top-k.  A `lax.approx_max_k` variant
    existed through round 3 but the two-stage exact form now beats it at
    every preset shape (BENCH_r03.json: exact 1028 vs approx 1013 img/s),
    so the approximate path was removed.
    """
    B, Q, K = pred_logits.shape
    flat = pred_logits.reshape(B, Q * K)
    top_logits, topk_idx = _exact_top_k(flat, num_select)
    scores = jax.nn.sigmoid(top_logits)
    topk_boxes = topk_idx // K
    labels = topk_idx % K
    boxes = box_ops.box_cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1).astype(boxes.dtype)
    return scores, labels, boxes * scale[:, None, :]


def build_model(cfg: ModelConfig, bn_axis_name: Optional[str] = None,
                dtype=jnp.float32) -> LWDETR:
    return LWDETR(cfg, bn_axis_name=bn_axis_name, dtype=dtype)
