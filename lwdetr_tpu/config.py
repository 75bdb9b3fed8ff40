"""Typed model / training configuration for LW-DETR-TPU.

The reference encodes configuration as ~60 argparse flags plus one shell
script per model size (see /root/reference/main.py:39-183 and
/root/reference/scripts/*.sh).  Here the same surface is a frozen dataclass;
the five release presets (tiny/small/medium/large/xlarge) reproduce the flag
sets of `scripts/lwdetr_*_coco_train.sh` exactly.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference: main.py argparse 'Model'/'Transformer' groups)."""

    # Encoder (backbone)
    encoder: str = "vit_tiny"  # vit_tiny | vit_small | vit_base | res18vd | res50vd
    vit_encoder_num_layers: int = 12
    window_block_indexes: Tuple[int, ...] = ()
    out_feature_indexes: Tuple[int, ...] = (-1,)
    position_embedding: str = "sine"  # sine | learned
    drop_path: float = 0.0
    dropout: float = 0.0
    # remat the encoder blocks: trades ~1 extra forward of encoder FLOPs for
    # not keeping per-block activations alive through the backward — the
    # TPU-native lever for larger per-chip batches (no reference equivalent;
    # jax.checkpoint over each ViT block)
    grad_checkpointing: bool = False

    # Projector
    projector_scale: Tuple[str, ...] = ("P4",)  # subset of P3 P4 P5 P6, ascending

    # Decoder / transformer
    dec_layers: int = 3
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    sa_nheads: int = 8
    ca_nheads: int = 8
    num_queries: int = 300
    group_detr: int = 13
    two_stage: bool = False
    lite_refpoint_refine: bool = False
    dec_n_points: int = 4
    decoder_norm: str = "LN"  # LN | Identity
    bbox_reparam: bool = False
    aux_loss: bool = True

    # Detection head
    num_classes: int = 91  # COCO: max_obj_id + 1 (reference lwdetr.py:562-573)
    num_select: int = 100

    @property
    def num_feature_levels(self) -> int:
        return len(self.projector_scale)

    @property
    def embed_dim(self) -> int:
        return {"vit_tiny": 192, "vit_small": 384, "vit_base": 768}.get(self.encoder, 0)

    @property
    def num_heads(self) -> int:
        # ViT attention heads (reference backbone.py:46-52: always 12)
        return 12


@dataclass(frozen=True)
class TrainConfig:
    """Optimization hyper-parameters (reference: main.py argparse)."""

    lr: float = 1e-4
    lr_encoder: float = 1.5e-4
    batch_size: int = 2  # per-device
    weight_decay: float = 1e-4
    epochs: int = 12
    lr_drop: int = 11
    clip_max_norm: float = 0.1
    lr_vit_layer_decay: float = 0.8
    lr_component_decay: float = 1.0

    # drop scheduler (reference util/drop_scheduler.py)
    drop_mode: str = "standard"  # standard | early | late
    drop_schedule: str = "constant"  # constant | linear
    cutoff_epoch: int = 0

    # Matcher costs (reference models/matcher.py defaults via main.py)
    set_cost_class: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0

    # Loss coefficients
    cls_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    focal_alpha: float = 0.25
    sum_group_losses: bool = False
    use_varifocal_loss: bool = False
    use_position_supervised_loss: bool = False
    ia_bce_loss: bool = False

    # EMA
    use_ema: bool = False
    ema_decay: float = 0.9997

    seed: int = 42
    # static-shape padding for targets on device
    max_gt: int = 100


@dataclass(frozen=True)
class DataConfig:
    dataset_file: str = "coco"  # coco | o365
    coco_path: str = ""
    square_resize_div_64: bool = False
    # reference fidelity knob: sample the square train size per IMAGE and pad
    # the batch to its max with a pad_mask (the reference recipe,
    # coco.py:123-147 + util/misc.py:317-339). Default per-BATCH sizing keeps
    # one mask-free shape per step (same marginal scale distribution).
    per_image_scales: bool = False
    num_workers: int = 2
    eval_square_size: int = 640


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    output_dir: str = "output"
    # numerics: parameters are always fp32; compute dtype is configurable
    compute_dtype: str = "float32"  # float32 | bfloat16

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _release_train_defaults(**kw) -> TrainConfig:
    """Flag set shared by all scripts/lwdetr_*_coco_train.sh."""
    base = dict(
        lr=1e-4,
        lr_encoder=1.5e-4,
        weight_decay=1e-4,
        epochs=60,
        lr_drop=60,
        lr_vit_layer_decay=0.8,
        lr_component_decay=0.7,
        ia_bce_loss=True,
        cls_loss_coef=1.0,
        use_ema=True,
        batch_size=4,
    )
    base.update(kw)
    return TrainConfig(**base)


def _release_model_defaults(**kw) -> ModelConfig:
    base = dict(
        dec_layers=3,
        group_detr=13,
        two_stage=True,
        bbox_reparam=True,
        lite_refpoint_refine=True,
        aux_loss=True,
    )
    base.update(kw)
    return ModelConfig(**base)


# Release presets — reference scripts/lwdetr_{size}_coco_train.sh / SURVEY.md §2.7
PRESETS = {
    "tiny": Config(
        model=_release_model_defaults(
            encoder="vit_tiny",
            vit_encoder_num_layers=6,
            window_block_indexes=(0, 2, 4),
            out_feature_indexes=(1, 3, 5),
            projector_scale=("P4",),
            hidden_dim=256,
            sa_nheads=8,
            ca_nheads=16,
            dec_n_points=2,
            num_queries=100,
            num_select=100,
        ),
        train=_release_train_defaults(),
        data=DataConfig(square_resize_div_64=True),
    ),
    "small": Config(
        model=_release_model_defaults(
            encoder="vit_tiny",
            vit_encoder_num_layers=10,
            window_block_indexes=(0, 1, 3, 6, 7, 9),
            out_feature_indexes=(2, 4, 5, 9),
            projector_scale=("P4",),
            hidden_dim=256,
            sa_nheads=8,
            ca_nheads=16,
            dec_n_points=2,
            num_queries=300,
            num_select=300,
        ),
        train=_release_train_defaults(),
        data=DataConfig(square_resize_div_64=True),
    ),
    "medium": Config(
        model=_release_model_defaults(
            encoder="vit_small",
            vit_encoder_num_layers=10,
            window_block_indexes=(0, 1, 3, 6, 7, 9),
            out_feature_indexes=(2, 4, 5, 9),
            projector_scale=("P4",),
            hidden_dim=256,
            sa_nheads=8,
            ca_nheads=16,
            dec_n_points=2,
            num_queries=300,
            num_select=300,
        ),
        train=_release_train_defaults(lr_vit_layer_decay=0.7),
        data=DataConfig(square_resize_div_64=True),
    ),
    "large": Config(
        model=_release_model_defaults(
            encoder="vit_small",
            vit_encoder_num_layers=10,
            window_block_indexes=(0, 1, 3, 6, 7, 9),
            out_feature_indexes=(2, 4, 5, 9),
            projector_scale=("P3", "P5"),
            hidden_dim=384,
            sa_nheads=12,
            ca_nheads=24,
            dec_n_points=4,
            num_queries=300,
            num_select=300,
            drop_path=0.1,
        ),
        train=_release_train_defaults(lr_vit_layer_decay=0.7, lr_component_decay=0.5, batch_size=2),
        data=DataConfig(square_resize_div_64=True),
    ),
    "xlarge": Config(
        model=_release_model_defaults(
            encoder="vit_base",
            vit_encoder_num_layers=10,
            window_block_indexes=(0, 1, 3, 6, 7, 9),
            out_feature_indexes=(2, 4, 5, 9),
            projector_scale=("P3", "P5"),
            hidden_dim=384,
            sa_nheads=12,
            ca_nheads=24,
            dec_n_points=4,
            num_queries=300,
            num_select=300,
            drop_path=0.1,
        ),
        train=_release_train_defaults(
            lr_vit_layer_decay=0.75, lr_component_decay=0.5, weight_decay=1e-3, batch_size=2
        ),
        data=DataConfig(square_resize_div_64=True),
    ),
}


def get_config(name: str, **overrides) -> Config:
    cfg = PRESETS[name]
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return cfg
