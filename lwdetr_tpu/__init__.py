"""LW-DETR-TPU: TPU-native real-time detection framework.

Public API (mirrors the reference's build entry points,
/root/reference/models/__init__.py:16-17, models/lwdetr.py:562-619):

    from lwdetr_tpu import get_config, build_model, SetCriterion, post_process
"""

from lwdetr_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, get_config, PRESETS

__version__ = "0.1.0"


def build_model(model_cfg, **kw):
    from lwdetr_tpu.models.lwdetr import build_model as _b

    return _b(model_cfg, **kw)


def build_criterion_and_postprocessors(cfg):
    """(criterion, postprocess fn) — reference build() returns
    (model, criterion, postprocessors)."""
    import functools

    from lwdetr_tpu.models.criterion import SetCriterion
    from lwdetr_tpu.models.lwdetr import post_process

    criterion = SetCriterion(cfg.model, cfg.train)
    postprocess = functools.partial(post_process, num_select=cfg.model.num_select)
    return criterion, {"bbox": postprocess}
