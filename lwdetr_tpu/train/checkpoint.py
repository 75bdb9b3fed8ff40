"""Checkpointing: orbax save/restore + torch .pth <-> flax pytree bridge.

The bridge covers the released LW-DETR checkpoint namespace
(/root/reference/README.md:114-150; key layout defined by
models/lwdetr.py, models/transformer.py, models/backbone/*) so HuggingFace
`LWDETR_*_coco.pth` weights load into the TPU model for bit-faithful
inference.  The mapping is an explicit table generated from the ModelConfig,
usable in both directions (useful for tests and for exporting back).

Weight-layout conventions converted here:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  torch ConvT2d (in, out, kh, kw)-> flax ConvTranspose kernel (kh, kw, in, out)
  torch LN/BN weight             -> flax scale
  BN running_mean/var            -> batch_stats mean/var
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from lwdetr_tpu.config import ModelConfig

# one mapping entry: (torch_key, collection, flax_path, kind)
# kind in {dense_w, conv_w, convT_w, raw}
Entry = Tuple[str, str, Tuple[str, ...], str]


def _dense(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return [
        (tk + ".weight", "params", fp + ("kernel",), "dense_w"),
        (tk + ".bias", "params", fp + ("bias",), "raw"),
    ]


def _ln(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return [
        (tk + ".weight", "params", fp + ("scale",), "raw"),
        (tk + ".bias", "params", fp + ("bias",), "raw"),
    ]


def _chan_ln(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    # projector channel LayerNorm uses weight/bias param names
    return [
        (tk + ".weight", "params", fp + ("weight",), "raw"),
        (tk + ".bias", "params", fp + ("bias",), "raw"),
    ]


def _bn(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return [
        (tk + ".weight", "params", fp + ("scale",), "raw"),
        (tk + ".bias", "params", fp + ("bias",), "raw"),
        (tk + ".running_mean", "batch_stats", fp + ("mean",), "raw"),
        (tk + ".running_var", "batch_stats", fp + ("var",), "raw"),
    ]


def _convx(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return [
        (tk + ".conv.weight", "params", fp + ("conv", "kernel"), "conv_w"),
    ] + _bn(tk + ".bn", fp + ("bn",))


def _mlp_head(tk: str, fp: Tuple[str, ...], n: int = 3) -> List[Entry]:
    out = []
    for i in range(n):
        out += _dense(f"{tk}.layers.{i}", fp + (f"layers_{i}",))
    return out


def _bottleneck(tk: str, fp: Tuple[str, ...]) -> List[Entry]:
    return _convx(tk + ".cv1", fp + ("cv1",)) + _convx(tk + ".cv2", fp + ("cv2",))


def _c2f(tk: str, fp: Tuple[str, ...], n: int = 3) -> List[Entry]:
    out = _convx(tk + ".cv1", fp + ("cv1",)) + _convx(tk + ".cv2", fp + ("cv2",))
    for i in range(n):
        out += _bottleneck(f"{tk}.m.{i}", fp + (f"m_{i}",))
    return out


def build_mapping(cfg: ModelConfig) -> List[Entry]:
    m: List[Entry] = []

    # ---- top-level heads (lwdetr.py:62-99) ----
    m += _dense("class_embed", ("class_embed",))
    m += _mlp_head("bbox_embed", ("bbox_embed",))
    m.append(("refpoint_embed.weight", "params", ("refpoint_embed",), "raw"))
    m.append(("query_feat.weight", "params", ("query_feat",), "raw"))
    if cfg.position_embedding == "learned":
        # Joiner index 1 is the position encoding
        # (reference models/backbone/__init__.py:11-23, position_encoding.py:98-128)
        m.append(("backbone.1.row_embed.weight", "params",
                  ("pos_embedding", "row_embed"), "raw"))
        m.append(("backbone.1.col_embed.weight", "params",
                  ("pos_embedding", "col_embed"), "raw"))

    # ---- decoder (transformer.py) ----
    for i in range(cfg.dec_layers):
        t = f"transformer.decoder.layers.{i}"
        f = ("transformer", f"layers_{i}")
        m.append((t + ".self_attn.in_proj_weight", "params",
                  f + ("self_attn", "in_proj_kernel"), "dense_w"))
        m.append((t + ".self_attn.in_proj_bias", "params",
                  f + ("self_attn", "in_proj_bias"), "raw"))
        m += _dense(t + ".self_attn.out_proj", f + ("self_attn", "out_proj"))
        for proj in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            m += _dense(t + f".cross_attn.{proj}", f + ("cross_attn", proj))
        m += _dense(t + ".linear1", f + ("linear1",))
        m += _dense(t + ".linear2", f + ("linear2",))
        for nrm in ("norm1", "norm2", "norm3"):
            m += _ln(t + f".{nrm}", f + (nrm,))
    m += _mlp_head("transformer.decoder.ref_point_head",
                   ("transformer", "ref_point_head"), n=2)
    if cfg.decoder_norm == "LN":
        m += _ln("transformer.decoder.norm", ("transformer", "decoder_norm"))
    if cfg.two_stage:
        for g in range(cfg.group_detr):
            m += _dense(f"transformer.enc_output.{g}",
                        ("transformer", f"enc_output_{g}"))
            m += _ln(f"transformer.enc_output_norm.{g}",
                     ("transformer", f"enc_output_norm_{g}"))
            m += _dense(f"transformer.enc_out_class_embed.{g}",
                        ("transformer", f"enc_out_class_embed_{g}"))
            m += _mlp_head(f"transformer.enc_out_bbox_embed.{g}",
                           ("transformer", f"enc_out_bbox_embed_{g}"))

    # ---- ViT encoder (backbone.0.encoder.*, vit.py) ----
    enc_t = "backbone.0.encoder"
    enc_f = ("backbone", "encoder")
    if "vit" in cfg.encoder:
        m.append((enc_t + ".pos_embed", "params", enc_f + ("pos_embed",), "raw"))
        m.append((enc_t + ".patch_embed.proj.weight", "params",
                  enc_f + ("patch_embed", "kernel"), "conv_w"))
        m.append((enc_t + ".patch_embed.proj.bias", "params",
                  enc_f + ("patch_embed", "bias"), "raw"))
        for i in range(cfg.vit_encoder_num_layers):
            t = f"{enc_t}.blocks.{i}"
            f = enc_f + (f"blocks_{i}",)
            m += _ln(t + ".norm1", f + ("norm1",))
            m += _ln(t + ".norm2", f + ("norm2",))
            m.append((t + ".attn.qkv.weight", "params",
                      f + ("attn", "qkv_kernel"), "dense_w"))
            m.append((t + ".attn.q_bias", "params", f + ("attn", "q_bias"), "raw"))
            m.append((t + ".attn.v_bias", "params", f + ("attn", "v_bias"), "raw"))
            m += _dense(t + ".attn.proj", f + ("attn", "proj"))
            m.append((t + ".gamma_1", "params", f + ("gamma_1",), "raw"))
            m.append((t + ".gamma_2", "params", f + ("gamma_2",), "raw"))
            m += _dense(t + ".mlp.fc1", f + ("mlp", "fc1"))
            m += _dense(t + ".mlp.fc2", f + ("mlp", "fc2"))

    # ---- projector (backbone.0.projector.*, projector.py) ----
    proj_t = "backbone.0.projector"
    proj_f = ("backbone", "projector")
    level2scale = {"P3": 2.0, "P4": 1.0, "P5": 0.5, "P6": 0.25}
    scales = [level2scale[s] for s in cfg.projector_scale]
    in_dim = cfg.embed_dim if "vit" in cfg.encoder else 0
    si = 0  # module index skips 0.25 (pool-only)
    for scale in scales:
        if scale == 0.25:
            continue
        for j in range(len(cfg.out_feature_indexes)):
            t = f"{proj_t}.stages_sampling.{si}.{j}"
            f = proj_f + (f"sampling_{si}_{j}",)
            if scale == 4.0:
                m.append((t + ".0.weight", "params", f + ("up1", "kernel"), "convT_w"))
                m.append((t + ".0.bias", "params", f + ("up1", "bias"), "raw"))
                m += _chan_ln(t + ".1", f + ("ln",))
                m.append((t + ".3.weight", "params", f + ("up2", "kernel"), "convT_w"))
                m.append((t + ".3.bias", "params", f + ("up2", "bias"), "raw"))
            elif scale == 2.0:
                if in_dim > 512:
                    m += _convx(t + ".0", f + ("reduce",))
                    m.append((t + ".1.weight", "params", f + ("up", "kernel"), "convT_w"))
                    m.append((t + ".1.bias", "params", f + ("up", "bias"), "raw"))
                else:
                    m.append((t + ".0.weight", "params", f + ("up", "kernel"), "convT_w"))
                    m.append((t + ".0.bias", "params", f + ("up", "bias"), "raw"))
            elif scale == 0.5:
                m += _convx(t + ".0", f + ("down",))
            # scale 1.0: identity, no params
        m += _c2f(f"{proj_t}.stages.{si}.0", proj_f + (f"stage_{si}",))
        m += _chan_ln(f"{proj_t}.stages.{si}.1", proj_f + (f"stage_ln_{si}",))
        si += 1

    return m


def _t2f(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "dense_w":
        return arr.T
    if kind == "conv_w":  # (out, in, kh, kw) -> (kh, kw, in, out)
        return arr.transpose(2, 3, 1, 0)
    if kind == "convT_w":
        # torch (in, out, kh, kw) -> flax (kh, kw, in, out) with SPATIAL FLIP:
        # lax.conv_transpose(transpose_kernel=False) correlates the kernel
        # while torch ConvTranspose2d scatters it (flipped convention)
        return np.ascontiguousarray(arr.transpose(2, 3, 0, 1)[::-1, ::-1])
    return arr


def _f2t(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "dense_w":
        return arr.T
    if kind == "conv_w":
        return arr.transpose(3, 2, 0, 1)
    if kind == "convT_w":
        return np.ascontiguousarray(arr[::-1, ::-1].transpose(2, 3, 0, 1))
    return arr


def _set_path(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _get_path(tree: dict, path: Tuple[str, ...]):
    node = tree
    for k in path:
        node = node[k]
    return node


def clean_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip DDP 'module.' prefixes (reference util/utils.py:109-115)."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def torch_to_flax(state_dict: Dict[str, np.ndarray], cfg: ModelConfig,
                  strict: bool = True):
    """torch state_dict (numpy values) -> {'params': …, 'batch_stats': …}."""
    sd = clean_state_dict(state_dict)
    out = {"params": {}, "batch_stats": {}}
    missing = []
    for tk, coll, fp, kind in build_mapping(cfg):
        if tk not in sd:
            missing.append(tk)
            continue
        _set_path(out[coll], fp, np.asarray(_t2f(np.asarray(sd[tk]), kind)))
    if strict and missing:
        raise KeyError(f"missing {len(missing)} keys, e.g. {missing[:5]}")
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def flax_to_torch(variables: dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    sd = {}
    for tk, coll, fp, kind in build_mapping(cfg):
        tree = variables.get(coll, {})
        try:
            arr = _get_path(tree, fp)
        except KeyError:
            continue
        sd[tk] = _f2t(np.asarray(arr), kind)
    return sd


def load_pretrained_encoder(path: str, cfg: ModelConfig) -> dict:
    """Load a CAE-pretrained ViT checkpoint into the encoder subtree.

    Reference backbone.py:77-85: torch.load(...)['model'], strip the
    'encoder.' key prefix, load_state_dict(strict=False) into the ViT.
    Returns {'params': {'backbone': {'encoder': ...}}} with whatever keys
    matched; callers merge it non-strictly over freshly-init params.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k.replace("encoder.", "", 1) if k.startswith("encoder.") else k: v
          for k, v in sd.items()}
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    enc_prefix = "backbone.0.encoder."
    out: dict = {"params": {}}
    for tk, coll, fp, kind in build_mapping(cfg):
        if not tk.startswith(enc_prefix) or coll != "params":
            continue
        short = tk[len(enc_prefix):]
        if short not in sd:
            continue
        _set_path(out["params"], fp, np.asarray(_t2f(np.asarray(sd[short]), kind)))
    return out


def load_orbax_variables(ckpt_dir: str, use_ema: bool = False):
    """Load inference variables {'params', 'batch_stats'} from a native
    orbax train-state dir (what main.py saves), without needing the
    optimizer to rebuild an abstract state. `use_ema=True` returns the
    EMA weights when present."""
    wait_for_checkpoints()  # drain in-flight async writes before reading
    path = os.path.abspath(ckpt_dir)
    mgr = _manager(path, keep=None)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {ckpt_dir}")
    raw = mgr.restore(step)  # raw pytree, saved structure
    if use_ema and raw.get("ema"):
        src = raw["ema"]
    else:
        src = raw
    return {"params": src["params"], "batch_stats": src.get("batch_stats", {})}


def load_pth(path: str, cfg: ModelConfig, key: str = "model"):
    """Load a reference .pth checkpoint into flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get(key, ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return torch_to_flax(sd, cfg)


# ---- orbax-based native checkpointing (reference main.py:327-344 resume) ----

# Persistent managers with async checkpointing: save() copies device->host
# synchronously (safe under buffer donation) and writes to disk in the
# background, so epoch saves overlap the next epoch's compute (~seconds for
# small, tens of seconds for xlarge's ~1.9 GB train state). Managers stay
# open for the process lifetime; wait_for_checkpoints() drains them (called
# by restore, by the preemption path, and at interpreter exit).
_MANAGERS: dict = {}


def _manager(path: str, keep, for_save: bool = False):
    import orbax.checkpoint as ocp

    entry = _MANAGERS.get(path)
    if entry is not None:
        mgr, cached_keep = entry
        # a restore-created manager (keep=None) must not own retention once
        # saves start on the same dir (e.g. --resume out/ckpt then training
        # keeps saving there) — recreate with the save-time policy
        if for_save and cached_keep is None and keep is not None:
            mgr.wait_until_finished()
            mgr.close()
        else:
            return mgr
    mgr = ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=True))
    if not _MANAGERS:
        import atexit

        atexit.register(wait_for_checkpoints)
    _MANAGERS[path] = (mgr, keep)
    return mgr


def wait_for_checkpoints():
    """Block until every in-flight async checkpoint write has finished."""
    for mgr, _ in _MANAGERS.values():
        mgr.wait_until_finished()


def save_checkpoint(ckpt_dir: str, step: int, state, keep: int = 3,
                    block: bool = False):
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    mgr = _manager(path, keep, for_save=True)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if block:
        mgr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, abstract_state, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    wait_for_checkpoints()  # drain in-flight async writes before reading
    path = os.path.abspath(ckpt_dir)
    mgr = _manager(path, keep=None)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None, None
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state)), step
