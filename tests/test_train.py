"""End-to-end training: loss decreases and the model overfits a synthetic box.

Validates forward + Hungarian matching + IA-BCE/L1/GIoU losses + AdamW with
param-group lr trees + EMA, all inside one jitted step (the TPU analogue of
the reference's train_one_epoch smoke, engine.py:26-90).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwdetr_tpu.config import ModelConfig, TrainConfig
from lwdetr_tpu.models.criterion import SetCriterion, Targets
from lwdetr_tpu.models.lwdetr import build_model
from lwdetr_tpu.train.engine import build_train_step, create_train_state
from lwdetr_tpu.train.optim import build_optimizer, drop_scheduler, lr_wd_trees

NANO = ModelConfig(
    encoder="vit_tiny", vit_encoder_num_layers=2,
    window_block_indexes=(0,), out_feature_indexes=(0, 1),
    projector_scale=("P4",), hidden_dim=64, dim_feedforward=128,
    sa_nheads=4, ca_nheads=8, dec_n_points=2, dec_layers=2,
    group_detr=3, num_queries=16, num_classes=7,
    two_stage=True, bbox_reparam=True, lite_refpoint_refine=True)

TCFG = TrainConfig(ia_bce_loss=True, cls_loss_coef=1.0, use_ema=True,
                   lr=2e-4, lr_encoder=3e-4, max_gt=8)


def synthetic_batch(rng, B=2, size=128, max_gt=8):
    """Images with one bright square; target = its box, class 3."""
    images = rng.standard_normal((B, size, size, 3)).astype(np.float32) * 0.1
    boxes = np.zeros((B, max_gt, 4), np.float32)
    boxes[:] = [0.5, 0.5, 1.0, 1.0]
    labels = np.zeros((B, max_gt), np.int32)
    valid = np.zeros((B, max_gt), bool)
    for b in range(B):
        cx, cy, w, h = 0.5, 0.5, 0.4, 0.4
        x0, y0 = int((cx - w / 2) * size), int((cy - h / 2) * size)
        images[b, y0:y0 + int(h * size), x0:x0 + int(w * size)] += 2.0
        boxes[b, 0] = [cx, cy, w, h]
        labels[b, 0] = 3
        valid[b, 0] = True
    return {
        "images": jnp.asarray(images), "labels": jnp.asarray(labels),
        "boxes": jnp.asarray(boxes), "valid": jnp.asarray(valid),
    }


@pytest.mark.slow
def test_loss_decreases_and_ema_tracks():
    model = build_model(NANO)
    criterion = SetCriterion(NANO, TCFG)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(np.random.default_rng(0))

    sample = batch["images"]
    params0 = model.init({"params": rng, "dropout": rng}, sample, train=True)["params"]
    tx = build_optimizer(params0, NANO, TCFG, niter_per_ep=100)
    state = create_train_state(model, tx, rng, sample, use_ema=True)

    train_step = build_train_step(
        model, criterion, tx, ema_decay=0.9, use_ema=True,
        vit_depth=NANO.vit_encoder_num_layers, donate=False)

    losses = []
    for i in range(80):
        state, metrics = train_step(
            state, batch, jax.random.fold_in(rng, i),
            jnp.float32(0.0), jnp.float32(0.0))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all()
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.7 * first, f"loss did not decrease: {first:.3f} -> {last:.3f}"

    # EMA tracks params but lags
    d_param = jax.tree.leaves(state.params)[0]
    d_ema = jax.tree.leaves(state.ema["params"])[0]
    assert not np.allclose(np.asarray(d_param), np.asarray(d_ema))
    assert int(state.step) == 80


def test_lr_wd_trees_match_reference_rules():
    model = build_model(NANO)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 128, 128, 3)), train=True)["params"]
    tcfg = dataclasses.replace(
        TCFG, lr=1e-4, lr_encoder=1.5e-4, lr_vit_layer_decay=0.8,
        lr_component_decay=0.7, weight_decay=1e-4)
    lr_tree, wd_tree = lr_wd_trees(params, NANO, tcfg)
    L = NANO.vit_encoder_num_layers

    # encoder block 0 kernel: lr_encoder * 0.8^(L+1-1) * 0.7^2
    lr = lr_tree["backbone"]["encoder"]["blocks_0"]["attn"]["qkv_kernel"]
    np.testing.assert_allclose(lr, 1.5e-4 * 0.8 ** L * 0.49, rtol=1e-6)
    # pos_embed: layer_id 0 → 0.8^(L+1), wd 0
    np.testing.assert_allclose(
        lr_tree["backbone"]["encoder"]["pos_embed"], 1.5e-4 * 0.8 ** (L + 1) * 0.49,
        rtol=1e-6)
    assert wd_tree["backbone"]["encoder"]["pos_embed"] == 0.0
    # gamma params: wd 0
    assert wd_tree["backbone"]["encoder"]["blocks_0"]["gamma_1"] == 0.0
    # biases: wd 0 in encoder
    assert wd_tree["backbone"]["encoder"]["blocks_0"]["attn"]["proj"]["bias"] == 0.0
    # decoder region: lr * component_decay
    np.testing.assert_allclose(
        lr_tree["transformer"]["layers_0"]["linear1"]["kernel"], 1e-4 * 0.7, rtol=1e-6)
    np.testing.assert_allclose(
        lr_tree["transformer"]["ref_point_head"]["layers_0"]["kernel"], 1e-4 * 0.7,
        rtol=1e-6)
    # other region: base lr (projector, heads, queries)
    np.testing.assert_allclose(lr_tree["class_embed"]["kernel"], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(
        lr_tree["transformer"]["enc_output_0"]["kernel"], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(lr_tree["query_feat"], 1e-4, rtol=1e-6)


def test_drop_scheduler_modes():
    # port parity of util/drop_scheduler.py
    s = drop_scheduler(0.1, 10, 5, mode="standard")
    assert s.shape == (50,) and (s == np.float32(0.1)).all()
    s = drop_scheduler(0.1, 10, 5, cutoff_epoch=4, mode="early", schedule="linear")
    assert s[0] == np.float32(0.1) and s[18] > 0 and (s[20:] == 0).all()
    s = drop_scheduler(0.1, 10, 5, cutoff_epoch=4, mode="late")
    assert (s[:20] == 0).all() and (s[20:] == np.float32(0.1)).all()


@pytest.mark.slow
def test_sharded_train_step_multidevice():
    """Full train step over the 8-device CPU mesh (data-parallel pjit)."""
    from lwdetr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    model = build_model(NANO)
    criterion = SetCriterion(NANO, TCFG)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(np.random.default_rng(0), B=8)

    mesh = make_mesh(n_data=8)
    with mesh:
        params0 = model.init({"params": rng, "dropout": rng},
                             batch["images"], train=True)["params"]
        tx = build_optimizer(params0, NANO, TCFG, niter_per_ep=10)
        state = create_train_state(model, tx, rng, batch["images"], use_ema=True)
        state = jax.device_put(state, replicated(mesh))
        sharded_batch = jax.device_put(batch, batch_sharding(mesh))

        train_step = build_train_step(
            model, criterion, tx, ema_decay=0.99, use_ema=True,
            vit_depth=NANO.vit_encoder_num_layers, donate=False)
        state2, metrics = train_step(
            state, sharded_batch, rng, jnp.float32(0.0), jnp.float32(0.0))
        assert np.isfinite(float(metrics["loss"]))
        # params remain replicated after the step
        p = jax.tree.leaves(state2.params)[0]
        assert p.sharding.is_fully_replicated


@pytest.mark.slow
def test_grad_checkpointing_same_params_and_grads():
    """--grad_checkpointing remats the encoder blocks: identical param tree
    (the checkpoint bridge is unaffected) and identical loss/grads — remat
    only changes WHEN activations are computed, not the math."""
    cfg_r = dataclasses.replace(NANO, grad_checkpointing=True)
    model = build_model(NANO)
    model_r = build_model(cfg_r)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(np.random.default_rng(2), B=2)
    variables = model.init({"params": rng, "dropout": rng},
                           batch["images"], train=True)
    variables_r = model_r.init({"params": rng, "dropout": rng},
                               batch["images"], train=True)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables_r))

    criterion = SetCriterion(NANO, TCFG)
    targets = Targets(batch["labels"], batch["boxes"], batch["valid"])

    def loss_fn(m):
        def f(params):
            out = m.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          batch["images"], train=True,
                          rngs={"dropout": rng},
                          mutable=["batch_stats"])[0]
            return criterion(out, targets, train=True)[0]
        return f

    l0, g0 = jax.value_and_grad(loss_fn(model))(variables["params"])
    l1, g1 = jax.value_and_grad(loss_fn(model_r))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_zero1_sharded_optimizer_state_multidevice():
    """--shard_opt_state (ZeRO-1): Adam moments + EMA shard over the data
    axis, params stay replicated, and the step's numbers match the fully
    replicated run exactly."""
    from lwdetr_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          replicated, zero1_sharding_tree)

    model = build_model(NANO)
    criterion = SetCriterion(NANO, TCFG)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(np.random.default_rng(0), B=8)

    mesh = make_mesh(n_data=8)
    with mesh:
        params0 = model.init({"params": rng, "dropout": rng},
                             batch["images"], train=True)["params"]
        tx = build_optimizer(params0, NANO, TCFG, niter_per_ep=10)
        state = create_train_state(model, tx, rng, batch["images"],
                                   use_ema=True)
        state = jax.device_put(state, replicated(mesh))
        sharded_batch = jax.device_put(batch, batch_sharding(mesh))

        step_repl = build_train_step(
            model, criterion, tx, ema_decay=0.99, use_ema=True,
            vit_depth=NANO.vit_encoder_num_layers, donate=False)
        _, metrics_repl = step_repl(
            state, sharded_batch, rng, jnp.float32(0.0), jnp.float32(0.0))

        z1 = state._replace(
            opt_state=jax.device_put(
                state.opt_state, zero1_sharding_tree(
                    mesh, state.opt_state, min_size=128)),
            ema=jax.device_put(
                state.ema, zero1_sharding_tree(mesh, state.ema,
                                               min_size=128)))
        step_z1 = build_train_step(
            model, criterion, tx, ema_decay=0.99, use_ema=True,
            vit_depth=NANO.vit_encoder_num_layers, donate=False,
            param_sharding=replicated(mesh))
        state2, metrics_z1 = step_z1(
            z1, sharded_batch, rng, jnp.float32(0.0), jnp.float32(0.0))

    np.testing.assert_allclose(float(metrics_repl["loss"]),
                               float(metrics_z1["loss"]), rtol=1e-6)
    # params replicated, at least one moment leaf actually sharded
    assert jax.tree.leaves(state2.params)[0].sharding.is_fully_replicated
    opt_leaves = [l for l in jax.tree.leaves(state2.opt_state)
                  if getattr(l, "ndim", 0) >= 1 and l.size >= 128
                  and l.shape[0] % 8 == 0]
    assert opt_leaves and not opt_leaves[0].sharding.is_fully_replicated
    shard_bytes = opt_leaves[0].addressable_shards[0].data.nbytes
    assert shard_bytes * 8 == opt_leaves[0].nbytes  # 8x memory cut


@pytest.mark.slow
def test_sharded_eval_step_multidevice():
    """Inference path over the 8-device CPU mesh: batch-sharded forward +
    postprocess match the single-device result exactly (data-parallel
    serving is pure SPMD — no collectives in the graph)."""
    from lwdetr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from lwdetr_tpu.train.engine import build_eval_step

    model = build_model(NANO)
    rng = jax.random.PRNGKey(0)
    batch_np = synthetic_batch(np.random.default_rng(1), B=8)
    batch_np["orig_size"] = np.full((8, 2), 128.0, np.float32)
    variables = model.init({"params": rng, "dropout": rng},
                           batch_np["images"], train=True)
    eval_step = build_eval_step(model, num_select=8)

    (s0, l0, b0), _ = jax.device_get(
        eval_step(variables["params"], variables.get("batch_stats", {}),
                  batch_np))

    mesh = make_mesh(n_data=8)
    with mesh:
        params = jax.device_put(variables["params"], replicated(mesh))
        bstats = jax.device_put(variables.get("batch_stats", {}),
                                replicated(mesh))
        sharded = jax.device_put(batch_np, batch_sharding(mesh))
        (s1, l1, b1), _ = jax.device_get(eval_step(params, bstats, sharded))

    np.testing.assert_allclose(s0, s1, atol=1e-6)
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_allclose(b0, b1, atol=1e-5)


@pytest.mark.slow
def test_dp_weak_scaling_per_device_flops():
    """Weak-scaling sanity over the virtual CPU mesh (VERDICT r4 #8): the
    per-device FLOP count of the 8-device data-parallel train step at
    global batch 8 must match the single-device step at batch 1 (up to
    collective/epsilon overhead).  Catches accidental cross-device
    serialization — e.g. a replicated matcher or criterion would inflate
    per-device work ~8x.  Deterministic (compiled cost analysis), no
    timing noise."""
    from lwdetr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    model = build_model(NANO)
    criterion = SetCriterion(NANO, TCFG)
    rng = jax.random.PRNGKey(0)

    def per_device_flops(n_dev):
        batch = synthetic_batch(np.random.default_rng(0), B=n_dev)
        mesh = make_mesh(n_data=n_dev)
        with mesh:
            params0 = model.init({"params": rng, "dropout": rng},
                                 batch["images"], train=True)["params"]
            tx = build_optimizer(params0, NANO, TCFG, niter_per_ep=10)
            state = create_train_state(model, tx, rng, batch["images"],
                                       use_ema=True)
            state = jax.device_put(state, replicated(mesh))
            sharded = jax.device_put(batch, batch_sharding(mesh))
            step = build_train_step(
                model, criterion, tx, ema_decay=0.99, use_ema=True,
                vit_depth=NANO.vit_encoder_num_layers, donate=False)
            compiled = step.lower(state, sharded, rng, jnp.float32(0.0),
                                  jnp.float32(0.0)).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost["flops"])

    f1 = per_device_flops(1)
    f8 = per_device_flops(8)
    # per-device work must NOT grow with the device count (weak scaling);
    # allow 15% for collectives and partition padding
    assert f8 <= f1 * 1.15, (
        f"8-device per-device flops {f8:.3e} vs 1-device {f1:.3e} — "
        f"{f8 / f1:.2f}x, something is replicated instead of sharded")
    # and the sharded step must actually be doing ~the same work, not
    # degenerating (guards against cost_analysis returning garbage)
    assert f8 >= f1 * 0.5
