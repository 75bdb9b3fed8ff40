"""Engine fidelity: per-step NaN abort, per-step meters, eval losses,
multi-host eval merge wiring, and .pth resume.

Reference behaviors matched: engine.py:71-74 (abort on non-finite loss at
the step it happens), engine.py:128 (loss components logged during
evaluate), coco_eval.py:181-200 (cross-host detection merge before
summarize), main.py:270-286 (.pth resume incl. EMA weights and epoch).
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lwdetr_tpu.models.criterion import SetCriterion
from lwdetr_tpu.train.engine import (build_eval_step, evaluate,
                                     train_one_epoch)
from tests.test_train import NANO, TCFG, synthetic_batch


def _fake_state():
    return types.SimpleNamespace(step=0)


def test_train_one_epoch_aborts_on_nan_step():
    """A NaN at step k must abort by step k+1 (delayed-fetch pipeline),
    NOT at the next log_every boundary."""
    calls = []

    def train_step(state, batch, rng, dp, do):
        it = len(calls)
        calls.append(it)
        loss = jnp.float32(np.nan) if it == 3 else jnp.float32(1.0)
        return state, {"loss": loss, "grad_norm": jnp.float32(0.5)}

    loader = [{"images": np.zeros((1,))} for _ in range(20)]
    with pytest.raises(FloatingPointError):
        train_one_epoch(
            train_step, _fake_state(), loader, epoch=0,
            rng=jax.random.PRNGKey(0), drop_path_sched=None,
            dropout_sched=None, niter_per_ep=20, log_every=50,
            logger=lambda *a, **k: None)
    # the step after the NaN step may have been dispatched, but no more
    assert len(calls) <= 5


def test_train_one_epoch_should_stop_drains_and_returns():
    """Preemption: should_stop() flips after step k -> the loop finishes the
    in-flight step (its metrics are consumed) and returns without
    dispatching more; meters cover every completed step."""
    calls = []
    stop = {"flag": False}

    def train_step(state, batch, rng, dp, do):
        calls.append(len(calls))
        if len(calls) == 3:
            stop["flag"] = True  # signal arrives while step 2 is in flight
        return state, {"loss": jnp.float32(1.5), "grad_norm": jnp.float32(0.5)}

    loader = [{"images": np.zeros((1,))} for _ in range(20)]
    _, meters = train_one_epoch(
        train_step, _fake_state(), loader, epoch=0,
        rng=jax.random.PRNGKey(0), drop_path_sched=None, dropout_sched=None,
        niter_per_ep=20, log_every=50, logger=lambda *a, **k: None,
        should_stop=lambda: stop["flag"])
    assert len(calls) == 3  # no further dispatch after the flag
    assert meters["loss"] == 1.5


def test_train_one_epoch_meters_every_step():
    losses = [2.0, 4.0, 6.0, 8.0]

    def train_step(state, batch, rng, dp, do):
        loss = losses[int(np.asarray(state.step))]
        state.step += 1
        return state, {"loss": jnp.float32(loss),
                       "grad_norm": jnp.float32(1.0)}

    loader = [{"images": np.zeros((1,))} for _ in range(4)]
    _, meters = train_one_epoch(
        train_step, _fake_state(), loader, epoch=0,
        rng=jax.random.PRNGKey(0), drop_path_sched=None, dropout_sched=None,
        niter_per_ep=4, log_every=50, logger=lambda *a, **k: None)
    # global average over ALL steps, not just logged ones
    assert meters["loss"] == pytest.approx(5.0)


class _StubEvaluator:
    def __init__(self):
        self.results = {}
        self.merged_with = []

    def update(self, results):
        self.results.update(results)

    def export(self):
        return dict(self.results)

    def merge(self, exported):
        self.merged_with.append(exported)

    def summarize(self, verbose=True):
        return {"AP": 0.5}


def _eval_batch():
    from lwdetr_tpu.models.lwdetr import build_model

    batch = synthetic_batch(np.random.default_rng(0), B=2, size=128)
    batch = {k: np.asarray(v) for k, v in batch.items()}
    batch["image_id"] = np.array([11, 12], np.int64)
    batch["orig_size"] = np.array([[128.0, 128.0]] * 2, np.float32)
    return batch


@pytest.mark.slow
def test_evaluate_reports_losses_and_merges():
    from lwdetr_tpu.models.lwdetr import build_model

    model = build_model(NANO)
    criterion = SetCriterion(NANO, TCFG)
    batch = _eval_batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.asarray(batch["images"]), train=True)
    step = build_eval_step(model, num_select=8, criterion=criterion)
    evaluator = _StubEvaluator()
    stats = evaluate(step, variables["params"],
                     variables.get("batch_stats", {}),
                     [batch], evaluator, logger=lambda *a, **k: None)
    # loss components from the criterion appear next to AP stats
    assert "loss" in stats and "loss_bbox" in stats and "AP" in stats
    assert np.isfinite(stats["loss"])
    assert set(evaluator.results) == {11, 12}
    # single-process: merge path runs but gathers only self (no-op merge)
    assert evaluator.merged_with == []


def test_evaluate_without_criterion_has_no_loss_keys():
    from lwdetr_tpu.models.lwdetr import build_model

    model = build_model(NANO)
    batch = _eval_batch()
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.asarray(batch["images"]), train=True)
    step = build_eval_step(model, num_select=8)
    stats = evaluate(step, variables["params"],
                     variables.get("batch_stats", {}),
                     [batch], _StubEvaluator(), logger=lambda *a, **k: None)
    assert set(stats) == {"AP"}


@pytest.mark.slow
def test_load_orbax_variables_for_inference(tmp_path):
    """demo.py loads inference weights straight from a native orbax
    train-state dir (regular or EMA) without rebuilding the optimizer."""
    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.train import checkpoint as ckpt
    from lwdetr_tpu.train.engine import create_train_state
    from lwdetr_tpu.train.optim import build_optimizer

    model = build_model(NANO)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params0 = model.init({"params": rng, "dropout": rng},
                         sample, train=True)["params"]
    tx = build_optimizer(params0, NANO, TCFG, niter_per_ep=10)
    state = create_train_state(model, tx, rng, sample, use_ema=True)
    ckpt.save_checkpoint(str(tmp_path / "ckpt"), 7, state)

    var = ckpt.load_orbax_variables(str(tmp_path / "ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(var["params"]),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    var_ema = ckpt.load_orbax_variables(str(tmp_path / "ckpt"), use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(var_ema["params"]),
                    jax.tree_util.tree_leaves(state.ema["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loaded weights drive an eval forward
    out = model.apply({"params": var["params"],
                       "batch_stats": var["batch_stats"]},
                      sample, train=False)
    assert np.isfinite(np.asarray(out["pred_logits"], np.float32)).all()


def test_resume_pth_roundtrip(tmp_path):
    """main.py --resume x.pth: model weights, EMA weights, epoch restored."""
    import torch

    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.train import checkpoint as ckpt
    from lwdetr_tpu.train.engine import create_train_state
    from lwdetr_tpu.train.optim import build_optimizer
    from main import _resume_pth

    model = build_model(NANO)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 128, 128, 3), jnp.float32)
    init_vars = model.init({"params": rng, "dropout": rng}, sample, train=True)
    tx = build_optimizer(init_vars["params"], NANO, TCFG, niter_per_ep=10)
    state = create_train_state(model, tx, rng, sample, use_ema=True)

    # a "trained" checkpoint: shift every param by +1, EMA by +2
    shifted = jax.tree.map(lambda x: x + 1.0, {
        "params": state.params, "batch_stats": state.batch_stats})
    ema_shift = jax.tree.map(lambda x: x + 2.0, shifted)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in ckpt.flax_to_torch(shifted, NANO).items()}
    ema_sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in ckpt.flax_to_torch(ema_shift, NANO).items()}
    path = str(tmp_path / "model.pth")
    torch.save({"model": sd, "ema_model": ema_sd, "epoch": 6}, path)

    new_state, start_epoch = _resume_pth(state, path, NANO, ckpt, use_ema=True)
    assert start_epoch == 7
    np.testing.assert_allclose(
        np.asarray(new_state.params["class_embed"]["kernel"]),
        np.asarray(state.params["class_embed"]["kernel"]) + 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_state.ema["params"]["class_embed"]["kernel"]),
        np.asarray(state.params["class_embed"]["kernel"]) + 3.0, rtol=1e-6)


def test_resume_pth_without_ema_reseeds_from_model(tmp_path):
    import torch

    from lwdetr_tpu.models.lwdetr import build_model
    from lwdetr_tpu.train import checkpoint as ckpt
    from lwdetr_tpu.train.engine import create_train_state
    from lwdetr_tpu.train.optim import build_optimizer
    from main import _resume_pth

    model = build_model(NANO)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 128, 128, 3), jnp.float32)
    init_vars = model.init({"params": rng, "dropout": rng}, sample, train=True)
    tx = build_optimizer(init_vars["params"], NANO, TCFG, niter_per_ep=10)
    state = create_train_state(model, tx, rng, sample, use_ema=True)

    shifted = jax.tree.map(lambda x: x + 1.0, {
        "params": state.params, "batch_stats": state.batch_stats})
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in ckpt.flax_to_torch(shifted, NANO).items()}
    path = str(tmp_path / "model.pth")
    torch.save({"model": sd}, path)

    new_state, start_epoch = _resume_pth(state, path, NANO, ckpt, use_ema=True)
    assert start_epoch is None
    # EMA re-seeded from the freshly loaded weights (reference main.py:275-278)
    np.testing.assert_allclose(
        np.asarray(new_state.ema["params"]["class_embed"]["kernel"]),
        np.asarray(new_state.params["class_embed"]["kernel"]), rtol=1e-6)
