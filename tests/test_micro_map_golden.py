"""Golden micro-mAP: frozen weights + frozen dataset -> frozen 12 AP/AR stats.

The committed golden vector (tests/fixtures/micro_map/golden_stats.json) was
produced by gen_micro_map_fixture.py through the FULL eval pipeline
(DetectionLoader -> jitted eval_step -> CocoEvaluator), with the weights
verified against the actual torch reference model via the checkpoint bridge
at generation time.  Any drift in resize/normalize numerics, collation,
num_select plumbing, postprocess or evaluator semantics fails this test —
the committed stand-in for real-COCO mAP validation
(/root/reference/engine.py:93-164; BASELINE.md north star).

On mismatch: find which stage drifted (loader / model / evaluator), fix it
or — only for an intentional protocol change — regenerate via
python tests/gen_micro_map_fixture.py.
"""
import json
import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "fixtures", "micro_map")


@pytest.mark.slow
def test_micro_map_matches_golden():
    from micro_map_common import build_micro, load_weights, run_pipeline

    with open(os.path.join(FIXDIR, "golden_stats.json")) as f:
        golden = json.load(f)["stats"]

    _cfg, _model, init_vars = build_micro(seed=0)
    variables = load_weights(init_vars, os.path.join(FIXDIR, "weights.npz"))
    _, stats = run_pipeline(FIXDIR, variables=variables)

    assert set(stats) == set(golden)
    for k in sorted(golden):
        np.testing.assert_allclose(
            stats[k], golden[k], atol=1e-7,
            err_msg=f"stat {k} drifted: {stats[k]} vs golden {golden[k]} — "
                    "eval-protocol/numerics regression (or intentional "
                    "change: regenerate the fixture)")

    # the fixture must stay informative: most stats strictly inside (0, 1)
    informative = [k for k, v in golden.items() if 0.02 < v < 0.98]
    assert len(informative) >= 10


@pytest.mark.slow
def test_micro_map_matches_golden_bf16():
    """Accuracy at the DEPLOYED dtype: the bf16 compute configuration
    (tanh-gelu, trace-time scale folding, exact two-stage top-k — exactly
    what bench.py's throughput number rides on) must reproduce its own
    committed golden through the full loader->eval_step->evaluator pipeline.

    Mirrors the reference re-validating its deployed fp16 artifact by
    metric parity (/root/reference/deploy/benchmark.py:555-583).

    On the AP-level drift vs the f32 golden: the committed measurement
    (golden_stats_bf16.json "f32_drift", max 0.49 on APs) is dominated by
    rank flips among the micro fixture's RANDOM-INIT near-tie scores —
    per-query sigmoid probabilities differ by mean 0.001 (~1 bf16 ulp; see
    test_bf16_forward_drift_vs_f32), but with score gaps below one ulp the
    top-k selects different queries and AP on 20 images swings.  A trained
    model's score gaps are orders of magnitude above one ulp.  The AP
    assert below is therefore only a catastrophic-regression backstop; the
    meaningful dtype-accuracy contract is the tensor-level test.
    """
    import jax.numpy as jnp
    from micro_map_common import build_micro, load_weights, run_pipeline

    with open(os.path.join(FIXDIR, "golden_stats_bf16.json")) as f:
        golden = json.load(f)["stats"]
    with open(os.path.join(FIXDIR, "golden_stats.json")) as f:
        golden_f32 = json.load(f)["stats"]

    _cfg, _model, init_vars = build_micro(seed=0, dtype=jnp.bfloat16)
    variables = load_weights(init_vars, os.path.join(FIXDIR, "weights.npz"))
    _, stats = run_pipeline(FIXDIR, variables=variables, dtype=jnp.bfloat16)

    assert set(stats) == set(golden)
    for k in sorted(golden):
        np.testing.assert_allclose(
            stats[k], golden[k], atol=1e-7,
            err_msg=f"bf16 stat {k} drifted from its committed golden")

    for k in sorted(golden_f32):
        assert abs(stats[k] - golden_f32[k]) < 0.55, (
            f"bf16 vs f32 drift for {k} beyond the committed envelope: "
            f"{stats[k]} vs {golden_f32[k]}")


@pytest.mark.slow
def test_bf16_forward_drift_vs_f32():
    """Tensor-level dtype contract: over ALL queries (pre-top-k, so the
    comparison is well-posed regardless of rank flips), the bf16 model's
    sigmoid class probabilities and normalized boxes stay within bf16
    rounding of the f32 model on the frozen fixture weights.

    Measured at commit time (random-init worst case): prob delta mean
    0.0010 / max 0.082; normalized box delta mean 0.0082.  Bounds are ~2x
    the measurement — they catch a broken bf16 path (wrong scale folding,
    gelu mismatch, dtype leak), not rounding.
    """
    import jax
    import jax.numpy as jnp
    from micro_map_common import build_micro, load_weights

    wpath = os.path.join(FIXDIR, "weights.npz")
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 128, 128, 3)), jnp.float32)
    outs = {}
    for dt in (jnp.float32, jnp.bfloat16):
        _cfg, model, init_vars = build_micro(seed=0, dtype=dt)
        variables = load_weights(init_vars, wpath)
        outs[dt] = jax.device_get(
            jax.jit(lambda v, x: model.apply(v, x, train=False))(
                variables, img))
    a, b = outs[jnp.float32], outs[jnp.bfloat16]
    # pred_boxes must stay f32 even in the bf16 model (bf16 box coords
    # would quantize by ~2px at 640 after rescale)
    assert b["pred_boxes"].dtype == np.float32
    pa = np.asarray(jax.nn.sigmoid(a["pred_logits"]))
    pb = np.asarray(jax.nn.sigmoid(b["pred_logits"].astype(np.float32)))
    dp = np.abs(pa - pb)
    db = np.abs(a["pred_boxes"] - b["pred_boxes"])
    assert dp.mean() < 0.01, f"mean prob drift {dp.mean()}"
    assert dp.max() < 0.2, f"max prob drift {dp.max()}"
    assert db.mean() < 0.03, f"mean box drift {db.mean()}"
