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
