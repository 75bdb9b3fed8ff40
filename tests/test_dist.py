"""Multi-host bootstrap and host-side collective tests.

Covers lwdetr_tpu/parallel/dist.py against the reference's distributed
surface (/root/reference/util/misc.py:417-439 env:// + SLURM auto-detect;
datasets/coco_eval.py:181-200 eval merge; main.py:222-227 data sharding).

The two-process test launches REAL subprocesses with
jax.distributed.initialize over a local CPU coordinator — the closest
single-machine analogue of a 2-host TPU slice.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_shard_merge_and_rank_gating():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "dist_child.py"),
             coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "XLA_FLAGS": ""},  # no virtual device split in children
            cwd=REPO)
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results[r["rank"]] = r

    assert set(results) == {0, 1}
    for r in results.values():
        assert r["world"] == 2

    # loader sharding: strided disjoint cover of range(11)
    i0, i1 = results[0]["indices"], results[1]["indices"]
    assert i0 == list(range(0, 11, 2))
    assert i1 == list(range(1, 11, 2))
    assert not set(i0) & set(i1)
    assert sorted(i0 + i1) == list(range(11))

    # eval merge: both hosts end with the union of detections
    expect = sorted([f"img_{r}_{i}" for r in range(2) for i in range(3)])
    assert results[0]["merged_keys"] == expect
    assert results[1]["merged_keys"] == expect

    # all_gather ordering is by process index
    assert results[0]["gathered"] == [0, 1]
    assert results[1]["gathered"] == [0, 1]

    # rank-0 gating
    assert results[0]["is_main"] is True
    assert results[1]["is_main"] is False


def test_multiprocess_env_detection(monkeypatch):
    from lwdetr_tpu.parallel.dist import _multiprocess_env_detected

    assert not _multiprocess_env_detected({})
    assert not _multiprocess_env_detected({"SLURM_NTASKS": "1"})
    assert _multiprocess_env_detected({"SLURM_NTASKS": "4"})
    assert _multiprocess_env_detected({"WORLD_SIZE": "8"})
    assert not _multiprocess_env_detected({"WORLD_SIZE": "1"})
    assert _multiprocess_env_detected(
        {"TPU_WORKER_HOSTNAMES": "host-0,host-1"})
    assert not _multiprocess_env_detected({"TPU_WORKER_HOSTNAMES": "host-0"})
    assert _multiprocess_env_detected(
        {"MEGASCALE_COORDINATOR_ADDRESS": "10.0.0.1:8476"})
    assert _multiprocess_env_detected({"LWDETR_DIST": "1"})
    # empty-string values must not crash int() parsing
    assert not _multiprocess_env_detected(
        {"SLURM_NTASKS": "", "WORLD_SIZE": "", "TPU_WORKER_HOSTNAMES": ""})


def test_auto_init_failure_falls_back(monkeypatch):
    """A detected-but-unresolvable multi-process env must not crash."""
    import jax

    from lwdetr_tpu.parallel import dist

    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError("no cluster detected")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setenv("LWDETR_DIST", "1")
    rank, world = dist.init_distributed()
    assert calls, "auto-init path was not attempted"
    assert (rank, world) == (0, 1)
