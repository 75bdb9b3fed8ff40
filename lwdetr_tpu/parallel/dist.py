"""Multi-host process initialization and collectives helpers.

Replaces the reference's NCCL process-group bootstrap
(/root/reference/util/misc.py:417-439: env:// rendezvous, barrier,
rank-0-only printing) with jax.distributed.  Inside jit, collectives are
compiler-inserted; these helpers cover the HOST side: eval-result merging
(the reference pickles+all_gathers, util/misc.py:99-139) and rank-gated
side effects.
"""
from __future__ import annotations

import builtins
import functools
import os
from typing import Any, Optional

import numpy as np


def _multiprocess_env_detected(env) -> bool:
    """True when the environment carries signals of a multi-process launch
    that jax.distributed.initialize() can auto-detect (the reference
    auto-detects env:// RANK/WORLD_SIZE and SLURM, util/misc.py:417-439)."""
    if env.get("LWDETR_DIST") == "1":
        return True
    # SLURM multi-task launch (JAX has a built-in SLURM cluster detector)
    if int(env.get("SLURM_NTASKS", "1") or 1) > 1:
        return True
    # torch.distributed-style env:// rendezvous vars
    if int(env.get("WORLD_SIZE", "1") or 1) > 1:
        return True
    # TPU pod / megascale signals (multiple workers in the slice)
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hostnames.split(",") if h.strip()]) > 1:
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    return False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX.

    Resolution order (mirrors the reference's env:// + SLURM auto-detect,
    /root/reference/util/misc.py:417-439):

    1. explicit args / COORDINATOR_ADDRESS + NUM_PROCESSES + PROCESS_ID env
       vars -> explicit jax.distributed.initialize(...);
    2. a detectable multi-process launch (SLURM_NTASKS>1, WORLD_SIZE>1,
       multi-worker TPU slice, or LWDETR_DIST=1) -> argument-free
       jax.distributed.initialize(), which auto-detects TPU pods and SLURM;
    3. otherwise single-process no-op (the reference prints 'Not using
       distributed mode', misc.py:421-426).

    The auto path never runs on a plainly single-process launch, so CPU test
    environments and single-chip runs are unaffected.
    """
    import jax

    env = os.environ
    if coordinator is None and "COORDINATOR_ADDRESS" in env:
        coordinator = env["COORDINATOR_ADDRESS"]
    if num_processes is None and "NUM_PROCESSES" in env:
        num_processes = int(env["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in env:
        process_id = int(env["PROCESS_ID"])
    if coordinator and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
    elif _multiprocess_env_detected(env):
        try:
            jax.distributed.initialize()
        except Exception as e:  # auto-detect failed: surface, don't die
            builtins.print(
                f"init_distributed: auto-detect failed ({e}); "
                "falling back to single-process. Set COORDINATOR_ADDRESS/"
                "NUM_PROCESSES/PROCESS_ID to initialize explicitly.")
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def setup_print_for_distributed(force: bool = False):
    """Rank-0-only printing (reference util/misc.py:373-385)."""
    if is_main_process() or force:
        return
    builtin_print = builtins.print

    def quiet_print(*args, **kwargs):
        if kwargs.pop("force", False):
            builtin_print(*args, **kwargs)

    builtins.print = quiet_print


def all_gather_objects(obj: Any):
    """Gather an arbitrary pytree-of-ndarrays from every host (the
    reference's pickled all_gather, util/misc.py:99-139). Single-process:
    returns [obj]."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    # serialize via numpy bytes to handle ragged host-side objects
    import pickle

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        out.append(pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes()))
    return out


def merge_evaluators(evaluator):
    """Merge CocoEvaluator detections across hosts
    (reference datasets/coco_eval.py:181-200)."""
    for i, exported in enumerate(all_gather_objects(evaluator.export())):
        import jax

        if i != jax.process_index():
            evaluator.merge(exported)
    return evaluator
