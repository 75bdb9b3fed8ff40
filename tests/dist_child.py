"""Child process for the real two-process distributed test (test_dist.py).

Each of the 2 processes initializes jax.distributed over a local CPU
backend, then exercises the three host-side distributed behaviors the
reference relies on (SURVEY.md §2.3):

* loader sharding: each host iterates a process_index-strided subset
  (DistributedSampler equivalent, /root/reference/main.py:222-227);
* eval merge: detections all_gathered and merged across hosts
  (/root/reference/datasets/coco_eval.py:181-200);
* rank-0 gating of side effects (/root/reference/util/misc.py:408-414).

Prints ONE JSON line with the observations for the parent to assert.
"""
import json
import os
import sys

# The axon TPU plugin ignores JAX_PLATFORMS set via environment — the
# platform must be forced through jax.config BEFORE any backend is
# initialized (same caveat as tests/conftest.py).
os.environ.pop("JAX_PLATFORMS", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _StubDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def main():
    coordinator = sys.argv[1]
    num_processes = int(sys.argv[2])
    process_id = int(sys.argv[3])

    os.environ["COORDINATOR_ADDRESS"] = coordinator
    os.environ["NUM_PROCESSES"] = str(num_processes)
    os.environ["PROCESS_ID"] = str(process_id)

    from lwdetr_tpu.parallel.dist import (all_gather_objects, init_distributed,
                                          is_main_process, merge_evaluators)

    rank, world = init_distributed()

    # --- loader sharding: strided, disjoint, covering ---
    from lwdetr_tpu.data.loader import DetectionLoader

    loader = DetectionLoader(
        _StubDataset(11), batch_size=2, train=False,
        process_index=rank, process_count=world)
    my_indices = [int(i) for i in loader._indices()]

    # --- eval merge across hosts via the real all_gather path ---
    class _Evaluator:
        def __init__(self, rank):
            self.dets = {f"img_{rank}_{i}": rank * 100 + i for i in range(3)}

        def export(self):
            return dict(self.dets)

        def merge(self, exported):
            self.dets.update(exported)

    ev = merge_evaluators(_Evaluator(rank))

    # --- plain object all_gather ---
    gathered_ranks = all_gather_objects({"rank": rank})

    print(json.dumps({
        "rank": rank,
        "world": world,
        "indices": my_indices,
        "merged_keys": sorted(ev.dets.keys()),
        "gathered": [g["rank"] for g in gathered_ranks],
        "is_main": is_main_process(),
    }))


if __name__ == "__main__":
    main()
