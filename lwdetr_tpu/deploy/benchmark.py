"""Deployment benchmark: latency + COCO eval of an exported artifact.

Counterpart of /root/reference/deploy/benchmark.py (ORT/TRT latency + mAP):
loads a serialized StableHLO export (deploy/export.py), measures per-image
latency with repeats, and optionally evaluates COCO val mAP with the same
square-resize preprocessing (deploy/benchmark.py:561-583).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(call, weights, input_hw, batch: int = 1, repeats: int = 10,
            warmup: int = 5):
    import jax

    images = np.random.default_rng(0).standard_normal(
        (batch, *input_hw, 3)).astype(np.float32)
    out = call(weights, images)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    for _ in range(warmup):
        np.asarray(jax.device_get(jax.tree.leaves(call(weights, images))[0]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = call(weights, images)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
        times.append((time.perf_counter() - t0) * 1e3)
    t = np.asarray(times)
    # pipelined: dispatch all repeats back-to-back, fetch once — removes the
    # per-call host/tunnel round trip, approximating pure device latency
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = call(weights, images)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    pipelined = (time.perf_counter() - t0) * 1e3 / repeats
    return {"mean_ms": float(t.mean()), "median_ms": float(np.median(t)),
            "pipelined_ms": float(pipelined),
            "dispatch_overhead_ms": float(np.median(t) - pipelined),
            "imgs_per_s": 1000.0 * batch / float(np.median(t))}


def evaluate_coco(call, weights, coco_path: str, input_hw=(640, 640),
                  batch: int = 1, limit: int = 0):
    from lwdetr_tpu.config import DataConfig
    from lwdetr_tpu.data import transforms as T
    from lwdetr_tpu.data.coco import build_dataset
    from lwdetr_tpu.data.coco_eval import CocoEvaluator

    ds = build_dataset("val", DataConfig(coco_path=coco_path))
    evaluator = CocoEvaluator(ds.coco)
    n = len(ds) if not limit else min(limit, len(ds))
    buf_img, buf_meta = [], []

    def flush():
        if not buf_img:
            return
        while len(buf_img) < batch:  # pad last batch
            buf_img.append(buf_img[-1])
            buf_meta.append((None, None))
        scores, labels, boxes = call(weights, np.stack(buf_img))
        scores, labels, boxes = (np.asarray(scores), np.asarray(labels),
                                 np.asarray(boxes))
        for i, (img_id, scale) in enumerate(buf_meta):
            if img_id is None:
                continue
            evaluator.update({img_id: {
                "scores": scores[i], "labels": labels[i],
                "boxes": boxes[i] * scale}})
        buf_img.clear()
        buf_meta.clear()

    for idx in range(n):
        image, target = ds.load_raw(idx)
        oh, ow = int(target["orig_size"][0]), int(target["orig_size"][1])
        arr, _ = T.val_transform_square(image, None, input_hw[0])
        # exported fn scales boxes to the square size; rescale to original
        scale = np.array([ow / input_hw[1], oh / input_hw[0]] * 2, np.float32)
        buf_img.append(arr)
        buf_meta.append((int(target["image_id"][0]), scale))
        if len(buf_img) == batch:
            flush()
    flush()
    return evaluator.summarize()


def main():
    p = argparse.ArgumentParser("deploy benchmark")
    p.add_argument("--path", required=True, help="exported .stablehlo.pkl")
    p.add_argument("--coco_path", default=None)
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    from lwdetr_tpu.deploy.export import load_serialized

    call, weights = load_serialized(args.path)
    import pickle

    with open(args.path, "rb") as f:
        meta = pickle.load(f)
    lat = measure(call, weights, meta["input_hw"], meta["batch"], args.repeats)
    result = {"latency": lat}
    if args.coco_path:
        result["coco"] = evaluate_coco(
            call, weights, args.coco_path, meta["input_hw"], meta["batch"],
            args.limit)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
