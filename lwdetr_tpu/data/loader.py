"""Batched, prefetching data loader with static shapes for TPU.

Replaces the reference's torch DataLoader + DistributedSampler + NestedTensor
collate (/root/reference/util/misc.py:279-339, main.py:222-227) with a
TPU-first design:

* targets are padded to a static `max_gt` per image (labels/boxes/valid),
  so the whole batch is one fixed-shape pytree — no ragged NestedTensors;
* train batches use ONE square size per batch drawn from the recipe's scale
  set, so every image in the batch shares a shape and no padding mask is
  needed.  The reference instead randomizes per image and pads to the batch
  max (util/misc.py:317-339); per-batch sizing keeps the same marginal scale
  distribution while avoiding masks and limiting XLA to len(scales) compiled
  variants;
* per-host sharding: each host iterates its `process_index`-strided subset
  (the DistributedSampler equivalent);
* a background thread prefetches and collates the next batch while the
  device computes.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from lwdetr_tpu.data import transforms as T


def pad_targets(target: dict, max_gt: int) -> Dict[str, np.ndarray]:
    """Pad one image's prepared+normalized target to static shapes."""
    n = len(target["boxes"])
    n_keep = min(n, max_gt)
    labels = np.zeros((max_gt,), np.int32)
    boxes = np.tile(np.array([0.5, 0.5, 1.0, 1.0], np.float32), (max_gt, 1))
    valid = np.zeros((max_gt,), bool)
    if n_keep:
        labels[:n_keep] = target["labels"][:n_keep]
        boxes[:n_keep] = target["boxes"][:n_keep]
        valid[:n_keep] = True
    return {"labels": labels, "boxes": boxes, "valid": valid}


def collate(samples, max_gt: int) -> Dict[str, np.ndarray]:
    """samples: list of (image HWC float32, target). All images same shape."""
    images = np.stack([s[0] for s in samples])
    padded = [pad_targets(s[1], max_gt) for s in samples]
    out = {
        "images": images,
        "labels": np.stack([p["labels"] for p in padded]),
        "boxes": np.stack([p["boxes"] for p in padded]),
        "valid": np.stack([p["valid"] for p in padded]),
        "image_id": np.array([int(s[1]["image_id"][0]) for s in samples], np.int64),
        "orig_size": np.stack([s[1]["orig_size"] for s in samples]).astype(np.float32),
    }
    if "pad_mask" in samples[0][1]:
        out["pad_mask"] = np.stack([s[1]["pad_mask"] for s in samples])
    return out


class DetectionLoader:
    """Iterates fixed-shape batches over a CocoDetection dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        train: bool,
        max_gt: int = 100,
        seed: int = 42,
        square_div_64: bool = True,
        eval_size: int = 640,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        drop_last: Optional[bool] = None,
        use_native: bool = True,
        per_image_scales: bool = False,
        num_workers: int = 1,
        image_dtype=None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.train = train
        self.max_gt = max_gt
        self.seed = seed
        self.square_div_64 = square_div_64
        self.eval_size = eval_size
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.drop_last = train if drop_last is None else drop_last
        self.use_native = use_native
        self.per_image_scales = per_image_scales
        # torch-DataLoader-workers equivalent (reference main.py --num_workers):
        # a thread pool over the per-image decode+transform. PIL decode/resize
        # and the native C preproc both release the GIL, so threads scale;
        # per-image rngs are spawned in index order, so batches are identical
        # for any worker count.
        self.num_workers = max(1, num_workers)
        # optional host-side image cast (e.g. ml_dtypes.bfloat16 for bf16
        # eval): runs in the prefetch thread where it overlaps device
        # compute, halves H2D bytes and removes the on-device f32->bf16
        # convert (~0.8 ms/batch-32 at small@640)
        self.image_dtype = image_dtype
        self._pool = None
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle per epoch (DistributedSampler.set_epoch equivalent)."""
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.ds)
        if self.train:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[self.process_index::self.process_count]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _map_samples(self, fn, args):
        if self.num_workers > 1 and len(args) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
            return list(self._pool.map(fn, args))
        return [fn(a) for a in args]

    def _make_batch(self, idxs, rng: np.random.Generator):
        if self.train:
            # per-batch size keeps one mask-free shape per step; with
            # per_image_scales each image samples its own size (hint=None,
            # the reference recipe) and the batch pads to its max + pad_mask
            size = None
            if self.square_div_64 and not self.per_image_scales:
                size = int(T.SCALES_SQUARE[rng.integers(len(T.SCALES_SQUARE))])
            # one spawned rng per image, in index order: batches are
            # bit-identical for any num_workers
            child_rngs = rng.spawn(len(idxs))

            def load_train(arg):
                i, crng = arg
                img, tgt = self.ds.load_raw(int(i))
                if self.square_div_64:
                    return T.train_transform_square_div_64(
                        crng, img, tgt, batch_size_hint=size)
                return T.train_transform_default(crng, img, tgt)

            samples = self._map_samples(load_train, list(zip(idxs, child_rngs)))
            if not self.square_div_64 or self.per_image_scales:
                samples = _pad_to_common(samples)
        else:
            def load_eval(i):
                if not self.square_div_64:
                    # legacy recipe evals at shortest-side 800 / max 1333
                    # (reference coco.py default val transform)
                    img, tgt = self.ds.load_raw(int(i))
                    return T.val_transform_default(img, tgt, 800, 1333)
                sample = self._eval_sample_native(int(i)) if self.use_native else None
                if sample is None:
                    img, tgt = self.ds.load_raw(int(i))
                    img, tgt = T.val_transform_square(img, tgt, self.eval_size)
                    sample = (img, tgt)
                return sample

            samples = self._map_samples(load_eval, list(idxs))
            if not self.square_div_64:
                samples = _pad_to_common(samples)
        batch = collate(samples, self.max_gt)
        if self.image_dtype is not None:
            batch["images"] = batch["images"].astype(self.image_dtype)
        return batch

    def _eval_sample_native(self, idx: int):
        """Fused C++ decode+resize+normalize (native/preproc.cpp); targets
        prepared from annotations without decoding through PIL."""
        import os

        from lwdetr_tpu.data import native
        from lwdetr_tpu.data.coco import convert_coco_target

        ds = self.ds
        if not hasattr(ds, "coco"):
            return None
        img_id = ds.ids[idx]
        info = ds.coco.imgs[img_id]
        path = os.path.join(ds.img_folder, info["file_name"])
        out = native.load_image_fast(path, self.eval_size)
        if out is None:
            return None
        arr, h, w = out
        tgt = convert_coco_target(ds.coco.load_anns(img_id), w, h, img_id)
        # square resize scales boxes by (size/w, size/h); then normalize cxcywh
        sx, sy = self.eval_size / w, self.eval_size / h
        tgt["boxes"] = tgt["boxes"] * np.array([sx, sy, sx, sy], np.float32)
        tgt["size"] = np.array([self.eval_size, self.eval_size])
        from PIL import Image

        dummy = Image.new("RGB", (self.eval_size, self.eval_size))
        _, tgt = T.normalize(dummy, tgt)
        return arr, tgt

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idxs = self._indices()
        if self.drop_last:
            n_batches = len(idxs) // self.batch_size
            idxs = idxs[: n_batches * self.batch_size]
        batches = [idxs[i:i + self.batch_size] for i in range(0, len(idxs), self.batch_size)]
        # pad the final short eval batch by repeating the last sample; callers
        # use image_id uniqueness to drop duplicates in the evaluator
        if batches and len(batches[-1]) < self.batch_size:
            pad = self.batch_size - len(batches[-1])
            batches[-1] = np.concatenate([batches[-1], np.repeat(batches[-1][-1:], pad)])

        rng = np.random.default_rng(
            (self.seed + self.epoch) * 100003 + self.process_index)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._make_batch(b, rng))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def _pad_to_common(samples):
    """Pad images in a batch to the max H, W (legacy multi-scale recipe).

    Returns samples with a shared shape; padded area is encoded by the
    `pad_mask` entry added to each target (True on padding).

    The padded extent rounds up to a multiple of 64: the window-major ViT
    needs 64-divisible inputs (16-pixel patches x 4 windows per side), and
    quantizing the pad bounds the number of XLA-compiled shape variants —
    the mask keeps the extra padding semantically invisible.
    """
    max_h = -(-max(s[0].shape[0] for s in samples) // 64) * 64
    max_w = -(-max(s[0].shape[1] for s in samples) // 64) * 64
    out = []
    for img, tgt in samples:
        h, w = img.shape[:2]
        padded = np.zeros((max_h, max_w, 3), img.dtype)
        padded[:h, :w] = img
        mask = np.ones((max_h, max_w), bool)
        mask[:h, :w] = False
        tgt = dict(tgt)
        tgt["pad_mask"] = mask
        out.append((padded, tgt))
    return out
