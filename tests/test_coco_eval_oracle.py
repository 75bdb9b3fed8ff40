"""Fuzz parity of lwdetr_tpu.data.coco_eval vs the pycocotools-semantics
oracle (tests/cocoeval_oracle.py) — VERDICT r1 "What's missing" #2.

Random scenarios cover: crowd GTs (absorbing multiple dts), area-range
mixes (small/medium/large scales), score ties (quantized scores +
mergesort stability), maxDet truncation (dt counts > 10), degenerate
zero-width detections, annotation `area` fields that differ from box area
(crowd RLE semantics), categories with no GT or no detections, and images
seen by only one of gt/dt.
"""
import numpy as np
import pytest

from cocoeval_oracle import OracleEval
from lwdetr_tpu.data.coco_eval import CocoEvaluator


class FakeIndex:
    def __init__(self, anns_by_img, cats):
        self._anns = anns_by_img
        self._cats = cats

    def get_img_ids(self):
        return sorted(self._anns.keys())

    def get_cat_ids(self):
        return self._cats

    def load_anns(self, img_id):
        return self._anns[img_id]


def random_scenario(seed: int):
    rng = np.random.default_rng(seed)
    n_imgs = int(rng.integers(1, 7))
    img_ids = list(range(1, n_imgs + 1))
    n_cats = int(rng.integers(1, 5))
    cat_ids = sorted(rng.choice(np.arange(1, 20), n_cats, replace=False).tolist())

    # scale pool spanning the COCO area ranges
    scales = [8.0, 24.0, 48.0, 90.0, 150.0, 300.0]

    def rand_box():
        s = float(rng.choice(scales))
        w = s * float(rng.uniform(0.5, 1.5))
        h = s * float(rng.uniform(0.5, 1.5))
        x = float(rng.uniform(0, 640 - min(w, 600)))
        y = float(rng.uniform(0, 640 - min(h, 600)))
        return [x, y, w, h]

    gts = {}
    anns_by_img = {i: [] for i in img_ids}
    for img in img_ids:
        for cat in cat_ids:
            n_gt = int(rng.integers(0, 7)) if rng.random() < 0.8 else 0
            lst = []
            for _ in range(n_gt):
                bbox = rand_box()
                crowd = int(rng.random() < 0.2)
                area = bbox[2] * bbox[3]
                if rng.random() < 0.3:  # area field != box area (RLE semantics)
                    area *= float(rng.uniform(0.4, 1.0))
                ann = {"bbox": bbox, "category_id": cat, "iscrowd": crowd,
                       "area": area}
                lst.append(ann)
                anns_by_img[img].append(ann)
            if lst:
                gts[(img, cat)] = lst

    dts = {}
    results = {}
    for img in img_ids:
        boxes, scores, labels = [], [], []
        for cat in cat_ids:
            n_dt = int(rng.integers(0, 13)) if rng.random() < 0.9 else 0
            lst = []
            gt_here = gts.get((img, cat), [])
            for _ in range(n_dt):
                if gt_here and rng.random() < 0.6:  # perturbed copy of a gt
                    src = gt_here[int(rng.integers(len(gt_here)))]["bbox"]
                    jitter = rng.normal(0, 0.1 * max(src[2], src[3]), 4)
                    bbox = [src[0] + jitter[0], src[1] + jitter[1],
                            max(src[2] + jitter[2], 0.0),
                            max(src[3] + jitter[3], 0.0)]
                else:
                    bbox = rand_box()
                if rng.random() < 0.05:  # degenerate detection
                    bbox[2] = 0.0
                score = float(rng.uniform(0.05, 1.0))
                if rng.random() < 0.4:  # force score ties
                    score = round(score, 1)
                lst.append({"bbox": bbox, "score": score, "category_id": cat})
                boxes.append([bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1] + bbox[3]])
                scores.append(score)
                labels.append(cat)
            if lst:
                dts[(img, cat)] = lst
        results[img] = {
            "boxes": np.array(boxes, np.float64).reshape(-1, 4),
            "scores": np.array(scores, np.float64),
            "labels": np.array(labels, np.int64),
        }
    return img_ids, cat_ids, anns_by_img, gts, dts, results


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_parity_with_oracle(seed):
    img_ids, cat_ids, anns_by_img, gts, dts, results = random_scenario(seed)

    oracle = OracleEval(img_ids, cat_ids, gts, dts)
    expected = oracle.summarize()

    ev = CocoEvaluator(FakeIndex(anns_by_img, cat_ids))
    ev.update(results)
    got = ev.summarize(verbose=False)

    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-8), (
            f"seed={seed} stat {k}: ours={got[k]} oracle={expected[k]}")


def test_fuzz_parity_two_host_merge():
    """Split detections across two evaluators and merge (reference
    datasets/coco_eval.py:181-200 all_gather merge) — same stats as
    single-host evaluation."""
    img_ids, cat_ids, anns_by_img, gts, dts, results = random_scenario(99)
    oracle = OracleEval(img_ids, cat_ids, gts, dts)
    expected = oracle.summarize()

    gt_index = FakeIndex(anns_by_img, cat_ids)
    half = len(img_ids) // 2 + 1
    ev_a = CocoEvaluator(gt_index)
    ev_a.update({i: results[i] for i in img_ids[:half]})
    ev_b = CocoEvaluator(gt_index)
    ev_b.update({i: results[i] for i in img_ids[half:]})
    ev_a.merge(ev_b.export())
    got = ev_a.summarize(verbose=False)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-8)
