"""Unit tests for the numpy COCO evaluator against hand-computed cases."""
import numpy as np

from lwdetr_tpu.data.coco_eval import CocoEvaluator, iou_xywh


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


def ann(bbox, cat, crowd=0):
    return {"bbox": list(bbox), "category_id": cat, "iscrowd": crowd,
            "area": bbox[2] * bbox[3]}


def det(x0, y0, x1, y1, score, label):
    return dict(boxes=np.array([[x0, y0, x1, y1]]), scores=np.array([score]),
                labels=np.array([label]))


def merge_dets(*ds):
    return dict(
        boxes=np.concatenate([d["boxes"] for d in ds]),
        scores=np.concatenate([d["scores"] for d in ds]),
        labels=np.concatenate([d["labels"] for d in ds]),
    )


def test_iou_xywh():
    dt = np.array([[0, 0, 10, 10]], float)
    gt = np.array([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    iou = iou_xywh(dt, gt, np.zeros(2))
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0)
    # crowd: intersection over dt area
    iou_c = iou_xywh(dt, gt, np.ones(2))
    np.testing.assert_allclose(iou_c[0, 1], 25.0 / 100.0)


def test_perfect_detections_ap1():
    gt = FakeIndex({1: [ann((10, 10, 50, 50), 1)], 2: [ann((0, 0, 30, 40), 1)]}, [1])
    ev = CocoEvaluator(gt)
    ev.update({1: det(10, 10, 60, 60, 0.9, 1)})
    ev.update({2: det(0, 0, 30, 40, 0.8, 1)})
    stats = ev.summarize(verbose=False)
    assert stats["AP"] == 1.0
    assert stats["AP50"] == 1.0
    assert stats["AR100"] == 1.0


def test_miss_and_false_positive():
    # one gt, one detection at IoU ~0.5 (matches at thr .5, misses at .75)
    gt = FakeIndex({1: [ann((0, 0, 100, 100), 1)]}, [1])
    ev = CocoEvaluator(gt)
    # detection covering exactly half: IoU = 0.5
    ev.update({1: det(0, 0, 100, 50, 0.9, 1)})
    stats = ev.summarize(verbose=False)
    # IoU = 0.5 >= thr only at 0.50 → AP50 = 1, AP75 = 0, AP = mean over thr = 0.1
    assert stats["AP50"] == 1.0
    assert stats["AP75"] == 0.0
    np.testing.assert_allclose(stats["AP"], 0.1, atol=1e-6)


def test_score_ordering_affects_precision():
    # 2 gts; 3 dets: high-score FP first → precision penalized
    gt = FakeIndex({1: [ann((0, 0, 10, 10), 1), ann((100, 100, 10, 10), 1)]}, [1])
    ev = CocoEvaluator(gt)
    ev.update({1: merge_dets(
        det(200, 200, 210, 210, 0.95, 1),  # FP
        det(0, 0, 10, 10, 0.9, 1),         # TP
        det(100, 100, 110, 110, 0.8, 1),   # TP
    )})
    stats = ev.summarize(verbose=False)
    # interpolated precision: rec .5 at prec 1/2... after envelope: 2/3 for all
    # recalls <= 1.0: pr=[0, 1/2, 2/3] → envelope [2/3, 2/3, 2/3]
    np.testing.assert_allclose(stats["AP50"], 2.0 / 3.0, atol=1e-3)
    assert stats["AR100"] == 1.0


def test_crowd_gt_ignored():
    gt = FakeIndex({1: [ann((0, 0, 10, 10), 1), ann((50, 50, 40, 40), 1, crowd=1)]}, [1])
    ev = CocoEvaluator(gt)
    # det on crowd gt should be ignored (not counted as FP)
    ev.update({1: merge_dets(
        det(0, 0, 10, 10, 0.9, 1),
        det(50, 50, 90, 90, 0.95, 1),
    )})
    stats = ev.summarize(verbose=False)
    assert stats["AP"] == 1.0, "crowd-matched det must not count as FP"


def test_area_ranges():
    # small gt (16 px²) only
    gt = FakeIndex({1: [ann((0, 0, 4, 4), 1)]}, [1])
    ev = CocoEvaluator(gt)
    ev.update({1: det(0, 0, 4, 4, 0.9, 1)})
    stats = ev.summarize(verbose=False)
    assert stats["APs"] == 1.0
    assert stats["APm"] == -1.0  # no medium gt
    assert stats["APl"] == -1.0


def test_maxdets_limit():
    # AR1 only counts top-1 detection
    gt = FakeIndex({1: [ann((0, 0, 10, 10), 1), ann((100, 100, 10, 10), 1)]}, [1])
    ev = CocoEvaluator(gt)
    ev.update({1: merge_dets(
        det(0, 0, 10, 10, 0.9, 1),
        det(100, 100, 110, 110, 0.8, 1),
    )})
    stats = ev.summarize(verbose=False)
    assert stats["AR1"] == 0.5
    assert stats["AR100"] == 1.0


def test_multi_host_merge():
    gt = FakeIndex({1: [ann((0, 0, 10, 10), 1)], 2: [ann((0, 0, 10, 10), 1)]}, [1])
    ev1 = CocoEvaluator(gt)
    ev1.update({1: det(0, 0, 10, 10, 0.9, 1)})
    ev2 = CocoEvaluator(gt)
    ev2.update({2: det(0, 0, 10, 10, 0.9, 1)})
    ev1.merge(ev2.export())
    stats = ev1.summarize(verbose=False)
    assert stats["AP"] == 1.0
    assert stats["AR100"] == 1.0
