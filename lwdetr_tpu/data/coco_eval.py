"""COCO detection evaluation (bbox mAP) in pure numpy.

pycocotools is not available in this environment, so this module implements
the COCOeval bbox protocol from scratch with the exact matching and
accumulation semantics the reference relies on
(/root/reference/datasets/coco_eval.py wraps pycocotools.COCOeval):

* IoU thresholds 0.50:0.05:0.95, recall thresholds 0:0.01:1 (101-point),
  area ranges all/small/medium/large, maxDets (1, 10, 100);
* greedy per-image-per-category matching in score order, crowd GTs use
  intersection-over-detection-area and can absorb multiple detections;
* detections matched to ignored GTs (crowd or out-of-area) are ignored,
  as are unmatched detections outside the area range;
* AP = mean interpolated precision over recall grid and IoU thresholds,
  averaged over categories present in the ground truth.

The distributed merge (reference coco_eval.py:181-200 pickled all_gather)
becomes a simple list-extend of per-host result arrays — see
`CocoEvaluator.merge`.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)

STAT_NAMES = (
    "AP", "AP50", "AP75", "APs", "APm", "APl",
    "AR1", "AR10", "AR100", "ARs", "ARm", "ARl",
)


def iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xywh boxes; crowd gt uses intersection / dt area."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx0, dy0 = dt[:, 0], dt[:, 1]
    dx1, dy1 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx0, gy0 = gt[:, 0], gt[:, 1]
    gx1, gy1 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = np.clip(np.minimum(dx1[:, None], gx1[None]) - np.maximum(dx0[:, None], gx0[None]), 0, None)
    ih = np.clip(np.minimum(dy1[:, None], gy1[None]) - np.maximum(dy0[:, None], gy0[None]), 0, None)
    inter = iw * ih
    d_area = (dt[:, 2] * dt[:, 3])[:, None]
    g_area = (gt[:, 2] * gt[:, 3])[None]
    union = np.where(iscrowd[None].astype(bool), d_area, d_area + g_area - inter)
    return inter / np.maximum(union, 1e-10)


def _evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_crowd, gt_area, area_rng, max_det):
    """Greedy matching for one (image, category, area-range, maxDet).

    Returns dict with per-threshold dt matches/ignores and gt ignore mask,
    mirroring pycocotools.cocoeval.COCOeval.evaluateImg.
    """
    T = len(IOU_THRS)
    # gt ignore: crowd or outside area range
    gt_ig = gt_crowd.astype(bool) | (gt_area < area_rng[0]) | (gt_area > area_rng[1])
    # sort gt: non-ignored first (stable)
    g_order = np.argsort(gt_ig, kind="stable")
    gt_boxes = gt_boxes[g_order]
    gt_ig = gt_ig[g_order]
    gt_crowd_s = gt_crowd[g_order]

    d_order = np.argsort(-dt_scores, kind="stable")[:max_det]
    dt_boxes_s = dt_boxes[d_order]
    dt_scores_s = dt_scores[d_order]

    ious = iou_xywh(dt_boxes_s, gt_boxes, gt_crowd_s)

    D, G = len(dt_boxes_s), len(gt_boxes)
    dt_m = -np.ones((T, D), np.int64)  # index of matched gt, -1 unmatched
    gt_m = -np.ones((T, G), np.int64)
    if D and G:
        # Greedy matching vectorized over the T IoU thresholds. Semantics
        # (pycocotools evaluateImg): scan gts sorted non-ignored-first;
        # a dt takes the max-IoU available gt with iou >= thr, LAST index
        # winning ties (the scalar loop's `< best: continue` update rule);
        # an ignored gt never displaces a non-ignored candidate (the scan
        # breaks at the ignore boundary); matched non-crowd gts become
        # unavailable, crowd gts can absorb any number of dts.
        thr = np.minimum(IOU_THRS, 1 - 1e-10)[:, None]  # (T, 1)
        crowd = gt_crowd_s.astype(bool)
        nonig = ~gt_ig
        any_ig = bool(gt_ig.any())
        t_idx = np.arange(T)

        def _pick_last_max(cand, iou_d):
            """(T, G) candidate mask -> (has (T,), m (T,)) last-argmax."""
            masked = np.where(cand, iou_d[None], -np.inf)
            best = masked.max(axis=1)
            has = best > -np.inf
            m = (G - 1) - np.argmax(masked[:, ::-1] == best[:, None], axis=1)
            return has, m

        for d in range(D):
            iou_d = ious[d]
            avail = (gt_m < 0) | crowd[None]
            ok = iou_d[None] >= thr
            has_n, m = _pick_last_max(avail & nonig[None] & ok, iou_d)
            if any_ig:
                has_i, m_i = _pick_last_max(avail & gt_ig[None] & ok, iou_d)
                m = np.where(has_n, m, np.where(has_i, m_i, -1))
            else:
                m = np.where(has_n, m, -1)
            hit = m >= 0
            dt_m[hit, d] = m[hit]
            gt_m[t_idx[hit], m[hit]] = d
    # dt ignore: matched to ignored gt, or unmatched and dt area out of range
    dt_area = dt_boxes_s[:, 2] * dt_boxes_s[:, 3]
    a_out = (dt_area < area_rng[0]) | (dt_area > area_rng[1])
    matched = dt_m >= 0
    ig_of_match = np.take(np.append(gt_ig, False), dt_m)  # -1 -> sentinel
    dt_ig = np.where(matched, ig_of_match, a_out[None])
    return {
        "dt_scores": dt_scores_s,
        "dt_matched": dt_m >= 0,
        "dt_ignore": dt_ig,
        "n_gt": int((~gt_ig).sum()),
    }


class CocoEvaluator:
    """Accumulates predictions and computes the 12 COCO bbox statistics.

    Usage:
      ev = CocoEvaluator(gt_index)            # CocoIndex or compatible
      ev.update(results)                      # {img_id: {boxes xyxy, scores, labels}}
      ev.merge(other.export()) for other hosts
      stats = ev.summarize()                  # dict of the 12 stats
    """

    def __init__(self, coco_gt, cat_ids: Optional[Sequence[int]] = None):
        self.coco_gt = coco_gt
        self.cat_ids = list(cat_ids) if cat_ids is not None else coco_gt.get_cat_ids()
        self._gts = defaultdict(lambda: ([], [], []))  # (img, cat) -> boxes, crowd, area
        for img_id in coco_gt.get_img_ids():
            for ann in coco_gt.load_anns(img_id):
                b, c, a = self._gts[(img_id, ann["category_id"])]
                b.append(ann["bbox"])
                c.append(ann.get("iscrowd", 0))
                a.append(ann.get("area", ann["bbox"][2] * ann["bbox"][3]))
        self._dts = defaultdict(lambda: ([], []))  # (img, cat) -> boxes, scores
        self._img_ids: set = set()

    def update(self, results: Dict[int, dict]):
        """results: img_id -> dict(boxes (N,4) xyxy absolute, scores (N,), labels (N,))."""
        for img_id, r in results.items():
            self._img_ids.add(int(img_id))
            boxes = np.asarray(r["boxes"], np.float64).reshape(-1, 4)
            xywh = boxes.copy()
            xywh[:, 2:] -= xywh[:, :2]
            scores = np.asarray(r["scores"], np.float64).reshape(-1)
            labels = np.asarray(r["labels"], np.int64).reshape(-1)
            for cat in np.unique(labels):
                sel = labels == cat
                b, s = self._dts[(int(img_id), int(cat))]
                b.extend(xywh[sel].tolist())
                s.extend(scores[sel].tolist())

    def export(self):
        """Per-host state for cross-host merging."""
        return {"img_ids": sorted(self._img_ids),
                "dts": {k: v for k, v in self._dts.items()}}

    def merge(self, exported):
        self._img_ids.update(exported["img_ids"])
        for k, (b, s) in exported["dts"].items():
            mb, ms = self._dts[k]
            mb.extend(b)
            ms.extend(s)

    def summarize(self, verbose: bool = True) -> Dict[str, float]:
        img_ids = sorted(self._img_ids) if self._img_ids else self.coco_gt.get_img_ids()
        T, R = len(IOU_THRS), len(REC_THRS)
        A, M, K = len(AREA_RNG), len(MAX_DETS), len(self.cat_ids)
        area_items = list(AREA_RNG.items())

        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for ki, cat in enumerate(self.cat_ids):
            # gather per-image eval results once per (area, maxdet)
            per_img = []
            for img_id in img_ids:
                gb, gc, ga = self._gts.get((img_id, cat), ([], [], []))
                db, ds = self._dts.get((img_id, cat), ([], []))
                if not gb and not db:
                    continue
                per_img.append((
                    np.asarray(db, np.float64).reshape(-1, 4),
                    np.asarray(ds, np.float64),
                    np.asarray(gb, np.float64).reshape(-1, 4),
                    np.asarray(gc, np.int64),
                    np.asarray(ga, np.float64),
                ))
            if not per_img:
                continue
            for ai, (aname, arng) in enumerate(area_items):
                # one matching per (img, cat, area) at maxDets[-1]; smaller
                # maxDets slice the per-image dt columns (greedy matching is
                # prefix-stable in score order — the match of detection i
                # never depends on lower-scored detections), exactly as
                # pycocotools' accumulate slices evaluateImg results
                evals = [
                    _evaluate_img(db, ds, gb, gc, ga, arng, MAX_DETS[-1])
                    for (db, ds, gb, gc, ga) in per_img
                ]
                n_gt = sum(e["n_gt"] for e in evals)
                if n_gt == 0:
                    continue
                for mi, max_det in enumerate(MAX_DETS):
                    scores = np.concatenate(
                        [e["dt_scores"][:max_det] for e in evals])
                    order = np.argsort(-scores, kind="mergesort")
                    matched = np.concatenate(
                        [e["dt_matched"][:, :max_det] for e in evals],
                        axis=1)[:, order]
                    ignored = np.concatenate(
                        [e["dt_ignore"][:, :max_det] for e in evals],
                        axis=1)[:, order]

                    tps = matched & ~ignored
                    fps = ~matched & ~ignored
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for ti in range(T):
                        tp, fp = tp_sum[ti], fp_sum[ti]
                        rc = tp / n_gt
                        pr = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
                        recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                        # monotone precision envelope
                        q = np.zeros(R)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        precision[ti, :, ki, ai, mi] = q

        def _ap(ai, mi, ti=None):
            p = precision[:, :, :, ai, mi] if ti is None else precision[ti:ti + 1, :, :, ai, mi]
            p = p[p > -1]
            return float(np.mean(p)) if p.size else -1.0

        def _ar(ai, mi):
            r = recall[:, :, ai, mi]
            r = r[r > -1]
            return float(np.mean(r)) if r.size else -1.0

        # retained for offline analysis dumps (reference main.py:402-411
        # saves coco_eval['bbox'].eval to output_dir/eval/)
        self.eval = {"precision": precision, "recall": recall}
        ai_all = list(AREA_RNG).index("all")
        stats = {
            "AP": _ap(ai_all, 2),
            "AP50": _ap(ai_all, 2, 0),
            "AP75": _ap(ai_all, 2, 5),
            "APs": _ap(list(AREA_RNG).index("small"), 2),
            "APm": _ap(list(AREA_RNG).index("medium"), 2),
            "APl": _ap(list(AREA_RNG).index("large"), 2),
            "AR1": _ar(ai_all, 0),
            "AR10": _ar(ai_all, 1),
            "AR100": _ar(ai_all, 2),
            "ARs": _ar(list(AREA_RNG).index("small"), 2),
            "ARm": _ar(list(AREA_RNG).index("medium"), 2),
            "ARl": _ar(list(AREA_RNG).index("large"), 2),
        }
        if verbose:
            for k, v in stats.items():
                print(f"  {k:6s} = {v:.3f}")
        return stats
