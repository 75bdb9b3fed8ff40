"""Hand-derived golden COCOeval scenarios.

VERDICT r2 weak #5: data/coco_eval.py and tests/cocoeval_oracle.py were
fuzz-tested against each other, but both share an author — a common
misreading of the pycocotools protocol would pass.  pycocotools cannot run
here, so these fixtures are derived BY HAND from the published COCOeval
bbox protocol (pycocotools cocoeval.py, mirrored in the reference's inlined
evaluate at /root/reference/datasets/coco_eval.py:202-264):

* greedy per-threshold matching in descending score order, each det takes
  the best-IoU not-yet-matched GT with IoU >= t;
* crowd GT: IoU normalizes by det area, may absorb multiple dets, absorbed
  dets are ignored (neither TP nor FP), crowd never counts toward recall;
* area ranges: out-of-range GT ignored; unmatched dets with out-of-range
  area ignored (not FP); a range with zero in-range GT scores -1;
* maxDets truncation per (image, category) BEFORE matching;
* score ties broken by original det order (mergesort stability);
* AP: precision envelope (running max from the right) sampled at the 101
  recThrs via searchsorted(recall, recThr, side='left'); out-of-range
  sample = 0; AR = final recall at full maxDets cut.

Every expected stat below is an exact rational derived in the comments.
Both implementations must reproduce them to 1e-12.
"""
import numpy as np
import pytest

from cocoeval_oracle import OracleEval
from lwdetr_tpu.data.coco_eval import CocoEvaluator
from test_coco_eval_oracle import FakeIndex


def _gt(bbox, cat=1, crowd=0, area=None):
    return {"bbox": list(map(float, bbox)), "category_id": cat,
            "iscrowd": crowd,
            "area": float(area if area is not None else bbox[2] * bbox[3])}


def _scenario(gt_specs, det_specs, cat_ids=(1,)):
    """gt_specs: [(img, bbox_xywh, cat, crowd)], det_specs (ordered!):
    [(img, bbox_xywh, score, cat)] -> (anns_by_img, gts, dts, results)."""
    img_ids = sorted({s[0] for s in gt_specs} | {s[0] for s in det_specs})
    anns_by_img = {i: [] for i in img_ids}
    gts = {}
    for img, bbox, cat, crowd in gt_specs:
        ann = _gt(bbox, cat, crowd)
        anns_by_img[img].append(ann)
        gts.setdefault((img, cat), []).append(ann)
    dts = {}
    results = {i: {"boxes": [], "scores": [], "labels": []} for i in img_ids}
    for img, bbox, score, cat in det_specs:
        dts.setdefault((img, cat), []).append(
            {"bbox": list(map(float, bbox)), "score": float(score),
             "category_id": cat})
        results[img]["boxes"].append(
            [bbox[0], bbox[1], bbox[0] + bbox[2], bbox[1] + bbox[3]])
        results[img]["scores"].append(score)
        results[img]["labels"].append(cat)
    for r in results.values():
        r["boxes"] = np.asarray(r["boxes"], np.float64).reshape(-1, 4)
        r["scores"] = np.asarray(r["scores"], np.float64)
        r["labels"] = np.asarray(r["labels"], np.int64)
    return img_ids, list(cat_ids), anns_by_img, gts, dts, results


def _check(scenario, expected):
    img_ids, cat_ids, anns_by_img, gts, dts, results = scenario
    oracle = OracleEval(img_ids, cat_ids, gts, dts).summarize()
    ev = CocoEvaluator(FakeIndex(anns_by_img, cat_ids))
    ev.update(results)
    ours = ev.summarize(verbose=False)
    for k, v in expected.items():
        assert oracle[k] == pytest.approx(v, abs=1e-12), (
            f"oracle {k}: {oracle[k]} != derived {v}")
        assert ours[k] == pytest.approx(v, abs=1e-12), (
            f"coco_eval {k}: {ours[k]} != derived {v}")


def test_golden_basic_matching_and_interpolation():
    """Two GT, three dets; one match survives only up to IoU 0.5.

    G1=[0,0,10,10] G2=[20,20,10,10] (areas 100, small bin).
    D1=[0,0,10,10] s.9 -> IoU(G1)=1. D2=[20,20,5,10] s.8 -> IoU(G2)=
    50/(100+50-50)=0.5. D3=[40,40,10,10] s.7 -> FP.

    t=0.50: TP,TP,FP -> recall pts [.5,1,1], env precision [1,1,2/3];
      searchsorted('left') gives precision 1 at every recThr -> AP(t)=1.
    t=0.55..0.95 (9 thr): TP,FP,FP -> recall [.5], precision [1];
      recThr 0.00..0.50 (51 pts) -> 1, rest out of range -> 0;
      AP(t)=51/101.
    AP=(1+9*51/101)/10=560/1010.  AP50=1.  AP75=51/101.
    Recall: t=.5 -> 1.0; others -> .5 -> AR=(1+9*.5)/10=0.55.
    AR1 cuts to D1 only -> recall .5 at every t -> 0.5.
    No medium/large GT -> -1.
    """
    sc = _scenario(
        [(1, [0, 0, 10, 10], 1, 0), (1, [20, 20, 10, 10], 1, 0)],
        [(1, [0, 0, 10, 10], 0.9, 1), (1, [20, 20, 5, 10], 0.8, 1),
         (1, [40, 40, 10, 10], 0.7, 1)])
    _check(sc, {
        "AP": 560 / 1010, "AP50": 1.0, "AP75": 51 / 101,
        "APs": 560 / 1010, "APm": -1.0, "APl": -1.0,
        "AR1": 0.5, "AR10": 0.55, "AR100": 0.55,
        "ARs": 0.55, "ARm": -1.0, "ARl": -1.0})


def test_golden_crowd_absorbs_multiple_dets():
    """Crowd GT absorbs two dets (both ignored, not FP); crowd is excluded
    from the recall denominator; crowd IoU normalizes by det area.

    G1=[0,0,10,10] (real), G2=[30,30,20,20] crowd (area 400).
    D_c1=[30,30,20,20] s.95: IoU_crowd = inter/detArea = 400/400 = 1 ->
      absorbed (ignored).  If crowd were wrongly a normal GT or the det
      wrongly an FP, the higher-scored FP would cap AP at 0.5.
    D1=[0,0,10,10] s.9 -> TP.  D_c2=[35,35,10,10] s.6: fully inside the
      already-matched crowd, IoU_crowd = 100/100 = 1 -> ALSO absorbed
      (crowd may match repeatedly).  D3=[60,60,10,10] s.5 -> FP.
    npig=1; TP stream: D1 -> precision 1 at recall 1 -> AP=1 at every t.
    AR1 cuts to D_c1 alone, which is ignored -> zero TP -> AR1=0.
    Medium range [32^2,96^2]: G1 (100) out of range, G2 crowd -> npig=0
    -> -1.
    """
    sc = _scenario(
        [(1, [0, 0, 10, 10], 1, 0), (1, [30, 30, 20, 20], 1, 1)],
        [(1, [30, 30, 20, 20], 0.95, 1), (1, [0, 0, 10, 10], 0.9, 1),
         (1, [35, 35, 10, 10], 0.6, 1), (1, [60, 60, 10, 10], 0.5, 1)])
    _check(sc, {
        "AP": 1.0, "AP50": 1.0, "AP75": 1.0,
        "APs": 1.0, "APm": -1.0, "APl": -1.0,
        "AR1": 0.0, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_envelope_and_maxdets():
    """TP,TP,FP,TP,FP at IoU=1: the envelope keeps precision 1 through the
    second TP and 3/4 after the third.

    3 GT unit boxes; D1 s.9->G3, D2 s.8->G1, D3 s.7 FP, D4 s.6->G2,
    D5 s.5 FP (exact-overlap matches -> identical at all 10 thresholds).
    recall pts [1/3, 2/3, 1], precisions [1/1, 2/2, 3/4], envelope
    [1,1,3/4].  searchsorted: recThr 0.00..0.66 (67 pts) -> 1;
    0.67..1.00 (34 pts) -> 3/4.  AP = (67 + 34*3/4)/101 = 92.5/101.
    AR1: only D1 -> 1/3.  AR10/AR100: all matched -> 1.
    """
    sc = _scenario(
        [(1, [0, 0, 10, 10], 1, 0), (1, [20, 0, 10, 10], 1, 0),
         (1, [40, 0, 10, 10], 1, 0)],
        [(1, [40, 0, 10, 10], 0.9, 1), (1, [0, 0, 10, 10], 0.8, 1),
         (1, [100, 100, 10, 10], 0.7, 1), (1, [20, 0, 10, 10], 0.6, 1),
         (1, [120, 120, 10, 10], 0.5, 1)])
    ap = 92.5 / 101
    _check(sc, {
        "AP": ap, "AP50": ap, "AP75": ap, "APs": ap, "APm": -1.0,
        "APl": -1.0, "AR1": 1 / 3, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_det_area_ignore():
    """An unmatched det with out-of-range area is ignored, not an FP.

    G1=[0,0,10,10] (small).  B=[50,50,100,50] s.9 area 5000 (medium),
    unmatched.  A=[0,0,10,10] s.8 -> TP.
    All-areas: FP,TP -> recall pts [0,1], env precision [1/2,1/2] ->
      AP=1/2 at every t (searchsorted hits index 0 or 1, both 1/2).
    Small range: B's area is outside [0,32^2] and it is unmatched ->
      ignored -> the TP stands alone -> APs=1.
    AR1: top-1 det is B (FP in all-areas) -> AR1=0; small range: B
      ignored but still consumes the maxDets=1 cut (truncation happens
      before matching) -> ARs@1 would be 0 too, but AR1 is the all-areas
      row -> 0.
    """
    sc = _scenario(
        [(1, [0, 0, 10, 10], 1, 0)],
        [(1, [50, 50, 100, 50], 0.9, 1), (1, [0, 0, 10, 10], 0.8, 1)])
    _check(sc, {
        "AP": 0.5, "AP50": 0.5, "AP75": 0.5,
        "APs": 1.0, "APm": -1.0, "APl": -1.0,
        "AR1": 0.0, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_score_tie_stability():
    """Equal scores must keep original det order (mergesort semantics):
    the first-listed det is the TP; an unstable sort would put the FP
    first and cap AP at 0.5 instead of 1.0."""
    sc = _scenario(
        [(1, [0, 0, 10, 10], 1, 0)],
        [(1, [0, 0, 10, 10], 0.8, 1), (1, [50, 50, 10, 10], 0.8, 1)])
    _check(sc, {
        "AP": 1.0, "AP50": 1.0, "AP75": 1.0, "APs": 1.0,
        "APm": -1.0, "APl": -1.0,
        "AR1": 1.0, "AR10": 1.0, "AR100": 1.0,
        "ARs": 1.0, "ARm": -1.0, "ARl": -1.0})


def test_golden_category_mean_excludes_empty_not_zero():
    """Categories average: a zero-AP category counts (npig>0), an absent
    one does not.  cat1: perfect match -> 1.  cat2: one GT, one far det ->
    0.  mean = 0.5 for every AP/AR column with in-range GT."""
    sc = _scenario(
        [(1, [0, 0, 10, 10], 1, 0), (1, [30, 30, 10, 10], 2, 0)],
        [(1, [0, 0, 10, 10], 0.9, 1), (1, [100, 100, 10, 10], 0.9, 2)],
        cat_ids=(1, 2))
    _check(sc, {
        "AP": 0.5, "AP50": 0.5, "AP75": 0.5, "APs": 0.5,
        "APm": -1.0, "APl": -1.0,
        "AR1": 0.5, "AR10": 0.5, "AR100": 0.5,
        "ARs": 0.5, "ARm": -1.0, "ARl": -1.0})
