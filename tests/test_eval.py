"""Detection-3D evaluator: hand-built scenarios with known outcomes."""

import numpy as np
import pytest

from sdflabel_tpu.eval import native
from sdflabel_tpu.eval.detection3d import (
    CoordinateFrame,
    Detection3DEvaluator,
    clean_kitti_data,
    get_thresholds,
)
from sdflabel_tpu.ops import rotated_iou as riou


def _make_anno(locs, dims, rys, names=None, score=1.0, bbox_h=60):
    n = len(locs)
    bboxes = np.zeros((n, 4))
    for i in range(n):
        bboxes[i] = [100 * i, 100, 100 * i + 50, 100 + bbox_h]
    return {
        "name": names if names is not None else ["Car"] * n,
        "bbox": bboxes.astype(np.float64),
        "location": np.asarray(locs, np.float64).reshape(n, 3),
        "dimensions": np.asarray(dims, np.float64).reshape(n, 3),
        "rotation_y": np.asarray(rys, np.float64),
        "alpha": np.asarray(rys, np.float64),
        "score": np.full(n, score, np.float64),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
    }


def _frames(num=6, per=2, jitter=0.0, seed=0):
    rng = np.random.RandomState(seed)
    gts, dts = [], []
    for f in range(num):
        locs = rng.uniform(-10, 10, (per, 3))
        locs[:, 2] = rng.uniform(10, 30, per)
        dims = np.tile([1.6, 1.5, 3.9], (per, 1))
        rys = rng.uniform(-np.pi, np.pi, per)
        gts.append(_make_anno(locs, dims, rys))
        d_locs = locs + rng.randn(per, 3) * jitter
        dts.append(_make_anno(d_locs, dims, rys,
                              score=rng.uniform(0.5, 1.0)))
    return gts, dts


def test_perfect_predictions_100_map():
    gts, dts = _frames()
    ev = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=False,
                              coordinate_frame=CoordinateFrame.CAMERA)
    formatted, res = ev.evaluate_detection_3d(gts, dts, ["Car"],
                                              difficulties=[0])
    for key in ("Box2DAP", "BevAP", "Box3DAP"):
        np.testing.assert_allclose(res[key], 100.0, atol=1e-6, err_msg=key)
    # perfect orientation -> AOS == AP
    np.testing.assert_allclose(res["AosAP_iou"], 100.0, atol=1e-6)
    assert "Car AP" in formatted


def test_nuscenes_metric_runs():
    gts, dts = _frames(jitter=0.2)
    ev = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=True,
                              coordinate_frame=CoordinateFrame.CAMERA)
    _, res = ev.evaluate_detection_3d(gts, dts, ["Car"], difficulties=[0])
    assert res["Box3DAP_Nu"].shape == (1, 1, 2)
    # 0.2m jitter is well under both distance thresholds (0.5m / 1.0m)
    np.testing.assert_allclose(res["Box3DAP_Nu"], 100.0, atol=1e-5)


def test_missing_detections_reduce_recall():
    gts, dts = _frames(num=8)
    # drop every detection of half the frames
    for f in range(4):
        dts[f] = _make_anno(np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0))
    ev = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=False,
                              coordinate_frame=CoordinateFrame.CAMERA)
    _, res = ev.evaluate_detection_3d(gts, dts, ["Car"], difficulties=[0])
    ap = res["Box3DAP"][0, 0, 0]
    assert 40.0 < ap < 60.0  # half the GT unmatched


def test_false_positives_reduce_precision():
    gts, dts = _frames(num=6)
    # add far-away spurious detections
    for f in range(6):
        spurious = _make_anno([[50, 50, 90]], [[1.6, 1.5, 3.9]], [0.0],
                              score=0.99)
        dts[f] = {
            k: np.concatenate([np.asarray(dts[f][k]), np.asarray(spurious[k])])
            for k in dts[f]
        }
    ev = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=False,
                              coordinate_frame=CoordinateFrame.CAMERA)
    _, res = ev.evaluate_detection_3d(gts, dts, ["Car"], difficulties=[0])
    assert res["Box3DAP"][0, 0, 0] < 100.0


def test_small_boxes_ignored():
    """Detections below MIN_HEIGHT don't count as FPs; GT below MIN_HEIGHT
    is ignored (clean_kitti_data semantics)."""
    gt = _make_anno([[0, 0, 20]], [[1.6, 1.5, 3.9]], [0.0], bbox_h=30)
    dt = _make_anno([[50, 0, 90]], [[1.6, 1.5, 3.9]], [0.0], bbox_h=30)
    num_valid, ig_gt, ig_dt, dc = clean_kitti_data(
        gt, dt, 2, 0, {2: "Car"}, CoordinateFrame.CAMERA
    )
    assert num_valid == 0
    assert ig_gt == [1]  # right class, too small -> ignorable
    assert ig_dt == [1]


def test_get_thresholds_spacing():
    scores = np.linspace(0.99, 0.1, 50)
    th = get_thresholds(scores.copy(), num_gt=50, num_sample_pts=41)
    assert len(th) <= 41
    assert th[0] == pytest.approx(0.99)
    assert all(th[i] >= th[i + 1] for i in range(len(th) - 1))


def test_native_matching_simple():
    """2 GT, 2 DT, one perfect match + one miss."""
    overlaps = np.array([[0.9, 0.0], [0.0, 0.1]])  # dt x gt
    gt = np.zeros((2, 6))
    gt[:, :4] = [[0, 0, 50, 60], [100, 0, 150, 60]]
    dt = np.zeros((2, 7))
    dt[:, :4] = gt[:, :4]
    dt[:, 6] = [0.9, 0.8]
    res = native.compute_statistics(
        overlaps, gt, dt, [0, 0], [0, 0], np.zeros((0, 4)),
        metric=2, min_overlap=0.5, thresh=0.0, compute_fp=True,
    )
    assert res["tp"] == 1
    assert res["fn"] == 1
    assert res["fp"] == 1  # dt[1] unmatched


def test_dontcare_suppression():
    """Unmatched detection overlapping a DontCare region is not an FP
    (metric 0 only, detection_3d.py:1199-1213)."""
    overlaps = np.array([[0.0]])
    gt = np.zeros((1, 6))
    gt[:, :4] = [[0, 0, 50, 60]]
    dt = np.zeros((1, 7))
    dt[:, :4] = [[200, 0, 250, 60]]
    dt[:, 6] = 0.9
    dc = np.array([[195, 0, 260, 70]], np.float64)
    res = native.compute_statistics(
        overlaps, gt, dt, [0], [0], dc,
        metric=0, min_overlap=0.5, compute_fp=True,
    )
    assert res["fp"] == 0
    res2 = native.compute_statistics(
        overlaps, gt, dt, [0], [0], np.zeros((0, 4)),
        metric=0, min_overlap=0.5, compute_fp=True,
    )
    assert res2["fp"] == 1


def test_rotate_iou_symmetry_and_range():
    rng = np.random.RandomState(0)
    boxes = np.stack([
        rng.uniform(-5, 5, 20), rng.uniform(-5, 5, 20),
        rng.uniform(0.5, 4, 20), rng.uniform(0.5, 4, 20),
        rng.uniform(-np.pi, np.pi, 20),
    ], 1).astype(np.float32)
    iou = riou.rotate_iou(boxes, boxes)
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-4)
    np.testing.assert_allclose(iou, iou.T, atol=1e-4)
    assert (iou >= 0).all() and (iou <= 1.0 + 1e-6).all()


def test_d3_box_overlap_vertical():
    # identical boxes -> 3D IoU 1
    boxes = np.array([[0, 1.5, 10, 1.6, 1.5, 3.9, 0.3]])
    rinc = riou.rotate_iou(boxes[:, [0, 2, 3, 5, 6]],
                           boxes[:, [0, 2, 3, 5, 6]], 2)
    out = riou.d3_box_overlap(boxes, boxes, rinc, -1, True)
    np.testing.assert_allclose(out, 1.0, atol=1e-4)
    # vertically disjoint -> 0
    b2 = boxes.copy()
    b2[0, 1] += 10
    rinc2 = riou.rotate_iou(boxes[:, [0, 2, 3, 5, 6]],
                            b2[:, [0, 2, 3, 5, 6]], 2)
    out2 = riou.d3_box_overlap(boxes, b2, rinc2, -1, True)
    np.testing.assert_allclose(out2, 0.0, atol=1e-6)


def test_difficulty_by_distance():
    from sdflabel_tpu.eval.detection3d import difficulty_by_distance

    gt = _make_anno([[0, 0, 20], [0, 0, 100]],
                    [[1.5, 1.6, 3.9]] * 2, [0.0, 0.0])
    dt = _make_anno([[0, 0, 20]], [[1.5, 1.6, 3.9]], [0.0], bbox_h=10)
    num_valid, ig_gt, ig_dt, dc = difficulty_by_distance(
        gt, dt, 2, 0, {2: "Car"}, CoordinateFrame.CAMERA,
        max_depth=(30, 80, 150), min_height=20,
    )
    assert num_valid == 1
    assert ig_gt == [0, 1]  # second GT beyond 30m at difficulty 0
    assert ig_dt == [1]  # detection bbox height 10 < 20


def test_aoe_aos_hand_computed():
    """AOE/AOS columns with known angular errors: a single perfect-IoU TP
    with yaw error 0.2 and alpha error 0.4 gives (per the accumulators at
    detection_3d.py:1195-1200,1219-1229)
      AOE = delta_yaw / (tp+fp) = 0.2
      AOS = (1+cos(delta_alpha))/2 = cos^2(0.2)
    and mAP integration over a flat recall=1 curve scales by 100."""
    gt = _make_anno([[0, 0, 10]], [[1.5, 1.6, 3.9]], [0.3])
    dt = _make_anno([[0, 0, 10]], [[1.5, 1.6, 3.9]], [0.5])
    gt["alpha"] = np.array([0.5])
    dt["alpha"] = np.array([0.1])
    ev = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=False,
                              coordinate_frame=CoordinateFrame.CAMERA)
    _txt, res = ev.evaluate_detection_3d([gt], [dt], ["Car"],
                                         difficulties=[0])
    np.testing.assert_allclose(res["Box3DAP"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["AoeAP_iou"], 100.0 * 0.2, atol=1e-6)
    np.testing.assert_allclose(res["AosAP_iou"],
                               100.0 * (1 + np.cos(0.4)) / 2, atol=1e-6)


def test_tp_mean_error_and_confidence_hand_computed():
    """tp_mean_error = |1 - mean matched IoU| (detection_3d.py column 5,
    our eval_metric:400-405): axis-aligned boxes shifted by half a width
    have 3D IoU exactly 1/3; confidence column = -log(score)/tp."""
    # camera frame: BEV uses (x, z) with dims (0, 2); vertical is y.
    gt = _make_anno([[0, 0, 10]], [[2.0, 2.0, 4.0]], [0.0])
    dt = _make_anno([[1.0, 0, 10]], [[2.0, 2.0, 4.0]], [0.0],
                    score=np.exp(-0.25))
    ev = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=False,
                              coordinate_frame=CoordinateFrame.CAMERA)
    # 3D IoU = (1*4*2) / (16+16-8) = 1/3 > car 3D threshold of 0.25 tier?
    # KITTI car 3D thresholds are (0.7, 0.5); use a permissive custom table
    thr = np.full((3, 1, 3, 5), 0.25)
    ev2 = Detection3DEvaluator(clean_kitti_data, compute_nuscenes=False,
                               coordinate_frame=CoordinateFrame.CAMERA,
                               per_class_iou_overlap_thresholds=thr)
    _txt, res = ev2.evaluate_detection_3d([gt], [dt], ["Car"],
                                          difficulties=[0])
    curves = res["bbox_3d_kitti_pre_curves"]
    np.testing.assert_allclose(res["Box3DAP"], 100.0, atol=1e-6)
    tpe = curves["tp_mean_error"][0, 0, 0, 0]
    np.testing.assert_allclose(tpe, abs(1.0 - 1.0 / 3.0), atol=1e-9)
    ce = curves["tp_mean_confidence_error"][0, 0, 0, 0]
    np.testing.assert_allclose(ce, 0.25, atol=1e-9)
    del ev


def test_eval_filter_knob():
    """RefineCfg.eval_filter selects the distance-binned variant
    (VERDICT round-1: difficulty_by_distance was implemented but
    unreachable from any pipeline/config)."""
    import configparser

    from sdflabel_tpu import config as cfg_mod
    from sdflabel_tpu.eval.detection3d import difficulty_by_distance
    from sdflabel_tpu.pipelines.evaluate_dump import FILTER_FNS

    cfgp = configparser.ConfigParser()
    cfgp.read_string("[evaluation]\nfilter = distance\n")
    cfg = cfg_mod.RefineCfg.from_ini(cfgp)
    assert FILTER_FNS[cfg.eval_filter] is difficulty_by_distance
    assert cfg_mod.RefineCfg().eval_filter == "kitti"
