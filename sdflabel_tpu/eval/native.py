"""ctypes bindings for the native evaluator matching kernels.

Loads csrc/build/libeval_match.so, building it from csrc/eval_match.cpp on
demand (g++ -O3). The sequential greedy matching is the one part of the
evaluator that cannot vectorize (loop-carried `assigned` state,
detection_3d.py:1150-1196); everything parallel (IoU matrices, PR curves)
lives in ops.rotated_iou / eval.detection3d.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "build", "libeval_match.so")
_SRC = os.path.join(_CSRC, "eval_match.cpp")

_lib = None


def _build():
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC], check=True
    )


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.sdfl_compute_statistics.restype = ctypes.c_int64
    lib.sdfl_compute_statistics.argtypes = [
        dp, dp, dp, ip, ip, dp,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        dp, dp,
    ]
    lib.sdfl_fused_compute_statistics.restype = None
    lib.sdfl_fused_compute_statistics.argtypes = [
        dp, dp, ip, ip, ip, dp, dp, dp, ip, ip,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        dp, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresh=0.0,
                       compute_fp=False, compute_angular=False):
    """Single-frame greedy matching (detection_3d.py:1098-1233)."""
    lib = get_lib()
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    gt_datas = np.ascontiguousarray(gt_datas, np.float64).reshape(-1, 6)
    dt_datas = np.ascontiguousarray(dt_datas, np.float64).reshape(-1, 7)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    dc_bboxes = np.ascontiguousarray(dc_bboxes, np.float64).reshape(-1, 4)
    num_gt, num_dt, num_dc = len(gt_datas), len(dt_datas), len(dc_bboxes)
    thresholds = np.zeros(max(num_gt, 1), np.float64)
    out = np.zeros(7, np.float64)
    n_thr = lib.sdfl_compute_statistics(
        _dptr(overlaps), _dptr(gt_datas), _dptr(dt_datas),
        _iptr(ignored_gt), _iptr(ignored_det), _dptr(dc_bboxes),
        num_gt, num_dt, num_dc, int(metric), float(min_overlap),
        float(thresh), int(bool(compute_fp)), int(bool(compute_angular)),
        _dptr(thresholds), _dptr(out),
    )
    return {
        "tp": int(out[0]), "fp": int(out[1]), "fn": int(out[2]),
        "error_yaw": out[3], "similarity": out[4],
        "match_degree": out[5], "confidence_error": out[6],
        "thresholds": thresholds[:n_thr].copy(),
    }


def fused_compute_statistics(overlaps, pr, gt_nums, dt_nums, dc_nums,
                             gt_datas, dt_datas, dontcares, ignored_gts,
                             ignored_dets, metric, min_overlap, thresholds,
                             compute_angular_metrics=False):
    """Shard-fused matching over frames x thresholds, accumulating pr
    in place (detection_3d.py:1236-1294)."""
    lib = get_lib()
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    pr_c = np.ascontiguousarray(pr, np.float64)
    gt_nums = np.ascontiguousarray(gt_nums, np.int64)
    dt_nums = np.ascontiguousarray(dt_nums, np.int64)
    dc_nums = np.ascontiguousarray(dc_nums, np.int64)
    gt_datas = np.ascontiguousarray(gt_datas, np.float64).reshape(-1, 6)
    dt_datas = np.ascontiguousarray(dt_datas, np.float64).reshape(-1, 7)
    dontcares = np.ascontiguousarray(dontcares, np.float64).reshape(-1, 4)
    ignored_gts = np.ascontiguousarray(ignored_gts, np.int64)
    ignored_dets = np.ascontiguousarray(ignored_dets, np.int64)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    lib.sdfl_fused_compute_statistics(
        _dptr(overlaps), _dptr(pr_c), _iptr(gt_nums), _iptr(dt_nums),
        _iptr(dc_nums), _dptr(gt_datas), _dptr(dt_datas), _dptr(dontcares),
        _iptr(ignored_gts), _iptr(ignored_dets),
        len(gt_nums), int(gt_nums.sum()), int(metric), float(min_overlap),
        _dptr(thresholds), len(thresholds),
        int(bool(compute_angular_metrics)),
    )
    pr[...] = pr_c
