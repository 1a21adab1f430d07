"""Evaluate stored autolabel dumps.

Behavioral parity target: pipelines/evaluate_dump.py:11-62 — load *.pkl
autolabels, backfill empty predictions, run the KITTI + nuScenes
evaluators.
"""

from __future__ import annotations

import glob
import os
import pickle
from collections import OrderedDict

import numpy as np

from sdflabel_tpu import config as cfg_mod
from sdflabel_tpu.eval.detection3d import (
    CoordinateFrame,
    Detection3DEvaluator,
    clean_kitti_data,
    difficulty_by_distance,
)

FILTER_FNS = {"kitti": clean_kitti_data, "distance": difficulty_by_distance}


def evaluate(cfgp, difficulties=(0, 1)):
    cfg = cfg_mod.RefineCfg.from_ini(cfgp)
    path_autolabels = cfg.labels_out

    gt_annotations, pred_annotations = OrderedDict(), OrderedDict()
    for f in sorted(glob.glob(os.path.join(path_autolabels, "*.pkl"))):
        if "skipped_frames" in f:
            continue
        anno = pickle.load(open(f, "rb"))
        frame_id = int(os.path.basename(f).split(".")[0])
        gt, estimations = anno[0], anno[1]
        if "name" not in estimations:
            estimations["name"] = []
            estimations["location"] = np.zeros((0, 3))
            estimations["dimensions"] = np.zeros((0, 3))
            estimations["bbox"] = np.zeros((0, 4))
            estimations["rotation_y"] = np.zeros((0,))
            estimations["alpha"] = np.zeros((0,))
            estimations["score"] = np.zeros((0,))
        gt_annotations[frame_id] = gt
        pred_annotations[frame_id] = estimations

    results = []
    filter_fn = FILTER_FNS[cfg.eval_filter]
    for compute_nuscenes in (False, True):
        evaluator = Detection3DEvaluator(
            filter_fn, compute_nuscenes=compute_nuscenes,
            coordinate_frame=CoordinateFrame.CAMERA,
        )
        formatted, result = evaluator.evaluate_detection_3d(
            list(gt_annotations.values()), list(pred_annotations.values()),
            ["Car"], difficulties=list(difficulties),
        )
        print(formatted)
        results.append(result)

    # Persist mAP + PR curves (SURVEY.md §5 metrics row: the reference only
    # prints; we save the evaluator's full result dicts for later analysis).
    out = {}
    for tag, result in zip(("kitti", "nuscenes"), results):
        for k, v in result.items():
            out[f"{tag}/{k}"] = np.asarray(v)
    np.savez(os.path.join(path_autolabels, "eval_results.npz"), **out)
    return results
