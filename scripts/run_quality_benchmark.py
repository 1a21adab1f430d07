"""Autolabel-QUALITY benchmark: full-driver mAP per perf variant.

Runs the COMPLETE `--refine` driver (CSS forward -> surface decode ->
RANSAC init -> 60-iter refinement -> KITTI label -> in-process KITTI +
nuScenes evaluation; reference pipelines/refine_css.py:26-263) on the
synthetic multi-frame KITTI-format suite (scripts/make_quality_suite.py)
under each throughput variant, and records per-variant mAP + wall time in
one JSON artifact (QUALITY_r{N}.json).

This is the gate the perf variants ship through: a variant whose measured
mAP matches the exact path within noise is safe to make the shipping
default; one that degrades quality is recorded as rejected, with numbers.

Variants:
  exact           stock config semantics (full-grid band selection each
                  iteration), sequential per-crop refinement
  exact_batched   same semantics, all of a frame's crops in one vmapped
                  program (the driver's default dispatch mode)
  warm_refresh10  warm-started band selection at the fast-preset setting
                  (warm_band == capacity 8192, refresh 10) — the measured
                  2.04x rays/s variant (BENCH_NOTES)
  coarse_to_fine  coarse-to-fine selection, 1024 of 8000 cells (the
                  measured-optimal budget, BENCH_NOTES)

Usage: python scripts/run_quality_benchmark.py [--out QUALITY.json]
         [--suite data/quality_suite] [--variants exact,warm_refresh10,...]
"""

import argparse
import configparser
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402

VARIANTS = {
    # warm_band defaults ON since round 4 (this benchmark's own r4 result:
    # mAP identical to exact) — the exact variants must disable it.
    "exact": {"batched": False, "ini": {"warm_band": "0"}},
    "exact_batched": {"batched": True, "ini": {"warm_band": "0"}},
    "warm_refresh10": {"batched": False,
                       "ini": {"warm_band": "8192", "warm_refresh": "10",
                               "warm_refresh_cells": "0"}},
    "warm_batched": {"batched": True,
                     "ini": {"warm_band": "8192", "warm_refresh": "10",
                             "warm_refresh_cells": "0"}},
    "coarse_to_fine": {"batched": False,
                       "ini": {"warm_band": "0", "coarse_cells": "1024"}},
    # composed: warm refresh through the c2f cell pass (2048 cells = 2x
    # margin over the 8192 pool; grid.band_candidates) — the round-4
    # SHIPPING default
    "warm_c2f_refresh": {"batched": False,
                         "ini": {"warm_band": "8192", "warm_refresh": "10",
                                 "warm_refresh_cells": "2048"}},
    # refresh=20 candidate (measured +3% over r10+c2f): gated separately
    # because it doubles the staleness window
    "warm_r20_c2f": {"batched": False,
                     "ini": {"warm_band": "8192", "warm_refresh": "20",
                             "warm_refresh_cells": "2048"}},
    # the EXACT shipping combination: batched driver dispatch + every
    # config default (warm + composed refresh + pallas select) — no
    # overrides at all
    "ship_default": {"batched": True, "ini": {}},
}


def build_cfgp(suite: str, nets: str, labels_out: str, extra: dict,
               css_width: int):
    cfgp = configparser.ConfigParser()
    cfgp.read_dict({
        "input": {
            "kitti_path": suite,
            "css_path": os.path.join(nets, "css_quality.msgpack"),
            "css_width": str(css_width),
            "deepsdf_path": os.path.join(nets, "deepsdf_quality.pt"),
            "label_type": "gt",
            "diff_annos": "easy",
            "grid_density": "40",
            "rendering_area": "32",
        },
        # precision float16 -> bf16 decode: the SHIPPING default
        # (config_refine.ini), so the quality number carries the
        # production numerics, not an fp32 best case.
        "optimization": {"iters": "60", "pose_estimator": "kabsch",
                         "precision": "float16", **extra},
        "visualization": {"viz_type": "none"},
        "losses": {"2d_weight": "0.3", "3d_weight": "0.5"},
        "output": {"labels": labels_out},
    })
    return cfgp


def structured_map(gt_list, est_list):
    """KITTI (2D/BEV/3D + AOS/AOE) and nuScenes mAP as plain floats."""
    from sdflabel_tpu.eval.detection3d import (
        CoordinateFrame, Detection3DEvaluator)
    from sdflabel_tpu.pipelines.evaluate_dump import FILTER_FNS

    out = {}
    for compute_nuscenes in (False, True):
        ev = Detection3DEvaluator(
            FILTER_FNS["kitti"], compute_nuscenes=compute_nuscenes,
            coordinate_frame=CoordinateFrame.CAMERA)
        formatted, result = ev.evaluate_detection_3d(
            gt_list, est_list, ["Car"], difficulties=[0])
        if compute_nuscenes:
            # Box3DAP_Nu[class, diff_pos, dist_thresh]
            nu = np.asarray(result["Box3DAP_Nu"])[0, 0]
            out["nuscenes_3d_ap"] = [round(float(v), 4) for v in nu]
            out["aoe_dist"] = [
                round(float(v), 4)
                for v in np.asarray(result["AoeAP_dist"])[0, 0]]
        else:
            for name, key in (("Box2DAP", "bbox_2d_ap"),
                              ("BevAP", "bev_ap"),
                              ("Box3DAP", "kitti_3d_ap")):
                vals = np.asarray(result[name])[0, 0]
                out[key] = [round(float(v), 4) for v in vals]
            out["aos_iou"] = [
                round(float(v), 4)
                for v in np.asarray(result["AosAP_iou"])[0, 0]]
    return out


def backfill(est):
    if "name" not in est or len(est["name"]) == 0:
        est = dict(est)
        est["name"] = []
        est["location"] = np.zeros((0, 3))
        est["dimensions"] = np.zeros((0, 3))
        est["bbox"] = np.zeros((0, 4))
        est["rotation_y"] = np.zeros((0,))
        est["alpha"] = np.zeros((0,))
        est["score"] = np.zeros((0,))
    return est


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="data/quality_suite")
    ap.add_argument("--nets", default="data/quality_nets")
    ap.add_argument("--out", default="QUALITY_r04.json")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--frames", type=int, default=0,
                    help="limit to the first N suite frames (0 = all)")
    args = ap.parse_args()

    meta_path = os.path.join(args.suite, "suite_meta.json")
    suite_meta = json.load(open(meta_path)) if os.path.exists(meta_path) \
        else {}
    css_width = int(suite_meta.get("css_width", 16))

    from sdflabel_tpu.pipelines import refine_css as pipeline

    results = {"suite": suite_meta, "backend": jax.default_backend(),
               "variants": {}}
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        tmp = tempfile.mkdtemp(prefix=f"quality_{name}_")
        try:
            cfgp = build_cfgp(args.suite, args.nets,
                              os.path.join(tmp, "labels"), spec["ini"],
                              css_width)
            print(f"=== variant {name} (batched={spec['batched']}) ===",
                  flush=True)
            subset = range(args.frames) if args.frames else None
            t0 = time.perf_counter()
            annos, estims = pipeline.refine_css(cfgp,
                                                batched=spec["batched"],
                                                subset_frames=subset)
            wall = time.perf_counter() - t0
            gt_list = list(annos.values())
            est_list = [backfill(e) for e in estims.values()]
            n_est = sum(len(e.get("location", [])) for e in est_list)
            n_gt = sum(len(a.get("location", [])) for a in gt_list)
            row = {"wall_s": round(wall, 1),
                   "frames": len(gt_list), "gt_boxes": n_gt,
                   "est_boxes": n_est,
                   **structured_map(gt_list, est_list)}
            results["variants"][name] = row
            print(json.dumps({name: row}), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
