"""Autolabel-QUALITY benchmark: full-driver mAP + sub-AP diagnostics.

Runs the COMPLETE `--refine` driver (CSS forward -> surface decode ->
RANSAC init -> 60-iter refinement -> KITTI label -> in-process KITTI +
nuScenes evaluation; reference pipelines/refine_css.py:26-263) on a
synthetic multi-frame KITTI-format suite (scripts/make_quality_suite.py)
under each throughput variant, and records per-variant mAP + per-object
error distributions + wall time in one JSON artifact (QUALITY_r{N}.json).

This is the gate the perf variants ship through: a variant whose measured
quality matches the exact path within noise is safe to make the shipping
default; one that degrades is recorded as rejected, with numbers.

Round-5 changes (VERDICT r4 #1/#2):
  * suite v2 (--suite data/quality_suite_v2): occlusion / truncation /
    distance / sparse-LIDAR conditions with real KITTI GT flags;
    difficulties 0-2 all evaluated (reference detection_3d.py:871-985).
  * sub-AP diagnostics: per-object 3D IoU / translation / |dyaw| (honest
    RADIANS, wrapped to [0, pi]) distributions, pi-flip counts, per-
    condition miss counts — resolution below a saturating AP. NOTE the
    evaluator's `aoe_dist` output is AP-style x100-scaled (get_mAP
    multiplies by 100), NOT radians.
  * degraded-CSS variants (css=weak: the undertrained suite net) and
    [stress] init-perturbation variants making the warm-band STALENESS
    axis adversarial (long trajectories -> stale candidate pools).

Metric blindness (measured r4, why diagnostics exist): a pi yaw flip is
INVISIBLE to every AP (BEV rectangles are pi-symmetric) and to AOS
(unless alpha flips too); only AOE and the |dyaw| distribution see it.

Usage: python scripts/run_quality_benchmark.py --suite data/quality_suite_v2
         [--out QUALITY.json] [--variants exact,warm_r10,...]
         [--difficulties 0,1,2]
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

# Stress setting: ~15 deg yaw kick + 0.4 m translation + 8% scale + 0.25
# latent sigma forces the refinement to travel far from init — the
# adversarial regime for a stale warm candidate pool. Calibrated on a
# 6-frame sanity run: 25 deg/0.6 m left refinement unrecoverable in 60
# iters (3D AP ~0 for every variant — no separation possible); this
# setting keeps the outcome in the sensitive mid-range.
STRESS_INI = {"init_yaw_deg": "15", "init_trans_m": "0.4",
              "init_scale_frac": "0.08", "init_latent_sigma": "0.25"}

W10 = {"warm_band": "8192", "warm_refresh": "10",
       "warm_refresh_cells": "2048"}
W20 = {"warm_band": "8192", "warm_refresh": "20",
       "warm_refresh_cells": "2048"}
EXACT = {"warm_band": "0"}

# NOTE (r5 outcome): warm_r10_c2f / warm_r20_c2f measured -3.0 3D AP on
# distant objects (QUALITY_r05.json), so warm_refresh_cells was reverted
# to default-0 — "ship_default" ({} = stock config) now measures the
# plain-warm path.
VARIANTS = {
    # core semantics axis (all batched — r4 measured batched==sequential
    # mAP-identical; exact_seq kept as the cross-check row)
    "exact": {"batched": True, "ini": EXACT},
    "exact_seq": {"batched": False, "ini": EXACT},
    "warm_r10": {"batched": True,
                 "ini": {**W10, "warm_refresh_cells": "0"}},
    "warm_r10_c2f": {"batched": True, "ini": W10},
    "warm_r20_c2f": {"batched": True, "ini": W20},
    # budget-margin composed refresh (r5 corner-scoring follow-up): the
    # 8-corner score fixed the easy-tier regression at cells=2048;
    # 4096 doubles the cell budget to resolve whether the residual
    # moderate/hard wobble is budget-driven or one-object noise
    "warm_r10_c2f4096": {
        "batched": True,
        "ini": {**W10, "warm_refresh_cells": "4096"}},
    "coarse_to_fine": {"batched": True,
                       "ini": {"warm_band": "0", "coarse_cells": "1024"}},
    # the EXACT shipping combination: every config default, no overrides
    "ship_default": {"batched": True, "ini": {}},
    # degraded-CSS axis: the undertrained suite net (worse init + worse
    # NOCS target) — does warm staleness interact with a bad start?
    "exact_weak": {"batched": True, "ini": EXACT, "css": "weak"},
    "warm_r10_weak": {"batched": True, "ini": W10, "css": "weak"},
    "warm_r20_weak": {"batched": True, "ini": W20, "css": "weak"},
    # stress axis: perturbed init, long trajectories
    "exact_stress": {"batched": True, "ini": EXACT, "stress": True},
    "warm_r10_stress": {"batched": True, "ini": W10, "stress": True},
    "warm_r20_stress": {"batched": True, "ini": W20, "stress": True},
}

DIFF_NAMES = {0: "easy", 1: "moderate", 2: "hard"}


def build_cfgp(suite: str, nets: str, labels_out: str, extra: dict,
               css_width: int, css_file: str, diff_annos: str,
               stress: bool):
    cfgp = configparser.ConfigParser()
    cfgp.read_dict({
        "input": {
            "kitti_path": suite,
            "css_path": os.path.join(nets, css_file),
            "css_width": str(css_width),
            "deepsdf_path": os.path.join(nets, "deepsdf_quality.pt"),
            "label_type": "gt",
            "diff_annos": diff_annos,
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
        **({"stress": STRESS_INI} if stress else {}),
    })
    return cfgp


def structured_map(gt_list, est_list, difficulties):
    """KITTI (2D/BEV/3D + AOS/AOE) and nuScenes mAP per difficulty.

    aoe_dist is AP-style x100-scaled (the evaluator's get_mAP multiplies
    by 100) — do NOT read it as radians (round-4 artifact mislabeled it;
    see per_object_diagnostics for honest-radian yaw errors)."""
    from sdflabel_tpu.eval.detection3d import (
        CoordinateFrame, Detection3DEvaluator)
    from sdflabel_tpu.pipelines.evaluate_dump import FILTER_FNS

    def per_diff(arr):
        a = np.asarray(arr)
        return {DIFF_NAMES[d]: [round(float(v), 4) for v in a[0, i]]
                for i, d in enumerate(difficulties)}

    out = {}
    for compute_nuscenes in (False, True):
        ev = Detection3DEvaluator(
            FILTER_FNS["kitti"], compute_nuscenes=compute_nuscenes,
            coordinate_frame=CoordinateFrame.CAMERA)
        formatted, result = ev.evaluate_detection_3d(
            gt_list, est_list, ["Car"], difficulties=list(difficulties))
        if compute_nuscenes:
            out["nuscenes_3d_ap"] = per_diff(result["Box3DAP_Nu"])
            out["aoe_dist_x100"] = per_diff(result["AoeAP_dist"])
        else:
            for name, key in (("Box2DAP", "bbox_2d_ap"),
                              ("BevAP", "bev_ap"),
                              ("Box3DAP", "kitti_3d_ap")):
                out[key] = per_diff(result[name])
            out["aos_iou"] = per_diff(result["AosAP_iou"])
    return out


def _iou3d_pair(gt_loc, gt_dim, gt_ry, est_loc, est_dim, est_ry):
    """Honest 3D IoU for one pair: camera frame, dims [h, w, l] (the
    convention every anno dict in this repo uses)."""
    from sdflabel_tpu.ops import rotated_iou as riou

    a = np.array([[gt_loc[0], gt_loc[2], gt_dim[1], gt_dim[2], gt_ry]],
                 np.float32)
    b = np.array([[est_loc[0], est_loc[2], est_dim[1], est_dim[2],
                   est_ry]], np.float32)
    rinc = float(riou.rotate_iou(a, b, criterion=2)[0, 0])
    top = min(gt_loc[1], est_loc[1])
    bot = max(gt_loc[1] - gt_dim[0], est_loc[1] - est_dim[0])
    iw = max(top - bot, 0.0)
    inter = iw * rinc
    va = gt_dim[0] * gt_dim[1] * gt_dim[2]
    vb = est_dim[0] * est_dim[1] * est_dim[2]
    union = va + vb - inter
    return inter / union if union > 0 else 0.0


def _pctl(vals, q):
    return round(float(np.percentile(vals, q)), 4) if len(vals) else None


def _agg(pairs, n_gt, n_est):
    """Aggregate per-object rows into distribution stats."""
    trans = [p["trans_err"] for p in pairs]
    dyaw = [p["dyaw_rad"] for p in pairs]
    iou = [p["iou3d"] for p in pairs]
    return {
        "gt": n_gt, "matched": len(pairs), "est": n_est,
        "missed": n_gt - len(pairs), "spurious": n_est - len(pairs),
        "flips": int(sum(p["dyaw_rad"] > np.pi / 2 for p in pairs)),
        "trans_err_m": {"mean": _pctl(trans, 50) and round(
            float(np.mean(trans)), 4), "p50": _pctl(trans, 50),
            "p95": _pctl(trans, 95)},
        "dyaw_rad": {"mean": _pctl(dyaw, 50) and round(
            float(np.mean(dyaw)), 4), "p50": _pctl(dyaw, 50),
            "p95": _pctl(dyaw, 95)},
        "iou3d": {"mean": _pctl(iou, 50) and round(
            float(np.mean(iou)), 4), "p50": _pctl(iou, 50),
            "p05": _pctl(iou, 5),
            # borderline-object resolution: KITTI Car 3D AP counts a
            # match only at IoU >= 0.7, so ONE object crossing that
            # line moves AP by points on a small suite — these counts
            # separate a systematic shift from a single-object flip
            "n_ge_070": int(sum(v >= 0.70 for v in iou)),
            "n_065_070": int(sum(0.65 <= v < 0.70 for v in iou))},
    }


def per_object_diagnostics(annos, estims, conditions):
    """Per-object error distributions below AP (VERDICT r4 #2).

    Greedy center-distance matching (<4 m) per frame; |dyaw| in honest
    radians wrapped to [0, pi]; flip = |dyaw| > pi/2 (invisible to AP/
    AOS — the round-4 injection probe); honest 3D IoU per pair."""
    all_pairs = []
    by_cond = {}
    cond_counts = {}
    for frame_idx, gt in annos.items():
        est = estims.get(frame_idx, {})
        cond = conditions.get(f"{int(frame_idx):06d}", "all") \
            if conditions else "all"
        g_loc = np.asarray(gt.get("location", np.zeros((0, 3))),
                           np.float64).reshape(-1, 3)
        e_loc = np.asarray(est.get("location", np.zeros((0, 3))),
                           np.float64).reshape(-1, 3)
        cc = cond_counts.setdefault(cond, {"gt": 0, "est": 0})
        cc["gt"] += len(g_loc)
        cc["est"] += len(e_loc)
        if not len(g_loc) or not len(e_loc):
            continue
        d = np.linalg.norm(g_loc[:, None] - e_loc[None, :], axis=-1)
        pairs = []
        used_g, used_e = set(), set()
        for _ in range(min(len(g_loc), len(e_loc))):
            gi, ei = np.unravel_index(np.argmin(d), d.shape)
            if d[gi, ei] > 4.0:
                break
            used_g.add(gi)
            used_e.add(ei)
            g_dim = np.asarray(gt["dimensions"][gi], np.float64)
            e_dim = np.asarray(est["dimensions"][ei], np.float64)
            g_ry = float(np.asarray(gt["rotation_y"][gi]))
            e_ry = float(np.asarray(est["rotation_y"][ei]))
            dyaw = abs((e_ry - g_ry + np.pi) % (2 * np.pi) - np.pi)
            pairs.append({
                "trans_err": float(d[gi, ei]),
                "dyaw_rad": dyaw,
                "iou3d": _iou3d_pair(g_loc[gi], g_dim, g_ry,
                                     e_loc[ei], e_dim, e_ry),
            })
            d[gi, :] = np.inf
            d[:, ei] = np.inf
        all_pairs.extend(pairs)
        by_cond.setdefault(cond, []).extend(pairs)

    out = {"all": _agg(all_pairs,
                       sum(c["gt"] for c in cond_counts.values()),
                       sum(c["est"] for c in cond_counts.values()))}
    for cond, pairs in sorted(by_cond.items()):
        out[cond] = _agg(pairs, cond_counts[cond]["gt"],
                         cond_counts[cond]["est"])
    for cond, cc in cond_counts.items():
        if cond not in out:  # conditions where nothing matched at all
            out[cond] = _agg([], cc["gt"], cc["est"])
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
    ap.add_argument("--suite", default="data/quality_suite_v2")
    ap.add_argument("--nets", default="data/quality_nets")
    ap.add_argument("--out", default="QUALITY_r05.json")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--difficulties", default="0,1,2")
    ap.add_argument("--diff-annos", default="hard",
                    help="which GT tiers the driver ATTEMPTS (hard = "
                         "easy+moderate+hard, matching difficulties 0-2)")
    ap.add_argument("--frames", type=int, default=0,
                    help="limit to the first N suite frames (0 = all)")
    args = ap.parse_args()

    meta_path = os.path.join(args.suite, "suite_meta.json")
    suite_meta = json.load(open(meta_path)) if os.path.exists(meta_path) \
        else {}
    css_width = int(suite_meta.get("css_width", 16))
    conditions = suite_meta.get("conditions", {})
    suffix = "_v2" if suite_meta.get("profile") == "v2" else ""
    difficulties = [int(d) for d in args.difficulties.split(",")]

    from sdflabel_tpu.pipelines import refine_css as pipeline

    results = {"suite": {k: v for k, v in suite_meta.items()
                         if k != "conditions"},
               "backend": jax.default_backend(),
               "difficulties": difficulties,
               "stress_ini": STRESS_INI,
               "variants": {}}
    for name in args.variants.split(","):
        spec = VARIANTS[name]
        css_file = f"css_quality{suffix}.msgpack"
        if spec.get("css") == "weak":
            css_file = f"css_quality{suffix}_weak.msgpack"
            if not os.path.exists(os.path.join(args.nets, css_file)):
                print(f"=== variant {name}: weak CSS missing, skipped ===",
                      flush=True)
                results["variants"][name] = {"skipped": "no weak css"}
                continue
        tmp = tempfile.mkdtemp(prefix=f"quality_{name}_")
        try:
            cfgp = build_cfgp(args.suite, args.nets,
                              os.path.join(tmp, "labels"), spec["ini"],
                              css_width, css_file, args.diff_annos,
                              spec.get("stress", False))
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
                   **structured_map(gt_list, est_list, difficulties),
                   "objects": per_object_diagnostics(annos, estims,
                                                     conditions)}
            results["variants"][name] = row
            print(json.dumps({name: row}), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        with open(args.out, "w") as f:  # checkpoint after every variant
            json.dump(results, f, indent=1)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
