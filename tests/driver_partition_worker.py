"""Worker process for the two-process driver-partition test.

Invoked by tests/test_driver_partition.py as
    python driver_partition_worker.py <refine.ini> <frame_ids_csv>

Runs the FULL autolabel driver (pipelines.refine_css.refine_css) on a
subset of frames into the shared labels_out from the INI — the
reference's mpirun + per-rank frame subsets + shared-filesystem pattern
(reference pipelines/rotate_iou.py:10-14, refine_css.py:26,68-70). No
collectives are involved, exactly like the reference: partitioning is
by subset_frames, recovery/idempotency is skip-if-output-exists.

The untrained CSS net would never clear RANSAC, so estimate_pose is
pinned to a deterministic pose (same stub as
test_kitti.test_refine_css_sequential_matches_batched) — the point here
is the PROCESS mechanics, not pose quality.
"""

import configparser
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import os  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from sdflabel_tpu.pipelines import refine_css as pipeline  # noqa: E402


def main():
    ini_path, frames_csv = sys.argv[1], sys.argv[2]
    subset = [int(x) for x in frames_csv.split(",") if x != ""]

    pipeline.RefineRuntime.estimate_pose = (
        lambda self, *a, **k: {
            "scale": 4.0,
            "rot": np.eye(3),
            "tra": np.array([0.5, 1.6, 12.0]),
        })

    cfgp = configparser.ConfigParser()
    assert cfgp.read(ini_path)
    annos, estims = pipeline.refine_css(cfgp, subset_frames=subset)
    print(f"WORKER_OK processed={sorted(annos.keys())}", flush=True)


if __name__ == "__main__":
    main()
