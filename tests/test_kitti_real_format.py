"""Parsing-level parity against the ACTUAL KITTI on-disk file format.

The other KITTI tests build synthetic trees with our own writer; this one
pins `data/kitti.py` (reference: datasets/kitti.py:104-186) against
VERBATIM KITTI-formatted text — scientific-notation calib lines exactly as
the public dev kit formats them, label rows with float truncation, -1
occlusion sentinels, '-10' alpha and -1000 locations on DontCare rows —
so a format change in the parser cannot hide behind a matching change in
a test writer. Calib values are the public KITTI object-devkit camera
matrices; label rows are real-format annotation lines.
"""

import numpy as np
import pytest

from sdflabel_tpu.data import kitti as kitti_mod

cv2 = pytest.importorskip("cv2")

# Verbatim KITTI object-calib format (dev-kit fixed-width scientific
# notation; line order P0 P1 P2 P3 R0_rect Tr_velo_to_cam Tr_imu_to_velo).
CALIB_TXT = """\
P0: 7.215377000000e+02 0.000000000000e+00 6.095593000000e+02 0.000000000000e+00 0.000000000000e+00 7.215377000000e+02 1.728540000000e+02 0.000000000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 0.000000000000e+00
P1: 7.215377000000e+02 0.000000000000e+00 6.095593000000e+02 -3.875744000000e+02 0.000000000000e+00 7.215377000000e+02 1.728540000000e+02 0.000000000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 0.000000000000e+00
P2: 7.215377000000e+02 0.000000000000e+00 6.095593000000e+02 4.485728000000e+01 0.000000000000e+00 7.215377000000e+02 1.728540000000e+02 2.163791000000e-01 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 2.745884000000e-03
P3: 7.215377000000e+02 0.000000000000e+00 6.095593000000e+02 -3.395242000000e+02 0.000000000000e+00 7.215377000000e+02 1.728540000000e+02 2.199936000000e+00 0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 2.729905000000e-03
R0_rect: 9.999239000000e-01 9.837760000000e-03 -7.445048000000e-03 -9.869795000000e-03 9.999421000000e-01 -4.278459000000e-03 7.402527000000e-03 4.351614000000e-03 9.999631000000e-01
Tr_velo_to_cam: 7.533745000000e-03 -9.999714000000e-01 -6.166020000000e-04 -4.069766000000e-03 1.480249000000e-02 7.280733000000e-04 -9.998902000000e-01 -7.631618000000e-02 9.998621000000e-01 7.523790000000e-03 1.480755000000e-02 -2.717806000000e-01
Tr_imu_to_velo: 9.999976000000e-01 7.553071000000e-04 -2.035826000000e-03 -8.086759000000e-01 -7.854027000000e-04 9.998898000000e-01 -1.482298000000e-02 3.195559000000e-01 2.024406000000e-03 1.482454000000e-02 9.998881000000e-01 -7.997231000000e-01
"""

# Real-format label rows: type trunc occ alpha bbox(l t r b) dims(h w l)
# loc(x y z) rotation_y — floats with two decimals, DontCare rows carrying
# the -1/-10/-1000 sentinels exactly as KITTI writes them.
LABEL_TXT = """\
Car 0.88 3 -0.69 0.00 192.37 402.31 374.00 1.60 1.57 3.23 -2.70 1.74 3.68 -1.29
Car 0.00 1 2.04 334.85 178.94 624.50 372.04 1.57 1.50 3.68 -1.17 1.65 7.86 1.90
Car 0.34 3 -1.84 937.29 197.39 1241.00 374.00 1.39 1.44 3.08 3.81 1.64 6.15 -1.31
Car 0.00 1 -1.33 597.59 176.18 720.90 261.14 1.47 1.60 3.66 1.07 1.55 14.44 -1.25
Car 0.00 0 1.74 741.18 168.83 792.25 208.43 1.70 1.63 4.08 7.24 1.55 33.20 1.95
Car 0.00 0 -1.65 884.52 178.31 956.41 240.18 1.59 1.59 2.47 8.48 1.75 19.96 -1.25
DontCare -1 -1 -10 800.38 163.67 825.45 184.07 -1 -1 -1 -1000 -1000 -1000 -10
DontCare -1 -1 -10 859.58 172.34 886.26 194.03 -1 -1 -1 -1000 -1000 -1000 -10
"""


@pytest.fixture(scope="module")
def real_format_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_real")
    training = root / "training"
    for sub in ("image_2", "label_2", "calib", "velodyne"):
        (training / sub).mkdir(parents=True)
    (root / "mv3d_kitti_split").mkdir()
    (root / "mv3d_kitti_split" / "trainval.txt").write_text("000008\n")

    (training / "calib" / "000008.txt").write_text(CALIB_TXT)
    (training / "label_2" / "000008.txt").write_text(LABEL_TXT)

    # KITTI camera-2 resolution; constant image keeps the PNG tiny
    img = np.full((375, 1242, 3), 96, np.uint8)
    cv2.imwrite(str(training / "image_2" / "000008.png"), img)

    # velodyne scan: (x, y, z, intensity) float32 rows, forward +x
    rng = np.random.RandomState(0)
    n = 4000
    velo = np.zeros((n, 4), np.float32)
    velo[:, 0] = rng.uniform(4, 35, n)  # forward
    velo[:, 1] = rng.uniform(-10, 10, n)  # left
    velo[:, 2] = rng.uniform(-1.5, 1.2, n)  # up
    velo[:, 3] = rng.rand(n)
    velo.tofile(training / "velodyne" / "000008.bin")
    return str(root)


def test_calib_parsing_real_format(real_format_root):
    ds = kitti_mod.KITTI3D(real_format_root, compute_frame=False)
    sample = ds[0]

    # P2 decomposition: the dev-kit camera intrinsics come back exactly
    cam = sample["orig_cam"]
    np.testing.assert_allclose(cam[0, 0], 7.215377e02, rtol=1e-9)
    np.testing.assert_allclose(cam[1, 1], 7.215377e02, rtol=1e-9)
    np.testing.assert_allclose(cam[0, 2], 6.095593e02, rtol=1e-9)
    np.testing.assert_allclose(cam[1, 2], 1.728540e02, rtol=1e-9)

    # world_to_cam from the decomposed projection matrix: rotation is
    # identity for P2 (kitti.py:151-156); translation reproduces
    # K [R|t] = P2 when recomposed
    w2c = sample["world_to_cam"]
    np.testing.assert_allclose(w2c[:3, :3], np.eye(3), atol=1e-9)
    p2 = np.array([float(v) for v in
                   CALIB_TXT.splitlines()[2].split()[1:]]).reshape(3, 4)
    recomposed = cam @ w2c[:3, :4]
    np.testing.assert_allclose(recomposed, p2, atol=1e-6)

    # Tr_velo_to_cam applied to the raw scan: verbatim-matrix transform
    raw = np.fromfile(
        f"{real_format_root}/training/velodyne/000008.bin", np.float32
    ).reshape(-1, 4)[:, :3]
    tr = np.array([float(v) for v in
                   CALIB_TXT.splitlines()[5].split()[1:]]).reshape(3, 4)
    expect = raw @ tr[:3, :3].T + tr[:3, 3]
    np.testing.assert_allclose(sample["lidar"], expect, atol=1e-5)
    # forward velodyne x becomes camera +z
    assert (sample["lidar"][:, 2] > 0).all()


def test_label_parsing_real_format(real_format_root):
    ds = kitti_mod.KITTI3D(real_format_root, compute_frame=False)
    sample = ds[0]
    gt = sample["gt"]
    assert len(gt) == 8

    car0 = gt[0]
    assert car0["name"] == "Car"
    assert car0["truncated"] == 0.88
    assert car0["occluded"] == 3
    assert car0["alpha"] == -0.69
    # int(float(...)) truncation of the float bbox (kitti.py:147)
    assert car0["bbox"] == [0, 192, 402, 374]
    assert car0["dimensions"] == [1.60, 1.57, 3.23]
    assert car0["location"] == [-2.70, 1.74, 3.68]
    assert car0["rotation_y"] == -1.29
    assert not car0["ignore"]

    # DontCare sentinels: -1 occlusion parses as int, -10 alpha as float,
    # -1000 location triggers the ignore rule (kitti.py:161)
    dc = gt[6]
    assert dc["name"] == "DontCare"
    assert dc["occluded"] == -1
    assert dc["truncated"] == -1.0
    assert dc["alpha"] == -10.0
    assert dc["location"] == [-1000.0, -1000.0, -1000.0]
    assert dc["ignore"]

    # none of the real rows trip the subsumption heuristics here
    assert not any(a["ignore"] for a in gt[:6])


def test_difficulty_buckets_real_format(real_format_root):
    ds = kitti_mod.KITTI3D(real_format_root, compute_frame=False)
    annos = ds[0]["annos"]

    def bboxes(bucket):
        return [a["bbox"] for a in annos[bucket]]

    # gt[4]: float height 208.43-168.83 = 39.6 < 40, but the parser's int
    # truncation makes it 208-168 = 40 -> EASY. This pins the reference's
    # int-bbox-then-threshold order (kitti.py:147 before refinement.py:15).
    assert [741, 168, 792, 208] in bboxes("easy")
    assert [884, 178, 956, 240] in bboxes("easy")  # occ 0, trunc 0, h 62
    # occ 1 -> moderate
    assert [334, 178, 624, 372] in bboxes("medium")
    assert [597, 176, 720, 261] in bboxes("medium")
    # trunc 0.88 / occ 3 fall through to the hard catch-all
    assert [0, 192, 402, 374] in bboxes("hard")
    assert [937, 197, 1241, 374] in bboxes("hard")

    # driver anno selection: easy-only, sorted by depth (refinement.py:565)
    sel = kitti_mod.get_annos("easy", ds[0])
    assert [a["location"][2] for a in sel] == [19.96, 33.20]
