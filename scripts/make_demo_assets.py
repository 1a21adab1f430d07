"""Generate the bundled demo assets (data/optimization/*, configs/config_demo.ini).

The reference ships a real KITTI frame (data/optimization/kitti_sample.pt)
but requires separately-downloaded trained CSS/DeepSDF weights, so its demo
cannot run from a clean checkout. Ours can: this script synthesizes a
self-consistent scene AND small trained networks for it —

  1. a tiny DeepSDF decoder fitted to a car-proportioned rounded-box SDF
     (reference format .pt + .json, importable by models.deepsdf);
  2. the scene: the decoded surface rendered at a known GT pose gives the
     image appearance, the LIDAR cloud (visible surface points + ground +
     clutter), the depth map, and the KITTI GT label (computed with the
     SAME code the pipeline uses — engine.labels.get_kitti_label — so a
     perfect refinement reproduces it exactly);
  3. a tiny CSSNet (width=8) overfitted on the demo crop to predict the GT
     NOCS/mask/latent;
  4. MaskRCNN-style demo labels (jittered bbox + true instance mask) for
     the label_type=maskrcnn demo branch (refine_css_demo.py:62-77).

Run from the repo root:  python scripts/make_demo_assets.py
Everything it writes is committed; `python -m sdflabel_tpu.main
configs/config_demo.ini --demo` then runs with no external data.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from sdflabel_tpu.data import kitti as kitti_mod
from sdflabel_tpu.engine import labels as labels_mod
from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.models import css as css_mod
from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import grid as grid_ops
from sdflabel_tpu.renderer import rasterer as rast_mod

OUT = "data/optimization"
SEED = 0

# ---- scene constants -------------------------------------------------------
YAW_GT = 0.4
SCALE_GT = 2.0
TRANS_CAM = np.array([0.5, 0.9, 10.0])  # camera frame, meters
HALF = np.array([0.40, 0.375, 0.975])  # model-frame half extents (w,h,l)/2/scale
IMG_H, IMG_W = 160, 416
FOCAL, CX, CY = 320.0, 208.0, 80.0
LATENT_GT = np.array([1.0, 0.0, 0.0], np.float32)


def box_sdf(pts, half=HALF, radius=0.06):
    """Rounded-box SDF (exact, numpy/jnp compatible)."""
    q = jnp.abs(pts) - (half - radius)
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside - radius


def fit_deepsdf():
    cfg = deepsdf.DeepSDFConfig(latent_size=3, dims=(64, 64, 64))
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(SEED))
    fn = lambda p, lat, x: deepsdf.sdf_fn(cfg, p)(lat, x)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    lat = jnp.asarray(LATENT_GT)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2 = jax.random.split(key)
        # mix of uniform points and near-surface points for a crisp band
        pu = jax.random.uniform(k1, (4096, 3), minval=-1.05, maxval=1.05)
        ps = pu * (HALF / jnp.max(HALF))  # densify near the box
        pts = jnp.concatenate([pu, ps + 0.05 * jax.random.normal(k2, ps.shape)])
        target = jnp.clip(box_sdf(pts), -0.1, 0.1)  # DeepSDF clamped-L1 target

        def loss_fn(p):
            pred = jnp.clip(fn(p, lat, pts), -0.1, 0.1)
            return jnp.mean(jnp.abs(pred - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(SEED + 1)
    for i in range(2500):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % 500 == 0:
            print(f"  deepsdf fit step {i}: L1 {float(loss):.5f}")
    print(f"  deepsdf fit final: L1 {float(loss):.5f}")
    return cfg, params


def export_deepsdf_torch(cfg, params, path_base):
    """Write the reference checkpoint pair (workspace.py conventions)."""
    import torch

    state = {}
    for ln in range(cfg.num_layers - 1):
        state[f"lin{ln}.weight"] = torch.from_numpy(
            np.asarray(params[f"lin{ln}"]["w"], np.float32).T.copy())
        state[f"lin{ln}.bias"] = torch.from_numpy(
            np.asarray(params[f"lin{ln}"]["b"], np.float32).copy())
    for i, li in enumerate((0, 2, 4)):
        state[f"scale_net.{li}.weight"] = torch.from_numpy(
            np.asarray(params["scale_net"][i]["w"], np.float32).T.copy())
        state[f"scale_net.{li}.bias"] = torch.from_numpy(
            np.asarray(params["scale_net"][i]["b"], np.float32).copy())
    torch.save({"epoch": 1, "model_state_dict": state}, path_base + ".pt")
    with open(path_base + ".json", "w") as f:
        json.dump({"CodeLength": cfg.latent_size,
                   "NetworkArch": "deep_sdf_decoder_scale",
                   "NetworkSpecs": {"dims": list(cfg.dims)}}, f)


def render_gt(decoder):
    """Render the fitted surface at the GT pose; returns everything the
    scene needs (crop window, NOCS image, mask, camera-frame points)."""
    grid_pts = grid_ops.generate_point_grid(40)
    surf, _ = grid_ops.surface_from_decoder(
        decoder, jnp.asarray(LATENT_GT), grid_pts, capacity=4096)

    pose = refine_mod.build_render_pose(
        jnp.asarray([YAW_GT], jnp.float32),
        jnp.asarray(TRANS_CAM / SCALE_GT, jnp.float32))

    # crop window from projected surface extents (+pad)
    rot = np.asarray(pose[:3, :3])
    t = np.asarray(pose[:3, 3])
    cam_pts = (rot @ np.asarray(surf.points)[np.asarray(surf.mask)].T).T + t
    u = cam_pts[:, 0] / cam_pts[:, 2] * FOCAL + CX
    v = cam_pts[:, 1] / cam_pts[:, 2] * FOCAL + CY
    pad = 6
    l = max(int(u.min()) - pad, 0)
    r = min(int(u.max()) + pad, IMG_W - 1)
    t_ = max(int(v.min()) - pad, 0)
    b = min(int(v.max()) + pad, IMG_H - 1)
    ch, cw = b - t_, r - l

    K_crop = jnp.asarray(
        [[FOCAL, 0, CX - l], [0, FOCAL, CY - t_], [0, 0, 1]], jnp.float32)
    rendering, points = rast_mod.render(
        K_crop, (cw, ch), surf.points, surf.normals, surf.normals, pose,
        point_mask=surf.mask, rot="dcm", primitives="disc", output_nocs=True)
    nocs = np.asarray(rendering.color)  # (3, ch, cw) in [0,1]
    mask = np.asarray(rendering.mask)[0] > 0.5  # (ch, cw)
    vis_cam = (np.asarray(points.xyz)[np.asarray(points.front_mask)]
               * SCALE_GT)  # camera-frame visible surface points
    return (l, t_, r, b), nocs, mask, vis_cam, surf


def build_sample(crop_box, nocs, mask, vis_cam):
    rng = np.random.RandomState(SEED)
    l, t_, r, b = crop_box

    # image: gray noise background, NOCS-as-texture car (BGR float in [0,1],
    # matching data.kitti's cv2-loaded convention)
    image = rng.uniform(0.25, 0.45, (IMG_H, IMG_W, 3)).astype(np.float32)
    rgb = np.transpose(nocs, (1, 2, 0))
    image[t_:b, l:r][mask] = rgb[..., ::-1][mask]  # store as BGR

    # lidar: visible car surface + ground plane + clutter (camera frame)
    n_vis = len(vis_cam)
    keep = rng.permutation(n_vis)[: min(n_vis, 4000)]
    car_pts = vis_cam[keep] + rng.randn(len(keep), 3) * 0.008
    y_ground = TRANS_CAM[1] + HALF[1] * SCALE_GT
    ground = np.stack([
        rng.uniform(-8, 8, 6000),
        np.full(6000, y_ground) + rng.randn(6000) * 0.01,
        rng.uniform(4.0, 22.0, 6000),
    ], 1)
    clutter = np.stack([
        rng.uniform(-8, 8, 1500),
        rng.uniform(-1.0, y_ground, 1500),
        rng.uniform(16.0, 24.0, 1500),
    ], 1)
    lidar = np.concatenate([car_pts, ground, clutter]).astype(np.float32)

    K = np.array([[FOCAL, 0, CX], [0, FOCAL, CY], [0, 0, 1]])
    sample = {
        "image": image,
        "orig_cam": K,
        "world_to_cam": np.eye(4),
        "lidar": lidar,
    }
    depth, _pcd = kitti_mod.get_kitti_frame(sample)
    sample["depth"] = depth.astype(np.float32)
    return sample


def gt_label(decoder, crop_box, sample):
    """GT anno via the pipeline's own label math -> exactly reachable."""
    grid_pts = grid_ops.generate_point_grid(40)
    label, _scaled, _cam_t = labels_mod.get_kitti_label(
        decoder, grid_pts, LATENT_GT,
        np.array([SCALE_GT]), TRANS_CAM / SCALE_GT, np.array([YAW_GT]),
        sample["world_to_cam"], np.asarray(crop_box), capacity=4096)
    anno = {
        "name": "Car",
        "bbox": [int(v) for v in crop_box],
        "location": [float(v) for v in label["location"]],
        "dimensions": [float(v) for v in label["dimensions"]],
        "rotation_y": float(label["rotation_y"]),
        "alpha": float(label["alpha"]),
        "score": 1,
        "truncated": 0.0,
        "occluded": 0,
        "ignore": False,
    }
    return anno


def train_css(sample, anno, nocs, mask, width=8, steps=800, batch=4,
              jitter=3):
    """Overfit the tiny CSSNet on the demo crop (u/v/w/mask CE + latent).

    Augmented with the exact nuisances the demo pipeline introduces:
    random bbox jitter (the maskrcnn demo boxes are jittered by up to
    +-2 px) and instance-mask multiplication (prepare_crop zeroes the
    background when label_type == 'maskrcnn') — so BOTH demo branches see
    in-distribution inputs."""
    from sdflabel_tpu.pipelines.refine_css import transform_bgr_crop

    l, t_, r, b = anno["bbox"]
    # full-frame NOCS / mask so jittered windows can be cropped
    full_nocs = np.zeros((3, IMG_H, IMG_W), np.float32)
    full_nocs[:, t_:b, l:r] = nocs
    full_mask = np.zeros((IMG_H, IMG_W), bool)
    full_mask[t_:b, l:r] = mask

    rng = np.random.RandomState(SEED + 3)

    def sample_crop():
        jl = np.clip(l + rng.randint(-jitter, jitter + 1), 0, IMG_W - 2)
        jt = np.clip(t_ + rng.randint(-jitter, jitter + 1), 0, IMG_H - 2)
        jr = np.clip(r + rng.randint(-jitter, jitter + 1), jl + 2, IMG_W - 1)
        jb = np.clip(b + rng.randint(-jitter, jitter + 1), jt + 2, IMG_H - 1)
        crop_bgr = sample["image"][jt:jb, jl:jr].copy()
        m = full_mask[jt:jb, jl:jr]
        if rng.rand() < 0.5:  # maskrcnn branch: background zeroed
            crop_bgr = crop_bgr * m[..., None]
        crop_rgb, _ = transform_bgr_crop(crop_bgr)  # (3,128,128) normalized
        ch, cw = jb - jt, jr - jl
        ys = (np.arange(128) * ch // 128).clip(max=ch - 1)
        xs = (np.arange(128) * cw // 128).clip(max=cw - 1)
        nocs128 = full_nocs[:, jt + ys[:, None], jl + xs[None, :]]
        mask128 = full_mask[jt + ys[:, None], jl + xs[None, :]]
        bins = np.clip(np.round(nocs128 * 255), 0, 255).astype(np.int32)
        bins = bins * mask128[None].astype(np.int32)  # background -> bin 0
        return crop_rgb, bins, mask128.astype(np.int32)

    model = css_mod.CSSNet(use_running_average=False, width=width)
    variables = model.init(jax.random.PRNGKey(SEED),
                           jnp.zeros((batch, 3, 128, 128)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    tlat = jnp.asarray(np.tile(LATENT_GT, (batch, 1)))

    @jax.jit
    def step(params, batch_stats, opt_state, x, tb, tm):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                mutable=["batch_stats"])
            nll = 0.0
            for i, kk in enumerate(("u", "v", "w")):
                logp = out[kk]  # (B,256,128,128) log-softmax
                nll += -jnp.mean(
                    jnp.take_along_axis(logp, tb[:, i][:, None], axis=1))
            mlogp = jax.nn.log_softmax(out["mask"], axis=1)
            nll += -jnp.mean(
                jnp.take_along_axis(mlogp, tm[:, None], axis=1))
            nll += 10.0 * jnp.mean(jnp.square(out["latent"] - tlat))
            return nll, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    for i in range(steps):
        xs, tbs, tms = zip(*(sample_crop() for _ in range(batch)))
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(tbs)),
            jnp.asarray(np.stack(tms)))
        if i % 100 == 0:
            print(f"  css overfit step {i}: loss {float(loss):.4f}")
    print(f"  css overfit final: loss {float(loss):.4f}")
    return {"params": params, "batch_stats": batch_stats}


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs("configs", exist_ok=True)

    print("fitting tiny DeepSDF to the car box SDF ...")
    dcfg, dparams = fit_deepsdf()
    export_deepsdf_torch(dcfg, dparams, os.path.join(OUT, "deepsdf_demo"))
    decoder = deepsdf.sdf_fn(dcfg, dparams)

    print("rendering the GT scene ...")
    crop_box, nocs, mask, vis_cam, _surf = render_gt(decoder)
    sample = build_sample(crop_box, nocs, mask, vis_cam)
    anno = gt_label(decoder, crop_box, sample)
    print("  GT:", {k: anno[k] for k in
                    ("bbox", "location", "dimensions", "rotation_y")})

    print("overfitting tiny CSS on the demo crop ...")
    css_vars = train_css(sample, anno, nocs, mask)
    from sdflabel_tpu.pipelines.train_css import save_checkpoint

    save_checkpoint(os.path.join(OUT, "css_demo.msgpack"), css_vars)

    # sample npz (+ JSON-encoded annos; loaded by pipelines.refine_css.
    # load_demo_sample)
    annos_json = json.dumps({
        "annos": {"easy": [anno], "medium": [], "hard": []},
        "gt": [anno],
    })
    np.savez_compressed(
        os.path.join(OUT, "kitti_sample.npz"),
        image=sample["image"], depth=sample["depth"],
        orig_cam=sample["orig_cam"], world_to_cam=sample["world_to_cam"],
        lidar=sample["lidar"], annos_json=np.asarray(annos_json))

    # maskrcnn-style labels: jittered bbox + true instance mask for that box
    rng = np.random.RandomState(SEED + 7)
    l, t_, r, b = anno["bbox"]
    jl = max(l + int(rng.randint(-2, 3)), 0)
    jt = max(t_ + int(rng.randint(-2, 3)), 0)
    jr = min(r + int(rng.randint(-2, 3)), IMG_W - 1)
    jb = min(b + int(rng.randint(-2, 3)), IMG_H - 1)
    full_mask = np.zeros((IMG_H, IMG_W), np.float32)
    full_mask[t_:b, l:r] = mask
    np.savez_compressed(
        os.path.join(OUT, "maskrcnn.npz"),
        bboxes=np.asarray([[jl, jt, jr, jb]], np.float32),
        mask_0=full_mask[jt:jb, jl:jr])

    with open("configs/config_demo.ini", "w") as f:
        f.write("""[input]
kitti_path = data/db/kitti/
css_path = data/optimization/css_demo.msgpack
css_width = 8
deepsdf_path = data/optimization/deepsdf_demo.pt
label_type = gt
diff_annos = easy
grid_density = 40
rendering_area = 32
[optimization]
iters = 60
pose_estimator = kabsch
precision = float32
[visualization]
viz_type = 3d
[losses]
2d_weight = 0.3
3d_weight = 0.5
[output]
labels = demo_out
""")
    print("assets written to", OUT, "and configs/config_demo.ini")


if __name__ == "__main__":
    main()
