"""Synthetic CSS-training crops generator (crops.json DB producer).

The reference TRAINS its CSS network from a pre-rendered crops database
(datasets/crops.py:17-30 reads `crops.json` + `{idx:05d}_rgb.png`/`_uvw.png`
pairs) but ships no tool that produces one — the DB came from a TRI-internal
rendering pipeline. This module closes that gap with the framework's own
stack: DeepSDF shapes are decoded (ops.grid), rendered with the
differentiable rasterizer (renderer.rasterer) at randomized poses, and
written in exactly the layout `data.crops.Crops` (and the reference's
datasets/crops.py) consumes, so the full loop

    train_deepsdf -> make_crops -> train_css -> refine_css -> evaluate

runs end-to-end with no external data.

TPU-native shape discipline: one jitted render program (fixed crop size,
grid density, surface capacity) is reused for every crop — per-crop inputs
(latent, yaw, translation, intrinsics) are traced arguments, so the host
loop pays a single compile and N cheap dispatches.

RGB appearance is domain-randomized (random light direction, albedo mode,
background, sensor noise) rather than photoreal — crops.json consumers get
geometrically exact NOCS/mask/latent supervision with varied appearance,
the standard synthetic-supervision recipe for this network family.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from sdflabel_tpu.engine import refine as refine_mod
from sdflabel_tpu.models import deepsdf
from sdflabel_tpu.ops import grid as grid_ops
from sdflabel_tpu.renderer import rasterer as rast_mod

# Nominal object radius used to size the focal length so the rendered
# shape fills `fill` of the crop: DeepSDF shapes live in [-1, 1]^3 and the
# bundled/reference car decoders keep the body within ~|p| < 1.1.
_NOMINAL_RADIUS = 1.1


def make_render_fn(decoder_fn, crop_px: int, grid_density: int,
                   capacity: int):
    """One jitted program:
    (latent, yaw, trans, K) -> (nocs, mask, normals, pose).

    Outputs are (3, H, W) NOCS in [0, 1], (H, W) bool mask, (3, H, W)
    camera-frame normals encoded as (n + 1) / 2 (the rasterizer's normals
    channel, rasterer.py:139), and the 4x4 render pose (returned from the
    same program — rebuilding it eagerly per crop would pay ~10 dispatch
    RTTs on remote-dispatch backends).
    """
    grid_pts = grid_ops.generate_point_grid(grid_density)

    @jax.jit
    def render(latent, yaw, trans, K):
        surf, _ = grid_ops.surface_from_decoder(
            decoder_fn, latent, grid_pts, capacity=capacity)
        pose = refine_mod.build_render_pose(yaw, trans)
        rendering, _pts = rast_mod.render(
            K, (crop_px, crop_px), surf.points, surf.normals, surf.normals,
            pose, point_mask=surf.mask, rot="dcm", primitives="disc",
            output_nocs=True)
        return (rendering.color, rendering.mask[0] > 0.5,
                rendering.normals, pose)

    return render


def _sample_view(rng: np.random.RandomState, crop_px: int):
    """Randomized (yaw, trans, K, fill): upright yaw-only car poses with
    mild look-down parallax, matching the reference's refinement prior
    (build_render_pose is yaw-only, optimizer.py:87-90)."""
    yaw = rng.uniform(-np.pi, np.pi)
    dist = rng.uniform(6.0, 20.0)
    fill = rng.uniform(0.55, 0.9)
    focal = fill * crop_px * dist / (2.0 * _NOMINAL_RADIUS)
    # principal-point jitter moves the object off-center without letting
    # it leave the crop
    cx = crop_px / 2.0 + rng.uniform(-0.08, 0.08) * crop_px
    cy = crop_px / 2.0 + rng.uniform(-0.08, 0.08) * crop_px
    K = np.array([[focal, 0.0, cx], [0.0, focal, cy], [0.0, 0.0, 1.0]],
                 np.float32)
    # camera slightly above the car: +y is down in camera frame, so a
    # positive y offset puts the object below the optical axis
    y_off = rng.uniform(0.0, 0.10) * dist
    trans = np.array([0.0, y_off, dist], np.float32)
    return yaw, trans, K


def _synthesize_rgb(rng: np.random.RandomState, nocs: np.ndarray,
                    mask: np.ndarray, normals_enc: np.ndarray) -> np.ndarray:
    """Domain-randomized appearance from the geometric render.

    Lambertian shading of the rendered normals under a random light, over
    a randomly chosen albedo (solid color / NOCS texture / grayscale),
    composited onto a randomized background, plus sensor noise. Returns
    (H, W, 3) float32 in [0, 1].
    """
    h, w = mask.shape
    n = np.transpose(normals_enc, (1, 2, 0)) * 2.0 - 1.0  # (H, W, 3)
    light = rng.randn(3)
    light /= np.linalg.norm(light) + 1e-9
    diffuse = np.abs(n @ light)[..., None]  # two-sided: no pitch-black half

    mode = rng.randint(3)
    if mode == 0:  # solid body color
        albedo = np.broadcast_to(rng.uniform(0.1, 0.9, 3).astype(np.float32),
                                 (h, w, 3))
    elif mode == 1:  # NOCS as texture (the bundled demo's convention)
        albedo = np.clip(np.transpose(nocs, (1, 2, 0)), 0.0, 1.0)
    else:  # grayscale
        albedo = np.broadcast_to(
            np.float32(rng.uniform(0.2, 0.8)), (h, w, 3))

    ambient = rng.uniform(0.25, 0.45)
    strength = rng.uniform(0.5, 0.8)
    shaded = np.clip(albedo * (ambient + strength * diffuse), 0.0, 1.0)

    bg_mode = rng.randint(3)
    if bg_mode == 0:  # uniform noise
        bg = rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32)
    elif bg_mode == 1:  # vertical gradient between two random colors
        c0, c1 = rng.uniform(0.1, 0.9, 3), rng.uniform(0.1, 0.9, 3)
        t = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None, None]
        bg = (1.0 - t) * c0 + t * c1
        bg = np.broadcast_to(bg, (h, w, 3)).astype(np.float32)
    else:  # solid
        bg = np.broadcast_to(rng.uniform(0.1, 0.9, 3).astype(np.float32),
                             (h, w, 3))

    img = np.where(mask[..., None], shaded, bg)
    img = img + rng.randn(h, w, 3).astype(np.float32) * rng.uniform(0.005,
                                                                    0.03)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _quantize_uvw(nocs: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """(3, H, W) NOCS [0,1] -> (H, W, 3) uint8 class bins.

    Consumers derive the mask as uvw.sum(-1) > 0 (crops.py:71 /
    data.crops), so an on-object pixel whose THREE bins all quantize to 0
    (NOCS near the origin corner) would punch a hole in the mask — those
    rare pixels get bin 1 in every channel.

    Composited NOCS can leave [0, 1] slightly (shapes may exceed the unit
    cube, and (±coord + 1)/2 goes negative for coords < -1); clip BEFORE
    the uint8 cast — a negative value would otherwise wrap to bin ~255.
    """
    nocs = np.clip(nocs, 0.0, 1.0)
    uvw = np.round(np.transpose(nocs, (1, 2, 0)) * 255.0).astype(np.uint8)
    uvw[~mask] = 0
    hole = mask & (uvw.sum(-1) == 0)
    uvw[hole] = 1
    return uvw


def _jitter_latent(lat: np.ndarray, rng: np.random.RandomState,
                   jitter: float) -> np.ndarray:
    """Gaussian-perturb a latent, rescaled back to its ORIGINAL norm —
    trained tables are not unit-norm, and the jitter must not project
    them onto the sphere."""
    norm0 = np.linalg.norm(lat)
    out = lat + rng.randn(*lat.shape).astype(np.float32) * jitter
    return out * (norm0 / (np.linalg.norm(out) + 1e-9))


def sample_unit_latents(n: int, latent_size: int,
                        rng: np.random.RandomState) -> np.ndarray:
    """Random unit-sphere latents (the CSS latent head's codomain,
    resnet_css.py:19-26) for decoders without a latent-code table."""
    z = rng.randn(n, latent_size).astype(np.float32)
    return z / np.linalg.norm(z, axis=1, keepdims=True)


def load_latents(path: str, latent_size: int) -> np.ndarray:
    """Latent table from a trainer export: .pth (LatentCodes layout,
    pipelines.train_deepsdf) or .npy/.npz of shape (num, L)."""
    if path.endswith(".npy") or path.endswith(".npz"):
        arr = np.load(path)
        if hasattr(arr, "files"):
            arr = arr[arr.files[0]]
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        arr = data["latent_codes"] if isinstance(data, dict) else data
        if hasattr(arr, "detach"):
            arr = arr.detach().cpu().numpy()
    arr = np.asarray(arr, np.float32).reshape(len(arr), -1)
    if arr.shape[1] != latent_size:
        raise ValueError(
            f"latent table width {arr.shape[1]} != decoder latent size "
            f"{latent_size}")
    return arr


def make_crops(out_dir: str, decoder_fn, latents: np.ndarray, n_crops: int,
               crop_px: int = 128, grid_density: int = 40,
               capacity: int = 4096, seed: int = 0,
               latent_jitter: float = 0.0) -> dict:
    """Render `n_crops` crops into `out_dir` in the crops-DB layout.

    Latents are cycled through `latents` (optionally perturbed by
    `latent_jitter` gaussian noise, rescaled back to the entry's ORIGINAL
    norm — trained tables are not unit-norm, and the jitter must not move
    them onto the sphere) so every table entry is covered before
    repetition. Returns the crops.json dict.
    """
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    render = make_render_fn(decoder_fn, crop_px, grid_density, capacity)

    db: dict[str, list] = {}
    for idx in range(n_crops):
        lat = latents[idx % len(latents)].copy()
        if latent_jitter > 0.0:
            lat = _jitter_latent(lat, rng, latent_jitter)
        yaw, trans, K = _sample_view(rng, crop_px)

        nocs, mask, normals_enc, pose = render(
            jnp.asarray(lat), jnp.asarray([yaw], np.float32),
            jnp.asarray(trans), jnp.asarray(K))
        nocs = np.asarray(nocs)
        mask = np.asarray(mask)
        normals_enc = np.asarray(normals_enc)
        pose = np.asarray(pose)

        rgb = _synthesize_rgb(rng, nocs, mask, normals_enc)
        uvw = _quantize_uvw(nocs, mask)
        Image.fromarray((rgb * 255.0).round().astype(np.uint8)).save(
            os.path.join(out_dir, f"{idx:05d}_rgb.png"))
        Image.fromarray(uvw).save(os.path.join(out_dir, f"{idx:05d}_uvw.png"))

        db[str(idx)] = [{
            "latent": [float(v) for v in lat],
            "extrinsics": [float(v) for v in pose.flatten()],
            "intrinsics": [float(v) for v in K.flatten()],
        }]

    with open(os.path.join(out_dir, "crops.json"), "w") as f:
        json.dump(db, f)
    return db


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Render a synthetic CSS-training crops database from a "
                    "DeepSDF checkpoint")
    p.add_argument("out_dir")
    p.add_argument("--deepsdf", required=True,
                   help="path to <name>.pt (with <name>.json specs beside "
                        "it, workspace conventions)")
    p.add_argument("--latents", default=None,
                   help="latent table: LatentCodes .pth or .npy/.npz; "
                        "default = random unit-sphere latents")
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--crop-px", type=int, default=128)
    p.add_argument("--grid-density", type=int, default=40)
    p.add_argument("--capacity", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--latent-jitter", type=float, default=0.0)
    p.add_argument("--n-random-latents", type=int, default=16,
                   help="table size when --latents is not given")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sdflabel_tpu.models import deepsdf_workspace as ws

    cfg, params, latent_size = ws.setup_dsdf(args.deepsdf)
    decoder_fn = deepsdf.sdf_fn(cfg, params)
    if args.latents:
        latents = load_latents(args.latents, latent_size)
    else:
        latents = sample_unit_latents(
            args.n_random_latents, latent_size,
            np.random.RandomState(args.seed + 1))

    make_crops(args.out_dir, decoder_fn, latents, args.n,
               crop_px=args.crop_px, grid_density=args.grid_density,
               capacity=args.capacity, seed=args.seed,
               latent_jitter=args.latent_jitter)
    print(f"wrote {args.n} crops + crops.json to {args.out_dir}")


if __name__ == "__main__":
    main()
