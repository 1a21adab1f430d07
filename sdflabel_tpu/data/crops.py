"""Crops dataset: CSS training crops with synchronized augmentation.

Behavioral parity target: datasets/crops.py — reads `crops.json` +
`{idx:05d}_rgb.png` / `_uvw.png` pairs, applies color jitter to the RGB,
then a SYNCHRONIZED random rotation / resize / random-resized-crop to both
RGB (bilinear) and UVW (nearest), derives the mask as uvw.sum(0) > 0, and
normalizes RGB by ImageNet statistics (crops.py:44-71).

torch-free: PIL for decode + geometric transforms, numpy for the rest.
Augmentation parameters are drawn once per sample and applied to both
images — the reference achieves the same by re-seeding python `random`
around each torchvision transform call (crops.py:65-70).
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _color_jitter_params(rng: random.Random, brightness=0.4, contrast=0.4,
                         saturation=0.4, hue=0.2):
    """Draw torchvision-ColorJitter factors + application order.

    Shared by the PIL and fast (cv2/numpy) backends: both consume the
    SAME rng call sequence (4 uniforms + one shuffle of a 4-list), so a
    given (seed, epoch, idx) draws identical augmentation parameters on
    either backend."""
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    h = rng.uniform(-hue, hue)
    order = [("brightness", b), ("contrast", c), ("color", s), ("hue", h)]
    rng.shuffle(order)
    return order


def _color_jitter(img: Image.Image, rng: random.Random):
    """torchvision ColorJitter semantics: uniform factors, random order."""
    from PIL import ImageEnhance

    for name, f in _color_jitter_params(rng):
        if name == "brightness":
            img = ImageEnhance.Brightness(img).enhance(f)
        elif name == "contrast":
            img = ImageEnhance.Contrast(img).enhance(f)
        elif name == "color":
            img = ImageEnhance.Color(img).enhance(f)
        else:  # hue
            hsv = np.array(img.convert("HSV"), dtype=np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(f * 255)) % 256
            img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


# ---------------------------------------------------------------------------
# Fast augmentation backend (cv2 + numpy, GIL-releasing)
#
# Numerically CLOSE but not bit-equal to the PIL path: identical
# augmentation PARAMETERS (shared _color_jitter_params rng stream,
# same rotate/crop geometry), slightly different resampling (cv2
# bilinear is not antialiased on downscale; HSV/grayscale rounding
# differs by <=1 LSB). Exists because the PIL chain is the measured
# input-pipeline bottleneck for CSS training (BENCH_NOTES round 5:
# 55-68% input share even with process workers): cv2/numpy release the
# GIL, so THREAD prefetch reaches full parallelism with zero IPC
# pickling cost. Opt-in ([train] fast_input); PIL stays the
# reference-parity default (the reference augments via torchvision's
# PIL backend, crops.py:44-71).
# ---------------------------------------------------------------------------


def _luma_u8(img: np.ndarray) -> np.ndarray:
    """PIL convert('L') luma: (299 R + 587 G + 114 B) / 1000, rounded."""
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8)


def _blend_u8(low: np.ndarray, img: np.ndarray, f: float) -> np.ndarray:
    """PIL ImageEnhance blend: low + f * (img - low), clipped to u8."""
    out = low.astype(np.float32) + f * (
        img.astype(np.float32) - low.astype(np.float32))
    return np.clip(out + 0.5, 0.0, 255.0).astype(np.uint8)


def _fast_color_jitter(img: np.ndarray, order) -> np.ndarray:
    """Apply ColorJitter ops to a HxWx3 uint8 array (cv2/numpy)."""
    import cv2

    for name, f in order:
        if name == "brightness":
            img = _blend_u8(np.zeros_like(img), img, f)
        elif name == "contrast":
            mean = int(np.mean(_luma_u8(img)) + 0.5)
            img = _blend_u8(np.full_like(img, mean), img, f)
        elif name == "color":
            gray = _luma_u8(img)[..., None]
            img = _blend_u8(np.broadcast_to(gray, img.shape), img, f)
        else:  # hue: full-range HSV (H in [0,255], like PIL's HSV mode)
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV_FULL)
            # uint8 addition wraps mod 256 — exactly the PIL path's
            # (h + shift) % 256
            hsv[..., 0] = hsv[..., 0] + np.uint8(int(f * 255) % 256)
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB_FULL)
    return img


def _fast_rotate_expand(img: np.ndarray, angle: float,
                        nearest: bool) -> np.ndarray:
    """PIL Image.rotate(angle, expand=True) analogue via warpAffine."""
    import cv2

    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
    cos, sin = abs(m[0, 0]), abs(m[0, 1])
    nw = int(np.ceil(h * sin + w * cos))
    nh = int(np.ceil(h * cos + w * sin))
    m[0, 2] += (nw - w) / 2.0
    m[1, 2] += (nh - h) / 2.0
    return cv2.warpAffine(
        img, m, (nw, nh),
        flags=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)


def _fast_geom(img: np.ndarray, angle: float, i: int, j: int, ch: int,
               cw: int, nearest: bool, size: int = 128) -> np.ndarray:
    """rotate-expand -> resize(size) -> crop(i,j,ch,cw) -> resize(size),
    COMPOSED into one warpAffine: each output pixel resamples the
    SOURCE exactly once (the chained PIL/cv2 form resamples 3x, each
    pass blurring bilinear content and re-snapping nearest labels).
    Same geometry as the chained form — the affines are composed
    exactly — so augmentation parameters keep their meaning."""
    import cv2

    h, w = img.shape[:2]
    rot = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, 1.0)
    cos, sin = abs(rot[0, 0]), abs(rot[0, 1])
    nw = int(np.ceil(h * sin + w * cos))
    nh = int(np.ceil(h * cos + w * sin))
    rot[0, 2] += (nw - w) / 2.0
    rot[1, 2] += (nh - h) / 2.0
    r3 = np.vstack([rot, [0.0, 0.0, 1.0]])
    # resize (nw, nh) -> (size, size)
    s3 = np.diag([size / nw, size / nh, 1.0])
    # crop (j, i, cw, ch) in size-space, then resize back to (size, size)
    c3 = np.array([[size / cw, 0.0, -j * size / cw],
                   [0.0, size / ch, -i * size / ch],
                   [0.0, 0.0, 1.0]])
    m = (c3 @ s3 @ r3)[:2]
    return cv2.warpAffine(
        img, m, (size, size),
        flags=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)


def _fast_resize(img: np.ndarray, size: int, nearest: bool) -> np.ndarray:
    import cv2

    return cv2.resize(
        img, (size, size),
        interpolation=cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR)


def _random_resized_crop_params(rng: random.Random, w: int, h: int,
                                scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop.get_params logic."""
    area = w * h
    for _ in range(10):
        target_area = rng.uniform(*scale) * area
        log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            i = rng.randint(0, h - ch)
            j = rng.randint(0, w - cw)
            return i, j, ch, cw
    return 0, 0, h, w  # fallback: full image


class Crops:
    """Training crops dataset. `augment=False` gives deterministic resize.

    With `seed` set, augmentation draws come from a per-(seed, epoch, idx)
    RNG — independent of sample visit ORDER, so threaded prefetch,
    shuffling, and checkpoint resume all see identical augmentations (the
    reference's global-RNG draws are order-dependent; ours are a
    reproducibility upgrade, see crops.py:61-70). Call `set_epoch(e)` to
    advance the augmentation stream; with `seed=None` a process-local
    stateful RNG is used (reference behavior).
    """

    def __init__(self, path: str, augment: bool = True,
                 seed: int | None = None, fast: bool = False,
                 stage: str = "f32"):
        if stage not in ("f32", "uint8"):
            raise ValueError(f"stage must be 'f32' or 'uint8', got {stage!r}")
        if stage == "uint8" and not fast:
            raise ValueError("stage='uint8' requires fast=True")
        self.path = path
        self.augment = augment
        self.seed = seed
        self.fast = fast
        self.stage = stage
        self._epoch = 0
        self._rng = random.Random(seed)
        self._cache: dict[int, tuple] = {}
        with open(os.path.join(path, "crops.json")) as f:
            self.gt = json.load(f)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self):
        return len(self.gt)

    def _decode_fast(self, idx: int):
        """cv2 PNG decode -> (rgb, uvw) uint8 HxWx3 arrays."""
        import cv2

        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        rgb = cv2.cvtColor(
            cv2.imread(os.path.join(self.path, f"{idx:05d}_rgb.png"),
                       cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        uvw = cv2.cvtColor(
            cv2.imread(os.path.join(self.path, f"{idx:05d}_uvw.png"),
                       cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        return rgb, uvw

    def preload(self, num_threads: int = 8) -> None:
        """Decode every crop pair ONCE into an in-memory uint8 cache.

        PNG decode is paid per (sample, epoch) otherwise; the whole
        reference-scale DB fits in host RAM (~100 KB/sample decoded).
        cv2's decoder releases the GIL, so the warm-up pass threads."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            for idx, pair in enumerate(
                    pool.map(self._decode_fast, range(len(self)))):
                self._cache[idx] = pair

    def _getitem_fast(self, idx: int, gt_sample: dict) -> dict:
        """cv2/numpy sample path: same augmentation parameter stream as
        the PIL path (see _color_jitter_params), GIL-releasing ops,
        uint8 uvw/mask staging (consumers cast on device)."""
        rgb, uvw = self._decode_fast(idx)
        crop_size = np.asarray((rgb.shape[1], rgb.shape[0]), np.int64)

        if self.augment:
            rng = (random.Random(f"{self.seed}/{self._epoch}/{idx}")
                   if self.seed is not None else self._rng)
            rgb = _fast_color_jitter(rgb, _color_jitter_params(rng))
            angle = rng.uniform(-10, 10)
            i, j, ch, cw = _random_resized_crop_params(rng, 128, 128)
            rgb = _fast_geom(rgb, angle, i, j, ch, cw, nearest=False)
            uvw = _fast_geom(uvw, angle, i, j, ch, cw, nearest=True)
        else:
            rgb = _fast_resize(rgb, 128, nearest=False)
            uvw = _fast_resize(uvw, 128, nearest=True)

        if self.stage == "uint8":
            # ship raw jittered pixels; engine.css_train normalizes on
            # device ((x/255 - mean)/std, same fp32 math) — 4x smaller
            # host->device upload and no host float conversion
            rgb_np = rgb
        else:
            rgb_np = rgb.astype(np.float32) / 255.0
            rgb_np = (rgb_np - IMAGENET_MEAN) / IMAGENET_STD
        mask = (uvw.astype(np.uint16).sum(-1) > 0).astype(np.uint8)

        return {
            "rgb": np.transpose(rgb_np, (2, 0, 1)),  # (3,128,128) f32|u8
            "uvw": np.transpose(uvw, (2, 0, 1)),  # (3,128,128) uint8
            "mask": mask,  # (128,128) uint8
            "latent": np.array(gt_sample["latent"], np.float32),
            "crop_size": crop_size,
            "intrinsics": np.array(gt_sample["intrinsics"],
                                   np.float32).reshape(3, 3),
            "pose": np.array(gt_sample["extrinsics"],
                             np.float32).reshape(4, 4),
        }

    def __getitem__(self, idx: int) -> dict:
        gt_sample = self.gt[str(idx)][0]
        if self.fast:
            return self._getitem_fast(idx, gt_sample)
        rgb = Image.open(
            os.path.join(self.path, f"{idx:05d}_rgb.png")
        ).convert("RGB")
        uvw = Image.open(
            os.path.join(self.path, f"{idx:05d}_uvw.png")
        ).convert("RGB")
        crop_size = np.asarray(rgb.size, np.int64)

        latent = np.array(gt_sample["latent"], np.float32)
        extrinsics = np.array(gt_sample["extrinsics"], np.float32).reshape(4, 4)
        intrinsics = np.array(gt_sample["intrinsics"], np.float32).reshape(3, 3)

        if self.augment:
            # str seeds hash via sha512 in CPython — stable across runs
            rng = (random.Random(f"{self.seed}/{self._epoch}/{idx}")
                   if self.seed is not None else self._rng)
            rgb = _color_jitter(rgb, rng)
            # synchronized geometric augs (crops.py:46-70)
            angle = rng.uniform(-10, 10)
            rgb = rgb.rotate(angle, Image.BILINEAR, expand=True)
            uvw = uvw.rotate(angle, Image.NEAREST, expand=True)
            rgb = rgb.resize((128, 128), Image.BILINEAR)
            uvw = uvw.resize((128, 128), Image.NEAREST)
            i, j, ch, cw = _random_resized_crop_params(rng, 128, 128)
            rgb = rgb.crop((j, i, j + cw, i + ch)).resize((128, 128),
                                                          Image.BILINEAR)
            uvw = uvw.crop((j, i, j + cw, i + ch)).resize((128, 128),
                                                          Image.NEAREST)
        else:
            rgb = rgb.resize((128, 128), Image.BILINEAR)
            uvw = uvw.resize((128, 128), Image.NEAREST)

        rgb_np = np.asarray(rgb, np.float32) / 255.0
        rgb_np = (rgb_np - IMAGENET_MEAN) / IMAGENET_STD
        uvw_np = np.asarray(uvw, np.int64)
        mask = (uvw_np.sum(-1) > 0).astype(np.int64)

        return {
            "rgb": np.transpose(rgb_np, (2, 0, 1)),  # (3,128,128) float32
            "uvw": np.transpose(uvw_np, (2, 0, 1)),  # (3,128,128) int64
            "mask": mask,  # (128,128) int64
            "latent": latent,
            "crop_size": crop_size,
            "intrinsics": intrinsics,
            "pose": extrinsics,
        }


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = False):
    """Simple epoch iterator yielding stacked numpy batches."""
    order = np.arange(len(dataset))
    rng = np.random.RandomState(seed)
    if shuffle:
        rng.shuffle(order)
    for start in range(0, len(order), batch_size):
        sel = order[start : start + batch_size]
        if drop_last and len(sel) < batch_size:
            continue
        samples = [dataset[int(i)] for i in sel]
        yield {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# Process-pool worker state: one Crops instance per worker process,
# built by the pool initializer (pickling the dataset per task would
# re-ship the crops.json dict on every submit).
_WORKER_DS: "Crops | None" = None


def _init_crops_worker(path, augment, seed, fast=False, stage="f32"):
    global _WORKER_DS
    _WORKER_DS = Crops(path, augment=augment, seed=seed, fast=fast,
                       stage=stage)


def _crops_worker_get(args):
    epoch, idx = args
    _WORKER_DS.set_epoch(epoch)
    return _WORKER_DS[idx]


def prefetch_iterator(dataset, batch_size: int, num_threads: int = 2,
                      queue_size: int = 10, shuffle: bool = True,
                      seed: int = 0, drop_last: bool = False,
                      num_procs: int = 0, epoch: int = 0):
    """Prefetching batch iterator (threads or worker processes).

    Host-side input parallelism replacing the reference's DataLoader
    workers (train_css.py:42-45, num_workers=cpu_threads, queue_size
    config key). num_procs>0 uses a PROCESS pool — the faithful
    DataLoader-worker analogue, and the fast path: the PIL decode+augment
    chain holds the GIL for most of its time, so threads cap out near
    1x single-core throughput (measured 86-91% input share at batch
    13-52 on v5e, BENCH_NOTES round 5 "CSS training end-to-end").
    Augmentation draws stay reproducible across worker counts because
    the Crops RNG is per-(seed, epoch, idx), visit-order-independent;
    the process path therefore requires `dataset.seed is not None`.
    num_procs==0 falls back to threads; num_threads<=0 to the sync path.
    """
    if num_procs <= 0 and num_threads <= 0:
        yield from batch_iterator(dataset, batch_size, shuffle, seed,
                                  drop_last)
        return

    import queue
    import threading

    order = np.arange(len(dataset))
    rng = np.random.RandomState(seed)
    if shuffle:
        rng.shuffle(order)
    batches = [
        order[s : s + batch_size]
        for s in range(0, len(order), batch_size)
        if not (drop_last and s + batch_size > len(order))
    ]

    q: "queue.Queue" = queue.Queue(maxsize=queue_size)
    stop = threading.Event()

    if num_procs > 0:
        if getattr(dataset, "augment", False) and dataset.seed is None:
            raise ValueError(
                "process-based prefetch needs a seeded Crops dataset "
                "(augmentation RNG must be visit-order-independent)")
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        # spawn, not fork: the parent typically holds an initialized
        # JAX/TPU backend whose state must not be forked; spawned
        # workers never touch jax (pure PIL/numpy decode+augment)
        pool = ProcessPoolExecutor(
            max_workers=num_procs,
            mp_context=mp.get_context("spawn"),
            initializer=_init_crops_worker,
            initargs=(dataset.path, dataset.augment, dataset.seed,
                      getattr(dataset, "fast", False),
                      getattr(dataset, "stage", "f32")),
        )

        def fetch(sel):
            return list(pool.map(_crops_worker_get,
                                 [(epoch, int(i)) for i in sel]))
    else:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=num_threads)

        def fetch(sel):
            return list(pool.map(dataset.__getitem__,
                                 [int(i) for i in sel]))

    def produce():
        try:
            for sel in batches:
                if stop.is_set():
                    break
                samples = fetch(sel)
                q.put({k: np.stack([s[k] for s in samples])
                       for k in samples[0]})
        finally:
            pool.shutdown(wait=False)
            q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
    finally:
        stop.set()
