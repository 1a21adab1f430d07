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


def _color_jitter(img: Image.Image, rng: random.Random,
                  brightness=0.4, contrast=0.4, saturation=0.4, hue=0.2):
    """torchvision ColorJitter semantics: uniform factors, random order."""
    from PIL import ImageEnhance

    ops = []
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    h = rng.uniform(-hue, hue)
    ops.append(lambda im: ImageEnhance.Brightness(im).enhance(b))
    ops.append(lambda im: ImageEnhance.Contrast(im).enhance(c))
    ops.append(lambda im: ImageEnhance.Color(im).enhance(s))

    def hue_shift(im):
        hsv = np.array(im.convert("HSV"), dtype=np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(h * 255)) % 256
        return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")

    ops.append(hue_shift)
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


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

    def __init__(self, path: str, augment: bool = True, seed: int | None = None):
        self.path = path
        self.augment = augment
        self.seed = seed
        self._epoch = 0
        self._rng = random.Random(seed)
        with open(os.path.join(path, "crops.json")) as f:
            self.gt = json.load(f)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, idx: int) -> dict:
        gt_sample = self.gt[str(idx)][0]
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


def _init_crops_worker(path, augment, seed):
    global _WORKER_DS
    _WORKER_DS = Crops(path, augment=augment, seed=seed)


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
            initargs=(dataset.path, dataset.augment, dataset.seed),
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
