"""Device-resident image pool: keep the whole dataset in HBM as uint8.

TPU-native replacement for per-iteration pixel shipping. The reference
re-reads pixels from disk through DataLoader workers every batch
(reference: src/supervised.py:838-852, src/dataset.py:282-296); round 1 of
this rebuild shipped gathered uint8 patches host->device every iteration,
which is bandwidth-bound over a thin host link (~3 MB/iter measured at
0.59 s/iter on a slow-tunnel day, docs/experiment_log.md). With the pool,
every image is padded to a common size and transferred to HBM ONCE; train
batches then carry only sample indices and patch coordinates, and the
jitted train step gathers patch pixels with ``vmap(lax.dynamic_slice)`` —
the same pattern the batched env uses (env/batched_env.py:301-316).

Eligibility: the pool stores post-transform pixels, so it requires the
deterministic per-index pixel path — geometric augmentations
(``--augment-rotate``/``--augment-translate`` reshuffle pixels per draw)
disable it. Photometric augmentation is unaffected (it already runs on
device inside the train step, ops/augment.py). Memory is capped by
``JOLINEEDLE_POOL_BUDGET_MB`` (default 6144); datasets over budget (e.g.
full LARD at ~39 GB) fall back to the streaming path automatically under
``--device-data-cache auto``.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..parallel.mesh import replicated_sharding

#: Host->device transfer slab: small enough that an interrupted transfer
#: cannot wedge the tunneled chip (a killed 2.8 GB transfer has been
#: observed to hang every later program; docs/experiment_log.md 2026-08-17).
_CHUNK_BYTES = 32 * 1024 * 1024


def pool_budget_bytes() -> int:
    return int(os.environ.get("JOLINEEDLE_POOL_BUDGET_MB", "6144")) * (1 << 20)


def padded_size(
    raw_h: int, raw_w: int, minimum_image_size: int, patch_size: int
) -> Tuple[int, int]:
    """Post-transform image dims without decoding pixels: the min-size
    upscale (data/dataset.py::transform) followed by pad-to-patch-multiple."""
    h, w = raw_h, raw_w
    if minimum_image_size and (w < minimum_image_size or h < minimum_image_size):
        ratio = w / h
        if w < minimum_image_size:
            w = minimum_image_size
            h = int(w / ratio)
        if h < minimum_image_size:
            h = minimum_image_size
            w = int(h * ratio)
    h = math.ceil(h / patch_size) * patch_size
    w = math.ceil(w / patch_size) * patch_size
    return h, w


class DeviceImagePool:
    """All dataset images in HBM: ``images`` [N, Hmax, Wmax, C] uint8
    (replicated over the mesh), plus per-image padded dims on the host."""

    def __init__(self, images: jax.Array, shapes: np.ndarray):
        self.images = images
        self.shapes = shapes  # [N, 2] (H, W) after transform+pad

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.images.shape))

    @staticmethod
    def eligible(dataset, mode: str) -> bool:
        """``--device-data-cache`` gate. ``on`` forces (raises if the
        dataset's geometric augs make the pool incorrect), ``auto`` checks
        augs + memory budget, ``off`` disables."""
        if mode == "off":
            return False
        if dataset.rotations or dataset.translations:
            if mode == "on":
                raise ValueError(
                    "--device-data-cache on is incompatible with geometric"
                    " augmentation (--augment-rotate/--augment-translate):"
                    " the pool stores fixed per-image pixels"
                )
            return False
        if mode == "on":
            return True
        # auto: estimate padded pool bytes from image headers only.
        from PIL import Image

        hmax = wmax = 0
        for path in dataset.image_paths:
            with Image.open(path) as im:
                w, h = im.size
            h, w = padded_size(
                h, w, dataset.minimum_image_size, dataset.patch_size
            )
            hmax, wmax = max(hmax, h), max(wmax, w)
        total = len(dataset) * hmax * wmax * 3
        if total > pool_budget_bytes():
            print(
                f"device pool: {total / 1e9:.2f} GB exceeds budget"
                f" ({pool_budget_bytes() / 1e9:.2f} GB), streaming instead"
            )
            return False
        return True

    @classmethod
    def build(cls, dataset, mesh) -> "DeviceImagePool":
        """Decode + transform every image once and ship it to HBM in small
        slabs (wedge-safe, see _CHUNK_BYTES)."""
        n = len(dataset)
        rng = np.random.default_rng(0)  # pixels are rng-independent here
        shapes = np.zeros((n, 2), np.int32)
        images = []
        hmax = wmax = 0
        for i in range(n):
            item = dataset.__getitem__(i, rng)
            img = item["image"]
            assert img.dtype == np.uint8, "pool requires uint8-native images"
            shapes[i] = img.shape[:2]
            hmax, wmax = max(hmax, img.shape[0]), max(wmax, img.shape[1])
            images.append(img)

        sharding = replicated_sharding(mesh)
        per_img = hmax * wmax * images[0].shape[2]
        per_chunk = max(1, _CHUNK_BYTES // per_img)
        device_chunks = []
        for start in range(0, n, per_chunk):
            chunk = images[start : start + per_chunk]
            buf = np.zeros((len(chunk), hmax, wmax, chunk[0].shape[2]), np.uint8)
            for j, img in enumerate(chunk):
                buf[j, : img.shape[0], : img.shape[1]] = img
            device_chunks.append(jax.device_put(buf, sharding))
        pool = jnp.concatenate(device_chunks, axis=0)
        print(
            f"device pool: {n} images -> [{n}, {hmax}, {wmax}, 3] uint8,"
            f" {pool.size / 1e9:.2f} GB in HBM"
        )
        return cls(pool, shapes)


def gather_pool_patches(
    pool_images: jax.Array,
    image_idx: jax.Array,
    positions: jax.Array,
    patch_size: int,
) -> jax.Array:
    """[B, K, P, P, C] uint8 patches from pool images, inside jit.

    ``positions`` are (y, x) patch-grid coords per image (same contract as
    the host gather, env/oracle.py::gather_patches). vmap of a 4-D
    ``dynamic_slice`` keeps the full padded images out of the program —
    only the patches materialize.
    """
    p = patch_size
    c = pool_images.shape[-1]

    def one_patch(idx, pos):
        return lax.dynamic_slice(
            pool_images, (idx, pos[0] * p, pos[1] * p, 0), (1, p, p, c)
        )[0]

    def one_image(idx, pos_k):
        return jax.vmap(lambda q: one_patch(idx, q))(pos_k)

    return jax.vmap(one_image)(image_idx, positions)
