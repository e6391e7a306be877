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

The pool stores UN-augmented post-resize/pad pixels. Geometric
augmentations (``--augment-rotate``/``--augment-translate``) are re-applied
ON DEVICE inside the jitted train step (:func:`aug_canvases`): the host
samples the parameters and remaps boxes/labels (data/dataset.py::
get_geometry), the device replays the same integer pixel moves (rot90 =
transpose/flip + roll, translate = roll + mask) on a fixed-shape canvas
before the patch gather. Photometric augmentation already runs on device
(ops/augment.py). Memory is capped by ``JOLINEEDLE_POOL_BUDGET_MB``
(default 6144); datasets over budget (e.g. full LARD at ~39 GB) fall back
to the streaming path automatically under ``--device-data-cache auto``.
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
        """``--device-data-cache`` gate. ``on`` forces, ``auto`` checks the
        memory budget, ``off`` disables. Geometric augs do NOT disqualify:
        they are re-applied on device (:func:`aug_canvases`)."""
        if mode == "off":
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
        slabs (wedge-safe, see _CHUNK_BYTES). Pixels are stored
        UN-augmented: geometric augs replay on device per batch
        (:func:`aug_canvases`)."""
        import copy

        dataset = copy.copy(dataset)
        dataset.rotations = dataset.translations = False
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


def aug_canvases(
    pool_images: jax.Array,
    image_idx: jax.Array,
    rot_k: Optional[jax.Array],
    shift: Optional[jax.Array],
    base_hw: Optional[jax.Array],
    out_hw: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Gather a batch of pool images and replay the host geometric augs on
    device: ``[B, Sh, Sw, C]`` canvases ready for patch gathering.

    The host applies rotate-then-translate to the padded image
    (data/dataset.py::transform); this replays the exact integer pixel
    moves on a fixed-shape canvas:

      * rotation by k quarter-turns: whole-canvas ``rot90`` (shape-safe on
        the square canvas used whenever ``rot_k`` is given) followed by a
        roll that moves the rotated image back to the canvas origin — e.g.
        a clockwise turn of the h x w image lands at columns [S-h, S), so
        roll columns left by S-h. Zeros outside the image region stay
        zeros, so no mask is needed.
      * translation by (ty, tx): ``roll`` + a mask zeroing the wrapped
        strip — identical to the host's zero-filled shift for every pixel
        inside the post-aug image region.
      * a final crop mask zeroing everything beyond the POST-aug per-image
        extent (h2, w2): the host operates on per-image arrays of exactly
        that size, so pixels an aug pushes past the image edge are lost
        there — on the larger shared canvas they would otherwise survive.

    Args:
        rot_k: [B] quarter-turns, or None when rotations are off (the
            canvas then keeps the pool's rectangular shape).
        shift: [B, 2] (ty, tx) pixel shifts, or None when translations off.
        base_hw: [B, 2] PRE-aug padded dims — required whenever rot_k or
            shift is given (re-origin rolls and the crop mask depend on
            them).
        out_hw: static output canvas dims; defaults to the square
            max(Hpool, Wpool) when rotating, else (Hpool, Wpool).
    """
    n, hp, wp, c = pool_images.shape
    if out_hw is None:
        s = max(hp, wp)
        out_hw = (s, s) if rot_k is not None else (hp, wp)
    sh, sw = out_hw
    assert sh >= hp and sw >= wp, "canvas smaller than pool images"
    if rot_k is not None:
        assert sh == sw, "rotation requires a square canvas"
    if rot_k is not None or shift is not None:
        assert base_hw is not None, "augs require base_hw for the crop mask"

    def one(idx):
        return lax.dynamic_slice(pool_images, (idx, 0, 0, 0), (1, hp, wp, c))[0]

    imgs = jax.vmap(one)(image_idx)
    imgs = jnp.pad(imgs, ((0, 0), (0, sh - hp), (0, sw - wp), (0, 0)))

    def transform_one(img, k, sft, hw):
        if rot_k is not None:
            s = img.shape[0]
            h, w = hw[0], hw[1]
            img = lax.switch(
                k,
                [
                    lambda x: x,
                    # clockwise: image lands at cols [S-h, S); re-origin.
                    lambda x: jnp.roll(
                        jnp.rot90(x, k=-1, axes=(0, 1)), h - s, axis=1
                    ),
                    lambda x: jnp.roll(
                        jnp.rot90(x, k=2, axes=(0, 1)),
                        (h - s, w - s),
                        axis=(0, 1),
                    ),
                    # counter-clockwise: image lands at rows [S-w, S).
                    lambda x: jnp.roll(
                        jnp.rot90(x, k=1, axes=(0, 1)), w - s, axis=0
                    ),
                ],
                img,
            )
        if shift is not None:
            ty, tx = sft[0], sft[1]
            img = jnp.roll(img, (ty, tx), axis=(0, 1))
            rows = jnp.arange(img.shape[0])
            cols = jnp.arange(img.shape[1])
            rvalid = (rows >= ty) & (rows < img.shape[0] + ty)
            cvalid = (cols >= tx) & (cols < img.shape[1] + tx)
            valid = rvalid[:, None, None] & cvalid[None, :, None]
            img = img * valid.astype(img.dtype)
        if rot_k is not None or shift is not None:
            # Crop to the POST-aug per-image extent: the host's arrays end
            # there, so anything the augs pushed past the edge is dropped.
            h, w = hw[0], hw[1]
            if rot_k is not None:
                odd = k % 2 == 1
                h2 = jnp.where(odd, w, h)
                w2 = jnp.where(odd, h, w)
            else:
                h2, w2 = h, w
            rows = jnp.arange(img.shape[0])
            cols = jnp.arange(img.shape[1])
            inside = (rows < h2)[:, None, None] & (cols < w2)[None, :, None]
            img = img * inside.astype(img.dtype)
        return img

    b = imgs.shape[0]
    if rot_k is None:
        rot_k_in = jnp.zeros((b,), jnp.int32)
    else:
        rot_k_in = rot_k
    if shift is None:
        shift_in = jnp.zeros((b, 2), jnp.int32)
    else:
        shift_in = shift
    if base_hw is None:
        base_hw_in = jnp.zeros((b, 2), jnp.int32)
    else:
        base_hw_in = base_hw
    return jax.vmap(transform_one)(imgs, rot_k_in, shift_in, base_hw_in)


def gather_canvas_patches(
    canvases: jax.Array, positions: jax.Array, patch_size: int
) -> jax.Array:
    """[B, K, P, P, C] uint8 patches from per-sample canvases, inside jit.

    Same contract as :func:`gather_pool_patches` but reading each sample's
    own (augmented) canvas instead of indexing the shared pool."""
    p = patch_size
    c = canvases.shape[-1]

    def one_patch(img, pos):
        return lax.dynamic_slice(img, (pos[0] * p, pos[1] * p, 0), (p, p, c))

    def one_image(img, pos_k):
        return jax.vmap(lambda q: one_patch(img, q))(pos_k)

    return jax.vmap(one_image)(canvases, positions)
