"""RNG-keyed photometric augmentation, jit-compiled on device.

Functional equivalent of the reference's kornia GPU stack (reference:
src/trainer.py:176-186): planckian color jitter, random grayscale, gaussian
blur, plasma shadow, gaussian noise, motion blur. Each op is a pure function
of a PRNG key, vmapped over the batch, so the whole stack fuses into the
train step (the reference runs it as a separate no-grad GPU pass,
reference: src/supervised.py:854-861).

Exact kornia parity is neither possible nor needed (these are random
augmentations); distributions are matched in spirit: same op set, same
probabilities, same parameter ranges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 24 CIED planckian-jitter gain triples (approximating kornia's mode="CIED"
# daylight table): per-channel multipliers for color temperatures.
# Plain numpy: module import must never touch a device.
import numpy as np

_PLANCKIAN_GAINS = np.array(
    [
        [1.0 + 0.4 * (1 - t), 1.0, 1.0 + 0.6 * (t - 0.5)]
        for t in np.linspace(0.0, 1.0, 24)
    ],
    np.float32,
)


def to_unit_float(images: jax.Array) -> jax.Array:
    """uint8 [0, 255] -> float32 [0, 1]; float inputs pass through.

    Image tensors cross the host->device boundary as uint8 wherever
    possible: 4x less transfer AND 4x less client-side retention on the
    tunneled-TPU runtime, which permanently retains every transferred
    buffer (measured ~1.1x the payload; see CLAUDE.md)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def _planckian_jitter(key, img):
    gains = jnp.asarray(_PLANCKIAN_GAINS)[
        jax.random.randint(key, (), 0, len(_PLANCKIAN_GAINS))
    ]
    return jnp.clip(img * gains[None, None, :], 0.0, 1.0)


def _grayscale(key, img, p=0.2):
    gray = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]
    gray = jnp.broadcast_to(gray, img.shape)
    return jnp.where(jax.random.uniform(key) < p, gray, img)


def _separable_blur_3(img, kernel):
    """3-tap separable blur on [H, W, C] with 'same' edges."""
    k = kernel / kernel.sum()
    pad = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    img = k[0] * pad[:-2] + k[1] * pad[1:-1] + k[2] * pad[2:]
    pad = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    return k[0] * pad[:, :-2] + k[1] * pad[:, 1:-1] + k[2] * pad[:, 2:]


def _gaussian_blur(key, img):
    sigma = jax.random.uniform(key, (), minval=0.1, maxval=2.0)
    x = jnp.array([-1.0, 0.0, 1.0])
    kernel = jnp.exp(-(x**2) / (2 * sigma**2))
    return _separable_blur_3(img, kernel)


def _plasma_shadow(key, img, p=0.5):
    """Smooth multiplicative shadow from upsampled low-res noise (stands in
    for kornia's diamond-square plasma)."""
    k1, k2, k3 = jax.random.split(key, 3)
    h, w = img.shape[:2]
    coarse = jax.random.uniform(k1, (4, 4, 1))
    field = jax.image.resize(coarse, (h, w, 1), method="bilinear")
    intensity = jax.random.uniform(k2, (), minval=-0.2, maxval=0.0)
    quantity = jax.random.uniform(k3, (), minval=0.0, maxval=0.4)
    shadow = 1.0 + intensity * (field < quantity)
    apply = jax.random.uniform(jax.random.fold_in(key, 7)) < p
    return jnp.where(apply, jnp.clip(img * shadow, 0.0, 1.0), img)


def _gaussian_noise(key, img, p=0.5, std=0.05):
    k1, k2 = jax.random.split(key)
    noisy = img + std * jax.random.normal(k1, img.shape)
    return jnp.where(jax.random.uniform(k2) < p, noisy, img)


def _motion_blur(key, img, p=0.3):
    """3px motion blur along a random compass direction."""
    k1, k2 = jax.random.split(key)
    direction = jax.random.randint(k1, (), 0, 4)
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = img.shape[:2]

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(
            pad, (1 + dy, 1 + dx, 0), img.shape
        )

    candidates = jnp.stack(
        [
            (shifted(0, -1) + img + shifted(0, 1)) / 3,  # horizontal
            (shifted(-1, 0) + img + shifted(1, 0)) / 3,  # vertical
            (shifted(-1, -1) + img + shifted(1, 1)) / 3,  # diag
            (shifted(-1, 1) + img + shifted(1, -1)) / 3,  # anti-diag
        ]
    )
    blurred = candidates[direction]
    return jnp.where(jax.random.uniform(k2) < p, blurred, img)


def detection_augment_single(key: jax.Array, img: jax.Array) -> jax.Array:
    """Full photometric stack on one [H, W, C] image in [0, 1]."""
    keys = jax.random.split(key, 6)
    img = _planckian_jitter(keys[0], img)
    img = _grayscale(keys[1], img)
    img = _gaussian_blur(keys[2], img)
    img = _plasma_shadow(keys[3], img)
    img = _gaussian_noise(keys[4], img)
    img = _motion_blur(keys[5], img)
    return jnp.clip(img, 0.0, 1.0)


def detection_augment(key: jax.Array, images: jax.Array) -> jax.Array:
    """Batched stack: ``images`` is [..., H, W, C]; leading dims vmapped."""
    lead = images.shape[:-3]
    flat = images.reshape((-1,) + images.shape[-3:])
    keys = jax.random.split(key, flat.shape[0])
    out = jax.vmap(detection_augment_single)(keys, flat)
    return out.reshape(images.shape[: len(lead)] + images.shape[-3:])
