"""Batched glimpse environment as pure JAX functions over a pytree state.

TPU-native redesign of the reference's ``NeedleGeneralEnv`` (reference:
src/env/general_env.py:14-573). Differences in *mechanism*, parity in
*semantics*:

  - State is an immutable ``EnvState`` pytree; ``reset``/``step`` are pure
    functions, so whole rollouts compile into a single ``lax.scan``.
  - The per-sample Python patch-gather loop (reference:
    src/env/general_env.py:285-306) becomes ``vmap(lax.dynamic_slice)``.
  - bbox -> patch masks use interval arithmetic instead of kornia
    rasterization (see env/parsing.py).
  - Images are NHWC (TPU-friendly layout); the reference is NCHW.

``NeedleEnv`` is registered as a pytree so it can be passed straight through
``jax.jit`` boundaries: its arrays (images, bbox masks, boxes) are leaves and
its geometry (patch size, grid dims, ...) is static aux data.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .actions import ACTION_DELTAS_ARRAY, Action
from .parsing import boxes_to_patch_mask, split_boxes_to_patches


class EnvState(NamedTuple):
    """Per-episode mutable state (reference: src/env/general_env.py:117-142)."""

    positions: jax.Array  # [B, 2] int32 (y, x) patch coords
    visited: jax.Array  # [B, nv, nh] bool
    steps: jax.Array  # [B] int32
    has_stopped: jax.Array  # [B] bool


def build_glimpse_pyramid(images: jax.Array, patch_size: int, n_levels: int) -> jax.Array:
    """[B, H, W, C] -> [B, L, H, W, C] progressive zoom-out pyramid.

    Level 0 is the original image; each next level reflect-pads all sides by
    ``patch_size`` pixels and resizes back to the original size (reference:
    src/env/general_env.py:84-115).
    """
    levels = [images]
    current = images
    b, h, w, c = images.shape
    for _ in range(n_levels - 1):
        current = jnp.pad(
            current,
            ((0, 0), (patch_size, patch_size), (patch_size, patch_size), (0, 0)),
            mode="reflect",
        )
        current = jax.image.resize(current, (b, h, w, c), method="linear")
        levels.append(current)
    return jnp.stack(levels, axis=1)


@jax.tree_util.register_pytree_node_class
class NeedleEnv:
    """Batched needle environment over a batch of same-shape images.

    Args:
        images: ``[B, H, W, C]`` float images (values in [0, 1]) or uint8
            images (values in [0, 255]). uint8 inputs stay uint8 in HBM —
            4x less memory and gather bandwidth than float32 for the
            largest resident buffer — and patches are normalized to
            float32 in [0, 1] at gather time (requires
            ``n_glimps_levels == 1``; the pyramid resize needs floats).
        bboxes: ``[B, N, 4]`` padded pixel-space xyxy boxes (inclusive
            bottom-right) plus ``box_valid`` ``[B, N]``; if ``box_valid`` is
            None, boxes with positive extent are considered valid.
        patch_size: patch side; H and W must be multiples of it.
        max_ep_len: maximum episode length (truncation).
        n_glimps_levels: glimpse pyramid depth (1 = no pyramid).
        stop_enabled: whether STOP terminates episodes.
    """

    def __init__(
        self,
        images: jax.Array,
        bboxes: jax.Array,
        patch_size: int,
        max_ep_len: int,
        n_glimps_levels: int = 1,
        stop_enabled: bool = False,
        box_valid: Optional[jax.Array] = None,
        terminate_on_all_found: bool = True,
        stop_bonus_scale: float = 1.0,
        _prebuilt=None,
    ):
        self.patch_size = int(patch_size)
        self.max_ep_len = int(max_ep_len)
        self.n_glimps_levels = int(n_glimps_levels)
        self.stop_enabled = bool(stop_enabled)
        # Reward-shaping knob for the from-scratch STOP probe (round-3
        # verdict item 4): scales the found-count STOP bonus/penalty while
        # leaving the +1/new-patch and step-cost terms untouched. 1.0 = the
        # reference's reward (general_env.py:321-358).
        self.stop_bonus_scale = float(stop_bonus_scale)
        # The supervised autoregressive eval keeps walking after all bbox
        # patches are visited (reference: src/supervised.py:326-363 has no
        # all-found break); RL terminates there (general_env.py:235-246).
        self.terminate_on_all_found = bool(terminate_on_all_found)

        if _prebuilt is not None:
            self.images, self.bboxes, self.box_valid, self.bbox_masks = _prebuilt
            (
                self.batch_size,
                _,
                self.height,
                self.width,
                self.n_channels,
            ) = self.images.shape
        else:
            images = jnp.asarray(images)
            assert images.ndim == 4, "expected [B, H, W, C]"
            self.batch_size, self.height, self.width, self.n_channels = images.shape
            assert self.height % self.patch_size == 0
            assert self.width % self.patch_size == 0
            if images.dtype == jnp.uint8:
                assert self.n_glimps_levels == 1, (
                    "uint8 image storage requires n_glimps_levels == 1"
                )
            bboxes = jnp.asarray(bboxes)
            if box_valid is None:
                box_valid = (bboxes[..., 2] > bboxes[..., 0]) & (
                    bboxes[..., 3] > bboxes[..., 1]
                )
            self.bboxes = bboxes
            self.box_valid = box_valid
            nv = self.height // self.patch_size
            nh = self.width // self.patch_size
            self.bbox_masks = jax.vmap(
                lambda b, v: boxes_to_patch_mask(
                    b, v, nv, nh, self.patch_size, xp=jnp
                )
            )(bboxes, box_valid)
            self.images = build_glimpse_pyramid(
                images, self.patch_size, self.n_glimps_levels
            )

        self.n_vertical_patches = self.height // self.patch_size
        self.n_horizontal_patches = self.width // self.patch_size

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        leaves = (self.images, self.bboxes, self.box_valid, self.bbox_masks)
        aux = (
            self.patch_size,
            self.max_ep_len,
            self.n_glimps_levels,
            self.stop_enabled,
            self.terminate_on_all_found,
            self.stop_bonus_scale,
        )
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        (
            patch_size,
            max_ep_len,
            n_glimps_levels,
            stop_enabled,
            terminate_on_all_found,
            stop_bonus_scale,
        ) = aux
        return cls(
            None,
            None,
            patch_size,
            max_ep_len,
            n_glimps_levels,
            stop_enabled,
            terminate_on_all_found=terminate_on_all_found,
            stop_bonus_scale=stop_bonus_scale,
            _prebuilt=leaves,
        )

    # --- env API ----------------------------------------------------------
    def reset(
        self, key: Optional[jax.Array] = None, positions: Optional[jax.Array] = None
    ) -> Tuple[EnvState, jax.Array, dict]:
        """Fresh state with random (or given) positions (reference:
        src/env/general_env.py:144-170)."""
        if positions is None:
            assert key is not None
            ky, kx = jax.random.split(key)
            positions = jnp.stack(
                [
                    jax.random.randint(
                        ky, (self.batch_size,), 0, self.n_vertical_patches
                    ),
                    jax.random.randint(
                        kx, (self.batch_size,), 0, self.n_horizontal_patches
                    ),
                ],
                axis=1,
            )
        positions = jnp.asarray(positions, jnp.int32)
        state = EnvState(
            positions=positions,
            visited=self._tiles_reached(positions),
            steps=jnp.zeros((self.batch_size,), jnp.int32),
            has_stopped=jnp.zeros((self.batch_size,), bool),
        )
        return state, self.get_patches(state), {"positions": positions}

    def step(
        self, state: EnvState, actions: jax.Array
    ) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array, dict]:
        """Apply actions; returns (state, patches, rewards, terminated,
        truncated, infos). Reward/termination parity with reference
        src/env/general_env.py:172-246 and 321-358."""
        actions = jnp.asarray(actions, jnp.int32)
        deltas = jnp.asarray(ACTION_DELTAS_ARRAY)[actions]
        positions = state.positions + deltas
        positions = jnp.stack(
            [
                jnp.clip(positions[:, 0], 0, self.n_vertical_patches - 1),
                jnp.clip(positions[:, 1], 0, self.n_horizontal_patches - 1),
            ],
            axis=1,
        )
        has_stopped = state.has_stopped | (actions == Action.STOP.value)

        # Rewards use pre-update `visited` and post-update positions/stops
        # (reference: src/env/general_env.py:193-197, 321-358).
        rewards = self._rewards(positions, state.visited, has_stopped)

        visited = state.visited | self._tiles_reached(positions)
        steps = state.steps + 1
        new_state = EnvState(positions, visited, steps, has_stopped)

        terminated = self.terminated(new_state)
        truncated = steps >= self.max_ep_len
        patches = self.get_patches(new_state)
        return new_state, patches, rewards, terminated, truncated, {
            "positions": positions
        }

    def masked_step(self, state, actions, frozen):
        """Step, but a no-op where ``frozen`` (bool) is True.

        Used by fixed-length scan rollouts: once every episode in the batch
        is done the reference breaks out of its Python loop (reference:
        src/reinforce.py:181-184); here the remaining scan iterations keep
        the state bit-for-bit unchanged instead.
        """
        new_state, patches, rewards, terminated, truncated, infos = self.step(
            state, actions
        )
        keep = lambda new, old: jnp.where(
            frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
        )
        state = EnvState(
            positions=keep(new_state.positions, state.positions),
            visited=keep(new_state.visited, state.visited),
            steps=keep(new_state.steps, state.steps),
            has_stopped=keep(new_state.has_stopped, state.has_stopped),
        )
        rewards = jnp.where(frozen, 0.0, rewards)
        patches = self.get_patches(state)
        return state, patches, rewards, self.terminated(state), (
            state.steps >= self.max_ep_len
        ), infos

    def terminated(self, state: EnvState) -> jax.Array:
        """STOP pressed (stop mode) or all bbox patches visited (reference:
        src/env/general_env.py:235-246)."""
        if self.stop_enabled:
            return state.has_stopped
        if not self.terminate_on_all_found:
            return jnp.zeros((self.batch_size,), bool)
        missing = self.bbox_masks & ~state.visited
        return ~missing.any(axis=(1, 2))

    def _tiles_reached(self, positions: jax.Array) -> jax.Array:
        """One-hot [B, nv, nh] mask of current positions (reference:
        src/env/general_env.py:248-283)."""
        y = jax.nn.one_hot(positions[:, 0], self.n_vertical_patches, dtype=bool)
        x = jax.nn.one_hot(positions[:, 1], self.n_horizontal_patches, dtype=bool)
        return y[:, :, None] & x[:, None, :]

    def _rewards(self, positions, visited, has_stopped) -> jax.Array:
        """+1 for a new bbox patch, -1/max_ep_len step cost, +/- found-count
        STOP bonus/penalty (reference: src/env/general_env.py:321-358)."""
        b = jnp.arange(self.batch_size)
        at_pos_bbox = self.bbox_masks[b, positions[:, 0], positions[:, 1]]
        at_pos_visited = visited[b, positions[:, 0], positions[:, 1]]
        found_new = (at_pos_bbox & ~at_pos_visited).astype(jnp.float32)

        costs = jnp.full((self.batch_size,), -1.0 / self.max_ep_len)

        stop_eval = jnp.zeros((self.batch_size,), jnp.float32)
        if self.stop_enabled:
            bboxes_found = (visited & self.bbox_masks).sum(axis=(1, 2))
            all_bboxes = self.bbox_masks.sum(axis=(1, 2))
            found_all = (bboxes_found == all_bboxes).astype(jnp.float32)
            stop_eval = found_all * bboxes_found + (1.0 - found_all) * (
                bboxes_found - all_bboxes
            )
            stop_eval = (
                stop_eval
                * has_stopped.astype(jnp.float32)
                * self.stop_bonus_scale
            )

        return found_new + costs + stop_eval

    def get_patches(self, state: EnvState) -> jax.Array:
        """Gather the [B, L, P, P, C] patches under the agents.

        ``vmap(lax.dynamic_slice)`` over the batch — replaces the reference's
        per-sample Python loop (reference: src/env/general_env.py:285-306).
        """
        p = self.patch_size

        def gather_one(image_pyramid, pos):
            return jax.lax.dynamic_slice(
                image_pyramid,
                (0, pos[0] * p, pos[1] * p, 0),
                (self.n_glimps_levels, p, p, self.n_channels),
            )

        return self._normalize(jax.vmap(gather_one)(self.images, state.positions))

    def gather_patches_at(self, coords: jax.Array) -> jax.Array:
        """Gather level-0 patches at arbitrary [B, K, 2] patch coords."""
        p = self.patch_size

        def gather_one(image_pyramid, pos):
            return jax.lax.dynamic_slice(
                image_pyramid,
                (0, pos[0] * p, pos[1] * p, 0),
                (1, p, p, self.n_channels),
            )[0]

        return self._normalize(
            jax.vmap(jax.vmap(gather_one, in_axes=(None, 0)))(self.images, coords)
        )

    def _normalize(self, patches: jax.Array) -> jax.Array:
        """uint8-stored pixels -> float32 in [0, 1]; float passes through."""
        if patches.dtype == jnp.uint8:
            return patches.astype(jnp.float32) / 255.0
        return patches

    # --- metrics ----------------------------------------------------------
    def prop_patches_found(self, state: EnvState) -> jax.Array:
        """Fraction of bbox patches visited (reference:
        src/env/general_env.py:308-315)."""
        count = (self.bbox_masks & state.visited).sum(axis=(1, 2))
        tot = self.bbox_masks.sum(axis=(1, 2))
        return count / jnp.maximum(tot, 1)

    def prop_bboxes_found(self, state: EnvState) -> jax.Array:
        return (self.prop_patches_found(state) > 0).astype(jnp.float32)

    # --- detection training/eval support -----------------------------------
    def local_boxes(self):
        """Split boxes across the patch grid.

        Returns ``local [B, nv, nh, N, 4]`` (local xyxy) and validity
        ``[B, nv, nh, N]`` (reference: src/env/general_env.py:381-504).
        """
        nv, nh = self.n_vertical_patches, self.n_horizontal_patches
        return jax.vmap(
            lambda b, v: split_boxes_to_patches(b, v, nv, nh, self.patch_size, xp=jnp)
        )(self.bboxes, self.box_valid)

    def get_detection_batch(
        self, key: jax.Array, max_patches: int, sample_neg: int = 1
    ):
        """Fixed-shape detection training batch.

        All positive patches (containing a box) plus ``sample_neg`` random
        negatives per image, capped at ``max_patches`` (reference dynamic
        version: src/env/general_env.py:506-546).

        Returns:
            patches: ``[B, K, P, P, C]``
            targets: ``[B, K, N, 6]`` rows (cls, x1, y1, x2, y2, obj), local.
            patch_valid: ``[B, K]`` bool.
        """
        local, box_masks = self.local_boxes()
        nv, nh = self.n_vertical_patches, self.n_horizontal_patches
        pos_mask = box_masks.any(axis=-1)  # [B, nv, nh]
        flat_pos = pos_mask.reshape(self.batch_size, nv * nh)

        # Score: positives first, then `sample_neg` random negatives.
        # Negatives are ranked among THEMSELVES (positives pushed to +inf so
        # they occupy the highest ranks): negative k-th by noise has
        # neg_rank == k, making `neg_rank < sample_neg` select exactly
        # sample_neg random negatives whenever that many exist.
        noise = jax.random.uniform(key, flat_pos.shape)
        neg_rank = jnp.argsort(
            jnp.argsort(jnp.where(flat_pos, jnp.inf, noise), axis=-1), axis=-1
        )
        score = jnp.where(
            flat_pos, 2.0, jnp.where(neg_rank < sample_neg, 1.0, 0.0)
        ) + 1e-3 * noise
        _, idx = jax.lax.top_k(score, max_patches)  # [B, K]
        picked_pos = flat_pos[jnp.arange(self.batch_size)[:, None], idx]
        picked_neg_rank = neg_rank[jnp.arange(self.batch_size)[:, None], idx]
        patch_valid = picked_pos | (picked_neg_rank < sample_neg)

        coords = jnp.stack([idx // nh, idx % nh], axis=-1)  # [B, K, 2] (y, x)
        patches = self.gather_patches_at(coords)

        tgt_boxes = local[
            jnp.arange(self.batch_size)[:, None], coords[..., 0], coords[..., 1]
        ]  # [B, K, N, 4]
        tgt_valid = box_masks[
            jnp.arange(self.batch_size)[:, None], coords[..., 0], coords[..., 1]
        ]  # [B, K, N]
        targets = jnp.concatenate(
            [
                jnp.zeros(tgt_boxes.shape[:-1] + (1,), tgt_boxes.dtype),
                tgt_boxes,
                tgt_valid[..., None].astype(tgt_boxes.dtype),
            ],
            axis=-1,
        )
        targets = targets * patch_valid[..., None, None].astype(targets.dtype)
        return patches, targets, patch_valid
