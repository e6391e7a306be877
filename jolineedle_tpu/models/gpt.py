"""GPT-style causal decision decoder with fused multi-modal token embeddings.

Reimplementation of the reference decision model (reference:
src/models/gpt.py:143-534), TPU-first:

  - Input token = fusion (concat+linear or mean) of 4 embeddings: action
    token, sequence position (learned table or 1D sinusoidal), patch
    embedding (YOLOX FPN top level -> 1x1 conv + ReLU + flatten + linear),
    and 2D sinusoidal patch-grid position (reference: gpt.py:419-479).
  - A class-conditional token is prepended (reference: gpt.py:227-231,
    475-478); its output logit is dropped (token_offset).
  - Decode path: a real KV cache (``init_cache`` / ``decode_step``) instead
    of the reference's embedding-only cache (reference: gpt.py:427-435) —
    the transformer runs O(1) work per rollout step and the whole rollout
    stays inside one ``lax.scan``.
  - Attention dispatches to a Pallas flash kernel for tile-aligned shapes
    (ops/attention.py); at needle-scale sequence lengths the fused jnp path
    is optimal.

The YOLOX detector is a submodule (params subtree ``yolox``) so the
two-optimizer partition of the reference (gpt.py:547-562) is an optax mask.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import causal_attention
from .positional import positional_encoding_1d, positional_encoding_2d
from .yolox import NeedleYOLOX, YOLOPAFPN, YOLOX_VARIANTS

DENSE_INIT = nn.initializers.normal(stddev=0.02)
EMBED_INIT = nn.initializers.normal(stddev=0.02)


class CausalSelfAttention(nn.Module):
    n_head: int
    n_embd: int
    dropout: float
    n_layer: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        cache: Optional[dict] = None,
        cache_index: Optional[jax.Array] = None,
    ):
        B, T, C = x.shape
        hd = C // self.n_head
        qkv = nn.Dense(3 * C, kernel_init=DENSE_INIT, dtype=self.dtype, name="c_attn")(
            x
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_head, hd)
        k = k.reshape(B, T, self.n_head, hd)
        v = v.reshape(B, T, self.n_head, hd)

        if cache is None:
            y = causal_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
            ).transpose(0, 2, 1, 3)
            new_cache = None
        else:
            # Single-token decode: T == 1, write k/v at cache_index.
            assert T == 1
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k, (0, cache_index, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v, (0, cache_index, 0, 0)
            )
            s = ck.shape[1]
            att = jnp.einsum("bqhd,bkhd->bhqk", q, ck) / jnp.sqrt(
                jnp.float32(hd)
            ).astype(q.dtype)
            mask = jnp.arange(s)[None, None, None, :] <= cache_index
            att = jnp.where(mask, att, -1e30)
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
            y = jnp.einsum("bhqk,bkhd->bqhd", att, cv)
            new_cache = {"k": ck, "v": cv}

        y = y.reshape(B, T, C)
        proj_init = nn.initializers.normal(stddev=0.02 / (2 * self.n_layer) ** 0.5)
        y = nn.Dense(C, kernel_init=proj_init, dtype=self.dtype, name="c_proj")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y, new_cache


class Block(nn.Module):
    """Pre-LN transformer block (reference: src/models/gpt.py:111-140)."""

    n_head: int
    n_embd: int
    dropout: float
    n_layer: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, cache=None, cache_index=None):
        attn_out, new_cache = CausalSelfAttention(
            self.n_head, self.n_embd, self.dropout, self.n_layer, self.dtype,
            name="attn",
        )(nn.LayerNorm(name="ln_1")(x), deterministic, cache, cache_index)
        x = x + attn_out
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(
            4 * self.n_embd, kernel_init=DENSE_INIT, dtype=self.dtype, name="c_fc"
        )(h)
        h = nn.gelu(h, approximate=True)
        proj_init = nn.initializers.normal(stddev=0.02 / (2 * self.n_layer) ** 0.5)
        h = nn.Dense(
            self.n_embd, kernel_init=proj_init, dtype=self.dtype, name="c_proj"
        )(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h, new_cache


class ActionHead(nn.Module):
    """Bias-free linear head(s), one per ActionInfo (reference:
    src/models/action_head.py:14-33). In practice one categorical head."""

    n_actions: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.n_actions, use_bias=False, kernel_init=DENSE_INIT)(x)


class GPT(nn.Module):
    """Decision decoder + embedded YOLOX detector.

    Construct with :meth:`from_config` from a model CfgNode.
    """

    n_layer: int
    n_head: int
    n_embd: int
    block_size: int  # number of action tokens (class token adds 1)
    n_actions: int
    dropout: float
    patch_size: int
    n_channels: int
    image_processor: str
    gpt_backbone: Optional[str]
    use_pos_emb: bool
    no_patch_emb: bool
    concat_emb: bool
    decoder_pos_encoding: bool
    pos_emb_size: int
    detector_conf_threshold: float = 0.5
    compute_dtype: Any = jnp.float32
    #: Disable the incremental-decode optimization: rollouts re-run the full
    #: forward over the whole prefix each step instead of KV-cache decode
    #: (reference: main.py:301-306, src/models/gpt.py:427-435 — there it
    #: disables the embedding cache; here the analogous "no reuse" path).
    #: The two paths are numerically identical (tested); the flag survives as
    #: a debugging oracle, like the reference's "deprecated" marker implies.
    no_recurrent_embedding: bool = False

    token_offset: int = 1  # class-conditional token (reference: gpt.py:229-231)

    @classmethod
    def from_config(cls, model_config, actions_info, compute_dtype=None):
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            compute_dtype or getattr(model_config, "compute_dtype", "float32")
        ]
        return cls(
            n_layer=model_config.n_layer,
            n_head=model_config.n_head,
            n_embd=model_config.n_embd,
            block_size=model_config.block_size,
            n_actions=actions_info[0].nclasses,
            dropout=model_config.dropout,
            patch_size=model_config.patch_size,
            n_channels=model_config.n_channels,
            image_processor=model_config.image_processor,
            gpt_backbone=model_config.gpt_backbone,
            use_pos_emb=model_config.use_pos_emb,
            no_patch_emb=model_config.no_patch_emb,
            concat_emb=model_config.concat_emb,
            decoder_pos_encoding=model_config.decoder_pos_encoding,
            pos_emb_size=model_config.pos_emb_size,
            detector_conf_threshold=model_config.detector_conf_threshold,
            compute_dtype=dtype,
            no_recurrent_embedding=getattr(
                model_config, "no_recurrent_embedding", False
            ),
        )

    def setup(self):
        self.wte = nn.Embed(self.n_actions, self.n_embd, embedding_init=EMBED_INIT)
        if not self.decoder_pos_encoding:
            self.wpe = nn.Embed(
                self.pos_emb_size, self.n_embd, embedding_init=EMBED_INIT
            )
        self.embed_class = nn.Embed(100, self.n_embd, embedding_init=EMBED_INIT)

        self.yolox = NeedleYOLOX(
            variant=self.image_processor, num_classes=1, dtype=self.compute_dtype
        )
        if self.gpt_backbone:
            depth, width, depthwise = YOLOX_VARIANTS[self.gpt_backbone]
            self.gpt_backbone_net = YOLOPAFPN(
                depth, width, depthwise, dtype=self.compute_dtype
            )

        if not self.no_patch_emb:
            self.embed_fpn_conv = nn.Conv(
                self.n_embd, (1, 1), use_bias=False, dtype=self.compute_dtype
            )
            self.embed_fpn_dense = nn.Dense(self.n_embd, kernel_init=DENSE_INIT)

        if self.concat_emb:
            n_embeddings = 2  # action token + seq pos
            if not self.no_patch_emb:
                n_embeddings += 1
            if self.use_pos_emb:
                n_embeddings += 1
            self.project_concat = nn.Dense(self.n_embd, kernel_init=DENSE_INIT)

        self.blocks = [
            Block(
                self.n_head,
                self.n_embd,
                self.dropout,
                self.n_layer,
                self.compute_dtype,
                name=f"h_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm()
        self.action_head = ActionHead(self.n_actions)
        self.drop = nn.Dropout(self.dropout)

    # --- embedding fusion ---------------------------------------------------
    def embed_patches(self, patches: jax.Array, train: bool = False) -> jax.Array:
        """[B, T, P, P, C] -> [B, T, D] via backbone FPN top level
        (reference: src/models/gpt.py:356-384). With a shared detector the
        gradient is stopped so the decision loss never touches the detector
        (reference: gpt.py:377-380)."""
        B, T = patches.shape[:2]
        if patches.dtype == jnp.uint8:  # uint8-shipped patches, see ops/augment
            patches = patches.astype(jnp.float32) / 255.0
        flat = patches.reshape((B * T,) + patches.shape[2:]).astype(
            self.compute_dtype
        )
        if self.gpt_backbone:
            fpn = self.gpt_backbone_net(flat, train)
        else:
            fpn = self.yolox.backbone(flat, train)
            fpn = tuple(jax.lax.stop_gradient(f) for f in fpn)
        top = fpn[-1]
        x = self.embed_fpn_conv(top)
        x = nn.relu(x)
        x = x.reshape(B * T, -1).astype(jnp.float32)
        x = self.embed_fpn_dense(x)
        return x.reshape(B, T, self.n_embd)

    def embed_token_positions(self, seq_positions: jax.Array) -> jax.Array:
        """[B, T] integer sequence positions -> [B, T, D]
        (reference: src/models/gpt.py:331-354)."""
        if self.decoder_pos_encoding:
            return positional_encoding_1d(seq_positions, self.n_embd)
        return self.wpe(seq_positions)

    def embed_patch_position(self, positions: jax.Array) -> jax.Array:
        """[B, T, 2] (y, x) -> [B, T, D] 2D sinusoidal encoding
        (reference: src/models/gpt.py:386-417)."""
        return positional_encoding_2d(positions, self.n_embd)

    def _fuse_tokens(
        self,
        actions: jax.Array,  # [B, T]
        seq_positions: jax.Array,  # [B, T]
        patches: Optional[jax.Array],  # [B, T, P, P, C]
        positions: Optional[jax.Array],  # [B, T, 2]
        train: bool,
    ) -> jax.Array:
        embeddings = [self.wte(actions)]
        embeddings.append(self.embed_token_positions(seq_positions))
        if not self.no_patch_emb:
            embeddings.append(self.embed_patches(patches, train))
        if self.use_pos_emb:
            embeddings.append(self.embed_patch_position(positions))
        if self.concat_emb:
            return self.project_concat(jnp.concatenate(embeddings, axis=-1))
        return jnp.mean(jnp.stack(embeddings, axis=2), axis=2)

    # --- full (teacher-forced) forward ---------------------------------------
    def __call__(
        self,
        patches: jax.Array,
        actions: jax.Array,
        classes: jax.Array,
        positions: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (action_logits [B, T, n_actions], final embeddings).

        Parity with reference GPT.forward (src/models/gpt.py:481-534):
        class token prepended, first ``token_offset`` logits dropped.
        """
        B, T = actions.shape
        assert T <= self.block_size, f"seq len {T} > block size {self.block_size}"
        seq_positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        tokens = self._fuse_tokens(actions, seq_positions, patches, positions, train)
        class_tok = self.embed_class(classes)[:, None, :]
        x = jnp.concatenate([class_tok, tokens], axis=1)

        x = self.drop(x, deterministic=not train)
        x = x.astype(self.compute_dtype)
        for block in self.blocks:
            x, _ = block(x, deterministic=not train)
        x = self.ln_f(x.astype(jnp.float32))
        logits = self.action_head(x)
        return logits[:, self.token_offset :], x

    # --- incremental decode ---------------------------------------------------
    def empty_cache(self, batch_size: int) -> dict:
        s = self.block_size + self.token_offset
        hd = self.n_embd // self.n_head
        return {
            "layers": [
                {
                    "k": jnp.zeros((batch_size, s, self.n_head, hd), self.compute_dtype),
                    "v": jnp.zeros((batch_size, s, self.n_head, hd), self.compute_dtype),
                }
                for _ in range(self.n_layer)
            ],
            "index": jnp.zeros((), jnp.int32),
        }

    def _decode_token(self, x: jax.Array, cache: dict) -> Tuple[jax.Array, dict]:
        """Run one [B, 1, D] token through the stack, updating the cache."""
        idx = cache["index"]
        x = x.astype(self.compute_dtype)
        new_layers = []
        for block, layer_cache in zip(self.blocks, cache["layers"]):
            x, new_lc = block(
                x, deterministic=True, cache=layer_cache, cache_index=idx
            )
            new_layers.append(new_lc)
        y = self.ln_f(x.astype(jnp.float32))
        logits = self.action_head(y)[:, 0]
        return logits, {"layers": new_layers, "index": idx + 1}

    def init_cache(self, classes: jax.Array) -> dict:
        """Process the class-conditional token into a fresh KV cache."""
        cache = self.empty_cache(classes.shape[0])
        class_tok = self.embed_class(classes)[:, None, :]
        _, cache = self._decode_token(class_tok, cache)
        return cache

    def decode_step(
        self,
        cache: dict,
        patch: jax.Array,  # [B, P, P, C]
        action: jax.Array,  # [B]
        position: Optional[jax.Array],  # [B, 2]
        step: jax.Array,  # scalar int: 0-based action-token index
    ) -> Tuple[jax.Array, dict]:
        """One rollout step: embed the newest token only, attend via cache.

        Numerically identical (dropout off) to calling the full forward on
        the whole prefix and taking the last logit — tested in
        tests/test_models.py.
        """
        B = action.shape[0]
        seq_positions = jnp.broadcast_to(step[None], (B,))[:, None]  # [B, 1]
        tokens = self._fuse_tokens(
            action[:, None],
            seq_positions,
            None if self.no_patch_emb else patch[:, None],
            None if position is None else position[:, None],
            train=False,
        )
        return self._decode_token(tokens, cache)

    # --- detector -------------------------------------------------------------
    def yolox_outputs(self, patches: jax.Array, train: bool = False):
        """Raw YOLOX head outputs on [B, P, P, C] patches."""
        if patches.dtype == jnp.uint8:  # uint8-shipped patches, see ops/augment
            patches = patches.astype(jnp.float32) / 255.0
        return self.yolox(patches.astype(self.compute_dtype), train)

    def init_all(self, patches, actions, classes, positions, det_patches):
        """Initialization entry point touching every submodule (the plain
        forward never runs the YOLOX head, so ``init`` on it alone would
        leave the head without params)."""
        out = self(patches, actions, classes, positions)
        det = self.yolox_outputs(det_patches)
        return out, det
