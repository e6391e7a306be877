"""YOLOX in JAX/Flax: CSPDarknet backbone, PAFPN neck, decoupled head.

Independent reimplementation of the architecture the reference consumes from
the external ``yolox`` pip package (Megvii YOLOX; used by reference:
src/models/yolox.py:7-10 and src/models/gpt.py:24,242-259). NHWC layout
(TPU-native), SiLU activations, BatchNorm(eps=1e-3, momentum=0.97-flax).

Size variants (depth multiplier, width multiplier, depthwise) match the
upstream factory functions referenced at src/models/gpt.py:242-250.

The training loss (SimOTA assignment) lives in ops/simota.py; host-side
postprocess (confidence filter + NMS) in ops/nms.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# (depth, width, depthwise) per variant.
YOLOX_VARIANTS = {
    "yolox": (0.33, 0.25, True),  # alias of nano (reference: gpt.py:243)
    "yolox-nano": (0.33, 0.25, True),
    "yolox-tiny": (0.33, 0.375, False),
    "yolox-s": (0.33, 0.50, False),
    "yolox-m": (0.67, 0.75, False),
    "yolox-l": (1.0, 1.0, False),
    "yolox-x": (1.33, 1.25, False),
}

STRIDES = (8, 16, 32)


class ConvBnAct(nn.Module):
    """Conv (no bias) + BatchNorm + SiLU."""

    features: int
    ksize: int = 1
    stride: int = 1
    groups: int = 1
    use_act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(
            self.features,
            (self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        if self.use_act:
            x = nn.silu(x)
        return x


class DWConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (nano variant)."""

    features: int
    ksize: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(
            x.shape[-1],
            self.ksize,
            self.stride,
            groups=x.shape[-1],
            dtype=self.dtype,
        )(x, train)
        return ConvBnAct(self.features, 1, 1, dtype=self.dtype)(x, train)


def _base_conv(depthwise: bool):
    return DWConv if depthwise else ConvBnAct


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, 1, dtype=self.dtype)(x, train)
        if self.depthwise:
            y = DWConv(self.features, 3, 1, dtype=self.dtype)(y, train)
        else:
            y = ConvBnAct(self.features, 3, 1, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = y + x
        return y


class CSPLayer(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        x1 = ConvBnAct(hidden, 1, 1, dtype=self.dtype)(x, train)
        x2 = ConvBnAct(hidden, 1, 1, dtype=self.dtype)(x, train)
        for _ in range(self.n):
            x1 = Bottleneck(
                hidden, self.shortcut, 1.0, self.depthwise, dtype=self.dtype
            )(x1, train)
        x = jnp.concatenate([x1, x2], axis=-1)
        return ConvBnAct(self.features, 1, 1, dtype=self.dtype)(x, train)


class SPPBottleneck(nn.Module):
    features: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, 1, dtype=self.dtype)(x, train)
        pools = [
            nn.max_pool(
                x,
                (k, k),
                strides=(1, 1),
                padding=[(k // 2, k // 2), (k // 2, k // 2)],
            )
            for k in self.kernel_sizes
        ]
        x = jnp.concatenate([x] + pools, axis=-1)
        return ConvBnAct(self.features, 1, 1, dtype=self.dtype)(x, train)


class Focus(nn.Module):
    """Space-to-depth stem: [H, W, C] -> [H/2, W/2, 4C] -> conv."""

    features: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = x[:, ::2, ::2, :]
        bl = x[:, 1::2, ::2, :]
        tr = x[:, ::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBnAct(self.features, self.ksize, 1, dtype=self.dtype)(x, train)


class CSPDarknet(nn.Module):
    depth: float
    width: float
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        base_ch = int(self.width * 64)
        base_depth = max(round(self.depth * 3), 1)
        Conv = _base_conv(self.depthwise)
        dt = self.dtype

        x = Focus(base_ch, 3, dtype=dt)(x, train)  # stride 2
        # dark2
        x = Conv(base_ch * 2, 3, 2, dtype=dt)(x, train)
        x = CSPLayer(base_ch * 2, base_depth, depthwise=self.depthwise, dtype=dt)(
            x, train
        )
        # dark3
        x = Conv(base_ch * 4, 3, 2, dtype=dt)(x, train)
        x = c3 = CSPLayer(
            base_ch * 4, base_depth * 3, depthwise=self.depthwise, dtype=dt
        )(x, train)
        # dark4
        x = Conv(base_ch * 8, 3, 2, dtype=dt)(x, train)
        x = c4 = CSPLayer(
            base_ch * 8, base_depth * 3, depthwise=self.depthwise, dtype=dt
        )(x, train)
        # dark5
        x = Conv(base_ch * 16, 3, 2, dtype=dt)(x, train)
        x = SPPBottleneck(base_ch * 16, dtype=dt)(x, train)
        x = c5 = CSPLayer(
            base_ch * 16,
            base_depth,
            shortcut=False,
            depthwise=self.depthwise,
            dtype=dt,
        )(x, train)
        return c3, c4, c5


class YOLOPAFPN(nn.Module):
    """FPN + bottom-up path aggregation over (stride 8, 16, 32) features."""

    depth: float
    width: float
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        c3, c4, c5 = CSPDarknet(
            self.depth, self.width, self.depthwise, dtype=self.dtype
        )(x, train)
        ch = [int(256 * self.width), int(512 * self.width), int(1024 * self.width)]
        n = max(round(self.depth * 3), 1)
        Conv = _base_conv(self.depthwise)
        dt = self.dtype

        def upsample(y):
            b, h, w, c = y.shape
            return jax.image.resize(y, (b, h * 2, w * 2, c), method="nearest")

        fpn_out0 = ConvBnAct(ch[1], 1, 1, dtype=dt)(c5, train)  # lateral_conv0
        f_out0 = jnp.concatenate([upsample(fpn_out0), c4], axis=-1)
        f_out0 = CSPLayer(
            ch[1], n, shortcut=False, depthwise=self.depthwise, dtype=dt
        )(f_out0, train)

        fpn_out1 = ConvBnAct(ch[0], 1, 1, dtype=dt)(f_out0, train)  # reduce_conv1
        f_out1 = jnp.concatenate([upsample(fpn_out1), c3], axis=-1)
        pan_out2 = CSPLayer(
            ch[0], n, shortcut=False, depthwise=self.depthwise, dtype=dt
        )(f_out1, train)

        p_out1 = Conv(ch[0], 3, 2, dtype=dt)(pan_out2, train)  # bu_conv2
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(
            ch[1], n, shortcut=False, depthwise=self.depthwise, dtype=dt
        )(p_out1, train)

        p_out0 = Conv(ch[1], 3, 2, dtype=dt)(pan_out1, train)  # bu_conv1
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(
            ch[2], n, shortcut=False, depthwise=self.depthwise, dtype=dt
        )(p_out0, train)

        return pan_out2, pan_out1, pan_out0


def make_grids_and_strides(patch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor-point grid (x, y) and stride per anchor, all levels flattened."""
    grids, strides = [], []
    for s in STRIDES:
        hs = patch_size // s
        ws = patch_size // s
        yy, xx = jnp.meshgrid(jnp.arange(hs), jnp.arange(ws), indexing="ij")
        grids.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strides.append(jnp.full((hs * ws,), s, jnp.float32))
    return (
        jnp.concatenate(grids, axis=0).astype(jnp.float32),
        jnp.concatenate(strides, axis=0),
    )


class YOLOXHead(nn.Module):
    """Decoupled head. Returns raw per-anchor (reg, obj, cls) plus decoded
    boxes; losses are computed in ops/simota.py."""

    num_classes: int = 1
    width: float = 1.0
    depthwise: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False) -> dict:
        Conv = _base_conv(self.depthwise)
        hidden = int(256 * self.width)
        dt = self.dtype

        raw_regs, obj_logits, cls_logits = [], [], []
        for level, f in enumerate(features):
            x = ConvBnAct(hidden, 1, 1, dtype=dt, name=f"stem_{level}")(f, train)
            cls_feat = Conv(hidden, 3, 1, dtype=dt, name=f"cls_conv0_{level}")(
                x, train
            )
            cls_feat = Conv(hidden, 3, 1, dtype=dt, name=f"cls_conv1_{level}")(
                cls_feat, train
            )
            reg_feat = Conv(hidden, 3, 1, dtype=dt, name=f"reg_conv0_{level}")(
                x, train
            )
            reg_feat = Conv(hidden, 3, 1, dtype=dt, name=f"reg_conv1_{level}")(
                reg_feat, train
            )
            cls_out = nn.Conv(
                self.num_classes, (1, 1), dtype=dt, name=f"cls_pred_{level}"
            )(cls_feat)
            reg_out = nn.Conv(4, (1, 1), dtype=dt, name=f"reg_pred_{level}")(reg_feat)
            obj_out = nn.Conv(1, (1, 1), dtype=dt, name=f"obj_pred_{level}")(reg_feat)

            b = f.shape[0]
            raw_regs.append(reg_out.reshape(b, -1, 4))
            obj_logits.append(obj_out.reshape(b, -1))
            cls_logits.append(cls_out.reshape(b, -1, self.num_classes))

        raw_reg = jnp.concatenate(raw_regs, axis=1).astype(jnp.float32)
        obj = jnp.concatenate(obj_logits, axis=1).astype(jnp.float32)
        cls = jnp.concatenate(cls_logits, axis=1).astype(jnp.float32)

        # Decode: cxcywh in pixels (reference upstream get_output_and_grid).
        patch = features[0].shape[1] * STRIDES[0]
        grids, strides = make_grids_and_strides(patch)
        xy = (raw_reg[..., :2] + grids[None]) * strides[None, :, None]
        wh = jnp.exp(raw_reg[..., 2:4]) * strides[None, :, None]
        boxes = jnp.concatenate([xy, wh], axis=-1)

        return {
            "boxes": boxes,  # [B, A, 4] cxcywh pixels
            "obj_logits": obj,  # [B, A]
            "cls_logits": cls,  # [B, A, nc]
            "raw_reg": raw_reg,  # [B, A, 4]
            "grids": grids,  # [A, 2] (x, y)
            "strides": strides,  # [A]
        }


class NeedleYOLOX(nn.Module):
    """Backbone+head wrapper (reference: src/models/yolox.py:17-91).

    ``__call__`` returns (head_outputs, fpn_outs); loss and postprocess live
    in ops/ so that train/eval paths stay pure and fixed-shape.
    """

    variant: str = "yolox-s"
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        depth, width, depthwise = YOLOX_VARIANTS[self.variant]
        self.backbone = YOLOPAFPN(depth, width, depthwise, dtype=self.dtype)
        self.head = YOLOXHead(
            self.num_classes, width, depthwise, dtype=self.dtype
        )

    def __call__(self, patches, train: bool = False):
        fpn_outs = self.backbone(patches, train)
        outputs = self.head(fpn_outs, train)
        return outputs, fpn_outs

    def features(self, patches, train: bool = False):
        return self.backbone(patches, train)
