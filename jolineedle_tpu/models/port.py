"""Torch -> JAX weight porting for pretrained YOLOX checkpoints.

The reference downloads COCO-pretrained YOLOX weights from the upstream
(Megvii) release and loads them through torch (reference:
src/models/gpt.py:251-253; checkpoint format ``{"model": state_dict}``).
This module maps that state_dict onto the Flax parameter / batch-stats trees
of :class:`jolineedle_tpu.models.yolox.NeedleYOLOX`.

Key mapping is STRUCTURAL, not positional: for every upstream module
(BaseConv, DWConv, CSPLayer, Focus, SPPBottleneck, the PAFPN laterals, the
decoupled head) we emit explicit (torch key prefix -> flax path) pairs, so a
mismatch raises instead of silently mis-assigning (the ordering of torch's
``state_dict`` differs from Flax's insertion order inside CSPLayer, which
rules out naive ordered zipping).

Weight transforms:
  - conv:       OIHW -> HWIO
  - depthwise:  [C, 1, kh, kw] -> [kh, kw, 1, C] (feature_group_count=C)
  - batchnorm:  weight/bias -> scale/bias (params); running_mean/var ->
                mean/var (batch_stats)
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np

from .yolox import YOLOX_VARIANTS

# (torch suffix, flax collection, flax leaf, transform)
_CONV_LEAVES = (("conv.weight", "params", ("Conv_0", "kernel"), "conv"),)
_BN_LEAVES = (
    ("bn.weight", "params", ("BatchNorm_0", "scale"), "copy"),
    ("bn.bias", "params", ("BatchNorm_0", "bias"), "copy"),
    ("bn.running_mean", "batch_stats", ("BatchNorm_0", "mean"), "copy"),
    ("bn.running_var", "batch_stats", ("BatchNorm_0", "var"), "copy"),
)

MapEntry = Tuple[str, str, Tuple[str, ...], str]


def _base_conv(tprefix: str, fpath: Tuple[str, ...]) -> Iterator[MapEntry]:
    """Upstream BaseConv (conv + bn) -> our ConvBnAct."""
    for suffix, coll, leaf, tf in _CONV_LEAVES + _BN_LEAVES:
        yield f"{tprefix}.{suffix}", coll, fpath + leaf, tf


def _dw_conv(tprefix: str, fpath: Tuple[str, ...]) -> Iterator[MapEntry]:
    """Upstream DWConv (dconv + pconv BaseConvs) -> our DWConv
    (ConvBnAct_0 depthwise, ConvBnAct_1 pointwise)."""
    yield from _base_conv(f"{tprefix}.dconv", fpath + ("ConvBnAct_0",))
    yield from _base_conv(f"{tprefix}.pconv", fpath + ("ConvBnAct_1",))


def _conv(tprefix, fpath, depthwise: bool) -> Iterator[MapEntry]:
    if depthwise:
        yield from _dw_conv(tprefix, fpath)
    else:
        yield from _base_conv(tprefix, fpath)


def _bottleneck(tprefix, fpath, depthwise: bool) -> Iterator[MapEntry]:
    """Upstream Bottleneck: conv1 (1x1 BaseConv) + conv2 (3x3 Conv/DWConv)."""
    yield from _base_conv(f"{tprefix}.conv1", fpath + ("ConvBnAct_0",))
    if depthwise:
        yield from _dw_conv(f"{tprefix}.conv2", fpath + ("DWConv_0",))
    else:
        yield from _base_conv(f"{tprefix}.conv2", fpath + ("ConvBnAct_1",))


def _csp_layer(tprefix, fpath, n: int, depthwise: bool) -> Iterator[MapEntry]:
    """Upstream CSPLayer: conv1 (main branch), conv2 (bypass), conv3 (final),
    m.0..n-1 bottlenecks -> our ConvBnAct_0/1, Bottleneck_i, ConvBnAct_2."""
    yield from _base_conv(f"{tprefix}.conv1", fpath + ("ConvBnAct_0",))
    yield from _base_conv(f"{tprefix}.conv2", fpath + ("ConvBnAct_1",))
    for i in range(n):
        yield from _bottleneck(
            f"{tprefix}.m.{i}", fpath + (f"Bottleneck_{i}",), depthwise
        )
    yield from _base_conv(f"{tprefix}.conv3", fpath + ("ConvBnAct_2",))


def _spp(tprefix, fpath) -> Iterator[MapEntry]:
    yield from _base_conv(f"{tprefix}.conv1", fpath + ("ConvBnAct_0",))
    yield from _base_conv(f"{tprefix}.conv2", fpath + ("ConvBnAct_1",))


def _darknet(tprefix, fpath, depth: float, depthwise: bool) -> Iterator[MapEntry]:
    base_depth = max(round(depth * 3), 1)
    conv_i = 0
    conv_name = "DWConv" if depthwise else "ConvBnAct"
    # stem (Focus -> one ConvBnAct); upstream Focus holds a BaseConv even in
    # the depthwise variants.
    yield from _base_conv(
        f"{tprefix}.stem.conv", fpath + ("Focus_0", "ConvBnAct_0")
    )
    # dark2..dark4: Sequential(Conv, CSPLayer); dark5: (Conv, SPP, CSPLayer).
    for i, dark in enumerate(("dark2", "dark3", "dark4")):
        n = base_depth if dark == "dark2" else base_depth * 3
        yield from _conv(
            f"{tprefix}.{dark}.0", fpath + (f"{conv_name}_{conv_i}",), depthwise
        )
        yield from _csp_layer(
            f"{tprefix}.{dark}.1", fpath + (f"CSPLayer_{i}",), n, depthwise
        )
        conv_i += 1
    yield from _conv(
        f"{tprefix}.dark5.0", fpath + (f"{conv_name}_{conv_i}",), depthwise
    )
    yield from _spp(f"{tprefix}.dark5.1", fpath + ("SPPBottleneck_0",))
    yield from _csp_layer(
        f"{tprefix}.dark5.2", fpath + ("CSPLayer_3",), base_depth, depthwise
    )


def _pafpn(tprefix, fpath, depth: float, depthwise: bool) -> Iterator[MapEntry]:
    n = max(round(depth * 3), 1)
    conv_name = "DWConv" if depthwise else "ConvBnAct"
    yield from _darknet(
        f"{tprefix}.backbone", fpath + ("CSPDarknet_0",), depth, depthwise
    )
    # Call-order auto-names in YOLOPAFPN (models/yolox.py:238-260):
    # laterals are plain ConvBnAct; bu convs follow the depthwise switch.
    lateral_i = 0
    bu_i = 0
    yield from _base_conv(
        f"{tprefix}.lateral_conv0", fpath + (f"ConvBnAct_{lateral_i}",)
    )
    lateral_i += 1
    yield from _csp_layer(f"{tprefix}.C3_p4", fpath + ("CSPLayer_0",), n, depthwise)
    yield from _base_conv(
        f"{tprefix}.reduce_conv1", fpath + (f"ConvBnAct_{lateral_i}",)
    )
    lateral_i += 1
    yield from _csp_layer(f"{tprefix}.C3_p3", fpath + ("CSPLayer_1",), n, depthwise)
    if depthwise:
        yield from _dw_conv(f"{tprefix}.bu_conv2", fpath + (f"DWConv_{bu_i}",))
        bu_i += 1
    else:
        yield from _base_conv(
            f"{tprefix}.bu_conv2", fpath + (f"ConvBnAct_{lateral_i}",)
        )
        lateral_i += 1
    yield from _csp_layer(f"{tprefix}.C3_n3", fpath + ("CSPLayer_2",), n, depthwise)
    if depthwise:
        yield from _dw_conv(f"{tprefix}.bu_conv1", fpath + (f"DWConv_{bu_i}",))
    else:
        yield from _base_conv(
            f"{tprefix}.bu_conv1", fpath + (f"ConvBnAct_{lateral_i}",)
        )
    yield from _csp_layer(f"{tprefix}.C3_n4", fpath + ("CSPLayer_3",), n, depthwise)


def _head(tprefix, fpath, depthwise: bool) -> Iterator[MapEntry]:
    for level in range(3):
        yield from _base_conv(
            f"{tprefix}.stems.{level}", fpath + (f"stem_{level}",)
        )
        for branch in ("cls", "reg"):
            for j in range(2):
                yield from _conv(
                    f"{tprefix}.{branch}_convs.{level}.{j}",
                    fpath + (f"{branch}_conv{j}_{level}",),
                    depthwise,
                )
        for pred in ("cls", "reg", "obj"):
            yield (
                f"{tprefix}.{pred}_preds.{level}.weight",
                "params",
                fpath + (f"{pred}_pred_{level}", "kernel"),
                "conv",
            )
            yield (
                f"{tprefix}.{pred}_preds.{level}.bias",
                "params",
                fpath + (f"{pred}_pred_{level}", "bias"),
                "copy",
            )


def yolox_key_map(variant: str, include_head: bool = True) -> list:
    """All (torch key, collection, flax path, transform) entries for a
    full upstream YOLOX model of the given size variant."""
    depth, _, depthwise = YOLOX_VARIANTS[variant]
    entries = list(_pafpn("backbone", ("backbone",), depth, depthwise))
    if include_head:
        entries += list(_head("head", ("head",), depthwise))
    return entries


def _transform(value: np.ndarray, how: str) -> np.ndarray:
    value = np.asarray(value, np.float32)
    if how == "conv":
        return value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    return value


def _set_path(tree: dict, path: Tuple[str, ...], value, expect_shape=True):
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"missing subtree {'/'.join(path)} (at {p})")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"missing leaf {'/'.join(path)}")
    if expect_shape and tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"{tuple(node[leaf].shape)} vs {tuple(value.shape)}"
        )
    node[leaf] = value


def port_yolox_state_dict(
    state_dict: Dict[str, np.ndarray],
    params: dict,
    batch_stats: dict,
    variant: str,
    include_head: bool = True,
    num_classes: int = 1,
    strict: bool = True,
) -> Tuple[dict, dict, list]:
    """Port an upstream torch state_dict into copies of (params,
    batch_stats) for NeedleYOLOX. Returns (params, batch_stats, skipped).

    ``cls_preds`` are skipped when the checkpoint's class count differs from
    ``num_classes`` (COCO=80 vs needle=1) — exactly the partial load the
    reference relies on when fine-tuning from COCO weights.
    """
    import copy

    params = copy.deepcopy(jax_to_numpy(params))
    batch_stats = copy.deepcopy(jax_to_numpy(batch_stats))
    trees = {"params": params, "batch_stats": batch_stats}
    skipped = []
    for tkey, coll, fpath, tf in yolox_key_map(variant, include_head):
        if tkey not in state_dict:
            if strict:
                raise KeyError(f"checkpoint is missing {tkey}")
            skipped.append(tkey)
            continue
        value = _transform(np.asarray(state_dict[tkey]), tf)
        if "cls_pred" in fpath[-2] and value.shape[-1] != num_classes and (
            tf == "conv" or fpath[-1] == "bias"
        ):
            skipped.append(tkey)  # class-count mismatch (COCO -> 1 class)
            continue
        _set_path(trees[coll], fpath, value)
    return params, batch_stats, skipped


def jax_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load an upstream ``{"model": state_dict}`` torch checkpoint into a
    flat dict of numpy arrays (torch is a host-side tool here; nothing from
    it touches the device path)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = ckpt.get("model", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}
