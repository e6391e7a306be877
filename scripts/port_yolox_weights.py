"""Convert an upstream (Megvii) YOLOX torch checkpoint to JAX weights.

The reference fine-tunes from COCO-pretrained YOLOX checkpoints it downloads
at model build time (reference: src/models/gpt.py:251-253). This repo has no
network access at train time, so porting is an offline step:

    python scripts/port_yolox_weights.py \
        --checkpoint yolox_s.pth --variant yolox-s --patch-size 448 \
        --output yolox_s_coco.msgpack [--backbone-only]

The output is a ``{"params": ..., "batch_stats": ...}`` msgpack that
``--detection-checkpoint`` (train CLI) accepts directly; with
``--backbone-only`` it contains just the YOLOPAFPN tree, loadable into the
separate decision backbone (``--gpt-backbone``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="torch .pth file")
    parser.add_argument(
        "--variant", default="yolox-s", help="yolox size variant of the ckpt"
    )
    parser.add_argument("--patch-size", type=int, default=448)
    parser.add_argument("--num-classes", type=int, default=1)
    parser.add_argument("--output", required=True, help="output .msgpack path")
    parser.add_argument(
        "--backbone-only",
        action="store_true",
        help="emit only the YOLOPAFPN subtree (for --gpt-backbone loading)",
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import serialization

    from jolineedle_tpu.models.port import (
        load_torch_checkpoint,
        port_yolox_state_dict,
    )
    from jolineedle_tpu.models.yolox import NeedleYOLOX

    state_dict = load_torch_checkpoint(args.checkpoint)
    model = NeedleYOLOX(variant=args.variant, num_classes=args.num_classes)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.patch_size, args.patch_size, 3)),
    )
    params, batch_stats, skipped = port_yolox_state_dict(
        state_dict,
        variables["params"],
        variables.get("batch_stats", {}),
        args.variant,
        include_head=not args.backbone_only,
        num_classes=args.num_classes,
        strict=False,
    )
    if skipped:
        print(f"skipped {len(skipped)} keys (first 5): {skipped[:5]}")
    if args.backbone_only:
        out = {
            "params": params["backbone"],
            "batch_stats": batch_stats.get("backbone", {}),
        }
    else:
        out = {"params": params, "batch_stats": batch_stats}
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
