"""Two-partition optimizer: separate AdamW for decision vs detector params.

The reference builds two torch AdamW optimizers split on the ``yolox.``
parameter prefix (reference: src/models/gpt.py:547-562) and steps them every
``gradient_accumulation`` iterations (reference: src/supervised.py:900-902,
src/reinforce.py:341-353). TPU-native: one ``optax.multi_transform`` over
param-path labels + ``optax.MultiSteps`` microbatch accumulation — the whole
update is part of the jitted train step.

Torch AdamW defaults apply for betas (0.9, 0.999) and eps 1e-8. Weight decay
comes from ``--weight-decay`` (reference: main.py:137-141). Note the
reference never actually honors its flag: the AdamW constructors omit
``weight_decay`` (torch then applies its 0.01 default, reference:
src/models/gpt.py:547-562) and the resume-time "override"
``optim.weight_decay = ...`` (reference: main.py:552-557, 584) sets a dead
attribute — torch optimizers read ``param_groups``, not ``optim.weight_decay``.
Here the flag is wired for real: construction uses the CLI value, and because
the optax transform is rebuilt from the *current* config on every trainer
construction while checkpoints store only optimizer *state* (moments/counts),
resume and --detection-checkpoint re-apply the current CLI lr/weight-decay by
construction — the reference's intended override semantics.
"""

from __future__ import annotations

from typing import Optional

import optax
from flax import traverse_util


def param_labels(params, freeze_image_processor: bool, detection_enabled: bool):
    """Label tree: 'gpt' | 'yolox' | 'frozen'.

    - yolox backbone is 'frozen' when --freeze-image-processor (reference:
      src/models/gpt.py:266-271);
    - the whole yolox subtree is 'frozen' when detection is disabled (the
      reference simply never steps optim_yolox then, reference:
      src/reinforce.py:348-350).
    """
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        if path[0] == "yolox":
            if not detection_enabled:
                labels[path] = "frozen"
            elif freeze_image_processor and len(path) > 1 and path[1] == "backbone":
                labels[path] = "frozen"
            else:
                labels[path] = "yolox"
        else:
            labels[path] = "gpt"
    return traverse_util.unflatten_dict(labels)


def make_optimizer(
    params,
    learning_rate: float,
    yolo_lr: float,
    gradient_accumulation: int = 1,
    freeze_image_processor: bool = False,
    detection_enabled: bool = True,
    clip_value: Optional[float] = None,
    weight_decay: float = 0.01,
    lr_schedule: str = "constant",
    lr_warmup_iters: int = 0,
    lr_decay_iters: int = 1,
) -> optax.GradientTransformation:
    """``lr_schedule="cosine"`` applies linear warmup + cosine decay to 5%
    of peak, to BOTH optimizers (TPU-repo extension — the reference trains
    at constant lr; schedule steps count optimizer updates, i.e. train
    iterations / gradient_accumulation)."""

    def scheduled(lr: float):
        if lr_schedule == "cosine":
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0 if lr_warmup_iters > 0 else lr,
                peak_value=lr,
                warmup_steps=max(0, lr_warmup_iters),
                decay_steps=max(lr_decay_iters, lr_warmup_iters + 1),
                end_value=0.05 * lr,
            )
        return lr

    adamw = lambda lr: optax.adamw(
        scheduled(lr), b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )
    tx = optax.multi_transform(
        {
            "gpt": adamw(learning_rate),
            "yolox": adamw(yolo_lr),
            "frozen": optax.set_to_zero(),
        },
        param_labels(params, freeze_image_processor, detection_enabled),
    )
    if clip_value is not None:
        # Element-wise value clipping (reference: reinforce.py:344 uses
        # torch clip_grad_value_(1)).
        tx = optax.chain(optax.clip(clip_value), tx)
    if gradient_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation)
    return tx
