"""Golden (non-circular) weight-porter test: real torch modules in upstream
Megvii layer naming -> state_dict -> port -> forward activation parity.

Round-1's test_port.py synthesized its torch checkpoint from the porter's
own key map, so wrong upstream key names would pass. Here the keys come from
``tests/torch_yolox_ref.py``'s independently-constructed torch modules, and
parity is asserted on ACTIVATIONS (FPN outputs + per-level head outputs), so
any mis-assignment, layout bug, or BN-stat mixup fails loudly.
Reference: src/models/gpt.py:251-253 (COCO checkpoint load path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _randomize_bn_stats(model, seed):
    """Default-init BN has mean=0/var=1 — indistinguishable from an unported
    tree. Randomize running stats so porting them is actually proven."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            # keep weights/bias non-trivial too
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def _port_and_compare(variant, num_classes_torch, num_classes_flax, patch=64):
    from tests.torch_yolox_ref import TorchYOLOX

    from jolineedle_tpu.models.port import port_yolox_state_dict
    from jolineedle_tpu.models.yolox import YOLOX_VARIANTS, NeedleYOLOX

    depth, width, depthwise = YOLOX_VARIANTS[variant]
    tmodel = TorchYOLOX(depth, width, depthwise, num_classes=num_classes_torch)
    torch.manual_seed(0)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)
    _randomize_bn_stats(tmodel, 1)
    tmodel.eval()

    x = torch.randn(2, 3, patch, patch, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        fpn_t, head_t = tmodel(x)

    state_dict = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    fmodel = NeedleYOLOX(variant=variant, num_classes=num_classes_flax)
    variables = fmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, 3)), False
    )
    params, batch_stats, skipped = port_yolox_state_dict(
        state_dict,
        variables["params"],
        variables.get("batch_stats", {}),
        variant,
        include_head=True,
        num_classes=num_classes_flax,
    )
    out, fpn_f = fmodel.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        False,
    )
    return fpn_t, head_t, out, fpn_f, skipped


@pytest.mark.parametrize("variant", ["yolox-nano", "yolox-s"])
def test_port_activation_parity(variant):
    fpn_t, head_t, out, fpn_f, skipped = _port_and_compare(variant, 1, 1)
    assert skipped == []

    for lvl, (t, f) in enumerate(zip(fpn_t, fpn_f)):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2),
            t.numpy(),
            atol=2e-4,
            rtol=1e-3,
            err_msg=f"FPN level {lvl} diverges",
        )

    # Head: our raw outputs are level-concatenated [B, A, .] in (level, y, x)
    # anchor order; torch levels are [B, C, H, W].
    regs = np.concatenate(
        [r.numpy().transpose(0, 2, 3, 1).reshape(2, -1, 4) for r, _, _ in head_t],
        axis=1,
    )
    objs = np.concatenate(
        [o.numpy().transpose(0, 2, 3, 1).reshape(2, -1) for _, o, _ in head_t],
        axis=1,
    )
    clss = np.concatenate(
        [c.numpy().transpose(0, 2, 3, 1).reshape(2, -1, 1) for _, _, c in head_t],
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(out["raw_reg"]), regs, atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["obj_logits"]), objs, atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["cls_logits"]), clss, atol=2e-4, rtol=1e-3
    )


def test_port_coco_class_mismatch_skips_cls_preds():
    """An 80-class (COCO) checkpoint ports into a 1-class model: cls_preds
    are skipped (the reference's partial fine-tune load), everything else
    must still match."""
    fpn_t, head_t, out, fpn_f, skipped = _port_and_compare("yolox-nano", 80, 1)
    assert sorted(skipped) == sorted(
        [f"head.cls_preds.{i}.weight" for i in range(3)]
        + [f"head.cls_preds.{i}.bias" for i in range(3)]
    )
    for t, f in zip(fpn_t, fpn_f):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), t.numpy(), atol=2e-4, rtol=1e-3
        )
    objs = np.concatenate(
        [o.numpy().transpose(0, 2, 3, 1).reshape(2, -1) for _, o, _ in head_t],
        axis=1,
    )
    np.testing.assert_allclose(
        np.asarray(out["obj_logits"]), objs, atol=2e-4, rtol=1e-3
    )
