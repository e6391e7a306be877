"""jaxpr-level analytic FLOPs counter (utils/flops.py::jaxpr_flops).

The bench's MFU line depends on per-rollout FLOPs. XLA's
``compile().cost_analysis()`` proved unreliable for ``lax.scan`` trip
counts (it multiplied the scan body by its length for one rollout program
but not another — docs/experiment_log.md 2026-08-17 MFU correction), so
FLOPs are counted analytically from the traced jaxpr and pinned here
against hand-computed values.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jolineedle_tpu.utils.flops import traced_flops


def test_dense_matmul_flops_exact():
    f = lambda x, w: x @ w
    got = traced_flops(f, jnp.zeros((4, 8)), jnp.zeros((8, 16)))
    assert got == 2 * 4 * 8 * 16


def test_batched_dot_general_flops_exact():
    # [B, M, K] @ [B, K, N] with explicit batch dims.
    f = lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b)
    got = traced_flops(f, jnp.zeros((3, 5, 7)), jnp.zeros((3, 7, 11)))
    assert got == 2 * 3 * 5 * 7 * 11


def test_scan_multiplies_body_by_trip_count():
    def f(x):
        def body(c, _):
            return c @ c, ()

        y, _ = jax.lax.scan(body, x, None, length=5)
        return y

    got = traced_flops(f, jnp.zeros((32, 32)))
    assert got == 5 * 2 * 32**3


def test_conv_flops_exact():
    # NHWC conv, 3x3, stride 1, SAME: out [1, 8, 8, 4], in_C=2.
    x = jnp.zeros((1, 8, 8, 2))
    k = jnp.zeros((3, 3, 2, 4))
    f = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = traced_flops(f, x, k)
    assert got == 2 * (1 * 8 * 8 * 4) * (3 * 3 * 2)


def test_depthwise_conv_counts_per_group():
    # Depthwise 3x3 over 4 channels: in_C/group = 1.
    x = jnp.zeros((1, 8, 8, 4))
    k = jnp.zeros((3, 3, 1, 4))
    f = lambda x, k: jax.lax.conv_general_dilated(
        x,
        k,
        (1, 1),
        "SAME",
        feature_group_count=4,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = traced_flops(f, x, k)
    assert got == 2 * (1 * 8 * 8 * 4) * (3 * 3 * 1)


def test_traces_through_jit_and_cond():
    @jax.jit
    def f(x, pred):
        return jax.lax.cond(pred, lambda a: a @ a, lambda a: a, x)

    got = traced_flops(f, jnp.zeros((16, 16)), True)
    # cond counts the max-cost branch.
    assert got == 2 * 16**3


def test_close_to_cost_analysis_on_a_conv_net():
    """Sanity vs XLA's own cost model on the nano FPN at a small size (the
    two differ only by elementwise ops and conv padding bookkeeping)."""
    from jolineedle_tpu.models.yolox import YOLOPAFPN, YOLOX_VARIANTS

    d, w, dw = YOLOX_VARIANTS["yolox-nano"]
    m = YOLOPAFPN(depth=d, width=w, depthwise=dw)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    fn = lambda v, x: m.apply(v, x)
    got = traced_flops(fn, vs, x)

    an = jax.jit(fn).lower(vs, x).compile().cost_analysis()
    if isinstance(an, list):
        an = an[0]
    ca = float(an["flops"])
    assert ca > 0
    np.testing.assert_allclose(got, ca, rtol=0.15)
