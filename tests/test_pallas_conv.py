"""Numerics for the Pallas fused conv blocks (ops/conv.py) — interpret
mode on CPU against the XLA ops they replace (eval-mode BN folded)."""

import jax
import jax.numpy as jnp
import numpy as np

from jolineedle_tpu.ops.conv import conv3x3_bn_silu, dwblock_bn_silu


def _bn_silu(x, gamma, beta, mean, var, eps=1e-3):
    y = (x - mean) / jnp.sqrt(var + eps) * gamma + beta
    return y * jax.nn.sigmoid(y)


def test_conv3x3_bn_silu_matches_xla():
    rng = np.random.default_rng(0)
    B, H, W, C, K = 2, 12, 12, 8, 16
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, C, K)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, K), jnp.float32)
    beta = jnp.asarray(rng.normal(size=K), jnp.float32)
    mean = jnp.asarray(rng.normal(size=K) * 0.1, jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 1.5, K), jnp.float32)

    ref = _bn_silu(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        gamma, beta, mean, var,
    )
    out = conv3x3_bn_silu(x, w, gamma, beta, mean, var)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dwblock_bn_silu_matches_xla():
    rng = np.random.default_rng(1)
    B, H, W, C, K = 2, 10, 10, 8, 12
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    dw = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)
    pw = jnp.asarray(rng.normal(size=(1, 1, C, K)) * 0.2, jnp.float32)
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=C), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    v1 = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, K), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=K), jnp.float32)
    m2 = jnp.asarray(rng.normal(size=K) * 0.1, jnp.float32)
    v2 = jnp.asarray(rng.uniform(0.5, 1.5, K), jnp.float32)

    # XLA reference: depthwise conv (feature_group_count=C, flax kernel
    # layout [3,3,1,C]) + BN + SiLU, then 1x1 conv + BN + SiLU.
    mid = _bn_silu(
        jax.lax.conv_general_dilated(
            x, dw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ),
        g1, b1, m1, v1,
    )
    ref = _bn_silu(
        jax.lax.conv_general_dilated(
            mid, pw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        g2, b2, m2, v2,
    )
    out = dwblock_bn_silu(x, dw, g1, b1, m1, v1, pw, g2, b2, m2, v2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
