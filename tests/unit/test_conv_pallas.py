"""Parity tests for the fused stride-2 Conv+BN+Leaky Pallas kernel.

Oracle: ``conv_down2_bn_leaky_reference`` (XLA conv + folded affine), itself
pinned against flax's ConvBNLeaky module to guarantee the kernel matches the
module it replaces on the inference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.ops.conv_pallas import (
    conv_down2_bn_leaky,
    conv_down2_bn_leaky_reference,
)


def _rand_case(rng, b, h, w, cin, cout, dtype=np.float32):
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(dtype))
    k = jnp.asarray((rng.normal(size=(3, 3, cin, cout)) * 0.1).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32))
    mean = jnp.asarray((rng.normal(size=cout) * 0.1).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, cout).astype(np.float32))
    return x, k, scale, bias, mean, var


@pytest.mark.parametrize(
    "shape",
    [(2, 16, 16, 8, 16), (1, 32, 32, 32, 64), (2, 26, 26, 64, 128)],
)
def test_conv_down2_matches_xla_oracle(shape):
    rng = np.random.default_rng(0)
    args = _rand_case(rng, *shape)
    ref = conv_down2_bn_leaky_reference(*args)
    got = conv_down2_bn_leaky(*args, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_conv_down2_bf16_close():
    rng = np.random.default_rng(1)
    args = _rand_case(rng, 2, 32, 32, 32, 64)
    x = args[0].astype(jnp.bfloat16)
    ref = conv_down2_bn_leaky_reference(x, *args[1:])
    got = conv_down2_bn_leaky(x, *args[1:], interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(ref, np.float32),
        rtol=5e-2,
        atol=5e-2,
    )


def test_convbnleaky_fused_path_matches_xla_path():
    """ConvBNLeaky routes to the Pallas kernel when the conv backend says so,
    fetches the same params, and matches the XLA branch."""
    from viddet_tpu.core import platform as plat
    from viddet_tpu.core.precision import Policy
    from viddet_tpu.models.common import ConvBNLeaky

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 16)).astype(np.float32))
    policy = Policy(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    mod = ConvBNLeaky(32, 3, strides=2, policy=policy)
    variables = mod.init(jax.random.key(0), x, False)
    stats = variables["batch_stats"]["BatchNorm_0"]
    stats["mean"] = jnp.asarray((rng.normal(size=32) * 0.1).astype(np.float32))
    stats["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 32).astype(np.float32))

    plat.set_conv_backend("xla")
    try:
        want = mod.apply(variables, x, False)
        plat.set_conv_backend("pallas_interpret")
        got = mod.apply(variables, x, False)
    finally:
        plat.set_conv_backend("auto")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_darknet53_fused_path_matches_xla_path():
    """Whole-backbone check: same variables, fused vs XLA inference."""
    from viddet_tpu.core import platform as plat
    from viddet_tpu.core.precision import Policy
    from viddet_tpu.models.darknet import Darknet53

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    policy = Policy(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    mod = Darknet53(policy=policy)
    variables = mod.init(jax.random.key(0), x, False)

    plat.set_conv_backend("xla")
    try:
        want = mod.apply(variables, x, False)
        plat.set_conv_backend("pallas_interpret")
        got = mod.apply(variables, x, False)
    finally:
        plat.set_conv_backend("auto")
    for w, g in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4
        )


def test_oracle_matches_flax_module():
    """The oracle reproduces ConvBNLeaky(strides=2) inference bit-for-bit
    in f32 (same conv padding, BN epsilon, leaky slope)."""
    from viddet_tpu.core.precision import Policy
    from viddet_tpu.models.common import ConvBNLeaky

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    policy = Policy(compute_dtype=jnp.float32, param_dtype=jnp.float32)
    mod = ConvBNLeaky(16, 3, strides=2, policy=policy)
    variables = mod.init(jax.random.key(0), x, False)
    # Perturb BN stats so folding is actually exercised.
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    stats = variables["batch_stats"]["BatchNorm_0"]
    stats["mean"] = jnp.asarray((rng.normal(size=16) * 0.1).astype(np.float32))
    stats["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))
    want = mod.apply(variables, x, False)
    got = conv_down2_bn_leaky_reference(
        x,
        variables["params"]["Conv_0"]["kernel"],
        variables["params"]["BatchNorm_0"]["scale"],
        variables["params"]["BatchNorm_0"]["bias"],
        stats["mean"],
        stats["var"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)
