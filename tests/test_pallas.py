"""Fused Pallas stack kernel: correctness vs the layer-by-layer model
(interpret mode on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.ops import (
    fold_bn_inference,
    fused_inference_forward,
)


def _randomized_bn(bn, seed=0):
    rng = np.random.default_rng(seed)
    return {
        k: {
            "mean": v["mean"] + rng.random(v["mean"].shape).astype(np.float32),
            "var": v["var"] * (1 + rng.random(v["var"].shape).astype(np.float32)),
        }
        for k, v in bn.items()
    }


@pytest.mark.parametrize("name", ["FullyCNN", "FullyCNNV2", "FullyCNNV3"])
def test_fused_matches_reference_apply(name):
    model = get_model(name)
    params, bn = model.init(jax.random.PRNGKey(0))
    bn = _randomized_bn(bn)
    mag = jnp.asarray(np.random.default_rng(1).random((2, 70, 129)), jnp.float32)
    ref, _ = model.apply(params, bn, mag[..., None], is_training=False)
    got = fused_inference_forward(model, params, bn, mag, t_tile=32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[..., 0]), rtol=1e-4, atol=1e-5
    )


def test_fused_handles_unaligned_t():
    model = get_model("FullyCNNV2")
    params, bn = model.init(jax.random.PRNGKey(1))
    mag = jnp.asarray(np.random.default_rng(2).random((1, 45, 129)), jnp.float32)
    ref, _ = model.apply(params, bn, mag[..., None], is_training=False)
    got = fused_inference_forward(model, params, bn, mag, t_tile=32)
    assert got.shape == (1, 45, 129)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[..., 0]), rtol=1e-4, atol=1e-5
    )


def test_bn_folding_math():
    """Folded conv+BN equals BN(conv) in inference mode for one layer."""
    model = get_model("FullyCNNV2")
    params, bn = model.init(jax.random.PRNGKey(2))
    bn = _randomized_bn(bn, seed=3)
    folded = fold_bn_inference(model, params, bn)
    spec, w, b = folded[0]
    x = jnp.asarray(np.random.default_rng(4).random((1, 12, 129, 1)), jnp.float32)
    from fullycnnspeechenhancement_tpu.models.blocks import (
        conv_bn_relu_apply,
        tf_same_pads,
    )

    ref, _ = conv_bn_relu_apply(
        params[spec.name], bn[spec.name], x, kernel=spec.kernel,
        is_training=False, use_norm=True, use_act=False,
    )
    got = jax.lax.conv_general_dilated(
        x, w, (1, 1), tf_same_pads(spec.kernel),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
