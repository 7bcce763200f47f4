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


def test_eval_step_fused_flag_matches_xla():
    """make_eval_step honours ModelConfig.fused_inference (interpret mode
    on CPU) and agrees with the XLA path."""
    from fullycnnspeechenhancement_tpu.config import Config, ModelConfig
    from fullycnnspeechenhancement_tpu.train.step import make_eval_step

    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32)
    lengths = jnp.asarray([8000, 6100], jnp.int32)

    cfg_xla = Config(model=ModelConfig(net_work="FullyCNNV2"))
    cfg_fused = Config(
        model=ModelConfig(net_work="FullyCNNV2", fused_inference=True)
    )
    model = get_model("FullyCNNV2")
    params, bn = model.init(jax.random.PRNGKey(4))
    bn = _randomized_bn(bn, seed=5)

    ref = make_eval_step(cfg_xla, model)(params, bn, wav, lengths)
    got = make_eval_step(cfg_fused, model)(params, bn, wav, lengths)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5)


def test_fused_bfloat16_mode_close():
    """bf16 slab storage: looser tolerance, same structure."""
    model = get_model("FullyCNNV2")
    params, bn = model.init(jax.random.PRNGKey(6))
    bn = _randomized_bn(bn, seed=7)
    mag = jnp.asarray(np.random.default_rng(8).random((1, 40, 129)), jnp.float32)
    ref, _ = model.apply(params, bn, mag[..., None], is_training=False)
    got = fused_inference_forward(model, params, bn, mag, t_tile=32, dtype="bfloat16")
    ref = np.asarray(ref[..., 0])
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(got) - ref).max() < 0.05 * scale


def test_fused_accum_formulation_matches_xla():
    """The accumulate (no-concat) formulation is numerically identical to
    the im2col one; both must match model.apply (interpret mode on CPU)."""
    for name in ("FullyCNN", "FullyCNNV2", "FullyCNNV3"):
        model = get_model(name)
        params, bn = model.init(jax.random.PRNGKey(9))
        bn = _randomized_bn(bn, seed=10)
        mag = jnp.asarray(
            np.random.default_rng(11).random((1, 50, 129)), jnp.float32
        )
        ref, _ = model.apply(params, bn, mag[..., None], is_training=False)
        got = fused_inference_forward(
            model, params, bn, mag, formulation="accum"
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref[..., 0]), rtol=1e-4, atol=1e-5
        )
