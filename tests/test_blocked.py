"""Freq-to-depth (blocked) forward vs the canonical NHWC forward.

`apply_blocked` is an exact reparametrization (models/blocked.py): same
params, same math, different reduction order -- so f32 outputs, BN moment
updates, and gradients must all agree tightly with `ModelDef.apply`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullycnnspeechenhancement_tpu.models import apply_blocked, get_model

VARIANTS = ("FullyCNN", "FullyCNNV2", "FullyCNNV3")


def _rand_bn(state, seed):
    rng = np.random.default_rng(seed)
    out = {}
    for name, s in state.items():
        out[name] = {
            "mean": jnp.asarray(
                rng.standard_normal(s["mean"].shape) * 0.1, jnp.float32
            ),
            "var": jnp.asarray(
                0.5 + rng.random(s["var"].shape), jnp.float32
            ),
        }
    return out


@pytest.mark.parametrize("name", VARIANTS)
@pytest.mark.parametrize("is_training", (False, True))
def test_blocked_matches_nhwc(name, is_training):
    model = get_model(name)
    params, state = model.init(jax.random.PRNGKey(0))
    state = _rand_bn(state, 1)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 20, 129, 1)), jnp.float32
    )
    ref, ref_state = model.apply(params, state, x, is_training=is_training)
    got, got_state = apply_blocked(
        model, params, state, x, is_training=is_training
    )
    # atol absorbs f32 reduction-order noise amplified by 16 layers of
    # BN rsqrt on near-zero outputs (max observed ~2.3e-5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-4
    )
    for lname in ref_state:
        for k in ref_state[lname]:
            np.testing.assert_allclose(
                np.asarray(got_state[lname][k]),
                np.asarray(ref_state[lname][k]),
                rtol=2e-4,
                atol=1e-6,
                err_msg=f"{lname}/{k}",
            )


def test_blocked_gradients_match():
    model = get_model("FullyCNNV2")
    params, state = model.init(jax.random.PRNGKey(3))
    state = _rand_bn(state, 4)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 12, 129, 1)), jnp.float32
    )
    tgt = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 12, 129, 1)), jnp.float32
    )

    def loss_ref(p):
        y, _ = model.apply(p, state, x, is_training=True)
        return jnp.sum((y - tgt) ** 2)

    def loss_blk(p):
        y, _ = apply_blocked(model, p, state, x, is_training=True)
        return jnp.sum((y - tgt) ** 2)

    gr = jax.grad(loss_ref)(params)
    gb = jax.grad(loss_blk)(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(gb)
    # Normalize by the GLOBAL gradient scale: biases under BN have exactly
    # cancelled gradients in training mode, so per-leaf normalization would
    # amplify pure rounding noise into spurious mismatches.
    gscale = max(
        float(np.abs(np.asarray(a)).max()) for _, a in flat_r
    )
    for (path, a), (_, b) in zip(flat_r, flat_b):
        np.testing.assert_allclose(
            np.asarray(b) / gscale,
            np.asarray(a) / gscale,
            rtol=5e-4,
            atol=3e-4,  # f32 reduction-order noise in cancelling sums
            err_msg=str(path),
        )


def test_blocked_non129_freq_dim():
    """The blocked path handles any F (pads to a block multiple)."""
    model = get_model("FullyCNNV2")
    params, state = model.init(jax.random.PRNGKey(7))
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((1, 9, 65, 1)), jnp.float32
    )
    ref, _ = model.apply(params, state, x, is_training=False)
    got, _ = apply_blocked(model, params, state, x, is_training=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5
    )
