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
    # amplify pure rounding noise into spurious mismatches.  This f32 check
    # is deliberately coarse (1e-2 of the gradient scale): training-mode
    # BN's E[x^2]-mean^2 variance is cancellation-prone in f32 and its
    # gradient amplifies reduction-order noise across the 16-layer backward
    # chain (observed up to ~6e-3 on the first encoder layer).  The
    # exactness claim lives in test_blocked_gradients_exact_f64 (~1e-15);
    # end-to-end f32 training equivalence lives in
    # tests/test_train.py::test_blocked_train_step_matches_nhwc.
    gscale = max(
        float(np.abs(np.asarray(a)).max()) for _, a in flat_r
    )
    for (path, a), (_, b) in zip(flat_r, flat_b):
        np.testing.assert_allclose(
            np.asarray(b) / gscale,
            np.asarray(a) / gscale,
            rtol=1e-2,
            atol=1e-2,
            err_msg=str(path),
        )


def test_blocked_gradients_exact_f64():
    """In float64 the blocked path is EXACT vs NHWC (same math, only f32
    reduction order differs).  Runs in a subprocess because x64 must be
    enabled before JAX initialises."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from fullycnnspeechenhancement_tpu.models import apply_blocked, get_model

        model = get_model("FullyCNNV2")
        params, state = model.init(jax.random.PRNGKey(3))
        params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        rng = np.random.default_rng(4)
        state = {
            n: {
                "mean": jnp.asarray(rng.standard_normal(s["mean"].shape) * 0.1, jnp.float64),
                "var": jnp.asarray(0.5 + rng.random(s["var"].shape), jnp.float64),
            }
            for n, s in state.items()
        }
        x = jnp.asarray(np.random.default_rng(5).standard_normal((2, 12, 129, 1)), jnp.float64)
        tgt = jnp.asarray(np.random.default_rng(6).standard_normal((2, 12, 129, 1)), jnp.float64)

        def loss_ref(p):
            y, _ = model.apply(p, state, x, is_training=True)
            return jnp.sum((y - tgt) ** 2)

        def loss_blk(p):
            y, _ = apply_blocked(
                model, p, state, x, is_training=True, precision=jax.lax.Precision.HIGHEST
            )
            return jnp.sum((y - tgt) ** 2)

        yr, _ = model.apply(params, state, x, is_training=True)
        yb, _ = apply_blocked(
            model, params, state, x, is_training=True, precision=jax.lax.Precision.HIGHEST
        )
        assert float(jnp.abs(yr - yb).max()) < 1e-12
        gr = jax.grad(loss_ref)(params)
        gb = jax.grad(loss_blk)(params)
        fr, _ = jax.tree_util.tree_flatten_with_path(gr)
        fb, _ = jax.tree_util.tree_flatten_with_path(gb)
        gscale = max(float(np.abs(np.asarray(a)).max()) for _, a in fr)
        worst = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) / gscale
            for ((_, a), (_, b)) in zip(fr, fb)
        )
        assert worst < 1e-12, worst
        print("OK", worst)
        """
    )
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=240,
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


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
