"""Time-sharded halo-exchange forward == unsharded forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.parallel import make_mesh
from fullycnnspeechenhancement_tpu.parallel.halo import make_time_sharded_forward


@pytest.mark.parametrize("name", ["FullyCNN", "FullyCNNV2", "FullyCNNV3"])
def test_time_sharded_matches_unsharded(name):
    model = get_model(name)
    params, bn = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=8)
    fwd = make_time_sharded_forward(model, mesh)
    mag = jnp.asarray(
        np.random.default_rng(0).random((2, 8 * 16, 129)), jnp.float32
    )
    got = fwd(params, bn, mag)
    ref, _ = model.apply(params, bn, mag[..., None], is_training=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[..., 0]), rtol=2e-4, atol=2e-5
    )


def test_time_sharded_long_input_small_shards():
    """Sharding still exact when T_local is barely larger than the halo."""
    model = get_model("FullyCNNV2")
    params, bn = model.init(jax.random.PRNGKey(1))
    mesh = make_mesh(n_data=8)
    fwd = make_time_sharded_forward(model, mesh)
    mag = jnp.asarray(np.random.default_rng(1).random((1, 8 * 8, 129)), jnp.float32)
    got = fwd(params, bn, mag)
    ref, _ = model.apply(params, bn, mag[..., None], is_training=False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[..., 0]), rtol=2e-4, atol=2e-5
    )
