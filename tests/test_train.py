"""Training-step tests: optimizer/schedule math, convergence on a synthetic
fixture, and data-parallel equivalence on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.config import Config, TrainConfig
from fullycnnspeechenhancement_tpu.models import V2, get_model
from fullycnnspeechenhancement_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    shard_batch,
)
from fullycnnspeechenhancement_tpu.train import (
    TrainState,
    create_train_state,
    make_train_step,
    noam_schedule,
    tf_adam,
)
from fullycnnspeechenhancement_tpu.train.step import Batch


def test_noam_schedule_matches_reference_formula():
    sched = noam_schedule(1.5e-3, 10000)
    for step in [0, 1, 99, 9999, 10000, 50000]:
        s = step + 1
        expect = 1.5e-3 * 10000**0.5 * min(s * 10000**-1.5, s**-0.5)
        np.testing.assert_allclose(float(sched(step)), expect, rtol=1e-6)


def test_tf_adam_matches_manual_update():
    """One Adam step on a scalar matches the TF formula exactly."""
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    tx = tf_adam(lr, b1, b2, eps)
    params = {"w": jnp.asarray(2.0)}
    opt_state = tx.init(params)
    g = {"w": jnp.asarray(0.5)}
    updates, opt_state = tx.update(g, opt_state, params)
    m = (1 - b1) * 0.5
    v = (1 - b2) * 0.25
    alpha = lr * np.sqrt(1 - b2) / (1 - b1)
    np.testing.assert_allclose(
        float(updates["w"]), -alpha * m / (np.sqrt(v) + eps), rtol=1e-4
    )
    # second step
    updates, opt_state = tx.update(g, opt_state, params)
    m = b1 * m + (1 - b1) * 0.5
    v = b2 * v + (1 - b2) * 0.25
    alpha = lr * np.sqrt(1 - b2**2) / (1 - b1**2)
    np.testing.assert_allclose(
        float(updates["w"]), -alpha * m / (np.sqrt(v) + eps), rtol=1e-4
    )


def _synthetic_batch(rng, batch_size=2, seconds=0.6, sr=8000, pad_to=None):
    n = int(seconds * sr)
    L = pad_to or n
    mix = np.zeros((batch_size, L), np.float32)
    clean = np.zeros((batch_size, L), np.float32)
    lengths = np.full((batch_size,), n, np.int32)
    t = np.arange(n) / sr
    for i in range(batch_size):
        f = rng.uniform(200, 1000)
        c = 0.4 * np.sin(2 * np.pi * f * t)
        clean[i, :n] = c
        mix[i, :n] = c + 0.2 * rng.standard_normal(n)
    return Batch(jnp.asarray(mix), jnp.asarray(clean), jnp.asarray(lengths))


@pytest.fixture(scope="module")
def tiny_config():
    return Config(train=TrainConfig(batch_size=2, lr=1e-3, warmup_steps=100))


def test_train_step_decreases_loss(tiny_config):
    model = get_model("FullyCNNV2")
    state = create_train_state(tiny_config, model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(tiny_config, model))
    rng = np.random.default_rng(0)
    batch = _synthetic_batch(rng)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses[::10]
    assert int(state.step) == 30
    # BN moving stats moved off their init
    mv = state.bn_state["encode_1"]["mean"]
    assert float(jnp.abs(mv).max()) > 0


def test_train_step_masked_mode(tiny_config):
    cfg = Config(train=TrainConfig(batch_size=2, lr=1e-3, mask_loss=True))
    model = get_model("FullyCNN")
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, model))
    batch = _synthetic_batch(np.random.default_rng(1), pad_to=8000)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_dp_step_matches_single_device(tiny_config):
    """DP over 8 CPU devices must produce the same loss and parameter
    update as the single-device step on the identical global batch."""
    cfg = Config(train=TrainConfig(batch_size=8, lr=1e-3, warmup_steps=100))
    model = get_model("FullyCNNV2")
    mesh = make_mesh(n_data=8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(42))
    batch = _synthetic_batch(np.random.default_rng(2), batch_size=8)

    single = jax.jit(make_train_step(cfg, model))
    s1, m1 = single(state, batch)

    pstep = make_parallel_train_step(cfg, model, mesh)
    state2 = create_train_state(cfg, model, jax.random.PRNGKey(42))
    s2, m2 = pstep(state2, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    w1 = np.asarray(s1.params["encode_1"]["w"])
    w2 = np.asarray(s2.params["encode_1"]["w"])
    np.testing.assert_allclose(w1, w2, rtol=1e-4, atol=1e-6)
    # BN moving means must match too (sync-BN over the same global batch)
    np.testing.assert_allclose(
        np.asarray(s1.bn_state["encode_1"]["mean"]),
        np.asarray(s2.bn_state["encode_1"]["mean"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_bucket_slack_matches_batchmax_padding(tiny_config):
    """Parity contract: training on a bucket-padded batch must equal
    training on the reference's batch-max-padded collate
    (data_loader.py:198-225).  BN stats and the loss mask out bucket-slack
    frames (>= batch-max), while shorter utterances' pad frames below
    batch-max stay in, exactly as the reference materializes them."""
    from fullycnnspeechenhancement_tpu.config import DSPConfig

    dsp = DSPConfig()
    model = get_model("FullyCNNV2")
    rng = np.random.default_rng(5)
    sr = 8000
    lens = [4000, 7200]  # 0.5 s and 0.9 s -> different frame counts
    bm_frames = max(dsp.num_frames(n) for n in lens)
    batchmax_pad = dsp.padded_samples(bm_frames)
    bucket_pad = dsp.padded_samples(128)  # bucket edge adds slack frames
    assert bucket_pad > batchmax_pad

    def make(pad_to):
        mix = np.zeros((2, pad_to), np.float32)
        clean = np.zeros((2, pad_to), np.float32)
        for i, n in enumerate(lens):
            t = np.arange(n) / sr
            c = 0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t)
            clean[i, :n] = c
            mix[i, :n] = c + 0.2 * rng.standard_normal(n)
        return Batch(
            jnp.asarray(mix),
            jnp.asarray(clean),
            jnp.asarray(np.asarray(lens, np.int32)),
        )

    rng = np.random.default_rng(5)
    b_ref = make(batchmax_pad)
    rng = np.random.default_rng(5)  # identical signals at both paddings
    b_bucket = make(bucket_pad)

    step = jax.jit(make_train_step(tiny_config, model))
    s_ref = create_train_state(tiny_config, model, jax.random.PRNGKey(0))
    s_bkt = create_train_state(tiny_config, model, jax.random.PRNGKey(0))
    for _ in range(3):
        s_ref, m_ref = step(s_ref, b_ref)
        s_bkt, m_bkt = step(s_bkt, b_bucket)
        np.testing.assert_allclose(
            float(m_bkt["loss"]), float(m_ref["loss"]), rtol=1e-5
        )
    # BN moving stats are plain masked averages -- they must agree tightly
    np.testing.assert_allclose(
        np.asarray(s_bkt.bn_state["encode_1"]["mean"]),
        np.asarray(s_ref.bn_state["encode_1"]["mean"]),
        rtol=1e-4,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s_bkt.bn_state["encode_8"]["var"]),
        np.asarray(s_ref.bn_state["encode_8"]["var"]),
        rtol=1e-4,
        atol=1e-7,
    )


def test_multi_step_matches_sequential(tiny_config):
    """K steps scanned in one device call == K individual jitted steps:
    same losses, same final params (the trainer's steps_per_call fast
    path, train/step.py make_multi_step)."""
    from fullycnnspeechenhancement_tpu.train.step import make_multi_step

    model = get_model("FullyCNN")
    state_a = create_train_state(tiny_config, model, jax.random.PRNGKey(7))
    state_b = create_train_state(tiny_config, model, jax.random.PRNGKey(7))
    step = jax.jit(make_train_step(tiny_config, model))
    multi = jax.jit(make_multi_step(make_train_step(tiny_config, model)))
    rng = np.random.default_rng(3)
    batches = [_synthetic_batch(rng) for _ in range(3)]
    losses = []
    for b in batches:
        state_a, m = step(state_a, b)
        losses.append(float(m["loss"]))
    stacked = Batch(
        *(
            None
            if getattr(batches[0], f) is None
            else jnp.stack([getattr(b, f) for b in batches])
            for f in Batch._fields
        )
    )
    state_b, packed = multi(state_b, stacked)
    np.testing.assert_allclose(np.asarray(packed)[:, 0], losses, rtol=1e-5)
    assert int(state_b.step) == 3
    # Param check bounded by the update scale: Adam normalizes by sqrt(v),
    # so f32 reduction-order differences between the scanned and individual
    # compilations can flip near-zero gradient elements' update *sign* --
    # compare against the total step magnitude (~lr_noam * 3 steps), like
    # test_blocked_train_step_matches_nhwc does.
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0.05, atol=2e-4
        )


def test_parallel_multi_step_runs_on_mesh():
    """DP multi-step: 2 scanned steps over the 8-device mesh advance the
    replicated state and return per-step packed metrics."""
    from fullycnnspeechenhancement_tpu.parallel import (
        make_parallel_multi_step,
        shard_stacked_batch,
    )

    cfg = Config(train=TrainConfig(batch_size=8, lr=1e-3, warmup_steps=100))
    model = get_model("FullyCNN")
    mesh = make_mesh(n_data=8)
    state = create_train_state(cfg, model, jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    batches = [_synthetic_batch(rng, batch_size=8) for _ in range(2)]
    stacked = Batch(
        *(
            None
            if getattr(batches[0], f) is None
            else jnp.stack([getattr(b, f) for b in batches])
            for f in Batch._fields
        )
    )
    multi = make_parallel_multi_step(cfg, model, mesh)
    state, packed = multi(state, shard_stacked_batch(mesh, stacked))
    vals = np.asarray(packed)
    assert vals.shape == (2, 2) and np.all(np.isfinite(vals))
    assert int(state.step) == 2


def test_dp_rejects_indivisible_batch():
    cfg = Config(train=TrainConfig(batch_size=3))
    mesh = make_mesh(n_data=2)
    with pytest.raises(ValueError):
        make_parallel_train_step(cfg, V2, mesh)


def test_blocked_train_step_matches_nhwc(tiny_config):
    """`blocked_compute=True` is the same train step up to f32 reduction
    order: losses track tightly over several steps and the updated params
    stay close (the reparametrization is exact in f64 --
    tests/test_blocked.py)."""
    from fullycnnspeechenhancement_tpu.config import ModelConfig

    cfg_ref = tiny_config
    cfg_blk = Config(
        model=ModelConfig(blocked_compute=True),
        train=cfg_ref.train,
    )
    model = get_model("FullyCNNV2")
    s_ref = create_train_state(cfg_ref, model, jax.random.PRNGKey(0))
    s_blk = create_train_state(cfg_blk, model, jax.random.PRNGKey(0))
    step_ref = jax.jit(make_train_step(cfg_ref, model))
    step_blk = jax.jit(make_train_step(cfg_blk, model))
    batch = _synthetic_batch(np.random.default_rng(2))
    for i in range(5):
        s_ref, m_ref = step_ref(s_ref, batch)
        s_blk, m_blk = step_blk(s_blk, batch)
        np.testing.assert_allclose(
            float(m_blk["loss"]), float(m_ref["loss"]), rtol=1e-3
        )
    # params close after 5 steps (Adam sign-like updates amplify tiny grad
    # diffs, so compare against the update scale, not machine epsilon)
    pr = jax.tree_util.tree_leaves(s_ref.params)
    pb = jax.tree_util.tree_leaves(s_blk.params)
    for a, b in zip(pr, pb):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=0.2
        )
