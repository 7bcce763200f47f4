"""Where does the bf16 train step's time go?  Times each stage of the V2
train step separately on the real chip: STFT analysis x2, model forward,
forward+backward, and the full step (STFT + fwd + bwd + TF-Adam).

Timing per PERF_NOTES.md: iterations chained in one jitted scan, one
scalar fetch as the barrier.
"""
import sys, time

sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache

enable_compilation_cache()

from fullycnnspeechenhancement_tpu.config import Config, ModelConfig, TrainConfig
from fullycnnspeechenhancement_tpu.dsp import SpectrogramExtractor
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.train import create_train_state
from fullycnnspeechenhancement_tpu.train.step import Batch, make_train_step

B, SECONDS, ITERS = 64, 8.0, 20
SAMPLES = int(SECONDS * 8000)
MODE = sys.argv[1] if len(sys.argv) > 1 else "all"

config = Config(
    model=ModelConfig(net_work="FullyCNNV2", compute_dtype="bfloat16"),
    train=TrainConfig(batch_size=B, lr=1.5e-3),
)
model = get_model("FullyCNNV2")
state = create_train_state(config, model, jax.random.PRNGKey(0))
ext = SpectrogramExtractor(config.dsp)

rng = np.random.default_rng(0)
t = np.arange(SAMPLES) / 8000.0
clean = 0.3 * np.sin(2 * np.pi * rng.uniform(100, 1000, (B, 1)) * t[None, :]).astype(np.float32)
mix = clean + 0.1 * rng.standard_normal((B, SAMPLES)).astype(np.float32)
lengths = jnp.full((B,), SAMPLES, jnp.int32)
mix, clean = jnp.asarray(mix), jnp.asarray(clean)


def timeit(label, fn, carry):
    @jax.jit
    def chain(c):
        def body(c, _):
            c, scalar = fn(c)
            return c, scalar

        c, ys = jax.lax.scan(body, c, None, length=ITERS)
        return c, ys[-1]

    t0 = time.time()
    _, last = chain(carry)
    float(last)
    print(f"{label}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, last = chain(carry)
        float(last)
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)


params, bn_state = state.params, state.bn_state
mag0 = ext(mix, lengths)


def stft2(c):
    m1 = ext(c, lengths)
    m2 = ext(c, lengths)
    return c + m1.mean() * 1e-12 + m2.mean() * 1e-12, m1.mean()


def fwd(c):
    x = c[..., None].astype(jnp.bfloat16)
    pred, _ = model.apply(params, bn_state, x, is_training=True)
    return c + pred.mean().astype(jnp.float32) * 1e-12, pred.mean().astype(jnp.float32)


def fwdbwd(c):
    def loss_fn(p):
        x = c[..., None].astype(jnp.bfloat16)
        pred, new_bn = model.apply(p, bn_state, x, is_training=True)
        return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    return c + leaf.mean() * 1e-12, loss


step = make_train_step(config, model)


def full(s):
    s, metrics = step(s, Batch(mix, clean, lengths))
    return s, metrics["loss"]


if MODE in ("all", "stft"):
    timeit("stft x2", stft2, mix)
if MODE in ("all", "fwd"):
    timeit("fwd (bf16, mag input)", fwd, mag0)
if MODE in ("all", "fwdbwd"):
    timeit("fwd+bwd (bf16, mag input)", fwdbwd, mag0)
if MODE in ("all", "full"):
    timeit("full train step", full, state)


def fwdbwd_stft_inside(c):
    """fwd+bwd with the STFTs INSIDE the differentiated function (the real
    step's structure) -- isolates the cost of differentiating past ext()."""

    def loss_fn(p):
        mix_mag = ext(c, lengths)
        clean_mag = ext(c * 0.5, lengths)
        x = mix_mag[..., None].astype(jnp.bfloat16)
        pred, new_bn = model.apply(p, bn_state, x, is_training=True)
        return jnp.sum((pred.astype(jnp.float32) - clean_mag[..., None]) ** 2) / B

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    return c + leaf.mean() * 1e-12, loss


def full_stft_outside(s):
    """Real train step but with precomputed magnitudes: isolates Adam/sched
    vs the STFT-in-grad."""
    from fullycnnspeechenhancement_tpu.train.optim import noam_schedule, tf_adam
    import optax
    from fullycnnspeechenhancement_tpu.train.step import TrainState, spectral_l2_loss

    tx = tf_adam(noam_schedule(config.train.lr, config.train.warmup_steps))

    def loss_fn(p, bn_s):
        x = mag0[..., None].astype(jnp.bfloat16)
        pred, new_bn = model.apply(p, bn_s, x, is_training=True)
        loss = spectral_l2_loss(pred.astype(jnp.float32), mag0[..., None] * 0.5, B)
        return loss, new_bn

    (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        s.params, s.bn_state
    )
    updates, new_opt = tx.update(grads, s.opt_state, s.params)
    new_params = optax.apply_updates(s.params, updates)
    return TrainState(new_params, new_bn, new_opt, s.step + 1), loss


if MODE in ("fwdbwd_stft",):
    timeit("fwd+bwd, STFT inside grad", fwdbwd_stft_inside, mix)
if MODE in ("full_nostft",):
    timeit("full step, STFT outside", full_stft_outside, state)


def full_sgd(s):
    """Params carried through scan, plain SGD update -- isolates Adam
    itself vs params-as-carry."""
    from fullycnnspeechenhancement_tpu.train.step import TrainState, spectral_l2_loss

    def loss_fn(p, bn_s):
        x = mag0[..., None].astype(jnp.bfloat16)
        pred, new_bn = model.apply(p, bn_s, x, is_training=True)
        loss = spectral_l2_loss(pred.astype(jnp.float32), mag0[..., None] * 0.5, B)
        return loss, new_bn

    (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        s.params, s.bn_state
    )
    new_params = jax.tree.map(lambda p, g: p - 1e-3 * g, s.params, grads)
    return TrainState(new_params, new_bn, s.opt_state, s.step + 1), loss


if MODE in ("full_sgd",):
    timeit("full step, SGD, params carried", full_sgd, state)


def fwdbwd_params_carried(carry):
    """fwd+bwd with params flowing through the scan carry but NEVER
    updated -- isolates 'weights are loop variables' from 'weights
    change'."""
    p, c = carry

    def loss_fn(p):
        x = c[..., None].astype(jnp.bfloat16)
        pred, _ = model.apply(p, bn_state, x, is_training=True)
        return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

    loss, grads = jax.value_and_grad(loss_fn)(p)
    leaf = jax.tree_util.tree_leaves(grads)[0]
    return (p, c + leaf.mean() * 1e-12), loss


if MODE in ("fwdbwd_pcarry",):
    timeit("fwd+bwd, params carried (identity)", fwdbwd_params_carried, (params, mag0))
