"""Where does the 79.8 ms bf16+blocked train step go, and how far is it
from the HBM roofline?

Stages timed on the real chip (scan-chain + single scalar fetch, per
PERF_NOTES methodology): blocked fwd, blocked fwd+bwd, full train step.
For each jitted probe we also print XLA's own cost analysis (flops,
bytes accessed) so the roofline ratio is computed from the compiler's
numbers, not hand arithmetic.

Usage: python benchmarks/micro_blocked_breakdown.py [stage]
  stage in {all, fwd, fwdbwd, full, nobn}
"""
import sys, time

sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache

enable_compilation_cache()

from fullycnnspeechenhancement_tpu.config import Config, ModelConfig, TrainConfig
from fullycnnspeechenhancement_tpu.dsp import SpectrogramExtractor
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.models.blocked import apply_blocked
from fullycnnspeechenhancement_tpu.train import create_train_state
from fullycnnspeechenhancement_tpu.train.step import Batch, make_train_step

B, SECONDS, ITERS = 64, 8.0, 20
SAMPLES = int(SECONDS * 8000)
MODE = sys.argv[1] if len(sys.argv) > 1 else "all"
HBM_GBS = 819.0  # v5e HBM bandwidth

config = Config(
    model=ModelConfig(
        net_work="FullyCNNV2", compute_dtype="bfloat16", blocked_compute=True
    ),
    train=TrainConfig(batch_size=B, lr=1.5e-3),
)
model = get_model("FullyCNNV2")
state = create_train_state(config, model, jax.random.PRNGKey(0))
ext = SpectrogramExtractor(config.dsp)

rng = np.random.default_rng(0)
t = np.arange(SAMPLES) / 8000.0
clean = 0.3 * np.sin(
    2 * np.pi * rng.uniform(100, 1000, (B, 1)) * t[None, :]
).astype(np.float32)
mix = clean + 0.1 * rng.standard_normal((B, SAMPLES)).astype(np.float32)
lengths = jnp.full((B,), SAMPLES, jnp.int32)
mix, clean = jnp.asarray(mix), jnp.asarray(clean)


def timeit(label, fn, carry):
    @jax.jit
    def chain(c):
        def body(c, _):
            return fn(c)

        c, ys = jax.lax.scan(body, c, None, length=ITERS)
        return c, ys[-1]

    lowered = chain.lower(carry)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", 0.0) / ITERS
        byt = ca.get("bytes accessed", 0.0) / ITERS
    except Exception as e:  # pragma: no cover
        flops, byt = float("nan"), float("nan")
        print(f"  (cost analysis unavailable: {e})")
    t0 = time.time()
    _, last = compiled(carry)
    float(last)
    print(f"{label}: first run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, last = compiled(carry)
        float(last)
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1e3
    sol_ms = byt / (HBM_GBS * 1e9) * 1e3
    print(
        f"{label}: {ms:.2f} ms | XLA: {flops/1e9:.1f} GFLOP, "
        f"{byt/1e9:.2f} GB accessed -> HBM SOL {sol_ms:.2f} ms, "
        f"ratio {ms/sol_ms if sol_ms else float('nan'):.2f}x, "
        f"eff BW {byt/1e9/(ms/1e3):.0f} GB/s, "
        f"eff {flops/1e12/(ms/1e3):.1f} TFLOP/s",
        flush=True,
    )
    return ms


params, bn_state = state.params, state.bn_state
mag0 = ext(mix, lengths)


def fwd(c):
    x = c[..., None].astype(jnp.bfloat16)
    pred, _ = apply_blocked(model, params, bn_state, x, is_training=True)
    out = pred.mean().astype(jnp.float32)
    return c + out * 1e-12, out


def fwdbwd(c):
    def loss_fn(p):
        x = c[..., None].astype(jnp.bfloat16)
        pred, _ = apply_blocked(model, p, bn_state, x, is_training=True)
        return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaf = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
    return c + leaf * 1e-12, loss


def fwdbwd_nobn(c):
    """Same fwd+bwd but BN in inference mode (running stats): isolates the
    cost of the training-mode batch moments + their backward."""

    def loss_fn(p):
        x = c[..., None].astype(jnp.bfloat16)
        pred, _ = apply_blocked(model, p, bn_state, x, is_training=False)
        return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaf = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
    return c + leaf * 1e-12, loss


step = make_train_step(config, model)


def full(s):
    s, metrics = step(s, Batch(mix, clean, lengths))
    return s, metrics["loss"]


if MODE in ("all", "fwd"):
    timeit("blocked fwd (bf16)", fwd, mag0)
if MODE in ("all", "fwdbwd"):
    timeit("blocked fwd+bwd (bf16)", fwdbwd, mag0)
if MODE in ("all", "nobn"):
    timeit("blocked fwd+bwd, BN eval-mode", fwdbwd_nobn, mag0)
if MODE in ("all", "full"):
    timeit("full blocked train step", full, state)
