"""Split the blocked backward into dX-chain vs dW cost, sweep batch size,
and census the optimized HLO.

  * `dxonly`: grads w.r.t. the INPUT magnitude only (weights are
    constants): times the dX chain without the 16 dW contractions.
  * `dwonly`: value_and_grad on params but with stop_gradient re-centred
    is impossible structurally; instead we report full - dxonly as the
    dW estimate.
  * `batch N`: full train step at batch N (audio-s/s scaling).
  * `hlo`: print the largest fusions/convs in the optimized fwd+bwd HLO
    (compile only; no device time).

Run: python benchmarks/micro_bwd_split.py [dxonly|full|batch128|hlo ...]
"""
import re
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

SECONDS, ITERS = 8.0, 20
SAMPLES = int(SECONDS * 8000)
MODES = sys.argv[1:] or ["dxonly", "hlo"]


def data(B):
    rng = np.random.default_rng(0)
    t = np.arange(SAMPLES) / 8000.0
    clean = 0.3 * np.sin(
        2 * np.pi * rng.uniform(100, 1000, (B, 1)) * t[None, :]
    ).astype(np.float32)
    mix = clean + 0.1 * rng.standard_normal((B, SAMPLES)).astype(np.float32)
    return (
        jnp.asarray(mix),
        jnp.asarray(clean),
        jnp.full((B,), SAMPLES, jnp.int32),
    )


def setup(B):
    config = Config(
        model=ModelConfig(
            net_work="FullyCNNV2", compute_dtype="bfloat16", blocked_compute=True
        ),
        train=TrainConfig(batch_size=B, lr=1.5e-3),
    )
    model = get_model("FullyCNNV2")
    state = create_train_state(config, model, jax.random.PRNGKey(0))
    return config, model, state


def timeit(label, fn, carry, B):
    @jax.jit
    def chain(c):
        def body(c, _):
            return fn(c)

        c, ys = jax.lax.scan(body, c, None, length=ITERS)
        return c, ys[-1]

    _, last = chain(carry)
    float(last)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, last = chain(carry)
        float(last)
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1e3
    print(
        f"{label}: {ms:.2f} ms/step, {B*SECONDS/(ms/1e3):.0f} audio-s/s",
        flush=True,
    )
    return ms


for mode in MODES:
    if mode == "dxonly":
        B = 64
        config, model, state = setup(B)
        params, bn_state = state.params, state.bn_state
        ext = SpectrogramExtractor(config.dsp)
        mix, clean, lengths = data(B)
        mag0 = ext(mix, lengths)

        def dxonly(c):
            def loss_fn(m):
                x = m[..., None].astype(jnp.bfloat16)
                pred, _ = apply_blocked(
                    model, params, bn_state, x, is_training=True
                )
                return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

            loss, g = jax.value_and_grad(loss_fn)(c)
            return c + g * 1e-12, loss

        timeit("bwd dX-chain only (grad wrt input)", dxonly, mag0, B)

        def full(c):
            def loss_fn(p):
                x = c[..., None].astype(jnp.bfloat16)
                pred, _ = apply_blocked(model, p, bn_state, x, is_training=True)
                return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

            loss, grads = jax.value_and_grad(loss_fn)(params)
            leaf = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return c + leaf * 1e-12, loss

        timeit("fwd+bwd full (dX+dW)", full, mag0, B)

    elif mode.startswith("batch"):
        B = int(mode[5:])
        config, model, state = setup(B)
        step = make_train_step(config, model)
        mix, clean, lengths = data(B)
        b = Batch(mix, clean, lengths)

        def fullstep(s):
            s, m = step(s, b)
            return s, m["loss"]

        timeit(f"full train step B={B}", fullstep, state, B)

    elif mode == "hlo":
        B = 64
        config, model, state = setup(B)
        params, bn_state = state.params, state.bn_state
        ext = SpectrogramExtractor(config.dsp)
        mix, clean, lengths = data(B)
        mag0 = ext(mix, lengths)

        def full(c):
            def loss_fn(p):
                x = c[..., None].astype(jnp.bfloat16)
                pred, _ = apply_blocked(model, p, bn_state, x, is_training=True)
                return jnp.sum((pred.astype(jnp.float32) - 1.0) ** 2) / B

            loss, grads = jax.value_and_grad(loss_fn)(params)
            leaf = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return c + leaf * 1e-12, loss

        txt = jax.jit(full).lower(mag0).compile().as_text()
        # census: count ops by (kind, output shape), biggest first
        census = {}
        for m_ in re.finditer(
            r"^\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\][^=]*"
            r"(convolution|fusion|dot|reduce|copy|transpose|all-reduce)",
            txt,
            re.M,
        ):
            dt, shape, kind = m_.groups()
            elems = 1
            for d in shape.split(","):
                if d:
                    elems *= int(d)
            bytes_ = elems * (2 if dt == "bf16" else 4)
            key = (kind, dt, shape)
            c0, b0 = census.get(key, (0, 0))
            census[key] = (c0 + 1, b0 + bytes_)
        rows = sorted(census.items(), key=lambda kv: -kv[1][1])
        print("top optimized-HLO ops by total output bytes:")
        for (kind, dt, shape), (cnt, byt) in rows[:25]:
            print(f"  {cnt:3d}x {kind:12s} {dt}[{shape}]  {byt/1e6:8.1f} MB")
        kinds = {}
        for (kind, dt, shape), (cnt, byt) in census.items():
            c0, b0 = kinds.get(kind, (0, 0))
            kinds[kind] = (c0 + cnt, b0 + byt)
        print("by kind:")
        for kind, (cnt, byt) in sorted(kinds.items(), key=lambda kv: -kv[1][1]):
            print(f"  {kind:12s} x{cnt:4d}  {byt/1e9:6.2f} GB output")
