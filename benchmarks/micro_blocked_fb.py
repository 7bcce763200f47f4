"""Blocked train step: frequency-block-size (fb) sweep on the real TPU.

fb controls the freq-to-depth fold (models/blocked.py): fb=4 gives
fb*C ~= 40-100 channels, fb=8 gives ~80-200 but more tap-FLOPs
((KB*fb)/k growth).  Both are exact reparametrizations; this measures
which rides the memory-bound regime best end-to-end (fwd+bwd+Adam).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.config import Config, ModelConfig, TrainConfig
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.models.blocked import apply_blocked
from fullycnnspeechenhancement_tpu.train import create_train_state
from fullycnnspeechenhancement_tpu.train.step import (
    Batch,
    TrainState,
    make_optimizer,
    noam_schedule,
    spectral_l2_loss,
)
from fullycnnspeechenhancement_tpu.dsp.features import SpectrogramExtractor

BATCH, SEC, ITERS = 64, 8.0, 30


def make_step(config, model, fb):
    ext = SpectrogramExtractor(config.dsp)
    tx = make_optimizer(config)
    cd = jnp.dtype(config.model.compute_dtype)

    def loss_fn(params, bn_state, batch):
        mix = ext(batch.mix_wav, batch.lengths)
        clean = ext(batch.clean_wav, batch.lengths)
        x = mix[..., None].astype(cd)
        if fb:
            pred, new_bn = apply_blocked(
                model, params, bn_state, x, is_training=True, fb=fb
            )
        else:
            pred, new_bn = model.apply(params, bn_state, x, is_training=True)
        loss = spectral_l2_loss(
            pred.astype(jnp.float32), clean[..., None], config.train.batch_size
        )
        return loss, new_bn

    def step(state, batch):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, batch
        )
        import optax

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_bn, new_opt, state.step + 1), loss

    return step


def main():
    samples = int(SEC * 8000)
    cfg = Config(
        model=ModelConfig(net_work="FullyCNNV2", compute_dtype="bfloat16"),
        train=TrainConfig(batch_size=BATCH, lr=1.5e-3),
    )
    model = get_model("FullyCNNV2")
    rng = np.random.default_rng(0)
    t = np.arange(samples) / 8000.0
    clean = 0.3 * np.sin(
        2 * np.pi * rng.uniform(100, 1000, (BATCH, 1)) * t[None, :]
    ).astype(np.float32)
    mix = clean + 0.1 * rng.standard_normal((BATCH, samples)).astype(np.float32)
    b = Batch(
        jnp.asarray(mix), jnp.asarray(clean), jnp.full((BATCH,), samples, jnp.int32)
    )

    for fb in (0, 4, 8, 16):
        state = create_train_state(cfg, model, jax.random.PRNGKey(0))
        step = make_step(cfg, model, fb)

        @jax.jit
        def chain(state, b):
            def body(s, _):
                s, loss = step(s, b)
                return s, loss

            state, losses = jax.lax.scan(body, state, None, length=ITERS)
            return state, losses[-1]

        s, last = chain(state, b)
        float(last)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, last = chain(s, b)
            float(last)
            times.append(time.perf_counter() - t0)
        ms = min(times) / ITERS * 1e3
        print(
            f"fb={fb or 'NHWC'}: {ms:.1f} ms/step, "
            f"{BATCH * SEC / (ms / 1e3):.0f} audio-s/s"
        )


if __name__ == "__main__":
    main()
