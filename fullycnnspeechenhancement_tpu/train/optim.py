"""Optimizer and LR schedule with TF-1.14 semantics.

The reference trains with `tf.train.AdamOptimizer` under a Noam warmup
schedule (`/root/reference/model_utils/trainer.py:68-76,175-179`).  Two
fidelity details:

  * TF Adam's epsilon sits *outside* the bias-corrected sqrt:
    theta -= lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps).
    optax.scale_by_adam instead applies eps to the corrected v_hat, which
    changes the effective epsilon by 1/sqrt(1-b2^t) in early steps.  We
    implement the TF form exactly.
  * The reference feeds lr = init_lr on the very first step (self.lr is
    initialised to init_lr and only updated from the Noam formula *after*
    each step, trainer.py:27,185,215).  We use lr(t) = noam(t) for all t,
    which matches the reference from step 1 onward; only step 0 differs
    (init_lr vs init_lr/warmup).  Documented departure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def noam_schedule(init_lr: float, warmup_steps: float):
    """lr(step) = init_lr * warmup^0.5 * min((step+1)*warmup^-1.5,
    (step+1)^-0.5)  (trainer.py:68-76)."""

    def schedule(step):
        s = step + 1.0
        return (
            init_lr
            * warmup_steps**0.5
            * jnp.minimum(s * warmup_steps**-1.5, s**-0.5)
        )

    return schedule


class TFAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def tf_adam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam exactly as tf.train.AdamOptimizer applies it.

    `learning_rate` may be a float or a schedule fn(step) -> lr.
    """

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return TFAdamState(count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, updates
        )
        lr = (
            learning_rate(state.count)
            if callable(learning_rate)
            else jnp.asarray(learning_rate)
        )
        alpha = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        new_updates = jax.tree.map(
            lambda m, v: -alpha * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return new_updates, TFAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
