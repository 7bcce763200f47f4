"""The conv + batch-norm + (skip) + relu building block, functional style.

Behavioural spec: `/root/reference/model_utils/module.py:11-34` --
conv2d(SAME) -> optional BN -> optional skip-add (after BN, *before* ReLU)
-> optional ReLU, with TF-1.14 semantics the TPU build must replicate for
checkpoint parity (SURVEY.md SS2.1):

  * SAME padding for even kernels is asymmetric: (k-1)//2 before, k//2
    after (time-kernel 8 -> 3 frames before, 4 after);
  * conv kernel init Glorot/Xavier uniform, bias zeros;
  * BN momentum 0.99, epsilon 1e-3, trainable gamma/beta, moving stats
    updated as moving = momentum*moving + (1-momentum)*batch (biased batch
    variance), applied *before* the optimizer step of the same batch.

Design: explicit param/state pytrees (no Module classes) keyed by the
reference's scope names so TF checkpoints map 1:1.  Params and state are
float32; activations run in `compute_dtype` (float32 for parity, bfloat16
for the TPU fast path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM = 0.99
BN_EPSILON = 1e-3


def tf_same_pads(kernel: Tuple[int, int]) -> tuple:
    """TF SAME padding (stride 1): (k-1)//2 before, k//2 after, per dim."""
    kh, kw = kernel
    return ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)


def glorot_uniform(key, shape):
    """Glorot/Xavier uniform for HWIO conv kernels (tf.layers default)."""
    kh, kw, cin, cout = shape
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def conv_bn_relu_init(
    key, in_ch: int, out_ch: int, kernel: Tuple[int, int], use_norm: bool = True
):
    """(params, state) for one block.  State is empty without BN."""
    params = {
        "w": glorot_uniform(key, (kernel[0], kernel[1], in_ch, out_ch)),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }
    state = {}
    if use_norm:
        params["gamma"] = jnp.ones((out_ch,), jnp.float32)
        params["beta"] = jnp.zeros((out_ch,), jnp.float32)
        state = {
            "mean": jnp.zeros((out_ch,), jnp.float32),
            "var": jnp.ones((out_ch,), jnp.float32),
        }
    return params, state


def conv_bn_relu_apply(
    params,
    state,
    x: jnp.ndarray,
    *,
    kernel: Tuple[int, int],
    is_training: bool,
    use_norm: bool = True,
    use_act: bool = True,
    skip_input: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
    frame_mask: Optional[jnp.ndarray] = None,
):
    """Apply one block to NHWC `x` ([B, T, F, C]).  Returns (y, new_state).

    `new_state` is `state` unchanged in eval mode / when use_norm=False.

    `frame_mask` ([B, T], 1.0 = frame participates): restricts the BN
    *batch statistics* to masked frames.  The reference computes BN
    moments over batch-max-padded blocks (trainer.py:158-163 dynamic
    placeholders + padded collate); static bucket padding adds slack
    frames the reference never sees, so the train step masks them out of
    the moments (activations at masked frames still flow forward; they
    are excluded from the loss separately).  None = all frames (faithful
    when the batch is padded exactly to its max length).
    """
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=tf_same_pads(kernel),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    y = y + params["b"].astype(x.dtype)

    new_state = state
    if use_norm:
        if is_training:
            # Biased batch moments over N,H,W in at least float32 (bf16
            # moments would drift the moving stats; f64 inputs keep f64).
            y32 = y.astype(jnp.promote_types(jnp.float32, y.dtype))
            if frame_mask is not None:
                # frame_mask may be [1, T] (batch-max mask, row-identical:
                # keep it broadcast -- see features.batch_max_frame_mask)
                # or [B, T] (per-utterance); the denominator scales by the
                # broadcast factor.
                m = frame_mask.astype(y32.dtype)[:, :, None, None]
                n = jnp.sum(m) * y.shape[2] * (y.shape[0] // m.shape[0])
                mean = jnp.sum(y32 * m, axis=(0, 1, 2)) / n
                var = jnp.sum(jnp.square(y32) * m, axis=(0, 1, 2)) / n - jnp.square(
                    mean
                )
            else:
                mean = jnp.mean(y32, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(y32), axis=(0, 1, 2)) - jnp.square(mean)
            new_state = {
                "mean": BN_MOMENTUM * state["mean"] + (1.0 - BN_MOMENTUM) * mean,
                "var": BN_MOMENTUM * state["var"] + (1.0 - BN_MOMENTUM) * var,
            }
        else:
            mean, var = state["mean"], state["var"]
        scale = params["gamma"] * jax.lax.rsqrt(var + BN_EPSILON)
        shift = params["beta"] - mean * scale
        y = y * scale.astype(x.dtype) + shift.astype(x.dtype)

    if skip_input is not None:
        # Skip add after BN, before ReLU (module.py:30-31).
        y = y + skip_input
    if use_act:
        y = jax.nn.relu(y)
    return y, new_state
