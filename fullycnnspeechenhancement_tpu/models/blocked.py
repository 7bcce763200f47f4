"""Freq-to-depth ("blocked") forward: the TPU-fast model compute path.

The R-CED family's hot ops are (1,k) convolutions over F=129 frequency
bins with 10-32 channels -- pathologically small channel counts for the
TPU's 128-lane vector layout and MXU.  This module reparametrizes each
layer EXACTLY (same math, same params; only the floating-point reduction
order changes): fold FB=4 consecutive frequency bins into the channel
dimension, turning every (1,k) freq conv into a (1,KB<=5) conv over
NB=ceil(F/FB) blocks with FB*C ~= 40-128 channels -- dense MXU shapes.
The per-output-element FLOPs grow by (KB*FB)/k, which rides free under
the memory-bound regime (measured: 14-layer fwd+bwd 41 ms blocked vs
79 ms NHWC on v5e, B=64 T=500 C=25 k=5 bf16 --
benchmarks/micro_conv_strategies.py strategy D).

Weight transform (differentiable, done on-device per call; the canonical
[kh,kw,Cin,Cout] tensors remain the single source of truth so checkpoints,
the optimizer, and parity tests are untouched):

    W_blk[t, d, v*Cin+ci, u*Cout+co] = w[t, (d-dc)*FB + v - u + lo, ci, co]

where u is the output bin's position inside its block, v the input bin's,
d the block-offset tap, lo = (kw-1)//2 (TF SAME for odd kw).  Out-of-range
j map to a zero row via a sentinel gather index.

Semantics preserved relative to `ModelDef.apply` (blocks.py):
  * TF SAME padding: freq handled by the index map + zero pad band
    (F padded to NB*FB with zeros, re-masked after every layer so
    neighbour-block taps read true zeros); time via conv padding.
  * BN batch moments over (B, T, real F) exactly: masked sums divided by
    B*T*F (pad bins contribute zero), per canonical channel (fold the
    in-block position axis).
  * skip-add after BN before ReLU; V3 residual add after ReLU; the final
    (1,129) full-freq projection runs on the unblocked layout (its taps
    span every block).

The reference implements these layers as tf.layers.conv2d NHWC graphs
(/root/reference/model_utils/model.py, module.py:11-34); this formulation
is the TPU-native answer to the same contract.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.models.blocks import (
    BN_EPSILON,
    BN_MOMENTUM,
    tf_same_pads,
)
from fullycnnspeechenhancement_tpu.models.rced import ModelDef
from fullycnnspeechenhancement_tpu.ops.pallas_dw import blocked_freq_conv

# Measured on v5e (benchmarks/micro_blocked_fb.py, V2 train step bf16,
# B=64 T=500): fb=4 -> 85.8 ms, fb=8 -> 79.8 ms, fb=16 -> 91.3 ms vs
# NHWC 120.6 ms.  fb=8 gives ~200 channels (full MXU lanes) before the
# tap-FLOP growth outweighs the density win.
FB_DEFAULT = 8


@functools.lru_cache(maxsize=64)
def _block_index_map(kw: int, fb: int) -> Tuple[np.ndarray, int]:
    """(J [KB, fb(v), fb(u)] gather indices with sentinel kw, dc)."""
    lo, hi = (kw - 1) // 2, kw // 2
    d_min = (0 - lo - (fb - 1)) // fb  # floor over the leftmost tap
    d_max = (fb - 1 + hi) // fb
    kb = d_max - d_min + 1
    dc = -d_min
    J = np.full((kb, fb, fb), kw, np.int64)  # sentinel -> zero row
    for d in range(kb):
        for v in range(fb):
            for u in range(fb):
                j = (d - dc) * fb + v - u + lo
                if 0 <= j < kw:
                    J[d, v, u] = j
    return J, dc


def _block_weight(w: jnp.ndarray, fb: int) -> Tuple[jnp.ndarray, int]:
    """[kh, kw, Cin, Cout] -> ([kh, KB, fb*Cin, fb*Cout], dc).  Exact,
    differentiable (gather; backward is a tiny scatter-add)."""
    kh, kw, cin, cout = w.shape
    J, dc = _block_index_map(kw, fb)
    wpad = jnp.concatenate([w, jnp.zeros((kh, 1, cin, cout), w.dtype)], axis=1)
    g = jnp.take(wpad, jnp.asarray(J.reshape(-1)), axis=1)
    g = g.reshape(kh, J.shape[0], fb, fb, cin, cout)
    g = g.transpose(0, 1, 2, 4, 3, 5)  # [kh, KB, v, Cin, u, Cout]
    return g.reshape(kh, J.shape[0], fb * cin, fb * cout), dc


def _freq_mask(f_dim: int, fb: int, dtype) -> jnp.ndarray:
    """[1, 1, NB, fb] 1.0 where the bin index is a real frequency."""
    nb = -(-f_dim // fb)
    m = (np.arange(nb * fb) < f_dim).astype(np.float32).reshape(1, 1, nb, fb)
    return jnp.asarray(m, dtype)


def block_input(x: jnp.ndarray, fb: int) -> jnp.ndarray:
    """NHWC [B, T, F, C] -> [B, T, NB, fb*C] (freq zero-padded to NB*fb)."""
    B, T, F, C = x.shape
    nb = -(-F // fb)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, nb * fb - F), (0, 0)))
    return x.reshape(B, T, nb, fb * C)


def unblock_output(z: jnp.ndarray, f_dim: int, c: int) -> jnp.ndarray:
    """[B, T, NB, fb*C] -> NHWC [B, T, F, C]."""
    B, T, nb, fc = z.shape
    return z.reshape(B, T, nb * (fc // c), c)[:, :, :f_dim, :]


def apply_blocked(
    model: ModelDef,
    params,
    state,
    x: jnp.ndarray,
    *,
    is_training: bool,
    fb: int = FB_DEFAULT,
    precision=None,
    frame_mask=None,
    dw_pallas: bool = False,
):
    """Drop-in equivalent of `ModelDef.apply` on NHWC [B, T, F, 1].

    Returns (y [B, T, F, 1], new_state).  Numerics match `apply` up to
    floating-point reduction order (dense matmuls vs per-tap convs).

    `frame_mask` ([B, T]) restricts BN batch statistics to masked frames
    (see blocks.conv_bn_relu_apply); the freq pad-band mask composes with
    it.
    """
    if precision is None:
        precision = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    B, T, F, _ = x.shape
    nb = -(-F // fb)
    mask4 = _freq_mask(F, fb, x.dtype)  # [1,1,NB,fb]
    n_real = B * T * F

    z = block_input(x, fb)
    taps, new_state = {}, {}
    ch = {spec.name: spec.out_ch for spec in model.layers}

    for li, spec in enumerate(model.layers):
        p = params[spec.name]
        cout = spec.out_ch
        kh, kw = spec.kernel
        is_last_fullfreq = kw >= F  # the (1,129) projection: run unblocked

        if is_last_fullfreq:
            cin = z.shape[3] // fb
            xn = unblock_output(z, F, cin)
            y = jax.lax.conv_general_dilated(
                xn,
                p["w"].astype(x.dtype),
                (1, 1),
                tf_same_pads(spec.kernel),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision,
            ) + p["b"].astype(x.dtype)
            # final layer in every variant has no BN; keep the general path
            # below out of it
            if spec.use_act:
                y = jax.nn.relu(y)
            z = block_input(y, fb)
            taps[spec.name] = z
            continue

        wb, dc = _block_weight(p["w"], fb)
        kb = wb.shape[1]
        if kh == 1 and dw_pallas:
            # Optional custom backward: dW runs one HBM pass in a Pallas
            # kernel (ops/pallas_dw.py).  Measured SLOWER than XLA's own
            # fused conv autodiff on v5e (131.8 vs 79.4 ms per batch-64
            # bf16 V2 step -- PERF_NOTES.md round 3), hence off by
            # default; the plain conv below lets XLA emit its fused
            # backward.
            y = blocked_freq_conv(z, wb.astype(x.dtype), dc, precision, True)
        else:
            y = jax.lax.conv_general_dilated(
                z,
                wb.astype(x.dtype),
                (1, 1),
                [tf_same_pads(spec.kernel)[0], (dc, kb - 1 - dc)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision,
            )
        bias = jnp.tile(p["b"], fb)
        y = y + bias.astype(x.dtype)

        if spec.use_norm:
            s = state.get(spec.name, {})
            if is_training:
                # Masked biased moments over (B, T, real F) per canonical
                # channel, in at least f32 regardless of compute dtype.
                mdt = jnp.promote_types(jnp.float32, y.dtype)
                y32 = y.astype(mdt).reshape(B, T, nb, fb, cout)
                m32 = mask4.astype(mdt)[..., None]
                if frame_mask is not None:
                    # [1, T] batch-max masks stay broadcast (a [B, T] mask
                    # materializes a full-rank f32 mask product per layer:
                    # measured +28 ms/step -- micro_mask_cost.py); the
                    # denominator scales by the broadcast factor.
                    m32 = m32 * frame_mask.astype(mdt)[:, :, None, None, None]
                    n = (
                        jnp.sum(frame_mask.astype(mdt))
                        * F
                        * (B // frame_mask.shape[0])
                    )
                else:
                    n = n_real
                ys = jnp.sum(y32 * m32, axis=(0, 1, 2, 3))
                yss = jnp.sum(jnp.square(y32) * m32, axis=(0, 1, 2, 3))
                mean = ys / n
                var = yss / n - jnp.square(mean)
                new_state[spec.name] = {
                    "mean": BN_MOMENTUM * s["mean"] + (1.0 - BN_MOMENTUM) * mean,
                    "var": BN_MOMENTUM * s["var"] + (1.0 - BN_MOMENTUM) * var,
                }
            else:
                mean, var = s["mean"], s["var"]
            scale = p["gamma"] * jax.lax.rsqrt(var + BN_EPSILON)
            shift = p["beta"] - mean * scale
            y = y * jnp.tile(scale, fb).astype(x.dtype) + jnp.tile(
                shift, fb
            ).astype(x.dtype)

        if spec.skip_from is not None:
            y = y + taps[spec.skip_from]
        if spec.use_act:
            y = jax.nn.relu(y)
        if spec.add_from is not None:
            y = y + taps[spec.add_from]
        # Re-zero the pad band so the next layer's neighbour-block taps and
        # the next BN's masked sums read true zeros.
        y = (
            y.reshape(B, T, nb, fb, cout) * mask4[..., None]
        ).reshape(B, T, nb, fb * cout)
        taps[spec.name] = y
        z = y

    cfinal = ch[model.layers[-1].name]
    out = unblock_output(z, F, cfinal)
    # eval mode / no-BN layers keep their incoming state untouched
    for name, s in state.items():
        if name not in new_state:
            new_state[name] = s
    return out, new_state
