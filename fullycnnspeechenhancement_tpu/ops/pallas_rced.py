"""Fused R-CED inference forward as a single Pallas TPU kernel.

Why: XLA executes the 16-layer stack as 16 small convs, each streaming
[B, T, 129, C<=32] activations through HBM; with these tiny channel counts
the MXU runs at a few percent utilization and the step is dominated by
HBM round-trips and per-op overhead.  The structure of the model family
(SURVEY.md SS2.1: only the FIRST conv looks across time; every later layer
is a per-frame frequency conv) lets the whole remainder of the network run
out of VMEM:

  * layer 1 (time kernel 8) runs as one small XLA conv -- ~3% of FLOPs;
  * this kernel fuses ALL remaining layers: activations for a
    [T_TILE, 129, C] slab plus every weight (~32k params) live in VMEM;
    each frequency conv is computed as k accumulated MXU matmuls of
    freq-shifted slabs ([T_TILE*129, Cin] @ [Cin, Cout]), with BN folded
    into the conv weights (inference form), skip-adds read from VMEM tap
    buffers, and only the final [T_TILE, 129, 1] slab written back to HBM.

HBM traffic drops from ~16 activation round trips to exactly one read +
one write.  BN folding: y = gamma*(conv+b-mean)/sqrt(var+eps)+beta ==
conv_with(w*s) + (b-mean)*s + beta where s = gamma/sqrt(var+eps); the
skip-add happens after BN and before ReLU, so folding preserves the
reference ordering (module.py:27-34).

STATUS: correctness-verified (tests/test_pallas.py runs it in interpret
mode against model.apply for all three variants).  On this environment's
remote-Mosaic-compile service, kernels containing sub-lane-misaligned
frequency slices intermittently hang or crash the compile helper
(benchmarks/micro_pallas_min.py reproduces: a plain rank-3 dot compiles
in ~22 s, a padded-shifted-slice variant returns HTTP 500 or hangs), so
the XLA layer-by-layer path remains the default on-device inference
route; flip to this kernel on toolchains where Mosaic compiles it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fullycnnspeechenhancement_tpu.models.blocks import BN_EPSILON, tf_same_pads
from fullycnnspeechenhancement_tpu.models.rced import ConvSpec, ModelDef

F_DIM = 129


def fold_bn_inference(model: ModelDef, params, bn_state):
    """-> list of (spec, w_folded [k,Cin,Cout] or [kh,kw,Cin,Cout], b_folded)
    for inference-mode BN."""
    folded = []
    for spec in model.layers:
        p = params[spec.name]
        w, b = p["w"], p["b"]
        if spec.use_norm:
            s = bn_state[spec.name]
            scale = p["gamma"] * jax.lax.rsqrt(s["var"] + BN_EPSILON)
            w = w * scale  # broadcast over trailing (out-channel) dim
            b = (b - s["mean"]) * scale + p["beta"]
        folded.append((spec, w, b))
    return folded


def _freq_conv_in_kernel(x, w, b, kernel_w: int):
    """x [T, F, Cin] (VMEM value), w [kw, Cin, Cout], b [Cout] ->
    [T, F, Cout] via kw accumulated matmuls of freq-shifted slabs."""
    lo, hi = (kernel_w - 1) // 2, kernel_w // 2
    T = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    rows = T * F_DIM
    acc = jnp.zeros((rows, w.shape[2]), jnp.float32)
    for j in range(kernel_w):
        slab = xp[:, j : j + F_DIM, :].reshape(rows, x.shape[2])
        acc = acc + jnp.dot(
            slab, w[j], preferred_element_type=jnp.float32
        )
    return (acc + b[None, :]).reshape(T, F_DIM, w.shape[2])


def fused_inference_forward(model, params, bn_state, mag, t_tile: int = 64):
    """See `_fused_inference_forward`; resolves interpret mode (CPU tests)
    at call time."""
    interpret = jax.default_backend() == "cpu"
    return _fused_inference_forward(
        model, params, bn_state, mag, t_tile=t_tile, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("model", "t_tile", "interpret"))
def _fused_inference_forward(
    model: ModelDef,
    params,
    bn_state,
    mag: jnp.ndarray,
    t_tile: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T, F] magnitude -> [B, T, F] enhanced magnitude, inference mode.

    Equivalent to `model.apply(..., is_training=False)` on [B,T,F,1] with
    BN folded; T must not be huge (one [t_tile] slab of every tap layer
    must fit VMEM -- t_tile=64 keeps the V2 working set ~6 MB in f32).
    """
    B, T, F = mag.shape
    assert F == F_DIM, f"kernel is specialized for F={F_DIM}"
    folded = fold_bn_inference(model, params, bn_state)

    # Layer 1 (the only time-extent conv) via XLA.
    first_spec, w1, b1 = folded[0]
    x = mag[..., None]
    y1 = jax.lax.conv_general_dilated(
        x,
        w1,
        (1, 1),
        tf_same_pads(first_spec.kernel),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1
    if first_spec.use_act:
        y1 = jax.nn.relu(y1)
    first_name = first_spec.name

    rest = folded[1:]
    specs = tuple(s for s, _, _ in rest)
    # Taps referencing layer 1 read the kernel's input slab; rewrite the
    # name so the in-kernel tap dict finds it.
    specs = tuple(
        ConvSpec(
            s.name,
            s.out_ch,
            s.kernel,
            s.use_norm,
            s.use_act,
            "__input__" if s.skip_from == first_name else s.skip_from,
            "__input__" if s.add_from == first_name else s.add_from,
        )
        for s in specs
    )

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        x = x_ref[0].astype(jnp.float32)
        taps = {"__input__": x}
        for i, spec in enumerate(specs):
            w = wrefs[2 * i][...].astype(jnp.float32)
            b = wrefs[2 * i + 1][...].astype(jnp.float32)[0]  # [1,Cout]->[Cout]
            y = _freq_conv_in_kernel(x, w, b, spec.kernel[1])
            if spec.skip_from is not None:
                y = y + taps[spec.skip_from]
            if spec.use_act:
                y = jnp.maximum(y, 0.0)
            if spec.add_from is not None:
                y = y + taps[spec.add_from]
            taps[spec.name] = y
            x = y
        out_ref[0] = x[..., 0].astype(out_ref.dtype)

    # Pad T to a tile multiple.
    T_pad = ((T + t_tile - 1) // t_tile) * t_tile
    if T_pad != T:
        y1 = jnp.pad(y1, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))

    weight_args = []
    in_specs = [
        pl.BlockSpec(
            (1, t_tile, F_DIM, y1.shape[-1]),
            lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    for spec, w, b in rest:
        # freq-only kernels: squeeze the unit time dim -> [kw, Cin, Cout];
        # biases as [1, Cout] (TPU wants >=2D operands)
        weight_args += [w[0], b[None, :]]
        in_specs += [
            pl.BlockSpec(
                w[0].shape, lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, b.shape[0]), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(B, T_pad // t_tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_tile, F_DIM), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, F_DIM), mag.dtype),
        interpret=interpret,
    )(y1, *weight_args)
    return out[:, :T]
