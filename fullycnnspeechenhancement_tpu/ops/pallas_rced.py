"""Fused R-CED inference forward as a single Pallas TPU kernel.

Why: XLA executes the 16-layer stack as 16 small convs, each streaming
[B, T, 129, C<=32] activations through HBM; with these tiny channel counts
the MXU runs at a few percent utilization and the step is dominated by
HBM round-trips and per-op overhead.  The structure of the model family
(SURVEY.md SS2.1: only the FIRST conv looks across time; every later layer
is a per-frame frequency conv) lets the whole remainder of the network run
out of VMEM.

Kernel formulation (lane-aligned; the earlier [T, 129, C]-blocked variant
crashed this platform's Mosaic compile service on its misaligned slices):

  * activations live as 2D slabs [C_pad, N] -- channels on sublanes
    (padded to multiples of 8), flattened (time, freq) on lanes with the
    frequency axis zero-padded 129 -> F_PAD=136 so N = t_tile * 136 is a
    multiple of 128 lanes (136*16 == 17*128);
  * a frequency shift by s is then `pltpu.roll(x, -s mod N, axis=1)`: the
    7 zero lanes of pad per frame absorb cross-frame bleed for |s| <= 6,
    which covers every inner-layer kernel (max width 13 -> shift 6);
  * each conv layer is ONE MXU matmul: the k rolled copies are
    concatenated into an im2col slab [k*C_pad, N] and multiplied by the
    BN-folded packed weight [Cout_pad, k*C_pad] -- contraction depth
    ~128-350 instead of 25, so the MXU's K dimension is actually fed;
  * bias add, pad-band re-zeroing mask, skip-add (pre-ReLU, V1/V2),
    ReLU, and block-output residual add (post-ReLU, V3) all run on the
    VPU with every tap slab resident in VMEM;
  * layer 1 (the only time-extent conv, kernel height 8) and the final
    (1,129) projection (whose 129-wide taps exceed the pad gap) run as
    plain XLA convs outside the kernel.

HBM traffic for the inner 8-14 layers drops from one round trip per layer
to exactly one read + one write per slab.  BN folding: y =
gamma*(conv+b-mean)/sqrt(var+eps)+beta == conv_with(w*s) + (b-mean)*s +
beta where s = gamma/sqrt(var+eps); the skip-add happens after BN and
before ReLU, so folding preserves the reference ordering (module.py:27-34).

Verified two ways: tests/test_pallas.py runs the kernel in interpret mode
against model.apply for all three variants (CPU, exact); on the real chip
the MXU's default f32 precision gives ~2e-3 relative waveform error vs
the HIGHEST-precision XLA path -- use the XLA path for bit-parity claims
and this kernel for throughput serving.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fullycnnspeechenhancement_tpu.models.blocks import BN_EPSILON, tf_same_pads

logger = logging.getLogger(__name__)
from fullycnnspeechenhancement_tpu.models.rced import ConvSpec, ModelDef

F_DIM = 129
F_PAD = 136  # multiple of 8; pad gap 7 > max inner-layer shift 6


def _pad8(c: int) -> int:
    return ((c + 7) // 8) * 8


def fold_bn_inference(model: ModelDef, params, bn_state):
    """-> list of (spec, w_folded [kh,kw,Cin,Cout], b_folded [Cout]) for
    inference-mode BN."""
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


@dataclasses.dataclass(frozen=True)
class _LayerPlan:
    """Static per-layer description baked into the kernel."""

    name: str
    kw: int
    cin_pad: int
    cout_pad: int
    skip_from: Optional[str]  # pre-ReLU skip tap (V1/V2)
    add_from: Optional[str]  # post-ReLU residual tap (V3)
    use_act: bool


def _pack_weights(folded_inner, formulation: str = "im2col"):
    """Pack BN-folded inner-layer weights for the kernel.

    formulation="im2col": packed[i] = (wcol [cout_pad, kw*cin_pad], bias
    [cout_pad, 1]); row order of the im2col slab is (tap j, padded channel
    ci), matching the kernel's concat of rolled copies.

    formulation="accum": packed[i] = (wrow [kw*cout_pad, cin_pad], bias);
    tap j's [cout_pad, cin_pad] block sits at sublane offset j*cout_pad
    (a multiple of 8, so the in-kernel slice is sublane-aligned).
    """
    plans, packed = [], []
    for spec, w, b in folded_inner:
        kh, kw, cin, cout = w.shape
        assert kh == 1, f"inner layer {spec.name} must be freq-only"
        cin_p, cout_p = _pad8(cin), _pad8(cout)
        if formulation == "im2col":
            wpk = jnp.zeros((cout_p, kw * cin_p), jnp.float32)
            for j in range(kw):
                wpk = wpk.at[:cout, j * cin_p : j * cin_p + cin].set(w[0, j].T)
        else:
            wpk = jnp.zeros((kw * cout_p, cin_p), jnp.float32)
            for j in range(kw):
                wpk = wpk.at[j * cout_p : j * cout_p + cout, :cin].set(w[0, j].T)
        bias = jnp.zeros((cout_p, 1), jnp.float32).at[:cout, 0].set(b)
        plans.append(
            _LayerPlan(
                spec.name, kw, cin_p, cout_p, spec.skip_from, spec.add_from,
                spec.use_act,
            )
        )
        packed.append((wpk, bias))
    return tuple(plans), packed


def _stack_kernel(
    plans: Tuple[_LayerPlan, ...],
    n_lanes: int,
    mxu_dtype,
    formulation: str = "im2col",
):
    """Build the fused kernel body for a static layer plan.

    Slabs are stored float32 regardless of `mxu_dtype` -- Mosaic's lane
    rotate only supports 32-bit data -- but the matmul operands are cast
    to `mxu_dtype` (bfloat16 halves MXU passes; accumulation stays f32
    via preferred_element_type).

    formulation="im2col": per layer, concat the kw rolled slabs into one
    [kw*cin_pad, N] im2col slab and do ONE deep matmul.
    formulation="accum": per tap, slice the weight block (sublane-aligned)
    and accumulate kw shallow matmuls -- no concat copy of the k slabs.
    """

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_lanes), 1) % F_PAD
        mask = (col < F_DIM).astype(jnp.float32)
        x = x_ref[0].astype(jnp.float32)
        taps = {"__input__": x}
        for i, lp in enumerate(plans):
            wpk = wrefs[2 * i][...]  # already mxu_dtype
            bias = wrefs[2 * i + 1][...].astype(jnp.float32)
            lo = (lp.kw - 1) // 2
            if formulation == "im2col":
                cols = [
                    pltpu.roll(x, (lo - j) % n_lanes, axis=1)
                    for j in range(lp.kw)
                ]
                xcol = cols[0] if lp.kw == 1 else jnp.concatenate(cols, axis=0)
                y = jax.lax.dot_general(
                    wpk, xcol.astype(mxu_dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                y = jnp.zeros((lp.cout_pad, n_lanes), jnp.float32)
                for j in range(lp.kw):
                    xs = pltpu.roll(x, (lo - j) % n_lanes, axis=1)
                    y = y + jax.lax.dot_general(
                        wpk[j * lp.cout_pad : (j + 1) * lp.cout_pad],
                        xs.astype(mxu_dtype),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            # bias + pad-band re-zeroing (rolled-in junk must not leak into
            # the next layer's shifted reads)
            y = (y + bias) * mask
            if lp.skip_from is not None:
                y = y + taps[lp.skip_from]
            if lp.use_act:
                y = jnp.maximum(y, 0.0)
            if lp.add_from is not None:
                y = y + taps[lp.add_from]
            taps[lp.name] = y
            x = y
        out_ref[0] = x.astype(out_ref.dtype)

    return kernel


def _to_flat(x: jnp.ndarray, c_pad: int) -> jnp.ndarray:
    """[B, T, F_DIM, C] -> [B, c_pad, T*F_PAD] (channel+freq zero-pad,
    channels-first flatten)."""
    B, T, F, C = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, F_PAD - F), (0, c_pad - C)))
    return x.transpose(0, 3, 1, 2).reshape(B, c_pad, T * F_PAD)


def _from_flat(z: jnp.ndarray, T: int, c_true: int) -> jnp.ndarray:
    """[B, c_pad, T*F_PAD] -> [B, T, F_DIM, c_true]."""
    B, c_pad, _ = z.shape
    z = z.reshape(B, c_pad, T, F_PAD).transpose(0, 2, 3, 1)
    return z[:, :, :F_DIM, :c_true]


# Measured break-even vs the XLA blocked path (BENCH_r04/PERF_NOTES r4):
# at batch 64 x 8 s (~32k frames/call) the fused kernel matches XLA; at
# batch 16 x 4 s (~4k frames/call) it reaches only 0.81x.  Its value at
# small shapes is f32 accuracy at bf16-comparable speed, not throughput.
FUSED_BREAK_EVEN_FRAMES = 32_000


def fused_inference_forward(
    model, params, bn_state, mag, t_tile: int = 32, dtype: str = "float32",
    formulation: str = "im2col",
):
    """See `_fused_inference_forward`; resolves interpret mode (CPU tests)
    at call time and warns below the measured throughput break-even
    (VERDICT r4 weak 3 -- the warning fires at trace time, once per
    shape)."""
    frames = int(mag.shape[0]) * int(mag.shape[1])
    if frames < FUSED_BREAK_EVEN_FRAMES:
        logger.warning(
            "fused_inference at %d frames/call is below the measured "
            "break-even (~%d frames, i.e. batch 64 x 8 s): expect ~0.8x "
            "the XLA blocked path's throughput at this shape; keep "
            "fused_inference for f32-accuracy-at-bf16-speed, not speed",
            frames,
            FUSED_BREAK_EVEN_FRAMES,
        )
    interpret = jax.default_backend() == "cpu"
    return _fused_inference_forward(
        model, params, bn_state, mag, t_tile=t_tile, dtype=dtype,
        formulation=formulation, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "t_tile", "dtype", "formulation", "interpret"),
)
def _fused_inference_forward(
    model: ModelDef,
    params,
    bn_state,
    mag: jnp.ndarray,
    t_tile: int = 32,
    dtype: str = "float32",
    formulation: str = "im2col",
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T, F] magnitude -> [B, T, F] enhanced magnitude, inference mode.

    Equivalent to `model.apply(..., is_training=False)` on [B,T,F,1] with BN
    folded.  t_tile frames of every tap slab live in VMEM at once
    (t_tile=32 keeps the V2 working set ~4 MB in f32).  `dtype` selects
    the MXU operand type: "bfloat16" halves matmul passes (accumulation
    stays f32 via preferred_element_type; slabs stay f32 in VMEM because
    Mosaic's lane rotate requires 32-bit data) at XLA-bf16-comparable
    accuracy.
    """
    mxu_dt = jnp.dtype(dtype)
    B, T, F = mag.shape
    assert F == F_DIM, f"kernel is specialized for F={F_DIM}"
    folded = fold_bn_inference(model, params, bn_state)

    # Layer 1 (the only time-extent conv) via XLA.
    first_spec, w1, b1 = folded[0]
    x = mag[..., None]
    y1 = jax.lax.conv_general_dilated(
        x,
        w1.astype(x.dtype),
        (1, 1),
        tf_same_pads(first_spec.kernel),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(x.dtype)
    if first_spec.use_act:
        y1 = jax.nn.relu(y1)

    # Final (1, F_DIM) projection via XLA: its 129-wide taps exceed the
    # kernel's 7-lane pad gap.
    last_spec, w_last, b_last = folded[-1]
    inner = folded[1:-1]

    plans, packed = _pack_weights(inner, formulation)
    # Taps referencing layer 1 read the kernel's input slab.
    first_name = first_spec.name
    plans = tuple(
        dataclasses.replace(
            lp,
            skip_from="__input__" if lp.skip_from == first_name else lp.skip_from,
            add_from="__input__" if lp.add_from == first_name else lp.add_from,
        )
        for lp in plans
    )

    c_in_pad = plans[0].cin_pad
    c_out_pad = plans[-1].cout_pad
    cout_true = inner[-1][0].out_ch

    # Pad T to a tile multiple and flatten to the kernel layout.
    T_pad = ((T + t_tile - 1) // t_tile) * t_tile
    if T_pad != T:
        y1 = jnp.pad(y1, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
    xf = _to_flat(y1, c_in_pad)

    n_lanes = t_tile * F_PAD
    kernel = _stack_kernel(plans, n_lanes, mxu_dt, formulation)

    weight_args, in_specs = [], [
        pl.BlockSpec(
            (1, c_in_pad, n_lanes),
            lambda b, t: (b, 0, t),
            memory_space=pltpu.VMEM,
        )
    ]
    for wcol, bias in packed:
        weight_args += [wcol.astype(mxu_dt), bias]
        in_specs += [
            pl.BlockSpec(
                wcol.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                bias.shape, lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    z = pl.pallas_call(
        kernel,
        grid=(B, T_pad // t_tile),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, c_out_pad, n_lanes),
            lambda b, t: (b, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, c_out_pad, T_pad * F_PAD), mag.dtype
        ),
        interpret=interpret,
    )(xf, *weight_args)

    zh = _from_flat(z, T_pad, cout_true)[:, :T]
    out = jax.lax.conv_general_dilated(
        zh,
        w_last.astype(zh.dtype),
        (1, 1),
        tf_same_pads(last_spec.kernel),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b_last.astype(zh.dtype)
    if last_spec.use_act:
        out = jax.nn.relu(out)
    return out[..., 0]
