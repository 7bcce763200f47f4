"""Pallas TPU kernel for the blocked conv's weight gradient (dW).

The bf16+blocked V2 train step spends ~31 of 80 ms in the 14 inner
layers' dW contractions (benchmarks/micro_bwd_split.py: fwd 22.2 ms,
fwd+dX 48.6 ms, fwd+dX+dW 79.9 ms).  XLA lowers each dW as a
grad-of-conv over the [B*T*NB ~= 543k, fb*C] activations at ~5 HBM
passes per layer; the contraction itself is tiny (output [KB, fb*Cin,
fb*Cout] <= 4x184x200) and needs exactly ONE pass over z and dy:

    dW[d, ci, co] = sum_{r, n} zpad[r, n + d - dc, ci] * dy[r, n, co]

This kernel tiles the fused row axis R = B*T, keeps the [KB, Ci, Co]
f32 accumulator resident in VMEM across the whole grid (constant
out-block index map), builds the KB tap shifts from the in-VMEM tile
(one zero-padded copy, KB slices) and feeds the MXU one
dot_general per tap.  HBM traffic = |z| + |dy| + |dW| -- the memory
lower bound.

Integration is a custom_vjp on the inner blocked freq-convs
(models/blocked.py): forward and dX keep XLA's conv (dX is the
mirrored transposed conv XLA's own autodiff emits); only dW is
re-routed.  Non-TPU backends use an einsum fallback with identical
math (exact in f64 -- tests/test_pallas_dw.py).

The reference runs these layers as tf.layers.conv2d under a TF-1.14
Session and never touches the backward's schedule
(/root/reference/model_utils/trainer.py:175-179 single train_op);
this file is the TPU answer to the same training math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile size over the fused B*T axis.  VMEM per step at KB=4,
# Ci=184, Co=200 bf16: z 128*17*184*2 = 0.8 MB (+pad), dy 0.87 MB,
# padded z temp ~1 MB, f32 accumulator 0.59 MB -- comfortably inside
# VMEM with double buffering.
_TILE_R = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dw_kernel(
    z_ref, dy_ref, dw_ref, *, kb: int, dc: int, rows: int, nb_pad: int
):
    """Grid step: accumulate one row tile's dW contribution.

    z_ref:  [TILE_R, NB, Ci]  (input activations, compute dtype)
    dy_ref: [TILE_R, NB, Co]  (output cotangent, compute dtype)
    dw_ref: [KB, Ci, Co] f32  (accumulator; constant index map keeps it
                               VMEM-resident across the grid)

    `nb_pad` is NB rounded up to a sublane-pack multiple (32 covers
    bf16's 16 and f32's 8): Mosaic rejects the [R, NB, C] -> [R*NB, C]
    shape cast when NB is not pack-aligned (round-2 bench failure:
    `tpu.reshape vector<128x17x184xbf16> -> vector<2176x184xbf16>`).
    Padding dy's NB axis with zero rows leaves the dot unchanged, and
    z's pad band beyond the (dc, kb-1-dc) conv padding is only ever
    multiplied by those zero dy rows.  Verified to compile + match the
    einsum reference on the real v5e chip (rel err ~4e-7 at the
    production [8,66,17,184]x[...,200] bf16 shape).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    tile_r, nb, _ = z_ref.shape
    # Mask rows past R on the final (partial) tile: out-of-bounds block
    # rows hold unspecified values (NaN under interpret), so BOTH
    # operands must be zeroed -- 0 * NaN would still poison the dot.
    valid = rows - i * tile_r
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_r, nb, 1), 0)
    row_ok = row_ids < valid
    dy = jnp.where(row_ok, dy_ref[:], 0)

    # One zero-padded copy; each tap d reads slice [d : d+nb_pad] of it,
    # reproducing the forward conv's (dc, kb-1-dc) NB padding.  Mosaic's
    # matmul wants plain 2D contractions, so (rows, NB) collapse before
    # the dot -- after pack-aligning NB (see above).
    z = jnp.where(row_ok, z_ref[:], 0)
    dyp = jnp.pad(dy, ((0, 0), (0, nb_pad - nb), (0, 0)))
    zp = jnp.pad(z, ((0, 0), (dc, nb_pad + kb - 1 - nb - dc), (0, 0)))
    dy2 = dyp.reshape(tile_r * nb_pad, -1)
    for d in range(kb):
        zd = jax.lax.slice_in_dim(zp, d, d + nb_pad, axis=1)
        dw_ref[d] += jax.lax.dot_general(
            zd.reshape(tile_r * nb_pad, -1),
            dy2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def blocked_dw_pallas(
    z: jnp.ndarray, dy: jnp.ndarray, kb: int, dc: int, interpret: bool = False
) -> jnp.ndarray:
    """dW for an inner blocked freq-conv, one HBM pass over z and dy.

    z  [B, T, NB, Ci], dy [B, T, NB, Co]  ->  [1, KB, Ci, Co] float32.
    """
    B, T, nb, ci = z.shape
    co = dy.shape[3]
    rows = B * T
    nb_pad = _round_up(nb, 32)
    z2 = z.reshape(rows, nb, ci)
    dy2 = dy.reshape(rows, nb, co)
    grid = pl.cdiv(rows, _TILE_R)
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, kb=kb, dc=dc, rows=rows, nb_pad=nb_pad),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_TILE_R, nb, ci), lambda i: (i, 0, 0)),
            pl.BlockSpec((_TILE_R, nb, co), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kb, ci, co), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((kb, ci, co), jnp.float32),
        interpret=interpret,
    )(z2, dy2)
    return dw[None]


def blocked_dw_reference(
    z: jnp.ndarray, dy: jnp.ndarray, kb: int, dc: int
) -> jnp.ndarray:
    """Same contraction as einsums (non-TPU backends, and the oracle the
    Pallas kernel is tested against).  Accumulates in the promoted dtype
    (f32 for bf16/f32 inputs, f64 for f64)."""
    nb = z.shape[2]
    acc_dt = jnp.promote_types(jnp.float32, z.dtype)
    zp = jnp.pad(z, ((0, 0), (0, 0), (dc, kb - 1 - dc), (0, 0)))
    taps = [
        jnp.einsum(
            "btnc,btno->co",
            jax.lax.slice_in_dim(zp, d, d + nb, axis=2).astype(acc_dt),
            dy.astype(acc_dt),
        )
        for d in range(kb)
    ]
    return jnp.stack(taps)[None].astype(acc_dt)


def _freq_conv_raw(z, wb, dc, precision):
    kb = wb.shape[1]
    return jax.lax.conv_general_dilated(
        z,
        wb,
        (1, 1),
        [(0, 0), (dc, kb - 1 - dc)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def blocked_freq_conv(z, wb, dc: int, precision, use_pallas: bool = True):
    """Inner blocked freq-conv ([1, KB] kernel, NB padding (dc, KB-1-dc))
    with a custom backward: dX is the mirrored transposed conv (exactly
    XLA autodiff's formulation); dW runs the single-pass Pallas kernel
    on TPU (when `use_pallas`, i.e. config `model.dw_pallas`) and the
    einsum reference elsewhere."""
    return _freq_conv_raw(z, wb, dc, precision)


def _freq_conv_fwd(z, wb, dc, precision, use_pallas):
    return _freq_conv_raw(z, wb, dc, precision), (z, wb)


def _freq_conv_bwd(dc, precision, use_pallas, residuals, dy):
    z, wb = residuals
    kb = wb.shape[1]
    # dX: conv of dy with the tap-flipped, channel-transposed kernel and
    # mirrored padding -- the same conv XLA's conv VJP emits.
    wT = jnp.flip(wb, axis=1).transpose(0, 1, 3, 2)
    dz = jax.lax.conv_general_dilated(
        dy,
        wT,
        (1, 1),
        [(0, 0), (kb - 1 - dc, dc)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if use_pallas and jax.default_backend() == "tpu":
        dw = blocked_dw_pallas(z, dy, kb, dc)
    else:
        dw = blocked_dw_reference(z, dy, kb, dc)
    return dz.astype(z.dtype), dw.astype(wb.dtype)


blocked_freq_conv.defvjp(_freq_conv_fwd, _freq_conv_bwd)
