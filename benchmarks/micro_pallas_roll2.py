"""Probe 2: im2col roll conv (one fat matmul per layer) + stack depth
limits for the remote Mosaic compile service."""
import sys, time

sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE, F_PAD, C, K = 64, 256, 32, 11
N = T_TILE * F_PAD


def probe(label, kernel, args, out_shape):
    t0 = time.time()
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )
        r = np.asarray(jax.jit(fn)(*args))
        print(f"{label}: {time.time()-t0:.1f}s (sum {r.sum():.1f})", flush=True)
        return r
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)
        return None


x = jnp.asarray(np.random.rand(C, N), jnp.float32)
wcol = jnp.asarray(np.random.rand(C, K * C) * 0.05, jnp.float32)  # [Cout, k*Cin]


def conv_im2col(xv, w, mask):
    lo = (K - 1) // 2
    cols = [pltpu.roll(xv, (lo - j) % N, axis=1) for j in range(K)]
    xcol = jnp.concatenate(cols, axis=0)  # [k*Cin, N]
    y = jax.lax.dot_general(
        w, xcol, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return y * mask


def mk_stack(depth):
    def kern(x_ref, w_ref, o_ref):
        col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % F_PAD
        mask = (col < 129).astype(jnp.float32)
        xv = x_ref[...]
        for _ in range(depth):
            xv = jnp.maximum(conv_im2col(xv, w_ref[...], mask), 0.0)
        o_ref[...] = xv

    return kern


probe("im2col depth 1", mk_stack(1), (x, wcol), jax.ShapeDtypeStruct((C, N), jnp.float32))
probe("im2col depth 4", mk_stack(4), (x, wcol), jax.ShapeDtypeStruct((C, N), jnp.float32))
probe("im2col depth 8", mk_stack(8), (x, wcol), jax.ShapeDtypeStruct((C, N), jnp.float32))
probe("im2col depth 16", mk_stack(16), (x, wcol), jax.ShapeDtypeStruct((C, N), jnp.float32))
