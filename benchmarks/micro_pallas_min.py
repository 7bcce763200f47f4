"""Minimal Mosaic compile-time bisection for the freq-conv kernel."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
T, F, C, D = 64, 129, 25, 25

def probe(label, kernel, args, out_shape, budget=90):
    import multiprocessing as mp
    t0 = time.time()
    try:
        fn = pl.pallas_call(kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape)
        np.asarray(fn(*args))
        print(f"{label}: {time.time()-t0:.1f}s", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:120]}", flush=True)

x = jnp.asarray(np.random.rand(1, T, F, C), jnp.float32)
w = jnp.asarray(np.random.rand(C, D), jnp.float32)

# 1. plain rank-3 dot_general, no shifts
def k1(x_ref, w_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(x_ref[0], w_ref[...], (((2,),(0,)),((),())),
                                   preferred_element_type=jnp.float32)
probe("1 plain tfc,cd dot", k1, (x, w), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))

# 2. reshape to 2D then matmul
def k2(x_ref, w_ref, o_ref):
    xx = x_ref[0].reshape(T*F, C)
    o_ref[0] = jnp.dot(xx, w_ref[...], preferred_element_type=jnp.float32).reshape(T, F, D)
probe("2 reshape + 2D dot", k2, (x, w), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))

# 3. one static shifted slice + dot
def k3(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[0], ((0,0),(1,1),(0,0)))
    s = xp[:, 1:1+F, :]
    o_ref[0] = jax.lax.dot_general(s, w_ref[...], (((2,),(0,)),((),())),
                                   preferred_element_type=jnp.float32)
probe("3 pad+aligned slice + dot", k3, (x, w), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))

# 4. misaligned slice (offset 3) + dot
def k4(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[0], ((0,0),(3,3),(0,0)))
    s = xp[:, 0:F, :] + xp[:, 6:6+F, :]
    o_ref[0] = jax.lax.dot_general(s, w_ref[...], (((2,),(0,)),((),())),
                                   preferred_element_type=jnp.float32)
probe("4 two offset slices + dot", k4, (x, w), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))
