import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
T, F, C, D, K = 64, 129, 25, 25, 11

def probe(label, kernel, args, out_shape):
    t0 = time.time()
    try:
        fn = pl.pallas_call(kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape)
        r = np.asarray(fn(*args))
        print(f"{label}: {time.time()-t0:.1f}s (sum {r.sum():.1f})", flush=True)
    except Exception as e:
        print(f"{label}: FAIL {type(e).__name__} {str(e)[:100]}", flush=True)

x = jnp.asarray(np.random.rand(1, T, F, C), jnp.float32)
w = jnp.asarray(np.random.rand(K, C, D), jnp.float32)

# retry the earlier crasher (flakiness check)
wc = jnp.asarray(np.random.rand(C, D), jnp.float32)
def k3(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[0], ((0,0),(1,1),(0,0)))
    s = xp[:, 1:1+F, :]
    o_ref[0] = jax.lax.dot_general(s, w_ref[...], (((2,),(0,)),((),())),
                                   preferred_element_type=jnp.float32)
probe("retry pad+slice", k3, (x, wc), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))

# fori_loop over taps with pl.ds
def k5(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[0], ((0,0),((K-1)//2, K//2),(0,0)))
    def body(j, acc):
        s = jax.lax.dynamic_slice_in_dim(xp, j, F, axis=1)
        return acc + jax.lax.dot_general(s, w_ref[j], (((2,),(0,)),((),())),
                                         preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.fori_loop(0, K, body, jnp.zeros((T, F, D), jnp.float32))
probe("fori_loop taps + dyn slice", k5, (x, w), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))

# full conv unrolled (variant A from before) -- how long does ONE layer take
def k6(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[0], ((0,0),((K-1)//2, K//2),(0,0)))
    acc = jnp.zeros((T, F, D), jnp.float32)
    for j in range(K):
        acc += jax.lax.dot_general(xp[:, j:j+F, :], w_ref[j], (((2,),(0,)),((),())),
                                   preferred_element_type=jnp.float32)
    o_ref[0] = acc
probe("one conv, K unrolled slices", k6, (x, w), jax.ShapeDtypeStruct((1,T,F,D), jnp.float32))
