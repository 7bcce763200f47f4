"""Frame-packing experiment: pack R adjacent frames into channels so the
per-tap matmul becomes [*, R*C] @ block_diag([C,D] x R) -- R x FLOPs but
~R x better MXU occupancy.  Compares ms per fixed amount of audio."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

B, T, F, C, D, K = 64, 500, 129, 25, 25, 5
DT = jnp.bfloat16

def timeit(fn, x, label, iters=30):
    @jax.jit
    def chain(x):
        def body(acc, _):
            return acc + jnp.sum(fn(x)[..., :1, :1]).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return acc
    float(chain(x))
    t0=time.perf_counter(); float(chain(x)); dt=time.perf_counter()-t0
    print(f"{label}: {dt/iters*1e3:.2f} ms", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, T, F, C)), DT)
w = jnp.asarray(rng.random((1, K, C, D)), DT)

def conv_plain(x):
    return jax.lax.conv_general_dilated(x, w, (1,1), [(0,0),(2,2)],
        dimension_numbers=("NHWC","HWIO","NHWC"))
timeit(conv_plain, x, "plain conv bf16 (baseline)")

for R in (4, 5, 8):
    Tp = T // R
    xp = jnp.asarray(rng.random((B, Tp, F, R*C)), DT)
    blocks = np.zeros((1, K, R*C, R*D), np.float32)
    wnp = rng.random((1, K, C, D))
    for r in range(R):
        blocks[:, :, r*C:(r+1)*C, r*D:(r+1)*D] = wnp
    wb = jnp.asarray(blocks, DT)
    def conv_packed(x, wb=wb):
        return jax.lax.conv_general_dilated(x, wb, (1,1), [(0,0),(2,2)],
            dimension_numbers=("NHWC","HWIO","NHWC"))
    timeit(conv_packed, xp, f"packed dense R={R} (same audio, {R}x flops)")
    def conv_grouped(x, R=R):
        wg = jnp.asarray(np.tile(wnp, (1,1,R,1)), DT)  # [1,K,R*C? no...]
        return None
    # grouped conv: feature_group_count=R, rhs [1,K,C,R*D]
    wgr = jnp.asarray(np.concatenate([wnp]*R, axis=3), DT)  # [1,K,C,R*D]
    def conv_grp(x, wgr=wgr, R=R):
        return jax.lax.conv_general_dilated(x, wgr, (1,1), [(0,0),(2,2)],
            dimension_numbers=("NHWC","HWIO","NHWC"), feature_group_count=R)
    timeit(conv_grp, xp, f"grouped conv R={R} (same audio, 1x flops)")
