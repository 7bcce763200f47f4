"""Fused Pallas stack vs XLA layer-by-layer: inference forward throughput
on the real chip, plus numeric agreement.

Usage: python benchmarks/bench_fused_infer.py {xla32|xla16|fused|check}
Each mode is a separate invocation so per-shape Mosaic/XLA compiles stay
inside the persistent compilation cache and short process budgets.

Timing per PERF_NOTES.md: iterations chained in one jitted scan, one
scalar fetch as the barrier.
"""
import sys, time

sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache

enable_compilation_cache()

from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.ops.pallas_rced import _fused_inference_forward

B, T, F = 64, 500, 129
ITERS = 20
MODE = sys.argv[1] if len(sys.argv) > 1 else "fused"
NAME = sys.argv[2] if len(sys.argv) > 2 else "FullyCNNV2"

model = get_model(NAME)
params, bn = model.init(jax.random.PRNGKey(0))
mag = jnp.asarray(np.random.default_rng(1).random((B, T, F)), jnp.float32)


def timeit(label, fn):
    @jax.jit
    def chain(mag):
        def body(c, _):
            y = fn(c)
            return mag + y.mean() * 1e-12, y.mean()

        c, ys = jax.lax.scan(body, mag, None, length=ITERS)
        return ys[-1]

    t0 = time.time()
    float(chain(mag))
    print(f"{label}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(mag))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1e3
    aps = B * T * 0.016 / (ms / 1e3)  # 16 ms stride -> audio-seconds per s
    print(f"{label}: {ms:.2f} ms/fwd  ({aps:,.0f} audio-s/s)", flush=True)
    return ms


def xla_fwd(mag):
    y, _ = model.apply(params, bn, mag[..., None], is_training=False)
    return y[..., 0]


def xla_fwd_bf16(mag):
    y, _ = model.apply(
        params, bn, mag[..., None].astype(jnp.bfloat16), is_training=False
    )
    return y[..., 0].astype(jnp.float32)


T_TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 32
DTYPE = sys.argv[4] if len(sys.argv) > 4 else "float32"


FORM = sys.argv[5] if len(sys.argv) > 5 else "im2col"


def fused(mag):
    return _fused_inference_forward(
        model, params, bn, mag, t_tile=T_TILE, dtype=DTYPE, formulation=FORM
    )


if MODE == "xla32":
    timeit("XLA f32 HIGHEST", xla_fwd)
elif MODE == "xla16":
    timeit("XLA bf16", xla_fwd_bf16)
elif MODE == "fused":
    timeit(f"fused pallas {DTYPE} t{T_TILE} {FORM}", fused)
elif MODE == "check":
    ref = np.asarray(xla_fwd(mag))
    got = np.asarray(fused(mag))
    denom = np.abs(ref).max()
    print(
        f"fused vs XLA-f32: max abs err {np.abs(got-ref).max():.3e} "
        f"(rel {np.abs(got-ref).max()/denom:.3e})",
        flush=True,
    )
