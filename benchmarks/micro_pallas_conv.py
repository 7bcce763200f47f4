"""Micro-benchmark: compile time + runtime of Pallas freq-conv variants.

Drives kernel-design decisions for ops/pallas_rced.py: Mosaic compile
time explodes for some slicing patterns on the 129-wide (non-8-aligned)
frequency axis; this probes each candidate in isolation on the real TPU.
Run: python benchmarks/micro_pallas_conv.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, F, C, D, K = 64, 129, 25, 25, 11


def compile_and_time(make, label, iters=50):
    t0 = time.time()
    try:
        out = make()
        np.asarray(out)
        compile_s = time.time() - t0

        @jax.jit
        def chain():
            def body(acc, _):
                return acc + jnp.sum(make()[:1, :1, :1]), None

            acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return acc

        float(chain())
        t0 = time.time()
        float(chain())
        run_ms = (time.time() - t0) / iters * 1e3
        print(f"{label}: compile {compile_s:.1f}s, run {run_ms:.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    x = jnp.asarray(np.random.rand(1, T, F, C), jnp.float32)
    w = jnp.asarray(np.random.rand(K, C, D), jnp.float32)
    w2 = jnp.asarray(np.random.rand(K * C, D), jnp.float32)

    def vA():
        def kernel(x_ref, w_ref, o_ref):
            xx = x_ref[0]
            lo, hi = (K - 1) // 2, K // 2
            xp = jnp.pad(xx, ((0, 0), (lo, hi), (0, 0)))
            acc = jnp.zeros((T, F, D), jnp.float32)
            for j in range(K):
                s = xp[:, j : j + F, :]
                acc += jax.lax.dot_general(
                    s, w_ref[j], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[0] = acc

        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, T, F, D), jnp.float32),
        )(x, w)

    compile_and_time(vA, "A: static shifts + per-tap dot_general")

    def vB():
        def kernel(x_ref, w_ref, o_ref):
            xx = x_ref[0]
            lo, hi = (K - 1) // 2, K // 2
            xp = jnp.pad(xx, ((0, 0), (lo, hi), (0, 0)))
            cols = jnp.concatenate(
                [xp[:, j : j + F, :] for j in range(K)], axis=-1
            )
            o_ref[0] = jax.lax.dot_general(
                cols, w_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, T, F, D), jnp.float32),
        )(x, w2)

    compile_and_time(vB, "B: unfold lanes + one dot_general")

    # C: time-axis shifts instead (aligned dim), freq on lanes
    xt = jnp.asarray(np.random.rand(1, T, C, F), jnp.float32)

    def vC():
        def kernel(x_ref, w_ref, o_ref):
            xx = x_ref[0]  # [T, C, F]
            acc = jnp.zeros((T, D, F), jnp.float32)
            for j in range(K):
                shift = j - (K - 1) // 2
                rolled = pltpu.roll(xx, -shift, 2)
                contrib = jax.lax.dot_general(
                    w_ref[j], rolled, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [D, T, F] -> transpose
                acc += jnp.transpose(contrib, (1, 0, 2))
            o_ref[0] = acc

        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, T, D, F), jnp.float32),
        )(xt, w)

    compile_and_time(vC, "C: lane roll + per-tap dot_general (freq on lanes)")


if __name__ == "__main__":
    main()
