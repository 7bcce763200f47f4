"""Compare XLA strategies for the R-CED frequency convs on real shapes.

The model's hot op is a (1,k) conv over F=129 with C_in,C_out <= 32 --
pathologically small channel counts for the TPU's 128-lane layout.  This
micro-bench times one representative layer (k=5, 25->25) and a 14-layer
chain under several formulations, fwd and fwd+bwd, to pick the layout the
model should compile to.

Timing: iterations chained inside one jitted lax.scan, one scalar fetch
(see benchmarks/PERF_NOTES.md for why block_until_ready is not a barrier
on this tunneled platform).
"""
import sys, time, functools

sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

B, T, F, C, K = 64, 500, 129, 25, 5
DT = jnp.bfloat16
ITERS = 30


def timeit(label, fn, *args):
    @jax.jit
    def chain(*a):
        def body(c, _):
            y = fn(*c[:-1], c[-1])
            # feed a scalar of y back so iterations serialize
            return (*c[:-1], c[-1] * 0 + y.astype(jnp.float32).mean() * 1e-9 + 1.0), None

        c, _ = jax.lax.scan(body, (*a, jnp.float32(1.0)), None, length=ITERS)
        return c[-1]

    r = chain(*args)
    float(r)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        times.append(time.perf_counter() - t0)
    ms = min(times) / ITERS * 1e3
    print(f"{label}: {ms:.3f} ms/iter", flush=True)
    return ms


rng = np.random.default_rng(0)
x_nhwc = jnp.asarray(rng.standard_normal((B, T, F, C)), DT)
w = jnp.asarray(rng.standard_normal((1, K, C, C)) * 0.1, DT)


# -- strategy A: lax.conv_general_dilated NHWC (current model path)
def conv_nhwc(x, w, scale):
    return jax.lax.conv_general_dilated(
        x, w * scale, (1, 1), [(0, 0), ((K - 1) // 2, K // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# -- strategy B: einsum over k shifted slices, NHWC layout
def conv_shift_nhwc(x, w, scale):
    lo, hi = (K - 1) // 2, K // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (lo, hi), (0, 0)))
    acc = None
    for j in range(K):
        term = jnp.einsum(
            "btfc,cd->btfd", jax.lax.slice_in_dim(xp, j, j + F, axis=2), w[0, j] * scale
        )
        acc = term if acc is None else acc + term
    return acc


# -- strategy C: channels-first flat layout [B, C, T*F] with pad+slice shifts
F_PAD = 136  # 129 rounded to sublane multiple; bleed-free for |shift|<=7


def to_flat(x):  # [B,T,F,C] -> [B, C, T*F_PAD]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, F_PAD - F), (0, 0)))
    return xp.transpose(0, 3, 1, 2).reshape(B, C, T * F_PAD)


def conv_flat(xf, w, scale):
    lo = (K - 1) // 2
    N = T * F_PAD
    acc = None
    for j in range(K):
        s = lo - j
        xs = jnp.pad(xf, ((0, 0), (0, 0), (max(s, 0), max(-s, 0))))
        xs = jax.lax.slice_in_dim(xs, max(-s, 0), max(-s, 0) + N, axis=2)
        term = jnp.einsum("bcn,cd->bdn", xs, w[0, j] * scale)
        acc = term if acc is None else acc + term
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2) % F_PAD
    return jnp.where(col < F, acc, 0)


x_flat = to_flat(x_nhwc)

scale = jnp.asarray(1.0, DT)
print("== one layer forward ==")
timeit("A nhwc lax.conv", conv_nhwc, x_nhwc, w)
timeit("B nhwc shift+einsum", conv_shift_nhwc, x_nhwc, w)
timeit("C flat [B,C,N] shift+einsum", conv_flat, x_flat, w)

print("== one layer fwd+bwd (grad wrt x and w) ==")


def mk_loss(f):
    def loss(x, w, scale):
        return (f(x, w, scale).astype(jnp.float32) ** 2).mean()

    return jax.grad(loss, argnums=(0, 1))


def gsum(g):
    return (
        g[0].astype(jnp.float32).mean() * 0
        + g[1].astype(jnp.float32).mean() * 0
        + 1.0
    )


for label, f, xx in (
    ("A nhwc lax.conv", conv_nhwc, x_nhwc),
    ("B nhwc shift+einsum", conv_shift_nhwc, x_nhwc),
    ("C flat shift+einsum", conv_flat, x_flat),
):
    gf = mk_loss(f)
    timeit(label, lambda x, w, s, gf=gf: gsum(gf(x, w, s)), xx, w)

print("== 14-layer chain fwd+bwd ==")


def chain14(conv, x, w, scale):
    y = x
    for _ in range(14):
        y = jnp.maximum(conv(y, w, scale), 0)
    return y


for label, f, xx in (
    ("A nhwc lax.conv x14", conv_nhwc, x_nhwc),
    ("C flat shift+einsum x14", conv_flat, x_flat),
):
    gf = mk_loss(functools.partial(chain14, f))
    timeit(label, lambda x, w, s, gf=gf: gsum(gf(x, w, s)), xx, w)
