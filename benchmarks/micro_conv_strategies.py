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

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache

enable_compilation_cache()

B, T, F, C, K = 64, 500, 129, 25, 5
DT = jnp.bfloat16
ITERS = 30
# groups: abc1 (one-layer fwd), abc2 (one-layer fwd+bwd), abc3 (14-chain),
# d4 / d8 (freq-to-depth) -- split so each invocation fits a 10-min budget
GROUP = sys.argv[1] if len(sys.argv) > 1 else "all"


def in_group(g):
    return GROUP in ("all", g)


def timeit(label, fn, *args):
    @jax.jit
    def chain(*a):
        def body(c, _):
            y = fn(*c[:-1], c[-1])
            # feed a scalar of y back so iterations serialize
            s = c[-1] * 0 + (y.astype(jnp.float32).mean() * 1e-9 + 1.0).astype(DT)
            return (*c[:-1], s), None

        c, _ = jax.lax.scan(body, (*a, jnp.asarray(1.0, DT)), None, length=ITERS)
        return c[-1].astype(jnp.float32)

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
if in_group("abc1"):
    print("== one layer forward ==", flush=True)
    timeit("A nhwc lax.conv", conv_nhwc, x_nhwc, w)
    timeit("B nhwc shift+einsum", conv_shift_nhwc, x_nhwc, w)
    timeit("C flat [B,C,N] shift+einsum", conv_flat, x_flat, w)


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


if in_group("abc2"):
    print("== one layer fwd+bwd (grad wrt x and w) ==", flush=True)
    for label, f, xx in (
        ("A nhwc lax.conv", conv_nhwc, x_nhwc),
        ("B nhwc shift+einsum", conv_shift_nhwc, x_nhwc),
        ("C flat shift+einsum", conv_flat, x_flat),
    ):
        gf = mk_loss(f)
        timeit(label, lambda x, w, s, gf=gf: gsum(gf(x, w, s)), xx, w)


def chain14(conv, x, w, scale):
    y = x
    for _ in range(14):
        y = jnp.maximum(conv(y, w, scale), 0)
    return y


if in_group("abc3"):
    print("== 14-layer chain fwd+bwd ==", flush=True)
    for label, f, xx in (
        ("A nhwc lax.conv x14", conv_nhwc, x_nhwc),
        ("C flat shift+einsum x14", conv_flat, x_flat),
    ):
        gf = mk_loss(functools.partial(chain14, f))
        timeit(label, lambda x, w, s, gf=gf: gsum(gf(x, w, s)), xx, w)
# x [B,T,129,C] -> pad F to FB*NB -> [B,T,NB, FB*C]; the (1,k) freq conv
# becomes a (1,KB) conv over NB blocks with FB*C channels: dense MXU
# shapes (~128-256 channels) at (KB*FB/k)x the FLOPs -- memory-bound
# shapes, so the extra FLOPs ride free.  Weight transform is exact:
# W[d, v*Cin+ci, u*Cout+co] = w[(d-dc)*FB + v - u + lo, ci, co].


def make_blocked(FB, KB):
    NB = -(-F // FB)
    FT = NB * FB
    dc = (KB - 1) // 2
    lo = (K - 1) // 2

    def to_blocked(x):  # [B,T,F,C] -> [B,T,NB,FB*C]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, FT - F), (0, 0)))
        return xp.reshape(B, T, NB, FB * C)

    wb = np.zeros((1, KB, FB * C, FB * C), np.float32)
    wn = np.asarray(w, np.float32)
    for d in range(KB):
        for v in range(FB):
            for u in range(FB):
                j = (d - dc) * FB + v - u + lo
                if 0 <= j < K:
                    wb[0, d, v * C : (v + 1) * C, u * C : (u + 1) * C] = wn[0, j]
    wb = jnp.asarray(wb, DT)
    fmask = (np.arange(FT).reshape(NB, FB * 1) // 1)  # placeholder
    col = jnp.asarray(
        (np.arange(FT) < F).astype(np.float32).reshape(1, 1, NB, FB, 1)
        .repeat(C, 4).reshape(1, 1, NB, FB * C), DT,
    )

    def conv_blocked(xb, wb_, scale):
        y = jax.lax.conv_general_dilated(
            xb, wb_ * scale, (1, 1), [(0, 0), (dc, KB - 1 - dc)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y * col

    return to_blocked, conv_blocked, wb


for FB, KB in ((4, 3), (8, 3)):
    if not in_group(f"d{FB}"):
        continue
    print(f"== strategy D fb={FB}: freq-to-depth ==", flush=True)
    to_b, conv_b, wb = make_blocked(FB, KB)
    xb = to_b(x_nhwc)
    # numeric check vs strategy A (one layer)
    ref = np.asarray(conv_nhwc(x_nhwc, w, scale), np.float32)
    got = np.asarray(conv_b(xb, wb, scale), np.float32)
    NB = xb.shape[2]
    got = got.reshape(B, T, NB * FB, C)[:, :, :F, :]
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    print(f"D fb={FB} rel err vs A: {err:.2e}")
    timeit(f"D fb={FB} blocked conv fwd", conv_b, xb, wb)
    gf = mk_loss(conv_b)
    timeit(f"D fb={FB} blocked conv fwd+bwd", lambda x, w_, s, gf=gf: gsum(gf(x, w_, s)), xb, wb)
    gf14 = mk_loss(functools.partial(chain14, conv_b))
    timeit(f"D fb={FB} blocked x14 fwd+bwd", lambda x, w_, s, gf=gf14: gsum(gf(x, w_, s)), xb, wb)
