"""Real-TPU checks for ops/pallas_ln.py (the in-kernel PRNG parts that
interpret mode cannot cover). Run: python scripts/tpu_ln_check.py

  1. p=0 forward + grads == XLA dropout-add-LN reference.
  2. dropout keep-rate ~= 1-p (mask extracted via scale=1, bias=0,
     x=0 probe at huge h values — kept positions dominate the row).
  3. p>0 gradient exactness vs jax.grad of an explicit-mask reference
     (mask extracted from the kernel's own forward).
  4. micro-bench: fused vs XLA dropout+add+LN fwd+bwd at HuBERT shapes.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from triad_tpu.ops.pallas_ln import fused_dropout_add_ln

EPS = 1e-5


def ref_ln(x, h, scale, bias, keep=None, p=0.0):
    if keep is not None:
        h = jnp.where(keep, h / (1.0 - p), 0.0)
    s = x + h
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    return (s - mean) * jax.lax.rsqrt(var + EPS) * scale + bias


def main():
    B, T, C = 8, 499, 768
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32) * 0.3)
    h = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32) * 0.3)
    scale = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    p = 0.1
    seed = jnp.int32(7)

    # 1. p=0 equivalence (values + grads)
    y_f = jax.jit(
        lambda x, h: fused_dropout_add_ln(x, h, scale, bias, jnp.int32(0), 0.0, EPS)
    )(x, h)
    y_r = jax.jit(lambda x, h: ref_ln(x, h, scale, bias))(x, h)
    d = float(jnp.max(jnp.abs(y_f - y_r)))
    print(f"p=0 max |fused - xla| = {d:.2e}")
    assert d < 1e-3, d

    gf = jax.jit(
        jax.grad(
            lambda x, h, s, b: jnp.sum(
                fused_dropout_add_ln(x, h, s, b, jnp.int32(0), 0.0, EPS) ** 2
            ),
            argnums=(0, 1, 2, 3),
        )
    )(x, h, scale, bias)
    gr = jax.jit(
        jax.grad(
            lambda x, h, s, b: jnp.sum(ref_ln(x, h, s, b) ** 2),
            argnums=(0, 1, 2, 3),
        )
    )(x, h, scale, bias)
    for a, b, n in zip(gf, gr, ["x", "h", "scale", "bias"]):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"p=0 grad {n}: rel {rel:.2e}")
        assert rel < 1e-3, (n, rel)

    # 2. extract the keep mask: the kernel recomputes the same mask for
    # a given (seed, shape, grid) — probe with x=0, scale=1, bias=0 and
    # compare kernel output to the reference under each candidate mask
    # elementwise. Dropped h positions contribute exactly 0 to s.
    ones = jnp.ones((C,), jnp.float32)
    zeros = jnp.zeros((C,), jnp.float32)
    hp = jnp.abs(h) + 1.0  # strictly positive
    y_mask = jax.jit(
        lambda h: fused_dropout_add_ln(
            jnp.zeros_like(h), h, ones, zeros, seed, p, EPS
        )
    )(hp)
    # s = keep * hp/(1-p): recover keep by checking s != LN-normalized
    # zero... simpler: feed the same mask question through the linearity
    # of s: positions with s == 0 pre-LN are dropped. Invert LN:
    # s = (y * sqrt(var) + mean) — instead recompute from a second probe
    # with doubled h: dropped positions stay identical, kept double.
    # Practical extraction: run with bias=0, scale=1 and compare two
    # probes' pre-LN s via solving is overkill — use the direct route:
    # the kernel keep-rate from counting near-zero columns of a huge-h
    # probe where kept values dwarf x.
    big = jnp.full((B, T, C), 1000.0, jnp.float32)
    y_big = jax.jit(
        lambda b_: fused_dropout_add_ln(x, b_, ones, zeros, seed, p, EPS)
    )(big)
    # kept positions ~ equal large value; dropped ~ x only. After LN the
    # kept positions are the positive cluster.
    keep = y_big > 0
    rate = float(jnp.mean(keep.astype(jnp.float32)))
    print(f"keep rate = {rate:.4f} (target {1 - p})")
    assert abs(rate - (1 - p)) < 0.01, rate

    # 3. p>0 grads vs explicit-mask reference (same seed => same mask)
    gf = jax.jit(
        jax.grad(
            lambda x, h, s, b: jnp.sum(
                fused_dropout_add_ln(x, h, s, b, seed, p, EPS) ** 2
            ),
            argnums=(0, 1, 2, 3),
        )
    )(x, h, scale, bias)
    gr = jax.jit(
        jax.grad(
            lambda x, h, s, b: jnp.sum(ref_ln(x, h, s, b, keep, p) ** 2),
            argnums=(0, 1, 2, 3),
        )
    )(x, h, scale, bias)
    for a, b, n in zip(gf, gr, ["x", "h", "scale", "bias"]):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"p>0 grad {n}: rel {rel:.2e}")
        assert rel < 1e-3, (n, rel)

    # 4. micro-bench fwd+bwd, B=64 bf16
    B2 = 64
    xb = jnp.asarray(
        rng.normal(size=(B2, T, C)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    hb = jnp.asarray(
        rng.normal(size=(B2, T, C)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)

    def bench(label, loss_fn):
        g = jax.grad(loss_fn, argnums=(0, 1))

        def chained(x, h):
            def body(c, _):
                gx, gh = g(x + (c * 1e-12).astype(x.dtype), h)
                return jnp.sum(gx.astype(jnp.float32) * 1e-12) + jnp.sum(
                    gh.astype(jnp.float32) * 1e-12
                ), None

            r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=10)
            return r

        j = jax.jit(chained)
        t0 = time.perf_counter()
        float(j(xb, hb))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(j(xb, hb))
        dt = (time.perf_counter() - t0) / 10
        print(f"{label:36s} {dt * 1e3:7.2f} ms  (compile {c:.0f}s)", flush=True)

    def xla_loss(x, h):
        keep = jax.random.bernoulli(jax.random.key(0), 1 - p, h.shape)
        hd = jnp.where(keep, h / (1 - p), 0)
        return jnp.sum(ref_ln(x.astype(jnp.float32), hd.astype(jnp.float32), scale, bias) ** 2)

    bench(
        "fused dropout+add+LN fwd+bwd",
        lambda x, h: jnp.sum(
            fused_dropout_add_ln(x, h, scale, bias, seed, p, EPS).astype(
                jnp.float32
            )
            ** 2
        ),
    )
    bench("xla dropout+add+LN fwd+bwd", xla_loss)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
