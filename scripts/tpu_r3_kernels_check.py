"""Round-3 hardware check: do the Mosaic-fixed / new kernels compile,
match XLA, and win on the real chip?

  1. pos_conv_gelu (ops/pallas_posconv.py) — forward + full VJP after
     the bf16 lane-roll fix (pltpu.roll on an int32 bitcast view; the
     direct bf16 roll hit "not implemented: Rotate with non-32-bit
     data" on hardware).
  2. fused_attention_eval_pair / fused_attention_eval_merged_pair
     (ops/pallas_attention.py) — the head-PAIR block-diagonal eval
     kernels at HuBERT (B=64, N=499) and ViT (B=64, N=261) shapes,
     vs the single-head eval kernels and the XLA path.

Run: python scripts/tpu_r3_kernels_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ITERS = 5


def time_fn(label, fn, *args):
    def chained(*args):
        def body(c, _):
            out = fn(args[0] + (c * 1e-12).astype(args[0].dtype), *args[1:])
            return jnp.sum(out.astype(jnp.float32) * 1e-12), None

        r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return r

    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(*args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:44s} {dt * 1e3:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def check_posconv():
    from triad_tpu.ops.pallas_posconv import pos_conv_gelu
    from triad_tpu.ops.pallas_frontend import _GELUS

    B, T, C, K, G = 64, 499, 768, 128, 16
    CG = C // G
    PAD = K // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(K, CG, C)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.01)

    def xla_ref(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(PAD, PAD)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=G,
        )[:, :-1] + b
        return _GELUS["erf"](y).astype(x.dtype)

    def pallas_fn(x, w, b):
        return pos_conv_gelu(x, w, b, G, "erf")

    # fp32 numerics, forward
    xs = x[:2]
    y_ref = np.asarray(jax.jit(xla_ref)(xs, w, b))
    y_pal = np.asarray(jax.jit(pallas_fn)(xs, w, b))
    print("posconv fwd  max|pallas - xla| :", np.abs(y_pal - y_ref).max(),
          flush=True)

    # fp32 numerics, full VJP
    def loss_ref(x, w, b):
        return jnp.sum(xla_ref(x, w, b).astype(jnp.float32) ** 2)

    def loss_pal(x, w, b):
        return jnp.sum(pallas_fn(x, w, b).astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(xs, w, b)
    g_pal = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))(xs, w, b)
    for name, gr, gp in zip("xwb", g_ref, g_pal):
        rel = np.abs(np.asarray(gp) - np.asarray(gr)).max() / (
            np.abs(np.asarray(gr)).max() + 1e-9
        )
        print(f"posconv d{name}   max rel err        : {rel:.3e}", flush=True)

    # bf16 numerics: the _lane_roll int32-bitcast path only runs for
    # 16-bit dtypes — prove the packed roll is a real lane roll on the
    # chip, not just in interpret mode.
    xb2 = x[:2].astype(jnp.bfloat16)
    wb2 = w.astype(jnp.bfloat16)
    yb_ref = np.asarray(jax.jit(xla_ref)(xb2, wb2, b)).astype(np.float32)
    yb_pal = np.asarray(jax.jit(pallas_fn)(xb2, wb2, b)).astype(np.float32)
    scale = np.abs(yb_ref).max()
    print(f"posconv bf16 fwd max|pallas - xla| : "
          f"{np.abs(yb_pal - yb_ref).max():.5f} (scale {scale:.2f})",
          flush=True)

    def loss_pal_b(x, w, b):
        return jnp.sum(pallas_fn(x, w, b).astype(jnp.float32) ** 2)

    def loss_ref_b(x, w, b):
        return jnp.sum(xla_ref(x, w, b).astype(jnp.float32) ** 2)

    gb_ref = jax.jit(jax.grad(loss_ref_b, argnums=(1,)))(xb2, wb2, b)[0]
    gb_pal = jax.jit(jax.grad(loss_pal_b, argnums=(1,)))(xb2, wb2, b)[0]
    relw = np.abs(np.asarray(gb_pal, np.float32)
                  - np.asarray(gb_ref, np.float32)).max() / (
        np.abs(np.asarray(gb_ref, np.float32)).max() + 1e-9
    )
    print(f"posconv bf16 dW  max rel err       : {relw:.3e}", flush=True)

    # timing at the production eval dtype
    xb = x.astype(jnp.bfloat16)
    wb_ = w.astype(jnp.bfloat16)
    time_fn("posconv XLA grouped conv fwd (bf16)", xla_ref, xb, wb_, b)
    time_fn("posconv pallas fwd (bf16)", pallas_fn, xb, wb_, b)

    def step_ref(x, w, b):
        return jax.grad(loss_ref, argnums=(1,))(x, w, b)[0]

    def step_pal(x, w, b):
        return jax.grad(loss_pal, argnums=(1,))(x, w, b)[0]

    time_fn("posconv XLA fwd+bwd (f32)", step_ref, x, w, b)
    time_fn("posconv pallas fwd+bwd (f32)", step_pal, x, w, b)


def _attn_shapes(label, b, n, h, d):
    from triad_tpu.models.layers import (
        dot_product_attention,
        packed_dot_product_attention,
    )

    rng = np.random.default_rng(1)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    ref = np.asarray(
        jax.jit(
            lambda q, k, v: dot_product_attention(
                q, k, v, None, jnp.bfloat16
            )
        )(q, k, v)
    ).astype(np.float32)

    def run(pair):
        fn = jax.jit(
            lambda q, k, v: packed_dot_product_attention(
                q, k, v, None, jnp.bfloat16, pair=pair
            )
        )
        out = np.asarray(fn(q, k, v)).astype(np.float32)
        err = np.abs(out - ref).max()
        print(f"{label} pair={pair}  max|out - xla| : {err:.4f}", flush=True)
        return fn

    run(False)
    run(True)

    time_fn(
        f"{label} eval attn XLA",
        lambda q, k, v: dot_product_attention(q, k, v, None, jnp.bfloat16),
        q, k, v,
    )
    time_fn(
        f"{label} eval attn packed (single-head)",
        lambda q, k, v: packed_dot_product_attention(
            q, k, v, None, jnp.bfloat16
        ),
        q, k, v,
    )
    time_fn(
        f"{label} eval attn packed_pair",
        lambda q, k, v: packed_dot_product_attention(
            q, k, v, None, jnp.bfloat16, pair=True
        ),
        q, k, v,
    )


def check_pair_attention():
    _attn_shapes("hubert (64,499,12,64)", 64, 499, 12, 64)
    _attn_shapes("vit    (64,261,12,64)", 64, 261, 12, 64)

    # merged layout at ViT shapes (the winning bench_vitmq config uses
    # fused_attention_eval_merged; pair is the candidate replacement).
    from triad_tpu.models.layers import (
        dot_product_attention,
        merged_packed_dot_product_attention,
    )

    b, n, h, d = 64, 261, 12, 64
    rng = np.random.default_rng(2)
    mk = lambda: jnp.asarray(
        rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    flat = lambda x: x.reshape(b, n, h * d)
    qkv = jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)
    ref = np.asarray(
        jax.jit(
            lambda q, k, v: dot_product_attention(q, k, v, None, jnp.bfloat16)
        )(q, k, v)
    ).astype(np.float32).reshape(b, n, h * d)
    for pair in (False, True):
        out = np.asarray(
            jax.jit(
                lambda qkv: merged_packed_dot_product_attention(
                    qkv, None, jnp.bfloat16, d, pair=pair
                )
            )(qkv)
        ).astype(np.float32)
        print(f"vit merged pair={pair}  max|out - xla| : "
              f"{np.abs(out - ref).max():.4f}", flush=True)
    time_fn(
        "vit merged eval attn (single-head)",
        lambda qkv: merged_packed_dot_product_attention(
            qkv, None, jnp.bfloat16, d
        ),
        qkv,
    )
    time_fn(
        "vit merged eval attn (pair)",
        lambda qkv: merged_packed_dot_product_attention(
            qkv, None, jnp.bfloat16, d, pair=True
        ),
        qkv,
    )


def check_frontend_xt():
    """xt tap-plane wire layout vs x10 for the monolithic frontend
    (numerics + timing at the production eval shape)."""
    from triad_tpu.ops.pallas_frontend import (
        monolithic_frontend,
        num_tokens,
    )

    B, T = 64, 160_000
    rng = np.random.default_rng(3)
    wave = jnp.asarray((rng.normal(size=(B, T)) * 0.1).astype(np.float32))
    w0 = jnp.asarray(rng.normal(size=(10, 512)).astype(np.float32) * 0.3)
    gs = jnp.asarray(rng.normal(size=(512,)).astype(np.float32) * 0.1 + 1)
    gb = jnp.asarray(rng.normal(size=(512,)).astype(np.float32) * 0.1)
    ws = [
        jnp.asarray(
            (rng.normal(size=(k, 512, 512)) * (0.5 / np.sqrt(512 * k))
             ).astype(np.float32)
        )
        for k in (3, 3, 3, 3, 2, 2)
    ]

    def fe(layout):
        return lambda wave: monolithic_frontend(
            wave, w0, gs, gb, ws, tb=64, gelu="tanh", wave_layout=layout
        )

    y10 = np.asarray(jax.jit(fe("x10"))(wave[:2])).astype(np.float32)
    yxt = np.asarray(jax.jit(fe("xt"))(wave[:2])).astype(np.float32)
    print(f"frontend xt vs x10 max|diff| : "
          f"{np.abs(yxt - y10).max():.5f} (scale {np.abs(y10).max():.2f})",
          flush=True)
    time_fn("frontend x10 (B=64, 10s, tanh)", fe("x10"), wave)
    time_fn("frontend xt  (B=64, 10s, tanh)", fe("xt"), wave)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "posconv"):
        check_posconv()
    if which in ("all", "attn"):
        check_pair_attention()
    if which in ("all", "frontend"):
        check_frontend_xt()


if __name__ == "__main__":
    main()
