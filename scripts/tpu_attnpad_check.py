"""On-chip numeric check: ragged-N attention (attention_pad="none") vs
the padded path, eval AND training kernels, at the production shapes.
Interpret tests prove the math (tests/test_pallas_attention.py); this
confirms the REAL Mosaic lowering computes the same values at ragged
sublane/lane counts. Run: python scripts/tpu_attnpad_check.py
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from triad_tpu.models.layers import (
    fused_packed_dot_product_attention,
    merged_packed_dot_product_attention,
    packed_dot_product_attention,
)


def main() -> None:
    rng = np.random.default_rng(0)
    for name, n in (("hubert", 499), ("vit", 261)):
        b, h, d = 4, 12, 64
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16)
        q, k, v = mk(), mk(), mk()

        # eval packed: ragged vs padded
        o_pad = jax.jit(
            lambda q, k, v: packed_dot_product_attention(
                q, k, v, None, jnp.bfloat16, pad="hbm"
            )
        )(q, k, v)
        o_rag = jax.jit(
            lambda q, k, v: packed_dot_product_attention(
                q, k, v, None, jnp.bfloat16, pad="none"
            )
        )(q, k, v)
        de = float(jnp.max(jnp.abs(
            o_pad.astype(jnp.float32) - o_rag.astype(jnp.float32)
        )))
        print(f"{name} eval packed  ragged-vs-padded max|diff| = {de:.2e}",
              flush=True)
        assert de < 1e-2, de

        # eval merged: ragged vs padded
        qkv = jnp.concatenate(
            [x.reshape(b, n, h * d) for x in (q, k, v)], axis=-1
        )
        m_pad = jax.jit(
            lambda qkv: merged_packed_dot_product_attention(
                qkv, None, jnp.bfloat16, d, pad="hbm"
            )
        )(qkv)
        m_rag = jax.jit(
            lambda qkv: merged_packed_dot_product_attention(
                qkv, None, jnp.bfloat16, d, pad="none"
            )
        )(qkv)
        dm = float(jnp.max(jnp.abs(
            m_pad.astype(jnp.float32) - m_rag.astype(jnp.float32)
        )))
        print(f"{name} eval merged  ragged-vs-padded max|diff| = {dm:.2e}",
              flush=True)
        assert dm < 1e-2, dm

        # training packed (p=0): fwd + grads, ragged vs padded
        def loss(pad):
            return lambda q, k, v: jnp.sum(
                fused_packed_dot_product_attention(
                    q, k, v, None, jnp.bfloat16, pad=pad
                ).astype(jnp.float32) ** 2
            )

        g_pad = jax.jit(jax.grad(loss("hbm"), argnums=(0, 1, 2)))(q, k, v)
        g_rag = jax.jit(jax.grad(loss("none"), argnums=(0, 1, 2)))(q, k, v)
        for gp, gr, nm in zip(g_pad, g_rag, "qkv"):
            dg = float(jnp.max(jnp.abs(
                gp.astype(jnp.float32) - gr.astype(jnp.float32)
            )))
            scale = float(jnp.max(jnp.abs(gp.astype(jnp.float32)))) + 1e-9
            print(f"{name} train d{nm}  ragged-vs-padded rel = "
                  f"{dg / scale:.2e}", flush=True)
            assert dg / scale < 1e-2, (nm, dg, scale)

        # MERGED training kernel (differentiable d(qkv) path) at ragged
        # N — the one composition the r3g NaN implicated. Compare the
        # padded adapter (production) against the raw merged train
        # kernel fed ragged shapes directly.
        from triad_tpu.ops.pallas_attention import (
            fused_attention_packed_merged,
        )

        sm = float(1.0 / np.sqrt(d))
        km = jnp.ones((b, n), jnp.float32)

        def loss_rag_merged(qkv):
            o = fused_attention_packed_merged(
                qkv, km, jnp.int32(0), 0.0, sm
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_pad_merged(qkv):
            o = merged_packed_dot_product_attention(
                qkv, None, jnp.bfloat16, d, differentiable=True,
                pad="hbm",
            )
            return jnp.sum(o.astype(jnp.float32) ** 2)

        o_rm = jax.jit(
            lambda qkv: fused_attention_packed_merged(
                qkv, km, jnp.int32(0), 0.0, sm
            )
        )(qkv)
        o_pm = jax.jit(
            lambda qkv: merged_packed_dot_product_attention(
                qkv, None, jnp.bfloat16, d, differentiable=True,
                pad="hbm",
            )
        )(qkv)
        dmt = float(jnp.max(jnp.abs(
            o_rm.astype(jnp.float32) - o_pm.astype(jnp.float32)
        )))
        finite = bool(jnp.all(jnp.isfinite(o_rm.astype(jnp.float32))))
        print(f"{name} train merged fwd ragged-vs-padded max|diff| = "
              f"{dmt:.2e} (ragged finite: {finite})", flush=True)
        g_rm = jax.jit(jax.grad(loss_rag_merged))(qkv)
        g_pm = jax.jit(jax.grad(loss_pad_merged))(qkv)
        dgm = float(jnp.max(jnp.abs(
            g_rm.astype(jnp.float32) - g_pm.astype(jnp.float32)
        )))
        sc = float(jnp.max(jnp.abs(g_pm.astype(jnp.float32)))) + 1e-9
        gfin = bool(jnp.all(jnp.isfinite(g_rm.astype(jnp.float32))))
        print(f"{name} train merged d(qkv) ragged-vs-padded rel = "
              f"{dgm / sc:.2e} (ragged finite: {gfin})", flush=True)
        # Ragged N with LIVE DROPOUT (p=0.1): the in-kernel PRNG mask at
        # unaligned lane counts is the one ragged configuration the
        # p=0 equality checks cannot cover (different bit streams).
        # Finiteness + moment sanity vs the padded p=0.1 run.
        def drop_stats(pad):
            def f(q, k, v):
                o = fused_packed_dot_product_attention(
                    q, k, v, None, jnp.bfloat16,
                    dropout_rate=0.1,
                    dropout_rng=jax.random.key(5),
                    pad=pad,
                )
                o = o.astype(jnp.float32)
                return (
                    jnp.all(jnp.isfinite(o)),
                    jnp.mean(o), jnp.std(o),
                    jnp.max(jnp.abs(o)),
                )

            fin, mu, sd, mx = jax.jit(f)(q, k, v)
            return bool(fin), float(mu), float(sd), float(mx)

        fin_r, mu_r, sd_r, mx_r = drop_stats("none")
        fin_p, mu_p, sd_p, mx_p = drop_stats("hbm")
        print(f"{name} train dropout ragged: finite={fin_r} "
              f"mean={mu_r:.4f} std={sd_r:.4f} max={mx_r:.2f} | padded: "
              f"finite={fin_p} mean={mu_p:.4f} std={sd_p:.4f} "
              f"max={mx_p:.2f}", flush=True)
        assert fin_r and fin_p
        assert abs(sd_r - sd_p) < 0.2 * max(sd_p, 1e-3), (sd_r, sd_p)
        assert mx_r < 10 * max(mx_p, 1.0), (mx_r, mx_p)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    main()
