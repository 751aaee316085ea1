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

        # MERGED train kernel with LIVE dropout at ragged N — the last
        # uncleared merged composition (the p=0 merged legs above are
        # bit-exact; models/layers.py keeps live-dropout merged on
        # padded shapes until this probe passes on-chip).
        def drop_stats_merged(n_in, qkv_in, km_in):
            def f(qkv):
                o = fused_attention_packed_merged(
                    qkv, km_in, jnp.int32(7), 0.1, sm
                )
                o = o[:, :n_in].astype(jnp.float32)
                return (
                    jnp.all(jnp.isfinite(o)),
                    jnp.mean(o), jnp.std(o),
                    jnp.max(jnp.abs(o)),
                )

            fin, mu, sd, mx = jax.jit(f)(qkv_in)
            return bool(fin), float(mu), float(sd), float(mx)

        n_pad = ((n + 127) // 128) * 128
        qkv_p = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
        km_p = jnp.pad(km, ((0, 0), (0, n_pad - n)))
        fin_mr, mu_mr, sd_mr, mx_mr = drop_stats_merged(n, qkv, km)
        fin_mp, mu_mp, sd_mp, mx_mp = drop_stats_merged(n, qkv_p, km_p)
        print(f"{name} train merged dropout ragged: finite={fin_mr} "
              f"mean={mu_mr:.4f} std={sd_mr:.4f} max={mx_mr:.2f} | "
              f"padded: finite={fin_mp} mean={mu_mp:.4f} std={sd_mp:.4f} "
              f"max={mx_mp:.2f}", flush=True)
        assert fin_mr and fin_mp
        assert abs(sd_mr - sd_mp) < 0.2 * max(sd_mp, 1e-3), (sd_mr, sd_mp)
        assert mx_mr < 10 * max(mx_mp, 1.0), (mx_mr, mx_mp)

        # Ragged live-dropout BACKWARD — the composition the r4a e2e
        # NaN implicates (perf train = ragged unmerged kernels + p=0.1
        # attention dropout; r4a NaN'd on BOTH kernel sets at lr=1e-6
        # while every fwd leg above is finite). The replayed in-kernel
        # bits feed _head_bwd at unaligned lane counts; check grad
        # finiteness + moment sanity vs the padded p=0.1 grads across a
        # seed sweep (the e2e step seed varies per step).
        # One jitted grad program per pad mode; the key is a traced
        # argument so the seed sweep reuses the compile.
        def _drop_loss(pad):
            def f(q, k, v, rng_key):
                o = fused_packed_dot_product_attention(
                    q, k, v, None, jnp.bfloat16,
                    dropout_rate=0.1, dropout_rng=rng_key, pad=pad,
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

        _g_rag = _drop_loss("none")
        _g_pad = _drop_loss("hbm")

        def drop_grad_stats(gfn, rng_key):
            g = gfn(q, k, v, rng_key)
            fin = bool(all(
                jnp.all(jnp.isfinite(x.astype(jnp.float32))) for x in g
            ))
            mx = max(
                float(jnp.max(jnp.abs(x.astype(jnp.float32)))) for x in g
            )
            sd = float(jnp.std(g[0].astype(jnp.float32)))
            return fin, sd, mx

        for s in range(8):
            kk = jax.random.key(100 + s)
            fin_gr, sd_gr, mx_gr = drop_grad_stats(_g_rag, kk)
            fin_gp, sd_gp, mx_gp = drop_grad_stats(_g_pad, kk)
            ok = fin_gr and fin_gp and mx_gr < 10 * max(mx_gp, 1.0)
            print(f"{name} train dropout BWD seed={100 + s} ragged: "
                  f"finite={fin_gr} std={sd_gr:.4f} max={mx_gr:.2f} | "
                  f"padded: finite={fin_gp} std={sd_gp:.4f} "
                  f"max={mx_gp:.2f}", flush=True)
            assert ok, (s, fin_gr, fin_gp, mx_gr, mx_gp)

        @jax.jit
        def _gm(qkv_in, km_in, seed):
            def f(qkv):
                o = fused_attention_packed_merged(
                    qkv, km_in, seed, 0.1, sm
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            return jax.grad(f)(qkv_in)

        def drop_grad_stats_merged(rng_seed, qkv_in, km_in):
            g = _gm(qkv_in, km_in, jnp.int32(rng_seed)).astype(jnp.float32)
            return (
                bool(jnp.all(jnp.isfinite(g))),
                float(jnp.std(g)),
                float(jnp.max(jnp.abs(g))),
            )

        for s in range(4):
            fin_gr, sd_gr, mx_gr = drop_grad_stats_merged(200 + s, qkv, km)
            fin_gp, sd_gp, mx_gp = drop_grad_stats_merged(
                200 + s, qkv_p, km_p
            )
            print(f"{name} train merged dropout BWD seed={200 + s} "
                  f"ragged: finite={fin_gr} std={sd_gr:.4f} "
                  f"max={mx_gr:.2f} | padded: finite={fin_gp} "
                  f"std={sd_gp:.4f} max={mx_gp:.2f}", flush=True)
            assert fin_gr and fin_gp and mx_gr < 10 * max(mx_gp, 1.0), (
                s, fin_gr, fin_gp, mx_gr, mx_gp
            )
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    main()
