"""Real-TPU checks for ops/pallas_attention.py (the parts interpret mode
cannot cover: the in-kernel PRNG). Run on a machine with a TPU:

    python scripts/tpu_attention_check.py

Checks:
  1. p=0 forward == XLA fp32-scores attention.
  2. dropout keep-rate ~= 1-p and E[out] over seeds ~= p=0 out.
  3. p>0 gradient consistency: directional derivative along the returned
     gradient matches |g|^2 (same seed => same replayed mask).
  4. micro-bench: fused vs XLA fwd+bwd at HuBERT shapes.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from triad_tpu.models.layers import dot_product_attention
from triad_tpu.ops.pallas_attention import fused_attention


def main():
    B, H, T, D = 8, 12, 512, 64
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, D)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    mask = jnp.asarray(
        (np.arange(T)[None, :] < np.full((B, 1), 499)).astype(np.float32)
    )
    sm = float(1.0 / np.sqrt(D))

    def xla_ref(q, k, v):
        t = lambda x: jnp.transpose(x, (0, 2, 1, 3))
        m = mask.astype(bool)[:, None, None, :]
        return jnp.transpose(
            dot_product_attention(t(q), t(k), t(v), m, jnp.bfloat16),
            (0, 2, 1, 3),
        )

    # 1. p=0 equivalence
    o_f = jax.jit(lambda q, k, v: fused_attention(q, k, v, mask, jnp.int32(0), 0.0, sm))(q, k, v)
    o_x = jax.jit(xla_ref)(q, k, v)
    d = float(jnp.max(jnp.abs(o_f.astype(jnp.float32) - o_x.astype(jnp.float32))))
    print(f"p=0 max |fused - xla| = {d:.2e}")
    assert d < 2e-2, d

    # 2. dropout statistics
    p = 0.25
    f = jax.jit(lambda q, s: fused_attention(q, k, v, mask, s, p, sm))
    outs = np.stack([np.asarray(f(q, jnp.int32(s)), np.float32) for s in range(16)])
    base = np.asarray(o_f, np.float32)
    resid = np.abs(outs.mean(0) - base)[:, :, :499].mean()
    scale = np.abs(base)[:, :, :499].mean()
    print(f"E[out] residual / scale = {resid / scale:.3f} (16 seeds)")
    assert resid / scale < 0.2
    assert np.abs(outs[0] - base).max() > 1e-3  # dropout is active
    assert not np.array_equal(outs[0], outs[1])  # seeds differ

    # 3. p>0 gradient exactness. Finite differences cannot resolve the
    # perturbation against the large loss value, so instead the kernel's
    # ACTUAL dropout mask is extracted (feed identity blocks as v: the
    # output columns are the dropped-probs matrix D) and the custom VJP
    # is compared against jax.grad of an explicit-mask reference.
    Bs, Hs = 2, 2
    qs = q[:Bs, :Hs].astype(jnp.float32)
    ks = k[:Bs, :Hs].astype(jnp.float32)
    vs = v[:Bs, :Hs].astype(jnp.float32)
    masks = mask[:Bs]
    s5 = jnp.int32(5)

    eye = np.eye(T, dtype=np.float32)
    d_cols = []
    for j in range(T // D):
        vblock = jnp.broadcast_to(
            jnp.asarray(eye[:, j * D : (j + 1) * D]), (Bs, Hs, T, D)
        )
        d_cols.append(np.asarray(
            jax.jit(lambda vb: fused_attention(qs, ks, vb, masks, s5, p, sm))(vblock),
            np.float32,
        ))
    d_full = np.concatenate(d_cols, axis=-1)  # (Bs, Hs, T, T) dropped probs

    # keep mask: D > 0 where the underlying P > 0 (real keys)
    keep = jnp.asarray((d_full > 0).astype(np.float32))

    def ref_loss(q, k, v):
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * sm
        scores = scores + (1.0 - masks[:, None, None, :]) * -1e30
        probs = jax.nn.softmax(scores, axis=-1)
        dropped = probs * keep / (1.0 - p)
        o = jnp.einsum("bhqk,bhkd->bhqd", dropped, v)
        return jnp.sum(o ** 2)

    def fused_loss(q, k, v):
        o = fused_attention(q, k, v, masks, s5, p, sm)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(qs, ks, vs)
    g_fused = jax.jit(jax.grad(fused_loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for gr, gf, name in zip(g_ref, g_fused, "qkv"):
        diff = float(jnp.max(jnp.abs(gr - gf)))
        rel = diff / (float(jnp.max(jnp.abs(gr))) + 1e-9)
        print(f"d{name}: max abs diff {diff:.3e} (rel {rel:.3e})")
        assert rel < 2e-2, (name, rel)

    # 4. micro-bench fwd+bwd at B=64
    B2 = 64
    rng2 = np.random.default_rng(1)
    mk2 = lambda: jnp.asarray(
        rng2.normal(size=(B2, H, T, D)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    q2, k2, v2 = mk2(), mk2(), mk2()
    mask2 = jnp.asarray(
        (np.arange(T)[None, :] < np.full((B2, 1), 499)).astype(np.float32)
    )

    def timegrad(label, lossfn, iters=10):
        gf = jax.grad(lossfn)
        def chained(q):
            def body(c, _):
                g = gf(q + (c * 1e-12).astype(q.dtype))
                return jnp.sum(g.astype(jnp.float32) ** 2), None
            r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return r
        gj = jax.jit(chained)
        t0 = time.perf_counter(); float(gj(q2)); c = time.perf_counter() - t0
        t0 = time.perf_counter(); float(gj(q2)); dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:.2f} ms fwd+bwd (compile {c:.0f}s)")

    def xla_drop_loss(q):
        t = lambda x: jnp.transpose(x, (0, 2, 1, 3))
        m = mask2.astype(bool)[:, None, None, :]
        key = jax.random.key(0)
        def pd(probs):
            keep = jax.random.bernoulli(key, 1.0 - p, probs.shape)
            return jnp.where(keep, probs / (1.0 - p), 0.0)
        o = dot_product_attention(t(q2 * 0 + q), t(k2), t(v2), m, jnp.bfloat16, probs_dropout=pd)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    timegrad("xla fp32+dropout", xla_drop_loss)
    timegrad(
        "fused dropout",
        lambda q: jnp.sum(
            fused_attention(q, k2, v2, mask2, jnp.int32(3), p, sm).astype(jnp.float32) ** 2
        ),
    )

    # 5. merged-qkv training kernel (fused_attention_packed_merged):
    #    dropout replay on the real PRNG — (a) same seed => identical
    #    forward twice, (b) p>0 gradient exactness by MASK EXTRACTION
    #    (the check-3 method: feed identity blocks as v so the output
    #    columns ARE the dropped-probs matrix, then compare the custom
    #    VJP against jax.grad of an explicit-mask reference).
    #
    #    History: the original (b) used the directional-derivative test
    #    (f(x + eps*g) - f(x)) / eps == |g|^2 on bf16 inputs — it
    #    "failed" on hardware with rel err 0.95 because eps*g rounds
    #    away entirely against the bf16 inputs (deriv ~ 0), exactly the
    #    resolution failure check 3's comment warns about. fp32 inputs
    #    + extraction resolves the mask bit-exactly instead.
    from triad_tpu.ops.pallas_attention import fused_attention_packed_merged

    Bm = 2
    hd = H * D
    qm = q[:Bm].astype(jnp.float32)
    km = k[:Bm].astype(jnp.float32)
    vm = v[:Bm].astype(jnp.float32)
    maskm = mask[:Bm]
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(Bm, T, hd)
    qkv = jnp.concatenate([flat(qm), flat(km), flat(vm)], axis=-1)
    seedm = jnp.int32(11)

    @jax.jit
    def merged_fwd(qkv):
        return fused_attention_packed_merged(qkv, maskm, seedm, p, sm)

    o1, o2 = merged_fwd(qkv), merged_fwd(qkv)
    assert bool(jnp.all(o1 == o2)), "merged fwd not seed-deterministic"

    # Extract the replayed dropped-probs D per head: v := identity
    # blocks (all heads at once), so out[:, :, hh*D:(hh+1)*D] is
    # D_hh[:, j*D:(j+1)*D] for each identity block j.
    eye_m = np.eye(T, dtype=np.float32)
    d_cols_m = []
    for j in range(T // D):
        vb = jnp.broadcast_to(
            jnp.asarray(eye_m[:, j * D : (j + 1) * D]), (Bm, H, T, D)
        )
        qkv_j = jnp.concatenate(
            [flat(qm), flat(km), flat(vb)], axis=-1
        )
        out_j = np.asarray(merged_fwd(qkv_j), np.float32)
        # (Bm, T, hd) -> (Bm, H, T, D) head-major
        d_cols_m.append(
            out_j.reshape(Bm, T, H, D).transpose(0, 2, 1, 3)
        )
    d_full_m = np.concatenate(d_cols_m, axis=-1)  # (Bm, H, T, T)
    keep_m = jnp.asarray((d_full_m > 0).astype(np.float32))

    def ref_loss_m(qkv):
        qr = qkv[..., :hd].reshape(Bm, T, H, D).transpose(0, 2, 1, 3)
        kr = qkv[..., hd : 2 * hd].reshape(Bm, T, H, D).transpose(0, 2, 1, 3)
        vr = qkv[..., 2 * hd :].reshape(Bm, T, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qr, kr) * sm
        scores = scores + (1.0 - maskm[:, None, None, :]) * -1e30
        probs = jax.nn.softmax(scores, axis=-1)
        dropped = probs * keep_m / (1.0 - p)
        o = jnp.einsum("bhqk,bhkd->bhqd", dropped, vr)
        return jnp.sum(o ** 2)

    def fused_loss_m(qkv):
        o = fused_attention_packed_merged(qkv, maskm, seedm, p, sm)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_ref_m = jax.jit(jax.grad(ref_loss_m))(qkv)
    g_fused_m = jax.jit(jax.grad(fused_loss_m))(qkv)
    diff = float(jnp.max(jnp.abs(g_ref_m - g_fused_m)))
    rel = diff / (float(jnp.max(jnp.abs(g_ref_m))) + 1e-9)
    print(f"merged dropout replay (mask extraction): d(qkv) max abs "
          f"diff {diff:.3e} (rel {rel:.3e})")
    assert rel < 2e-2, "merged bwd does not replay the fwd dropout mask"
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
