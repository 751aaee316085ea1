"""Packed eval attention kernel (ops/pallas_attention.fused_attention_eval)
vs the XLA bf16-scores path, at the model's eval shapes:

  HuBERT: (B=64, N=499, H=12, Dh=64), 12 layers of the eval step
  ViT:    (B=64, N=261, H=12, Dh=64)

Correctness vs the fp32 XLA reference + chained-scan timing (RTT
amortized; methodology of bench.py). Run: python scripts/tpu_attn_eval_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from triad_tpu.models.layers import (
    dot_product_attention,
    packed_dot_product_attention,
)

ITERS = 20


def bench(name, fn, *args):
    def chained(*args):
        def body(c, _):
            out = fn(args[0] + c * 1e-12, *args[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return tot
    run = jax.jit(chained)
    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"  {name}: {dt:.3f} ms/call")
    return dt


def main():
    for label, n in [("hubert", 499), ("vit", 261)]:
        b, h, d = 64, 12, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3).astype(jnp.bfloat16)

        ref = jax.jit(lambda q, k, v: dot_product_attention(
            q, k, v, None, jnp.bfloat16, scores_dtype=jnp.float32))(q, k, v)
        got = jax.jit(lambda q, k, v: packed_dot_product_attention(
            q, k, v, None, jnp.bfloat16))(q, k, v)
        diff = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"{label} (N={n}): packed vs fp32-XLA max|diff| = {diff:.3e}")

        bench("xla bf16-scores", lambda q, k, v: dot_product_attention(
            q, k, v, None, jnp.bfloat16, scores_dtype=jnp.bfloat16), q, k, v)
        bench("packed kernel  ", lambda q, k, v: packed_dot_product_attention(
            q, k, v, None, jnp.bfloat16), q, k, v)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
