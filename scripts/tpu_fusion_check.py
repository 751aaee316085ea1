"""Fusion-pathology probe. The elementwise probe showed all ITERS=5
micro-timings carry a ~30 ms/ITERS tunnel-RTT floor; after recalibration
the raw grouped pos-conv is ~3.8 ms (near roofline) but conv+trim+gelu
is ~14 ms — the slowdown is XLA FUSING the gelu into the conv, not the
gelu itself. This probe tests optimization_barrier'd variants and flash
vs xla attention at eval, all at ITERS=20 (RTT floor 1.5 ms).

Run: python scripts/tpu_fusion_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

B = 64
# Overridable: ITERS=20 keeps the tunnel-RTT floor (~30 ms / ITERS) low
# but long scans compile very slowly remotely; relative comparisons at
# ITERS=5 carry the same +RTT/5 on both sides.
ITERS = int(next((a[6:] for a in sys.argv[1:] if a.startswith("iters=")), 20))


def time_fn(label, fn, *args):
    def chained(*args):
        def body(c, _):
            pert = [a + (c * 1e-12).astype(a.dtype) for a in args]
            out = fn(*pert)
            return jnp.sum(out.astype(jnp.float32) * 1e-12), None

        r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return r

    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(*args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:52s} {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    sections = {
        a for a in sys.argv[1:] if not a.startswith("iters=")
    } or {"posconv", "conv1", "attn"}
    rng = np.random.default_rng(0)

    # ---- pos-conv: conv / +gelu / +barrier+gelu ----------------------
    NA, C, K, G = 499, 768, 128, 16
    PAD = K // 2
    x = jnp.asarray((rng.normal(size=(B, NA, C)) * 0.3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(
        (rng.normal(size=(K, C // G, C)) * 0.05).astype(np.float32)
    ).astype(jnp.bfloat16)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(PAD, PAD)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=G,
        )

    def conv_asym(x, w):
        # (pad, pad-1): emits T outputs directly — no trim slice.
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(PAD, PAD - 1)],
            dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=G,
        )

    if "posconv" in sections:
        time_fn("posconv raw", conv, x, w)
        time_fn(
            "posconv +trim+gelu (fused)",
            lambda x, w: nn.gelu(conv(x, w)[:, :-1], approximate=False), x, w,
        )

        def barriered(x, w):
            y = jax.lax.optimization_barrier(conv(x, w))
            return nn.gelu(y[:, :-1], approximate=False)

        time_fn("posconv +barrier +trim+gelu", barriered, x, w)

        def barriered2(x, w):
            y = jax.lax.optimization_barrier(conv(x, w)[:, :-1])
            return nn.gelu(y, approximate=False)

        time_fn("posconv +trim +barrier +gelu", barriered2, x, w)

        time_fn(
            "posconv asym-pad +gelu +residual",
            lambda x, w: x + nn.gelu(conv_asym(x, w), approximate=False),
            x, w,
        )
        time_fn(
            "posconv trim +gelu +residual",
            lambda x, w: x + nn.gelu(conv(x, w)[:, :-1], approximate=False),
            x, w,
        )
        # numerics: asym pad == symmetric pad + trailing trim
        d = jnp.max(
            jnp.abs(
                conv(x[:2], w)[:, :-1].astype(jnp.float32)
                - conv_asym(x[:2], w).astype(jnp.float32)
            )
        )
        print(f"max |asym - trim|: {float(d):.4g}", flush=True)

    # ---- frontend conv_1 (the heaviest layer): fused vs barrier ------
    T1, C1 = 31999, 512
    x1 = jnp.asarray(
        (rng.normal(size=(B, T1, C1)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    w1 = jnp.asarray(
        (rng.normal(size=(3, C1, C1)) * 0.03).astype(np.float32)
    ).astype(jnp.bfloat16)

    def c1(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    if "conv1" in sections:
        time_fn("conv_1 raw (k=3,s=2,512->512)", c1, x1, w1)
        time_fn(
            "conv_1 +gelu (fused)",
            lambda x, w: nn.gelu(c1(x, w), approximate=False), x1, w1,
        )
        time_fn(
            "conv_1 +barrier +gelu",
            lambda x, w: nn.gelu(
                jax.lax.optimization_barrier(c1(x, w)), approximate=False
            ),
            x1, w1,
        )

    # ---- attention eval: xla bf16 scores vs flash --------------------
    from triad_tpu.models.layers import (
        dot_product_attention,
        flash_dot_product_attention,
    )

    H, D = 12, 64
    q = jnp.asarray(
        (rng.normal(size=(B, NA, H, D)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    k = jnp.asarray(
        (rng.normal(size=(B, NA, H, D)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = jnp.asarray(
        (rng.normal(size=(B, NA, H, D)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)

    def attn12(fn, q, k, v):
        for _ in range(12):
            q = fn(q, k, v)
        return q

    if "attn" in sections:
        time_fn(
            "12x attn xla bf16-scores (audio shapes)",
            lambda q, k, v: attn12(
                lambda a, b, c: dot_product_attention(
                    a, b, c, None, jnp.bfloat16, scores_dtype=jnp.bfloat16
                ),
                q, k, v,
            ),
            q, k, v,
        )
        time_fn(
            "12x attn flash (audio shapes)",
            lambda q, k, v: attn12(
                lambda a, b, c: flash_dot_product_attention(
                    a, b, c, None, jnp.bfloat16
                ),
                q, k, v,
            ),
            q, k, v,
        )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
