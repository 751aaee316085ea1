"""Positional-conv-embedding lowering probe (k=128, groups=16).

The HF HuBERT conv positional embedding measured 19.6 ms at B=64 eval
via flax/XLA's grouped-conv lowering — ~6x over roofline. This script
checks correctness and times alternative lowerings:

  1. flax grouped conv (baseline)
  2. group-to-batch: reshape groups into the batch dim, one dense conv
     (in=48, out=48) — full k*Cin contraction on the MXU
  3. tap-scan: y = sum_j shift(x, j) @ blockdiag(W_j) as a lax.fori
     over taps with group-batched dot_general

Run: python scripts/tpu_posconv_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, T, C, K, G = 64, 499, 768, 128, 16
CG = C // G  # 48
PAD = K // 2
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
    print(f"{label:42s} {dt * 1e3:8.2f} ms  (compile {c:.0f}s)", flush=True)
    return dt


def grouped_conv(x, w):
    # baseline: XLA grouped conv, NHC layout (flax nn.Conv equivalent).
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(PAD, PAD)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=G,
    )[:, :-1]


def group_to_batch(x, w):
    # (B, T, 16, 48) -> (B*16, T, 48); dense conv in=48 out=48.
    xg = x.reshape(B, T, G, CG).transpose(0, 2, 1, 3).reshape(B * G, T, CG)
    # w: (K, CG, C) HIO grouped -> per-group dense (K, CG, CG)
    wg = w.reshape(K, CG, G, CG)  # out dim split as (G, CG): group-major?
    # grouped HIO kernel layout: out channels are [g0c0..g0c47, g1c0...]
    wg = jnp.transpose(wg, (2, 0, 1, 3))  # (G, K, CG, CG)

    def per_group(xg_g, w_g):
        return jax.lax.conv_general_dilated(
            xg_g, w_g, window_strides=(1,), padding=[(PAD, PAD)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    # vmap over groups: regroup to (G, B, T, CG)
    xv = x.reshape(B, T, G, CG).transpose(2, 0, 1, 3)  # (G, B, T, CG)
    yv = jax.vmap(per_group)(xv, wg)  # (G, B, T+1, CG)
    y = jnp.transpose(yv, (1, 2, 0, 3)).reshape(B, T + 1, C)
    return y[:, :-1]


def tap_scan(x, w):
    # y[t] = sum_j xp[t + j] @ W_j (block-diagonal per group)
    xp = jnp.pad(x, ((0, 0), (PAD, PAD - 1), (0, 0)))
    xg = xp.reshape(B, T + K - 1, G, CG)
    wg = w.reshape(K, CG, G, CG)
    wg = jnp.transpose(wg, (0, 2, 1, 3))  # (K, G, CG_in, CG_out)

    def body(j, acc):
        xs = jax.lax.dynamic_slice_in_dim(xg, j, T, axis=1)  # (B,T,G,CG)
        yj = jnp.einsum(
            "btgi,gio->btgo", xs, wg[j], preferred_element_type=jnp.float32
        )
        return acc + yj

    y = jax.lax.fori_loop(
        0, K, body, jnp.zeros((B, T, G, CG), jnp.float32)
    )
    return y.reshape(B, T, C).astype(x.dtype)


def main():
    global B
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32) * 0.3).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(
        rng.normal(size=(K, CG, C)).astype(np.float32) * 0.05
    ).astype(jnp.bfloat16)

    # correctness on a small slice (fp32, CPU-checkable numerics)
    xs = x[:2].astype(jnp.float32)
    ws = w.astype(jnp.float32)
    y0 = np.asarray(jax.jit(grouped_conv)(xs, ws))
    B_full = B
    B = 2
    y1 = np.asarray(jax.jit(group_to_batch)(xs, ws))
    y2 = np.asarray(jax.jit(tap_scan)(xs, ws))
    B = B_full
    print("max |g2b - base|:", np.abs(y1 - y0).max())
    print("max |tap - base|:", np.abs(y2 - y0).max())

    time_fn("grouped conv (baseline)", grouped_conv, x, w)
    time_fn("group-to-batch dense conv", group_to_batch, x, w)
    time_fn("tap-scan blockdiag", tap_scan, x, w)


if __name__ == "__main__":
    main()
