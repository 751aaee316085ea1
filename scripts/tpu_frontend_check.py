"""Frontend + pos-conv lowering probe on the real TPU.

The audio profile attributes ~47 ms (chunked) / 55 ms (monolithic) of
the 109 ms HuBERT eval forward to the conv frontend at B=64/10 s —
~3x its bf16 MXU roofline (~16 ms at 3.1 TFLOP) — and 20.2 ms to the
pos-conv embedding whose raw grouped conv times at 10.6 ms. This probe
isolates where both gaps live:

  frontend: full-stack time per impl (conv / matmul / block_matmul),
            plus per-layer times for the best impl
  posconv:  raw grouped conv, +trim, +gelu, and exact-gelu alone

Run: python scripts/tpu_frontend_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from triad_tpu.core.config import HubertConfig

B, T = 64, 160_000
ITERS = 5


def time_fn(label, fn, params, *args):
    def chained(params, *args):
        def body(c, _):
            pert = [a + (c * 1e-12).astype(a.dtype) for a in args]
            out = fn(params, *pert)
            return jnp.sum(out.astype(jnp.float32) * 1e-12), None

        r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return r

    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(params, *args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(params, *args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:46s} {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    from triad_tpu.models.hubert import ConvFeatureEncoder, normalize_waveform

    rng = np.random.default_rng(0)
    audio = normalize_waveform(
        jnp.asarray((rng.normal(size=(B, T)) * 0.1).astype(np.float32))
    )

    base = HubertConfig()
    fes = {}
    for impl in ("conv", "matmul", "block_matmul"):
        cfg = dataclasses.replace(base, frontend_impl=impl)
        fes[impl] = ConvFeatureEncoder(cfg, dtype=jnp.bfloat16)
    # identical param trees across impls (kernel (k, cin, cout) [+bias])
    params = fes["conv"].init(jax.random.key(0), audio[:1])["params"]

    # numerics cross-check on a slice
    ref = None
    for impl, fe in fes.items():
        y = np.asarray(
            jax.jit(lambda p, a, fe=fe: fe.apply({"params": p}, a))(
                params, audio[:2]
            ).astype(jnp.float32)
        )
        if ref is None:
            ref = y
        else:
            print(f"max |{impl} - conv|: {np.abs(y - ref).max():.4g}")

    for impl, fe in fes.items():
        time_fn(
            f"frontend full stack [{impl}]",
            lambda p, a, fe=fe: fe.apply({"params": p}, a), params, audio,
        )

    # per-layer: time cumulative prefixes for conv vs block_matmul
    for impl in ("conv", "block_matmul", "matmul"):
        cfg = dataclasses.replace(base, frontend_impl=impl)
        fe = ConvFeatureEncoder(cfg, dtype=jnp.bfloat16)

        def prefix(p, a, n, fe=fe):
            def run(mdl):
                x = mdl.conv0(a[:, :, None] if False else a)
                x = mdl.convs[0](a[:, :, None].astype(jnp.bfloat16))
                mean, var = ConvFeatureEncoder.stats(x)
                x = nn.gelu(mdl.group_norm(x, mean, var), approximate=False)
                for conv in mdl.convs[1 : n + 1]:
                    x = nn.gelu(conv(x), approximate=False)
                return x

            return nn.apply(run, fe)({"params": p})

        for n in (0, 2, 6):
            time_fn(
                f"  [{impl}] conv_0..{n}",
                lambda p, a, n=n: prefix(p, a, n), params, audio,
            )

    # ---- pos-conv decomposition --------------------------------------
    NA, C, K, G = 499, 768, 128, 16
    PAD = K // 2
    x = jnp.asarray((rng.normal(size=(B, NA, C)) * 0.3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(
        (rng.normal(size=(K, C // G, C)) * 0.05).astype(np.float32)
    )  # fp32 params like the model

    def raw(w, x):
        return jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), window_strides=(1,),
            padding=[(PAD, PAD)], dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=G,
        )

    time_fn("posconv raw grouped conv", raw, w, x)
    time_fn("posconv +trim", lambda w, x: raw(w, x)[:, :-1], w, x)
    time_fn(
        "posconv +trim +gelu",
        lambda w, x: nn.gelu(raw(w, x)[:, :-1], approximate=False), w, x,
    )
    big = jnp.asarray(
        (rng.normal(size=(B, NA + 1, C)) * 0.3).astype(np.float32)
    ).astype(jnp.bfloat16)
    time_fn("exact gelu alone (B,500,768) bf16", lambda p, y: nn.gelu(y, approximate=False), None, big)
    time_fn(
        "tanh gelu alone (B,500,768) bf16",
        lambda p, y: nn.gelu(y, approximate=True), None, big,
    )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
