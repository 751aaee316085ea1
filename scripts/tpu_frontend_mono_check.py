"""On-chip check + timing of the monolithic pallas frontend vs the
production XLA frontend at bench shapes (B=64, 10 s audio).

Run: python scripts/tpu_frontend_mono_check.py [tb ...]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from triad_tpu.core.config import HubertConfig
    from triad_tpu.models.hubert import ConvFeatureEncoder
    from triad_tpu.ops import pallas_frontend as mf

    tbs = [int(a) for a in sys.argv[1:]] or [64]
    B, T = 64, 160_000
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))

    base = HubertConfig()
    conv_fe = ConvFeatureEncoder(
        dataclasses.replace(base, frontend_impl="conv"), dtype=jnp.bfloat16
    )
    params = conv_fe.init(jax.random.key(0), wave[:1])["params"]

    def timed(fn, label, iters=10):
        x = jnp.asarray(wave)
        f = jax.jit(
            lambda w: jax.lax.scan(
                lambda c, _: (fn(w + c * 1e-6).astype(jnp.float32)[:, 0, 0].sum() * 1e-9, None),
                jnp.float32(0.0), None, length=iters,
            )[0]
        )
        t0 = time.perf_counter()
        r = f(x)
        float(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(x))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{label}: {dt:.2f} ms/call (compile {compile_s:.0f}s)")
        return dt

    ref_out = conv_fe.apply({"params": params}, wave[:4])
    base_ms = timed(
        lambda w: conv_fe.apply({"params": params}, w), "xla conv frontend"
    )

    for tb in tbs:
        mono_fe = ConvFeatureEncoder(
            dataclasses.replace(base, frontend_impl="monolithic"),
            dtype=jnp.bfloat16,
        )
        out = mono_fe.apply({"params": params}, wave[:4])
        d = np.abs(
            np.asarray(out, np.float32) - np.asarray(ref_out, np.float32)
        )
        scale = float(np.abs(np.asarray(ref_out, np.float32)).max())
        print(f"tb={tb}: max abs diff {d.max():.4f} (scale {scale:.2f})")

        def run(w, fe=mono_fe):
            return fe.apply({"params": params}, w)

        # patch tb through the config? tb is fixed at 64 in hubert.py;
        # time the kernel directly for other tbs
        if tb == 64:
            timed(run, f"monolithic frontend (tb={tb})")
        else:
            w0 = params["conv_0"]["kernel"]
            gs = params["group_norm"]["scale"]
            gb = params["group_norm"]["bias"]
            ws = [params[f"conv_{i}"]["kernel"] for i in range(1, 7)]
            timed(
                lambda w: mf.monolithic_frontend(
                    w, w0, gs, gb, ws, tb=tb, out_dtype=jnp.bfloat16
                ),
                f"monolithic kernel (tb={tb})",
            )
    print(f"baseline {base_ms:.2f} ms")


if __name__ == "__main__":
    main()
