"""Minimal repro for the axon-tunnel h2d transfer leak (r5).

A bare wire-dtype transfer loop — no framework code — leaks ~30 MB per
30 MB transferred on the tunneled axon backend (measured 0.34 ->
3.64 GB RSS over 100 iterations); gc.collect() and jax.clear_caches()
free nothing (the buffers are retained in the tunnel client's C++).
The CPU backend is flat. Consequence + mitigation:
docs/TRAINING_PERF.md "tunnel h2d transfer leak";
scripts/tpu_trainer_soak.py TRIAD_SOAK_RSS_LIMIT_GB.

Run: python scripts/tpu_tunnel_leak_repro.py [iters]
"""

import gc
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def cur_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255, size=(64, 224, 224, 3), dtype=np.uint8
    )  # 9.6 MB — the AV wire-batch pixel payload
    audio = (rng.normal(size=(64, 160_000)) * 1000).astype(np.int16)  # 20.5 MB

    @jax.jit
    def consume(x, y):
        return jnp.sum(x.astype(jnp.float32)) + jnp.sum(y.astype(jnp.float32))

    out = None
    r0 = cur_rss_gb()
    print(f"# start rss {r0:.2f} GB", flush=True)
    for i in range(iters):
        xa = jnp.asarray(frames)
        xb = jnp.asarray(audio)
        out = consume(xa, xb)
        del xa, xb
        if (i + 1) % 20 == 0:
            float(out)
            gc.collect()
            print(f"# iter {i+1}: rss {cur_rss_gb():.2f} GB (post-gc)",
                  flush=True)
    jax.clear_caches()
    gc.collect()
    r1 = cur_rss_gb()
    mb_per_iter = (r1 - r0) * 1e3 / iters
    print(f'{{"metric": "tunnel h2d leak", "mb_per_30mb_transfer": '
          f'{mb_per_iter:.1f}, "rss_start_gb": {r0:.2f}, '
          f'"rss_end_gb": {r1:.2f}, "iters": {iters}}}', flush=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    main()
