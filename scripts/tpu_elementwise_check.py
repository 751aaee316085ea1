"""Elementwise-op cost probe: XLA's lowering of transcendentals on this
TPU toolchain measured ~30-60x off the bandwidth roofline (exact GELU on
(64,500,768) bf16 = 7.2 ms standalone; the same GELU inside the pallas
fused-MLP kernel is <1 ms on 4x the elements). Times copy / relu / exp /
erf-gelu / tanh-gelu / A&S-polynomial-gelu across dtypes and a pallas
elementwise kernel for reference.

Run: python scripts/tpu_elementwise_check.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_mlp import _gelu_exact

B, T, C = 64, 500, 768
ITERS = 10


def time_fn(label, fn, x):
    def chained(x):
        def body(c, _):
            out = fn(x + (c * 1e-12).astype(x.dtype))
            return jnp.sum(out.astype(jnp.float32) * 1e-12), None

        r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return r

    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(x))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:46s} {dt * 1e3:8.3f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def poly_gelu(x):
    return _gelu_exact(x.astype(jnp.float32)).astype(x.dtype)


def _pallas_gelu_kernel(x_ref, y_ref):
    y_ref[0] = _gelu_exact(x_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


def pallas_gelu(x):
    b = x.shape[0]
    return pl.pallas_call(
        _pallas_gelu_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1,) + x.shape[1:], lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    rng = np.random.default_rng(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(
            (rng.normal(size=(B, T, C)) * 0.5).astype(np.float32)
        ).astype(dtype)
        name = np.dtype(dtype).name
        print(f"--- (64,500,768) {name}: 24.5M elems ---")
        time_fn("x + 1", lambda v: v + 1, x)
        time_fn("relu", jax.nn.relu, x)
        time_fn("exp", jnp.exp, x)
        time_fn("tanh", jnp.tanh, x)
        time_fn("erf", jax.lax.erf, x)
        time_fn("gelu exact (erf)", functools.partial(nn.gelu, approximate=False), x)
        time_fn("gelu tanh", functools.partial(nn.gelu, approximate=True), x)
        time_fn("gelu poly (fp32 A&S erf)", poly_gelu, x)
        time_fn("gelu pallas (fp32 A&S erf)", pallas_gelu, x)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
