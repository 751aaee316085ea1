"""Fused dropout+add+LayerNorm tests (CPU interpret mode): p=0
equivalence with flax LayerNorm(x+h) in values and gradients, and
HubertEncoderLayer param-tree compatibility across ln_impl. Dropout
paths run on the real chip (interpret-mode PRNG is a different
stream)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.core.config import HubertConfig
from triad_tpu.ops.pallas_ln import fused_dropout_add_ln

SMALL_HUBERT = dict(
    conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
    hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
)


def _ref(x, h, scale, bias, eps):
    s = x + h
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    return (s - mean) * jax.lax.rsqrt(var + eps) * scale + bias


class TestFusedDropoutAddLN:
    def _inputs(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) + 1.0)
        bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
        return x, h, scale, bias

    def test_p0_matches_reference(self):
        x, h, scale, bias = self._inputs()
        with pltpu.force_tpu_interpret_mode():
            y = fused_dropout_add_ln(
                x, h, scale, bias, jnp.int32(0), 0.0, 1e-5
            )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(_ref(x, h, scale, bias, 1e-5)),
            rtol=2e-5, atol=2e-5,
        )

    def test_p0_gradients_match(self):
        x, h, scale, bias = self._inputs()

        def loss_fused(x, h, scale, bias):
            return jnp.sum(
                fused_dropout_add_ln(x, h, scale, bias, jnp.int32(0), 0.0, 1e-5)
                ** 2
            )

        def loss_ref(x, h, scale, bias):
            return jnp.sum(_ref(x, h, scale, bias, 1e-5) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
                x, h, scale, bias
            )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, h, scale, bias)
        for gf, gr, name in zip(g_fused, g_ref, ["x", "h", "scale", "bias"]):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4,
                err_msg=name,
            )

    def test_block_rows_identical(self):
        """block_rows merges batch rows per grid step (free reshape; LN
        is per-row over C) — outputs and grads bit-identical to rb=1."""
        x, h, scale, bias = self._inputs()

        def loss(rb):
            return lambda x, h, scale, bias: jnp.sum(
                fused_dropout_add_ln(
                    x, h, scale, bias, jnp.int32(0), 0.0, 1e-5, rb
                ) ** 2
            )

        with pltpu.force_tpu_interpret_mode():
            y1 = fused_dropout_add_ln(
                x, h, scale, bias, jnp.int32(0), 0.0, 1e-5
            )
            y2 = fused_dropout_add_ln(
                x, h, scale, bias, jnp.int32(0), 0.0, 1e-5, 2
            )
            g1 = jax.grad(loss(1), argnums=(0, 1, 2, 3))(x, h, scale, bias)
            g2 = jax.grad(loss(2), argnums=(0, 1, 2, 3))(x, h, scale, bias)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        # dx/dh are per-row (bit-identical); dscale/dbias partials sum
        # in a different order (in-kernel accumulation across merged
        # rows vs cross-grid sum) — f32 rounding only.
        for a, b, name in zip(g1[:2], g2[:2], ["x", "h"]):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=name
            )
        for a, b, name in zip(g1[2:], g2[2:], ["scale", "bias"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, err_msg=name
            )

    def test_hubert_layer_param_compat(self):
        """ln_impl='fused' consumes the same param tree the XLA path
        made (layer_norm/final_layer_norm {scale, bias}) and matches at
        eval (p=0)."""
        from triad_tpu.models.hubert import HubertEncoderLayer

        cfg = HubertConfig(**SMALL_HUBERT)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32) * 0.3)
        xla_layer = HubertEncoderLayer(dataclasses.replace(cfg, ln_impl="xla"))
        params = xla_layer.init(jax.random.key(0), x)["params"]
        out_xla = xla_layer.apply({"params": params}, x, True)
        fused_layer = HubertEncoderLayer(
            dataclasses.replace(cfg, ln_impl="fused")
        )
        with pltpu.force_tpu_interpret_mode():
            out_fused = fused_layer.apply({"params": params}, x, True)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_xla), rtol=2e-5, atol=2e-5
        )
