"""Fused Pallas MLP tests (CPU interpret mode): p=0 equivalence with the
XLA fc1-gelu-fc2 path and custom-VJP gradients (incl. weight grads) vs
autodiff. Dropout paths run on the real chip (interpret-mode PRNG is
unimplemented): scripts/tpu_mlp_check.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_mlp import fused_mlp

B, T, DIN, DH = 2, 16, 64, 128


@pytest.fixture(scope="module")
def tensors():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, DIN)).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.normal(size=(DIN, DH)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(DH,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(DH, DIN)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(DIN,)).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2


def ref_mlp(x, w1, b1, w2, b2):
    h = x @ w1 + b1
    return jax.nn.gelu(h, approximate=False) @ w2 + b2


class TestFusedMlp:
    def test_p0_matches_xla(self, tensors):
        x, w1, b1, w2, b2 = tensors
        with pltpu.force_tpu_interpret_mode():
            y = fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0)
        ref = ref_mlp(x, w1, b1, w2, b2)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_p0_grads_match_autodiff(self, tensors):
        x, w1, b1, w2, b2 = tensors

        def loss_fused(x, w1, b1, w2, b2):
            return jnp.sum(fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0) ** 2)

        def loss_ref(x, w1, b1, w2, b2):
            return jnp.sum(ref_mlp(x, w1, b1, w2, b2) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
                x, w1, b1, w2, b2
            )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for gf, gr, name in zip(g_fused, g_ref, ["x", "w1", "b1", "w2", "b2"]):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-4,
                err_msg=name,
            )

    def test_hubert_layer_fused_param_compat(self):
        """mlp_impl='fused' consumes the same param tree nn.Dense made."""
        import dataclasses

        from tests.test_encoders import SMALL_HUBERT
        from triad_tpu.core.config import HubertConfig
        from triad_tpu.models.hubert import HubertEncoderLayer

        cfg = HubertConfig(**SMALL_HUBERT)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.normal(size=(2, 16, cfg.hidden_size)).astype(np.float32)
        )
        xla_layer = HubertEncoderLayer(
            dataclasses.replace(cfg, mlp_impl="xla")
        )
        params = xla_layer.init(jax.random.key(0), x)["params"]
        out_xla = xla_layer.apply({"params": params}, x)
        fused_layer = HubertEncoderLayer(
            dataclasses.replace(cfg, mlp_impl="fused")
        )
        with pltpu.force_tpu_interpret_mode():
            out_fused = fused_layer.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_xla), rtol=2e-5, atol=2e-5
        )


class TestBlockRows:
    """block_rows merges batch rows per grid step (free HBM reshape;
    per-step matmul M goes T -> rb*T). The math is row-independent, so
    outputs AND grads must be bit-identical to rb=1."""

    def test_output_identical(self, tensors):
        x, w1, b1, w2, b2 = tensors
        with pltpu.force_tpu_interpret_mode():
            y1 = fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0)
            y2 = fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0, "erf", B)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_grads_identical(self, tensors):
        x, w1, b1, w2, b2 = tensors

        def loss(rb):
            return lambda *a: jnp.sum(
                fused_mlp(*a, jnp.int32(0), 0.0, "erf", rb) ** 2
            )

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss(1), argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
            g2 = jax.grad(loss(B), argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b, name in zip(g1, g2, ["x", "w1", "b1", "w2", "b2"]):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=name
            )

    def test_hubert_layer_threads_block_rows(self):
        """mlp_block_rows reaches the kernel through the config path and
        leaves the layer output bit-identical."""
        import dataclasses

        from tests.test_encoders import SMALL_HUBERT
        from triad_tpu.core.config import HubertConfig
        from triad_tpu.models.hubert import HubertEncoderLayer

        cfg = HubertConfig(**SMALL_HUBERT)
        rng = np.random.default_rng(1)
        x = jnp.asarray(
            rng.normal(size=(4, 16, cfg.hidden_size)).astype(np.float32)
        )
        base = HubertEncoderLayer(dataclasses.replace(cfg, mlp_impl="fused"))
        params = HubertEncoderLayer(
            dataclasses.replace(cfg, mlp_impl="xla")
        ).init(jax.random.key(0), x)["params"]
        rb_layer = HubertEncoderLayer(
            dataclasses.replace(cfg, mlp_impl="fused", mlp_block_rows=2)
        )
        with pltpu.force_tpu_interpret_mode():
            y1 = base.apply({"params": params}, x)
            y2 = rb_layer.apply({"params": params}, x)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_non_divisor_falls_back(self, tensors):
        x, w1, b1, w2, b2 = tensors
        with pltpu.force_tpu_interpret_mode():
            y1 = fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0)
            y3 = fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0, "erf", 3)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y3))


class TestTanhGelu:
    """mlp_gelu="tanh": cheaper VPU transcendental, parity within the
    documented 4.7e-4 band (same bound as the frontend's tanh GELU,
    tests/test_pallas_frontend.py)."""

    def test_tanh_close_to_erf(self, tensors):
        x, w1, b1, w2, b2 = tensors
        with pltpu.force_tpu_interpret_mode():
            y_t = fused_mlp(x, w1, b1, w2, b2, jnp.int32(0), 0.0, "tanh")
        ref = ref_mlp(x, w1, b1, w2, b2)
        # tanh-GELU abs err <= 4.7e-4 per element, amplified by |w2|_1.
        err = np.abs(np.asarray(y_t) - np.asarray(ref)).max()
        scale = float(np.abs(np.asarray(w2)).sum(axis=0).max())
        assert err <= 5e-4 * max(scale, 1.0), err

    def test_tanh_grads_match_autodiff(self, tensors):
        """The hand-derived tanh-GELU derivative in the backward kernel
        must match autodiff of the tanh-GELU forward."""
        x, w1, b1, w2, b2 = tensors

        def ref_tanh(x, w1, b1, w2, b2):
            h = x @ w1 + b1
            return jax.nn.gelu(h, approximate=True) @ w2 + b2

        def loss_fused(*a):
            return jnp.sum(fused_mlp(*a, jnp.int32(0), 0.0, "tanh") ** 2)

        def loss_ref(*a):
            return jnp.sum(ref_tanh(*a) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
                x, w1, b1, w2, b2
            )
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for gf, gr, name in zip(g_fused, g_ref, ["x", "w1", "b1", "w2", "b2"]):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-4,
                err_msg=name,
            )
