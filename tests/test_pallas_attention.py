"""Fused Pallas attention tests (CPU interpret mode): p=0 equivalence
with the XLA softmax-attention path, key-mask handling, adapter
pad/slice behavior, and custom-VJP gradients at p=0 vs autodiff.

Dropout paths (keep statistics, 1/(1-p) scaling, replayed-mask gradient
consistency) CANNOT run here: interpret-mode ``pltpu.prng_random_bits``
returns zeros (unimplemented). They are exercised on the real chip by
``scripts/tpu_attention_check.py`` (run in round 1; results recorded in
docs/TRAINING_PERF.md).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.models.layers import (
    dot_product_attention,
    fused_dot_product_attention,
    packed_dot_product_attention,
)
from triad_tpu.ops.pallas_attention import fused_attention

B, H, T, D = 2, 3, 128, 64


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, D)).astype(np.float32) * 0.3
    )
    return mk(), mk(), mk()


def _mask(lens):
    return jnp.asarray(
        (np.arange(T)[None, :] < np.asarray(lens)[:, None]).astype(np.float32)
    )


def _xla_ref(q, k, v, key_mask):
    # (B,H,T,D) -> layers API layout (B,T,H,D)
    t = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    m = key_mask.astype(bool)[:, None, None, :]
    return jnp.transpose(
        dot_product_attention(t(q), t(k), t(v), m, jnp.float32),
        (0, 2, 1, 3),
    )


class TestForward:
    def test_p0_matches_xla(self, qkv):
        q, k, v = qkv
        mask = _mask([T, 100])
        with pltpu.force_tpu_interpret_mode():
            out = fused_attention(
                q, k, v, mask, jnp.int32(0), 0.0, float(1.0 / np.sqrt(D))
            )
        ref = _xla_ref(q, k, v, mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_adapter_pads_and_slices(self):
        rng = np.random.default_rng(3)
        n = 37  # non-128-multiple
        q = jnp.asarray(rng.normal(size=(B, n, H, D)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.normal(size=(B, n, H, D)).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.normal(size=(B, n, H, D)).astype(np.float32) * 0.3)
        key_mask = jnp.asarray(
            (np.arange(n)[None, :] < np.array([[30], [37]])).astype(bool)
        )[:, None, None, :]
        ref = dot_product_attention(q, k, v, key_mask, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = fused_dot_product_attention(q, k, v, key_mask, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


class TestBackward:
    def test_p0_grads_match_autodiff(self, qkv):
        q, k, v = qkv
        mask = _mask([T, 100])
        sm = float(1.0 / np.sqrt(D))

        def loss_fused(q, k, v):
            o = fused_attention(q, k, v, mask, jnp.int32(0), 0.0, sm)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = _xla_ref(q, k, v, mask)
            return jnp.sum(o * o)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
                err_msg=name,
            )


class TestPackedEval:
    """fused_attention_eval (packed (B, N, H*D) layout, delayed
    normalization): matches the fp32 XLA softmax within bf16-probs
    tolerance, incl. ragged N (query rows padded to 8, keys to 128) and
    key masks."""

    def _check(self, n, with_mask):
        b, h, d = 2, 3, 64
        rng = np.random.default_rng(3)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        )
        q, k, v = mk(), mk(), mk()
        mask = None
        if with_mask:
            valid = np.ones((b, n), np.float32)
            valid[0, n - 5 :] = 0.0
            mask = jnp.asarray(valid)[:, None, None, :].astype(bool)
        ref = dot_product_attention(q, k, v, mask, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = packed_dot_product_attention(q, k, v, mask, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_aligned(self):
        self._check(128, with_mask=False)

    def test_ragged_hubert_like(self):
        self._check(99, with_mask=False)

    def test_key_mask(self):
        self._check(40, with_mask=True)


class TestPackedTrain:
    """fused_attention_packed (training kernel, packed layout): p=0
    forward and custom-VJP grads match the XLA fp32 reference; dropout
    paths run on the real chip (interpret-mode PRNG unimplemented)."""

    def _tensors(self, n=99):
        b, h, d = 2, 3, 64
        rng = np.random.default_rng(5)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        )
        return mk(), mk(), mk()

    def test_p0_matches_xla(self):
        from triad_tpu.models.layers import (
            fused_packed_dot_product_attention,
        )

        q, k, v = self._tensors()
        ref = dot_product_attention(q, k, v, None, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = fused_packed_dot_product_attention(
                q, k, v, None, jnp.float32
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_p0_grads_match_autodiff(self):
        from triad_tpu.models.layers import (
            fused_packed_dot_product_attention,
        )

        q, k, v = self._tensors()

        def loss_fused(q, k, v):
            o = fused_packed_dot_product_attention(q, k, v, None, jnp.float32)
            return jnp.sum(o * o)

        def loss_ref(q, k, v):
            o = dot_product_attention(q, k, v, None, jnp.float32)
            return jnp.sum(o * o)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
                err_msg=name,
            )
