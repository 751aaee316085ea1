"""Pallas fused max-mean kernel vs the XLA dense implementation:
values (clip sims + nonneg sums) and gradients (first-argmax routing,
clamp window, temperature), with and without query masks, including
non-128-aligned Nq (internal padding). Runs in interpreter mode on CPU;
the real-TPU path is exercised by bench.py and the TPU drive script."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.core.config import LossConfig
from triad_tpu.ops import av_loss, tv_loss
from triad_tpu.ops.similarity import aggregate_crossbatch

BQ, BK, NQ, NK, D = 4, 4, 200, 128, 128
TEMP = 1.5


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(BQ, NQ, D)).astype(np.float32) * 0.3
    k = rng.normal(size=(BK, NK, D)).astype(np.float32) * 0.3
    lengths = rng.integers(5, NQ + 1, size=BQ)
    mask = (np.arange(NQ)[None] < lengths[:, None]).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(mask)


def _agg(impl, q, k, mask=None):
    return aggregate_crossbatch(
        q, k, jnp.float32(TEMP), clamp_min=-60.0, query_mask=mask,
        implementation=impl,
    )


class TestForward:
    def test_unmasked_matches_dense(self, feats):
        q, k, _ = feats
        with pltpu.force_tpu_interpret_mode():
            ours = _agg("pallas", q, k)
        ref = _agg("dense", q, k)
        np.testing.assert_allclose(ours.clip_sims, ref.clip_sims, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            ours.nonneg_sq_sum, ref.nonneg_sq_sum, rtol=1e-5
        )
        np.testing.assert_allclose(ours.volume_numel, ref.volume_numel)

    def test_masked_matches_dense(self, feats):
        q, k, mask = feats
        with pltpu.force_tpu_interpret_mode():
            ours = _agg("pallas", q, k, mask)
        ref = _agg("dense", q, k, mask)
        np.testing.assert_allclose(ours.clip_sims, ref.clip_sims, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            ours.nonneg_sq_sum, ref.nonneg_sq_sum, rtol=1e-5
        )

    def test_rejects_unaligned_nk(self, feats):
        q, k, _ = feats
        with pytest.raises(ValueError):
            _agg("pallas", q, k[:, :100])


@pytest.mark.slow
class TestGradients:
    def test_av_loss_grads_match_dense(self, feats):
        q, k, _ = feats

        def loss(impl):
            def f(q, k, t):
                return av_loss(q, k, t, LossConfig(implementation=impl)).total

            return f

        args = (q, k, jnp.float32(TEMP))
        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(*args)
        gd = jax.grad(loss("dense"), argnums=(0, 1, 2))(*args)
        for a, b, name in zip(gp, gd, "qkt"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"grad {name}",
            )

    def test_tv_loss_grads_match_dense(self, feats):
        q, k, mask = feats

        def loss(impl):
            def f(q, k, t):
                return tv_loss(q, k, mask, t, LossConfig(implementation=impl)).total

            return f

        args = (q, k, jnp.float32(TEMP))
        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(*args)
        gd = jax.grad(loss("dense"), argnums=(0, 1, 2))(*args)
        for a, b, name in zip(gp, gd, "qkt"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=f"grad {name}",
            )
