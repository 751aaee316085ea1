"""Direct tests for ops/pallas_conv.py (CPU interpret mode): the fused
stride-2 conv kernel and the tiled activation kernel against the XLA
reference composition, across kernel widths, prologues, and awkward
(prime) lengths that exercise the aligned-clamp/overlap-write scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_conv import (
    _reference,
    align8,
    fused_frontend_conv,
    min_input_alloc,
    out_rows,
    pallas_activation,
)


def _mk(b, t_alloc, c, cout, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t_alloc, c)).astype(np.float32) * 0.4)
    w = jnp.asarray(
        rng.normal(size=(k, c, cout)).astype(np.float32) * 0.1
    )
    mean = jnp.asarray(rng.normal(size=(b, 1, c)).astype(np.float32) * 0.2)
    rstd = jnp.asarray(
        (rng.uniform(0.5, 2.0, size=(b, 1, c))).astype(np.float32)
    )
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) + 1.0)
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    return x, w, mean, rstd, scale, bias


class TestFusedFrontendConv:
    @pytest.mark.parametrize("k", [2, 3])
    @pytest.mark.parametrize("prologue", [None, "gelu", "norm_gelu"])
    @pytest.mark.parametrize("t_logical", [97, 199])
    def test_matches_reference(self, k, prologue, t_logical):
        t_out = out_rows(t_logical, k)
        t_alloc = max(min_input_alloc(t_logical, k), t_logical + 8)
        x, w, mean, rstd, scale, bias = _mk(2, t_alloc, 16, 24, k)
        with pltpu.force_tpu_interpret_mode():
            y = fused_frontend_conv(
                x, w, mean, rstd, scale, bias, t_logical, prologue, 64
            )
        ref = _reference(x, w, t_logical, prologue, mean, rstd, scale, bias)
        assert y.shape[1] >= align8(t_out)
        np.testing.assert_allclose(
            np.asarray(y[:, :t_out]), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_vjp_matches_reference(self):
        k, t_logical = 3, 101
        t_out = out_rows(t_logical, k)
        t_alloc = max(min_input_alloc(t_logical, k), t_logical + 8)
        x, w, mean, rstd, scale, bias = _mk(2, t_alloc, 16, 16, k, seed=5)

        def loss_fused(x, w):
            with pltpu.force_tpu_interpret_mode():
                y = fused_frontend_conv(
                    x, w, mean, rstd, scale, bias, t_logical, "gelu", 64
                )
            return jnp.sum(y[:, :t_out] ** 2)

        def loss_ref(x, w):
            return jnp.sum(
                _reference(x, w, t_logical, "gelu", mean, rstd, scale, bias)
                ** 2
            )

        gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(
            np.asarray(gx_f), np.asarray(gx_r), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-5
        )


class TestPallasActivation:
    @pytest.mark.parametrize("act", ["gelu", "norm_gelu"])
    def test_matches_reference_with_edge_blocks(self, act):
        # t=71 with tblk=16 leaves a ragged edge block
        x, _, mean, rstd, scale, bias = _mk(3, 71, 16, 16, 2, seed=7)
        with pltpu.force_tpu_interpret_mode():
            y = pallas_activation(x, mean, rstd, scale, bias, act, 16)
        from triad_tpu.ops.pallas_conv import _act_reference

        ref = _act_reference(x, mean, rstd, scale, bias, act)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_vjp(self):
        x, _, mean, rstd, scale, bias = _mk(2, 33, 16, 16, 2, seed=9)

        def loss_fused(x, scale, bias):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(
                    pallas_activation(x, mean, rstd, scale, bias, "norm_gelu", 16)
                    ** 2
                )

        from triad_tpu.ops.pallas_conv import _act_reference

        def loss_ref(x, scale, bias):
            return jnp.sum(
                _act_reference(x, mean, rstd, scale, bias, "norm_gelu") ** 2
            )

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b, n in zip(g_f, g_r, ["x", "scale", "bias"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=n
            )
