"""Fused pallas positional grouped conv (ops/pallas_posconv.py) — CPU
interpret-mode parity vs the XLA grouped conv + trim + GELU composition
(PositionalConvEmbedding semantics), forward and gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from triad_tpu.ops.pallas_posconv import pos_conv_gelu


def _ref(x, w, b, groups, k):
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(1,), padding=[(k // 2, k // 2)],
        feature_group_count=groups,
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + b.astype(jnp.float32)
    if k % 2 == 0:
        h = h[:, :-1]
    return jax.nn.gelu(h, approximate=False)


def _inputs(B=2, N=37, C=64, G=4, K=16, seed=0):
    rng = np.random.default_rng(seed)
    cpg = C // G
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32) * 0.5)
    w = jnp.asarray(
        (rng.normal(size=(K, cpg, C)) * (1.0 / (K * cpg)) ** 0.5).astype(
            np.float32
        )
    )
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
    return x, w, b


class TestForward:
    @pytest.mark.parametrize(
        "B,N,C,G,K",
        [
            (2, 37, 64, 4, 16),   # ragged N, even K (trim path)
            (1, 40, 64, 8, 8),    # aligned N, minimal K
            (2, 21, 128, 4, 24),  # K > N (window wider than sequence)
        ],
    )
    def test_matches_xla(self, B, N, C, G, K):
        x, w, b = _inputs(B, N, C, G, K)
        ref = np.asarray(_ref(x, w, b, G, K))
        got = np.asarray(pos_conv_gelu(x, w, b, G, "erf", True))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-4)

    def test_hubert_geometry_slice(self):
        # the production geometry scaled down in N only: K=128, G=16,
        # C=768 (CPG=48) on a short sequence.
        x, w, b = _inputs(B=1, N=24, C=768, G=16, K=128, seed=3)
        ref = np.asarray(_ref(x, w, b, 16, 128))
        got = np.asarray(pos_conv_gelu(x, w, b, 16, "erf", True))
        np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-4)

    def test_bf16_bitcast_roll_path(self):
        # 16-bit inputs take the _lane_roll int32-bitcast route (two
        # sublane-adjacent bf16 elements per packed int32 lane element)
        # — pin it against the f32 route at the production group shape.
        x, w, b = _inputs(B=1, N=24, C=768, G=16, K=128, seed=4)
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        ref = np.asarray(
            pos_conv_gelu(x, w, b, 16, "erf", True), np.float32
        )
        got = np.asarray(
            pos_conv_gelu(xb, wb, b, 16, "erf", True), np.float32
        )
        scale = float(np.abs(ref).max())
        assert float(np.abs(got - ref).max()) < 0.03 * scale

        # and the bwd bf16 path (dW kernel rolls bf16 x)
        def loss(fx, fw):
            return jnp.sum(
                pos_conv_gelu(fx, fw, b, 16, "erf", True).astype(
                    jnp.float32
                ) ** 2
            )

        gw_ref = np.asarray(
            jax.grad(loss, argnums=1)(x, w), np.float32
        )
        gw_got = np.asarray(
            jax.grad(loss, argnums=1)(xb, wb), np.float32
        )
        rel = np.abs(gw_got - gw_ref).max() / (
            np.abs(gw_ref).max() + 1e-9
        )
        assert rel < 0.05, rel


@pytest.mark.slow
class TestGradients:
    def test_grads_match_xla(self):
        x, w, b = _inputs(B=2, N=37, C=64, G=4, K=16, seed=1)
        rng = np.random.default_rng(2)
        r = jnp.asarray(
            rng.normal(size=(2, 37, 64)).astype(np.float32)
        )

        def loss_ref(x, w, b):
            return jnp.sum(_ref(x, w, b, 4, 16) * r)

        def loss_got(x, w, b):
            return jnp.sum(
                pos_conv_gelu(x, w, b, 4, "erf", True).astype(jnp.float32)
                * r
            )

        gref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        ggot = jax.grad(loss_got, argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(ggot, gref, ("dx", "dw", "db")):
            scale = max(float(np.abs(np.asarray(e)).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(e), atol=2e-4 * scale,
                rtol=2e-4, err_msg=name,
            )
