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

    def _check(self, n, with_mask, pad="hbm"):
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
            out = packed_dot_product_attention(
                q, k, v, mask, jnp.float32, pad=pad
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_aligned(self):
        self._check(128, with_mask=False)

    def test_ragged_hubert_like(self):
        self._check(99, with_mask=False)

    def test_key_mask(self):
        self._check(40, with_mask=True)

    def test_pad_none_ragged(self):
        """pad="none": the ragged token dim goes straight to the kernel
        (no HBM pad copies, no output slice). Same math."""
        self._check(99, with_mask=False, pad="none")
        self._check(40, with_mask=True, pad="none")


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

    def test_p0_pad_none_forward_and_grads(self):
        """pad="none": ragged N straight into the training kernel —
        forward AND custom-VJP grads match the XLA reference (no HBM
        pad copies around either pass)."""
        from triad_tpu.models.layers import (
            fused_packed_dot_product_attention,
        )

        q, k, v = self._tensors()
        fused = lambda q, k, v: fused_packed_dot_product_attention(
            q, k, v, None, jnp.float32, pad="none"
        )
        ref = lambda q, k, v: dot_product_attention(
            q, k, v, None, jnp.float32
        )
        loss = lambda fn: (lambda q, k, v: jnp.sum(fn(q, k, v) ** 2))
        with pltpu.force_tpu_interpret_mode():
            out = fused(q, k, v)
            g_fused = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref(q, k, v)), rtol=2e-5, atol=2e-5
        )
        g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
                err_msg=name,
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


class TestMergedQkv:
    """Merged-qkv kernels (one (B, N, 3*H*D) tensor, q/k/v read at lane
    offsets in-kernel): eval and p=0 training forwards match the XLA
    fp32 reference, the custom VJP's merged d(qkv) matches autodiff,
    and the HubertSelfAttention module produces the same output and
    param tree under attention_impl="packed_merged" as under "xla".
    Dropout replay (fwd determinism + bwd mask replay) cannot run here
    (interpret-mode PRNG unimplemented) — it is check 5 of
    scripts/tpu_attention_check.py on the real chip. Note merged and
    unmerged kernels draw bits in the same order but produce identical
    masks only at equal padded query counts (pallas_attention.py merged
    section comment)."""

    def _tensors(self, n=99):
        b, h, d = 2, 3, 64
        rng = np.random.default_rng(7)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        )
        return mk(), mk(), mk()

    @staticmethod
    def _merge(q, k, v):
        b, n, h, d = q.shape
        flat = lambda x: x.reshape(b, n, h * d)
        return jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)

    def test_eval_matches_xla(self):
        from triad_tpu.models.layers import (
            merged_packed_dot_product_attention,
        )

        q, k, v = self._tensors()
        b, n, h, d = q.shape
        valid = np.ones((b, n), np.float32)
        valid[0, n - 7:] = 0.0
        mask4 = jnp.asarray(valid)[:, None, None, :].astype(bool)
        ref = dot_product_attention(q, k, v, mask4, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = merged_packed_dot_product_attention(
                self._merge(q, k, v), jnp.asarray(valid), jnp.float32, d
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
            rtol=2e-5, atol=2e-5,
        )

    def test_eval_pad_none_matches_xla(self):
        from triad_tpu.models.layers import (
            merged_packed_dot_product_attention,
        )

        q, k, v = self._tensors()
        b, n, h, d = q.shape
        valid = np.ones((b, n), np.float32)
        valid[0, n - 7:] = 0.0
        mask4 = jnp.asarray(valid)[:, None, None, :].astype(bool)
        ref = dot_product_attention(q, k, v, mask4, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = merged_packed_dot_product_attention(
                self._merge(q, k, v), jnp.asarray(valid), jnp.float32, d,
                pad="none",
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
            rtol=2e-5, atol=2e-5,
        )

    def test_train_p0_grads_match_autodiff(self):
        from triad_tpu.ops.pallas_attention import (
            fused_attention_packed_merged,
        )

        q, k, v = self._tensors(n=128)
        b, n, h, d = q.shape
        qkv = self._merge(q, k, v)
        mask = jnp.ones((b, n), jnp.float32)
        sm = float(1.0 / np.sqrt(d))

        def loss_merged(qkv):
            o = fused_attention_packed_merged(
                qkv, mask, jnp.int32(0), 0.0, sm
            )
            return jnp.sum(o * o)

        def loss_ref(qkv):
            qr, kr, vr = [
                qkv[..., i * h * d:(i + 1) * h * d].reshape(b, n, h, d)
                for i in range(3)
            ]
            o = dot_product_attention(qr, kr, vr, None, jnp.float32)
            return jnp.sum(o.reshape(b, n, h * d) * o.reshape(b, n, h * d))

        with pltpu.force_tpu_interpret_mode():
            out = fused_attention_packed_merged(
                qkv, mask, jnp.int32(0), 0.0, sm
            )
            g_merged = jax.grad(loss_merged)(qkv)
        ref_o = loss_ref(qkv)
        np.testing.assert_allclose(
            float(jnp.sum(out * out)), float(ref_o), rtol=2e-5
        )
        g_ref = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(
            np.asarray(g_merged), np.asarray(g_ref), rtol=2e-4, atol=2e-4
        )

    def test_hubert_module_param_tree_and_output(self):
        import dataclasses

        from triad_tpu.core.config import HubertConfig
        from triad_tpu.models.hubert import HubertSelfAttention

        base = HubertConfig(hidden_size=128, num_heads=2, num_layers=1)
        x = jnp.asarray(
            np.random.default_rng(11).normal(size=(2, 99, 128)).astype(
                np.float32
            ) * 0.3
        )
        mod_xla = HubertSelfAttention(
            dataclasses.replace(base, attention_impl="xla")
        )
        params = mod_xla.init(jax.random.PRNGKey(0), x)
        ref = mod_xla.apply(params, x, deterministic=True)
        mod_merged = HubertSelfAttention(
            dataclasses.replace(base, attention_impl="packed_merged")
        )
        # Same param tree: the xla-path params apply unchanged.
        with pltpu.force_tpu_interpret_mode():
            out = mod_merged.apply(params, x, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
        with pltpu.force_tpu_interpret_mode():
            merged_init = jax.tree.map(
                lambda a: a.shape,
                mod_merged.init(jax.random.PRNGKey(0), x),
            )
        xla_init = jax.tree.map(lambda a: a.shape, params)
        assert merged_init == xla_init

    def test_vit_module_merged_matches_xla_and_grads(self):
        """ViTAttention under attention_impl="packed_merged" (eval
        kernel) and "fused_packed_merged" (p=0 train kernel + merged
        d(qkv) VJP) matches the xla path's outputs — same params, same
        LoRA adapters — and the train-kernel variant's gradients match
        autodiff through the xla path (the DINOv2 LoRA trains through
        attention even though it has no attention dropout)."""
        import dataclasses

        from triad_tpu.core.config import ViTConfig
        from triad_tpu.models.vit import ViTAttention

        base = ViTConfig(hidden_size=128, num_heads=2, num_layers=1,
                         lora_rank=4)
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 50, 128)).astype(
                np.float32
            ) * 0.3
        )
        mod_xla = ViTAttention(dataclasses.replace(base, attention_impl="xla"))
        params = mod_xla.init(jax.random.PRNGKey(0), x)
        # Non-zero LoRA B factors so the adapter path is live.
        params = jax.tree.map(
            lambda a: a + 0.01 if a.ndim == 2 and 4 in a.shape else a, params
        )
        ref = mod_xla.apply(params, x)
        for impl in ("packed_merged", "fused_packed_merged"):
            mod = ViTAttention(dataclasses.replace(base, attention_impl=impl))
            with pltpu.force_tpu_interpret_mode():
                out = mod.apply(params, x)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=impl,
            )

        def loss(mod):
            return lambda p: jnp.sum(mod.apply(p, x) ** 2)

        g_ref = jax.grad(loss(mod_xla))(params)
        mod_tr = ViTAttention(
            dataclasses.replace(base, attention_impl="fused_packed_merged")
        )
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss(mod_tr))(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat = dict(jax.tree_util.tree_leaves_with_path(g))
        for path, a_ref in flat_ref:
            np.testing.assert_allclose(
                np.asarray(flat[path]), np.asarray(a_ref),
                rtol=2e-4, atol=2e-4, err_msg=str(path),
            )


class TestGuards:
    """Misconfiguration must raise, not silently fall back or
    mis-compute: impl strings arrive from env-var A/B knobs, and a typo
    falling through to XLA would mislabel a hardware measurement."""

    def test_unknown_impl_raises(self):
        q = jnp.zeros((1, 8, 2, 64), jnp.float32)
        with pytest.raises(ValueError, match="unknown attention impl"):
            dot_product_attention(
                q, q, q, None, jnp.float32, impl="packed_mergd"
            )

    def test_merged_head_dim_guard(self):
        from triad_tpu.models.layers import (
            merged_packed_dot_product_attention,
        )

        qkv = jnp.zeros((1, 8, 3 * 4 * 32), jnp.float32)
        with pytest.raises(ValueError, match="head_dim == 64"):
            merged_packed_dot_product_attention(qkv, None, jnp.float32, 32)

    def test_merged_qkv_rejects_int8_interception(self):
        import dataclasses

        from triad_tpu.core.config import HubertConfig
        from triad_tpu.models.hubert import HubertSelfAttention
        from triad_tpu.models.quantize import int8_interception

        cfg = HubertConfig(
            hidden_size=128, num_heads=2, num_layers=1,
            attention_impl="packed_merged",
        )
        mod = HubertSelfAttention(cfg)
        x = jnp.zeros((1, 8, 128), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            params = mod.init(jax.random.PRNGKey(0), x)
            with int8_interception():
                with pytest.raises(ValueError, match="int8"):
                    mod.apply(params, x, deterministic=True)


class TestPairEval:
    """Head-PAIR block-diagonal eval kernels (fused_attention_eval_pair
    / fused_attention_eval_merged_pair): two 64-wide heads per 128-lane
    window, one full-depth (128) S matmul + one contraction-2Nk PV
    matmul per pair, softmax denominators computed on the MXU against a
    block mask. Must match the fp32 XLA softmax within the same
    tolerance as the single-head eval kernels, including ragged N, key
    masks, and an ODD head count (last head takes the single-head
    path)."""

    def _check_packed(self, n, h, with_mask):
        b, d = 2, 64
        rng = np.random.default_rng(11)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        )
        q, k, v = mk(), mk(), mk()
        mask = None
        if with_mask:
            valid = np.ones((b, n), np.float32)
            valid[0, n - 5:] = 0.0
            mask = jnp.asarray(valid)[:, None, None, :].astype(bool)
        ref = dot_product_attention(q, k, v, mask, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = packed_dot_product_attention(
                q, k, v, mask, jnp.float32, pair=True
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_aligned_even_heads(self):
        self._check_packed(128, 4, with_mask=False)

    def test_ragged_odd_heads(self):
        self._check_packed(99, 3, with_mask=False)

    def test_key_mask(self):
        self._check_packed(40, 2, with_mask=True)

    def test_impl_string_dispatch(self):
        # "packed_pair" through the generic dot_product_attention entry
        # (the TRIAD_BENCH_*_ATTN A/B route).
        b, n, h, d = 2, 72, 2, 64
        rng = np.random.default_rng(12)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        )
        q, k, v = mk(), mk(), mk()
        ref = dot_product_attention(q, k, v, None, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = dot_product_attention(
                q, k, v, None, jnp.float32, impl="packed_pair"
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_head_dim_guard(self):
        q = jnp.zeros((1, 8, 2, 32), jnp.float32)
        with pytest.raises(ValueError, match="head_dim 64"):
            packed_dot_product_attention(
                q, q, q, None, jnp.float32, pair=True
            )

    def test_merged_pair_matches_xla(self):
        from triad_tpu.models.layers import (
            merged_packed_dot_product_attention,
        )

        b, n, h, d = 2, 99, 3, 64
        rng = np.random.default_rng(13)
        mk = lambda: jnp.asarray(
            rng.normal(size=(b, n, h, d)).astype(np.float32) * 0.3
        )
        q, k, v = mk(), mk(), mk()
        valid = np.ones((b, n), np.float32)
        valid[0, n - 7:] = 0.0
        mask4 = jnp.asarray(valid)[:, None, None, :].astype(bool)
        ref = dot_product_attention(q, k, v, mask4, jnp.float32)
        flat = lambda x: x.reshape(b, n, h * d)
        qkv = jnp.concatenate([flat(q), flat(k), flat(v)], axis=-1)
        with pltpu.force_tpu_interpret_mode():
            out = merged_packed_dot_product_attention(
                qkv, jnp.asarray(valid), jnp.float32, d, pair=True
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
            rtol=2e-5, atol=2e-5,
        )
