"""Distributed-loss tests on the 8-device CPU mesh: the sharded
computation must equal the single-device global computation (values,
stats, and gradients) — SURVEY §2.6 / §4 multi-device test requirement."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from triad_tpu.core.config import LossConfig
from triad_tpu.ops import av_loss, tv_loss
from triad_tpu.parallel import distributed_av_loss, distributed_tv_loss, make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

B, NA, NT, NV, D = 16, 23, 12, 9, 16
TEMP = 1.5


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def feats(mesh):
    rng = np.random.default_rng(0)
    shard = lambda x: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("data"))
    )
    audio = rng.normal(size=(B, NA, D)).astype(np.float32) * 0.4
    text = rng.normal(size=(B, NT, D)).astype(np.float32) * 0.4
    visual = rng.normal(size=(B, NV, D)).astype(np.float32) * 0.4
    lengths = rng.integers(2, NT + 1, size=B)
    mask = (np.arange(NT)[None] < lengths[:, None]).astype(np.float32)
    return {
        "audio_np": audio, "text_np": text, "visual_np": visual, "mask_np": mask,
        "audio": shard(audio), "text": shard(text), "visual": shard(visual),
        "mask": shard(mask),
    }


class TestDistributedAV:
    def test_matches_single_device(self, mesh, feats):
        cfg = LossConfig(implementation="chunked", chunk_size=4)
        dist = jax.jit(
            lambda a, v, t: distributed_av_loss(a, v, t, cfg, mesh)
        )(feats["audio"], feats["visual"], jnp.float32(TEMP))
        ref = av_loss(
            jnp.asarray(feats["audio_np"]), jnp.asarray(feats["visual_np"]),
            jnp.float32(TEMP), LossConfig(implementation="dense"),
        )
        np.testing.assert_allclose(dist.total, ref.total, rtol=1e-5)
        np.testing.assert_allclose(dist.contrastive, ref.contrastive, rtol=1e-5)
        np.testing.assert_allclose(dist.reg, ref.reg, rtol=1e-5)
        np.testing.assert_allclose(dist.smooth, ref.smooth, rtol=1e-4, atol=1e-8)
        for k in ref.stats:
            np.testing.assert_allclose(
                dist.stats[k], ref.stats[k], rtol=1e-4, atol=1e-6,
                err_msg=k,
            )

    def test_gradients_match_single_device(self, mesh, feats):
        cfg = LossConfig(implementation="chunked", chunk_size=4)

        def dist_loss(a, v, t):
            return distributed_av_loss(a, v, t, cfg, mesh).total

        def ref_loss(a, v, t):
            return av_loss(a, v, t, LossConfig(implementation="dense")).total

        ga = jax.jit(jax.grad(dist_loss, argnums=(0, 1, 2)))(
            feats["audio"], feats["visual"], jnp.float32(TEMP)
        )
        gr = jax.grad(ref_loss, argnums=(0, 1, 2))(
            jnp.asarray(feats["audio_np"]), jnp.asarray(feats["visual_np"]),
            jnp.float32(TEMP),
        )
        for a, b in zip(ga, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
            )


class TestDistributedTV:
    def test_matches_single_device(self, mesh, feats):
        cfg = LossConfig(implementation="chunked", chunk_size=4)
        dist = jax.jit(
            lambda te, v, m, t: distributed_tv_loss(te, v, m, t, cfg, mesh)
        )(feats["text"], feats["visual"], feats["mask"], jnp.float32(TEMP))
        ref = tv_loss(
            jnp.asarray(feats["text_np"]), jnp.asarray(feats["visual_np"]),
            jnp.asarray(feats["mask_np"]), jnp.float32(TEMP),
            LossConfig(implementation="dense"),
        )
        np.testing.assert_allclose(dist.total, ref.total, rtol=1e-5)
        np.testing.assert_allclose(dist.reg, ref.reg, rtol=1e-5)
        for k in ref.stats:
            np.testing.assert_allclose(
                dist.stats[k], ref.stats[k], rtol=1e-4, atol=1e-6, err_msg=k
            )
