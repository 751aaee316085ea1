"""Trainer on an 8-device DP mesh (synthetic data): trains end-to-end
with the all-gathered-negatives losses — BASELINE config 5's structure
on the virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest
import jax

from triad_tpu.core.config import MeshConfig
from tests.test_trainer import tiny_config

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)]


def test_dp_trainer_end_to_end(tmp_path):
    from triad_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshConfig(num_devices=8),
        data=dataclasses.replace(
            cfg.data, batch_size_av=8, batch_size_tv=8,
            synthetic_av_size=16, synthetic_tv_size=16,
        ),
    )
    trainer = Trainer(cfg, force_new_training=True)
    assert trainer.mesh is not None
    trainer.train()
    assert trainer.ckpt.latest_step() == 3
    assert np.isfinite(float(trainer.state.params["temperature"]))


def test_dp_rejects_indivisible_batch(tmp_path):
    from triad_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path / "bad")
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshConfig(num_devices=8),
        data=dataclasses.replace(cfg.data, batch_size_av=6),
    )
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(cfg, force_new_training=True)


def test_multislice_dp_trainer(tmp_path):
    """2 slices x 4 chips (virtual): batch shards over (replica, data),
    negatives gather across both axes — trains end-to-end."""
    from triad_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshConfig(num_devices=8, num_slices=2),
        data=dataclasses.replace(
            cfg.data, batch_size_av=8, batch_size_tv=8,
            synthetic_av_size=16, synthetic_tv_size=16,
        ),
    )
    trainer = Trainer(cfg, force_new_training=True)
    assert trainer.mesh is not None and trainer.mesh.shape["replica"] == 2
    trainer.train()
    assert np.isfinite(float(trainer.state.params["temperature"]))
