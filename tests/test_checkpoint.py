"""Checkpoint manager tests: latest/best, metadata roundtrip, config
mismatch warnings (reference train.py:382-525 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triad_tpu.train.checkpoint import (
    CheckpointManager,
    HostProgress,
    warn_on_config_mismatch,
)


@pytest.fixture
def state():
    return {
        "params": {"w": jnp.arange(4.0), "temperature": jnp.asarray(1.5)},
        "step": jnp.asarray(3),
    }


def test_save_restore_latest(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path))
    prog = HostProgress(epoch=1, global_step=10, current_batch_idx=2,
                        dataset_segment=5, best_loss=3.5)
    mgr.save(10, state, prog, {"a": 1}, extra={"note": "x"})
    assert mgr.latest_step() == 10
    restored, p2, cfg, extra = mgr.restore(state)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert p2.epoch == 1 and p2.current_batch_idx == 2 and p2.dataset_segment == 5
    assert cfg == {"a": 1} and extra == {"note": "x"}


def test_best_kept_separately(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    prog = HostProgress(global_step=1, best_loss=5.0)
    mgr.save(1, state, prog, {}, is_best=True)
    # later (worse) checkpoints must not clobber best
    state2 = jax.tree.map(lambda x: x + 1, state)
    mgr.save(2, state2, HostProgress(global_step=2), {})
    mgr.save(3, state2, HostProgress(global_step=3), {})
    best, bp, _ = mgr.restore_best(state)
    np.testing.assert_array_equal(
        np.asarray(best["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert bp.best_loss == 5.0


def test_max_to_keep_gc(tmp_path, state):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, state, HostProgress(global_step=s), {})
    assert mgr.latest_step() == 3
    with pytest.raises(Exception):
        mgr.restore(state, step=1)  # garbage-collected


def test_config_mismatch_warning():
    msgs = []
    warn_on_config_mismatch({"a": 1, "b": 2}, {"a": 1, "b": 3, "c": 4},
                            logger=msgs.append)
    joined = " ".join(msgs)
    assert "'b'" in joined and "'c'" in joined and "'a'" not in joined
