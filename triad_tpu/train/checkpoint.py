"""Orbax checkpointing with the reference's resume-exactness contract.

The reference persists a monolithic torch dict (train.py:398-437): model,
4 optimizers + schedulers + per-group step counters, epoch / global step
/ mid-epoch batch offset, dataset segment, full RNG state, best loss,
config, and cached viz samples; autoresume picks the latest by filename
parse (train.py:382-396) and restores everything, then fast-forwards the
dataloaders batch-by-batch (train.py:914-926).

TPU-native equivalent:
  * the whole ``TrainState`` pytree (params, 4-group AdamW moments +
    schedule counts, grad accumulator, global step, PRNG key) saved with
    Orbax — one atomic, sharded-aware save;
  * host-side progress (epoch, batch cursor, dataset segment, best loss,
    config, phase info) rides along as a JSON-able metadata tree;
  * data-order exactness needs no RNG blob: loaders derive their
    permutation from (seed, epoch) and jump to the batch cursor in O(1)
    (triad_tpu.data.pipeline), replacing the reference's
    torch/cuda/numpy/python RNG snapshot with a deterministic cursor;
  * ``latest`` via CheckpointManager steps; ``best`` tracked in metadata
    and kept from garbage collection (best-model semantics,
    train.py:434-437, 1137-1140).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


@dataclasses.dataclass
class HostProgress:
    """Host-side training cursor (reference train.py:469-473)."""

    epoch: int = 0
    global_step: int = 0
    current_batch_idx: int = 0
    dataset_segment: int = 0
    best_loss: float = float("inf")

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "HostProgress":
        return cls(**d)


class CheckpointManager:
    """Latest/best checkpoint management for TrainState + host progress.

    State and host metadata ride ONE atomic Orbax save
    (``args.Composite(state=..., meta=JsonSave(...))``): there is no
    window where a crash leaves array data without its metadata (the
    previous layout wrote a separate host_meta.json after the save).
    Reading the old split layout is still supported.

    ``async_save=True`` returns from ``save`` as soon as the arrays are
    snapshotted to host (Orbax async checkpointing) — the train loop
    overlaps the filesystem write with the next steps; every read path
    (restore / latest_step callers) and ``close`` drain in-flight saves
    first.
    """

    def __init__(
        self, directory: str, max_to_keep: int = 3, async_save: bool = False
    ):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.async_save = async_save
        self._mgr = ocp.CheckpointManager(
            self.directory / "ckpts",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                best_fn=None,
                enable_async_checkpointing=async_save,
            ),
        )
        self._best_dir = self.directory / "best"
        self._legacy_meta_path = lambda step: (
            self.directory / "ckpts" / str(step) / "host_meta.json"
        )

    # -- save -----------------------------------------------------------

    def save(
        self,
        step: int,
        train_state: Any,
        progress: HostProgress,
        config_dict: Dict[str, Any],
        extra: Optional[Dict[str, Any]] = None,
        is_best: bool = False,
    ) -> None:
        meta = {
            "progress": progress.to_dict(),
            "config": config_dict,
            "extra": extra or {},
        }
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(train_state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        if not self.async_save:
            self._mgr.wait_until_finished()
        if is_best:
            self._save_best(train_state, meta)

    def _save_best(self, train_state: Any, meta: Dict[str, Any]) -> None:
        import shutil

        if jax.process_index() == 0 and self._best_dir.exists():
            shutil.rmtree(self._best_dir)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("triad_best_dir_cleared")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(self._best_dir / "state", train_state)
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            (self._best_dir / "host_meta.json").write_text(
                json.dumps(meta, indent=2)
            )

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed — call
        before process exit so the writer's thread pool never races
        interpreter shutdown."""
        self._mgr.wait_until_finished()

    # -- restore --------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def _read_meta(self, step: int) -> Dict[str, Any]:
        legacy = self._legacy_meta_path(step)
        if legacy.exists():
            return json.loads(legacy.read_text())
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
        )
        return restored["meta"]

    def restore(
        self, abstract_state: Any, step: Optional[int] = None
    ) -> Tuple[Any, HostProgress, Dict[str, Any], Dict[str, Any]]:
        """Returns (train_state, progress, config_dict, extra).

        ``abstract_state`` is a shape/dtype/sharding skeleton of the
        TrainState (e.g. jax.eval_shape of the init fn, or a live state).
        """
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self._legacy_meta_path(step).exists():
            # old split layout: bare StandardSave + host_meta.json
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state)
            )
            meta = json.loads(self._legacy_meta_path(step).read_text())
        else:
            restored = self._mgr.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(abstract_state),
                    meta=ocp.args.JsonRestore(),
                ),
            )
            state, meta = restored["state"], restored["meta"]
        # Config travels inside the checkpoint (train.py:427, 475-498):
        # the caller compares against its live config and warns.
        return (
            state,
            HostProgress.from_dict(meta["progress"]),
            meta["config"],
            meta.get("extra", {}),
        )

    def restore_best(self, abstract_state: Any):
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(self._best_dir / "state", abstract_state)
        meta = json.loads((self._best_dir / "host_meta.json").read_text())
        return state, HostProgress.from_dict(meta["progress"]), meta["config"]

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def read_run_meta(run_dir: str) -> Dict[str, Any]:
    """Latest checkpoint's metadata (progress/config/extra) of a run
    directory, without constructing a TrainState — the CLI entry points'
    config-discovery path (infer/eval/export)."""
    mgr = CheckpointManager(str(Path(run_dir) / "checkpoints"))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}")
    try:
        return mgr._read_meta(step)
    finally:
        mgr.close()


def warn_on_config_mismatch(
    saved: Dict[str, Any], live: Dict[str, Any], logger=print
) -> None:
    """Phase/config mismatch warnings on resume (train.py:475-498)."""
    keys = set(saved) | set(live)
    for k in sorted(keys):
        if saved.get(k) != live.get(k):
            logger(
                f"WARNING: config mismatch on resume: {k!r} "
                f"checkpoint={saved.get(k)!r} current={live.get(k)!r}"
            )
