"""Multi-process data-parallel training smoke: 2 CPU processes x 4
virtual devices each == the single-process 8-device mesh.

Proves the multi-host enablement end to end through the PRODUCTION
Trainer (parallel/distributed.py + the loaders' process_shard row
slicing + Trainer._put's make_array_from_process_local_data): every
process runs the same deterministic samplers, decodes only its rows,
and the jitted DP step sees bitwise the same global batches as a
single-process run — so the final loss and parameters must match.

Parent mode (no TRIAD_PROCESS_ID in the env):
  1. runs the single-process 8-device reference in a subprocess,
  2. spawns 2 worker processes wired via TRIAD_COORDINATOR,
  3. asserts both workers' final loss/param-checksum match the
     reference within float tolerance.

Worker mode (TRIAD_PROCESS_ID set): train and print
``FINAL loss=<x> checksum=<y>``.

Run: python scripts/multiproc_smoke.py
(also run by tests/test_parallel.py::test_multiprocess_dp_matches_single_process)
"""

import os
import re
import socket
import subprocess
import sys
import tempfile

sys.path.insert(0, ".")

N_PROCESSES = 2
DEVICES_PER_PROCESS = 4


def worker() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from triad_tpu.core.config import MeshConfig
    from triad_tpu.parallel.distributed import initialize_from_env

    pid, pc = initialize_from_env()
    print(f"process {pid}/{pc} devices={jax.device_count()} "
          f"local={jax.local_device_count()}", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_trainer import tiny_config
    from triad_tpu.train.trainer import Trainer

    from pathlib import Path

    cfg = tiny_config(Path(os.environ["TRIAD_SMOKE_DIR"]))
    cfg = dataclasses.replace(
        cfg,
        mesh=MeshConfig(num_devices=8),
        data=dataclasses.replace(
            cfg.data, batch_size_av=8, batch_size_tv=8,
            synthetic_av_size=16, synthetic_tv_size=16,
        ),
    )
    trainer = Trainer(cfg, force_new_training=True)
    if pc > 1:
        assert trainer._proc_shard == (pid, pc), trainer._proc_shard
    trainer.train()
    # temperature + whole-tree checksum pin the final parameters; both
    # must match the single-process reference bit-for-bit-ish (the only
    # tolerated difference is collective reduction order).
    from triad_tpu.parallel.distributed import fetch

    temp = float(fetch(trainer.state.params["temperature"]))
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    checksum = float(sum(np.abs(fetch(l)).sum() for l in leaves))
    print(f"FINAL temp={temp:.8f} checksum={checksum:.6f}", flush=True)


def _spawn(env_extra, tag):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    )
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ), tag


def _final(output: str, tag: str):
    m = re.search(r"FINAL temp=([-\d.]+) checksum=([-\d.]+)", output)
    if not m:
        raise RuntimeError(f"{tag} produced no FINAL line:\n{output[-4000:]}")
    return float(m.group(1)), float(m.group(2))


def parent() -> None:
    # 1. single-process 8-device reference
    with tempfile.TemporaryDirectory() as ref_dir:
        p, _ = _spawn(
            {
                "TRIAD_SMOKE_DIR": ref_dir,
                "TRIAD_PROCESS_ID": "0",
                "TRIAD_NUM_PROCESSES": "1",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
            },
            "reference",
        )
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-4000:]
        ref_temp, ref_sum = _final(out, "reference")
        print(f"reference: temp={ref_temp:.8f} checksum={ref_sum:.6f}")

    # 2. two coordinated worker processes
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    with tempfile.TemporaryDirectory() as run_dir:
        procs = [
            _spawn(
                {
                    "TRIAD_SMOKE_DIR": run_dir,
                    "TRIAD_COORDINATOR": f"127.0.0.1:{port}",
                    "TRIAD_NUM_PROCESSES": str(N_PROCESSES),
                    "TRIAD_PROCESS_ID": str(i),
                },
                f"worker{i}",
            )
            for i in range(N_PROCESSES)
        ]
        results = []
        for p, tag in procs:
            out, _ = p.communicate(timeout=900)
            assert p.returncode == 0, f"{tag} rc={p.returncode}\n{out[-4000:]}"
            results.append(_final(out, tag))
            print(f"{tag}: temp={results[-1][0]:.8f} "
                  f"checksum={results[-1][1]:.6f}")

    for temp, chk in results:
        assert abs(temp - ref_temp) <= 1e-5 * max(1.0, abs(ref_temp)), (
            temp, ref_temp
        )
        assert abs(chk - ref_sum) <= 1e-4 * max(1.0, abs(ref_sum)), (
            chk, ref_sum
        )
    print("MULTIPROCESS SMOKE PASSED")


if __name__ == "__main__":
    if os.environ.get("TRIAD_PROCESS_ID") is not None:
        worker()
    else:
        parent()
