"""Multi-host (multi-process) runtime: 2 processes x 4 CPU devices.

Validates the jax.distributed path the reference reaches via torchrun
(pretrain-128.sh:24-28): the same global train step over the same global
batch must produce the same loss whether one process owns all 8 virtual
devices or two processes own 4 each (per-process data sharding +
host-local-to-global batch assembly, runtime/distributed.py).
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_mp_train_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, n_devices: int, timeout: int = 600):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    return subprocess.Popen(
        [sys.executable, WORKER, *args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _parse(stdout: str, name: str) -> float:
    m = re.search(rf"{name} ([\d.eE+-]+)", stdout)
    assert m, stdout[-2000:]
    return float(m.group(1))


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = [
        _run(["--mode", "dist", "--pid", str(p), "--port", str(port)], n_devices=4)
        for p in range(2)
    ]
    single = _run(["--mode", "single"], n_devices=8)

    outs = []
    for p in procs + [single]:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(stdout)

    losses = [_parse(o, "LOSS") for o in outs]
    gnorms = [_parse(o, "GRAD_NORM") for o in outs]
    # both distributed ranks see the same (replicated) global loss
    assert abs(losses[0] - losses[1]) < 1e-9
    # distributed == single-process on the identical global batch
    assert abs(losses[0] - losses[2]) < 1e-5, (losses[0], losses[2])
    assert abs(gnorms[0] - gnorms[2]) < 1e-4, (gnorms[0], gnorms[2])


def test_process_order_shard_partitions_each_global_batch():
    from trace_tpu.runtime.distributed import process_order_shard

    order = list(range(12))
    shard0 = process_order_shard(order, 4, index=0, count=2)
    shard1 = process_order_shard(order, 4, index=1, count=2)
    assert shard0 == [0, 1, 4, 5, 8, 9]
    assert shard1 == [2, 3, 6, 7, 10, 11]
    # per-step union is exactly the global batch, in order
    for s in range(3):
        merged = shard0[s * 2 : (s + 1) * 2] + shard1[s * 2 : (s + 1) * 2]
        assert merged == order[s * 4 : (s + 1) * 4]


def test_initialize_is_noop_without_config(monkeypatch):
    from trace_tpu.runtime import distributed

    for var in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "MASTER_PORT",
                "NUM_PROCESSES", "WORLD_SIZE", "PROCESS_ID", "RANK"):
        monkeypatch.delenv(var, raising=False)
    distributed.initialize()  # must not raise or spawn a coordinator
    assert distributed.process_count() >= 1
    assert distributed.is_primary() in (True, False)
