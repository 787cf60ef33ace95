"""Multi-host (multi-process) runtime.

Replaces the reference's torchrun rendezvous + NCCL/HCCL launch scheme
(/root/reference/scripts/train/pretrain-128.sh:4-8,24-28: MASTER_ADDR /
WORLD_SIZE env vars, 16 proc/node) with JAX's coordinator service: every
process calls :func:`initialize` once, after which ``jax.devices()`` spans
all hosts, GSPMD meshes cover the full slice, and XLA inserts ICI/DCN
collectives — no separate comm library.

Pieces:

* :func:`initialize` — `jax.distributed.initialize` with torchrun-style env
  fallbacks, safe to call unconditionally (no-op single-process).
* :func:`is_primary` — process-0 gating for logs/artifacts
  (reference rank-0 prints, train_mt.py:60-62).
* :func:`process_order_shard` — each process's slice of a global sample
  order, aligned so the per-step union over processes is exactly the global
  batch (per-process data sharding of the reference's per-rank DataLoader).
* :func:`host_local_to_global` — assemble per-process local batch arrays
  into global jax.Arrays sharded over the mesh
  (`jax.make_array_from_process_local_data`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-process runtime; no-op when single-process.

    Explicit args win; otherwise torchrun-flavored env vars are honored:
    ``COORDINATOR_ADDRESS`` (or ``MASTER_ADDR``+``MASTER_PORT``),
    ``NUM_PROCESSES`` (or ``WORLD_SIZE``), ``PROCESS_ID`` (or ``RANK``) —
    so reference-style launch scripts port by renaming nothing but the
    binary. On Cloud-TPU pod VMs (detected via the TPU worker env vars the
    runtime stamps on every host) a bare ``initialize()`` delegates to
    ``jax.distributed.initialize()`` with no args, which resolves the
    coordinator from the cloud metadata service. Anywhere else, calling
    with no args and no env vars is a single-process no-op — multi-host
    launches MUST provide the coordinator/world/rank triple explicitly or
    via env vars, or every process silently runs single-process.
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get("COORDINATOR_ADDRESS") or (
        f"{env['MASTER_ADDR']}:{env['MASTER_PORT']}"
        if env.get("MASTER_ADDR") and env.get("MASTER_PORT") else None
    )
    if num_processes is None:
        v = env.get("NUM_PROCESSES") or env.get("WORLD_SIZE")
        num_processes = int(v) if v else None
    if process_id is None:
        v = env.get("PROCESS_ID") or env.get("RANK")
        process_id = int(v) if v else None

    if coordinator_address is None and num_processes is None:
        if _tpu_pod_autoconfig_available():
            # Cloud TPU pod: no-arg initialize() self-configures from the
            # metadata service; jax.devices() then spans all hosts.
            jax.distributed.initialize()
        return  # single-process: no-op
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def _tpu_pod_autoconfig_available() -> bool:
    """True when this process runs on a Cloud-TPU pod worker, where the
    no-arg ``jax.distributed.initialize()`` can self-configure.

    Cloud TPU VMs stamp worker topology into the environment
    (``TPU_WORKER_HOSTNAMES``/``TPU_WORKER_ID`` via the metadata service;
    MegaScale launches set ``MEGASCALE_COORDINATOR_ADDRESS``). A multi-worker
    signal is required — a single-host TPU VM (or this repo's tunneled
    single chip) must stay a no-op.
    """
    env = os.environ
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hosts and env.get("TPU_WORKER_ID") is not None


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on exactly one process — gate checkpoint/log/artifact writes."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n


def process_order_shard(
    order: Sequence[int], global_batch_size: int,
    *, index: Optional[int] = None, count: Optional[int] = None,
) -> list[int]:
    """This process's sample indices: the p-th sub-chunk of every global
    batch, so step s's union over processes is order[s*B:(s+1)*B] exactly
    (keeps modality-grouped batches intact across the fleet)."""
    p = jax.process_index() if index is None else index
    n = jax.process_count() if count is None else count
    if n == 1:
        return list(order)
    b_local = local_batch_size(global_batch_size) if count is None else (
        global_batch_size // n
    )
    out: list[int] = []
    for s in range(len(order) // global_batch_size):
        chunk = order[s * global_batch_size : (s + 1) * global_batch_size]
        out.extend(chunk[p * b_local : (p + 1) * b_local])
    return out


def host_local_to_global(batch: dict, mesh, shardings: Optional[dict] = None) -> dict:
    """Per-process local batch (leading dim = local batch) -> global
    jax.Arrays laid out per ``shardings`` (default: runtime.mesh batch
    rules).  Single-process: plain device_put with the same shardings."""
    from trace_tpu.runtime.mesh import batch_shardings

    if shardings is None:
        shardings = batch_shardings(mesh, batch)
    if jax.process_count() == 1:
        return jax.device_put(batch, shardings)
    return {
        k: jax.make_array_from_process_local_data(shardings[k], v)
        for k, v in batch.items()
    }
