"""Multi-host distribution: jax.distributed wiring + host-local data
sharding into global device arrays.

The reference is strictly single-GPU (SURVEY.md §2.4) — this layer is the
green-field scaling plane of the north star. Recipe (scaling-book style):

  1. every host calls ``initialize_multihost()`` (reads RAG_TPU_COORDINATOR
     / RAG_TPU_NUM_PROCS / RAG_TPU_PROC_ID or explicit args; no-op when
     single-process);
  2. build ONE global mesh over ``jax.devices()`` (all hosts' chips);
  3. each host loads ONLY its shard of the global batch
     (``host_local_indices``) and assembles the global array with
     ``global_batch`` (jax.make_array_from_process_local_data);
  4. the jitted sharded train step (rag_tpu.parallel.sharded) is unchanged:
     XLA emits psum over ICI within a host and DCN across hosts.

Verified 2-process × 4-CPU-device in tests/test_multihost.py (the
TPU-less idiom: JAX_PLATFORMS=cpu + xla_force_host_platform_device_count).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_tpu.parallel.mesh import DATA_AXIS


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed for a multi-host run; returns the process
    index. Single-process (no coordinator configured) is a no-op returning
    0, so drivers can call this unconditionally."""
    coordinator_address = coordinator_address or os.environ.get(
        "RAG_TPU_COORDINATOR")
    if num_processes is None and "RAG_TPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["RAG_TPU_NUM_PROCS"])
    if process_id is None and "RAG_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["RAG_TPU_PROC_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return 0  # single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def process_info():
    """(process_index, process_count) — valid after initialize."""
    return jax.process_index(), jax.process_count()


def host_local_indices(n_items: int,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None) -> np.ndarray:
    """Contiguous shard of dataset indices owned by this host. Every host
    gets the same count per = ceil(n/pc); when pc does not divide n the
    tail shards wrap around to the start (a few items appear on two hosts,
    none is dropped — search splits need equal lengths AND full
    coverage)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_items // pc)  # ceil division
    assert per > 0, (n_items, pc)
    start = pi * per
    return np.arange(start, start + per) % n_items


def global_batch(local: Dict[str, np.ndarray], mesh: Mesh) -> Dict:
    """Assemble each host's local batch slice into global jax.Arrays with
    the batch axis sharded over 'data'. local batch size must equal
    global_batch // process_count."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local.items()
    }


class MultihostBatcher:
    """Wraps a host-local dataset so iteration yields GLOBAL sharded
    batches: each host reads only its index shard, then the shards join
    into one global array per step.

    All hosts must construct it with the same (dataset length, batch,
    seed) so the host-local permutations stay aligned."""

    def __init__(self, dataset, mesh: Mesh,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.mesh = mesh
        self.pi, self.pc = (
            process_index if process_index is not None else jax.process_index(),
            process_count if process_count is not None else jax.process_count(),
        )

    def __len__(self):
        return len(self.dataset)

    def batches(self, global_batch_size: int, shuffle: bool, seed: int = 0,
                indices=None, drop_last: bool = True):
        """indices: optional subset of dataset indices (search splits) —
        each host takes its host_local_indices shard OF that subset."""
        assert global_batch_size % self.pc == 0, \
            (global_batch_size, self.pc)
        local_bs = global_batch_size // self.pc
        n = len(self.dataset) if indices is None else len(indices)
        own = host_local_indices(n, self.pi, self.pc)
        if indices is not None:
            own = np.asarray(indices)[own]
        for b in self.dataset.batches(local_bs, shuffle, seed=seed,
                                      indices=own, drop_last=drop_last):
            yield global_batch(b, self.mesh)
