"""Data-parallel scaling harness: measured efficiency over mesh sizes.

The BASELINE.md target (new capability, no reference equivalent) is dp
scaling efficiency >= 0.8 at constant per-chip batch. This harness times
the sharded train step at increasing 'data' mesh sizes over whatever
devices exist — real chips on a pod slice, or the fake
xla_force_host_platform_device_count mesh for TPU-less validation (shape/
collective correctness + a host-simulated trend, NOT silicon numbers).

Timing is fetch-fenced (see rag_tpu.utils.timing: through the axon relay
only fetching a dependent scalar fences device execution)."""

from __future__ import annotations

import time
from typing import Dict, List, Sequence

import jax
import numpy as np

from rag_tpu.models.stereo import build_head_specs, build_site_specs, init_sites
from rag_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from rag_tpu.search.genotype import default_genotype
from rag_tpu.train.trainer import make_optimizer


def _batch(rng, n, h, w):
    return {
        "left": rng.standard_normal((n, h, w, 3)).astype(np.float32),
        "right": rng.standard_normal((n, h, w, 3)).astype(np.float32),
        "disparity": rng.uniform(1, 40, (n, h, w)).astype(np.float32),
    }


def measure_scaling(mesh_sizes: Sequence[int] = (1, 2, 4, 8),
                    batch_per_chip: int = 2, hw=(48, 96),
                    steps: int = 8, warmup: int = 2) -> List[Dict]:
    """Per mesh size: build the DRIVER's dp train step (the same
    ContinualDriver._ft_steps constructor the canonical experiment trains
    with) on the first n devices, run `steps` steps at global batch
    n*batch_per_chip, report pairs/s and efficiency vs the 1-device
    number (weak scaling)."""
    from rag_tpu.continual.driver import (
        ContinualDriver,
        ExperimentConfig,
        TrainConfig,
    )

    h, w = hw
    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    params, stats = init_sites(jax.random.PRNGKey(0), specs)
    opt = make_optimizer(3e-4, 5.0)
    bn = frozenset(specs)
    devices = jax.devices()
    rows: List[Dict] = []
    base_tp = None
    for n in mesh_sizes:
        if n > len(devices):
            continue
        gb_n = n * batch_per_chip
        driver = ContinualDriver(
            ExperimentConfig(train=TrainConfig(batch=gb_n), mesh_data=n),
            log=None)
        mesh = driver.mesh or make_mesh(data=1, model=1,
                                        devices=devices[:1])
        step, _ = driver._ft_steps(specs, bn, opt)
        rng = np.random.default_rng(0)
        gb = gb_n
        batch = shard_batch(_batch(rng, gb, h, w), mesh)
        p = replicate(params, mesh)
        s = replicate(stats, mesh)
        o = replicate(opt.init(params), mesh)
        for _ in range(warmup):
            p, s, o, sc = step(p, s, o, 1e-3, batch["left"], batch["right"],
                               batch["disparity"])
        float(sc["loss"])  # fence
        t0 = time.perf_counter()
        for _ in range(steps):
            p, s, o, sc = step(p, s, o, 1e-3, batch["left"], batch["right"],
                               batch["disparity"])
        float(sc["loss"])  # fetch-fence the chain
        dt = (time.perf_counter() - t0) / steps
        tp = gb / dt
        if base_tp is None:
            base_tp = tp
        rows.append({
            "devices": n, "global_batch": gb, "step_ms": 1e3 * dt,
            "pairs_per_s": tp,
            "efficiency": tp / (base_tp * n) if base_tp else 1.0,
        })
    return rows
