"""Benchmark: training throughput of the flagship deployed stereo model.

Prints ONE JSON line:
  {"metric": "train_pairs_per_s", "value": N, "unit": "pairs/s/chip",
   "vs_baseline": R}

Protocol: canonical fine-tune workload (run_rag.sh): batch 4, 384x192 crop,
full forward (feature net x2 -> 64-disparity cost volume -> 3D matching ->
soft-argmin) + backward + SGD update, all BN training. The reference
publishes no throughput (BASELINE.md); vs_baseline is measured against the
round-1 f32 JAX baseline of 16.7 pairs/s on one v5e chip (fetch-fenced,
recorded in BASELINE.md) — ratios > 1.0 are speedups over that first
unoptimized TPU implementation.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ROUND1_BASELINE_PAIRS_PER_S = 16.7  # see BASELINE.md (measured round 1)


def main():
    from rag_tpu.models.stereo import (
        build_head_specs,
        build_site_specs,
        init_sites,
    )
    from rag_tpu.search.genotype import default_genotype
    from rag_tpu.train.trainer import make_optimizer, make_train_step

    dev = jax.devices()[0]
    cpus = jax.devices("cpu") if any(
        d.platform == "cpu" for d in jax.local_devices()) else None

    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    # init on host to avoid per-op tunnel round trips, then device_put
    init_dev = cpus[0] if cpus else dev
    with jax.default_device(init_dev):
        params, stats = init_sites(jax.random.PRNGKey(0), specs)
    params = jax.device_put(params, dev)
    stats = jax.device_put(stats, dev)

    optimizer = make_optimizer(weight_decay=0.003, clip=5.0)
    opt_state = jax.device_put(optimizer.init(params), dev)
    step = make_train_step(specs, frozenset(specs), optimizer)

    b, h, w = 4, 192, 384
    rng = np.random.default_rng(0)
    left = jax.device_put(jnp.asarray(
        rng.standard_normal((b, h, w, 3)), jnp.float32), dev)
    right = jax.device_put(jnp.asarray(
        rng.standard_normal((b, h, w, 3)), jnp.float32), dev)
    gt = jax.device_put(jnp.asarray(
        rng.uniform(1.0, 180.0, (b, h, w)), jnp.float32), dev)

    # compile + warmup; NOTE: on the axon relay, block_until_ready does not
    # actually fence device execution — only a VALUE fetch does. Every
    # timing below ends with a scalar fetch that depends on the whole
    # chain of steps.
    for _ in range(2):
        params, stats, opt_state, scalars = step(
            params, stats, opt_state, 1e-3, left, right, gt)
    float(scalars["loss"])

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        params, stats, opt_state, scalars = step(
            params, stats, opt_state, 1e-3, left, right, gt)
    float(scalars["loss"])  # true synchronization point
    dt = (time.time() - t0) / iters
    pairs_per_s = b / dt

    print(json.dumps({
        "metric": "train_pairs_per_s",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / ROUND1_BASELINE_PAIRS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
