"""Benchmark: training throughput of the flagship deployed stereo model.

Default mode prints ONE JSON line:
  {"metric": "train_pairs_per_s", "value": N, "unit": "pairs/s/chip",
   "vs_baseline": R}

Protocol: canonical fine-tune workload (run_rag.sh): batch 4, 384x192 crop,
full forward (feature net x2 -> 64-disparity cost volume -> 3D matching ->
soft-argmin) + backward + SGD update, all BN training. The reference
publishes no throughput (BASELINE.md); vs_baseline is measured against the
round-1 f32 JAX baseline of 16.7 pairs/s on one v5e chip (fetch-fenced,
recorded in BASELINE.md) — ratios > 1.0 are speedups over that first
unoptimized TPU implementation.

Extra modes (round 2):
  --roofline   per-stage ms + analytic GFLOPs/MB + MFU / %HBM-peak table
  --eval       serving latency at the 480x960 eval geometry
  --io         native C++ vs PIL decode throughput (images/s)
  --search     MdeNAS cell-search step latency (canonical config)
  --scaling    dp weak-scaling table over the available devices
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# Production config: bf16-at-rest mixed precision (volume-sized matching
# activations stored bf16; every accumulation, params, BN stats and the
# disparity head stay f32 — rag_tpu/ops/precision.py; parity vs f32 pinned
# in tests/test_bf16.py). Set RAG_TPU_COMPUTE_DTYPE=float32 to measure
# the reference-semantics f32 path (see BASELINE.md for both numbers).
os.environ.setdefault("RAG_TPU_COMPUTE_DTYPE", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

ROUND1_BASELINE_PAIRS_PER_S = 16.7  # see BASELINE.md (measured round 1)


def _flagship(b=4, h=192, w=384, seed=0):
    """(specs, params, stats, left, right, gt) on the default device."""
    from rag_tpu.models.stereo import (
        build_head_specs,
        build_site_specs,
        init_sites,
    )
    from rag_tpu.search.genotype import default_genotype

    dev = jax.devices()[0]
    cpus = jax.devices("cpu") if any(
        d.platform == "cpu" for d in jax.local_devices()) else None
    g = default_genotype()
    specs = {**build_site_specs(g), **build_head_specs()}
    init_dev = cpus[0] if cpus else dev
    with jax.default_device(init_dev):
        params, stats = init_sites(jax.random.PRNGKey(seed), specs)
    params = jax.device_put(params, dev)
    stats = jax.device_put(stats, dev)
    rng = np.random.default_rng(seed)
    put = lambda x: jax.device_put(jnp.asarray(x, jnp.float32), dev)
    left = put(rng.standard_normal((b, h, w, 3)))
    right = put(rng.standard_normal((b, h, w, 3)))
    gt = put(rng.uniform(1.0, 180.0, (b, h, w)))
    return specs, params, stats, left, right, gt


def _time_fn(fn, fence, iters=10, warmup=2):
    """Fetch-fenced timing: `fence(out)` must fetch a scalar depending on
    the computation (block_until_ready lies through the axon relay)."""
    out = None
    for _ in range(warmup):
        out = fn()
    fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.time() - t0) / iters


def roofline(b=4, h=192, w=384, train=True):
    """Per-stage timing vs analytic cost: the external yardstick the
    round-1 perf claims lacked. Optional argv geometry:
    `bench.py --roofline [B H W [--no-train]]` (e.g. 1 480 960 for the
    serving geometry)."""
    from rag_tpu.models.stereo import (
        MAXDISP,
        extract_feature,
        run_matching_cf,
        stereo_forward,
    )
    from rag_tpu.ops.cost_volume import cost_volume_cf
    from rag_tpu.ops.pallas_kernels import soft_argmin_disparity_fused
    from rag_tpu.train.trainer import make_optimizer, make_train_step
    from rag_tpu.utils.flops import pipeline_costs, summarize, total
    specs, params, stats, left, right, gt = _flagship(b, h, w)
    bn = frozenset()

    @jax.jit
    def feat2(p, s, l, r):
        ns = {}
        x = extract_feature(specs, p, s, l, bn, ns)
        y = extract_feature(specs, p, s, r, bn, ns)
        return x, y

    @jax.jit
    def vol(x, y):
        return cost_volume_cf(x, y, MAXDISP // 3)

    @jax.jit
    def match(p, s, c):
        ns = {}
        return run_matching_cf(specs, p, s, c, bn, ns)

    @jax.jit
    def head(m):
        return soft_argmin_disparity_fused(m[..., None], MAXDISP, 3)

    @jax.jit
    def full_fwd(p, s, l, r):
        disp, _ = stereo_forward(specs, p, s, l, r, fused_head=True)
        return disp

    fence_sum = lambda o: float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    times = {}
    times["feature_net_x2"] = _time_fn(
        lambda: feat2(params, stats, left, right), fence_sum)
    x, y = feat2(params, stats, left, right)
    times["cost_volume"] = _time_fn(lambda: vol(x, y), fence_sum)
    c = vol(x, y)
    times["matching_net"] = _time_fn(lambda: match(params, stats, c),
                                     fence_sum)
    m = match(params, stats, c)
    times["disparity_head"] = _time_fn(lambda: head(m), fence_sum)
    times["total_forward"] = _time_fn(
        lambda: full_fwd(params, stats, left, right), fence_sum)

    stages = pipeline_costs(b, h, w)
    stages.append(total(stages))
    tf = [s for s in stages if s.name == "total_forward"][0]
    if train:
        optimizer = make_optimizer(0.003, 5.0)
        opt_state = optimizer.init(params)
        step = make_train_step(specs, frozenset(specs), optimizer)
        state = [params, stats, opt_state]

        def train_once():
            state[0], state[1], state[2], sc = step(
                state[0], state[1], state[2], 1e-3, left, right, gt)
            return sc

        times["train_step"] = _time_fn(train_once,
                                       lambda sc: float(sc["loss"]), iters=10)
        # train step ~ fwd + 2x bwd of the matmul FLOPs
        from rag_tpu.utils.flops import StageCost

        stages.append(StageCost("train_step", 3 * tf.flops,
                                3 * tf.bytes_moved))
    rows = summarize(stages, times)
    for r in rows:
        ms = f"{r['ms']:8.2f} ms" if "ms" in r else "      n/a"
        mfu = f"{r.get('mfu_pct', 0):5.1f}% MFU" if "ms" in r else ""
        bw = f"{r.get('hbm_pct', 0):6.1f}% HBM" if "ms" in r else ""
        print(f"{r['stage']:<16} {ms}  {r['gflops']:9.2f} GF "
              f"{r['mbytes']:9.1f} MB  {mfu} {bw}")
    if train:
        tr = [r for r in rows if r["stage"] == "train_step"][0]
        print(json.dumps({
            "metric": "train_step_mfu", "value": round(tr["mfu_pct"], 2),
            "unit": "% of v5e bf16 peak",
            "vs_baseline": round(b / times["train_step"]
                                 / ROUND1_BASELINE_PAIRS_PER_S, 3),
        }))


def eval_latency():
    from rag_tpu.train.trainer import make_eval_step

    specs, params, stats, left, right, gt = _flagship(1, 480, 960)
    step = make_eval_step(specs)
    t = _time_fn(lambda: step(params, stats, left, right, gt),
                 lambda o: float(o["loss"]), iters=10)
    print(json.dumps({
        "metric": "eval_latency_ms", "value": round(1e3 * t, 1),
        "unit": "ms @ 480x960 batch 1", "vs_baseline": round(0.499 / t, 2),
    }))


def search_step():
    """MdeNAS cell-search train step (canonical c_batch 8, 384x192) — the
    supernet is ONE compiled executable with lax.cond op switching."""
    from rag_tpu.search.mdenas import CellSearch, CellSearchConfig

    dev = jax.devices()[0]
    cpus = jax.devices("cpu") if any(
        d.platform == "cpu" for d in jax.local_devices()) else None
    with jax.default_device(cpus[0] if cpus else dev):
        cs = CellSearch(CellSearchConfig(), log=None)
    params = jax.device_put(cs.params, dev)
    stats = jax.device_put(cs.stats, dev)
    opt_state = jax.device_put(cs.opt_state, dev)
    rng = np.random.default_rng(0)
    b, h, w = 8, 192, 384
    put = lambda x: jax.device_put(jnp.asarray(x, jnp.float32), dev)
    left = put(rng.standard_normal((b, h, w, 3)))
    right = put(rng.standard_normal((b, h, w, 3)))
    gt = put(rng.uniform(1, 180, (b, h, w)))
    fea = jnp.asarray(np.array([1, 0, 1, 1, 0, 1, 1, 0, 1]))
    mat = jnp.asarray(np.array([0, 1, 1, 0, 1, 0, 1, 1, 0]))
    state = [params, stats, opt_state]

    def once():
        state[0], state[1], state[2], sc = cs._train_step(
            state[0], state[1], state[2], 2e-3, left, right, gt, fea, mat)
        return sc

    t = _time_fn(once, lambda sc: float(sc["loss"]), iters=10)
    print(json.dumps({
        "metric": "cell_search_step_ms", "value": round(1e3 * t, 1),
        "unit": "ms @ batch 8, 384x192",
        "vs_baseline": round(1.186 / t, 2),  # round-1 XLA start 1186 ms
    }))


def io_bench():
    """Native C++ loader vs the PIL path: images/s (VERDICT missing #7)."""
    import os
    import tempfile

    from PIL import Image

    from rag_tpu.data.stereo_dataset import StereoDataset
    from rag_tpu.runtime.native import native_available

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        n, h, w = 16, 400, 880
        lines = []
        for i in range(n):
            lp, rp, dp = (os.path.join(td, f"{k}{i}.png") for k in "lrd")
            for p in (lp, rp):
                Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8),
                                "RGB").save(p)
            Image.fromarray((rng.uniform(1, 64, (h, w)) * 256).astype(
                np.uint16)).save(dp)
            lines.append(f"{lp} {rp} {dp}")
        lst = os.path.join(td, "list.txt")
        with open(lst, "w") as f:
            f.write("\n".join(lines))

        results = {}
        for name, env in (("native", "1"), ("pil", "0")):
            os.environ["RAG_TPU_NATIVE_IO"] = env
            ds = StereoDataset(lst, training=True)
            t0 = time.time()
            imgs = 0
            for _ in range(3):
                for b in ds.batches(4, True, seed=0):
                    imgs += b["left"].shape[0]
            dt = time.time() - t0
            results[name] = imgs / dt
            if name == "native":
                assert ds.used_native or not native_available()
        print(json.dumps({
            "metric": "decode_images_per_s",
            "value": round(results["native"], 1),
            "unit": "stereo pairs/s (native C++ loader)",
            "vs_baseline": round(results["native"] / results["pil"], 2),
        }))


def scaling():
    from rag_tpu.parallel.scaling import measure_scaling

    rows = measure_scaling()
    for r in rows:
        print(f"devices {r['devices']:>2}  global_batch {r['global_batch']:>2}"
              f"  step {r['step_ms']:7.1f} ms  {r['pairs_per_s']:7.2f} pairs/s"
              f"  efficiency {r['efficiency']:.3f}")
    last = rows[-1]
    print(json.dumps({
        "metric": "dp_scaling_efficiency", "value": round(last["efficiency"], 3),
        "unit": f"@ {last['devices']} devices (weak scaling)",
        "vs_baseline": round(last["efficiency"] / 0.8, 3),
    }))


def main():
    from rag_tpu.train.trainer import make_optimizer, make_train_step

    b, h, w = 4, 192, 384
    specs, params, stats, left, right, gt = _flagship(b, h, w)
    dev = jax.devices()[0]
    optimizer = make_optimizer(weight_decay=0.003, clip=5.0)
    opt_state = jax.device_put(optimizer.init(params), dev)
    step = make_train_step(specs, frozenset(specs), optimizer)

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
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "--roofline":
        geom = [int(a) for a in sys.argv[2:5] if a.isdigit()]
        roofline(*geom, train="--no-train" not in sys.argv)
    elif mode == "--eval":
        eval_latency()
    elif mode == "--search":
        search_step()
    elif mode == "--io":
        io_bench()
    elif mode == "--scaling":
        scaling()
    else:
        main()
