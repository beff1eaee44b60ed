"""On-chip A/B of the photometric train step's warp formulation:
gather (take_along_axis) vs the scan-of-shifts rewrite, plus the
supervised step as the reference cost. Fetch-fenced."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("RAG_TPU_COMPUTE_DTYPE", "bfloat16")

import jax  # noqa: E402


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(step, st, args, iters=20, warmup=3):
    for _ in range(warmup):
        st[0], st[1], st[2], sc = step(st[0], st[1], st[2], 1e-3, *args)
    float(sc["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st[0], st[1], st[2], sc = step(st[0], st[1], st[2], 1e-3, *args)
    float(sc["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    import bench
    from rag_tpu.train.trainer import (
        make_optimizer,
        make_selfsup_train_step,
        make_train_step,
    )

    specs, params, stats, left, right, gt = bench._flagship(4, 192, 384)
    opt = make_optimizer(0.003, 5.0)

    sup = make_train_step(specs, frozenset(specs), opt)
    dt = timed(sup, [params, stats, opt.init(params)], (left, right, gt))
    stamp(f"supervised step: {1e3*dt:.1f} ms ({4/dt:.1f} pairs/s)")

    for mode in ("0", "1"):
        os.environ["RAG_TPU_SCAN_WARP"] = mode
        step = make_selfsup_train_step(specs, frozenset(specs), opt)
        dt = timed(step, [params, stats, opt.init(params)],
                   (left, right, gt))
        name = "scan" if mode == "1" else "gather"
        stamp(f"photometric step ({name} warp): {1e3*dt:.1f} ms "
              f"({4/dt:.1f} pairs/s)")


if __name__ == "__main__":
    main()
