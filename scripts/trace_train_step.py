"""Capture a jax.profiler device trace of the flagship train step and print
a per-op-class time breakdown (the evidence behind BASELINE.md's
copies/pads/slices bucket numbers).

Usage: python scripts/trace_train_step.py [outdir] [--eval] [--f32]
Parses the xplane.pb with the tensorboard_plugin_profile proto (present in
the image); groups TPU device events by HLO op class and prints total ms
per class per step plus the top individual ops.
"""
import glob
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--f32" in sys.argv:
    os.environ["RAG_TPU_COMPUTE_DTYPE"] = "float32"
else:
    os.environ.setdefault("RAG_TPU_COMPUTE_DTYPE", "bfloat16")

import jax
import jax.numpy as jnp

STEPS = 5

from trace_common import classify, load_xspace  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "-") else "/tmp/rag_trace"
    os.makedirs(outdir, exist_ok=True)

    sys.path.insert(0, "/root/repo")
    import bench

    from rag_tpu.train.trainer import make_optimizer, make_train_step

    if "--eval" in sys.argv:
        from rag_tpu.models.stereo import stereo_forward
        specs, params, stats, left, right, gt = bench._flagship(1, 480, 960)

        @jax.jit
        def eval_fn(p, s, l, r):
            d, _ = stereo_forward(specs, p, s, l, r, fused_head=True)
            return d

        run = lambda st: (eval_fn(params, stats, left, right), st)[1]
        fence = lambda st: float(jnp.sum(eval_fn(params, stats, left, right)))
        state = None
    else:
        specs, params, stats, left, right, gt = bench._flagship(4, 192, 384)
        optimizer = make_optimizer(0.003, 5.0)
        step = make_train_step(specs, frozenset(specs), optimizer)
        state = [params, stats, optimizer.init(params)]

        def run(st):
            st[0], st[1], st[2], sc = step(st[0], st[1], st[2], 1e-3,
                                           left, right, gt)
            return st

        fence = lambda st: float(jnp.sum(st[0]["stem_2d0"]["w"]
                                         if "stem_2d0" in st[0] else 0.0)
                                 + float(jnp.sum(left)))

    for _ in range(3):
        state = run(state)
    jax.block_until_ready(jax.device_get(left))
    fence(state)

    jax.profiler.start_trace(outdir)
    for _ in range(STEPS):
        state = run(state)
    fence(state)
    jax.profiler.stop_trace()

    xs = load_xspace(outdir)

    classes, ops = {}, {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "step" in line.name.lower() and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                cls = classify(name)
                classes[cls] = classes.get(cls, 0.0) + dur
                ops[name] = ops.get(name, 0.0) + dur
    total = sum(classes.values())
    print(f"\n== device time per step (avg of {STEPS}), plane total "
          f"{total / STEPS:.2f} ms ==")
    for cls, ms in sorted(classes.items(), key=lambda kv: -kv[1]):
        print(f"  {cls:12s} {ms / STEPS:8.3f} ms  ({100 * ms / total:5.1f}%)")
    print("\n== top 25 ops ==")
    for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms / STEPS:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
